"""Deterministic synthetic fixtures (FIXTURES.md §B).

Everything here is seeded and pure — same inputs → byte-identical outputs —
because BASELINE.json:6 requires join row sets / tile assignments to match
golden fixtures exactly, and because the DuckDB oracle must see the very
same geometry the Spark queries see.

Two geometry sources:

1. ``derived lat/lon from integer keys`` — a pure-arithmetic formula that is
   expressible BOTH as a Spark Column and as ANSI SQL, so the driver's
   DuckDB oracle can reproduce the coordinates from the shared testdata
   tables without any UDF:  lat = (key*9973 % 120000)/1000 - 60,
   lon = (key*7919 % 360000)/1000 - 180.
2. ``synth images/regions tables`` — the north-rule image+caption input
   (BASELINE.json:15) with numpy pixel payloads, plus polygon fixtures.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from .kernels import codecs

# ---------------------------------------------------------------------------
# SQL-expressible derived coordinates (shared Spark/DuckDB geometry)
# ---------------------------------------------------------------------------

LAT_MUL, LAT_MOD = 9973, 120_000   # → [-60, 60)
LON_MUL, LON_MOD = 7919, 360_000   # → [-180, 180)


def derived_lat_sql(key_expr: str) -> str:
    return f"(({key_expr} * {LAT_MUL}) % {LAT_MOD}) / 1000.0 - 60.0"


def derived_lon_sql(key_expr: str) -> str:
    return f"(({key_expr} * {LON_MUL}) % {LON_MOD}) / 1000.0 - 180.0"


def derived_lat_np(key: np.ndarray) -> np.ndarray:
    return (key.astype(np.int64) * LAT_MUL % LAT_MOD) / 1000.0 - 60.0


def derived_lon_np(key: np.ndarray) -> np.ndarray:
    return (key.astype(np.int64) * LON_MUL % LON_MOD) / 1000.0 - 180.0


# ---------------------------------------------------------------------------
# Oracle polygons — deterministic vertex lists embeddable in a SQL VALUES
# ---------------------------------------------------------------------------

def oracle_polygons(n: int = 24, seed: int = 1234) -> list[tuple[int, list[tuple[float, float]]]]:
    """n seeded polygons (alternating convex / star) as (poly_id, [(lat,lon)...]).

    Vertices rounded to 6 decimals with non-trivial last digits so no
    derived point (3-decimal grid) is exactly on an edge/vertex — keeps the
    boundary-inclusive engine convention and the parity-only SQL oracle in
    exact agreement (measure-zero disagreement set avoided by construction).
    """
    rng = np.random.default_rng(seed)
    out = []
    for pid in range(n):
        clat = float(rng.uniform(-55, 55))
        clon = float(rng.uniform(-170, 170))
        nv = int(rng.integers(4, 13))
        base_r = float(rng.uniform(2.0, 9.0))
        th = np.sort(rng.uniform(0, 2 * math.pi, nv))
        if pid % 2 == 0:  # convex-ish
            rr = np.full(nv, base_r) * rng.uniform(0.8, 1.0, nv)
        else:             # star (non-convex)
            rr = np.where(np.arange(nv) % 2 == 0, base_r, base_r * 0.35)
        lat = clat + rr * np.sin(th)
        lon = clon + rr * np.cos(th)
        lat = np.clip(lat, -59.5, 59.5)
        lon = np.clip(lon, -179.5, 179.5)
        ring = [(round(float(a) + 1.7e-6, 6), round(float(o) + 1.3e-6, 6))
                for a, o in zip(lat, lon)]
        out.append((pid, ring))
    return out


def oracle_polygons_holed(n: int = 24, seed: int = 1234
                          ) -> list[tuple[int, list, list]]:
    """The oracle_polygons rings plus a deterministic interior ring
    (hole) in every polygon where one provably fits: (poly_id, ring,
    holes) with holes = [] or [hex_ring].

    The hole is a regular hexagon centered at the vertex centroid with
    circumradius 0.45x the centroid's distance to the nearest outer
    edge — strictly inside the outer ring by construction (verified at
    generation; polygons whose centroid falls outside, or too close to
    an edge, get no hole). Vertices carry the same 6-decimal
    non-trivial-last-digit rounding as the outer rings so the derived
    3-decimal point grid stays clear of hole edges too (asserted in
    tests/test_pip.py)."""
    from .kernels import pip as _P
    out = []
    for pid, ring in oracle_polygons(n, seed):
        holes: list = []
        arr = np.asarray(ring, dtype=np.float64)
        cy, cx = float(arr[:, 0].mean()), float(arr[:, 1].mean())
        if _P.points_in_ring(np.array([cy]), np.array([cx]), arr)[0]:
            d = _point_to_edges_dist(cy, cx, arr)
            r = 0.45 * d
            if r > 0.05:        # skip degenerate slivers
                th = np.arange(6) * (math.pi / 3.0) + 0.37
                hy = cy + r * np.sin(th)
                hx = cx + r * np.cos(th)
                hole = [(round(float(a) + 1.9e-6, 6),
                         round(float(o) + 1.1e-6, 6))
                        for a, o in zip(hy, hx)]
                # rounding moved vertices ≤~2e-6: re-verify containment
                if _P.points_in_ring(
                        np.array([v[0] for v in hole]),
                        np.array([v[1] for v in hole]), arr).all():
                    holes = [hole]
        out.append((pid, ring, holes))
    return out


def _point_to_edges_dist(py: float, px: float, ring: np.ndarray) -> float:
    """Min distance from (py,px) to the ring's segments (planar degrees)."""
    a = ring
    b = np.roll(ring, -1, axis=0)
    d = b - a
    t = np.clip(((py - a[:, 0]) * d[:, 0] + (px - a[:, 1]) * d[:, 1])
                / np.maximum((d * d).sum(axis=1), 1e-30), 0.0, 1.0)
    proj = a + t[:, None] * d
    return float(np.sqrt((proj[:, 0] - py) ** 2
                         + (proj[:, 1] - px) ** 2).min())


def _all_rings(poly) -> list:
    """(pid, ring) or (pid, ring, holes) → [ring, *holes]."""
    if len(poly) == 2:
        return [poly[1]]
    return [poly[1], *poly[2]]


def polygons_edges_sql_values(polys) -> str:
    """Render polygons as a SQL VALUES list of edges for the DuckDB oracle:
    (poly_id, y1, x1, y2, x2). Hole rings' edges are listed under the same
    poly_id — even-odd crossing parity over the flat edge list is exactly
    outer-minus-holes containment, so the oracle query needs no change."""
    rows = []
    for poly in polys:
        pid = poly[0]
        for ring in _all_rings(poly):
            e = len(ring)
            for k in range(e):
                y1, x1 = ring[k]
                y2, x2 = ring[(k + 1) % e]
                rows.append(f"({pid}, {y1!r}, {x1!r}, {y2!r}, {x2!r})")
    return ", ".join(rows)


def polygons_pdf(polys) -> pd.DataFrame:
    """Polygons as a pandas frame: poly_id, name, ring(list[list[float]]),
    holes (list of rings, [] when solid), bbox fields — the `regions`
    table shape (FIXTURES.md)."""
    recs = []
    for poly in polys:
        pid, ring = poly[0], poly[1]
        holes = poly[2] if len(poly) > 2 else []
        lats = [v[0] for v in ring]
        lons = [v[1] for v in ring]
        recs.append({
            "poly_id": pid,
            "name": f"region{pid}",
            "ring": [[float(a), float(o)] for a, o in ring],
            "holes": [[[float(a), float(o)] for a, o in h] for h in holes],
            "lat_min": min(lats), "lat_max": max(lats),
            "lon_min": min(lons), "lon_max": max(lons),
        })
    return pd.DataFrame(recs)


# ---------------------------------------------------------------------------
# images table — the north-rule input (BASELINE.json:15)
# ---------------------------------------------------------------------------

SEED = 20240816
_W_CYCLE = (16, 32, 64)
_H_CYCLE = (16, 32, 48)
_FMT_CYCLE = codecs.FORMATS
_HOTSPOTS = [  # three "city" boxes; 20% of mass → skew for salting tests
    (40.7, -74.0, 0.5),   # NYC-ish
    (51.5, -0.1, 0.5),    # London-ish
    (35.7, 139.7, 0.5),   # Tokyo-ish
]
_WORDS = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet "
          "kilo lima mike november oscar papa quebec romeo sierra tango").split()


def image_latlon(image_id: str) -> tuple[float, float]:
    """sha256(image_id) → deterministic position; 20% in hotspot boxes."""
    h = hashlib.sha256(image_id.encode()).digest()
    u0 = int.from_bytes(h[0:8], "big") / 2**64
    u1 = int.from_bytes(h[8:16], "big") / 2**64
    u2 = int.from_bytes(h[16:24], "big") / 2**64
    if u0 < 0.20:
        clat, clon, half = _HOTSPOTS[int(u0 * 1e9) % 3]
        return clat + (u1 - 0.5) * 2 * half, clon + (u2 - 0.5) * 2 * half
    return -60.0 + u1 * 120.0, -180.0 + u2 * 360.0


def make_images_pdf(n: int, start: int = 0, with_pixels: bool = True,
                    fmt: str | None = None) -> pd.DataFrame:
    """Deterministic images batch [start, start+n). Schema per
    BASELINE.json:15 + derived lat/lon (FIXTURES.md §B).

    ``fmt``: force every payload to one codec instead of the FORMATS
    cycle (ingest benchmarks over a homogeneous jpeg/gif corpus). For
    'gif' the pixels are quantized to a 3-3-2 bit palette (exactly 256
    possible colors) so the palette-indexed encoder accepts them — the
    stored phash is of the decoded payload either way."""
    recs = []
    for i in range(start, start + n):
        image_id = f"img{i:08d}"
        w = _W_CYCLE[i % len(_W_CYCLE)]
        h = _H_CYCLE[i % len(_H_CYCLE)]
        f = fmt or _FMT_CYCLE[i % len(_FMT_CYCLE)]
        lat, lon = image_latlon(image_id)
        rng = np.random.default_rng(np.random.PCG64(SEED ^ (i * 2654435761 % 2**31)))
        if with_pixels:
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            # blend toward a smooth gradient so rle/qjpg have compressible runs
            grad = (np.linspace(0, 255, w, dtype=np.float64)[None, :, None]
                    * np.ones((h, 1, 3)))
            img = ((img.astype(np.float64) * 0.25 + grad * 0.75)).astype(np.uint8)
            if f == "gif":  # 3-3-2 bits → ≤256 distinct colors, lossless in GIF
                img = (img & np.array([0xE0, 0xE0, 0xC0], dtype=np.uint8))
            buf = codecs.encode(img, f)
            # phash of the DECODED payload (FIXTURES.md): for lossy fmts the
            # stored hash must match what a reader recomputes from `bytes`
            ph = codecs.phash64(codecs.decode(buf, f, w, h))
        else:
            buf, ph = b"", 0
        wi = rng.integers(0, len(_WORDS), 6)
        caption = f"caption of {image_id}: " + " ".join(_WORDS[k] for k in wi)
        recs.append((image_id, buf, w, h, f, caption, ph, lat, lon))
    return pd.DataFrame(recs, columns=["image_id", "bytes", "w", "h", "fmt",
                                       "caption", "phash", "lat", "lon"])


def write_images_parquet(path: str, n: int, chunk: int = 20_000,
                         with_pixels: bool = True) -> None:
    """Chunked deterministic writer for bench-scale image tables."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    schema = pa.schema([
        ("image_id", pa.string()), ("bytes", pa.binary()),
        ("w", pa.int32()), ("h", pa.int32()), ("fmt", pa.string()),
        ("caption", pa.string()), ("phash", pa.int64()),
        ("lat", pa.float64()), ("lon", pa.float64()),
    ])
    with pq.ParquetWriter(path, schema, compression="zstd") as wr:
        for s in range(0, n, chunk):
            pdf = make_images_pdf(min(chunk, n - s), start=s, with_pixels=with_pixels)
            pdf["w"] = pdf["w"].astype("int32")
            pdf["h"] = pdf["h"].astype("int32")
            wr.write_table(pa.Table.from_pandas(pdf, schema=schema, preserve_index=False))


def write_images_parquet_spark(spark, path: str, n: int, *,
                               partitions: int = 64, with_pixels: bool = True,
                               fmt: str | None = None) -> None:
    """Distributed deterministic image-table generation: the id range fans
    out over ``partitions`` tasks, each producing the same rows
    make_images_pdf would (chunk-deterministic), written as multi-file
    parquet so downstream scans parallelize. ``fmt`` forces one codec
    for every payload (see make_images_pdf)."""
    import pandas as _pd

    def _gen(it):
        for pdf in it:
            for s, e in zip(pdf["start"], pdf["end"]):
                yield make_images_pdf(int(e - s), start=int(s),
                                      with_pixels=with_pixels, fmt=fmt)

    bounds = [(i * n // partitions, (i + 1) * n // partitions)
              for i in range(partitions)]
    src = spark.createDataFrame(_pd.DataFrame(bounds, columns=["start", "end"])) \
        .repartition(partitions)
    schema = ("image_id string, bytes binary, w int, h int, fmt string, "
              "caption string, phash long, lat double, lon double")
    src.mapInPandas(_gen, schema).write.mode("overwrite").parquet(path)


def make_knn_queries_pdf(n: int, seed: int = 77) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    lat = np.empty(n)
    lon = np.empty(n)
    for q in range(n):
        if q % 2 == 0:
            clat, clon, half = _HOTSPOTS[q % 3]
            lat[q] = clat + rng.uniform(-half, half)
            lon[q] = clon + rng.uniform(-half, half)
        else:
            lat[q] = rng.uniform(-60, 60)
            lon[q] = rng.uniform(-180, 180)
    return pd.DataFrame({"query_id": np.arange(n, dtype=np.int64),
                         "lat": lat, "lon": lon})


# ------------------------------------------------------------------ documents

_SYLLABLES = ["ba", "re", "to", "mi", "san", "dor", "el", "ka", "vin", "tu",
              "ler", "on", "pra", "gi", "ney", "zo", "mar", "ti", "qua", "hes"]


def corpus_vocab(n: int = 1024) -> list:
    """Deterministic pronounceable vocabulary; word lengths 4-15 chars keep
    quality_score's mean-token-length band satisfied for sampled text."""
    words = []
    for i in range(n):
        r, w = i + 1, ""
        for _ in range(2 + (i % 3)):
            w += _SYLLABLES[r % len(_SYLLABLES)]
            r //= len(_SYLLABLES) or 1
            r += 7  # decorrelate successive syllables
        words.append(w)
    return words


def make_doc_text(doc_id: int, vocab: list) -> str:
    """Pure function of doc_id: 60-120 words, a period every ~12 words.
    Planted duplicates (stable, id-derived):
      doc_id % 23 == 11 -> EXACT text of doc_id-1 (upper-cased first char
                           kept identical: fingerprint-identical);
      doc_id % 23 == 12 -> text of doc_id-2 plus a short tail (near-dup,
                           3-gram Jaccard ~0.9).
    """
    m = doc_id % 23
    if m == 11 and doc_id >= 1:
        return make_doc_text(doc_id - 1, vocab)
    if m == 12 and doc_id >= 2:
        return make_doc_text(doc_id - 2, vocab) + " minor extra tail words"
    rng = np.random.default_rng(doc_id * 2654435761 % (2**32))
    n_words = int(60 + rng.integers(0, 61))
    idx = rng.integers(0, len(vocab), n_words)
    parts = []
    for k, wi in enumerate(idx):
        parts.append(vocab[wi])
        if k % 12 == 11:
            parts[-1] += "."
    return " ".join(parts)


def make_documents_pdf(n: int, start: int = 0) -> pd.DataFrame:
    vocab = corpus_vocab()
    ids = np.arange(start, start + n, dtype=np.int64)
    texts = [make_doc_text(int(i), vocab) for i in ids]
    return pd.DataFrame({
        "doc_id": ids,
        "text": texts,
        "lang": "xx",          # features recompute lang; placeholder column
        "source": "synth",
        "n_chars": [len(t) for t in texts],
    })


def write_documents_parquet_spark(spark, path: str, n: int, *,
                                  partitions: int = 64) -> None:
    """Distributed deterministic corpus generation with ~4.3% exact and
    ~4.3% near duplicates planted by id arithmetic (duplicate partners are
    recomputed from the partner id, so generation stays embarrassingly
    parallel — no cross-partition reads)."""
    import pandas as _pd

    def _gen(it):
        for pdf in it:
            for s, e in zip(pdf["start"], pdf["end"]):
                yield make_documents_pdf(int(e - s), start=int(s))

    bounds = [(i * n // partitions, (i + 1) * n // partitions)
              for i in range(partitions)]
    src = spark.createDataFrame(_pd.DataFrame(bounds, columns=["start", "end"])) \
        .repartition(partitions)
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    src.mapInPandas(_gen, schema).write.mode("overwrite").parquet(path)
