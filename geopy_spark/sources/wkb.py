"""WKB (Well-Known Binary, OGC Simple Features §8) polygon interchange —
the BINARY geometry wire format (GeoParquet's geometry column, PostGIS
dumps, Sedona/GeoPandas output), completing the G15 family next to
GeoJSON and WKT.

Scope: 2-D ``Polygon`` (type 3) and ``MultiPolygon`` (type 6), both byte
orders on read (emit is little-endian, the de-facto default); positions
are (x=lon, y=lat) doubles; rings closed on the wire and opened into the
engine convention. A MultiPolygon explodes to one row per member polygon
(``part``, shared poly_id) — the same union-of-parts shape the joins
already consume. Other geometry types surface via ``geom_type`` with a
null ring — never silently mis-parsed.

Parsing runs per row in a narrow mapInPandas over the VECTOR side (the
dimension table — thousands to millions of rows, not the fact side), so
python-loop cost is bounded by layer size, same posture as
split_antimeridian."""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_T_POLYGON = 3
_T_MULTIPOLYGON = 6

_GEOM_NAMES = {1: "POINT", 2: "LINESTRING", 3: "POLYGON", 4: "MULTIPOINT",
               5: "MULTILINESTRING", 6: "MULTIPOLYGON",
               7: "GEOMETRYCOLLECTION"}


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def order(self) -> str:
        b = self.buf[self.pos]
        self.pos += 1
        if b == 1:
            return "<"
        if b == 0:
            return ">"
        raise ValueError(f"bad WKB byte-order marker {b}")

    def u32(self, bo: str) -> int:
        v = struct.unpack_from(bo + "I", self.buf, self.pos)[0]
        self.pos += 4
        return v

    def ring(self, bo: str) -> list:
        n = self.u32(bo)
        pts = np.frombuffer(self.buf, dtype=bo + "f8", count=2 * n,
                            offset=self.pos).reshape(n, 2)
        self.pos += 16 * n
        # wire (x=lon, y=lat) closed → engine [lat, lon] open
        if n > 1 and pts[0, 0] == pts[-1, 0] and pts[0, 1] == pts[-1, 1]:
            pts = pts[:-1]
        return [[float(y), float(x)] for x, y in pts]


def _parse_one_polygon(r: "_Reader", bo: str) -> tuple[list, list]:
    n_rings = r.u32(bo)
    if n_rings == 0:
        raise ValueError("WKB polygon with zero rings")
    outer = r.ring(bo)
    holes = [r.ring(bo) for _ in range(n_rings - 1)]
    return outer, holes


def parse_wkb(buf: bytes) -> tuple[str, list]:
    """WKB bytes → (geom_type_name, [(ring, holes), ...parts]) — parts
    list empty for unsupported types. 2-D only; the Z/M/SRID flag bits
    (ISO 13249 / EWKB) raise rather than mis-read coordinates."""
    r = _Reader(bytes(buf))
    bo = r.order()
    t = r.u32(bo)
    if t & 0xE0000000 or t > 7:
        raise ValueError(f"unsupported WKB flags/type 0x{t:08x} "
                         "(2-D OGC types only — no Z/M/SRID variants)")
    name = _GEOM_NAMES.get(t, f"TYPE_{t}")
    if t == _T_POLYGON:
        return name, [_parse_one_polygon(r, bo)]
    if t == _T_MULTIPOLYGON:
        n = r.u32(bo)
        parts = []
        for _ in range(n):
            bo_i = r.order()
            ti = r.u32(bo_i)
            if ti != _T_POLYGON:
                raise ValueError(f"MultiPolygon member of type {ti}")
            parts.append(_parse_one_polygon(r, bo_i))
        return name, parts
    return name, []


_REGIONS_OUT = ("poly_id long, part int, ring array<array<double>>, "
                "holes array<array<array<double>>>, lat_min double, "
                "lat_max double, lon_min double, lon_max double, "
                "geom_type string")


def read_wkb(df: DataFrame, wkb_col: str = "wkb",
             id_col: str | None = None) -> DataFrame:
    """Binary WKB column → the engine's regions shape, one row per
    member polygon (same contract as read_wkt/read_geojson). ``poly_id``
    is ``id_col`` when given, else a deterministic 63-bit hash of the
    wkb bytes."""
    cols = [F.col(wkb_col).alias("_wkb")]
    cols.append((F.col(id_col).cast("long") if id_col
                 else F.abs(F.xxhash64(F.col(wkb_col)))).alias("_pid"))
    src = df.select(*cols)

    def gen(batches):
        for pdf in batches:
            out = []
            for wkb, pid in zip(pdf["_wkb"], pdf["_pid"]):
                try:
                    name, parts = parse_wkb(wkb)
                # struct.error / IndexError: truncated or empty buffers —
                # must surface as INVALID rows, not kill the ingest task
                except (ValueError, struct.error, IndexError):
                    out.append((int(pid), 0, None, [], None, None, None,
                                None, "INVALID"))
                    continue
                if not parts:
                    out.append((int(pid), 0, None, [], None, None, None,
                                None, name))
                    continue
                for k, (ring, holes) in enumerate(parts):
                    arr = np.asarray(ring, dtype=np.float64)
                    out.append((int(pid), k, ring, holes,
                                float(arr[:, 0].min()),
                                float(arr[:, 0].max()),
                                float(arr[:, 1].min()),
                                float(arr[:, 1].max()), name))
            yield pd.DataFrame(out, columns=[
                "poly_id", "part", "ring", "holes", "lat_min", "lat_max",
                "lon_min", "lon_max", "geom_type"])

    return src.mapInPandas(gen, _REGIONS_OUT)


def _emit_polygon_body(ring, holes) -> bytes:
    """Ring list (+holes) → little-endian polygon body (ring count +
    closed rings of (lon, lat) doubles)."""
    rings = [ring] + (list(holes) if holes is not None else [])
    out = [struct.pack("<I", len(rings))]
    for rg in rings:
        arr = np.asarray([list(v) for v in rg], dtype=np.float64)
        closed = np.vstack([arr, arr[:1]])
        out.append(struct.pack("<I", len(closed)))
        out.append(np.column_stack([closed[:, 1], closed[:, 0]])
                   .astype("<f8").tobytes())
    return b"".join(out)


def to_wkb(regions: DataFrame, ring_col: str = "ring",
           holes_col: str = "holes") -> DataFrame:
    """regions → (poly_id, wkb) little-endian POLYGON bytes."""
    has_holes = holes_col in regions.columns
    cols = ["poly_id", ring_col] + ([holes_col] if has_holes else [])

    def gen(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                ring = getattr(row, ring_col)
                holes = getattr(row, holes_col) if has_holes else []
                out.append((int(row.poly_id),
                            struct.pack("<BI", 1, _T_POLYGON)
                            + _emit_polygon_body(ring, holes)))
            yield pd.DataFrame(out, columns=["poly_id", "wkb"])

    return regions.select(*cols).mapInPandas(gen,
                                             "poly_id long, wkb binary")


def to_wkb_multi(regions: DataFrame, ring_col: str = "ring",
                 part_col: str = "part",
                 holes_col: str = "holes") -> DataFrame:
    """Part rows → one MULTIPOLYGON per poly_id, members in part order
    (single-part ids emit a 1-member MultiPolygon for uniform shape;
    same convention as to_wkt_multi). One groupBy shuffle."""
    has_holes = holes_col in regions.columns

    def per_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(part_col)
        body = [struct.pack("<BII", 1, _T_MULTIPOLYGON, len(pdf))]
        for row in pdf.itertuples(index=False):
            holes = getattr(row, holes_col) if has_holes else []
            body.append(struct.pack("<BI", 1, _T_POLYGON)
                        + _emit_polygon_body(getattr(row, ring_col), holes))
        return pd.DataFrame({"poly_id": [int(key[0])],
                             "wkb": [b"".join(body)]})

    cols = ["poly_id", part_col, ring_col] + ([holes_col] if has_holes
                                              else [])
    return (regions.select(*cols).groupBy("poly_id")
            .applyInPandas(per_group, "poly_id long, wkb binary"))
