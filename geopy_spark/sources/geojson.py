"""GeoJSON (RFC 7946) ingest/emit for the polygon side — the standard
geospatial interchange format, so region tables can come from / go to
the outside world instead of only the synthetic fixtures.

Pure Column algebra end to end (`from_json` / `to_json` / `transform` /
`slice` — no UDFs, whole-stage codegen): parsing a million Features is
a map-only JVM stage. Two RFC quirks are handled explicitly:

* **Axis order**: GeoJSON positions are ``[lon, lat]`` (x, y); the
  engine's rings are ``[lat, lon]``. Flipped on the way in and out.
* **Ring closure**: GeoJSON linear rings repeat the first position as
  the last; engine rings are open. The closing vertex is dropped on
  read and re-appended on write.

Scope: ``Polygon`` and ``MultiPolygon`` geometries, outer rings. A
MultiPolygon explodes to one row per member polygon (``part`` column),
all sharing the Feature's ``poly_id`` — and because the spatial join
(G6) dedups result pairs on ``poly_id``, point-in-any-part union
semantics (exactly RFC 7946 MultiPolygon containment, holes aside)
falls out with no operator change. Holes are not cover/PIP-supported
and are dropped per part; other geometry types surface as ``geom_type``
with a null ring for the caller to filter/report — never silently
dropped.

``from_json`` can't give one field two shapes, so the Feature text is
parsed twice — once with Polygon's 3-deep coordinates, once with
MultiPolygon's 4-deep — and the matching parse is picked per row by
``geometry.type`` (the mismatched parse nulls only the coordinates
field; verified behavior). Still a single map-only JVM stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _feature_schema(depth: int) -> str:
    coords = "DOUBLE"
    for _ in range(depth):
        coords = f"ARRAY<{coords}>"
    return ("type STRING, id STRING, properties MAP<STRING, STRING>, "
            f"geometry STRUCT<type: STRING, coordinates: {coords}>")


# geometry.coordinates: Polygon = array<ring>, ring = array<position>;
# MultiPolygon = array<array<ring>>
_FEATURE_SCHEMA = _feature_schema(3)
_FEATURE_SCHEMA_MULTI = _feature_schema(4)
_COLLECTION_SCHEMA = f"type STRING, features ARRAY<STRUCT<{_FEATURE_SCHEMA}>>"
_COLLECTION_SCHEMA_MULTI = (
    f"type STRING, features ARRAY<STRUCT<{_FEATURE_SCHEMA_MULTI}>>")


def _ring_from_coords(coords: Column) -> Column:
    """Outer ring, [lon,lat]→[lat,lon], closing vertex dropped."""
    outer = coords.getItem(0)
    opened = F.slice(outer, 1, F.greatest(F.size(outer) - 1, F.lit(1)))
    return F.transform(opened, lambda p: F.array(p.getItem(1), p.getItem(0)))


def read_geojson(df: DataFrame, json_col: str = "geojson",
                 collection: bool = False) -> DataFrame:
    """Parse a string column of GeoJSON Features (or FeatureCollections
    with ``collection=True``) into the engine's regions shape:
    (poly_id, part, name, ring, lat_min/lat_max/lon_min/lon_max,
    geom_type, properties). ``poly_id`` is the Feature ``id`` when
    numeric, else a deterministic 63-bit hash of the feature text;
    ``name`` prefers properties['name']. A MultiPolygon Feature yields
    one row per member polygon (``part`` = 0..n-1, same poly_id);
    a Polygon yields one row with part=0; unsupported geometry types
    yield one row with a null ring and their ``geom_type``."""
    if collection:
        feats = (df.select(
            F.from_json(F.col(json_col), _COLLECTION_SCHEMA).alias("fc3"),
            F.from_json(F.col(json_col), _COLLECTION_SCHEMA_MULTI)
            .alias("fc4"))
            .select(F.explode(F.arrays_zip(
                F.col("fc3.features").alias("f3"),
                F.col("fc4.features").alias("f4"))).alias("z"))
            .select(F.col("z.f3").alias("f3"), F.col("z.f4").alias("f4")))
    else:
        feats = df.select(
            F.from_json(F.col(json_col), _FEATURE_SCHEMA).alias("f3"),
            F.from_json(F.col(json_col), _FEATURE_SCHEMA_MULTI).alias("f4"))
    gtype = F.col("f3.geometry.type")
    # per-part polygon coordinates, 4-deep either way; unsupported → null
    parts = (F.when(gtype == "Polygon",
                    F.array(F.col("f3.geometry.coordinates")))
             .when(gtype == "MultiPolygon",
                   F.col("f4.geometry.coordinates")))
    feats = feats.select(
        "f3",
        F.col("f4.geometry.coordinates").alias("mcoords"),
        F.posexplode_outer(parts).alias("part", "rings"))
    ring = _ring_from_coords(F.col("rings"))
    lats = F.transform(ring, lambda v: v.getItem(0))
    lons = F.transform(ring, lambda v: v.getItem(1))
    pid = F.coalesce(
        F.col("f3.id").try_cast("long"),  # non-numeric foreign id → null
        # hash the 3-deep parse text; its coordinates field is nulled for
        # a MultiPolygon, so fold the WHOLE-feature 4-deep coordinates in
        # as a second arg (identical across the feature's part rows)
        F.abs(F.xxhash64(F.to_json(F.col("f3")),
                         F.to_json(F.col("mcoords")))))
    return feats.select(
        pid.alias("poly_id"),
        F.col("part"),
        F.coalesce(F.col("f3.properties")["name"], F.col("f3.id"),
                   F.lit("unnamed")).alias("name"),
        ring.alias("ring"),
        F.array_min(lats).alias("lat_min"), F.array_max(lats).alias("lat_max"),
        F.array_min(lons).alias("lon_min"), F.array_max(lons).alias("lon_max"),
        gtype.alias("geom_type"),
        F.col("f3.properties").alias("properties"),
    )


def to_geojson(regions: DataFrame, ring_col: str = "ring") -> DataFrame:
    """regions → (poly_id, geojson) Feature strings: ring re-closed,
    [lat,lon]→[lon,lat], name carried in properties."""
    closed = F.concat(F.col(ring_col), F.slice(F.col(ring_col), 1, 1))
    coords = F.array(F.transform(
        closed, lambda p: F.array(p.getItem(1), p.getItem(0))))
    feature = F.struct(
        F.lit("Feature").alias("type"),
        F.col("poly_id").cast("string").alias("id"),
        F.create_map(F.lit("name"), F.col("name")).alias("properties"),
        F.struct(F.lit("Polygon").alias("type"),
                 coords.alias("coordinates")).alias("geometry"),
    )
    return regions.select("poly_id", F.to_json(feature).alias("geojson"))


def to_geojson_multi(regions: DataFrame, ring_col: str = "ring",
                     part_col: str = "part") -> DataFrame:
    """Part rows (as produced by read_geojson on MultiPolygon input) →
    one ``MultiPolygon`` Feature per poly_id, member polygons in part
    order. A single-part poly_id emits a 1-member MultiPolygon (valid
    RFC 7946) so the coordinates depth is uniform. One shuffle
    (groupBy poly_id); ring math stays in Column algebra."""
    closed = F.concat(F.col(ring_col), F.slice(F.col(ring_col), 1, 1))
    coords3 = F.array(F.transform(
        closed, lambda p: F.array(p.getItem(1), p.getItem(0))))
    grouped = (regions
               .select("poly_id", "name",
                       F.struct(F.col(part_col).alias("part"),
                                coords3.alias("c")).alias("pc"))
               .groupBy("poly_id")
               .agg(F.first("name").alias("name"),
                    F.array_sort(F.collect_list("pc")).alias("pcs")))
    feature = F.struct(
        F.lit("Feature").alias("type"),
        F.col("poly_id").cast("string").alias("id"),
        F.create_map(F.lit("name"), F.col("name")).alias("properties"),
        F.struct(F.lit("MultiPolygon").alias("type"),
                 F.transform(F.col("pcs"), lambda s: s["c"])
                 .alias("coordinates")).alias("geometry"),
    )
    return grouped.select("poly_id", F.to_json(feature).alias("geojson"))


# --------------------------------------------------------------------- WKT

def read_wkt(df: DataFrame, wkt_col: str = "wkt",
             id_col: str | None = None) -> DataFrame:
    """Parse a WKT ``POLYGON ((lon lat, ...))`` or ``MULTIPOLYGON``
    column (the other ubiquitous interchange text format — OGC Simple
    Features) into the regions shape. Same conventions as GeoJSON:
    positions are x y = lon lat, rings are closed on the wire and opened
    here; only the outer ring of each polygon is taken (holes are
    cover-unsupported); a MULTIPOLYGON explodes to one row per member
    polygon (``part``) sharing the row's poly_id, so the spatial join's
    poly_id pair-dedup gives union-of-parts containment. Other geometry
    keywords surface as ``geom_type`` with a null ring — never silently
    mis-parsed. Pure Column algebra (regexp + split + transform).

    MULTIPOLYGON splitting: member polygons are separated by a
    double-paren boundary ``)), ((`` — a hole boundary INSIDE one
    polygon is a single ``), (`` and never matches — then each part's
    outer ring is the text before its first ``)`` (dropping holes),
    after stripping the keyword/paren prefix on the first part."""
    wkt = F.col(wkt_col)
    gtype = F.upper(F.trim(F.regexp_extract(wkt, r"^\s*([A-Za-z]+)", 1)))
    parts_txt = (
        F.when(gtype == "POLYGON",
               F.array(F.regexp_extract(wkt, r"\(\(([^)]*)\)", 1)))
        .when(gtype == "MULTIPOLYGON",
              F.transform(
                  F.split(wkt, r"\)\s*\)\s*,\s*\(\s*\("),
                  # coordinates start with a digit/sign, so the prefix
                  # run of letters/spaces/parens is only ever the
                  # "MULTIPOLYGON (((" head of the first part
                  lambda s: F.regexp_extract(
                      s, r"^[A-Za-z\s]*\(*\s*([^()]*)", 1)))
    )
    pid = F.col(id_col).cast("long") if id_col else F.abs(F.xxhash64(wkt))
    base = df.select(
        pid.alias("poly_id"), gtype.alias("geom_type"),
        F.posexplode_outer(parts_txt).alias("part", "outer_txt"))
    pairs = F.split(F.col("outer_txt"), r"\s*,\s*")
    # try_cast: malformed coordinate tokens parse to null instead of an
    # ANSI cast error — geom_type tells the caller why
    closed = F.transform(pairs, lambda s: F.array(
        F.split(F.trim(s), r"\s+").getItem(1).try_cast("double"),
        F.split(F.trim(s), r"\s+").getItem(0).try_cast("double")))
    ring = F.slice(closed, 1, F.greatest(F.size(closed) - 1, F.lit(1)))
    lats = F.transform(ring, lambda v: v.getItem(0))
    lons = F.transform(ring, lambda v: v.getItem(1))
    return base.select(
        "poly_id", "part",
        ring.alias("ring"),
        F.array_min(lats).alias("lat_min"), F.array_max(lats).alias("lat_max"),
        F.array_min(lons).alias("lon_min"), F.array_max(lons).alias("lon_max"),
        "geom_type",
    )


def to_wkt(regions: DataFrame, ring_col: str = "ring") -> DataFrame:
    """regions → (poly_id, wkt) POLYGON strings (ring re-closed,
    lon-lat order)."""
    closed = F.concat(F.col(ring_col), F.slice(F.col(ring_col), 1, 1))
    pts = F.transform(closed, lambda p: F.concat_ws(
        " ", p.getItem(1).cast("string"), p.getItem(0).cast("string")))
    return regions.select(
        "poly_id",
        F.concat(F.lit("POLYGON (("), F.array_join(pts, ", "),
                 F.lit("))")).alias("wkt"))


def to_wkt_multi(regions: DataFrame, ring_col: str = "ring",
                 part_col: str = "part") -> DataFrame:
    """Part rows → one ``MULTIPOLYGON ((( ... )), (( ... )))`` string
    per poly_id, member polygons in part order (single-part ids emit a
    1-member MULTIPOLYGON for uniform shape). One groupBy shuffle."""
    closed = F.concat(F.col(ring_col), F.slice(F.col(ring_col), 1, 1))
    pts = F.transform(closed, lambda p: F.concat_ws(
        " ", p.getItem(1).cast("string"), p.getItem(0).cast("string")))
    member = F.concat(F.lit("(("), F.array_join(pts, ", "), F.lit("))"))
    grouped = (regions
               .select("poly_id",
                       F.struct(F.col(part_col).alias("part"),
                                member.alias("m")).alias("pm"))
               .groupBy("poly_id")
               .agg(F.array_sort(F.collect_list("pm")).alias("pms")))
    return grouped.select(
        "poly_id",
        F.concat(F.lit("MULTIPOLYGON ("),
                 F.array_join(F.transform(F.col("pms"), lambda s: s["m"]),
                              ", "),
                 F.lit(")")).alias("wkt"))
