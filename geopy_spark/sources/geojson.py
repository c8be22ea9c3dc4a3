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

Scope: ``Polygon`` geometries (outer ring; holes and MultiPolygon are
not cover/PIP-supported by the engine and surface as ``geom_type`` for
the caller to filter/report — never silently dropped).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# geometry.coordinates for Polygon: array<ring>, ring = array<position>
_FEATURE_SCHEMA = (
    "type STRING, id STRING, properties MAP<STRING, STRING>, "
    "geometry STRUCT<type: STRING, "
    "coordinates: ARRAY<ARRAY<ARRAY<DOUBLE>>>>"
)
_COLLECTION_SCHEMA = f"type STRING, features ARRAY<STRUCT<{_FEATURE_SCHEMA}>>"


def _ring_from_coords(coords: Column) -> Column:
    """Outer ring, [lon,lat]→[lat,lon], closing vertex dropped."""
    outer = coords.getItem(0)
    opened = F.slice(outer, 1, F.greatest(F.size(outer) - 1, F.lit(1)))
    return F.transform(opened, lambda p: F.array(p.getItem(1), p.getItem(0)))


def read_geojson(df: DataFrame, json_col: str = "geojson",
                 collection: bool = False) -> DataFrame:
    """Parse a string column of GeoJSON Features (or FeatureCollections
    with ``collection=True``) into the engine's regions shape:
    (poly_id, name, ring, lat_min/lat_max/lon_min/lon_max, geom_type,
    properties). ``poly_id`` is the Feature ``id`` when numeric, else a
    deterministic 63-bit hash of the feature text; ``name`` prefers
    properties['name']."""
    if collection:
        feats = (df.select(F.from_json(F.col(json_col), _COLLECTION_SCHEMA)
                           .alias("fc"))
                 .select(F.explode("fc.features").alias("f")))
    else:
        feats = df.select(F.from_json(F.col(json_col), _FEATURE_SCHEMA)
                          .alias("f"))
    ring = _ring_from_coords(F.col("f.geometry.coordinates"))
    lats = F.transform(ring, lambda v: v.getItem(0))
    lons = F.transform(ring, lambda v: v.getItem(1))
    pid = F.coalesce(
        F.col("f.id").try_cast("long"),   # non-numeric foreign id → null
        F.abs(F.xxhash64(F.to_json(F.col("f")))))
    return feats.select(
        pid.alias("poly_id"),
        F.coalesce(F.col("f.properties")["name"], F.col("f.id"),
                   F.lit("unnamed")).alias("name"),
        ring.alias("ring"),
        F.array_min(lats).alias("lat_min"), F.array_max(lats).alias("lat_max"),
        F.array_min(lons).alias("lon_min"), F.array_max(lons).alias("lon_max"),
        F.col("f.geometry.type").alias("geom_type"),
        F.col("f.properties").alias("properties"),
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


# --------------------------------------------------------------------- WKT

def read_wkt(df: DataFrame, wkt_col: str = "wkt",
             id_col: str | None = None) -> DataFrame:
    """Parse a WKT ``POLYGON ((lon lat, ...))`` column (the other
    ubiquitous interchange text format — OGC Simple Features) into the
    regions shape. Same conventions as GeoJSON: positions are x y =
    lon lat, rings are closed on the wire and opened here; only the
    outer ring is taken (holes are cover-unsupported); the geometry
    keyword is surfaced as ``geom_type`` so MULTIPOLYGON etc. can be
    filtered/reported, never silently mis-parsed. Pure Column algebra
    (regexp + split + transform)."""
    gtype = F.upper(F.trim(F.regexp_extract(F.col(wkt_col),
                                            r"^\s*([A-Za-z]+)", 1)))
    inner = F.regexp_extract(F.col(wkt_col), r"\(\(([^)]*)\)", 1)
    pairs = F.split(inner, r"\s*,\s*")
    # try_cast: unsupported geometries (MULTIPOLYGON's extra paren lands
    # inside the token) parse to null coordinates instead of an ANSI cast
    # error — geom_type tells the caller why
    closed = F.transform(pairs, lambda s: F.array(
        F.split(F.trim(s), r"\s+").getItem(1).try_cast("double"),
        F.split(F.trim(s), r"\s+").getItem(0).try_cast("double")))
    ring = F.slice(closed, 1, F.greatest(F.size(closed) - 1, F.lit(1)))
    lats = F.transform(ring, lambda v: v.getItem(0))
    lons = F.transform(ring, lambda v: v.getItem(1))
    pid = F.col(id_col).cast("long") if id_col else \
        F.abs(F.xxhash64(F.col(wkt_col)))
    return df.select(
        pid.alias("poly_id"),
        ring.alias("ring"),
        F.array_min(lats).alias("lat_min"), F.array_max(lats).alias("lat_max"),
        F.array_min(lons).alias("lon_min"), F.array_max(lons).alias("lon_max"),
        gtype.alias("geom_type"),
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
