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
