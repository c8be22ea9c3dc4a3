"""SQL surface: expose the engine's Column-algebra functions as Spark-4
SQL scalar UDFs (``CREATE OR REPLACE TEMPORARY FUNCTION … RETURN <expr>``)
so the whole engine is usable from plain ``spark.sql`` — the reference's
users query with SQL strings, and this keeps that workflow while staying
100% JVM-side (a SQL scalar UDF inlines into the plan like any
expression: codegen, pushdown and pruning all apply; NOT a python UDF).

The ``RETURN`` bodies are **generated from the Column implementations**
via ``Column.expr().sql()`` — one source of truth, so the SQL surface can
never drift from the DataFrame surface. Python-kernel functions that are
genuinely not expressible as SQL expressions (cell_encode's bit
interleaving, Vincenty's iteration) register as Arrow-batched pandas UDFs
under the same names instead — same name surface, documented slow(er)
path.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

from .functions import geo
from .functions import text as T


def _expr_sql(spark: SparkSession, args_decl: str, col: Column) -> str:
    """Spark-SQL text of a Column expression, obtained by resolving it
    against a typed one-row probe of the declared parameters and taking
    the analyzed expression's ``.sql()`` (Spark-4 classic; Column objects
    no longer expose ``expr()`` directly)."""
    casts = ", ".join(f"CAST(NULL AS {t}) AS {n}" for n, t in
                      (a.strip().split() for a in args_decl.split(",")))
    probe = spark.sql(f"SELECT {casts}")
    sel = probe.select(col.alias("__body"))
    if not hasattr(sel, "_jdf"):  # Spark Connect: no py4j plan access
        raise RuntimeError(
            "_expr_sql needs a classic (py4j) SparkSession to render "
            "Column bodies as SQL; on Spark Connect, "
            "install_sql_functions falls back to the pinned golden "
            "bodies (sql_golden.py) automatically")
    alias = sel._jdf.queryExecution().analyzed().expressions().apply(0)
    return alias.child().sql()


def _scalar_defs() -> list:
    """(name, arg-decls, return-type, Column-built body) per function.
    Bodies reference F.col("<param>") so the generated SQL names match
    the declared parameters."""
    lat1, lon1 = F.col("lat1"), F.col("lon1")
    lat2, lon2 = F.col("lat2"), F.col("lon2")
    lat, lon, z = F.col("lat"), F.col("lon"), F.col("z")
    t = F.col("t")
    # tile_x/tile_y with z as a runtime SQL argument (the Column helpers
    # bake z in as a python int, so rebuild the same algebra over col z)
    n = F.pow(F.lit(2.0), z)
    wrapped = F.pmod(lon + F.lit(180.0), F.lit(360.0)) - F.lit(180.0)
    tile_x_c = F.least(
        F.greatest(F.floor((wrapped + F.lit(180.0)) / F.lit(360.0) * n)
                   .cast("long"), F.lit(0).cast("long")),
        (n - F.lit(1.0)).cast("long"))
    la = F.radians(F.least(F.greatest(lat, F.lit(-85.05112878)),
                           F.lit(85.05112878)))
    merc = F.log(F.tan(la) + F.lit(1.0) / F.cos(la))
    tile_y_c = F.least(
        F.greatest(F.floor((F.lit(1.0) - merc / F.lit(float(__import__("math").pi)))
                           / F.lit(2.0) * n).cast("long"),
                   F.lit(0).cast("long")),
        (n - F.lit(1.0)).cast("long"))
    d4 = "lat1 DOUBLE, lon1 DOUBLE, lat2 DOUBLE, lon2 DOUBLE"
    return [
        ("haversine_m", d4, "DOUBLE", geo.haversine_m(lat1, lon1, lat2, lon2)),
        ("normalize_lon", "lon DOUBLE", "DOUBLE", geo.normalize_lon(lon)),
        ("normalize_lat", "lat DOUBLE", "DOUBLE", geo.normalize_lat(lat)),
        ("tile_x", "lon DOUBLE, z INT", "BIGINT", tile_x_c),
        ("tile_y", "lat DOUBLE, z INT", "BIGINT", tile_y_c),
        ("derived_lat", "k BIGINT", "DOUBLE", geo.derived_lat(F.col("k"))),
        ("derived_lon", "k BIGINT", "DOUBLE", geo.derived_lon(F.col("k"))),
        ("token_count", "t STRING", "INT", T.token_count(t)),
        ("bpe_token_count", "t STRING", "BIGINT", T.bpe_token_count(t)),
        ("punct_ratio", "t STRING", "DOUBLE", T.punct_ratio(t)),
        ("lang_id", "t STRING", "STRING", T.lang_id(t)),
        ("quality_score", "t STRING", "DOUBLE", T.quality_score(t)),
        ("doc_fingerprint", "t STRING", "STRING", T.fingerprint(t)),
    ]


def _is_classic(spark: SparkSession) -> bool:
    """True for a py4j-backed session (Connect DataFrames have no _jdf).
    Seam for tests to force the golden-body fallback path."""
    return hasattr(spark.sql("SELECT 1"), "_jdf")


def install_sql_functions(spark: SparkSession) -> list:
    """Register the engine's SQL surface on this session; returns the
    installed function names. Idempotent (OR REPLACE).

    Classic sessions render the bodies LIVE from the Column defs (single
    source of truth). Spark Connect sessions have no py4j plan access,
    so they register from the pinned golden bodies (``sql_golden.py`` —
    byte-identical text, drift-guarded by a pytest that regenerates from
    the live defs; round 4)."""
    from .sql_golden import GOLDEN_BODIES

    classic = _is_classic(spark)
    names = []
    for name, args, rtype, body in _scalar_defs():
        body_sql = (_expr_sql(spark, args, body) if classic
                    else GOLDEN_BODIES[name])
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({args}) "
                  f"RETURNS {rtype} RETURN {body_sql}")
        names.append(name)

    # python-kernel functions: same names, Arrow-batched pandas UDFs
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType

    from .kernels import cells as K
    from .kernels.geodesy import vincenty_m

    @F.pandas_udf("long", PandasUDFType.SCALAR)
    def _cell_encode(la: pd.Series, lo: pd.Series, level: pd.Series) -> pd.Series:
        # level is a full series (usually a constant literal, but the SQL
        # surface must honour per-row levels): one vectorized kernel call
        # per distinct level in the batch
        import numpy as np
        la_np, lo_np = la.to_numpy(), lo.to_numpy()
        lv_np = level.to_numpy()
        out = np.empty(len(la_np), dtype=np.int64)
        for lv in np.unique(lv_np):
            m = lv_np == lv
            out[m] = K.cell_encode(la_np[m], lo_np[m], int(lv))
        return pd.Series(out)

    @F.pandas_udf("double", PandasUDFType.SCALAR)
    def _geodesic(a: pd.Series, b: pd.Series, c: pd.Series,
                  d: pd.Series) -> pd.Series:
        dist, _ = vincenty_m(a.to_numpy(), b.to_numpy(),
                             c.to_numpy(), d.to_numpy())
        return pd.Series(dist)

    from .kernels import geohash as GH

    @F.pandas_udf("string", PandasUDFType.SCALAR)
    def _geohash_encode(la: pd.Series, lo: pd.Series,
                        prec: pd.Series) -> pd.Series:
        import numpy as np
        la_np = la.to_numpy(np.float64, na_value=np.nan)
        lo_np = lo.to_numpy(np.float64, na_value=np.nan)
        # null/NaN precision rows yield null output instead of crashing
        # the whole batch on int(NaN) (ADVICE r5)
        pr_np = prec.to_numpy(np.float64, na_value=np.nan)
        ok = np.isfinite(la_np) & np.isfinite(lo_np) & np.isfinite(pr_np)
        out = np.full(len(la_np), None, dtype=object)
        for p in np.unique(pr_np[ok]):
            m = (pr_np == p) & ok
            if m.any():
                out[m] = GH.encode(la_np[m], lo_np[m], int(p))
        return pd.Series(out)

    def _gh_decode_part(gh: pd.Series, idx: int) -> pd.Series:
        import numpy as np
        mask = gh.notna().to_numpy()
        out = np.full(len(gh), np.nan)
        if mask.any():
            out[mask] = GH.decode(gh[mask].to_numpy(dtype=str))[idx]
        return pd.Series(out)

    @F.pandas_udf("double", PandasUDFType.SCALAR)
    def _geohash_lat(gh: pd.Series) -> pd.Series:
        return _gh_decode_part(gh, 0)

    @F.pandas_udf("double", PandasUDFType.SCALAR)
    def _geohash_lon(gh: pd.Series) -> pd.Series:
        return _gh_decode_part(gh, 1)

    spark.udf.register("cell_encode", _cell_encode)
    spark.udf.register("geodesic_m", _geodesic)
    spark.udf.register("geohash_encode", _geohash_encode)
    spark.udf.register("geohash_lat", _geohash_lat)
    spark.udf.register("geohash_lon", _geohash_lon)
    return names + ["cell_encode", "geodesic_m", "geohash_encode",
                    "geohash_lat", "geohash_lon"]
