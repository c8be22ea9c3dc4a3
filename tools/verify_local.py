"""Local replica of the driver's correctness gate.

Runs every queries()[name] on Spark at sf0.01 and the matching
oracle_sql()[name] on DuckDB over the same parquet, then compares
row count + order-insensitive value hash with columns sorted by name
(floats rounded to 9 significant-ish decimals before hashing, matching
the spirit of the driver's compare). Usage:

    python tools/verify_local.py [name ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

from __spark_entry__ import entry, oracle_sql, queries  # noqa: E402
from geopy_spark.session import TPCH_TABLES, get_spark  # noqa: E402

import os

SF_DIR = os.environ.get("SPARK_GRAFT_VERIFY_SF_DIR", "/root/testdata/sf0.01")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main(names: list[str]) -> int:
    spark = get_spark("verify_local")
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    qs, os_ = queries(), oracle_sql()
    todo = names or list(qs)
    n_pass = n_fail = 0
    for name in todo:
        try:
            sdf = qs[name](spark, SF_DIR).toPandas()
            if name not in os_:
                print(f"  {name:28s} rows-only: {len(sdf)} rows  OK(no-oracle)")
                continue
            odf = con.execute(os_[name]).df()
            a, b = canon(sdf), canon(odf)
            if list(a.columns) != list(b.columns):
                print(f"✗ {name:28s} SCHEMA  spark={list(a.columns)} duck={list(b.columns)}")
                n_fail += 1
                continue
            if len(a) != len(b):
                print(f"✗ {name:28s} ROWS    spark={len(a)} duck={len(b)}")
                n_fail += 1
                continue
            eq = True
            for c in a.columns:
                av, bv = a[c], b[c].astype(a[c].dtype) if a[c].dtype != b[c].dtype else b[c]
                if str(av.dtype).startswith("float"):
                    import numpy as np
                    col_eq = np.allclose(av.fillna(-9e99), bv.fillna(-9e99), atol=1e-6)
                else:
                    col_eq = av.fillna("§").equals(bv.fillna("§"))
                if not col_eq:
                    eq = False
                    bad = (av.fillna(-9e99) != bv.fillna(-9e99))
                    print(f"✗ {name:28s} VALUES col={c} first-diffs:")
                    print(pd.concat([a[bad].head(3), b[bad].head(3)], axis=1))
                    break
            if eq:
                print(f"✓ {name:28s} {len(a)} rows")
                n_pass += 1
            else:
                n_fail += 1
        except Exception as e:  # noqa: BLE001
            print(f"✗ {name:28s} ERROR   {type(e).__name__}: {str(e)[:400]}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(todo)} total")
    # smoke entry()
    if not names:
        edf = entry(spark)
        print("entry() rows:", edf.count(), "schema:", edf.schema.simpleString())
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
