"""The two relational rows retired from the 50-name driver registry in
round 5 (to make room for the G17/G18 spatial rows) stay oracle-checked
here, so their operator coverage (R24 sampling surface, R19/R21 scalar
medley) remains witnessed — the same Spark-vs-DuckDB compare the driver
runs, at sf0.001."""

import duckdb
import pandas as pd
import pytest

from geopy_spark.entry_queries import RETIRED_ORACLES, RETIRED_QUERIES
from geopy_spark.session import TPCH_TABLES

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(RETIRED_QUERIES))
def test_retired_query_matches_oracle(spark, name):
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM read_parquet('{SF}/{t}.parquet')")
    got = _canon(RETIRED_QUERIES[name](spark, SF).toPandas())
    want = _canon(con.execute(RETIRED_ORACLES[name]).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) and len(got) > 0
    for c in got.columns:
        a, b = got[c], want[c]
        if str(a.dtype).startswith("float"):
            import numpy as np
            assert np.allclose(a.fillna(-9e99),
                               b.astype(a.dtype).fillna(-9e99), atol=1e-6), c
        else:
            assert a.fillna("§").equals(b.astype(a.dtype).fillna("§")), c
