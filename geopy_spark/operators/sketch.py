"""Distributed sketch operators. Currently: t-digest quantiles
(kernels/tdigest) with the algebraic-aggregate shape — per-partition
partial sketches, one shuffle of tiny centroid arrays, per-key merge.

100 TB shape: phase 1 is a narrow mapInPandas over whatever partitions
the scan produced (no pre-shuffle of the data); each partition chunk
contributes ≤2δ centroids per key (~1.6 KB at δ=100), so the ONLY
shuffle moves O(partitions × keys × δ) floats — independent of row
count. Phase 2 merges per key and reads off the requested quantiles.
This is how a quantile aggregate must be built at 10^12 rows: the raw
values never shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..kernels import tdigest as T


def tdigest_quantiles(df: DataFrame, key_cols: list[str], value_col: str,
                      qs: list[float], *, delta: int = T.DEFAULT_DELTA,
                      out_names: list[str] | None = None) -> DataFrame:
    """Per-key quantile estimates: (keys..., <one double per q>).

    out_names defaults to td_q<percent> per quantile.
    """
    if out_names is None:
        out_names = [f"td_q{int(round(q * 100)):02d}" for q in qs]
    assert len(out_names) == len(qs)

    key_struct = df.select(*key_cols).schema
    key_ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                        for f in key_struct.fields)
    partial_schema = (f"{key_ddl}, means array<double>, weights array<double>")
    out_schema = key_ddl + ", " + ", ".join(f"{n} double" for n in out_names)

    def _partial(it):
        for pdf in it:
            rows = []
            for key, g in pdf.groupby(key_cols, sort=False):
                if not isinstance(key, tuple):
                    key = (key,)
                d = T.build(g[value_col].to_numpy(dtype=np.float64), delta)
                rows.append((*key, d[:, 0].tolist(), d[:, 1].tolist()))
            yield pd.DataFrame(rows,
                               columns=[*key_cols, "means", "weights"])

    partials = df.select(*key_cols, value_col).mapInPandas(
        _partial, partial_schema)

    def _merge(pdf: pd.DataFrame) -> pd.DataFrame:
        digests = [np.column_stack([np.asarray(m), np.asarray(w)])
                   for m, w in zip(pdf["means"], pdf["weights"])]
        d = T.merge(digests, delta)
        vals = [T.quantile(d, q) for q in qs]
        head = [pdf[k].iloc[0] for k in key_cols]
        return pd.DataFrame([head + vals], columns=[*key_cols, *out_names])

    return partials.groupBy(*key_cols).applyInPandas(_merge, out_schema)
