"""Spark surface of the qcell index (SURVEY.md §2.2 G1-G3).

* ``cell_encode_udf`` — vectorized pandas UDF over the numpy kernel (the
  encode needs float→Morton bit interleave, not expressible in Column
  algebra).
* ``cell_parent_col`` / ``cell_level_col`` — pure Column bit math
  (shiftright/masks), zero Python: hierarchy navigation stays inside
  whole-stage codegen (G2).
* ``cell_ring_udf`` — k-ring neighbors as ArrayType(Long) for explode-based
  kNN expansion (G3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from ..kernels import cells as K


def cell_encode_udf(lat: Column, lon: Column, level: int) -> Column:
    @F.pandas_udf(LongType())
    def _enc(la: pd.Series, lo: pd.Series) -> pd.Series:
        return pd.Series(K.cell_encode(la.to_numpy(np.float64),
                                       lo.to_numpy(np.float64), level))
    return _enc(lat, lon)


def cell_level_col(cell: Column) -> Column:
    return cell.bitwiseAND(F.lit(31))


def cell_parent_expr(cell_name: str, parent_level: int) -> Column:
    """Ancestor id via Column bit math (no UDF) — mirrors
    kernels.cells.cell_parent; ``cell_name`` is a column name/SQL expr."""
    return F.expr(
        f"shiftleft(shiftright(shiftright({cell_name}, 5), "
        f"2 * (CAST(({cell_name} & 31) AS INT) - {parent_level})), 5) | {parent_level}"
    )


def cell_ring_udf(cell: Column, r: int) -> Column:
    @F.pandas_udf(ArrayType(LongType()))
    def _ring(c: pd.Series) -> pd.Series:
        rings = K.cell_ring(c.to_numpy(np.int64), r)
        return pd.Series([a.tolist() for a in rings])
    return _ring(cell)


def cell_disk_udf(cell: Column, r: int) -> Column:
    """All cells with Chebyshev distance ≤ r (union of rings 0..r)."""
    @F.pandas_udf(ArrayType(LongType()))
    def _disk(c: pd.Series) -> pd.Series:
        arr = c.to_numpy(np.int64)
        parts = [K.cell_ring(arr, k) for k in range(r + 1)]
        return pd.Series([np.concatenate([parts[k][n] for k in range(r + 1)]).tolist()
                          for n in range(len(arr))])
    return _disk(cell)
