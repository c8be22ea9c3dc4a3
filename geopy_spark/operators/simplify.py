"""Region simplification operator (G21, round 5): Douglas-Peucker over
a regions-schema frame — one narrow Arrow-batched map, rings and holes
simplified per row, bbox recomputed, hole rings that collapse are
dropped. Explicitly LOSSY (see kernels/simplify) — a preprocessing
choice for display/tiling/approximate analytics, never called
implicitly by the exact joins."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def simplify_regions(regions: DataFrame, tol_deg: float,
                     ring_col: str = "ring",
                     holes_col: str = "holes") -> DataFrame:
    """Same schema out; every original vertex stays within ``tol_deg``
    of its simplified boundary. Hole rings simplifying below 3 vertices
    vanish (their area is below tolerance by construction)."""
    from ..kernels.simplify import simplify_ring

    schema = regions.schema
    cols = list(regions.columns)
    bbox = [c for c in ("lat_min", "lat_max", "lon_min", "lon_max")
            if c in cols]

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                yield pdf
                continue
            rings, holes_v = pdf[ring_col].values, None
            if holes_col in cols:
                holes_v = pdf[holes_col].values
            new_r = np.empty(len(pdf), dtype=object)
            new_h = np.empty(len(pdf), dtype=object)
            nb = {c: pdf[c].to_numpy(np.float64, na_value=np.nan).copy()
                  for c in bbox}
            for i, r in enumerate(rings):
                if r is None:
                    new_r[i] = r
                    new_h[i] = holes_v[i] if holes_v is not None else []
                    continue
                ring = np.asarray([list(v) for v in r], dtype=np.float64)
                s = simplify_ring(ring, tol_deg)
                new_r[i] = [list(map(float, v)) for v in s]
                hh = []
                if holes_v is not None and holes_v[i] is not None:
                    for h in holes_v[i]:
                        sh = simplify_ring(
                            np.asarray([list(v) for v in h],
                                       dtype=np.float64), tol_deg)
                        if len(sh) >= 3:
                            hh.append([list(map(float, v)) for v in sh])
                new_h[i] = hh
                for c, val in (("lat_min", s[:, 0].min()),
                               ("lat_max", s[:, 0].max()),
                               ("lon_min", s[:, 1].min()),
                               ("lon_max", s[:, 1].max())):
                    if c in nb:
                        nb[c][i] = float(val)
            out = pdf.copy()
            out[ring_col] = new_r
            if holes_col in cols:
                out[holes_col] = new_h
            for c in bbox:
                out[c] = nb[c]
            yield out

    return regions.mapInPandas(gen, schema)
