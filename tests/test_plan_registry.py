"""Registry-wide plan invariants (SURVEY §4.1 discipline, audited
round 3 via tools/plan_audit.py; these pin the audited global shape so
a silent de-optimization fails CI, not a cluster run).

Invariants:
* NO row-at-a-time python evaluation (BatchEvalPython) anywhere in any
  registry query's plan — the single exception is `tile_fanout_udtf`,
  whose Python UDTF surface (R27) evaluates row-wise by API design.
* tile_pyramid stays log-depth: its exchange count tracks the z-level
  ladder (leaf agg + one per rollup level), not a quadratic blowup.
* every query with at least one exchange runs under AQE.
"""

import re

import pytest

from geopy_spark.entry_queries import QUERIES
from geopy_spark.plans.explain import plan_text

SF = "/root/testdata/sf0.001"


def _exchanges(plan: str) -> int:
    return len(re.findall(r"^\(\d+\) Exchange", plan, re.M))


@pytest.fixture(scope="module")
def plans(spark):
    return {name: plan_text(fn(spark, SF)) for name, fn in QUERIES.items()}


def test_no_row_python_outside_udtf(plans):
    offenders = [n for n, p in plans.items()
                 if "BatchEvalPython" in p and n != "tile_fanout_udtf"]
    assert offenders == [], offenders


def test_udtf_surface_is_the_only_row_eval(plans):
    assert "BatchEvalPython" in plans["tile_fanout_udtf"]


def test_tile_pyramid_log_depth(plans):
    # z8..0 = leaf agg + 9 level aggs; allow AQE to merge a couple but
    # fail hard if the ladder ever goes quadratic
    assert _exchanges(plans["tile_pyramid"]) <= 12


def test_exchanges_run_under_aqe(plans):
    offenders = [n for n, p in plans.items()
                 if _exchanges(p) > 0 and "AdaptiveSparkPlan" not in p]
    assert offenders == [], offenders


def test_narrow_queries_stay_shuffle_free(plans):
    # scalar_medley left the 50-row registry in round 5 (subsumed by
    # sql_surface + text_features; still oracle-checked in
    # test_retired_queries.py)
    for name in ("text_features", "normalize_latlon",
                 "destination_point", "dms_parse", "sql_surface",
                 "wav_features", "y4m_frames"):
        assert _exchanges(plans[name]) == 0, name
