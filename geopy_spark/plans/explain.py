"""Physical-plan assertions (SURVEY.md §4.1 discipline).

The scale contract isn't just "right answer" — it's "right PLAN": filters
pushed to the scan, partition pruning engaged, small sides broadcast, no
stray exchanges. These helpers make those properties testable so a
regression that silently de-optimizes a plan fails CI, not a cluster run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted")


def plan_text(df: DataFrame) -> str:
    try:
        return formatted_plan(df)
    except Exception:  # noqa: BLE001 — fall back to simple string form
        return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    plan = plan_text(df)
    if "PushedFilters" not in plan:
        raise AssertionError("no PushedFilters section in plan:\n" + plan)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    if not any(fragment in ln for ln in pushed):
        raise AssertionError(
            f"filter fragment {fragment!r} not pushed to scan; pushed lines: {pushed}")


def assert_partition_filter(df: DataFrame, fragment: str) -> None:
    plan = plan_text(df)
    lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    if not any(fragment in ln for ln in lines):
        raise AssertionError(
            f"partition filter {fragment!r} missing; lines: {lines}\n{plan[:2000]}")


def assert_broadcast_join(df: DataFrame) -> None:
    plan = plan_text(df)
    if "BroadcastHashJoin" not in plan and "BroadcastNestedLoopJoin" not in plan:
        raise AssertionError("expected a broadcast join in plan:\n" + plan[:2000])


def count_exchanges(df: DataFrame) -> int:
    return plan_text(df).count("Exchange")


def assert_column_pruned(df: DataFrame, column: str) -> None:
    """Assert the scan does NOT read `column` (ReadSchema pruning)."""
    plan = plan_text(df)
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    if any(column in ln for ln in read):
        raise AssertionError(f"column {column!r} not pruned from scan: {read}")


def count_shuffle_exchanges(df: DataFrame) -> int:
    """Number of SHUFFLE exchanges (hash-partitioning) in the plan.
    Formatted mode labels the tree node bare 'Exchange' and puts the
    partitioning in the detail block ('Arguments: hashpartitioning(...)'),
    so counting the phrase 'Exchange hashpartitioning' (simple-mode form)
    silently counts 0 — this helper counts the detail form. Broadcast
    and round-robin exchanges are not counted."""
    return plan_text(df).count("Arguments: hashpartitioning")
