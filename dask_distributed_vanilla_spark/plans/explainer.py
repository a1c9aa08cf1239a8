"""Physical-plan assertions.

The reference has no optimizer (SURVEY.md §4.1) — filters run where
written. Here the plan-shape properties that make the engine viable at
100 TB (scan-level filter pushdown, column pruning, broadcast dimension
joins, no cartesian products on fact tables) are *asserted* in tests via
these helpers, so a regression in plan quality fails CI, not the 100 TB
run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters sections of every scan in the plan."""
    plan = formatted_plan(df)
    return "\n".join(line.strip() for line in plan.splitlines() if "PushedFilters" in line)


def read_schemas(df: DataFrame) -> str:
    plan = formatted_plan(df)
    return "\n".join(line.strip() for line in plan.splitlines() if "ReadSchema" in line)


def assert_pushed(df: DataFrame, *fragments: str) -> None:
    got = pushed_filters(df)
    for frag in fragments:
        assert frag in got, f"expected pushed filter {frag!r}; scans show:\n{got}"


def assert_pruned(df: DataFrame, table_marker: str, forbidden_column: str) -> None:
    """Assert the scan of a table does NOT read a column (pruning works)."""
    for line in read_schemas(df).splitlines():
        if table_marker in line:
            assert forbidden_column not in line, (
                f"scan {line} reads {forbidden_column}, pruning failed"
            )
            return
    raise AssertionError(f"no scan matching {table_marker} in plan")


def count_broadcast_joins(df: DataFrame) -> int:
    return formatted_plan(df).count("BroadcastHashJoin")


def count_sortmerge_joins(df: DataFrame) -> int:
    return formatted_plan(df).count("SortMergeJoin")
