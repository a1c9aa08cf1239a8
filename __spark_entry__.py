"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The engine lives in ``dask_distributed_vanilla_spark/``; this module is
a thin re-export of its query registry (plans/registry.py).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from dask_distributed_vanilla_spark.plans import registry


def _ensure_confs(spark: SparkSession) -> None:
    """Apply session confs the engine relies on when the driver built the
    session itself (nanos timestamps in the events fixture, UTC)."""
    for k, v in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        ("spark.sql.shuffle.partitions", "32"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # immutable in this session; catalog handles the fallback


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (A1 pricing summary) on /root/testdata/sf0.001."""
    _ensure_confs(spark)
    from dask_distributed_vanilla_spark.operators.tpch import a1

    return a1(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_confs(spark)
            return fn(spark, sf_dir)

        run.__name__ = fn.__name__
        return run

    return {name: wrap(fn) for name, fn in registry.all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted entries are
    checked rows-only by the driver)."""
    return registry.all_oracles()


def rows_only() -> tuple[str, ...]:
    """Queries whose missing oracle is BY DESIGN (sketch estimates,
    seeded ML, compression ratios — pytest-pinned instead): the driver
    may echo this so their CORRECTNESS rows read ``rows_only: true``
    rather than an ``err: "no_oracle"`` that looks like a failure."""
    return registry.rows_only()
