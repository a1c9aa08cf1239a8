"""Differential correctness: every registered query vs its DuckDB oracle
at sf0.001 (the reference's differential-testing philosophy,
`distributed/tests/test_collections.py:70-73`, with a stronger oracle —
SURVEY.md §5.2). tools/check.py runs the same comparison at sf0.01."""

from __future__ import annotations

import pytest

from dask_distributed_vanilla_spark.plans.registry import all_oracles, all_queries
from tests.conftest import SF_SMOKE, assert_matches_oracle

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, oracle, name):
    sdf = QUERIES[name](spark, SF_SMOKE).toPandas()
    sql = ORACLES.get(name)
    if sql is None:
        assert len(sdf) >= 0  # rows-only contract: runs and yields a frame
        return
    odf = oracle.execute(sql).fetchdf()
    assert_matches_oracle(sdf, odf, name)


def test_entry_smoke(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(mod.queries()) >= set(mod.oracle_sql())
