"""Tier B (full TPC-H over the inline-derived extension schema,
sources/tierb.py) differential tests — exactly the driver's gate shape:
Spark builder vs DuckDB oracle over the SAME base parquet, with the
oracle deriving partsupp/extended columns via the tierb CTE prefix."""

from __future__ import annotations

import duckdb
import pytest

from dask_distributed_vanilla_spark.catalog import TABLES
from dask_distributed_vanilla_spark.operators import tpch_full
from tests.conftest import SF_SMOKE, assert_matches_oracle


@pytest.fixture(scope="module")
def tier_b_oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(tpch_full.QUERIES))
def test_tier_b_matches_oracle(spark, tier_b_oracle, name):
    sdf = tpch_full.QUERIES[name](spark, SF_SMOKE).toPandas()
    odf = tier_b_oracle.execute(tpch_full.ORACLES[name]).fetchdf()
    assert len(sdf) > 0, f"{name}: degenerate (empty) result — recalibrate params"
    assert_matches_oracle(sdf, odf, name)
