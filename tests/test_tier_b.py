"""Tier B (full TPC-H with partsupp + extended columns) differential
tests on generated extension fixtures — proves the operator shapes
before the driver ships the FIXTURES.md §3 tables."""

from __future__ import annotations

import duckdb
import pytest

from dask_distributed_vanilla_spark.operators import tpch_full
from tests.conftest import SF_SMOKE, assert_matches_oracle


@pytest.fixture(scope="module")
def tier_b_dir(tmp_path_factory):
    from tools.gen_tier_b import generate

    dst = tmp_path_factory.mktemp("tierb")
    generate(SF_SMOKE, str(dst))
    return str(dst)


@pytest.fixture(scope="module")
def tier_b_oracle(tier_b_dir):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part partsupp orders lineitem".split()
    ):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{tier_b_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(tpch_full.QUERIES))
def test_tier_b_matches_oracle(spark, tier_b_dir, tier_b_oracle, name):
    sdf = tpch_full.QUERIES[name](spark, tier_b_dir).toPandas()
    odf = tier_b_oracle.execute(tpch_full.ORACLES[name]).fetchdf()
    assert len(sdf) > 0, f"{name}: degenerate (empty) result — recalibrate params"
    assert_matches_oracle(sdf, odf, name)
