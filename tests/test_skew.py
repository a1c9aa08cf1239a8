"""Salted aggregation must equal direct groupBy (decomposable fns)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dask_distributed_vanilla_spark.catalog import load_table
from dask_distributed_vanilla_spark.functions.skew import salted_agg, salted_avg, top_frequent_keys
from tests.conftest import SF_SMOKE


def test_salted_agg_matches_direct(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    direct = {
        (r.event_type, round(r.total, 6), r.n, round(r.mx, 6))
        for r in ev.groupBy("event_type")
        .agg(
            F.sum("value").alias("total"),
            F.count("value").alias("n"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r.event_type, round(r.total, 6), r.n, round(r.mx, 6))
        for r in salted_agg(
            ev,
            ["event_type"],
            {"total": ("sum", "value"), "n": ("count", "value"), "mx": ("max", "value")},
            n_salt=8,
        ).collect()
    }
    assert direct == salted


def test_salted_avg(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    got = {r.event_type: round(r.avg_value, 6) for r in salted_avg(ev, ["event_type"], "value").collect()}
    want = {
        r.event_type: round(r.a, 6)
        for r in ev.groupBy("event_type").agg(F.avg("value").alias("a")).collect()
    }
    assert got == want


def test_non_decomposable_rejected(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    with pytest.raises(ValueError, match="not decomposable"):
        salted_agg(ev, ["event_type"], {"bad": ("median", "value")})


def test_top_frequent_keys(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    top = top_frequent_keys(ev, "event_type", n=3).collect()
    assert len(top) == 3
    assert abs(sum(r.share for r in top) <= 1.0001)
