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


def test_salted_grouped_apply_matches_direct(spark):
    """Salted grouped-map partials + built-in combine == direct
    applyInPandas over the whole group."""
    import pandas as pd

    from dask_distributed_vanilla_spark.functions.skew import salted_grouped_apply

    df = spark.range(10_000).selectExpr(
        "CASE WHEN id % 4 < 3 THEN 'hot' ELSE concat('k', id % 7) END AS key",
        "CAST(id % 31 AS DOUBLE) AS value",
    )

    def stat(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"key": [pdf["key"].iloc[0]], "s": [pdf["value"].sum()], "n": [len(pdf)]}
        )

    salted = salted_grouped_apply(
        df, ["key"], stat, "key string, s double, n long",
        {"s": ("sum", "s"), "n": ("sum", "n")}, n_salt=8,
    ).toPandas().sort_values("key").reset_index(drop=True)
    direct = (
        df.groupBy("key").applyInPandas(stat, "key string, s double, n long")
        .toPandas().sort_values("key").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(salted, direct)


def test_salted_grouped_apply_rejects_bad_combine(spark):
    import pytest as _pytest

    from dask_distributed_vanilla_spark.functions.skew import salted_grouped_apply

    with _pytest.raises(ValueError):
        salted_grouped_apply(
            spark.range(5), ["id"], lambda p: p, "id long",
            {"x": ("median", "id")},
        )


def test_partition_partial_apply_matches_direct(spark):
    """Zero-raw-shuffle pandas partials == direct grouped-map."""
    import pandas as pd

    from dask_distributed_vanilla_spark.functions.skew import partition_partial_apply

    df = spark.range(20_000).selectExpr(
        "CASE WHEN id % 4 < 3 THEN 'hot' ELSE concat('k', id % 7) END AS key",
        "CAST(id % 31 AS DOUBLE) AS value",
    )

    def batch_stat(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby("key", sort=False)["value"]
        return pd.DataFrame(
            {"key": g.sum().index, "s": g.sum().to_numpy(), "n": g.size().to_numpy()}
        )

    def stat(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"key": [pdf["key"].iloc[0]], "s": [pdf["value"].sum()], "n": [len(pdf)]}
        )

    got = partition_partial_apply(
        df, ["key"], batch_stat, "key string, s double, n long",
        {"s": ("sum", "s"), "n": ("sum", "n")},
    ).toPandas().sort_values("key").reset_index(drop=True)
    exp = (
        df.groupBy("key").applyInPandas(stat, "key string, s double, n long")
        .toPandas().sort_values("key").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)
