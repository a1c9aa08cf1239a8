"""Skew mitigation utilities.

Where skew actually bites on Spark — measured, not assumed:

- Skewed *joins*: AQE splits oversized partitions automatically.
- Skewed *decomposable aggregations* (sum/count/min/max): map-side
  partial aggregation already caps the hot key's shuffle traffic at one
  partial row per map partition, so a direct groupBy is skew-safe AND
  faster than salting (the extra shuffle only adds cost — see
  tools/bench measurements in BENCH aux). `salted_agg` remains for the
  regimes where the partial hash map itself degrades (group-count per
  mapper so high it spills / falls back to sort).
- Skewed *grouped-map UDFs* (`applyInPandas`): FlatMapGroupsInPandas
  has NO partial aggregation — every row of the hot key funnels through
  ONE Python worker's Arrow stream. This is the case salting genuinely
  fixes (`salted_grouped_apply`): stage 1 applies the UDF per
  (key, salt) so the hot key spreads over n_salt workers, stage 2
  assembles the partials with built-ins. At 100 TB, a key holding 10%
  of rows turns a per-group pandas pass from one multi-hour straggler
  into n_salt parallel streams.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_STAGE1 = {
    "sum": F.sum,
    "count": F.count,
    "min": F.min,
    "max": F.max,
}
_STAGE2 = {
    "sum": F.sum,
    "count": F.sum,  # counts combine by summing partials
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salt: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``aggs`` maps output column → (fn, input column) with fn in
    sum/count/min/max, e.g. ``{"total": ("sum", "value"), "n": ("count",
    "value")}``. Results are identical to a direct groupBy (decomposable
    fns only); the first shuffle spreads each key across ``n_salt``
    reducers.
    """
    for out, (fn, _) in aggs.items():
        if fn not in _STAGE1:
            raise ValueError(f"{out}: {fn!r} is not decomposable (use sum/count/min/max)")
    salted = df.withColumn("_salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(n_salt)))
    stage1 = salted.groupBy(*keys, "_salt").agg(
        *[_STAGE1[fn](col).alias(out) for out, (fn, col) in aggs.items()]
    )
    return stage1.groupBy(*keys).agg(
        *[_STAGE2[fn](out).alias(out) for out, (fn, _) in aggs.items()]
    )


def salted_avg(df: DataFrame, keys: list[str], col: str, n_salt: int = 16) -> DataFrame:
    """AVG via salted sum+count assembled at the final stage."""
    parts = salted_agg(
        df, keys, {"_sum": ("sum", col), "_cnt": ("count", col)}, n_salt
    )
    return parts.select(*keys, (F.col("_sum") / F.col("_cnt")).alias(f"avg_{col}"))


def salted_grouped_apply(
    df: DataFrame,
    keys: list[str],
    partial_fn,
    partial_schema: str,
    combine: dict[str, tuple[str, str]],
    n_salt: int = 32,
) -> DataFrame:
    """Skew-safe grouped-map UDF.

    ``partial_fn`` is an applyInPandas function computing decomposable
    partials per (keys, salt) group; ``combine`` maps output column →
    (fn, partial column) with fn in sum/count/min/max and assembles the
    partials with built-in (JVM) aggregates. A hot key is processed by
    ``n_salt`` Python workers instead of one.
    """
    for out, (fn, _) in combine.items():
        if fn not in _STAGE2:
            raise ValueError(f"{out}: {fn!r} is not a decomposable combine")
    salted = df.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salt))
    )
    part = salted.groupBy(*keys, "_salt").applyInPandas(partial_fn, partial_schema)
    return part.groupBy(*keys).agg(
        *[_STAGE2[fn](col).alias(out) for out, (fn, col) in combine.items()]
    )


def partition_partial_apply(
    df: DataFrame,
    keys: list[str],
    partial_fn,
    partial_schema: str,
    combine: dict[str, tuple[str, str]],
) -> DataFrame:
    """Map-side combine for pandas UDFs — the strongest form of the skew
    fix: ``partial_fn`` runs once per *input-partition Arrow batch*
    (mapInPandas, pdf → one partial row per key present), so NO raw row
    is ever shuffled; only the tiny partials move, and the final
    ``combine`` is a built-in aggregation. A hot key contributes one
    partial per partition — exactly the guarantee partial aggregation
    gives decomposable built-ins, recovered for the pandas path.

    Prefer this over `salted_grouped_apply` whenever the partial is
    per-batch computable; use salting only when the UDF needs the whole
    (key, salt) group in one frame (e.g. sorts within the group).
    """
    for out, (fn, _) in combine.items():
        if fn not in _STAGE2:
            raise ValueError(f"{out}: {fn!r} is not a decomposable combine")

    def run_batches(batches):
        for pdf in batches:
            if len(pdf):
                yield partial_fn(pdf)

    part = df.mapInPandas(run_batches, partial_schema)
    return part.groupBy(*keys).agg(
        *[_STAGE2[fn](col).alias(out) for out, (fn, col) in combine.items()]
    )


def skew_bench(
    spark, n_rows: int = 4_000_000, hot_tenths: int = 9, reps: int = 2
) -> dict:
    """Planted-hot-key benchmark backing the docstring's claims: one key
    holds hot_tenths/10 of the rows. Times the grouped-map UDF path
    direct vs salted (where salting wins) and the decomposable sum/count
    path (where partial aggregation makes direct the right choice).
    Returns timings + equality flags; surfaced as BENCH aux metrics.
    """
    import time

    import pandas as pd

    df = (
        spark.range(n_rows)
        .select(
            F.when(F.col("id") % 10 < hot_tenths, F.lit("hot"))
            .otherwise(F.concat(F.lit("k"), (F.col("id") % 200).cast("string")))
            .alias("key"),
            (F.col("id") % 997).cast("double").alias("value"),
        )
        .persist()
    )
    df.count()

    def stat(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"key": [pdf["key"].iloc[0]], "s": [pdf["value"].sum()], "n": [len(pdf)]}
        )

    def batch_stat(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby("key", sort=False)["value"]
        return pd.DataFrame(
            {"key": g.sum().index, "s": g.sum().to_numpy(), "n": g.size().to_numpy()}
        )

    def run(fn):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return round(min(ts), 3)

    combine = {"s": ("sum", "s"), "n": ("sum", "n")}
    direct_udf = lambda: df.groupBy("key").applyInPandas(  # noqa: E731
        stat, "key string, s double, n long"
    ).collect()
    salted_udf = lambda: salted_grouped_apply(  # noqa: E731
        df, ["key"], stat, "key string, s double, n long", combine
    ).collect()
    partial_udf = lambda: partition_partial_apply(  # noqa: E731
        df, ["key"], batch_stat, "key string, s double, n long", combine
    ).collect()
    direct_sum = lambda: df.groupBy("key").agg(  # noqa: E731
        F.sum("value"), F.count("value")
    ).collect()
    salted_sum = lambda: salted_agg(  # noqa: E731
        df, ["key"], {"s": ("sum", "value"), "n": ("count", "value")}
    ).collect()

    out = {
        "n_rows": n_rows,
        "hot_share": hot_tenths / 10,
        "grouped_udf_direct_sec": run(direct_udf),
        "grouped_udf_salted_sec": run(salted_udf),
        "grouped_udf_partition_partial_sec": run(partial_udf),
        "sum_direct_sec": run(direct_sum),
        "sum_salted_sec": run(salted_sum),
    }
    df.unpersist()
    return out


def top_frequent_keys(df: DataFrame, key: Column | str, n: int = 10) -> DataFrame:
    """Diagnostic: the heaviest keys and their share — what to salt."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("rows"))
        .withColumn("share", F.col("rows") / F.lit(total))
        .orderBy(F.desc("rows"))
        .limit(n)
    )
