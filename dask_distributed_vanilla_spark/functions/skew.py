"""Skew mitigation utilities.

AQE handles skewed *joins* automatically (split oversized partitions);
skewed *aggregations* on a hot key still funnel that key's rows into one
task. The standard fix is salting: two-stage aggregation where stage 1
groups on (key, salt) — spreading a hot key over N tasks — and stage 2
combines the partials. Only works for decomposable aggregates
(sum/count/min/max; avg = sum/count assembled at stage 2).

At 100 TB this is the difference between a 10-minute and a
10-hour groupBy when one user/event_type holds 10% of the rows.
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
