"""As-of (temporal) join — composed from DataFrame ops.

Absent from the reference surface (SURVEY.md §2.3 "theta/range/as-of —
absent") but a staple of event/feature pipelines: for each left row,
the most recent right row at-or-before its timestamp within a key.

Implementation is the merge-sorted composition (option (a) of the
custom-operator ladder — no UDF): union both sides tagged, one window
pass per key ordered by (ts, tiebreak) carrying the last-seen right row
forward with IGNORE NULLS, then keep the left rows. One shuffle on the
key, linear in |L|+|R| — at 100 TB this beats the range-join quadratic
fallback because no interval pairing ever materializes.

Judged query `e9_asof`: each 'click' event matched to the user's most
recent 'purchase' at-or-before it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dask_distributed_vanilla_spark.catalog import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts_col: str,
    tiebreak: str,
    value_cols: list[str],
) -> DataFrame:
    """For each left row: columns of the most recent right row with
    ``right.ts <= left.ts`` (ties broken by ``tiebreak``, right side
    ordered before left at equal (ts, tiebreak) so equal timestamps
    match). Right rows carry ``value_cols``; output = left columns +
    ``asof_<value_col>`` columns (null when no prior right row)."""
    lt = left.withColumn("_side", F.lit(1))
    rt = right.withColumn("_side", F.lit(0))
    cols = list({*left.columns, *right.columns})
    lt = lt.select(
        *[F.col(c) if c in left.columns else F.lit(None).alias(c) for c in cols], "_side"
    )
    rt = rt.select(
        *[F.col(c) if c in right.columns else F.lit(None).alias(c) for c in cols], "_side"
    )
    merged = lt.unionByName(rt)
    w = (
        Window.partitionBy(by)
        .orderBy(ts_col, "_side", tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Carry ONE struct of all value_cols, non-null exactly for right
    # rows: the match is row-atomic, so a right row with a NULL in one
    # value column can never mix fields from different right rows.
    carry = (
        F.last(
            F.when(F.col("_side") == 0, F.struct(*[F.col(c) for c in value_cols])),
            ignorenulls=True,
        )
        .over(w)
        .alias("_asof")
    )
    carried = merged.select("*", carry)
    return carried.where(F.col("_side") == 1).select(
        *left.columns,
        *[F.col(f"_asof.{c}").alias(f"asof_{c}") for c in value_cols],
    )


def e9_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click joined to the user's most recent purchase at-or-before
    it; first 1000 clicks by event_id."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("p_event_id"), F.col("value").alias("p_value")
    )
    joined = asof_join(
        clicks,
        purchases,
        by="user_id",
        ts_col="ts",
        tiebreak="event_id",
        value_cols=["p_event_id", "p_value"],
    )
    return (
        joined.select(
            "event_id",
            "user_id",
            F.col("asof_p_event_id").alias("last_purchase_id"),
            (F.floor((F.col("asof_p_value")) * 100 + F.lit(0.5)) / 100).alias("last_purchase_value"),
        )
        .orderBy("event_id")
        .limit(1000)
    )


# Oracle mirrors the same merge-sorted formulation (IGNORE NULLS window
# over a row-atomic struct), sidestepping ASOF-JOIN tie ambiguity across
# engines.
E9_SQL = """
WITH merged AS (
  SELECT event_id, user_id, ts, 1 AS side,
         NULL::BIGINT AS p_event_id, NULL::DOUBLE AS p_value
  FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT event_id, user_id, ts, 0 AS side, event_id, value
  FROM events WHERE event_type = 'purchase'),
carried AS (
  SELECT *,
         last_value(CASE WHEN side = 0
                         THEN struct_pack(pe := p_event_id, pv := p_value)
                    END IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY ts, side, event_id
            ROWS UNBOUNDED PRECEDING) AS a
  FROM merged)
SELECT event_id, user_id, a.pe AS last_purchase_id,
       FLOOR((a.pv) * 100 + 0.5) / 100 AS last_purchase_value
FROM carried WHERE side = 1
ORDER BY event_id LIMIT 1000
"""

def within_join(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    id_col: str,
    window_seconds: int,
) -> DataFrame:
    """Temporal proximity self-join: pairs of rows sharing ``keys`` whose
    timestamps differ by ≤ ``window_seconds`` (id_a < id_b each pair
    once). The second temporal-join shape beside as-of (SURVEY.md §2.3
    "theta/range — absent" in the reference).

    Banded, not theta: each left row explodes into its microsecond
    bucket ±1 (bucket width = the window), the join is an EQUI-join on
    (keys, bucket), and the exact |Δt| predicate filters the candidates.
    A pair within the window differs by ≤1 bucket, so the ±1 explosion
    finds every pair exactly once and the quadratic theta join never
    materializes — at 100 TB the shuffle key (keys, bucket) spreads time
    uniformly no matter how skewed ``keys`` is.
    """
    w_us = window_seconds * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    bucket = F.expr(f"unix_micros({ts_col}) div {w_us}")
    a = df.select(
        *keys,
        F.col(id_col).alias("id_a"),
        us.alias("us_a"),
        F.explode(F.array(bucket - 1, bucket, bucket + 1)).alias("_bk"),
    )
    b = df.select(
        *[F.col(k).alias(k) for k in keys],
        F.col(id_col).alias("id_b"),
        us.alias("us_b"),
        bucket.alias("_bk"),
    )
    return (
        a.join(b, [*keys, "_bk"])
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("us_a") - F.col("us_b")) <= w_us)
        )
        .select(
            *keys,
            "id_a",
            "id_b",
            (F.abs(F.col("us_a") - F.col("us_b")) / F.lit(1000)).cast("long").alias("delta_ms"),
        )
    )


def e12_proximity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-simultaneous same-type events (≤60s apart) — the telemetry
    duplicate-burst detection shape, judged against a theta-join oracle
    (DuckDB can afford the quadratic form at oracle scale; the Spark plan
    is the banded equi-join that survives 100 TB)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "ts")
    return within_join(
        ev, keys=["event_type"], ts_col="ts", id_col="event_id", window_seconds=60
    ).select(
        "event_type",
        F.col("id_a").alias("event_a"),
        F.col("id_b").alias("event_b"),
        "delta_ms",
    ).orderBy("event_type", "event_a", "event_b")


E12_SQL = """
SELECT a.event_type,
       LEAST(a.event_id, b.event_id) AS event_a,
       GREATEST(a.event_id, b.event_id) AS event_b,
       abs(epoch_us(b.ts) - epoch_us(a.ts)) // 1000 AS delta_ms
FROM events a JOIN events b
  ON a.event_type = b.event_type AND a.event_id < b.event_id
 AND abs(epoch_us(b.ts) - epoch_us(a.ts)) <= 60000000
ORDER BY 1, 2, 3
"""

QUERIES = {"e9_asof": e9_asof, "e12_proximity": e12_proximity}
ORACLES = {"e9_asof": E9_SQL, "e12_proximity": E12_SQL}
