"""Data-quality auditing and column profiling (the expectations /
ANALYZE surface of the engine).

A pipeline feeding a 100 TB training run needs machine-checkable data
contracts at ingest: uniqueness of keys, referential integrity between
fact and dimension, domain ranges, null budgets — and per-column
statistics (the ANALYZE pass) to drive its own planning and drift
alerts. Both run as ordinary DataFrame plans: every expectation is an
aggregate or anti-join the optimizer can fuse, NOT a driver-side loop
over rules, so auditing cost is a constant number of scans regardless
of how many expectations share a table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dask_distributed_vanilla_spark.catalog import load_table


def dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation suite over the TPC-H core: one row per check with its
    violation count (0 = contract holds).

    Same-table checks fuse into ONE conditional aggregate per scan
    (`sum(case when violated)` — adding a rule adds a column, not a
    pass); uniqueness is a groupBy-having; referential integrity is a
    left-anti join that ships only the key column. The union of
    check rows is a tiny driver-free concat of 1-row aggregates.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer")

    def one(name: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(name).alias("check_name"),
            F.col("n").cast("bigint").alias("n_violations"),
        )

    # row-domain rules per table, fused into one aggregate pass each
    viol = F.sum  # alias for readability below
    order_rules = orders.agg(
        viol(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias("neg_price"),
        viol(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("null_cust"),
    )
    li_rules = li.agg(
        viol(
            F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1).otherwise(0)
        ).alias("qty_range"),
        viol(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1), 1).otherwise(
                0
            )
        ).alias("disc_range"),
        viol(F.when(F.col("l_shipdate").isNull(), 1).otherwise(0)).alias("null_ship"),
    )
    dup_orders = (
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > 1)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    orphan_li = (
        li.select("l_orderkey")
        .join(orders.select("o_orderkey"), li.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    orphan_orders = (
        orders.select("o_custkey")
        .join(cust.select("c_custkey"), orders.o_custkey == cust.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    checks = (
        one("orders_dup_pk", dup_orders)
        .unionAll(one("lineitem_orphan_fk", orphan_li))
        .unionAll(one("orders_orphan_custkey", orphan_orders))
        .unionAll(one("orders_nonpositive_price", order_rules.select(F.col("neg_price").alias("n"))))
        .unionAll(one("orders_null_custkey", order_rules.select(F.col("null_cust").alias("n"))))
        .unionAll(one("lineitem_qty_out_of_range", li_rules.select(F.col("qty_range").alias("n"))))
        .unionAll(one("lineitem_discount_out_of_range", li_rules.select(F.col("disc_range").alias("n"))))
        .unionAll(one("lineitem_null_shipdate", li_rules.select(F.col("null_ship").alias("n"))))
    )
    return checks.orderBy("check_name")


DQ_AUDIT_SQL = """
SELECT * FROM (
  SELECT 'orders_dup_pk' AS check_name,
         CAST(COUNT(*) AS BIGINT) AS n_violations
  FROM (SELECT o_orderkey FROM orders GROUP BY 1 HAVING COUNT(*) > 1)
  UNION ALL
  SELECT 'lineitem_orphan_fk',
         CAST(COUNT(*) AS BIGINT)
  FROM lineitem l WHERE NOT EXISTS
       (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
  UNION ALL
  SELECT 'orders_orphan_custkey',
         CAST(COUNT(*) AS BIGINT)
  FROM orders o WHERE NOT EXISTS
       (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
  UNION ALL
  SELECT 'orders_nonpositive_price',
         CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'orders_null_custkey',
         CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'lineitem_qty_out_of_range',
         CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'lineitem_discount_out_of_range',
         CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'lineitem_null_shipdate',
         CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem
) ORDER BY check_name
"""


def dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profile of `orders`: per column — row count,
    nulls, exact distinct count, lexicographic min/max (values rendered
    as strings so heterogeneous columns share one result schema).

    One scan: all per-column aggregates compute in a single pass
    (count_distinct adds its expand, still one scan of the parquet),
    then unpivot to the (column, stat...) long form — the profile a
    catalog stores per table/partition for planning and drift checks.
    At extreme cardinalities the exact distinct swaps for
    approx_count_distinct (e18's twin) with the same plan shape.
    """
    orders = load_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"]
    aggs = []
    for c in cols:
        s = F.col(c).cast("string")
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(s).alias(f"{c}__min"),
            F.max(s).alias(f"{c}__max"),
        ]
    wide = orders.agg(*aggs)
    per_col = [
        wide.select(
            F.lit(c).alias("column_name"),
            F.col(f"{c}__n").cast("bigint").alias("n_rows"),
            F.col(f"{c}__nulls").cast("bigint").alias("n_nulls"),
            F.col(f"{c}__distinct").cast("bigint").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_value"),
            F.col(f"{c}__max").alias("max_value"),
        )
        for c in cols
    ]
    out = per_col[0]
    for p in per_col[1:]:
        out = out.unionAll(p)
    return out.orderBy("column_name")


def _profile_sql() -> str:
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"]
    parts = [
        f"""
  SELECT '{c}' AS column_name,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
         MIN(CAST({c} AS VARCHAR)) AS min_value,
         MAX(CAST({c} AS VARCHAR)) AS max_value
  FROM orders"""
        for c in cols
    ]
    return "SELECT * FROM (" + " UNION ALL ".join(parts) + ") ORDER BY column_name"


DQ_PROFILE_SQL = _profile_sql()


def dq_kanon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier (nation, market
    segment): how many equivalence classes — and how many PEOPLE — sit
    in classes smaller than k for k ∈ {5, 20} — the re-identification
    risk measure a governance gate computes before a dataset ships.

    One groupBy on the quasi-identifier, then a |classes|-row scalar
    rollup: audit cost is the cost of counting, independent of how many
    k thresholds are evaluated.
    """
    c = load_table(spark, sf_dir, "customer")
    classes = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("sz")
    )
    return classes.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.min("sz").alias("min_class_size"),
        F.sum(F.when(F.col("sz") < 5, 1).otherwise(0)).cast("bigint").alias("classes_under_5"),
        F.sum(F.when(F.col("sz") < 5, F.col("sz")).otherwise(0))
        .cast("bigint")
        .alias("rows_under_5"),
        F.sum(F.when(F.col("sz") < 20, 1).otherwise(0)).cast("bigint").alias("classes_under_20"),
        F.sum(F.when(F.col("sz") < 20, F.col("sz")).otherwise(0))
        .cast("bigint")
        .alias("rows_under_20"),
    )


DQ_KANON_SQL = """
WITH cls AS (
  SELECT c_nationkey, c_mktsegment, COUNT(*) AS sz
  FROM customer GROUP BY 1, 2)
SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(MIN(sz) AS BIGINT) AS min_class_size,
       CAST(SUM(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT) AS classes_under_5,
       CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT) AS rows_under_5,
       CAST(SUM(CASE WHEN sz < 20 THEN 1 ELSE 0 END) AS BIGINT) AS classes_under_20,
       CAST(SUM(CASE WHEN sz < 20 THEN sz ELSE 0 END) AS BIGINT) AS rows_under_20
FROM cls
"""


DRIFT_SPLIT = "2024-01-16"  # fixture midpoint: epoch A before, B after
DRIFT_BINS = 8


def dq_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: per event type, the KL divergence
    KL(A‖B) of `value` between two time epochs over a fixed-width bin
    grid anchored to epoch A's [min, max] — the alert signal a data
    pipeline watches to catch upstream shifts before they poison a
    training run.

    Plan shape: epoch-A per-type (min, max) is a |types|-row aggregate
    broadcast back onto the fact scan; binning is pure column
    arithmetic (clamped, so epoch-B outliers land in the edge bins);
    the two histograms and the KL fold are |types|×bins-row aggregates.
    Laplace (+1) smoothing keeps empty bins finite on both engines.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    epoch = F.when(F.col("ts") < F.lit(DRIFT_SPLIT).cast("timestamp"), "a").otherwise("b")
    bounds = (
        ev.where(F.col("ts") < F.lit(DRIFT_SPLIT).cast("timestamp"))
        .groupBy("event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    )
    width = (F.col("hi") - F.col("lo")) / DRIFT_BINS
    # Degenerate grid (epoch-A values all equal → zero width, e.g. a
    # constant health-check stream): every value lands in bin 0 on both
    # engines via the explicit CASE, instead of Spark's ANSI division
    # failing the job (caught by the generated-fixture fuzz).
    binned = (
        ev.join(F.broadcast(bounds), "event_type")
        .select(
            "event_type",
            epoch.alias("epoch"),
            F.when(F.col("hi") == F.col("lo"), F.lit(0))
            .otherwise(
                F.least(
                    F.lit(DRIFT_BINS - 1),
                    F.greatest(
                        F.lit(0),
                        F.floor((F.col("value") - F.col("lo")) / width).cast("int"),
                    ),
                )
            )
            .alias("bin"),
        )
        .groupBy("event_type", "epoch", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = binned.groupBy("event_type", "epoch").agg(F.sum("n").alias("tot"))
    probs = binned.join(totals, ["event_type", "epoch"]).select(
        "event_type",
        "epoch",
        "bin",
        ((F.col("n") + 1) / (F.col("tot") + DRIFT_BINS)).alias("p"),
    )
    a = probs.where(F.col("epoch") == "a").select("event_type", "bin", F.col("p").alias("pa"))
    b = probs.where(F.col("epoch") == "b").select("event_type", "bin", F.col("p").alias("pb"))
    return (
        a.join(b, ["event_type", "bin"])
        .groupBy("event_type")
        .agg((F.floor((F.sum(F.col("pa") * F.log(F.col("pa") / F.col("pb")))) * 1000000 + F.lit(0.5)) / 1000000).alias("kl"))
        .orderBy("event_type")
    )


DQ_DRIFT_SQL = f"""
WITH ev AS (
  SELECT event_type, value,
         CASE WHEN ts < TIMESTAMP '{DRIFT_SPLIT} 00:00:00' THEN 'a' ELSE 'b' END AS epoch
  FROM events),
bounds AS (
  SELECT event_type, MIN(value) AS lo, MAX(value) AS hi
  FROM ev WHERE epoch = 'a' GROUP BY 1),
binned AS (
  SELECT ev.event_type, ev.epoch,
         CASE WHEN b.hi = b.lo THEN 0
              ELSE LEAST({DRIFT_BINS - 1}, GREATEST(0,
                CAST(FLOOR((ev.value - b.lo) / ((b.hi - b.lo) / {DRIFT_BINS})) AS INT)))
         END AS bin,
         COUNT(*) AS n
  FROM ev JOIN bounds b USING (event_type)
  GROUP BY 1, 2, 3),
probs AS (
  SELECT event_type, epoch, bin,
         (n + 1.0) / (SUM(n) OVER (PARTITION BY event_type, epoch) + {DRIFT_BINS}) AS p
  FROM binned)
SELECT a.event_type, FLOOR((SUM(a.p * ln(a.p / b.p))) * 1000000 + 0.5) / 1000000 AS kl
FROM probs a JOIN probs b ON a.event_type = b.event_type AND a.bin = b.bin
WHERE a.epoch = 'a' AND b.epoch = 'b'
GROUP BY 1 ORDER BY 1
"""


def dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit audit per event type: organic
    magnitude-spanning measurements follow P(d) = log10(1+1/d);
    fabricated or clipped feeds don't — the classic cheap
    synthetic-data / fraud smell test, here per source stream.

    The first digit comes from the decimal STRING rendering (first
    [1-9] char), not from log/power float math — the one formulation
    two engines are guaranteed to agree on at every boundary (10.00,
    0.01, …). One scan + one (type, digit) aggregate; the deviation
    column carries the comparison against the Benford expectation.
    """
    import math

    ev = load_table(spark, sf_dir, "events").where(F.col("value") > 0)
    digit = F.regexp_extract(F.col("value").cast("string"), "[1-9]", 0).cast("int")
    cell = ev.select("event_type", digit.alias("digit")).groupBy(
        "event_type", "digit"
    ).agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql import Window

    wt = Window.partitionBy("event_type")
    share = F.col("n") / F.sum("n").over(wt)
    expected = F.element_at(
        F.array(*[F.lit(math.floor(math.log10(1 + 1 / d) * 10000 + 0.5) / 10000) for d in range(1, 10)]),
        F.col("digit"),
    )
    return (
        cell.select(
            "event_type",
            "digit",
            "n",
            F.floor(share * 100 + F.lit(0.5)).cast("double").alias("share_pct"),
            (F.floor((share - expected) * 100 + F.lit(0.5))).cast("double").alias(
                "dev_pct"
            ),
        )
        .orderBy("event_type", "digit")
    )


DQ_BENFORD_SQL = """
WITH pos AS (SELECT event_type, value FROM events WHERE value > 0),
cell AS (
  SELECT event_type,
         CAST(regexp_extract(CAST(value AS VARCHAR), '[1-9]') AS INT) AS digit,
         COUNT(*) AS n
  FROM pos GROUP BY 1, 2),
exp AS (SELECT d AS digit, FLOOR((log10(1 + 1.0/d)) * 10000 + 0.5) / 10000 AS expected
        FROM generate_series(1, 9) t(d))
SELECT c.event_type, c.digit, c.n,
       CAST(FLOOR(c.n * 100.0 / SUM(c.n) OVER (PARTITION BY c.event_type) + 0.5) AS DOUBLE) AS share_pct,
       CAST(FLOOR((c.n * 1.0 / SUM(c.n) OVER (PARTITION BY c.event_type) - e.expected) * 100 + 0.5) AS DOUBLE) AS dev_pct
FROM cell c JOIN exp e USING (digit)
ORDER BY c.event_type, c.digit
"""


KS_SPLIT = "2024-01-16 00:00:00"  # epoch boundary: first vs second half


def dq_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic per event type
    between the two halves of the month — the distribution-shift test
    that needs no binning choice (dq_drift's KL needs bins; KS is the
    exact complement: D = max |F₁(x) − F₂(x)| over observed values).

    Shape: ties collapse first ((type, value) → per-side counts), then
    ONE ordered window per type computes both running CDFs and their
    gap in a single pass — counts are integers, so the CDF ratios and
    D are identical doubles on any engine. Work after the collapse is
    |distinct values|, not |rows|.

    Scale contract: that |cells|-bound holds ONLY under a quantized
    value domain (the fixture's `value` is 2-decimal); an unbounded
    continuous metric makes |cells| ≈ |rows| and the per-type ordered
    window the bottleneck. Declared unbounded-domain path: pre-quantize
    the cell key (`F.round(value, k)`) — KS's D is |F₁−F₂| evaluated at
    cell boundaries, so quantizing moves the evaluation grid but keeps
    the estimator exact ON that grid (a documented resolution/cost
    trade, not an approximation of the quantized statistic).
    Fuzz-covered by
    tests/test_fixture_fuzz.py::test_mannwhitney_continuous_domain.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    side = (F.col("ts") < F.lit(KS_SPLIT).cast("timestamp")).cast("int")
    cell = (
        ev.select("event_type", "value", side.alias("in_a"))
        .groupBy("event_type", "value")
        .agg(
            F.sum("in_a").alias("ca"),
            F.sum(1 - F.col("in_a")).alias("cb"),
        )
    )
    wt = Window.partitionBy("event_type")
    wrun = Window.partitionBy("event_type").orderBy("value")
    # NULLIF guards: a type whose events all fall in ONE epoch has an
    # empty opposite sample — KS D is undefined there and the type
    # reports NULL on both engines instead of ANSI division failing the
    # job (caught by the generated-fixture fuzz).
    gap = F.abs(
        F.sum("ca").over(wrun) / F.nullif(F.sum("ca").over(wt), F.lit(0))
        - F.sum("cb").over(wrun) / F.nullif(F.sum("cb").over(wt), F.lit(0))
    )
    return (
        cell.select(
            "event_type",
            F.sum("ca").over(wt).alias("n_a"),
            F.sum("cb").over(wt).alias("n_b"),
            gap.alias("gap"),
        )
        .groupBy("event_type")
        .agg(
            F.min("n_a").cast("long").alias("n_first_half"),
            F.min("n_b").cast("long").alias("n_second_half"),
            (F.floor(F.max("gap") * 10000 + F.lit(0.5)) / 10000).alias("ks_d"),
        )
        .orderBy("event_type")
    )


DQ_KS_SQL = f"""
WITH cell AS (
  SELECT event_type, value,
         SUM(CASE WHEN ts < TIMESTAMP '{KS_SPLIT}' THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN ts < TIMESTAMP '{KS_SPLIT}' THEN 0 ELSE 1 END) AS cb
  FROM events GROUP BY 1, 2),
run AS (
  SELECT event_type,
         SUM(ca) OVER (PARTITION BY event_type) AS n_a,
         SUM(cb) OVER (PARTITION BY event_type) AS n_b,
         ABS(SUM(ca) OVER (PARTITION BY event_type ORDER BY value) * 1.0
               / NULLIF(SUM(ca) OVER (PARTITION BY event_type), 0)
             - SUM(cb) OVER (PARTITION BY event_type ORDER BY value) * 1.0
               / NULLIF(SUM(cb) OVER (PARTITION BY event_type), 0)) AS gap
  FROM cell)
SELECT event_type,
       CAST(MIN(n_a) AS BIGINT) AS n_first_half,
       CAST(MIN(n_b) AS BIGINT) AS n_second_half,
       FLOOR(MAX(gap) * 10000 + 0.5) / 10000 AS ks_d
FROM run GROUP BY event_type ORDER BY event_type
"""


QUERIES = {
    "dq_ks": dq_ks,
    "dq_benford": dq_benford,
    "dq_audit": dq_audit,
    "dq_profile": dq_profile,
    "dq_kanon": dq_kanon,
    "dq_drift": dq_drift,
}
ORACLES = {
    "dq_ks": DQ_KS_SQL,
    "dq_benford": DQ_BENFORD_SQL,
    "dq_audit": DQ_AUDIT_SQL,
    "dq_profile": DQ_PROFILE_SQL,
    "dq_kanon": DQ_KANON_SQL,
    "dq_drift": DQ_DRIFT_SQL,
}
