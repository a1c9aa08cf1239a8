"""Tier A — adapted TPC-H suite as declarative DataFrame plans.

Each query re-expresses the corresponding dask-dataframe program from the
reference (`benchmark/tpch/queries.py`, cited per function) as a Spark
logical plan. The reference executes these as hand-ordered pandas
partition tasks with no optimizer (SURVEY.md §4.1); here Catalyst does
predicate pushdown into the parquet scan, column pruning, join
reordering, and AQE picks broadcast-hash joins for the dimension tables
at runtime — which is exactly the design difference that makes this
survive 100 TB: fact-table scans read only the referenced columns, dim
joins never shuffle the fact side on a dim key, and skewed keys are
split by AQE.

Oracle contract (SURVEY.md §5.4): every query carries a total ORDER BY,
float aggregates are FLOOR((x) * 100 + 0.5) / 100 inside the query, every computed column
is aliased identically in the DataFrame plan and the DuckDB SQL. Year
extractions are cast to long to match DuckDB's EXTRACT → BIGINT.

Each builder takes ``(spark, sf_dir)`` and returns an unevaluated
DataFrame (the reference analog is building the dask graph; `.collect()`
is the `client.compute` analog — SURVEY.md §3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dask_distributed_vanilla_spark.catalog import load_table
from dask_distributed_vanilla_spark.functions.dates import ts


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- A1 ----------------------------------------------------------------
def a1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report (reference query1, queries.py:11-97).

    Single fact-table scan → hash aggregate. The shipdate filter and the
    7-column projection push into the parquet scan; the groupBy is a
    partial (map-side) + final hash agg — the same partial+tree shape the
    reference gets from dask's dict-agg, but JVM-side and codegen'd.
    """
    l = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.where(F.col("l_shipdate") < ts("1998-10-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.floor((F.sum("l_quantity")) * 100 + F.lit(0.5)) / 100).alias("sum_qty"),
            (F.floor((F.sum("l_extendedprice")) * 100 + F.lit(0.5)) / 100).alias("sum_base_price"),
            (F.floor((F.sum(disc_price)) * 100 + F.lit(0.5)) / 100).alias("sum_disc_price"),
            (F.floor((F.sum(charge)) * 100 + F.lit(0.5)) / 100).alias("sum_charge"),
            (F.floor((F.avg("l_quantity")) * 100 + F.lit(0.5)) / 100).alias("avg_qty"),
            (F.floor((F.avg("l_extendedprice")) * 100 + F.lit(0.5)) / 100).alias("avg_price"),
            (F.floor((F.avg("l_discount")) * 100 + F.lit(0.5)) / 100).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


A1_SQL = """
SELECT l_returnflag, l_linestatus,
       FLOOR((SUM(l_quantity)) * 100 + 0.5) / 100 AS sum_qty,
       FLOOR((SUM(l_extendedprice)) * 100 + 0.5) / 100 AS sum_base_price,
       FLOOR((SUM(l_extendedprice*(1-l_discount))) * 100 + 0.5) / 100 AS sum_disc_price,
       FLOOR((SUM(l_extendedprice*(1-l_discount)*(1+l_tax))) * 100 + 0.5) / 100 AS sum_charge,
       FLOOR((AVG(l_quantity)) * 100 + 0.5) / 100 AS avg_qty,
       FLOOR((AVG(l_extendedprice)) * 100 + 0.5) / 100 AS avg_price,
       FLOOR((AVG(l_discount)) * 100 + 0.5) / 100 AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate < DATE '1998-10-01'
GROUP BY 1,2 ORDER BY 1,2
"""


# --- A3 ----------------------------------------------------------------
def a3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority / top-10 revenue orders (query3, queries.py:138-224).

    customer(filtered) ⋈ orders(filtered) ⋈ lineitem(filtered) → agg →
    top-k. The reference can't sort by revenue globally and uses
    `nlargest` (queries.py:218-222); Spark's orderBy+limit compiles to
    TakeOrderedAndProject — per-partition top-10 then a 10-row merge on
    the driver, no global sort shuffle at any scale.
    """
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < ts("1995-03-15"))
    l = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > ts("1995-03-15"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg((F.floor((F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))) * 100 + F.lit(0.5)) / 100).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


A3_SQL = """
SELECT l_orderkey,
       FLOOR((SUM(l_extendedprice*(1-l_discount))) * 100 + 0.5) / 100 AS revenue,
       o_orderdate
FROM customer
JOIN orders   ON c_custkey=o_custkey
JOIN lineitem ON l_orderkey=o_orderkey
WHERE c_mktsegment='BUILDING'
  AND o_orderdate < DATE '1995-03-15'
  AND l_shipdate  > DATE '1995-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


# --- A4 ----------------------------------------------------------------
def a4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order priority checking (query4, queries.py:227-238; EXISTS adapted
    to the reduced fixture — shipdate > orderdate, SURVEY.md §2.12).

    EXISTS → left-semi join with a non-equi conjunct. Spark executes this
    as a shuffled semi-join on l_orderkey with the date predicate applied
    at match time; the fact scan only reads (l_orderkey, l_shipdate).
    """
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= ts("1996-07-01")) & (F.col("o_orderdate") < ts("1996-10-01"))
    )
    l = _t(spark, sf_dir, "lineitem")
    return (
        o.join(l, (l.l_orderkey == o.o_orderkey) & (l.l_shipdate > o.o_orderdate), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


A4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= DATE '1996-07-01' AND o_orderdate < DATE '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey=o_orderkey AND l_shipdate > o_orderdate)
GROUP BY 1 ORDER BY 1
"""


# --- A5 ----------------------------------------------------------------
def a5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local supplier volume (query5, queries.py:241-276).

    Star join: two fact-side shuffles at most (orders⋈customer,
    lineitem⋈orders); supplier/nation/region are broadcast by AQE so the
    nation/region restriction prunes rows without moving the fact table.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= ts("1996-01-01")) & (F.col("o_orderdate") < ts("1997-01-01"))
    )
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, (F.col("l_suppkey") == s.s_suppkey) & (F.col("c_nationkey") == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg((F.floor((F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))) * 100 + F.lit(0.5)) / 100).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


A5_SQL = """
SELECT n_name, FLOOR((SUM(l_extendedprice*(1-l_discount))) * 100 + 0.5) / 100 AS revenue
FROM customer
JOIN orders   ON c_custkey=o_custkey
JOIN lineitem ON l_orderkey=o_orderkey
JOIN supplier ON l_suppkey=s_suppkey AND c_nationkey=s_nationkey
JOIN nation   ON s_nationkey=n_nationkey
JOIN region   ON n_regionkey=r_regionkey
WHERE r_name='ASIA'
  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
GROUP BY 1 ORDER BY revenue DESC, n_name
"""


# --- A6 ----------------------------------------------------------------
def a6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast revenue change (query6, queries.py:280-327).

    Pure scan → filter → scalar agg; all three predicates push to the
    parquet reader, projection is 4 columns. The reference needs a
    to_frame/reset_index dance for ungrouped aggs (queries.py:314-325);
    Spark's global agg is a two-stage partial/final reduce.
    """
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= ts("1996-01-01"))
            & (F.col("l_shipdate") < ts("1997-01-01"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg((F.floor((F.sum(F.col("l_extendedprice") * F.col("l_discount"))) * 100 + F.lit(0.5)) / 100).alias("revenue"))
    )


A6_SQL = """
SELECT FLOOR((SUM(l_extendedprice*l_discount)) * 100 + 0.5) / 100 AS revenue
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


# --- A7 ----------------------------------------------------------------
def a7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping between two nations (query7, queries.py:329-382).

    Self-referencing dimension (nation joined twice under different
    roles) — the reference renames columns by hand (queries.py:357-365);
    here each role is an aliased projection, both broadcast.
    """
    s = _t(spark, sf_dir, "supplier")
    l = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between(ts("1995-01-01"), ts("1996-12-31"))
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_nationkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_nationkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        s.join(l, s.s_suppkey == l.l_suppkey)
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("n1_nationkey"))
        .join(n2, F.col("c_nationkey") == F.col("n2_nationkey"))
        .where(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg((F.floor((F.sum("volume")) * 100 + F.lit(0.5)) / 100).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


A7_SQL = """
SELECT supp_nation, cust_nation, l_year, FLOOR((SUM(volume)) * 100 + 0.5) / 100 AS revenue
FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             EXTRACT(YEAR FROM l_shipdate) AS l_year,
             l_extendedprice*(1-l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey=l_suppkey
      JOIN orders   ON o_orderkey=l_orderkey
      JOIN customer ON c_custkey=o_custkey
      JOIN nation n1 ON s_nationkey=n1.n_nationkey
      JOIN nation n2 ON c_nationkey=n2.n_nationkey
      WHERE ((n1.n_name='NATION_1' AND n2.n_name='NATION_2')
          OR (n1.n_name='NATION_2' AND n2.n_name='NATION_1'))
        AND l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31')
GROUP BY 1,2,3 ORDER BY 1,2,3
"""


# --- A8 ----------------------------------------------------------------
def a8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (query8, queries.py:385-433).

    Conditional aggregate ratio: SUM(CASE)/SUM — F.when inside the agg,
    one pass. (The reference version silently no-ops its p_type rewrite
    via pandas chained assignment, queries.py:429; not reproduced —
    SURVEY.md §2.12 Tier B note.)
    """
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate").between(ts("1995-01-01"), ts("1996-12-31"))
    )
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_nationkey"), F.col("n_regionkey").alias("n1_regionkey")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_nationkey"), F.col("n_name").alias("nation")
    )
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        p.join(l, p.p_partkey == l.l_partkey)
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(n1, F.col("c_nationkey") == F.col("n1_nationkey"))
        .join(r, F.col("n1_regionkey") == F.col("r_regionkey"))
        .join(n2, F.col("s_nationkey") == F.col("n2_nationkey"))
        .select(F.year("o_orderdate").cast("long").alias("o_year"), vol.alias("volume"), "nation")
        .groupBy("o_year")
        .agg(
            (
                F.floor(
                    F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(0.0))
                    / F.sum("volume")
                    * 100
                    + F.lit(0.5)
                )
                / 100
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


A8_SQL = """
SELECT o_year,
       FLOOR((SUM(CASE WHEN nation='NATION_3' THEN volume ELSE 0 END)/SUM(volume)) * 100 + 0.5) / 100 AS mkt_share
FROM (SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
             l_extendedprice*(1-l_discount) AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey=l_partkey
      JOIN supplier ON s_suppkey=l_suppkey
      JOIN orders   ON l_orderkey=o_orderkey
      JOIN customer ON o_custkey=c_custkey
      JOIN nation n1 ON c_nationkey=n1.n_nationkey
      JOIN region    ON n1.n_regionkey=r_regionkey
      JOIN nation n2 ON s_nationkey=n2.n_nationkey
      WHERE r_name='AMERICA'
        AND o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
        AND p_type='ECONOMY')
GROUP BY 1 ORDER BY 1
"""


# --- A9 ----------------------------------------------------------------
def a9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product type profit (query9, queries.py:436-467; no partsupp in the
    reduced fixture → amount = extendedprice*(1-discount))."""
    p = _t(spark, sf_dir, "part").where(F.col("p_name").contains("red"))
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    return (
        p.join(l, p.p_partkey == l.l_partkey)
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg((F.floor((F.sum("amount")) * 100 + F.lit(0.5)) / 100).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


A9_SQL = """
SELECT n_name AS nation, EXTRACT(YEAR FROM o_orderdate) AS o_year,
       FLOOR((SUM(l_extendedprice*(1-l_discount))) * 100 + 0.5) / 100 AS sum_profit
FROM part
JOIN lineitem ON p_partkey=l_partkey
JOIN supplier ON l_suppkey=s_suppkey
JOIN nation   ON s_nationkey=n_nationkey
JOIN orders   ON l_orderkey=o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY 1,2 ORDER BY nation, o_year DESC
"""


# --- A10 ---------------------------------------------------------------
def a10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned item reporting, top 20 customers (query10, queries.py:470-489)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= ts("1995-10-01")) & (F.col("o_orderdate") < ts("1996-01-01"))
    )
    l = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg((F.floor((F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))) * 100 + F.lit(0.5)) / 100).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


A10_SQL = """
SELECT c_custkey, c_name,
       FLOOR((SUM(l_extendedprice*(1-l_discount))) * 100 + 0.5) / 100 AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey=o_custkey
JOIN lineitem ON l_orderkey=o_orderkey
JOIN nation   ON c_nationkey=n_nationkey
WHERE o_orderdate >= DATE '1995-10-01' AND o_orderdate < DATE '1996-01-01'
  AND l_returnflag='R'
GROUP BY c_custkey,c_name,c_acctbal,n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --- A13 ---------------------------------------------------------------
def a13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (query13, queries.py:542-553).

    Left outer join + agg-of-agg. COUNT(o_orderkey) counts non-null —
    customers with no orders land in the c_count=0 bucket, matching the
    reference's dask count semantics (SURVEY.md §2.4 flag 1).
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


A13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey=o_custkey
      GROUP BY c_custkey)
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


# --- A14 ---------------------------------------------------------------
def a14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion effect (query14, queries.py:556-566)."""
    l = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= ts("1995-09-01")) & (F.col("l_shipdate") < ts("1995-10-01"))
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.floor(
                    100.0
                    * F.sum(F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(0.0))
                    / F.sum(rev)
                    * 100
                    + F.lit(0.5)
                )
                / 100
            ).alias("promo_revenue")
        )
    )


A14_SQL = """
SELECT FLOOR((100.00 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                               THEN l_extendedprice*(1-l_discount) ELSE 0 END)
             / SUM(l_extendedprice*(1-l_discount))) * 100 + 0.5) / 100 AS promo_revenue
FROM lineitem JOIN part ON l_partkey=p_partkey
WHERE l_shipdate >= DATE '1995-09-01' AND l_shipdate < DATE '1995-10-01'
"""


# --- A15 ---------------------------------------------------------------
def a15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier (query15, queries.py:569-580 — the reference version
    raises NameError on `revSup`; declared semantics are the standard
    intent, SURVEY.md §2.12).

    Scalar subquery (global MAX of an aggregate) as a broadcast
    cross-join of a 1-row agg — the reference's grand-total-as-column
    idiom (queries.py:576) done without collecting to the driver.
    """
    l = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= ts("1996-01-01")) & (F.col("l_shipdate") < ts("1996-04-01"))
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    s = _t(spark, sf_dir, "supplier")
    return (
        s.join(revenue, s.s_suppkey == revenue.supplier_no)
        .crossJoin(F.broadcast(max_rev))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .select("s_suppkey", "s_name", (F.floor((F.col("total_revenue")) * 100 + F.lit(0.5)) / 100).alias("total_revenue"))
        .orderBy("s_suppkey")
    )


A15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(l_extendedprice*(1-l_discount)) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
  GROUP BY 1)
SELECT s_suppkey, s_name, FLOOR((total_revenue) * 100 + 0.5) / 100 AS total_revenue
FROM supplier JOIN revenue ON s_suppkey=supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# --- A17 ---------------------------------------------------------------
def a17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (query17, queries.py:613-631).

    Correlated scalar subquery decorrelated as groupBy+join — the same
    rewrite the reference does by hand (queries.py:622-629). Only
    Brand#23 partkeys (~1/25 of parts) can survive the final join, so
    lineitem is first reduced by a broadcast left-semi join against the
    filtered part keys; the per-partkey average over the surviving rows
    equals the unrestricted correlated average (the filter touches only
    part attributes, never lineitem rows of a surviving key). The
    aggregate's input is |lineitem|/25, and its output |parts|/25 rows.
    """
    p = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    l = _t(spark, sf_dir, "lineitem")
    lp = l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
    thresh = lp.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        lp.join(thresh, F.col("l_partkey") == F.col("t_partkey"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg((F.floor((F.sum("l_extendedprice") / 7.0) * 100 + F.lit(0.5)) / 100).alias("avg_yearly"))
    )


A17_SQL = """
SELECT FLOOR((SUM(l_extendedprice) / 7.0) * 100 + 0.5) / 100 AS avg_yearly
FROM lineitem JOIN part ON p_partkey=l_partkey
WHERE p_brand='Brand#23'
  AND l_quantity < (SELECT 0.2*AVG(l2.l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey=part.p_partkey)
"""


# --- A18 ---------------------------------------------------------------
def a18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers (query18, queries.py:634-648).

    IN-subquery → left-semi join against a HAVING-filtered aggregate.
    """
    l = _t(spark, sf_dir, "lineitem")
    big_orders = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 300)
        .select("l_orderkey")
    )
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").join(
        big_orders, F.col("o_orderkey") == big_orders.l_orderkey, "left_semi"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("o_orderkey") == l.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


A18_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       SUM(l_quantity) AS sum_qty
FROM customer
JOIN orders   ON c_custkey=o_custkey
JOIN lineitem ON o_orderkey=l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
GROUP BY 1,2,3,4,5
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
"""


# --- A19 ---------------------------------------------------------------
def a19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue, disjunctive predicates (query19, queries.py:651-687;
    brand+qty+size bands only — the reduced fixture has no container/shipmode)."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("l_quantity").between(1, 11)
            & F.col("p_size").between(1, 5)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("l_quantity").between(10, 20)
            & F.col("p_size").between(1, 10)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("l_quantity").between(20, 30)
            & F.col("p_size").between(1, 15)
        )
    )
    return (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .where(band)
        .agg((F.floor((F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))) * 100 + F.lit(0.5)) / 100).alias("revenue"))
    )


A19_SQL = """
SELECT FLOOR((SUM(l_extendedprice*(1-l_discount))) * 100 + 0.5) / 100 AS revenue
FROM lineitem JOIN part ON p_partkey=l_partkey
WHERE (p_brand='Brand#12' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
   OR (p_brand='Brand#23' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
   OR (p_brand='Brand#15' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
"""


# --- A22 ---------------------------------------------------------------
_A22_NATIONS = [13, 31, 23, 29, 30, 18, 17]


def a22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sales opportunity (query22, queries.py:787-831; nationkey
    stands in for the missing phone country code, NOT EXISTS scoped to
    orders since 2000-01-01 — SURVEY.md §2.12).

    Anti-join for NOT EXISTS + broadcast 1-row aggregate for the scalar
    AVG subquery. The reference emulates the anti-join with merge+unique
    null-filtering (queries.py:800-824); Spark has left_anti natively.
    """
    c = _t(spark, sf_dir, "customer").where(F.col("c_nationkey").isin(_A22_NATIONS))
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("avg_acctbal"))
    recent_orders = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") >= ts("2000-01-01"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_acctbal"))
        .join(recent_orders, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.floor((F.sum("c_acctbal")) * 100 + F.lit(0.5)) / 100).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


A22_SQL = """
SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
       FLOOR((SUM(c_acctbal)) * 100 + 0.5) / 100 AS totacctbal
FROM customer
WHERE c_nationkey IN (13,31,23,29,30,18,17)
  AND c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                   WHERE c_acctbal > 0.00 AND c_nationkey IN (13,31,23,29,30,18,17))
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey=c_custkey AND o_orderdate >= DATE '2000-01-01')
GROUP BY 1 ORDER BY 1
"""


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation over orders: per-customer recency
    (latest order date), frequency (order count), monetary (total
    spend), each scored into quintiles by NTILE, concatenated into the
    classic 3-digit segment code, rolled up to segment sizes — the
    marketing-analytics composite every warehouse ships.

    Shape: one customer aggregate (partial+final), then three NTILE
    windows over the CUSTOMER-level table (cardinality |customers|, not
    |orders| — the facts never enter a window), with the customer key
    as tiebreak so quintile edges are deterministic on both engines.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("recency"),
        F.count(F.lit(1)).alias("frequency"),
        (F.floor((F.sum("o_totalprice")) * 100 + F.lit(0.5)) / 100).alias("monetary"),
    )
    r5 = F.ntile(5).over(Window.orderBy(F.desc("recency"), "o_custkey"))
    f5 = F.ntile(5).over(Window.orderBy(F.desc("frequency"), "o_custkey"))
    m5 = F.ntile(5).over(Window.orderBy(F.desc("monetary"), "o_custkey"))
    scored = per_cust.select(
        "o_custkey",
        "monetary",
        r5.alias("r_score"),
        f5.alias("f_score"),
        m5.alias("m_score"),
    )
    return (
        scored.groupBy(
            F.concat_ws("", F.col("r_score"), F.col("f_score"), F.col("m_score")).alias(
                "segment"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.floor((F.sum("monetary")) * 100 + F.lit(0.5)) / 100).alias("total_monetary"),
        )
        .orderBy("segment")
    )


RFM_SQL = """
WITH per_cust AS (
  SELECT o_custkey, MAX(o_orderdate) AS recency,
         COUNT(*) AS frequency, FLOOR((SUM(o_totalprice)) * 100 + 0.5) / 100 AS monetary
  FROM orders GROUP BY 1),
scored AS (
  SELECT o_custkey, monetary,
         NTILE(5) OVER (ORDER BY recency DESC, o_custkey) AS r_score,
         NTILE(5) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
         NTILE(5) OVER (ORDER BY monetary DESC, o_custkey) AS m_score
  FROM per_cust)
SELECT CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) || CAST(m_score AS VARCHAR) AS segment,
       COUNT(*) AS n_customers,
       FLOOR((SUM(monetary)) * 100 + 0.5) / 100 AS total_monetary
FROM scored GROUP BY 1 ORDER BY 1
"""


def orders_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration: the exact Gini coefficient over
    per-customer spend plus the share of customers needed to cover 80%
    of revenue — the whale-dependence readout behind every "top X% of
    customers drive Y%" decision.

    Shape: one customer-level aggregate, one ranked window over the
    CUSTOMER table (never the orders fact), then the closed-form Gini
    Σ(2i−n−1)·xᵢ / (n·Σx) on the sorted spend — integers and one ratio,
    so the statistic is engine-exact up to display rounding.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        (F.floor((F.sum("o_totalprice")) * 100 + F.lit(0.5)) / 100).alias("m")
    )
    w = Window.orderBy("m", "o_custkey")
    wt = Window.partitionBy()
    ranked = per_cust.select(
        "m",
        F.row_number().over(w).cast("double").alias("i"),
        F.count(F.lit(1)).over(wt).cast("double").alias("n"),
        F.sum("m").over(wt).alias("tot"),
        (
            F.sum("m").over(wt)
            - F.coalesce(
                F.sum("m").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0.0),
            )
        ).alias("rev_from_here"),
    )
    gini = F.sum((2 * F.col("i") - F.col("n") - 1) * F.col("m")) / (
        F.min("n") * F.min("tot")
    )
    # rev_from_here(i) = revenue of rows i..n (ascending m), so it is
    # non-increasing in i. The smallest top set covering >=80% of revenue
    # starts at the LARGEST i with rev_from_here >= 0.8*tot; with
    # i1 = #{i : rev_from_here >= 0.8*tot} (monotone prefix), the set has
    # n - i1 + 1 customers and the share is (n - i1 + 1) / n.
    i1 = F.sum((F.col("rev_from_here") >= 0.8 * F.col("tot")).cast("long"))
    return ranked.agg(
        F.min("n").cast("long").alias("n_customers"),
        (F.floor(gini * 1000 + F.lit(0.5)) / 1000).alias("gini"),
        (
            F.floor((F.min("n") - i1 + 1) / F.min("n") * 1000 + F.lit(0.5)) / 1000
        ).alias("top_share_for_80pct"),
    )


ORDERS_PARETO_SQL = """
WITH per_cust AS (
  SELECT o_custkey, FLOOR((SUM(o_totalprice)) * 100 + 0.5) / 100 AS m
  FROM orders GROUP BY 1),
ranked AS (
  SELECT m,
         CAST(ROW_NUMBER() OVER (ORDER BY m, o_custkey) AS DOUBLE) AS i,
         CAST(COUNT(*) OVER () AS DOUBLE) AS n,
         SUM(m) OVER () AS tot,
         SUM(m) OVER () - COALESCE(SUM(m) OVER (ORDER BY m, o_custkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS rev_from_here
  FROM per_cust)
SELECT CAST(MIN(n) AS BIGINT) AS n_customers,
       FLOOR(SUM((2 * i - n - 1) * m) / (MIN(n) * MIN(tot)) * 1000 + 0.5) / 1000 AS gini,
       FLOOR((MIN(n) - SUM(CASE WHEN rev_from_here >= 0.8 * tot THEN 1 ELSE 0 END) + 1)
             / MIN(n) * 1000 + 0.5) / 1000 AS top_share_for_80pct
FROM ranked
"""


QUERIES = {
    "orders_pareto": orders_pareto,
    "rfm_segments": rfm_segments,
    "a1": a1,
    "a3": a3,
    "a4": a4,
    "a5": a5,
    "a6": a6,
    "a7": a7,
    "a8": a8,
    "a9": a9,
    "a10": a10,
    "a13": a13,
    "a14": a14,
    "a15": a15,
    "a17": a17,
    "a18": a18,
    "a19": a19,
    "a22": a22,
}

ORACLES = {
    "orders_pareto": ORDERS_PARETO_SQL,
    "rfm_segments": RFM_SQL,
    "a1": A1_SQL,
    "a3": A3_SQL,
    "a4": A4_SQL,
    "a5": A5_SQL,
    "a6": A6_SQL,
    "a7": A7_SQL,
    "a8": A8_SQL,
    "a9": A9_SQL,
    "a10": A10_SQL,
    "a13": A13_SQL,
    "a14": A14_SQL,
    "a15": A15_SQL,
    "a17": A17_SQL,
    "a18": A18_SQL,
    "a19": A19_SQL,
    "a22": A22_SQL,
}
