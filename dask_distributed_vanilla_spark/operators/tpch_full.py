"""Tier B — full-TPC-H queries requiring the extended fixtures
(FIXTURES.md §3: partsupp + the reduced columns).

The reference implements (or attempts) these in `benchmark/tpch/queries.py`:
Q2 `queries.py:100-135`, Q11 `queries.py:492-539`, Q12 `queries.py:586-609`
(CASE-via-where emulation), Q16 `queries.py:583-?` (commented
countDistinct, `queries.py:757-761`), Q20 `queries.py:690-747`,
Q21 `queries.py:750-783` (unfinished in the reference). Declared
semantics are the standard TPC-H shapes with parameters recalibrated to
the synthetic fixture distributions; reference bugs (string-literal date
comparison `queries.py:232`, chained-assignment no-ops `queries.py:429,
564`) are NOT reproduced — SURVEY.md §2.12 Tier B note.

The driver fixtures carry no partsupp / extended columns, so both
engines derive the Tier B extension schema inline from the base tables
with bit-exact deterministic arithmetic (sources/tierb.py): the Spark
builders read derived DataFrames, the oracles prepend the equivalent
CTEs (`tierb_sql`) over the driver's pre-registered views. The results
are therefore fully hash-judgeable without extension fixture files.
tests/test_tier_b.py verifies all twelve differentially against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dask_distributed_vanilla_spark.functions.dates import ts
from dask_distributed_vanilla_spark.sources.tierb import ext_table, tierb_sql


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Tier B view of a table: base scan + derived extension columns
    (Catalyst prunes any derived column a query doesn't touch)."""
    return ext_table(spark, sf_dir, name)


# --- Q2: minimum-cost supplier --------------------------------------------
def b2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated MIN subquery decorrelated as groupBy+equality join; the
    region-restricted supply costs are computed once and reused for both
    the candidate rows and the per-part minimum."""
    ps = _t(spark, sf_dir, "partsupp")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_type") == "STANDARD") & F.col("p_size").between(1, 15)
    )
    eligible = (
        ps.join(s, ps.ps_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
    )
    min_cost = eligible.groupBy(F.col("ps_partkey").alias("mc_partkey")).agg(
        F.min("ps_supplycost").alias("min_supplycost")
    )
    return (
        eligible.join(p, F.col("ps_partkey") == p.p_partkey)
        .join(min_cost, F.col("ps_partkey") == F.col("mc_partkey"))
        .where(F.col("ps_supplycost") == F.col("min_supplycost"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_mfgr",
            "s_address", "s_phone", "s_comment",
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


B2_SQL = """
SELECT s_acctbal, s_name, n_name, p_partkey, p_mfgr, s_address, s_phone, s_comment
FROM part_x
JOIN partsupp ON p_partkey = ps_partkey
JOIN supplier_x ON s_suppkey = ps_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE p_type = 'STANDARD' AND p_size BETWEEN 1 AND 15 AND r_name = 'EUROPE'
  AND ps_supplycost = (
    SELECT MIN(ps_supplycost)
    FROM partsupp
    JOIN supplier_x ON s_suppkey = ps_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE part_x.p_partkey = ps_partkey AND r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


# --- Q11: value concentration ---------------------------------------------
def b11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING against a scalar fraction of the global aggregate — the
    grand-total-as-broadcast pattern (reference computes the scalar then
    assigns it as a column, queries.py:504)."""
    ps = _t(spark, sf_dir, "partsupp")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    filtered = ps.join(s, ps.ps_suppkey == s.s_suppkey).join(
        n, s.s_nationkey == n.n_nationkey
    )
    value = F.sum(F.col("ps_supplycost") * F.col("ps_availqty"))
    per_part = filtered.groupBy("ps_partkey").agg(value.alias("part_value"))
    threshold = filtered.agg((value * 0.01).alias("threshold"))
    return (
        per_part.crossJoin(F.broadcast(threshold))
        .where(F.col("part_value") > F.col("threshold"))
        .select("ps_partkey", (F.floor((F.col("part_value")) * 100 + F.lit(0.5)) / 100).alias("value"))
        .orderBy(F.desc("value"), "ps_partkey")
    )


B11_SQL = """
SELECT ps_partkey, FLOOR((SUM(ps_supplycost * ps_availqty)) * 100 + 0.5) / 100 AS value
FROM partsupp JOIN supplier ON ps_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
GROUP BY 1
HAVING SUM(ps_supplycost * ps_availqty) > (
  SELECT SUM(ps_supplycost * ps_availqty) * 0.01
  FROM partsupp JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3')
ORDER BY value DESC, ps_partkey
"""


# --- Q12: shipping modes and order priority -------------------------------
def b12(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipmode").isin("MAIL", "SHIP")
        & (F.col("l_commitdate") < F.col("l_receiptdate"))
        & (F.col("l_shipdate") < F.col("l_commitdate"))
        & (F.col("l_receiptdate") >= ts("1996-01-01"))
        & (F.col("l_receiptdate") < ts("1997-01-01"))
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_shipmode")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_shipmode")
    )


B12_SQL = """
SELECT l_shipmode,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem_x ON o_orderkey = l_orderkey
WHERE l_shipmode IN ('MAIL','SHIP')
  AND l_commitdate < l_receiptdate AND l_shipdate < l_commitdate
  AND l_receiptdate >= DATE '1996-01-01' AND l_receiptdate < DATE '1997-01-01'
GROUP BY 1 ORDER BY 1
"""


# --- Q16: parts/supplier relationship -------------------------------------
def b16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN → left_anti; COUNT(DISTINCT) — the op the reference only
    aspires to (`queries.py:757-761` commented countDistinct)."""
    complainers = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_comment").like("%Customer%Complaints%"))
        .select("s_suppkey")
    )
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#15")
        & ~F.col("p_type").startswith("MEDIUM")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    ps = _t(spark, sf_dir, "partsupp").join(
        complainers, F.col("ps_suppkey") == F.col("s_suppkey"), "left_anti"
    )
    return (
        ps.join(p, F.col("ps_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


B16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT ps_suppkey) AS supplier_cnt
FROM partsupp JOIN part ON p_partkey = ps_partkey
WHERE p_brand <> 'Brand#15' AND p_type NOT LIKE 'MEDIUM%'
  AND p_size IN (1,4,7,10,13,16,19,22)
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier_x
                         WHERE s_comment LIKE '%Customer%Complaints%')
GROUP BY 1,2,3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# --- Q20: potential part promotion ----------------------------------------
def b20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested IN/correlated-scalar chain decorrelated to joins: red
    parts → their partsupp rows → per-(part,supp) shipped quantity →
    availability threshold → supplier semi-join (the reference builds the
    same chain manually, queries.py:704-747)."""
    red_parts = (
        _t(spark, sf_dir, "part").where(F.col("p_name").startswith("red")).select("p_partkey")
    )
    l = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= ts("1996-01-01")) & (F.col("l_shipdate") < ts("1997-01-01"))
    )
    shipped = l.groupBy(
        F.col("l_partkey").alias("q_partkey"), F.col("l_suppkey").alias("q_suppkey")
    ).agg((0.5 * F.sum("l_quantity")).alias("half_qty"))
    qualifying = (
        _t(spark, sf_dir, "partsupp")
        .join(red_parts, F.col("ps_partkey") == F.col("p_partkey"), "left_semi")
        .join(
            shipped,
            (F.col("ps_partkey") == F.col("q_partkey"))
            & (F.col("ps_suppkey") == F.col("q_suppkey")),
        )
        .where(F.col("ps_availqty") > F.col("half_qty"))
        .select("ps_suppkey")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_8")
    return (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(qualifying, s.s_suppkey == F.col("ps_suppkey"), "left_semi")
        .select("s_name", "s_address")
        .orderBy("s_name")
    )


B20_SQL = """
SELECT s_name, s_address
FROM supplier_x JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_8'
  AND s_suppkey IN (
    SELECT ps_suppkey FROM partsupp
    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      AND ps_availqty > (SELECT 0.5 * SUM(l_quantity) FROM lineitem
                         WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
                           AND l_shipdate >= DATE '1996-01-01'
                           AND l_shipdate < DATE '1997-01-01'))
ORDER BY s_name
"""


# --- Q21: suppliers who kept orders waiting -------------------------------
def b21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS + NOT EXISTS with anti-correlation on the same fact table:
    semi-join for 'another supplier contributed', anti-join for 'no other
    supplier was late' (the reference left this unfinished,
    queries.py:750-783)."""
    l1 = _t(spark, sf_dir, "lineitem").where(
        F.col("l_receiptdate") > F.col("l_commitdate")
    )
    l2 = (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey"))
    )
    l3 = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_receiptdate") > F.col("l_commitdate"))
        .select(F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey"))
    )
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_8")
    return (
        l1.join(o, l1.l_orderkey == o.o_orderkey)
        .join(s, l1.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(
            l2,
            (F.col("l_orderkey") == F.col("o2_orderkey"))
            & (F.col("l_suppkey") != F.col("o2_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("o3_orderkey"))
            & (F.col("l_suppkey") != F.col("o3_suppkey")),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


B21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem_x l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F' AND l1.l_receiptdate > l1.l_commitdate
  AND n_name = 'NATION_8'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem_x l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_receiptdate > l3.l_commitdate)
GROUP BY 1 ORDER BY numwait DESC, s_name
LIMIT 100
"""


# --- Q3 full (o_shippriority in output) -----------------------------------
def b3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """query3 `queries.py:138-224` at full fidelity (o_shippriority)."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < ts("1995-03-15"))
    l = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > ts("1995-03-15"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_shippriority")
        .agg((F.floor((F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))) * 100 + F.lit(0.5)) / 100).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_shippriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


B3_SQL = """
SELECT l_orderkey, FLOOR((SUM(l_extendedprice*(1-l_discount))) * 100 + 0.5) / 100 AS revenue,
       o_orderdate, o_shippriority
FROM customer JOIN orders_x ON c_custkey=o_custkey
JOIN lineitem ON l_orderkey=o_orderkey
WHERE c_mktsegment='BUILDING' AND o_orderdate < DATE '1995-03-15'
  AND l_shipdate > DATE '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_shippriority
ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10
"""


# --- Q4 full (commitdate < receiptdate EXISTS) ----------------------------
def b4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """query4 `queries.py:227-238` with the REAL predicate — the
    reference compares against the string literal 'l_receiptdate'
    (`queries.py:232`, a bug not reproduced; SURVEY.md §2.12)."""
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= ts("1996-07-01")) & (F.col("o_orderdate") < ts("1996-10-01"))
    )
    l = _t(spark, sf_dir, "lineitem").where(F.col("l_commitdate") < F.col("l_receiptdate"))
    return (
        o.join(l, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


B4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= DATE '1996-07-01' AND o_orderdate < DATE '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem_x
              WHERE l_orderkey=o_orderkey AND l_commitdate < l_receiptdate)
GROUP BY 1 ORDER BY 1
"""


# --- Q9 full (partsupp cost in the profit formula) ------------------------
def b9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """query9 `queries.py:436-467` at full fidelity: amount =
    l_extendedprice*(1-l_discount) - ps_supplycost*l_quantity."""
    p = _t(spark, sf_dir, "part").where(F.col("p_name").contains("red"))
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    ps = _t(spark, sf_dir, "partsupp")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "ps_supplycost"
    ) * F.col("l_quantity")
    return (
        p.join(l, p.p_partkey == l.l_partkey)
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            ps,
            (F.col("ps_suppkey") == F.col("l_suppkey"))
            & (F.col("ps_partkey") == F.col("l_partkey")),
        )
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg((F.floor((F.sum("amount")) * 100 + F.lit(0.5)) / 100).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


B9_SQL = """
SELECT n_name AS nation, EXTRACT(YEAR FROM o_orderdate) AS o_year,
       FLOOR((SUM(l_extendedprice*(1-l_discount) - ps_supplycost*l_quantity)) * 100 + 0.5) / 100 AS sum_profit
FROM part
JOIN lineitem ON p_partkey=l_partkey
JOIN supplier ON l_suppkey=s_suppkey
JOIN partsupp ON ps_suppkey=l_suppkey AND ps_partkey=l_partkey
JOIN nation   ON s_nationkey=n_nationkey
JOIN orders   ON l_orderkey=o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY 1,2 ORDER BY nation, o_year DESC
"""


# --- Q10 full (address/phone/comment output) ------------------------------
def b10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """query10 `queries.py:470-489` with the full output columns."""
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
        .groupBy(
            "c_custkey", "c_name", "c_acctbal", "c_phone", "n_name", "c_address", "c_comment"
        )
        .agg((F.floor((F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))) * 100 + F.lit(0.5)) / 100).alias("revenue"))
        .select(
            "c_custkey", "c_name", "revenue", "c_acctbal", "n_name",
            "c_address", "c_phone", "c_comment",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


B10_SQL = """
SELECT c_custkey, c_name, FLOOR((SUM(l_extendedprice*(1-l_discount))) * 100 + 0.5) / 100 AS revenue,
       c_acctbal, n_name, c_address, c_phone, c_comment
FROM customer_x JOIN orders ON c_custkey=o_custkey
JOIN lineitem ON l_orderkey=o_orderkey
JOIN nation ON c_nationkey=n_nationkey
WHERE o_orderdate >= DATE '1995-10-01' AND o_orderdate < DATE '1996-01-01'
  AND l_returnflag='R'
GROUP BY c_custkey,c_name,c_acctbal,c_phone,n_name,c_address,c_comment
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


# --- Q13 full (o_comment filter) ------------------------------------------
def b13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """query13 `queries.py:542-553` at full fidelity: orders whose
    o_comment matches %special%requests% are excluded from the per-customer
    count (the reduced a13 cannot express this — no o_comment column).
    Left join keeps zero-order customers as c_count=0."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        ~F.col("o_comment").like("%special%requests%")
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


B13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders_x
        ON c_custkey = o_custkey AND o_comment NOT LIKE '%special%requests%'
      GROUP BY c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --- Q15 full (top-revenue supplier with address/phone) --------------------
def b15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """query15 `queries.py:569-580` at full fidelity (s_address/s_phone
    in the output — the reference returns an undefined ``revSup``,
    `queries.py:580`, a bug not reproduced). Revenue view computed once,
    scalar max broadcast back against it."""
    l = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= ts("1996-01-01")) & (F.col("l_shipdate") < ts("1996-04-01"))
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    s = _t(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", "s_address", "s_phone",
            (F.floor((F.col("total_revenue")) * 100 + F.lit(0.5)) / 100).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


_B15_REVENUE = """
  SELECT l_suppkey AS supplier_no,
         SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
  GROUP BY 1
"""

# tierb_sql() prepends the shared derivation WITH-block, so the revenue
# view is inlined as subqueries rather than a second (illegal) WITH.
B15_SQL = f"""
SELECT s_suppkey, s_name, s_address, s_phone,
       FLOOR((total_revenue) * 100 + 0.5) / 100 AS total_revenue
FROM supplier_x JOIN ({_B15_REVENUE}) revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM ({_B15_REVENUE}) r2)
ORDER BY s_suppkey
"""


# --- Q17 full (container-restricted small-quantity revenue) ----------------
def b17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """query17 `queries.py:613-631` at full fidelity: Brand#23 AND
    p_container='MED BOX' (the reduced a17 has no container column).
    Correlated AVG decorrelated to a per-part aggregate joined back; the
    part filter is broadcast into the lineitem semi-join, and the per-part
    average over the semi-joined rows equals the unrestricted correlated
    average because the filter touches only part attributes."""
    p = (
        _t(spark, sf_dir, "part")
        .where((F.col("p_brand") == "Brand#23") & (F.col("p_container") == "MED BOX"))
        .select("p_partkey")
    )
    l = _t(spark, sf_dir, "lineitem")
    lp = l.join(F.broadcast(p), l.l_partkey == F.col("p_partkey"), "left_semi")
    avg_q = lp.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("q_threshold")
    )
    return (
        lp.join(avg_q, F.col("l_partkey") == F.col("a_partkey"))
        .where(F.col("l_quantity") < F.col("q_threshold"))
        .agg((F.floor((F.sum("l_extendedprice") / 7.0) * 100 + F.lit(0.5)) / 100).alias("avg_yearly"))
    )


B17_SQL = """
SELECT FLOOR((SUM(l_extendedprice) / 7.0) * 100 + 0.5) / 100 AS avg_yearly
FROM lineitem JOIN part_x ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23' AND p_container = 'MED BOX'
  AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = part_x.p_partkey)
"""


# --- Q19 full (containers + shipmode + shipinstruct) ----------------------
def b19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """query19 `queries.py:651-687` at full fidelity (container lists,
    AIR shipmode, DELIVER IN PERSON — the reference's where-mask chain)."""
    l = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipmode").isin("AIR", "AIR REG")
        & (F.col("l_shipinstruct") == "DELIVER IN PERSON")
    )
    p = _t(spark, sf_dir, "part")
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_container").isin("SM CASE", "SM BOX", "SM PACK", "SM PKG")
            & F.col("l_quantity").between(1, 11)
            & F.col("p_size").between(1, 5)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_container").isin("MED BAG", "MED BOX", "MED PKG", "MED PACK")
            & F.col("l_quantity").between(10, 20)
            & F.col("p_size").between(1, 10)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_container").isin("LG CASE", "LG BOX", "LG PACK", "LG PKG")
            & F.col("l_quantity").between(20, 30)
            & F.col("p_size").between(1, 15)
        )
    )
    return (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .where(band)
        .agg((F.floor((F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))) * 100 + F.lit(0.5)) / 100).alias("revenue"))
    )


B19_SQL = """
SELECT FLOOR((SUM(l_extendedprice*(1-l_discount))) * 100 + 0.5) / 100 AS revenue
FROM lineitem_x JOIN part_x ON p_partkey=l_partkey
WHERE l_shipmode IN ('AIR','AIR REG') AND l_shipinstruct='DELIVER IN PERSON'
  AND ((p_brand='Brand#12' AND p_container IN ('SM CASE','SM BOX','SM PACK','SM PKG')
        AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
    OR (p_brand='Brand#23' AND p_container IN ('MED BAG','MED BOX','MED PKG','MED PACK')
        AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
    OR (p_brand='Brand#15' AND p_container IN ('LG CASE','LG BOX','LG PACK','LG PKG')
        AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15))
"""


# --- Q22 full (phone country codes) ---------------------------------------
_B22_CODES = ["13", "31", "23", "29", "30", "18", "17"]


def b22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """query22 `queries.py:787-831` with real phone country-code
    extraction (substring(c_phone,1,2) — the reference used the whole
    phone string, `queries.py:791-793`, a bug not reproduced). NOT
    EXISTS scoped to orders since 2000-01-01 as in a22."""
    c = _t(spark, sf_dir, "customer").withColumn(
        "cntrycode", F.substring("c_phone", 1, 2)
    ).where(F.col("cntrycode").isin(_B22_CODES))
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("avg_acctbal"))
    recent = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") >= ts("2000-01-01"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_acctbal"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(F.count(F.lit(1)).alias("numcust"), (F.floor((F.sum("c_acctbal")) * 100 + F.lit(0.5)) / 100).alias("totacctbal"))
        .orderBy("cntrycode")
    )


B22_SQL = f"""
SELECT substring(c_phone, 1, 2) AS cntrycode, COUNT(*) AS numcust,
       FLOOR((SUM(c_acctbal)) * 100 + 0.5) / 100 AS totacctbal
FROM customer_x
WHERE substring(c_phone, 1, 2) IN ({", ".join(f"'{c}'" for c in _B22_CODES)})
  AND c_acctbal > (SELECT AVG(c_acctbal) FROM customer_x
                   WHERE c_acctbal > 0.00
                     AND substring(c_phone, 1, 2) IN ({", ".join(f"'{c}'" for c in _B22_CODES)}))
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey=c_custkey AND o_orderdate >= DATE '2000-01-01')
GROUP BY 1 ORDER BY 1
"""


# --- Q1 spec form (DELTA=90 cutoff) ---------------------------------------
def b1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """query1 `queries.py:11-97` in TPC-H spec form: the reference pins
    the cutoff to `< 1998-10-01` (Snowflake's DELTA=90 shortcut noted in
    its comment, `queries.py:24-27`); here the spec arithmetic
    `l_shipdate <= DATE '1998-12-01' - 90 days` = 1998-09-02 is used, so
    b1 and a1 together cover both parameterizations. Same single-scan
    partial+final hash-agg plan as a1."""
    l = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.where(F.col("l_shipdate") <= ts("1998-09-02"))
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


B1_SQL = """
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
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY 1,2 ORDER BY 1,2
"""


# --- Q5 full (second region/year parameterization) -------------------------
def b5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """query5 `queries.py:241-276` over EUROPE/1997 (a5 covers
    ASIA/1996; the reference's 1994 window is empty on the synthetic date
    span). The reference joins customer twice — once on o_custkey, once
    on s_nationkey=c_nationkey (`queries.py:262-267`) — instead of
    constraining the SAME customer row; the standard single-customer
    `c_nationkey = s_nationkey` semantics are declared (reference bugs
    are not reproduced, SURVEY.md §2.12 Tier B note)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= ts("1997-01-01")) & (F.col("o_orderdate") < ts("1998-01-01"))
    )
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
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


B5_SQL = """
SELECT n_name, FLOOR((SUM(l_extendedprice*(1-l_discount))) * 100 + 0.5) / 100 AS revenue
FROM customer
JOIN orders   ON c_custkey=o_custkey
JOIN lineitem ON l_orderkey=o_orderkey
JOIN supplier ON l_suppkey=s_suppkey AND c_nationkey=s_nationkey
JOIN nation   ON s_nationkey=n_nationkey
JOIN region   ON n_regionkey=r_regionkey
WHERE r_name='EUROPE'
  AND o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1998-01-01'
GROUP BY 1 ORDER BY revenue DESC, n_name
"""


# --- Q6 full (second year window) ------------------------------------------
def b6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """query6 `queries.py:280-327` over the 1997 window (a6 covers 1996;
    the reference's validation DATE=1994-01-01 precedes the synthetic
    span). Pure scan+filter+scalar-agg: no join, no shuffle beyond the
    single partial→final exchange."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= ts("1997-01-01"))
            & (F.col("l_shipdate") < ts("1998-01-01"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg((F.floor((F.sum(F.col("l_extendedprice") * F.col("l_discount"))) * 100 + F.lit(0.5)) / 100).alias("revenue"))
    )


B6_SQL = """
SELECT FLOOR((SUM(l_extendedprice*l_discount)) * 100 + 0.5) / 100 AS revenue
FROM lineitem
WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


# --- Q7 full (second nation pair) ------------------------------------------
def b7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """query7 `queries.py:329-382` for the NATION_3/NATION_4 pair (a7
    covers NATION_1/NATION_2; FRANCE/GERMANY don't exist in the synthetic
    nation names). The reference derives l_year by string-slicing
    `l_shipdate.str[:4]` (`queries.py:373`); EXTRACT(YEAR) is declared."""
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
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_4")
    ) | ((F.col("supp_nation") == "NATION_4") & (F.col("cust_nation") == "NATION_3"))
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


B7_SQL = """
SELECT supp_nation, cust_nation, l_year, FLOOR((SUM(volume)) * 100 + 0.5) / 100 AS revenue
FROM (SELECT n1.n_name supp_nation, n2.n_name cust_nation,
             EXTRACT(YEAR FROM l_shipdate) l_year,
             l_extendedprice*(1-l_discount) volume
      FROM supplier
      JOIN lineitem ON s_suppkey=l_suppkey
      JOIN orders   ON o_orderkey=l_orderkey
      JOIN customer ON c_custkey=o_custkey
      JOIN nation n1 ON s_nationkey=n1.n_nationkey
      JOIN nation n2 ON c_nationkey=n2.n_nationkey
      WHERE ((n1.n_name='NATION_3' AND n2.n_name='NATION_4')
          OR (n1.n_name='NATION_4' AND n2.n_name='NATION_3'))
        AND l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31')
GROUP BY 1,2,3 ORDER BY 1,2,3
"""


# --- Q8 full (second region/type/nation parameterization) ------------------
def b8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """query8 `queries.py:385-433` over ASIA/STANDARD/NATION_5 (a8
    covers AMERICA/ECONOMY/NATION_3). The reference zeroes non-target
    volumes through a pandas chained assignment that silently no-ops
    (`queries.py:429`); the declared CASE semantics are used instead."""
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD")
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
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
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
                    F.sum(F.when(F.col("nation") == "NATION_5", F.col("volume")).otherwise(0.0))
                    / F.sum("volume")
                    * 100
                    + F.lit(0.5)
                )
                / 100
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


B8_SQL = """
SELECT o_year,
       FLOOR((SUM(CASE WHEN nation='NATION_5' THEN volume ELSE 0 END)/SUM(volume)) * 100 + 0.5) / 100 AS mkt_share
FROM (SELECT EXTRACT(YEAR FROM o_orderdate) o_year,
             l_extendedprice*(1-l_discount) volume,
             n2.n_name nation
      FROM part
      JOIN lineitem ON p_partkey=l_partkey
      JOIN supplier ON s_suppkey=l_suppkey
      JOIN orders   ON l_orderkey=o_orderkey
      JOIN customer ON o_custkey=c_custkey
      JOIN nation n1 ON c_nationkey=n1.n_nationkey
      JOIN region   ON n1.n_regionkey=r_regionkey
      JOIN nation n2 ON s_nationkey=n2.n_nationkey
      WHERE r_name='ASIA'
        AND o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
        AND p_type='STANDARD')
GROUP BY 1 ORDER BY 1
"""


# --- Q14 full (second month window) ----------------------------------------
def b14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """query14 `queries.py:556-566` over 1996-03 (a14 covers 1995-09).
    The reference zeroes non-PROMO revenue via a chained-assignment
    no-op (`queries.py:564`); the CASE ratio is declared."""
    l = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= ts("1996-03-01")) & (F.col("l_shipdate") < ts("1996-04-01"))
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


B14_SQL = """
SELECT FLOOR((100.00 * SUM(CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice*(1-l_discount) ELSE 0 END)
             / SUM(l_extendedprice*(1-l_discount))) * 100 + 0.5) / 100 AS promo_revenue
FROM lineitem JOIN part ON l_partkey=p_partkey
WHERE l_shipdate >= DATE '1996-03-01' AND l_shipdate < DATE '1996-04-01'
"""


# --- Q18 full (lower quantity threshold) -----------------------------------
def b18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """query18 `queries.py:634-648` with threshold 250 (a18 covers the
    spec's 300). Same semi-join-before-fact-join shape: the HAVING
    aggregate reduces lineitem to qualifying orderkeys before orders or
    customer are touched, so the two fact joins see only the big-order
    subset at any scale."""
    l = _t(spark, sf_dir, "lineitem")
    big_orders = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 250)
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


B18_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       SUM(l_quantity) AS sum_qty
FROM customer
JOIN orders   ON c_custkey=o_custkey
JOIN lineitem ON o_orderkey=l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
GROUP BY 1,2,3,4,5
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
"""


QUERIES = {
    "b1": b1,
    "b2": b2,
    "b3": b3,
    "b4": b4,
    "b5": b5,
    "b6": b6,
    "b7": b7,
    "b8": b8,
    "b9": b9,
    "b10": b10,
    "b11": b11,
    "b12": b12,
    "b13": b13,
    "b14": b14,
    "b15": b15,
    "b16": b16,
    "b17": b17,
    "b18": b18,
    "b19": b19,
    "b20": b20,
    "b21": b21,
    "b22": b22,
}
ORACLES = {
    name: tierb_sql(sql)
    for name, sql in {
        "b1": B1_SQL,
        "b2": B2_SQL,
        "b3": B3_SQL,
        "b4": B4_SQL,
        "b5": B5_SQL,
        "b6": B6_SQL,
        "b7": B7_SQL,
        "b8": B8_SQL,
        "b9": B9_SQL,
        "b10": B10_SQL,
        "b11": B11_SQL,
        "b12": B12_SQL,
        "b13": B13_SQL,
        "b14": B14_SQL,
        "b15": B15_SQL,
        "b16": B16_SQL,
        "b17": B17_SQL,
        "b18": B18_SQL,
        "b19": B19_SQL,
        "b20": B20_SQL,
        "b21": B21_SQL,
        "b22": B22_SQL,
    }.items()
}
