"""Graph analytics over a derived co-occurrence graph.

Completes the graph story next to the dedup suite's connected
components (`operators/dedup.py::dedup_cc`): triangle counting and the
global clustering coefficient over the user co-occurrence graph (users
sharing an (event_type, minute) cell are connected).

The Spark plan uses the degree-ordered orientation algorithm
(Cohen's MapReduce triangle counting): orient every edge from its
lower-(degree, id) endpoint to the higher one, enumerate wedges only
among out-neighbors, and close them against the oriented edge set.
Orientation bounds every out-degree by O(sqrt(m)) regardless of how
skewed the raw degree distribution is — the celebrity-node wedge
explosion that kills the naive u<v plan at 100 TB cannot happen. The
DuckDB oracle deliberately stays the naive three-way self-join (exact
same count, different algorithm), so the check is genuinely
differential.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dask_distributed_vanilla_spark.catalog import load_table


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct undirected edges (u < v): users co-occurring in the same
    (event_type, minute) cell. The self-join is per-cell, so its cost is
    bounded by cell occupancy (seconds-to-minutes granularity keeps
    cells small; a hot cell would call for the salted variant)."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.select(
        "event_type", F.date_trunc("minute", F.col("ts")).alias("m"), "user_id"
    ).distinct()
    a, b = g.alias("a"), g.alias("b")
    return (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.m") == F.col("b.m"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .select(F.col("a.user_id").alias("u"), F.col("b.user_id").alias("v"))
        .distinct()
    )


def oriented_adjacency(e: DataFrame, deg: DataFrame) -> DataFrame:
    """Orient each edge toward the higher-(deg, id) endpoint, carrying
    the destination's degree so wedge pairs can be ordered without a
    re-join. Guarantees max out-degree ≤ sqrt(2m): an out-degree of d
    implies d neighbors of degree ≥ d, hence m ≥ d²/2 — the property
    that bounds the wedge join under any skew (pinned in tests)."""
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v"))
    ranked = e.join(du, "u").join(dv, "v")
    u_first = (F.col("deg_u") < F.col("deg_v")) | (
        (F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))
    )
    return ranked.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(u_first, F.col("deg_v")).otherwise(F.col("deg_u")).alias("deg_dst"),
    )


def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Judged query: triangle census of the co-occurrence graph — node,
    edge, wedge, and triangle counts plus the global clustering
    coefficient (3·triangles / wedges)."""
    # Materialize the edge list once: degrees, orientation, and the
    # closing-edge join all consume it — without the checkpoint the
    # co-occurrence self-join would recompute per consumer branch.
    e = _edges(spark, sf_dir).localCheckpoint()

    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint()
    )

    adj = oriented_adjacency(e, deg)

    # Wedges among out-neighbors, each unordered pair once (ordered by
    # the same (deg, id) rank the orientation uses), closed against the
    # oriented edges.
    x, y = adj.alias("x"), adj.alias("y")
    pair_lt = (F.col("x.deg_dst") < F.col("y.deg_dst")) | (
        (F.col("x.deg_dst") == F.col("y.deg_dst")) & (F.col("x.dst") < F.col("y.dst"))
    )
    wedges = x.join(y, (F.col("x.src") == F.col("y.src")) & pair_lt).select(
        F.col("x.dst").alias("lo"), F.col("y.dst").alias("hi")
    )
    closing = adj.select(F.col("src").alias("lo"), F.col("dst").alias("hi"))
    n_triangles = wedges.join(closing, ["lo", "hi"]).count()

    summary = (
        deg.agg(
            F.count(F.lit(1)).alias("n_nodes"),
            (F.sum(F.col("deg") * (F.col("deg") - 1)) / 2).cast("long").alias("n_wedges"),
            (F.sum("deg") / 2).cast("long").alias("n_edges"),
        )
        .withColumn("n_triangles", F.lit(n_triangles).cast("long"))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.round(F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 4).alias("gcc"),
        )
    )
    return summary


GRAPH_TRIANGLES_SQL = """
WITH g AS (
  SELECT DISTINCT event_type, date_trunc('minute', ts) AS m, user_id
  FROM events),
e AS (
  SELECT DISTINCT a.user_id AS u, b.user_id AS v
  FROM g a JOIN g b
    ON a.event_type = b.event_type AND a.m = b.m AND a.user_id < b.user_id),
deg AS (
  SELECT node, COUNT(*) AS deg
  FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
  GROUP BY node),
tri AS (
  SELECT COUNT(*) AS n
  FROM e e1 JOIN e e2 ON e1.v = e2.u JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(deg) / 2 AS BIGINT) AS n_edges,
       CAST(SUM(deg * (deg - 1)) / 2 AS BIGINT) AS n_wedges,
       CAST((SELECT n FROM tri) AS BIGINT) AS n_triangles,
       ROUND(3.0 * (SELECT n FROM tri) / (SUM(deg * (deg - 1)) / 2), 4) AS gcc
FROM deg
"""


def basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association over the co-purchase graph: for every
    pair of part types bought by the same customer, support counts and
    lift = P(a,b) / (P(a)·P(b)) — lift > 1 marks types bought together
    more than independence predicts.

    The basket table reduces to distinct (customer, type) FIRST — the
    projection that keeps the pair self-join bounded by basket size
    (6 types here; with a real item catalog the same plan bounds pair
    work per customer by their distinct-item count, and frequent-itemset
    pruning drops singleton items before pairing). Counts are exact;
    the only join wider than the dimension is keyed on customer.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    baskets = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(part, li.l_partkey == part.p_partkey)
        .select(F.col("o_custkey").alias("cust"), F.col("p_type").alias("t"))
        .distinct()
    )
    n_cust = baskets.select("cust").distinct().count()
    supp = baskets.groupBy("t").agg(F.count(F.lit(1)).alias("n"))
    a, b = baskets.alias("a"), baskets.alias("b")
    pairs = (
        a.join(b, (F.col("a.cust") == F.col("b.cust")) & (F.col("a.t") < F.col("b.t")))
        .groupBy(F.col("a.t").alias("type_a"), F.col("b.t").alias("type_b"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    sa = supp.select(F.col("t").alias("type_a"), F.col("n").alias("n_a"))
    sb = supp.select(F.col("t").alias("type_b"), F.col("n").alias("n_b"))
    lift = (F.col("n_ab") * F.lit(n_cust)) / (F.col("n_a") * F.col("n_b"))
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select("type_a", "type_b", "n_ab", F.round(lift, 3).alias("lift"))
        .orderBy("type_a", "type_b")
    )


BASKET_LIFT_SQL = """
WITH baskets AS (
  SELECT DISTINCT o_custkey AS cust, p_type AS t
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey),
n AS (SELECT COUNT(DISTINCT cust) AS n_cust FROM baskets),
supp AS (SELECT t, COUNT(*) AS n FROM baskets GROUP BY 1),
pairs AS (
  SELECT a.t AS type_a, b.t AS type_b, COUNT(*) AS n_ab
  FROM baskets a JOIN baskets b ON a.cust = b.cust AND a.t < b.t
  GROUP BY 1, 2)
SELECT type_a, type_b, n_ab,
       ROUND(n_ab * 1.0 * n_cust / (sa.n * sb.n), 3) AS lift
FROM pairs
JOIN supp sa ON sa.t = type_a
JOIN supp sb ON sb.t = type_b, n
ORDER BY type_a, type_b
"""


QUERIES = {
    "graph_triangles": graph_triangles,
    "basket_lift": basket_lift,
}

ORACLES = {
    "graph_triangles": GRAPH_TRIANGLES_SQL,
    "basket_lift": BASKET_LIFT_SQL,
}
