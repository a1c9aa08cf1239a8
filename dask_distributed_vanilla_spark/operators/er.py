"""Entity resolution / record linkage over the `customer` table.

A 100 TB curation pipeline that ingests records from many feeds needs
fuzzy-match dedup over *structured* records, not just documents — the
classic blocking + pairwise-compare shape (Fellegi–Sunter style; the
reference's nearest surface is dask.dataframe self-merge + map_partitions
string compare, `distributed/tests/test_collections.py` merge ops).

Scale contract: NEVER compare all pairs. A blocking key (here the
nation) partitions candidates so the self-join is equi-join-shaped —
Catalyst executes it as a hash join, and pair work is bounded per block.
The edit-distance compare runs JVM-side (`levenshtein`, codegen'd) on
candidate pairs only. At real scale you'd block on several cheap keys
(phonetic code, name q-grams, zip) and union the candidate sets; the
per-block quadratic cost is controlled by block-size caps exactly like
dedup.py's DF_CAP for shingles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dask_distributed_vanilla_spark.catalog import load_table


def er_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy-match census: per nation block, candidate-pair
    count and how many pairs land within each edit-distance band
    (levenshtein ≤ 1 / ≤ 2) over the customer name.

    Plan: one shuffle of the (pruned) customer projection on the block
    key; the self-join is a same-key hash join; `custkey` inequality
    halves the pair space; levenshtein evaluates inside codegen on the
    joined rows. No window, no cartesian.
    """
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_name"
    )
    a = c.alias("a")
    b = c.alias("b")
    pairs = a.join(
        b,
        (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
        & (F.col("a.c_custkey") < F.col("b.c_custkey")),
    ).select(
        F.col("a.c_nationkey").alias("block"),
        F.levenshtein(F.col("a.c_name"), F.col("b.c_name")).alias("d"),
    )
    return (
        pairs.groupBy("block")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.when(F.col("d") <= 1, 1).otherwise(0)).alias("n_lev1"),
            F.sum(F.when(F.col("d") <= 2, 1).otherwise(0)).alias("n_lev2"),
        )
        .orderBy("block")
    )


ER_BLOCKING_SQL = """
SELECT a.c_nationkey AS block,
       COUNT(*) AS n_pairs,
       CAST(SUM(CASE WHEN levenshtein(a.c_name, b.c_name) <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_lev1,
       CAST(SUM(CASE WHEN levenshtein(a.c_name, b.c_name) <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_lev2
FROM customer a JOIN customer b
  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
GROUP BY 1 ORDER BY 1
"""


def er_match_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linked-record extraction: the actual (left, right, distance)
    match pairs at levenshtein ≤ 1 within a compound block
    (nation, market segment) — the output a merge/survivorship stage
    consumes downstream.

    The compound key makes blocks smaller (pair work ∝ Σ block²), which
    is the knob that keeps blocked ER tractable as the table grows; the
    match predicate is pushed into the join condition so non-matches
    never materialize.
    """
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment", "c_name"
    )
    a = c.alias("a")
    b = c.alias("b")
    return (
        a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.c_mktsegment") == F.col("b.c_mktsegment"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .select(
            F.col("a.c_custkey").alias("left_key"),
            F.col("b.c_custkey").alias("right_key"),
            F.levenshtein(F.col("a.c_name"), F.col("b.c_name"))
            .cast("bigint")
            .alias("d"),
        )
        .where(F.col("d") <= 1)
        .orderBy("left_key", "right_key")
    )


ER_MATCH_PAIRS_SQL = """
SELECT a.c_custkey AS left_key, b.c_custkey AS right_key,
       levenshtein(a.c_name, b.c_name) AS d
FROM customer a JOIN customer b
  ON a.c_nationkey = b.c_nationkey
 AND a.c_mktsegment = b.c_mktsegment
 AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
ORDER BY 1, 2
"""


QUERIES = {
    "er_blocking": er_blocking,
    "er_match_pairs": er_match_pairs,
}
ORACLES = {
    "er_blocking": ER_BLOCKING_SQL,
    "er_match_pairs": ER_MATCH_PAIRS_SQL,
}
