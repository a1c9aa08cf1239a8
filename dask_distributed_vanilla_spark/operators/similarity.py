"""Similarity search over the `embeddings` table (array<float> column).

Two paths, both pure DataFrame plans (vector math stays JVM-side via
higher-order functions — functions/vector.py):

- `ann_cosine_topk` — brute-force exact top-k: every query joined against
  every candidate. Correct baseline; quadratic, so it's the small-side
  path (queries × corpus where one side is modest).
- `ann_lsh_topk` — sign-LSH bucketed: vectors are bucketed by the sign
  pattern of their leading dimensions (axis-aligned random-projection
  LSH with fixed planes — deterministic and engine-portable); the join
  only pairs vectors within a bucket. This is the 100 TB shape: the
  self-join becomes bucket-local, and bucket width tunes recall/cost.
- `ivf_kmeans_search` — IVF via pyspark.ml KMeans centroids (library
  scale path; seeded but not oracle-hashed — unit-tested for recall).

Norms are precomputed once per side before the join — at scale that is
the difference between O(n·k) and O(n²) norm folds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dask_distributed_vanilla_spark.catalog import load_table
from dask_distributed_vanilla_spark.functions.vector import dot

N_QUERIES = 10  # vec_id < 10 are the query vectors in the declared ops
TOP_K = 5
LSH_BITS = 4  # 2^4 buckets on the leading dims


def _with_norm(df: DataFrame) -> DataFrame:
    return df.withColumn("norm", F.sqrt(dot(F.col("embedding"), F.col("embedding"))))


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-{k} cosine neighbors for each query vector (vec_id < {n}).

    broadcast(queries) ⋈ corpus — one pass over the corpus computing
    dot/norms in codegen, then per-query top-k via window rank (at scale:
    TakeOrdered per query key, no global sort).
    """
    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("norm").alias("c_norm"),
    )
    cos = dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_norm") * F.col("c_norm"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", F.round("cos", 2).alias("cosine"))
        .orderBy("query_id", "rank")
    )


ANN_COSINE_SQL = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS norm
  FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.emb, c.emb) / (q.norm * c.norm) AS cos
  FROM e q JOIN e c ON q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, ROUND(cos, 2) AS cosine
FROM ranked WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


def _bucket_expr():
    """Sign pattern of the leading {bits} dimensions as a bit-string —
    deterministic axis-aligned LSH, identical in any engine."""
    return F.concat(
        *[
            F.when(F.element_at("embedding", i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(LSH_BITS)
        ]
    )


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed approximate top-{k}: candidates share the query's sign-LSH
    bucket, so the pair join is bucket-local (equi-join on the bucket key
    → hash-partitionable, no quadratic blowup)."""
    emb = _with_norm(load_table(spark, sf_dir, "embeddings")).withColumn(
        "bucket", _bucket_expr()
    )
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
        "bucket",
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("norm").alias("c_norm"),
        "bucket",
    )
    cos = dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_norm") * F.col("c_norm"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        q.join(c, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", F.round("cos", 2).alias("cosine"))
        .orderBy("query_id", "rank")
    )


def _lsh_sql() -> str:
    bucket = " || ".join(
        f"CASE WHEN emb[{i + 1}] >= 0 THEN '1' ELSE '0' END" for i in range(LSH_BITS)
    )
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS norm
  FROM embeddings),
b AS (SELECT *, {bucket} AS bucket FROM e),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.emb, c.emb) / (q.norm * c.norm) AS cos
  FROM b q JOIN b c ON q.bucket = c.bucket
  WHERE q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, ROUND(cos, 2) AS cosine
FROM ranked WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos ≥ 0.45 — above the
    random-pair band of the fixture distribution).

    Broadcast-matmul shape: the corpus matrix is broadcast once, and the
    distributed side streams Arrow batches through a vectorized
    batch×corpusᵀ BLAS product — each task scans its batch of vectors
    exactly once, no pair-row materialization. This is the exact path
    while one side fits in executor memory (here: 64-dim floats → ~0.5 KB
    per vector, so hundreds of millions of vectors per broadcast GB);
    beyond that the LSH/IVF buckets above take over.
    """
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = emb.toPandas()
    ids = corpus["vec_id"].to_numpy()
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in corpus["embedding"]])
    norms = np.sqrt((mat * mat).sum(axis=1))
    bc = spark.sparkContext.broadcast((ids, mat, norms))

    def pairs(batches):
        import pandas as pd

        c_ids, c_mat, c_norms = bc.value
        for pdf in batches:
            a_ids = pdf["vec_id"].to_numpy()
            a_mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            a_norms = np.sqrt((a_mat * a_mat).sum(axis=1))
            cos = (a_mat @ c_mat.T) / np.outer(a_norms, c_norms)
            ai, ci = np.nonzero((cos >= 0.45) & (a_ids[:, None] < c_ids[None, :]))
            yield pd.DataFrame(
                {"vec_a": a_ids[ai], "vec_b": c_ids[ci], "cos": cos[ai, ci]}
            )

    return (
        emb.mapInPandas(pairs, "vec_a long, vec_b long, cos double")
        .select("vec_a", "vec_b", F.round("cos", 2).alias("cosine"))
        .orderBy("vec_a", "vec_b")
    )


EMB_NEAR_DUP_SQL = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS norm
  FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND(list_dot_product(a.emb, b.emb) / (a.norm * b.norm), 2) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.emb, b.emb) / (a.norm * b.norm) >= 0.45
ORDER BY vec_a, vec_b
"""


def ivf_kmeans_search(
    spark: SparkSession, sf_dir: str, n_clusters: int = 8, n_probe: int = 2
) -> DataFrame:
    """IVF-style ANN: KMeans coarse quantizer → search only the n_probe
    nearest inverted lists per query. Library scale path (pyspark.ml);
    seeded, unit-tested for recall rather than oracle-hashed."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "features", array_to_vector(F.col("embedding").cast("array<double>"))
    )
    model = KMeans(k=n_clusters, seed=42, featuresCol="features").fit(emb)
    assigned = _with_norm(model.transform(emb).withColumnRenamed("prediction", "list_id"))

    centers = model.clusterCenters()
    centers_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)], "list_id int, center array<double>"
    )
    q = assigned.where(F.col("vec_id") < N_QUERIES)
    # n_probe nearest centroids per query
    qc = q.crossJoin(F.broadcast(centers_df.withColumnRenamed("list_id", "probe_list")))
    d2 = dot(F.col("embedding"), F.col("embedding")) - 2 * dot(
        F.col("embedding"), F.col("center")
    ) + dot(F.col("center"), F.col("center"))
    wq = Window.partitionBy("vec_id").orderBy("d2", "probe_list")
    probes = (
        qc.withColumn("d2", d2)
        .withColumn("pr", F.row_number().over(wq))
        .where(F.col("pr") <= n_probe)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"),
                F.col("norm").alias("q_norm"), F.col("probe_list").alias("list_id"))
    )
    c = assigned.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"),
        F.col("norm").alias("c_norm"), "list_id",
    )
    cos = dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_norm") * F.col("c_norm"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        probes.join(c, "list_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", F.round("cos", 2).alias("cosine"))
        .orderBy("query_id", "rank")
    )


QUERIES = {
    "ann_cosine_topk": ann_cosine_topk,
    "ann_lsh_topk": ann_lsh_topk,
    "embedding_near_dup": embedding_near_dup,
}

ORACLES = {
    "ann_cosine_topk": ANN_COSINE_SQL,
    "ann_lsh_topk": _lsh_sql(),
    "embedding_near_dup": EMB_NEAR_DUP_SQL,
}
