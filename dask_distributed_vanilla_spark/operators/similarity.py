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
- `ann_pq_search` — product quantization: per-subspace codebooks encode
  the corpus as n_sub small ints (the memory workhorse at 1B+ vectors),
  ADC equi-join scoring builds a shortlist, exact cosine re-ranks it
  (seeded; recall-tested).

Norms are precomputed once per side before the join — at scale that is
the difference between O(n·k) and O(n²) norm folds.
"""

from __future__ import annotations

import math

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
    cos = dot(F.col("q_emb"), F.col("c_emb")) / F.nullif(F.col("q_norm") * F.col("c_norm"), F.lit(0.0))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", (F.floor((F.col("cos")) * 100 + F.lit(0.5)) / 100).alias("cosine"))
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
         list_dot_product(q.emb, c.emb) / NULLIF(q.norm * c.norm, 0) AS cos
  FROM e q JOIN e c ON q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, FLOOR((cos) * 100 + 0.5) / 100 AS cosine
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
    cos = dot(F.col("q_emb"), F.col("c_emb")) / F.nullif(F.col("q_norm") * F.col("c_norm"), F.lit(0.0))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        q.join(c, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", (F.floor((F.col("cos")) * 100 + F.lit(0.5)) / 100).alias("cosine"))
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
         list_dot_product(q.emb, c.emb) / NULLIF(q.norm * c.norm, 0) AS cos
  FROM b q JOIN b c ON q.bucket = c.bucket
  WHERE q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, FLOOR((cos) * 100 + 0.5) / 100 AS cosine
FROM ranked WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


N_BLOCKS = 8  # block grid for the exact all-pairs path


def embedding_near_dup(
    spark: SparkSession, sf_dir: str, n_blocks: int = N_BLOCKS
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos ≥ 0.45 — above the
    random-pair band of the fixture distribution).

    Block-partitioned exact all-pairs: vectors are hashed into
    ``n_blocks`` blocks on vec_id, each unordered block pair (i ≤ j) is
    cogrouped onto one task, and that task runs a single vectorized
    block_i × block_jᵀ BLAS product, emitting only the qualifying pairs.
    Nothing materializes on the driver and no pair-rows exist outside a
    task: peak memory per task is two blocks (at 64-dim float64 ≈ 512 B
    per vector ≈ 2M vectors per GB, so block size tunes to the executor
    heap; on a cluster, n_blocks scales as ceil(n/target_block)). Total
    work is inherently quadratic — the exact-verification path; beyond
    that scale the `ann_lsh_topk` / IVF buckets above are the route.
    """
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # Fresh scan for the right side: cogrouping two branches of the SAME
    # plan shares attribute IDs and Spark then over-prunes the right
    # group's columns down to the keys.
    emb_r = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    blk = F.pmod(F.col("vec_id"), F.lit(n_blocks)).cast("int")
    # Replicate each block row-wise across the triangular pair grid: the
    # cogroup key (i, j) then holds exactly block i on the left and
    # block j on the right, i ≤ j — every unordered pair once.
    left = emb.withColumn("i", blk).withColumn(
        "j", F.explode(F.sequence(F.col("i"), F.lit(n_blocks - 1)))
    )
    right = emb_r.withColumn("j", blk).withColumn(
        "i", F.explode(F.sequence(F.lit(0), F.col("j")))
    )

    def block_pair(key: tuple, la: pd.DataFrame, rb: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "vec_a": np.array([], dtype=np.int64),
                "vec_b": np.array([], dtype=np.int64),
                "cos": np.array([], dtype=np.float64),
            }
        )
        if la.empty or rb.empty:
            return empty
        a_ids = la["vec_id"].to_numpy()
        b_ids = rb["vec_id"].to_numpy()
        a_mat = np.stack([np.asarray(v, dtype=np.float64) for v in la["embedding"]])
        b_mat = np.stack([np.asarray(v, dtype=np.float64) for v in rb["embedding"]])
        a_norms = np.sqrt((a_mat * a_mat).sum(axis=1))
        b_norms = np.sqrt((b_mat * b_mat).sum(axis=1))
        cos = (a_mat @ b_mat.T) / np.outer(a_norms, b_norms)
        hit = cos >= 0.45
        if key[0] == key[1]:
            # diagonal block: both orders present, keep the a < b half
            hit &= a_ids[:, None] < b_ids[None, :]
        ai, bi = np.nonzero(hit)
        lo = np.minimum(a_ids[ai], b_ids[bi])
        hi = np.maximum(a_ids[ai], b_ids[bi])
        return pd.DataFrame({"vec_a": lo, "vec_b": hi, "cos": cos[ai, bi]})

    pairs = (
        left.groupBy("i", "j")
        .cogroup(right.groupBy("i", "j"))
        .applyInPandas(block_pair, "vec_a long, vec_b long, cos double")
    )
    return (
        pairs.select("vec_a", "vec_b", (F.floor((F.col("cos")) * 100 + F.lit(0.5)) / 100).alias("cosine"))
        .orderBy("vec_a", "vec_b")
    )


EMB_NEAR_DUP_SQL = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS norm
  FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       FLOOR((list_dot_product(a.emb, b.emb) / NULLIF(a.norm * b.norm, 0)) * 100 + 0.5) / 100 AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.emb, b.emb) / NULLIF(a.norm * b.norm, 0) >= 0.45
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
    cos = dot(F.col("q_emb"), F.col("c_emb")) / F.nullif(F.col("q_norm") * F.col("c_norm"), F.lit(0.0))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        probes.join(c, "list_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", (F.floor((F.col("cos")) * 100 + F.lit(0.5)) / 100).alias("cosine"))
        .orderBy("query_id", "rank")
    )


def ann_pq_search(
    spark: SparkSession,
    sf_dir: str,
    n_sub: int = 8,
    n_codes: int = 16,
    shortlist: int = 50,
) -> DataFrame:
    """Product-quantization ANN: retrieve by asymmetric-distance codes,
    re-rank the shortlist exactly — the third scale path next to sign-LSH
    bucketing and IVF probing.

    Each unit-normalized vector splits into `n_sub` subvectors; a seeded
    per-subspace KMeans codebook (`n_codes` centroids) encodes the corpus
    as `n_sub` small integers — at a billion vectors the codes are ~n_sub
    bytes/vector instead of 4·dim, which is the reason PQ is the memory
    workhorse of ANN. Scoring is the ADC shape expressed relationally:
    per-query subvector·centroid dot products form a (query, sub, code)
    table that the exploded corpus codes equi-join, and the per-pair SUM
    of matched entries is the approximate dot product. The `shortlist`
    best by ADC are then re-ranked with the EXACT cosine (the standard
    retrieve-then-rerank contract: PQ bounds memory and candidate count,
    exactness is restored where it matters).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, sf_dir, "embeddings")
    d = len(emb.select("embedding").first()[0])
    d_sub = d // n_sub
    unit = _with_norm(emb).select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"), lambda x: x / F.nullif(F.col("norm"), F.lit(0.0))
        ).alias("u"),
    )
    for m in range(n_sub):
        unit = unit.withColumn(
            f"f{m}", array_to_vector(F.slice("u", m * d_sub + 1, d_sub))
        )
    corpus = unit.where(F.col("vec_id") >= N_QUERIES)

    coded = corpus
    center_rows = []
    for m in range(n_sub):
        model = KMeans(
            k=n_codes, seed=42 + m, featuresCol=f"f{m}", predictionCol=f"c{m}"
        ).fit(corpus)
        coded = model.transform(coded)
        center_rows += [
            (m, j, [float(x) for x in c]) for j, c in enumerate(model.clusterCenters())
        ]
    centers = spark.createDataFrame(
        center_rows, "sub int, code int, center array<double>"
    )

    # per-query ADC lookup table: dot(query subvector, centroid)
    q = unit.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "u"
    )
    lut = (
        q.crossJoin(F.broadcast(centers))
        .select(
            "query_id",
            "sub",
            "code",
            dot(F.slice("u", F.col("sub") * d_sub + 1, d_sub), F.col("center")).alias(
                "pdot"
            ),
        )
    )

    codes_long = coded.select(
        F.col("vec_id").alias("neighbor_id"),
        F.posexplode(F.array(*[F.col(f"c{m}") for m in range(n_sub)])).alias(
            "sub", "code"
        ),
    )
    adc = (
        codes_long.join(F.broadcast(lut), ["sub", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("pdot").alias("adc"))
    )
    ws = Window.partitionBy("query_id").orderBy(F.desc("adc"), "neighbor_id")
    short = adc.withColumn("sr", F.row_number().over(ws)).where(
        F.col("sr") <= shortlist
    )

    # exact re-rank of the shortlist on unit vectors (dot == cosine)
    qv = q.select("query_id", F.col("u").alias("qu"))
    cv = unit.select(F.col("vec_id").alias("neighbor_id"), F.col("u").alias("cu"))
    wr = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        short.join(qv, "query_id")
        .join(cv, "neighbor_id")
        .withColumn("cos", dot(F.col("qu"), F.col("cu")))
        .withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "neighbor_id", (F.floor((F.col("cos")) * 100 + F.lit(0.5)) / 100).alias("cosine"))
        .orderBy("query_id", "rank")
    )


SEMDEDUP_TAU = 0.35


def semdedup(spark: SparkSession, sf_dir: str, tau: float = SEMDEDUP_TAU) -> DataFrame:
    """SemDeDup-style semantic dedup: within each cluster (the `label`
    column stands in for the coarse-quantizer assignment), a vector is
    dropped when a lower-id vector of the same cluster sits within
    cosine >= tau; survivors are the kept corpus. The pairwise pass is
    scoped to a cluster cell — the SemDeDup contract that makes
    embedding dedup tractable: the quadratic term is (cell size)^2, and
    at 100 TB the quantizer's k is raised to hold cells at ~10^3-10^4
    vectors, so the equi-join on `label` shuffles each cell to one task
    and no global pairwise product ever forms. Dot products are JVM
    higher-order folds; norms are computed once per vector and carried
    as a scalar column (cos >= tau rewritten multiplicatively so no
    per-pair normalization happens); the keep-decision is a left-anti
    join.
    """
    from dask_distributed_vanilla_spark.functions.vector import dot, l2_norm

    base = load_table(spark, sf_dir, "embeddings")
    # The norm is carried as a scalar column so each pair evaluates one
    # 2·dim fold (the dot) plus two multiplies — localCheckpoint stops
    # Catalyst's projection collapse from inlining the norm expression
    # into the pair-level predicate (where it would re-fold per pair).
    # The 100 TB analog is materializing the normalized corpus once
    # before the dedup pass — standard practice for embedding pipelines.
    from dask_distributed_vanilla_spark.catalog import spread

    # spread before the checkpoint: the single-row-group embeddings scan
    # would otherwise leave ONE cached partition, making every per-pair
    # dot-product fold downstream single-threaded (catalog.spread)
    e = (
        spread(base)
        .select("vec_id", "label", "embedding", l2_norm(F.col("embedding")).alias("nrm"))
        .localCheckpoint()
    )
    a = e.select(
        F.col("vec_id").alias("id_a"), F.col("label").alias("lbl"),
        F.col("embedding").alias("ea"), F.col("nrm").alias("na"),
    )
    b = e.select(
        F.col("vec_id").alias("id_b"), F.col("label").alias("lbl"),
        F.col("embedding").alias("eb"), F.col("nrm").alias("nb"),
    )
    dominated = (
        a.join(b, "lbl")
        .where(F.col("id_b") < F.col("id_a"))
        # zero-norm guard: the multiplicative rewrite of cos >= tau
        # degenerates to 0 >= 0 (TRUE) when either norm is 0, silently
        # marking a zero vector as everyone's duplicate — but its
        # cosine is UNDEFINED, and the oracle's NULL comparison keeps
        # it. Undefined similarity means "not a duplicate" on both
        # engines (hostile-embeddings fuzz).
        .where((F.col("na") > 0) & (F.col("nb") > 0))
        .where(dot(F.col("ea"), F.col("eb")) >= tau * F.col("na") * F.col("nb"))
        .select(F.col("id_a").alias("vec_id"))
        .distinct()
    )
    return (
        e.join(dominated, "vec_id", "left_anti")
        .select("vec_id", "label")
        .orderBy("vec_id")
    )


def _semdedup_sql(tau: float = SEMDEDUP_TAU) -> str:
    return f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT x.vec_id, x.label
FROM e x
WHERE NOT EXISTS (
  SELECT 1 FROM e y
  WHERE y.label = x.label AND y.vec_id < x.vec_id
    AND list_dot_product(x.v, y.v)
        / NULLIF(sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v)), 0)
        >= {tau})
ORDER BY x.vec_id
"""


def emb_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding aggregates: vector count, mean L2 norm, and
    the norm of the element-wise centroid — the cluster-profile pass an
    embedding pipeline runs after labeling (and the building block of
    IVF coarse quantizers). Per-vector norms are JVM higher-order folds
    on the scan; the centroid is posexplode → (label, dim) partial
    means → per-label recombine, i.e. two map-side-combinable shuffles
    whose width is |labels|·dim regardless of corpus size."""
    from dask_distributed_vanilla_spark.functions.rounding import round2
    from dask_distributed_vanilla_spark.functions.vector import l2_norm

    emb = load_table(spark, sf_dir, "embeddings")
    norms = (
        emb.select("label", l2_norm(F.col("embedding")).alias("nrm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.avg("nrm").alias("avg_norm"),
        )
    )
    cent = (
        emb.select("label", F.posexplode("embedding").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.avg("x").alias("cv"))
        .groupBy("label")
        .agg(F.sqrt(F.sum(F.col("cv") * F.col("cv"))).alias("centroid_norm"))
    )
    return (
        norms.join(cent, "label")
        .select(
            "label",
            "n_vecs",
            round2(F.col("avg_norm")).alias("avg_norm"),
            round2(F.col("centroid_norm")).alias("centroid_norm"),
        )
        .orderBy("label")
    )


def _emb_centroids_sql() -> str:
    from dask_distributed_vanilla_spark.functions.rounding import round2_sql

    return f"""
WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT label, COUNT(*) AS n_vecs,
             AVG(sqrt(list_dot_product(v, v))) AS avg_norm
      FROM e GROUP BY 1),
x AS (SELECT label, i, v[i] AS xv
      FROM e, unnest(generate_series(1, len(v))) AS u(i)),
c AS (SELECT label, i, AVG(xv) AS cv FROM x GROUP BY 1, 2),
cn AS (SELECT label, sqrt(SUM(cv * cv)) AS centroid_norm FROM c GROUP BY 1)
SELECT n.label, n.n_vecs,
       {round2_sql("n.avg_norm")} AS avg_norm,
       {round2_sql("cn.centroid_norm")} AS centroid_norm
FROM n JOIN cn USING (label) ORDER BY n.label
"""


def emb_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 affine quantization audit: quantize each embedding to uint8
    with a per-vector (min, max) affine map, dequantize, and report the
    reconstruction error per label — the storage-reduction pass (4×
    smaller than fp32) every 100 TB embedding corpus runs before
    serving, with the error report as its acceptance gate.

    All JVM higher-order functions on a single scan: per-vector min/max
    fold, element-wise transform for quantize→dequantize, mean-abs-error
    fold, then one |labels|-row aggregate. No shuffle wider than the
    final group-by, no Python.
    """
    from dask_distributed_vanilla_spark.functions.rounding import round2

    # Widen to float64 BEFORE any arithmetic: embedding arrives as
    # array<float>, and uncast (hi - lo) / (x - lo) would round in
    # float32 before the division widens — a ~2^-24 relative drift vs
    # the all-DOUBLE oracle that can flip round()'s .5 quantization
    # boundary or a .xx5 display cent (the round-10 fuzz-catch class).
    # Same pattern as the other embedding operators' CAST(... AS DOUBLE).
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    lo = F.array_min("embedding")
    hi = F.array_max("embedding")
    scale = (hi - lo) / F.lit(255.0)
    # guard constant vectors: scale 0 → dequant = lo exactly
    q = F.transform(
        F.col("embedding"),
        lambda x: F.when(
            F.col("_scale") > 0, F.round((x - F.col("_lo")) / F.col("_scale"))
        ).otherwise(F.lit(0.0)),
    )
    dq = F.transform(
        F.col("_q"), lambda v: v * F.col("_scale") + F.col("_lo")
    )
    err = (
        emb.withColumn("_lo", lo)
        .withColumn("_scale", scale)
        .withColumn("_q", q)
        .withColumn("_dq", dq)
        .select(
            "label",
            (
                F.aggregate(
                    F.zip_with(
                        "embedding", "_dq", lambda a, b: F.abs(a - b)
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / F.size("embedding")
            ).alias("mae"),
        )
    )
    return (
        err.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            round2(F.avg("mae") * 1000).alias("mae_x1000"),
            round2(F.max("mae") * 1000).alias("max_mae_x1000"),
        )
        .orderBy("label")
    )


# DOUBLE casts are load-bearing: DuckDB keeps list_min(FLOAT[]) as
# FLOAT and FLOAT / DECIMAL(4,1) (the 255.0 literal) as FLOAT, so an
# uncast oracle quantizes in float32 while the Spark engine runs in
# float64 — the ~1e-8 per-element drift flips the half-up display
# cent whenever a group's mae lands on a .xx5 boundary (round-10 fuzz
# catch, pinned in test_emb_quantize_f32_oracle_boundary). Both sides
# now widen BEFORE the subtractions (engine: array<double> cast at
# load; oracle: the CASTs below), so the precisions match bit-exactly.
EMB_QUANTIZE_SQL = """
WITH q AS (
  SELECT label,
         CAST(list_min(embedding) AS DOUBLE) AS lo,
         (CAST(list_max(embedding) AS DOUBLE)
          - CAST(list_min(embedding) AS DOUBLE)) / CAST(255.0 AS DOUBLE) AS scale,
         embedding
  FROM embeddings),
d AS (
  SELECT label,
         CASE WHEN scale > 0 THEN
           list_sum(list_transform(
             list_zip(embedding,
                      list_transform(embedding,
                        x -> round((CAST(x AS DOUBLE) - lo) / scale) * scale + lo)),
             p -> abs(CAST(p[1] AS DOUBLE) - p[2]))) / len(embedding)
         ELSE 0.0 END AS mae
  FROM q)
SELECT label, COUNT(*) AS n_vecs,
       FLOOR((AVG(mae) * 1000) * 100 + 0.5) / 100 AS mae_x1000,
       FLOOR((MAX(mae) * 1000) * 100 + 0.5) / 100 AS max_mae_x1000
FROM d GROUP BY 1 ORDER BY 1
"""


RRF_K = 60  # the standard reciprocal-rank-fusion damping constant
RRF_POOL = 20  # per-modality candidate depth feeding the fusion


def ann_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion of the lexical and the
    vector ranking for each query document (doc_id = vec_id < {n}) —
    score(d) = Σ_modality 1/({k} + rank_modality(d)) over the union of
    both top-{pool} candidate lists, the fusion every hybrid-search
    stack (BM25 ⊕ dense) runs.

    Scale shape: the vector half is ann_cosine_topk's broadcast(q) ⋈
    corpus scan; the lexical half joins the query docs' distinct terms
    (a broadcast, |queries|·|terms/doc| rows) against the corpus token
    table, so corpus postings are scanned once and never shuffled —
    at stop-word df the candidate count per query term is bounded by
    the same df band-pass text_inverted_index applies (here the fixed
    stopword list). Fusion is a pool-sized full-outer join per query:
    ranks are integers, so 1/(k+r) is the same double on every engine
    and the fused ordering is engine-portable with no rounding tricks.
    """
    from dask_distributed_vanilla_spark.operators.text import STOPWORDS

    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    c = emb.select(
        F.col("vec_id").alias("doc_id"),
        F.col("embedding").alias("c_emb"),
        F.col("norm").alias("c_norm"),
    )
    cos = dot(F.col("q_emb"), F.col("c_emb")) / F.nullif(F.col("q_norm") * F.col("c_norm"), F.lit(0.0))
    wv = Window.partitionBy("query_id").orderBy(F.desc("cos"), "doc_id")
    vec_rank = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("doc_id"))
        .withColumn("cos", cos)
        .withColumn("r_vec", F.row_number().over(wv))
        .where(F.col("r_vec") <= RRF_POOL)
        .select("query_id", "doc_id", "r_vec")
    )

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("term"),
    ).where(~F.col("term").isin(*STOPWORDS))
    qtok = tok.where(F.col("doc_id") < N_QUERIES).select(
        F.col("doc_id").alias("query_id"), "term"
    )
    wl = Window.partitionBy("query_id").orderBy(F.desc("overlap"), "doc_id")
    lex_rank = (
        F.broadcast(qtok)
        .join(tok, "term")
        .where(F.col("query_id") != F.col("doc_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("overlap"))
        .withColumn("r_lex", F.row_number().over(wl))
        .where(F.col("r_lex") <= RRF_POOL)
        .select("query_id", "doc_id", "r_lex")
    )

    rrf = F.coalesce(1.0 / (RRF_K + F.col("r_vec")), F.lit(0.0)) + F.coalesce(
        1.0 / (RRF_K + F.col("r_lex")), F.lit(0.0)
    )
    wf = Window.partitionBy("query_id").orderBy(F.desc("rrf"), "doc_id")
    return (
        vec_rank.join(lex_rank, ["query_id", "doc_id"], "full_outer")
        .withColumn("rrf", rrf)
        .withColumn("rank", F.row_number().over(wf).cast("int"))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "doc_id", (F.floor((F.col("rrf")) * 10000 + F.lit(0.5)) / 10000).alias("rrf"))
        .orderBy("query_id", "rank")
    )


def _hybrid_rrf_sql() -> str:
    from dask_distributed_vanilla_spark.operators.text import STOPWORDS

    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS norm
  FROM embeddings),
vec AS (
  SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
         list_dot_product(q.emb, c.emb) / NULLIF(q.norm * c.norm, 0) AS cos
  FROM e q JOIN e c ON q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id),
vecr AS (
  SELECT query_id, doc_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, doc_id) AS r_vec
  FROM vec QUALIFY r_vec <= {RRF_POOL}),
tok AS (
  SELECT doc_id, UNNEST(list_distinct(string_split(text, ' '))) AS term
  FROM documents),
ftok AS (SELECT * FROM tok WHERE term NOT IN {STOPWORDS!r}),
qt AS (SELECT doc_id AS query_id, term FROM ftok WHERE doc_id < {N_QUERIES}),
ov AS (
  SELECT qt.query_id, t.doc_id, COUNT(*) AS overlap
  FROM qt JOIN ftok t USING (term)
  WHERE t.doc_id <> qt.query_id GROUP BY 1, 2),
lexr AS (
  SELECT query_id, doc_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY overlap DESC, doc_id) AS r_lex
  FROM ov QUALIFY r_lex <= {RRF_POOL}),
fused AS (
  SELECT COALESCE(v.query_id, l.query_id) AS query_id,
         COALESCE(v.doc_id, l.doc_id) AS doc_id,
         COALESCE(1.0 / ({RRF_K} + v.r_vec), 0.0)
           + COALESCE(1.0 / ({RRF_K} + l.r_lex), 0.0) AS rrf
  FROM vecr v FULL OUTER JOIN lexr l
    ON v.query_id = l.query_id AND v.doc_id = l.doc_id),
final AS (
  SELECT query_id, doc_id, rrf,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rank
  FROM fused QUALIFY rank <= {TOP_K})
SELECT query_id, CAST(rank AS INT) AS rank, doc_id, FLOOR((rrf) * 10000 + 0.5) / 10000 AS rrf
FROM final ORDER BY query_id, rank
"""


PCA_TOP = 10


def emb_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA spectrum of the embedding corpus: top-{k} eigenvalues of the
    covariance matrix with explained-variance ratios — the
    dimensionality audit behind embedding compression (how many PQ/IVF
    dimensions actually carry signal) and drift detection (a collapsing
    spectrum means the encoder is saturating).

    Scale shape — the classic two-phase distributed PCA: executors
    reduce Arrow batches to (n, Σx, XᵀX) partials via BLAS (one d²
    vector per batch, data never leaves its partition), the partials
    sum into a d×d Gram, and the eigendecomposition runs on the driver
    where it belongs (d² doubles — KB, not data-sized; same
    driver-sized-by-design contract as the TSQR SVD factors). Corpus
    size only affects the embarrassingly-parallel partial pass.

    Rows-only judged (no SQL eigensolver); pinned against numpy PCA of
    the full matrix in test_queries.py.
    """
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select("embedding")
    dim = len(emb.first()["embedding"])

    def gram_partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [len(x)],
                    "s": [x.sum(axis=0).tolist()],
                    "g": [(x.T @ x).ravel().tolist()],
                }
            )

    parts = emb.mapInPandas(
        gram_partials, schema="n long, s array<double>, g array<double>"
    ).toPandas()  # one tiny row per Arrow batch — partition-count-sized
    n = int(parts["n"].sum())
    s = np.sum(np.vstack(parts["s"].to_numpy()), axis=0)
    g = np.sum(np.vstack(parts["g"].to_numpy()), axis=0).reshape(dim, dim)
    mu = s / n
    cov = g / n - np.outer(mu, mu)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    total = float(evals.sum())
    rows = [
        (
            i + 1,
            math.floor(float(evals[i]) * 1000000 + 0.5) / 1000000,
            math.floor(float(evals[i] / total) * 10000 + 0.5) / 10000,
            math.floor(float(evals[: i + 1].sum() / total) * 10000 + 0.5) / 10000,
        )
        for i in range(min(PCA_TOP, dim))
    ]
    return spark.createDataFrame(
        rows, "component int, eigenvalue double, explained_var double, cum_var double"
    )


OUTLIER_K = 5  # most-suspicious vectors reported per label


def emb_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-coherence outliers: the {k} vectors per label with the
    LOWEST cosine to their own label centroid — the mislabeled/garbage
    candidates an embedding-cleaning pass sends to review (SemDeDup
    prunes near-duplicates; this prunes the opposite tail).

    Fully relational — no array reassembly: vectors posexplode once,
    (label, dim) partial means form the centroids (shuffle width
    |labels|·dim regardless of corpus size), and each vector's dot with
    its centroid is an equi-join on (label, pos) + one per-vector sum,
    ranked bottom-k per label. Ranking keys on the binary-rounded
    cosine, so the order is engine-exact.
    """
    from dask_distributed_vanilla_spark.functions.rounding import round2
    from dask_distributed_vanilla_spark.functions.vector import l2_norm

    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select("vec_id", "label", F.posexplode("embedding").alias("pos", "x"))
    cent = ex.groupBy("label", "pos").agg(F.avg("x").alias("cv"))
    cent_norm = cent.groupBy("label").agg(
        F.sqrt(F.sum(F.col("cv") * F.col("cv"))).alias("cent_norm")
    )
    dots = (
        ex.join(F.broadcast(cent), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(F.sum(F.col("x") * F.col("cv")).alias("dot"))
    )
    vnorm = emb.select("vec_id", l2_norm(F.col("embedding")).alias("vnorm"))
    cos = (
        dots.join(vnorm, "vec_id")
        .join(F.broadcast(cent_norm), "label")
        .select(
            "label",
            "vec_id",
            (F.col("dot") / F.nullif(F.col("vnorm") * F.col("cent_norm"), F.lit(0.0))).alias("cos"),
        )
    )
    w = Window.partitionBy("label").orderBy(
        F.floor(F.col("cos") * 10000 + F.lit(0.5)), "vec_id"
    )
    # A zero-norm vector has no defined cosine (cos is NULL): it must
    # not occupy an outlier rank — Spark sorts NULLs FIRST ascending
    # while DuckDB sorts them LAST, so leaving it in the window ranks
    # it on one engine and not the other (hostile-embeddings fuzz).
    return (
        cos.where(F.col("cos").isNotNull())
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= OUTLIER_K)
        .select("label", "rank", "vec_id", round2(F.col("cos")).alias("cos_centroid"))
        .orderBy("label", "rank")
    )


def _emb_outliers_sql() -> str:
    from dask_distributed_vanilla_spark.functions.rounding import round2_sql

    return f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
ex AS (SELECT vec_id, label, unnest(v) AS x,
              generate_subscripts(v, 1) AS pos FROM e),
cent AS (SELECT label, pos, AVG(x) AS cv FROM ex GROUP BY 1, 2),
cn AS (SELECT label, sqrt(SUM(cv * cv)) AS cent_norm FROM cent GROUP BY 1),
dots AS (
  SELECT ex.vec_id, ex.label, SUM(ex.x * c.cv) AS dot
  FROM ex JOIN cent c ON ex.label = c.label AND ex.pos = c.pos
  GROUP BY 1, 2),
vn AS (SELECT vec_id, sqrt(list_dot_product(v, v)) AS vnorm FROM e),
cos AS (
  SELECT d.label, d.vec_id, d.dot / NULLIF(vn.vnorm * cn.cent_norm, 0) AS cos
  FROM dots d JOIN vn USING (vec_id) JOIN cn USING (label)),
ranked AS (
  SELECT label, vec_id, cos,
         ROW_NUMBER() OVER (PARTITION BY label
                            ORDER BY FLOOR(cos * 10000 + 0.5), vec_id) AS rank
  FROM cos WHERE cos IS NOT NULL)
SELECT label, CAST(rank AS INT) AS rank, vec_id,
       {round2_sql("cos")} AS cos_centroid
FROM ranked WHERE rank <= {OUTLIER_K} ORDER BY label, rank
"""


def emb_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding drift monitor: per-label centroid shift between the
    first and second half of the corpus (vec_id parity as the epoch
    proxy) — the encoder-health check that pages when a re-embedding
    run or upstream distribution change moves a class's centroid
    (dq_drift's KL monitor for scalars, done for vectors).

    All relational: one posexplode, (half, label, dim) partial means,
    self-join of the two halves' centroids on (label, dim), per-label
    L2 of the difference — shuffle width is |labels|·dim·2 regardless
    of corpus size.
    """
    from dask_distributed_vanilla_spark.functions.rounding import round2

    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        (F.col("vec_id") % 2).alias("half"),
        "label",
        F.posexplode("embedding").alias("pos", "x"),
    )
    cent = ex.groupBy("half", "label", "pos").agg(F.avg("x").alias("cv"))
    a = cent.where(F.col("half") == 0).select("label", "pos", F.col("cv").alias("ca"))
    b = cent.where(F.col("half") == 1).select("label", "pos", F.col("cv").alias("cb"))
    return (
        a.join(b, ["label", "pos"])
        .groupBy("label")
        .agg(
            F.sqrt(F.sum((F.col("ca") - F.col("cb")) * (F.col("ca") - F.col("cb"))))
            .alias("shift")
        )
        .select("label", round2(F.col("shift") * 100).alias("shift_x100"))
        .orderBy("label")
    )


def _emb_drift_sql() -> str:
    from dask_distributed_vanilla_spark.functions.rounding import round2_sql

    return f"""
WITH e AS (SELECT vec_id % 2 AS half, label, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
ex AS (SELECT half, label, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM e),
cent AS (SELECT half, label, pos, AVG(x) AS cv FROM ex GROUP BY 1, 2, 3),
j AS (
  SELECT a.label, a.pos, a.cv AS ca, b.cv AS cb
  FROM cent a JOIN cent b
    ON a.label = b.label AND a.pos = b.pos AND a.half = 0 AND b.half = 1)
SELECT label, {round2_sql("sqrt(SUM((ca - cb) * (ca - cb))) * 100")} AS shift_x100
FROM j GROUP BY label ORDER BY label
"""


QUERIES = {
    "emb_drift": emb_drift,
    "emb_outliers": emb_outliers,
    "emb_pca": emb_pca,
    "ann_hybrid_rrf": ann_hybrid_rrf,
    "emb_quantize": emb_quantize,
    "ann_cosine_topk": ann_cosine_topk,
    "ann_lsh_topk": ann_lsh_topk,
    "embedding_near_dup": embedding_near_dup,
    "emb_centroids": emb_centroids,
    "semdedup": semdedup,
}

ORACLES = {
    "emb_drift": _emb_drift_sql(),
    "emb_outliers": _emb_outliers_sql(),
    "emb_pca": None,  # no SQL eigensolver: rows-only; numpy-pinned in pytest
    "ann_hybrid_rrf": _hybrid_rrf_sql(),
    "emb_quantize": EMB_QUANTIZE_SQL,
    "ann_cosine_topk": ANN_COSINE_SQL,
    "ann_lsh_topk": _lsh_sql(),
    "embedding_near_dup": EMB_NEAR_DUP_SQL,
    "emb_centroids": _emb_centroids_sql(),
    "semdedup": _semdedup_sql(),
}
