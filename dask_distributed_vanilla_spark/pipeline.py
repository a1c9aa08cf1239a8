"""Composed training-data pipeline — the operators working together.

The end-to-end shape a 100 TB corpus run takes: score → filter →
exact-dedup → near-dedup → fingerprint → partitioned write. Each stage
is one of the judged operators; composition stays one lazy plan until
the sink (single pass over the corpus for the scoring stages, dedup
joins keyed on digests).

    from dask_distributed_vanilla_spark.pipeline import curate
    curate(spark, sf_dir, out_path, min_quality=0.5)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dask_distributed_vanilla_spark.catalog import load_table
from dask_distributed_vanilla_spark.operators.dedup import dedup_exact, dedup_minhash_lsh
from dask_distributed_vanilla_spark.operators.text import text_fingerprint, text_langid, text_quality


def curate(
    spark: SparkSession,
    sf_dir: str,
    out_path: str | None = None,
    min_quality: float = 0.4,
    langs: tuple[str, ...] = ("en",),
) -> DataFrame:
    """Quality-gate, language-filter, dedup, and fingerprint the corpus.

    Returns the curated DataFrame; writes a language-partitioned parquet
    lake when ``out_path`` is given.
    """
    docs = load_table(spark, sf_dir, "documents")

    quality = text_quality(spark, sf_dir)
    lang = text_langid(spark, sf_dir).select("doc_id", "pred_lang")
    fingerprints = text_fingerprint(spark, sf_dir)

    # exact dedup survivors (keep-first policy)
    survivors = dedup_exact(spark, sf_dir).select(F.col("keep_id").alias("doc_id"))

    # near-dup losers: drop the higher doc_id of each verified pair
    near_losers = dedup_minhash_lsh(spark, sf_dir).select(
        F.col("doc_b").alias("doc_id")
    ).distinct()

    curated = (
        docs.join(survivors, "doc_id", "left_semi")
        .join(near_losers, "doc_id", "left_anti")
        .join(quality, "doc_id")
        .join(lang, "doc_id")
        .join(fingerprints, "doc_id")
        .where((F.col("quality") >= min_quality) & F.col("pred_lang").isin(*langs))
        .select("doc_id", "text", "source", "n_chars", "quality", "pred_lang", "fingerprint")
    )
    if out_path is not None:
        curated.write.mode("overwrite").partitionBy("pred_lang").parquet(out_path)
    return curated
