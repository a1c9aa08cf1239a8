"""Curation-pipeline operators: chunking, PII redaction, cluster
representative selection.

The three steps that turn scored/deduped documents into training-ready
data: split long documents into overlapping token windows (context-window
packing), mask emails/phones (cheap PII hygiene gate), and pick one
canonical document per near-duplicate cluster by quality score (the
keep-one decision that consumes dedup_cc + text_quality). All three are
built-in column expressions / window functions — zero Python in the hot
path; chunking is an explode (row fan-out ~ tokens/stride), redaction a
single-pass scan, keep-best one shuffle on cluster_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dask_distributed_vanilla_spark.catalog import load_table
from dask_distributed_vanilla_spark.functions.rounding import round2_sql
from dask_distributed_vanilla_spark.operators.dedup import _minhash_cte_chain, dedup_cc
from dask_distributed_vanilla_spark.operators.text import (
    STOPWORDS,
    _sql_count_in,
    text_quality,
)

# token window / stride for chunking (25% overlap)
CHUNK_TOKENS = 64
CHUNK_STRIDE = 48

# portable regexes (same semantics under Java regex and RE2)
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"


def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunks per document: window of
    {CHUNK_TOKENS} whitespace tokens every {CHUNK_STRIDE} (the
    context-window packing step of an LLM data pipeline). One explode —
    fan-out is ceil(n_tokens / stride) rows per doc, each chunk
    re-materialized from the shared token array executor-side."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.split(F.col("text"), " ").alias("w"))
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("w") - 1, F.lit(0)), F.lit(CHUNK_STRIDE)
    )
    chunk = F.slice(F.col("w"), F.col("start") + 1, CHUNK_TOKENS)
    return (
        t.select("doc_id", "w", F.explode(starts).alias("start"))
        .select(
            "doc_id",
            F.expr(f"CAST(start DIV {CHUNK_STRIDE} AS BIGINT)").alias("chunk_idx"),
            F.size(chunk).cast("long").alias("n_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


DOC_CHUNKS_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
s AS (SELECT doc_id, w,
             unnest(generate_series(0, greatest(len(w) - 1, 0), {CHUNK_STRIDE})) AS start
      FROM t)
SELECT doc_id,
       start // {CHUNK_STRIDE} AS chunk_idx,
       len(w[start + 1 : start + {CHUNK_TOKENS}]) AS n_tokens,
       array_to_string(w[start + 1 : start + {CHUNK_TOKENS}], ' ') AS chunk_text
FROM s ORDER BY doc_id, chunk_idx
"""


def redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Email/phone masking with per-document match counts — the cheap
    PII hygiene gate. Single scan, two regexp passes, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    red = F.regexp_replace(
        F.regexp_replace(F.col("text"), EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    # Column-API regexp functions take the pattern verbatim — no SQL
    # string-literal escaping layer to corrupt the backslashes
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(EMAIL_RE), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(PHONE_RE), 0))
        .cast("long")
        .alias("n_phones"),
        F.md5(red).alias("redacted_digest"),
    ).orderBy("doc_id")


REDACT_PII_SQL = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(text, '{PHONE_RE}')) AS n_phones,
       md5(regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                          '{PHONE_RE}', '<PHONE>', 'g')) AS redacted_digest
FROM documents ORDER BY doc_id
"""


def cluster_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical document per near-duplicate cluster: highest quality
    score wins, doc_id breaks ties (deterministic — both engines rank on
    the identical half-up-rounded score). Composes dedup_cc (cluster
    labels) with text_quality; the selection itself is one shuffle on
    cluster_id + a window row_number — the keep-one-per-cluster decision
    of the curation pipeline."""
    labels = dedup_cc(spark, sf_dir)
    quality = text_quality(spark, sf_dir)
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality").desc(), F.col("doc_id")
    )
    return (
        labels.join(quality, "doc_id")
        .select(
            "cluster_id",
            "doc_id",
            "quality",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy("cluster_id")).alias("cluster_size"),
        )
        .where(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("keep_doc_id"),
            F.col("quality").alias("best_quality"),
            F.col("cluster_size").cast("long").alias("cluster_size"),
        )
        .orderBy("cluster_id")
    )


def _cluster_best_sql() -> str:
    quality_expr = round2_sql(
        "0.4 * least(1.0, len(qw) / 64.0)"
        " + 0.3 * (len(list_distinct(qw)) * 1.0 / len(qw))"
        f" + 0.3 * ({_sql_count_in(STOPWORDS).replace('(w,', '(qw,')} * 1.0 / len(qw))"
    )
    return f"""
WITH RECURSIVE {_minhash_cte_chain()},
edges AS (SELECT doc_a AS a, doc_b AS b FROM lsh_pairs
          UNION ALL
          SELECT doc_b, doc_a FROM lsh_pairs),
reach(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.a, r.label FROM edges e JOIN reach r ON r.node = e.b
),
labels AS (SELECT node AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY 1),
qt AS (SELECT doc_id, string_split(text, ' ') AS qw FROM documents),
qq AS (SELECT doc_id, {quality_expr} AS quality FROM qt),
ranked AS (
  SELECT l.cluster_id, l.doc_id, qq.quality,
         ROW_NUMBER() OVER (PARTITION BY l.cluster_id
                            ORDER BY qq.quality DESC, l.doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY l.cluster_id) AS cluster_size
  FROM labels l JOIN qq USING (doc_id))
SELECT cluster_id, doc_id AS keep_doc_id, quality AS best_quality, cluster_size
FROM ranked WHERE rn = 1 ORDER BY cluster_id
"""


QUERIES = {
    "doc_chunks": doc_chunks,
    "redact_pii": redact_pii,
    "cluster_best": cluster_best,
}

ORACLES = {
    "doc_chunks": DOC_CHUNKS_SQL,
    "redact_pii": REDACT_PII_SQL,
    "cluster_best": _cluster_best_sql(),
}
