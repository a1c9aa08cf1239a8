"""Python user-defined table functions (SURVEY.md §2.10 UDF surface).

Spark 4's `@udtf` is the table-valued third leg of the Python UDF
surface next to scalar Pandas UDFs and the grouped-map family: one input
row fans out to N output rows from an arbitrary Python generator, usable
both from the DataFrame API and via LATERAL JOIN in SQL after
`spark.udtf.register`.

Scale note: a UDTF is a row-at-a-time Python hot path — every row
crosses the JVM/Python boundary individually (no Arrow batching as of
Spark 4.1 unless `useArrow` is enabled, and even then per-row generator
dispatch remains). The explode-based `operators/curation.py::doc_chunks`
is the 100 TB plan for this exact computation (pure JVM codegen); this
UDTF twin exists to complete the API surface and is pinned equal to the
explode plan in tests, so users porting dask `map_partitions`-style
fan-out code have the escape hatch WITH a documented fast path.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

from dask_distributed_vanilla_spark.operators.curation import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
)


@udtf(returnType="chunk_idx: bigint, n_tokens: bigint, chunk_text: string")
class ChunkTokens:
    """Overlapping token-window chunker: whitespace tokens, a window of
    `CHUNK_TOKENS` every `CHUNK_STRIDE` — row-for-row the semantics of
    doc_chunks (same window, same stride, same empty-text contract)."""

    def eval(self, text: str, tokens: int = CHUNK_TOKENS, stride: int = CHUNK_STRIDE):
        words = (text or "").split(" ")
        for idx, start in enumerate(range(0, max(len(words) - 1, 0) + 1, stride)):
            chunk = words[start : start + tokens]
            yield idx, len(chunk), " ".join(chunk)


def chunk_documents_udtf(spark, docs):
    """Apply the chunker UDTF per document row (lateral-join shape).

    `docs` must carry (doc_id, text). Returns (doc_id, chunk_idx,
    n_tokens, chunk_text) — the same schema as doc_chunks minus
    ordering.
    """
    spark.udtf.register("chunk_tokens", ChunkTokens)
    docs.createOrReplaceTempView("_chunk_in")
    return spark.sql(
        f"""
        SELECT i.doc_id, c.chunk_idx, c.n_tokens, c.chunk_text
        FROM _chunk_in i,
             LATERAL chunk_tokens(i.text, {CHUNK_TOKENS}, {CHUNK_STRIDE}) c
        """
    )
