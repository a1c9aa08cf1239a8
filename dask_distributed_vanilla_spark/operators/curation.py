"""Curation-pipeline operators: chunking, PII redaction, cluster
representative selection, repetition filtering, decontamination,
stratified sampling, and token-budget packing.

The steps that turn scored/deduped documents into training-ready data:
split long documents into overlapping token windows (context-window
packing), mask emails/phones (cheap PII hygiene gate), pick one
canonical document per near-duplicate cluster by quality score (the
keep-one decision that consumes dedup_cc + text_quality), score
repetition (the Gopher-style "repetitive junk" gate), flag benchmark
n-gram contamination, draw a deterministic per-language sample, and
pack documents into fixed token budgets. Everything is built-in column
expressions / window functions — zero Python in the hot path; chunking
is an explode (row fan-out ~ tokens/stride), redaction/repetition are
single-pass scans, keep-best one shuffle on cluster_id, decontamination
a broadcast join against the (small) benchmark shingle set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dask_distributed_vanilla_spark.catalog import load_table, spread
from dask_distributed_vanilla_spark.functions.rounding import round2, round2_sql
from dask_distributed_vanilla_spark.operators.dedup import (
    _minhash_cte_chain,
    dedup_cc,
    shingles_from_words,
)
from dask_distributed_vanilla_spark.operators.text import (
    STOPWORDS,
    _sql_count_in,
    text_quality,
)

# token window / stride for chunking (25% overlap)
CHUNK_TOKENS = 64
CHUNK_STRIDE = 48

# word-n-gram size for benchmark decontamination; the benchmark set is
# the held-out "eval" slice of the corpus (one source here)
DECON_NGRAM = 5
DECON_BENCH_SOURCE = "src0"

# per-language quota for the deterministic stratified sample
STRAT_K = 10

# context-window token budget for packing
PACK_BUDGET = 2048

# portable regexes (same semantics under Java regex and RE2)
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"


def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunks per document: window of
    {CHUNK_TOKENS} whitespace tokens every {CHUNK_STRIDE} (the
    context-window packing step of an LLM data pipeline). One explode —
    fan-out is ceil(n_tokens / stride) rows per doc, each chunk
    re-materialized from the shared token array executor-side."""
    # spread the doc rows so the per-doc text work runs on all cores
    # instead of the single-row-group fixture scan's one task (catalog.spread)
    docs = spread(load_table(spark, sf_dir, "documents"))
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


def _cluster_best_chain() -> str:
    """The WITH-chain (recursive) ending in `ranked` — shared by the
    cluster_best oracle and the end-to-end curation_report oracle."""
    quality_expr = round2_sql(
        "0.4 * least(1.0, len(qw) / 64.0)"
        " + 0.3 * (len(list_distinct(qw)) * 1.0 / len(qw))"
        f" + 0.3 * ({_sql_count_in(STOPWORDS).replace('(w,', '(qw,')} * 1.0 / len(qw))"
    )
    return f"""{_minhash_cte_chain()},
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
  FROM labels l JOIN qq USING (doc_id))"""


def _cluster_best_sql() -> str:
    return f"""
WITH RECURSIVE {_cluster_best_chain()}
SELECT cluster_id, doc_id AS keep_doc_id, quality AS best_quality, cluster_size
FROM ranked WHERE rn = 1 ORDER BY cluster_id
"""


def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: the fraction of
    tokens taken by the most frequent token, and the duplicate-bigram
    fraction. Both are higher-order array functions over the one
    materialized words array — a pure scan with NO shuffle (the per-doc
    mode is a max-run over the sorted token array, not an
    explode+groupBy), which is what makes this a free pre-filter at
    100 TB."""
    # spread: the sort+fold per doc is the whole cost of this scan-only
    # query — one task on the single-row-group fixture without it
    docs = spread(load_table(spark, sf_dir, "documents"))
    t = docs.select("doc_id", F.split(F.col("text"), " ").alias("w"))
    n_tokens = F.size("w")
    # mode count == longest run of equal tokens in the sorted array
    top_cnt = F.aggregate(
        F.array_sort("w"),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    bg = shingles_from_words(F.col("w"), 2)
    dup_bigram = F.when(
        F.size(bg) >= 1, round2(F.lit(1.0) - F.size(F.array_distinct(bg)) / F.size(bg))
    ).otherwise(F.lit(0.0))
    return t.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        round2(top_cnt / n_tokens).alias("top_token_frac"),
        dup_bigram.alias("dup_bigram_frac"),
    ).orderBy("doc_id")


DOC_REPETITION_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
tok AS (SELECT doc_id, unnest(w) AS tk FROM t),
mode AS (SELECT doc_id, MAX(c) AS mx
         FROM (SELECT doc_id, tk, COUNT(*) AS c FROM tok GROUP BY 1, 2)
         GROUP BY 1),
bg AS (SELECT doc_id,
              len(w) - 1 AS nbg,
              len(list_distinct([w[i] || ' ' || w[i+1]
                                 for i in generate_series(1, len(w) - 1)])) AS ndist
       FROM t WHERE len(w) >= 2)
SELECT t.doc_id,
       len(t.w) AS n_tokens,
       {round2_sql("mode.mx * 1.0 / len(t.w)")} AS top_token_frac,
       CASE WHEN bg.nbg IS NULL THEN 0.0
            ELSE {round2_sql("1.0 - bg.ndist * 1.0 / bg.nbg")} END AS dup_bigram_frac
FROM t JOIN mode USING (doc_id) LEFT JOIN bg USING (doc_id)
ORDER BY t.doc_id
"""


def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any word
    {DECON_NGRAM}-gram with the held-out benchmark slice (source =
    {DECON_BENCH_SOURCE}) — the overlap check every training set runs
    against its eval suites. The benchmark shingle set is small by
    construction, so it broadcasts; the corpus side is one scan +
    explode, and the hit count per document is a map-side-combinable
    aggregate. Returns contaminated docs with their distinct-hit
    counts."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", "source", F.split(F.col("text"), " ").alias("w"))
    sh = t.select(
        "doc_id",
        "source",
        F.explode(F.array_distinct(shingles_from_words(F.col("w"), DECON_NGRAM))).alias(
            "sh"
        ),
    )
    bench = (
        sh.where(F.col("source") == DECON_BENCH_SOURCE).select("sh").distinct()
    )
    return (
        sh.where(F.col("source") != DECON_BENCH_SOURCE)
        .join(F.broadcast(bench), "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .orderBy("doc_id")
    )


DECONTAMINATE_SQL = f"""
WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
sh AS (SELECT DISTINCT doc_id, source,
              array_to_string(w[i : i + {DECON_NGRAM - 1}], ' ') AS sh
       FROM t, unnest(generate_series(1, len(w) - {DECON_NGRAM - 1})) AS u(i)
       WHERE len(w) >= {DECON_NGRAM}),
bench AS (SELECT DISTINCT sh FROM sh WHERE source = '{DECON_BENCH_SOURCE}')
SELECT s.doc_id, COUNT(*) AS n_hits
FROM sh s JOIN bench USING (sh)
WHERE s.source <> '{DECON_BENCH_SOURCE}'
GROUP BY 1 ORDER BY 1
"""


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: {STRAT_K} documents per language,
    ranked by md5(doc_id) — a content-independent pseudo-random order
    that every engine reproduces bit-identically (the language-balancing
    draw of a multilingual training mix). One shuffle on lang; at scale
    the rank is a top-k per group, not a global sort."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("lang", "doc_id", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= STRAT_K)
        .select("lang", "doc_id", F.col("rn").cast("long").alias("rn"))
        .orderBy("lang", "rn")
    )


SAMPLE_STRATIFIED_SQL = f"""
SELECT lang, doc_id, rn FROM (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents)
WHERE rn <= {STRAT_K} ORDER BY lang, rn
"""


def doc_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget packing: assign documents (per language, in doc_id
    order) to consecutive {PACK_BUDGET}-token context windows by running
    token count — each doc lands in the pack where its first token
    falls. The running sum shares one (lang)-partitioned window with the
    final per-pack rollup, so the whole operator is a single shuffle.
    Returns per-pack document and token counts."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "lang", "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tok")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tok").over(w)
    return (
        t.withColumn(
            "pack_id", ((cum - F.col("n_tok")) / F.lit(PACK_BUDGET)).cast("long")
        )
        .groupBy("lang", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
        .orderBy("lang", "pack_id")
    )


DOC_PACK_SQL = f"""
WITH t AS (SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tok FROM documents),
c AS (SELECT lang, doc_id, n_tok,
             SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM t)
SELECT lang, CAST((cum - n_tok) // {PACK_BUDGET} AS BIGINT) AS pack_id,
       COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
FROM c GROUP BY 1, 2 ORDER BY 1, 2
"""


# quality gate for the end-to-end report (corpus median is ~0.5)
MIN_QUALITY = 0.45


def curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation as ONE judged composition: near-dup keep-one
    (LSH → connected components → best-quality representative), minus
    benchmark-contaminated documents, gated at quality ≥ {MIN_QUALITY},
    rolled up per language with document/token counts — the final
    training-mix report of the pipeline. Everything stays one lazy plan:
    Catalyst fuses the quality scan, the anti-join probes the broadcast
    contaminated set, and only the CC iteration materializes
    intermediates (localCheckpoint)."""
    best = cluster_best(spark, sf_dir).select(
        F.col("keep_doc_id").alias("doc_id"), "best_quality"
    )
    contaminated = decontaminate(spark, sf_dir).select("doc_id")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(F.split(F.col("text"), " ")).alias("n_tok")
    )
    return (
        best.join(contaminated, "doc_id", "left_anti")
        .where(F.col("best_quality") >= MIN_QUALITY)
        .join(docs, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            round2(F.avg("best_quality")).alias("avg_quality"),
        )
        .orderBy("lang")
    )


def _curation_report_sql() -> str:
    return f"""
WITH RECURSIVE {_cluster_best_chain()},
best AS (SELECT doc_id, quality FROM ranked WHERE rn = 1),
tw AS (SELECT doc_id, source, lang, string_split(text, ' ') AS w FROM documents),
dsh AS (SELECT DISTINCT doc_id, source,
               array_to_string(w[i : i + {DECON_NGRAM - 1}], ' ') AS sh
        FROM tw, unnest(generate_series(1, len(w) - {DECON_NGRAM - 1})) AS u(i)
        WHERE len(w) >= {DECON_NGRAM}),
bench AS (SELECT DISTINCT sh FROM dsh WHERE source = '{DECON_BENCH_SOURCE}'),
cont AS (SELECT DISTINCT s.doc_id FROM dsh s JOIN bench USING (sh)
         WHERE s.source <> '{DECON_BENCH_SOURCE}')
SELECT t.lang, COUNT(*) AS n_docs, CAST(SUM(len(t.w)) AS BIGINT) AS n_tokens,
       {round2_sql("AVG(b.quality)")} AS avg_quality
FROM best b JOIN tw t USING (doc_id)
WHERE b.quality >= {MIN_QUALITY}
  AND b.doc_id NOT IN (SELECT doc_id FROM cont)
GROUP BY 1 ORDER BY 1
"""


def chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document dedup: duplicate groups over the token-window chunks
    (the paragraph-granularity pass that catches boilerplate shared by
    otherwise-distinct documents). Composes doc_chunks → md5 digest →
    group, keeping the lexicographically first (doc_id, chunk_idx); only
    32-byte digests shuffle, never chunk text. Returns groups with >1
    copy."""
    chunks = doc_chunks(spark, sf_dir)
    return (
        chunks.groupBy(F.md5(F.col("chunk_text")).alias("chunk_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(F.struct("doc_id", "chunk_idx")).alias("keep"),
        )
        .where(F.col("n_copies") > 1)
        .select(
            "chunk_hash",
            "n_copies",
            F.col("keep.doc_id").alias("keep_doc_id"),
            F.col("keep.chunk_idx").alias("keep_chunk_idx"),
        )
        .orderBy("chunk_hash")
    )


CHUNK_DEDUP_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
s AS (SELECT doc_id, w,
             unnest(generate_series(0, greatest(len(w) - 1, 0), {CHUNK_STRIDE})) AS start
      FROM t),
chunks AS (
  SELECT doc_id,
         start // {CHUNK_STRIDE} AS chunk_idx,
         array_to_string(w[start + 1 : start + {CHUNK_TOKENS}], ' ') AS chunk_text
  FROM s)
SELECT md5(chunk_text) AS chunk_hash,
       COUNT(*) AS n_copies,
       (MIN(struct_pack(doc_id := doc_id, chunk_idx := chunk_idx))).doc_id AS keep_doc_id,
       (MIN(struct_pack(doc_id := doc_id, chunk_idx := chunk_idx))).chunk_idx AS keep_chunk_idx
FROM chunks GROUP BY 1 HAVING COUNT(*) > 1 ORDER BY 1
"""


WEIGHTED_K = 40  # sample size for the weighted draw


def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis):
    each doc gets priority u^(1/w) — here equivalently ordered by
    ln(u)/w — with weight w = n_chars and u a deterministic uniform;
    the global top-{K} by priority IS an exact weighted sample.

    This is the one-pass distributed algorithm for weighted draws: no
    rejection loop, no sequential scan — priorities are a pure column
    expression and the draw is a TakeOrderedAndProject, so it costs the
    same as any top-k at 100 TB. The uniform comes from a Knuth
    multiplicative hash of doc_id (engine-portable integer arithmetic,
    no RNG state), so the sample is reproducible across runs and
    engines.
    """
    docs = load_table(spark, sf_dir, "documents")
    u = ((F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296) + 1) / F.lit(
        4294967296.0
    )
    # NULLIF guard: a zero-length doc has zero weight (undefined
    # priority) — it sorts NULLS LAST on both engines instead of the
    # ANSI division failing the job
    priority = F.log(u) / F.nullif(F.col("n_chars"), F.lit(0))  # max u^(1/w) == max ln(u)/w
    return (
        docs.select("doc_id", "lang", "n_chars", (F.floor((priority) * 10000000000 + F.lit(0.5)) / 10000000000).alias("pri"))
        .orderBy(F.desc("pri"), "doc_id")
        .limit(WEIGHTED_K)
    )


SAMPLE_WEIGHTED_SQL = f"""
SELECT doc_id, lang, n_chars,
       FLOOR((ln(((doc_id * 2654435761) % 4294967296 + 1) / 4294967296.0)
             / NULLIF(n_chars, 0)) * 10000000000 + 0.5) / 10000000000 AS pri
FROM documents
ORDER BY pri DESC NULLS LAST, doc_id
LIMIT {WEIGHTED_K}
"""


# Per-language character budgets for the training-mix draw (the usual
# practice: upsample high-resource languages by an explicit target mix,
# not by corpus frequency).
MIX_BUDGET = {"en": 25_000, "de": 10_000, "fr": 7_500, "es": 5_000, "zh": 2_500}


def sample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget data mixing: draw documents per language, in the
    deterministic md5(doc_id) order, until each language's character
    budget (MIX_BUDGET) is filled — the mixture-weighting step of a
    training-data pipeline, where the mix is set by token budget rather
    than document count.

    One (lang) shuffle: the running character sum and the budget cutoff
    ride a single partitioned window. At 100 TB the md5 rank makes the
    draw reproducible across runs and engines (no RNG state), and the
    budget filter is a per-partition streaming pass — no global sort,
    no driver coordination.
    """
    docs = load_table(spark, sf_dir, "documents")
    budget = F.coalesce(
        *[
            F.when(F.col("lang") == k, F.lit(v))
            for k, v in sorted(MIX_BUDGET.items())
        ],
        F.lit(0),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.select("lang", "doc_id", "n_chars")
        .withColumn("cum_chars", F.sum("n_chars").over(w))
        .where(F.col("cum_chars") <= budget)
        .orderBy("lang", "cum_chars")
    )


def _mixture_case_sql() -> str:
    arms = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in sorted(MIX_BUDGET.items())
    )
    return f"CASE lang {arms} ELSE 0 END"


SAMPLE_MIXTURE_SQL = f"""
SELECT lang, doc_id, n_chars, cum_chars FROM (
  SELECT lang, doc_id, n_chars,
         CAST(SUM(n_chars) OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_chars
  FROM documents)
WHERE cum_chars <= {_mixture_case_sql()}
ORDER BY lang, cum_chars
"""


def source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: for every ordered source pair,
    how many distinct 5-gram shingles they share and what fraction of
    the left source's shingles that is — the governance readout behind
    "how much of feed A is already in feed B" (dataset licensing,
    double-counting in the mix, and train/eval bleed all start here).

    Scale shape: shingles reduce to DISTINCT (source, md5) pairs before
    anything joins — text never crosses an exchange — and the pair join
    is on the 32-byte digest with both sides df-capped by construction
    (a shingle appears once per source). Work is Σ_shingle
    (#sources holding it)², bounded by the source count, not the
    corpus; per-source shingle totals broadcast back for the ratio.
    """
    from dask_distributed_vanilla_spark.operators.dedup import shingles_from_words

    # spread the doc rows before the 5-gram explode: the single-file
    # scan would otherwise shingle+md5 the corpus in one task (catalog.spread)
    docs = spread(load_table(spark, sf_dir, "documents"))
    words = docs.select("source", F.split(F.col("text"), " ").alias("words"))
    sh = words.select(
        "source",
        F.explode(F.array_distinct(shingles_from_words(F.col("words"), 5))).alias("sh"),
    ).select("source", F.md5("sh").alias("h")).distinct()
    totals = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.source") != F.col("b.source")))
        .groupBy(F.col("a.source").alias("src"), F.col("b.source").alias("other"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        shared.join(F.broadcast(totals.withColumnRenamed("source", "src")), "src")
        .select(
            "src",
            "other",
            "n_shared",
            (F.floor(F.col("n_shared") * 100.0 / F.col("n_shingles") + F.lit(0.5)) / 100)
            .alias("share_of_src"),
        )
        .orderBy("src", "other")
    )


SOURCE_OVERLAP_SQL = """
WITH t AS (SELECT source, string_split(text, ' ') AS w FROM documents),
sh0 AS (
  SELECT source, md5(w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]) AS h
  FROM t, UNNEST(generate_series(1, len(w) - 4)) AS u(i)
  WHERE len(w) >= 5),
sh AS (SELECT DISTINCT source, h FROM sh0),
totals AS (SELECT source, COUNT(*) AS n_shingles FROM sh GROUP BY 1),
shared AS (
  SELECT a.source AS src, b.source AS other, COUNT(*) AS n_shared
  FROM sh a JOIN sh b ON a.h = b.h AND a.source <> b.source
  GROUP BY 1, 2)
SELECT s.src, s.other, s.n_shared,
       FLOOR(s.n_shared * 100.0 / t.n_shingles + 0.5) / 100 AS share_of_src
FROM shared s JOIN totals t ON t.source = s.src
ORDER BY s.src, s.other
"""


def quality_token_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token budget by quality decile: rank documents into NTILE(10)
    quality deciles and report each decile's document count, token
    total, and share of the corpus' tokens — the readout that prices a
    quality gate ("cutting below decile 3 costs 12% of tokens") before
    anyone commits to a threshold.

    One scan scores quality and token counts, one decile window over
    the doc-level table (never the token stream), one 10-row rollup
    with the corpus total broadcast back as a 1-row cross join.
    """
    docs = _with_quality_tokens(spark, sf_dir)
    w = Window.orderBy(F.col("quality").desc(), F.col("doc_id"))
    by_dec = (
        docs.withColumn("decile", F.ntile(10).over(w).cast("long"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
    )
    # the corpus total is decile-independent: derive it from the doc
    # table directly so the NTILE subtree is not evaluated twice
    total = docs.agg(F.sum("n_tokens").cast("double").alias("tot"))
    return (
        by_dec.crossJoin(F.broadcast(total))
        .select(
            "decile",
            "n_docs",
            "n_tokens",
            round2(F.col("n_tokens") / F.col("tot")).alias("token_share"),
        )
        .orderBy("decile")
    )


def _with_quality_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dask_distributed_vanilla_spark.operators.text import (
        STOPWORDS as _SW,
        _count_in,
    )

    # spread the doc rows so the per-doc text work runs on all cores
    # instead of the single-row-group fixture scan's one task (catalog.spread)
    docs = spread(load_table(spark, sf_dir, "documents"))
    t = docs.select("doc_id", F.split(F.col("text"), " ").alias("w"))
    words = F.col("w")
    n_tokens = F.size(words)
    uniq_ratio = F.size(F.array_distinct(words)) / n_tokens
    stop_ratio = _count_in(words, _SW) / n_tokens
    score = (
        0.4 * F.least(F.lit(1.0), n_tokens / F.lit(64.0))
        + 0.3 * uniq_ratio
        + 0.3 * stop_ratio
    )
    return t.select(
        "doc_id", round2(score).alias("quality"), n_tokens.cast("long").alias("n_tokens")
    )


def _quality_token_mix_sql() -> str:
    quality_expr = round2_sql(
        "0.4 * least(1.0, len(w) / 64.0)"
        " + 0.3 * (len(list_distinct(w)) * 1.0 / len(w))"
        f" + 0.3 * ({_sql_count_in(STOPWORDS)} * 1.0 / len(w))"
    )
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
q AS (SELECT doc_id, {quality_expr} AS quality, len(w) AS n_tokens FROM t),
d AS (SELECT doc_id, n_tokens,
             NTILE(10) OVER (ORDER BY quality DESC, doc_id) AS decile
      FROM q),
g AS (SELECT decile, COUNT(*) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
      FROM d GROUP BY 1)
SELECT decile, n_docs, n_tokens,
       {round2_sql("n_tokens * 1.0 / (SELECT SUM(n_tokens) FROM g)")} AS token_share
FROM g ORDER BY decile
"""


TEMPLATE_SHARE = 0.5  # a shingle in ≥ half a source's docs is boilerplate


def source_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source boilerplate detection: 5-gram shingles present in at
    least {share:.0%} of a source's documents are template text
    (headers, footers, nav chrome) — the pass that runs before
    near-dedup so boilerplate doesn't glue unrelated documents into
    one giant LSH cluster. Reports each source's template-shingle
    count and the worst offender's coverage.

    Shingles reduce to DISTINCT (source, doc, digest) then aggregate
    twice ((source, shingle) df, then per-source rollup) — text never
    crosses an exchange, and the within-source df threshold is the
    same guard DF_CAP provides globally, applied per feed.
    """
    from dask_distributed_vanilla_spark.operators.dedup import shingles_from_words

    docs = spread(load_table(spark, sf_dir, "documents"))
    words = docs.select(
        "source", "doc_id", F.split(F.col("text"), " ").alias("words")
    )
    sh = words.select(
        "source",
        "doc_id",
        F.explode(F.array_distinct(shingles_from_words(F.col("words"), 5))).alias("sh"),
    ).select("source", "doc_id", F.md5("sh").alias("h"))
    src_docs = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    df_tbl = (
        sh.groupBy("source", "h")
        .agg(F.count(F.lit(1)).alias("df"))
        .join(F.broadcast(src_docs), "source")
        .withColumn("share", F.col("df") / F.col("n_docs"))
    )
    return (
        df_tbl.groupBy("source")
        .agg(
            F.min("n_docs").alias("n_docs"),
            F.sum((F.col("share") >= TEMPLATE_SHARE).cast("long")).alias(
                "n_template_shingles"
            ),
            (F.floor(F.max("share") * 100 + F.lit(0.5)) / 100).alias("max_share"),
        )
        .orderBy("source")
    )


SOURCE_TEMPLATES_SQL = f"""
WITH sh AS (
  SELECT DISTINCT source, doc_id,
         md5(w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]) AS h
  FROM (SELECT source, doc_id, string_split(text, ' ') AS w FROM documents),
       UNNEST(generate_series(1, len(w) - 4)) AS u(i)
  WHERE len(w) >= 5),
src AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1),
df AS (
  SELECT s.source, s.h, COUNT(*) * 1.0 / MIN(src.n_docs) AS share,
         MIN(src.n_docs) AS n_docs
  FROM sh s JOIN src USING (source) GROUP BY s.source, s.h)
SELECT source, CAST(MIN(n_docs) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN share >= {TEMPLATE_SHARE} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_template_shingles,
       FLOOR(MAX(share) * 100 + 0.5) / 100 AS max_share
FROM df GROUP BY source ORDER BY source
"""


QUERIES = {
    "source_templates": source_templates,
    "quality_token_mix": quality_token_mix,
    "source_overlap": source_overlap,
    "sample_weighted": sample_weighted,
    "sample_mixture": sample_mixture,
    "doc_chunks": doc_chunks,
    "redact_pii": redact_pii,
    "cluster_best": cluster_best,
    "doc_repetition": doc_repetition,
    "decontaminate": decontaminate,
    "sample_stratified": sample_stratified,
    "doc_pack": doc_pack,
    "curation_report": curation_report,
    "chunk_dedup": chunk_dedup,
}

ORACLES = {
    "source_templates": SOURCE_TEMPLATES_SQL,
    "quality_token_mix": _quality_token_mix_sql(),
    "source_overlap": SOURCE_OVERLAP_SQL,
    "sample_weighted": SAMPLE_WEIGHTED_SQL,
    "sample_mixture": SAMPLE_MIXTURE_SQL,
    "doc_chunks": DOC_CHUNKS_SQL,
    "redact_pii": REDACT_PII_SQL,
    "cluster_best": _cluster_best_sql(),
    "doc_repetition": DOC_REPETITION_SQL,
    "decontaminate": DECONTAMINATE_SQL,
    "sample_stratified": SAMPLE_STRATIFIED_SQL,
    "doc_pack": DOC_PACK_SQL,
    "curation_report": _curation_report_sql(),
    "chunk_dedup": CHUNK_DEDUP_SQL,
}
