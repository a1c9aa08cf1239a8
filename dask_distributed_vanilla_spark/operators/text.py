"""Text-analysis operators over the `documents` table.

Language ID (stopword-marker heuristic), quality scoring, token
statistics, and document fingerprinting — the per-document scoring
passes of a training-data pipeline. Every expression is a built-in
column function (split / filter / aggregate higher-order functions), so
the scoring runs inside whole-stage codegen with zero Python in the hot
path; at 100 TB these are embarrassingly parallel single-pass scans.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dask_distributed_vanilla_spark.catalog import load_table
from dask_distributed_vanilla_spark.functions.rounding import round2, round2_sql
from dask_distributed_vanilla_spark.operators.dedup import shingles_from_words

STOPWORDS = ("the", "a", "of", "and", "is", "to", "in")

# marker tokens per language for the n-gram/stopword language heuristic
LANG_MARKERS = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "y", "es"),
    "fr": ("le", "la", "de", "et", "est"),
    "de": ("der", "die", "das", "und", "ist"),
}


def _words():
    return F.split(F.col("text"), " ")


def _with_words(docs, extra=()):
    """Materialize the words array once — Catalyst re-evaluates split()
    per reference otherwise (see dedup.word_shingles note). NOT spread:
    r13 measured the light token expressions (size/filter counts) faster
    on the raw scan than behind a repartition exchange — only the
    md5-shingling consumers (text_fingerprint) spread explicitly."""
    return docs.select("doc_id", *extra, _words().alias("w"))


def _count_in(words, vocab: tuple[str, ...]):
    return F.size(F.filter(words, lambda w: w.isin(*vocab)))


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counts + lexical ratios per document (whitespace tokenizer)."""
    t = _with_words(load_table(spark, sf_dir, "documents"))
    words = F.col("w")
    n_tokens = F.size(words)
    n_uniq = F.size(F.array_distinct(words))
    sum_len = F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w))
    n_stop = _count_in(words, STOPWORDS)
    return t.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        n_uniq.cast("long").alias("n_uniq_tokens"),
        round2(sum_len / n_tokens).alias("avg_token_len"),
        round2(n_stop / n_tokens).alias("stopword_ratio"),
    ).orderBy("doc_id")


def _sql_count_in(vocab: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in vocab)
    return f"len(list_filter(w, x -> x IN ({lst})))"


TEXT_STATS_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
SELECT doc_id,
       len(w) AS n_tokens,
       len(list_distinct(w)) AS n_uniq_tokens,
       {round2_sql("list_sum(list_transform(w, x -> len(x))) * 1.0 / len(w)")} AS avg_token_len,
       {round2_sql(_sql_count_in(STOPWORDS) + " * 1.0 / len(w)")} AS stopword_ratio
FROM t ORDER BY doc_id
"""


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score in [0,1]: length saturation + lexical
    diversity + stopword density (the classic cheap quality gate)."""
    t = _with_words(load_table(spark, sf_dir, "documents"))
    words = F.col("w")
    n_tokens = F.size(words)
    uniq_ratio = F.size(F.array_distinct(words)) / n_tokens
    stop_ratio = _count_in(words, STOPWORDS) / n_tokens
    length_score = F.least(F.lit(1.0), n_tokens / F.lit(64.0))
    score = 0.4 * length_score + 0.3 * uniq_ratio + 0.3 * stop_ratio
    return t.select("doc_id", round2(score).alias("quality")).orderBy("doc_id")


TEXT_QUALITY_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
SELECT doc_id,
       {round2_sql(
           "0.4 * least(1.0, len(w) / 64.0)"
           " + 0.3 * (len(list_distinct(w)) * 1.0 / len(w))"
           f" + 0.3 * ({_sql_count_in(STOPWORDS)} * 1.0 / len(w))"
       )} AS quality
FROM t ORDER BY doc_id
"""


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language ID with a deterministic argmax tiebreak
    (en > es > fr > de on equal scores)."""
    t = _with_words(load_table(spark, sf_dir, "documents"))
    words = F.col("w")
    scores = {lang: _count_in(words, vocab) for lang, vocab in LANG_MARKERS.items()}
    pred = (
        F.when(
            (scores["en"] >= scores["es"])
            & (scores["en"] >= scores["fr"])
            & (scores["en"] >= scores["de"]),
            "en",
        )
        .when((scores["es"] >= scores["fr"]) & (scores["es"] >= scores["de"]), "es")
        .when(scores["fr"] >= scores["de"], "fr")
        .otherwise("de")
    )
    return t.select(
        "doc_id",
        *[scores[lang].cast("long").alias(f"score_{lang}") for lang in LANG_MARKERS],
        pred.alias("pred_lang"),
    ).orderBy("doc_id")


def _langid_sql() -> str:
    score_cols = ", ".join(
        f"{_sql_count_in(vocab)} AS score_{lang}" for lang, vocab in LANG_MARKERS.items()
    )
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
s AS (SELECT doc_id, {score_cols} FROM t)
SELECT doc_id, CAST(score_en AS BIGINT) AS score_en, CAST(score_es AS BIGINT) AS score_es,
       CAST(score_fr AS BIGINT) AS score_fr, CAST(score_de AS BIGINT) AS score_de,
       CASE WHEN score_en >= score_es AND score_en >= score_fr AND score_en >= score_de THEN 'en'
            WHEN score_es >= score_fr AND score_es >= score_de THEN 'es'
            WHEN score_fr >= score_de THEN 'fr'
            ELSE 'de' END AS pred_lang
FROM s ORDER BY doc_id
"""


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style document fingerprint: minimum digest over word
    5-gram shingles (rolling-window min-hash), md5(text) fallback for
    short docs. Fixed-width and engine-portable — two corpora can be
    fingerprint-joined without exchanging text."""
    from dask_distributed_vanilla_spark.catalog import spread

    # spread: the per-doc 5-gram md5 min-hash is the whole cost here and
    # would run in the single-row-group scan's one task (catalog.spread)
    t = _with_words(spread(load_table(spark, sf_dir, "documents")), extra=("text",))
    sh = shingles_from_words(F.col("w"), 5)
    min_sh = F.array_min(F.transform(sh, lambda s: F.md5(s)))
    return t.select(
        "doc_id", F.coalesce(min_sh, F.md5(F.col("text"))).alias("fingerprint")
    ).orderBy("doc_id")


TEXT_FINGERPRINT_SQL = """
WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT doc_id,
         MIN(md5(w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4])) AS min_sh
  FROM t, UNNEST(generate_series(1, len(w) - 4)) AS u(i)
  WHERE len(w) >= 5 GROUP BY doc_id)
SELECT t.doc_id, COALESCE(sh.min_sh, md5(t.text)) AS fingerprint
FROM t LEFT JOIN sh ON t.doc_id = sh.doc_id
ORDER BY t.doc_id
"""


def text_token_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex token counting (the BPE-ish pre-tokenizer pass): word-piece
    candidates `[a-z0-9]+`, numeric tokens, and a deterministic
    byte-per-token estimate. regexp_extract_all runs JVM-side; the
    pattern is shared verbatim with the oracle (both RE2-compatible)."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.expr(r"regexp_extract_all(text, '[a-z0-9]+', 0)")
    nums = F.expr(r"regexp_extract_all(text, '[0-9]+', 0)")
    n_words = F.size(words)
    return docs.select(
        "doc_id",
        n_words.cast("long").alias("n_word_tokens"),
        F.size(nums).cast("long").alias("n_numeric_tokens"),
        round2(F.length("text") / F.greatest(n_words, F.lit(1))).alias("bytes_per_token"),
    ).orderBy("doc_id")


TEXT_TOKEN_REGEX_SQL = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '[a-z0-9]+')) AS n_word_tokens,
       len(regexp_extract_all(text, '[0-9]+')) AS n_numeric_tokens,
       {round2_sql("length(text) * 1.0 / greatest(len(regexp_extract_all(text, '[a-z0-9]+')), 1)")} AS bytes_per_token
FROM documents ORDER BY doc_id
"""


def text_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-50 bigram counts — the vocabulary/n-gram
    statistics pass of tokenizer training. One explode + one groupBy:
    the shuffle carries (bigram, partial count) after map-side combine,
    so corpus size only affects the scan, not the shuffle."""
    t = _with_words(load_table(spark, sf_dir, "documents"))
    big = t.select(F.explode(shingles_from_words(F.col("w"), 2)).alias("bigram"))
    return (
        big.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "bigram")
        .limit(50)
    )


TEXT_BIGRAMS_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
big AS (
  SELECT w[i] || ' ' || w[i+1] AS bigram
  FROM t, UNNEST(generate_series(1, len(w) - 1)) AS u(i)
  WHERE len(w) >= 2)
SELECT bigram, COUNT(*) AS n_occurrences
FROM big GROUP BY 1
ORDER BY n_occurrences DESC, bigram LIMIT 50
"""


def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (whitespace tokens, natural-log
    IDF) — the distinctive-term extraction pass of corpus curation.

    All-aggregate shape: tf is a (doc, term) groupBy, df a term groupBy
    over distinct (doc, term), the doc count broadcasts as a 1-row cross
    join, and the per-doc top-3 is a window rank on the rounded score —
    rounding BEFORE ranking keeps the order cross-engine deterministic
    (raw ln() differs in the last ulp between engines; see BENCH notes).
    """
    from pyspark.sql import Window

    t = _with_words(load_table(spark, sf_dir, "documents"))
    tok = t.select("doc_id", F.explode("w").alias("term"))
    ntok = t.select("doc_id", F.size("w").alias("n_tok"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("n"))
    df = tok.distinct().groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = t.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(ntok, "doc_id")
        .join(df, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            round2(
                F.col("n") / F.col("n_tok") * F.log(F.col("n_docs") / F.col("df"))
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 3)
        .select("doc_id", "rank", "term", "tfidf")
        .orderBy("doc_id", "rank")
    )


TEXT_TFIDF_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
tok AS (SELECT doc_id, UNNEST(w) AS term FROM t),
ntok AS (SELECT doc_id, len(w) AS n_tok FROM t),
tf AS (SELECT doc_id, term, COUNT(*) AS n FROM tok GROUP BY 1, 2),
df AS (SELECT term, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, term FROM tok) GROUP BY 1),
nd AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         {round2_sql("tf.n * 1.0 / ntok.n_tok * ln(nd.n_docs * 1.0 / df.df)")} AS tfidf
  FROM tf JOIN ntok USING (doc_id) JOIN df USING (term) CROSS JOIN nd),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term) AS rank
  FROM scored)
SELECT doc_id, CAST(rank AS INT) AS rank, term, tfidf
FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank
"""


# BM25 parameters (standard Robertson defaults) and query-set size
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = 10
BM25_TOP_DOCS = 5


def text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval scores: top-{BM25_TOP_DOCS} documents for each of
    the corpus' {BM25_TERMS} most frequent non-stopword terms — the
    relevance-scoring pass behind retrieval-based curation (and the
    lexical half of hybrid search). Same all-aggregate shape as TF-IDF
    (tf/df groupBys, broadcast corpus stats); the query-term set is a
    tiny broadcast semi-join, and ranking happens on the ROUNDED score so
    ties and ordering are engine-portable (ln() differs in the last ulp
    across engines)."""
    from pyspark.sql import Window

    t = _with_words(load_table(spark, sf_dir, "documents"))
    tok = t.select("doc_id", F.explode("w").alias("term"))
    ntok = t.select("doc_id", F.size("w").alias("n_tok"))
    stats = t.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size("w")).alias("avgdl"),
    )
    top_terms = (
        tok.where(~F.col("term").isin(*STOPWORDS))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("total"))
        .orderBy(F.desc("total"), "term")
        .limit(BM25_TERMS)
        .select("term")
    )
    tf = (
        tok.join(F.broadcast(top_terms), "term")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + BM25_K1 * (
        1.0 - BM25_B + BM25_B * F.col("n_tok") / F.col("avgdl")
    )
    scored = (
        tf.join(ntok, "doc_id")
        .join(df, "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            "doc_id",
            round2(idf * F.col("tf") * (BM25_K1 + 1.0) / denom).alias("bm25"),
        )
    )
    w = Window.partitionBy("term").orderBy(F.desc("bm25"), "doc_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= BM25_TOP_DOCS)
        .select("term", "rank", "doc_id", "bm25")
        .orderBy("term", "rank")
    )


TEXT_BM25_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
tok AS (SELECT doc_id, UNNEST(w) AS term FROM t),
ntok AS (SELECT doc_id, len(w) AS n_tok FROM t),
stats AS (SELECT COUNT(*) AS n_docs, AVG(len(w)) AS avgdl FROM t),
top_terms AS (
  SELECT term FROM tok
  WHERE term NOT IN {STOPWORDS!r}
  GROUP BY 1 ORDER BY COUNT(*) DESC, term LIMIT {BM25_TERMS}),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
       WHERE term IN (SELECT term FROM top_terms) GROUP BY 1, 2),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.term, tf.doc_id,
         {round2_sql(
             "ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)"
             f" * tf.tf * ({BM25_K1} + 1.0)"
             f" / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * ntok.n_tok / stats.avgdl))"
         )} AS bm25
  FROM tf JOIN ntok USING (doc_id) JOIN df USING (term) CROSS JOIN stats),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY term ORDER BY bm25 DESC, doc_id) AS rank
  FROM scored)
SELECT term, CAST(rank AS INT) AS rank, doc_id, bm25
FROM ranked WHERE rank <= {BM25_TOP_DOCS} ORDER BY term, rank
"""


def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus' own
    unigram LM — the self-trained stand-in for the perplexity filter of
    a CCNet-style quality pipeline (low mean log-prob ⇔ rare-token-heavy
    ⇔ likely noise).

    Three narrow shuffles, all on small keys: token counts (map-side
    combined), the token→probability join (the LM table is vocabulary-
    sized — broadcastable for any real vocabulary), and the per-doc mean.
    The corpus total rides a broadcast scalar, so no driver round-trips.
    """
    toks = (
        _with_words(load_table(spark, sf_dir, "documents"))
        .select("doc_id", F.explode("w").alias("tok"))
    )
    lm = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("tf"))
    total = lm.agg(F.sum("tf").alias("n_total"))
    scored = (
        toks.join(F.broadcast(lm), "tok")
        .crossJoin(F.broadcast(total))
        .select("doc_id", F.log(F.col("tf") / F.col("n_total")).alias("lp"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (F.floor((F.avg("lp")) * 10000 + F.lit(0.5)) / 10000).alias("mean_logprob"),
        )
        .orderBy("doc_id")
    )


TEXT_UNIGRAM_LOGPROB_SQL = """
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents),
lm AS (SELECT tok, COUNT(*) AS tf FROM toks GROUP BY 1),
total AS (SELECT SUM(tf) AS n_total FROM lm)
SELECT doc_id, COUNT(*) AS n_tokens,
       FLOOR((AVG(ln(tf * 1.0 / n_total))) * 10000 + 0.5) / 10000 AS mean_logprob
FROM toks JOIN lm USING (tok), total
GROUP BY doc_id ORDER BY doc_id
"""


def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the inverted index (term → sorted posting list + document
    frequency) for mid-frequency terms (2 ≤ df ≤ 50) — the retrieval
    structure behind decontamination lookups and BM25 serving.

    One explode + distinct + term-keyed aggregate: the term shuffle
    carries only (term, doc_id) pairs, never text. The df band-pass
    drops both hapax noise and stop-words, which is also the scale
    guard: a stop-word's posting list at 100 TB is the whole corpus —
    banding caps postings exactly like dedup's DF_CAP caps shingles.
    The list is emitted as a comma-joined string so the result is
    flat-schema (and the oracle comparable).
    """
    t = _with_words(load_table(spark, sf_dir, "documents"))
    return (
        t.select("doc_id", F.explode("w").alias("term"))
        .distinct()
        .groupBy("term")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("docs"))
        .select(
            "term",
            F.size("docs").cast("bigint").alias("df"),
            F.array_join(F.col("docs").cast("array<string>"), ",").alias("postings"),
        )
        .where((F.col("df") >= 2) & (F.col("df") <= 50))
        .orderBy("term")
    )


TEXT_INVERTED_INDEX_SQL = """
WITH toks AS (
  SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents),
idx AS (
  SELECT term, COUNT(*) AS df,
         array_to_string(list_sort(list(doc_id)), ',') AS postings
  FROM toks GROUP BY term)
SELECT term, df, postings FROM idx
WHERE df BETWEEN 2 AND 50 ORDER BY term
"""


def text_sparse_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF cosine similarity join: document pairs with
    cosine ≥ 0.5 over their mid-frequency term vectors — the SPARSE
    complement to the dense-embedding ANN stack (similarity.py), and the
    lexical near-dup detector that catches template reuse dense
    embeddings smooth over.

    Scale shape: candidate pairs come from an equi-join on TERM over the
    banded postings (2 ≤ df ≤ max(100, 5% of corpus) — the same
    df band-pass as the inverted index bounds every term's pair
    fan-out; a stop term would otherwise contribute |corpus|² pairs,
    and the relative ceiling keeps template terms shared by whole
    near-dup clusters inside the band as the corpus grows). The dot
    product is a per-pair SUM over shared terms, norms are per-doc
    aggregates broadcast back, and only pairs already sharing ≥1 banded
    term ever materialize — work scales with co-occurrence, never n².
    The reported result is each document's TOP-1 lexical neighbor (not
    the full pair set, which is quadratic within a near-dup cluster);
    the cosine is rounded BEFORE ranking so the cross-engine order is
    deterministic.
    """
    t = _with_words(load_table(spark, sf_dir, "documents"))
    tok = t.select("doc_id", F.explode("w").alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("n"))
    df = tok.distinct().groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = t.agg(F.count(F.lit(1)).alias("n_docs"))
    df_cap = F.greatest(F.lit(100), F.ceil(F.col("n_docs") * 0.05))
    wts = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_docs))
        .where((F.col("df") >= 2) & (F.col("df") <= df_cap))
        .select(
            "doc_id",
            "term",
            (F.col("n") * F.log(F.col("n_docs") / F.col("df"))).alias("wt"),
        )
    )
    norms = wts.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("wt") * F.col("wt"))).alias("nrm"))
    a, b = wts.alias("a"), wts.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.sum(F.col("a.wt") * F.col("b.wt")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("nrm").alias("nrm_a"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("nrm").alias("nrm_b"))
    from pyspark.sql import Window

    scored = (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            # NULLIF guard: a doc whose every surviving term appears in
            # ALL docs has wt = n·ln(1) = 0 everywhere → zero norm; its
            # cosine is undefined and the pair must drop out of the
            # >= 0.5 filter on both engines (DuckDB's /0 is NULL; ANSI
            # Spark would otherwise kill the job — generated-corpus
            # fuzz, repetition-only documents).
            (F.floor((F.col("dot") / F.nullif(F.col("nrm_a") * F.col("nrm_b"), F.lit(0.0))) * 1000 + F.lit(0.5)) / 1000).alias("cos"),
        )
        .where(F.col("cos") >= 0.5)
    )
    w = Window.partitionBy("doc_a").orderBy(F.desc("cos"), "doc_b")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_a", "doc_b", "cos")
        .orderBy("doc_a")
    )


TEXT_SPARSE_SIM_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
tok AS (SELECT doc_id, UNNEST(w) AS term FROM t),
tf AS (SELECT doc_id, term, COUNT(*) AS n FROM tok GROUP BY 1, 2),
df AS (SELECT term, COUNT(*) AS df
       FROM (SELECT DISTINCT doc_id, term FROM tok) GROUP BY 1),
nd AS (SELECT COUNT(*) AS n_docs FROM documents),
wts AS (
  SELECT tf.doc_id, tf.term, tf.n * ln(nd.n_docs * 1.0 / df.df) AS wt
  FROM tf JOIN df USING (term), nd
  WHERE df.df BETWEEN 2 AND GREATEST(100, CAST(ceil(nd.n_docs * 0.05) AS BIGINT))),
norms AS (SELECT doc_id, sqrt(SUM(wt * wt)) AS nrm FROM wts GROUP BY 1),
dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, SUM(a.wt * b.wt) AS dot
  FROM wts a JOIN wts b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
scored AS (
  -- NULLIF mirrors the Spark side (and _semdedup_sql): without it a
  -- zero-norm doc divides 0.0/0.0, which DuckDB >= 1.1 (ieee_
  -- floating_point_ops=true) evaluates to NaN — and NaN compares
  -- GREATER than everything, so the >= 0.5 filter would KEEP the pair
  -- and diverge from the guarded Spark plan after a DuckDB upgrade.
  SELECT doc_a, doc_b, FLOOR((dot / NULLIF(na.nrm * nb.nrm, 0)) * 1000 + 0.5) / 1000 AS cos
  FROM dots
  JOIN norms na ON na.doc_id = doc_a
  JOIN norms nb ON nb.doc_id = doc_b
  WHERE FLOOR((dot / NULLIF(na.nrm * nb.nrm, 0)) * 1000 + 0.5) / 1000 >= 0.5)
SELECT doc_a, doc_b, cos FROM scored
QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_a ORDER BY cos DESC, doc_b) = 1
ORDER BY doc_a
"""


def text_langmix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-switching / language-mixing detector: documents whose marker
    tokens hit ≥2 languages with ≥2 markers each — the docs a
    monolingual training mix must route to a dedicated pipeline (or
    drop), and a known failure mode of single-label language ID.
    Single scan, one HOF count per language, no shuffle beyond the
    output sort."""
    t = _with_words(load_table(spark, sf_dir, "documents"))
    words = F.col("w")
    scores = {lang: _count_in(words, vocab) for lang, vocab in LANG_MARKERS.items()}
    n_langs = sum(
        (F.when(scores[lang] >= 2, 1).otherwise(0) for lang in LANG_MARKERS),
        F.lit(0),
    )
    return (
        t.select(
            "doc_id",
            n_langs.cast("bigint").alias("n_langs"),
            (n_langs >= 2).alias("is_mixed"),
        )
        .orderBy("doc_id")
    )


def _langmix_sql() -> str:
    score_cols = ", ".join(
        f"{_sql_count_in(vocab)} AS score_{lang}" for lang, vocab in LANG_MARKERS.items()
    )
    n_langs = " + ".join(
        f"CASE WHEN score_{lang} >= 2 THEN 1 ELSE 0 END" for lang in LANG_MARKERS
    )
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
s AS (SELECT doc_id, {score_cols} FROM t)
SELECT doc_id, CAST({n_langs} AS BIGINT) AS n_langs,
       ({n_langs}) >= 2 AS is_mixed
FROM s ORDER BY doc_id
"""


def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization — lowercase, strip every char
    outside [a-z0-9 ], squeeze whitespace runs, trim — the pass that
    runs before *any* hash-based dedup so that case/punctuation
    variants of the same document collide (exact dedup on raw bytes
    misses them). Emits the normalized digest plus size deltas; chain
    `dedup_exact` on `norm_digest` for the case-insensitive dedup.

    Pure codegen'd string expressions (lower + two regexp_replace +
    trim), single scan, no shuffle beyond the output sort — the
    normalization itself is embarrassingly parallel at any corpus
    size, and only the 32-byte digest ever needs to reach a shuffle.
    """
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "), " +", " "
        )
    )
    return (
        docs.select("doc_id", norm.alias("norm"))
        .select(
            "doc_id",
            F.length("norm").cast("long").alias("n_chars_norm"),
            F.size(F.split(F.col("norm"), " ")).cast("long").alias("n_tokens_norm"),
            F.md5(F.col("norm")).alias("norm_digest"),
        )
        .orderBy("doc_id")
    )


TEXT_NORMALIZE_SQL = """
WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                             ' +', ' ', 'g')) AS norm
  FROM documents)
SELECT doc_id, length(norm) AS n_chars_norm,
       CAST(len(string_split(norm, ' ')) AS BIGINT) AS n_tokens_norm,
       md5(norm) AS norm_digest
FROM n ORDER BY doc_id
"""


OOV_VOCAB = 50  # top-V corpus tokens form the "tokenizer" vocabulary


def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-coverage audit: fix the vocabulary at the corpus' top
    {V} tokens by frequency and measure each document's out-of-vocab
    token rate — the pre-flight check before committing a tokenizer
    (docs with high OOV explode into byte-fallback tokens and blow the
    token budget; a vocab whose corpus-wide OOV mass is high was fit on
    the wrong distribution).

    Scale shape: the vocab is one token-frequency aggregate + top-V
    (TakeOrdered, no global sort) and is broadcast — per-doc work is an
    explode + broadcast LEFT ANTI join + count, so the corpus token
    stream is scanned once and only (doc_id, count) partials cross the
    shuffle. Vocab choice is deterministic (count desc, token asc).
    """
    t = _with_words(load_table(spark, sf_dir, "documents"))
    tok = t.select("doc_id", F.explode("w").alias("term"))
    vocab = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "term")
        .limit(OOV_VOCAB)
        .select("term")
    )
    n_oov = (
        tok.join(F.broadcast(vocab), "term", "left_anti")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_oov"))
    )
    ntok = t.select("doc_id", F.size("w").cast("long").alias("n_tokens"))
    return (
        ntok.join(n_oov, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("n_oov"), F.lit(0)).cast("long").alias("n_oov"),
            round2(F.coalesce(F.col("n_oov"), F.lit(0)) / F.col("n_tokens")).alias(
                "oov_rate"
            ),
        )
        .orderBy("doc_id")
    )


TEXT_OOV_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
tok AS (SELECT doc_id, UNNEST(w) AS term FROM t),
vocab AS (
  SELECT term FROM tok GROUP BY 1
  ORDER BY COUNT(*) DESC, term LIMIT {OOV_VOCAB}),
oov AS (
  SELECT doc_id, COUNT(*) AS n_oov FROM tok
  WHERE term NOT IN (SELECT term FROM vocab) GROUP BY 1),
ntok AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens FROM t)
SELECT n.doc_id, n.n_tokens,
       CAST(COALESCE(o.n_oov, 0) AS BIGINT) AS n_oov,
       {round2_sql("COALESCE(o.n_oov, 0) * 1.0 / n.n_tokens")} AS oov_rate
FROM ntok n LEFT JOIN oov o USING (doc_id)
ORDER BY n.doc_id
"""


BPE_MERGES = 10


def bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First {k} BPE merge operations fit on the corpus — tokenizer
    training's inner loop. Greedy: repeatedly merge the most frequent
    adjacent symbol pair inside words (ties → lexicographically
    smallest pair), exactly the industrial recipe (byte-pair encoding
    over a word-frequency table, not over the raw token stream).

    Scale shape: the ONE data-sized step is corpus → (word, count)
    aggregation, a single explode + groupBy with map-side partials;
    every merge iteration then runs over the vocabulary table, which is
    sub-linear in corpus size (Heaps' law) and driver-held by design —
    the same contract as every practical BPE trainer (the vocab fits
    memory long before the corpus does). No per-iteration Spark jobs:
    100 TB of text costs one aggregate, then the loop is corpus-size-
    independent.

    Rows-only judged (the greedy recurrence is not SQL-expressible);
    pinned in pytest against an independent pandas/Counter
    implementation over the raw parquet.
    """
    t = _with_words(load_table(spark, sf_dir, "documents"))
    wc = (
        t.select(F.explode("w").alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    vocab = {r["word"]: r["cnt"] for r in wc.collect()}  # vocabulary-sized
    seqs = {w: tuple(w) for w in vocab}
    merges = []
    for rank in range(1, BPE_MERGES + 1):
        pairs: dict[tuple[str, str], int] = {}
        for w, cnt in vocab.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pairs[s[i], s[i + 1]] = pairs.get((s[i], s[i + 1]), 0) + cnt
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        merges.append((rank, best[0], best[1], pairs[best]))
        merged = best[0] + best[1]
        for w, s in seqs.items():
            if best[0] not in s:
                continue
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == best[0] and s[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = tuple(out)
    return spark.createDataFrame(
        merges, "rank int, left string, right string, pair_count long"
    )


def text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the langid heuristic against the corpus'
    ground-truth `lang` label, with per-label recall — the evaluation
    pass that decides whether a cheap classifier is good enough to
    route a 100 TB mix (and which language pairs it confuses). One
    scan scores, one (label, pred) aggregate counts: the matrix is
    |langs|² rows however large the corpus.
    """
    from pyspark.sql import Window

    t = _with_words(load_table(spark, sf_dir, "documents"), extra=("lang",))
    words = F.col("w")
    scores = {lang: _count_in(words, vocab) for lang, vocab in LANG_MARKERS.items()}
    pred = (
        F.when(
            (scores["en"] >= scores["es"])
            & (scores["en"] >= scores["fr"])
            & (scores["en"] >= scores["de"]),
            "en",
        )
        .when((scores["es"] >= scores["fr"]) & (scores["es"] >= scores["de"]), "es")
        .when(scores["fr"] >= scores["de"], "fr")
        .otherwise("de")
    )
    cell = t.select(F.col("lang").alias("label"), pred.alias("pred")).groupBy(
        "label", "pred"
    ).agg(F.count(F.lit(1)).alias("n"))
    wl = Window.partitionBy("label")
    return (
        cell.withColumn("label_total", F.sum("n").over(wl))
        .select(
            "label",
            "pred",
            "n",
            round2(F.col("n") / F.col("label_total")).alias("share"),
        )
        .orderBy("label", "pred")
    )


def _lang_confusion_sql() -> str:
    score_cols = ", ".join(
        f"{_sql_count_in(vocab)} AS score_{lang}" for lang, vocab in LANG_MARKERS.items()
    )
    return f"""
WITH t AS (SELECT doc_id, lang AS label, string_split(text, ' ') AS w FROM documents),
s AS (SELECT doc_id, label, {score_cols} FROM t),
p AS (
  SELECT label,
         CASE WHEN score_en >= score_es AND score_en >= score_fr AND score_en >= score_de THEN 'en'
              WHEN score_es >= score_fr AND score_es >= score_de THEN 'es'
              WHEN score_fr >= score_de THEN 'fr'
              ELSE 'de' END AS pred
  FROM s),
cell AS (SELECT label, pred, COUNT(*) AS n FROM p GROUP BY 1, 2)
SELECT label, pred, n,
       {round2_sql("n * 1.0 / SUM(n) OVER (PARTITION BY label)")} AS share
FROM cell ORDER BY label, pred
"""


def text_compress_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressibility quality signal: zlib-compressed size over raw
    size per document — boilerplate/template junk compresses far below
    organic prose, making this one of the cheapest high-recall junk
    filters (the Gopher/C4 lineage). Flags docs under {threshold}.

    Python IS the operator here (zlib), so it runs as an Arrow-batched
    mapInPandas over (doc_id, text) — one scan, compression inside the
    executor batch loop, only (doc_id, sizes) come back; no shuffle at
    all before the output sort. Deterministic: zlib level 6 output
    length is fixed for a given input across platforms (rows-only
    judged; pinned against direct python zlib in pytest).
    """
    import pandas as pd
    import zlib

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def score(batches):
        for pdf in batches:
            raw = pdf["text"].str.encode("utf-8")
            comp = raw.map(lambda b: len(zlib.compress(b, 6)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": raw.map(len),
                    "n_compressed": comp,
                }
            )

    out = docs.mapInPandas(score, schema="doc_id long, n_bytes long, n_compressed long")
    # NULLIF guard: an empty document has no defined ratio — it must not
    # fail the job under ANSI division (zlib of b"" is 8 bytes, raw 0)
    ratio = F.col("n_compressed") / F.nullif(F.col("n_bytes"), F.lit(0))
    return out.select(
        "doc_id",
        "n_bytes",
        "n_compressed",
        round2(ratio).alias("compress_ratio"),
        (ratio < 0.35).alias("is_repetitive"),
    ).orderBy("doc_id")


LOGREG_DIM = 64  # hashed token-feature buckets
LOGREG_ITERS = 5
LOGREG_LR = 0.5


def text_logreg_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed training of a hashed-feature logistic quality
    classifier: {iters} full-batch gradient steps where each step is ONE
    aggregate pass over the corpus — the minimal honest version of
    "fit a fastText-style quality gate on the cluster".

    Features are hashed token frequencies (token → crc32 mod {dim},
    normalized by doc length) kept SPARSE as (doc_id, bucket, value)
    rows — the dense 64-vector never materializes per doc. The label is
    a deterministic rule (stopword ratio > 0.15). Per step: the
    weight vector (dim-sized, driver-held by design like every GLM
    trainer's coefficients) broadcasts in, w·x is a bucket equi-join +
    per-doc sum, and the gradient Σ x·(σ(w·x)−y) comes back as one
    dim-sized aggregate. Corpus size touches only the per-step scan;
    the driver holds 64 floats.

    Rows-only judged (iterative float training is not SQL); pinned
    against an independent numpy implementation of the identical
    recurrence in pytest (same hash, same order-of-magnitude tolerance
    — parallel sum order differs in the last ulp).
    """
    t = _with_words(load_table(spark, sf_dir, "documents"))
    words = F.col("w")
    n_tok = F.size(words)
    stop_ratio = _count_in(words, STOPWORDS) / n_tok
    base = t.select(
        "doc_id",
        "w",
        (stop_ratio > 0.15).cast("double").alias("y"),
        n_tok.cast("double").alias("n_tok"),
    )
    feats = (
        base.select(
            "doc_id", "y", "n_tok", F.explode("w").alias("tok")
        )
        .select(
            "doc_id",
            "y",
            F.pmod(F.crc32(F.col("tok")), F.lit(LOGREG_DIM)).cast("int").alias("j"),
            (1.0 / F.col("n_tok")).alias("x"),
        )
        .groupBy("doc_id", "y", "j")
        .agg(F.sum("x").alias("x"))
        # (A repartition("doc_id") before this checkpoint was A/B'd in
        # r14 and removed: PySpark's localCheckpoint scans back as
        # UnknownPartitioning — see the step plan dumps — so the extra
        # exchange bought nothing.)
        .localCheckpoint()  # reused every iteration — scan the corpus once
    )
    n_docs = base.count()
    w_vec = [0.0] * LOGREG_DIM
    from dask_distributed_vanilla_spark.session import ITER_LOOP_AQE, scoped_conf

    # AQE scoped OFF for the gradient steps: the per-step shapes are
    # fixed (broadcast weights in, one dim-sized aggregate out), so
    # AQE's stage-by-stage re-planning latency × 5 steps is pure
    # overhead (r14 A/B at sf0.1: loop ~3.1s → ~2.5s, combined with the
    # partitioned checkpoint; see session.ITER_LOOP_AQE).
    with scoped_conf(spark, {"spark.sql.adaptive.enabled": ITER_LOOP_AQE}):
        for _ in range(LOGREG_ITERS):
            wdf = spark.createDataFrame(
                list(enumerate(w_vec)), "j int, wj double"
            )
            margin = (
                feats.join(F.broadcast(wdf), "j")
                .groupBy("doc_id", "y")
                .agg(F.sum(F.col("x") * F.col("wj")).alias("m"))
            )
            resid = margin.select(
                "doc_id",
                (1.0 / (1.0 + F.exp(-F.col("m"))) - F.col("y")).alias("r"),
            )
            # residuals are doc-count-sized (one double per doc) — the
            # explicit broadcast builds the small side instead of the
            # planner's choice of broadcasting FEATS (the whole hashed
            # feature table, r14 step-plan dump), so each step ships one
            # double per doc and the 64-bucket aggregate, nothing more
            grad_rows = (
                feats.join(F.broadcast(resid), "doc_id")
                .groupBy("j")
                .agg(F.sum(F.col("x") * F.col("r")).alias("g"))
                .collect()
            )
            grad = {r["j"]: r["g"] for r in grad_rows}
            w_vec = [
                w_vec[j] - LOGREG_LR * grad.get(j, 0.0) / n_docs
                for j in range(LOGREG_DIM)
            ]
    return spark.createDataFrame(
        [(j, math.floor(w_vec[j] * 1000000 + 0.5) / 1000000) for j in range(LOGREG_DIM)], "j int, weight double"
    )


def text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source hapax-legomena profile: the share of a feed's
    vocabulary used exactly once — natural prose sits high (Zipf's
    long tail), template/generated text collapses it, making this one
    of the cheapest synthetic-content smells. Two aggregates on the
    (source, token) key: occurrence counts, then the vocab/hapax
    rollup — token strings stop at the first aggregate's map side.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).where(F.length("tok") > 0)
    counts = tok.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    return (
        counts.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("vocab_size"),
            F.sum((F.col("c") == 1).cast("long")).alias("n_hapax"),
            round2(
                F.sum((F.col("c") == 1).cast("long")) / F.count(F.lit(1))
            ).alias("hapax_ratio"),
        )
        .orderBy("source")
    )


TEXT_HAPAX_SQL = f"""
WITH tok AS (
  SELECT source, UNNEST(string_split(text, ' ')) AS tok FROM documents),
counts AS (
  SELECT source, tok, COUNT(*) AS c FROM tok WHERE len(tok) > 0 GROUP BY 1, 2)
SELECT source, COUNT(*) AS vocab_size,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       {round2_sql("SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*)")} AS hapax_ratio
FROM counts GROUP BY source ORDER BY source
"""


ZIPF_TOP = 100  # fit the law over the head of the distribution


def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit: OLS slope of ln(freq) on ln(rank) over the top
    {n} corpus tokens — natural language sits near −1; a slope far off
    flags template floods (flat head) or truncated vocabularies (steep
    cliff). Companion to the hapax tail check: together they bracket
    the whole rank-frequency curve.

    One token-count aggregate, TakeOrdered top-{n}, then the slope as
    covar_pop/var_pop over exactly {n} rows — both engines evaluate
    the identical closed form.
    """
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    freq = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .where(F.length("tok") > 0)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "tok")
        .limit(ZIPF_TOP)
    )
    ranked = freq.select(
        F.log(F.row_number().over(Window.orderBy(F.desc("c"), "tok")).cast("double")).alias(
            "lx"
        ),
        F.log(F.col("c").cast("double")).alias("ly"),
    )
    # NULLIF: a single-term vocabulary has zero rank variance — the
    # slope is undefined (NULL), not a job failure
    slope = F.covar_pop("lx", "ly") / F.nullif(F.var_pop("lx"), F.lit(0.0))
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        (F.floor(slope * 1000 + F.lit(0.5)) / 1000).alias("zipf_slope"),
    )


TEXT_ZIPF_SQL = f"""
WITH freq AS (
  SELECT tok, COUNT(*) AS c
  FROM (SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents)
  WHERE len(tok) > 0 GROUP BY tok
  ORDER BY c DESC, tok LIMIT {ZIPF_TOP}),
ranked AS (
  SELECT ln(CAST(ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS DOUBLE)) AS lx,
         ln(CAST(c AS DOUBLE)) AS ly
  FROM freq)
SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
       FLOOR(covar_pop(lx, ly) / NULLIF(var_pop(lx), 0) * 1000 + 0.5) / 1000 AS zipf_slope
FROM ranked
"""


PMI_MIN_COUNT = 5
PMI_TOP = 20


def text_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI-scored collocations: the top-{k} adjacent token pairs by
    pointwise mutual information (count floor {floor}) — the
    phrase-mining pass that decides which bigrams deserve a single
    vocabulary slot ("new york" vs incidental adjacency). PMI =
    ln(N·c(ab) / (c(a)·c(b))) over the corpus' own counts.

    Three count aggregates (unigrams, bigrams, totals as broadcast
    1-row frames); ranking keys on the binary-rounded PMI with the
    bigram as tiebreak, so the top-k is engine-exact. At corpus scale
    everything is (token, count) tables — text leaves the scan only as
    exploded tokens into map-side partial counts.
    """
    from pyspark.sql import Window

    t = _with_words(load_table(spark, sf_dir, "documents"))
    uni = (
        t.select(F.explode("w").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # Index guard: sequence(1, size(w)-1) on a SINGLE-token document is
    # sequence(1, 0) — which Spark generates DESCENDING as [1, 0], so
    # w[1] throws INVALID_ARRAY_INDEX and one such doc kills the whole
    # job (ANSI; found by generated-corpus fuzz). slice of an always-
    # ascending sequence yields [] for size(w) < 2 instead.
    pairs = t.select(
        F.explode(
            F.expr(
                "transform(slice(sequence(0, size(w)), 2, greatest(size(w) - 1, 0)),"
                " i -> struct(w[i-1] AS a, w[i] AS b))"
            )
        ).alias("p")
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    big = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("cab"))
    n_big = big.agg(F.sum("cab").cast("double").alias("nb"))
    pmi = F.log(
        F.col("nb") * F.col("cab") / (F.col("ca").cast("double") * F.col("cb"))
    )
    scored = (
        big.where(F.col("cab") >= PMI_MIN_COUNT)
        .join(uni.select(F.col("tok").alias("a"), F.col("c").alias("ca")), "a")
        .join(uni.select(F.col("tok").alias("b"), F.col("c").alias("cb")), "b")
        .crossJoin(F.broadcast(n_big))
        .select(
            "a",
            "b",
            "cab",
            (F.floor(pmi * 1000 + F.lit(0.5)) / 1000).alias("pmi"),
        )
    )
    w = Window.orderBy(F.desc("pmi"), "a", "b")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= PMI_TOP)
        .select("rank", "a", "b", "cab", "pmi")
        .orderBy("rank")
    )


TEXT_PMI_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
uni AS (
  SELECT tok, COUNT(*) AS c
  FROM (SELECT UNNEST(w) AS tok FROM t) GROUP BY 1),
pairs AS (
  SELECT w[i] AS a, w[i+1] AS b
  FROM t, UNNEST(generate_series(1, len(w) - 1)) AS u(i)),
big AS (SELECT a, b, COUNT(*) AS cab FROM pairs GROUP BY 1, 2),
nb AS (SELECT SUM(cab) * 1.0 AS nb FROM big),
scored AS (
  SELECT big.a, big.b, big.cab,
         FLOOR(ln(nb.nb * big.cab / (ua.c * 1.0 * ub.c)) * 1000 + 0.5) / 1000 AS pmi
  FROM big
  JOIN uni ua ON ua.tok = big.a
  JOIN uni ub ON ub.tok = big.b
  CROSS JOIN nb
  WHERE big.cab >= {PMI_MIN_COUNT}),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY pmi DESC, a, b) AS rank FROM scored)
SELECT CAST(rank AS INT) AS rank, a, b, cab, pmi
FROM ranked WHERE rank <= {PMI_TOP} ORDER BY rank
"""


QUERIES = {
    "text_pmi_bigrams": text_pmi_bigrams,
    "text_zipf_slope": text_zipf_slope,
    "text_hapax_ratio": text_hapax_ratio,
    "text_logreg_quality": text_logreg_quality,
    "text_compress_ratio": text_compress_ratio,
    "text_lang_confusion": text_lang_confusion,
    "bpe_merges": bpe_merges,
    "text_oov_rate": text_oov_rate,
    "text_normalize": text_normalize,
    "text_langmix": text_langmix,
    "text_sparse_sim": text_sparse_sim,
    "text_inverted_index": text_inverted_index,
    "text_unigram_logprob": text_unigram_logprob,
    "text_bm25": text_bm25,
    "text_stats": text_stats,
    "text_quality": text_quality,
    "text_langid": text_langid,
    "text_fingerprint": text_fingerprint,
    "text_token_regex": text_token_regex,
    "text_bigrams": text_bigrams,
    "text_tfidf": text_tfidf,
}

ORACLES = {
    "text_pmi_bigrams": TEXT_PMI_SQL,
    "text_zipf_slope": TEXT_ZIPF_SQL,
    "text_hapax_ratio": TEXT_HAPAX_SQL,
    "text_logreg_quality": None,  # iterative float training: rows-only; numpy-pinned in pytest
    "text_compress_ratio": None,  # zlib not in SQL: rows-only; zlib-pinned in pytest
    "text_lang_confusion": _lang_confusion_sql(),
    "bpe_merges": None,  # greedy recurrence not SQL-expressible; Counter-pinned in pytest
    "text_oov_rate": TEXT_OOV_SQL,
    "text_normalize": TEXT_NORMALIZE_SQL,
    "text_langmix": _langmix_sql(),
    "text_sparse_sim": TEXT_SPARSE_SIM_SQL,
    "text_inverted_index": TEXT_INVERTED_INDEX_SQL,
    "text_unigram_logprob": TEXT_UNIGRAM_LOGPROB_SQL,
    "text_bm25": TEXT_BM25_SQL,
    "text_stats": TEXT_STATS_SQL,
    "text_quality": TEXT_QUALITY_SQL,
    "text_langid": _langid_sql(),
    "text_fingerprint": TEXT_FINGERPRINT_SQL,
    "text_token_regex": TEXT_TOKEN_REGEX_SQL,
    "text_bigrams": TEXT_BIGRAMS_SQL,
    "text_tfidf": TEXT_TFIDF_SQL,
}
