"""Plan-shape regression tests: the properties that matter at 100 TB.

A query that is correct but scans all columns, skips pushdown, or
shuffles a fact table against a 25-row dimension would still pass the
value checks — these tests pin the physical plan instead.
"""

from __future__ import annotations

from dask_distributed_vanilla_spark.operators import tpch
from dask_distributed_vanilla_spark.plans.explainer import (
    count_broadcast_joins,
    formatted_plan,
    pushed_filters,
    read_schemas,
)
from tests.conftest import SF_SMOKE


def test_a1_scan_pushdown_and_pruning(spark):
    df = tpch.a1(spark, SF_SMOKE)
    assert "l_shipdate" in pushed_filters(df), "shipdate filter must reach the parquet scan"
    schemas = read_schemas(df)
    # 16-column lineitem projected to the 7 referenced columns
    assert "l_orderkey" not in schemas and "l_partkey" not in schemas


def test_a3_filters_pushed_per_table(spark):
    df = tpch.a3(spark, SF_SMOKE)
    pushed = pushed_filters(df)
    assert "c_mktsegment" in pushed
    assert "o_orderdate" in pushed
    assert "l_shipdate" in pushed


def test_a5_dimension_joins_broadcast(spark):
    df = tpch.a5(spark, SF_SMOKE)
    # with AQE at smoke scale every join side is broadcastable; require
    # that at least the nation/region/supplier dims avoid shuffle joins
    assert count_broadcast_joins(df) >= 3


def test_a6_no_join_no_shuffle_heavy_plan(spark):
    plan = formatted_plan(tpch.a6(spark, SF_SMOKE))
    assert "Join" not in plan
    # exactly one exchange: the partial->final aggregate ("Exchange (n)"
    # matches the tree node; the details section spells it "(n) Exchange")
    assert plan.count("Exchange (") == 1


def test_e5_single_data_shuffle(spark):
    """Sessionization claim: lag, running-sum, and the session group-by
    all reuse one user_id shuffle — only the output ORDER BY adds a
    second exchange."""
    from dask_distributed_vanilla_spark.operators.events import e5

    plan = formatted_plan(e5(spark, SF_SMOKE))
    assert plan.count("Exchange (") == 2
    assert plan.count("Window (") == 2  # lag + running sum, no re-shuffle


def test_a17_aggregates_before_join(spark):
    """Decorrelated per-partkey AVG must reduce lineitem BEFORE the join
    (the join input is |parts|, not |lineitem|), and the aggregate's own
    lineitem input must be pre-reduced by the broadcast LEFT SEMI against
    the Brand#23 part keys (~25× less aggregate input at scale)."""
    plan = formatted_plan(tpch.a17(spark, SF_SMOKE))
    assert "HashAggregate" in plan and "Join" in plan
    assert plan.index("HashAggregate") < plan.index("Join")
    assert "LeftSemi" in plan, "threshold aggregate must read semi-filtered lineitem"


def test_whole_stage_codegen_active(spark):
    # AQE formatted plans hide codegen stages pre-execution; the codegen
    # explain mode reports the fused subtrees directly
    df = tpch.a1(spark, SF_SMOKE)
    codegen = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "codegen")
    assert "WholeStageCodegen" in codegen


def test_b12_derived_lineitem_prunes_columns(spark):
    """Tier B derives extension columns inline; Catalyst must still prune
    the base scan to the columns the derivations + query touch."""
    from dask_distributed_vanilla_spark.operators import tpch_full

    schemas = read_schemas(tpch_full.b12(spark, SF_SMOKE))
    # l_shipmode derives from (l_orderkey, l_linenumber); dates from
    # l_shipdate — money columns must NOT reach the scan
    assert "l_extendedprice" not in schemas
    assert "l_tax" not in schemas
    assert "l_quantity" not in schemas


def test_b2_partsupp_derivation_is_broadcast_shaped(spark):
    """The partsupp derivation (part x 4 with a 1-row supplier count)
    must not introduce a shuffle of its own: the count and the 4-row
    range both broadcast."""
    from dask_distributed_vanilla_spark.operators import tpch_full

    plan = formatted_plan(tpch_full.b2(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan  # both cross joins broadcast


def test_b18_semi_join_then_topk(spark):
    """b18 reduces lineitem to qualifying orderkeys via a HAVING
    aggregate before touching orders/customer, and the trailing
    orderBy+limit stays TakeOrderedAndProject (no global sort)."""
    from dask_distributed_vanilla_spark.operators import tpch_full

    plan = formatted_plan(tpch_full.b18(spark, SF_SMOKE))
    assert "LeftSemi" in plan
    assert "TakeOrderedAndProject" in plan


def test_b5_b7_b8_no_cartesian(spark):
    """The three new multi-join Tier B parameterizations must plan as
    equi-joins throughout — a nested-loop anywhere is a scale bug."""
    from dask_distributed_vanilla_spark.operators import tpch_full

    for fn in (tpch_full.b5, tpch_full.b7, tpch_full.b8):
        plan = formatted_plan(fn(spark, SF_SMOKE))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_semdedup_equi_join_and_pruned_scan(spark):
    """The cluster-scoped pairwise pass must be an equi-join on the
    cluster key (never a global cartesian), reading only the three
    referenced columns."""
    from dask_distributed_vanilla_spark.operators.similarity import semdedup

    df = semdedup(spark, SF_SMOKE)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_multimodal_resize_prunes_scan(spark):
    """The resize pass reads only (doc_id, text->payload); the other
    document columns must not reach the scan."""
    from dask_distributed_vanilla_spark.operators.multimodal import multimodal_resize

    schemas = read_schemas(multimodal_resize(spark, SF_SMOKE))
    assert "lang" not in schemas and "source" not in schemas and "n_chars" not in schemas


def test_tfidf_single_token_explode(spark):
    """text_tfidf reads documents and explodes tokens; the doc scan must
    prune to (doc_id, text) only."""
    from dask_distributed_vanilla_spark.operators import text

    schemas = read_schemas(text.text_tfidf(spark, SF_SMOKE))
    assert "lang" not in schemas and "source" not in schemas


def test_multimodal_frames_no_payload_fanout(spark):
    """The frame explode must run on decoded metadata, never multiplying
    payload bytes: no binary column below the Generate node."""
    from dask_distributed_vanilla_spark.operators import multimodal

    plan = formatted_plan(multimodal.multimodal_frames(spark, SF_SMOKE))
    gen_pos = plan.find("Generate")
    assert gen_pos != -1
    # the explode consumes the pandas-UDF *output* (metadata), which has
    # no payload column at all
    assert "payload#" not in plan[gen_pos : gen_pos + 400]


def test_e12_proximity_is_equi_join_not_theta(spark):
    """The ≤60s proximity join must compile to an equi-join on
    (event_type, bucket) — a theta join would be a nested-loop
    quadratic scan that cannot survive 100 TB."""
    from dask_distributed_vanilla_spark.operators import asof

    plan = formatted_plan(asof.e12_proximity(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_e15_single_shuffle_and_topk(spark):
    """The RANGE-frame window runs on exactly one user_id exchange, and
    the trailing orderBy+limit stays TakeOrderedAndProject (no global
    sort)."""
    from dask_distributed_vanilla_spark.operators import events

    plan = formatted_plan(events.e15_range_window(spark, SF_SMOKE))
    assert plan.count("Exchange (") == 1
    assert "TakeOrderedAndProject" in plan


def test_doc_chunks_prunes_to_two_columns(spark):
    """Chunking reads only (doc_id, text) from the 5-column documents
    scan, and the explode fans out rows, not extra scans."""
    from dask_distributed_vanilla_spark.operators.curation import doc_chunks

    df = doc_chunks(spark, SF_SMOKE)
    schemas = read_schemas(df)
    assert "text" in schemas and "doc_id" in schemas
    assert "payload" not in schemas and "lang" not in schemas
    plan = formatted_plan(df)
    assert plan.count("Location: InMemoryFileIndex") == 1  # one scan
    assert "hashpartitioning" not in plan  # explode fans out, no shuffle


def test_redact_pii_single_scan_no_shuffle(spark):
    """Redaction is one pass: a single parquet scan and no Exchange
    other than the output ordering's."""
    from dask_distributed_vanilla_spark.operators.curation import redact_pii

    df = redact_pii(spark, SF_SMOKE)
    plan = formatted_plan(df)
    assert plan.count("Location: InMemoryFileIndex") == 1  # one scan
    # only the final global sort's rangepartitioning may shuffle
    assert "hashpartitioning" not in plan


def test_cluster_best_single_shuffle_for_selection(spark):
    """The keep-best selection itself adds one hashpartitioning exchange
    on cluster_id (both window functions share it)."""
    from dask_distributed_vanilla_spark.operators.curation import cluster_best

    plan = formatted_plan(cluster_best(spark, SF_SMOKE))
    assert plan.count("hashpartitioning(cluster_id") <= 1


def test_doc_repetition_zero_shuffle_scan(spark):
    """Repetition scoring claim: the per-doc mode is a higher-order
    function over the sorted token array, NOT an explode+groupBy — the
    plan must contain no data shuffle at all (only the output sort)."""
    from dask_distributed_vanilla_spark.operators.curation import doc_repetition

    plan = formatted_plan(doc_repetition(spark, SF_SMOKE))
    assert "hashpartitioning" not in plan
    assert "Generate" not in plan  # no explode
    assert plan.count("Location: InMemoryFileIndex") == 1


def test_decontaminate_broadcasts_benchmark(spark):
    """The benchmark shingle set is small by construction: the corpus
    side must probe it with a broadcast join, never a shuffle join or a
    nested-loop."""
    from dask_distributed_vanilla_spark.operators.curation import decontaminate

    df = decontaminate(spark, SF_SMOKE)
    assert count_broadcast_joins(df) >= 1
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_doc_pack_single_lang_shuffle(spark):
    """Running-sum window and per-pack rollup share one (lang) shuffle."""
    from dask_distributed_vanilla_spark.operators.curation import doc_pack

    plan = formatted_plan(doc_pack(spark, SF_SMOKE))
    assert plan.count("hashpartitioning(lang") <= 1


def test_e16_histogram_single_exchange(spark):
    """Arithmetic bucketing on the scan + one partial->final aggregate."""
    from dask_distributed_vanilla_spark.operators.events import e16_histogram

    plan = formatted_plan(e16_histogram(spark, SF_SMOKE))
    assert plan.count("Exchange (") <= 2  # agg exchange + output sort
    assert "Join" not in plan


def test_e21_zscore_single_user_shuffle(spark):
    """Both analytic moments share one user_id window shuffle; only the
    output ORDER BY adds a second exchange."""
    from dask_distributed_vanilla_spark.operators.events import e21_zscore

    plan = formatted_plan(e21_zscore(spark, SF_SMOKE))
    assert plan.count("Exchange (") == 2
    assert plan.count("Window (") == 1  # avg + stddev in one window op


def test_zorder_layout_is_codegen_topk(spark):
    """The z-value is pure bit arithmetic: no join, no aggregate
    exchange — a single scan into TakeOrderedAndProject."""
    from dask_distributed_vanilla_spark.operators.lakehouse import zorder_layout

    plan = formatted_plan(zorder_layout(spark, SF_SMOKE))
    assert "Join" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_merge_upsert_full_outer_on_key(spark):
    """MERGE lowers to one full-outer join on the merge key over the
    two latest-state windows."""
    from dask_distributed_vanilla_spark.operators.lakehouse import merge_upsert

    plan = formatted_plan(merge_upsert(spark, SF_SMOKE))
    assert "FullOuter" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_dedup_incremental_prunes_text_and_antijoins(spark):
    """Only digests cross the join: the anti-join input projects the
    32-byte digest, never the text column, and both parquet scans get
    the doc_id slice predicate pushed."""
    from dask_distributed_vanilla_spark.operators.dedup import dedup_incremental

    df = dedup_incremental(spark, SF_SMOKE)
    plan = formatted_plan(df)
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_runtime_bloom_filter_on_selective_shuffle_join(spark):
    """When the join can't broadcast, Spark can still inject a runtime
    Bloom filter built from the selective side into the fact scan — the
    shuffle-join analog of dynamic partition pruning. Pinned here with
    the size thresholds relaxed to fire at test scale (at 100 TB the
    defaults — creation side < 10 MB, application side > 10 GB — gate it
    to exactly the star-join case it is meant for)."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        from dask_distributed_vanilla_spark.catalog import load_table
        from pyspark.sql import functions as F

        li = load_table(spark, SF_SMOKE, "lineitem")
        sel = load_table(spark, SF_SMOKE, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        joined = li.join(sel, li.l_orderkey == sel.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        assert "bloomfilter" in formatted_plan(joined).lower()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_sample_mixture_single_lang_shuffle(spark):
    """Running char sum and budget cutoff ride one (lang) window
    shuffle; only the output ORDER BY adds a second exchange."""
    from dask_distributed_vanilla_spark.operators.curation import sample_mixture

    plan = formatted_plan(sample_mixture(spark, SF_SMOKE))
    assert plan.count("Exchange (") == 2
    assert "Join" not in plan


def test_snapshot_diff_full_outer_no_cartesian(spark):
    from dask_distributed_vanilla_spark.operators.lakehouse import snapshot_diff

    plan = formatted_plan(snapshot_diff(spark, SF_SMOKE))
    assert "FullOuter" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_dedup_incremental_near_no_cartesian_and_antijoin(spark):
    """Directional delta-vs-corpus candidates: equi-join on band buckets
    (never a cartesian), survivors via left-anti join."""
    from dask_distributed_vanilla_spark.operators.dedup import dedup_incremental_near

    plan = formatted_plan(dedup_incremental_near(spark, SF_SMOKE))
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_e25_eqdepth_no_global_sort(spark):
    """Equi-depth histogram must NOT lower to a global ntile sort (one
    partition holding every row): boundaries come from a mergeable
    scalar aggregate, assignment is a broadcast higher-order expression."""
    from dask_distributed_vanilla_spark.operators.events import e25_eqdepth

    plan = formatted_plan(e25_eqdepth(spark, SF_SMOKE))
    assert "Window" not in plan  # no ntile
    # the one-row bounds side rides a broadcast, never a shuffled product
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_e28_sessionize_single_user_shuffle(spark):
    """lag + running sum + per-session rollup ride ONE user_id shuffle:
    the session groupBy keys on a prefix of the window partitioning so
    only the output sort adds an exchange."""
    from dask_distributed_vanilla_spark.operators.events import e28_sessionize

    plan = formatted_plan(e28_sessionize(spark, SF_SMOKE))
    assert plan.count("Exchange (") == 2  # user_id shuffle + output sort


def test_e29_transitions_fact_shuffle_once(spark):
    """The fact table shuffles once (user window); the normalizer window
    runs on the |types|^2 aggregate, never back on the facts."""
    from dask_distributed_vanilla_spark.operators.events import e29_transitions

    plan = formatted_plan(e29_transitions(spark, SF_SMOKE))
    assert plan.count("Window (") == 2
    # windows must be separated by the shrinking aggregate
    assert plan.count("HashAggregate") >= 2


def test_e30_winsorize_bounds_broadcast(spark):
    """The per-group percentile bounds broadcast back onto the fact
    table — clipping is codegen'd column arithmetic, not a window."""
    from dask_distributed_vanilla_spark.operators.events import e30_winsorize

    plan = formatted_plan(e30_winsorize(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_er_blocking_is_hash_join_not_cartesian(spark):
    """Blocked ER must execute as an equi-join on the block key with the
    inequality + edit-distance as residual predicates — never a
    cartesian pair enumeration."""
    from dask_distributed_vanilla_spark.operators.er import er_blocking, er_match_pairs

    for q in (er_blocking, er_match_pairs):
        plan = formatted_plan(q(spark, SF_SMOKE))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_inverted_index_shuffles_pairs_not_text(spark):
    """The term shuffle carries (term, doc_id) pairs only: the text
    column is pruned right after the explode, before any exchange."""
    from dask_distributed_vanilla_spark.operators.text import text_inverted_index

    df = text_inverted_index(spark, SF_SMOKE)
    plan = formatted_plan(df)
    assert "Exchange" in plan
    # text never appears in an exchange's output attribute list
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text" not in line


def test_e31_interval_join_is_bucketed_equi_join(spark):
    """The interval-overlap join must lower to an equi-join on the hour
    bucket with the overlap predicate residual — never a
    nested-loop over (sessions x bursts)."""
    from dask_distributed_vanilla_spark.operators.events import e31_interval_join

    plan = formatted_plan(e31_interval_join(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_e32_resample_grid_is_distributed(spark):
    """The daily grid generates executor-side (sequence + explode per
    user span): no Python eval, and the fill window keys on user_id."""
    from dask_distributed_vanilla_spark.operators.events import e32_resample_ffill

    plan = formatted_plan(e32_resample_ffill(spark, SF_SMOKE))
    assert "Generate" in plan  # explode(sequence(...)) runs in the plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sketch_rollup_two_level_aggregate(spark):
    """Sketch build and sketch union are both hash aggregates (partial +
    final): the mergeable path, no window, no join."""
    from dask_distributed_vanilla_spark.operators.events import sketch_rollup

    plan = formatted_plan(sketch_rollup(spark, SF_SMOKE))
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 4  # two levels x partial/final


def test_dq_audit_anti_joins_ship_keys_only(spark):
    """Referential-integrity checks are left-anti joins on the key
    column alone; no check degenerates to a cartesian, and the domain
    rules fuse into conditional aggregates (no per-rule Python)."""
    from dask_distributed_vanilla_spark.operators.quality import dq_audit

    plan = formatted_plan(dq_audit(spark, SF_SMOKE))
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sparse_sim_candidates_are_term_equi_join(spark):
    """Sparse cosine candidates come from an equi-join on term over the
    df-banded postings — no cartesian/BNLJ anywhere, and the pair
    reduction is a single window top-1, not a re-join."""
    from dask_distributed_vanilla_spark.operators.text import text_sparse_sim

    plan = formatted_plan(text_sparse_sim(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert plan.count("Window (") == 1


def test_join_hints_are_honored(spark):
    """The engine's join-strategy control surface: merge and
    shuffle_hash hints must override the optimizer's default pick —
    the operational knob when statistics mislead at scale."""
    from dask_distributed_vanilla_spark.catalog import load_table

    li = load_table(spark, SF_SMOKE, "lineitem")
    orders = load_table(spark, SF_SMOKE, "orders")
    merged = li.join(orders.hint("merge"), li.l_orderkey == orders.o_orderkey)
    assert "SortMergeJoin" in formatted_plan(merged)
    hashed = li.join(
        orders.hint("shuffle_hash"), li.l_orderkey == orders.o_orderkey
    )
    plan = formatted_plan(hashed)
    assert "ShuffledHashJoin" in plan


def test_hybrid_rrf_both_halves_broadcast(spark):
    """Both candidate generators keep the corpus un-shuffled: the
    query embeddings and the query-doc terms are the broadcast sides,
    and nothing in the plan degrades to a cartesian/BNLJ pair loop."""
    from dask_distributed_vanilla_spark.operators.similarity import ann_hybrid_rrf

    df = ann_hybrid_rrf(spark, SF_SMOKE)
    plan = formatted_plan(df)
    assert count_broadcast_joins(df) >= 2  # vec half + lex half
    assert "CartesianProduct" not in plan


def test_shards_layout_single_data_shuffle(spark):
    """The shard audit shuffles the docs once (the per-shard window
    sort); the aggregate rides the same partitioning. Only id/size
    columns are read — text never leaves the scan."""
    from dask_distributed_vanilla_spark.operators.lakehouse import shards_layout

    plan = formatted_plan(shards_layout(spark, SF_SMOKE))
    assert "text" not in plan.split("ReadSchema")[1].split("\n")[0]
    assert plan.count("Window (") == 1


def test_text_normalize_no_shuffle_single_scan(spark):
    """Normalization is map-only: one scan, no exchange except the
    output ordering."""
    from dask_distributed_vanilla_spark.operators.text import text_normalize

    plan = formatted_plan(text_normalize(spark, SF_SMOKE))
    assert plan.count("Location: InMemoryFileIndex") == 1
    assert "Join" not in plan


def test_emb_drift_no_cartesian_and_narrow_shuffle(spark):
    """The drift monitor's centroid self-join is an equi-join on
    (label, pos) — never a pair loop — and the embedding scan reads
    only the referenced columns."""
    from dask_distributed_vanilla_spark.operators.similarity import emb_drift

    plan = formatted_plan(emb_drift(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_quality_token_mix_decile_over_doc_table(spark):
    """The NTILE window runs over the doc-level table (one row per
    doc), not the token stream: exactly one Window node."""
    from dask_distributed_vanilla_spark.operators.curation import quality_token_mix

    plan = formatted_plan(quality_token_mix(spark, SF_SMOKE))
    assert plan.count("Window (") == 1


def test_two_level_stream_sink_rollup_is_trivial(spark):
    """stream_two_level's returned frame reads the (tiny) daily sink —
    the heavy lifting (two chained state stores) ran inside the
    streaming query; the post-plan must be scan+filter+sort only."""
    from dask_distributed_vanilla_spark.streaming.events_stream import stream_two_level

    plan = formatted_plan(stream_two_level(spark, SF_SMOKE))
    assert "Join" not in plan


def test_pmi_bigrams_no_cartesian(spark):
    """PMI's three count tables join on token keys; the only
    nested-loop allowed is the deliberate 1-row totals broadcast."""
    from dask_distributed_vanilla_spark.operators.text import text_pmi_bigrams

    plan = formatted_plan(text_pmi_bigrams(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan


def test_hapax_ratio_single_scan_no_join(spark):
    """Vocabulary profiling is two aggregates over one scan — token
    strings must never cross a join."""
    from dask_distributed_vanilla_spark.operators.text import text_hapax_ratio

    plan = formatted_plan(text_hapax_ratio(spark, SF_SMOKE))
    assert plan.count("Location: InMemoryFileIndex") == 1
    assert "SortMergeJoin" not in plan


def test_dispersion_reads_only_ts_and_type(spark):
    """The dispersion index needs (event_type, ts) — the scan must not
    read value/props, and the span cross join stays a 1-row broadcast."""
    from dask_distributed_vanilla_spark.operators.events import e43_dispersion

    plan = formatted_plan(e43_dispersion(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    first_schema = plan.split("ReadSchema")[1].split("\n")[0]
    assert "value" not in first_schema and "props" not in first_schema


def test_zipf_topk_stays_upstream_of_global_window(spark):
    """text_zipf_slope's unpartitioned rank window is only acceptable
    because its input is the TakeOrdered top-ZIPF_TOP head, never the
    corpus vocabulary. Pin the bound's position: the formatted tree
    prints children after parents, so the TakeOrderedAndProject must
    appear after (= upstream of) the Window node."""
    from dask_distributed_vanilla_spark.operators.text import text_zipf_slope

    plan = formatted_plan(text_zipf_slope(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan
    assert plan.index("Window") < plan.index("TakeOrderedAndProject"), (
        "top-k head must be upstream of the unpartitioned window"
    )


def test_pmi_count_floor_stays_upstream_of_global_window(spark):
    """text_pmi_bigrams' global rank window holds only bigrams past the
    PMI_MIN_COUNT floor — pin that the cab >= floor filter sits upstream
    of the single Window node so a future edit can't silently rank the
    raw corpus-sized bigram table on one partition."""
    from dask_distributed_vanilla_spark.operators.text import (
        PMI_MIN_COUNT,
        text_pmi_bigrams,
    )

    plan = formatted_plan(text_pmi_bigrams(spark, SF_SMOKE))
    assert plan.count("Window (") == 1
    assert f">= {PMI_MIN_COUNT}" in plan, "count floor must survive in the plan"
    assert "CartesianProduct" not in plan


def test_orders_pareto_window_runs_on_customer_aggregate(spark):
    """orders_pareto's unpartitioned windows are customer-dimension-
    sized by construction: the per-customer groupBy must sit upstream of
    the Window chain (tree prints children after parents), and the
    orders scan must be pruned to (o_custkey, o_totalprice)."""
    from dask_distributed_vanilla_spark.operators.tpch import orders_pareto

    df = orders_pareto(spark, SF_SMOKE)
    plan = formatted_plan(df)
    first_window = plan.index("Window")
    assert "HashAggregate" in plan[first_window:], (
        "per-customer aggregate must be upstream of the global window"
    )
    schemas = read_schemas(df)
    assert "o_orderdate" not in schemas and "o_comment" not in schemas
