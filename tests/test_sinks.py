"""Sink layouts and their read-side payoff: partition pruning and
shuffle-free bucketed joins — the 100 TB layout decisions, asserted on
the physical plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dask_distributed_vanilla_spark.catalog import load_table
from dask_distributed_vanilla_spark.plans.explainer import formatted_plan
from dask_distributed_vanilla_spark.sources import writers
from tests.conftest import SF_SMOKE


def test_partitioned_write_prunes(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events")
    path = str(tmp_path / "events_by_type")
    writers.write_partitioned(ev, path, ["event_type"])
    back = spark.read.parquet(path).where(F.col("event_type") == "click")
    plan = formatted_plan(back)
    # partition filter appears as PartitionFilters, not a data filter
    assert "PartitionFilters" in plan and "event_type" in plan
    want = ev.where(F.col("event_type") == "click").count()
    assert back.count() == want


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS bucketed_test")
    orders = load_table(spark, SF_SMOKE, "orders")
    lineitem = load_table(spark, SF_SMOKE, "lineitem")
    writers.write_bucketed(
        orders, "bucketed_test.orders_b", ["o_orderkey"], n_buckets=8
    )
    writers.write_bucketed(
        lineitem, "bucketed_test.lineitem_b", ["l_orderkey"], n_buckets=8
    )
    o = spark.table("bucketed_test.orders_b")
    l = spark.table("bucketed_test.lineitem_b")
    # forbid broadcast so the join would otherwise need a full shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = o.join(l, o.o_orderkey == l.l_orderkey).groupBy("o_orderkey").count()
        plan = formatted_plan(joined)
        assert "SortMergeJoin" in plan
        # co-bucketed scan-side inputs: no Exchange feeds the join
        join_section = plan.split("SortMergeJoin")[0]
        assert "Exchange" not in join_section, f"bucketed join still shuffles:\n{plan}"
        # values still correct
        rows = joined.count()
        want = (
            orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
            .groupBy("o_orderkey")
            .count()
            .count()
        )
        assert rows == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.sql("DROP TABLE IF EXISTS bucketed_test.orders_b")
        spark.sql("DROP TABLE IF EXISTS bucketed_test.lineitem_b")


def test_plain_parquet_roundtrip(spark, tmp_path):
    n = load_table(spark, SF_SMOKE, "nation")
    path = str(tmp_path / "nation_out")
    writers.write_parquet(n, path)
    assert spark.read.parquet(path).count() == 25


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    """ORC round-trip preserves values, and a filtered re-read pushes the
    predicate into the ORC scan (same contract as parquet)."""
    from dask_distributed_vanilla_spark.sources.readers import read_orc
    from dask_distributed_vanilla_spark.sources.writers import write_orc

    src = load_table(spark, SF_SMOKE, "nation")
    write_orc(src, str(tmp_path / "nation_orc"))
    back = read_orc(spark, str(tmp_path / "nation_orc"))
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
    plan = back.where(back.n_regionkey == 1)._jdf.queryExecution().executedPlan().toString()
    assert "n_regionkey" in plan


def test_json_sink_roundtrip(spark, tmp_path):
    """JSON-lines round-trip with an explicit schema on re-read."""
    from dask_distributed_vanilla_spark.sources.readers import read_json
    from dask_distributed_vanilla_spark.sources.writers import write_json

    src = load_table(spark, SF_SMOKE, "region")
    write_json(src, str(tmp_path / "region_json"))
    back = read_json(
        spark,
        str(tmp_path / "region_json"),
        schema=src.schema.simpleString()[7:-1].replace(":", " "),
    )
    assert sorted(map(tuple, back.select(*src.columns).collect())) == sorted(
        map(tuple, src.collect())
    )


def test_dynamic_partition_pruning_on_star_join(spark, tmp_path):
    """Dynamic partition pruning: a fact table partitioned on the join
    key scans only the partitions the filtered dimension selects — the
    runtime filter Spark injects is the star-join scan killer at 100 TB
    (prune first, then join, without the predicate being static)."""
    fact = load_table(spark, SF_SMOKE, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_by_year")
    writers.write_partitioned(fact, path, ["o_year"])
    dim = spark.range(1995, 2003).select(
        F.col("id").cast("int").alias("o_year"), (F.col("id") % 2 == 0).alias("keep")
    )
    joined = (
        spark.read.parquet(path)
        .join(dim.where(F.col("keep")), "o_year")
        .groupBy("o_year")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = formatted_plan(joined)
    assert "dynamicpruning" in plan.lower(), plan


def test_zordered_write_clusters_both_dimensions(spark, tmp_path):
    """Re-clustering by z-value delivers the layout promise: rows in a
    narrow z-range land in few files (so parquet min-max stats prune
    BOTH source dimensions), and every file covers a disjoint z-range."""
    from dask_distributed_vanilla_spark.operators.lakehouse import (
        Z_BITS,
        Z_EPOCH,
        _zvalue_spark,
        write_zordered,
    )

    orders = load_table(spark, SF_SMOKE, "orders")

    x = F.col("o_custkey").cast("long").bitwiseAND(F.lit((1 << Z_BITS) - 1))
    d = F.datediff(F.col("o_orderdate"), F.lit(Z_EPOCH).cast("date")).cast("long")
    y = d.bitwiseAND(F.lit((1 << Z_BITS) - 1))
    with_z = orders.select("o_orderkey", _zvalue_spark(x, y).alias("zval"))

    path = str(tmp_path / "orders_zordered")
    write_zordered(with_z, path, "zval", n_files=8)

    back = spark.read.parquet(path).select(
        "zval", F.input_file_name().alias("f")
    )
    # per-file z-ranges must be pairwise disjoint (range partitioning)
    ranges = sorted(
        (r["lo"], r["hi"])
        for r in back.groupBy("f").agg(F.min("zval").alias("lo"), F.max("zval").alias("hi")).collect()
    )
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2
    # a narrow z-slice (the bottom row-decile) touches at most 2 of the
    # 8 files — range partitioning splits by row quantile, so locality
    # is a row-share property, not a value-share one
    cut = back.approxQuantile("zval", [0.1], 0.01)[0]
    touched = back.where(F.col("zval") <= cut).select("f").distinct().count()
    assert touched <= 2


def test_analyze_table_stats_feed_cbo(spark, tmp_path):
    """saveAsTable + ANALYZE TABLE records row/size stats in the
    catalog — the statistics surface a cost-based optimizer (and a
    human) reads; the engine's tables are not a stats black hole."""
    from dask_distributed_vanilla_spark.catalog import load_table
    from tests.conftest import SF_SMOKE

    name = "nation_stats_t"
    load_table(spark, SF_SMOKE, "nation").write.mode("overwrite").saveAsTable(name)
    try:
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR COLUMNS n_nationkey")
        detail = spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
        stats = [r for r in detail if r.col_name == "Statistics"]
        assert stats and "rows" in stats[0].data_type
        cols = spark.sql(f"DESCRIBE TABLE EXTENDED {name} n_nationkey").collect()
        kv = {r.info_name: r.info_value for r in cols}
        assert kv.get("distinct_count") not in (None, "NULL")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_versioned_table_time_travel_and_compaction(spark, tmp_path):
    """Commit log semantics: appends create versions, time travel reads
    any past version exactly, compaction rewrites layout without
    rewriting history, and a crash-orphaned data file (no log entry)
    stays invisible to readers."""
    from dask_distributed_vanilla_spark.sources.versioned import (
        compact,
        latest_version,
        read_versioned,
        snapshot_files,
        write_append,
    )

    path = str(tmp_path / "vt")
    v0 = write_append(spark.range(0, 10).toDF("id"), path)
    v1 = write_append(spark.range(10, 15).toDF("id"), path)
    assert (v0, v1) == (0, 1)

    assert read_versioned(spark, path, version=0).count() == 10
    assert read_versioned(spark, path).count() == 15

    # orphan a data file with no log entry: invisible to any snapshot
    (tmp_path / "vt" / "part-orphan.parquet").write_bytes(b"junk")
    assert "part-orphan.parquet" not in snapshot_files(path)
    assert read_versioned(spark, path).count() == 15

    v2 = compact(spark, path)
    assert v2 == 2 and latest_version(path) == 2
    assert len(snapshot_files(path)) == 1  # single file after compaction
    assert read_versioned(spark, path).count() == 15  # same data
    assert read_versioned(spark, path, version=1).count() == 15  # history intact
    assert read_versioned(spark, path, version=0).count() == 10
    got = sorted(r.id for r in read_versioned(spark, path).collect())
    assert got == list(range(15))


def test_versioned_incremental_read_and_vacuum(spark, tmp_path):
    """read_appended feeds incremental consumers only the new rows
    (compaction rewrites excluded); vacuum reclaims files outside the
    retention horizon and the surviving snapshots still read exactly."""
    from dask_distributed_vanilla_spark.sources.versioned import (
        compact,
        read_appended,
        read_versioned,
        vacuum,
        write_append,
    )

    path = str(tmp_path / "vt2")
    write_append(spark.range(0, 10).toDF("id"), path)          # v0
    write_append(spark.range(10, 15).toDF("id"), path)         # v1
    delta = read_appended(spark, path, since_version=0)
    assert sorted(r.id for r in delta.collect()) == list(range(10, 15))

    compact(spark, path)                                        # v2 (rewrite)
    assert read_appended(spark, path, since_version=1).count() == 0
    write_append(spark.range(15, 18).toDF("id"), path)          # v3
    assert read_appended(spark, path, since_version=1).count() == 3

    removed = vacuum(path, keep_versions=2)                     # keep v2, v3
    assert removed  # the pre-compaction small files go away
    assert read_versioned(spark, path).count() == 18
    assert read_versioned(spark, path, version=2).count() == 15


def test_write_sized_caps_records_per_file(spark, tmp_path):
    import os

    from dask_distributed_vanilla_spark.sources.writers import write_sized

    p = str(tmp_path / "sized")
    write_sized(spark.range(0, 1000).coalesce(1).toDF("id"), p, max_records_per_file=300)
    files = [f for f in os.listdir(p) if f.endswith(".parquet")]
    assert len(files) >= 4  # 1000 rows / 300 cap
    assert spark.read.parquet(p).count() == 1000


def test_training_shards_write_is_deterministic(spark, tmp_path):
    """The shard writer delivers the layout `shards_layout` audits:
    every doc lands in the `shard=k/` directory its hash names with one
    file per shard, intra-file order is the hash order, and a second
    write under the same seed reproduces the identical sequences (the
    resumable-training contract)."""
    import os

    from dask_distributed_vanilla_spark.operators.lakehouse import (
        N_SHARDS,
        write_training_shards,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id")
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    write_training_shards(docs, p1, "doc_id", N_SHARDS)
    write_training_shards(docs, p2, "doc_id", N_SHARDS)

    assert spark.read.parquet(p1).count() == docs.count()

    def per_shard(path):
        out = {}
        for d in sorted(os.listdir(path)):
            if not d.startswith("shard="):
                continue
            files = [f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")]
            assert len(files) == 1  # one file per shard
            rows = spark.read.parquet(os.path.join(path, d, files[0])).collect()
            out[int(d.split("=")[1])] = [r["doc_id"] for r in rows]
        return out

    s1, s2 = per_shard(p1), per_shard(p2)
    assert s1 == s2  # same seed -> identical per-shard sequences

    # every doc is in the shard its hash names (the audit's own expr)
    h = F.md5(F.concat(F.lit("shard|"), F.col("doc_id").cast("string")))
    expected = {
        r["shard"]: r["count"]
        for r in docs.withColumn(
            "shard",
            (F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % N_SHARDS).cast("int"),
        )
        .groupBy("shard")
        .count()
        .collect()
    }
    assert {k: len(v) for k, v in s1.items()} == expected


def test_versioned_table_schema_evolution(spark, tmp_path):
    """Additive schema evolution on the versioned table: a later append
    may carry a new column; the merged snapshot reads it as NULL on
    pre-evolution rows, while time travel to an old version still sees
    only that version's schema."""
    from dask_distributed_vanilla_spark.sources.versioned import (
        read_versioned,
        write_append,
    )

    p = str(tmp_path / "evolving")
    write_append(spark.range(0, 5).toDF("id"), p)                        # v0
    v1_df = spark.range(5, 8).toDF("id").withColumn("lang", F.lit("en"))
    write_append(v1_df, p)                                              # v1

    latest = read_versioned(spark, p)
    assert set(latest.columns) == {"id", "lang"}
    assert latest.count() == 8
    assert latest.where(F.col("lang").isNull()).count() == 5  # old rows

    v0 = read_versioned(spark, p, version=0)
    assert v0.columns == ["id"]
    assert v0.count() == 5


def test_versioned_table_file_skipping(spark, tmp_path):
    """Commit-log data skipping: per-file [min,max] recorded at append
    time lets a range read drop non-overlapping files WITHOUT opening
    any parquet footer — and the pruned result is exactly the unpruned
    read plus the filter."""
    from dask_distributed_vanilla_spark.sources.versioned import (
        read_pruned,
        read_versioned,
        snapshot_files_pruned,
        write_append,
    )

    p = str(tmp_path / "skipping")
    # four disjoint id ranges -> four commits, one file each
    for lo in (0, 100, 200, 300):
        write_append(
            spark.range(lo, lo + 100).coalesce(1).toDF("id"), p, stats_cols=["id"]
        )

    files, skipped = snapshot_files_pruned(p, "id", 150, 160)
    assert skipped == 3 and len(files) == 1  # only the [100,200) file survives

    got = sorted(r["id"] for r in read_pruned(spark, p, "id", 150, 160).collect())
    want = sorted(
        r["id"]
        for r in read_versioned(spark, p).filter("id BETWEEN 150 AND 160").collect()
    )
    assert got == want == list(range(150, 161))

    # stats-less commits stay conservatively readable
    write_append(spark.range(400, 410).coalesce(1).toDF("id"), p)  # no stats
    files2, skipped2 = snapshot_files_pruned(p, "id", 150, 160)
    assert len(files2) == 2 and skipped2 == 3  # unknown file kept
    got2 = sorted(r["id"] for r in read_pruned(spark, p, "id", 150, 160).collect())
    assert got2 == list(range(150, 161))  # exact predicate still applied


def test_compact_zordered_enables_file_skipping(spark, tmp_path):
    """OPTIMIZE + re-cluster: appends land ids interleaved (every file
    covers the whole range, nothing can skip); one compact_zordered
    commit re-sorts the snapshot into range-disjoint files, after
    which the same range read skips most files via the recorded stats
    — and time travel still sees the pre-compaction rows."""
    from dask_distributed_vanilla_spark.sources.versioned import (
        compact_zordered,
        read_pruned,
        read_versioned,
        snapshot_files_pruned,
        write_append,
    )

    p = str(tmp_path / "optimize")
    # interleaved appends: id % 4 == k per commit -> every file spans [0,400)
    for k in range(4):
        ids = spark.range(0, 400).where(f"id % 4 = {k}").coalesce(1).toDF("id")
        write_append(ids, p, stats_cols=["id"])

    _, skipped_before = snapshot_files_pruned(p, "id", 10, 20)
    assert skipped_before == 0  # interleaved layout: nothing skippable

    v = compact_zordered(spark, p, ["id"], n_files=4, stats_cols=["id"])
    files_after, skipped_after = snapshot_files_pruned(p, "id", 10, 20)
    assert skipped_after >= 2  # tight ranges: most files provably dead
    assert len(files_after) + skipped_after == 4

    got = sorted(r["id"] for r in read_pruned(spark, p, "id", 10, 20).collect())
    assert got == list(range(10, 21))
    assert read_versioned(spark, p).count() == 400
    assert read_versioned(spark, p, version=v - 1).count() == 400  # history intact
