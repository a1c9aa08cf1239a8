"""Frame facade parity: reference-style dask code (queries.py idioms)
through the facade must equal the native engine plans; plus ingest
round-trips for the delimited readers."""

from __future__ import annotations

import pandas as pd

from dask_distributed_vanilla_spark import frame as fr
from dask_distributed_vanilla_spark.catalog import load_table
from dask_distributed_vanilla_spark.operators.tpch import a6
from dask_distributed_vanilla_spark.sources import readers
from tests.conftest import SF_SMOKE, assert_matches_oracle


def _lineitem(spark):
    return fr.Frame(load_table(spark, SF_SMOKE, "lineitem"))


def test_facade_query1_near_verbatim(spark):
    """The reference's query1 body (queries.py:27-66) with only the date
    literal and `schema=`-style changes."""
    lineitem = _lineitem(spark)
    lineitem_filtered = lineitem[lineitem["l_shipdate"] < "1998-10-01"]
    lineitem_filtered["sum_charge"] = (
        lineitem_filtered["l_extendedprice"]
        * (1 - lineitem_filtered["l_discount"])
        * (1 + lineitem_filtered["l_tax"])
    )
    gb = lineitem_filtered.groupby(["l_returnflag", "l_linestatus"])
    total = gb.agg({"l_quantity": ["sum", "mean"], "sum_charge": "sum", "l_orderkey": "count"})
    pdf = total.compute()
    # independent check against plain Spark SQL over the same view
    load_table(spark, SF_SMOKE, "lineitem").createOrReplaceTempView("lineitem_q1")
    want = spark.sql(
        """SELECT l_returnflag, l_linestatus,
                  SUM(l_quantity) l_quantity_sum, AVG(l_quantity) l_quantity_mean,
                  SUM(l_extendedprice*(1-l_discount)*(1+l_tax)) sum_charge,
                  COUNT(l_orderkey) l_orderkey
           FROM lineitem_q1 WHERE l_shipdate < '1998-10-01'
           GROUP BY 1,2 ORDER BY 1,2"""
    ).toPandas()
    assert_matches_oracle(pdf, want, "facade_q1")


def test_facade_query6_scalar_reduction(spark):
    """queries.py:280-327 — including the Series scalar sum dask needs
    workarounds for."""
    li = _lineitem(spark)
    flt = li[
        (li["l_shipdate"] >= "1996-01-01")
        & (li["l_shipdate"] < "1997-01-01")
        & (li["l_discount"] >= 0.05)
        & (li["l_discount"] <= 0.07)
        & (li["l_quantity"] < 24)
    ]
    flt["revenue"] = flt["l_extendedprice"] * flt["l_discount"]
    got = flt["revenue"].sum()
    want = a6(spark, SF_SMOKE).collect()[0]["revenue"]
    assert abs(got - want) < 1.0  # a6 rounds; got is unrounded


def test_facade_merge_suffixes_and_nlargest(spark):
    left = fr.Frame(load_table(spark, SF_SMOKE, "nation"))
    right = fr.Frame(load_table(spark, SF_SMOKE, "region"))
    j = left.merge(right, how="inner", left_on="n_regionkey", right_on="r_regionkey")
    assert len(j) == 25
    top = j.nlargest(3, "n_nationkey").compute()
    assert list(top["n_nationkey"]) == [24, 23, 22]
    # overlapping non-key columns get _x/_y
    dup = left.merge(left, on="n_nationkey")
    assert "n_name_x" in dup.columns and "n_name_y" in dup.columns


def test_facade_str_where_isin_unique(spark):
    part = fr.Frame(load_table(spark, SF_SMOKE, "part"))
    brass = part[part["p_type"].str.startswith("PROMO")]
    assert len(brass) > 0
    part["flagged"] = part["p_brand"].where(part["p_brand"].isin(["Brand#1"]), "other")
    vals = set(part["flagged"].unique())
    assert vals == {"Brand#1", "other"}
    year = part["p_name"].str[0:3]
    assert all(len(v) <= 3 for v in year.unique())


def test_facade_groupby_apply(spark):
    """test_collections.py:163-186 — groupby.apply with explicit schema."""
    ev = fr.Frame(load_table(spark, SF_SMOKE, "events"))

    def span(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"user_id": [pdf.user_id.iloc[0]], "n": [len(pdf)]}
        )

    out = ev.groupby("user_id").apply(span, schema="user_id long, n long")
    pdf = out.compute()
    assert pdf["n"].sum() == len(ev)


def test_facade_concat_dropdup_sort(spark):
    n = fr.Frame(load_table(spark, SF_SMOKE, "nation"))
    doubled = fr.concat([n, n])
    assert len(doubled) == 50
    assert len(doubled.drop_duplicates()) == 25
    s = doubled.drop_duplicates().sort_values("n_name", ascending=False).compute()
    assert s["n_name"].iloc[0] == "NATION_9"  # string sort, unavailable in dask ref


def test_delimited_reader_roundtrip(spark, tmp_path):
    """Write nation as dbgen-style .tbl (trailing |), read via the
    loaddata.py-mirror reader, compare to the parquet truth."""
    truth = load_table(spark, SF_SMOKE, "nation").toPandas()
    tbl = tmp_path / "nation.tbl"
    with open(tbl, "w") as fh:
        for r in truth.itertuples(index=False):
            fh.write(f"{r.n_nationkey}|{r.n_name}|{r.n_regionkey}|no comment|\n")
    got = readers.read_delimited(spark, str(tbl), "nation").toPandas()
    assert list(got.columns) == ["n_nationkey", "n_name", "n_regionkey", "n_comment"]
    merged = got[["n_nationkey", "n_name", "n_regionkey"]].sort_values("n_nationkey")
    assert merged.reset_index(drop=True).equals(
        truth.sort_values("n_nationkey").reset_index(drop=True)
    )


def test_timeseries_source(spark):
    ts = readers.timeseries(spark, "2000-01-01", "2000-01-01 00:01:00", freq_seconds=1)
    pdf = ts.toPandas()
    assert len(pdf) == 60
    assert set(pdf.columns) == {"timestamp", "id", "name", "x", "y"}
    assert pdf["x"].between(-1, 1).all()


def test_set_index_loc_matches_pandas(spark):
    """set_index + .loc label slice vs pandas (reference
    test_collections.py:117-160 idioms)."""
    import pandas as pd

    pdf = pd.DataFrame({"k": [9, 3, 7, 1, 5, 3], "v": list("abcdef")})
    fr_ = fr.Frame(spark.createDataFrame(pdf)).set_index("k")
    got = fr_.loc[3:7].compute().sort_values(["k", "v"]).reset_index(drop=True)
    exp = (
        pdf.set_index("k").sort_index().loc[3:7].reset_index()
        .sort_values(["k", "v"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)
    # scalar label and open-ended slices
    assert sorted(r["v"] for r in fr_.loc[3].df.collect()) == ["b", "f"]
    assert {r["k"] for r in fr_.loc[7:].df.collect()} == {7, 9}
    # the range shuffle actually landed: keys are globally ordered
    # across partitions after set_index
    ks = [r["k"] for r in fr_.df.collect()]
    assert ks == sorted(ks)


def test_set_index_requires_index_for_loc(spark):
    import pytest as _pytest

    fr_ = fr.Frame(spark.range(3))
    with _pytest.raises(TypeError):
        fr_.loc[1:2]


def test_bag_analog(spark):
    """dask.bag → RDD mapping (reference test_collections.py:109-113:
    map, count, per-key fold)."""
    from dask_distributed_vanilla_spark.bag import Bag

    b = Bag.from_sequence(spark, range(100), npartitions=8).map(lambda x: x * 2)
    assert b.count() == 100
    odd_even = dict(
        b.foldby(lambda x: x % 4, lambda acc, x: acc + x, 0).compute()
    )
    assert odd_even == {0: sum(x * 2 for x in range(0, 100, 2)),
                        2: sum(x * 2 for x in range(1, 100, 2))}
    freqs = dict(Bag.from_sequence(spark, list("aabbbc")).frequencies().compute())
    assert freqs == {"a": 2, "b": 3, "c": 1}
    # non-additive binop: cross-partition partials must merge with the
    # binop (dask's combine default), not a hardcoded a+b
    maxes = dict(
        Bag.from_sequence(spark, range(100), npartitions=8).foldby(
            lambda x: x % 3, max, 0
        ).compute()
    )
    assert maxes == {0: 99, 1: 97, 2: 98}
    # distinct combine: binop folds elements into a set, combine unions
    sets = dict(
        Bag.from_sequence(spark, [1, 1, 2, 5, 5, 8], npartitions=3).foldby(
            lambda x: x % 2,
            lambda acc, x: acc | {x},
            frozenset(),
            combine=lambda a, b: a | b,
        ).compute()
    )
    assert sets == {0: {2, 8}, 1: {1, 5}}
    df = b.map(lambda x: (x,)).to_dataframe(spark, "x long")
    assert df.agg({"x": "sum"}).collect()[0][0] == sum(range(0, 200, 2))


def test_read_json_roundtrip(spark, tmp_path):
    """JSON-lines source: write → read with declared schema → identical."""
    df = spark.range(100).selectExpr("id", "concat('u', id % 7) AS name", "CAST(id * 1.5 AS DOUBLE) AS score")
    path = str(tmp_path / "j")
    df.write.json(path)
    back = readers.read_json(spark, path, "id long, name string, score double")
    assert back.count() == 100
    assert sorted(back.columns) == ["id", "name", "score"]
    got = {r["id"]: (r["name"], r["score"]) for r in back.collect()}
    exp = {r["id"]: (r["name"], r["score"]) for r in df.collect()}
    assert got == exp


def test_sample_and_random_split(spark):
    """sample(frac) hits the requested fraction (Bernoulli tolerance) and
    is reproducible under a seed; random_split partitions rows into
    disjoint, exhaustive frames."""
    from dask_distributed_vanilla_spark.frame import Frame

    fr = Frame(spark.range(10_000).selectExpr("id", "id % 7 AS g"))
    s = fr.sample(0.2, random_state=42)
    n = len(s)
    assert 1600 < n < 2400
    assert len(fr.sample(0.2, random_state=42)) == n  # seeded → reproducible

    train, test = fr.random_split([0.8, 0.2], random_state=7)
    ids_train = {r.id for r in train.df.collect()}
    ids_test = {r.id for r in test.df.collect()}
    assert ids_train.isdisjoint(ids_test)
    assert len(ids_train) + len(ids_test) == 10_000
    assert 7000 < len(ids_train) < 9000


def test_python_datasource_dbgen_tbl(spark, tmp_path):
    """The user-defined Python DataSource reads dbgen shards with one
    task per file and matches the JVM csv fast path row-for-row
    (including trailing-separator and empty-field→NULL handling)."""
    from dask_distributed_vanilla_spark.sources import pyds

    if not pyds.HAVE_DATASOURCE_API:
        import pytest

        pytest.skip("DataSource API requires Spark >= 4.0")

    shard1 = tmp_path / "nation.tbl.1"
    shard1.write_text(
        "0|ALGERIA|0|haggle carefully|\n"
        "1|ARGENTINA|1||\n"  # empty comment -> NULL
        "2|BRAZIL|1|quick deposits|\n"
    )
    shard2 = tmp_path / "nation.tbl.2"
    shard2.write_text(
        "3|CANADA|1|silent packages|\n"
        "4|EGYPT|4|furious ideas|\n"
    )

    spark.dataSource.register(pyds.DbgenTblDataSource)
    via_pyds = (
        spark.read.format("dbgen_tbl")
        .option("table", "nation")
        .load(str(tmp_path / "nation.tbl.*"))
    )
    via_jvm = readers.read_delimited(spark, str(tmp_path / "nation.tbl.*"), "nation")

    got = sorted(map(tuple, via_pyds.collect()))
    want = sorted(map(tuple, via_jvm.collect()))
    assert got == want and len(got) == 5
    assert got[1][3] is None  # empty field parsed as NULL
    # one input partition per shard — the parallelism contract
    assert via_pyds.rdd.getNumPartitions() == 2


def test_json_malformed_record_contract(spark, tmp_path):
    """PERMISSIVE quarantines the raw bad line into the corrupt column,
    DROPMALFORMED removes it, FAILFAST raises — the dead-letter
    routing contract for dirty crawl dumps."""
    import pytest

    from dask_distributed_vanilla_spark.sources.readers import read_json

    p = tmp_path / "dirty.jsonl"
    p.write_text('{"a": 1, "b": "x"}\n{oops not json\n{"a": 3, "b": "z"}\n')
    schema = "a long, b string, _bad string"

    rows = read_json(
        spark, str(p), schema=schema, corrupt_column="_bad"
    ).collect()
    assert len(rows) == 3
    bad = [r for r in rows if r._bad is not None]
    assert len(bad) == 1 and bad[0]._bad.startswith("{oops")
    assert sorted(r.a for r in rows if r.a is not None) == [1, 3]

    kept = read_json(spark, str(p), schema="a long, b string", mode="DROPMALFORMED")
    assert kept.count() == 2

    with pytest.raises(Exception) as ei:
        read_json(spark, str(p), schema="a long, b string", mode="FAILFAST").collect()
    assert "Malformed" in str(ei.value) or "FAILFAST" in str(ei.value)


def test_udtf_chunker_equals_explode_plan(spark):
    """The Python UDTF twin must be row-for-row identical to the
    explode-based doc_chunks plan — the API-surface escape hatch with
    the JVM plan pinned as its documented fast path."""
    from dask_distributed_vanilla_spark.functions.udtfs import chunk_documents_udtf
    from dask_distributed_vanilla_spark.operators.curation import doc_chunks
    from tests.conftest import SF_SMOKE

    from dask_distributed_vanilla_spark.catalog import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    got = sorted(
        (r.doc_id, r.chunk_idx, r.n_tokens, r.chunk_text)
        for r in chunk_documents_udtf(spark, docs).collect()
    )
    want = sorted(
        (r.doc_id, r.chunk_idx, r.n_tokens, r.chunk_text)
        for r in doc_chunks(spark, SF_SMOKE).collect()
    )
    assert got == want and len(got) > 0


def test_pandas_api_on_spark_parity(spark):
    """pyspark.pandas runs the reference's pandas-style idiom directly
    (groupby-agg-sort, Q1 shape) and must agree with the DataFrame-API
    plan — a dask user can port either to the facade or to the
    first-party pandas API."""
    import pyspark.pandas as ps
    from pyspark.sql import functions as F

    from dask_distributed_vanilla_spark.catalog import load_table
    from tests.conftest import SF_SMOKE

    li = load_table(spark, SF_SMOKE, "lineitem")
    psdf = li.pandas_api()
    got = (
        psdf[psdf.l_quantity < 24]
        .groupby("l_returnflag")
        .agg(n=("l_orderkey", "count"), qty=("l_quantity", "sum"))
        .sort_index()
    )
    want = {
        r.l_returnflag: (r.n, r.qty)
        for r in li.where("l_quantity < 24")
        .groupBy("l_returnflag")
        .agg(F.count("l_orderkey").alias("n"), F.sum("l_quantity").alias("qty"))
        .collect()
    }
    got_pd = got.to_pandas()
    assert set(got_pd.index) == set(want)
    for flag, row in got_pd.iterrows():
        assert (int(row["n"]), float(row["qty"])) == (want[flag][0], float(want[flag][1]))


def test_bag_topk_distinct_pluck(spark):
    from dask_distributed_vanilla_spark.bag import Bag

    b = Bag.from_sequence(spark, [3, 1, 4, 1, 5, 9, 2, 6, 5], npartitions=3)
    assert b.topk(3) == [9, 6, 5]
    assert b.topk(2, key=lambda x: -x) == [1, 1]
    assert sorted(b.distinct().compute()) == [1, 2, 3, 4, 5, 6, 9]
    recs = Bag.from_sequence(spark, [{"k": "a"}, {"k": "b"}], npartitions=2)
    assert sorted(recs.pluck("k").compute()) == ["a", "b"]


def test_observe_metrics_accumulate(spark):
    """df.observe collects named metrics during the action itself — the
    free row-level observability hook a pipeline attaches to production
    scans (no second pass over the data)."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from dask_distributed_vanilla_spark.catalog import load_table
    from tests.conftest import SF_SMOKE

    obs = Observation("scan_stats")
    li = load_table(spark, SF_SMOKE, "lineitem").observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum(F.when(F.col("l_quantity") > 49, 1).otherwise(0)).alias("suspect"),
    )
    n = li.where("l_quantity <= 50").count()
    got = obs.get
    assert got["rows_seen"] >= n
    assert got["suspect"] >= 0


def test_frame_pandas_tail_methods(spark):
    """fillna/dropna/query/assign/nsmallest + Series isna/value_counts —
    the long tail of pandas idioms a dask port leans on."""
    import pandas as pd

    from dask_distributed_vanilla_spark import frame as fr

    pdf = pd.DataFrame(
        {"a": [1.0, None, 3.0, 4.0], "b": ["x", "y", None, "y"], "c": [10, 20, 30, 40]}
    )
    f = fr.Frame(spark.createDataFrame(pdf))
    assert f.fillna(0.0)["a"].sum() == 8.0
    assert len(f.dropna(subset=["a"])) == 3
    assert len(f.query("c >= 20 and a is not null")) == 2
    got = f.assign(d=lambda x: x["c"] * 2).compute()
    assert sorted(got.d) == [20, 40, 60, 80]
    assert f.nsmallest(2, "c").compute().c.tolist() == [10, 20]
    assert f["a"].isna().to_frame("m").compute().m.sum() == 1
    vc = f["b"].value_counts()
    assert vc["y"] == 2


def test_text_and_binary_file_sources(spark, tmp_path):
    """text (line + wholetext) and binaryFile ingest: binaryFile's
    metadata predicate prunes by length before content reads, and the
    content column round-trips bytes exactly — the multimodal corpus
    ingest contract."""
    from dask_distributed_vanilla_spark.sources.readers import (
        read_binary_files,
        read_text,
    )

    (tmp_path / "a.txt").write_text("line1\nline2\n")
    (tmp_path / "b.txt").write_text("solo\n")
    (tmp_path / "c.bin").write_bytes(b"\x00\x01\xffpayload")

    lines = read_text(spark, str(tmp_path / "*.txt"))
    assert sorted(r.value for r in lines.collect()) == ["line1", "line2", "solo"]
    whole = read_text(spark, str(tmp_path / "a.txt"), whole=True)
    assert whole.collect()[0].value == "line1\nline2\n"

    bins = read_binary_files(spark, str(tmp_path), glob="*.bin")
    rows = bins.collect()
    assert len(rows) == 1 and bytes(rows[0].content) == b"\x00\x01\xffpayload"
    small = read_binary_files(spark, str(tmp_path)).where("length < 6")
    assert {r.path.rsplit("/", 1)[-1] for r in small.collect()} == {"b.txt"}


def test_parquet_zstd_compression_codec(spark, tmp_path):
    """Writers accept per-write codecs; zstd round-trips and actually
    compresses the repetitive column (the 100 TB storage-bill knob)."""
    import os

    from dask_distributed_vanilla_spark.catalog import load_table
    from tests.conftest import SF_SMOKE

    li = load_table(spark, SF_SMOKE, "lineitem").select("l_returnflag", "l_linestatus")
    p_none = str(tmp_path / "none")
    p_zstd = str(tmp_path / "zstd")
    li.coalesce(1).write.option("compression", "uncompressed").parquet(p_none)
    li.coalesce(1).write.option("compression", "zstd").parquet(p_zstd)

    def total(d):
        return sum(
            os.path.getsize(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    assert total(p_zstd) < total(p_none)
    assert spark.read.parquet(p_zstd).count() == li.count()


def test_frame_describe(spark):
    from dask_distributed_vanilla_spark import frame as fr
    from dask_distributed_vanilla_spark.catalog import load_table
    from tests.conftest import SF_SMOKE

    f = fr.Frame(load_table(spark, SF_SMOKE, "nation"))
    d = f.describe()
    assert "summary" in d.columns and len(d) == 5


def test_python_streaming_datasource_offsets(spark, tmp_path):
    """A user-defined STREAMING Python DataSource: checkpointed dict
    offsets drive exactly-once batches, and a restart from the same
    checkpoint resumes at the committed offset instead of re-emitting."""
    import time

    from dask_distributed_vanilla_spark.sources.pyds import (
        HAVE_STREAM_DATASOURCE_API,
        CounterStreamDataSource,
    )

    if not HAVE_STREAM_DATASOURCE_API:
        import pytest

        pytest.skip("streaming DataSource API absent on this build")

    spark.dataSource.register(CounterStreamDataSource)
    sink = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_batches(target_batch_id):
        # batchId CONTINUES across a checkpoint restart, so the caller
        # passes an absolute target — waiting for a fixed count after
        # restart would be satisfied by the very first progress report
        # and the query could stop before any NEW batch commits.
        q = (
            spark.readStream.format("pycounter")
            .option("rows_per_batch", "5")
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        deadline = time.time() + 60
        last = -1
        while time.time() < deadline:
            p = q.lastProgress
            if p:
                last = p["batchId"]
                if last >= target_batch_id:
                    break
            time.sleep(0.5)
        q.stop()
        q.awaitTermination()
        return last

    first_last = run_batches(3)
    n1 = spark.read.parquet(sink).count()
    assert n1 >= 15  # ≥3 committed batches of 5
    ids = sorted(r["id"] for r in spark.read.parquet(sink).collect())
    assert ids == list(range(len(ids)))  # contiguous, no gaps/dupes

    run_batches(first_last + 2)  # restart: ≥2 batches BEYOND run 1's last
    ids2 = sorted(r["id"] for r in spark.read.parquet(sink).collect())
    assert ids2 == list(range(len(ids2)))  # resumed, still exactly-once
    assert len(ids2) > len(ids)
