"""The composed curation pipeline + canonicalizer edge cases."""

from __future__ import annotations

import pandas as pd

from dask_distributed_vanilla_spark.operators.dedup import dedup_minhash_lsh
from dask_distributed_vanilla_spark.pipeline import curate
from dask_distributed_vanilla_spark.plans.canonical import canonical, frames_equal
from tests.conftest import SF_SMOKE


def test_curate_pipeline(spark, tmp_path):
    out = str(tmp_path / "curated")
    curated = curate(spark, SF_SMOKE, out, min_quality=0.3)
    rows = curated.collect()
    assert rows, "pipeline should keep some documents"
    assert all(r.quality >= 0.3 and r.pred_lang == "en" for r in rows)
    # near-dup losers must be gone
    losers = {r.doc_b for r in dedup_minhash_lsh(spark, SF_SMOKE).collect()}
    kept = {r.doc_id for r in rows}
    assert not (losers & kept)
    # partitioned lake readable with pruning column
    back = spark.read.parquet(out)
    assert back.count() == len(rows)
    assert "pred_lang" in back.columns


def test_canonical_rounding_and_order_insensitivity():
    a = pd.DataFrame({"x": [1.0, 2.0], "name": ["a", "b"]})
    b = pd.DataFrame({"name": ["b", "a"], "x": [2.0, 1.0]})  # rows+cols permuted
    assert frames_equal(a, b)
    # float rendering: %.2f fixed decimals
    schema, h1 = canonical(pd.DataFrame({"v": [0.1 + 0.2]}))
    _, h2 = canonical(pd.DataFrame({"v": [0.30]}))
    assert h1 == h2
    assert schema == "v:float64"
    # NaN renders empty, not 'nan'
    _, h3 = canonical(pd.DataFrame({"v": [float("nan")]}))
    _, h4 = canonical(pd.DataFrame({"v": [None]}, dtype="float64"))
    assert h3 == h4


def test_canonical_datetime_unit_erasure():
    a = pd.DataFrame({"t": pd.to_datetime(["2020-01-01 12:00:00"])})
    b = a.copy()
    b["t"] = b["t"].astype("datetime64[us]")
    a["t"] = a["t"].astype("datetime64[ns]")
    assert frames_equal(a, b)


def test_incremental_curation_loop_over_versioned_table(spark, tmp_path):
    """End-to-end incremental ingestion: batches append to a versioned
    table, each new delta is read via the CDC feed and deduped against
    the standing corpus by content digest BEFORE landing — the
    continuous-ingest loop the batch operators (dedup_incremental) and
    the storage layer (sources/versioned.py) exist to serve."""
    from pyspark.sql import functions as F

    from dask_distributed_vanilla_spark.sources.versioned import (
        latest_version,
        read_appended,
        read_versioned,
        write_append,
    )

    path = str(tmp_path / "corpus")

    def digested(rows):
        return spark.createDataFrame(rows, "doc_id long, text string").select(
            "doc_id", "text", F.md5("text").alias("digest")
        )

    # batch 1: all novel
    write_append(digested([(1, "alpha"), (2, "beta"), (3, "gamma")]), path)
    v1 = latest_version(path)

    # batch 2 arrives with one exact dup of the corpus and one internal dup
    incoming = digested([(4, "beta"), (5, "delta"), (6, "delta")])
    corpus_digests = read_versioned(spark, path).select("digest").distinct()
    survivors = (
        incoming.join(corpus_digests, "digest", "left_anti")
        .dropDuplicates(["digest"])  # keep one per in-batch digest
    )
    write_append(survivors, path)

    # the CDC feed for downstream consumers carries exactly the survivors
    delta = read_appended(spark, path, since_version=v1)
    assert sorted(r.text for r in delta.collect()) == ["delta"]
    # corpus state: no digest appears twice
    final = read_versioned(spark, path)
    assert final.count() == 4
    assert final.select("digest").distinct().count() == 4
