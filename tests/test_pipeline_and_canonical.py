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
