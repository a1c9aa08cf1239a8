"""Library-backed scale-path variants: seeded but not oracle-hashable
(pyspark.ml hash families / kmeans), so tested for recall against the
exact handwritten operators instead."""

from __future__ import annotations

from dask_distributed_vanilla_spark.operators.dedup import dedup_ngram_jaccard, ml_minhash_pairs
from dask_distributed_vanilla_spark.operators.multimodal import frame_sample
from dask_distributed_vanilla_spark.operators.similarity import ann_cosine_topk, ivf_kmeans_search
from tests.conftest import SF_SMOKE


def test_ml_minhash_recall(spark):
    exact = {
        (r.doc_a, r.doc_b) for r in dedup_ngram_jaccard(spark, SF_SMOKE).collect()
    }
    approx = {(r.doc_a, r.doc_b) for r in ml_minhash_pairs(spark, SF_SMOKE, 0.5).collect()}
    assert exact, "fixture should contain planted near-dup pairs"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"MinHashLSH recall {recall:.2f} vs exact pairs"


def test_ivf_kmeans_recall(spark):
    exact = {
        (r.query_id, r.neighbor_id) for r in ann_cosine_topk(spark, SF_SMOKE).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in ivf_kmeans_search(spark, SF_SMOKE, n_clusters=4, n_probe=2).collect()
    }
    recall = len(exact & ivf) / len(exact)
    # coarse quantizer on random-ish vectors: expect partial but real recall
    assert recall >= 0.3, f"IVF recall {recall:.2f}"


def test_frame_sample_shape(spark):
    rows = frame_sample(spark, SF_SMOKE, every_nth=10).limit(50).collect()
    assert rows and all(r.frame_idx % 10 == 0 for r in rows)
