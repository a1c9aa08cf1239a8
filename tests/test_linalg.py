"""Array/linalg parity vs numpy at miniature scale (the reference's
benchmark surface: matmul, TSQR SVD, randomized square SVD, kmeans,
broadcast-model predict)."""

from __future__ import annotations

import numpy as np
import pytest

from dask_distributed_vanilla_spark import linalg
from dask_distributed_vanilla_spark.catalog import load_table
from tests.conftest import SF_SMOKE


def test_block_matmul_matches_numpy(spark):
    a = linalg.random_block_matrix(spark, 60, 40, chunk=16, seed=1)
    b = linalg.random_block_matrix(spark, 40, 24, chunk=16, seed=2)
    got = linalg.collect_matrix(linalg.block_matmul(a, b))
    want = linalg.collect_matrix(a) @ linalg.collect_matrix(b)
    np.testing.assert_allclose(got, want, rtol=1e-10)
    # blockwise grid plan (non-square grid: 4×3 contraction over k=3)
    got_grid = linalg.collect_matrix(linalg.block_matmul(a, b, grid=(4, 3, 2)))
    np.testing.assert_allclose(got_grid, want, rtol=1e-10)


def test_matmul_broadcast_matches_numpy(spark):
    rng = np.random.RandomState(3)
    b_local = rng.random_sample((40, 24))
    panels = linalg.random_row_panels(spark, 60, 40, panel_rows=16, seed=1)
    a_local = np.vstack([p for _, p in sorted(panels.collect())])
    got = np.vstack(
        [p for _, p in sorted(linalg.matmul_broadcast(spark, panels, b_local).collect())]
    )
    np.testing.assert_allclose(got, a_local @ b_local, rtol=1e-10)


def test_matmul_broadcast_staged_matches_numpy(spark, tmp_path):
    """The shared-storage build side: B staged as ONE .npy written
    slice-wise by executor tasks (ragged last panel included), mmapped
    read-only per worker, one dgemm per A panel — must equal the
    driver-broadcast path bit-for-bit."""
    b_path = str(tmp_path / "b.npy")
    b_panels = linalg.random_row_panels(spark, 40, 24, panel_rows=16, seed=2)
    n_panels = linalg.stage_matrix(b_panels, b_path, (40, 24), panel_rows=16)
    assert n_panels == 3
    b_local = np.vstack([p for _, p in sorted(b_panels.collect())])
    np.testing.assert_array_equal(np.load(b_path), b_local)
    a_panels = linalg.random_row_panels(spark, 60, 40, panel_rows=16, seed=1)
    a_local = np.vstack([p for _, p in sorted(a_panels.collect())])
    got = np.vstack(
        [
            p
            for _, p in sorted(
                # blas_threads exercises the runtime OpenBLAS override
                # (set + restore); results must be unaffected by it
                linalg.matmul_broadcast_staged(
                    a_panels, b_path, blas_threads=2
                ).collect()
            )
        ]
    )
    np.testing.assert_allclose(got, a_local @ b_local, rtol=1e-10)


def test_stage_matrix_edge_shapes(spark, tmp_path):
    """Contract edges of the slice-wise writer: a matrix smaller than
    one panel (single writer covers the whole file) and a 1-row B —
    both must round-trip exactly and multiply correctly."""
    one_panel = str(tmp_path / "one.npy")
    panels = linalg.random_row_panels(spark, 5, 7, panel_rows=16, seed=4)
    assert linalg.stage_matrix(panels, one_panel, (5, 7), panel_rows=16) == 1
    np.testing.assert_array_equal(
        np.load(one_panel), np.vstack([p for _, p in sorted(panels.collect())])
    )

    one_row = str(tmp_path / "row.npy")
    rpan = linalg.random_row_panels(spark, 1, 3, panel_rows=1, seed=5)
    assert linalg.stage_matrix(rpan, one_row, (1, 3), panel_rows=1) == 1
    b_local = np.load(one_row)
    a_panels = linalg.random_row_panels(spark, 4, 1, panel_rows=2, seed=6)
    a_local = np.vstack([p for _, p in sorted(a_panels.collect())])
    got = np.vstack(
        [p for _, p in sorted(linalg.matmul_broadcast_staged(a_panels, one_row).collect())]
    )
    np.testing.assert_allclose(got, a_local @ b_local, rtol=1e-12)


def test_tsqr_svd_tall_skinny(spark):
    rng = np.random.RandomState(0)
    mat = rng.random_sample((300, 8))
    rows = spark.sparkContext.parallelize(list(mat), 6)
    s, vt = linalg.svd_tall_skinny(rows, n_cols=8)
    np.testing.assert_allclose(s, np.linalg.svd(mat, compute_uv=False), rtol=1e-8)
    # U path reconstructs A
    u, s2, vt2 = linalg.svd_tall_skinny(rows, n_cols=8, compute_u=True)
    u_mat = np.array(u.collect())
    np.testing.assert_allclose(u_mat @ np.diag(s2) @ vt2, mat, atol=1e-8)


def test_tsqr_svd_panels_matches_rowwise(spark):
    """svd_tall_skinny_panels is the panel-layout twin of the row RDD
    path (added because row-at-a-time pickling dominated at 1M×2,048):
    identical singular values from either entry point."""
    rng = np.random.RandomState(7)
    mat = rng.random_sample((320, 12))
    panels = spark.sparkContext.parallelize(
        [(i, mat[i * 40 : (i + 1) * 40]) for i in range(8)], 8
    )
    s, vt = linalg.svd_tall_skinny_panels(panels)
    np.testing.assert_allclose(s, np.linalg.svd(mat, compute_uv=False), rtol=1e-8)
    assert vt.shape == (12, 12)


def test_svd_compressed_square(spark):
    # low-rank square matrix: randomized SVD recovers leading spectrum
    rng = np.random.RandomState(0)
    base = rng.random_sample((64, 5)) @ rng.random_sample((5, 64))
    chunk = 16
    blocks = [
        ((i, j), base[i * chunk : (i + 1) * chunk, j * chunk : (j + 1) * chunk])
        for i in range(4)
        for j in range(4)
    ]
    rdd = spark.sparkContext.parallelize(blocks, 8)
    s, vt = linalg.svd_compressed(rdd, (64, 64), chunk, k=5, seed=3)
    np.testing.assert_allclose(
        s, np.linalg.svd(base, compute_uv=False)[:5], rtol=1e-6
    )


def test_kmeans_fit_predict(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    model = linalg.kmeans_fit(emb, k=3)
    assert len(model.clusterCenters()) == 3


class _ThresholdModel:
    """Stand-in for a fitted sklearn-style estimator."""

    def predict(self, x: np.ndarray) -> np.ndarray:
        return (x.mean(axis=1) > 0).astype(float)


def test_parallel_post_fit_predict(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    out = linalg.parallel_post_fit_predict(spark, _ThresholdModel(), emb)
    rows = out.collect()
    assert len(rows) == emb.count()
    assert set(out.columns) == {"vec_id", "prediction"}
    assert all(r.prediction in (0.0, 1.0) for r in rows)


def test_sparse_map_blocks(spark):
    """map_blocks(COO) parity with the reference's sparse chunk workflow
    (test_collections.py:191-200): sparsify per block, reduce, round-trip."""
    import numpy as np

    from dask_distributed_vanilla_spark.linalg import COO, map_blocks, random_block_matrix

    blocks = random_block_matrix(spark, 512, 512, 128, seed=7)
    # threshold to make it genuinely sparse, then sum via scalar shuffle
    sparse_blocks = map_blocks(blocks, lambda b: COO.from_dense(b * (b > 0.9)))
    total = sparse_blocks.map(lambda kv: kv[1].sum()).sum()
    dense_total = blocks.map(lambda kv: float((kv[1] * (kv[1] > 0.9)).sum())).sum()
    assert abs(total - dense_total) < 1e-6
    # round-trip one block exactly
    (coord, coo) = sparse_blocks.first()
    dense = dict(blocks.collect())[coord]
    np.testing.assert_allclose(coo.todense(), dense * (dense > 0.9))
    assert 0 < coo.nnz < dense.size
    # elementwise scalar op stays sparse
    doubled = map_blocks(sparse_blocks, lambda c: c.multiply(2.0))
    assert abs(doubled.map(lambda kv: kv[1].sum()).sum() - 2 * total) < 1e-6


def test_staged_cache_invalidates_on_restage(spark, tmp_path):
    """The (path, mtime_ns, size)-keyed memmap cache (_open_staged):
    re-staging NEW same-shape contents at a REUSED path must yield a
    fresh mapping, not the stale matrix — in this driver process
    directly, and through reused executor python workers end-to-end.
    (Unique paths remain the preferred lifecycle; this pins the
    documented reused-path fallback on an ns-mtime filesystem.)"""
    b_path = str(tmp_path / "reused.npy")
    p1 = linalg.random_row_panels(spark, 32, 8, panel_rows=16, seed=11)
    linalg.stage_matrix(p1, b_path, (32, 8), panel_rows=16)
    b1 = np.vstack([p for _, p in sorted(p1.collect())])
    first = linalg._open_staged(b_path)
    np.testing.assert_array_equal(np.asarray(first), b1)
    assert linalg._open_staged(b_path) is first  # same stat → cache hit

    a_panels = linalg.random_row_panels(spark, 48, 32, panel_rows=16, seed=13)
    a_local = np.vstack([p for _, p in sorted(a_panels.collect())])
    got1 = np.vstack(
        [p for _, p in sorted(linalg.matmul_broadcast_staged(a_panels, b_path).collect())]
    )
    np.testing.assert_allclose(got1, a_local @ b1, rtol=1e-10)

    # same path, same size, different contents
    p2 = linalg.random_row_panels(spark, 32, 8, panel_rows=16, seed=12)
    linalg.stage_matrix(p2, b_path, (32, 8), panel_rows=16)
    b2 = np.vstack([p for _, p in sorted(p2.collect())])
    assert not np.array_equal(b1, b2)
    second = linalg._open_staged(b_path)
    assert second is not first
    np.testing.assert_array_equal(np.asarray(second), b2)
    assert len(linalg._STAGED_CACHE) == 1  # stale mapping evicted

    # reused executor workers must also re-mmap (their own cache copies)
    got2 = np.vstack(
        [p for _, p in sorted(linalg.matmul_broadcast_staged(a_panels, b_path).collect())]
    )
    np.testing.assert_allclose(got2, a_local @ b2, rtol=1e-10)
