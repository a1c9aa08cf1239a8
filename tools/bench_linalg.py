"""Linalg benchmark — the reference's array workloads at laptop scale.

The reference benchmarks (BASELINE.md) run 64k×64k matmul / 1M×4k SVD on
a cluster; this harness runs the same algorithms at local[*]-feasible
sizes and prints one JSON line per workload, demonstrating the scaling
shape (block counts, not matrix size, bound per-task memory).

    python tools/bench_linalg.py [--scale small|medium]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")

from dask_distributed_vanilla_spark import linalg
from dask_distributed_vanilla_spark.session import get_spark

SIZES = {
    # (matmul n, chunk), (svd rows, cols, parts), (svd_sq n, chunk, k)
    "small": ((1024, 256), (100_000, 64, 16), (1024, 256, 5)),
    "medium": ((4096, 1024), (500_000, 128, 32), (4096, 1024, 5)),
    # "large" = the per-round 128 GiB / local[32] analogs of the
    # BASELINE.md cluster configs, same algorithms and chunking
    # discipline:
    #   matmul: broadcast plan at 16k×16k (ref matrix_multiplication.py:18-22
    #           is 64k×64k chunk 8k); the general grid-shuffle plan is
    #           recorded at 8k×8k to keep the per-round bench bounded
    #           (16k grid measured 390s — python-object shuffle-bound;
    #           the broadcast plan is the right local[32] plan at 16k)
    #   TSQR   1,048,576×2,048 in 16,384-row chunks — one size step from
    #          round 3's 1,024 cols toward the reference's
    #          1,048,576×4,096 (svd_tall_skinny_matrix.py:21-25)
    #   svd_compressed 16k×16k    (ref svd_square_matrix.py: 16k×16k)
    "large": ((8_192, 2_048), (1_048_576, 2_048, 64), (16_384, 4_096, 5)),
    # "xlarge" = the once-per-session ceiling probe (NOT run per-round;
    # run it as `OMP_NUM_THREADS=4 python tools/bench_linalg.py --scale
    # xlarge`; measured numbers + methodology live in SCALE.md §array
    # ceilings). Probed this session:
    #   - 32,768² GRID matmul is DISK-infeasible here, measured: at
    #     chunk 8,192 the one-shuffle fan-out (bn × |A| × 2 ≈ 69 GB
    #     estimated) reached ~77 GB of scratch before the map stage
    #     finished and would have filled the sandbox's ~80 GB free disk
    #     (random doubles don't lz4-compress). A cluster spreads the
    #     same shuffle across executors' local disks — the chunking is
    #     right, the single-node scratch volume is the binding limit.
    #     xlarge therefore keeps the grid probe at 16,384²/4,096
    #     (~34 GB scratch, measured 390s in round 3).
    #   - 32,768² runs HERE via the zero-shuffle broadcast plan: round
    #     4 measured 1,596s compute (44.1 GFLOPS) + 589s generate/
    #     collect with B an 8.6 GB sc.broadcast to 8 workers (peak RSS
    #     ~113 GB, checksum = analytic n³/4). Round 5's mmap staging
    #     (see BCAST_MATMUL_N below + SCALE.md §array) re-probed it at
    #     **365s compute = 192.7 GFLOPS + 173s staging** — 8-panel ×
    #     4-BLAS-thread concurrency, no driver round-trip, one
    #     physical B per host, checksum = n³/4 again.
    # Remaining BASELINE.md configs exceed the sandbox, not the design:
    #   65,536² matmul: the mmap-staged broadcast plan FITS now (34 GB
    #   B page-cache-shared + 8 × 8.6 GB panels ≈ 103 GB) but is
    #   time-infeasible — 563 TFLOP at the measured 250 GFLOPS is ~40
    #   min of dgemm alone; the grid plan needs ≥ 270 GB of shuffled
    #   blocks vs 80 GB free disk. TSQR 1M×4,096 = 32 GB of rows with
    #   537 MB/chunk QR workspaces × 32 concurrent ≈ the whole heap
    #   once serializer copies are counted.
    # Block counts, not matrix size, bound per-task memory — the same
    # chunking at those sizes fits a 1000-executor cluster unchanged.
    "xlarge": ((16_384, 4_096), (1_048_576, 2_048, 64), (16_384, 4_096, 5)),
}

# broadcast-plan matmul size per scale (one operand staged as a single
# .npy and mmapped read-only by every task, zero shuffle — viable
# whenever B fits a host's page cache). xlarge's 32,768 runs at 8-panel
# concurrency: ONE 8.6 GB page-cached B + 8 × (1.1 GB A panel + 1.1 GB
# C panel) ≈ 26 GB, comfortably inside the 128 GiB box.
BCAST_MATMUL_N = {"small": 1_024, "medium": 4_096, "large": 16_384, "xlarge": 32_768}

# kmeans samples / predict rows per scale (ref kmeans.py:22-28: 10M
# samples, 3 centers; parallelizing_svm.py:23-41: 100M-row predict —
# 20M×8 is the same broadcast-predict shape at sandbox scale)
POINT_SIZES = {
    "small": (200_000, 200_000),
    "medium": (1_000_000, 1_000_000),
    "large": (10_000_000, 20_000_000),
    "xlarge": (10_000_000, 20_000_000),
}


def linalg_workloads(spark, scale: str = "small") -> dict:
    """Run the three array workloads at the given scale; returns the
    per-workload config + seconds dict (also embedded in bench.py's aux)."""
    (mm_n, mm_chunk), (ts_rows, ts_cols, ts_parts), (sq_n, sq_chunk, sq_k) = SIZES[scale]
    results: dict = {}

    t0 = time.perf_counter()
    a = linalg.random_block_matrix(spark, mm_n, mm_n, mm_chunk, seed=1)
    b = linalg.random_block_matrix(spark, mm_n, mm_n, mm_chunk, seed=2)
    bn = (mm_n + mm_chunk - 1) // mm_chunk
    linalg.block_matmul(a, b, grid=(bn, bn, bn)).map(lambda kv: float(kv[1].sum())).sum()
    results["matmul_grid"] = {
        "n": mm_n,
        "chunk": mm_chunk,
        "plan": "grid-shuffle (both operands distributed)",
        "sec": round(time.perf_counter() - t0, 3),
    }

    bc_n = BCAST_MATMUL_N[scale]
    # File-staged broadcast (the round-5 finding, SCALE.md §array): the
    # old driver-broadcast flow (generate B distributed → collect 2 GB →
    # sc.broadcast) paid a SERIAL multi-GB driver round-trip whose cost
    # swung 183→596 s run-to-run with driver-heap state — that was the
    # r03→r04 "regression". B is instead staged as ONE .npy on shared
    # storage, written slice-wise by executor tasks, and every task
    # mmaps it read-only: one page-cached physical copy per host, zero
    # driver bytes, zero per-worker materialization. Measured here at
    # 16,384²: 35 s end-to-end (250 GFLOPS) vs 298 s for the r04 driver
    # broadcast and 384 s for a per-worker private-copy variant (this
    # sandbox faults fresh pages at ~10 MB/s/worker — instrumented
    # per-task: 332 s load + 70 s dgemm; the mmap opens in 0.0 s).
    # blas_threads: PySpark pins worker OMP_NUM_THREADS to
    # spark.task.cpus (= 1); at 8-task concurrency that strands 24 of 32
    # cores mid-dgemm. Hand each task cores/concurrency threads for the
    # dgemm only (linalg sets and restores around the call, so the
    # suite's 32-way stages keep the 1-thread pin).
    bc_a_panels = 8
    n_cpus = spark.sparkContext.defaultParallelism
    stage_dir = tempfile.mkdtemp(prefix="bstage_")
    b_path = f"{stage_dir}/b.npy"
    t0 = time.perf_counter()
    n_staged = linalg.stage_matrix(
        linalg.random_row_panels(spark, bc_n, bc_n, max(bc_n // 8, 256), seed=7),
        b_path,
        (bc_n, bc_n),
        max(bc_n // 8, 256),
    )
    t_stage = time.perf_counter() - t0
    t0 = time.perf_counter()
    panels = linalg.random_row_panels(
        spark, bc_n, bc_n, max(bc_n // bc_a_panels, 256), seed=8
    )
    linalg.matmul_broadcast_staged(
        panels, b_path, blas_threads=max(1, n_cpus // bc_a_panels)
    ).map(lambda kv: float(kv[1].sum())).sum()
    elapsed = time.perf_counter() - t0
    results["matmul_broadcast"] = {
        "n": bc_n,
        "plan": "file-staged mmap broadcast (executor-side build), zero shuffle",
        "b_panels_staged": n_staged,
        "stage_sec": round(t_stage, 3),
        "sec": round(elapsed, 3),
        "gflops": round(2 * bc_n**3 / 1e9 / elapsed, 1),
    }
    shutil.rmtree(stage_dir, ignore_errors=True)

    # the driver-broadcast path, kept measured at a size where its
    # round-trip is benign (B = 128 MB) so the two build sides stay
    # comparable round-over-round
    drv_n = min(bc_n, 4_096)
    t0 = time.perf_counter()
    b_local = np.vstack(
        [
            p
            for _, p in sorted(
                linalg.random_row_panels(
                    spark, drv_n, drv_n, max(drv_n // 4, 256), seed=7
                ).collect()
            )
        ]
    )
    t_gen = time.perf_counter() - t0
    t0 = time.perf_counter()
    panels = linalg.random_row_panels(spark, drv_n, drv_n, max(drv_n // 4, 256), seed=8)
    linalg.matmul_broadcast(spark, panels, b_local).map(
        lambda kv: float(kv[1].sum())
    ).sum()
    elapsed = time.perf_counter() - t0
    results["matmul_broadcast_driver"] = {
        "n": drv_n,
        "plan": "driver sc.broadcast build side (comparison row)",
        "gen_collect_sec": round(t_gen, 3),
        "sec": round(elapsed, 3),
        "gflops": round(2 * drv_n**3 / 1e9 / elapsed, 1),
    }

    t0 = time.perf_counter()
    # panel layout, not exploded rows: the row-at-a-time RDD pickles one
    # object per matrix row and at 1M×2,048 that serialization dominates
    # (measured 340s row-wise vs ~60s as panels, identical algorithm)
    panels = linalg.random_row_panels(
        spark, ts_rows, ts_cols, ts_rows // ts_parts, seed=42
    )
    s, _ = linalg.svd_tall_skinny_panels(panels)
    results["svd_tall_skinny"] = {
        "rows": ts_rows,
        "cols": ts_cols,
        "layout": "row panels",
        "sec": round(time.perf_counter() - t0, 3),
        "s_max": round(float(s[0]), 2),
    }

    t0 = time.perf_counter()
    blocks = linalg.random_block_matrix(spark, sq_n, sq_n, sq_chunk, seed=3)
    s, _ = linalg.svd_compressed(blocks, (sq_n, sq_n), sq_chunk, k=sq_k, seed=4)
    results["svd_compressed"] = {
        "n": sq_n,
        "k": sq_k,
        "sec": round(time.perf_counter() - t0, 3),
        "s_max": round(float(s[0]), 2),
    }

    # kmeans (reference benchmark/kmeans.py: 10M samples, 3 clusters) at
    # local scale: 3 planted separable clusters, scalable k-means|| fit
    from pyspark.sql import functions as F

    km_n, svm_n = POINT_SIZES[scale]
    km_dim = 8
    t0 = time.perf_counter()
    pts = spark.range(km_n).select(
        F.array(
            *[(F.rand(seed=i) + (F.col("id") % 3).cast("double") * 3.0) for i in range(km_dim)]
        ).alias("embedding")
    )
    model = linalg.kmeans_fit(pts, k=3, seed=11)
    results["kmeans"] = {
        "samples": km_n,
        "dim": km_dim,
        "k": 3,
        "sec": round(time.perf_counter() - t0, 3),
    }

    # ParallelPostFit predict (reference parallelizing_svm.py:23-41):
    # single-node fit, broadcast-model distributed predict over Arrow
    # batches — timed on the predict side, which is the scaled part
    rng = np.random.RandomState(0)
    x_fit = rng.random_sample((2_000, km_dim))
    y_fit = (x_fit.sum(axis=1) > km_dim / 2).astype(int)
    try:
        from sklearn.svm import SVC  # the reference's model class

        clf = SVC(gamma="scale").fit(x_fit, y_fit)
    except ImportError:  # container has no sklearn — any .predict works
        clf = linalg.LeastSquaresModel.fit(x_fit, y_fit)
    xs = (
        spark.range(svm_n)
        .select(
            F.col("id"),
            F.array(*[F.rand(seed=100 + i) for i in range(km_dim)]).alias("embedding"),
        )
        .persist()
    )
    xs.count()  # materialize input outside the timed window
    t0 = time.perf_counter()
    pred = linalg.parallel_post_fit_predict(spark, clf, xs)
    n_pos = pred.agg(F.sum("prediction")).collect()[0][0]
    xs.unpersist()
    results["svm_predict"] = {
        "samples": svm_n,
        "dim": km_dim,
        "model": type(clf).__name__,
        "sec": round(time.perf_counter() - t0, 3),
        "share_pos": round(float(n_pos) / svm_n, 3),
    }
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="small", choices=list(SIZES))
    args = ap.parse_args()
    spark = get_spark("bench-linalg")
    spark.sparkContext.setLogLevel("ERROR")
    results = linalg_workloads(spark, args.scale)
    print(json.dumps({"metric": "linalg", "scale": args.scale, "workloads": results}))


if __name__ == "__main__":
    main()
