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
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from dask_distributed_vanilla_spark import linalg
from dask_distributed_vanilla_spark.session import get_spark

SIZES = {
    # (matmul n, chunk), (svd rows, cols, parts), (svd_sq n, chunk, k)
    "small": ((1024, 256), (100_000, 64, 16), (1024, 256, 5)),
    "medium": ((4096, 1024), (500_000, 128, 32), (4096, 1024, 5)),
}


def linalg_workloads(spark, scale: str = "small") -> dict:
    """Run the three array workloads at the given scale; returns the
    per-workload config + seconds dict (also embedded in bench.py's aux)."""
    (mm_n, mm_chunk), (ts_rows, ts_cols, ts_parts), (sq_n, sq_chunk, sq_k) = SIZES[scale]
    results: dict = {}

    t0 = time.perf_counter()
    a = linalg.random_block_matrix(spark, mm_n, mm_n, mm_chunk, seed=1)
    b = linalg.random_block_matrix(spark, mm_n, mm_n, mm_chunk, seed=2)
    linalg.block_matmul(a, b).map(lambda kv: float(kv[1].sum())).sum()
    results["matmul"] = {"n": mm_n, "chunk": mm_chunk, "sec": round(time.perf_counter() - t0, 3)}

    t0 = time.perf_counter()
    rows = (
        spark.sparkContext.parallelize(range(ts_parts), ts_parts)
        .flatMap(
            lambda i: list(
                np.random.RandomState(42 + i).random_sample((ts_rows // ts_parts, ts_cols))
            )
        )
    )
    s, _ = linalg.svd_tall_skinny(rows, ts_cols)
    results["svd_tall_skinny"] = {
        "rows": ts_rows,
        "cols": ts_cols,
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
