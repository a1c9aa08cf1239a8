"""Benchmark harness: every registered query at $SPARK_GRAFT_SF_DIR.

Protocol (BASELINE.md): per query, wall-clock of plan build → execute →
collect, median of $BENCH_REPS runs (default 3) after one warm-up of the
whole suite's input scans.

Output contract (truncation-proof — the driver keeps only the LAST
~2,000 chars of stdout, which in round 3 cut the 176-query JSON and
left BENCH_r03 undiagnosable): the FULL result (all per-query timings +
aux) is printed first on its own line, and the FINAL line is a compact
(<1,500 char) complete JSON with the suite total, per-family geomeans,
the top-10 slowest queries (as the "queries" dict), and the budget
flag. Whichever line survives, the round is diagnosable.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from dask_distributed_vanilla_spark.catalog import TABLES, load_table
from dask_distributed_vanilla_spark.plans.registry import all_queries
from dask_distributed_vanilla_spark.session import get_spark


# Suite-total drift budget at the driver's sf0.1 / local[32] config:
# round 3 final measured 164.6s over the 172-query suite on an idle
# box (median-of-reps; the ER/dedup audit queries each re-run the two
# operators they measure, ~4-6s apiece). Co-running workloads inflate
# the total, so the budget keeps ~25% headroom for a loaded driver
# host. Exceeding it flags a regression in the output instead of
# relying on a human diff.
SUITE_BUDGET_SEC = 210.0
SUBSEC_REPS = 5


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("BENCH_REPS", "3"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: touch every input once (JVM/codegen/file-footer caches)
    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    queries = all_queries()
    timings: dict[str, float] = {}
    for name in sorted(queries):
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).collect()
            runs.append(time.perf_counter() - t0)
        # sub-second medians sit at the JVM noise floor: extend to
        # SUBSEC_REPS so round-over-round drift is separable from noise
        if statistics.median(runs) < 1.0:
            while len(runs) < SUBSEC_REPS:
                t0 = time.perf_counter()
                queries[name](spark, sf_dir).collect()
                runs.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(runs), 3)

    total = round(sum(timings.values()), 3)
    # TPC-H-style power metric: geometric mean over the full-fidelity
    # Tier B suite (b1-b22) — the single-number the reference's TPC-H
    # harness reports, robust to one slow outlier
    b_times = [v for k, v in timings.items() if k.startswith("b") and k[1:].isdigit()]
    tpch_geomean = (
        round(statistics.geometric_mean(b_times), 3) if b_times else None
    )

    # auxiliary (non-suite) metrics: planted-hot-key skew proof and the
    # array workloads — skippable via SPARK_GRAFT_BENCH_AUX=0
    aux: dict = {}
    if os.environ.get("SPARK_GRAFT_BENCH_AUX", "1") != "0":
        from dask_distributed_vanilla_spark.functions.skew import skew_bench
        from tools.bench_linalg import linalg_workloads

        # aux must never sink the suite numbers: record failures inline
        try:
            aux["skew"] = skew_bench(spark, n_rows=3_000_000)
        except Exception as e:  # pragma: no cover - defensive
            aux["skew"] = {"error": str(e)[:300]}
        # the reference's tree-reduction benchmark: 1,024 delayed add
        # leaves reduced down a binary future tree
        # (benchmark/tree_reduction.py:17-31)
        try:
            import operator

            from dask_distributed_vanilla_spark.client import Client, tree_reduce

            cl = Client(spark)
            t0 = time.perf_counter()
            out = tree_reduce(cl, operator.add, list(range(1024))).result()
            aux["tree_reduction"] = {
                "leaves": 1024,
                "chunk": 2,
                "sec": round(time.perf_counter() - t0, 3),
                "result_ok": out == 1024 * 1023 // 2,
            }
        except Exception as e:  # pragma: no cover - defensive
            aux["tree_reduction"] = {"error": str(e)[:300]}
        # "large" = the BASELINE.md-named configs at 128 GiB/local[32]
        # scale (tools/bench_linalg.py SIZES); ~4-5 min — drop to
        # "small" via env when iterating
        try:
            aux["linalg"] = linalg_workloads(
                spark, os.environ.get("SPARK_GRAFT_LINALG_SCALE", "large")
            )
        except Exception as e:  # pragma: no cover - defensive
            aux["linalg"] = {"error": str(e)[:300]}

    config = {
        "sf": sf,
        "n_queries": len(timings),
        "reps": reps,
        "reps_subsec": SUBSEC_REPS,
        "budget_sec": SUITE_BUDGET_SEC,
        "over_budget": total > SUITE_BUDGET_SEC,
        "spark": spark.version,
        "cores": os.environ.get("SPARK_GRAFT_CPUS", "*"),
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        "aqe": spark.conf.get("spark.sql.adaptive.enabled"),
    }
    # Full record first (its own line; may be truncated by the driver —
    # the same dict lands in the repo via tools/bench snapshots).
    print(
        json.dumps(
            {
                "metric": "suite_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "tpch_geomean_sec": tpch_geomean,
                "aux": aux,
                **config,
            }
        )
    )
    # Compact summary LAST so it survives tail-truncation: per-family
    # geomeans + the 10 slowest queries stand in for the full dict.
    fams: dict[str, list[float]] = {}
    for k, v in timings.items():
        fams.setdefault(_family(k), []).append(max(v, 1e-3))
    geo = {
        f: round(statistics.geometric_mean(ts), 3) for f, ts in sorted(fams.items())
    }
    slow10 = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    print(
        json.dumps(
            {
                "metric": "suite_total_sec",
                "value": total,
                "unit": "sec",
                "queries": slow10,
                "summary": "top10_slowest_only_full_dict_on_first_line",
                "family_geomean_sec": geo,
                "tpch_geomean_sec": tpch_geomean,
                **config,
            }
        )
    )


def _family(name: str) -> str:
    """Bench reporting families (the verdict's requested breakdown)."""
    if name.startswith(("a", "b")) and name[1:].isdigit():
        return "tpch"
    if name.startswith("stream_"):
        return "stream"
    if name.startswith("text_") or name == "bpe_merges":
        return "text"
    if name.startswith(("dedup_", "chunk_dedup", "semdedup")):
        return "dedup"
    if name.startswith("e") and name[1:].split("_")[0].isdigit():
        return "events"
    return "other"


if __name__ == "__main__":
    main()
