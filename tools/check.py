"""Local differential checker: Spark plan vs DuckDB oracle.

Replicates the driver's correctness gate (row-count + schema +
order-insensitive value hash) so every operator is verified here before
the round's verify runs. Usage:

    python tools/check.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import hashlib
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from dask_distributed_vanilla_spark.catalog import TABLES
from dask_distributed_vanilla_spark.plans.canonical import canonical
from dask_distributed_vanilla_spark.plans.registry import all_oracles, all_queries
from dask_distributed_vanilla_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    queries, oracles = all_queries(), all_oracles()
    names = args.names or sorted(queries)

    spark = get_spark("check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, args.sf).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok?   {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        s_schema, s_hash = canonical(sdf)
        o_schema, o_hash = canonical(odf)
        ok = len(sdf) == len(odf) and s_schema == o_schema and s_hash == o_hash
        status = "PASS " if ok else "FAIL "
        if not ok:
            failures.append(name)
        print(
            f"{status} {name}: rows {len(sdf)}/{len(odf)} "
            f"schema={'=' if s_schema == o_schema else f'{s_schema} != {o_schema}'} "
            f"hash={'=' if s_hash == o_hash else '≠'} ({time.time()-t0:.1f}s)"
        )
        if not ok and len(sdf) <= 12 and len(odf) <= 12:
            print("  spark:\n", sdf.to_string(), "\n  duckdb:\n", odf.to_string())
    print(f"\n{len(names) - len(failures)}/{len(names)} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
