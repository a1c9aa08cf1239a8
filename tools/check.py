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
from dask_distributed_vanilla_spark.plans.registry import all_oracles, all_queries
from dask_distributed_vanilla_spark.session import get_spark


def canonical(df: pd.DataFrame) -> tuple[str, str]:
    """Order-insensitive canonical rendering: sort columns by name, rows
    by all values, floats as %.2f; returns (schema_repr, value_hash).
    Schema includes the pandas dtype so int-width mismatches between the
    engine and the oracle surface here instead of in the driver."""
    df = df[sorted(df.columns)].copy()
    def _norm(dt) -> str:
        s = str(dt)
        return "datetime" if s.startswith("datetime") else s  # unit is a client artifact

    dtypes = ",".join(f"{c}:{_norm(df[c].dtype)}" for c in df.columns)
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].map(lambda v: "" if pd.isna(v) else f"{v:.2f}")
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        else:
            df[c] = df[c].astype(str)
    rows = sorted(df.itertuples(index=False, name=None))
    body = "\n".join(",".join(r) for r in rows)
    return dtypes, hashlib.md5(body.encode()).hexdigest()


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
