"""Proactive top-k determinism audit (round 12).

Every oracle with a ``LIMIT n`` cut is only hash-stable against the
engine if the cut is *value-deterministic*: the ORDER BY key must be
total (no tie group straddling position n) and must contain no NULLs
anywhere in the sorted input (Spark defaults ASC NULLS FIRST while
DuckDB defaults NULLS LAST, so a NULL key near the boundary selects
different ROWS on the two sides even with identical values). Neither
mechanism is exercised by the FP-typing audit (tools/audit_fp.py), and
fresh-seed fuzz only samples it. This instrument proves it, query by
query, directly on the fixture data both engines read:

Probe T (boundary tie): with ``rank()`` over the oracle's own final
ORDER BY, the cut is unambiguous iff ``count(rows with rank <= n)``
== min(n, total) — a tie group straddling the boundary strictly
inflates that count.

Probe N (nullable key): ``count(rows where <key> IS NULL)`` over the
full sorted input, per ORDER BY key. Zero means the Spark/DuckDB
null-ordering default divergence has no entry point.

Oracles whose LIMIT sits inside a CTE (not the trailing clause) cannot
be probed generically; each is hand-adjudicated in ADJUDICATED below
with a reason checkable by reading the oracle, and the audit fails
(exit 2) if a new inner-LIMIT oracle ever appears unadjudicated.

Probes are integer-exact (ranks and counts), so DuckDB may run
multi-threaded here, unlike audit_fp.

Usage: python tools/audit_topk.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import re
import sys

import duckdb

sys.path.insert(0, ".")

from dask_distributed_vanilla_spark.catalog import TABLES
from dask_distributed_vanilla_spark.plans.registry import all_oracles

_STRING = re.compile(r"'[^']*'")

# Inner-LIMIT oracles, hand-adjudicated (see module docstring):
ADJUDICATED = {
    "e7_setops": "inner ORDER BY event_type LIMIT 1 selects the MIN of the "
                 "ordered column itself -- value-deterministic even if rows tie",
    "text_zipf_slope": "inner cut ORDER BY c DESC, tok over GROUP BY tok -- "
                       "tok is the group key, so the key tuple is unique",
    "text_oov_rate": "inner cut ORDER BY COUNT(*) DESC, term over GROUP BY "
                     "term -- term is the group key, key tuple unique",
    "text_bm25": "inner cut ORDER BY COUNT(*) DESC, term over GROUP BY term "
                 "-- term is the group key, key tuple unique",
}

_TAIL = re.compile(r"\bLIMIT\s+(\d+)\s*;?\s*$", re.I)


def split_trailing_cut(sql: str) -> tuple[str, str, int] | None:
    """Return (base_sql, order_by_keys, n) for a trailing top-level
    ``ORDER BY ... LIMIT n``, else None. The final ORDER BY is found by
    a paren-depth scan on string-masked SQL, so ORDER BYs inside OVER()
    frames or subqueries are never mistaken for the cut's ordering."""
    masked = _STRING.sub(lambda m: "'" + " " * (len(m.group(0)) - 2) + "'", sql)
    m = _TAIL.search(masked)
    if m is None:
        return None
    depth = 0
    last_ob = None
    i = 0
    while i < m.start():
        c = masked[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and masked[i : i + 5].upper() == "ORDER" and (
            i == 0 or (not masked[i - 1].isalnum() and masked[i - 1] != "_")
        ):  # word-boundary guard: 'preorder by' is not a cut (ADVICE r12)
            ob = re.match(r"ORDER\s+BY\b", masked[i:], re.I)
            if ob:
                last_ob = (i, i + ob.end())
        i += 1
    if last_ob is None:
        return None
    return sql[: last_ob[0]], sql[last_ob[1] : m.start()].strip(), int(m.group(1))


def split_keys(order_by: str) -> list[str]:
    """Split the ORDER BY list on top-level commas."""
    keys, depth, start = [], 0, 0
    for i, c in enumerate(order_by):
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            keys.append(order_by[start:i].strip())
            start = i + 1
    keys.append(order_by[start:].strip())
    return keys


def key_expr(key: str) -> str:
    """Strip ASC/DESC/NULLS FIRST|LAST modifiers, leaving the sort
    expression for the IS NULL probe."""
    expr = key.strip()
    while True:
        stripped = re.sub(r"\s+(ASC|DESC|NULLS\s+(FIRST|LAST))\s*$", "",
                          expr, count=1, flags=re.I)
        if stripped == expr:
            return expr
        expr = stripped


def _connect(sf: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    return con


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    oracles = all_oracles()
    names = args.names or sorted(n for n, s in oracles.items()
                                 if re.search(r"\bLIMIT\s+\d+", s, re.I))
    con = _connect(args.sf)

    flags: list[str] = []
    unadjudicated: list[str] = []
    for name in names:
        sql = oracles[name].rstrip().rstrip(";")
        parts = split_trailing_cut(sql)
        n_limits = len(re.findall(r"\bLIMIT\b", sql, re.I))
        if parts is None or n_limits > 1:
            inner = n_limits - (0 if parts is None else 1)
            if name in ADJUDICATED:
                print(f"adj   {name}: {inner} inner cut(s) -- {ADJUDICATED[name]}")
                if parts is None:
                    continue  # nothing probeable remains
            else:
                print(f"MANUAL {name}: {inner} inner LIMIT(s) not probeable -- "
                      f"adjudicate in tools/audit_topk.py")
                unadjudicated.append(name)
                if parts is None:
                    continue
        base, order_by, n = parts
        # resolve positional keys (ORDER BY 1, 2) against output columns
        cols = [d[0] for d in con.execute(
            f"SELECT * FROM ({base}) __t LIMIT 0").description]
        keys = []
        for k in split_keys(order_by):
            mpos = re.match(r"^(\d+)(\s+.*)?$", k)
            if mpos:
                k = f'"{cols[int(mpos.group(1)) - 1]}"' + (mpos.group(2) or "")
            keys.append(k)
        verdicts = []
        try:
            total, in_cut = con.execute(
                f"SELECT count(*), count(*) FILTER (WHERE __rk <= {n}) FROM "
                f"(SELECT rank() OVER (ORDER BY {', '.join(keys)}) AS __rk "
                f"FROM ({base}) __t)"
            ).fetchone()
            tie_ok = in_cut == min(n, total)
            verdicts.append(("T", tie_ok,
                             f"rank<={n}: {in_cut} of {total} rows"))
            nulls = con.execute(
                "SELECT " + ", ".join(
                    f"count(*) FILTER (WHERE ({key_expr(k)}) IS NULL)" for k in keys)
                + f" FROM ({base}) __t"
            ).fetchone()
            verdicts.append(("N", not any(nulls), f"null keys: {list(nulls)}"))
        except Exception as e:
            verdicts.append((f"!err:{type(e).__name__}", False, str(e)[:120]))
        bad = [tag for tag, ok, _ in verdicts if not ok]
        if bad:
            flags.append(f"{name}:{'+'.join(bad)}")
        detail = "; ".join(d for _, _, d in verdicts)
        print(f"{'FLAG ' if bad else 'ok   '} {name}: "
              + " ".join(f"{t}={'==' if ok else 'DIFF'}" for t, ok, _ in verdicts)
              + f" ({detail})")

    print(f"\nprobed {len(names)} LIMIT-bearing oracles at {args.sf}; "
          f"flags: {flags if flags else 'none'}; "
          f"unadjudicated inner cuts: {unadjudicated if unadjudicated else 0}")
    # 0 = clean, 1 = tie/null flags, 2 = unadjudicated inner cut
    return 1 if flags else (2 if unadjudicated else 0)


if __name__ == "__main__":
    raise SystemExit(main())
