"""Proactive FP-boundary oracle audit (round-11 VERDICT task 1).

All three round-10 fuzz catches were the same class: the oracle (or
engine) carried a FLOAT32- or DECIMAL-typed intermediate where the
other side ran float64, and the ~ulp drift flipped a half-up display
boundary. Instead of waiting for fresh-seed fuzz to sample the next
instance, this audit measures the class directly, oracle by oracle:

Probe L (DECIMAL literals): DuckDB types a bare literal like ``0.5``
as DECIMAL and keeps DECIMAL arithmetic exact; Spark computes the same
expression in float64. Variant: every bare ``N.M`` literal (outside
string literals) is rewritten to ``CAST(N.M AS DOUBLE)``.

Probe E (FLOAT32 source column): ``embeddings.embedding`` is
``FLOAT[]``; DuckDB keeps FLOAT/FLOAT and FLOAT/DECIMAL arithmetic in
float32. Variant: the ``embeddings`` view pre-widens the column to
``DOUBLE[]``.

Each probe compares the variant against the as-is oracle at FULL
precision (display rounding stripped: ``FLOOR``/``CEIL`` tokens deleted,
``round(expr[, n])`` reduced to ``(expr)`` by a paren-aware scan —
identically in both variants, so the comparison isolates typing, not
rounding). A full-
precision hash difference means the oracle's exact/narrow typing is
load-bearing mid-computation — i.e. a latent engine-vs-oracle
divergence waiting for a fixture whose value lands on a .xx5 grid
point. Matches mean the oracle's arithmetic is typing-insensitive on
this data.

Usage: python tools/audit_fp.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import re
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from dask_distributed_vanilla_spark.catalog import TABLES
from dask_distributed_vanilla_spark.plans.registry import all_oracles

_STRING = re.compile(r"'[^']*'")
# All three dot forms DuckDB types as DECIMAL: N.M, N., .M (ADVICE r11:
# leading/trailing-dot literals escaped the original N.M-only pattern).
_NUMLIT = re.compile(r"(?<![\w.$])(\d+\.\d*|\.\d+)(?![\w.])")


def _mask_strings(sql: str) -> tuple[str, list[str]]:
    saved: list[str] = []

    def _stash(m: re.Match) -> str:
        saved.append(m.group(0))
        return f"\x00{len(saved) - 1}\x00"

    return _STRING.sub(_stash, sql), saved


def _unmask(sql: str, saved: list[str]) -> str:
    return re.sub(r"\x00(\d+)\x00", lambda m: saved[int(m.group(1))], sql)


def cast_literals(sql: str) -> str:
    """Rewrite every bare decimal literal to CAST(lit AS DOUBLE)."""
    masked, saved = _mask_strings(sql)
    masked = _NUMLIT.sub(lambda m: f"CAST({m.group(1)} AS DOUBLE)", masked)
    return _unmask(masked, saved)


def _strip_round_calls(masked: str) -> str:
    """Rewrite ``round(expr[, n])`` -> ``(expr)`` with a paren-aware
    scan (strings are already masked, so commas inside literals are
    safe). DuckDB 1.0 macros cannot overload arity, so a pass-through
    macro would reject positional two-arg calls (ADVICE r11); textual
    stripping handles any arity. Re-scans from the start after each
    rewrite, so nested round(round(x, 2), 1) resolves inside-out."""
    pat = re.compile(r"\bround\s*\(", flags=re.I)
    while True:
        m = pat.search(masked)
        if m is None:
            return masked
        depth, i = 1, m.end()
        first_arg_end = None
        while i < len(masked) and depth:
            c = masked[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "," and depth == 1 and first_arg_end is None:
                first_arg_end = i
            i += 1
        if depth:  # unbalanced: leave as-is rather than corrupt the SQL
            return masked
        arg1 = masked[m.end():first_arg_end if first_arg_end is not None else i - 1]
        masked = masked[:m.start()] + "(" + arg1 + ")" + masked[i:]


def strip_rounding(sql: str) -> str:
    """Remove display rounding so the comparison runs at full float64
    precision: FLOOR/CEIL tokens deleted (FLOOR(x) -> (x)), round()
    calls reduced to their first argument. Applied identically to both
    sides of every probe, so semantics changes (histogram buckets,
    group keys) cancel out."""
    masked, saved = _mask_strings(sql)
    masked = re.sub(r"\b(floor|ceil|ceiling)\s*\(", "(", masked, flags=re.I)
    masked = _strip_round_calls(masked)
    return _unmask(masked, saved)


def _render(df: pd.DataFrame, prec: int = 17) -> list[tuple]:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].map(lambda v: "" if pd.isna(v) else f"{v:.{prec}g}")
        else:
            df[c] = df[c].astype(str)
    return sorted(df.itertuples(index=False, name=None))


def _self_floor(dfs: list[pd.DataFrame], start: int = 17) -> int:
    """Highest precision (floor 7g) at which ALL renders of the same
    query agree -- its summation-order noise floor. Shared by the base
    (4 runs) and every variant (4 runs, ADVICE r12: 2-run
    self-agreement under-measures bistable float-sum plans)."""
    prec = start
    while prec > 6 and len({tuple(map(tuple, _render(d, prec)))
                            for d in dfs}) > 1:
        prec -= 1
    return prec


def _connect(sf: str, widen_embeddings: bool) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # single-threaded: parallel double summation order is
    # nondeterministic, which would alias as a DIFF at %.17g precision
    con.execute("SET threads=1")
    for t in TABLES:
        if t == "embeddings" and widen_embeddings:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * REPLACE "
                f"(CAST(embedding AS DOUBLE[]) AS embedding) "
                f"FROM '{sf}/{t}.parquet'"
            )
        else:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    return con


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    oracles = all_oracles()
    names = args.names or sorted(oracles)

    con = _connect(args.sf, widen_embeddings=False)
    con_wide = _connect(args.sf, widen_embeddings=True)

    n_lit_sites = n_emb = 0
    flags: list[str] = []
    skipped: list[str] = []
    unprobed: list[str] = []
    for name in names:
        sql = oracles[name]
        base_sql = strip_rounding(sql)
        lit_sql = strip_rounding(cast_literals(sql))
        has_lits = lit_sql != base_sql
        has_emb = bool(re.search(r"\bembeddings?\b", sql))
        n_lit_sites += has_lits
        n_emb += has_emb
        verdicts = []
        try:
            # Establish the per-oracle noise floor: some plans (iterative
            # joins over float sums) are nondeterministic at the last ulp
            # even single-threaded, and can be BISTABLE — two consecutive
            # runs may agree while a third lands on the other attractor
            # (observed on graph_pagerank at sf0.001: 2-run floors said
            # 15g, a later run differed at 15g).
            raws = [con.execute(base_sql).fetchdf() for _ in range(4)]
            prec = _self_floor(raws)
        except Exception as e:
            print(f"SKIP  {name}: unrounded base errored: {type(e).__name__}: {e}")
            skipped.append(name)
            continue
        noise = f" (noise floor {prec}g)" if prec < 17 else ""

        def _probe(c, q, prec=prec):
            # A variant is a DIFFERENT query text -> possibly a different
            # physical plan -> different summation order, which would
            # alias as a typing DIFF. Measure the variant's floor with
            # the same 4-run rigor as the base and compare at the weaker
            # of the two floors, so a flag means the two texts compute
            # different VALUES, not different orders.
            vs = [c.execute(q).fetchdf() for _ in range(4)]
            p = min(prec, _self_floor(vs))
            return _render(vs[0], p) == _render(raws[0], p)

        if has_lits:
            try:
                verdicts.append(("L", _probe(con, lit_sql)))
            except Exception as e:
                verdicts.append(("L!err:" + type(e).__name__, False))
        if has_emb:
            try:
                verdicts.append(("E", _probe(con_wide, base_sql)))
            except Exception as e:
                verdicts.append(("E!err:" + type(e).__name__, False))
        if not verdicts:
            unprobed.append(name)
            continue
        bad = [tag for tag, ok in verdicts if not ok]
        status = "FLAG " if bad else "ok   "
        if bad:
            flags.append(f"{name}:{'+'.join(bad)}")
        print(f"{status} {name}: " + " ".join(
            f"{tag}={'==' if ok else 'DIFF'}" for tag, ok in verdicts) + noise)
    n_probed = len(names) - len(skipped) - len(unprobed)
    print(
        f"\nprobed {n_probed}/{len(names)} oracles: {n_lit_sites} with decimal "
        f"literals, {n_emb} touching embeddings; "
        f"skipped (base errored after rounding-strip): "
        f"{skipped if skipped else 0}; "
        f"unprobed (no decimal literals, no embeddings -- typing-neutral "
        f"by construction): {len(unprobed)}; "
        f"flags: {flags if flags else 'none'}"
    )
    if skipped:
        print("exit 2: skipped oracles were NOT audited -- fix strip_rounding "
              "or the oracle, then re-run")
    # 0 = clean, 1 = typing flags (latent divergence), 2 = coverage
    # hole, 3 = BOTH -- distinct so automation can't treat a
    # flagged-but-partially-audited run as fully covered once the
    # flags are fixed (ADVICE r12)
    if flags and skipped:
        return 3
    return 1 if flags else (2 if skipped else 0)


if __name__ == "__main__":
    raise SystemExit(main())
