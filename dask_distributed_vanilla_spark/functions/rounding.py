"""Engine-portable rounding.

Spark's ROUND(double, 2) rounds the shortest decimal *string* of the
double (via BigDecimal), while DuckDB rounds the binary value — they
disagree exactly on the .xx5 grid (e.g. 189/40: Spark 4.73, DuckDB
4.72). Ratios of small integers (token stats, Jaccard) land on that grid
constantly, so those operators round with an explicit half-up on the
binary value — `floor(x*100 + 0.5)/100` — which every engine evaluates
identically. SQL twin: `FLOOR(x*100 + 0.5)/100`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round2(x: Column) -> Column:
    """Half-up round to 2 decimals on the binary double value."""
    return F.floor(x * 100 + F.lit(0.5)) / 100


def round2_sql(expr: str) -> str:
    """DuckDB twin of :func:`round2`."""
    return f"FLOOR(({expr}) * 100 + 0.5) / 100"
