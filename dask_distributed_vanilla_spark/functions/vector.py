"""Vector column expressions over ``array<float>`` embedding columns.

JVM-side (whole-stage-codegen'd higher-order functions), so similarity
math never leaves the executor or crosses into Python — the hot path for
ANN over 100 TB of embeddings. Elements are cast to double first so the
fold accumulates in float64, matching the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns, accumulated left-to-right in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_sim(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
