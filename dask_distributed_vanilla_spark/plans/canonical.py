"""Deterministic output canonicalization (SURVEY.md §5.4, §4 custom
piece 1).

Float aggregates are order-dependent in any parallel engine; equality
between two engines is defined over this canonical form: columns sorted
by name, datetimes at microsecond precision, floats rendered %.2f
(queries pre-round inside the plan), rows sorted, md5 over the CSV
rendering. Used by the driver-style gate (tools/check.py), the pytest
suite, and available to library users for cross-engine result checks.
"""

from __future__ import annotations

import hashlib

import pandas as pd


def canonical(df: pd.DataFrame) -> tuple[str, str]:
    """Return (schema_descriptor, value_hash) for a result frame.

    The schema descriptor includes normalized dtypes (datetime unit is a
    client-library artifact and is erased); the hash is
    order-insensitive (rows sorted after rendering).
    """
    df = df[sorted(df.columns)].copy()

    def _norm(dt) -> str:
        s = str(dt)
        return "datetime" if s.startswith("datetime") else s

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


def frames_equal(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    return len(a) == len(b) and canonical(a) == canonical(b)
