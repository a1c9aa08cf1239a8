"""Date/timestamp literal helpers.

The reference keeps TPC-H dates as strings compared lexicographically
(reference `benchmark/tpch/loaddata.py:126-131`, `queries.py:27`); the
fixture parquet stores real timestamps, so predicates compare against
timestamp literals — semantically identical for ISO dates (SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ts(iso_date: str) -> Column:
    """A timestamp literal from an ISO 'YYYY-MM-DD' string."""
    return F.lit(iso_date).cast("timestamp")
