"""Sinks.

The reference's only sinks are gather/persist/publish (SURVEY.md §2.1 —
"No parquet/ORC/JSON writers exist in the reference"); a real lake
engine needs durable writes, and at 100 TB the *layout* of those writes
is a first-class performance decision:

- `write_partitioned`: hive-style partition directories → partition
  pruning for free on every downstream read of a filtered scan.
- `write_bucketed`: persistent hash-bucketing on the join/agg key →
  downstream joins and groupBys between co-bucketed tables skip the
  shuffle entirely (tests/test_sinks.py asserts the Exchange disappears
  from the join plan).

Both accept a target file-size-driven repartition so output files are
neither tiny (metadata pressure) nor huge (task stragglers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Plain columnar sink."""
    df.write.mode(mode).parquet(path)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned layout: readers filtering on
    ``partition_cols`` prune whole directories before any IO."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persistent hash-bucketed table (saveAsTable — bucketing metadata
    lives in the catalog). Joining two tables bucketed identically on the
    join key executes shuffle-free; sorting within buckets additionally
    removes the sort from sort-merge plans."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC columnar sink (dask's to_orc analog — same predicate-pushdown
    and column-pruning story as parquet on the read side)."""
    df.write.mode(mode).orc(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink (dask's to_json analog). Row-oriented — the
    interchange format, not the analytics format: no column pruning or
    min/max pushdown on re-read, so it terminates pipelines rather than
    feeding them."""
    df.write.mode(mode).json(path)


def write_sized(
    df: DataFrame,
    path: str,
    max_records_per_file: int,
    mode: str = "overwrite",
) -> None:
    """Parquet write with a per-file record ceiling — the small-file /
    giant-file control knob: at 100 TB the writer, not the reader,
    decides file granularity, and a ceiling keeps any one task's output
    splittable for downstream scans (the companion of the versioned
    table's compaction, which fixes granularity after the fact)."""
    (
        df.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(path)
    )
