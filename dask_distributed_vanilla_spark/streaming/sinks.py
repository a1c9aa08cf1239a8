"""Streaming sinks beyond the in-memory test sink: an exactly-once
parquet sink built on foreachBatch.

Structured Streaming's file sink is append-only; the production pattern
for transactional targets is ``foreachBatch`` + an idempotent write
keyed by the micro-batch epoch. Re-delivery of an epoch after a failure
re-runs the same write, and because each epoch owns its partition and
the write is a dynamic partition overwrite, the retry replaces its own
output instead of duplicating it — at-least-once delivery plus an
idempotent sink = exactly-once results.

At scale the same shape targets a lakehouse table (MERGE keyed by epoch
or transactional REPLACE WHERE); the parquet partition-overwrite here is
the dependency-free equivalent with the identical retry contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EPOCH_COL = "_epoch"


def write_epoch(batch_df: DataFrame, batch_id: int, path: str) -> None:
    """Idempotently land one micro-batch: the epoch column is the
    partition key, and dynamic partition overwrite makes a replay of the
    same batch_id replace exactly its own files."""
    (
        batch_df.withColumn(EPOCH_COL, F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(EPOCH_COL)
        .parquet(path)
    )


def start_exactly_once_parquet(stream_df: DataFrame, path: str, checkpoint: str):
    """Run `stream_df` into a parquet directory with exactly-once
    results: offsets tracked in `checkpoint`, epochs landed via
    `write_epoch`. Returns the StreamingQuery (availableNow — drains
    what exists, then stops; a live deployment drops the trigger)."""
    return (
        stream_df.writeStream.foreachBatch(
            lambda df, epoch: write_epoch(df, epoch, path)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
