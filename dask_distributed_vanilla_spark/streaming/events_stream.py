"""Structured Streaming twin of the batch event analytics.

The reference's streaming surface is worker pub/sub + queues
(`distributed/pubsub.py:202-467`, `queues.py:130-292` — SURVEY.md §2.9);
its capability equivalent on Spark is a stream of records through
`readStream` with watermarked event-time windows. `stream_e1` replays
the events fixture as a file stream, aggregates 1-hour tumbling windows
per event type, and lands the result in an in-memory sink — the same
answer E1 computes in batch, which is exactly what makes it judgeable
against the E1-style oracle.

At scale this is the operator that replaces the reference's pubsub
analytics: Kafka source instead of file replay, `update` output to a
sink instead of `complete` to memory, watermark bounding state size.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _as_stream_dir(sf_dir: str) -> str:
    """File stream sources watch a directory; expose the single events
    parquet through a temp dir symlink (a real deployment points at the
    landing directory or a Kafka topic instead)."""
    d = tempfile.mkdtemp(prefix="events_stream_")
    os.symlink(f"{sf_dir}/events.parquet", f"{d}/events.parquet")
    return d


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events fixture as a file-replay stream with event-time ts."""
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = spark.readStream.schema(raw_schema).parquet(_as_stream_dir(sf_dir))
    if dict(stream.dtypes).get("ts") == "bigint":  # TIMESTAMP(NANOS) fixture
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


def windowed_counts(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window aggregate (the E1 semantics)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("event_type", F.window("ts", "1 hour").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sv"))
        .select("event_type", F.col("win.start").alias("w"), "n", "sv")
    )


def stream_e1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Judged query: run the stream to completion (availableNow trigger,
    complete mode → memory sink) and return the final window table."""
    sink = f"stream_e1_{uuid.uuid4().hex[:8]}"
    q = (
        windowed_counts(events_stream(spark, sf_dir))
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink).orderBy("event_type", "w")


# Epoch-aligned 1-hour tumbling windows == date_trunc('hour', ts).
STREAM_E1_SQL = """
SELECT event_type, date_trunc('hour', ts) AS w,
       COUNT(*) AS n, ROUND(SUM(value),2) AS sv
FROM events GROUP BY 1,2 ORDER BY 1,2
"""

QUERIES = {"stream_e1": stream_e1}
ORACLES = {"stream_e1": STREAM_E1_SQL}
