"""User-defined Python DataSource for dbgen ``.tbl`` files.

The reference's loaders are pandas readers wired into a name→loader
registry (`benchmark/tpch/loaddata.py:164-173`). Spark's native answer
to "teach the engine a new format" is the DataSource API — this module
implements it for the dbgen pipe-delimited layout, so the format plugs
into the ordinary reader surface:

    spark.dataSource.register(DbgenTblDataSource)
    spark.read.format("dbgen_tbl").option("table", "nation").load(path)

Scale notes: `partitions()` returns one InputPartition per ``.tbl``
file/shard, so a 1000-file dbgen dump reads with 1000-way parallelism
and each task streams its file line-by-line (no whole-file
materialization). The JVM csv reader (`readers.read_delimited`) stays
the fast path — it gets blockwise splitting *within* a file and
whole-stage codegen — but the Python DataSource is the extensibility
contract: the same shape plugs in any format Python can parse, with
rows crossing to the JVM through Arrow batches.
"""

from __future__ import annotations

import datetime
import glob
import os

from pyspark.sql import types as T

try:  # Spark ≥ 4.0
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    HAVE_DATASOURCE_API = True
except ImportError:  # pragma: no cover - older builds: facade only
    HAVE_DATASOURCE_API = False

    class DataSource:  # type: ignore[no-redef]
        def __init__(self, options=None):
            self.options = options or {}

    class DataSourceReader:  # type: ignore[no-redef]
        pass

    class InputPartition:  # type: ignore[no-redef]
        def __init__(self, value):
            self.value = value

from dask_distributed_vanilla_spark.sources.readers import TPCH_SCHEMAS, _schema


def _converter(dtype: T.DataType):
    if isinstance(dtype, (T.LongType, T.IntegerType)):
        return int
    if isinstance(dtype, T.DoubleType):
        return float
    if isinstance(dtype, T.DateType):
        return datetime.date.fromisoformat
    return str


def _expand(path: str) -> list[str]:
    """One shard list, deterministic order: a directory reads every
    ``*.tbl*`` inside it, a glob expands, a plain path is itself."""
    if os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "*.tbl*")))
    hits = sorted(glob.glob(path))
    return hits or [path]


class DbgenTblReader(DataSourceReader):
    def __init__(self, table: str, path: str) -> None:
        self.table = table
        self.path = path

    def partitions(self):  # one task per file shard
        return [InputPartition(p) for p in _expand(self.path)]

    def read(self, partition):
        convs = [_converter(t) for _, t in TPCH_SCHEMAS[self.table]]
        n = len(convs)
        with open(partition.value, "r", encoding="utf-8") as fh:
            for line in fh:
                # dbgen emits a trailing separator; split and keep the
                # first n fields (empty string → NULL, like the csv path)
                parts = line.rstrip("\r\n").split("|")
                yield tuple(
                    conv(v) if v != "" else None
                    for conv, v in zip(convs, parts[:n])
                )


class DbgenTblDataSource(DataSource):
    """``format("dbgen_tbl")`` — options: ``table`` (dbgen table name,
    selects the schema) and the load path (file, glob, or directory)."""

    @classmethod
    def name(cls) -> str:
        return "dbgen_tbl"

    def schema(self):
        return _schema(self.options["table"])

    def reader(self, schema) -> DbgenTblReader:
        return DbgenTblReader(self.options["table"], self.options["path"])


# --- streaming Python DataSource ----------------------------------------
try:  # Spark ≥ 4.0 simple streaming reader API
    from pyspark.sql.datasource import SimpleDataSourceStreamReader

    HAVE_STREAM_DATASOURCE_API = True
except ImportError:  # pragma: no cover
    HAVE_STREAM_DATASOURCE_API = False

    class SimpleDataSourceStreamReader:  # type: ignore[no-redef]
        pass


class CounterStreamReader(SimpleDataSourceStreamReader):
    """Deterministic micro-batch source: each batch emits the next
    `rows_per_batch` integers. Offsets are plain dicts the engine
    checkpoints — restart resumes exactly where the last committed
    offset left off, which is what makes a custom Python source
    exactly-once capable."""

    def __init__(self, options) -> None:
        self.rows = int(options.get("rows_per_batch", "10"))

    def initialOffset(self):
        return {"next": 0}

    def read(self, start):
        lo = start["next"]
        rows = [(i,) for i in range(lo, lo + self.rows)]
        return iter(rows), {"next": lo + self.rows}

    def readBetweenOffsets(self, start, end):
        return iter([(i,) for i in range(start["next"], end["next"])])


class CounterStreamDataSource(DataSource):
    """``readStream.format("pycounter")`` — a user-defined STREAMING
    Python DataSource (the ingest-extensibility contract: any Python
    client library becomes a Structured Streaming source with
    checkpointed offsets; rows cross to the JVM via Arrow)."""

    @classmethod
    def name(cls) -> str:
        return "pycounter"

    def schema(self):
        return "id long"

    def simpleStreamReader(self, schema):
        return CounterStreamReader(self.options)
