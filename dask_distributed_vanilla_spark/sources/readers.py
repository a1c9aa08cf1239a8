"""Ingest readers — the reference's dbgen table loaders on Spark.

Mirrors `benchmark/tpch/loaddata.py` (reference): pipe-delimited
`dd.read_table/read_csv` with explicit column lists (`loaddata.py:14-161`)
and a name→loader registry (`loaddata.py:164-173`). Differences by
design (SURVEY.md §1.2): explicit Spark schemas instead of pandas dtype
inference, and real date columns instead of the reference's
lexicographic date-strings (equivalent ordering for ISO dates).

Like the reference, paths may be globs or any supported filesystem URI
(local, hdfs://, s3a://, https:// via hadoop connectors —
`test_tpch.py:15-46`). Scans split blockwise automatically
(`maxPartitionBytes`), the Spark analog of dask's blocksize splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_D = T.DoubleType()
_L = T.LongType()
_I = T.IntegerType()
_S = T.StringType()
_DT = T.DateType()

# Full TPC-H dbgen schemas (reference loaddata.py:14-161). The driver's
# parquet fixtures are a column-reduced subset; these readers accept the
# full dbgen .tbl layout.
TPCH_SCHEMAS: dict[str, list[tuple[str, T.DataType]]] = {
    "region": [("r_regionkey", _I), ("r_name", _S), ("r_comment", _S)],
    "nation": [("n_nationkey", _I), ("n_name", _S), ("n_regionkey", _I), ("n_comment", _S)],
    "customer": [
        ("c_custkey", _L), ("c_name", _S), ("c_address", _S), ("c_nationkey", _I),
        ("c_phone", _S), ("c_acctbal", _D), ("c_mktsegment", _S), ("c_comment", _S),
    ],
    "supplier": [
        ("s_suppkey", _L), ("s_name", _S), ("s_address", _S), ("s_nationkey", _I),
        ("s_phone", _S), ("s_acctbal", _D), ("s_comment", _S),
    ],
    "part": [
        ("p_partkey", _L), ("p_name", _S), ("p_mfgr", _S), ("p_brand", _S),
        ("p_type", _S), ("p_size", _I), ("p_container", _S), ("p_retailprice", _D),
        ("p_comment", _S),
    ],
    "partsupp": [
        ("ps_partkey", _L), ("ps_suppkey", _L), ("ps_availqty", _I),
        ("ps_supplycost", _D), ("ps_comment", _S),
    ],
    "orders": [
        ("o_orderkey", _L), ("o_custkey", _L), ("o_orderstatus", _S),
        ("o_totalprice", _D), ("o_orderdate", _DT), ("o_orderpriority", _S),
        ("o_clerk", _S), ("o_shippriority", _I), ("o_comment", _S),
    ],
    "lineitem": [
        ("l_orderkey", _L), ("l_partkey", _L), ("l_suppkey", _L), ("l_linenumber", _I),
        ("l_quantity", _D), ("l_extendedprice", _D), ("l_discount", _D), ("l_tax", _D),
        ("l_returnflag", _S), ("l_linestatus", _S), ("l_shipdate", _DT),
        ("l_commitdate", _DT), ("l_receiptdate", _DT), ("l_shipinstruct", _S),
        ("l_shipmode", _S), ("l_comment", _S),
    ],
}


def _schema(table: str) -> T.StructType:
    return T.StructType([T.StructField(n, t) for n, t in TPCH_SCHEMAS[table]])


def read_delimited(
    spark: SparkSession, path: str, table: str, sep: str = "|"
) -> DataFrame:
    """Read a dbgen `.tbl` file (the reference's `dd.read_table(...,
    sep='|')`, `loaddata.py:103-132`). dbgen emits a trailing separator,
    producing one empty extra column — dropped here like pandas does for
    the reference's explicit name lists."""
    fields = TPCH_SCHEMAS[table]
    raw = (
        spark.read.option("sep", sep)
        .option("header", "false")
        .option("dateFormat", "yyyy-MM-dd")
        .schema(T.StructType([*_schema(table).fields, T.StructField("_trailing", _S)]))
        .csv(path)
    )
    return raw.select(*[name for name, _ in fields])


def read_csv(spark: SparkSession, path: str, table: str) -> DataFrame:
    """The reference's `dd.read_csv` path (`loaddata.py:51-63`)."""
    return read_delimited(spark, path, table, sep="|")


def from_pandas(spark: SparkSession, pdf) -> DataFrame:
    """In-memory source (reference `test_collections.py:48`)."""
    return spark.createDataFrame(pdf)


def read_json(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    mode: str = "PERMISSIVE",
    corrupt_column: str | None = None,
) -> DataFrame:
    """JSON-lines source (the dd.read_json analog). Pass an explicit
    schema at scale — schema inference reads the data twice and a typo'd
    field silently becomes null with inference, but errors with a
    declared schema.

    Malformed-record contract (the part that matters on a 100 TB crawl
    dump, where some records are ALWAYS broken): ``mode`` is Spark's
    parser mode — PERMISSIVE (default) nulls unparsable rows,
    DROPMALFORMED removes them, FAILFAST raises on the first one. With
    ``corrupt_column`` the raw text of each bad line is quarantined into
    that column (it must also appear in the schema as a string field),
    so a later pass can route rejects to a dead-letter sink instead of
    losing them silently.
    """
    reader = spark.read.option("mode", mode)
    if corrupt_column is not None:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_column)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def timeseries(
    spark: SparkSession,
    start: str,
    end: str,
    freq_seconds: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Synthetic timeseries source (reference `dask.datasets.timeseries`,
    `test_collections.py:118-126`): one row per freq tick with
    deterministic pseudo-random (id, name, x, y) columns, generated
    distributed via spark.range (no driver materialization)."""
    span = (
        F.unix_timestamp(F.lit(end).cast("timestamp"))
        - F.unix_timestamp(F.lit(start).cast("timestamp"))
    ) / freq_seconds
    base = spark.range(0, 2**31).where(F.col("id") < span)
    ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit(start).cast("timestamp")) + F.col("id") * freq_seconds
    )
    return base.select(
        ts.alias("timestamp"),
        (F.hash(F.col("id") + seed) % 1000).alias("id_"),
        F.element_at(
            F.array(*[F.lit(c) for c in "abcdefgh"]),
            (F.pmod(F.hash(F.col("id") * 31 + seed), 8) + 1).cast("int"),
        ).alias("name"),
        (F.pmod(F.hash(F.col("id") * 7 + seed), 10**6) / 5e5 - 1).alias("x"),
        (F.pmod(F.hash(F.col("id") * 13 + seed), 10**6) / 5e5 - 1).alias("y"),
    ).withColumnRenamed("id_", "id")


LOADERS = {name: read_delimited for name in TPCH_SCHEMAS}


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source (dd.read_orc analog) — same pushdown/pruning contract
    as the parquet scan."""
    return spark.read.orc(path)


def read_text(spark: SparkSession, path: str, whole: bool = False) -> DataFrame:
    """Line-oriented text source (`value` column); ``whole=True`` reads
    one row per file — the raw-crawl ingest shape before any parsing."""
    return spark.read.text(path, wholetext=whole)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Opaque-file source (`binaryFile` format): one row per file with
    (path, modificationTime, length, content) — the ingest path for an
    image/audio corpus feeding the multimodal operators. The format
    supports predicate pushdown on the metadata columns (length,
    modificationTime), so "skip files over 100 MB" prunes BEFORE
    content bytes are read."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
