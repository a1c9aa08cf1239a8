"""dask_distributed_vanilla_spark — a PySpark-native analytics engine.

A from-scratch engine with the query and data-processing capabilities of
the reference system (a dask/distributed 2021.08 fork driving TPC-H-style
workloads — see SURVEY.md). Everything here is expressed Spark-first:
DataFrame/SQL logical plans optimized by Catalyst, shuffles and memory
managed by Spark core, Python only at the declarative layer (plus
Arrow-batched pandas UDFs where semantics require them).

Layout:
  session.py    — SparkSession factory tuned for analytics at scale
  catalog.py    — table registry over the parquet star schema
  operators/    — relational query suite (TPC-H tier), event analytics,
                  dedup / similarity / text / multimodal pipeline operators
  functions/    — reusable column expression builders (vectors, dates)
  sources/      — readers (parquet, delimited text mirroring the
                  reference's dbgen ingest)
  plans/        — query registry + canonicalization contract
  streaming/    — Structured Streaming twins of the batch event analytics
  client.py     — futures/Client facade (submit/map/gather/scatter...)
"""

from dask_distributed_vanilla_spark.session import get_spark  # noqa: F401
from dask_distributed_vanilla_spark.catalog import load_table, register_views  # noqa: F401

__version__ = "0.1.0"
