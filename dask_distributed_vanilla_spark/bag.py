"""Bag — the unordered-collection-of-Python-objects analog.

SURVEY.md §1.1 maps dask.bag onto the RDD layer (the reference exercises
bags via map/count/groupby in `distributed/tests/test_collections.py:
109-113`). The rule here is the same as everywhere else in this engine:
stay a Bag only while the data is genuinely opaque Python objects;
`to_dataframe` converts to the columnar/Catalyst world the moment a
schema appears, because RDD lambdas forgo codegen, pushdown, and AQE.

Scale notes: `foldby` is aggregateByKey (map-side combine — one shuffle
of combined partials, the same shape as a DataFrame partial agg);
`frequencies` rides the same path with +1/sum; plain `groupby` is the
full-shuffle variant and is deliberately NOT offered.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class Bag:
    """A thin, lazy wrapper over an RDD of Python objects."""

    def __init__(self, rdd):
        self.rdd = rdd

    # -- construction ------------------------------------------------------
    @classmethod
    def from_sequence(
        cls, spark: SparkSession, seq: Iterable[Any], npartitions: int | None = None
    ) -> Bag:
        items = list(seq)
        n = npartitions or min(len(items), spark.sparkContext.defaultParallelism) or 1
        return cls(spark.sparkContext.parallelize(items, n))

    # -- transformations (lazy) --------------------------------------------
    def map(self, fn: Callable[[Any], Any]) -> Bag:
        return Bag(self.rdd.map(fn))

    def filter(self, pred: Callable[[Any], bool]) -> Bag:
        return Bag(self.rdd.filter(pred))

    def flatten(self) -> Bag:
        return Bag(self.rdd.flatMap(lambda x: x))

    def foldby(
        self,
        key: Callable[[Any], Any],
        binop: Callable[[Any, Any], Any],
        initial: Any,
        combine: Callable[[Any, Any], Any] | None = None,
    ) -> Bag:
        """Per-key combine-then-merge (dask bag.foldby): aggregateByKey
        gives map-side partial aggregation, so the shuffle carries one
        partial per (partition, key) — never the raw elements.

        ``combine`` merges two cross-partition partials (dask's separate
        ``combine`` argument, ref dask/bag/core.py foldby). It defaults to
        ``binop`` — correct whenever partials have the same type as
        elements (max, min, sum); pass an explicit combine when they
        don't (e.g. binop builds a set, combine unions two sets)."""
        comb = combine if combine is not None else binop
        return Bag(
            self.rdd.map(lambda x: (key(x), x)).aggregateByKey(initial, binop, comb)
        )

    def frequencies(self) -> Bag:
        return Bag(self.rdd.map(lambda x: (x, 1)).reduceByKey(lambda a, b: a + b))

    def distinct(self) -> Bag:
        return Bag(self.rdd.distinct())

    def pluck(self, key: Any) -> Bag:
        """Extract a field from each element (dask bag.pluck)."""
        return Bag(self.rdd.map(lambda x: x[key]))

    def topk(self, k: int, key: Callable[[Any], Any] | None = None) -> list[Any]:
        """Largest k elements (dask bag.topk): per-partition heaps merged
        at the driver — only k survivors per partition move."""
        return self.rdd.top(k, key=key) if key else self.rdd.top(k)

    # -- actions / exits ----------------------------------------------------
    def count(self) -> int:
        return self.rdd.count()

    def take(self, n: int) -> list[Any]:
        return self.rdd.take(n)

    def compute(self) -> list[Any]:
        return self.rdd.collect()

    def to_dataframe(self, spark: SparkSession, schema: str) -> DataFrame:
        """Cross into the columnar world — the preferred exit the moment
        the objects have a schema."""
        return spark.createDataFrame(self.rdd, schema)


