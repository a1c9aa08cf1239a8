"""Pandas/dask-parity facade over Spark DataFrames (SURVEY.md §7.1 M3).

Lets reference-style query code (the dask.dataframe idioms of
`benchmark/tpch/queries.py`) run near-verbatim on the Spark engine:
boolean-mask filters (`queries.py:27`), column assignment
(`queries.py:51-54`), `merge` with left_on/right_on and pandas suffix
semantics (`queries.py:109-134`), dict-`agg` groupbys with key sorting
(`queries.py:56-66`), `nlargest` (`queries.py:220`), `isin`/`where`
(`queries.py:593`, `526-531`), the `.str` accessor (`queries.py:120`,
`446`), scalar Series reductions (`queries.py:319`), `unique`/
`drop_duplicates` (`queries.py:706`, `test_collections.py:63`), and
`groupby(...).apply(fn, schema=...)` → `applyInPandas`
(`test_collections.py:163-186`; the `schema=` argument is dask's
`meta=` made explicit, §7.3).

Everything is a thin wrapper building the same lazy Spark logical plan —
no data moves until `.compute()`/`.collect()` — so facade queries get
the identical Catalyst treatment as native DataFrame code.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_AGG_FNS = {
    "sum": F.sum,
    "mean": F.avg,
    "avg": F.avg,
    "count": F.count,
    "min": F.min,
    "max": F.max,
    "std": F.stddev,
    "nunique": F.countDistinct,
}


class StrAccessor:
    """`.str` methods (reference `queries.py:120, 446, 588`)."""

    def __init__(self, series: Series):
        self._s = series

    def startswith(self, prefix: str) -> Series:
        return self._s._wrap(self._s._col.startswith(prefix))

    def endswith(self, suffix: str) -> Series:
        return self._s._wrap(self._s._col.endswith(suffix))

    def contains(self, pat: str) -> Series:
        return self._s._wrap(self._s._col.contains(pat))

    def __getitem__(self, sl: slice) -> Series:
        # col.str[a:b] — string slice (reference queries.py:372 year extract)
        start = sl.start or 0
        length = (sl.stop - start) if sl.stop is not None else 2**31 - 1
        return self._s._wrap(F.substring(self._s._col, start + 1, length))


class Series:
    """A column bound to its frame; arithmetic/comparison ops build
    Column expressions, scalar reductions run a Spark agg."""

    def __init__(self, df: DataFrame, col: Column):
        self._df = df
        self._col = col

    def _wrap(self, col: Column) -> Series:
        return Series(self._df, col)

    def _other(self, other: Any) -> Column | Any:
        return other._col if isinstance(other, Series) else other

    # arithmetic (queries.py:51-54)
    def __add__(self, o):
        return self._wrap(self._col + self._other(o))

    def __radd__(self, o):
        return self._wrap(self._other(o) + self._col)

    def __sub__(self, o):
        return self._wrap(self._col - self._other(o))

    def __rsub__(self, o):
        return self._wrap(self._other(o) - self._col)

    def __mul__(self, o):
        return self._wrap(self._col * self._other(o))

    def __rmul__(self, o):
        return self._wrap(self._other(o) * self._col)

    def __truediv__(self, o):
        return self._wrap(self._col / self._other(o))

    # comparisons (queries.py:109-134, 162, 249, 305, 429)
    def __eq__(self, o):  # type: ignore[override]
        return self._wrap(self._col == self._other(o))

    def __ne__(self, o):  # type: ignore[override]
        return self._wrap(self._col != self._other(o))

    def __lt__(self, o):
        return self._wrap(self._col < self._other(o))

    def __le__(self, o):
        return self._wrap(self._col <= self._other(o))

    def __gt__(self, o):
        return self._wrap(self._col > self._other(o))

    def __ge__(self, o):
        return self._wrap(self._col >= self._other(o))

    # boolean combinators (queries.py:300-306, 345, 564)
    def __and__(self, o):
        return self._wrap(self._col & self._other(o))

    def __or__(self, o):
        return self._wrap(self._col | self._other(o))

    def __invert__(self):
        return self._wrap(~self._col)

    def isin(self, values) -> Series:
        return self._wrap(self._col.isin(list(values)))

    def where(self, cond: Series, other: Any) -> Series:
        """Pandas `s.where(cond, other)` (queries.py:526-531) =
        CASE WHEN cond THEN s ELSE other."""
        return self._wrap(F.when(cond._col, self._col).otherwise(self._other(other)))

    def astype(self, dtype) -> Series:
        spark_type = {str: "string", int: "long", float: "double"}.get(dtype, str(dtype))
        return self._wrap(self._col.cast(spark_type))

    @property
    def str(self) -> StrAccessor:
        return StrAccessor(self)

    # scalar reductions (queries.py:319, 504, 565; dask needs to_frame
    # workarounds for these — Spark does not)
    def _scalar(self, fn) -> Any:
        return self._df.agg(fn(self._col).alias("v")).collect()[0]["v"]

    def sum(self):
        return self._scalar(F.sum)

    def mean(self):
        return self._scalar(F.avg)

    def max(self):
        return self._scalar(F.max)

    def min(self):
        return self._scalar(F.min)

    def count(self):
        return self._scalar(F.count)

    def isna(self) -> Series:
        return self._wrap(self._col.isNull())

    def notna(self) -> Series:
        return self._wrap(self._col.isNotNull())

    def fillna(self, value: Any) -> Series:
        return self._wrap(F.coalesce(self._col, F.lit(value)))

    def value_counts(self):
        """pandas Series.value_counts — counts desc, then value, as a
        pandas Series (driver-sized by contract, like unique())."""
        rows = (
            self._df.groupBy(self._col.alias("v"))
            .count()
            .orderBy(F.desc("count"), "v")
            .collect()
        )
        import pandas as pd

        return pd.Series({r.v: r["count"] for r in rows})

    def unique(self):
        """Distinct values (queries.py:706, 710)."""
        return [r[0] for r in self._df.select(self._col.alias("v")).distinct().collect()]

    def to_frame(self, name: str = "value") -> Frame:
        return Frame(self._df.select(self._col.alias(name)))


class GroupBy:
    def __init__(self, df: DataFrame, keys: list[str], sort: bool = True):
        self._df = df
        self._keys = keys
        self._sort = sort

    def _finish(self, out: DataFrame) -> Frame:
        # pandas groupby sorts group keys by default (queries.py:55-56)
        return Frame(out.orderBy(*self._keys) if self._sort else out)

    def agg(self, spec: dict[str, Any]) -> Frame:
        """Dict-agg (queries.py:59-66): {'col': 'sum'} or {'col': ['sum',
        'mean']}; multi-fn columns get pandas-style `col_fn` names."""
        exprs = []
        for col, fns in spec.items():
            fn_list = fns if isinstance(fns, (list, tuple)) else [fns]
            multi = len(fn_list) > 1
            for fn in fn_list:
                name = f"{col}_{fn}" if multi else col
                exprs.append(_AGG_FNS[fn](col).alias(name))
        return self._finish(self._df.groupBy(*self._keys).agg(*exprs))

    def apply(self, fn, schema: str) -> Frame:
        """Group-wise pandas UDF (test_collections.py:163-186). `schema`
        is dask's `meta=` made explicit — Spark must know the output
        shape up front (SURVEY.md §7.3)."""
        return Frame(self._df.groupBy(*self._keys).applyInPandas(fn, schema))

    def size(self) -> Frame:
        return self._finish(self._df.groupBy(*self._keys).agg(F.count(F.lit(1)).alias("size")))

    def __getattr__(self, fn_name: str):
        if fn_name not in _AGG_FNS:
            raise AttributeError(fn_name)

        def method(*cols: str) -> Frame:
            targets = list(cols) or [c for c in self._df.columns if c not in self._keys]
            return self._finish(
                self._df.groupBy(*self._keys).agg(
                    *[_AGG_FNS[fn_name](c).alias(c) for c in targets]
                )
            )

        return method


class _LocIndexer:
    """Label-range slicing on the declared index column (reference
    `distributed/tests/test_collections.py:143-160`): `.loc[a:b]` is the
    inclusive label slice; after ``set_index`` the frame is
    range-partitioned on the index so the predicate prunes partitions
    instead of scanning all of them."""

    def __init__(self, frame: Frame):
        self._f = frame

    def __getitem__(self, key):
        f = self._f
        if f._index is None:
            raise TypeError(".loc needs an index — call set_index(col) first")
        c = F.col(f._index)
        if isinstance(key, slice):
            if key.step is not None:
                raise ValueError(".loc label slices take no step")
            df = f.df
            if key.start is not None and key.stop is not None:
                df = df.where(c.between(key.start, key.stop))
            elif key.start is not None:
                df = df.where(c >= key.start)
            elif key.stop is not None:
                df = df.where(c <= key.stop)
            return f._with_index(df)
        return f._with_index(f.df.where(c == key))


class Frame:
    """The dask.dataframe-shaped wrapper. `.df` exposes the underlying
    Spark DataFrame at any point — the facade is sugar, not a wall."""

    def __init__(self, df: DataFrame):
        self.df = df
        self._index: str | None = None

    def _with_index(self, df: DataFrame) -> Frame:
        out = Frame(df)
        out._index = self._index
        return out

    def set_index(self, col: str, npartitions: int | None = None) -> Frame:
        """The reference's ``set_index(col, shuffle="tasks")`` idiom
        (`test_collections.py:117-131`): one range shuffle on the column
        plus an in-partition sort. Rows end up globally ordered across
        partitions with co-located key ranges — the layout `.loc` range
        slices and merge joins on the index exploit. At scale this is the
        sorted-table materialization step, so persist() after it if it
        will be sliced repeatedly."""
        df = self.df
        part = df.repartitionByRange(npartitions, F.col(col)) if npartitions else df.repartitionByRange(F.col(col))
        out = Frame(part.sortWithinPartitions(col))
        out._index = col
        return out

    @property
    def loc(self) -> _LocIndexer:
        return _LocIndexer(self)

    # -- projection / assignment -----------------------------------------
    def __getitem__(self, key):
        if isinstance(key, str):
            return Series(self.df, F.col(key))
        if isinstance(key, list):
            return Frame(self.df.select(*key))
        if isinstance(key, Series):  # boolean mask (queries.py:27)
            return Frame(self.df.where(key._col))
        raise TypeError(f"cannot index Frame with {type(key)}")

    def __setitem__(self, name: str, value):
        col = value._col if isinstance(value, Series) else F.lit(value)
        self.df = self.df.withColumn(name, col)

    @property
    def columns(self) -> list[str]:
        return self.df.columns

    @columns.setter
    def columns(self, names: list[str]) -> None:
        # wholesale rename (queries.py:68-77)
        self.df = self.df.toDF(*names)

    def rename(self, columns: dict[str, str]) -> Frame:
        out = self.df
        for old, new in columns.items():
            out = out.withColumnRenamed(old, new)
        return Frame(out)

    def drop(self, columns: list[str] | str) -> Frame:
        cols = [columns] if isinstance(columns, str) else columns
        return Frame(self.df.drop(*cols))

    # -- joins (queries.py:109-134, 620, 798) -----------------------------
    def merge(
        self,
        other: Frame,
        how: str = "inner",
        on: str | list[str] | None = None,
        left_on: str | list[str] | None = None,
        right_on: str | list[str] | None = None,
        suffixes: tuple[str, str] = ("_x", "_y"),
    ) -> Frame:
        left, right = self.df, other.df
        if on is None and left_on is None:
            on = [c for c in left.columns if c in right.columns]  # natural join
        if on is not None:
            keys = [on] if isinstance(on, str) else list(on)
            lk = rk = keys
        else:
            lk = [left_on] if isinstance(left_on, str) else list(left_on)
            rk = [right_on] if isinstance(right_on, str) else list(right_on)
            if len(lk) != len(rk):
                raise ValueError(
                    f"left_on has {len(lk)} keys but right_on has {len(rk)}"
                )
        # pandas suffix semantics on overlapping non-key columns
        overlap = [c for c in left.columns if c in right.columns and c not in set(lk) | set(rk)]
        for c in overlap:
            left = left.withColumnRenamed(c, c + suffixes[0])
            right = right.withColumnRenamed(c, c + suffixes[1])
        if lk == rk:
            joined = left.join(right, on=lk, how=how)
        else:
            cond = None
            for lcol, rcol in zip(lk, rk):
                piece = left[lcol] == right[rcol]
                cond = piece if cond is None else (cond & piece)
            joined = left.join(right, on=cond, how=how)
        return Frame(joined)

    def join(self, other: Frame, on: str, lsuffix: str = "", rsuffix: str = "") -> Frame:
        """Index-join shape (queries.py:174-177) minus the index: a merge
        with explicit suffixes."""
        return self.merge(other, on=on, suffixes=(lsuffix or "_x", rsuffix or "_y"))

    # -- groupby / dedup / sort -------------------------------------------
    def groupby(self, keys: str | list[str], sort: bool = True) -> GroupBy:
        return GroupBy(self.df, [keys] if isinstance(keys, str) else list(keys), sort)

    def drop_duplicates(self, subset: list[str] | None = None) -> Frame:
        return Frame(self.df.dropDuplicates(subset))

    def nlargest(self, n: int, columns: str | list[str]) -> Frame:
        cols = [columns] if isinstance(columns, str) else columns
        return Frame(self.df.orderBy(*[F.desc(c) for c in cols]).limit(n))

    def sort_values(self, by: str | list[str], ascending: bool = True) -> Frame:
        """Global sort — unavailable in the reference for string columns
        (queries.py:218-222); native here."""
        cols = [by] if isinstance(by, str) else by
        ordered = [F.col(c) if ascending else F.desc(c) for c in cols]
        return Frame(self.df.orderBy(*ordered))

    def reset_index(self, drop: bool = False) -> Frame:
        """Spark groupBy keeps keys as columns (SURVEY.md §2.4 flag 3) —
        the reference's reset_index dance is a no-op here."""
        return self

    def sample(self, frac: float, replace: bool = False, random_state: int | None = None) -> Frame:
        """dask/pandas ``df.sample(frac=)`` — per-partition Bernoulli (or
        Poisson, with replacement) sampling executor-side; no data ever
        moves for the rows that are dropped, so it is the right first
        stage of a 100 TB subsample."""
        return Frame(self.df.sample(withReplacement=replace, fraction=frac, seed=random_state))

    def random_split(self, frac: list[float], random_state: int | None = None) -> list[Frame]:
        """dask ``df.random_split([0.9, 0.1])`` (train/holdout split) →
        ``randomSplit``: one shared per-row draw partitions rows into
        disjoint, exhaustive frames in a single pass."""
        return [Frame(d) for d in self.df.randomSplit(list(frac), seed=random_state)]

    def nsmallest(self, n: int, columns: str | list[str]) -> Frame:
        cols = [columns] if isinstance(columns, str) else columns
        return Frame(self.df.orderBy(*cols).limit(n))

    def fillna(self, value) -> Frame:
        """pandas/dask fillna: a scalar fills every compatible column, a
        dict fills per column — both lower to Catalyst coalesce."""
        return Frame(self.df.fillna(value))

    def dropna(self, subset: list[str] | None = None) -> Frame:
        return Frame(self.df.dropna(subset=subset))

    def query(self, expr: str) -> Frame:
        """pandas df.query — the string predicate goes straight to the
        SQL parser, so it stays pushdown-eligible."""
        return Frame(self.df.where(F.expr(expr)))

    def assign(self, **cols) -> Frame:
        """pandas df.assign(new=series_or_callable)."""
        out = self.df
        for name, val in cols.items():
            if callable(val):
                val = val(Frame(out))
            col = val._col if isinstance(val, Series) else F.lit(val)
            out = out.withColumn(name, col)
        return Frame(out)

    def describe(self):
        """pandas df.describe(): count/mean/stddev/min/max per numeric
        column (one aggregate pass; quartiles via summary() when
        needed). Driver-sized by contract."""
        return self.df.describe().toPandas()

    def head(self, n: int = 5):
        return self.df.limit(n).toPandas()

    def compute(self):
        """dask's materialize — pandas out (reference §3 entry point 3)."""
        return self.df.toPandas()

    def __len__(self) -> int:
        return self.df.count()


def concat(frames: list[Frame]) -> Frame:
    """Union by name (reference pd.concat-as-task, test_collections.py:
    213-222)."""
    out = frames[0].df
    for fr in frames[1:]:
        out = out.unionByName(fr.df, allowMissingColumns=True)
    return Frame(out)
