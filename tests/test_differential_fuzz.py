"""Property-based differential testing: random filter+aggregate queries
must agree between the Spark engine and DuckDB on the same parquet.

Extends the reference's fixed-expression differential suite
(`distributed/tests/test_collections.py:58-66`) with generated cases —
the operator semantics (predicate evaluation, null handling, date
comparison, conjunction logic, aggregate math) get exercised across a
space no hand-written list covers.

Floats: aggregates compare rounded to 2 decimals after a half-up on the
binary value (same contract as the judged suite).
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from dask_distributed_vanilla_spark.catalog import load_table
from tests.conftest import SF_SMOKE

NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
STR_COLS = {"l_returnflag": ["A", "N", "R"], "l_linestatus": ["F", "O"]}
DATE_COL = "l_shipdate"
DATES = ["1995-06-01", "1996-01-01", "1997-03-15", "1999-12-31", "2001-01-01"]
OPS = ["<", "<=", ">", ">=", "=", "<>"]


@st.composite
def predicates(draw):
    kind = draw(st.sampled_from(["num", "str", "date", "in", "between"]))
    if kind == "num":
        col = draw(st.sampled_from(NUM_COLS))
        op = draw(st.sampled_from(OPS))
        val = draw(
            st.sampled_from([0.02, 0.05, 0.08, 1.0, 10.0, 25.0, 49.0, 900.0, 50000.0])
        )
        return f"{col} {op} {val}"
    if kind == "str":
        col = draw(st.sampled_from(list(STR_COLS)))
        op = draw(st.sampled_from(["=", "<>"]))
        val = draw(st.sampled_from(STR_COLS[col]))
        return f"{col} {op} '{val}'"
    if kind == "date":
        op = draw(st.sampled_from(OPS))
        val = draw(st.sampled_from(DATES))
        return f"{DATE_COL} {op} TIMESTAMP '{val} 00:00:00'"
    if kind == "in":
        col = draw(st.sampled_from(list(STR_COLS)))
        vals = draw(st.lists(st.sampled_from(STR_COLS[col]), min_size=1, max_size=3, unique=True))
        lst = ", ".join(f"'{v}'" for v in vals)
        return f"{col} IN ({lst})"
    col = draw(st.sampled_from(NUM_COLS))
    lo = draw(st.sampled_from([0.0, 0.03, 1.0, 5.0, 20.0]))
    hi = lo + draw(st.sampled_from([0.02, 0.5, 10.0, 30.0]))
    return f"{col} BETWEEN {lo} AND {hi}"


@st.composite
def queries(draw):
    preds = draw(st.lists(predicates(), min_size=1, max_size=4))
    joiner = draw(st.sampled_from([" AND ", " OR "]))
    where = joiner.join(f"({p})" for p in preds)
    negate = draw(st.booleans())
    if negate:
        where = f"NOT ({where})"
    agg_col = draw(st.sampled_from(NUM_COLS))
    agg_fn = draw(st.sampled_from(["SUM", "MIN", "MAX", "COUNT", "AVG"]))
    group = draw(st.sampled_from([None, "l_returnflag", "l_linestatus"]))
    return where, agg_fn, agg_col, group


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{SF_SMOKE}/lineitem.parquet'"
    )
    yield con
    con.close()


def _canon(rows):
    out = set()
    for key, n, v in rows:
        if v is None or (isinstance(v, float) and math.isnan(v)):
            vr = None
        else:
            vr = math.floor(float(v) * 100 + 0.5) / 100
        out.add((key, n, vr))
    return out


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(q=queries())
def test_random_filter_agg_matches_duckdb(spark_fuzz, duck, q):
    where, agg_fn, agg_col, group = q
    key = group if group else "'all'"
    sql = (
        f"SELECT {key} AS k, COUNT(*) AS n, {agg_fn}({agg_col}) AS v "
        f"FROM lineitem WHERE {where} GROUP BY 1"
    )
    want = _canon(duck.execute(sql).fetchall())
    got_df = spark_fuzz.sql(sql)
    got = _canon([(r.k, r.n, r.v) for r in got_df.collect()])
    assert got == want, f"\nquery: {sql}\nspark: {sorted(got)[:5]}\nduck:  {sorted(want)[:5]}"


@pytest.fixture(scope="module")
def spark_fuzz(spark):
    load_table(spark, SF_SMOKE, "lineitem").createOrReplaceTempView("lineitem")
    return spark


O_PREDS = [
    "o_totalprice > 100000",
    "o_totalprice <= 250000",
    "o_orderpriority IN ('1-URGENT', '2-HIGH')",
    "o_orderstatus = 'F'",
    "o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'",
    "o_orderdate < TIMESTAMP '1999-06-01 00:00:00'",
]


@st.composite
def join_queries(draw):
    lpred = draw(predicates())
    opred = draw(st.sampled_from(O_PREDS))
    jtype = draw(st.sampled_from(["JOIN", "LEFT JOIN"]))
    agg_col = draw(st.sampled_from(NUM_COLS))
    agg_fn = draw(st.sampled_from(["SUM", "MIN", "MAX", "COUNT"]))
    return lpred, opred, jtype, agg_fn, agg_col


@pytest.fixture(scope="module")
def duck_join(duck):
    duck.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF_SMOKE}/orders.parquet'")
    return duck


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(q=join_queries())
def test_random_join_agg_matches_duckdb(spark_fuzz_join, duck_join, q):
    """Join semantics fuzzed: inner and left-outer orders x lineitem with
    random predicates on both sides (outer-side predicates live in the ON
    clause so NULL-extension is exercised), aggregated per priority."""
    lpred, opred, jtype, agg_fn, agg_col = q
    sql = (
        f"SELECT o_orderpriority AS k, COUNT(*) AS n, {agg_fn}({agg_col}) AS v "
        f"FROM orders {jtype} lineitem ON l_orderkey = o_orderkey AND ({lpred}) "
        f"WHERE {opred} GROUP BY 1"
    )
    want = _canon(duck_join.execute(sql).fetchall())
    got = _canon([(r.k, r.n, r.v) for r in spark_fuzz_join.sql(sql).collect()])
    assert got == want, f"\nquery: {sql}\nspark: {sorted(got)[:5]}\nduck:  {sorted(want)[:5]}"


@pytest.fixture(scope="module")
def spark_fuzz_join(spark_fuzz):
    load_table(spark_fuzz, SF_SMOKE, "orders").createOrReplaceTempView("orders")
    return spark_fuzz


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(q=queries())
def test_random_filter_dataframe_api_matches_sql(spark_fuzz, q):
    """The DataFrame-API expression builder and spark.sql must agree —
    the facade promise, fuzzed."""
    where, _, _, _ = q
    li = load_table(spark_fuzz, SF_SMOKE, "lineitem")
    n_api = li.where(F.expr(where)).count()
    n_sql = spark_fuzz.sql(f"SELECT COUNT(*) AS n FROM lineitem WHERE {where}").collect()[0].n
    assert n_api == n_sql


@st.composite
def window_queries(draw):
    pcol = draw(st.sampled_from(["l_returnflag", "l_linestatus"]))
    ocol = draw(st.sampled_from(["l_shipdate", "l_extendedprice", "l_quantity"]))
    rankfn = draw(st.sampled_from(["ROW_NUMBER()", "RANK()", "DENSE_RANK()"]))
    ncol = draw(st.sampled_from(NUM_COLS))
    frame = draw(
        st.sampled_from(
            [
                "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
                "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW",
                "ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING",
            ]
        )
    )
    wagg = draw(st.sampled_from(["SUM", "AVG", "MIN", "MAX"]))
    pred = draw(predicates())
    return pcol, ocol, rankfn, ncol, frame, wagg, pred


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(q=window_queries())
def test_random_window_functions_match_duckdb(spark_fuzz, duck, q):
    """Window semantics fuzzed: ranking functions and ROWS-frame
    aggregates over a deterministic total order (unique tiebreak), value
    columns rounded with the judged suite's half-up contract. Covers
    frame arithmetic (trailing, offset, unbounded), rank-vs-row
    agreement under a total order, and NULL-free frame edges."""
    pcol, ocol, rankfn, ncol, frame, wagg, pred = q
    order = f"{ocol}, l_orderkey, l_linenumber"
    sql = (
        f"SELECT k, rn, v FROM ("
        f"  SELECT {pcol} AS k,"
        f"         {rankfn} OVER (PARTITION BY {pcol} ORDER BY {order}) AS rn,"
        f"         {wagg}({ncol}) OVER (PARTITION BY {pcol} ORDER BY {order} {frame}) AS v"
        f"  FROM lineitem WHERE {pred}"
        f") WHERE rn <= 20"
    )
    want = _canon(duck.execute(sql).fetchall())
    got = _canon([(r.k, r.rn, r.v) for r in spark_fuzz.sql(sql).collect()])
    assert got == want, f"\nquery: {sql}\nspark: {sorted(got)[:5]}\nduck:  {sorted(want)[:5]}"


@st.composite
def scalar_exprs(draw):
    """Random scalar expression over documents(text, lang) using only
    functions whose name AND semantics agree between Spark SQL and
    DuckDB (character-counting substr, char-wise reverse, ANSI trim,
    || concat; case functions restricted to the ASCII lang column to
    stay clear of locale-dependent case mapping)."""
    base = draw(st.sampled_from(["text", "lang"]))
    kind = draw(
        st.sampled_from(["substr", "trim", "reverse", "len", "concat", "case"])
    )
    if kind == "substr":
        i = draw(st.integers(min_value=1, max_value=12))
        n = draw(st.integers(min_value=0, max_value=20))
        return f"substr({base}, {i}, {n})"
    if kind == "trim":
        return f"trim({base})"
    if kind == "reverse":
        return f"reverse(substr({base}, 1, 16))"
    if kind == "len":
        return f"CAST(length({base}) AS BIGINT)"
    if kind == "concat":
        return f"lang || ':' || substr({base}, 1, 8)"
    return draw(st.sampled_from(["upper(lang)", "lower(upper(lang))"]))


@st.composite
def date_exprs(draw):
    kind = draw(st.sampled_from(["year", "month", "trunc", "shift"]))
    if kind == "year":
        return "CAST(year(ts) AS BIGINT)"
    if kind == "month":
        return "CAST(month(ts) AS BIGINT)"
    if kind == "trunc":
        # 'day' yields DATE in DuckDB but TIMESTAMP in Spark — cast both
        g = draw(st.sampled_from(["day", "hour", "minute"]))
        return f"CAST(date_trunc('{g}', ts) AS TIMESTAMP)"
    n = draw(st.integers(min_value=1, max_value=30))
    unit = draw(st.sampled_from(["DAY", "HOUR"]))
    return f"ts + INTERVAL {n} {unit}"


@pytest.fixture(scope="module")
def duck_scalar(duck):
    duck.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_SMOKE}/documents.parquet'"
    )
    return duck


@pytest.fixture(scope="module")
def spark_fuzz_scalar(spark_fuzz):
    load_table(spark_fuzz, SF_SMOKE, "documents").createOrReplaceTempView("documents")
    load_table(spark_fuzz, SF_SMOKE, "events").createOrReplaceTempView("events_fz")
    return spark_fuzz


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(e=scalar_exprs())
def test_random_string_exprs_match_duckdb(spark_fuzz_scalar, duck_scalar, e):
    sql = f"SELECT doc_id, {e} AS v FROM documents"
    want = {(r[0], r[1]) for r in duck_scalar.execute(sql).fetchall()}
    got = {(r.doc_id, r.v) for r in spark_fuzz_scalar.sql(sql).collect()}
    assert got == want, f"\nexpr: {e}"


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(e=date_exprs())
def test_random_date_exprs_match_duckdb(spark_fuzz_scalar, duck, e):
    duck.execute(
        f"CREATE VIEW IF NOT EXISTS events_fz AS "
        f"SELECT event_id, ts FROM '{SF_SMOKE}/events.parquet'"
    )
    sql = f"SELECT event_id, {e} AS v FROM events_fz"
    want = {(r[0], r[1]) for r in duck.execute(sql).fetchall()}
    got = {(r.event_id, r.v) for r in spark_fuzz_scalar.sql(sql).collect()}
    assert got == want, f"\nexpr: {e}"


# ---------------------------------------------------------------------------
# NULL-semantics domain: the TPC-H fixtures carry no NULLs, so aggregate
# null-skipping, all-NULL groups (SUM -> NULL, COUNT(col) -> 0), NULL
# group keys collapsing into one group, and three-valued predicate logic
# never get exercised above. A seeded nullable table closes that hole.
# ---------------------------------------------------------------------------

NULLABLE_AGGS = ["SUM", "MIN", "MAX", "AVG", "COUNT"]
N_PREDS = [
    "x > 5",
    "x <= 3",
    "x IS NULL",
    "x IS NOT NULL",
    "x > 5 OR k IS NULL",
    "NOT (x < 8)",          # three-valued: NULL x stays excluded
    "COALESCE(x, -1) < 0",  # null-coalescing path
    "1 = 1",
]


@pytest.fixture(scope="module")
def nullable_views(spark_fuzz, duck):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    n = 2000
    pdf = pd.DataFrame(
        {
            "k": [None if rng.random() < 0.15 else f"g{rng.integers(0, 5)}" for _ in range(n)],
            "x": [None if rng.random() < 0.25 else float(rng.integers(0, 11)) for _ in range(n)],
            "y": [None if rng.random() < 0.5 else float(rng.integers(-5, 6)) for _ in range(n)],
        }
    )
    pdf = pdf.astype({"x": "float64", "y": "float64"})
    spark_fuzz.createDataFrame(pdf).createOrReplaceTempView("nullable_t")
    duck.register("nullable_t", pdf)
    return spark_fuzz, duck


@st.composite
def null_queries(draw):
    pred = draw(st.sampled_from(N_PREDS))
    agg_fn = draw(st.sampled_from(NULLABLE_AGGS))
    agg_col = draw(st.sampled_from(["x", "y"]))
    count_star = draw(st.booleans())
    return pred, agg_fn, agg_col, count_star


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(q=null_queries())
def test_null_semantics_agg_matches_duckdb(nullable_views, q):
    """NULL group keys group together, aggregates skip NULLs, all-NULL
    groups yield NULL (except COUNT -> 0), and predicates follow
    three-valued logic — fuzzed against DuckDB on a seeded table."""
    sparkf, duckc = nullable_views
    pred, agg_fn, agg_col, count_star = q
    cnt = "COUNT(*)" if count_star else f"COUNT({agg_col})"
    sql = (
        f"SELECT COALESCE(k, '<null>') AS k, {cnt} AS n, {agg_fn}({agg_col}) AS v "
        f"FROM nullable_t WHERE {pred} GROUP BY 1"
    )
    want = _canon(duckc.execute(sql).fetchall())
    got = _canon([(r.k, r.n, r.v) for r in sparkf.sql(sql).collect()])
    assert got == want, f"\nquery: {sql}\nspark: {sorted(got)[:5]}\nduck:  {sorted(want)[:5]}"
