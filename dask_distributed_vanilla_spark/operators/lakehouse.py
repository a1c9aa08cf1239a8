"""Lakehouse-style table maintenance operators: MERGE upsert and
multi-dimensional (z-order) layout keys.

The reference has no table-maintenance surface (its sinks are
`client.persist`/`publish_dataset`, SURVEY.md §2.1), but any engine that
ingests a 100 TB lake needs the two ops here:

* ``merge_upsert`` — SCD-type-1 MERGE of a change batch into a current-
  state snapshot (the shape `MERGE INTO target USING source ON key WHEN
  MATCHED THEN UPDATE WHEN NOT MATCHED THEN INSERT` lowers to in every
  lakehouse engine): one full-outer join on the merge key + coalesce.
* ``zorder_layout`` — interleaved-bit z-values over two dimensions; data
  sorted/written by this key gives parquet min-max pruning on BOTH
  dimensions instead of one (the layout trick behind Delta OPTIMIZE
  ZORDER / Hudi clustering).

Scale notes: the MERGE join shuffles both sides on the merge key once;
with a daily delta vs a large snapshot the delta side is broadcast-able
and AQE picks that up from its runtime size. The z-value is a pure
column expression (bit shifts/adds, whole-stage codegen) — computing it
over 100 TB is scan-bound, and the subsequent repartitionByRange on the
z-value is the one shuffle any re-clustering pass needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dask_distributed_vanilla_spark.catalog import load_table

# SCD1 split point: state before vs change batch on/after this instant.
MERGE_SPLIT = "2024-01-16 00:00:00"


def _latest_state(ev: DataFrame) -> DataFrame:
    """Current-state row (latest by ts, event_id tiebreak) per user."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", (F.floor((F.col("value")) * 100 + F.lit(0.5)) / 100).alias("value"), "ts")
    )


def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-1 MERGE: apply the change batch (events on/after
    MERGE_SPLIT, reduced to latest-per-user) onto the snapshot (latest
    state before MERGE_SPLIT).

    WHEN MATCHED → overwrite with the source row (action 'updated');
    WHEN NOT MATCHED → insert the source row ('inserted'); target rows
    without a source row survive unchanged ('unchanged'). Lowered to a
    full-outer join + coalesce — the exact physical plan a Delta/Iceberg
    MERGE produces after its file-pruning phase.
    """
    ev = load_table(spark, sf_dir, "events")
    split = F.lit(MERGE_SPLIT).cast("timestamp")
    target = _latest_state(ev.filter(F.col("ts") < split))
    source = _latest_state(ev.filter(F.col("ts") >= split))
    t = target.alias("t")
    s = source.alias("s")
    return (
        t.join(s, F.col("t.user_id") == F.col("s.user_id"), "full_outer")
        .select(
            F.coalesce(F.col("t.user_id"), F.col("s.user_id")).alias("user_id"),
            F.coalesce(F.col("s.value"), F.col("t.value")).alias("value"),
            F.coalesce(F.col("s.ts"), F.col("t.ts")).alias("ts"),
            F.when(F.col("s.user_id").isNull(), F.lit("unchanged"))
            .when(F.col("t.user_id").isNull(), F.lit("inserted"))
            .otherwise(F.lit("updated"))
            .alias("action"),
        )
        .orderBy("user_id")
    )


MERGE_UPSERT_SQL = f"""
WITH ranked AS (
  SELECT user_id, FLOOR((value) * 100 + 0.5) / 100 AS value, ts,
         CASE WHEN ts < TIMESTAMP '{MERGE_SPLIT}' THEN 't' ELSE 's' END AS side,
         ROW_NUMBER() OVER (
           PARTITION BY user_id,
                        CASE WHEN ts < TIMESTAMP '{MERGE_SPLIT}' THEN 't' ELSE 's' END
           ORDER BY ts DESC, event_id DESC) AS rn
  FROM events),
tgt AS (SELECT user_id, value, ts FROM ranked WHERE side = 't' AND rn = 1),
src AS (SELECT user_id, value, ts FROM ranked WHERE side = 's' AND rn = 1)
SELECT COALESCE(t.user_id, s.user_id) AS user_id,
       COALESCE(s.value, t.value) AS value,
       COALESCE(s.ts, t.ts) AS ts,
       CASE WHEN s.user_id IS NULL THEN 'unchanged'
            WHEN t.user_id IS NULL THEN 'inserted'
            ELSE 'updated' END AS action
FROM tgt t FULL OUTER JOIN src s ON t.user_id = s.user_id
ORDER BY user_id
"""


# 16 bits per dimension → 32-bit z-value; masks keep inputs in range.
Z_BITS = 16
Z_EPOCH = "1992-01-01"


def _zvalue_spark(x, y):
    """Interleave the low Z_BITS of x (even positions) and y (odd)."""
    terms = []
    for i in range(Z_BITS):
        terms.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def _zvalue_sql(x: str, y: str) -> str:
    terms = []
    for i in range(Z_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout keys over orders: interleave (o_custkey,
    days-since-epoch of o_orderdate) and return the 20 lowest-z rows.

    Sorting the table by ``zval`` (repartitionByRange + sortWithinPartitions
    in a real re-clustering pass; see `write_zordered`) co-locates rows
    that are close in BOTH customer and date, so parquet min-max stats
    prune either predicate. The z-value itself is pure bit arithmetic —
    codegen'd, no UDF, no shuffle.
    """
    orders = load_table(spark, sf_dir, "orders")
    x = F.col("o_custkey").cast("long").bitwiseAND(F.lit((1 << Z_BITS) - 1))
    d = F.datediff(F.col("o_orderdate"), F.lit(Z_EPOCH).cast("date")).cast("long")
    y = d.bitwiseAND(F.lit((1 << Z_BITS) - 1))
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            d.alias("d"),
            _zvalue_spark(x, y).alias("zval"),
        )
        .orderBy("zval", "o_orderkey")
        .limit(20)
    )


ZORDER_SQL = f"""
WITH z AS (
  SELECT o_orderkey, o_custkey,
         date_diff('day', DATE '{Z_EPOCH}', o_orderdate) AS d,
         {_zvalue_sql(f"(o_custkey & {(1 << Z_BITS) - 1})", f"(date_diff('day', DATE '{Z_EPOCH}', o_orderdate) & {(1 << Z_BITS) - 1})")} AS zval
  FROM orders)
SELECT o_orderkey, o_custkey, d, zval
FROM z ORDER BY zval, o_orderkey LIMIT 20
"""


def write_zordered(df: DataFrame, path: str, zcol: str, n_files: int) -> None:
    """Re-cluster `df` by an already-computed z-value column: range
    partition on it (one shuffle) + sort within partitions, so each
    output file covers a tight z-range → tight min-max on both source
    dimensions."""
    (
        df.repartitionByRange(n_files, zcol)
        .sortWithinPartitions(zcol)
        .write.mode("overwrite")
        .parquet(path)
    )


# Two consecutive 10-day activity windows: the CDC comparison states.
DIFF_W1 = ("2024-01-01 00:00:00", "2024-01-11 00:00:00")
DIFF_W2 = ("2024-01-11 00:00:00", "2024-01-21 00:00:00")


def _window_state(ev: DataFrame, lo: str, hi: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.filter(
            (F.col("ts") >= F.lit(lo).cast("timestamp"))
            & (F.col("ts") < F.lit(hi).cast("timestamp"))
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", (F.floor((F.col("value")) * 100 + F.lit(0.5)) / 100).alias("value"))
    )


def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data extraction between two table states: diff the
    per-user latest-value snapshot of one activity window against the
    next, emitting insert / delete / update / unchanged rows — the diff
    that feeds incremental materialized-view maintenance and CDC
    downstream (Delta CDF produces exactly this row shape).

    One full-outer join on the snapshot key; each snapshot is one
    windowed shuffle of its slice. At scale both sides prune their scan
    to the window's partitions (the fixture's month is one folder of a
    date-partitioned lake) and the join key carries no payload beyond
    the compared columns.
    """
    ev = load_table(spark, sf_dir, "events")
    a = _window_state(ev, *DIFF_W1).alias("a")
    b = _window_state(ev, *DIFF_W2).alias("b")
    return (
        a.join(b, F.col("a.user_id") == F.col("b.user_id"), "full_outer")
        .select(
            F.coalesce(F.col("a.user_id"), F.col("b.user_id")).alias("user_id"),
            F.col("a.value").alias("old_value"),
            F.col("b.value").alias("new_value"),
            F.when(F.col("a.user_id").isNull(), F.lit("insert"))
            .when(F.col("b.user_id").isNull(), F.lit("delete"))
            .when(F.col("a.value") == F.col("b.value"), F.lit("unchanged"))
            .otherwise(F.lit("update"))
            .alias("change_type"),
        )
        .orderBy("user_id")
    )


SNAPSHOT_DIFF_SQL = f"""
WITH ranked AS (
  SELECT user_id, FLOOR((value) * 100 + 0.5) / 100 AS value, ts, event_id,
         CASE WHEN ts >= TIMESTAMP '{DIFF_W1[0]}' AND ts < TIMESTAMP '{DIFF_W1[1]}'
              THEN 'a' ELSE 'b' END AS side
  FROM events
  WHERE ts >= TIMESTAMP '{DIFF_W1[0]}' AND ts < TIMESTAMP '{DIFF_W2[1]}'),
states AS (
  SELECT side, user_id, value,
         ROW_NUMBER() OVER (PARTITION BY side, user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM ranked),
a AS (SELECT user_id, value FROM states WHERE side = 'a' AND rn = 1),
b AS (SELECT user_id, value FROM states WHERE side = 'b' AND rn = 1)
SELECT COALESCE(a.user_id, b.user_id) AS user_id,
       a.value AS old_value,
       b.value AS new_value,
       CASE WHEN a.user_id IS NULL THEN 'insert'
            WHEN b.user_id IS NULL THEN 'delete'
            WHEN a.value = b.value THEN 'unchanged'
            ELSE 'update' END AS change_type
FROM a FULL OUTER JOIN b ON a.user_id = b.user_id
ORDER BY user_id
"""


def tpch_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H refresh functions RF1/RF2 (spec §2.27-2.28) in one
    deterministic maintenance pass: RF2 deletes a key-sampled slice of
    orders WITH their lineitems (cascading delete via key anti-join),
    RF1 inserts a transformed copy of another slice under shifted keys
    (new-sales ingest). The result is the audit row every refresh run
    must produce: table counts and the price checksum after
    delete+insert — proving the engine's maintenance half of TPC-H,
    not just the 22 read queries.

    Scale shape: both the delete and the insert are key-predicate
    column expressions (no per-row Python); the cascade is ONE anti-join
    of lineitem against the deleted-order keys; counts/sums fold in a
    final scalar aggregate. A real lakehouse run lands the same plan
    through MERGE/DELETE; here the refreshed state is computed as a
    plan so the oracle can hash it.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    maxkey = orders.agg(F.max("o_orderkey").alias("mk"))
    del_orders = orders.where(F.col("o_orderkey") % 97 == 0)
    kept_orders = orders.where(F.col("o_orderkey") % 97 != 0)
    ins_orders = (
        orders.where(F.col("o_orderkey") % 89 == 0)
        .crossJoin(F.broadcast(maxkey))
        .select(
            (F.col("o_orderkey") + F.col("mk")).alias("o_orderkey"),
            "o_custkey",
            F.col("o_totalprice"),
        )
    )
    new_orders = kept_orders.select("o_orderkey", "o_custkey", "o_totalprice").unionByName(
        ins_orders
    )
    new_li = li.join(
        del_orders.select("o_orderkey"),
        li.l_orderkey == F.col("o_orderkey"),
        "left_anti",
    )
    audit_o = new_orders.agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.floor((F.sum("o_totalprice")) * 100 + F.lit(0.5)) / 100).alias("price_checksum"),
    )
    audit_l = new_li.agg(F.count(F.lit(1)).alias("n_lineitems"))
    return audit_o.crossJoin(audit_l).select(
        "n_orders", "n_lineitems", "price_checksum"
    )


TPCH_REFRESH_SQL = """
WITH mk AS (SELECT MAX(o_orderkey) AS mk FROM orders),
kept AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey % 97 <> 0),
ins AS (SELECT o_orderkey + mk.mk AS o_orderkey, o_custkey, o_totalprice
        FROM orders, mk WHERE o_orderkey % 89 = 0),
new_orders AS (SELECT * FROM kept UNION ALL SELECT * FROM ins),
new_li AS (
  SELECT l_orderkey FROM lineitem l
  WHERE NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_orderkey = l.l_orderkey AND o.o_orderkey % 97 = 0))
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM new_orders) AS n_orders,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM new_li) AS n_lineitems,
       (SELECT FLOOR((SUM(o_totalprice)) * 100 + 0.5) / 100 FROM new_orders) AS price_checksum
"""


N_SHARDS = 16
SHARD_SEED = "shard|"  # hash-domain prefix: reshard by changing the seed


def shards_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard layout audit: every document is
    assigned shard = md5(seed ‖ doc_id) mod {n}, ordered within its
    shard by the same hash — the reproducible global shuffle a training
    run needs (breaks source/time correlation in the token stream;
    re-runs and resumable jobs see the identical order, and changing
    the seed is a full reshuffle with no data movement logic to
    rewrite). Emits per-shard doc/char totals plus an order-sensitive
    checksum Σ doc_id·position, so two engines agree only if every
    shard holds the same docs in the same sequence.

    Scale shape: hashing is codegen'd column math on the id (text never
    feeds the hash); the only shuffle is the per-shard window sort, and
    shards are uniform by construction (md5 mod n), so there is no skew
    to mitigate at any corpus size. `write_training_shards` is the
    companion re-layout pass (one repartition + in-partition sort, the
    exact write path of the audit's plan).
    """
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit(SHARD_SEED), F.col("doc_id").cast("string")))
    keyed = docs.select("doc_id", "n_chars", h.alias("h")).withColumn(
        "shard", (F.conv(F.substring("h", 1, 15), 16, 10).cast("long") % N_SHARDS).cast("int")
    )
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (
        keyed.withColumn("pos", F.row_number().over(w).cast("long"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars"),
            F.sum(F.col("doc_id") * F.col("pos")).cast("long").alias("order_checksum"),
        )
        .orderBy("shard")
    )


SHARDS_LAYOUT_SQL = f"""
WITH keyed AS (
  SELECT doc_id, n_chars, md5('{SHARD_SEED}' || CAST(doc_id AS VARCHAR)) AS h
  FROM documents),
sharded AS (
  SELECT doc_id, n_chars, h,
         CAST(('0x' || substr(h, 1, 15))::BIGINT % {N_SHARDS} AS INT) AS shard
  FROM keyed),
pos AS (
  SELECT shard, doc_id, n_chars,
         CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) AS pos
  FROM sharded)
SELECT shard, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       CAST(SUM(doc_id * pos) AS BIGINT) AS order_checksum
FROM pos GROUP BY shard ORDER BY shard
"""


def write_training_shards(
    df: DataFrame, path: str, id_col: str, n_shards: int, seed: str = SHARD_SEED
) -> None:
    """Materialize the shard layout `shards_layout` audits: one
    `shard=k/` directory per shard holding ONE file with rows in hash
    order — a single shuffle at any scale. Hash-repartitioning on the
    shard id alone would collide several shards into one task (hash of
    small ints mod n is not a bijection), so the write
    directory-partitions on the shard column instead: every task emits
    one file per shard it holds, and each shard's rows sort together
    because the in-partition sort leads with the shard id."""
    h = F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    (
        df.withColumn("__h", h)
        .withColumn(
            "shard",
            (F.conv(F.substring("__h", 1, 15), 16, 10).cast("long") % n_shards).cast("int"),
        )
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "__h")
        .drop("__h")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


QUERIES = {
    "shards_layout": shards_layout,
    "merge_upsert": merge_upsert,
    "zorder_layout": zorder_layout,
    "snapshot_diff": snapshot_diff,
    "tpch_refresh": tpch_refresh,
}

ORACLES = {
    "shards_layout": SHARDS_LAYOUT_SQL,
    "merge_upsert": MERGE_UPSERT_SQL,
    "zorder_layout": ZORDER_SQL,
    "snapshot_diff": SNAPSHOT_DIFF_SQL,
    "tpch_refresh": TPCH_REFRESH_SQL,
}
