"""Minimal versioned parquet table: commit log, snapshot isolation,
time travel, and compaction — the transaction-log pattern every
lakehouse format (Delta/Iceberg/Hudi) builds on, reduced to its
load-bearing parts with no external dependency.

Layout:

    table/
      _log/00000000.json   {"version":0,"adds":[...],"removes":[]}
      _log/00000001.json   ...
      part-<uuid>.parquet  data files (immutable once committed)

Contracts:
- **Readers never list data files.** A snapshot = replay of the log's
  add/remove sets up to the requested version; uncommitted files are
  invisible (writes land data first, log entry last — crash before the
  log write leaves only unreferenced orphans).
- **Appends are O(delta)**: one log entry + the new files.
- **Compaction rewrites small files into one and REMOVES them in the
  same commit** — readers at older versions still see the old files
  (they are never deleted here; a vacuum pass with a version horizon
  would reclaim them), so time travel stays exact across compactions.
- **Optimistic concurrency**: the log entry is created with
  os.open(O_CREAT|O_EXCL) — two writers racing for version N produce
  exactly one winner; the loser retries against N+1. Single-filesystem
  semantics; object-store deployments swap this for a putIfAbsent.

At 100 TB the same structure holds: the log is KB-sized JSON per
commit, snapshots prune by version without touching data, and
compaction is the same rewrite-and-swap commit shown here.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import col as F_col

_LOG = "_log"


def _log_dir(path: str) -> str:
    d = os.path.join(path, _LOG)
    os.makedirs(d, exist_ok=True)
    return d


def _entries(path: str) -> list[dict]:
    d = _log_dir(path)
    out = []
    for name in sorted(os.listdir(d)):
        if name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                out.append(json.load(f))
    return out


def latest_version(path: str) -> int:
    """-1 when the table has no commits yet."""
    e = _entries(path)
    return e[-1]["version"] if e else -1


def _commit(
    path: str, adds: list[str], removes: list[str], stats: dict | None = None
) -> int:
    """Atomically claim the next version (O_EXCL log create); on a race
    the loser re-reads the log tip and retries."""
    while True:
        version = latest_version(path) + 1
        entry = {"version": version, "adds": adds, "removes": removes}
        if stats:
            entry["stats"] = stats
        target = os.path.join(_log_dir(path), f"{version:08d}.json")
        try:
            fd = os.open(target, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            continue  # lost the race for this version number — retry
        with os.fdopen(fd, "w") as f:
            json.dump(entry, f)
        return version


def _file_stats(file_path: str, cols: list[str]) -> dict:
    """Per-column [min, max] from the parquet footer's row-group
    statistics — already written by every writer, so collecting them is
    a metadata read, never a data scan. Columns without usable stats
    are omitted (the reader then treats the file as always-live)."""
    import pyarrow.parquet as pq

    md = pq.read_metadata(file_path)
    names = {md.schema.column(i).name: i for i in range(md.num_columns)}
    out: dict = {}
    for col in cols:
        i = names.get(col)
        if i is None:
            continue
        lo = hi = None
        ok = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(i).statistics
            if st is None or not st.has_min_max:
                ok = False
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if ok and lo is not None and _json_roundtrips(lo) and _json_roundtrips(hi):
            out[col] = [lo, hi]
    return out


def _json_roundtrips(v) -> bool:
    try:
        json.dumps(v)
        return True
    except TypeError:
        return False


def write_append(df: DataFrame, path: str, stats_cols: list[str] | None = None) -> int:
    """Append `df` as a new commit; returns the committed version.
    Data files land BEFORE the log entry references them. When
    `stats_cols` is given, per-file [min, max] of those columns ride
    the commit entry (Delta/Iceberg-style data skipping metadata) so
    `read_pruned` can drop files without opening them."""
    os.makedirs(path, exist_ok=True)
    staging = os.path.join(path, f"_staging_{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(staging)
    adds = []
    stats: dict = {}
    for name in os.listdir(staging):
        if name.endswith(".parquet"):
            final = f"part-{uuid.uuid4().hex}.parquet"
            os.rename(os.path.join(staging, name), os.path.join(path, final))
            adds.append(final)
            if stats_cols:
                stats[final] = _file_stats(os.path.join(path, final), stats_cols)
    for leftover in os.listdir(staging):
        os.remove(os.path.join(staging, leftover))
    os.rmdir(staging)
    return _commit(path, adds, [], stats=stats or None)


def snapshot_files(path: str, version: int | None = None) -> list[str]:
    """Live data files at `version` (default: latest) by log replay."""
    live: set[str] = set()
    for entry in _entries(path):
        if version is not None and entry["version"] > version:
            break
        live.update(entry["adds"])
        live.difference_update(entry["removes"])
    return sorted(live)


def read_versioned(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Time-travel read: the table exactly as of `version`.

    mergeSchema unions the per-file schemas, so a column added by a
    later append reads as NULL on pre-evolution rows — and a
    time-travel read at an old version sees only that version's
    schema (the additive-evolution contract of every table format)."""
    files = snapshot_files(path, version)
    if not files:
        raise ValueError(f"no committed data in {path} at version={version}")
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(*[os.path.join(path, f) for f in files])
    )


def snapshot_files_pruned(
    path: str, col: str, lo, hi, version: int | None = None
) -> tuple[list[str], int]:
    """Data skipping: live files whose commit-log [min, max] for `col`
    overlaps [lo, hi]. Files with no recorded stats are conservatively
    kept. Returns (files, n_skipped) — the decision uses only the
    KB-sized log, no parquet footer is opened."""
    stats: dict = {}
    for entry in _entries(path):
        if version is not None and entry["version"] > version:
            break
        stats.update(entry.get("stats") or {})
    live = snapshot_files(path, version)
    kept, skipped = [], 0
    for f in live:
        s = stats.get(f, {}).get(col)
        if s is not None and (s[1] < lo or s[0] > hi):
            skipped += 1
        else:
            kept.append(f)
    return kept, skipped


def read_pruned(
    spark: SparkSession, path: str, col: str, lo, hi, version: int | None = None
) -> DataFrame:
    """Snapshot read with commit-log file skipping on `col` ∈ [lo, hi]
    — the table-format half of data skipping (parquet row-group
    min-max handles the within-file half after this). The exact
    predicate is still applied, so the result equals an unpruned read
    plus filter; skipping only removes provably-dead IO."""
    files, _ = snapshot_files_pruned(path, col, lo, hi, version)
    if not files:
        return read_versioned(spark, path, version).filter(
            (F_col(col) >= lo) & (F_col(col) <= hi)
        ).limit(0)
    df = spark.read.option("mergeSchema", "true").parquet(
        *[os.path.join(path, f) for f in files]
    )
    return df.filter((F_col(col) >= lo) & (F_col(col) <= hi))


def compact(spark: SparkSession, path: str) -> int:
    """Rewrite the current snapshot's files into one and swap them in a
    single commit (Delta OPTIMIZE's bin-packing, single-bin form). Old
    versions remain readable — compaction changes layout, never
    history."""
    files = snapshot_files(path)
    df = read_versioned(spark, path)
    staging = os.path.join(path, f"_staging_{uuid.uuid4().hex}")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    adds = []
    for name in os.listdir(staging):
        if name.endswith(".parquet"):
            final = f"part-{uuid.uuid4().hex}.parquet"
            os.rename(os.path.join(staging, name), os.path.join(path, final))
            adds.append(final)
    for leftover in os.listdir(staging):
        os.remove(os.path.join(staging, leftover))
    os.rmdir(staging)
    return _commit(path, adds, files)


def compact_zordered(
    spark: SparkSession,
    path: str,
    sort_cols: list[str],
    n_files: int,
    stats_cols: list[str] | None = None,
) -> int:
    """OPTIMIZE + re-cluster in one commit: rewrite the live snapshot
    range-partitioned and sorted on `sort_cols` into `n_files` files,
    swap them atomically, and (optionally) record per-file stats for
    the new layout — Delta's `OPTIMIZE ... ZORDER BY` shape. After
    this, `read_pruned` on a sort column skips most files because each
    file covers a tight value range; old versions remain readable
    (layout changes, history never does)."""
    old_files = snapshot_files(path)
    df = read_versioned(spark, path)
    staging = os.path.join(path, f"_staging_{uuid.uuid4().hex}")
    (
        df.repartitionByRange(n_files, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .parquet(staging)
    )
    adds = []
    stats: dict = {}
    for name in sorted(os.listdir(staging)):
        if name.endswith(".parquet"):
            final = f"part-{uuid.uuid4().hex}.parquet"
            os.rename(os.path.join(staging, name), os.path.join(path, final))
            adds.append(final)
            if stats_cols:
                stats[final] = _file_stats(os.path.join(path, final), stats_cols)
    for leftover in os.listdir(staging):
        os.remove(os.path.join(staging, leftover))
    os.rmdir(staging)
    return _commit(path, adds, old_files, stats=stats or None)


def read_appended(
    spark: SparkSession, path: str, since_version: int
) -> DataFrame:
    """Incremental (CDC-style) read: rows ADDED strictly after
    `since_version` — the feed an incremental consumer (e.g.
    dedup_incremental's delta side) reads instead of rescanning the
    table. Append-only file adds ARE the row-level inserts; compaction
    commits are excluded (their adds carry no new rows)."""
    compacted_rewrites: set[str] = set()
    fresh: list[str] = []
    for entry in _entries(path):
        if entry["version"] <= since_version:
            continue
        if entry["removes"]:
            # rewrite commit (compaction): adds are relocated old rows
            compacted_rewrites.update(entry["adds"])
            continue
        fresh.extend(entry["adds"])
    files = [f for f in fresh if f not in compacted_rewrites]
    if not files:
        return spark.range(0).selectExpr("id")  # empty sentinel
    return spark.read.parquet(*[os.path.join(path, f) for f in files])


def vacuum(path: str, keep_versions: int = 1) -> list[str]:
    """Reclaim data files unreachable from the newest `keep_versions`
    snapshots (the retention horizon every lakehouse vacuum takes).
    Time travel older than the horizon is forfeited — by explicit
    request, never as a side effect of compaction. Returns the deleted
    file names."""
    tip = latest_version(path)
    horizon = max(0, tip - keep_versions + 1)
    keep: set[str] = set()
    for v in range(horizon, tip + 1):
        keep.update(snapshot_files(path, v))
    all_committed: set[str] = set()
    for entry in _entries(path):
        all_committed.update(entry["adds"])
    doomed = sorted(all_committed - keep)
    for f in doomed:
        try:
            os.remove(os.path.join(path, f))
        except FileNotFoundError:
            pass
    return doomed
