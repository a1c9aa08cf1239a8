"""Futures/Client facade — the reference's task-parallel client surface
on Spark.

Replicates the `distributed.Client` API (reference `distributed/client.py`:
`submit` :1447, `map` :1567, `gather` :1892, `scatter` :2061, `cancel`
:2166, `compute` :2730, `persist` :2880, `get` :2590, plus module-level
`wait` :4230, `as_completed` :4278, `fire_and_forget` :4603 — SURVEY.md
§2.11). The scheduler/worker machinery those APIs drive in the reference
(priorities, stealing, spilling) is Spark's job; what remains is a thin
driver-side layer:

- arbitrary Python calls (`submit`/`map`) run on a driver thread pool as
  `concurrent.futures` futures; calls whose arguments are themselves
  futures wait on their dependencies first, mirroring dask's graph
  dependencies;
- **pure-key memoization**: a deterministic token of (func, args) keys
  each call, and resubmitting an identical pure call returns the same
  future (the reference's content-hash CSE, `client.py:1527-1537`);
- DataFrame arguments route through Spark (`compute` → collect on a
  pool thread, `persist` → cache + materialize);
- `scatter` → `spark.createDataFrame` / broadcast; `publish_dataset` →
  global temp views (reference `distributed/publish.py:8-121`).
"""

from __future__ import annotations

import collections
import concurrent.futures
import contextlib
import hashlib
import pickle
import threading
import time
from collections.abc import Iterable
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def _token_bytes(obj: Any) -> bytes | None:
    """Stable content bytes for one value, or None if it has no stable
    identity. Local functions/lambdas hash by code + defaults + closure
    cell *values* (dask's function-tokenization approach); an id()-based
    fallback would collide once objects are freed, so refuse instead."""
    try:
        return pickle.dumps(obj, protocol=4)
    except Exception:
        pass
    if callable(obj) and hasattr(obj, "__code__"):
        parts = [obj.__module__ or "", obj.__qualname__, obj.__code__.co_code.hex()]
        for cell in obj.__closure__ or ():
            cb = _token_bytes(cell.cell_contents)
            if cb is None:
                return None
            parts.append(cb.hex())
        for d in obj.__defaults__ or ():
            db = _token_bytes(d)
            if db is None:
                return None
            parts.append(db.hex())
        return "|".join(parts).encode()
    return None


def tokenize(*args: Any, **kwargs: Any) -> str | None:
    """Deterministic content hash of a call (reference `client.py:1527-1531`).

    Returns None when any value has no stable content identity — such a
    call must NOT share a memo slot.
    """
    h = hashlib.md5()

    def _feed(obj: Any) -> bool:
        b = _token_bytes(obj)
        if b is None:
            return False
        # length-prefix each token so adjacent tokens can't alias
        h.update(len(b).to_bytes(8, "little"))
        h.update(b)
        return True

    for obj in args:
        if not _feed(obj):
            return None
    # positional/keyword separator: submit(f, 'x', 1) must not collide
    # with submit(f, x=1)
    h.update(b"\x01kwargs")
    for item in sorted(kwargs.items()):
        for obj in item:
            if not _feed(obj):
                return None
    return h.hexdigest()


def _resolve(obj: Any) -> Any:
    """Materialize future arguments, mirroring dask dependency semantics."""
    if isinstance(obj, concurrent.futures.Future):
        return obj.result()
    if isinstance(obj, (list, tuple)):
        return type(obj)(_resolve(x) for x in obj)
    if isinstance(obj, dict):
        # kwargs (and nested dicts) carry futures too — resolve values,
        # keep keys (reference materializes kwargs deps the same way)
        return {k: _resolve(v) for k, v in obj.items()}
    return obj


class Client:
    """Driver-side client over one SparkSession + a thread pool.

    Python-task execution is intentionally driver-local: the reference
    schedules closures on remote workers because *everything* there is a
    Python task; on Spark, bulk data work is DataFrame plans (executed
    on executors) and only orchestration-level closures remain, which a
    pool thread runs while any Spark actions inside them parallelize on
    the cluster.
    """

    def __init__(self, spark: SparkSession | None = None, n_workers: int = 16):
        from dask_distributed_vanilla_spark.session import get_spark

        self.spark = spark or get_spark("client")
        self._pool = concurrent.futures.ThreadPoolExecutor(max_workers=n_workers)
        self._pure_cache: dict[str, concurrent.futures.Future] = {}
        self._lock = threading.Lock()
        self._datasets: dict[str, DataFrame] = {}
        # bounded execution log backing get_task_stream/performance_report
        self._task_stream: collections.deque[dict[str, Any]] = collections.deque(maxlen=10_000)
        self._plugins: dict[str, Any] = {}
        # live actors by key (the reference worker's `actors` registry)
        self._actors: dict[str, Any] = {}

    # -- task parallel ----------------------------------------------------
    def submit(self, fn, *args: Any, pure: bool = True, actor: bool = False, **kwargs: Any):
        """Schedule ``fn(*args)``; identical pure calls share one future
        (reference `client.py:1447-1565`). With ``actor=True`` and a
        class, the future resolves to an Actor proxy
        (reference `client.py:1510`, `actor.py:12-203`)."""
        if actor:
            from dask_distributed_vanilla_spark.actors import create_actor

            fut = self._pool.submit(create_actor, fn, *args, **kwargs)

            def _register(f):
                if f.exception() is None:
                    self._actors[f.result().key] = f.result()

            fut.add_done_callback(_register)
            return fut
        key = tokenize(fn, *args, **kwargs) if pure else None  # None → not memoizable
        if key is not None:
            with self._lock:
                cached = self._pure_cache.get(key)
                if cached is not None:
                    return cached
        def _call():
            rec = {
                "key": key or f"impure-{id(fn):x}",
                "function": getattr(fn, "__name__", str(fn)),
                "start": time.time(),
            }
            try:
                out = fn(*_resolve(args), **_resolve(kwargs))
                rec["status"] = "OK"
                return out
            except BaseException:
                rec["status"] = "error"
                raise
            finally:
                rec["stop"] = time.time()
                self._task_stream.append(rec)

        fut = self._pool.submit(_call)
        if key is not None:
            with self._lock:
                self._pure_cache.setdefault(key, fut)
        return fut

    def map(self, fn, *iterables: Iterable[Any], pure: bool = True):
        """N-ary submit (reference `client.py:1567-1759`)."""
        return [self.submit(fn, *args, pure=pure) for args in zip(*iterables)]

    def gather(self, futures):
        """Materialize futures (reference `client.py:1892-1951`)."""
        if isinstance(futures, concurrent.futures.Future):
            return futures.result()
        return [self.gather(f) for f in futures]

    def cancel(self, futures) -> None:
        for f in futures if isinstance(futures, (list, tuple)) else [futures]:
            f.cancel()

    # -- data movement ----------------------------------------------------
    def scatter(self, data):
        """Push local data to the cluster (reference `client.py:2061-2157`):
        rows/pandas → distributed DataFrame, other objects → broadcast."""
        import pandas as pd

        if isinstance(data, pd.DataFrame):
            return self.spark.createDataFrame(data)
        if isinstance(data, (list, tuple)) and data and isinstance(data[0], (dict, tuple)):
            return self.spark.createDataFrame(data)
        return self.spark.sparkContext.broadcast(data)

    def replicate(self, data):
        """Reference `client.py:3095-3139`; on Spark a broadcast IS the
        replicated object."""
        from pyspark.sql import functions as F

        if isinstance(data, DataFrame):
            return F.broadcast(data)
        return self.spark.sparkContext.broadcast(data)

    # -- collection lifecycle ---------------------------------------------
    def compute(self, obj):
        """Async materialize (reference `client.py:2730-2878`): DataFrames
        collect on a pool thread; futures pass through; plain values wrap."""
        if isinstance(obj, DataFrame):
            return self._pool.submit(obj.collect)
        if isinstance(obj, concurrent.futures.Future):
            return obj
        if isinstance(obj, (list, tuple)):
            return type(obj)(self.compute(x) for x in obj)
        fut: concurrent.futures.Future = concurrent.futures.Future()
        fut.set_result(obj)
        return fut

    def get(self, obj):
        """Synchronous compute (reference `client.py:2590-2673`)."""
        return self.gather(self.compute(obj))

    def persist(self, df: DataFrame) -> DataFrame:
        """Pin on the cluster (reference `client.py:2880-2976`): cache and
        kick off materialization without blocking."""
        cached = df.persist()
        self._pool.submit(cached.count)
        return cached

    # -- named datasets (reference distributed/publish.py:8-121) ----------
    def publish_dataset(self, **datasets: DataFrame) -> None:
        for name, df in datasets.items():
            if name in self._datasets:
                raise KeyError(f"dataset {name!r} already published")
            df.createOrReplaceGlobalTempView(name)
            self._datasets[name] = df

    def get_dataset(self, name: str) -> DataFrame:
        if name not in self._datasets:
            raise KeyError(name)
        return self.spark.table(f"global_temp.{name}")

    def list_datasets(self) -> list[str]:
        return sorted(self._datasets)

    def unpublish_dataset(self, name: str) -> None:
        self._datasets.pop(name, None)
        self.spark.catalog.dropGlobalTempView(name)

    # -- cluster control (reference client.py:2354-3060) -------------------
    def run(self, fn, *args: Any, on_executors: bool = False):
        """Run a function out-of-band (reference `client.py:2409`
        `run`/`run_on_scheduler`). Driver-side by default; with
        ``on_executors`` it executes once per executor core slot via a
        short job (the Spark shape for env-setup side effects)."""
        if not on_executors:
            return fn(*args)
        sc = self.spark.sparkContext
        n = sc.defaultParallelism
        return sc.parallelize(range(n), n).map(lambda _: fn(*args)).collect()

    def upload_file(self, path: str) -> None:
        """Ship a dependency to executors (reference `client.py:3030`)."""
        if path.endswith((".py", ".zip", ".egg")):
            self.spark.sparkContext.addPyFile(path)
        else:
            self.spark.sparkContext.addFile(path)

    def retry(self, fn, *args: Any, **kwargs: Any):
        """Resubmit a failed pure call (reference `client.py:2189`): drop
        the memoized future (which may hold the error) and resubmit."""
        key = tokenize(fn, *args, **kwargs)
        if key is not None:
            with self._lock:
                self._pure_cache.pop(key, None)
        return self.submit(fn, *args, **kwargs)

    def wait_for_workers(self, n_workers: int, timeout: float = 60.0) -> None:
        """Reference `client.py:1138`; on Spark, block until the cluster
        offers at least n parallel slots (immediate in local mode)."""
        import time as _time

        deadline = _time.monotonic() + timeout
        while self.spark.sparkContext.defaultParallelism < n_workers:
            if _time.monotonic() > deadline:
                raise TimeoutError(
                    f"{self.spark.sparkContext.defaultParallelism} < {n_workers} slots"
                )
            _time.sleep(0.5)

    def profile(self) -> dict[str, Any]:
        """Execution introspection (reference `client.py:3335`
        `profile`/`performance_report`): job/stage counters from the
        status tracker — the Spark UI REST API holds the full detail."""
        st = self.spark.sparkContext.statusTracker()
        return {
            "active_jobs": list(st.getActiveJobsIds()),
            "active_stages": list(st.getActiveStageIds()),
            "default_parallelism": self.spark.sparkContext.defaultParallelism,
            "cached_tables": len(self.spark.sparkContext._jsc.sc().getRDDStorageInfo()),
        }

    # -- introspection (reference client.py:3172-3335) --------------------
    def who_has(self) -> dict[str, list[str]]:
        """Cached tables per executor via the status tracker (the
        reference's scheduler.who_has analog at Spark granularity)."""
        sc = self.spark.sparkContext
        infos = sc._jsc.sc().getRDDStorageInfo()
        return {str(i.name()): [str(i.memSize())] for i in infos}

    def nthreads(self) -> int:
        return self.spark.sparkContext.defaultParallelism

    def _executor_infos(self):
        """SparkExecutorInfo[] from the JVM status tracker (host, port,
        cacheSize, numRunningTasks) — the worker-level view the
        reference's scheduler keeps natively."""
        return list(self.spark.sparkContext._jsc.sc().statusTracker().getExecutorInfos())

    def rebalance(self, df: DataFrame | None = None) -> DataFrame | None:
        """Even out data placement (reference `client.py:3064`). Spark's
        BlockManager owns cached-block placement, so the actionable form
        is an explicit even repartition of a DataFrame to the cluster's
        parallelism; with no argument this is a no-op that returns None
        (placement is already runtime-managed)."""
        if df is None:
            return None
        return df.repartition(self.spark.sparkContext.defaultParallelism)

    def has_what(self) -> dict[str, list[str]]:
        """worker → names of cached datasets (reference `client.py:3209`).
        Spark exposes placement at RDD granularity, not per-key; each
        executor row lists the cached RDD names visible to the cluster."""
        names = [
            str(i.name())
            for i in self.spark.sparkContext._jsc.sc().getRDDStorageInfo()
        ]
        return {f"{e.host()}:{e.port()}": names for e in self._executor_infos()}

    def nbytes(self) -> dict[str, int]:
        """cached dataset → bytes held (reference `client.py:3277`)."""
        infos = self.spark.sparkContext._jsc.sc().getRDDStorageInfo()
        return {str(i.name()): int(i.memSize()) + int(i.diskSize()) for i in infos}

    def processing(self) -> dict[str, int]:
        """worker → number of running tasks (reference `client.py:3247`)."""
        return {
            f"{e.host()}:{e.port()}": int(e.numRunningTasks())
            for e in self._executor_infos()
        }

    def get_task_stream(self) -> list[dict[str, Any]]:
        """Recent task execution records (reference `client.py:3860`):
        one dict per completed submit call with key/function/start/stop/
        status. Spark-side stage detail lives in the status tracker /
        event log; this stream covers the client's own task layer."""
        return list(self._task_stream)

    @contextlib.contextmanager
    def performance_report(self, filename: str = "performance_report.html"):
        """Capture the tasks run inside the block and write a small HTML
        report (reference `client.py:4718` writes the bokeh dashboard;
        here: task table + cluster snapshot, with the full detail in the
        Spark UI/event log when enabled)."""
        t0 = time.time()
        yield
        # Filter by start time, not deque index: the maxlen deque can
        # rotate during the block, which would misalign an index offset.
        recs = [r for r in self._task_stream if r["start"] >= t0]
        rows = "".join(
            f"<tr><td>{r['key']}</td><td>{r['function']}</td>"
            f"<td>{r['stop'] - r['start']:.4f}s</td><td>{r['status']}</td></tr>"
            for r in recs
        )
        html = (
            "<html><body><h1>performance report</h1>"
            f"<p>wall: {time.time() - t0:.3f}s, tasks: {len(recs)}, "
            f"parallelism: {self.nthreads()}</p>"
            "<table><tr><th>key</th><th>function</th><th>duration</th>"
            f"<th>status</th></tr>{rows}</table></body></html>"
        )
        with open(filename, "w") as f:
            f.write(html)

    def register_worker_plugin(self, plugin: Any, name: str | None = None) -> list:
        """Run ``plugin.setup()`` on the cluster's python workers
        (reference `client.py:4037` runs setup on every worker).

        Spark gives no task-placement guarantee, so this is best-effort
        coverage: we fan out 2× defaultParallelism no-op tasks and guard
        ``setup`` with a per-python-worker-process memo so a worker that
        receives several tasks still runs setup exactly once (with
        ``spark.python.worker.reuse`` — the default — the memo persists
        for the worker's lifetime). A worker that receives no task runs
        setup lazily the first time any later task lands on it is NOT
        implemented; callers needing a hard guarantee should invoke their
        setup from the task function itself. Returns the setup results of
        the workers that ran it this call."""
        pname = name or type(plugin).__name__
        self._plugins[pname] = plugin
        setup = getattr(plugin, "setup", None)
        if setup is None:
            return []
        sc = self.spark.sparkContext
        n = 2 * sc.defaultParallelism

        def run_once(_):
            done = _worker_plugin_memo()
            if pname in done:
                return _SKIPPED
            done.add(pname)
            return setup(None)

        out = sc.parallelize(range(n), n).map(run_once).collect()
        return [r for r in out if r != _SKIPPED]

    def restart(self) -> None:
        """Drop all cached state (reference `client.py:2997` clears cluster
        state; Spark keeps executors, we clear caches + memo table)."""
        self.spark.catalog.clearCache()
        with self._lock:
            self._pure_cache.clear()

    def close(self) -> None:
        self._pool.shutdown(wait=False)


# Per-python-worker-process memo for register_worker_plugin. Each Spark
# python worker imports this module independently, so the set is
# naturally scoped to one worker process (reused across its tasks when
# spark.python.worker.reuse is on). The indirection function pickles by
# reference, keeping the memo worker-local instead of shipping the
# driver's copy.
_WORKER_PLUGIN_DONE: set[str] = set()
_SKIPPED = "__plugin_setup_skipped__"


def _worker_plugin_memo() -> set[str]:
    return _WORKER_PLUGIN_DONE


# -- module-level helpers matching the reference's API --------------------
def wait(futures, timeout: float | None = None):
    """Block until done (reference `client.py:4230`)."""
    fs = [futures] if isinstance(futures, concurrent.futures.Future) else list(futures)
    return concurrent.futures.wait(fs, timeout=timeout)


def as_completed(futures):
    """Yield futures as they finish (reference `client.py:4278`)."""
    return concurrent.futures.as_completed(list(futures))


def futures_of(obj: Any) -> list[concurrent.futures.Future]:
    """All unique futures inside a (possibly nested) collection, in
    first-seen order (reference `client.py:4558`)."""
    out: list[concurrent.futures.Future] = []

    def walk(o: Any) -> None:
        if isinstance(o, concurrent.futures.Future):
            if not any(o is f for f in out):
                out.append(o)
        elif isinstance(o, (list, tuple, set)):
            for x in o:
                walk(x)
        elif isinstance(o, dict):
            for v in o.values():
                walk(v)

    walk(obj)
    return out


def fire_and_forget(future) -> None:
    """Detach (reference `client.py:4603`) — thread-pool futures already
    run regardless of references; this only swallows errors."""
    def _done(f):
        try:
            f.result()
        except Exception:
            pass

    future.add_done_callback(_done)


def tree_reduce(client: Client, fn, items: list, chunk: int = 2):
    """The reference's delayed tree reduction (`benchmark/tree_reduction.py:
    17-31`): binary tree of `fn` applications as chained futures. For bulk
    data use `rdd.treeReduce` (see linalg.py); this mirrors the
    future-graph shape."""
    import functools

    futs = [client.submit(lambda x: x, it) for it in items]
    while len(futs) > 1:
        futs = [
            client.submit(lambda *xs: functools.reduce(fn, xs), *futs[i : i + chunk])
            for i in range(0, len(futs), chunk)
        ]
    return futs[0]
