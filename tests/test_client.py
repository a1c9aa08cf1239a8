"""Client facade semantics (reference distributed/client.py surface,
SURVEY.md §2.11): submit/map/gather, pure-key memoization, futures as
arguments, scatter/compute/persist, published datasets, tree reduction,
and the coordination primitives."""

from __future__ import annotations

import operator
import time

import pytest

from dask_distributed_vanilla_spark import coordination as coord
from dask_distributed_vanilla_spark.client import Client, as_completed, fire_and_forget, tree_reduce, wait
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def client(spark):
    c = Client(spark)
    yield c
    c.close()


def test_submit_map_gather(client):
    fut = client.submit(operator.add, 1, 2)
    assert fut.result() == 3
    futs = client.map(operator.mul, range(5), range(5))
    assert client.gather(futs) == [0, 1, 4, 9, 16]


_MEMO_CALLS: list[int] = []


def _double(x: int) -> int:
    """Module-level so its token is stable (closure cell values are part
    of a function's token, as in dask's normalize_function)."""
    _MEMO_CALLS.append(x)
    time.sleep(0.05)
    return x * 2


def test_pure_key_memoization(client):
    """Identical pure calls share one future (reference client.py:1536)."""
    _MEMO_CALLS.clear()
    f1 = client.submit(_double, 21)
    f2 = client.submit(_double, 21)
    assert f1 is f2
    assert f1.result() == 42
    assert len(_MEMO_CALLS) == 1
    f3 = client.submit(_double, 21, pure=False)
    f3.result()
    assert len(_MEMO_CALLS) == 2


def test_futures_as_arguments(client):
    """Futures in args become dependencies (reference client.py:1546)."""
    a = client.submit(operator.add, 1, 1)
    b = client.submit(operator.add, a, 10)
    assert b.result() == 12


def test_futures_as_keyword_arguments(client):
    """Futures passed via kwargs are materialized too, matching the
    reference client's dependency semantics for keyword deps."""

    def f(*, x, items):
        return x + sum(items)

    a = client.submit(operator.add, 2, 3)
    b = client.submit(f, x=a, items=[a, 1])
    assert b.result() == 11


def test_tokenize_separates_args_from_kwargs():
    """submit(f, 'x', 1) and submit(f, x=1) must NOT share a memo key,
    and adjacent tokens must not alias across the boundary."""
    from dask_distributed_vanilla_spark.client import tokenize

    assert tokenize(_double, "x", 1) != tokenize(_double, x=1)
    # length-prefixing: ('ab','c') must differ from ('a','bc')
    assert tokenize(_double, "ab", "c") != tokenize(_double, "a", "bc")


def test_named_lock_concurrent_construction():
    """Two threads constructing Lock('x') concurrently must end up with
    the SAME underlying lock object (init races on the shared instance)."""
    import threading

    name = "race-test-lock"
    out = []
    barrier = threading.Barrier(2)

    def build():
        barrier.wait()
        out.append(coord.Lock(name))

    ts = [threading.Thread(target=build) for _ in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert out[0] is out[1]
    assert out[0]._lock is out[1]._lock


def test_scatter_and_compute(client, spark):
    import pandas as pd

    df = client.scatter(pd.DataFrame({"x": [1, 2, 3]}))
    fut = client.compute(df.selectExpr("sum(x) as s"))
    assert fut.result()[0]["s"] == 6


def test_persist_and_datasets(client, spark):
    from dask_distributed_vanilla_spark.catalog import load_table

    nation = client.persist(load_table(spark, SF_SMOKE, "nation"))
    client.publish_dataset(nations_r1=nation)
    assert "nations_r1" in client.list_datasets()
    assert client.get_dataset("nations_r1").count() == 25
    with pytest.raises(KeyError):
        client.publish_dataset(nations_r1=nation)
    client.unpublish_dataset("nations_r1")
    assert "nations_r1" not in client.list_datasets()


def test_wait_as_completed_fire_and_forget(client):
    futs = client.map(lambda x: x + 1, range(4), pure=False)
    done, pending = wait(futs)
    assert len(done) == 4 and not pending
    assert sorted(f.result() for f in as_completed(futs)) == [1, 2, 3, 4]
    fire_and_forget(client.submit(lambda: 1 / 0, pure=False))


def test_tree_reduce(client):
    """1024-leaf add tree (reference benchmark/tree_reduction.py:17-31)."""
    assert tree_reduce(client, operator.add, list(range(1024))).result() == 523776


def test_coordination_primitives():
    with coord.Lock("t"):
        assert not coord.Lock("t")._lock.acquire(blocking=False)
    ev = coord.Event("go")
    assert not ev.is_set()
    ev.set()
    assert coord.Event("go").wait(0.1)
    q = coord.Queue("jobs")
    q.put({"x": 1})
    assert coord.Queue("jobs").get(timeout=1) == {"x": 1}
    v = coord.Variable("cfg")
    v.set(42)
    assert coord.Variable("cfg").get(timeout=1) == 42
    sub = coord.Sub("topic1")
    coord.Pub("topic1").put("msg")
    assert sub.get(timeout=1) == "msg"
    sub.close()
    with coord.MultiLock(["a", "b"]):
        assert not coord.Lock("a")._lock.acquire(blocking=False)
    sem = coord.Semaphore("leases", max_leases=2)
    assert sem.acquire(timeout=0.1) and sem.acquire(timeout=0.1)
    assert not sem.acquire(timeout=0.01)
    sem.release()
    sem.release()


# -- actors (reference distributed/actor.py, tests/test_actor.py) ---------
class _Counter:
    """Reference test_actor.py Counter."""

    n = 0

    def __init__(self):
        self.n = 0

    def increment(self):
        self.n += 1
        return self.n

    def add(self, x):
        self.n += x
        return self.n


def test_actor_sync(client):
    """Mirrors reference test_actor.py::test_sync."""
    from dask_distributed_vanilla_spark.actors import Actor, ActorFuture

    counter = client.submit(_Counter, actor=True).result()
    assert isinstance(counter, Actor)
    assert counter.n == 0
    future = counter.increment()
    assert isinstance(future, ActorFuture)
    assert future.result() == 1
    assert counter.n == 1
    assert future.result() == future.result()
    assert "ActorFuture" in repr(future)
    assert "Actor: _Counter" in repr(counter)
    assert counter.key in client._actors


def test_actor_surface(client):
    """Mirrors reference test_actor.py::test_Actor / test_dir."""
    counter = client.submit(_Counter, actor=True).result()
    assert counter._cls is _Counter
    assert hasattr(counter, "n")
    assert hasattr(counter, "increment")
    assert hasattr(counter, "add")
    assert not hasattr(counter, "abc")
    assert "increment" in dir(counter)


def test_actor_exceptions(client):
    """Mirrors test_exceptions_create / test_exceptions_method."""
    import pytest

    class _FailsInit:
        def __init__(self):
            raise ValueError("bar")

    with pytest.raises(ValueError, match="bar"):
        client.submit(_FailsInit, actor=True).result()

    class _Throws:
        def throw(self):
            1 / 0

    foo = client.submit(_Throws, actor=True).result()
    with pytest.raises(ZeroDivisionError):
        foo.throw().result()


def test_actor_serial_execution(client):
    """One-at-a-time method execution: racing increments from many
    client threads never lose an update (the actor-model guarantee the
    reference provides by running methods on one worker)."""
    counter = client.submit(_Counter, actor=True, pure=False).result()
    futs = [counter.increment() for _ in range(200)]
    results = [f.result() for f in futs]
    assert counter.n == 200
    assert sorted(results) == list(range(1, 201))  # every update observed
