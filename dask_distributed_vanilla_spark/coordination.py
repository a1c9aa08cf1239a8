"""Coordination primitives — the reference's distributed sync surface.

The reference ships cluster-wide Lock/MultiLock/Semaphore/Event/Queue/
Variable/Pub-Sub (`distributed/{lock,multi_lock,semaphore,event,queues,
variable,pubsub}.py` — SURVEY.md §2.9). In Spark's model executors never
coordinate peer-to-peer — the driver owns control flow — so the
capability-equivalent primitives live driver-side with the same
semantics and API names. They coordinate the *driver-threaded* futures
of client.py (which is exactly what the reference's primitives
coordinate: client-side tasks), not executor code.
"""

from __future__ import annotations

import queue
import threading
from collections import defaultdict
from contextlib import contextmanager
from typing import Any

_registry_lock = threading.Lock()


class _Named:
    """Same-name instances share state, as the reference's scheduler
    extensions key primitives by name."""

    _instances: dict[str, Any] = {}

    def __new__(cls, name: str = "default", *args, **kwargs):
        key = f"{cls.__name__}:{name}"
        with _registry_lock:
            inst = cls._instances.get(key)
            if inst is None:
                inst = super().__new__(cls)
                inst._initialized = False
                cls._instances[key] = inst
        return inst


class Lock(_Named):
    """Named mutual exclusion (reference `distributed/lock.py:76-173`)."""

    def __init__(self, name: str = "default"):
        # init under the registry lock: two threads constructing the same
        # name race __init__ on the SHARED instance, so the state must be
        # assigned exactly once and published before either uses it
        with _registry_lock:
            if self._initialized:
                return
            self.name = name
            self._lock = threading.Lock()
            self._initialized = True

    def acquire(self, timeout: float | None = None) -> bool:
        return self._lock.acquire(timeout=timeout if timeout is not None else -1)

    def release(self) -> None:
        self._lock.release()

    def __enter__(self):
        self.acquire()
        return self

    def __exit__(self, *exc):
        self.release()


class Semaphore(_Named):
    """Named lease pool (reference `distributed/semaphore.py:272-580`)."""

    def __init__(self, name: str = "default", max_leases: int = 1):
        with _registry_lock:
            if self._initialized:
                return
            self.name = name
            self._sem = threading.Semaphore(max_leases)
            self._initialized = True

    def acquire(self, timeout: float | None = None) -> bool:
        return self._sem.acquire(timeout=timeout)

    def release(self) -> None:
        self._sem.release()

    def __enter__(self):
        self.acquire()
        return self

    def __exit__(self, *exc):
        self.release()


class MultiLock:
    """Acquire several named locks atomically (reference
    `distributed/multi_lock.py`): sorted acquisition order prevents
    deadlock between overlapping lock sets."""

    def __init__(self, names: list[str]):
        self.locks = [Lock(n) for n in sorted(names)]

    def acquire(self) -> bool:
        for lk in self.locks:
            lk.acquire()
        return True

    def release(self) -> None:
        for lk in reversed(self.locks):
            lk.release()

    def __enter__(self):
        self.acquire()
        return self

    def __exit__(self, *exc):
        self.release()


class Event(_Named):
    """set/clear/wait flag (reference `distributed/event.py:153-275`)."""

    def __init__(self, name: str = "default"):
        with _registry_lock:
            if self._initialized:
                return
            self.name = name
            self._event = threading.Event()
            self._initialized = True

    def set(self) -> None:
        self._event.set()

    def clear(self) -> None:
        self._event.clear()

    def wait(self, timeout: float | None = None) -> bool:
        return self._event.wait(timeout)

    def is_set(self) -> bool:
        return self._event.is_set()


class Queue(_Named):
    """Shared FIFO of values or futures (reference
    `distributed/queues.py:130-292`)."""

    def __init__(self, name: str = "default", maxsize: int = 0):
        with _registry_lock:
            if self._initialized:
                return
            self.name = name
            self._q: queue.Queue = queue.Queue(maxsize)
            self._initialized = True

    def put(self, value: Any, timeout: float | None = None) -> None:
        self._q.put(value, timeout=timeout)

    def get(self, timeout: float | None = None) -> Any:
        return self._q.get(timeout=timeout)

    def qsize(self) -> int:
        return self._q.qsize()


class Variable(_Named):
    """Single named mutable slot (reference `distributed/variable.py:
    126-244`): set/get with blocking get until first set."""

    def __init__(self, name: str = "default"):
        with _registry_lock:
            if self._initialized:
                return
            self.name = name
            self._value: Any = None
            self._set = threading.Event()
            self._initialized = True

    def set(self, value: Any) -> None:
        self._value = value
        self._set.set()

    def get(self, timeout: float | None = None) -> Any:
        if not self._set.wait(timeout):
            raise TimeoutError(f"Variable {self.name!r} never set")
        return self._value


class Pub:
    """Fire-and-forget topic publish (reference `distributed/pubsub.py:
    202-357`). Subscribers each get their own queue; a publish fans out
    to all current subscribers."""

    _topics: dict[str, list[queue.Queue]] = defaultdict(list)
    _topics_lock = threading.Lock()

    def __init__(self, topic: str):
        self.topic = topic

    def put(self, msg: Any) -> None:
        with Pub._topics_lock:
            subs = list(Pub._topics[self.topic])
        for q in subs:
            q.put(msg)


class Sub:
    """Topic subscribe / iterate (reference `distributed/pubsub.py:358-467`)."""

    def __init__(self, topic: str):
        self.topic = topic
        self._q: queue.Queue = queue.Queue()
        with Pub._topics_lock:
            Pub._topics[topic].append(self._q)

    def get(self, timeout: float | None = None) -> Any:
        return self._q.get(timeout=timeout)

    def __iter__(self):
        while True:
            yield self.get()

    def close(self) -> None:
        with Pub._topics_lock:
            try:
                Pub._topics[self.topic].remove(self._q)
            except ValueError:
                pass


@contextmanager
def worker_client():
    """Reference `distributed/worker_client.py` escape hatch: tasks that
    submit subtasks. Driver-threaded tasks can always reach the client,
    so this is just a scoped handle."""
    from dask_distributed_vanilla_spark.client import Client

    yield Client()
