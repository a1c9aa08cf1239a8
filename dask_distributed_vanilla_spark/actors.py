"""Stateful actor facade — the reference's Actor/ActorFuture surface.

Mirrors `distributed/actor.py:12-260`: ``client.submit(Cls, actor=True)``
resolves to an :class:`Actor` proxy; calling a method on the proxy
returns an :class:`ActorFuture`; reading a non-callable attribute
returns its current value synchronously (the reference fetches it via a
worker RPC without waiting for queued method calls — tests poll
``counter.n`` while ``add`` runs, `distributed/tests/test_actor.py:98-105`).

Placement: the reference hosts the object on one remote worker and
serializes method execution there. Spark has no remote stateful-object
hosting, so the object lives on the driver with a dedicated
single-thread executor providing the same one-at-a-time execution
guarantee; any Spark actions a method performs still parallelize on the
cluster. For *distributed* mutable state at 100 TB the scale path is
Structured Streaming's `applyInPandasWithState`
(streaming/stateful.py) — this facade covers the task-parallel actor
API, which is driver-orchestration by nature.
"""

from __future__ import annotations

import concurrent.futures
import itertools
import threading
from typing import Any

_actor_counter = itertools.count()


class ActorFuture:
    """Handle for one in-flight actor method call (reference
    `distributed/actor.py:205-260`). ``result()`` blocks, re-raises the
    method's exception, and is idempotent."""

    def __init__(self, fut: concurrent.futures.Future):
        self._fut = fut

    def result(self, timeout: float | None = None) -> Any:
        return self._fut.result(timeout)

    def done(self) -> bool:
        return self._fut.done()

    def __repr__(self) -> str:  # test_actor.py:278 checks the class name
        return "<ActorFuture>"


class Actor:
    """Proxy controlling a stateful object (reference
    `distributed/actor.py:12-203`). Method access returns a callable
    that schedules onto the actor's serial executor and yields an
    ActorFuture; non-callable attributes read the live value."""

    def __init__(self, cls: type, obj: Any, key: str):
        # double-underscore avoids colliding with user attributes routed
        # through __getattr__
        self._cls = cls
        self._obj = obj
        self.key = key
        self._exec = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix=f"actor-{key}"
        )
        self._closed = False
        self._lock = threading.Lock()

    def __repr__(self) -> str:
        return f"<Actor: {self._cls.__name__}, key={self.key}>"

    def __dir__(self):
        o = set(dir(type(self)))
        o.update(a for a in dir(self._cls) if not a.startswith("_"))
        return sorted(o)

    def __getattr__(self, name: str) -> Any:
        if name.startswith("_"):
            raise AttributeError(name)
        attr = getattr(type(self.__dict__["_obj"]), name, None)
        if attr is not None and callable(attr):
            obj = self.__dict__["_obj"]

            def call(*args: Any, **kwargs: Any) -> ActorFuture:
                with self._lock:
                    if self._closed:
                        raise ValueError(f"Actor {self.key} is closed")
                    fut = self._exec.submit(attr, obj, *args, **kwargs)
                return ActorFuture(fut)

            call.__name__ = name
            return call
        # non-callable: live value, no queuing (matches reference RPC read)
        return getattr(self.__dict__["_obj"], name)

    def close(self) -> None:
        with self._lock:
            self._closed = True
        self._exec.shutdown(wait=True)


def create_actor(cls: type, *args: Any, **kwargs: Any) -> Actor:
    """Instantiate ``cls`` and wrap it; constructor errors propagate to
    the submit future (reference test_exceptions_create)."""
    key = f"{cls.__name__}-{next(_actor_counter)}"
    return Actor(cls, cls(*args, **kwargs), key)
