"""Custom stateful streaming operators via applyInPandasWithState.

The reference's stateful surface is actors + pubsub consumers holding
Python state on workers (`distributed/actor.py:12-260`, SURVEY.md §2.10
— documented as having no Spark analog for arbitrary method calls). The
*streaming-analytics* part of that capability does have a first-class
analog: `applyInPandasWithState` keeps per-key state across micro-batches
with watermark-driven timeouts. This module implements the canonical
case — gap-based sessionization (the streaming twin of the batch E5
query) — with state = the open session per user.

At scale: state lives in the state store partitioned by key; a user's
open session is O(1) bytes, watermark timeout closes idle sessions, so
state size tracks active users, not history.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_SECONDS = 30 * 60
_GAP_US = SESSION_GAP_SECONDS * 1_000_000

OUTPUT_SCHEMA = "user_id long, session_start timestamp, session_end timestamp, n_events long, sv double"
# start/last are epoch MICROseconds — the fixture carries sub-second
# event times, and second-truncated state would move session boundaries
STATE_SCHEMA = "start long, last long, n long, sv double"


def _round2(x: float) -> float:
    """Engine-portable half-up 2-decimal rounding (functions/rounding.py
    semantics; Python's round() is half-to-even and diverges on .xx5)."""
    return math.floor(x * 100 + 0.5) / 100


def _sessionize(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold a user's micro-batch events into the open session; emit every
    session closed by a >gap jump (or by state timeout)."""
    (user_id,) = key
    if state.hasTimedOut:
        start, last, n, sv = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start, unit="us")],
                "session_end": [pd.Timestamp(last, unit="us")],
                "n_events": [n],
                "sv": [_round2(sv)],
            }
        )
        return

    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    closed: list[tuple[int, int, int, float]] = []
    cur = state.get if state.exists else None
    for ts_val, value in zip(rows["ts"], rows["value"]):
        t = ts_val.value // 1000  # pandas ns → epoch µs
        if cur is None:
            cur = (t, t, 1, float(value))
        elif t - cur[1] > _GAP_US:
            closed.append(cur)
            cur = (t, t, 1, float(value))
        else:
            cur = (cur[0], t, cur[2] + 1, cur[3] + float(value))
    state.update(cur)
    state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + SESSION_GAP_SECONDS * 1000 + 1)
    if closed:
        yield pd.DataFrame(
            {
                "user_id": user_id,
                "session_start": [pd.Timestamp(c[0], unit="us") for c in closed],
                "session_end": [pd.Timestamp(c[1], unit="us") for c in closed],
                "n_events": [c[2] for c in closed],
                "sv": [_round2(c[3]) for c in closed],
            }
        )


def sessionize_stream(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Gap-sessionize an event stream with per-user state (streaming twin
    of operators/events.e5)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
