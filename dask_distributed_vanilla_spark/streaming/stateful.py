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

    import numpy as np

    frames = list(pdfs)
    rows = frames[0] if len(frames) == 1 else pd.concat(frames)
    closed: list[tuple[int, int, int, float]] = []
    cur = state.get if state.exists else None
    if not len(rows):
        if cur is not None:
            state.update(cur)
            state.setTimeoutTimestamp(
                state.getCurrentWatermarkMs() + SESSION_GAP_SECONDS * 1000 + 1
            )
        return
    # Vectorized in-batch fold: gap breaks via a shifted diff, per-segment
    # aggregates via reduceat — the per-event Python loop this replaces
    # was the micro-batch hot spot (state handling stays row-free).
    # Ordering via numpy lexsort on just the 3 consumed columns instead
    # of DataFrame.sort_values: sort_values copies the whole frame per
    # key, and this function runs once per user per micro-batch (r14,
    # guide §4.2 — keep the per-batch Python constant term down). Order
    # is identical: (ts, event_id) is a total order (event_id unique).
    ts_us = rows["ts"].to_numpy(dtype="datetime64[ns]").astype("int64") // 1000
    order = np.lexsort((rows["event_id"].to_numpy(), ts_us))
    ts_us = ts_us[order]
    vals = rows["value"].to_numpy(dtype="float64")[order]
    prev = np.empty_like(ts_us)
    prev[1:] = ts_us[:-1]
    # no carry → the first row always opens a session (forced break)
    prev[0] = cur[1] if cur is not None else ts_us[0] - _GAP_US - 1
    starts_idx = np.flatnonzero((ts_us - prev) > _GAP_US)
    if cur is not None and (starts_idx.size == 0 or starts_idx[0] != 0):
        # first segment continues the carried session
        seg_end = starts_idx[0] if starts_idx.size else ts_us.size
        cur = (
            cur[0],
            int(ts_us[seg_end - 1]),
            cur[2] + int(seg_end),
            cur[3] + float(vals[:seg_end].sum()),
        )
        if starts_idx.size:
            closed.append(cur)
            cur = None
    elif cur is not None:
        # batch starts with a gap jump: the carried session closes as-is
        closed.append(cur)
        cur = None
    if starts_idx.size:
        seg_ends = np.r_[starts_idx[1:], ts_us.size]
        seg_n = seg_ends - starts_idx
        seg_sv = np.add.reduceat(vals, starts_idx)
        for i in range(starts_idx.size):
            closed.append(
                (
                    int(ts_us[starts_idx[i]]),
                    int(ts_us[seg_ends[i] - 1]),
                    int(seg_n[i]),
                    float(seg_sv[i]),
                )
            )
        cur = closed.pop()  # the last segment stays open
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


# --- transformWithState (Spark 4 arbitrary-state API) -------------------
# The API surface exists in this build, but its Python worker protocol
# requires google.protobuf, which this container does not ship — so the
# processor below is the real program for the new API, exercised by a
# test that SKIPS unless protobuf is importable (the documented gate;
# on any standard cluster image it runs).
try:
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    HAVE_TWS = True
except ImportError:  # pragma: no cover - older builds
    HAVE_TWS = False

    class StatefulProcessor:  # type: ignore[no-redef]
        pass

try:
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    HAVE_TWS_RUNTIME = HAVE_TWS
except ImportError:
    HAVE_TWS_RUNTIME = False


class RunningTotalsProcessor(StatefulProcessor):
    """Per-user lifetime totals in a ValueState — the minimal honest
    program on the NEW arbitrary-state API (transformWithState, the
    successor to applyInPandasWithState: typed state handles, explicit
    init/close lifecycle, composable value/list/map state).

    Money accumulates in integer CENTS: the fixture's values carry two
    decimals, so round(value·100) is exact and the running sum is
    integer arithmetic — bit-identical on every engine, no float-sum
    ordering to worry about.
    """

    def init(self, handle) -> None:
        self._totals = handle.getValueState("totals", "cnt LONG, cents LONG")

    def handleInputRows(self, key, rows, timerValues):
        import numpy as np

        if self._totals.exists():
            cnt, cents = self._totals.get()
        else:
            cnt, cents = 0, 0
        for pdf in rows:
            cnt += len(pdf)
            cents += int(np.rint(pdf["value"].to_numpy() * 100).astype("int64").sum())
        self._totals.update((cnt, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [cnt], "sv": [cents / 100.0]}
        )

    def close(self) -> None:
        pass
