"""Custom stateful streaming operators (applyInPandasWithState) plus the
built-in session-window aggregation.

The reference has no streaming at all (SURVEY.md §2; its append is a
batch whole-table rewrite, /root/reference/oakstore/store.py:214-236).
These are the EXT streaming ops a 100 TB/day ingest needs beyond
stateless maps and tumbling windows:

- ``session_window_stats``: gap-based sessions with Spark's built-in
  ``session_window`` — state is managed by the engine, bounded by the
  watermark; identical gap semantics to the batch ``sessionize``
  operator, which makes batch/stream differential testing possible;
- ``running_user_totals``: a custom per-key accumulator via
  ``applyInPandasWithState`` — the escape hatch for stateful logic the
  built-in windows can't express. State is one row of counters per key
  (constant-size regardless of stream length), updates are vectorized
  pandas per micro-batch, and emission happens every batch (update-mode
  semantics).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def session_window_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Watermarked gap-session aggregation with the built-in
    ``session_window`` (merges events whose gaps are < ``gap``; a session
    closes — and its single row is emitted in append mode — once the
    watermark passes its end)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("win"), key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col(key_col),
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


# output + state schemas for running_user_totals
_TOTALS_OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
_TOTALS_STATE_SCHEMA = "n bigint, total double"


def running_user_totals(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Cumulative per-user event count + value sum across micro-batches.

    Demonstrates the custom-stateful path: each key holds a constant-size
    (count, sum) state tuple; every micro-batch updates it from the
    batch's rows (vectorized pandas) and emits the new running total.
    Use update output mode; at 100 TB/day the state store holds one tiny
    row per user, checkpointed incrementally.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=_TOTALS_OUTPUT_SCHEMA,
        stateStructType=_TOTALS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _require_tws_protocol() -> None:
    """transformWithStateInPandas speaks a protobuf side-channel to the
    JVM (pyspark/sql/streaming/proto/StateMessage_pb2); without the
    ``protobuf`` package the driver worker crashes with an opaque
    STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE deep inside query
    startup. Fail fast at operator construction with an actionable
    message instead. (applyInPandasWithState — running_user_totals —
    does not need protobuf and is the always-available fallback.)"""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(not installed in this environment); use the "
            "applyInPandasWithState operators instead"
        ) from e


def running_user_totals_tws(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """The same per-user accumulator on ``transformWithStateInPandas`` —
    Spark 4's successor stateful API (typed ValueState handles, explicit
    init/close lifecycle, optional timers/TTL). Kept semantically
    identical to ``running_user_totals`` so the differential test can
    pin old-API/new-API/batch agreement three ways.

    Scale note: state is one (count, sum) ValueState row per user in the
    RocksDB-backed store, updated per micro-batch — identical bounded
    footprint to the legacy path, but the handle API lets a 100 TB/day
    pipeline add TTL eviction for dormant keys without restructuring."""
    _require_tws_protocol()
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", _TOTALS_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n, total = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return events.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=Totals(),
        outputStructType=_TOTALS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def session_close_on_timer(
    events: DataFrame,
    gap_sec: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Timer-driven session closing on ``transformWithStateInPandas``
    (timeMode=EventTime): each user's state accumulates (n_events,
    first/last event time); every input re-registers ONE event-time
    timer at ``last_ts + gap``, and when the WATERMARK passes that
    instant the timer fires, the closed session is EMITTED and state +
    timer are cleared. This is the push-based complement to the
    session_window aggregate: sessions appear exactly when they close,
    without a query re-scan — the canonical pattern for
    inactivity/abandonment detection at stream scale. State per key is
    one row + one timer regardless of session length; dormant keys'
    state leaves with their final timer, so the store size tracks
    ACTIVE sessions only.

    Input must carry a watermark on ``ts_col``. Output: one row per
    CLOSED session (user_id, n_events, session_start, session_end);
    sessions still open when the stream ends remain unemitted
    (exactly the streaming contract: they are not closed yet)."""
    _require_tws_protocol()
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("start_ms", T.LongType()),
            T.StructField("last_ms", T.LongType()),
        ]
    )
    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("session_start", T.TimestampType()),
            T.StructField("session_end", T.TimestampType()),
        ]
    )
    gap_ms = gap_sec * 1000

    class SessionCloser(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._state = handle.getValueState("sess", state_schema)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            # Sessions close two ways: the timer below (inactivity with
            # no further input), or HERE on arrival of an event past the
            # gap — the watermark lags real time, so a key's next-session
            # event can land before its previous session's timer fires.
            n, start_ms, last_ms = (
                self._state.get() if self._state.exists() else (0, None, None)
            )
            closed: list[tuple[int, int, int]] = []
            for pdf in rows:
                ts_ms = sorted(
                    int(v) for v in (pdf[ts_col].astype("int64") // 1_000_000)
                )
                for t in ts_ms:
                    if last_ms is not None and t - last_ms > gap_ms:
                        closed.append((n, start_ms, last_ms))
                        n, start_ms, last_ms = 0, None, None
                    n += 1
                    start_ms = t if start_ms is None else min(start_ms, t)
                    last_ms = t if last_ms is None else max(last_ms, t)
            if last_ms is not None:
                for t in self._handle.listTimers():
                    self._handle.deleteTimer(t)
                self._handle.registerTimer(last_ms + gap_ms)
                self._state.update((n, start_ms, last_ms))
            if closed:
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]] * len(closed),
                        "n_events": [c[0] for c in closed],
                        "session_start": [
                            pd.Timestamp(c[1], unit="ms") for c in closed
                        ],
                        "session_end": [
                            pd.Timestamp(c[2], unit="ms") for c in closed
                        ],
                    }
                )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            if not self._state.exists():
                return iter(())
            n, start_ms, last_ms = self._state.get()
            self._state.clear()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "session_start": [pd.Timestamp(start_ms, unit="ms")],
                    "session_end": [pd.Timestamp(last_ms, unit="ms")],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=SessionCloser(),
        outputStructType=out_schema,
        outputMode="Append",
        timeMode="EventTime",
    )


def session_close_on_timeout(
    events: DataFrame,
    gap_sec: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """The same timer-closed sessions as ``session_close_on_timer`` on
    the LEGACY stateful API (``applyInPandasWithState`` +
    ``EventTimeTimeout``) — which needs no protobuf side-channel, so it
    runs everywhere the TWS path cannot (and its differential test runs
    in THIS environment; the two operators emit identical rows where
    both work). Semantics: a key's state times out when the watermark
    passes ``setTimeoutTimestamp(last_ts + gap)``; the timed-out call
    emits the closed session and removes state. Arrivals past the gap
    split on arrival, exactly as in the TWS variant."""
    out_schema = (
        "user_id bigint, n_events bigint, "
        "session_start timestamp, session_end timestamp"
    )
    state_schema = "n bigint, start_ms bigint, last_ms bigint"
    gap_ms = gap_sec * 1000

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, start_ms, last_ms = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "session_start": [pd.Timestamp(start_ms, unit="ms")],
                    "session_end": [pd.Timestamp(last_ms, unit="ms")],
                }
            )
            return
        n, start_ms, last_ms = state.get if state.exists else (0, None, None)
        closed: list[tuple[int, int, int]] = []
        for pdf in pdfs:
            ts_ms = sorted(
                int(v) for v in (pdf[ts_col].astype("int64") // 1_000_000)
            )
            for t in ts_ms:
                if last_ms is not None and t - last_ms > gap_ms:
                    closed.append((n, start_ms, last_ms))
                    n, start_ms, last_ms = 0, None, None
                n += 1
                start_ms = t if start_ms is None else min(start_ms, t)
                last_ms = t if last_ms is None else max(last_ms, t)
        if last_ms is not None:
            state.update((n, start_ms, last_ms))
            state.setTimeoutTimestamp(last_ms + gap_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(closed),
                    "n_events": [c[0] for c in closed],
                    "session_start": [pd.Timestamp(c[1], unit="ms") for c in closed],
                    "session_end": [pd.Timestamp(c[2], unit="ms") for c in closed],
                }
            )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
