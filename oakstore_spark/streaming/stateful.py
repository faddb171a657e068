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
