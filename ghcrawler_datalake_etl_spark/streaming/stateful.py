"""Custom stateful streaming operator: gap-based sessionization.

The canonical "operator Spark lacks" case (SURVEY.md 7.2 step 8 /
project guidance): expressed twice -

- ``sessionize_batch``: lag + running-sum session ids over a window;
  pure Column expressions, exactly SQL-expressible, so it carries a full
  DuckDB oracle in the query inventory.
- ``sessionize_stream``: the same semantics over an unbounded stream via
  ``applyInPandasWithState`` - per-user state carries the open session
  across micro-batches; a session closes when a later event arrives more
  than ``gap`` after it (event-time gap, deterministic), and closed
  sessions are emitted in append mode.

The streaming form is verified against the batch form in
tests/test_streaming_stateful.py (same events split across micro-batch
files must yield the same closed sessions).

Scale: state is one small tuple per active user key; shuffle is the
groupBy(user) exchange only; Arrow batches amortize the Python hop. The
batch form's window sort is per-user-partition (no global sort).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_SCHEMA = (
    "user_id long, session_start_us long, session_end_us long, "
    "n_events long, total_value double"
)
_STATE_SCHEMA = "session_start_us long, last_ts_us long, n_events long, total_value double"


def sessionize_batch(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
    order_tiebreak: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Sessions = maximal runs of a user's events with inter-event gaps
    <= gap. Returns one row per session (closed or open-ended).

    Events with a NULL event time are EXCLUDED (explicitly, matching
    the streaming twin where watermarking drops them anyway): a
    timestamp-less event cannot be placed in any session, and leaving
    it to implicit sort placement would diverge across engines (Spark
    orders ascending NULLS FIRST, DuckDB NULLS LAST)."""
    events = events.filter(F.col(ts_col).isNotNull())
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    ts_us = F.unix_micros(F.col(ts_col))
    prev_us = F.lag(ts_us).over(w)
    new_session = (
        F.when(prev_us.isNull() | (ts_us - prev_us > gap_us), 1).otherwise(0)
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_ids = events.select(
        F.col(user_col).alias("user_id"),
        ts_us.alias("ts_us"),
        F.col(value_col).alias("value"),
        F.sum(new_session).over(wsum).alias("session_id"),
    )
    return with_ids.groupBy("user_id", "session_id").agg(
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    ).select(
        "user_id", "session_start_us", "session_end_us", "n_events", "total_value"
    )


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Streaming sessionization with explicit keyed state
    (``applyInPandasWithState``). Emits a session once a subsequent event
    closes it; the open session per user persists in state across
    micro-batches. Feed a ``readStream`` frame; append output mode.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs), ignore_index=True)
        if not len(rows):
            return
        rows = rows.sort_values(["_ts_us", "_tie"]).reset_index(drop=True)
        if state.exists:
            start_us, last_us, n, total = state.get
        else:
            start_us = last_us = None
            n, total = 0, 0.0
        closed: list[tuple[int, int, int, int, float]] = []
        uid = key[0]
        for ts_us, val in zip(rows["_ts_us"], rows["_value"]):
            ts_us = int(ts_us)
            if last_us is not None and ts_us - last_us > gap_us:
                closed.append((uid, start_us, last_us, n, round(total, 2)))
                start_us, n, total = ts_us, 0, 0.0
            if start_us is None:
                start_us = ts_us
            last_us = ts_us
            n += 1
            total += float(val)
        state.update((start_us, last_us, n, total))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id",
                    "session_start_us",
                    "session_end_us",
                    "n_events",
                    "total_value",
                ],
            )

    # same NULL-event-time exclusion as sessionize_batch: the twins
    # must agree, and a None _ts_us would poison the pandas sort/state
    prepared = events.filter(F.col(ts_col).isNotNull()).select(
        F.col(user_col).alias("user_id"),
        F.unix_micros(F.col(ts_col)).alias("_ts_us"),
        F.col("event_id").alias("_tie"),
        F.col(value_col).alias("_value"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
