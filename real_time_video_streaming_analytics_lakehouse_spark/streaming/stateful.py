"""Custom stateful streaming: gap-based session aggregation.

The reference has NO custom stateful operators (SURVEY §2.8 — "no
mapGroupsWithState"); its session rollup is batch-only. This module adds
the streaming counterpart with ``applyInPandasWithState``: per-user
session state (start/end/count/value) survives across micro-batches, a
session closes when its inactivity gap exceeds ``gap_sec``, and closed
sessions are emitted exactly once. This is semantics a tumbling
``F.window`` cannot express (session length is data-driven, not fixed).

State design (100 TB notes):
  * State is keyed by user — one small dict per active user, bounded by
    the active-user cardinality, not event volume.
  * ``GroupStateTimeout.EventTimeTimeout`` + the watermark close idle
    sessions even if the user never returns, so state cannot grow
    unboundedly (the classic leak in hand-rolled sessionizers).
  * Arrow batches per group keep the Python boundary amortized.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id BIGINT, session_start TIMESTAMP, session_end TIMESTAMP, "
    "events INT, total_value DOUBLE, closed_by STRING"
)
STATE_SCHEMA = "start BIGINT, last BIGINT, events INT, total_value DOUBLE"

_US = 1_000_000


def _sessionize_group(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
    gap_sec: int,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    gap_us = gap_sec * _US
    closed: list[tuple[int, int, int, float, str]] = []

    if state.hasTimedOut:
        if state.exists:
            s, last, n, tv = state.get
            closed.append((s, last, n, tv, "timeout"))
            state.remove()
    else:
        rows = pd.concat(list(batches), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        ts_us = (rows["ts"].astype("int64")).to_numpy()  # ns → handled below
        if ts_us.size and ts_us[0] > 10**16:  # pandas datetime64[ns] → µs
            ts_us = ts_us // 1000
        values = rows["value"].to_numpy()
        if state.exists:
            s, last, n, tv = state.get
        else:
            s = last = -1
            n, tv = 0, 0.0
        for t_us, v in zip(ts_us, values):
            if s < 0:
                s, last, n, tv = t_us, t_us, 1, float(v)
            elif t_us - last > gap_us:
                closed.append((s, last, n, tv, "gap"))
                s, last, n, tv = t_us, t_us, 1, float(v)
            else:
                last = t_us
                n += 1
                tv += float(v)
        state.update((int(s), int(last), int(n), float(tv)))
        # Close the open session once the event-time watermark passes
        # gap_sec beyond its last event. Plain Python int: numpy int64
        # is not JSON-serializable in the state metadata.
        state.setTimeoutTimestamp(int(last) // 1000 + gap_sec * 1000)

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(s, unit="us") for s, *_ in closed],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, *_ in closed],
                "events": [n for _, _, n, _, _ in closed],
                "total_value": [round(tv, 2) for *_, tv, _ in closed],
                "closed_by": [c for *_, c in closed],
            }
        )


def sessionize_stream(
    events: DataFrame,
    gap_sec: int = 1800,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming gap-sessionization; emits one row per CLOSED session."""

    def fn(key, batches, state):
        return _sessionize_group(key, batches, state, gap_sec)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def running_user_totals_stream(events: DataFrame) -> DataFrame:
    """Running per-user lifetime totals via ``transformWithStateInPandas``
    (the Spark 4 arbitrary-state API that succeeds
    ``applyInPandasWithState``): ValueState carries (events, revenue)
    across micro-batches; each batch emits the user's updated totals —
    an update-mode running aggregate that windowed append-mode
    aggregation cannot express.

    Requires the RocksDB state store provider (transformWithState's
    backing store); the caller's session must set
    ``spark.sql.streaming.stateStore.providerClass`` to
    ``...RocksDBStateStoreProvider`` — see the test for the exact conf.

    State is one (long, double) pair per user — bounded by user
    cardinality, not event volume.
    """
    from pyspark.sql.streaming import StatefulProcessor
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    state_schema = StructType(
        [
            StructField("events", LongType()),
            StructField("revenue", DoubleType()),
        ]
    )
    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("events_total", LongType()),
            StructField("revenue_total", DoubleType()),
        ]
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle) -> None:
            self._totals = handle.getValueState("totals", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            events, revenue = 0, 0.0
            if self._totals.exists():
                events, revenue = self._totals.get()
            for pdf in rows:
                events += len(pdf)
                revenue += float(pdf["value"].sum())
            self._totals.update((events, revenue))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "events_total": [events],
                    "revenue_total": [round(revenue, 2)],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        RunningTotals(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
