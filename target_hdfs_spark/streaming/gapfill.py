"""Streaming time-series densification (S-surface twin of
q135_hourly_gapfill): emit one row per (user, hour) — including
zero-filled silent hours — as hours CLOSE, with per-key state carrying
the open hour's running aggregates across micro-batches.

Semantics (the watermark-closure analog, stated precisely):
- an hour bucket is emitted when the FIRST event of a LATER hour
  arrives for that key (the hour "closes");
- silent hours between the closed hour and the newly opened one are
  emitted as zero rows at the same moment — so the emitted stream is
  gap-free and hour-ordered per key;
- the currently-open hour sits in state, not yet emitted (exactly a
  windowed aggregation's unclosed-window behavior).

Parity contract (pinned in tests/test_streaming_gapfill.py): over an
event-time-ordered per-key stream, the emitted rows equal the batch
q135 result minus each user's final (still-open) hour.

Exactness across batch boundaries: the open hour's value sum is held
as an int64 of 1e4-scaled units (events.value has 4 decimal digits in
the engine's DECIMAL(12,4) convention), so an hour split across
micro-batches accumulates exactly; the emitted double equals the
batch side's decimal→string→double value because both are the
correctly-rounded double of the same rational.

Scale: state is three int64s per key; each trigger's work is O(batch)
plus the emitted gap rows — the same output cardinality the batch
scaffold produces. A key silent for a year emits its gap rows only
when it next speaks; unbounded-idle keys compose with the event-time
TTL pattern from streaming/neardup.py.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

HOUR_US = 3_600_000_000

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("hour_start_us", T.LongType()),  # epoch µs, hour-truncated
        T.StructField("n_events", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("open_hour_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_scaled", T.LongType()),  # value * 1e4, exact
    ]
)


def _scaled(value: float) -> int:
    # events.value carries 4 decimal digits (DECIMAL(12,4) convention);
    # round-half-up like the engine's decimal cast
    return int(round(value * 10_000))


def _fill_group(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    if state.exists:
        open_hour, n_ev, sum_sc = state.get
    else:
        open_hour, n_ev, sum_sc = None, 0, 0
    out: list[tuple] = []
    whole = pd.concat(list(pdfs), ignore_index=True)
    for pdf in (whole.sort_values(["ts", "event_id"]),):
        for ts, value in zip(pdf["ts"], pdf["value"]):
            hour = (int(ts.value) // 1000 // HOUR_US) * HOUR_US  # ns -> µs
            if open_hour is None:
                open_hour, n_ev, sum_sc = hour, 0, 0
            elif hour > open_hour:
                # close the open hour, zero-fill the silence, reopen
                out.append((key[0], open_hour, n_ev, sum_sc / 10_000.0))
                gap = open_hour + HOUR_US
                while gap < hour:
                    out.append((key[0], gap, 0, 0.0))
                    gap += HOUR_US
                open_hour, n_ev, sum_sc = hour, 0, 0
            # hour < open_hour would be out-of-order input (contract:
            # event-time ordered per key); fold into the open hour
            n_ev += 1
            sum_sc += _scaled(float(value))
    state.update((open_hour, n_ev, sum_sc))
    yield pd.DataFrame(out, columns=[f.name for f in OUTPUT_SCHEMA.fields])


def stream_hourly_gapfill(events: DataFrame) -> DataFrame:
    """Start the densifier on a streaming frame with
    (user_id, event_id, ts, value)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _fill_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
