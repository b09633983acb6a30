"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY §2B.3 — "applyInPandasWithState for custom stateful
operators"): logic that windowed aggregation can't express because
the state transition is arbitrary Python over Arrow batches.

Operator here: a per-key running anomaly detector. State carries
(n, sum, sum_sq) of all values seen; each incoming event is scored
against the mean/std of the state BEFORE it (so scoring is
order-dependent and genuinely stateful), then folded in. Events whose
|z-score| exceeds the threshold are emitted.

Scale: state is three floats per key — millions of keys fit trivially;
Spark shuffles each micro-batch by key and keeps state in the state
store (RocksDB-backed on a real cluster). This is the pattern for
sessionized feature extraction, fraud scoring, and drift detection at
100 TB/day.
"""

from __future__ import annotations

import math
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("zscore", T.DoubleType()),
        T.StructField("n_prior", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("total_sq", T.DoubleType()),
    ]
)

MIN_PRIOR = 3  # need a few observations before scoring means anything


def _score_group(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState, threshold: float
) -> Iterable[pd.DataFrame]:
    n, total, total_sq = state.get if state.exists else (0, 0.0, 0.0)
    out: list[tuple] = []
    # Groups larger than the Arrow batch size arrive as MULTIPLE
    # chunks in arbitrary order — concatenate before sorting, or the
    # fold order (and thus the z-scores) is run-dependent.
    whole = pd.concat(list(pdfs), ignore_index=True)
    for pdf in (whole.sort_values(["ts", "event_id"]),):
        for event_id, value in zip(pdf["event_id"], pdf["value"]):
            if n >= MIN_PRIOR:
                mean = total / n
                var = max(total_sq / n - mean * mean, 0.0)
                std = math.sqrt(var)
                z = (value - mean) / std if std > 0 else 0.0
                if abs(z) >= threshold:
                    out.append((key[0], int(event_id), float(value), z, n))
            n += 1
            total += float(value)
            total_sq += float(value) * float(value)
    state.update((n, total, total_sq))
    yield pd.DataFrame(out, columns=[f.name for f in OUTPUT_SCHEMA.fields])


def running_zscore_anomalies(
    events: DataFrame, threshold: float = 2.0
) -> DataFrame:
    """Streaming per-user anomaly filter: emit events deviating more
    than `threshold` standard deviations from the user's running
    mean (state accumulated across micro-batches).

    `events` must be a streaming DataFrame with columns
    (user_id, event_id, ts, value).
    """

    def fn(key, pdfs, state):
        return _score_group(key, pdfs, state, threshold)

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
