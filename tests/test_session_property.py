"""Property test for session windows: Spark's session_window
aggregation must agree with a brute-force gap-merge reference on
randomized event streams (collisions, singleton sessions, exact-gap
boundaries)."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

BASE = dt.datetime(2026, 8, 13, 10, 0, 0)
GAP = 10  # seconds


def _gen(seed: int):
    rng = random.Random(seed * 7919)
    rows = []
    eid = 0
    for u in range(rng.randint(1, 3)):
        t = 0
        for _ in range(rng.randint(1, 12)):
            # steps straddle the gap, including exactly-at-gap cases
            t += rng.choice([0, 1, 3, 9, 10, 11, 25])
            rows.append((eid, u, BASE + dt.timedelta(seconds=t)))
            eid += 1
    return rows


def _brute_force(rows):
    sessions = []
    by_user: dict[int, list[dt.datetime]] = {}
    for (_e, u, ts) in rows:
        by_user.setdefault(u, []).append(ts)
    for u, tss in by_user.items():
        tss.sort()
        start, last, n = tss[0], tss[0], 1
        for ts in tss[1:]:
            # Spark merges an event landing EXACTLY at last+gap; a new
            # session starts only when the gap is strictly exceeded
            # (verified by this very test — the >= variant fails on
            # boundary-grid data)
            if (ts - last).total_seconds() > GAP:
                sessions.append((u, start, last + dt.timedelta(seconds=GAP), n))
                start, n = ts, 0
            last = ts
            n += 1
        sessions.append((u, start, last + dt.timedelta(seconds=GAP), n))
    return sorted(sessions)


@pytest.mark.parametrize("seed", range(10))
def test_session_window_matches_brute_force(spark, seed):
    rows = _gen(seed)
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in (
            df.groupBy(F.session_window("ts", f"{GAP} seconds"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                "user_id",
                F.col("session_window.start").alias("session_start"),
                F.col("session_window.end").alias("session_end"),
                "n_events",
            )
            .collect()
        )
    )
    assert got == _brute_force(rows), f"seed={seed}"
