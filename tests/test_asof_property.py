"""Property test for the union-and-fill as-of join: on randomized
event sets (including same-timestamp collisions), the distributed
construction must agree with a brute-force per-row reference
implementation."""

from __future__ import annotations

import datetime as dt
import random

import pytest

from target_hdfs_spark.operators.asof import asof_join

BASE = dt.datetime(2026, 8, 13, 10, 0, 0)


def _gen(seed: int):
    rng = random.Random(seed)
    n_users = rng.randint(1, 4)
    lefts, rights = [], []
    eid = 0
    for u in range(n_users):
        for _ in range(rng.randint(0, 8)):
            # coarse second grid -> frequent timestamp collisions
            ts = BASE + dt.timedelta(seconds=rng.randint(0, 20))
            lefts.append((eid, u, ts, float(rng.randint(0, 100))))
            eid += 1
        for _ in range(rng.randint(0, 8)):
            ts = BASE + dt.timedelta(seconds=rng.randint(0, 20))
            rights.append((eid, u, ts, float(rng.randint(0, 100))))
            eid += 1
    return lefts, rights


def _brute_force(lefts, rights):
    out = {}
    for (lid, lu, lts, _lv) in lefts:
        best = None
        for (rid, ru, rts, rv) in rights:
            if ru != lu or not rts < lts:
                continue
            # ties among rights: greatest (ts, id) wins — the
            # documented total ordering
            if best is None or (rts, rid) > (best[0], best[1]):
                best = (rts, rid, rv)
        out[lid] = (best[1], best[2]) if best else (None, None)
    return out


@pytest.mark.parametrize("seed", range(12))
def test_asof_matches_brute_force(spark, seed):
    lefts, rights = _gen(seed)
    if not lefts:
        pytest.skip("no left rows generated")
    schema = "event_id long, user_id long, ts timestamp, value double"
    ldf = spark.createDataFrame(lefts, schema)
    rdf = spark.createDataFrame(rights or [(99_999, 10**6, BASE, 0.0)], schema)

    got_df = asof_join(
        ldf,
        rdf,
        by="user_id",
        ts="ts",
        right_values={"event_id": "r_id", "value": "r_value"},
        left_id="event_id",
        right_id="event_id",
    )
    got = {r.event_id: (r.r_id, r.r_value) for r in got_df.collect()}
    want = _brute_force(lefts, rights)
    assert got == want, f"seed={seed}"
