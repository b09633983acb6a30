"""largest_remainder_alloc property tests: for random stratum count
vectors the Hamilton allocation must (a) hit the requested total
EXACTLY, (b) give every stratum floor(quota) or floor(quota)+1 —
the quota-rule guarantee that distinguishes largest-remainder from
divisor methods, and (c) be deterministic under remainder ties
(source-name order)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from target_hdfs_spark.operators.curation import largest_remainder_alloc

counts_strategy = st.lists(
    st.integers(min_value=1, max_value=50), min_size=1, max_size=8
)
totals_strategy = st.integers(min_value=0, max_value=60)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(counts=counts_strategy, total_n=totals_strategy)
def test_hamilton_quota_rule(spark, counts, total_n):
    cnt = spark.createDataFrame(
        [(f"s{i:02d}", c) for i, c in enumerate(counts)], "source string, c long"
    )
    got = {
        r.source: r.n_alloc
        for r in largest_remainder_alloc(cnt, total_n).collect()
    }
    assert sum(got.values()) == total_n
    c_total = sum(counts)
    for i, c in enumerate(counts):
        quota = total_n * c / c_total
        assert got[f"s{i:02d}"] in (math.floor(quota), math.floor(quota) + 1)


def test_hamilton_tie_breaks_by_name(spark):
    # two identical strata, one leftover seat: the lexicographically
    # first source gets it
    cnt = spark.createDataFrame(
        [("b", 10), ("a", 10)], "source string, c long"
    )
    got = {
        r.source: r.n_alloc for r in largest_remainder_alloc(cnt, 3).collect()
    }
    assert got == {"a": 2, "b": 1}
