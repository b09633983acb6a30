"""skyline_2d property tests: the cumulative-max window rewrite must
return exactly the Pareto-optimal set an O(n^2) dominance scan
returns, for random multisets including axis ties and full
duplicates (neither of an identical pair dominates the other, so
both must survive)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from target_hdfs_spark.operators.analytics import skyline_2d

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),  # group
        st.integers(min_value=0, max_value=8),  # minimize axis (ties likely)
        st.integers(min_value=0, max_value=8),  # maximize axis (ties likely)
    ),
    min_size=1,
    max_size=30,
)


def _brute_skyline(rows: list[tuple[int, int, int]]) -> set[tuple[int, int, int, int]]:
    out = set()
    for i, (g, mn, mx) in enumerate(rows):
        dominated = any(
            g2 == g
            and mn2 <= mn
            and mx2 >= mx
            and (mn2 < mn or mx2 > mx)
            for j, (g2, mn2, mx2) in enumerate(rows)
            if j != i
        )
        if not dominated:
            out.add((i, g, mn, mx))
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=rows_strategy)
def test_skyline_matches_quadratic_dominance_scan(spark, rows):
    df = spark.createDataFrame(
        [(i, g, mn, mx) for i, (g, mn, mx) in enumerate(rows)],
        "rowid long, grp long, price long, size long",
    )
    got = {
        (r.rowid, r.grp, r.price, r.size)
        for r in skyline_2d(df, "grp", "price", "size").collect()
    }
    assert got == _brute_skyline(rows)
