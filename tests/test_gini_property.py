"""Property tests for the round-6 statistical scan helpers:
gini_split_scan's cumulative rewrite must equal a per-threshold
brute-force evaluation (same integer identity evaluated directly),
and weighted_lower_percentiles' segmented two-level prefix scan must
equal a single sorted cumulative pass — including weight ties, value
ties, and band-boundary values."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from target_hdfs_spark.operators.analytics import (
    _GINI_PPM,
    gini_split_scan,
    weighted_lower_percentiles,
)

gini_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),  # feature level (ties likely)
        st.integers(min_value=0, max_value=1),  # label
    ),
    min_size=2,
    max_size=40,
)


def _brute_gini(rows):
    nt = len(rows)
    c1t = sum(y for _, y in rows)
    out = {}
    for thr in sorted({q for q, _ in rows}):
        left = [(q, y) for q, y in rows if q <= thr]
        nl, c1l = len(left), sum(y for _, y in left)
        if nl == nt:
            continue
        nr, c1r = nt - nl, c1t - c1l

        def g(n, c1):
            c0 = n - c1
            return (n * n - c1 * c1 - c0 * c0) * _GINI_PPM // (n * n)

        out[thr] = (nl, nr, (nl * g(nl, c1l) + nr * g(nr, c1r)) // nt)
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=gini_rows)
def test_gini_scan_matches_per_threshold_brute_force(spark, rows):
    df = spark.createDataFrame(rows, "q long, y long")
    got = {
        r.threshold: (r.n_left, r.n_right, r.gini_ppm)
        for r in gini_split_scan(df).collect()
    }
    assert got == _brute_gini(rows)


wp_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),  # group
        # values straddle the band boundary at 10.0 deliberately
        st.floats(min_value=0, max_value=25, allow_nan=False, width=32),
        st.integers(min_value=1, max_value=9),  # weight
    ),
    min_size=1,
    max_size=40,
)


def _brute_wp(rows):
    out = {}
    for g in {r[0] for r in rows}:
        sub = sorted((p, w) for gg, p, w in rows if gg == g)
        tw = sum(w for _, w in sub)
        qs = []
        for num, den in ((1, 4), (1, 2), (3, 4)):
            cw = 0
            pick = None
            for p, w in sub:
                cw += w
                if cw * den >= num * tw:
                    pick = p
                    break
            qs.append(pick)
        out[g] = (tw, *qs)
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=wp_rows)
def test_weighted_percentiles_match_sorted_scan(spark, rows):
    df = spark.createDataFrame(rows, "rf long, p double, w long")
    got = {
        r.rf: (r.tw, r.wp25, r.wp50, r.wp75)
        for r in weighted_lower_percentiles(df, band_width=10.0).collect()
    }
    assert got == _brute_wp(rows)
