"""prefix_filter_pairs property tests: the PPJoin-style prefix filter
must return EXACTLY the pairs a brute-force all-pairs Jaccard scan
returns at threshold 1/2 — no false negatives (the prefix bound and
length filter are conservative) and no false positives (candidates
are exactly verified). Random small-universe sets make prefix
collisions, ties in document frequency, and size-filter boundary
cases (2*min == max) likely."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from target_hdfs_spark.operators.dedup import prefix_filter_pairs

# Each doc is a non-empty set of tokens from a 12-token universe:
# heavy overlap by construction.
sets_strategy = st.lists(
    st.sets(
        st.integers(min_value=0, max_value=11), min_size=1, max_size=8
    ),
    min_size=2,
    max_size=12,
)


def _brute_pairs(
    sets: list[set[int]], p: int = 1, q: int = 2
) -> set[tuple[int, int, int]]:
    out = set()
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            inter = len(sets[i] & sets[j])
            union = len(sets[i] | sets[j])
            if q * inter >= p * union:  # jaccard >= p/q, exact rational
                out.add((i, j, inter))
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sets=sets_strategy)
def test_prefix_filter_matches_brute_force(spark, sets):
    rows = [
        (i, f"t{tok:02d}") for i, s in enumerate(sets) for tok in s
    ]
    sh = spark.createDataFrame(rows, "doc_id long, shingle string")
    got = {
        (r.doc_a, r.doc_b, r.n_common)
        for r in prefix_filter_pairs(sh).collect()
    }
    assert got == _brute_pairs(sets)


@pytest.mark.parametrize("p,q", [(1, 3), (1, 2), (2, 3), (4, 5)])
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sets=sets_strategy)
def test_prefix_filter_any_rational_threshold(spark, p, q, sets):
    """r6 verdict item 5: the integer prefix/length/positional bounds
    generalize to any rational t = p/q — exact agreement with the
    brute-force scan at each threshold (false negatives would come
    from a too-short prefix or a too-tight positional bound; false
    positives from a buggy final predicate)."""
    rows = [
        (i, f"t{tok:02d}") for i, s in enumerate(sets) for tok in s
    ]
    sh = spark.createDataFrame(rows, "doc_id long, shingle string")
    got = {
        (r.doc_a, r.doc_b, r.n_common)
        for r in prefix_filter_pairs(sh, p, q).collect()
    }
    assert got == _brute_pairs(sets, p, q)


def test_prefix_filter_rejects_bad_threshold():
    import pyspark.sql  # noqa: F401 — spark-free arg validation

    with pytest.raises(ValueError, match="threshold"):
        prefix_filter_pairs(None, 0, 2)
    with pytest.raises(ValueError, match="threshold"):
        prefix_filter_pairs(None, 3, 2)


def test_prefix_filter_sizes_and_ppm(spark):
    # two half-overlapping sets exactly at the threshold boundary:
    # |a|=2, |b|=2, inter=1, union=3 -> jaccard 1/3 < 1/2: excluded;
    # |c|=3, |d|=3, inter=3 -> identical sets: jaccard 1 included.
    rows = (
        [(0, "a"), (0, "b"), (1, "b"), (1, "c")]
        + [(2, "x"), (2, "y"), (2, "z"), (3, "x"), (3, "y"), (3, "z")]
    )
    sh = spark.createDataFrame(rows, "doc_id long, shingle string")
    out = prefix_filter_pairs(sh).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.doc_a, r.doc_b, r.na, r.nb, r.n_common, r.jaccard_ppm) == (
        2,
        3,
        3,
        3,
        3,
        1_000_000,
    )


# ---------------------------------------------------------------------------
# pair_overlap_counts (the r7 shared verify core) — direct property
# test against brute-force set intersection, independent of any
# oracle composition
# ---------------------------------------------------------------------------


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sets=sets_strategy)
def test_pair_overlap_counts_matches_bruteforce(spark, sets):
    """For EVERY doc pair (all-pairs candidates), the collected-array
    verify must return exact set sizes and intersection counts —
    including zero-overlap pairs, which must stay PRESENT with
    n_common = 0 (q214's left-join contract)."""
    from target_hdfs_spark.operators.dedup import pair_overlap_counts

    rows = [(i, f"t{tok:02d}") for i, s in enumerate(sets) for tok in s]
    sh = spark.createDataFrame(rows, "doc_id long, shingle string")
    n = len(sets)
    cand = spark.createDataFrame(
        [(i, j) for i in range(n) for j in range(i + 1, n)],
        "doc_a long, doc_b long",
    )
    got = {
        (r.doc_a, r.doc_b): (r.na, r.nb, r.n_common)
        for r in pair_overlap_counts(cand, sh).collect()
    }
    expected = {
        (i, j): (len(sets[i]), len(sets[j]), len(sets[i] & sets[j]))
        for i in range(n)
        for j in range(i + 1, n)
    }
    assert got == expected
