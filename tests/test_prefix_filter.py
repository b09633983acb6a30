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


def test_prefix_filter_routing_guard_fires_on_adversarial_corpus(spark):
    """r7 verdict item 2: the tiny-vocabulary corpus (every doc drawn
    from a handful of shingles) makes the prefix self-join's fan-out
    quadratic — the in-plan guard must raise a ROUTING error naming
    the LSH pipeline before the join materializes, turning q243's
    advisory decision into a load-bearing one."""
# 3000 docs all sharing one 4-token set (boilerplate corpus): the
    # t=1/3 prefix keeps 3 of 4 shingles, each with df = 3000, so the
    # join would materialize 3 * C(3000, 2) ~ 13.5M candidate rows =
    # ~4500 per doc, over the 4096-per-doc cap. AQE may surface the
    # USER_RAISED_EXCEPTION wrapped in a stage-materialization error,
    # so match on the routing message, not the exception class.
    rows = [(i, f"t{tok}") for i in range(3000) for tok in range(4)]
    sh = spark.createDataFrame(rows, "doc_id long, shingle string")
    with pytest.raises(Exception, match="lsh-verify:q92"):
        prefix_filter_pairs(sh, 1, 3).collect()
    # guard=False is the documented escape hatch for callers that have
    # already routed (and results stay exact under it)
    small = spark.createDataFrame(rows[: 4 * 40], "doc_id long, shingle string")
    assert prefix_filter_pairs(small, 1, 2, guard=False).count() == 40 * 39 // 2


def test_prefix_filter_width_guard_fires_on_mega_doc(spark):
    """The guard row also enforces the array-width cap: one doc above
    the per-doc distinct-shingle bound fails fast with the routing
    message BEFORE the verify collects any array (pair_overlap_counts
    routes such docs; the exact-prefix path deliberately fail-fasts)."""
    from target_hdfs_spark.operators.dedup import _POC_MAX_DOC_SHINGLES

    rows = [(0, s) for s in range(_POC_MAX_DOC_SHINGLES + 1)] + [
        (1, 0),
        (1, 1),
    ]
    sh = spark.createDataFrame(rows, "doc_id long, shingle long")
    with pytest.raises(Exception, match="q92_lsh_verified_pairs"):
        prefix_filter_pairs(sh, 1, 3).collect()


def test_prefix_filter_guard_passes_empty_input(spark):
    """The guard's SUM over zero prefix rows is NULL — coalesce must
    keep an empty corpus on the pass branch, not raise."""
    sh = spark.createDataFrame([], "doc_id long, shingle string")
    assert prefix_filter_pairs(sh).count() == 0


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


def test_pair_overlap_counts_routes_mega_docs(spark):
    """r7 verdict item 3: docs above the distinct-shingle cap must
    never be collected into one array row — their pairs route to the
    streaming verify, with identical exact counts (including a
    zero-overlap big pair) so every q92-family oracle is unchanged."""
    from target_hdfs_spark.operators.dedup import pair_overlap_counts

    sets = {
        0: set(range(20)),        # mega-doc (cap set to 8 below)
        1: {1, 2, 3},             # overlaps the mega-doc
        2: {100, 101},            # zero overlap with the mega-doc
        3: {2, 3, 100},           # small-small partner
    }
    rows = [(d, s) for d, els in sets.items() for s in els]
    sh = spark.createDataFrame(rows, "doc_id long, shingle long")
    cand = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (2, 3)], "doc_a long, doc_b long"
    )
    got = {
        (r.doc_a, r.doc_b): (r.na, r.nb, r.n_common)
        for r in pair_overlap_counts(cand, sh, max_doc_shingles=8).collect()
    }
    expected = {
        (a, b): (len(sets[a]), len(sets[b]), len(sets[a] & sets[b]))
        for a, b in [(0, 1), (0, 2), (1, 3), (2, 3)]
    }
    assert got == expected
    # duplicate element rows must not inflate counts on either path
    # (countDistinct sizes + collect_set arrays + deduped postings)
    sh_dup = sh.union(sh)
    got_dup = {
        (r.doc_a, r.doc_b): (r.na, r.nb, r.n_common)
        for r in pair_overlap_counts(cand, sh_dup, max_doc_shingles=8).collect()
    }
    assert got_dup == expected


def test_pair_overlap_counts_guard_survives_optimization(spark):
    """Plan pin: the width-bound routing must still be present in the
    OPTIMIZED physical plan — a broadcast anti-join keeps oversized
    docs out of the collect_set aggregation, and the union of the two
    verify paths is real (not optimized to a single collect branch)."""
    from target_hdfs_spark.operators.dedup import pair_overlap_counts

    sh = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 1)], "doc_id long, shingle long"
    )
    cand = spark.createDataFrame([(0, 1)], "doc_a long, doc_b long")
    plan = (
        pair_overlap_counts(cand, sh)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftAnti" in plan, "anti-join width guard was optimized away"
    assert "collect_set" in plan
    assert "Union" in plan, "streaming verify branch was optimized away"


# ---------------------------------------------------------------------------
# Guard BOUNDARY fuzz (r8 verdict item 6): corpora straddling each cap
# by one unit — at the bound must pass and return exact results, one
# past must fire the routing error — plus the strict-ordering
# eager_guard mode on a 10x adversarial corpus, pinning that the
# fail-fast precedes any join/verify materialization by construction,
# not by winning the AQE stage race.
# ---------------------------------------------------------------------------


def test_prefix_filter_width_guard_boundary(spark):
    """One doc with EXACTLY _POC_MAX_DOC_SHINGLES distinct shingles
    sits AT the array cap: the guard must pass and the verify must
    still produce the exact result; the +1 firing case is pinned by
    test_prefix_filter_width_guard_fires_on_mega_doc."""
    from target_hdfs_spark.operators.dedup import _POC_MAX_DOC_SHINGLES

    cap = _POC_MAX_DOC_SHINGLES
    # doc 0 at the cap; docs 1 and 2 are identical small docs whose
    # shingles are a subset of doc 0's (jaccard(1,2)=1 passes t=1/3;
    # jaccard(0,1)=2/cap fails) — the result must be exactly {(1,2)}
    rows = (
        [(0, s) for s in range(cap)]
        + [(1, 0), (1, 1)]
        + [(2, 0), (2, 1)]
    )
    sh = spark.createDataFrame(rows, "doc_id long, shingle long")
    out = prefix_filter_pairs(sh, 1, 3).collect()
    assert [(r.doc_a, r.doc_b, r.n_common) for r in out] == [(1, 2, 2)]


def test_prefix_filter_volume_guard_boundary(spark, monkeypatch):
    """Candidate volume exactly AT the per-doc bound passes; one more
    document tips it over and fires. The cap is monkeypatched small so
    the boundary is reachable at unit-test scale with EXACT arithmetic:
    a D-doc boilerplate corpus sharing 4 shingles at t=1/3 keeps 3
    prefix shingles of df=D, so n_cand = 3*C(D,2) and the bound is
    cap*D — equal at D=9 for cap=12 (108 == 108), over at D=10
    (135 > 120)."""
    from target_hdfs_spark.operators import dedup

    monkeypatch.setattr(dedup, "_PREFIX_CAND_PER_DOC_MAX", 12)
    at_bound = [(i, f"t{tok}") for i in range(9) for tok in range(4)]
    sh = spark.createDataFrame(at_bound, "doc_id long, shingle string")
    # every pair is identical -> all C(9,2) pairs at jaccard 1
    assert prefix_filter_pairs(sh, 1, 3).count() == 9 * 8 // 2
    over = [(i, f"t{tok}") for i in range(10) for tok in range(4)]
    sh2 = spark.createDataFrame(over, "doc_id long, shingle string")
    with pytest.raises(Exception, match="lsh-verify:q92"):
        prefix_filter_pairs(sh2, 1, 3).collect()


def test_prefix_filter_eager_guard_strict_ordering(spark):
    """eager_guard=True evaluates the guard as its own driver-side job
    BEFORE the join plan is constructed — on a 10x adversarial corpus
    (30k boilerplate docs, ~45M would-be candidates) the routing error
    must surface from the guard pass alone; the join/verify stages are
    never submitted because the plan is never built. Also: on a clean
    corpus the eager mode returns the identical exact result."""
    rows = [(i, f"t{tok}") for i in range(30_000) for tok in range(4)]
    sh = spark.createDataFrame(rows, "doc_id long, shingle string")
    with pytest.raises(Exception, match="lsh-verify:q92"):
        prefix_filter_pairs(sh, 1, 3, eager_guard=True).collect()
    clean = [(i, f"t{i}_{tok}") for i in range(50) for tok in range(4)] + [
        (100, "t0_0"),
        (100, "t0_1"),
        (100, "t0_2"),
        (100, "t0_3"),
    ]
    sh2 = spark.createDataFrame(clean, "doc_id long, shingle string")
    out = prefix_filter_pairs(sh2, 1, 3, eager_guard=True).collect()
    assert [(r.doc_a, r.doc_b, r.n_common) for r in out] == [(0, 100, 4)]


def test_prefix_filter_eager_guard_mega_doc_fires_before_plan(spark):
    """The width cap under eager_guard: the oversized doc fails in the
    driver-side guard pass with the routing message (structural
    before-any-array ordering)."""
    from target_hdfs_spark.operators.dedup import _POC_MAX_DOC_SHINGLES

    rows = [(0, s) for s in range(_POC_MAX_DOC_SHINGLES + 1)] + [
        (1, 0),
        (1, 1),
    ]
    sh = spark.createDataFrame(rows, "doc_id long, shingle long")
    with pytest.raises(Exception, match="q92_lsh_verified_pairs"):
        prefix_filter_pairs(sh, 1, 3, eager_guard=True).collect()
