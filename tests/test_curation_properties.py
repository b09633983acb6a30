"""Hypothesis property tests for the round-11 kernel MATH — pure
Python mirrors of the integer formulas the engines share (the Spark
and DuckDB sides are pinned equal by the oracle gate; these pin the
formulas themselves against their real-valued definitions and their
guarantee bounds, for ANY input)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------------------
# Cohen's kappa: the sign-handled integer identity vs the float formula
# ---------------------------------------------------------------------------


def _kappa_ppm_int(n: int, ca: int, cb: int, nb: int) -> int:
    """q295's exact integer identity (sign-handled truncation)."""
    nn = n - ca - cb + nb
    pe = ca * cb + (n - ca) * (n - cb)
    num = n * (nb + nn) - pe
    den = max(n * n - pe, 1)
    if num < 0:
        return -((1_000_000 * -num) // den)
    return (1_000_000 * num) // den


@settings(max_examples=300, deadline=None)
@given(st.data())
def test_kappa_integer_identity_matches_float_kappa(data):
    n = data.draw(st.integers(min_value=1, max_value=10_000))
    ca = data.draw(st.integers(min_value=0, max_value=n))
    cb = data.draw(st.integers(min_value=0, max_value=n))
    # both counts constrain the overlap: max(0, ca+cb-n) <= nb <= min
    nb = data.draw(
        st.integers(min_value=max(0, ca + cb - n), max_value=min(ca, cb))
    )
    got = _kappa_ppm_int(n, ca, cb, nb)
    po = (nb + (n - ca - cb + nb)) / n
    pe = (ca * cb + (n - ca) * (n - cb)) / (n * n)
    if pe == 1.0:
        # degenerate marginals: the guarded identity returns num-vs-1
        assert isinstance(got, int)
        return
    kappa = (po - pe) / (1 - pe)
    assert abs(got / 1_000_000 - kappa) < 2e-6, (n, ca, cb, nb, got, kappa)
    assert -1_000_000 <= got <= 1_000_000


@settings(max_examples=200, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=10_000),
    ca=st.integers(min_value=0, max_value=10_000),
)
def test_kappa_perfect_and_independent_agreement(n, ca):
    ca = min(ca, n)
    # identical classifiers: kappa == 1 unless marginals are degenerate
    if 0 < ca < n:
        assert _kappa_ppm_int(n, ca, ca, ca) == 1_000_000
    # one classifier accepts everything: pe == po, kappa == 0
    assert _kappa_ppm_int(n, n, ca, ca) == 0


# ---------------------------------------------------------------------------
# DSIR smoothed integer ratio: monotonicity + the identity point
# ---------------------------------------------------------------------------

_B = 1024


def _r_ppm(cnt_t: int, cnt_r: int, tot_t: int, tot_r: int) -> int:
    return ((cnt_t + 1) * (tot_r + _B) * 1_000_000) // (
        (cnt_r + 1) * (tot_t + _B)
    )


@settings(max_examples=300, deadline=None)
@given(st.data())
def test_dsir_ratio_monotone_and_identity(data):
    tot_r = data.draw(st.integers(min_value=1, max_value=10**12))
    tot_t = data.draw(st.integers(min_value=1, max_value=tot_r))
    cnt_r = data.draw(st.integers(min_value=0, max_value=min(tot_r, 10**9)))
    cnt_t = data.draw(st.integers(min_value=0, max_value=min(cnt_r, tot_t)))
    r = _r_ppm(cnt_t, cnt_r, tot_t, tot_r)
    assert r >= 0
    # more target mass in the bucket -> never a lower ratio
    if cnt_t + 1 <= cnt_r:
        assert _r_ppm(cnt_t + 1, cnt_r, tot_t, tot_r) >= r
    # more raw mass in the bucket -> never a higher ratio
    assert _r_ppm(cnt_t, cnt_r + 1, tot_t, tot_r) <= r
    # identical target and raw distributions score exactly 1e6
    assert _r_ppm(cnt_t, cnt_t, tot_t, tot_t) == 1_000_000


# ---------------------------------------------------------------------------
# Winnowing: selection set bounds from the coverage argument
# ---------------------------------------------------------------------------


def _winnow(hashes: list[int], w: int) -> set[tuple[int, int]]:
    """Reference winnow: min per w-window, rightmost on ties, distinct
    (pos, hash) pairs; global min for short sequences (q292's rule)."""
    n = len(hashes)
    if n < w:
        m = min(hashes)
        pos = max(i for i, h in enumerate(hashes) if h == m)
        return {(pos, m)}
    out = set()
    for s in range(n - w + 1):
        window = hashes[s : s + w]
        m = min(window)
        pos = s + max(i for i, h in enumerate(window) if h == m)
        out.add((pos, m))
    return out


@settings(max_examples=300, deadline=None)
@given(
    hashes=st.lists(
        st.integers(min_value=0, max_value=50), min_size=1, max_size=120
    ),
    w=st.integers(min_value=2, max_value=8),
)
def test_winnow_density_and_gap_guarantees(hashes, w):
    sel = _winnow(hashes, w)
    n = len(hashes)
    if n < w:
        assert len(sel) == 1
        return
    windows = n - w + 1
    # coverage: every window contains a selection; one selection covers
    # at most w windows
    assert -(-windows // w) <= len(sel) <= windows
    positions = sorted(p for p, _ in sel)
    # no gap longer than w between consecutive selections (the
    # detection guarantee: any shared run >= w + gram - 1 tokens
    # produces a shared fingerprint)
    assert positions[0] < w
    for a, b in zip(positions, positions[1:]):
        assert b - a <= w, (hashes, w, positions)
    assert n - w <= positions[-1] <= n - 1


@settings(max_examples=200, deadline=None)
@given(
    hashes=st.lists(
        st.integers(min_value=0, max_value=30), min_size=8, max_size=60
    ),
    w=st.integers(min_value=2, max_value=6),
    shift=st.integers(min_value=1, max_value=20),
)
def test_winnow_shared_run_produces_shared_fingerprint(hashes, w, shift):
    """Two sequences sharing a contiguous run of >= w hashes share at
    least one fingerprint HASH from inside that run — regardless of
    what surrounds it (the MOSS detection property on the hash
    level)."""
    run = hashes[:w]
    a = _winnow(hashes, w)
    other = [h + 51 for h in range(shift, shift + w)] + run + [
        h + 51 for h in range(shift + w, shift + 2 * w)
    ]
    b = _winnow(other, w)
    run_hashes = set(run)
    # the run occupies a full window in both sequences, so BOTH select
    # that window's minimum hash: a genuinely shared fingerprint
    shared = {h for _, h in a} & {h for _, h in b} & run_hashes
    assert min(run) in shared, (hashes, w, shift, a, b)
