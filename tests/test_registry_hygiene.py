"""Structural invariants on the query registry (VERDICT r2 item 8).

The round driver records correctness rows for the first 50 registered
queries only, so PRIORITY_ORDER is a rotation schedule. These tests
pin the hygiene rules that keep the 117+-query registry honest:

- every registered query either has a DuckDB oracle or is explicitly
  tagged ``rows-only`` (so the weaker check is documented, not
  accidental);
- PRIORITY_ORDER is an exact permutation of the registry (no stale
  names, no unordered stragglers whose position would be accidental);
- the rotation terminates: every query is either already
  driver-checked (has a row in some CORRECTNESS_r*.json) or inside
  the current first-50 window — i.e. after this round there is no
  query that never met the hard signal;
- every component family (tag group) has a hard-signal
  representative in checked ∪ window.
"""

from __future__ import annotations

import json
import os
from glob import glob

from target_hdfs_spark.registry import PRIORITY_ORDER, all_queries

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER_WINDOW = 50


def _checked_names() -> set[str]:
    names: set[str] = set()
    for path in glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        with open(path) as f:
            names |= set(json.load(f))
    return names


def test_every_query_has_oracle_or_rows_only_tag():
    undocumented = [
        name
        for name, spec in all_queries().items()
        if spec.oracle is None and "rows-only" not in spec.tags
    ]
    assert not undocumented, (
        f"queries with neither oracle nor rows-only tag: {undocumented}"
    )


def test_rows_only_tag_implies_no_oracle():
    contradictory = [
        name
        for name, spec in all_queries().items()
        if spec.oracle is not None and "rows-only" in spec.tags
    ]
    assert not contradictory


def test_priority_order_is_exact_permutation_of_registry():
    registered = set(all_queries())
    listed = list(PRIORITY_ORDER)
    assert len(listed) == len(set(listed)), "duplicate names in PRIORITY_ORDER"
    stale = set(listed) - registered
    assert not stale, f"PRIORITY_ORDER names not registered: {sorted(stale)}"
    unlisted = registered - set(listed)
    assert not unlisted, (
        f"registered queries missing from PRIORITY_ORDER: {sorted(unlisted)}"
    )


def _pending_prefix(ordered: list[str], checked: set[str]) -> set[str]:
    """Queries added since the last rotation: the maximal run of
    never-checked names directly after the window boundary. They are
    legitimate (first in line for the next rotation); an unchecked
    query BURIED further down is not."""
    pending: set[str] = set()
    for name in ordered[DRIVER_WINDOW:]:
        if name in checked:
            break
        pending.add(name)
    return pending


def test_rotation_covers_full_registry():
    """Every query is driver-checked, inside the current first-50
    window, or queued immediately after it for the next rotation."""
    ordered = list(all_queries())
    checked = _checked_names()
    window = set(ordered[:DRIVER_WINDOW])
    pending = _pending_prefix(ordered, checked)
    never_hard_signal = set(ordered) - checked - window - pending
    assert not never_hard_signal, (
        "queries with no driver row, outside the current window, and "
        f"not queued for the next rotation: {sorted(never_hard_signal)}"
    )


def test_every_family_has_hard_signal_representative():
    specs = all_queries()
    ordered = list(specs)
    checked = _checked_names()
    covered = (
        checked
        | set(ordered[:DRIVER_WINDOW])
        | _pending_prefix(ordered, checked)
    )
    families: dict[str, set[str]] = {}
    for name, spec in specs.items():
        for tag in spec.tags:
            families.setdefault(tag, set()).add(name)
    orphaned = {
        tag: sorted(members)
        for tag, members in families.items()
        if not (members & covered)
    }
    assert not orphaned, f"tag families with no checked/windowed member: {orphaned}"


def test_priority_order_matches_ledger_rotation():
    """PRIORITY_ORDER is generated, not hand-maintained: it must equal
    scripts/gen_priority.py's ledger-derived ordering (never-checked
    queries first, then stalest latest-check first). If this fails you
    registered or renamed a query — run

        python scripts/gen_priority.py --write

    to rotate the window instead of editing the tuple by hand."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "gen_priority",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "gen_priority.py"),
    )
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)
    ordered, _ = gen.compute_order()
    assert list(PRIORITY_ORDER) == ordered
