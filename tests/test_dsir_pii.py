"""Invariant tests for the DSIR importance-resampling table (q290)
and the PII scan/redact audit (q291) — the properties oracle equality
cannot state by itself (they must hold for ANY corpus)."""

from __future__ import annotations

import duckdb

from target_hdfs_spark.registry import all_queries

SF_DIR = "/root/testdata/sf0.001"
SPECS = all_queries()


def _duck_scalar(sql: str):
    return duckdb.sql(sql).fetchone()[0]


def test_dsir_conserves_docs_and_tokens(spark):
    rows = SPECS["q290_dsir_importance"].fn(spark, SF_DIR).collect()
    assert rows, "dsir table is empty"
    n_nonempty = _duck_scalar(
        f"SELECT COUNT(*) FROM '{SF_DIR}/documents.parquet' "
        "WHERE len(list_filter(string_split_regex(lower(trim(text)),"
        " '\\s+'), x -> x <> '')) > 0"
    )
    assert sum(r["n_docs"] for r in rows) == n_nonempty
    for r in rows:
        # selection is a subset: counts and token mass both bounded
        assert 0 <= r["n_selected"] <= r["n_docs"], r
        assert 0 <= r["selected_tokens"] <= r["total_tokens"], r
        assert r["sel_ppm"] == r["n_selected"] * 1_000_000 // r["n_docs"]
        # integer mean of per-doc ppm scores is always positive
        assert r["mean_score_ppm"] > 0


def test_dsir_selection_is_score_consistent(spark):
    # a source where nothing was selected cannot have every doc above
    # the threshold, and vice versa: mean score and selection agree at
    # the extremes (mean > 1e6 for fully-selected sources, <= for none)
    rows = SPECS["q290_dsir_importance"].fn(spark, SF_DIR).collect()
    for r in rows:
        if r["n_selected"] == r["n_docs"]:
            assert r["mean_score_ppm"] > 1_000_000, r
        if r["n_selected"] == 0:
            assert r["mean_score_ppm"] <= 1_000_000, r


def test_pii_redaction_leaves_no_residual(spark):
    rows = {
        r["pii_class"]: r
        for r in SPECS["q291_pii_redaction_pricing"].fn(spark, SF_DIR).collect()
    }
    assert set(rows) == {"email", "phone", "ipv4"}
    for r in rows.values():
        # the scrub invariant: scan-after-redact finds nothing
        assert r["residual_matches"] == 0, r


def test_pii_hits_match_injection_rule(spark):
    rows = {
        r["pii_class"]: r
        for r in SPECS["q291_pii_redaction_pricing"].fn(spark, SF_DIR).collect()
    }
    mods = {"email": 7, "phone": 11, "ipv4": 13}
    for cls, mod in mods.items():
        expect = _duck_scalar(
            f"SELECT COUNT(*) FROM '{SF_DIR}/documents.parquet' "
            f"WHERE doc_id % {mod} = 0"
        )
        r = rows[cls]
        # the corpus itself carries no PII, so hits == injected docs,
        # one match per injected doc
        assert r["n_docs_hit"] == expect, (cls, r, expect)
        assert r["total_matches"] == r["n_docs_hit"], r
    # phone injections are fixed-width: 555-XXX-XXXX is 12 chars
    ph = rows["phone"]
    assert ph["matched_chars"] == 12 * ph["total_matches"]
    # email/ipv4 are variable-width but never shorter than the shortest
    # possible render (user0@example.com = 17; 10.0.0.0 = 8)
    assert rows["email"]["matched_chars"] >= 17 * rows["email"]["total_matches"]
    assert rows["ipv4"]["matched_chars"] >= 8 * rows["ipv4"]["total_matches"]


def test_dsir_mixture_shift_shares_are_consistent(spark):
    rows = SPECS["q294_dsir_mixture_shift"].fn(spark, SF_DIR).collect()
    assert rows
    # shares sum to ~1e6 (integer-floor rounding loses < |sources| ppm)
    raw_sum = sum(r["raw_share_ppm"] for r in rows)
    assert 1_000_000 - len(rows) <= raw_sum <= 1_000_000
    if any(r["sel_tokens"] > 0 for r in rows):
        sel_sum = sum(r["sel_share_ppm"] for r in rows)
        assert 1_000_000 - len(rows) <= sel_sum <= 1_000_000
    for r in rows:
        assert 0 <= r["sel_tokens"] <= r["raw_tokens"], r
        assert r["shift_ppm"] == abs(
            r["sel_share_ppm"] - r["raw_share_ppm"]
        ), r


def test_filter_agreement_quadrants_and_kappa(spark):
    rows = SPECS["q295_filter_agreement"].fn(spark, SF_DIR).collect()
    assert len(rows) == 6
    totals = {
        r["n_both"] + r["n_only_a"] + r["n_only_b"] + r["n_neither"]
        for r in rows
    }
    assert len(totals) == 1  # every pair partitions the same corpus
    n = totals.pop()
    for r in rows:
        nb, oa, ob, nn = (
            r["n_both"],
            r["n_only_a"],
            r["n_only_b"],
            r["n_neither"],
        )
        assert min(nb, oa, ob, nn) >= 0, r
        assert r["agree_ppm"] == (nb + nn) * 1_000_000 // n
        assert -1_000_000 <= r["kappa_ppm"] <= 1_000_000, r
        # recompute kappa from the quadrants with the exact integer
        # identity (the implementation aggregates differently)
        ca, cb = nb + oa, nb + ob
        pe = ca * cb + (n - ca) * (n - cb)
        num = n * (nb + nn) - pe
        den = max(n * n - pe, 1)
        expect = (
            -((1_000_000 * -num) // den)
            if num < 0
            else (1_000_000 * num) // den
        )
        assert r["kappa_ppm"] == expect, (r, expect)


def test_release_pipeline_v2_funnel_is_monotone(spark):
    rows = sorted(
        SPECS["q300_release_pipeline_v2"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["stage_id"],
    )
    assert [r["stage"] for r in rows] == [
        "raw",
        "pii_clean",
        "quality_pass",
        "dsir_selected",
        "deduped",
    ]
    for a, b in zip(rows, rows[1:]):
        # every stage only removes documents and tokens
        assert b["n_docs"] <= a["n_docs"], (a, b)
        assert b["n_tokens"] <= a["n_tokens"], (a, b)
    n0, t0 = rows[0]["n_docs"], rows[0]["n_tokens"]
    assert rows[0]["doc_keep_ppm"] == rows[0]["token_keep_ppm"] == 1_000_000
    for r in rows:
        assert r["doc_keep_ppm"] == r["n_docs"] * 1_000_000 // max(n0, 1)
        assert (
            r["token_keep_ppm"] == r["n_tokens"] * 1_000_000 // max(t0, 1)
        )
