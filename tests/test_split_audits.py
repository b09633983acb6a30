"""Invariants for the split audits: q297 (balance) and q298
(duplicate leakage) — properties that hold for ANY corpus under the
q100 hash-split rule."""

from __future__ import annotations

import duckdb

from target_hdfs_spark.registry import all_queries

SF_DIR = "/root/testdata/sf0.001"
SPECS = all_queries()


def test_split_balance_shares_are_consistent(spark):
    rows = SPECS["q297_split_balance_audit"].fn(spark, SF_DIR).collect()
    assert rows
    splits = {r["split"] for r in rows}
    assert splits <= {"train", "val", "test"}
    # within each split, source shares sum to ~1e6 (floor rounding)
    for s in splits:
        sub = [r for r in rows if r["split"] == s]
        total = sum(r["split_share_ppm"] for r in sub)
        assert 1_000_000 - len(sub) <= total <= 1_000_000, (s, total)
    for r in rows:
        assert r["dev_ppm"] == abs(
            r["split_share_ppm"] - r["corpus_share_ppm"]
        ), r
    # corpus_share is split-independent: same source, same value
    by_source: dict[str, set[int]] = {}
    for r in rows:
        by_source.setdefault(r["source"], set()).add(r["corpus_share_ppm"])
    assert all(len(v) == 1 for v in by_source.values())


def test_split_leakage_bounds_and_totals(spark):
    rows = {
        (r["split_a"], r["split_b"]): r
        for r in SPECS["q298_split_leakage_audit"].fn(spark, SF_DIR).collect()
    }
    assert set(rows) == {
        ("train", "val"),
        ("train", "test"),
        ("val", "test"),
    }
    n_val, n_test = (
        duckdb.sql(
            f"""
        WITH d AS (
          SELECT CAST(('0x' || substring(md5('split:' ||
              CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS b
          FROM '{SF_DIR}/documents.parquet'
        )
        SELECT SUM(CASE WHEN b >= 80 AND b < 90 THEN 1 ELSE 0 END),
               SUM(CASE WHEN b >= 90 THEN 1 ELSE 0 END) FROM d
        """
        ).fetchone()
    )
    assert rows[("train", "val")]["eval_docs"] == n_val
    assert rows[("train", "test")]["eval_docs"] == n_test
    assert rows[("val", "test")]["eval_docs"] == n_test
    for r in rows.values():
        assert 0 <= r["leaked_docs"] <= r["eval_docs"], r
        # a spanning cluster contributes at least one leaked doc
        assert r["leaked_docs"] >= r["n_spanning_clusters"], r
        assert (
            r["leak_ppm"]
            == r["leaked_docs"] * 1_000_000 // max(r["eval_docs"], 1)
        )


def test_neardup_leakage_categories_and_shares(spark):
    rows = SPECS["q299_neardup_split_leakage"].fn(spark, SF_DIR).collect()
    assert rows, "no verified near-dup pairs at sf0.001"
    order = {"test": 0, "train": 1, "val": 2}  # lexicographic
    total_share = 0
    for r in rows:
        # canonical category: split_x <= split_y lexicographically
        assert order[r["split_x"]] <= order[r["split_y"]], r
        assert r["is_leak"] == (0 if r["split_x"] == r["split_y"] else 1)
        assert r["n_pairs"] > 0
        total_share += r["pair_share_ppm"]
    assert 1_000_000 - len(rows) <= total_share <= 1_000_000
