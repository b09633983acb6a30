"""Winnowing (MOSS) invariants — the guarantees the oracle equality
cannot state: per-document fingerprint density bounds from the
window-coverage argument, and the pair join's structural bounds."""

from __future__ import annotations

import duckdb

from target_hdfs_spark.operators.dedup import (
    _WIN_DF_CAP,
    _WIN_NGRAM,
    _WIN_W,
    _winnowed_fps,
)
from target_hdfs_spark.registry import all_queries

SF_DIR = "/root/testdata/sf0.001"
SPECS = all_queries()


def _gram_counts() -> dict[int, int]:
    rows = duckdb.sql(
        f"""
        SELECT doc_id, greatest(len(list_filter(string_split_regex(
            lower(trim(text)), '\\s+'), x -> x <> '')) - {_WIN_NGRAM - 1}, 1)
        FROM '{SF_DIR}/documents.parquet'
        WHERE len(list_filter(string_split_regex(lower(trim(text)),
            '\\s+'), x -> x <> '')) > 0
        """
    ).fetchall()
    return dict(rows)


def test_winnowing_density_guarantee_per_doc(spark):
    """Coverage argument: every full window selects something, and one
    selection covers at most _WIN_W windows -> for docs with
    n >= _WIN_W grams: ceil((n - W + 1) / W) <= fps <= n - W + 1."""
    n_grams = _gram_counts()
    fps: dict[int, int] = {}
    for r in _winnowed_fps(spark, SF_DIR).groupBy("doc_id").count().collect():
        fps[r["doc_id"]] = r["count"]
    assert set(fps) == set(n_grams)
    for doc, n in n_grams.items():
        k = fps[doc]
        if n >= _WIN_W:
            windows = n - _WIN_W + 1
            assert k <= windows, (doc, n, k)
            assert k >= -(-windows // _WIN_W), (doc, n, k)
        else:
            # short docs keep exactly the global minimum
            assert k == 1, (doc, n, k)


def test_winnowing_source_table_is_consistent(spark):
    rows = SPECS["q292_winnowing_fingerprints"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 < r["total_fps"] <= r["total_grams"], r
        assert r["min_doc_density_ppm"] <= r["density_ppm"] * 2, r
        assert (
            r["min_doc_density_ppm"] <= r["max_doc_density_ppm"] <= 1_000_000
        ), r
        assert (
            r["density_ppm"]
            == r["total_fps"] * 1_000_000 // r["total_grams"]
        )


def test_winnowing_pairs_bounds(spark):
    rows = SPECS["q293_winnowing_pairs"].fn(spark, SF_DIR).collect()
    seen = set()
    for r in rows:
        assert r["doc_a"] < r["doc_b"], r
        assert (r["doc_a"], r["doc_b"]) not in seen
        seen.add((r["doc_a"], r["doc_b"]))
        assert r["shared_fps"] >= 2, r
        assert 0 < r["winnow_jaccard_ppm"] <= 1_000_000, r


def test_winnowing_guarantee_catches_exact_duplicates(spark):
    """Exact duplicate docs (same text) share EVERY fingerprint: any
    exact-dup pair from q40's key must appear in the pair table with
    jaccard == 1e6 (unless all its fingerprints were df-capped)."""
    dup_pairs = duckdb.sql(
        f"""
        WITH d AS (SELECT doc_id, md5(text) AS k
                   FROM '{SF_DIR}/documents.parquet'
                   WHERE len(list_filter(string_split_regex(lower(trim(text)),
                       '\\s+'), x -> x <> '')) > 0)
        SELECT a.doc_id, b.doc_id FROM d a JOIN d b
        ON a.k = b.k AND a.doc_id < b.doc_id
        """
    ).fetchall()
    if not dup_pairs:
        return
    got = {
        (r["doc_a"], r["doc_b"]): r["winnow_jaccard_ppm"]
        for r in SPECS["q293_winnowing_pairs"].fn(spark, SF_DIR).collect()
    }
    # fingerprint sets of exact dups are identical; with the df cap at
    # _WIN_DF_CAP a pair only drops out if EVERY fingerprint is
    # boilerplate — require at least one surviving dup pair and exact
    # jaccard on every surviving one
    surviving = [p for p in dup_pairs if p in got]
    assert surviving, f"no exact-dup pair survived the df cap: {dup_pairs}"
    for p in surviving:
        assert got[p] == 1_000_000, (p, got[p], _WIN_DF_CAP)
