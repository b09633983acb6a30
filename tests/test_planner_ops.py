"""Invariant tests for the round-9 continuation operators: the
sketch-driven planners (q266 range boundaries, q267 salt factors),
the margin bitext miner (q265), and the dataset card (q268) — the
properties the oracle equality cannot state by itself (guarantees
that must hold for ANY corpus, not just equal values on this one)."""

from __future__ import annotations

from target_hdfs_spark.registry import all_queries

SF_DIR = "/root/testdata/sf0.001"
SPECS = all_queries()


def test_range_planner_partitions_cover_and_balance(spark):
    import duckdb

    rows = {
        r["partition_id"]: r
        for r in SPECS["q266_range_partition_planner"]
        .fn(spark, SF_DIR)
        .collect()
    }
    n = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_DIR}/lineitem.parquet'"
    ).fetchone()[0]
    # partitions are contiguous 0..P-1, spans are disjoint and ordered,
    # realized rows sum to the corpus — no row is lost or double-placed
    pids = sorted(rows)
    assert pids == list(range(len(pids)))
    assert sum(r["part_rows"] for r in rows.values()) == n
    for a, b in zip(pids, pids[1:]):
        assert rows[a]["hi_bkt"] < rows[b]["lo_bkt"]
    # the equi-depth cut can never produce an empty partition while
    # fuller ones exist: every partition holds at least one bucket
    assert all(r["n_buckets"] >= 1 for r in rows.values())


def test_salt_planner_never_under_salts(spark):
    rows = SPECS["q267_salt_factor_planner"].fn(spark, SF_DIR).collect()
    assert rows, "salt planner returned no heavy keys"
    for r in rows:
        # CountMin's one-sided error, surfaced as the planning guarantee
        assert r["never_under"], r
        assert r["est_rows"] >= r["exact_rows"]
        assert r["salt_est"] >= r["salt_exact"]
        assert 1 <= r["salt_exact"] <= 32 and 1 <= r["salt_est"] <= 32
        assert r["over_ppm"] >= 0
    ranks = sorted(r["heavy_rank"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1))


def test_bitext_mining_is_one_to_one_matching(spark):
    rows = SPECS["q265_margin_bitext_mining"].fn(spark, SF_DIR).collect()
    assert rows, "miner returned no mutual-best pairs"
    xs = [r["x_id"] for r in rows]
    ys = [r["y_id"] for r in rows]
    # mutual-best is a (partial) one-to-one matching: no anchor is
    # paired twice, sides are disjoint by the parity split
    assert len(xs) == len(set(xs)) and len(ys) == len(set(ys))
    for r in rows:
        assert r["x_id"] % 2 == 0 and r["y_id"] % 2 == 1
        assert 1 <= r["n_topk_x"] <= 4 and 1 <= r["n_topk_y"] <= 4
        assert r["mined"] == (r["margin"] >= 1.05)


def test_dataset_card_shares_and_quantiles_are_consistent(spark):
    rows = SPECS["q268_dataset_card"].fn(spark, SF_DIR).collect()
    assert rows, "dataset card returned no sources"
    for r in rows:
        assert 0 < r["top_lang_share_ppm"] <= 1_000_000
        assert 0 <= r["dup_ppm"] < 1_000_000
        assert r["dup_docs"] < r["n_docs"]
        assert r["n_langs"] <= r["n_docs"]
        assert r["est_p50_chars"] <= r["est_p95_chars"]
        assert r["total_tokens"] <= r["total_chars"]
