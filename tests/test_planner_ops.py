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


def test_contamination_spans_are_disjoint_and_ordered(spark):
    from collections import defaultdict

    rows = SPECS["q269_contamination_spans"].fn(spark, SF_DIR).collect()
    assert rows, "no contamination found (eval slice should collide)"
    per_doc = defaultdict(list)
    for r in rows:
        assert r["doc_id"] % 97 != 0  # never flags eval docs
        assert 0 <= r["span_start"] <= r["span_end"] < r["doc_tokens"]
        assert r["span_tokens"] >= 1 and r["n_hit_grams"] >= 1
        assert 0 < r["contam_ppm"] <= 1_000_000
        per_doc[r["doc_id"]].append(r)
    for doc, spans in per_doc.items():
        spans.sort(key=lambda r: r["span_start"])
        assert [r["span_id"] for r in spans] == list(
            range(1, len(spans) + 1)
        )
        assert spans[0]["doc_spans"] == len(spans)
        # merged islands are separated by MORE than a gram width —
        # adjacent/overlapping intervals would have been one island
        for a, b in zip(spans, spans[1:]):
            assert b["span_start"] > a["span_end"] + 1
        assert spans[0]["contam_tokens"] == sum(
            r["span_tokens"] for r in spans
        )


def test_span_surgery_accounting_matches_spans(spark):
    spans = SPECS["q269_contamination_spans"].fn(spark, SF_DIR).collect()
    surgery = {
        r["doc_id"]: r
        for r in SPECS["q270_span_surgery"].fn(spark, SF_DIR).collect()
    }
    # every contaminated doc gets exactly one surgical row
    assert set(surgery) == {r["doc_id"] for r in spans}
    for r in surgery.values():
        assert r["removed_tokens"] + r["kept_tokens"] == r["doc_tokens"]
        assert r["removed_tokens"] >= 1  # flagged docs always lose tokens
        n_out = len(r["cleaned_text"].split()) if r["cleaned_text"] else 0
        assert n_out == r["kept_tokens"]  # text matches the accounting
        assert 0 <= r["kept_ppm"] < 1_000_000


def test_release_funnel_is_monotone_and_budgeted(spark):
    rows = SPECS["q271_release_funnel"].fn(spark, SF_DIR).collect()
    assert rows, "release funnel returned no languages"
    total_final = sum(r["n_final"] for r in rows)
    total_train = sum(r["n_train"] for r in rows)
    for r in rows:
        # each stage can only shrink the population
        assert (
            r["n_train"]
            >= r["n_after_dedup"]
            >= r["n_after_decon"]
            >= r["n_after_length"]
            >= r["n_final"]
        )
        assert r["n_final"] >= 0 and r["chars_final"] >= 0
        assert 0 <= r["retained_ppm"] <= 1_000_000
    # the half-corpus budget binds globally (allocation never exceeds
    # half the gated population by construction)
    assert total_final <= total_train // 2 + len(rows)


def test_bitext_bucket_cap_is_live_at_call_time(spark, monkeypatch):
    """The hot-bucket candidate cap must participate in the PLAN at
    call time (not be baked at registration): with the cap forced to
    0 every bucket is excluded and the miner returns no pairs."""
    from target_hdfs_spark.operators import similarity as sim

    monkeypatch.setattr(sim, "_BTX_BUCKET_CAP", 0)
    assert (
        SPECS["q265_margin_bitext_mining"].fn(spark, SF_DIR).count() == 0
    )


def test_boilerplate_rule_thresholds(spark):
    rows = SPECS["q274_boilerplate_pricing"].fn(spark, SF_DIR).collect()
    assert rows, "no sources priced"
    for r in rows:
        assert 0 <= r["removable_ppm"] < 1_000_000
        assert r["tokens_removable"] <= r["n_tokens"]
        # the df rule implies occurrences >= segments * min_docs
        if r["n_boiler_segments"]:
            assert r["n_occurrences"] >= 3 * r["n_boiler_segments"]


def test_layout_drift_ranges_partition_the_corpus(spark):
    import duckdb

    rows = SPECS["q275_layout_drift_audit"].fn(spark, SF_DIR).collect()
    n = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_DIR}/lineitem.parquet'"
    ).fetchone()[0]
    assert sum(r["part_rows"] for r in rows) == n
    ids = sorted(r["range_id"] for r in rows)
    assert ids == list(range(len(ids))) and len(ids) <= 8
    for r in rows:
        assert r["recut_needed"] == (abs(r["skew_ppm"]) > 200_000)


def test_cap_recall_audit_accounting(spark):
    rows = SPECS["q277_bucket_cap_recall"].fn(spark, SF_DIR).collect()
    if not rows:
        return  # a corpus where the audit cap never binds is legal
    n_delta = rows[0]["n_delta"]
    n_mined_dropped = rows[0]["n_mined_dropped"]
    assert len(rows) == n_delta
    assert all(r["n_delta"] == n_delta for r in rows)
    assert n_mined_dropped <= n_delta
    assert n_mined_dropped == sum(
        1 for r in rows if r["would_mine"] and r["direction"] == "dropped"
    )
    assert all(r["direction"] in ("dropped", "appeared") for r in rows)


def _write_hub_embeddings(spark, path: str, n: int) -> None:
    """A synthetic hub corpus: every vector identical, so ALL vectors
    share one SRP bucket and the uncapped audit chain's candidate
    volume is (n/2)^2 — the shape whose pre-cap 100x sweep never
    finished. Written as an embeddings.parquet the loaders accept."""
    from pyspark.sql import functions as F

    from target_hdfs_spark.operators.similarity import EMB_DIM

    vec = F.array(*[F.lit(1.0).cast("float") for _ in range(EMB_DIM)])
    (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            (F.col("id") % 4).cast("int").alias("label"),
            vec.alias("embedding"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{path}/embeddings.parquet")
    )


def test_cap_recall_audit_guard_fires_on_hub_corpus(spark, tmp_path):
    """VERDICT r9 item 1: the uncapped audit chain is guarded. On a
    10x-scale hub corpus (20k identical vectors -> one bucket ->
    10k * 10k = 1e8 candidate volume, 20x over budget) the preflight
    must fail fast — BEFORE any join runs — with the sharding
    remediation, and the suggested sample_ppm must itself be
    affordable (volume scales quadratically in the shard fraction)."""
    import re

    import pytest

    from target_hdfs_spark.operators.similarity import (
        _BTX_AUDIT_BUDGET,
        bucket_cap_recall_audit,
    )

    _write_hub_embeddings(spark, str(tmp_path), 20_000)
    with pytest.raises(RuntimeError, match="sample_ppm=") as exc:
        bucket_cap_recall_audit(spark, str(tmp_path))
    suggest = int(re.search(r"sample_ppm=(\d+)", str(exc.value)).group(1))
    # quadratic scaling: the suggested shard's expected volume fits
    expected_vol = (20_000 * suggest / 2_000_000) ** 2
    assert expected_vol <= _BTX_AUDIT_BUDGET * 1.1


def test_cap_recall_audit_completes_on_sampled_shard(spark, tmp_path):
    """The remediation path works: the SAME hub corpus audits fine on
    a salted-hash shard, the guard pricing the SHARDED volume."""
    from target_hdfs_spark.operators.similarity import (
        bucket_cap_recall_audit,
    )

    _write_hub_embeddings(spark, str(tmp_path), 20_000)
    rows = bucket_cap_recall_audit(
        spark, str(tmp_path), sample_ppm=10_000
    ).collect()
    # identical vectors: dropping the (over-cap) single bucket under
    # the tight audit cap drops EVERY mutual-best pair -> the delta is
    # all 'dropped' and internally consistent
    assert all(r["direction"] == "dropped" for r in rows)
    if rows:
        assert rows[0]["n_delta"] == len(rows)


def test_cap_recall_audit_guard_budget_is_live(spark):
    """The budget participates at call time: forcing it to 0 trips the
    guard even on the tiny gate corpus, and the message prices the
    actual volume."""
    import pytest

    from target_hdfs_spark.operators.similarity import (
        bucket_cap_recall_audit,
    )

    with pytest.raises(RuntimeError, match="exceeds the audit budget"):
        bucket_cap_recall_audit(spark, SF_DIR, budget=0)
