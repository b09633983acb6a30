"""Semantic tests for the round-4 retrieval/graph/dedup additions:
q128 segment-level dedup, q129 BM25, q130 semantic dedup, q131
attribution-window join, q132 triangle counts — each on crafted
corpora with hand-computable expected outputs (the oracle-parity
tests cover the generated testdata; these pin the *rules*)."""

from __future__ import annotations

import datetime as dt
import random
from decimal import Decimal

import pytest

from target_hdfs_spark.operators.asof import q131_attribution_window_join
from target_hdfs_spark.operators.dedup import q128_segment_dedup
from target_hdfs_spark.operators.similarity import (
    EMB_DIM,
    q130_semantic_dedup,
    q132_neardup_triangles,
)
from target_hdfs_spark.operators.text import _BM25_TERMS, q129_bm25_topk


def _write_documents(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def _seg(prefix: str) -> str:
    return " ".join(f"{prefix}{i}" for i in range(16))


class TestSegmentDedup:
    def test_first_occurrence_wins_and_rebuild_preserves_order(
        self, spark, tmp_path
    ):
        a, b, c, d = _seg("a"), _seg("b"), _seg("c"), _seg("d")
        rows = [
            (0, f"{a} {b}", "en", "s", 0),  # both segments first
            (1, a, "en", "s", 0),  # fully duplicated -> empty
            (2, f"{b} {c}", "en", "s", 0),  # b removed, c kept
            (3, f"{d} {d}", "en", "s", 0),  # within-doc repeat
        ]
        sf = _write_documents(spark, tmp_path, rows)
        got = {
            r.doc_id: r for r in q128_segment_dedup(spark, sf).collect()
        }
        assert got[0].n_segments == 2 and got[0].n_kept == 2
        assert got[0].dedup_text == f"{a} {b}"
        assert got[1].n_kept == 0 and got[1].dedup_text == ""
        assert got[2].n_kept == 1 and got[2].dedup_text == c
        assert got[3].n_segments == 2 and got[3].n_kept == 1
        assert got[3].dedup_text == d

    def test_short_doc_is_one_segment(self, spark, tmp_path):
        sf = _write_documents(
            spark, tmp_path, [(0, "tiny doc", "en", "s", 0)]
        )
        row = q128_segment_dedup(spark, sf).collect()[0]
        assert row.n_segments == 1 and row.n_kept == 1
        assert row.dedup_text == "tiny doc"


class TestBM25:
    def test_matches_reference_formula(self, spark, tmp_path):
        rng = random.Random(7)
        vocab = list(_BM25_TERMS) + ["filler", "pad", "noise"]
        rows = []
        for d in range(30):
            words = [vocab[rng.randrange(len(vocab))] for _ in range(rng.randint(3, 40))]
            rows.append((d, " ".join(words), "en", "s", 0))
        sf = _write_documents(spark, tmp_path, rows)

        # brute-force reference (same IEEE op order as the operator)
        toks = {d: t.split() for d, t, *_ in rows}
        n_docs = len(rows)
        avgdl = float(sum(len(t) for t in toks.values())) / n_docs
        dfreq = {
            t: sum(1 for ts in toks.values() if t in ts) for t in _BM25_TERMS
        }
        expected = {}
        for d, ts in toks.items():
            score = 0.0
            first = True
            for t in _BM25_TERMS:
                tf = ts.count(t)
                if tf > 0:
                    idf = ((n_docs - dfreq[t]) + 0.5) / (dfreq[t] + 0.5)
                    denom = tf + 1.2 * (0.25 + (0.75 * len(ts)) / avgdl)
                    s = idf * (tf * 2.2) / denom
                else:
                    s = 0.0
                score = s if first else score + s
                first = False
            if any(t in ts for t in _BM25_TERMS):
                expected[d] = score
        top = sorted(expected.items(), key=lambda kv: (-kv[1], kv[0]))[:20]

        got = q129_bm25_topk(spark, sf).orderBy("rn").collect()
        assert [r.doc_id for r in got] == [d for d, _ in top]
        for r, (_, s) in zip(got, top):
            assert r.bm25 == pytest.approx(s, rel=1e-12)


def _write_embeddings(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, f"vec_id long, embedding array<float>, label int"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    return str(tmp_path)


def _vec(seed: int) -> list[float]:
    rng = random.Random(seed)
    return [rng.uniform(-1, 1) for _ in range(EMB_DIM)]


class TestSemanticDedup:
    def test_min_id_survivor_rule(self, spark, tmp_path):
        base = _vec(1)
        neg = [-x for x in base]
        rows = [
            (0, base, 0),
            (1, base, 0),  # dup of 0 -> suppressed
            (2, base, 0),  # dup of 0 and 1 -> suppressed, 2 smaller dups
            (3, neg, 1),  # cosine -1 to the others -> kept
        ]
        sf = _write_embeddings(spark, tmp_path, rows)
        got = {r.vec_id: r for r in q130_semantic_dedup(spark, sf).collect()}
        assert got[0].kept and got[0].n_smaller_dups == 0
        assert not got[1].kept and got[1].n_smaller_dups == 1
        assert not got[2].kept and got[2].n_smaller_dups == 2
        assert got[3].kept and got[3].n_smaller_dups == 0


class TestTriangles:
    def test_k4_plus_isolated(self, spark, tmp_path):
        base = _vec(2)
        neg = [-x for x in base]
        rows = [(i, base, 0) for i in range(4)] + [(9, neg, 1)]
        sf = _write_embeddings(spark, tmp_path, rows)
        got = {r.vec_id: r.n_triangles for r in q132_neardup_triangles(spark, sf).collect()}
        # K4: each node sits in C(3,2) = 3 triangles; isolated node absent
        assert got == {0: 3, 1: 3, 2: 3, 3: 3}


BASE_TS = dt.datetime(2026, 8, 14, 12, 0, 0)


class TestAttributionWindow:
    def test_matches_brute_force(self, spark, tmp_path):
        rng = random.Random(11)
        rows = []
        eid = 0
        for u in range(5):
            for _ in range(rng.randint(1, 12)):
                ts = BASE_TS + dt.timedelta(minutes=rng.randint(0, 180))
                kind = rng.choice(["purchase", "view", "click", "error"])
                # quarter values stay exact in decimal(12,4)
                rows.append((eid, ts, u, kind, rng.randint(0, 400) / 4.0, "{}"))
                eid += 1
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        df.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "events.parquet")
        )

        got = {
            r.purchase_id: r
            for r in q131_attribution_window_join(spark, str(tmp_path)).collect()
        }
        purchases = [r for r in rows if r[3] == "purchase"]
        assert set(got) == {p[0] for p in purchases}
        for pid, pts, pu, _, _, _ in purchases:
            touches = [
                r
                for r in rows
                if r[3] != "purchase"
                and r[2] == pu
                and pts - dt.timedelta(minutes=60) < r[1] <= pts
            ]
            r = got[pid]
            assert r.n_touches == len(touches)
            if touches:
                exact = sum(Decimal(str(t[4])) for t in touches)
                assert r.touch_value_sum == float(str(exact))
                assert r.max_touch_id == max(t[0] for t in touches)
                assert r.first_touch_ts == min(t[1] for t in touches)
            else:
                assert r.touch_value_sum is None
                assert r.max_touch_id is None and r.first_touch_ts is None
