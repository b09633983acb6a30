"""Streaming bucket-root near-dup dedup (applyInPandasWithState):

1. stream/batch parity — on ordered arrivals the streaming operator
   emits exactly the rows of its oracle-checked batch twin (q118);
2. checkpoint-kill-resume — state (bucket roots) survives a restart:
   an exact duplicate arriving AFTER the restart is still suppressed,
   and no batch-1 output is re-emitted.
"""

from __future__ import annotations

import json

from target_hdfs_spark.operators.dedup import bucket_root_dedup, minhash_signatures
from target_hdfs_spark.streaming.neardup import streaming_bucket_root_dedup

BASE = (
    "the quick brown fox jumps over the lazy dog while the rain "
    "in spain stays mainly in the plain and the cat sat on the mat "
)


def _docs_a():
    # ascending doc_ids; includes exact duplicates (2, 5 duplicate 1)
    # and a near-duplicate (4 differs from 1 by one trailing token)
    return [
        (1, BASE + "alpha"),
        (2, BASE + "alpha"),
        (3, "completely different content about spark structured streaming "
            "state stores and arrow record batches flowing through pandas"),
        (4, BASE + "omega"),
        (5, BASE + "alpha"),
    ]


def _docs_b():
    # arrives after restart: 6 duplicates 1 (suppression requires the
    # persisted bucket-root state), 7 is fresh
    return [
        (6, BASE + "alpha"),
        (7, "entirely novel text mentioning connected components and "
            "alternating star contraction over candidate pair graphs"),
    ]


def _write_jsonl(path, rows):
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as fh:
        for doc_id, text in rows:
            fh.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def _run_stream(spark, src, sink, ckpt):
    stream = spark.readStream.schema("doc_id long, text string").json(str(src))
    q = (
        streaming_bucket_root_dedup(stream)
        .writeStream.format("parquet")
        .option("path", str(sink))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _batch_twin_rows(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        (r.doc_id, r.root_id, r.est_sim)
        for r in bucket_root_dedup(minhash_signatures(docs)).collect()
    }


def test_stream_matches_batch_twin(spark, tmp_path):
    src, sink, ckpt = tmp_path / "src", tmp_path / "sink", tmp_path / "ckpt"
    _write_jsonl(src / "f1.jsonl", _docs_a())
    _run_stream(spark, src, sink, ckpt)
    got = {
        (r.doc_id, r.root_id, r.est_sim)
        for r in spark.read.parquet(str(sink)).collect()
    }
    want = _batch_twin_rows(spark, _docs_a())
    assert got == want
    # sanity on the fixture itself: exact dupes suppressed, root kept
    kept_ids = {d for d, _, _ in got}
    assert 1 in kept_ids and 3 in kept_ids
    assert 2 not in kept_ids and 5 not in kept_ids


def test_checkpoint_kill_resume_preserves_roots(spark, tmp_path):
    src, sink, ckpt = tmp_path / "src", tmp_path / "sink", tmp_path / "ckpt"
    _write_jsonl(src / "f1.jsonl", _docs_a())
    _run_stream(spark, src, sink, ckpt)
    n_after_first = spark.read.parquet(str(sink)).count()

    # "kill": the query object is gone; only checkpoint + sink remain
    _write_jsonl(src / "f2.jsonl", _docs_b())
    _run_stream(spark, src, sink, ckpt)

    rows = spark.read.parquet(str(sink)).collect()
    by_id = {r.doc_id: r for r in rows}
    # batch-1 rows exactly once (no re-emission on resume)
    assert len(rows) == n_after_first + 1
    # duplicate-of-root arriving after restart was suppressed: the
    # bucket root (doc 1) was only known through restored state
    assert 6 not in by_id
    # fresh doc accepted as its own bucket root
    assert by_id[7].root_id == 7 and by_id[7].est_sim == 1.0
    # and the full two-phase output equals the batch twin over the
    # whole corpus (ids arrived in order, so roots coincide)
    assert {
        (r.doc_id, r.root_id, r.est_sim) for r in rows
    } == _batch_twin_rows(spark, _docs_a() + _docs_b())


def _run_multiband(spark, src, sink, ckpt):
    from target_hdfs_spark.streaming.neardup import write_multiband_dedup

    stream = spark.readStream.schema("doc_id long, text string").json(str(src))
    q = write_multiband_dedup(stream, str(sink), str(ckpt))
    q.awaitTermination(120)


def _multiband_batch_rows(spark, rows):
    from target_hdfs_spark.operators.dedup import (
        minhash_signatures,
        multiband_root_dedup,
    )

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        (r.doc_id, r.max_root_sim)
        for r in multiband_root_dedup(minhash_signatures(docs)).collect()
    }


def _read_multiband(spark, sink):
    return {
        (r.doc_id, r.max_root_sim)
        for r in spark.read.option("basePath", str(sink))
        .parquet(str(sink))
        .drop("batch_id")
        .collect()
    }


def test_multiband_stream_matches_batch_twin(spark, tmp_path):
    """Full-recall multi-band rule: stream == q127's batch operator on
    ordered arrivals (single-band q118 would MISS a duplicate that
    collides only in a later band; the fixture's doc 4 near-dup is
    caught through whichever band collides)."""
    src, sink, ckpt = tmp_path / "src", tmp_path / "sink", tmp_path / "ckpt"
    _write_jsonl(src / "f1.jsonl", _docs_a())
    _run_multiband(spark, src, sink, ckpt)
    assert _read_multiband(spark, sink) == _multiband_batch_rows(spark, _docs_a())


def test_multiband_kill_resume_preserves_band_roots(spark, tmp_path):
    src, sink, ckpt = tmp_path / "src", tmp_path / "sink", tmp_path / "ckpt"
    _write_jsonl(src / "f1.jsonl", _docs_a())
    _run_multiband(spark, src, sink, ckpt)
    n_first = len(_read_multiband(spark, sink))

    _write_jsonl(src / "f2.jsonl", _docs_b())
    _run_multiband(spark, src, sink, ckpt)
    got = _read_multiband(spark, sink)
    # doc 6 (exact dup of 1) suppressed purely from restored state;
    # doc 7 accepted fresh
    ids = {d for d, _ in got}
    assert 6 not in ids and 7 in ids
    assert len(got) == n_first + 1
    # and the union across both phases equals the batch twin over the
    # full corpus (ordered arrivals -> same roots)
    assert got == _multiband_batch_rows(spark, _docs_a() + _docs_b())


# ---------------------------------------------------------------------------
# transformWithStateInPandas twin (Spark 4's successor stateful API)
# ---------------------------------------------------------------------------

_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

try:  # the API's state-server protocol needs protobuf (see neardup.py)
    import google.protobuf  # noqa: F401

    HAS_PROTOBUF = True
except ImportError:
    HAS_PROTOBUF = False

import pytest

needs_protobuf = pytest.mark.skipif(
    not HAS_PROTOBUF, reason="transformWithState needs the protobuf package"
)


def test_transform_with_state_fails_fast_without_protobuf(spark):
    """When the protobuf dependency is absent the operator must raise
    the typed capability error AT CONSTRUCTION (with remediation), not
    crash the streaming driver worker mid-query — the same tested
    fail-fast seam as the Delta/Iceberg writer."""
    from target_hdfs_spark.streaming.neardup import (
        TransformWithStateUnavailableError,
        transform_with_state_bucket_root_dedup,
    )

    if HAS_PROTOBUF:
        pytest.skip("protobuf installed: the parity tests below cover it")
    docs = spark.createDataFrame(_docs_a(), "doc_id long, text string")
    with pytest.raises(TransformWithStateUnavailableError, match="protobuf"):
        transform_with_state_bucket_root_dedup(docs)


def _run_tws_stream(spark, src, sink, ckpt):
    """transformWithState requires the RocksDB provider; pin it for the
    query (the provider is recorded in the checkpoint)."""
    from target_hdfs_spark.streaming.neardup import (
        transform_with_state_bucket_root_dedup,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key)
    spark.conf.set(key, _ROCKSDB)
    try:
        stream = spark.readStream.schema("doc_id long, text string").json(str(src))
        q = (
            transform_with_state_bucket_root_dedup(stream)
            .writeStream.format("parquet")
            .option("path", str(sink))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        spark.conf.set(key, prev)


@needs_protobuf
def test_transform_with_state_matches_batch_twin(spark, tmp_path):
    """The new-API operator must emit exactly the q118 batch-twin rows
    on ordered arrivals — same equivalence bar as the
    applyInPandasWithState implementation."""
    src, sink, ckpt = tmp_path / "src", tmp_path / "sink", tmp_path / "ckpt"
    _write_jsonl(src / "f1.jsonl", _docs_a())
    _run_tws_stream(spark, src, sink, ckpt)
    got = {
        (r.doc_id, r.root_id, r.est_sim)
        for r in spark.read.parquet(str(sink)).collect()
    }
    assert got == _batch_twin_rows(spark, _docs_a())


@needs_protobuf
def test_transform_with_state_kill_resume(spark, tmp_path):
    """Typed ValueState survives a restart: a duplicate of a batch-1
    root arriving after the restart is suppressed using restored
    state, and batch-1 output is not re-emitted."""
    src, sink, ckpt = tmp_path / "src", tmp_path / "sink", tmp_path / "ckpt"
    _write_jsonl(src / "f1.jsonl", _docs_a())
    _run_tws_stream(spark, src, sink, ckpt)
    n_first = spark.read.parquet(str(sink)).count()

    _write_jsonl(src / "f2.jsonl", _docs_b())
    _run_tws_stream(spark, src, sink, ckpt)
    rows = spark.read.parquet(str(sink)).collect()
    by_id = {r.doc_id: r for r in rows}
    assert len(rows) == n_first + 1
    assert 6 not in by_id  # suppressed via restored root state
    assert by_id[7].root_id == 7 and by_id[7].est_sim == 1.0
    assert {
        (r.doc_id, r.root_id, r.est_sim) for r in rows
    } == _batch_twin_rows(spark, _docs_a() + _docs_b())
