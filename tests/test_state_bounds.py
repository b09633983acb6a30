"""Bounded streaming state (round-4 verdict ask #2): neither the
near-dup state store nor the curation accepted-hash index may grow
monotonically on an unbounded stream.

1. near-dup TTL — `state_ttl_ms` + an event-time column arms an
   EVENT-TIME timeout per bucket: roots idle past the TTL (by the
   watermark clock) are evicted (state row count plateaus instead of
   accreting), an evicted bucket's next arrival re-elects itself root,
   and a within-TTL duplicate is still suppressed; kill-resume across
   the TTL keeps both properties. The clock is the watermark, so the
   tests drive it with event timestamps — no wall-clock sleeps.
2. curation index retention — `index_retention_batches=N` consults and
   retains only the newest N index directories: the on-disk index is
   bounded forever, a within-horizon duplicate is dropped, a
   beyond-horizon duplicate is re-admitted (the documented
   exact-within-horizon trade-off), and the data sink is never pruned.
"""

from __future__ import annotations

import json
import time

from target_hdfs_spark.streaming.neardup import streaming_bucket_root_dedup

BASE = (
    "the quick brown fox jumps over the lazy dog while the rain "
    "in spain stays mainly in the plain and the cat sat on the mat "
)

TTL_MS = 600_000  # 10 minutes of EVENT time


def _write_jsonl(path, rows, sleep=True):
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as fh:
        for doc_id, text, ts in rows:
            fh.write(
                json.dumps(
                    {"doc_id": doc_id, "text": text, "ts": f"2026-08-13T{ts}Z"}
                )
                + "\n"
            )
    if sleep:
        time.sleep(1.05)  # distinct mtimes -> deterministic batch order


def _run_ttl_stream(spark, src, sink, ckpt, ttl_ms=TTL_MS):
    # 1 shuffle partition = a single state-store instance (fast tests;
    # pinned into the checkpoint at first run, consistent on restarts)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try:
        stream = (
            spark.readStream.schema("doc_id long, text string, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        q = (
            streaming_bucket_root_dedup(stream, state_ttl_ms=ttl_ms)
            .writeStream.format("parquet")
            .option("path", str(sink))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180), "stream did not terminate"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return [
        op.numRowsTotal for p in sorted(q.recentProgress, key=lambda p: p.batchId)
        for op in p.stateOperators
    ]


def _fresh_docs(batch: int, hhmm: str, n: int = 3):
    """n documents in n brand-new buckets: every token is unique to
    (batch, i), so no two docs share ANY shingle (shared text would
    LSH-collide them into one bucket and suppress them as near-dups)."""
    return [
        (
            batch * 100 + i,
            " ".join(f"w{batch}x{i}y{j}" for j in range(40)),
            f"{hhmm}:00",
        )
        for i in range(n)
    ]


def test_ttl_evicts_idle_roots_and_reelects(spark, tmp_path):
    """One availableNow run, one file per micro-batch. The watermark
    is the TTL clock: batch 3's watermark (10:30, set by batch 2's
    data) passes doc 1's last activity (10:00:30) + 10 min, so the
    idle root is evicted mid-run and the 10:40 duplicate re-elects."""
    src, sink, ckpt = tmp_path / "src", tmp_path / "sink", tmp_path / "ckpt"
    # batch 0: root elected; a same-batch exact duplicate suppressed
    _write_jsonl(
        src / "f1.jsonl",
        [(1, BASE + "alpha", "10:00:00"), (2, BASE + "alpha", "10:00:30")],
    )
    # batch 1: unrelated bucket; advances the watermark to 10:30
    _write_jsonl(src / "f2.jsonl", [(10, "unrelated content " * 12, "10:30:00")])
    # batch 2: runs with watermark 10:30 > 10:10:30 -> evicts doc 1's
    # idle root (doc 10's root, last active 10:30, survives)
    _write_jsonl(src / "f3.jsonl", [(11, "другой entirely distinct " * 9, "10:31:00")])
    # batch 3: duplicate of doc 1 arrives AFTER the eviction -> its
    # bucket state is gone, so it re-elects itself root; its own
    # same-batch duplicate is still suppressed (rule unchanged)
    _write_jsonl(
        src / "f4.jsonl",
        [(20, BASE + "alpha", "10:40:00"), (21, BASE + "alpha", "10:40:30")],
    )
    _run_ttl_stream(spark, src, sink, ckpt)
    by_id = {r.doc_id: r for r in spark.read.parquet(str(sink)).collect()}
    assert set(by_id) == {1, 10, 11, 20}
    assert by_id[20].root_id == 20 and by_id[20].est_sim == 1.0


def test_ttl_state_plateaus_across_batches(spark, tmp_path):
    """Fresh buckets every batch, event time advancing 30 min per
    batch against a 10-min TTL: without the TTL state grows by
    n_buckets per batch; with it the sweep holds the state-store row
    count at a plateau."""
    src, sink, ckpt = tmp_path / "src", tmp_path / "sink", tmp_path / "ckpt"
    n_batches, per_batch = 4, 3
    for b in range(n_batches):
        _write_jsonl(src / f"f{b}.jsonl", _fresh_docs(b, f"{10 + b // 2}:{30 * (b % 2):02d}"))
    state_rows = _run_ttl_stream(spark, src, sink, ckpt)
    # every batch's roots were accepted (all fresh buckets)
    assert spark.read.parquet(str(sink)).count() == n_batches * per_batch
    # plateau: the final batch holds at most 2 batches' worth of live
    # roots (its own + the not-yet-expired previous), never the
    # accreted total
    assert state_rows, "no state metrics reported"
    assert state_rows[-1] <= 2 * per_batch
    assert state_rows[-1] < n_batches * per_batch


def test_ttl_within_horizon_duplicate_suppressed_across_restart(spark, tmp_path):
    """Arrivals inside the TTL behave exactly like the unbounded
    operator — including across a checkpoint kill-resume (watermark
    and timers are restored from the checkpoint)."""
    src, sink, ckpt = tmp_path / "src", tmp_path / "sink", tmp_path / "ckpt"
    _write_jsonl(src / "f1.jsonl", [(1, BASE + "alpha", "10:00:00")])
    _run_ttl_stream(spark, src, sink, ckpt)
    # "kill": query gone; restart on the same checkpoint with a
    # within-TTL duplicate (10:05 < 10:00 + 10 min)
    _write_jsonl(src / "f2.jsonl", [(2, BASE + "alpha", "10:05:00"), (3, "novel " * 30, "10:05:00")])
    _run_ttl_stream(spark, src, sink, ckpt)
    ids = {r.doc_id for r in spark.read.parquet(str(sink)).collect()}
    assert ids == {1, 3}  # 2 suppressed by the restored, un-expired root


# ---------------------------------------------------------------------------
# curation index retention


def _curation_docs(batch: int, n: int = 3):
    """Quality-gate-passing documents (>=20 tokens, 100-10000 chars,
    unique ratio >= 0.2), distinct content per (batch, i)."""
    rows = []
    for i in range(n):
        text = (
            f"batch {batch} document {i} "
            + " ".join(f"token{batch}w{i}x{j}" for j in range(30))
        )
        rows.append((batch * 100 + i, text))
    return rows


def _stage_parquet(spark, src, name, rows):
    import pandas as pd

    src.mkdir(parents=True, exist_ok=True)
    pdf = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "n_chars": [len(r[1]) for r in rows],
        }
    )
    pdf.to_parquet(str(src / name), index=False)
    time.sleep(1.05)  # distinct mtimes -> deterministic file order


def _run_curation(spark, src, sink, index, ckpt, retention):
    from target_hdfs_spark.streaming.curation import curate_stream

    q = curate_stream(
        spark,
        str(src),
        str(sink),
        str(index),
        str(ckpt),
        max_files_per_trigger=1,
        index_retention_batches=retention,
    )
    q.awaitTermination(180)


def _index_dir_count(index) -> int:
    return len([d for d in index.iterdir() if d.name.startswith("batch_id=")])


def test_curation_index_bounded_and_horizon_semantics(spark, tmp_path):
    from target_hdfs_spark.streaming.curation import read_curated

    src = tmp_path / "src"
    sink, index, ckpt = tmp_path / "sink", tmp_path / "index", tmp_path / "ckpt"
    retention = 2

    # 4 batches of fresh docs, staged one micro-batch each (restart per
    # file keeps the soak honest: the bound must survive resume)
    for b in range(4):
        _stage_parquet(spark, src, f"p{b}.parquet", _curation_docs(b))
        _run_curation(spark, src, sink, index, ckpt, retention)
        # bound is retention PRIOR dirs + the current batch's own dir:
        # pruning the current batch into the retention count would
        # shorten a replayed batch's dedup horizon by one (the reader
        # consults strictly-earlier dirs only)
        assert _index_dir_count(index) <= retention + 1
    # the data sink is output, not state: all 4 batches' docs intact
    assert read_curated(spark, str(sink)).count() == 12

    # within-horizon duplicate (batch 3's doc, 1 batch back) -> dropped
    dup_recent = _curation_docs(3)[0]
    within = [(9000, dup_recent[1])]
    # beyond-horizon duplicate (batch 0's doc, pruned from the index)
    dup_old = _curation_docs(0)[0]
    beyond = [(9001, dup_old[1])]
    _stage_parquet(spark, src, "p_dup.parquet", within + beyond)
    _run_curation(spark, src, sink, index, ckpt, retention)

    out_ids = {r.doc_id for r in read_curated(spark, str(sink)).select("doc_id").collect()}
    assert 9000 not in out_ids  # caught by the retained index
    assert 9001 in out_ids  # documented exact-within-horizon trade-off
    assert _index_dir_count(index) <= retention + 1


def test_ttl_dedup_on_rocksdb_state_store(spark, tmp_path):
    """The production state backend at 100 TB: HDFSBackedStateStore
    keeps every key on the executor heap, so bucket-root state at
    billions of buckets needs the RocksDB provider (spilling,
    changelog checkpointing). Pin that the TTL dedup operator runs
    unchanged — same eviction + re-election semantics — with
    spark.sql.streaming.stateStore.providerClass switched to
    RocksDBStateStoreProvider (the provider is pinned into the
    checkpoint, so the whole scenario runs under RocksDB)."""
    src, sink, ckpt = tmp_path / "src", tmp_path / "sink", tmp_path / "ckpt"
    _write_jsonl(
        src / "f1.jsonl",
        [(1, BASE + "alpha", "10:00:00"), (2, BASE + "alpha", "10:00:30")],
    )
    _write_jsonl(src / "f2.jsonl", [(10, "unrelated content " * 12, "10:30:00")])
    _write_jsonl(src / "f3.jsonl", [(11, "wholly distinct words " * 9, "10:31:00")])
    _write_jsonl(
        src / "f4.jsonl",
        [(20, BASE + "alpha", "10:40:00"), (21, BASE + "alpha", "10:40:30")],
    )
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        _run_ttl_stream(spark, src, sink, ckpt)
    finally:
        spark.conf.set(key, prev)
    by_id = {r.doc_id: r for r in spark.read.parquet(str(sink)).collect()}
    assert set(by_id) == {1, 10, 11, 20}
    assert by_id[20].root_id == 20 and by_id[20].est_sim == 1.0
