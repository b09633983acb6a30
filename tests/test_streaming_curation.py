"""Streaming corpus curation (streaming/curation.py): batch parity
with the batch operators (quality gate + exact dedup), cross-batch
dedup via the hash index, checkpoint restart-resume, and replay
idempotence of the batch_id-overwrite sink."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from target_hdfs_spark.sources.readers import load_table
from target_hdfs_spark.streaming.curation import (
    curate_stream,
    quality_gate,
    read_curated,
)

SF_DIR = "/root/testdata/sf0.001"


def _batch_curate(docs):
    """The batch-mode answer: q54 quality rules, then q40's exact
    dedup (min-doc_id survivor per content hash)."""
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    return (
        quality_gate(docs)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def _stage_files(spark, tmp_path, n_files=3, with_cross_batch_dup=True):
    """Split the documents table by doc_id order into n parquet files,
    staged one at a time (file-source order follows mod time). The last
    file gets an exact-duplicate of an early accepted doc under a new
    doc_id — the cross-batch duplicate the index must catch."""
    docs = load_table(spark, SF_DIR, "documents").orderBy("doc_id")
    rows = docs.collect()
    accepted_first = quality_gate(spark.createDataFrame(rows[: len(rows) // n_files], docs.schema))
    dup_src = accepted_first.orderBy("doc_id").first()
    src = tmp_path / "src"
    src.mkdir()
    chunks = [rows[i :: n_files] for i in range(n_files)]
    # keep doc_id order across files: chunk i gets the i-th slice sorted
    flat = sorted(rows, key=lambda r: r.doc_id)
    k = len(flat) // n_files + 1
    chunks = [flat[i * k : (i + 1) * k] for i in range(n_files)]
    if with_cross_batch_dup and dup_src is not None:
        dup = dup_src.asDict()
        dup["doc_id"] = max(r.doc_id for r in flat) + 1
        chunks[-1] = chunks[-1] + [type(dup_src)(**dup)]
    paths = []
    for i, chunk in enumerate(chunks):
        # single parquet FILES (the file stream source lists files, not
        # nested write directories)
        p = src / f"part{i}.parquet"
        pdf = spark.createDataFrame(chunk, docs.schema).toPandas()
        pdf.to_parquet(str(p), index=False)
        time.sleep(1.05)  # distinct mtimes -> deterministic file order
        paths.append(p)
    return src, chunks


def test_stream_matches_batch_curation(spark, tmp_path):
    src, _ = _stage_files(spark, tmp_path)
    sink, index, ckpt = (str(tmp_path / d) for d in ("sink", "index", "ckpt"))
    q = curate_stream(
        spark, str(src), sink, index, ckpt, max_files_per_trigger=1
    )
    q.awaitTermination(180)

    got = {tuple(r) for r in read_curated(spark, sink).select("doc_id", "text").collect()}
    want_docs = spark.read.parquet(str(src)).orderBy("doc_id")
    want = {
        tuple(r)
        for r in _batch_curate(want_docs).select("doc_id", "text").collect()
    }
    assert got == want
    assert len(got) > 0


def test_cross_batch_duplicate_dropped(spark, tmp_path):
    src, chunks = _stage_files(spark, tmp_path, with_cross_batch_dup=True)
    sink, index, ckpt = (str(tmp_path / d) for d in ("sink", "index", "ckpt"))
    q = curate_stream(spark, str(src), sink, index, ckpt, max_files_per_trigger=1)
    q.awaitTermination(180)
    out = read_curated(spark, sink)
    # the injected duplicate text appears exactly once, under the
    # ORIGINAL (earlier-batch) doc_id
    dup_id = max(r.doc_id for c in chunks for r in c)
    by_text = out.groupBy("text").count()
    assert by_text.where(F.col("count") > 1).count() == 0
    assert out.where(F.col("doc_id") == dup_id).count() == 0


def test_restart_resumes_without_duplicates(spark, tmp_path):
    src, chunks = _stage_files(spark, tmp_path)
    # phase 1: only the first file exists
    staged = sorted(src.iterdir())
    held_back = staged[1:]
    hold = tmp_path / "hold"
    hold.mkdir()
    moved = []
    for p in held_back:
        tgt = hold / p.name
        p.rename(tgt)
        moved.append((tgt, src / p.name))
    sink, index, ckpt = (str(tmp_path / d) for d in ("sink", "index", "ckpt"))
    q = curate_stream(spark, str(src), sink, index, ckpt, max_files_per_trigger=1)
    q.awaitTermination(180)
    n_first = read_curated(spark, sink).count()
    assert n_first > 0

    # phase 2: remaining files arrive; restart on the same checkpoint
    for tgt, back in moved:
        tgt.rename(back)
    q2 = curate_stream(spark, str(src), sink, index, ckpt, max_files_per_trigger=1)
    q2.awaitTermination(180)

    got = {tuple(r) for r in read_curated(spark, sink).select("doc_id", "text").collect()}
    want = {
        tuple(r)
        for r in _batch_curate(
            spark.read.parquet(str(src)).orderBy("doc_id")
        ).select("doc_id", "text").collect()
    }
    assert got == want


def test_rerun_after_completion_is_noop(spark, tmp_path):
    src, _ = _stage_files(spark, tmp_path, n_files=2)
    sink, index, ckpt = (str(tmp_path / d) for d in ("sink", "index", "ckpt"))
    q = curate_stream(spark, str(src), sink, index, ckpt)
    q.awaitTermination(180)
    before = sorted(
        tuple(r) for r in read_curated(spark, sink).select("doc_id").collect()
    )
    q2 = curate_stream(spark, str(src), sink, index, ckpt)
    q2.awaitTermination(180)
    after = sorted(
        tuple(r) for r in read_curated(spark, sink).select("doc_id").collect()
    )
    assert before == after
