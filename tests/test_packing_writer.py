"""The packed-dataset writer must conserve the corpus exactly: chunk
arrays concatenated in chunk order equal the corpus tokens
concatenated in training order, every non-final chunk is full, and a
rerun is byte-identical."""

from __future__ import annotations

from pyspark.sql import functions as F

from target_hdfs_spark.functions.textfuncs import tokens
from target_hdfs_spark.operators.packing import packed_token_frame
from target_hdfs_spark.plans.packing_writer import (
    IncompletePackError,
    packed_chunks,
    read_band,
    write_packed_dataset,
)
from target_hdfs_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.001"
CTX = 256  # small ctx so the test corpus yields many chunks


def _corpus_tokens_in_order(spark):
    frame = packed_token_frame(spark, SF_DIR).select("doc_id", "cum_before")
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", tokens("text").alias("toks")
    )
    rows = (
        docs.join(frame, "doc_id")
        .orderBy("cum_before")
        .select("toks")
        .collect()
    )
    out = []
    for r in rows:
        out.extend(r["toks"])
    return out


def test_chunks_conserve_the_corpus(spark):
    chunks = {
        r["chunk_id"]: r for r in packed_chunks(spark, SF_DIR, CTX).collect()
    }
    expected = _corpus_tokens_in_order(spark)
    n_chunks = (len(expected) + CTX - 1) // CTX
    assert sorted(chunks) == list(range(n_chunks))
    got = []
    for cid in range(n_chunks):
        r = chunks[cid]
        assert r["n_tokens"] == len(r["tokens"])
        if cid < n_chunks - 1:
            assert r["n_tokens"] == CTX  # every non-final chunk is full
        got.extend(r["tokens"])
    assert got == expected  # exact token-level conservation


def test_writer_roundtrip_and_determinism(spark, tmp_path):
    n1 = write_packed_dataset(
        spark, SF_DIR, str(tmp_path / "pack1"), ctx=CTX, chunks_per_band=8
    )
    n2 = write_packed_dataset(
        spark, SF_DIR, str(tmp_path / "pack2"), ctx=CTX, chunks_per_band=8
    )
    assert n1 == n2 > 1
    a = spark.read.parquet(str(tmp_path / "pack1"))
    b = spark.read.parquet(str(tmp_path / "pack2"))
    ja = {r["chunk_id"]: r for r in a.collect()}
    jb = {r["chunk_id"]: r for r in b.collect()}
    assert set(ja) == set(jb)
    for cid, ra in ja.items():
        rb = jb[cid]
        assert ra["tokens"] == rb["tokens"]
        assert ra["n_docs"] == rb["n_docs"]
        # band partitioning: the hive column reflects chunk_id div 8
        assert ra["chunk_band"] == cid // 8
    # partition pruning surface: one band directory per 8 chunks
    import os

    bands = [
        d
        for d in os.listdir(tmp_path / "pack1")
        if d.startswith("chunk_band=")
    ]
    assert len(bands) == (max(ja) // 8) + 1


def test_ctx_validation(spark):
    import pytest

    with pytest.raises(ValueError, match="ctx must be positive"):
        packed_chunks(spark, SF_DIR, 0)


def test_read_band_prunes_to_one_partition(spark, tmp_path):
    """The trainer-resume read (read_band) must PRUNE at the partition
    level: the scan's PartitionFilters carry the chunk_band equality,
    and only that band's rows come back."""
    out = str(tmp_path / "pack")
    write_packed_dataset(spark, SF_DIR, out, ctx=CTX, chunks_per_band=8)
    band = read_band(spark, out, 1)
    plan = band._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "chunk_band" in plan.split("PartitionFilters", 1)[1][:200]
    rows = band.collect()
    assert rows and all(8 <= r["chunk_id"] < 16 for r in rows)
    assert {r["chunk_band"] for r in rows} == {1}


def test_interrupted_write_refuses_then_recovers(spark, tmp_path):
    """Interrupted-write recovery (r10 verdict item 6): a write that
    died before Spark's commit published _SUCCESS must fail a resume
    read with the typed error naming the remediation; rerunning the
    writer (overwrite) recovers, byte-identical."""
    import os
    import shutil

    import pytest

    out = str(tmp_path / "pack")
    write_packed_dataset(spark, SF_DIR, out, ctx=CTX, chunks_per_band=8)
    before = {
        r["chunk_id"]: r["tokens"] for r in read_band(spark, out, 0).collect()
    }
    # simulate the crash window: commit marker gone, one band partial
    os.remove(os.path.join(out, "_SUCCESS"))
    shutil.rmtree(os.path.join(out, "chunk_band=1"))
    with pytest.raises(IncompletePackError, match="rerun"):
        read_band(spark, out, 0)
    # recovery = rerun; overwrite replaces the partial output
    write_packed_dataset(spark, SF_DIR, out, ctx=CTX, chunks_per_band=8)
    after = {
        r["chunk_id"]: r["tokens"] for r in read_band(spark, out, 0).collect()
    }
    assert after == before
    assert read_band(spark, out, 1).count() > 0  # the removed band is back
