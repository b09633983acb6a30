"""Streaming decontamination gate (streaming/decon.py): routing
parity with the batch Bloom probe, the no-false-negatives guarantee
against the exact gram join, partition/disjointness of the two
routes, and checkpoint restart idempotence of the batch_id-overwrite
sinks."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from target_hdfs_spark.operators.curation import (
    _EVAL_MOD,
    _NGRAM,
    decon_bits_frame,
    decon_doc_grams,
    decon_probe_flags,
)
from target_hdfs_spark.sources.readers import load_table
from target_hdfs_spark.streaming.decon import decon_stream, read_route

SF_DIR = "/root/testdata/sf0.001"


def _eval_and_train(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    ev = docs.where(F.col("doc_id") % _EVAL_MOD == 0)
    tr = docs.where(F.col("doc_id") % _EVAL_MOD != 0)
    return ev, tr


def _stage_files(spark, tmp_path, train, n_files=3):
    """The training slice split into n parquet files staged with
    distinct mtimes (file-source order follows mod time)."""
    rows = sorted(train.collect(), key=lambda r: r.doc_id)
    src = tmp_path / "src"
    src.mkdir()
    k = len(rows) // n_files + 1
    for i in range(n_files):
        chunk = rows[i * k : (i + 1) * k]
        pdf = spark.createDataFrame(chunk, train.schema).toPandas()
        pdf.to_parquet(str(src / f"part{i}.parquet"), index=False)
        time.sleep(1.05)
    return src


def _run(spark, tmp_path, src, ev, **kw):
    q = decon_stream(
        spark,
        str(src),
        ev,
        str(tmp_path / "clean"),
        str(tmp_path / "quar"),
        str(tmp_path / "ckpt"),
        **kw,
    )
    q.awaitTermination(120)
    return (
        read_route(spark, str(tmp_path / "clean")),
        read_route(spark, str(tmp_path / "quar")),
    )


def test_stream_routing_matches_batch_probe(spark, tmp_path):
    ev, tr = _eval_and_train(spark)
    src = _stage_files(spark, tmp_path, tr)
    clean, quar = _run(spark, tmp_path, src, ev)
    batch_flags = decon_probe_flags(tr, decon_bits_frame(ev))
    expected_quar = {
        r.doc_id for r in batch_flags.where("bloom_flagged").collect()
    }
    got_quar = {r.doc_id for r in quar.collect()}
    got_clean = {r.doc_id for r in clean.collect()}
    assert got_quar == expected_quar
    # the two routes PARTITION the input: disjoint, jointly complete
    all_ids = {r.doc_id for r in tr.collect()}
    assert got_quar | got_clean == all_ids
    assert not (got_quar & got_clean)


def test_stream_never_misses_exact_contamination(spark, tmp_path):
    """Bloom can never miss an inserted gram, so every document the
    exact gram join flags must land in quarantine — the guarantee
    that makes the cheap streaming gate safe."""
    ev, tr = _eval_and_train(spark)
    src = _stage_files(spark, tmp_path, tr)
    _, quar = _run(spark, tmp_path, src, ev)
    ev_grams = decon_doc_grams(ev).select("gram").distinct()
    exact = {
        r.doc_id
        for r in decon_doc_grams(tr)
        .join(ev_grams, "gram")
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert exact, "exact truth empty — the eval slice should collide"
    got_quar = {r.doc_id for r in quar.collect()}
    assert exact <= got_quar


def test_restart_resumes_without_duplicates(spark, tmp_path):
    """Stop after the first one-file micro-batch, restart with the
    same checkpoint: every input lands in exactly one route exactly
    once (the overwrite-by-batch sink is replay-idempotent)."""
    ev, tr = _eval_and_train(spark)
    src = _stage_files(spark, tmp_path, tr)
    q = decon_stream(
        spark,
        str(src),
        ev,
        str(tmp_path / "clean"),
        str(tmp_path / "quar"),
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        available_now=False,
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        if any(p.lastProgress for p in [q] if p.lastProgress) and (
            q.lastProgress.get("numInputRows", 0) > 0
        ):
            break
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(60)
    q2 = decon_stream(
        spark,
        str(src),
        ev,
        str(tmp_path / "clean"),
        str(tmp_path / "quar"),
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    q2.awaitTermination(120)
    clean = read_route(spark, str(tmp_path / "clean"))
    quar = read_route(spark, str(tmp_path / "quar"))
    got = [r.doc_id for r in clean.select("doc_id").collect()] + [
        r.doc_id for r in quar.select("doc_id").collect()
    ]
    assert sorted(got) == sorted(r.doc_id for r in tr.collect())
