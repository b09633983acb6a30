"""The streaming RELEASE pipeline: the decontamination gate
(streaming/decon.py) chained into the curation stream
(streaming/curation.py) — benchmark-contaminated documents are
quarantined first, then the clean route is quality-gated and
exact-deduplicated. Pins that the two foreachBatch stages COMPOSE:
the final accepted corpus equals the batch-mode answer (quality +
dedup applied to the decon-clean population), and no quarantined
document ever reaches the accepted corpus."""

from __future__ import annotations

import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from target_hdfs_spark.operators.curation import (
    _EVAL_MOD,
    decon_bits_frame,
    decon_probe_flags,
)
from target_hdfs_spark.sources.readers import load_table
from target_hdfs_spark.streaming.curation import (
    curate_stream,
    quality_gate,
    read_curated,
)
from target_hdfs_spark.streaming.decon import decon_stream, read_route

SF_DIR = "/root/testdata/sf0.001"


def test_decon_then_curate_composes_to_batch_answer(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    ev = docs.where(F.col("doc_id") % _EVAL_MOD == 0).select(
        "doc_id", "text"
    )
    tr = docs.where(F.col("doc_id") % _EVAL_MOD != 0)

    # stage the training slice as 2 stream files
    rows = sorted(tr.collect(), key=lambda r: r.doc_id)
    src = tmp_path / "src"
    src.mkdir()
    k = len(rows) // 2 + 1
    for i in range(2):
        pdf = spark.createDataFrame(
            rows[i * k : (i + 1) * k], tr.schema
        ).toPandas()
        pdf.to_parquet(str(src / f"part{i}.parquet"), index=False)
        time.sleep(1.05)

    # stage 1: decontamination gate
    q1 = decon_stream(
        spark,
        str(src),
        ev,
        str(tmp_path / "clean"),
        str(tmp_path / "quar"),
        str(tmp_path / "ckpt1"),
    )
    q1.awaitTermination(120)
    clean = read_route(spark, str(tmp_path / "clean"))

    # hand-off: flatten the clean route into the next stage's source
    # (a real pipeline chains sinks to sources the same way)
    handoff = tmp_path / "handoff"
    clean.write.mode("overwrite").parquet(str(handoff))

    # stage 2: curation stream over the decon-clean corpus
    q2 = curate_stream(
        spark,
        str(handoff),
        str(tmp_path / "sink"),
        str(tmp_path / "index"),
        str(tmp_path / "ckpt2"),
    )
    q2.awaitTermination(120)
    accepted = read_curated(spark, str(tmp_path / "sink"))
    got = {r.doc_id for r in accepted.select("doc_id").collect()}

    # batch-mode answer: quality + exact dedup over the decon-clean set
    flags = decon_probe_flags(tr, decon_bits_frame(ev))
    clean_batch = tr.join(
        flags.where("bloom_flagged").select("doc_id"), "doc_id", "left_anti"
    )
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    expected = {
        r.doc_id
        for r in quality_gate(clean_batch)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("doc_id")
        .collect()
    }
    assert got == expected

    # no quarantined document reaches the accepted corpus
    quarantined = {
        r.doc_id
        for r in read_route(spark, str(tmp_path / "quar"))
        .select("doc_id")
        .collect()
    }
    assert not (got & quarantined)
