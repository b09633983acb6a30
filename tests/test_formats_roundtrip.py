"""Adversarial-content roundtrips: the q139/q140 fingerprint check
runs on the synthetic corpus, whose text happens to contain no
delimiters or newlines — these tests force the hard cases (embedded
quotes, commas, newlines, backslashes, unicode, empty strings)
through the exact same write/read/fingerprint path."""

from __future__ import annotations

from pyspark.sql import functions as F

from target_hdfs_spark.functions.hashing import md5_hash32
from target_hdfs_spark.operators.formats import roundtrip_fingerprint

NASTY = [
    (1, 'plain text', 'en', 'src0'),
    (2, 'comma, separated, values', 'en', 'src0'),
    (3, 'he said "quote" loudly', 'en', 'src1'),
    (4, 'line one\nline two\nline three', 'en', 'src1'),
    (5, 'backslash \\ and \\" escaped quote', 'en', 'src1'),
    (6, 'unicode: café 日本語 \U0001f600', 'ja', 'src2'),
    (7, '', 'en', 'src2'),  # empty text
    (8, '"starts and ends with quotes"', 'en', 'src2'),
    (9, 'tab\there and\rcarriage return', 'en', 'src3'),
    (10, 'trailing spaces   ', 'en', 'src3'),
    (11, None, 'en', 'src3'),  # NULL text must stay NULL, not ''
]


def _docs(spark):
    rows = [(i, t, lg, s, len(t) if t is not None else 0) for i, t, lg, s in NASTY]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def _expected(docs):
    h = md5_hash32(
        F.concat(F.col("doc_id").cast("string"), F.lit("|"), F.col("text"))
    )
    return {
        tuple(r)
        for r in docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum(h).alias("content_hash"),
        )
        .collect()
    }


def test_jsonl_roundtrip_nasty_content(spark):
    docs = _docs(spark)
    got = {tuple(r) for r in roundtrip_fingerprint(spark, docs, "json").collect()}
    assert got == _expected(docs)


def test_csv_roundtrip_nasty_content(spark):
    """Pins the CSV_LOSSLESS_OPTIONS set: with Spark's defaults this
    corpus corrupts two ways (empty string -> NULL; writer-side
    whitespace trimming)."""
    from target_hdfs_spark.operators.formats import CSV_LOSSLESS_OPTIONS

    docs = _docs(spark)
    got = {
        tuple(r)
        for r in roundtrip_fingerprint(
            spark, docs, "csv", **CSV_LOSSLESS_OPTIONS
        ).collect()
    }
    assert got == _expected(docs)
