"""Interchange-format roundtrips (SURVEY.md §2A extension of the
ingest surface, R12/R25): prove the engine can move the corpus through
the text-based interchange formats a real lake ingests — JSON Lines
and quoted CSV — without corrupting a byte.

The reference (Automattic/target-hdfs) consumes newline-delimited JSON
on stdin (Singer messages, `reference/target_hdfs/__init__.py`) and
emits parquet; its implicit contract is "text-format ingest is
lossless". These queries check that contract END TO END on the Spark
side: write the documents table out through the format, read it back
with an explicit schema, and compare content fingerprints against the
parquet original (the DuckDB oracle reads the parquet directly, so any
roundtrip corruption — encoding, quoting, escaping, type coercion —
breaks the value-hash match).

Fingerprint design: per-source COUNT, exact BIGINT SUM of n_chars, and
an order-independent SUM of a 32-bit md5 prefix of
``doc_id|text`` (functions/hashing.py portable hash) — any dropped,
duplicated, truncated, or mis-decoded row changes it.

Scratch space: roundtrips write under /tmp (driver-local in this
harness; on a cluster this would be a scratch prefix on the object
store). Each call uses a fresh mkdtemp so concurrent runs never
collide, and the directory is removed afterwards.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from target_hdfs_spark.functions.hashing import md5_hash32
from target_hdfs_spark.registry import query
from target_hdfs_spark.sources.readers import load_table

_DOC_SCHEMA = (
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
)

# The option set under which Spark's CSV source/sink is actually
# content-lossless for free text (see q140's docstring for why each
# non-default matters).
CSV_LOSSLESS_OPTIONS = dict(
    header="true",
    quoteAll="true",
    escape="\\",
    multiLine="true",
    nullValue="\\N",
    emptyValue="",
    ignoreLeadingWhiteSpace="false",
    ignoreTrailingWhiteSpace="false",
)

_FINGERPRINT_ORACLE = """
    SELECT
      source,
      COUNT(*) AS n_docs,
      -- BIGINT casts: DuckDB SUM(BIGINT) yields HUGEINT, which the
      -- driver canonicalizer would coerce to float64 (the q66 r1
      -- hazard); values fit comfortably in int64.
      CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      CAST(SUM(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|' || text), 1, 8)) AS BIGINT)) AS BIGINT) AS content_hash
    FROM documents
    GROUP BY source
    ORDER BY source
"""


def _fingerprint(df: DataFrame) -> DataFrame:
    """Order-independent per-source content fingerprint."""
    h = md5_hash32(
        F.concat(F.col("doc_id").cast("string"), F.lit("|"), F.col("text"))
    )
    return (
        df.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum(h).alias("content_hash"),
        )
        .orderBy("source")
    )


def roundtrip_fingerprint(
    spark: SparkSession, docs: DataFrame, fmt: str, **options
) -> DataFrame:
    """Write `docs` through `fmt`, read it back with an explicit
    schema, and return the per-source content fingerprint (collected
    into a small local frame so the scratch dir can be deleted)."""
    tmp = tempfile.mkdtemp(prefix=f"roundtrip_{fmt}_")
    try:
        path = f"{tmp}/documents_{fmt}"
        docs.write.format(fmt).options(**options).mode("overwrite").save(path)
        back = (
            spark.read.format(fmt)
            .schema(_DOC_SCHEMA)
            .options(**options)
            .load(path)
        )
        # Fingerprint while the scratch files still exist: collecting
        # here (group-level rows only) lets us delete the temp dir
        # before returning. createDataFrame over the tiny aggregate
        # keeps the query's public surface a DataFrame.
        fp = _fingerprint(back)
        rows = fp.collect()
        return spark.createDataFrame(rows, fp.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _roundtrip(spark: SparkSession, sf_dir: str, fmt: str, **options) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return roundtrip_fingerprint(spark, docs, fmt, **options)


@query(
    "q139_jsonl_roundtrip",
    oracle=_FINGERPRINT_ORACLE,
    tags=("source", "sink", "format", "ingest"),
)
def q139_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → JSON Lines → documents: newline-delimited JSON is
    the Singer/lake interchange format the reference ingests
    (reference/target_hdfs/__init__.py reads NDJSON on stdin); this
    proves the Spark JSON source/sink pair is content-lossless.

    Scale: both sides are distributed scans — JSONL splits by line, so
    a 100 TB corpus reads with full parallelism (one caveat encoded
    here: write uncompressed or with a splittable codec; a single
    gzip JSONL would serialize the scan — see sources/readers.fan_out).
    """
    return _roundtrip(spark, sf_dir, "json")


@query(
    "q140_csv_roundtrip",
    oracle=_FINGERPRINT_ORACLE,
    tags=("source", "sink", "format", "ingest"),
)
def q140_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → quoted CSV → documents: exercises the quoting /
    escaping path (quoteAll + backslash escape + multiLine read), the
    trap where naive engines corrupt free-text columns containing
    delimiters, quotes, or newlines.

    Three non-default options are LOAD-BEARING for losslessness
    (each found by the adversarial-content test,
    tests/test_formats_roundtrip.py):
    - ``nullValue=\\N`` + ``emptyValue=""``: with the defaults, an
      empty string writes as "" and reads back as NULL;
    - ``ignoreLeading/TrailingWhiteSpace=false`` on the WRITE side
      too — Spark's CSV *writer* trims cell whitespace by default,
      so 'x   ' silently becomes 'x' before it ever hits disk.

    Scale: multiLine=true makes CSV files non-splittable (a record may
    cross line boundaries), so the write keeps Spark's natural
    many-files layout — parallelism comes from file count, the correct
    trade-off for quoted free text at 100 TB.
    """
    return _roundtrip(spark, sf_dir, "csv", **CSV_LOSSLESS_OPTIONS)


@query(
    "q273_orc_roundtrip",
    oracle=_FINGERPRINT_ORACLE,
    tags=("source", "sink", "format", "ingest"),
)
def q273_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → ORC → documents: the reference's write surface
    advertises ORC beside parquet (R12 — `plans/writer.py` carries the
    same capability), and a lake migration regularly has to move a
    corpus BETWEEN columnar formats; this proves the Spark ORC
    source/sink pair is content-lossless under the same fingerprint
    contract as the text formats (q139/q140). Unlike the text paths
    there are no quoting/escaping traps — the check guards type
    mapping (BIGINT/STRING roundtrip through the ORC writer's own
    schema) and codec integrity.

    Scale: ORC stripes are splittable, so both directions scan with
    full parallelism at 100 TB; the default zlib codec keeps the
    interchange compact.
    """
    return _roundtrip(spark, sf_dir, "orc")
