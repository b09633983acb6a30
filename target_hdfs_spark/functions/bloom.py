"""Deterministic Bloom filter as relational algebra — the semi-join
reduction pattern (Bloom-join) made engine-portable.

At 100 TB the classic use is: a huge fact table must be semi-joined
against a key set that is too big to broadcast as an exact hash set
but whose BLOOM FILTER (a few KB of bit words) is not. The probe
drops most non-matching fact rows map-side, and the exact join only
pays for the survivors.

Spark's own runtime filters (AQE runtime bloom, parquet bloom) cover
many cases implicitly; this module expresses the pattern EXPLICITLY
so it can be applied where the optimizer cannot see it (the key set
is the output of an arbitrary subquery) — and so it is exactly
testable: every bit is a deterministic function of the key via the
portable md5 hash family, so Spark and the DuckDB oracle build
bit-identical filters.

Layout: _M bits as _WORDS words of 32 bits each, stored in BIGINT
(32-bit words keep every shifted value positive and < 2^32, avoiding
int64 sign-bit divergence between engines); k = _K salted hashes per
key; built with ``bit_or`` aggregation. The built filter is a
_WORDS-row (word_idx, word) table — always broadcastable.

Sizing: _M is fixed here for oracle portability; production sizing is
~10 bits per expected key (FP ~1%) — the module's layout is
parametric in everything but the two constants.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from target_hdfs_spark.functions.hashing import md5_hash32, md5_hash32_sql

_WORDS = 64          # 64 words x 32 bits = 2048 bits
_K = 4               # hash functions per key
_M = 32 * _WORDS


def _positions(key: Column) -> list[Column]:
    """The _K bit positions of a key, via salted portable hashes."""
    return [
        md5_hash32(F.concat(F.lit(f"bf{i}|"), key.cast("string"))) % _M
        for i in range(_K)
    ]


def positions_sql(key_expr: str) -> list[str]:
    """DuckDB expressions for the same _K bit positions."""
    out = []
    for i in range(_K):
        salted = f"'bf{i}|' || CAST({key_expr} AS VARCHAR)"
        out.append(f"({md5_hash32_sql(salted)} % {_M})")
    return out


def bloom_build(keys: DataFrame, key_col: str) -> DataFrame:
    """Aggregate a key column into the (word_idx, word) filter table.
    One shuffle of (n_keys x _K) tiny position rows, bit_or-combined
    map-side; output is <= _WORDS rows regardless of key count."""
    pos = F.explode(F.array(*_positions(F.col(key_col)))).alias("pos")
    return (
        keys.select(pos)
        .select(
            F.floor(F.col("pos") / 32).cast("int").alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))"
            ).alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )


BLOOM_BUILD_SQL = """
  SELECT pos // 32 AS word_idx,
         bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER)) AS word
  FROM ({positions_union}) GROUP BY 1
"""


def bloom_probe(df: DataFrame, key_col: str, bloom: DataFrame) -> DataFrame:
    """Keep rows of ``df`` whose key passes the Bloom filter (all _K
    bits set). The filter table is broadcast; each probe is an
    equi-join on word_idx plus a bitwise test — entirely map-side."""
    out = df
    for i, pos in enumerate(_positions(F.col(key_col))):
        b = F.broadcast(
            bloom.select(
                F.col("word_idx").alias(f"_bw{i}"),
                F.col("word").alias(f"_wv{i}"),
            )
        )
        out = (
            out.withColumn(f"_pos{i}", pos)
            .join(
                b,
                F.floor(F.col(f"_pos{i}") / 32).cast("int")
                == F.col(f"_bw{i}"),
                "left",
            )
            .where(
                F.expr(
                    f"_wv{i} IS NOT NULL AND "
                    f"(_wv{i} & shiftleft(CAST(1 AS BIGINT), "
                    f"CAST(_pos{i} % 32 AS INT))) != 0"
                )
            )
            .drop(f"_pos{i}", f"_bw{i}", f"_wv{i}")
        )
    return out
