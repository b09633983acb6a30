"""Portable deterministic hashing — identical results in Spark and in
the DuckDB oracle, so every sketch built on it (minhash, simhash,
fingerprints, LSH buckets) is exactly verifiable.

The engine-agnostic 32-bit hash of a string is the first 8 hex chars
of its md5, read as an integer:

- Spark:  ``conv(substring(md5(x), 1, 8), 16, 10)`` cast to bigint
- DuckDB: ``CAST(('0x' || substring(md5(x), 1, 8)) AS BIGINT)``

md5 is bit-identical everywhere; the 32-bit truncation keeps the
universal-hash arithmetic (a*h + b mod p) inside exact int64 range.
Not a cryptographic choice — a reproducibility choice.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Smallest prime > 2^32: the classic modulus for 32-bit universal hashing.
MERSENNE_P = 4294967311

# Deterministic coefficient family for h_i(x) = (a_i * x + b_i) % p.
# Knuth's multiplicative constant keeps the a_i well-distributed; both
# the Spark plans and the generated oracle SQL read from this table.
# a_i stays below 2^31 so a_i * h (h < 2^32) never overflows int64 —
# Spark runs ANSI mode and hard-fails on long overflow.
def hash_coeffs(n: int) -> list[tuple[int, int]]:
    return [
        (
            (i * 2654435761 + 1) % 2147483629 + 1,
            (i * 40503 + 7) % 2147483647,
        )
        for i in range(1, n + 1)
    ]


def md5_hash32(col: Column | str) -> Column:
    """Engine-portable 32-bit string hash (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")


def md5_hash32_sql(expr: str) -> str:
    """Engine-portable 32-bit string hash (DuckDB oracle side)."""
    return f"CAST(('0x' || substring(md5({expr}), 1, 8)) AS BIGINT)"
