"""Named-query registry: the oracle-checkable operator surface.

Every operator the engine claims (SURVEY.md §2) registers one named
query here via the ``@query`` decorator. Each entry carries:

- ``fn(spark, sf_dir) -> DataFrame`` — the Spark-first implementation;
- ``oracle`` — equivalent ANSI SQL runnable by DuckDB on the same
  parquet tables (views: region nation customer supplier part orders
  lineitem events documents embeddings), or ``None`` for genuinely
  non-SQL-expressible operators (driver then records a rows-only
  check).

Column names must match between the two: the comparison sorts columns
by name before hashing values, so every computed column is aliased
identically on both sides (lowercase, since DuckDB lowercases unquoted
identifiers).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Register an oracle-checkable named query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "", tags=tags
        )
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    """Import all operator modules (side effect: registration) and
    return the full registry."""
    # Imports are deferred so `import target_hdfs_spark` stays cheap.
    from target_hdfs_spark.operators import (  # noqa: F401
        asof,
        dedup,
        multimodal,
        relational,
        similarity,
        skew,
        text,
        windows,
    )

    return dict(REGISTRY)
