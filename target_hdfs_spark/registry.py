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

import glob
import json
import os
import re

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


# --- Evaluation-priority order --------------------------------------
# The round driver records correctness rows for only the FIRST 50
# queries returned by ``all_queries()``, so the ordering is a rotation
# schedule. It is COMPUTED at access time from the CORRECTNESS_r*.json
# ledgers on disk: never-driver-checked queries first (numeric
# query-id order), then stalest latest-check first. Dropping a new
# ledger file therefore rotates the window automatically — there is no
# pinned tuple to go stale (a pinned tuple went stale at three
# consecutive round closes; VERDICT r5-r7).
#
# Registry MEMBERSHIP (which queries exist) is still snapshotted in
# ``registry_snapshot.py`` so additions/renames fail the hygiene suite
# until reviewed; regenerate with ``python scripts/gen_priority.py
# --write``. Membership does not depend on the ledgers, so a new
# ledger can never fail the suite.

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest_check_round(repo_root: str | None = None) -> dict[str, int]:
    """query name -> highest round with a driver correctness row."""
    root = repo_root if repo_root is not None else _REPO_ROOT
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            # A torn / in-progress ledger must never break imports; the
            # driver may drop the file mid-round.
            continue
        for name in rows:
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


def query_number(name: str) -> int:
    m = re.match(r"q(\d+)", name)
    return int(m.group(1)) if m else 1 << 30


def _import_operator_modules() -> None:
    """Import all operator modules (side effect: registration).
    Deferred so ``import target_hdfs_spark`` stays cheap."""
    from target_hdfs_spark.operators import (  # noqa: F401
        analytics,
        asof,
        curation,
        dedup,
        formats,
        linkage,
        multimodal,
        packing,
        relational,
        similarity,
        skew,
        text,
        windows,
    )


def compute_priority_order(
    latest: dict[str, int] | None = None,
) -> tuple[str, ...]:
    """The rotation schedule, derived from the correctness ledgers.

    Never-checked queries first (numeric query-id order), then
    stalest latest-check first; the numeric query id breaks ties —
    NOT dict registration position, which depends on module import
    order. ``latest`` is injectable for tests (simulating a freshly
    dropped ledger); by default it is read from disk.
    """
    _import_operator_modules()
    if latest is None:
        latest = latest_check_round()
    return tuple(
        sorted(REGISTRY, key=lambda n: (latest.get(n, 0), query_number(n), n))
    )


def __getattr__(name: str):
    # PEP 562: PRIORITY_ORDER is computed on access, never pinned.
    if name == "PRIORITY_ORDER":
        return compute_priority_order()
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def all_queries() -> dict[str, QuerySpec]:
    """Import all operator modules (side effect: registration) and
    return the registry in evaluation-priority order."""
    order = compute_priority_order()
    return {name: REGISTRY[name] for name in order}
