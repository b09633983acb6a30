"""Every registered query with an oracle must match DuckDB exactly at
sf0.001 — the local mirror of the driver's t2 correctness gate.
Queries without an oracle must at least execute and return a stable
schema."""

from __future__ import annotations

import pytest

from target_hdfs_spark.registry import all_queries
from tests.oracle_compare import compare_query

SF_DIR = "/root/testdata/sf0.001"

SPECS = all_queries()
WITH_ORACLE = sorted(n for n, s in SPECS.items() if s.oracle)
ROWS_ONLY = sorted(n for n, s in SPECS.items() if not s.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, name):
    problems = compare_query(spark, SPECS[name], SF_DIR)
    assert not problems, f"{name}: " + " | ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_executes(spark, name):
    df = SPECS[name].fn(spark, SF_DIR)
    assert df.columns, f"{name} returned no columns"
    assert df.count() >= 0


def test_registry_is_idempotent():
    """Calling all_queries() repeatedly (as the driver may) returns the
    same stable registry."""
    a = all_queries()
    b = all_queries()
    assert a.keys() == b.keys()
    assert all(a[k].fn is b[k].fn for k in a)
    assert all(a[k].oracle == b[k].oracle for k in a)
