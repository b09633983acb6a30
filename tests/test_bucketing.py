"""Bucketed co-located join: the bucketed plan must be Exchange-free
while the plain-parquet control needs two shuffles."""

from __future__ import annotations

import pytest

from target_hdfs_spark.plans.bucketing import co_located_join, n_exchanges, write_bucketed


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_is_shuffle_free(spark, tmp_path, no_broadcast):
    li = spark.range(0, 1000).selectExpr("id AS k", "id * 2 AS a")
    orders = spark.range(0, 500).selectExpr("id AS k", "id * 3 AS b")

    write_bucketed(li, "bkt_li", 4, ["k"], sort_cols=["k"])
    write_bucketed(orders, "bkt_orders", 4, ["k"], sort_cols=["k"])
    try:
        joined = co_located_join(spark, "bkt_li", "bkt_orders", ["k"])
        assert n_exchanges(joined) == 0, joined._jdf.queryExecution().executedPlan().toString()
        assert joined.count() == 500

        # control: identical join over plain parquet shuffles both sides
        li.write.mode("overwrite").parquet(str(tmp_path / "li"))
        orders.write.mode("overwrite").parquet(str(tmp_path / "od"))
        control = spark.read.parquet(str(tmp_path / "li")).join(
            spark.read.parquet(str(tmp_path / "od")), ["k"]
        )
        assert n_exchanges(control) >= 2
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_li")
        spark.sql("DROP TABLE IF EXISTS bkt_orders")


def test_mismatched_buckets_still_correct(spark, no_broadcast):
    """Different bucket counts: Spark may re-shuffle one side, but the
    result is identical — bucketing is purely physical."""
    a = spark.range(0, 100).selectExpr("id AS k", "id AS a")
    b = spark.range(0, 100).selectExpr("id AS k", "id AS b")
    write_bucketed(a, "bkt_a8", 8, ["k"])
    write_bucketed(b, "bkt_b4", 4, ["k"])
    try:
        joined = co_located_join(spark, "bkt_a8", "bkt_b4", ["k"])
        assert joined.count() == 100
        assert n_exchanges(joined) <= 1  # at most the small side moves
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_a8")
        spark.sql("DROP TABLE IF EXISTS bkt_b4")
