from pyspark.sql import types as T

from target_hdfs_spark.transforms import (
    apply_stream_map,
    flatten,
    with_extra_fields,
    with_record_metadata,
)


def _nested_df(spark):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField(
                "user",
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField(
                            "address",
                            T.StructType([T.StructField("city", T.StringType())]),
                        ),
                    ]
                ),
            ),
            T.StructField("tags", T.ArrayType(T.StringType())),
        ]
    )
    return spark.createDataFrame(
        [(1, ("ann", ("berlin",)), ["a", "b"])], schema=schema
    )


def test_flatten_double_underscore_names(spark):
    out = flatten(_nested_df(spark))
    assert out.columns == ["id", "user__name", "user__address__city", "tags"]
    row = out.collect()[0]
    assert row.user__address__city == "berlin"
    assert row.tags == ["a", "b"]  # arrays are NOT exploded


def test_flatten_max_depth_serializes_deeper_structs(spark):
    out = flatten(_nested_df(spark), max_depth=1)
    assert "user__address" in out.columns
    row = out.collect()[0]
    assert row.user__address == '{"city":"berlin"}'


def test_flatten_noop_for_flat_df(spark):
    df = spark.createDataFrame([(1, "x")], "id long, s string")
    assert flatten(df) is df


def test_extra_fields_typed(spark):
    df = spark.createDataFrame([(1,)], "id long")
    out = with_extra_fields(df, {"env": "prod", "v": "3"}, {"v": "integer"})
    row = out.collect()[0]
    assert row.env == "prod" and row.v == 3
    assert dict(out.dtypes)["v"] == "bigint"


def test_record_metadata_columns(spark):
    df = spark.createDataFrame([(1,)], "id long")
    out = with_record_metadata(df)
    assert {"_sdc_received_at", "_sdc_batched_at", "_sdc_extracted_at"} <= set(out.columns)
    row = out.collect()[0]
    assert row._sdc_received_at is not None


def test_stream_map_filter_drop_compute(spark):
    df = spark.createDataFrame([(1, "a", 5), (2, "b", 50)], "id long, s string, v long")
    out = apply_stream_map(
        df, {"__filter__": "v > 10", "s": None, "v2": "v * 2"}
    )
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0].v2 == 100
    assert "s" not in out.columns


def test_stream_map_mask_then_drop(spark):
    """Regression: expressions see original columns even when those
    columns are dropped by the same map (mask-then-drop)."""
    df = spark.createDataFrame([(1, "123456789")], "id long, ssn string")
    out = apply_stream_map(
        df, {"ssn": None, "ssn_masked": "concat(substr(ssn, 1, 3), '***')"}
    )
    row = out.collect()[0]
    assert row.ssn_masked == "123***"
    assert "ssn" not in out.columns


def test_stream_map_filter_on_mapped_column(spark):
    df = spark.createDataFrame([(1,), (5,)], "v long")
    out = apply_stream_map(df, {"v2": "v * 10", "__filter__": "v2 > 20"})
    assert [r.v2 for r in out.collect()] == [50]


def test_stream_map_null_sentinel_drops_property(spark):
    """singer-sdk property removal accepts the "__NULL__" string
    sentinel (config surfaces that can't express JSON null) exactly
    like a null value — and masked-then-dropped still sees the
    ORIGINAL column."""
    from target_hdfs_spark.transforms import apply_stream_map

    df = spark.createDataFrame(
        [(1, "123456789")], "id long, ssn string"
    )
    out = apply_stream_map(
        df, {"ssn": "__NULL__", "last4": "substr(ssn, 6, 4)"}
    )
    assert out.columns == ["id", "last4"]
    assert out.collect()[0]["last4"] == "6789"
