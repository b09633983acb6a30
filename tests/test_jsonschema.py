from pyspark.sql import types as T

from target_hdfs_spark.sources.jsonschema import jsonschema_to_spark


def test_primitives():
    schema = jsonschema_to_spark(
        {
            "properties": {
                "i": {"type": "integer"},
                "n": {"type": "number"},
                "s": {"type": "string"},
                "b": {"type": "boolean"},
            }
        }
    )
    assert schema["i"].dataType == T.LongType()
    assert schema["n"].dataType == T.DoubleType()
    assert schema["s"].dataType == T.StringType()
    assert schema["b"].dataType == T.BooleanType()


def test_string_formats():
    schema = jsonschema_to_spark(
        {
            "properties": {
                "ts": {"type": "string", "format": "date-time"},
                "d": {"type": "string", "format": "date"},
                "t": {"type": "string", "format": "time"},
            }
        }
    )
    assert schema["ts"].dataType == T.TimestampType()
    assert schema["d"].dataType == T.DateType()
    assert schema["t"].dataType == T.StringType()


def test_null_union_and_anyof():
    schema = jsonschema_to_spark(
        {
            "properties": {
                "a": {"type": ["null", "integer"]},
                "b": {"anyOf": [{"type": "string"}, {"type": "null"}]},
                "multi": {"type": ["integer", "string"]},
            }
        }
    )
    assert schema["a"].dataType == T.LongType()
    assert schema["b"].dataType == T.StringType()
    # irreconcilable unions fall back to string (lossless)
    assert schema["multi"].dataType == T.StringType()


def test_nested_object_and_arrays():
    schema = jsonschema_to_spark(
        {
            "properties": {
                "obj": {
                    "type": "object",
                    "properties": {"x": {"type": "integer"}},
                },
                "free": {"type": "object"},
                "arr": {"type": "array", "items": {"type": "number"}},
                "arr_untyped": {"type": "array"},
            }
        }
    )
    assert schema["obj"].dataType == T.StructType(
        [T.StructField("x", T.LongType(), True)]
    )
    assert schema["free"].dataType == T.StringType()
    assert schema["arr"].dataType == T.ArrayType(T.DoubleType())
    assert schema["arr_untyped"].dataType == T.ArrayType(T.StringType())


def test_missing_type_falls_back_to_string():
    schema = jsonschema_to_spark({"properties": {"x": {}}})
    assert schema["x"].dataType == T.StringType()
