"""JSON Schema -> Spark StructType conversion.

The reference inherits this from target-parquet's pyarrow-schema
builder (reference: target_hdfs/sinks.py:35 passes `pyarrow_schema`;
pin pyproject.toml:18); the mapping below is the engine's own,
explicit contract (SURVEY.md §1.3):

| JSON Schema                    | Spark type                         |
|--------------------------------|------------------------------------|
| integer                        | LongType                           |
| number                         | DoubleType                         |
| boolean                        | BooleanType                        |
| string                         | StringType                         |
| string format=date-time        | TimestampType                      |
| string format=date             | DateType                           |
| object (typed properties)      | StructType (flattened downstream)  |
| object (no properties)         | StringType (serialized JSON)       |
| array of T                     | ArrayType(T)                       |
| array (untyped items)          | ArrayType(StringType)              |
| ["null", T] / anyOf unions     | nullable T                         |
| multi-type unions (T1, T2...)  | StringType (lossless fallback)     |
| missing/unknown type           | StringType                         |

Every field is nullable (Singer taps routinely omit fields), matching
the permissive behavior of the inherited stack.
"""

from __future__ import annotations

from pyspark.sql import types as T


def jsonschema_to_spark(schema: dict) -> T.StructType:
    """Convert a Singer SCHEMA message's JSON Schema to a StructType."""
    props = schema.get("properties") or {}
    return T.StructType(
        [T.StructField(name, _convert(prop), nullable=True) for name, prop in props.items()]
    )


def _merged_view(prop: dict) -> dict:
    """Effective property dict: format/properties/items may live inside
    anyOf/oneOf branches (the nullable-union idiom legacy taps emit —
    {"anyOf": [{"type": "string", "format": "date-time"},
    {"type": "null"}]}); reading them only from the top level would
    silently degrade timestamps to strings and typed objects to
    serialized JSON. First branch that declares a key wins."""
    merged = dict(prop)
    for alt in list(prop.get("anyOf") or []) + list(prop.get("oneOf") or []):
        if not isinstance(alt, dict):
            continue
        for k in ("format", "properties", "items"):
            if k not in merged and k in alt:
                merged[k] = alt[k]
    return merged


def _convert(raw_prop: dict) -> T.DataType:
    types = _type_set(raw_prop)
    prop = _merged_view(raw_prop)
    non_null = [t for t in types if t != "null"]
    if len(non_null) > 1:
        return T.StringType()
    jtype = non_null[0] if non_null else None

    if jtype == "integer":
        return T.LongType()
    if jtype == "number":
        return T.DoubleType()
    if jtype == "boolean":
        return T.BooleanType()
    if jtype == "string":
        fmt = prop.get("format", "")
        if fmt == "date-time":
            return T.TimestampType()
        if fmt == "date":
            return T.DateType()
        if fmt == "time":
            return T.StringType()
        return T.StringType()
    if jtype == "object":
        inner = prop.get("properties") or {}
        if not inner:
            return T.StringType()  # free-form object -> serialized JSON
        return T.StructType(
            [T.StructField(n, _convert(p), nullable=True) for n, p in inner.items()]
        )
    if jtype == "array":
        items = prop.get("items")
        if not isinstance(items, dict) or not _type_set(items) - {"null"}:
            return T.ArrayType(T.StringType())
        return T.ArrayType(_convert(items))
    return T.StringType()


def _type_set(prop: dict) -> set[str]:
    """Collect declared types across `type` (str or list), `anyOf`,
    and `oneOf` (taps use the two union keywords interchangeably)."""
    out: set[str] = set()
    t = prop.get("type")
    if isinstance(t, str):
        out.add(t)
    elif isinstance(t, list):
        out.update(x for x in t if isinstance(x, str))
    for key in ("anyOf", "oneOf"):
        for alt in prop.get(key, []) or []:
            if isinstance(alt, dict):
                out.update(_type_set(alt))
    return out
