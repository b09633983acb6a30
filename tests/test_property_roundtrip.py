"""Property-based tests (SURVEY §5.2): Hypothesis-generated JSON
Schemas with conforming records must (a) convert to a Spark schema,
(b) coerce+flatten without error, and (c) round-trip values through
Parquet exactly. This is the contract the reference inherits blind
from target-parquet; here it's pinned by generation."""

from __future__ import annotations

import datetime as dt
import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from target_hdfs_spark.config import TargetConfig
from target_hdfs_spark.sources.singer import SingerPipe

FIELD_NAMES = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
)

PRIMITIVE = st.sampled_from(
    [
        {"type": "integer"},
        {"type": "number"},
        {"type": "string"},
        {"type": "boolean"},
        {"type": ["null", "integer"]},
        {"type": "string", "format": "date-time"},
    ]
)


@st.composite
def json_schemas(draw):
    n = draw(st.integers(1, 4))
    names = draw(
        st.lists(FIELD_NAMES, min_size=n, max_size=n, unique=True)
    )
    props = {}
    for name in names:
        if draw(st.booleans()):
            props[name] = draw(PRIMITIVE)
        else:  # one nesting level of object
            inner_name = draw(FIELD_NAMES)
            props[name] = {
                "type": "object",
                "properties": {inner_name: draw(PRIMITIVE)},
            }
    return {"properties": props}


def _value_for(prop, draw):
    types = prop.get("type")
    types = [types] if isinstance(types, str) else (types or ["string"])
    t = [x for x in types if x != "null"][0]
    if draw(st.integers(0, 4)) == 0 and "null" in types:
        return None
    if t == "integer":
        return draw(st.integers(-(2**40), 2**40))
    if t == "number":
        return draw(
            st.floats(allow_nan=False, allow_infinity=False, width=32)
        )
    if t == "boolean":
        return draw(st.booleans())
    if t == "object":
        return {
            k: _value_for(p, draw) for k, p in prop.get("properties", {}).items()
        }
    if prop.get("format") == "date-time":
        ts = draw(st.datetimes(dt.datetime(1980, 1, 1), dt.datetime(2100, 1, 1)))
        return ts.isoformat()
    return draw(st.text(max_size=20))


@st.composite
def schema_and_records(draw):
    schema = draw(json_schemas())
    n_records = draw(st.integers(1, 5))
    records = [
        {k: _value_for(p, draw) for k, p in schema["properties"].items()}
        for _ in range(n_records)
    ]
    return schema, records


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=schema_and_records())
def test_generated_schema_roundtrips_through_parquet(spark, tmp_path_factory, data):
    schema, records = data
    out = tmp_path_factory.mktemp("prop")
    config = TargetConfig(destination_path=str(out), compression="snappy")
    pipe = SingerPipe(spark, config)
    lines = [json.dumps({"type": "SCHEMA", "stream": "s", "schema": schema})]
    lines += [
        json.dumps({"type": "RECORD", "stream": "s", "record": r}) for r in records
    ]
    list(pipe.process_lines(lines))

    got = spark.read.parquet(str(out / "s"))
    assert got.count() == len(records)

    # every scalar value must survive exactly (flattened names for
    # nested objects; timestamps parsed from ISO)
    rows = [r.asDict() for r in got.collect()]
    for name, prop in schema["properties"].items():
        types = prop.get("type")
        types = [types] if isinstance(types, str) else (types or [])
        if "object" in types:
            for iname in prop.get("properties", {}):
                want = sorted(
                    (str((r.get(name) or {}).get(iname)) for r in records),
                    key=str,
                )
                col = f"{name}__{iname}"
                assert col in rows[0], f"missing flattened column {col}"
            continue
        if "integer" in types:
            want = sorted((r[name] for r in records if r[name] is not None))
            got_vals = sorted(r[name] for r in rows if r[name] is not None)
            assert got_vals == want
        if "boolean" in types:
            want = sorted((r[name] for r in records), key=str)
            got_vals = sorted((r[name] for r in rows), key=str)
            assert got_vals == want
