"""Ingest configuration — the engine's equivalent of the reference
target's config schema (reference: target_hdfs/target.py:19-46), with
one validation code path applied eagerly at construction (the
reference's `config_json_schema` override is spelled differently from
the SDK hook it shadows — target.py:19 vs the `config_jsonschema`
convention — so its `required=True` plausibly never fires; we validate
for real).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_SIZE_RE = re.compile(r"^\s*(\d+)\s*([KkMmGg]?)[Bb]?\s*$")
_UNIT = {"": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30}

VALID_COMPRESSION = ("gzip", "snappy", "zstd", "brotli", "none")
VALID_TABLE_FORMATS = ("parquet", "orc", "delta", "iceberg")

# ORC spells its codecs differently from parquet; the writer maps the
# config's parquet-style name to the ORC equivalent ("gzip" -> zlib,
# "brotli" has no ORC analog and falls back to zlib).
ORC_COMPRESSION = {
    "gzip": "zlib",
    "snappy": "snappy",
    "zstd": "zstd",
    "brotli": "zlib",
    "none": "none",
}
VALID_SCHEMA_EVOLUTION = ("strict", "additive")
VALID_ON_INVALID = ("fail", "skip", "dlq")
# singer-sdk's string sentinel for stream/property removal, for
# config surfaces that cannot express a JSON null (e.g. env vars)
STREAM_MAP_NULL = "__NULL__"


def convert_size_to_bytes(size: str | int) -> int:
    """Parse "200M"-style size strings to bytes (K/M/G, case-insensitive,
    optional trailing B). Plain integers / unit-less digit strings are
    accepted as bytes — the reference's parser declares the unit
    optional in its regex but then raises ValueError("Invalid unit")
    on the unit-less branch (reference: target_hdfs/utils/__init__.py:6
    vs :19-20), so `"800"` crashes it; that bug is fixed here.
    """
    if isinstance(size, int):
        if size < 0:
            raise ValueError(f"negative size: {size}")
        return size
    m = _SIZE_RE.match(str(size))
    if not m:
        raise ValueError(f"invalid size string: {size!r}")
    value, unit = m.groups()
    return int(value) * _UNIT[unit.lower()]


@dataclass
class TargetConfig:
    """Engine ingest configuration.

    Reference surface (target_hdfs/target.py:25-45, README.md:33-42):
    hdfs_destination_path (required), hdfs_block_size_limit,
    skip_existing_files; inherited surface (pyproject pins):
    compression_method, partition_cols, extra_fields(+types),
    max_batch_size, add_record_metadata, stream_maps, flattening.
    """

    destination_path: str
    block_size_limit: int | str | None = None
    skip_existing_files: bool = False
    compression: str = "gzip"
    partition_cols: tuple[str, ...] = ()
    extra_fields: dict[str, str] = field(default_factory=dict)
    extra_fields_types: dict[str, str] = field(default_factory=dict)
    add_record_metadata: bool = False
    max_batch_size: int = 10_000
    flattening_max_depth: int | None = None
    stream_maps: dict[str, dict] = field(default_factory=dict)
    # Write-time file sizing (the Spark-native replacement for the
    # reference's append-to-recent-file compaction): target bytes per
    # output file; rows-per-file is derived from sampled row width.
    target_file_bytes: int | str | None = None
    # Table format for the sink: "parquet"/"orc" (native, always
    # available) or "delta"/"iceberg" (require their runtime jars +
    # session extensions; the writer fails with a clear capability
    # error if they are absent — see
    # plans/writer.py::require_table_format).
    table_format: str = "parquet"
    # Schema-drift policy: "strict" = the reference's behavior (any
    # name/type change fails, R27); "additive" = NEW columns are
    # accepted (old files read as null via mergeSchema) while type
    # changes and column drops still fail loudly.
    schema_evolution: str = "strict"
    # Invalid-record policy: "fail" = the reference's behavior (any
    # record that fails schema coercion aborts the run); "skip" =
    # drop invalid records, counting them; "dlq" = quarantine the
    # raw record + error into <destination_path>/_dlq/<stream> as
    # parquet, never blocking the healthy flow. RECORDs for
    # undeclared streams always fail — that is a tap protocol
    # violation, not a data-quality event.
    on_invalid: str = "fail"

    def __post_init__(self) -> None:
        if not self.destination_path:
            raise ValueError("destination_path is required")
        if self.table_format not in VALID_TABLE_FORMATS:
            raise ValueError(
                f"table_format must be one of {VALID_TABLE_FORMATS}, "
                f"got {self.table_format!r}"
            )
        if self.schema_evolution not in VALID_SCHEMA_EVOLUTION:
            raise ValueError(
                f"schema_evolution must be one of {VALID_SCHEMA_EVOLUTION}, "
                f"got {self.schema_evolution!r}"
            )
        if self.on_invalid not in VALID_ON_INVALID:
            raise ValueError(
                f"on_invalid must be one of {VALID_ON_INVALID}, "
                f"got {self.on_invalid!r}"
            )
        if self.compression not in VALID_COMPRESSION:
            raise ValueError(
                f"compression must be one of {VALID_COMPRESSION}, got {self.compression!r}"
            )
        if self.block_size_limit is not None:
            self.block_size_limit = convert_size_to_bytes(self.block_size_limit)
        if self.target_file_bytes is not None:
            self.target_file_bytes = convert_size_to_bytes(self.target_file_bytes)
        unknown_typed = set(self.extra_fields_types) - set(self.extra_fields)
        if unknown_typed:
            raise ValueError(f"extra_fields_types for unknown fields: {sorted(unknown_typed)}")
        # eager stream_maps shape validation (R2 discipline): each
        # value is a mapping (per-column map), null / "__NULL__"
        # (whole-stream removal), — anything else is a config error
        # surfaced at load, not an AttributeError mid-pipe
        for k, v in self.stream_maps.items():
            if v is None or v == STREAM_MAP_NULL or isinstance(v, dict):
                continue
            raise ValueError(
                f"stream_maps[{k!r}] must be a mapping, null, or "
                f"'{STREAM_MAP_NULL}' (stream removal); got {v!r}"
            )

    @classmethod
    def from_dict(cls, raw: dict) -> TargetConfig:
        """Build from a reference-style JSON config dict (key names as
        the reference spells them)."""
        extra_fields = _parse_kv(raw.get("extra_fields"))
        extra_types = _parse_kv(raw.get("extra_fields_types"))
        return cls(
            destination_path=raw.get("hdfs_destination_path", ""),
            block_size_limit=raw.get("hdfs_block_size_limit"),
            skip_existing_files=bool(raw.get("skip_existing_files", False)),
            compression=raw.get("compression_method", "gzip"),
            partition_cols=(
                tuple(str(c) for c in raw["partition_cols"])
                if isinstance(raw.get("partition_cols"), (list, tuple))
                else tuple(
                    c.strip()
                    for c in str(raw.get("partition_cols", "") or "").split(",")
                    if c.strip()
                )
            ),
            extra_fields=extra_fields,
            extra_fields_types=extra_types,
            add_record_metadata=bool(raw.get("add_record_metadata", False)),
            max_batch_size=int(raw.get("max_batch_size", 10_000)),
            flattening_max_depth=raw.get("flattening_max_depth"),
            stream_maps=raw.get("stream_maps", {}) or {},
            target_file_bytes=raw.get("target_file_bytes"),
            table_format=str(raw.get("table_format", "parquet")),
            schema_evolution=str(raw.get("schema_evolution", "strict")),
            on_invalid=str(raw.get("on_invalid_record", "fail")),
        )

    def stream_is_dropped(self, stream_name: str) -> bool:
        """singer-sdk stream-level removal: `stream_maps: {orders:
        null}` (or the string sentinel "__NULL__") suppresses the
        orders sink entirely — records are counted and dropped, no
        directory is ever created, STATE still advances. The
        `__else__: null` catch-all drops every stream NOT explicitly
        named in stream_maps (the Meltano "only these streams"
        idiom)."""
        if stream_name in self.stream_maps:
            v = self.stream_maps[stream_name]
            return v is None or v == STREAM_MAP_NULL
        if "__else__" in self.stream_maps:
            v = self.stream_maps["__else__"]
            return v is None or v == STREAM_MAP_NULL
        return False

    def sink_stream_name(self, stream_name: str) -> str:
        """Resolve the stream's SINK name through the stream map's
        `__alias__` key (singer-sdk stream-map aliasing — a Meltano
        `stream_maps: {orders: {__alias__: orders_v2}}` routes orders
        records to root/orders_v2). State/buffering stay keyed by the
        ORIGINAL stream id; only the write path is renamed. Null maps
        (stream removal) have no sink name — callers gate on
        stream_is_dropped first."""
        smap = self.stream_maps.get(stream_name)
        if not isinstance(smap, dict):
            return stream_name
        alias = smap.get("__alias__")
        return str(alias) if alias else stream_name

    def stream_path(self, stream_name: str) -> str:
        """Per-stream directory (reference: target_hdfs/sinks.py:27-29),
        routed through `__alias__` when the stream map renames the sink."""
        return (
            f"{self.destination_path.rstrip('/')}/"
            f"{self.sink_stream_name(stream_name)}"
        )


def _parse_kv(raw: str | dict | None) -> dict[str, str]:
    """Parse the reference's "k1=v1,k2=v2" config strings (README.md:40-41)."""
    if raw is None:
        return {}
    if isinstance(raw, dict):
        return {str(k): str(v) for k, v in raw.items()}
    out: dict[str, str] = {}
    for pair in str(raw).split(","):
        if not pair.strip():
            continue
        if "=" not in pair:
            raise ValueError(f"invalid key=value pair: {pair!r}")
        k, v = pair.split("=", 1)
        out[k.strip()] = v.strip()
    return out


# ---------------------------------------------------------------------------
# --config=ENV support (reference README.md:44-48: "automatically
# import any environment variables within the working directory's
# `.env` if the `--config=ENV` is provided"; terminal-context variables
# take precedence over the .env file, matching the Singer SDK)
# ---------------------------------------------------------------------------

ENV_PREFIXES = ("TARGET_HDFS_SPARK_", "TARGET_HDFS_")


def parse_dotenv(path: str) -> dict[str, str]:
    """Minimal .env parser: KEY=VALUE lines, optional `export ` prefix,
    blank/# lines skipped, surrounding single/double quotes stripped."""
    import os

    out: dict[str, str] = {}
    if not os.path.isfile(path):
        return out
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            if line.startswith("export "):
                line = line[len("export "):]
            k, v = line.split("=", 1)
            v = v.strip()
            if len(v) >= 2 and v[0] == v[-1] and v[0] in ("'", '"'):
                v = v[1:-1]
            out[k.strip()] = v
    return out


# settings whose env value should be JSON-decoded into its type
# (booleans, ints, dicts, lists). String-typed settings are
# deliberately NOT decoded: a destination path like "2024" must stay
# the string "2024", not become an int.
_TYPED_ENV_SETTINGS = frozenset(
    {
        "skip_existing_files",
        "add_record_metadata",
        "max_batch_size",
        "flattening_max_depth",
        "target_file_bytes",
        "hdfs_block_size_limit",
        "stream_maps",
        "extra_fields",
        "extra_fields_types",
        "partition_cols",
    }
)


def _coerce_env_value(setting: str, raw: str):
    """Env values are strings; typed settings JSON-decode when the
    text is valid JSON (true/false/ints/dicts/lists), else keep the
    raw string (so 'k1=v1,k2=v2' and '100M' pass through verbatim)."""
    import json as _json

    if setting not in _TYPED_ENV_SETTINGS:
        return raw
    try:
        return _json.loads(raw)
    except ValueError:
        return raw


def _settings_from(variables: dict) -> dict:
    """Resolve one source's variables to settings. Generic prefix
    first, specific prefix second: later assignment wins, so
    TARGET_HDFS_SPARK_X deterministically beats TARGET_HDFS_X *within
    the source*."""
    raw: dict = {}
    for prefix in sorted(ENV_PREFIXES, key=len):
        for key, value in variables.items():
            if not key.startswith(prefix):
                continue
            setting = key[len(prefix):].lower()
            # a TARGET_HDFS_SPARK_ key also matches the generic prefix
            # as "spark_<x>" — skip that bogus alias
            if prefix == "TARGET_HDFS_" and setting.startswith("spark_"):
                continue
            raw[setting] = _coerce_env_value(setting, value)
    return raw


def config_from_env(dotenv_path: str = ".env") -> TargetConfig:
    """Build a TargetConfig from `TARGET_HDFS_SPARK_<SETTING>` (or the
    reference-compatible `TARGET_HDFS_<SETTING>`) environment
    variables, merged over the working directory's `.env` file.

    Precedence is resolved per SETTING, prefix-within-source first,
    then terminal over `.env` — so a terminal `TARGET_HDFS_X` beats a
    `.env` `TARGET_HDFS_SPARK_X` for the same setting (the documented
    "terminal-context variables beat the .env file" rule holds even
    when prefixes cross sources), while within one source the
    package-specific `TARGET_HDFS_SPARK_` prefix wins."""
    import os

    raw = _settings_from(parse_dotenv(dotenv_path))
    raw.update(_settings_from(dict(os.environ)))
    return TargetConfig.from_dict(raw)
