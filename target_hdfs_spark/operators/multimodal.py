"""Multimodal column handling (SURVEY.md §2B.2 L5): images / audio /
video modeled as opaque ``binary`` columns plus typed metadata structs,
with decode / feature-extraction / resize / frame-sampling implemented
as Arrow-batched ``mapInPandas`` stages.

The container has no image/audio codecs, so the actual byte decoding
is STUBBED: ``decode_image`` raises ``NotImplementedError`` for real
formats and supports the engine's deterministic test format ``FAKE1``
(a 12-byte header: magic ``FAKE`` + uint32 width + uint32 height,
little-endian, then payload). Everything around the stub — schemas,
batch iteration, partitioning behavior, output struct shape — is real
and tested (tests/test_multimodal.py).

Scale: binary payloads ride in the same parquet row groups; metadata
predicates (width/height/n_bytes) prune *before* any decode; the
decode stage is map-only over Arrow batches so it scales linearly with
executors; `spark.sql.files.maxPartitionBytes` governs batch memory.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from target_hdfs_spark.registry import query
from target_hdfs_spark.sources.readers import load_table

FAKE_MAGIC = b"FAKE"
_HEADER = struct.Struct("<4sII")

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_payload_bytes", T.LongType()),
        T.StructField("format", T.StringType()),
    ]
)


def encode_fake_image(width: int, height: int, payload: bytes) -> bytes:
    """Produce a deterministic FAKE1 image blob (test fixture format)."""
    return _HEADER.pack(FAKE_MAGIC, width, height) + payload


def decode_image_meta(blob: bytes) -> tuple[int, int, int, str]:
    """Parse image header -> (width, height, payload_bytes, format).

    Real codecs (JPEG/PNG/...) are not available in this environment;
    their branches are explicit stubs so the plumbing is honest about
    what it can decode.
    """
    if blob is None:
        return (0, 0, 0, "null")
    if blob[:4] == FAKE_MAGIC and len(blob) >= _HEADER.size:
        _, w, h = _HEADER.unpack(blob[: _HEADER.size])
        return (w, h, len(blob) - _HEADER.size, "fake1")
    if blob[:3] == b"\xff\xd8\xff" or blob[:8] == b"\x89PNG\r\n\x1a\n":
        raise NotImplementedError(
            "real image codecs are not installed in this environment; "
            "plug a decoder into decode_image_meta"
        )
    return (0, 0, len(blob), "unknown")


def with_image_meta(df: DataFrame, binary_col: str = "image") -> DataFrame:
    """Append a typed metadata struct parsed from a binary column.

    Arrow-batched mapInPandas: the Python boundary is crossed once per
    record batch, never per row.
    """
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("image_meta", IMAGE_META_SCHEMA)]
    )

    def decode_batches(batches):
        import pandas as pd

        for pdf in batches:
            metas = [decode_image_meta(b) for b in pdf[binary_col]]
            pdf = pdf.copy()
            pdf["image_meta"] = [
                {"width": w, "height": h, "n_payload_bytes": n, "format": f}
                for (w, h, n, f) in metas
            ]
            yield pdf

    return df.mapInPandas(decode_batches, out_schema)


def sample_frames(
    df: DataFrame, binary_col: str = "video", every_k: int = 16, frame_bytes: int = 4
) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: emit every k-th
    fixed-size frame of the payload as its own row (id, frame_idx,
    frame). The byte-slicing stands in for a codec's frame decode; the
    row-explosion shape and Arrow batching are the real thing."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def explode_frames(batches):
        import pandas as pd

        for pdf in batches:
            rows: list[tuple[int, int, bytes]] = []
            for doc_id, blob in zip(pdf["doc_id"], pdf[binary_col]):
                if blob is None:
                    continue
                n_frames = len(blob) // frame_bytes
                for idx in range(0, n_frames, every_k):
                    rows.append(
                        (doc_id, idx, bytes(blob[idx * frame_bytes : (idx + 1) * frame_bytes]))
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame"])

    return df.mapInPandas(explode_frames, out_schema)


# ---------------------------------------------------------------------------
# L5a: binary column metadata — fully oracle-checked
# ---------------------------------------------------------------------------


@query(
    "q60_binary_metadata",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS content_md5,
           substring(to_base64(encode(text)), 1, 24) AS b64_prefix
    FROM documents
    """,
    tags=("multimodal", "binary"),
)
def q60_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary metadata surface: byte length, content digest,
    base64 transport encoding — computed on a binary column derived
    from text (the container ships no real media, so the bytes are the
    UTF-8 payload; the operators are byte-level and format-agnostic).
    """
    docs = load_table(spark, sf_dir, "documents")
    blob = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        F.octet_length(blob).alias("n_bytes"),
        F.md5(blob).alias("content_md5"),
        F.substring(F.base64(blob), 1, 24).alias("b64_prefix"),
    )


# ---------------------------------------------------------------------------
# L5b: decode pipeline (mapInPandas plumbing; rows-only check)
# ---------------------------------------------------------------------------


@query(
    "q61_image_decode_pipeline",
    oracle=None,
    tags=("multimodal", "udf", "mapInPandas"),
)
def q61_image_decode_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal plumbing: synthesize FAKE1 image blobs
    from document bytes, decode metadata via Arrow-batched
    mapInPandas, filter on decoded width (predicate-after-decode), and
    aggregate. Rows-only check: binary synthesis keeps the pipeline
    self-contained, the decode semantics are engine-specific plumbing.
    """
    docs = load_table(spark, sf_dir, "documents")
    # Deterministic fake image blob per doc: single-byte width/height
    # (< 128 so the chr() byte is 1-byte UTF-8) + 3 zero bytes each =
    # little-endian uint32 header fields, then the text payload.
    imgs = docs.select(
        "doc_id",
        F.concat(
            F.lit(FAKE_MAGIC),
            F.encode(F.expr("chr(doc_id % 127 + 1)"), "UTF-8"),
            F.lit(bytes([0, 0, 0])),
            F.encode(F.expr("chr(doc_id % 97 + 1)"), "UTF-8"),
            F.lit(bytes([0, 0, 0])),
            F.encode("text", "UTF-8"),
        ).alias("image"),
    )
    meta = with_image_meta(imgs, "image")
    return (
        meta.select("doc_id", "image_meta.*")
        .filter(F.col("width") > 0)
        .groupBy("format")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.sum("n_payload_bytes").alias("total_payload_bytes"),
            F.max("width").alias("max_width"),
            F.max("height").alias("max_height"),
        )
    )


# ---------------------------------------------------------------------------
# L5c: frame-sampling pipeline (mapInPandas row explosion; rows-only)
# ---------------------------------------------------------------------------


@query(
    "q62_frame_sampling",
    oracle=None,
    tags=("multimodal", "video", "mapInPandas"),
)
def q62_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling over opaque binary payloads: every
    16th 4-byte "frame" of each document's byte stream becomes a row,
    then frames are aggregated per doc. The byte slicing stands in for
    a codec (none installed here); the Arrow-batched row-explosion
    plumbing is the real operator shape.

    Scale: mapInPandas explosion is linear and map-only; downstream
    aggregation combines map-side. Rows-only check (binary slicing
    is engine plumbing, not SQL semantics).
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("video")
    )
    frames = sample_frames(docs, "video", every_k=16, frame_bytes=4)
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.min("frame_idx").alias("first_frame"),
        F.max("frame_idx").alias("last_frame"),
    )


# ---------------------------------------------------------------------------
# L5d: audio feature extraction (windowed byte statistics; rows-only)
# ---------------------------------------------------------------------------


def extract_audio_features(
    df: DataFrame, binary_col: str = "audio", window_bytes: int = 256
) -> DataFrame:
    """Audio-style feature extraction over opaque payloads: fixed-width
    windows -> per-window (mean, peak) "amplitude" statistics. A real
    deployment decodes PCM frames first (codec not installed here —
    same honest-stub posture as decode_image_meta); the windowing,
    Arrow batching and (id, window_idx, features) output shape are the
    production plumbing.
    """
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("window_idx", T.IntegerType()),
            T.StructField("mean_amplitude", T.DoubleType()),
            T.StructField("peak_amplitude", T.IntegerType()),
        ]
    )

    def feature_batches(batches):
        import pandas as pd

        for pdf in batches:
            rows: list[tuple[int, int, float, int]] = []
            for doc_id, blob in zip(pdf["doc_id"], pdf[binary_col]):
                if blob is None:
                    continue
                b = bytes(blob)
                for idx in range(0, len(b) // window_bytes):
                    win = b[idx * window_bytes : (idx + 1) * window_bytes]
                    rows.append((doc_id, idx, sum(win) / len(win), max(win)))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "window_idx", "mean_amplitude", "peak_amplitude"],
            )

    return df.mapInPandas(feature_batches, out_schema)


@query(
    "q64_audio_features",
    oracle=None,
    tags=("multimodal", "audio", "mapInPandas"),
)
def q64_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-feature pipeline over binary payloads: windowed amplitude
    stats via Arrow-batched mapInPandas, aggregated per doc. Completes
    the image (q61) / video (q62) / audio multimodal trio. Rows-only.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("audio")
    )
    feats = extract_audio_features(docs, "audio", window_bytes=64)
    return feats.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.min("mean_amplitude").alias("min_mean_amp"),
        F.max("peak_amplitude").alias("max_peak_amp"),
    )
