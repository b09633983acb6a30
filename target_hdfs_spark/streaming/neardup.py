"""Streaming near-duplicate suppression with arbitrary keyed state
(SURVEY §2B.3 × §2B.2 L2): the bucket-root dedup rule
(operators/dedup.py::bucket_root_dedup) run over an arriving document
stream via ``applyInPandasWithState``.

Shape: JVM computes the shingle->md5 hash array once per document
(the expensive part stays in codegen); a stateless ``mapInPandas``
stage folds the universal-hash minima into the 16-component minhash
signature and the single-band bucket key; then
``groupBy(bucket).applyInPandasWithState`` holds ONE state row per
bucket — the root representative's (doc_id, signature) — and each
arriving document is emitted iff it is the bucket's first arrival
(the root) or its estimated similarity to the root is below the
threshold.

Why root-only state: the state store shards by key, so per-bucket
state must be bounded for the operator to survive 100 TB/day — one
signature per bucket is O(buckets), not O(documents), and it is
exactly the rule whose batch twin (q118) is oracle-checked, giving
the streaming operator a hard equivalence target (proven on ordered
arrivals in tests/test_streaming_neardup.py, including
checkpoint-kill-resume).

Multi-band recall (a doc is near-dup if ANY band collides) needs a
doc to own rows under several keys at once; a state-store operator
gets one key per row, so the multi-band operator below
(``streaming_multiband_verdicts`` + ``write_multiband_dedup``)
restates the rule as BANDS verdict rows per document — the stateful
stage holds one root per (band, bucket) and the conjunction over a
doc's bands is a STATELESS per-micro-batch aggregation (all of a
doc's verdicts are emitted by the batch that carried it). Batch twin:
operators/dedup.py::multiband_root_dedup (q127, oracle-checked).

State lifetime: O(buckets) is the right per-key bound, but a
year-long stream still accretes bucket roots monotonically under
``NoTimeout``. Pass ``state_ttl_ms`` (with a ``ts_col`` event-time
column) to arm an EVENT-TIME timeout per bucket: when the watermark
passes the bucket's last arrival + TTL, the root is evicted from the
state store, and the NEXT document hashing into that bucket re-elects
itself root (exactly the cold-start rule, applied per-bucket). The
trade-off is documented and standard: a duplicate arriving more than
one TTL of event time after its bucket's last activity is re-admitted
— dedup becomes exact-within-horizon, which is what keeps state
bounded on an unbounded stream. ``None`` (default) preserves the
unbounded exact behavior for finite replays/backfills.

Why event-time and not processing-time TTL: the watermark clock is
data-driven, so eviction is DETERMINISTIC under checkpoint replay (a
replayed batch sees the same watermark, evicts the same roots — the
at-least-once story stays exact), and measured on Spark 4.1.2,
``ProcessingTimeTimeout`` + ``Trigger.AvailableNow`` never
terminates: the wall-clock timers keep scheduling no-data
micro-batches (observed 58+ empty batches for a single input file),
which is fatal for the backfill/batch-drain pattern this operator
must serve.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from target_hdfs_spark.functions.hashing import MERSENNE_P, hash_coeffs, md5_hash32
from target_hdfs_spark.functions.textfuncs import shingles, tokens
from target_hdfs_spark.operators.dedup import (
    NUM_HASHES,
    ROWS_PER_BAND,
    SINGLE_BAND_SIM,
)

_COEFFS = hash_coeffs(NUM_HASHES)

SIG_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("bucket", T.StringType()),
        T.StructField("sig", T.ArrayType(T.LongType())),
    ]
)

# TTL mode carries the event-time column through the signature stage
SIG_SCHEMA_TS = T.StructType(
    [*SIG_SCHEMA.fields, T.StructField("ts", T.TimestampType())]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("root_id", T.LongType()),
        T.StructField("est_sim", T.DoubleType()),
    ]
)

# one root representative per bucket: its id + comma-joined signature
# + the bucket's latest-seen event time (ms) — carried so TTL re-arm
# is monotone under out-of-order (watermark-admitted) batches
STATE_SCHEMA = T.StructType(
    [
        T.StructField("root_id", T.LongType()),
        T.StructField("root_sig", T.StringType()),
        T.StructField("last_ms", T.LongType()),
    ]
)


def _signature(hash_list) -> list[int]:
    """16 universal-hash minima over the shingle-hash array — the same
    (a*h + b) % p arithmetic the JVM/oracle use; Python ints are exact
    so the components agree bit-for-bit with q118's."""
    hs = list(hash_list)
    if not hs:
        return [0] * NUM_HASHES
    return [min((a * h + b) % MERSENNE_P for h in hs) for (a, b) in _COEFFS]


def _sig_batches(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
    for pdf in batches:
        sigs = [_signature(hs) for hs in pdf["hs"]]
        out = {
            "doc_id": pdf["doc_id"].astype("int64"),
            "bucket": [
                "_".join(str(c) for c in s[:ROWS_PER_BAND]) for s in sigs
            ],
            "sig": sigs,
        }
        if "ts" in pdf.columns:  # TTL mode: event time rides along
            out["ts"] = pdf["ts"]
        yield pd.DataFrame(out)


def _dedup_group(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    threshold: float,
    ttl_ms: int | None = None,
) -> Iterable[pd.DataFrame]:
    if state.hasTimedOut:
        # watermark passed last-activity + TTL with no arrivals: evict
        # the bucket root. The next document in this bucket re-elects
        # itself root (cold-start rule).
        state.remove()
        yield pd.DataFrame({"doc_id": [], "root_id": [], "est_sim": []}).astype(
            {"doc_id": "int64", "root_id": "int64", "est_sim": "float64"}
        )
        return
    if state.exists:
        root_id, root_sig_s, prev_last = state.get
        root_sig = [int(c) for c in root_sig_s.split(",")]
    else:
        root_id, root_sig, prev_last = None, None, 0
    out: list[tuple[int, int, float]] = []
    whole = pd.concat(list(pdfs), ignore_index=True)
    # deterministic arrival order within the micro-batch: doc_id —
    # matching the batch twin's min-doc_id root election when ids
    # arrive in order
    whole = whole.sort_values("doc_id")
    for doc_id, sig in zip(whole["doc_id"], whole["sig"]):
        sig = list(sig)
        if root_id is None:
            root_id, root_sig = int(doc_id), sig
            out.append((int(doc_id), root_id, 1.0))
            continue
        est = sum(a == b for a, b in zip(sig, root_sig)) / NUM_HASHES
        if est < threshold:
            out.append((int(doc_id), root_id, est))
    last_ms = prev_last
    if ttl_ms is not None:
        # monotone re-arm: the bucket expires when the WATERMARK
        # passes its latest-EVER event time + TTL. max() with the
        # carried last_ms matters because a later micro-batch may
        # consist entirely of out-of-order (watermark-admitted) rows —
        # arming from the batch max alone would REWIND the timer and
        # evict earlier than the documented horizon.
        last_ms = max(prev_last, int(whole["ts"].max().value // 1_000_000))
        state.setTimeoutTimestamp(last_ms + ttl_ms)
    if root_id is not None:
        state.update(
            (root_id, ",".join(str(c) for c in root_sig), last_ms)
        )
    yield pd.DataFrame(out, columns=["doc_id", "root_id", "est_sim"])


def streaming_bucket_root_dedup(
    docs: DataFrame,
    threshold: float = SINGLE_BAND_SIM,
    state_ttl_ms: int | None = None,
    ts_col: str = "ts",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Streaming twin of q118: `docs` is a streaming DataFrame with
    (doc_id, text); returns the accepted documents as
    (doc_id, root_id, est_sim) with per-bucket root state persisted
    in the state store across micro-batches and restarts.

    ``state_ttl_ms`` bounds the state store on unbounded streams: a
    bucket root is evicted once the watermark (over ``ts_col``, with
    ``watermark_delay`` lateness allowance) passes the bucket's last
    event time + TTL, and re-elected on the bucket's next arrival.
    ``None`` keeps exact unbounded behavior (finite replays / the
    q118-parity tests) and requires no event-time column."""
    cols = ["doc_id"] if state_ttl_ms is None else ["doc_id", F.col(ts_col).alias("ts")]
    hashed = docs.select(
        *cols,
        F.transform(shingles(tokens("text")), md5_hash32).alias("hs"),
    ).filter(F.size("hs") > 0)  # batch twin drops shingle-less docs (explode)

    def fn(key, pdfs, state):
        return _dedup_group(key, pdfs, state, threshold, state_ttl_ms)

    if state_ttl_ms is None:
        with_sig = hashed.mapInPandas(_sig_batches, SIG_SCHEMA)
        timeout = GroupStateTimeout.NoTimeout
    else:
        with_sig = hashed.mapInPandas(_sig_batches, SIG_SCHEMA_TS).withWatermark(
            "ts", watermark_delay
        )
        timeout = GroupStateTimeout.EventTimeTimeout
    return with_sig.groupBy("bucket").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


# ---------------------------------------------------------------------------
# Multi-band streaming near-dup (full LSH-banding recall): per-band
# verdict stream + a stateless foreachBatch conjunction
# ---------------------------------------------------------------------------

VERDICT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("root_id", T.LongType()),
        T.StructField("est", T.DoubleType()),
        T.StructField("collided", T.BooleanType()),
    ]
)


def _multiband_sig_batches(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
    """BANDS rows per document: state key = 'band_idx|band_key' (the
    band index is part of the key so band-0 and band-2 buckets with
    equal component strings never share state)."""
    from target_hdfs_spark.operators.dedup import BANDS

    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "bucket": [], "sig": []}
        for doc_id, hs in zip(pdf["doc_id"], pdf["hs"]):
            sig = _signature(hs)
            for b in range(BANDS):
                key = "_".join(
                    str(c)
                    for c in sig[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]
                )
                out["doc_id"].append(int(doc_id))
                out["bucket"].append(f"{b}|{key}")
                out["sig"].append(sig)
        yield pd.DataFrame(
            {
                "doc_id": pd.array(out["doc_id"], dtype="int64"),
                "bucket": out["bucket"],
                "sig": out["sig"],
            }
        )


def _verdict_group(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Like _dedup_group, but emits a verdict row for EVERY arrival
    (the multi-band rule needs all band verdicts to take the
    conjunction downstream); the bucket root still updates on first
    arrival only, so state stays one signature per bucket."""
    if state.exists:
        root_id, root_sig_s, _last = state.get
        root_sig = [int(c) for c in root_sig_s.split(",")]
    else:
        root_id, root_sig = None, None
    out: list[tuple[int, int, float, bool]] = []
    whole = pd.concat(list(pdfs), ignore_index=True)
    whole = whole.sort_values("doc_id")
    for doc_id, sig in zip(whole["doc_id"], whole["sig"]):
        sig = list(sig)
        if root_id is None:
            root_id, root_sig = int(doc_id), sig
            state.update((root_id, ",".join(str(c) for c in root_sig), 0))
            out.append((int(doc_id), root_id, 1.0, False))
            continue
        est = sum(a == b for a, b in zip(sig, root_sig)) / NUM_HASHES
        out.append(
            (int(doc_id), root_id, est, bool(int(doc_id) != root_id and est >= SINGLE_BAND_SIM))
        )
    yield pd.DataFrame(out, columns=["doc_id", "root_id", "est", "collided"])


def streaming_multiband_verdicts(docs: DataFrame) -> DataFrame:
    """Per-band verdict stream of the multi-band root-dedup rule
    (batch twin: operators/dedup.py::multiband_root_dedup, q127):
    every document emits BANDS rows (one per LSH band), each saying
    whether that band's bucket root considers it a collision. State is
    one signature per (band, bucket) — O(BANDS x buckets)."""
    hashed = docs.select(
        "doc_id",
        F.transform(shingles(tokens("text")), md5_hash32).alias("hs"),
    ).filter(F.size("hs") > 0)
    with_sig = hashed.mapInPandas(_multiband_sig_batches, SIG_SCHEMA)
    return with_sig.groupBy("bucket").applyInPandasWithState(
        _verdict_group,
        outputStructType=VERDICT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithState implementation (Spark 4's arbitrary-stateful API)
# ---------------------------------------------------------------------------


class TransformWithStateUnavailableError(RuntimeError):
    """transformWithStateInPandas needs the ``protobuf`` Python
    package (its state-server protocol is protobuf-framed;
    pyspark/sql/streaming/proto imports google.protobuf at query
    start). Raised eagerly so a missing dependency fails at operator
    construction with remediation, not mid-stream with a crashed
    driver worker."""


def require_transform_with_state() -> None:
    """Capability probe for Spark 4's transformWithState API (same
    tested fail-fast pattern as plans/writer.require_table_format for
    Delta/Iceberg). The API additionally requires the RocksDB state
    store provider — Spark itself enforces that at query start."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError as exc:
        raise TransformWithStateUnavailableError(
            "transformWithStateInPandas requires the 'protobuf' Python "
            "package, which is not installed in this environment. "
            "Remediation: pip install protobuf>=4, set "
            "spark.sql.streaming.stateStore.providerClass="
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider, and re-run. The "
            "applyInPandasWithState implementation above "
            "(streaming_bucket_root_dedup) provides the same rule, "
            "parity-tested, with no extra dependency."
        ) from exc


def transform_with_state_bucket_root_dedup(
    docs: DataFrame,
    threshold: float = SINGLE_BAND_SIM,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """The bucket-root dedup rule on Spark 4's
    ``transformWithStateInPandas`` — the successor API to
    ``applyInPandasWithState`` (same rule, same output schema, same
    batch twin q118; parity pinned in tests/test_streaming_neardup.py).
    Differences that matter at scale:

    - typed state handles (``getValueState``) instead of one opaque
      tuple: the root representative lives in a named ValueState whose
      schema the store knows, enabling per-state-variable metrics and
      schema evolution;
    - NATIVE per-state TTL (``ttlDurationMs``): the store itself
      expires idle roots — no timer bookkeeping in operator code
      (the applyInPandasWithState path implements the same bound
      manually with event-time timers);
    - requires the RocksDB state-store provider (Spark enforces this)
      — which is the provider the 100 TB deployment would run anyway,
      since bucket-root state must spill past executor heap.

    Re-election on expiry is identical: the next arrival in an expired
    bucket finds no state and elects itself root.

    Offline-container caveat: the API's state-server protocol needs
    the ``protobuf`` package; :func:`require_transform_with_state`
    fail-fasts with remediation when it is absent (the tested seam —
    tests/test_streaming_neardup.py runs full batch-twin parity when
    the dependency is available and pins the typed error when not).
    """
    require_transform_with_state()
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    hashed = docs.select(
        "doc_id",
        F.transform(shingles(tokens("text")), md5_hash32).alias("hs"),
    ).filter(F.size("hs") > 0)
    with_sig = hashed.mapInPandas(_sig_batches, SIG_SCHEMA)

    class RootDedup(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._root = handle.getValueState(
                "root", STATE_SCHEMA, ttlDurationMs=state_ttl_ms
            )

        def handleInputRows(self, key, rows, timer_values):
            if self._root.exists():
                root_id, root_sig_s, _last = self._root.get()
                root_sig = [int(c) for c in root_sig_s.split(",")]
            else:
                root_id, root_sig = None, None
            out: list[tuple[int, int, float]] = []
            whole = pd.concat(list(rows), ignore_index=True)
            whole = whole.sort_values("doc_id")
            for doc_id, sig in zip(whole["doc_id"], whole["sig"]):
                sig = list(sig)
                if root_id is None:
                    root_id, root_sig = int(doc_id), sig
                    self._root.update(
                        (root_id, ",".join(str(c) for c in root_sig), 0)
                    )
                    out.append((int(doc_id), root_id, 1.0))
                    continue
                est = sum(a == b for a, b in zip(sig, root_sig)) / NUM_HASHES
                if est < threshold:
                    out.append((int(doc_id), root_id, est))
            yield pd.DataFrame(out, columns=["doc_id", "root_id", "est_sim"])

        def close(self) -> None:
            """Interface hook; no resources to release (state lives
            in the store, not the processor)."""

    # TTL state is only legal under a running time mode — Spark
    # rejects ttlDurationMs with TimeMode.None at query start
    # (STATEFUL_PROCESSOR_INCORRECT_TIME_MODE_TO_ASSIGN_TTL), so the
    # mode follows the TTL request.
    time_mode = "None" if state_ttl_ms is None else "ProcessingTime"
    return with_sig.groupBy("bucket").transformWithStateInPandas(
        statefulProcessor=RootDedup(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode=time_mode,
    )


def write_multiband_dedup(
    docs: DataFrame, sink_dir: str, checkpoint_dir: str
) -> "StreamingQuery":
    """Materialize the accepted documents: all of a doc's band
    verdicts land in the same micro-batch (they are emitted by the
    batch that carried the doc), so a STATELESS per-batch conjunction
    — accepted iff no band collided, max_root_sim over non-self bands
    — finishes the rule. Batches write to batch_id-keyed overwrite
    directories (replay-idempotent, same pattern as curation/
    trending). Output rows match q127's schema exactly."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        est_nonself = F.when(F.col("doc_id") != F.col("root_id"), F.col("est"))
        accepted = (
            batch_df.groupBy("doc_id")
            .agg(
                F.bool_and(~F.col("collided")).alias("_ok"),
                F.coalesce(F.max(est_nonself), F.lit(0.0)).alias("max_root_sim"),
            )
            .filter(F.col("_ok"))
            .select("doc_id", "max_root_sim")
        )
        accepted.write.mode("overwrite").parquet(f"{sink_dir}/batch_id={batch_id}")

    return (
        streaming_multiband_verdicts(docs)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
