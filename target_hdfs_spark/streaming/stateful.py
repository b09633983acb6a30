"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY §2B.3 — "applyInPandasWithState for custom stateful
operators"): logic that windowed aggregation can't express because
the state transition is arbitrary Python over Arrow batches.

Operator here: a per-key running anomaly detector. State carries
(n, sum, sum_sq) of all values seen; each incoming event is scored
against the mean/std of the state BEFORE it (so scoring is
order-dependent and genuinely stateful), then folded in. Events whose
|z-score| exceeds the threshold are emitted.

Scale: state is three floats per key — millions of keys fit trivially;
Spark shuffles each micro-batch by key and keeps state in the state
store (RocksDB-backed on a real cluster). This is the pattern for
sessionized feature extraction, fraud scoring, and drift detection at
100 TB/day.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("zscore", T.DoubleType()),
        T.StructField("n_prior", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("total_sq", T.DoubleType()),
    ]
)
# TTL mode adds the latest-ever event time (ms) for the monotone re-arm
STATE_TTL_SCHEMA = T.StructType(
    [*STATE_SCHEMA.fields, T.StructField("last_ms", T.LongType())]
)

MIN_PRIOR = 3  # need a few observations before scoring means anything


def _score_group(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    threshold: float,
    ttl_ms: int | None = None,
) -> Iterable[pd.DataFrame]:
    empty = pd.DataFrame(
        {"user_id": [], "event_id": [], "value": [], "zscore": [], "n_prior": []}
    ).astype(
        {
            "user_id": "int64",
            "event_id": "int64",
            "value": "float64",
            "zscore": "float64",
            "n_prior": "int64",
        }
    )
    if state.hasTimedOut:
        # idle past the TTL: the user's running statistics evict; a
        # returning user re-baselines (MIN_PRIOR warm-up applies
        # again) — stale statistics scoring post-gap behavior would be
        # worse than a fresh baseline, and state stays bounded by the
        # ACTIVE key population
        state.remove()
        yield empty
        return
    if state.exists:
        stored = state.get
        n, total, total_sq = stored[0], stored[1], stored[2]
        prev_last = stored[3] if ttl_ms is not None else 0
    else:
        n, total, total_sq, prev_last = 0, 0.0, 0.0, 0
    out: list[tuple] = []
    # Groups larger than the Arrow batch size arrive as MULTIPLE
    # chunks in arbitrary order — concatenate before sorting, or the
    # fold order (and thus the z-scores) is run-dependent.
    whole = pd.concat(list(pdfs), ignore_index=True)
    for pdf in (whole.sort_values(["ts", "event_id"]),):
        for event_id, value in zip(pdf["event_id"], pdf["value"]):
            if n >= MIN_PRIOR:
                mean = total / n
                var = max(total_sq / n - mean * mean, 0.0)
                std = math.sqrt(var)
                z = (value - mean) / std if std > 0 else 0.0
                if abs(z) >= threshold:
                    out.append((key[0], int(event_id), float(value), z, n))
            n += 1
            total += float(value)
            total_sq += float(value) * float(value)
    if ttl_ms is None:
        state.update((n, total, total_sq))
    else:
        last_ms = max(int(prev_last), int(whole["ts"].max().value // 1_000_000))
        state.update((n, total, total_sq, last_ms))
        state.setTimeoutTimestamp(last_ms + ttl_ms)
    yield (
        pd.DataFrame(out, columns=[f.name for f in OUTPUT_SCHEMA.fields])
        if out
        else empty
    )


def running_zscore_anomalies(
    events: DataFrame,
    threshold: float = 2.0,
    state_ttl_ms: int | None = None,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Streaming per-user anomaly filter: emit events deviating more
    than `threshold` standard deviations from the user's running
    mean (state accumulated across micro-batches).

    ``state_ttl_ms`` bounds the state store on churning key
    populations (the pattern/funnel trackers' event-time eviction
    discipline): an idle user's statistics evict once the watermark
    passes their last event + TTL, and a returning user re-baselines
    through the MIN_PRIOR warm-up. ``None`` keeps unbounded exact
    behavior (three floats per ever-seen key).

    `events` must be a streaming DataFrame with columns
    (user_id, event_id, ts, value).
    """

    def fn(key, pdfs, state):
        return _score_group(key, pdfs, state, threshold, state_ttl_ms)

    if state_ttl_ms is None:
        src, schema, timeout = events, STATE_SCHEMA, GroupStateTimeout.NoTimeout
    else:
        src = events.withWatermark("ts", watermark_delay)
        schema, timeout = STATE_TTL_SCHEMA, GroupStateTimeout.EventTimeTimeout
    return src.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=schema,
        outputMode="append",
        timeoutConf=timeout,
    )


# ---------------------------------------------------------------------------
# Consecutive-pattern matcher (stateful twin of q148_event_pattern)
# ---------------------------------------------------------------------------

PATTERN = ("view", "click", "purchase")

PATTERN_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),  # the run's FINAL event
    ]
)

# state: the last len(PATTERN)-1 event types joined with the ASCII
# unit separator (GroupState schemas are flat; one small string beats
# an array column). \x1f cannot appear in a sane event_type; a '|' or
# comma delimiter could, and a type containing the delimiter would
# re-split into multiple fake events on the next batch — fabricating
# matches the batch twin would never emit.
_SUFFIX_SEP = "\x1f"
PATTERN_STATE_SCHEMA = T.StructType(
    [T.StructField("suffix", T.StringType())]
)


def _match_group(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    suffix: list[str] = (
        state.get[0].split(_SUFFIX_SEP) if state.exists and state.get[0] else []
    )
    keep = len(PATTERN) - 1
    out: list[tuple] = []
    whole = pd.concat(list(pdfs), ignore_index=True)
    for pdf in (whole.sort_values(["ts", "event_id"]),):
        for event_id, etype in zip(pdf["event_id"], pdf["event_type"]):
            window = (*suffix, etype)
            if tuple(window[-len(PATTERN):]) == PATTERN:
                out.append((key[0], int(event_id)))
            suffix = list(window[-keep:])
    state.update((_SUFFIX_SEP.join(suffix),))
    yield pd.DataFrame(out, columns=[f.name for f in PATTERN_OUTPUT_SCHEMA.fields])


def consecutive_pattern_stream(events: DataFrame) -> DataFrame:
    """Streaming strict-sequence detection: emit the final event of
    every CONSECUTIVE view→click→purchase run per user, with the
    len-2 suffix of each user's stream carried as state across
    micro-batches — a run that straddles a batch boundary (view+click
    in batch 1, purchase in batch 2) still matches, which no
    per-batch window can do.

    State is O(len(pattern)) bytes per key. Order contract: within a
    key, events are folded in (ts, event_id) order per batch; like the
    running-zscore operator above, cross-batch disorder is the
    watermark's concern, not the matcher's (the batch twin q148
    defines the target semantics on the totally-ordered log).

    `events` must be a streaming DataFrame with columns
    (user_id, event_id, ts, event_type).
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _match_group,
        outputStructType=PATTERN_OUTPUT_SCHEMA,
        stateStructType=PATTERN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Multi-pattern matcher (MATCH_RECOGNIZE-style; stateful twin of q161)
# ---------------------------------------------------------------------------

# Named strict-consecutive patterns, all matched SIMULTANEOUSLY over
# each user's ordered stream (overlaps allowed — skip-to-next-row
# semantics, like MATCH_RECOGNIZE AFTER MATCH SKIP TO NEXT ROW). The
# batch twin q161_multi_pattern_match generates its oracle SQL from
# this same dict, so the two surfaces cannot drift.
MULTI_PATTERNS: dict[str, tuple[str, ...]] = {
    "view_click_purchase": ("view", "click", "purchase"),
    "error_recovery": ("error", "view"),
    "double_click": ("click", "click"),
}

MULTI_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("pattern", T.StringType()),
        T.StructField("last_event_id", T.LongType()),
    ]
)


# TTL-mode state: the suffix plus the key's latest-ever event time
# (ms), needed for the monotone timeout re-arm (the neardup
# convention: arming from the batch max alone could REWIND the timer
# on an all-out-of-order batch)
MULTI_STATE_TTL_SCHEMA = T.StructType(
    [
        T.StructField("suffix", T.StringType()),
        T.StructField("last_ms", T.LongType()),
    ]
)


def _multi_match_group(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    ttl_ms: int | None = None,
) -> Iterable[pd.DataFrame]:
    empty = pd.DataFrame({"user_id": [], "pattern": [], "last_event_id": []}).astype(
        {"user_id": "int64", "pattern": "object", "last_event_id": "int64"}
    )
    if state.hasTimedOut:
        # watermark passed last-activity + TTL: the idle user's suffix
        # evicts; their next event starts with clean context (a run
        # straddling a gap longer than the TTL is deliberately lost)
        state.remove()
        yield empty
        return
    if state.exists:
        stored = state.get
        suffix = stored[0].split(_SUFFIX_SEP) if stored[0] else []
        prev_last = stored[1] if ttl_ms is not None else 0
    else:
        suffix, prev_last = [], 0
    keep = max(len(p) for p in MULTI_PATTERNS.values()) - 1
    out: list[tuple] = []
    whole = pd.concat(list(pdfs), ignore_index=True)
    for pdf in (whole.sort_values(["ts", "event_id"]),):
        for event_id, etype in zip(pdf["event_id"], pdf["event_type"]):
            window = (*suffix, etype)
            for name, pat in MULTI_PATTERNS.items():
                if tuple(window[-len(pat):]) == pat:
                    out.append((key[0], name, int(event_id)))
            suffix = list(window[-keep:])
    if ttl_ms is None:
        state.update((_SUFFIX_SEP.join(suffix),))
    else:
        last_ms = max(int(prev_last), int(whole["ts"].max().value // 1_000_000))
        state.update((_SUFFIX_SEP.join(suffix), last_ms))
        state.setTimeoutTimestamp(last_ms + ttl_ms)
    yield (
        pd.DataFrame(out, columns=[f.name for f in MULTI_OUTPUT_SCHEMA.fields])
        if out
        else empty
    )


def multi_pattern_stream(
    events: DataFrame,
    state_ttl_ms: int | None = None,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Streaming multi-pattern sequence detection: every pattern in
    MULTI_PATTERNS is matched per user in one pass with ONE shared
    piece of state — the (max pattern length - 1)-event suffix of the
    user's stream — so adding patterns costs zero extra state or
    shuffles. Emits (user_id, pattern, last_event_id) for each match;
    runs straddling micro-batch boundaries still match (the suffix
    crosses the boundary in the state store).

    This is the engine's MATCH_RECOGNIZE-lite surface: strict
    consecutive sequences, all-patterns-at-once, skip-to-next-row
    overlap semantics, with q161_multi_pattern_match as the
    oracle-checked batch definition of the semantics.

    ``state_ttl_ms`` bounds the state store on unbounded streams with
    churning key populations: an idle user's suffix evicts once the
    event-time watermark (``watermark_delay`` lateness allowance)
    passes their last event + TTL — the neardup operator's eviction
    discipline (replay-deterministic, monotone re-arm). ``None``
    keeps exact unbounded behavior; state is then O(len patterns)
    bytes per ever-seen key.

    `events` must be a streaming DataFrame with columns
    (user_id, event_id, ts, event_type).
    """

    def fn(key, pdfs, state):
        return _multi_match_group(key, pdfs, state, state_ttl_ms)

    if state_ttl_ms is None:
        src, schema, timeout = events, PATTERN_STATE_SCHEMA, GroupStateTimeout.NoTimeout
    else:
        src = events.withWatermark("ts", watermark_delay)
        schema, timeout = MULTI_STATE_TTL_SCHEMA, GroupStateTimeout.EventTimeTimeout
    return src.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=MULTI_OUTPUT_SCHEMA,
        stateStructType=schema,
        outputMode="append",
        timeoutConf=timeout,
    )


# ---------------------------------------------------------------------------
# Gapped-funnel stage tracker (stateful twin of q138_event_funnel)
# ---------------------------------------------------------------------------

# q138's funnel semantics: earliest 'view', then earliest 'click'
# STRICTLY after that view, then earliest 'purchase' strictly after
# that click — gaps allowed (unlike the strict-consecutive patterns
# above). The batch query emits one global summary; the streaming twin
# emits the per-user STAGE-TRANSITION rows instead (append mode can't
# retract aggregates), and the q138 aggregates are a trivial batch
# query over the sink — the same sink-side-rollup convention as the
# trending/sampling operators.
FUNNEL_STAGES = ("view", "click", "purchase")

FUNNEL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("stage", T.StringType()),
        T.StructField("stage_ts_us", T.LongType()),
        T.StructField("since_view_us", T.LongType()),  # final stage only
    ]
)

# Per-stage CANDIDATE sets (epoch micros), pruned to the provably
# sufficient statistic of the prefix seen so far (see _funnel_chain):
# stage 0 keeps only its min; stage i>0 keeps every candidate at or
# below its current frontier stamp (candidates above it can never
# become the answer — frontiers are non-increasing).
FUNNEL_STATE_SCHEMA = T.StructType(
    [
        T.StructField(f"c{i}_us", T.ArrayType(T.LongType()))
        for i in range(len(FUNNEL_STAGES))
    ]
)
# TTL mode adds the latest-ever event time (ms) for the monotone re-arm
FUNNEL_STATE_TTL_SCHEMA = T.StructType(
    [*FUNNEL_STATE_SCHEMA.fields, T.StructField("last_ms", T.LongType())]
)


def _funnel_chain(cands: list[list[int]]) -> list[int]:
    """q138's frontier chain over candidate sets: stamp[0] = min of
    stage-0 candidates; stamp[i] = min stage-i candidate STRICTLY
    after stamp[i-1]; -1 where undefined. Pure function of the
    candidate state, so pre/post-batch stamps diff into exactly the
    revision rows a batch emits."""
    stamps = [-1] * len(cands)
    prev = None
    for i, cs in enumerate(cands):
        if i == 0:
            stamps[0] = min(cs) if cs else -1
        elif prev is not None and prev != -1:
            elig = [c for c in cs if c > prev]
            stamps[i] = min(elig) if elig else -1
        prev = stamps[i]
    return stamps


def _funnel_prune(
    cands: list[list[int]],
    stamps: list[int],
    max_pending: int | None = None,
) -> list[list[int]]:
    """Drop candidates that can never become a stage's answer.

    Stage 0's answer is a plain min — keep one value. For stage i>0
    the answer is min{c > stamp[i-1]}; stamp[i-1] only DECREASES as
    more data arrives (more candidates, lower thresholds), so the
    stage-i answer is non-increasing: any candidate strictly above
    the current answer is dominated forever and can be dropped, while
    every candidate at or below it (including those under today's
    threshold) may be re-enabled by a later, earlier-in-event-time
    prerequisite and must stay. This is exactly the sufficient
    statistic: replaying batch q138 over (kept ∪ future) equals
    replaying it over (all-seen ∪ future). In well-formed behavioral
    logs candidates below a stage's threshold are rare (clicks before
    the user's first view), so the kept sets stay O(1) in practice.

    Two state-size controls (r7 verdict nit 3 / ADVICE):

    - kept sets are DEDUPED to distinct stamps — pure compaction with
      no accuracy cost (min{c > v} is a set function), so a user
      replaying the same click timestamp forever holds one entry;
    - worst case (malformed logs: thousands of DISTINCT clicks and no
      view — the answer function genuinely needs every distinct value
      for exactness, so unbounded-exact is the default), an optional
      ``max_pending`` caps each kept set to its SMALLEST values.
      Caveat when it truncates: if the prerequisite stamp later lands
      ABOVE the whole kept set, the stage reports unreached (-1)
      instead of a dropped larger candidate — the right trade on
      adversarial keys, since dropped values are the LARGEST and
      well-formed funnels resolve from the smallest candidates.
    """
    out: list[list[int]] = []
    for i, cs in enumerate(cands):
        if i == 0:
            out.append([min(cs)] if cs else [])
        elif stamps[i] != -1:
            out.append(sorted({c for c in cs if c <= stamps[i]}))
        else:
            out.append(sorted(set(cs)))
        if max_pending is not None and i > 0:
            out[i] = out[i][:max_pending]
    return out


def _funnel_group(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    ttl_ms: int | None = None,
    max_pending: int | None = None,
) -> Iterable[pd.DataFrame]:
    empty = pd.DataFrame(
        {"user_id": [], "stage": [], "stage_ts_us": [], "since_view_us": []}
    ).astype(
        {
            "user_id": "int64",
            "stage": "object",
            "stage_ts_us": "int64",
            "since_view_us": "object",
        }
    )
    if state.hasTimedOut:
        # idle past the TTL: the abandoned funnel's progress evicts;
        # a later return starts a fresh funnel (attribution-window
        # semantics — conversions are only credited within the TTL)
        state.remove()
        yield empty
        return
    n = len(FUNNEL_STAGES)
    if state.exists:
        stored = state.get
        cands = [list(stored[i]) for i in range(n)]
        prev_last = stored[n] if ttl_ms is not None else 0
    else:
        cands, prev_last = [[] for _ in range(n)], 0
    last = n - 1
    # pre-batch stamps: what the sink already believes for this user
    before = _funnel_chain(cands)
    whole = pd.concat(list(pdfs), ignore_index=True)
    # datetime64[ns] -> epoch micros (events.ts is micros-backed,
    # so this is exact)
    ts_us_col = whole["ts"].astype("int64") // 1000
    for ts_us, etype in zip(ts_us_col, whole["event_type"]):
        try:
            i = FUNNEL_STAGES.index(etype)
        except ValueError:
            continue
        cands[i].append(int(ts_us))
    after = _funnel_chain(cands)
    # emit one row per stage whose truth CHANGED this batch — a newly
    # reached stage or a downward revision from a late earlier event
    # (the sink's latest row per (user, stage) is current truth)
    out: list[tuple] = []
    for i in range(n):
        if after[i] == -1:
            continue
        since = int(after[i] - after[0]) if i == last else None
        prev_since = int(before[i] - before[0]) if i == last else None
        if after[i] != before[i] or (i == last and since != prev_since):
            out.append((key[0], FUNNEL_STAGES[i], int(after[i]), since))
    pruned = _funnel_prune(cands, after, max_pending)
    if ttl_ms is None:
        state.update(tuple(pruned))
    else:
        last_ms = max(int(prev_last), int(whole["ts"].max().value // 1_000_000))
        state.update((*pruned, last_ms))
        state.setTimeoutTimestamp(last_ms + ttl_ms)
    yield (
        pd.DataFrame(out, columns=[f.name for f in FUNNEL_OUTPUT_SCHEMA.fields])
        if out
        else empty
    )


def funnel_stage_stream(
    events: DataFrame,
    state_ttl_ms: int | None = None,
    watermark_delay: str = "0 seconds",
    max_pending_candidates: int | None = None,
) -> DataFrame:
    """Streaming gapped-funnel tracker: emit one row per user per
    funnel stage when the stage's truth CHANGES — first reached, or
    revised downward by a late event-time-earlier arrival (view;
    click strictly after the view; purchase strictly after the
    click), the final stage carrying its view→purchase latency. The
    sink's latest row per (user, stage) is current truth (the
    standard upsert-consumption of an append stream); for in-order
    logs no revisions occur, so each stage emits exactly once.

    Parity with batch q138_event_funnel is UNCONDITIONAL — any
    arrival permutation, any batch split: the state holds each
    stage's candidate stamps pruned to the provably sufficient
    statistic (_funnel_prune — stage frontiers are non-increasing,
    so candidates above the current frontier are dominated forever;
    everything at or below it is kept because a later, earlier-in-
    event-time prerequisite can re-enable it — the case a
    commit-once stamp can never repair). Aggregating latest-per-
    (user, stage) sink rows reproduces q138's summary exactly; the
    parity tests pin this on in-order AND shuffled logs. State is
    the min view plus below-frontier click/purchase candidates —
    O(1) in practice (a below-frontier click is a click before the
    user's first view), bounded by the user's DISTINCT funnel-event
    stamps in the adversarial worst case (kept sets are deduped —
    exact compaction), never by the stream.
    ``max_pending_candidates`` hard-caps each stage's kept set to its
    smallest values for deployments that must bound state against
    MALFORMED logs (e.g. thousands of distinct clicks and no view —
    where exactness genuinely needs every distinct stamp); when it
    truncates, a prerequisite landing above the whole kept set reports
    the stage unreached instead of a dropped larger candidate
    (_funnel_prune's caveat). TTL-less deployments with ``None``
    assume well-formed logs, where kept sets are O(1).

    ``state_ttl_ms`` turns the tracker into an attribution-window
    funnel: an idle user's progress evicts once the event-time
    watermark passes their last event + TTL (monotone re-arm; a later
    return starts a fresh funnel). ``None`` keeps q138's unbounded
    semantics — state is then 24 bytes per ever-seen key.

    `events` must be a streaming DataFrame with columns
    (user_id, event_id, ts, event_type).
    """

    def fn(key, pdfs, state):
        return _funnel_group(
            key, pdfs, state, state_ttl_ms, max_pending_candidates
        )

    if state_ttl_ms is None:
        src, schema, timeout = events, FUNNEL_STATE_SCHEMA, GroupStateTimeout.NoTimeout
    else:
        src = events.withWatermark("ts", watermark_delay)
        schema, timeout = FUNNEL_STATE_TTL_SCHEMA, GroupStateTimeout.EventTimeTimeout
    return src.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=schema,
        outputMode="append",
        timeoutConf=timeout,
    )


# ---------------------------------------------------------------------------
# SCD-2 interval builder (stateful twin of q105_scd2_intervals)
# ---------------------------------------------------------------------------

SCD2_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("valid_from_us", T.LongType()),
        T.StructField("valid_to_us", T.LongType()),
    ]
)

# the one OPEN interval per key: its type, the change row's value,
# and its start stamp (epoch micros; -1 means no interval open yet)
SCD2_STATE_SCHEMA = T.StructType(
    [
        T.StructField("open_type", T.StringType()),
        T.StructField("open_value", T.DoubleType()),
        T.StructField("open_from_us", T.LongType()),
    ]
)


def _scd2_group(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    open_type, open_value, open_from = (
        state.get if state.exists else (None, None, -1)
    )
    out: list[tuple] = []
    whole = pd.concat(list(pdfs), ignore_index=True)
    # Null event_type rows are SKIPPED, documented divergence from the
    # batch twin: q105's SQL pushes a mid-stream NULL through lag()
    # three-valued logic (the NULL row opens nothing but breaks the
    # chain for its successor) — an artifact, not a semantic anyone
    # wants; str(None) coercion would be worse (a "None" string type
    # that merges with genuine NULLs). Filter or impute upstream.
    whole = whole[whole["event_type"].notna()]
    for pdf in (whole.sort_values(["ts", "event_id"]),):
        ts_us_col = pdf["ts"].astype("int64") // 1000
        for ts_us, etype, value in zip(
            ts_us_col, pdf["event_type"], pdf["value"]
        ):
            if open_from != -1 and etype == open_type:
                continue  # same type: interval stays open
            if open_from != -1:
                # type changed: the open interval CLOSES at this event
                out.append(
                    (key[0], open_type, float(open_value), int(open_from), int(ts_us))
                )
            open_type, open_value, open_from = str(etype), float(value), int(ts_us)
    state.update((open_type, open_value, open_from))
    yield pd.DataFrame(out, columns=[f.name for f in SCD2_OUTPUT_SCHEMA.fields])


def scd2_interval_stream(events: DataFrame) -> DataFrame:
    """Streaming SCD-2 (type 2 slowly-changing-dimension) builder:
    consecutive same-type events per user collapse into one validity
    interval; each type CHANGE closes the open interval and emits it
    with [valid_from, valid_to) stamps — q105_scd2_intervals'
    closed rows, incrementally. The one OPEN (is_current) interval per
    key lives in the state store rather than the sink (append mode
    cannot retract it; q105's open row is exactly this state), so a
    dashboard unions the sink with the state-backed current snapshot.

    Intervals straddling micro-batch boundaries close correctly — the
    open interval's (type, value, start) crosses in state. State is
    ~32 bytes + type string per key.

    No TTL option, deliberately (unlike the pattern/funnel trackers):
    SCD-2 state is not tracking context — it IS the current dimension
    snapshot (one open interval per live key, q105's is_current rows),
    so its size is the dimension's cardinality by construction, and
    evicting an idle key would silently drop its current row.

    `events` must be a streaming DataFrame with columns
    (user_id, event_id, ts, event_type, value).
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _scd2_group,
        outputStructType=SCD2_OUTPUT_SCHEMA,
        stateStructType=SCD2_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Quantified / bounded-gap pattern matcher (stateful twin of q162)
# ---------------------------------------------------------------------------

# Three-step pattern shapes beyond strict-consecutive, the natural
# next depth after q148/q161: `first middle+ last` with the middle
# step QUANTIFIED (one-or-more contiguous repeats), or `first .. last`
# with a BOUNDED GAP (any events between), each constrained to a
# total span of at most `within` events of the user's ordered stream.
# Match discipline (defined by the batch twin q162's oracle):
# skip-to-next-row overlap — every row whose type equals `first` is an
# independent match start — and EARLIEST COMPLETION per start (the
# minimal match; for the contiguous form the completion is unique
# anyway, since the first non-middle event ends the repeat run).
# The batch query generates both its plan and its DuckDB oracle from
# this dict, so batch, stream, and oracle cannot drift.
GAP_PATTERNS: dict[str, dict] = {
    # view click+ purchase: 1-3 CONTIGUOUS clicks then purchase
    "quick_convert": {
        "first": "view",
        "middle": "click",
        "middle_any": False,
        "last": "purchase",
        "within": 5,
    },
    # view .. error within 4 events: anything may intervene
    "view_then_error": {
        "first": "view",
        "middle": None,
        "middle_any": True,
        "last": "error",
        "within": 4,
    },
}

# Round-7 vocabulary extension (r6 verdict item 7): ALTERNATION on
# the start step — `(A|B) .. C` via a tuple "first" — and NEGATION on
# the gap — `A (!X)* C` via "middle_not": any events may intervene
# EXCEPT type X (the clean-path pattern: a conversion with no error
# in between). Kept in a separate dict so q162's registered result is
# unchanged; q233 compiles this dict through the SAME three surfaces
# (batch plan, DuckDB oracle, streaming matcher).
ALT_PATTERNS: dict[str, dict] = {
    # (view|signup) .. purchase within 5 events: either entry point
    "any_entry_convert": {
        "first": ("view", "signup"),
        "middle": None,
        "middle_any": True,
        "last": "purchase",
        "within": 5,
    },
    # click (!error)* purchase within 5: conversion with a CLEAN gap
    "clean_convert": {
        "first": "click",
        "middle": None,
        "middle_any": False,
        "middle_not": "error",
        "last": "purchase",
        "within": 5,
    },
}


# Multi-step gapped sequences — `A .. B .. C within K` (round-7
# depth after q233): the full funnel shape at event granularity,
# every intermediate step required IN ORDER with free gaps, total
# span bounded. One dict entry again drives plan, oracle, and
# streaming matcher (q235).
SEQ_PATTERNS: dict[str, dict] = {
    "full_funnel_path": {
        "steps": ("view", "click", "purchase"),
        "within": 6,
    },
}


def _gap_first(spec: dict) -> tuple[str, ...]:
    """The start step's allowed types (alternation normalizes str to
    a 1-tuple)."""
    if "steps" in spec:
        return (spec["steps"][0],)
    f = spec["first"]
    return (f,) if isinstance(f, str) else tuple(f)


def _gap_last(spec: dict) -> str:
    """The closing step's type."""
    return spec["steps"][-1] if "steps" in spec else spec["last"]


def _gap_form(spec: dict) -> str:
    """'steps' (multi-step gapped sequence), 'any' (bounded gap),
    'not' (negated gap), or 'quant' (contiguous one-or-more
    quantifier)."""
    if "steps" in spec:
        return "steps"
    if spec["middle_any"]:
        return "any"
    if spec.get("middle_not") is not None:
        return "not"
    return "quant"


def _validate_gap_patterns(patterns: dict[str, dict]) -> None:
    for _n, _p in patterns.items():
        form = _gap_form(_p)
        if form == "steps":
            assert len(_p["steps"]) >= 3, _n  # 2-step = the 'any' form
            assert _p["within"] >= len(_p["steps"]), _n
            continue
        if form == "any":
            # middle_any=True with a middle_not set would silently
            # classify as the 'any' form and DROP the negation
            # (_gap_form checks middle_any first) — keep the
            # contradictory spec a registration-time error like the
            # A B+ B case (ADVICE r7)
            assert _p.get("middle_not") is None, _n
        if form == "quant":
            # earliest-completion-per-start is UNIQUE for the
            # contiguous form only when the quantified step differs
            # from the closing step (A B+ B would re-complete on
            # every extension); keep that a registration-time error,
            # not a silent semantics change
            assert _p["middle"] != _p["last"], _n
        if form == "not":
            assert _p["middle"] is None, _n
        assert _p["within"] >= (3 if form == "quant" else 2), _n
        assert _gap_first(_p), _n


_validate_gap_patterns(GAP_PATTERNS)
_validate_gap_patterns(ALT_PATTERNS)
_validate_gap_patterns(SEQ_PATTERNS)


def _subseq_in(needles: tuple[str, ...], hay: list[str]) -> bool:
    """Ordered subsequence containment (the steps-form gap test)."""
    it = iter(hay)
    return all(n in it for n in needles)


def _gap_keep(patterns: dict[str, dict]) -> int:
    return max(p["within"] for p in patterns.values()) - 1


GAP_KEEP = _gap_keep(GAP_PATTERNS)

GAP_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("pattern", T.StringType()),
        T.StructField("first_event_id", T.LongType()),
        T.StructField("last_event_id", T.LongType()),
        T.StructField("span", T.IntegerType()),  # events, inclusive
    ]
)

# state: the last GAP_KEEP (type, event_id) pairs — two parallel
# \x1f-joined strings (GroupState schemas are flat; see _SUFFIX_SEP)
GAP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("suffix_types", T.StringType()),
        T.StructField("suffix_ids", T.StringType()),
    ]
)
GAP_STATE_TTL_SCHEMA = T.StructType(
    [*GAP_STATE_SCHEMA.fields, T.StructField("last_ms", T.LongType())]
)


def _gap_completions(
    window: list[tuple[str, int]], patterns: dict[str, dict] | None = None
) -> list[tuple]:
    """Matches that complete EXACTLY at the newest event of `window`
    ((type, event_id) pairs, oldest first). Pure function of the
    suffix — evaluating it once per arriving event reproduces the
    batch semantics incrementally."""
    etype, eid = window[-1]
    out: list[tuple] = []
    for name, spec in (patterns or GAP_PATTERNS).items():
        if etype != _gap_last(spec):
            continue
        form = _gap_form(spec)
        min_span = (
            len(spec["steps"]) if form == "steps"
            else 3 if form == "quant"
            else 2
        )
        for s in range(len(window) - 1):
            span = len(window) - s
            if span < min_span or span > spec["within"]:
                continue
            if window[s][0] not in _gap_first(spec):
                continue
            between = [t for t, _ in window[s + 1 : -1]]
            if form == "steps":
                mids = tuple(spec["steps"][1:-1])
                if not _subseq_in(mids, between):
                    continue
                # earliest completion: an earlier in-gap `last` with a
                # valid mid-embedding before it already completed
                last_t = _gap_last(spec)
                if any(
                    t == last_t and _subseq_in(mids, between[:k])
                    for k, t in enumerate(between)
                ):
                    continue
            elif form == "any":
                # earliest completion: no earlier `last` in the gap
                if spec["last"] in between:
                    continue
            elif form == "not":
                # negated gap: no forbidden type anywhere in between
                # (an X at any earlier position kills every later
                # completion too), and earliest completion as above
                if spec["middle_not"] in between or spec["last"] in between:
                    continue
            else:
                if any(t != spec["middle"] for t in between):
                    continue
            out.append((name, window[s][1], int(eid), span))
    return out


def _gap_match_group(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    ttl_ms: int | None = None,
    patterns: dict[str, dict] | None = None,
) -> Iterable[pd.DataFrame]:
    patterns = patterns or GAP_PATTERNS
    keep = _gap_keep(patterns)
    empty = pd.DataFrame(
        {
            "user_id": [],
            "pattern": [],
            "first_event_id": [],
            "last_event_id": [],
            "span": [],
        }
    ).astype(
        {
            "user_id": "int64",
            "pattern": "object",
            "first_event_id": "int64",
            "last_event_id": "int64",
            "span": "int32",
        }
    )
    if state.hasTimedOut:
        state.remove()
        yield empty
        return
    if state.exists:
        stored = state.get
        types = stored[0].split(_SUFFIX_SEP) if stored[0] else []
        ids = [int(x) for x in stored[1].split(_SUFFIX_SEP)] if stored[1] else []
        prev_last = stored[2] if ttl_ms is not None else 0
    else:
        types, ids, prev_last = [], [], 0
    suffix = list(zip(types, ids))
    out: list[tuple] = []
    whole = pd.concat(list(pdfs), ignore_index=True)
    for pdf in (whole.sort_values(["ts", "event_id"]),):
        for event_id, etype in zip(pdf["event_id"], pdf["event_type"]):
            window = [*suffix, (str(etype), int(event_id))]
            for name, first_id, last_id, span in _gap_completions(
                window, patterns
            ):
                out.append((key[0], name, first_id, last_id, span))
            suffix = window[-keep:]
    types_s = _SUFFIX_SEP.join(t for t, _ in suffix)
    ids_s = _SUFFIX_SEP.join(str(i) for _, i in suffix)
    if ttl_ms is None:
        state.update((types_s, ids_s))
    else:
        last_ms = max(int(prev_last), int(whole["ts"].max().value // 1_000_000))
        state.update((types_s, ids_s, last_ms))
        state.setTimeoutTimestamp(last_ms + ttl_ms)
    yield (
        pd.DataFrame(out, columns=[f.name for f in GAP_OUTPUT_SCHEMA.fields]).astype(
            {"span": "int32"}
        )
        if out
        else empty
    )


def gapped_pattern_stream(
    events: DataFrame,
    state_ttl_ms: int | None = None,
    watermark_delay: str = "0 seconds",
    patterns: dict[str, dict] | None = None,
) -> DataFrame:
    """Streaming quantified / bounded-gap pattern detection: every
    entry of ``patterns`` (default GAP_PATTERNS; pass ALT_PATTERNS
    for the alternation `(A|B) .. C` / negated-gap `A (!X)* C`
    vocabulary — q233's dict) — `first middle+ last`
    contiguous-quantified, or `first .. last` bounded-gap — is
    matched per user in one pass with one shared piece of state — the
    (max within - 1)-event (type, event_id) suffix — emitting
    (user_id, pattern, first_event_id, last_event_id, span) per match.
    A match is checked only when its completing event arrives, so
    every span-bounded match whose start straddles a micro-batch
    boundary still fires (the suffix crosses in the state store).

    Semantics (batch-defined by q162_gapped_pattern_match's oracle):
    skip-to-next-row overlap, earliest completion per start row.

    ``state_ttl_ms``: same event-time eviction discipline as
    multi_pattern_stream (monotone re-arm; an idle user's suffix
    evicts once the watermark passes last event + TTL). ``None``
    keeps exact unbounded behavior; state is O(max within) tokens
    per ever-seen key.

    `events` must be a streaming DataFrame with columns
    (user_id, event_id, ts, event_type).
    """

    def fn(key, pdfs, state):
        return _gap_match_group(key, pdfs, state, state_ttl_ms, patterns)

    if state_ttl_ms is None:
        src, schema, timeout = events, GAP_STATE_SCHEMA, GroupStateTimeout.NoTimeout
    else:
        src = events.withWatermark("ts", watermark_delay)
        schema, timeout = GAP_STATE_TTL_SCHEMA, GroupStateTimeout.EventTimeTimeout
    return src.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=GAP_OUTPUT_SCHEMA,
        stateStructType=schema,
        outputMode="append",
        timeoutConf=timeout,
    )


# ---------------------------------------------------------------------------
# Time-weighted value accumulator (stateful twin of q174_time_weighted_value)
# ---------------------------------------------------------------------------

TWAP_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_intervals", T.LongType()),
        T.StructField("total_us", T.LongType()),
        T.StructField("twap_cents", T.LongType()),
    ]
)

# the OPEN observation (last seen value + stamp) and the three closed
# running sums — 40 bytes/key, O(1) regardless of history length
TWAP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_t_us", T.LongType()),
        T.StructField("last_v_cents", T.LongType()),
        T.StructField("sum_w_us", T.LongType()),
        T.StructField("sum_vw", T.LongType()),
        T.StructField("n_intervals", T.LongType()),
    ]
)
TWAP_STATE_TTL_SCHEMA = T.StructType(
    [*TWAP_STATE_SCHEMA.fields, T.StructField("last_ms", T.LongType())]
)


def _twap_group(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    ttl_ms: int | None = None,
) -> Iterable[pd.DataFrame]:
    empty = pd.DataFrame(
        {"user_id": [], "n_intervals": [], "total_us": [], "twap_cents": []}
    ).astype("int64")
    if state.hasTimedOut:
        # exposure-window semantics: an idle user's OPEN observation
        # expires — it never accrues weight past the TTL, and the
        # closed sums evict with it (a later return starts fresh)
        state.remove()
        yield empty
        return
    if state.exists:
        stored = state.get
        last_t, last_v, sum_w, sum_vw, n = (int(x) for x in stored[:5])
        prev_last = int(stored[5]) if ttl_ms is not None else 0
    else:
        last_t, last_v, sum_w, sum_vw, n = -1, 0, 0, 0, 0
        prev_last = 0
    whole = pd.concat(list(pdfs), ignore_index=True)
    whole = whole.sort_values(["ts", "event_id"])
    # datetime64[ns] -> epoch micros (events.ts is micros-backed -> exact)
    t_us = (whole["ts"].astype("int64") // 1000).to_numpy()
    # floor(value*100): same dyadic-safe cents convention as batch q174
    v_cents = np.floor(whole["value"].to_numpy() * 100).astype("int64")
    closed = 0
    for t, v in zip(t_us, v_cents):
        t = int(t)
        if last_t != -1:
            w = t - last_t
            sum_w += w
            sum_vw += last_v * w
            n += 1
            closed += 1
        last_t, last_v = t, int(v)
    if ttl_ms is None:
        state.update((last_t, last_v, sum_w, sum_vw, n))
    else:
        last_ms = max(prev_last, int(whole["ts"].max().value // 1_000_000))
        state.update((last_t, last_v, sum_w, sum_vw, n, last_ms))
        state.setTimeoutTimestamp(last_ms + ttl_ms)
    if closed and sum_w > 0:
        # int64 truncated division — identical to q174's `div`
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "n_intervals": [n],
                "total_us": [sum_w],
                "twap_cents": [sum_vw // sum_w if sum_vw >= 0 else -((-sum_vw) // sum_w)],
            }
        ).astype("int64")
    else:
        yield empty


def time_weighted_stream(
    events: DataFrame,
    state_ttl_ms: int | None = None,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Streaming time-weighted average (stateful twin of
    q174_time_weighted_value): each user's observations accrue exact
    µs-weighted int64 sums as intervals CLOSE (an interval closes when
    the next observation arrives — possibly many micro-batches later;
    the open observation crosses batches in the state store). Each
    micro-batch that closes >=1 interval for a user emits that user's
    updated running readout (n_intervals, total_us, twap_cents) — the
    LATEST row per user in the sink is the current TWAP, and on an
    event-time-ordered log it equals batch q174 exactly (truncated
    int64 division, same cents/µs conventions; parity is pinned by
    test). Out-of-order arrival within a micro-batch is repaired by
    the batch-local sort; across batches a late event would close a
    negative-width interval — q174's semantics need the global order,
    so cross-batch parity is scoped to in-order (watermark-complete)
    logs, like funnel_stage_stream.

    State is 5 int64s per key (40 bytes): billions of users fit a
    RocksDB store. ``state_ttl_ms`` gives exposure-window semantics —
    an idle user's open observation stops accruing and evicts once the
    event-time watermark passes last event + TTL (monotone re-arm).

    `events` must be a streaming DataFrame with columns
    (user_id, event_id, ts, value).
    """

    def fn(key, pdfs, state):
        return _twap_group(key, pdfs, state, state_ttl_ms)

    if state_ttl_ms is None:
        src, schema, timeout = events, TWAP_STATE_SCHEMA, GroupStateTimeout.NoTimeout
    else:
        src = events.withWatermark("ts", watermark_delay)
        schema, timeout = TWAP_STATE_TTL_SCHEMA, GroupStateTimeout.EventTimeTimeout
    return src.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=TWAP_OUTPUT_SCHEMA,
        stateStructType=schema,
        outputMode="append",
        timeoutConf=timeout,
    )


# ---------------------------------------------------------------------------
# Transition emitter (stateful twin of q178's transition-count stage)
# ---------------------------------------------------------------------------

TRANS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("src", T.StringType()),
        T.StructField("dst", T.StringType()),
        T.StructField("dst_ts_us", T.LongType()),
    ]
)

# the ONE pending observation per key: the last event type seen
TRANS_STATE_SCHEMA = T.StructType([T.StructField("last_type", T.StringType())])
TRANS_STATE_TTL_SCHEMA = T.StructType(
    [*TRANS_STATE_SCHEMA.fields, T.StructField("last_ms", T.LongType())]
)


def _trans_group(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    ttl_ms: int | None = None,
) -> Iterable[pd.DataFrame]:
    empty = pd.DataFrame(
        {"user_id": [], "src": [], "dst": [], "dst_ts_us": []}
    ).astype({"user_id": "int64", "src": "object", "dst": "object", "dst_ts_us": "int64"})
    if state.hasTimedOut:
        # an idle user's dangling last-event evicts: a later return
        # starts a new chain rather than bridging the idle gap
        state.remove()
        yield empty
        return
    if state.exists:
        stored = state.get
        last = stored[0]
        prev_last = int(stored[1]) if ttl_ms is not None else 0
    else:
        last, prev_last = None, 0
    whole = pd.concat(list(pdfs), ignore_index=True)
    whole = whole.sort_values(["ts", "event_id"])
    ts_us_col = whole["ts"].astype("int64") // 1000
    out: list[tuple] = []
    for ts_us, etype in zip(ts_us_col, whole["event_type"]):
        if etype is None:
            continue
        if last is not None:
            out.append((int(key[0]), last, etype, int(ts_us)))
        last = etype
    if ttl_ms is None:
        state.update((last,))
    else:
        last_ms = max(prev_last, int(whole["ts"].max().value // 1_000_000))
        state.update((last, last_ms))
        state.setTimeoutTimestamp(last_ms + ttl_ms)
    yield (
        pd.DataFrame(out, columns=["user_id", "src", "dst", "dst_ts_us"])
        if out
        else empty
    )


def transition_stream(
    events: DataFrame,
    state_ttl_ms: int | None = None,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Streaming event-type transition emitter (stateful twin of
    q178_markov_stationary's count stage): one row per observed
    (src -> dst) transition per user, with transitions straddling
    micro-batch boundaries bridged by the single-token state (the
    last event type seen — a handful of bytes per key). Aggregating
    the sink by (src, dst) reproduces q178's transition-count matrix
    exactly on event-time-ordered logs (parity pinned by test), which
    makes the downstream fixed-point stationary solve incrementally
    refreshable: re-run the tiny S²-bounded iteration over updated
    counts each trigger, never over the corpus.

    ``state_ttl_ms``: an idle user's dangling last-event evicts once
    the watermark passes last event + TTL, so a return after the gap
    starts a new chain instead of fabricating a cross-gap transition
    (session-scoped chains). ``None`` = q178's unbounded semantics.

    `events` must be a streaming DataFrame with columns
    (user_id, event_id, ts, event_type).
    """

    def fn(key, pdfs, state):
        return _trans_group(key, pdfs, state, state_ttl_ms)

    if state_ttl_ms is None:
        src, schema, timeout = events, TRANS_STATE_SCHEMA, GroupStateTimeout.NoTimeout
    else:
        src = events.withWatermark("ts", watermark_delay)
        schema, timeout = TRANS_STATE_TTL_SCHEMA, GroupStateTimeout.EventTimeTimeout
    return src.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=TRANS_OUTPUT_SCHEMA,
        stateStructType=schema,
        outputMode="append",
        timeoutConf=timeout,
    )


# ---------------------------------------------------------------------------
# Dyadic EMA accumulator (stateful twin of q213_dyadic_ema)
# ---------------------------------------------------------------------------

EMA_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("ema_micro", T.LongType()),
    ]
)

# the running EMA and the event count: 16 bytes/key, O(1) per history
EMA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ema_micro", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)
EMA_STATE_TTL_SCHEMA = T.StructType(
    [*EMA_STATE_SCHEMA.fields, T.StructField("last_ms", T.LongType())]
)


def _ema_group(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    ttl_ms: int | None = None,
) -> Iterable[pd.DataFrame]:
    empty = pd.DataFrame(
        {"user_id": [], "n_events": [], "ema_micro": []}
    ).astype("int64")
    if state.hasTimedOut:
        # an idle user's smoother evicts; a later return restarts the
        # recurrence from its first new value (session-scoped EMA)
        state.remove()
        yield empty
        return
    if state.exists:
        stored = state.get
        ema, n = int(stored[0]), int(stored[1])
        prev_last = int(stored[2]) if ttl_ms is not None else 0
    else:
        ema, n, prev_last = 0, 0, 0
    whole = pd.concat(list(pdfs), ignore_index=True)
    whole = whole.sort_values(["ts", "event_id"])
    # floor(value*1e6): same micro-unit convention as batch q213;
    # values are positive so truncated and floor division agree
    v_micro = np.floor(whole["value"].to_numpy() * 1_000_000).astype("int64")
    for v in v_micro:
        v = int(v)
        ema = v if n == 0 else (ema + v) // 2
        n += 1
    if ttl_ms is None:
        state.update((ema, n))
    else:
        last_ms = max(prev_last, int(whole["ts"].max().value // 1_000_000))
        state.update((ema, n, last_ms))
        state.setTimeoutTimestamp(last_ms + ttl_ms)
    if n:
        yield pd.DataFrame(
            {"user_id": [int(key[0])], "n_events": [n], "ema_micro": [ema]}
        ).astype("int64")
    else:
        yield empty


def ema_stream(
    events: DataFrame,
    state_ttl_ms: int | None = None,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Streaming dyadic EMA (stateful twin of q213_dyadic_ema): the
    alpha = 1/2 integer recurrence ema_t = (v_t + ema_{t-1}) div 2
    runs ONLINE — 16 bytes of state per key carry the smoother across
    micro-batches, so unbounded per-entity histories never
    rematerialize (the batch fold's collected sequence is exactly
    what this twin avoids). Each micro-batch emits the user's updated
    (n_events, ema_micro); the LATEST row per user equals batch q213
    on event-time-ordered logs (parity pinned by test — the
    recurrence is order-sensitive, so cross-batch parity is scoped to
    in-order logs like the other order-sensitive twins).

    ``state_ttl_ms``: an idle user's smoother evicts once the
    event-time watermark passes last event + TTL; a later return
    restarts the EMA instead of blending across the idle gap.

    `events` must be a streaming DataFrame with columns
    (user_id, event_id, ts, value).
    """

    def fn(key, pdfs, state):
        return _ema_group(key, pdfs, state, state_ttl_ms)

    if state_ttl_ms is None:
        src, schema, timeout = events, EMA_STATE_SCHEMA, GroupStateTimeout.NoTimeout
    else:
        src = events.withWatermark("ts", watermark_delay)
        schema, timeout = EMA_STATE_TTL_SCHEMA, GroupStateTimeout.EventTimeTimeout
    return src.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=EMA_OUTPUT_SCHEMA,
        stateStructType=schema,
        outputMode="append",
        timeoutConf=timeout,
    )


# ---------------------------------------------------------------------------
# Clamped-balance accumulator (stateful twin of q222_clamped_running_balance)
# ---------------------------------------------------------------------------

BAL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("final_balance_cents", T.LongType()),
        T.StructField("n_resets", T.LongType()),
    ]
)

# running (balance, resets, n): 24 bytes/key, O(1) per history
BAL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("bal", T.LongType()),
        T.StructField("resets", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)
BAL_STATE_TTL_SCHEMA = T.StructType(
    [*BAL_STATE_SCHEMA.fields, T.StructField("last_ms", T.LongType())]
)

_BAL_CREDIT_TYPES = ("view", "click")  # same credit rule as batch q222


def _bal_group(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    ttl_ms: int | None = None,
) -> Iterable[pd.DataFrame]:
    empty = pd.DataFrame(
        {"user_id": [], "n_events": [], "final_balance_cents": [], "n_resets": []}
    ).astype("int64")
    if state.hasTimedOut:
        # an idle account's balance evicts; a post-gap return starts a
        # fresh ledger (exposure-window semantics, like ema_stream)
        state.remove()
        yield empty
        return
    if state.exists:
        stored = state.get
        bal, resets, n = int(stored[0]), int(stored[1]), int(stored[2])
        prev_last = int(stored[3]) if ttl_ms is not None else 0
    else:
        bal, resets, n, prev_last = 0, 0, 0, 0
    whole = pd.concat(list(pdfs), ignore_index=True)
    whole = whole.sort_values(["ts", "event_id"])
    cents = np.floor(whole["value"].to_numpy() * 100).astype("int64")
    credit = whole["event_type"].isin(_BAL_CREDIT_TYPES).to_numpy()
    for c, is_credit in zip(cents, credit):
        d = int(c) if is_credit else -int(c)
        nb = bal + d
        if nb < 0:
            resets += 1
            nb = 0
        bal = nb
        n += 1
    if ttl_ms is None:
        state.update((bal, resets, n))
    else:
        last_ms = max(prev_last, int(whole["ts"].max().value // 1_000_000))
        state.update((bal, resets, n, last_ms))
        state.setTimeoutTimestamp(last_ms + ttl_ms)
    if n:
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "n_events": [n],
                "final_balance_cents": [bal],
                "n_resets": [resets],
            }
        ).astype("int64")
    else:
        yield empty


def clamped_balance_stream(
    events: DataFrame,
    state_ttl_ms: int | None = None,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Streaming clamped running balance (stateful twin of
    q222_clamped_running_balance): credits (view/click cents) and
    debits accumulate ONLINE with the balance floored at zero and
    clamp events counted — 24 bytes of state per key instead of the
    batch fold's collected delta sequence. Each micro-batch emits the
    user's updated (n_events, final_balance_cents, n_resets); the
    LATEST row per user equals batch q222 on event-time-ordered logs
    (two-seed parity test). ``state_ttl_ms``: an idle account evicts
    once the watermark passes last event + TTL; a later return starts
    a fresh ledger rather than resuming the stale balance.

    `events` must be a streaming DataFrame with columns
    (user_id, event_id, ts, event_type, value).
    """

    def fn(key, pdfs, state):
        return _bal_group(key, pdfs, state, state_ttl_ms)

    if state_ttl_ms is None:
        src, schema, timeout = events, BAL_STATE_SCHEMA, GroupStateTimeout.NoTimeout
    else:
        src = events.withWatermark("ts", watermark_delay)
        schema, timeout = BAL_STATE_TTL_SCHEMA, GroupStateTimeout.EventTimeTimeout
    return src.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=BAL_OUTPUT_SCHEMA,
        stateStructType=schema,
        outputMode="append",
        timeoutConf=timeout,
    )


# ---------------------------------------------------------------------------
# KMV distinct sketch (stateful twin of q239_kmv_distinct_sketch)
# ---------------------------------------------------------------------------

KMV_K = 64
_KMV_DOMAIN = 1 << 32

KMV_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n_in_sketch", T.LongType()),
        T.StructField("kth_hash", T.LongType()),  # -1 while |sketch| < k
        T.StructField("est_distinct", T.LongType()),
    ]
)

# the sketch IS the state: the k smallest distinct portable hashes
KMV_STATE_SCHEMA = T.StructType(
    [T.StructField("mins", T.ArrayType(T.LongType()))]
)
KMV_STATE_TTL_SCHEMA = T.StructType(
    [*KMV_STATE_SCHEMA.fields, T.StructField("last_ms", T.LongType())]
)


def _kmv_hash_py(user_id: int) -> int:
    """The engine's portable 32-bit hash (functions/hashing.py),
    computed Python-side: first 8 hex chars of md5(str(user_id)) —
    CAST(bigint AS STRING) is plain decimal digits in both engines,
    so this matches md5_hash32(CAST(user_id AS STRING)) bit-exactly."""
    return int(hashlib.md5(str(int(user_id)).encode()).hexdigest()[:8], 16)


def _kmv_group(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    ttl_ms: int | None = None,
) -> Iterable[pd.DataFrame]:
    empty = pd.DataFrame(
        {"event_type": [], "n_in_sketch": [], "kth_hash": [], "est_distinct": []}
    ).astype(
        {
            "event_type": "object",
            "n_in_sketch": "int64",
            "kth_hash": "int64",
            "est_distinct": "int64",
        }
    )
    if state.hasTimedOut:
        state.remove()
        yield empty
        return
    if state.exists:
        stored = state.get
        mins = list(stored[0])
        prev_last = stored[1] if ttl_ms is not None else 0
    else:
        mins, prev_last = [], 0
    before = tuple(mins)
    whole = pd.concat(list(pdfs), ignore_index=True)
    # bottom-k of a set union is a SEMILATTICE: merge order cannot
    # matter, so batch parity is unconditional for any arrival order
    merged = set(mins)
    merged.update(_kmv_hash_py(u) for u in whole["user_id"])
    mins = sorted(merged)[:KMV_K]
    out: list[tuple] = []
    if tuple(mins) != before:
        n = len(mins)
        kth = mins[KMV_K - 1] if n == KMV_K else None
        est = (
            (KMV_K - 1) * _KMV_DOMAIN // max(kth, 1)
            if kth is not None
            else n
        )
        out.append((key[0], n, kth if kth is not None else -1, est))
    if ttl_ms is None:
        state.update((mins,))
    else:
        last_ms = max(int(prev_last), int(whole["ts"].max().value // 1_000_000))
        state.update((mins, last_ms))
        state.setTimeoutTimestamp(last_ms + ttl_ms)
    yield (
        pd.DataFrame(out, columns=[f.name for f in KMV_OUTPUT_SCHEMA.fields])
        if out
        else empty
    )


CM_ROWS = 4
CM_WIDTH = 512

CM_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("probe_user", T.LongType()),
        T.StructField("est_c", T.LongType()),
    ]
)

# the sketch IS the state: the flattened ROWS x WIDTH int64 cell
# matrix (plus the total event count for observability)
CM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("cells", T.ArrayType(T.LongType())),
        T.StructField("n_events", T.LongType()),
    ]
)
CM_STATE_TTL_SCHEMA = T.StructType(
    [*CM_STATE_SCHEMA.fields, T.StructField("last_ms", T.LongType())]
)


def _cm_coeffs() -> list[tuple[int, int]]:
    from target_hdfs_spark.functions.hashing import hash_coeffs

    return hash_coeffs(CM_ROWS)


def _cm_buckets(user_id: int) -> list[int]:
    """The CM_ROWS bucket indices for a user — q240's bucket function
    verbatim ((a*h + b) mod Mersenne mod width over the portable
    md5-32 base hash), so a batch rebuild is bit-identical."""
    from target_hdfs_spark.functions.hashing import MERSENNE_P

    h = _kmv_hash_py(user_id)
    return [(a * h + b) % MERSENNE_P % CM_WIDTH for a, b in _cm_coeffs()]


def _cm_group(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    probe_users: tuple[int, ...],
    ttl_ms: int | None = None,
) -> Iterable[pd.DataFrame]:
    empty = pd.DataFrame(
        {"event_type": [], "probe_user": [], "est_c": []}
    ).astype({"event_type": "object", "probe_user": "int64", "est_c": "int64"})
    if state.hasTimedOut:
        state.remove()
        yield empty
        return
    if state.exists:
        stored = state.get
        cells = list(stored[0])
        n_events = int(stored[1])
        prev_last = stored[2] if ttl_ms is not None else 0
    else:
        cells, n_events, prev_last = [0] * (CM_ROWS * CM_WIDTH), 0, 0

    def estimate(user: int) -> int:
        bkts = _cm_buckets(user)
        return min(cells[r * CM_WIDTH + bkts[r]] for r in range(CM_ROWS))

    before = {u: estimate(u) for u in probe_users}
    whole = pd.concat(list(pdfs), ignore_index=True)
    # counter addition is a commutative monoid: merge order cannot
    # matter, so batch parity is unconditional for any arrival order
    # (the same argument as KMV's bottom-k semilattice, on +)
    for u in whole["user_id"]:
        for r, bkt in enumerate(_cm_buckets(int(u))):
            cells[r * CM_WIDTH + bkt] += 1
    n_events += len(whole)
    out = [
        (key[0], u, estimate(u))
        for u in probe_users
        if estimate(u) != before[u]
    ]
    if ttl_ms is None:
        state.update((cells, n_events))
    else:
        last_ms = max(int(prev_last), int(whole["ts"].max().value // 1_000_000))
        state.update((cells, n_events, last_ms))
        state.setTimeoutTimestamp(last_ms + ttl_ms)
    yield (
        pd.DataFrame(out, columns=[f.name for f in CM_OUTPUT_SCHEMA.fields])
        if out
        else empty
    )


def countmin_stream(
    events: DataFrame,
    probe_users: tuple[int, ...],
    state_ttl_ms: int | None = None,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Streaming COUNT-MIN frequency sketch per event type — the
    frequency-sketch companion to kmv_distinct_stream (r7 verdict
    item 8), completing the streaming sketch story: KMV answers "how
    many DISTINCT users", this answers "how often has user u done X".
    State IS the sketch: the {CM_ROWS}x{CM_WIDTH} int64 cell matrix
    (16 KB/key, flat forever — the whole point of a sketch), built
    with q240_countmin_calibration's exact bucket function, so a batch
    rebuild of the same matrix verifies the stream's readout
    value-exactly. Counter addition is a commutative monoid, so the
    final sketch equals the batch sketch for ANY arrival permutation
    and batch split — the same unconditional-parity-by-algebra
    argument as KMV's bottom-k semilattice, with + in place of min.

    Emission contract: one row per probe user whose point estimate
    (min over rows of its cells — never an underestimate) CHANGED this
    batch; sink latest-per-(event_type, probe_user) = current
    estimate. Probes are fixed at query start (the production shape:
    a dashboard watches known-hot entities; ad-hoc probes replay the
    sketch from the state store).

    ``state_ttl_ms`` gives sliding-population semantics (an idle
    type's matrix evicts); ``None`` accumulates forever at 16 KB/key.

    `events` must be a streaming DataFrame with columns
    (user_id, event_id, ts, event_type).
    """
    probes = tuple(int(u) for u in probe_users)
    if not probes:
        raise ValueError("countmin_stream requires at least one probe user")

    def fn(key, pdfs, state):
        return _cm_group(key, pdfs, state, probes, state_ttl_ms)

    if state_ttl_ms is None:
        src, schema, timeout = events, CM_STATE_SCHEMA, GroupStateTimeout.NoTimeout
    else:
        src = events.withWatermark("ts", watermark_delay)
        schema, timeout = CM_STATE_TTL_SCHEMA, GroupStateTimeout.EventTimeTimeout
    return src.groupBy("event_type").applyInPandasWithState(
        fn,
        outputStructType=CM_OUTPUT_SCHEMA,
        stateStructType=schema,
        outputMode="append",
        timeoutConf=timeout,
    )


BLOOM_K = 4
BLOOM_M = 4096

BLOOM_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("probe_user", T.LongType()),
        T.StructField("is_positive", T.BooleanType()),
    ]
)

# the filter IS the state: the sorted distinct set-bit positions
# (<= BLOOM_M int64s; typically far fewer)
BLOOM_STATE_SCHEMA = T.StructType(
    [T.StructField("pos", T.ArrayType(T.LongType()))]
)
BLOOM_STATE_TTL_SCHEMA = T.StructType(
    [*BLOOM_STATE_SCHEMA.fields, T.StructField("last_ms", T.LongType())]
)


def _bloom_positions(user_id: int) -> list[int]:
    """q250_bloom_calibration's position function verbatim: BLOOM_K
    (coefficient-family) hashes of the portable md5-32 base hash,
    mod BLOOM_M — a batch rebuild is bit-identical."""
    from target_hdfs_spark.functions.hashing import MERSENNE_P, hash_coeffs

    h = _kmv_hash_py(user_id)
    return [(a * h + b) % MERSENNE_P % BLOOM_M for a, b in hash_coeffs(BLOOM_K)]


def _bloom_group(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    probe_users: tuple[int, ...],
    ttl_ms: int | None = None,
) -> Iterable[pd.DataFrame]:
    empty = pd.DataFrame(
        {"event_type": [], "probe_user": [], "is_positive": []}
    ).astype(
        {"event_type": "object", "probe_user": "int64", "is_positive": "bool"}
    )
    if state.hasTimedOut:
        state.remove()
        yield empty
        return
    if state.exists:
        stored = state.get
        pos = set(stored[0])
        prev_last = stored[1] if ttl_ms is not None else 0
    else:
        pos, prev_last = set(), 0

    def positive(user: int) -> bool:
        return all(p in pos for p in _bloom_positions(user))

    before = {u: positive(u) for u in probe_users}
    whole = pd.concat(list(pdfs), ignore_index=True)
    # set union is a semilattice: merge order cannot matter, so batch
    # parity is unconditional for any arrival order (KMV's argument
    # with union in place of bottom-k)
    for u in whole["user_id"]:
        pos.update(_bloom_positions(int(u)))
    # membership is MONOTONE (bits only get set), so the only change
    # a probe can report is negative -> positive
    out = [
        (key[0], u, True)
        for u in probe_users
        if positive(u) and not before[u]
    ]
    if ttl_ms is None:
        state.update((sorted(pos),))
    else:
        last_ms = max(int(prev_last), int(whole["ts"].max().value // 1_000_000))
        state.update((sorted(pos), last_ms))
        state.setTimeoutTimestamp(last_ms + ttl_ms)
    yield (
        pd.DataFrame(out, columns=[f.name for f in BLOOM_OUTPUT_SCHEMA.fields])
        if out
        else empty
    )


def bloom_filter_stream(
    events: DataFrame,
    probe_users: tuple[int, ...],
    state_ttl_ms: int | None = None,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Streaming BLOOM membership filter per event type — the
    membership twin completing the streaming sketch trio
    (kmv_distinct_stream = distinct, countmin_stream = frequency,
    this = membership). State IS the filter: the distinct set-bit
    positions (<= {BLOOM_M} int64s, the relational bit array), built
    with q250_bloom_calibration's exact position function, so a batch
    rebuild verifies the stream value-exactly. Set union is a
    semilattice, so the final filter equals the batch filter for ANY
    arrival permutation and batch split — unconditional parity by
    algebra, the family argument (min for KMV, + for CountMin, union
    here).

    Emission contract: membership is monotone (bits only get set), so
    per FILTER LIFETIME a probe emits exactly one row — (event_type,
    probe_user, true) in the batch where it first turns positive; sink
    presence IS current membership. With ``state_ttl_ms`` set the
    filter can evict and a re-inserted probe re-emits on its next
    positive transition (the TTL test pins the two-row re-arm), so
    the single-emission contract holds only in no-TTL mode. Bloom semantics carry over: no false negatives
    (an inserted probe always turns positive), false positives at the
    calibrated q250 rate.

    ``state_ttl_ms`` gives sliding-population semantics (an idle
    type's filter evicts); ``None`` accumulates forever, bounded by
    {BLOOM_M} positions regardless of stream length — the point of a
    Bloom filter.

    `events` must be a streaming DataFrame with columns
    (user_id, event_id, ts, event_type).
    """
    probes = tuple(int(u) for u in probe_users)
    if not probes:
        raise ValueError("bloom_filter_stream requires at least one probe user")

    def fn(key, pdfs, state):
        return _bloom_group(key, pdfs, state, probes, state_ttl_ms)

    if state_ttl_ms is None:
        src, schema, timeout = (
            events,
            BLOOM_STATE_SCHEMA,
            GroupStateTimeout.NoTimeout,
        )
    else:
        src = events.withWatermark("ts", watermark_delay)
        schema, timeout = (
            BLOOM_STATE_TTL_SCHEMA,
            GroupStateTimeout.EventTimeTimeout,
        )
    return src.groupBy("event_type").applyInPandasWithState(
        fn,
        outputStructType=BLOOM_OUTPUT_SCHEMA,
        stateStructType=schema,
        outputMode="append",
        timeoutConf=timeout,
    )


def kmv_distinct_stream(
    events: DataFrame,
    state_ttl_ms: int | None = None,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Streaming KMV (bottom-k) distinct-user sketch per event type:
    O(k) state per key (the k smallest portable hashes — the sketch
    IS the state), one row emitted whenever a batch CHANGES a key's
    sketch (sink latest-per-key = current sketch). Because bottom-k
    of a set union is a semilattice, the final sketch equals batch
    q239's for ANY arrival permutation and batch split —
    unconditional parity with zero ordering machinery (the parity
    test shuffles the log to pin exactly this). est_distinct follows
    q239's estimator; kth_hash is -1 while the sketch holds fewer
    than k hashes (the estimate is then exact by construction).

    The q20 contrast, streaming edition: approx_count_distinct's HLL
    state is engine-internal; this sketch's state is portable
    integers, so the batch oracle can verify the STREAM's readout
    value-exactly. TTL gives sliding-population semantics (an idle
    type's sketch evicts); None accumulates forever at 8k bytes/key.

    `events` must be a streaming DataFrame with columns
    (user_id, event_id, ts, event_type).
    """

    def fn(key, pdfs, state):
        return _kmv_group(key, pdfs, state, state_ttl_ms)

    if state_ttl_ms is None:
        src, schema, timeout = events, KMV_STATE_SCHEMA, GroupStateTimeout.NoTimeout
    else:
        src = events.withWatermark("ts", watermark_delay)
        schema, timeout = KMV_STATE_TTL_SCHEMA, GroupStateTimeout.EventTimeTimeout
    return src.groupBy("event_type").applyInPandasWithState(
        fn,
        outputStructType=KMV_OUTPUT_SCHEMA,
        stateStructType=schema,
        outputMode="append",
        timeoutConf=timeout,
    )


# ---------------------------------------------------------------------------
# quantile_stream (stateful quantile-sketch twin of
# q253/q255's fixed-boundary histogram; r8 verdict item 1 — the
# fourth and final streaming sketch)
# ---------------------------------------------------------------------------

# Must equal analytics._QSK_EV_W / _QSK_EV_NBKT (the batch events
# instance) so a batch rebuild of the stream's state is bit-identical;
# tests/test_stateful.py pins the cross-module equality AND the
# bucket function against the oracle-side SQL formula.
QSK_W = 64  # bucket width in integer cents
QSK_NBKT = 1024  # dense cell count -> domain [0, 65536) cents

QSK_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("q_pct", T.LongType()),
        T.StructField("est", T.LongType()),
        T.StructField("n_obs", T.LongType()),
    ]
)

# the sketch IS the state: the dense bucket-count array (8 KB/key,
# flat forever) plus the observation count
QSK_STATE_SCHEMA = T.StructType(
    [
        T.StructField("cells", T.ArrayType(T.LongType())),
        T.StructField("n", T.LongType()),
    ]
)
QSK_STATE_TTL_SCHEMA = T.StructType(
    [*QSK_STATE_SCHEMA.fields, T.StructField("last_ms", T.LongType())]
)


def _qsk_bucket_py(value: float) -> int:
    """q255's bucket function verbatim (floor(value*100) cents,
    clamped into the fixed domain, integer-divided by the width) —
    a batch rebuild of the histogram is bit-identical."""
    cents = int(math.floor(value * 100))
    return min(max(cents, 0), QSK_W * QSK_NBKT - 1) // QSK_W


def _qsk_estimate_py(cells: list[int], n: int, q_pct: int) -> int | None:
    """The shared readout convention: midpoint of the first bucket
    whose cumulative count covers rank ceil(n*q/100)."""
    if n <= 0:
        return None
    rank = (n * q_pct + 99) // 100
    cum = 0
    for b, c in enumerate(cells):
        if c:
            cum += c
            if cum >= rank:
                return b * QSK_W + QSK_W // 2
    return None  # unreachable while sum(cells) == n


def _qsk_group(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    probe_pcts: tuple[int, ...],
    ttl_ms: int | None = None,
) -> Iterable[pd.DataFrame]:
    empty = pd.DataFrame(
        {"event_type": [], "q_pct": [], "est": [], "n_obs": []}
    ).astype(
        {
            "event_type": "object",
            "q_pct": "int64",
            "est": "int64",
            "n_obs": "int64",
        }
    )
    if state.hasTimedOut:
        state.remove()
        yield empty
        return
    if state.exists:
        stored = state.get
        cells = list(stored[0])
        n = int(stored[1])
        prev_last = stored[2] if ttl_ms is not None else 0
    else:
        cells, n, prev_last = [0] * QSK_NBKT, 0, 0

    before = {q: _qsk_estimate_py(cells, n, q) for q in probe_pcts}
    whole = pd.concat(list(pdfs), ignore_index=True)
    # histogram cell addition is a commutative monoid (q254's merge
    # law): merge order cannot matter, so batch parity is
    # unconditional for any arrival order — CountMin's argument on
    # the quantile sketch's cells
    for v in whole["value"]:
        cells[_qsk_bucket_py(float(v))] += 1
    n += len(whole)
    after = {q: _qsk_estimate_py(cells, n, q) for q in probe_pcts}
    out = [
        (key[0], q, after[q], n) for q in probe_pcts if after[q] != before[q]
    ]
    if ttl_ms is None:
        state.update((cells, n))
    else:
        last_ms = max(int(prev_last), int(whole["ts"].max().value // 1_000_000))
        state.update((cells, n, last_ms))
        state.setTimeoutTimestamp(last_ms + ttl_ms)
    yield (
        pd.DataFrame(out, columns=[f.name for f in QSK_OUTPUT_SCHEMA.fields])
        if out
        else empty
    )


def quantile_stream(
    events: DataFrame,
    probe_pcts: tuple[int, ...] = (50, 90, 99),
    state_ttl_ms: int | None = None,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Streaming QUANTILE sketch per event type — the fourth and
    final streaming sketch (kmv_distinct_stream = distinct,
    countmin_stream = frequency, bloom_filter_stream = membership,
    this = quantiles: the rolling length/score cutoffs a corpus
    pipeline prices continuously). State IS the sketch: the dense
    {QSK_NBKT}-cell int64 histogram (8 KB/key, flat forever) built
    with q255's exact bucket function over integer cents, so a batch
    rebuild of the same cells verifies the stream's readout
    value-exactly. Histogram cell addition is a commutative monoid —
    q254's merge-law theorem — so the final sketch equals the batch
    sketch for ANY arrival permutation and batch split: unconditional
    parity by algebra, the family argument (min for KMV, + for
    CountMin and for these cells, union for Bloom).

    Emission contract: one row per probed percentile whose midpoint
    estimate CHANGED this batch (estimates move both ways as the
    distribution shifts, so rows carry the monotone n_obs —
    sink row with max n_obs per (event_type, q_pct) = current
    estimate). Probes are fixed percentiles (1..100) at query start.

    ``state_ttl_ms`` gives sliding-population semantics (an idle
    type's histogram evicts); ``None`` accumulates forever at
    8 KB/key — the point of a sketch.

    `events` must be a streaming DataFrame with columns
    (user_id, event_id, ts, event_type, value).
    """
    probes = tuple(int(q) for q in probe_pcts)
    if not probes:
        raise ValueError("quantile_stream requires at least one probe percentile")
    if any(q < 1 or q > 100 for q in probes):
        raise ValueError("probe percentiles must be integers in 1..100")

    def fn(key, pdfs, state):
        return _qsk_group(key, pdfs, state, probes, state_ttl_ms)

    if state_ttl_ms is None:
        src, schema, timeout = (
            events,
            QSK_STATE_SCHEMA,
            GroupStateTimeout.NoTimeout,
        )
    else:
        src = events.withWatermark("ts", watermark_delay)
        schema, timeout = (
            QSK_STATE_TTL_SCHEMA,
            GroupStateTimeout.EventTimeTimeout,
        )
    return src.groupBy("event_type").applyInPandasWithState(
        fn,
        outputStructType=QSK_OUTPUT_SCHEMA,
        stateStructType=schema,
        outputMode="append",
        timeoutConf=timeout,
    )


# ---------------------------------------------------------------------------
# reservoir_stream (stateful twin of q262_reservoir_sample — the
# fourteenth twin: the SAMPLE is the state)
# ---------------------------------------------------------------------------

RSV_K = 8  # must equal curation._RSV_K (cross-module pin in tests)

RSV_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n_seen", T.LongType()),
        T.StructField("sample_ids", T.StringType()),
    ]
)

# the reservoir IS the state: the k smallest (hash, id) pairs plus
# the stream length
RSV_STATE_SCHEMA = T.StructType(
    [
        T.StructField("hv", T.ArrayType(T.LongType())),
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("n", T.LongType()),
    ]
)
RSV_STATE_TTL_SCHEMA = T.StructType(
    [*RSV_STATE_SCHEMA.fields, T.StructField("last_ms", T.LongType())]
)


def _rsv_hash_py(event_id: int) -> int:
    """q262's salted hash verbatim — a batch rebuild of the sample is
    bit-identical."""
    return int(
        hashlib.md5(f"rsv|{event_id}".encode()).hexdigest()[:8], 16
    )


def _rsv_group(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    k: int,
    ttl_ms: int | None = None,
) -> Iterable[pd.DataFrame]:
    empty = pd.DataFrame(
        {"event_type": [], "n_seen": [], "sample_ids": []}
    ).astype(
        {"event_type": "object", "n_seen": "int64", "sample_ids": "object"}
    )
    if state.hasTimedOut:
        state.remove()
        yield empty
        return
    if state.exists:
        stored = state.get
        members = list(zip(stored[0], stored[1]))
        n = int(stored[2])
        prev_last = stored[3] if ttl_ms is not None else 0
    else:
        members, n, prev_last = [], 0, 0

    before = list(members)
    whole = pd.concat(list(pdfs), ignore_index=True)
    # bottom-k of a union is the union's bottom-k (KMV's semilattice
    # on the sample members themselves): merge order cannot matter,
    # so the final sample equals the batch bottom-k for ANY arrival
    # permutation and batch split
    for e in whole["event_id"]:
        members.append((_rsv_hash_py(int(e)), int(e)))
    members = sorted(set(members))[:k]
    n += len(whole)
    if members != before:
        out = pd.DataFrame(
            [
                (
                    key[0],
                    n,
                    ",".join(str(eid) for _, eid in members),
                )
            ],
            columns=[f.name for f in RSV_OUTPUT_SCHEMA.fields],
        )
    else:
        out = empty
    hv = [h for h, _ in members]
    ids = [eid for _, eid in members]
    if ttl_ms is None:
        state.update((hv, ids, n))
    else:
        last_ms = max(int(prev_last), int(whole["ts"].max().value // 1_000_000))
        state.update((hv, ids, n, last_ms))
        state.setTimeoutTimestamp(last_ms + ttl_ms)
    yield out


def reservoir_stream(
    events: DataFrame,
    k: int = RSV_K,
    state_ttl_ms: int | None = None,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Streaming DETERMINISTIC RESERVOIR per event type — an exact-k
    uniform sample of an unbounded stream maintained with O(k) state:
    the k smallest (salted-hash, id) pairs, q262's rule verbatim, so
    a batch rebuild over the same events is bit-identical. The sample
    IS the state, and bottom-k of a union is a semilattice (KMV's
    algebra applied to the members instead of the estimator), so the
    final sample equals batch q262's for ANY arrival permutation and
    batch split — unconditional parity, the family argument. This is
    what rand()-reservoir algorithms (Vitter's R) give you with RNG
    and ordering sensitivity, made deterministic, mergeable, and
    restart-safe for free.

    Emission contract: one row per batch in which the sample CHANGED
    — (event_type, n_seen, comma-joined sample ids); rows carry the
    monotone n_seen, so sink row with max n_seen per type = current
    sample. A batch that displaces nothing emits nothing (the
    expected case once n >> k: displacement probability is ~k/n).

    ``state_ttl_ms`` gives sliding-population semantics (an idle
    type's sample evicts); ``None`` maintains the all-time sample at
    2k int64s per key forever.

    `events` must be a streaming DataFrame with columns
    (user_id, event_id, ts, event_type).
    """
    kk = int(k)
    if kk < 1:
        raise ValueError("reservoir_stream requires k >= 1")

    def fn(key, pdfs, state):
        return _rsv_group(key, pdfs, state, kk, state_ttl_ms)

    if state_ttl_ms is None:
        src, schema, timeout = (
            events,
            RSV_STATE_SCHEMA,
            GroupStateTimeout.NoTimeout,
        )
    else:
        src = events.withWatermark("ts", watermark_delay)
        schema, timeout = (
            RSV_STATE_TTL_SCHEMA,
            GroupStateTimeout.EventTimeTimeout,
        )
    return src.groupBy("event_type").applyInPandasWithState(
        fn,
        outputStructType=RSV_OUTPUT_SCHEMA,
        stateStructType=schema,
        outputMode="append",
        timeoutConf=timeout,
    )


MG_K = 16

MG_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("mg_count", T.LongType()),
        T.StructField("offset", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

# the summary IS the state: <= MG_K (user, counter) pairs plus the
# cumulative subtracted offset (every counter's worst-case
# undercount) and the observed event count
MG_STATE_SCHEMA = T.StructType(
    [
        T.StructField("users", T.ArrayType(T.LongType())),
        T.StructField("cnts", T.ArrayType(T.LongType())),
        T.StructField("offset", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)
MG_STATE_TTL_SCHEMA = T.StructType(
    [*MG_STATE_SCHEMA.fields, T.StructField("last_ms", T.LongType())]
)


def _mg_trim(counters: dict[int, int]) -> tuple[dict[int, int], int]:
    """The Agarwal et al. merge trim (q146's rule, q276's offset
    form): subtract the (MG_K+1)-th largest counter (tie-break by
    user id — deterministic) from all, drop the non-positive. Returns
    (trimmed counters, subtracted offset)."""
    if len(counters) <= MG_K:
        return counters, 0
    ordered = sorted(counters.items(), key=lambda kv: (-kv[1], kv[0]))
    t = ordered[MG_K][1]
    trimmed = {u: c - t for u, c in counters.items() if c - t > 0}
    return trimmed, t


def _mg_group(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    ttl_ms: int | None = None,
) -> Iterable[pd.DataFrame]:
    cols = [f.name for f in MG_OUTPUT_SCHEMA.fields]
    empty = pd.DataFrame({c: [] for c in cols}).astype(
        {
            "event_type": "object",
            "user_id": "int64",
            "mg_count": "int64",
            "offset": "int64",
            "n_events": "int64",
        }
    )
    if state.hasTimedOut:
        state.remove()
        yield empty
        return
    if state.exists:
        stored = state.get
        counters = dict(zip(stored[0], stored[1]))
        offset = int(stored[2])
        n_events = int(stored[3])
        prev_last = stored[4] if ttl_ms is not None else 0
    else:
        counters, offset, n_events, prev_last = {}, 0, 0, 0

    before = dict(counters)
    whole = pd.concat(list(pdfs), ignore_index=True)
    # batch-at-a-time like q146: the batch's EXACT value_counts (a
    # zero-offset summary) merges by counter addition, then one trim
    # restores the k-bound. Within a batch the result is order-free
    # (value_counts is exact); across batch splits MG is NOT
    # homomorphic — the contract is q276's bounded undercount
    # (undercount <= offset <= n/(k+1)), which holds for EVERY split.
    for u, c in whole["user_id"].value_counts().items():
        counters[int(u)] = counters.get(int(u), 0) + int(c)
    counters, t = _mg_trim(counters)
    offset += t
    n_events += len(whole)
    changed = [
        (key[0], u, c, offset, n_events)
        for u, c in sorted(counters.items())
        if before.get(u) != c
    ]
    dropped = [
        (key[0], u, 0, offset, n_events)
        for u in sorted(before)
        if u not in counters
    ]
    out = changed + dropped
    users = sorted(counters)
    cnts = [counters[u] for u in users]
    if ttl_ms is None:
        state.update((users, cnts, offset, n_events))
    else:
        last_ms = max(int(prev_last), int(whole["ts"].max().value // 1_000_000))
        state.update((users, cnts, offset, n_events, last_ms))
        state.setTimeoutTimestamp(last_ms + ttl_ms)
    yield pd.DataFrame(out, columns=cols) if out else empty


def mg_heavy_hitters_stream(
    events: DataFrame,
    state_ttl_ms: int | None = None,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Streaming MISRA-GRIES heavy-hitter summary per event type —
    the FIFTH streaming sketch twin (distinct = kmv_distinct_stream,
    frequency = countmin_stream, membership = bloom_filter_stream,
    quantiles = quantile_stream, frequency-top-k = THIS), and the one
    whose contract is deliberately different in kind: MG is mergeable
    but NOT homomorphic, so the twin does not promise bit-parity with
    a batch rebuild under arbitrary re-batching — it promises q276's
    theorem, which no split can break: every tracked counter
    undercounts its exact frequency by at most the emitted ``offset``,
    ``offset * (k+1) <= n_events``, and every TRUE heavy hitter
    (exact count > n/(k+1)) is tracked. Within a batch the update IS
    order-free (exact value_counts + one Agarwal trim — q146's
    batch-at-a-time rule), and a single-batch stream reproduces the
    q276 offset form bit-exactly (test-pinned).

    State: <= {MG_K} (user, counter) pairs + the cumulative offset —
    a few hundred bytes per key, flat forever. Emission: counters
    that changed this batch (plus 0-rows for trimmed-away users);
    sink latest-per-(event_type, user) = the current summary.

    ``state_ttl_ms`` evicts idle types (sliding-population mode).

    `events` must be a streaming DataFrame with columns
    (user_id, event_id, ts, event_type).
    """

    def fn(key, pdfs, state):
        return _mg_group(key, pdfs, state, state_ttl_ms)

    if state_ttl_ms is None:
        src, schema, timeout = (
            events,
            MG_STATE_SCHEMA,
            GroupStateTimeout.NoTimeout,
        )
    else:
        src = events.withWatermark("ts", watermark_delay)
        schema, timeout = MG_STATE_TTL_SCHEMA, GroupStateTimeout.EventTimeTimeout
    return src.groupBy("event_type").applyInPandasWithState(
        fn,
        outputStructType=MG_OUTPUT_SCHEMA,
        stateStructType=schema,
        outputMode="append",
        timeoutConf=timeout,
    )


# ---------------------------------------------------------------------------
# Online packing offsets (stateful twin of operators/packing.py's
# packed_token_frame — the streaming half of the two-pass prefix sum)
# ---------------------------------------------------------------------------

PACK_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("bkt", T.LongType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_toks", T.LongType()),
        T.StructField("cum_in_before", T.LongType()),
        T.StructField("n_docs", T.LongType()),
    ]
)

# running (tokens_so_far, docs_so_far): 16 bytes per bucket, flat
# forever — the batch scan's bucket-local window folded online
PACK_STATE_SCHEMA = T.StructType(
    [
        T.StructField("toks", T.LongType()),
        T.StructField("n_docs", T.LongType()),
    ]
)
PACK_STATE_TTL_SCHEMA = T.StructType(
    [*PACK_STATE_SCHEMA.fields, T.StructField("last_ms", T.LongType())]
)


def _pack_group(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    ttl_ms: int | None = None,
) -> Iterable[pd.DataFrame]:
    cols = ["bkt", "doc_id", "n_toks", "cum_in_before", "n_docs"]
    empty = pd.DataFrame({c: [] for c in cols}).astype("int64")
    if state.hasTimedOut:
        # an idle bucket's running offset evicts; a post-gap return
        # starts a fresh segment (exposure-window semantics)
        state.remove()
        yield empty
        return
    if state.exists:
        stored = state.get
        toks, n_docs = int(stored[0]), int(stored[1])
        prev_last = int(stored[2]) if ttl_ms is not None else 0
    else:
        toks, n_docs, prev_last = 0, 0, 0
    whole = pd.concat(list(pdfs), ignore_index=True)
    # the batch training order within the bucket
    whole = whole.sort_values(["ord_h", "doc_id"])
    out_doc, out_toks, out_cum, out_nd = [], [], [], []
    for doc_id, n in zip(
        whole["doc_id"].astype("int64"), whole["n_toks"].astype("int64")
    ):
        out_doc.append(int(doc_id))
        out_toks.append(int(n))
        out_cum.append(toks)
        toks += int(n)
        n_docs += 1
        out_nd.append(n_docs)
    if ttl_ms is None:
        state.update((toks, n_docs))
    else:
        last_ms = max(prev_last, int(whole["ts"].max().value // 1_000_000))
        state.update((toks, n_docs, last_ms))
        state.setTimeoutTimestamp(last_ms + ttl_ms)
    if out_doc:
        yield pd.DataFrame(
            {
                "bkt": [int(key[0])] * len(out_doc),
                "doc_id": out_doc,
                "n_toks": out_toks,
                "cum_in_before": out_cum,
                "n_docs": out_nd,
            }
        ).astype("int64")
    else:
        yield empty


def pack_offset_stream(
    docs: DataFrame,
    state_ttl_ms: int | None = None,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Online packing offsets (stateful twin of packing.py's
    `packed_token_frame`): each arriving document is assigned its
    within-bucket token offset IMMEDIATELY — 16 bytes of state per
    hash bucket carry (tokens_so_far, docs_so_far) across
    micro-batches, so the batch scan's bucket-local window never
    rematerializes. Combining a snapshot's per-bucket totals into
    global offsets is the SAME 64-row broadcast merge the batch
    second pass runs — the streaming and batch halves share one
    algebra, like the sketch twins.

    The bucket key, order hash and tokenizer are the BATCH
    expressions imported from operators/packing.py (structural pin —
    the twin cannot fork from its batch instance). Parity is scoped
    to in-order logs like the other order-sensitive twins
    (ema/balance): on a log delivered in (ord_h, doc_id) order the
    latest per-doc rows equal the batch frame's (bkt, cum_in) exactly.

    ``state_ttl_ms``: an idle bucket evicts once the watermark passes
    last arrival + TTL; a later return starts a fresh packing segment.

    `docs` must be a streaming DataFrame with columns
    (doc_id, text) — plus `ts` when ``state_ttl_ms`` is set (the
    eviction clock is event time).
    """
    from pyspark.sql import functions as F

    from target_hdfs_spark.functions.hashing import md5_hash32
    from target_hdfs_spark.functions.textfuncs import tokens
    from target_hdfs_spark.operators.packing import _PK_BKT_W, _PK_SALT

    base_cols = ["doc_id"] + (["ts"] if state_ttl_ms is not None else [])
    prepared = docs.select(
        *base_cols,
        F.size(tokens("text")).cast("long").alias("n_toks"),
        md5_hash32(
            F.concat(F.lit(_PK_SALT), F.col("doc_id").cast("string"))
        ).alias("ord_h"),
    ).filter(F.col("n_toks") > 0)
    prepared = prepared.withColumn("bkt", F.expr(f"ord_h div {_PK_BKT_W}"))

    def fn(key, pdfs, state):
        return _pack_group(key, pdfs, state, state_ttl_ms)

    if state_ttl_ms is None:
        src, schema, timeout = (
            prepared,
            PACK_STATE_SCHEMA,
            GroupStateTimeout.NoTimeout,
        )
    else:
        src = prepared.withWatermark("ts", watermark_delay)
        schema, timeout = (
            PACK_STATE_TTL_SCHEMA,
            GroupStateTimeout.EventTimeTimeout,
        )
    return src.groupBy("bkt").applyInPandasWithState(
        fn,
        outputStructType=PACK_OUTPUT_SCHEMA,
        stateStructType=schema,
        outputMode="append",
        timeoutConf=timeout,
    )


# ---------------------------------------------------------------------------
# bucket_batch_stream — stateful twin of q286_length_bucketed_batching
# ---------------------------------------------------------------------------

BATCH_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("bucket_len", T.LongType()),
        T.StructField("n_docs", T.LongType()),
        T.StructField("real_tokens", T.LongType()),
        T.StructField("padded_tokens", T.LongType()),
        T.StructField("waste_ppm", T.LongType()),
        T.StructField("truncated_tokens", T.LongType()),
        T.StructField("n_batches", T.LongType()),
    ]
)

# 24 bytes per power-of-two bucket: the whole padding ledger
BATCH_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_docs", T.LongType()),
        T.StructField("real_tokens", T.LongType()),
        T.StructField("truncated_tokens", T.LongType()),
    ]
)
BATCH_STATE_TTL_SCHEMA = T.StructType(
    [*BATCH_STATE_SCHEMA.fields, T.StructField("last_ms", T.LongType())]
)


def _bucket_batch_group(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    ttl_ms: int | None = None,
) -> Iterable[pd.DataFrame]:
    from target_hdfs_spark.operators.packing import _LBB_CAP

    cols = [f.name for f in BATCH_OUTPUT_SCHEMA.fields]
    empty = pd.DataFrame({c: [] for c in cols}).astype("int64")
    if state.hasTimedOut:
        state.remove()
        yield empty
        return
    if state.exists:
        stored = state.get
        n_docs, real, trunc = int(stored[0]), int(stored[1]), int(stored[2])
        prev_last = stored[3] if ttl_ms is not None else 0
    else:
        n_docs, real, trunc, prev_last = 0, 0, 0, 0
    whole = pd.concat(list(pdfs), ignore_index=True)
    # (count, sum, sum) is a commutative monoid: parity with the batch
    # q286 row is unconditional for ANY arrival order and batch split
    # (countmin's argument with integer + throughout)
    n_docs += len(whole)
    real += int(whole["eff"].sum())
    trunc += int((whole["n_toks"] - whole["eff"]).sum())
    if ttl_ms is None:
        state.update((n_docs, real, trunc))
    else:
        last_ms = max(int(prev_last), int(whole["ts"].max().value // 1_000_000))
        state.update((n_docs, real, trunc, last_ms))
        state.setTimeoutTimestamp(last_ms + ttl_ms)
    b = int(key[0])
    padded = n_docs * b
    cap = _LBB_CAP // b
    yield pd.DataFrame(
        [
            (
                b,
                n_docs,
                real,
                padded,
                (padded - real) * 1_000_000 // padded,
                trunc,
                (n_docs + cap - 1) // cap,
            )
        ],
        columns=cols,
    )


def bucket_batch_stream(
    docs: DataFrame,
    state_ttl_ms: int | None = None,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Online length-bucketed batching ledger (stateful twin of
    q286_length_bucketed_batching, the 17th twin): each arriving
    document is truncated at the batch op's ctx cap, routed map-side
    to its smallest power-of-two bucket — the SAME integer CASE chain
    the batch query and its oracle share (imported, structural pin) —
    and 24 bytes of state per bucket carry (n_docs, real_tokens,
    truncated_tokens). Every micro-batch emits the bucket's full
    updated row (padding waste ppm, batch count); sink
    latest-per-bucket = the batch q286 table over the same log
    prefix.

    Parity is UNCONDITIONAL for any arrival order and batch split —
    (count, sum, sum) is a commutative monoid, the countmin/KMV
    argument with + throughout — and state is bounded by construction
    at <= |power-of-two buckets| (12 at ctx 2048) rows at ANY scale.

    ``state_ttl_ms``: an idle bucket evicts once the watermark passes
    last arrival + TTL; a later doc starts a fresh ledger segment.

    `docs` must be a streaming DataFrame with columns (doc_id, text)
    — plus `ts` when ``state_ttl_ms`` is set.
    """
    from pyspark.sql import functions as F

    from target_hdfs_spark.functions.textfuncs import tokens
    from target_hdfs_spark.operators.packing import _LBB_CAP, _bucket_case_sql

    base_cols = ["ts"] if state_ttl_ms is not None else []
    prepared = (
        docs.select(
            *base_cols,
            F.size(tokens("text")).cast("long").alias("n_toks"),
        )
        .filter(F.col("n_toks") > 0)
        .withColumn("eff", F.least(F.col("n_toks"), F.lit(_LBB_CAP)))
        .withColumn("bucket_len", F.expr(_bucket_case_sql("eff")))
    )

    def fn(key, pdfs, state):
        return _bucket_batch_group(key, pdfs, state, state_ttl_ms)

    if state_ttl_ms is None:
        src, schema, timeout = (
            prepared,
            BATCH_STATE_SCHEMA,
            GroupStateTimeout.NoTimeout,
        )
    else:
        src = prepared.withWatermark("ts", watermark_delay)
        schema, timeout = (
            BATCH_STATE_TTL_SCHEMA,
            GroupStateTimeout.EventTimeTimeout,
        )
    return src.groupBy("bucket_len").applyInPandasWithState(
        fn,
        outputStructType=BATCH_OUTPUT_SCHEMA,
        stateStructType=schema,
        outputMode="append",
        timeoutConf=timeout,
    )


# ---------------------------------------------------------------------------
# pii_scan_stream — stateful twin of q291_pii_redaction_pricing
# ---------------------------------------------------------------------------

PII_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("pii_class", T.StringType()),
        T.StructField("n_docs_hit", T.LongType()),
        T.StructField("total_matches", T.LongType()),
        T.StructField("matched_chars", T.LongType()),
        T.StructField("hit_doc_ppm", T.LongType()),
        T.StructField("residual_matches", T.LongType()),
    ]
)

# 40 bytes per pattern class: the whole scrub-audit ledger
PII_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_docs", T.LongType()),
        T.StructField("n_hit", T.LongType()),
        T.StructField("n_matches", T.LongType()),
        T.StructField("match_chars", T.LongType()),
        T.StructField("residual", T.LongType()),
    ]
)
PII_STATE_TTL_SCHEMA = T.StructType(
    [*PII_STATE_SCHEMA.fields, T.StructField("last_ms", T.LongType())]
)


def _pii_scan_group(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    ttl_ms: int | None = None,
) -> Iterable[pd.DataFrame]:
    cols = [f.name for f in PII_OUTPUT_SCHEMA.fields]
    empty = pd.DataFrame({c: [] for c in cols})
    if state.hasTimedOut:
        state.remove()
        yield empty
        return
    if state.exists:
        stored = state.get
        n_docs, n_hit, n_m, chars, resid = (int(v) for v in stored[:5])
        prev_last = stored[5] if ttl_ms is not None else 0
    else:
        n_docs, n_hit, n_m, chars, resid, prev_last = 0, 0, 0, 0, 0, 0
    whole = pd.concat(list(pdfs), ignore_index=True)
    # every counter is an integer sum — a commutative monoid, so
    # parity with the batch q291 row is unconditional for ANY arrival
    # order and micro-batch split (the countmin/KMV argument)
    n_docs += len(whole)
    n_hit += int((whole["n_matches"] > 0).sum())
    n_m += int(whole["n_matches"].sum())
    chars += int(whole["match_chars"].sum())
    resid += int(whole["residual"].sum())
    if ttl_ms is None:
        state.update((n_docs, n_hit, n_m, chars, resid))
    else:
        last_ms = max(int(prev_last), int(whole["ts"].max().value // 1_000_000))
        state.update((n_docs, n_hit, n_m, chars, resid, last_ms))
        state.setTimeoutTimestamp(last_ms + ttl_ms)
    yield pd.DataFrame(
        [
            (
                str(key[0]),
                n_hit,
                n_m,
                chars,
                n_hit * 1_000_000 // n_docs,
                resid,
            )
        ],
        columns=cols,
    )


def pii_scan_stream(
    docs: DataFrame,
    state_ttl_ms: int | None = None,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Online PII scrub-audit ledger (stateful twin of
    q291_pii_redaction_pricing, the 18th twin): each arriving document
    goes through the SAME map-side scan/redact kernel as the batch
    audit (operators/curation.py::pii_class_rows — imported, so the
    two surfaces cannot drift), and 40 bytes of state per pattern
    class carry (n_docs, n_hit, n_matches, match_chars, residual).
    Every micro-batch emits each touched class's full updated row;
    sink latest-per-class = the batch q291 table over the same log
    prefix — including the derived hit_doc_ppm (Python-int division,
    overflow-free at any scale) and the residual_matches invariant
    (still 0 unless the scrub missed something).

    Parity is UNCONDITIONAL for any arrival order and batch split —
    five integer sums form a commutative monoid — and state is
    bounded by construction at <= |pattern classes| (3) rows at ANY
    scale.

    ``state_ttl_ms``: an idle class evicts once the watermark passes
    last arrival + TTL; a later doc starts a fresh audit segment.

    `docs` must be a streaming DataFrame with columns (doc_id, text)
    — plus `ts` when ``state_ttl_ms`` is set."""
    from target_hdfs_spark.operators.curation import pii_class_rows

    base_cols = ("ts",) if state_ttl_ms is not None else ()
    prepared = pii_class_rows(docs, *base_cols)

    def fn(key, pdfs, state):
        return _pii_scan_group(key, pdfs, state, state_ttl_ms)

    if state_ttl_ms is None:
        src, schema, timeout = (
            prepared,
            PII_STATE_SCHEMA,
            GroupStateTimeout.NoTimeout,
        )
    else:
        src = prepared.withWatermark("ts", watermark_delay)
        schema, timeout = (
            PII_STATE_TTL_SCHEMA,
            GroupStateTimeout.EventTimeTimeout,
        )
    return src.groupBy("pii_class").applyInPandasWithState(
        fn,
        outputStructType=PII_OUTPUT_SCHEMA,
        stateStructType=schema,
        outputMode="append",
        timeoutConf=timeout,
    )


# ---------------------------------------------------------------------------
# dsir_model_stream — stateful twin of q290's model-fit stage
# ---------------------------------------------------------------------------

DSIR_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.LongType()),
        T.StructField("cnt_r", T.LongType()),
        T.StructField("cnt_t", T.LongType()),
    ]
)

# 16 bytes per touched feature bucket; bounded at the bucket count
DSIR_STATE_SCHEMA = T.StructType(
    [
        T.StructField("cnt_r", T.LongType()),
        T.StructField("cnt_t", T.LongType()),
    ]
)
DSIR_STATE_TTL_SCHEMA = T.StructType(
    [*DSIR_STATE_SCHEMA.fields, T.StructField("last_ms", T.LongType())]
)


def _dsir_model_group(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    ttl_ms: int | None = None,
) -> Iterable[pd.DataFrame]:
    cols = [f.name for f in DSIR_OUTPUT_SCHEMA.fields]
    empty = pd.DataFrame({c: [] for c in cols}).astype("int64")
    if state.hasTimedOut:
        state.remove()
        yield empty
        return
    if state.exists:
        stored = state.get
        cnt_r, cnt_t = int(stored[0]), int(stored[1])
        prev_last = stored[2] if ttl_ms is not None else 0
    else:
        cnt_r, cnt_t, prev_last = 0, 0, 0
    whole = pd.concat(list(pdfs), ignore_index=True)
    # two integer sums — a commutative monoid: parity with the batch
    # model aggregation is unconditional for any arrival order
    cnt_r += len(whole)
    cnt_t += int(whole["is_tgt"].sum())
    if ttl_ms is None:
        state.update((cnt_r, cnt_t))
    else:
        last_ms = max(int(prev_last), int(whole["ts"].max().value // 1_000_000))
        state.update((cnt_r, cnt_t, last_ms))
        state.setTimeoutTimestamp(last_ms + ttl_ms)
    yield pd.DataFrame([(int(key[0]), cnt_r, cnt_t)], columns=cols)


def dsir_model_stream(
    docs: DataFrame,
    state_ttl_ms: int | None = None,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Online DSIR model fit (stateful twin of q290's model stage,
    the 19th twin): each arriving document explodes map-side into its
    hashed word-bigram bucket rows — the SAME gram/bucket expressions
    as the batch model (operators/curation.py, imported constants) —
    and 16 bytes of state per touched bucket carry (cnt_r, cnt_t):
    raw and target-slice gram-occurrence counts. Every micro-batch
    emits each touched bucket's full updated row; sink
    latest-per-bucket = the batch model aggregation over the same log
    prefix, from which the importance-ratio table (and so per-doc
    scores) is pure arithmetic. This is how an importance-resampling
    selector keeps its model CURRENT while the crawl streams in,
    instead of refitting from scratch (q296 prices when refitting
    matters).

    Parity is UNCONDITIONAL — two integer sums form a commutative
    monoid — and state is bounded by construction at <= the feature
    bucket count (1024) rows at ANY corpus size.

    ``state_ttl_ms``: an idle bucket evicts once the watermark passes
    last arrival + TTL (a decaying model for drifting crawls).

    `docs` must be a streaming DataFrame with (doc_id, lang, text) —
    plus `ts` when ``state_ttl_ms`` is set."""
    from pyspark.sql import functions as F

    from target_hdfs_spark.functions.hashing import md5_hash32
    from target_hdfs_spark.functions.textfuncs import shingles, tokens
    from target_hdfs_spark.operators.curation import (
        _DSIR_B,
        _DSIR_TGT_LANG,
    )

    base_cols = ["ts"] if state_ttl_ms is not None else []
    prepared = (
        docs.select(
            *base_cols,
            F.when(F.col("lang") == _DSIR_TGT_LANG, 1)
            .otherwise(0)
            .alias("is_tgt"),
            tokens("text").alias("toks"),
        )
        .filter(F.size("toks") > 0)
        .select(
            *base_cols,
            "is_tgt",
            F.explode(shingles(F.col("toks"), 2)).alias("gram"),
        )
        .select(
            *base_cols,
            "is_tgt",
            (md5_hash32("gram") % _DSIR_B).alias("bucket"),
        )
    )

    def fn(key, pdfs, state):
        return _dsir_model_group(key, pdfs, state, state_ttl_ms)

    if state_ttl_ms is None:
        src, schema, timeout = (
            prepared,
            DSIR_STATE_SCHEMA,
            GroupStateTimeout.NoTimeout,
        )
    else:
        src = prepared.withWatermark("ts", watermark_delay)
        schema, timeout = (
            DSIR_STATE_TTL_SCHEMA,
            GroupStateTimeout.EventTimeTimeout,
        )
    return src.groupBy("bucket").applyInPandasWithState(
        fn,
        outputStructType=DSIR_OUTPUT_SCHEMA,
        stateStructType=schema,
        outputMode="append",
        timeoutConf=timeout,
    )


# ---------------------------------------------------------------------------
# filter_agreement_stream — stateful twin of q295_filter_agreement
# ---------------------------------------------------------------------------

AGREE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("filter_a", T.StringType()),
        T.StructField("filter_b", T.StringType()),
        T.StructField("n_both", T.LongType()),
        T.StructField("n_only_a", T.LongType()),
        T.StructField("n_only_b", T.LongType()),
        T.StructField("n_neither", T.LongType()),
        T.StructField("agree_ppm", T.LongType()),
        T.StructField("kappa_ppm", T.LongType()),
    ]
)

# 32 bytes per filter pair: the whole agreement ledger
AGREE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("ca", T.LongType()),
        T.StructField("cb", T.LongType()),
        T.StructField("nb", T.LongType()),
    ]
)

_AGREE_PAIRS = (
    ("len", "uniq", "f_len", "f_uniq"),
    ("len", "rep", "f_len", "f_rep"),
    ("len", "stop", "f_len", "f_stop"),
    ("uniq", "rep", "f_uniq", "f_rep"),
    ("uniq", "stop", "f_uniq", "f_stop"),
    ("rep", "stop", "f_rep", "f_stop"),
)


def _kappa_ppm(n: int, ca: int, cb: int, nb: int) -> int:
    """q295's sign-handled exact integer kappa (Python-int twin of
    the engines' DECIMAL/HUGEINT arithmetic — overflow-free)."""
    nn = n - ca - cb + nb
    pe = ca * cb + (n - ca) * (n - cb)
    num = n * (nb + nn) - pe
    den = max(n * n - pe, 1)
    if num < 0:
        return -((1_000_000 * -num) // den)
    return (1_000_000 * num) // den


def _agree_group(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    cols = [f.name for f in AGREE_OUTPUT_SCHEMA.fields]
    if state.exists:
        n, ca, cb, nb = (int(v) for v in state.get)
    else:
        n, ca, cb, nb = 0, 0, 0, 0
    whole = pd.concat(list(pdfs), ignore_index=True)
    # four integer sums — a commutative monoid: parity with the batch
    # q295 row is unconditional for any arrival order and batch split
    n += len(whole)
    ca += int(whole["a"].sum())
    cb += int(whole["b"].sum())
    nb += int((whole["a"] * whole["b"]).sum())
    state.update((n, ca, cb, nb))
    fa, fb = str(key[0]).split("|", 1)
    nn = n - ca - cb + nb
    yield pd.DataFrame(
        [
            (
                fa,
                fb,
                nb,
                ca - nb,
                cb - nb,
                nn,
                (nb + nn) * 1_000_000 // n,
                _kappa_ppm(n, ca, cb, nb),
            )
        ],
        columns=cols,
    )


def filter_agreement_stream(docs: DataFrame) -> DataFrame:
    """Online quality-filter agreement ledger (stateful twin of
    q295_filter_agreement, the 20th twin): each arriving document
    goes through the SAME map-side flag kernel as the batch audit
    (operators/curation.py::filter_flags — imported, so the two
    surfaces cannot drift), unpivots into its 6 filter-pair rows, and
    32 bytes of state per pair carry (n, ca, cb, n_both). Every
    micro-batch emits each pair's full updated confusion quadrant,
    raw agreement, and Cohen's kappa (the sign-handled exact integer
    identity, Python ints — overflow-free at any corpus size); sink
    latest-per-pair = the batch q295 table over the same log prefix.
    The online view answers the ensemble question CONTINUOUSLY: the
    moment two filters' kappa crosses the redundancy threshold, one
    of them can be switched off for the rest of the crawl.

    Parity is UNCONDITIONAL — four integer sums form a commutative
    monoid — and state is bounded by construction at 6 rows (the
    filter-pair count) at ANY scale.

    `docs` must be a streaming DataFrame with a `text` column."""
    from pyspark.sql import functions as F

    from target_hdfs_spark.operators.curation import filter_flags

    flags = filter_flags(docs)
    stack_args = ", ".join(
        f"'{fa}|{fb}', {a}, {b}" for fa, fb, a, b in _AGREE_PAIRS
    )
    prepared = flags.select(
        F.expr(f"stack(6, {stack_args}) AS (pair, a, b)")
    )
    return prepared.groupBy("pair").applyInPandasWithState(
        _agree_group,
        outputStructType=AGREE_OUTPUT_SCHEMA,
        stateStructType=AGREE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
