"""Synthetic scale sweep for the sketch pipelines (round-2 verdict
item 7) and the embeddings/ANN stack (round-4 verdict item 3): build
10x / 100x versions of the sf0.1 documents AND embeddings tables in
/tmp and measure the sketch queries (q42/q43/q85/q116) plus the
vector queries (q63/q69/q77/q89/q90/q122) on them.

Documents construction: documents x a copy-index frame (a
shuffle-free fan-out), with every token suffixed by the copy index
(`regexp_replace(text, '(\\S+)', '$1_cN')`). Why the token rewrite:
plain copies would make every document a 100-way near-duplicate of
its clones — a degenerate corpus where pair volume is quadratic in
the copy count and every bucket goes hot. Suffixing all tokens makes
cross-copy shingle overlap exactly zero while keeping each copy's
internal duplicate/near-duplicate structure bit-identical to sf0.1 —
so a Kx corpus has K times the documents AND K times the duplicate
pairs: constant duplicate density, which is what "more data" means
for a dedup pipeline.

Embeddings construction: the same fan-out, with copy c's vectors
multiplied coordinate-wise by a copy-specific deterministic sign
pattern s_c[i] in {-1,+1} (hash of (c, i)). Sign flips cancel inside
any within-copy dot product (s²=1), so every copy's internal
neighborhood structure — including the vec_id<5 query set and the
vec_id<16 IVF codebook, which live in copy 0 with their original ids
— is preserved EXACTLY, while cross-copy similarities land in the
random background band: a Kx corpus has K times the vectors at
constant neighborhood density, never K-way duplicate vectors.

Events construction (round 5): the same fan-out with
user_id/event_id stride shifts — K times the users over the same time
range at constant per-user event density, every copy's per-user
sequences (ts order, tie-breaks) bit-identical to sf0.1 — the
"more data" shape for per-user windows (SCD-2, CDC top-1, funnel,
pattern), the attribution interval join, and cohort triangles.

Facts construction (round 4): Kx orders+lineitem with shifted
orderkeys and UNCHANGED 1x dims — the real-scale join shape.

Usage: python scripts/scale_experiment.py [factors...]  (default 10 100)
Families: docs, emb, facts, events run by default; restrict with
--only=fam[,fam] (neardup is opt-in — it needs an SRP-planes env
sweep, see NEARDUP_QUERIES). Fanned tables are written once under
/tmp/spark_graft_scale/ (reused if present); prints per-query
best-of-2 warm timings.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from target_hdfs_spark.registry import all_queries
from target_hdfs_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
ROOT = "/tmp/spark_graft_scale"
QUERIES = (
    "q42_minhash_signatures",
    "q43_minhash_lsh_pairs",
    "q85_dedup_clusters",
    "q116_incremental_dedup",
    "q125_inverted_index",
    "q128_segment_dedup",
    "q129_bm25_topk",
    "q120_minhash_containment",
    "q144_token_lift",
    "q146_heavy_hitters",
    # round 11: banded-prefix-sum rewires — the budget cumsum is a
    # banded_cumsum pass (was a single-task global window); q157/q158
    # now bound their global windows via rank-filter pushdown
    "q150_token_budget_selection",
    "q151_pagerank_dup_graph",
    "q157_diversified_topk",
    "q158_fair_interleave",
    # round 6: bigram-LM scoring (two LM joins over one checkpointed
    # token frame). q171 (leakage-safe split) is q85's swept pipeline
    # plus a map-side bucket expression — it rides q85's numbers.
    "q166_bigram_lm_quality",
    # round 6 continuation: novelty scoring (checkpointed gram pass +
    # gram-keyed min/join)
    "q184_ngram_novelty",
    "q188_retrieval_eval",
    "q200_bpe_merge_candidates",
    # round 7: iteration-2 BPE (argmax merge applied vocab-side)
    "q237_bpe_apply_merge",
    "q203_dedup_roi",
    "q207_dedup_manifest",
    # round 6 continuation: prefix-filter exact similarity join
    # (candidates from rare-shingle prefixes — constant dup density
    # means constant per-copy candidates), largest-remainder exact
    # allocation (|sources| frame + one corpus window), and the
    # sketch-calibration composition (LSH pairs + exact verify +
    # signature compare)
    "q210_prefix_filter_join",
    "q211_stratified_allocation",
    # round 7: source-pair rollup over q92's verified pairs, the
    # dedup strategy planner (one shingle pass -> 1-row decision),
    # and top-k vocabulary stability (WindowGroupLimit ranks).
    # q234 (exact threshold curve) sweeps only to 10x — see
    # DOC_EXPENSIVE_10X.
    "q242_cross_source_redundancy",
    "q243_dedup_planner",
    "q244_topk_stability",
    "q214_sketch_calibration",
    "q232_threshold_sensitivity",
    # serpentine sharding: segmented descending rank + 8-key agg
    "q216_balanced_shards",
    # dup-ngram fraction (one gram pass), 2-round LPA over LSH pairs,
    # vocab profile (vocab-bounded partials), reference-CDF mapping
    "q218_duplicate_ngram_fraction",
    "q219_label_propagation",
    "q220_vocab_growth",
    "q223_quantile_mapping",
    # literal keyword scan (one pass) + inter-source unigram cosine
    # (pair join over the vocab-bounded count frame) + lang-id eval
    "q224_keyword_scan",
    "q225_source_similarity",
    "q231_langid_confusion",
    # coverage curve: vocab-bounded rank frame
    "q226_vocab_coverage",
    # round 7: dyadic frequency spectrum (two stacked aggs) and
    # CountMin build+probe (vocab-bounded after the token count)
    "q238_frequency_spectrum",
    "q240_countmin_calibration",
    # round 8: the full N-round BPE trainer — after the one corpus
    # token count every round is vocab-bounded, so the docs fan-out
    # (which multiplies vocab too, via token suffixing) prices the
    # per-round vocab passes
    "q247_bpe_trainer",
    "q248_bpe_compression",
    # round 9: corpus mixing weights (one token-count pass ->
    # |languages| frame), the deterministic temperature sampler
    # (broadcast plan + map-side hash filter), length-cutoff pricing
    # (histogram pass + broadcast-filter pass), and epoch allocation
    # (token-count pass -> |languages| frame)
    "q256_corpus_mixing_weights",
    "q257_temperature_sampler",
    "q258_length_cutoff_pricing",
    "q259_epoch_allocation",
    # round 9: Bloom decontamination (gram pass + broadcast-bitset
    # probe) and the weight-proportional interleave schedule
    # (partitioned window + TakeOrderedAndProject prefix audit)
    "q260_bloom_decontamination",
    "q261_interleave_schedule",
    # deterministic stratified reservoir (WindowGroupLimit bottom-k)
    # and its merge-law theorem (partials are k-bounded)
    "q262_reservoir_sample",
    "q264_reservoir_merge_law",
    # round 10: packing / training-order family — one distributed
    # prefix-sum pass each (bucket window + broadcast offsets); q278
    # additionally explodes ~tokens/ctx (doc, chunk) rows
    "q278_sequence_packing",
    "q279_packing_ctx_curve",
    "q280_shuffle_uniformity",
    # round 10: ExactSubstr census + surgery (one posexplode pass +
    # map-side gram census; islands on hit rows only)
    "q281_repeated_substring_pricing",
    "q282_substring_surgery_pricing",
    # round 10: survivor-policy delta (rides the q85 pipeline + one
    # cluster-keyed exchange serving both keeper windows)
    "q283_survivor_policy_delta",
    # round 11: banded-prefix-sum percentiles / curriculum phases
    # (one tokenization pass + the bounded-band kernel) and the
    # pad-to-bucket batching table (one pass, map-side buckets)
    "q284_score_percentiles",
    "q285_curriculum_phases",
    "q286_length_bucketed_batching",
    # round 11 (late): curriculum-mixture interaction (ntile pass +
    # |phases| x |sources| shares) and the pack-invalidation ledger
    # (two prefix sums + 2-row delta x ctx grid)
    "q287_phase_mixture_drift",
    "q288_pack_invalidation",
    # round 11 (continuation): DSIR importance table (two gram passes
    # over one checkpointed token frame; 1024-row model broadcast
    # back) and the PII scan/redact audit (one map-side regex pass,
    # 3-row rollup)
    "q290_dsir_importance",
    "q291_pii_redaction_pricing",
    # round 11 (continuation): winnowing — per-doc partitioned window
    # over one shingle pass; the pair join is df-capped before the
    # self-join so bucket fan-out is bounded at cap^2
    "q292_winnowing_fingerprints",
    "q293_winnowing_pairs",
    # round 11 (continuation): DSIR mixture shift (rides the scores
    # pipeline + |sources| rollup) and the filter-agreement audit
    # (one map-side flag pass + 1-row aggregate)
    "q294_dsir_mixture_shift",
    "q295_filter_agreement",
    # round 11 (continuation): DSIR model stability (one gram pass,
    # two 1024-row half-models, top-k on the bucket frame)
    "q296_dsir_model_drift",
    # round 11 (continuation): split balance audit (scan-side split
    # assignment + ~60-row rollup with bounded windows)
    "q297_split_balance_audit",
    # round 11 (continuation): cross-split dup leakage (one scan +
    # |distinct texts| agg + 1-row counters)
    "q298_split_leakage_audit",
    # round 11 (continuation): near-dup split leakage (rides the q92
    # LSH+verify pipeline; map-side split attach, <= 6-row rollup)
    "q299_neardup_split_leakage",
    # round 11 (continuation): the composed release funnel (flag scan
    # + dsir join + one content-hash window + 1-row counters)
    "q300_release_pipeline_v2",
    # round 9 continuation: dataset card — ONE checkpointed corpus
    # pass (hash + tokens + bucket) feeding three map-side-combined
    # rollups; everything after is |sources|-bounded
    "q268_dataset_card",
    # round 9 continuation: contamination spans (broadcast eval grams
    # + one posexplode pass; windows on hit rows only) and the span
    # surgery (token rebuild on the flagged sliver only)
    "q269_contamination_spans",
    "q270_span_surgery",
    # round 9 continuation: boilerplate pricing (one checkpointed
    # tokenization pass -> segment df agg + broadcast totals)
    "q274_boilerplate_pricing",
    # round 9 continuation: the 5-stage release funnel composition
    # (dedup shuffle + broadcast decon probe + sketch cutoff +
    # broadcast sampler + funnel rollup)
    "q271_release_funnel",
)
EMB_QUERIES = (
    "q63_ann_ivf",
    # round 6: integer-exact distributed k-means training (broadcast
    # assign + explode partial-agg per Lloyd round, no driver collect)
    "q78_kmeans_ivf_cells",
    "q69_hamming_neighbors",
    "q77_hamming_rerank",
    "q89_pq_codes",
    "q90_pq_adc_search",
    "q122_pandas_cosine_topk",
    "q149_filtered_cosine_topk",
    # round 6: per-cell prototype ranking and frozen-codebook delta
    # assignment on top of the q78 training path
    "q168_prototype_selection",
    "q172_incremental_ivf",
    # round 6 continuation: within-cell triplet mining (pair cost
    # tracks cell occupancy — constant-occupancy fan-out keeps it
    # linear in cells)
    "q180_hard_negative_mining",
    # round 6 continuation: map-only int8 quantization (no shuffle)
    "q215_int8_quantization",
    # round 11: Matryoshka truncation calibration (brute pass x dims
    # grid; queries broadcast, rank group-limited)
    "q289_matryoshka_truncation",
)
# the bucketed-cosine graph family (pair generation is quadratic in
# bucket occupancy): sweep with SPARK_GRAFT_SRP_PLANES grown
# ~log2(factor) to hold occupancy constant — e.g.
#   python scripts/scale_experiment.py 10 --only=neardup
#   SPARK_GRAFT_SRP_PLANES=12 python scripts/scale_experiment.py 10 --only=neardup
#   SPARK_GRAFT_SRP_PLANES=15 python scripts/scale_experiment.py 100 --only=neardup
NEARDUP_QUERIES = (
    "q48_embedding_neardup_pairs",
    "q130_semantic_dedup",
    "q132_neardup_triangles",
    # round 9 continuation: the precision curve rides q265's capped
    # pipeline (same plane-growth schedule); the cap recall audit is
    # calibration-shaped (it deliberately includes an uncapped chain)
    # and sweeps to 10x only via the plane schedule
    "q272_mining_precision_curve",
    # round 9 continuation: margin bitext mining — candidate volume is
    # quadratic in bucket occupancy like the rest of this family, so
    # it sweeps under the same SRP-planes growth schedule
    "q265_margin_bitext_mining",
)
# fixed-dimension join sweep (round-4 verdict item 4): fan ONLY the
# fact tables (orders, lineitem) by K with key-shifted orderkeys and
# unchanged dim foreign keys; dims stay at 1x — the real-scale shape,
# where a 10x fact table meets the same broadcastable dimensions.
FACT_QUERIES = (
    "q03_local_supplier_revenue",
    "q10_window_rank",
    "q136_group_ols_regression",
    "q155_integrity_audit",
    "q160_pareto_concentration",
    # round 6 continuation: basket pair mining (one corpus Exchange,
    # pair key space |brands|^2) and equi-depth binning (edges
    # broadcast, assignment map-side)
    "q176_association_rules",
    "q179_equidepth_bins",
    "q181_mad_robust_stats",
    "q182_gini_best_split",
    "q185_weighted_percentiles",
    "q186_key_skew_profile",
    "q204_gini_coefficient",
    "q206_boxplot_stats",
    "q208_histogram_2d",
    "q209_join_size_forecast",
    # round 6 continuation: degree-oriented triangle counting. The
    # fact fan-out repeats the same baskets Kx, so the DISTINCT edge
    # set (and the triangle count) is constant while the pair
    # extraction scans Kx lineitems — the sweep measures the scan +
    # distinct reduction, the graph stages stay fixed-size.
    "q212_triangle_count",
    "q217_degree_assortativity",
    # round 7: bounded-round k-core peel on the same edge frame —
    # node-keyed degree agg + joins over shrinking rounds
    "q236_kcore_peel",
    # shrinkage rates: broadcast dims + 1-row global over cell frame
    "q221_smoothed_segment_rates",
    # contract gate: one fused conditional-agg scan + count_distinct
    "q229_expectation_checks",
    # quantile-sketch calibration: histogram pass + exact-percentile pass
    "q230_histogram_quantile_error",
    # round 9: fixed-boundary quantile sketch build+calibration and
    # its merge-law theorem (both lineitem-keyed)
    "q253_quantile_sketch",
    "q254_quantile_merge_law",
    # round 9 continuation: range-partition planner — the histogram
    # pass is the only corpus term; walk/assignment/pricing run on
    # <= 4096 cells — and the drift audit that closes its lifecycle
    "q266_range_partition_planner",
    "q275_layout_drift_audit",
)
# event-log shapes (round-5 verdict item 7): fan events by K with
# user_id/event_id shifted per copy — K times the users over the same
# time range at constant per-user event density, which is what "more
# data" means for per-user windows (SCD-2, CDC top-1, funnel,
# pattern), the user-partitioned attribution interval join, and the
# cohort triangle. q141 (documents snapshot diff) rides the docs
# fan-out in QUERIES-style via DOC_EXTRA.
EVENT_QUERIES = (
    "q105_scd2_intervals",
    "q131_attribution_window_join",
    "q138_event_funnel",
    "q143_cdc_last_writer_wins",
    "q145_retention_cohorts",
    "q148_event_pattern",
    # round 6: the multi-pattern and quantified/bounded-gap matchers
    # (one shared window Exchange each — the sweep proves adding
    # patterns holds the single-Exchange posture at Kx users)
    "q161_multi_pattern_match",
    "q162_gapped_pattern_match",
    # round 7: alternation/negation + multi-step vocabularies — same
    # single-Exchange alignment posture as q161/q162
    "q233_alternation_negation_match",
    "q235_three_step_gapped_match",
    # round 7: KMV bottom-k sketch (WindowGroupLimit keeps the
    # per-type sort at tasks x k rows regardless of user count) and
    # theta-sketch intersection (pair stage on the |types| frame;
    # the exact calibration side is the user-keyed distinct join)
    "q239_kmv_distinct_sketch",
    "q241_theta_intersection",
    "q246_kmv_union_merge",
    # round 9 (r8 verdict item 5): the round-8 batch sketch additions
    # — join-size estimate, Bloom calibration, merge-law theorems,
    # KMV rolling rollup — plus the round-9 quantile rolling rollup.
    # Each query's exact-calibration side is ALSO swept standalone
    # (SKETCH_EXACT_SIDES below) so "drop the exact side at 100 TB"
    # is a measured claim, not an assertion.
    "q249_countmin_join_estimate",
    "q250_bloom_calibration",
    "q251_sketch_merge_laws",
    "q252_kmv_rolling_rollup",
    "q255_quantile_rolling_rollup",
    # round 6 continuation: interval-weighted/decayed aggregates (one
    # user window or scan-side scoring + one user-keyed agg), U-shaped
    # attribution (q131's equi-join posture + purchase-id window), and
    # the learned transition matrix (one corpus window; iterations are
    # S^2-bounded)
    "q174_time_weighted_value",
    "q175_recency_weighted_engagement",
    "q177_multi_touch_attribution",
    "q178_markov_stationary",
    "q183_simpson_diversity",
    "q187_cusum_changepoint",
    "q189_conversion_paths",
    "q190_rolling_distinct_users",
    "q191_linear_resample",
    "q192_cohort_ltv",
    "q193_funnel_latency_percentiles",
    "q195_seasonality_profile",
    "q196_feature_pipeline",
    "q197_anomaly_days",
    "q198_wilson_intervals",
    "q199_expected_steps_to_purchase",
    "q201_rfm_segments",
    "q202_decile_calibration",
    "q205_kaplan_meier",
    # round 6 continuation: dyadic EMA fold (one user-keyed agg;
    # constant per-user density -> linear), clamped-balance fold
    "q213_dyadic_ema",
    "q222_clamped_running_balance",
    # burstiness: one lag window + shared-Exchange moments
    "q227_interarrival_burstiness",
    # Spearman: reduce-to-users then two segmented ranks
    "q228_spearman_activity_value",
    # round 9: mixture drift monitor (per-(day, type) counts + day
    # window on the count frame + |types| broadcast target)
    "q263_mixture_drift_monitor",
    # round 9 continuation: salt-factor planner — count-frame pass,
    # posexplode sketch build + broadcast probe, top-N heavy-rank
    "q267_salt_factor_planner",
    # round 9 continuation: the MG merge bound (fifth sketch member;
    # slice count frames collapse map-side, summaries are <= 16 rows)
    "q276_mg_merge_bound",
)
# (q194 is in EVENT_QUADRATIC_OUTPUT — 10x cap, see note there)
# The binned overlap join sweeps only to 10x: the events fan-out holds
# the time range constant, so K x users AND K x global incidents make
# the overlap-pair OUTPUT itself grow ~K^2 — a property of the
# synthetic densification, not of the operator (real 100x corpora grow
# the time axis too). 10x pins the join cost tracks output size.
EVENT_QUADRATIC_OUTPUT = (
    "q165_interval_overlap_join",
    # q194: within-block pair space is sum(m²) over dominant-type
    # blocks; the Kx-users fan-out keeps mixes similar, so blocks grow
    # ~Kx and pairs ~K² — a densification artifact (real growth adds
    # mix diversity / refines the block key). Swept to 10x.
    "q194_behavioral_twins",
)
DOC_EXTRA_QUERIES = ("q141_snapshot_diff",)
# Exact-enumeration queries whose worst case the synthetic corpus IS:
# q234's t=1/3 prefix filter keeps ~2s/3 of each doc's shingles in
# the prefix, and the tiny suffixed-token vocabulary (prefix
# filtering's documented worst case) makes the candidate join
# super-linear at 100x (measured: >25 min — killed). Real web-scale
# shingle distributions prune far harder, and the q243 planner routes
# corpora like this one to the LSH curve (q232) instead. Swept to 10x.
DOC_EXPENSIVE_10X = ("q234_exact_threshold_curve",)
# multimodal content roundtrips (round 5): derive clips from doc_id
# only, so the docs fan-out gives Kx clips directly; all map-only
# mapInPandas passes — the sweep measures the per-core decode constant
MM_QUERIES = (
    "q62_frame_sampling",
    "q64_audio_features",
    "q147_image_dhash_dedup",
    "q152_audio_pcm_features",
    "q153_video_container_index",
    # round 7: frame-delta scene profile (map-only walk + doc window)
    "q245_video_scene_deltas",
)
DIM_TABLES = ("region", "nation", "customer", "supplier", "part")
ID_STRIDE = 10_000_000


def build(spark, factor: int) -> str:
    out = f"{ROOT}/scale{factor}"
    dest = f"{out}/documents.parquet"
    if os.path.exists(dest):
        return out
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    copies = spark.range(factor).select(F.col("id").alias("_copy"))
    # Copy 0 keeps the ORIGINAL bytes (same convention as
    # build_embeddings): term-anchored queries (q129 BM25) still find
    # their posting lists in the fanned corpus; copies >= 1 get every
    # token suffixed so cross-copy near-dup density stays constant.
    mutated = F.regexp_replace(
        F.col("text"),
        F.lit(r"(\S+)"),
        F.concat(F.lit(r"$1_c"), F.col("_copy").cast("string")),
    )
    scaled = (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("_copy") * ID_STRIDE).alias("doc_id"),
            F.when(F.col("_copy") == 0, F.col("text"))
            .otherwise(mutated)
            .alias("text"),
            "lang",
            "source",
            "n_chars",
        )
    )
    scaled.repartition(32).write.mode("overwrite").parquet(dest)
    return out


def build_embeddings(spark, factor: int) -> str:
    """Fan the embeddings table out by `factor` with per-copy sign
    flips (see module docstring): distinct vectors, exactly-preserved
    within-copy neighborhoods, original ids (queries + IVF codebook)
    only in copy 0."""
    out = f"{ROOT}/scale{factor}"
    dest = f"{out}/embeddings.parquet"
    if os.path.exists(dest):
        return out
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    copies = spark.range(factor).select(F.col("id").alias("_copy"))
    from target_hdfs_spark.functions.hashing import md5_hash32

    def flip(x, i):
        sign = (
            md5_hash32(
                F.concat(F.col("_copy").cast("string"), F.lit("|"), i.cast("string"))
            )
            % 2
        ) * 2 - 1
        # copy 0 keeps its exact original bytes (queries/codebook)
        s = F.when(F.col("_copy") == 0, F.lit(1)).otherwise(sign)
        return (x * s.cast("float")).cast("float")

    scaled = emb.crossJoin(copies).select(
        (F.col("vec_id") + F.col("_copy") * ID_STRIDE).alias("vec_id"),
        F.transform(F.col("embedding"), flip).alias("embedding"),
        "label",
    )
    scaled.repartition(32).write.mode("overwrite").parquet(dest)
    return out


def build_facts(spark, factor: int) -> str:
    """Kx orders + lineitem with shifted o_orderkey/l_orderkey (copies
    keep their join structure: same custkey/suppkey/partkey foreign
    keys into the UNCHANGED 1x dims, which are file-copied as-is)."""
    import shutil

    out = f"{ROOT}/facts{factor}"
    if os.path.exists(f"{out}/lineitem.parquet"):
        return out
    os.makedirs(out, exist_ok=True)
    for t in DIM_TABLES:
        if not os.path.exists(f"{out}/{t}.parquet"):
            shutil.copy(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
    copies = spark.range(factor).select(F.col("id").alias("_copy"))
    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    (
        orders.crossJoin(copies)
        .select(
            (F.col("o_orderkey") + F.col("_copy") * ID_STRIDE).alias("o_orderkey"),
            *[c for c in orders.columns if c != "o_orderkey"],
        )
        .drop("_copy")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/orders.parquet")
    )
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    (
        li.crossJoin(copies)
        .select(
            (F.col("l_orderkey") + F.col("_copy") * ID_STRIDE).alias("l_orderkey"),
            *[c for c in li.columns if c != "l_orderkey"],
        )
        .drop("_copy")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/lineitem.parquet")
    )
    return out


def build_events(spark, factor: int) -> str:
    """Kx events in the docs scale dir: per-copy user_id/event_id
    stride shifts preserve every copy's per-user sequences (ts order,
    tie-breaks) bit-identically while multiplying the user population.
    Read via load_table (nanos handling) and written back with proper
    micros timestamps, which load_table passes through unchanged."""
    from target_hdfs_spark.sources.readers import load_table

    out = f"{ROOT}/scale{factor}"
    dest = f"{out}/events.parquet"
    if os.path.exists(dest):
        return out
    ev = load_table(spark, SRC, "events")
    copies = spark.range(factor).select(F.col("id").alias("_copy"))
    (
        ev.crossJoin(copies)
        .select(
            (F.col("event_id") + F.col("_copy") * ID_STRIDE).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("_copy") * ID_STRIDE).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(dest)
    )
    return out


# The sketch queries carry their exact-calibration side in-plan (the
# term a 100 TB pipeline drops, keeping only the sketches). These
# standalone rebuilds of JUST that side — same frames the queries
# build, without sharing the corpus pass — make "the exact side is the
# only corpus-scaled term and it is droppable" a measured claim: its
# standalone cost at 1x/10x/100x is recorded next to the full query.
# (q250 has no heavy exact side — its ground truth is one cheap
# membership aggregate — so it is not split.)


def _exact_side_q249(spark, sf_dir):
    from target_hdfs_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    uc = ev.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("c"))
    ux = uc.select(
        F.col("event_type").alias("type_x"), "user_id", F.col("c").alias("cx")
    )
    uy = uc.select(
        F.col("event_type").alias("type_y"),
        F.col("user_id").alias("_uid"),
        F.col("c").alias("cy"),
    )
    return (
        ux.join(
            uy,
            (F.col("user_id") == F.col("_uid"))
            & (F.col("type_x") < F.col("type_y")),
        )
        .groupBy("type_x", "type_y")
        .agg(F.sum(F.col("cx") * F.col("cy")).cast("long").alias("exact_join_rows"))
    )


def _exact_side_q251(spark, sf_dir):
    from target_hdfs_spark.functions.hashing import (
        MERSENNE_P,
        hash_coeffs,
        md5_hash32,
    )
    from target_hdfs_spark.operators.analytics import (
        _BLOOM_K,
        _BLOOM_M,
        _CMJ_ROWS,
        _CMJ_WIDTH,
    )
    from target_hdfs_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    uc = (
        ev.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "user_id", "c", md5_hash32(F.col("user_id").cast("string")).alias("h")
        )
    )
    gu = uc.groupBy("user_id", "h").agg(F.sum("c").alias("c"))
    cm_bkts = F.array(
        *[
            (F.lit(a) * F.col("h") + F.lit(b)) % MERSENNE_P % _CMJ_WIDTH
            for a, b in hash_coeffs(_CMJ_ROWS)
        ]
    )
    cm_direct = (
        gu.select("c", F.posexplode(cm_bkts).alias("r", "bkt"))
        .groupBy("r", "bkt")
        .agg(F.sum("c").alias("cell"))
    )
    bl_direct = None
    for a, b in hash_coeffs(_BLOOM_K):
        part = gu.select(
            ((F.lit(a) * F.col("h") + F.lit(b)) % MERSENNE_P % _BLOOM_M).alias(
                "pos"
            )
        )
        bl_direct = part if bl_direct is None else bl_direct.unionByName(part)
    return cm_direct.agg(
        F.count(F.lit(1)).alias("cm_cells"), F.sum("cell").alias("cm_mass")
    ).crossJoin(
        bl_direct.distinct().agg(F.count(F.lit(1)).alias("bloom_bits"))
    )


def _exact_side_q252(spark, sf_dir):
    from target_hdfs_spark.operators.analytics import _KMV_ROLL_DAYS
    from target_hdfs_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", F.to_date("ts").alias("day")
    )
    ue = ev.distinct()
    anchors = (
        ue.select("event_type", "day")
        .distinct()
        .select(F.col("event_type").alias("_et"), F.col("day").alias("_anchor"))
    )
    return (
        anchors.join(
            ue,
            (F.col("event_type") == F.col("_et"))
            & (F.col("day") >= F.date_sub(F.col("_anchor"), _KMV_ROLL_DAYS - 1))
            & (F.col("day") <= F.col("_anchor")),
        )
        .groupBy("_et", "_anchor")
        .agg(F.count_distinct("user_id").cast("long").alias("exact_distinct"))
    )


def _exact_side_q255(spark, sf_dir):
    from target_hdfs_spark.operators.analytics import _QSK_ROLL_DAYS
    from target_hdfs_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("cents"),
    )
    anchors = (
        ev.select("event_type", "day")
        .distinct()
        .select(F.col("event_type").alias("_et"), F.col("day").alias("_anchor"))
    )
    return (
        anchors.join(
            ev,
            (F.col("event_type") == F.col("_et"))
            & (F.col("day") >= F.date_sub(F.col("_anchor"), _QSK_ROLL_DAYS - 1))
            & (F.col("day") <= F.col("_anchor")),
        )
        .groupBy("_et", "_anchor")
        .agg(F.percentile("cents", F.lit(0.5)).alias("exact_p50"))
    )


SKETCH_EXACT_SIDES = {
    "q249:exact_side": _exact_side_q249,
    "q251:exact_side": _exact_side_q251,
    "q252:exact_side": _exact_side_q252,
    "q255:exact_side": _exact_side_q255,
}


def _sweep_exact_sides(
    spark, factor: int, sf_dir: str, name_filter: list[str] | None = None
) -> None:
    """Time the standalone exact-side rebuilds; with a --queries
    filter, only the exact sides whose name matches run (a targeted
    `--queries=q255` re-sweep must not drag q249's self-join along)."""
    for name, fn in SKETCH_EXACT_SIDES.items():
        if name_filter and not any(p in name for p in name_filter):
            continue
        fn(spark, sf_dir).count()  # warm
        best, rows = 1e9, 0
        for _ in range(2):
            t0 = time.perf_counter()
            rows = fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        print(
            f"factor={factor:>3} {name}: {best:6.2f}s  ({rows} rows)",
            flush=True,
        )


def _sweep(spark, specs, names, factor: int, sf_dir: str) -> None:
    for name in names:
        spec = specs[name]
        spec.fn(spark, sf_dir).count()  # warm
        best, rows = 1e9, 0
        for _ in range(2):
            t0 = time.perf_counter()
            rows = spec.fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        print(
            f"factor={factor:>3} {name}: {best:6.2f}s  ({rows} rows)",
            flush=True,
        )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    factors = [int(a) for a in args] or [10, 100]
    only = {f for f in flags if f.startswith("--only=")}
    families = (
        {p for f in only for p in f.split("=", 1)[1].split(",")}
        if only
        else {"docs", "emb", "facts", "events", "mm"}
    )
    # --queries=substr[,substr]: restrict every family's sweep list to
    # queries matching any substring (targeted re-sweeps after a fix)
    name_filter = [
        p
        for f in flags
        if f.startswith("--queries=")
        for p in f.split("=", 1)[1].split(",")
    ]
    if name_filter:
        global QUERIES, EMB_QUERIES, NEARDUP_QUERIES, FACT_QUERIES
        global MM_QUERIES, EVENT_QUERIES, EVENT_QUADRATIC_OUTPUT
        global DOC_EXTRA_QUERIES, DOC_EXPENSIVE_10X
        keep = lambda qs: tuple(  # noqa: E731
            q for q in qs if any(p in q for p in name_filter)
        )
        QUERIES = keep(QUERIES)
        EMB_QUERIES = keep(EMB_QUERIES)
        NEARDUP_QUERIES = keep(NEARDUP_QUERIES)
        FACT_QUERIES = keep(FACT_QUERIES)
        MM_QUERIES = keep(MM_QUERIES)
        EVENT_QUERIES = keep(EVENT_QUERIES)
        EVENT_QUADRATIC_OUTPUT = keep(EVENT_QUADRATIC_OUTPUT)
        DOC_EXTRA_QUERIES = keep(DOC_EXTRA_QUERIES)
        DOC_EXPENSIVE_10X = keep(DOC_EXPENSIVE_10X)
    # --expensive-full: lift DOC_EXPENSIVE_10X's 10x cap and attempt
    # the full factor list (r8: the r7 array-verify rework changed the
    # family's dominant term AFTER the 100x cap was recorded — this
    # re-measures instead of trusting the stale CAP note)
    expensive_cap = 10 if "--expensive-full" not in flags else max(factors)
    spark = get_spark(app_name="scale_experiment")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    for factor in [1, *factors]:
        if "docs" in families:
            sf_dir = SRC if factor == 1 else build(spark, factor)
            _sweep(spark, specs, QUERIES, factor, sf_dir)
            if factor <= expensive_cap:
                _sweep(spark, specs, DOC_EXPENSIVE_10X, factor, sf_dir)
        if "emb" in families:
            sf_dir = SRC if factor == 1 else build_embeddings(spark, factor)
            _sweep(spark, specs, EMB_QUERIES, factor, sf_dir)
        if "neardup" in families:
            from target_hdfs_spark.operators.similarity import N_PLANES

            print(f"neardup sweep with SRP planes = {N_PLANES}", flush=True)
            sf_dir = SRC if factor == 1 else build_embeddings(spark, factor)
            _sweep(spark, specs, NEARDUP_QUERIES, factor, sf_dir)
        if "facts" in families:
            sf_dir = SRC if factor == 1 else build_facts(spark, factor)
            _sweep(spark, specs, FACT_QUERIES, factor, sf_dir)
        if "mm" in families:
            sf_dir = SRC if factor == 1 else build(spark, factor)
            _sweep(spark, specs, MM_QUERIES, factor, sf_dir)
        if "events" in families:
            sf_dir = SRC if factor == 1 else build_events(spark, factor)
            _sweep(spark, specs, EVENT_QUERIES, factor, sf_dir)
            _sweep_exact_sides(spark, factor, sf_dir, name_filter)
            if factor <= 10:
                _sweep(spark, specs, EVENT_QUADRATIC_OUTPUT, factor, sf_dir)
            # the snapshot diff is documents-based; reuse the docs
            # fan-out so its sweep rides the same factor
            doc_dir = SRC if factor == 1 else build(spark, factor)
            _sweep(spark, specs, DOC_EXTRA_QUERIES, factor, doc_dir)


if __name__ == "__main__":
    main()
