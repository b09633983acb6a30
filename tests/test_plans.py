"""Physical-plan assertions: pin the optimizer properties the engine
relies on at scale (pushdown, pruning, broadcast, top-k, single-pass
aggregation). A regression here is a 100 TB performance bug even when
results stay correct."""

from __future__ import annotations

from target_hdfs_spark.registry import all_queries

SF_DIR = "/root/testdata/sf0.001"
SPECS = all_queries()


def _global_windows(plan: str) -> int:
    """Unpartitioned-window count via the audit's detector (single
    source of truth for what counts as a global window)."""
    import sys

    sys.path.insert(0, "scripts")
    from plan_audit import count_global_windows

    return count_global_windows(plan)


def plan_of(spark, name: str) -> str:
    df = SPECS[name].fn(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q01_pushdown_and_pruning(spark):
    plan = plan_of(spark, "q01_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # 7 of 16 lineitem columns read — l_orderkey and friends pruned
    assert "l_orderkey" not in plan
    assert "ReadSchema" in plan


def test_q03_broadcasts_dimensions(spark):
    plan = plan_of(spark, "q03_local_supplier_revenue")
    assert plan.count("BroadcastHashJoin") >= 3  # supplier, nation, region
    assert "o_orderdate" in plan and "PushedFilters" in plan


def test_q12_topk_never_global_sorts(spark):
    plan = plan_of(spark, "q12_global_topk")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan  # no global sort


def test_q42_minhash_single_pass(spark):
    plan = plan_of(spark, "q42_minhash_signatures")
    # exactly one md5 evaluation site and one shuffle: the signature
    # pipeline is explode -> partial agg -> exchange -> final agg
    assert plan.count("md5") == 1, f"md5 recomputed: {plan.count('md5')} sites"
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_min" in plan  # map-side combine of the 16 minima


def test_q46_broadcasts_query_vectors(spark):
    plan = plan_of(spark, "q46_cosine_topk")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_q21_sample_inside_scan_stage(spark):
    plan = plan_of(spark, "q21_sample")
    assert "Sample" in plan
    assert "Exchange" not in plan  # sampling never shuffles


def test_q54_quality_filter_no_shuffle(spark):
    plan = plan_of(spark, "q54_quality_filter")
    assert "Exchange" not in plan  # pure scan-side filter pipeline


def test_q96_simhash_blocking_is_equi_join(spark):
    """The byte-band blocking must be a hash equi-join — a cartesian
    or nested-loop plan would mean the pigeonhole blocking degenerated
    to all-pairs (the O(n^2) this operator exists to avoid)."""
    plan = plan_of(spark, "q96_simhash_hamming_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q95_editdistance_runs_on_candidates_only(spark):
    plan = plan_of(spark, "q95_lsh_editdistance_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "levenshtein" in plan  # verification stays engine-side


def test_q99_percentiles_single_shuffle(spark):
    """Exact percentiles: one hash-partitioned exchange on the group
    key, no global sort."""
    plan = plan_of(spark, "q99_exact_percentiles")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange rangepartitioning" not in plan


def test_q101_broadcasts_eval_side(spark):
    """Decontamination must broadcast the (small, fixed-size) eval
    n-gram set — a shuffled join here would move the full training
    corpus's n-gram stream twice at 100 TB."""
    plan = plan_of(spark, "q101_decontamination")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q102_packing_no_global_sort(spark):
    """Sequence packing orders only within the lang partition; a
    rangepartitioning exchange would mean an accidental global sort."""
    plan = plan_of(spark, "q102_sequence_packing")
    assert "Exchange rangepartitioning" not in plan


def test_q103_repetition_no_shuffle(spark):
    """Gopher repetition metrics are pure map-side array expressions —
    any Exchange means the per-doc computation regressed to a shuffle
    (this is the filter that must run FIRST, before shuffling ops)."""
    plan = plan_of(spark, "q103_repetition_quality")
    assert "Exchange" not in plan


def test_q104_sample_filter_in_scan_stage(spark):
    """Hash-bucket sampling is a scan-side filter; no Exchange."""
    plan = plan_of(spark, "q104_stratified_hash_sample")
    assert "Exchange" not in plan


def test_q106_group_topk_uses_window_group_limit(spark):
    """Per-stratum top-k must use WindowGroupLimit (per-partition
    k-heap) rather than fully sorting every stratum."""
    plan = plan_of(spark, "q106_group_topk_sample")
    assert "WindowGroupLimit" in plan
    assert "Exchange rangepartitioning" not in plan


def test_q107_pit_two_window_passes_share_key(spark):
    """Chained as-of joins partition on the same user_id key — no
    range join, no cartesian, exactly the union-and-fill shape."""
    plan = plan_of(spark, "q107_pit_feature_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "RunningWindowFunction" in plan or "Window" in plan


def test_q109_bloom_probe_stays_map_side(spark):
    """The bloom probe is 4 broadcast equi-joins + the exact verify —
    the fact table must reach the final groupBy through exactly one
    hash exchange (no shuffle for the probe itself)."""
    plan = plan_of(spark, "q109_bloom_join_reduction")
    assert plan.count("BroadcastHashJoin") >= 5  # 4 probes + verify
    assert "CartesianProduct" not in plan


def test_q115_manifest_single_shuffle_mapside_xor(spark):
    plan = plan_of(spark, "q115_shard_manifest")
    # one hash-partition shuffle on shard_id; checksum/count/sums all
    # combine map-side (the order-independent-XOR design point)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_bit_xor" in plan
    assert "Exchange rangepartitioning" not in plan


def test_q116_incremental_dedup_all_equi_joins(spark):
    plan = plan_of(spark, "q116_incremental_dedup")
    # base-vs-incoming probing must never degenerate to a product
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q117_percentile_filter_no_global_sort(spark):
    plan = plan_of(spark, "q117_quality_percentile_filter")
    # per-source window: hash partition + per-partition sort only
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange rangepartitioning" not in plan
    assert "Window" in plan


def test_q118_single_signature_pass_no_root_join(spark):
    """Bucket-root dedup fetches the root's id AND signature from one
    min(struct) window — a regression to a self-join would recompute
    the md5 signature pipeline per reference."""
    plan = plan_of(spark, "q118_bucket_root_dedup")
    assert plan.count("md5") == 1, f"signature recomputed: {plan.count('md5')} sites"
    # signature groupBy(doc_id) + bucket window: exactly two shuffles
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Join" not in plan


def test_q121_priority_sample_is_scan_side_topk(spark):
    """Priority sampling: per-partition heaps (TakeOrderedAndProject),
    never a global sort or any shuffle before the top-k."""
    plan = plan_of(spark, "q121_priority_sample")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_q119_broadcasts_corpus_total(spark):
    """The corpus token total joins as a broadcast scalar, not via a
    shuffled cross join."""
    plan = plan_of(spark, "q119_unigram_lm_quality")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q123_trending_rank_reuses_count_exchange_layout(spark):
    plan = plan_of(spark, "q123_trending_topk")
    # per-window rank applies group-limit BEFORE the rank shuffle
    # (partial WindowGroupLimit) and again after — candidate rows per
    # window are capped on the map side at any corpus size
    assert plan.count("WindowGroupLimit") == 2
    assert "partial_count" in plan  # token counts combine map-side
    # two shuffles total: (window, token) agg + window_start rank
    assert plan.count("Exchange hashpartitioning") == 2


def test_q124_merge_algebra_is_shard_limit_then_global_topk(spark):
    plan = plan_of(spark, "q124_sample_merge_algebra")
    # the distributed sample: per-shard WindowGroupLimit (map-side
    # partial) + ONE shard shuffle, then the merge is
    # TakeOrderedAndProject over k*shards rows — never a global sort
    assert plan.count("WindowGroupLimit") == 2
    assert plan.count("Exchange hashpartitioning") == 1
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan
    # priority is computed scan-side (projected off the file scan)
    assert plan.count("md5") == 1


def test_q127_multiband_no_self_join_single_md5(spark):
    plan = plan_of(spark, "q127_multiband_root_dedup")
    # signature pipeline runs ONCE (one md5 site), the root comes from
    # a min(struct) window — never a self-join back to fetch it — and
    # the whole rule is 3 Exchanges: signature agg, (band, key) window,
    # per-doc conjunction (map-side combined)
    assert plan.count("md5") == 1
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 3
    assert "partial_min" in plan or "partial_bool_and" in plan  # map-side combine of the conjunction aggregate


def test_q128_single_md5_two_shuffles(spark):
    """Segment dedup: the keep-first rule is one window over the
    segment hash (Exchange 1) and the rebuild one doc aggregation
    (Exchange 2); md5 is computed at exactly one site."""
    plan = plan_of(spark, "q128_segment_dedup")
    assert plan.count("md5") == 1, f"md5 recomputed: {plan.count('md5')} sites"
    assert plan.count("Exchange hashpartitioning") == 2


def test_q129_bm25_topk_is_take_ordered(spark):
    """BM25: the final top-k must be TakeOrderedAndProject (per-
    partition heaps), never a global range sort; df and corpus stats
    attach as broadcasts."""
    plan = plan_of(spark, "q129_bm25_topk")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan
    assert plan.count("BroadcastExchange") >= 2  # dfs row + stats row


def test_q131_interval_join_is_equi_on_user(spark):
    """Attribution window join: Spark must extract the user_id
    equality as the join key with the time interval as a residual —
    a nested-loop/cartesian fallback would be the O(n^2) this
    formulation exists to avoid."""
    plan = plan_of(spark, "q131_attribution_window_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan)


def test_q132_edges_materialized_once(spark):
    """Triangle count: the wedge join references the edge list three
    times; the eager checkpoint must make all three references read
    the materialized RDD — zero cosine (zip_with) sites may survive
    into the executed plan."""
    plan = plan_of(spark, "q132_neardup_triangles")
    assert "zip_with" not in plan, "edge pipeline recomputed past the checkpoint"
    assert "Scan ExistingRDD" in plan
    assert "CartesianProduct" not in plan


def test_q136_regression_is_single_aggregation_pass(spark):
    """Grouped OLS: all five moment sums must come from ONE hash
    aggregation with map-side partials — a second Exchange or a
    re-scan per moment would turn a one-pass profile into five."""
    plan = plan_of(spark, "q136_group_ols_regression")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_sum" in plan
    assert plan.count("FileScan parquet") == 1


def test_q137_histogram_bucket_is_scan_side(spark):
    """Histogram: the bucket id is computed before the (only) shuffle,
    so the exchange carries <= n_buckets rows per map task."""
    plan = plan_of(spark, "q137_price_histogram")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_sum" in plan or "partial_count" in plan


def test_q138_funnel_frontiers_broadcast(spark):
    """Funnel: stage frontiers are |users|-sized aggregates joined
    back to the event log — AQE must pick broadcast (not SMJ) for
    them at this scale, and nothing may cartesian."""
    plan = plan_of(spark, "q138_event_funnel")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_q141_diff_hashes_before_single_join(spark):
    """Snapshot diff: content md5 must be computed scan-side (the
    16-byte hash shuffles, not the full text), and the diff is ONE
    full-outer join — no second pass over either snapshot."""
    plan = plan_of(spark, "q141_snapshot_diff")
    assert "FullOuter" in plan
    assert "CartesianProduct" not in plan


def test_q142_fusion_joins_bounded_lists(spark):
    """RRF: the fusion operates on two top-k frames; the final rank
    is a window over <= 2k rows, and nothing may cartesian."""
    plan = plan_of(spark, "q142_rank_fusion")
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_q143_cdc_is_per_partition_top1(spark):
    """CDC apply: rn=1 must compile to WindowGroupLimit (per-partition
    top-1 heaps) so the shuffle carries one candidate per key per map
    task, not the whole change log."""
    plan = plan_of(spark, "q143_cdc_last_writer_wins")
    assert "WindowGroupLimit" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_q144_lift_prunes_vocab_before_self_join(spark):
    """Token lift: the df-floor table must broadcast into the pair
    generation (vocabulary pruned before the quadratic step), and the
    doc-equality key must make the self-join a hash join."""
    plan = plan_of(spark, "q144_token_lift")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_q145_cohorts_reduce_log_first(spark):
    """Retention: the full event log is touched exactly once (distinct
    user-week projection); cohort assembly happens on the reduced
    frame."""
    plan = plan_of(spark, "q145_retention_cohorts")
    assert plan.count("FileScan parquet") == 1


def test_q146_sketch_runs_once_and_candidates_broadcast(spark):
    """Heavy hitters: the Misra-Gries summary is eagerly checkpointed
    (candidates and the token count both read the materialized RDD —
    zero MapInPandas nodes may survive into the executed plan, or the
    corpus-wide sketch pass would run twice), and candidates must
    BROADCAST into the exact count pass."""
    plan = plan_of(spark, "q146_heavy_hitters")
    assert "MapInPandas" not in plan, "MG sketch recomputed past the checkpoint"
    assert "Scan ExistingRDD" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_q148_pattern_is_single_window_shuffle(spark):
    """Sequence matching: one hash Exchange (the user_id window);
    the pattern predicate and count reduce without further movement
    beyond the final aggregation."""
    plan = plan_of(spark, "q148_event_pattern")
    assert plan.count("Exchange hashpartitioning") <= 2  # window + group
    assert "Window" in plan


def test_q149_filter_pushed_beneath_distance_math(spark):
    """Filtered vector search: the label predicate must reach the
    parquet scan (PushedFilters) so non-matching row groups never
    decompress, and the top-k must be WindowGroupLimit."""
    plan = plan_of(spark, "q149_filtered_cosine_topk")
    assert "PushedFilters" in plan and "label" in plan
    assert "WindowGroupLimit" in plan


def test_q151_pagerank_edges_checkpointed_once(spark):
    """PageRank: the pair pipeline feeds 2x3 iteration branches; the
    eager checkpoint must make every branch read the materialized
    edge RDD (zero md5 sites may survive), and nothing cartesians
    except the broadcast scalar-N attach."""
    plan = plan_of(spark, "q151_pagerank_dup_graph")
    assert "md5" not in plan, "pair pipeline recomputed past the checkpoint"
    assert "Scan ExistingRDD" in plan
    assert "CartesianProduct" not in plan


def test_q157_source_cap_is_window_group_limit(spark):
    """Diversified top-k: the per-source cap must compile to
    WindowGroupLimit so the global stage sees at most
    cap x |sources| rows — never a full-corpus sort; the final-rank
    filter must push a TakeOrderedAndProject below the global window
    (detector counts it as bounded, not global)."""
    plan = plan_of(spark, "q157_diversified_topk")
    assert "WindowGroupLimit" in plan
    assert "TakeOrderedAndProject" in plan
    assert _global_windows(plan) == 0


def test_q158_batch_prefix_never_global_windows(spark):
    """Fair interleave: the batch_pos rank filter compiles to
    TakeOrderedAndProject below the unpartitioned window — the window
    task sees the 100-row prefix, not the corpus."""
    plan = plan_of(spark, "q158_fair_interleave")
    assert "TakeOrderedAndProject" in plan
    assert _global_windows(plan) == 0


def test_q150_budget_cumsum_is_banded(spark):
    """Token-budget selection: the running token sum is the banded
    prefix sum — running sums partitioned by (score, tband); the only
    global window is the band-total cumulative."""
    plan = plan_of(spark, "q150_token_budget_selection")
    assert "hashpartitioning(score" in plan
    assert _global_windows(plan) <= 2


def test_q160_share_cumsum_is_banded(spark):
    """Pareto concentration: the decimal running share is the banded
    prefix sum over |customers| — never a single-task window."""
    plan = plan_of(spark, "q160_pareto_concentration")
    assert "CartesianProduct" not in plan
    assert _global_windows(plan) <= 2


def test_q161_multi_pattern_single_alignment_pass(spark):
    """Multi-pattern matching: ONE user_id window Exchange builds the
    shared lookahead alignment; every pattern branch reads the
    checkpointed frame (Scan ExistingRDD) map-side — adding a pattern
    must not add an Exchange or recompute the window."""
    plan = plan_of(spark, "q161_multi_pattern_match")
    assert "Scan ExistingRDD" in plan  # checkpointed alignment frame
    assert "Exchange hashpartitioning" not in plan  # window paid pre-checkpoint
    assert "CartesianProduct" not in plan


def test_q62_q64_q152_q153_are_shuffle_free_map_passes(spark):
    """The multimodal content roundtrips scan STORED binary columns
    (sources/media.py) and stay map-only mapInPandas passes until
    their final (tiny) aggregation: the clip bytes never shuffle —
    only int64 feature rows do, and with the stored scan there is no
    fan-out Exchange at all (parquet splits parallelize the read)."""
    for name in (
        "q64_audio_features",
        "q152_audio_pcm_features",
        "q153_video_container_index",
    ):
        plan = plan_of(spark, name)
        assert "Scan parquet" in plan, name  # stored bytes, not synthesis
        assert "Exchange" not in plan, name  # fully map-only
        assert "CartesianProduct" not in plan, name
    # q62 adds the per-doc aggregation of sampled-frame rows: the
    # groupBy exchange carries int64s, and partial aggregation
    # (map-side combine) must precede it
    plan = plan_of(spark, "q62_frame_sampling")
    assert "Scan parquet" in plan
    assert "partial_count" in plan  # map-side combine, pinned directly
    assert plan.count("Exchange hashpartitioning") == 1  # feature groupBy only
    assert "Exchange rangepartitioning" not in plan
    # q147 ends in a tiny ordered readout (range sort allowed on the
    # 50-row aggregate), but the clip pass itself must stay a single
    # hash exchange of (doc_id, 8-byte hash) with map-side combine
    plan = plan_of(spark, "q147_image_dhash_dedup")
    assert "Scan parquet" in plan
    # exactly 1: the phash groupBy (carrying 16 bytes/row, never pixels)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_min" in plan
    assert "CartesianProduct" not in plan


def test_media_metadata_predicates_push_to_scan(spark):
    """The media fixture's typed metadata columns must prune at the
    parquet scan BEFORE any blob decode: a predicate on img_format /
    avi_n_frames shows up in PushedFilters, and column pruning keeps
    unrequested binary columns out of ReadSchema."""
    from target_hdfs_spark.sources.media import media_table

    df = (
        media_table(spark, SF_DIR)
        .filter("img_format = 'png' AND avi_n_frames > 4")
        .select("doc_id", "video_avi")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "EqualTo(img_format,png)" in plan
    # toString truncates long filter lists; the prefix is unambiguous
    assert "GreaterThan(avi_n_frame" in plan
    # projection pruning: the other three blob columns never leave the scan
    read_schema = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "video_avi" in read_schema
    for absent in ("image_png", "audio_wav", "image:"):
        assert absent not in read_schema, absent


def test_q45_df_cap_guard_survives_optimization(spark):
    """The q45 hot-shingle guard is a raise_error branch inside a
    filter; column pruning / constant folding must not remove it, and
    the shingle frame is checkpointed so the tokenize+explode pass
    runs once for all four consumers."""
    plan = plan_of(spark, "q45_ngram_jaccard_pairs")
    assert "raise_error" in plan
    assert "Scan ExistingRDD" in plan  # checkpointed shingle frame


def test_q162_single_alignment_pass(spark):
    """Quantified/bounded-gap matching keeps q161's posture: ONE
    user_id window Exchange builds the shared lookahead alignment;
    each pattern's when-chain reads the checkpointed frame map-side —
    adding a pattern or widening a quantifier adds no Exchange."""
    plan = plan_of(spark, "q162_gapped_pattern_match")
    assert "Scan ExistingRDD" in plan  # checkpointed alignment frame
    assert "Exchange hashpartitioning" not in plan
    assert "CartesianProduct" not in plan


def test_q233_alternation_negation_same_posture(spark):
    """The alternation/negation vocabulary keeps q162's posture: the
    one window Exchange is spent before the checkpoint, so the plan
    over the alignment frame is Exchange-free map work — alternation
    is an isin on the start filter, negation flips mask equalities."""
    plan = plan_of(spark, "q233_alternation_negation_match")
    assert "Scan ExistingRDD" in plan  # checkpointed alignment frame
    assert "Exchange hashpartitioning" not in plan
    assert "CartesianProduct" not in plan


def test_q235_multistep_same_posture(spark):
    """Multi-step gapped sequences keep the alignment posture: the
    placement OR is arm enumeration inside one map-side when-chain —
    no Exchange, no cartesian over the checkpointed frame."""
    plan = plan_of(spark, "q235_three_step_gapped_match")
    assert "Scan ExistingRDD" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "CartesianProduct" not in plan


def test_q163_prunes_before_decode(spark):
    """Selective decode: the metadata predicates must reach the
    parquet scan as PushedFilters — skipped rows never cross the
    Arrow boundary into the chunk walker."""
    plan = plan_of(spark, "q163_media_pruned_decode")
    assert "EqualTo(img_format,png)" in plan
    assert "GreaterThanOrEqual(avi_" in plan  # toString truncates
    assert "Exchange" not in plan  # scan-side filter + map-only decode


def test_q164_storage_profile_stays_jvm_side(spark):
    """Binary storage profiling runs without any Python boundary:
    octet_length on the BinaryType column inside whole-stage codegen,
    partial agg before the two-group shuffle."""
    plan = plan_of(spark, "q164_media_storage_profile")
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan
    assert "partial_count" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_q165_overlap_join_is_equi_on_buckets(spark):
    """The interval-overlap join must run as a HASH join keyed on the
    time bucket (inequalities as residual filters), never a
    nested-loop over sessions x incidents — the whole point of the
    binning rewrite."""
    plan = plan_of(spark, "q165_interval_overlap_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan \
        or "SortMergeJoin" in plan
    assert "MergingSessions" in plan  # session_window, one pass


def test_q166_single_tokenize_pass(spark):
    """Four LM consumers (bigram instances, bigram counts, unigram
    counts, vocabulary) must read ONE checkpointed token frame, not
    re-tokenize the corpus per consumer."""
    plan = plan_of(spark, "q166_bigram_lm_quality")
    assert "Scan ExistingRDD" in plan  # checkpointed token frame
    assert "split(lower(trim" not in plan  # tokenize happened pre-checkpoint


def test_q167_skyline_no_self_join(spark):
    """The skyline must run as the cumulative-max window rewrite:
    no quadratic self-anti-join, survivor join keyed on
    (brand, price)."""
    plan = plan_of(spark, "q167_skyline_parts")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "RunningWindowFunction" in plan or "Window" in plan


def test_q168_cell_rank_pushes_group_limit(spark):
    """Prototype selection: the rn <= cap filter must push below the
    per-cell sort (WindowGroupLimit), so cell groups truncate at the
    cap instead of fully sorting."""
    plan = plan_of(spark, "q168_prototype_selection")
    assert "WindowGroupLimit" in plan


def test_q169_blocked_matching_is_equi_join(spark):
    """Record linkage must compare only within blocking keys: the
    candidate join is an equi-join on (nk, seg) with levenshtein as a
    residual filter — never an all-pairs nested loop. (The final q169
    plan only shows the CC label join — the match join runs eagerly
    inside connected_components — so pin match_pairs itself.)"""
    from target_hdfs_spark.operators.linkage import _records, match_pairs

    plan = (
        match_pairs(_records(spark, SF_DIR))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "levenshtein" in plan  # JVM-side, inside the join filter


def test_q173_big_window_is_hour_partitioned(spark):
    """Sweep-line concurrency: the boundary-level running sum (the
    window whose size tracks event volume) must be PARTITIONED BY
    hour — only the |hours|-sized carry-in scan may be a
    single-partition window."""
    plan = plan_of(spark, "q173_peak_concurrency")
    assert "hashpartitioning(hour_id" in plan  # within-hour window + final agg
    assert "CartesianProduct" not in plan


def test_q174_single_window_pass_then_partial_agg(spark):
    """TWAP: one user-partitioned window (lead only), then a hash
    aggregation with map-side partials — no second Exchange beyond
    the window's."""
    plan = plan_of(spark, "q174_time_weighted_value")
    assert plan.count("Exchange hashpartitioning") == 1  # window + agg share user_id
    assert "partial_sum" in plan
    assert "Exchange rangepartitioning" not in plan


def test_q175_decay_is_scan_side(spark):
    """Dyadic decay scoring must evaluate scan-side against the
    broadcast anchor: one Exchange total (the user_id agg)."""
    plan = plan_of(spark, "q175_recency_weighted_engagement")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_sum" in plan


def test_q176_one_corpus_shuffle_no_self_join(spark):
    """Basket pairs come from the sorted per-basket array (map-side
    Generate), never a basket-id self-join; brand enrichments are
    broadcast."""
    plan = plan_of(spark, "q176_association_rules")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # no bi-x-bi self-join
    assert plan.count("Generate explode") >= 1
    assert "BroadcastHashJoin" in plan


def test_q177_equi_join_with_residual_band(spark):
    """The 60-minute band must ride an EQUI join on user_id as a
    residual predicate — a nested-loop/cartesian pairing here is the
    100 TB kill."""
    plan = plan_of(spark, "q177_multi_touch_attribution")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # join + pid window


def test_q178_iterations_touch_no_corpus(spark):
    """After the transition-count checkpoint, every power-iteration
    stage joins S^2-bounded frames — broadcast, never sort-merge."""
    plan = plan_of(spark, "q178_markov_stationary")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_q179_edges_broadcast_assignment_mapside(spark):
    """Bin edges are a tiny per-group frame: assignment must ride a
    broadcast join (no corpus shuffle before the final per-bin agg)."""
    plan = plan_of(spark, "q179_equidepth_bins")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # edges agg + final (group, bin) agg — assignment adds no Exchange
    assert plan.count("Exchange hashpartitioning") <= 2


def test_q180_pairs_are_cell_bounded(spark):
    """Triplet mining pairs only within k-means cells: the pair join
    keys on cid (never a global cross), and the mined winners come
    from ONE aggregation (no window recompute of the pair frame)."""
    plan = plan_of(spark, "q180_hard_negative_mining")
    assert "CartesianProduct" not in plan
    assert "partial_max" in plan or "partial_min" in plan  # map-side combine


def test_q181_second_pass_is_mapside_scored(spark):
    """Per-group medians broadcast back; deviation scoring adds no
    Exchange beyond the two group aggregations."""
    plan = plan_of(spark, "q181_mad_robust_stats")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_q182_single_corpus_pass_then_level_window(spark):
    """The corpus collapses to per-level counts in ONE hash agg; the
    cumulative split scan runs over the tiny level frame (a
    single-partition window over ~50 rows is the DESIGN here, not the
    global-window trap — pin that it sits above the reduction)."""
    plan = plan_of(spark, "q182_gini_best_split")
    assert "partial_count" in plan or "partial_sum" in plan  # map-side combine
    assert "CartesianProduct" not in plan


def test_q183_two_stacked_aggregations(spark):
    """(user, type) then user: both aggregations carry map-side
    partials, so the first Exchange moves per-partition distinct
    (user, type) counts and the second only the |users|x|types|
    reduced frame — two Exchanges, neither corpus-sized."""
    plan = plan_of(spark, "q183_simpson_diversity")
    assert plan.count("Exchange hashpartitioning") == 2
    assert plan.count("partial_sum") >= 1 and "partial_count" in plan


def test_q184_checkpointed_gram_pass_feeds_both_consumers(spark):
    """The distinct (doc, gram) frame is computed once (checkpoint);
    first-occurrence agg and the join back both key on gram."""
    plan = plan_of(spark, "q184_ngram_novelty")
    assert "CartesianProduct" not in plan
    # checkpoint in place: the executed plan starts from the stored
    # gram frame, not a re-derived tokenize/explode
    assert "Generate explode" not in plan
    # the join-back side arrives partitioned by gram from the agg
    assert "hashpartitioning(gram" in plan


def test_q185_segmented_scan_no_global_window(spark):
    """The corpus-sized running weight must be PARTITIONED BY
    (group, band); the only unpartitioned-window frame is the tiny
    band-level carry (q173's two-level decomposition)."""
    plan = plan_of(spark, "q185_weighted_percentiles")
    assert "hashpartitioning(rf#" in plan or "hashpartitioning(rf," in plan
    assert "hashpartitioning(rf" in plan  # within-band window keyed by (rf, band)
    assert "CartesianProduct" not in plan


def test_q186_profile_reduces_before_stats(spark):
    """Each key profile collapses the corpus to |keys| rows with
    map-side partials before any percentile; top-key via broadcast
    max join, no window over the corpus."""
    plan = plan_of(spark, "q186_key_skew_profile")
    assert "partial_count" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "Window" not in plan


def test_q187_cusum_no_global_window(spark):
    """The per-type prefix must be segmented (hour-partitioned inner
    window + tiny carry) — a corpus-sized unpartitioned window is the
    failure mode this plan exists to avoid."""
    plan = plan_of(spark, "q187_cusum_changepoint")
    assert "hashpartitioning(event_type#" in plan or "hashpartitioning(event_type," in plan
    assert "CartesianProduct" not in plan


def test_q188_broadcasts_query_side(spark):
    """The benchmark-suite gram set must broadcast (q101's posture);
    per-query ranking truncates at k below the sort."""
    plan = plan_of(spark, "q188_retrieval_eval")
    assert "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_q189_single_window_pass_three_leads(spark):
    """All three leads + the conversion lookahead share ONE user
    Exchange (q148's posture); the base rate derives from the reduced
    path frame via broadcast."""
    plan = plan_of(spark, "q189_conversion_paths")
    assert "CartesianProduct" not in plan
    # the checkpointed path frame is the plan's source: only the tiny
    # base-rate agg and final filter remain
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_q190_expansion_runs_on_reduced_frame(spark):
    """The 7x contribution explode must run on the |user-days| frame
    (post-distinct checkpoint), never the raw corpus; rolling distinct
    is a plain hash aggregation."""
    plan = plan_of(spark, "q190_rolling_distinct_users")
    assert "Generate explode" in plan
    assert "CartesianProduct" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_q191_windows_share_user_partitioning(spark):
    """Per-instant dedup and the segment lead both partition by user
    (one corpus Exchange); grid expansion is map-side Generate."""
    plan = plan_of(spark, "q191_linear_resample")
    assert plan.count("Exchange hashpartitioning") <= 2  # window + final agg
    assert "Generate explode" in plan
    assert "CartesianProduct" not in plan


def test_q192_grid_window_after_reduction(spark):
    """The LTV cumulative runs over the reduced (cohort, week) grid;
    cohort sizes broadcast; no corpus-sized window."""
    plan = plan_of(spark, "q192_cohort_ltv")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_q193_frontier_chain_no_log_window(spark):
    """Latency percentiles reuse q138's frontier-join chain: filtered
    |users| aggregations joined on user_id — no Window over the raw
    event log."""
    plan = plan_of(spark, "q193_funnel_latency_percentiles")
    assert "CartesianProduct" not in plan
    assert "Window" not in plan  # percentile is an agg, not a window here


def test_q194_pairs_blocked_on_dominant_type(spark):
    """Twin pairing must join on the block key (shared-type equi
    join) — never an all-users product — and ranking truncates via
    WindowGroupLimit."""
    plan = plan_of(spark, "q194_behavioral_twins")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "WindowGroupLimit" in plan


def test_q195_single_corpus_agg_to_168_cells(spark):
    """The corpus collapses onto |types| x 168 cells with map-side
    partials; share/peak resolve via broadcasts on the reduced
    frame."""
    plan = plan_of(spark, "q195_seasonality_profile")
    assert "partial_count" in plan or "partial_sum" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q196_all_stages_key_on_user(spark):
    """The flagship feature frame: anchor broadcasts; TWAP window and
    both per-user aggregations key on user_id; no corpus-sized
    window, no product joins."""
    plan = plan_of(spark, "q196_feature_pipeline")
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(user_id" in plan
    # exactly two corpus branches (fused feat+label agg, TWAP window),
    # each joining the 1-row anchor broadcast once
    assert plan.count("BroadcastNestedLoopJoin") == 2


def test_q197_percentiles_on_reduced_daily_frame(spark):
    """Both MAD-phase percentiles run on the checkpointed (type, day)
    frame; enrichment joins broadcast back."""
    plan = plan_of(spark, "q197_anomaly_days")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q198_interval_math_on_bands_frame(spark):
    """Two stacked aggregations (users, then 3 bands); the interval
    tree evaluates on the reduced frame — no joins at all."""
    plan = plan_of(spark, "q198_wilson_intervals")
    assert "Join" not in plan
    assert "partial_sum" in plan


def test_q199_iterations_are_matrix_bounded(spark):
    """Value iteration joins only the checkpointed S²-bounded matrix —
    no sort-merge, no cartesian, no corpus stage past the window."""
    plan = plan_of(spark, "q199_expected_steps_to_purchase")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_q200_pairs_counted_over_vocab_not_corpus(spark):
    """The char-pair explode must sit above the word-frequency
    aggregation (one corpus pass to |vocab|); the final ranking is a
    tiny global window over the |alphabet|² pair frame."""
    plan = plan_of(spark, "q200_bpe_merge_candidates")
    assert "Generate explode" in plan
    assert "CartesianProduct" not in plan
    # corpus exchange (vocab agg) + pair agg + rank: never more
    assert plan.count("Exchange hashpartitioning") <= 3


def test_q201_quintiles_are_banded_not_global_ntile(spark):
    """The quintile scores are segmented_ntile passes (banded prefix
    sum): no ntile function, no unpartitioned window over the |users|
    frame — the running sums are PARTITIONED BY the (value, tband)
    composite; the only global window is the 64-row band cumulative."""
    plan = plan_of(spark, "q201_rfm_segments")
    assert "CartesianProduct" not in plan
    assert "ntile" not in plan
    assert "hashpartitioning(monetary_cents" in plan
    # the 64-row band-total frame plans as two Window ops (running
    # offset + whole-frame total) — both bounded
    assert _global_windows(plan) <= 2


def test_q202_decile_is_banded_not_global_ntile(spark):
    """Same contract: corpus -> |users| agg -> banded exact decile ->
    10-row rollup; no ntile, no global window beyond the band frame."""
    plan = plan_of(spark, "q202_decile_calibration")
    assert "Scan ExistingRDD" in plan  # the checkpointed |users| agg
    assert "CartesianProduct" not in plan
    assert "ntile" not in plan
    assert "hashpartitioning(score" in plan
    assert _global_windows(plan) <= 2


def test_q203_post_pipeline_stages_are_reductions(spark):
    """Everything after the checkpointed pair graph reduces:
    |clusters| -> |sizes| aggs; the corpus totals ride ONE global
    window over the bounded |distinct sizes| histogram (PLAN_AUDIT
    waiver) — never a crossJoin(broadcast(agg(hist))) that plans
    `hist` and its upstream label-join twice."""
    plan = plan_of(spark, "q203_dedup_roi")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan  # hist planned once
    assert _global_windows(plan) == 1  # the histogram-sized totals


def test_q204_rank_is_band_partitioned(spark):
    """The global ascending rank must be segmented: within-band
    row_number PARTITIONED BY band + broadcast offsets — the only
    unpartitioned window is the |bands| cumulative."""
    plan = plan_of(spark, "q204_gini_coefficient")
    assert "hashpartitioning(band" in plan
    assert "CartesianProduct" not in plan


def test_q205_fold_runs_on_packed_week_frame(spark):
    """The KM product folds over a single packed row of |weeks|
    structs — the corpus collapses through two aggregations first;
    no corpus-sized window, no joins beyond the 1-row anchor."""
    plan = plan_of(spark, "q205_kaplan_meier")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # the anchor
    assert "partial_count" in plan or "partial_sum" in plan


def test_q206_two_corpus_scans_broadcast_quartiles(spark):
    """Quartiles reduce to |groups| and broadcast back; the whisker/
    outlier pass is one conditional aggregation."""
    plan = plan_of(spark, "q206_boxplot_stats")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_q207_manifest_joins_on_doc_id(spark):
    """The manifest join back to n_chars keys on doc_id — no product,
    no second signature pipeline."""
    plan = plan_of(spark, "q207_dedup_manifest")
    assert "CartesianProduct" not in plan
    assert plan.count("md5") <= 1


def test_q208_single_pass_to_bin_grid(spark):
    """One corpus aggregation onto the bounded 2-D bin grid."""
    plan = plan_of(spark, "q208_histogram_2d")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_count" in plan


def test_q209_forecast_joins_key_count_frames(spark):
    """The forecast joins |keys|-sized count frames, never the fact
    tables themselves."""
    plan = plan_of(spark, "q209_join_size_forecast")
    assert "CartesianProduct" not in plan
    # count-aggregate BELOW each join input: partial_count appears
    # before any join in every branch
    assert "partial_count" in plan


def test_q210_prefix_join_no_cartesian_single_tokenize(spark):
    """The prefix-filter join stays equi-keyed on shingle (never a
    cartesian), tokenizes the corpus exactly once (checkpoint fans
    the frame to four consumers), and verifies via array_intersect
    (no re-exploded posting-list aggregation after the candidates)."""
    plan = plan_of(spark, "q210_prefix_filter_join")
    assert "CartesianProduct" not in plan
    assert plan.count("LocalTableScan") + plan.count("Scan ExistingRDD") >= 1
    assert "array_intersect" in plan


def test_q245_scene_deltas_payloads_stay_mapside(spark):
    """The frame walk is one mapInPandas stage emitting int64 rows —
    payloads never shuffle; the lag window is doc-partitioned (no
    global sort) and the profile combines map-side."""
    plan = plan_of(spark, "q245_video_scene_deltas")
    assert "mapInPandas" in plan or "MapInPandas" in plan
    assert "partial_count" in plan
    assert "CartesianProduct" not in plan


def test_q243_planner_single_reduction(spark):
    """The planner is one checkpointed shingle pass reduced to a
    1-row decision — strictly cheaper than any strategy it prices."""
    plan = plan_of(spark, "q243_dedup_planner")
    assert "Scan ExistingRDD" in plan  # checkpointed shingle frame
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan or "partial_sum" in plan


def test_q244_stability_group_limited_ranks(spark):
    """The rank stage materializes once (checkpoint feeds both join
    sides), so the visible plan is tiny-frame work: a broadcast join
    over the <= 2x50-row rank frame and per-depth aggregations. The
    WindowGroupLimit shape inside the checkpointed stage is pinned by
    the rn <= 50 filter construction (same as q239's, asserted
    there)."""
    plan = plan_of(spark, "q244_topk_stability")
    assert "Scan ExistingRDD" in plan  # checkpointed rank frame
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q246_merge_both_sides_group_limited(spark):
    """Both the per-type partial bottom-k AND the direct global
    bottom-k compile to WindowGroupLimit (the global window is safe
    because every task pre-limits to k before the final merge); the
    comparison joins are 1-row broadcasts."""
    plan = plan_of(spark, "q246_kmv_union_merge")
    assert plan.count("WindowGroupLimit") >= 2
    assert "CartesianProduct" not in plan


def test_q241_theta_pairs_are_tiny_broadcast(spark):
    """The sketch pair stage is a broadcast self-join over the
    |types|-row sketch frame; bottom-k extraction keeps the
    WindowGroupLimit shape; no cartesian beyond the tiny broadcast
    inequality join."""
    plan = plan_of(spark, "q241_theta_intersection")
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_q242_redundancy_rides_q92(spark):
    """The source rollup adds only doc-keyed joins and a |sources|²
    aggregation above q92's verified pairs (array verify, no posting
    re-explosion)."""
    plan = plan_of(spark, "q242_cross_source_redundancy")
    assert "array_intersect" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q240_countmin_vocab_bounded(spark):
    """The sketch builds from ONE checkpointed vocab frame (the
    corpus is tokenized once); probes broadcast into the cell join;
    no corpus-sized work after the token count."""
    plan = plan_of(spark, "q240_countmin_calibration")
    assert "Scan ExistingRDD" in plan  # checkpointed vocab frame
    assert "BroadcastHashJoin" in plan  # probes side
    assert "CartesianProduct" not in plan


def test_q239_kmv_bottom_k_is_group_limited(spark):
    """The rank <= k filter compiles to WindowGroupLimit: each scan
    task keeps its local bottom-k per group BEFORE the shuffle, so
    the per-group sort never sees |users| rows — the specific shape
    that avoids the single-partition window trap."""
    plan = plan_of(spark, "q239_kmv_distinct_sketch")
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_q238_spectrum_two_stacked_aggs(spark):
    """The spectrum is two stacked aggregations with map-side
    partials; the dyadic bucket is scan-side expression work."""
    plan = plan_of(spark, "q238_frequency_spectrum")
    assert "partial_count" in plan
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "CartesianProduct" not in plan


def test_q237_bpe_merge_vocab_bounded(spark):
    """Iteration 2 stays vocab-bounded: the 1-row argmax merge
    broadcasts into the merge pass (BroadcastNestedLoopJoin on a
    1-row side is the cross join's correct shape), and there is no
    corpus-sized join anywhere after the token count."""
    plan = plan_of(spark, "q237_bpe_apply_merge")
    assert "CartesianProduct" not in plan
    assert "Scan ExistingRDD" in plan  # checkpointed vocab frame
    assert "replace" in plan  # the merge IS a string replace


def test_q236_kcore_rounds_node_keyed(spark):
    """Every peel round is node-keyed work over checkpointed,
    shrinking edge frames — no cartesian, no nested-loop join; the
    final plan reads materialized round outputs."""
    plan = plan_of(spark, "q236_kcore_peel")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Scan ExistingRDD" in plan  # checkpointed rounds


def test_q234_exact_curve_rides_prefix_join(spark):
    """The exact threshold curve is q210's posture at t=1/3 plus
    reductions: equi-keyed prefix join (no cartesian), one
    checkpointed tokenize pass, array_intersect verify; the banding
    adds a tiny aggregation + window above it. The ONLY nested-loop
    join allowed is the r8 routing guard's 1-row scalar attach
    (_prefix_guard_ok) — anything else would mean the prefix join
    degenerated to all-pairs."""
    plan = plan_of(spark, "q234_exact_threshold_curve")
    assert "CartesianProduct" not in plan
    # the only nested-loop joins allowed are the routing guard's
    # 1-row scalar attaches, fingerprinted by raise_error; any other
    # nested-loop join means the prefix join degenerated to all-pairs
    if "BroadcastNestedLoopJoin" in plan:
        assert "raise_error" in plan, (
            "a nested-loop join other than the 1-row routing guard"
        )
    assert plan.count("LocalTableScan") + plan.count("Scan ExistingRDD") >= 1
    assert "array_intersect" in plan


def test_q211_allocation_windows_on_sources_frame(spark):
    """Quota math windows run above the |sources| aggregation; the
    allocation joins back as a broadcast."""
    plan = plan_of(spark, "q211_stratified_allocation")
    assert "BroadcastHashJoin" in plan
    assert "partial_count" in plan  # counts aggregate map-side


def test_q212_triangles_oriented_join_keys(spark):
    """Degree-oriented wedge join: every join is hash-keyed (src /
    (src,dst)); no cartesian, no global sort."""
    plan = plan_of(spark, "q212_triangle_count")
    assert "CartesianProduct" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_q213_ema_single_user_aggregation(spark):
    """The EMA fold is one user-keyed aggregation: exactly one
    Exchange, fold evaluated scan-side above it."""
    plan = plan_of(spark, "q213_dyadic_ema")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "aggregate(" in plan


def test_q215_quantization_is_map_only(spark):
    """INT8 quantization never shuffles: all array math is scan-side."""
    plan = plan_of(spark, "q215_int8_quantization")
    assert "Exchange" not in plan


def test_q216_shard_rank_is_band_partitioned(spark):
    """The descending size rank is segmented: within-band windows are
    PARTITIONED BY band; no single-partition corpus window."""
    plan = plan_of(spark, "q216_balanced_shards")
    assert "partitionBy=[band" in plan.replace(" ", "") or "band#" in plan
    assert "BroadcastHashJoin" in plan  # offsets broadcast back


def test_q217_assortativity_shares_keyed_joins(spark):
    """Moment pass joins the degree frame per endpoint — hash-keyed,
    reduced output, no cartesian."""
    plan = plan_of(spark, "q217_degree_assortativity")
    assert "CartesianProduct" not in plan
    assert "partial_sum" in plan


def test_q218_dup_fraction_reuses_gram_exchange(spark):
    """One gram pass feeds df and the join back; per-doc aggregation
    combines map-side."""
    plan = plan_of(spark, "q218_duplicate_ngram_fraction")
    assert "partial_count" in plan
    assert "CartesianProduct" not in plan


def test_q219_lpa_rounds_are_keyed_joins(spark):
    """Each LPA round is a node-keyed join + (node,label) aggregation
    + rank; symmetrized edges come from one checkpoint."""
    plan = plan_of(spark, "q219_label_propagation")
    assert "CartesianProduct" not in plan
    assert plan.count("RunningWindowFunction") + plan.count("Window") >= 2


def test_q220_vocab_partials_bounded(spark):
    """(source, token) aggregation combines map-side — per-mapper
    state is vocabulary-bounded, not corpus-bounded."""
    plan = plan_of(spark, "q220_vocab_growth")
    assert "partial_count" in plan


def test_q221_smoothing_broadcasts_dims_and_global(spark):
    """Nation and the 1-row global rate broadcast; customer is NOT
    force-broadcast (it scales with SF — ADVICE r6), so only the
    genuinely-small sides carry hints. AQE may still auto-broadcast
    customer at small SF, hence >= 1 rather than an exact count."""
    plan = plan_of(spark, "q221_smoothed_segment_rates")
    assert plan.count("BroadcastHashJoin") >= 1
    assert "BroadcastNestedLoopJoin" in plan or plan.count("BroadcastHashJoin") >= 2


def test_q222_balance_fold_single_exchange(spark):
    """The clamped-balance fold is one user-keyed aggregation."""
    plan = plan_of(spark, "q222_clamped_running_balance")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "greatest" in plan


def test_q223_cdf_broadcast_one_corpus_exchange(spark):
    """The reference CDF builds on the value-domain frame and
    broadcasts back; the corpus side never shuffles for the lookup."""
    plan = plan_of(spark, "q223_quantile_mapping")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q224_keyword_scan_single_pass(spark):
    """Every keyword's conditional aggregate rides ONE corpus scan;
    no Exchange beyond the final single-row aggregation."""
    plan = plan_of(spark, "q224_keyword_scan")
    assert plan.count("Scan parquet") == 1
    assert "CartesianProduct" not in plan


def test_q225_pair_join_on_reduced_count_frame(spark):
    """The source-pair join runs over the (source, token) count frame
    (partial_count proves the reduction), never over documents."""
    plan = plan_of(spark, "q225_source_similarity")
    assert "partial_count" in plan
    assert "CartesianProduct" not in plan


def test_q226_coverage_rank_is_banded(spark):
    """The frequency rank over the type-count frame is the banded
    prefix sum (running sums partitioned by (c, tband)); the total is
    a 1-row broadcast, so the only global window is the band-total
    cumulative — a web-scale vocabulary never hits one task."""
    plan = plan_of(spark, "q226_vocab_coverage")
    assert "Scan ExistingRDD" in plan  # the checkpointed type counts
    assert "hashpartitioning(c#" in plan
    assert _global_windows(plan) <= 2


def test_q227_burstiness_single_window_shared_exchange(spark):
    """One user-partitioned lag window; the moment aggregation reuses
    the same user hash partitioning (no second corpus Exchange)."""
    plan = plan_of(spark, "q227_interarrival_burstiness")
    assert plan.count("Exchange hashpartitioning") == 1


def test_q228_spearman_ranks_band_partitioned(spark):
    """Both global ranks are segmented: within-band windows are
    PARTITIONED (never a corpus-wide single-partition sort), and the
    moments reduce the |users| frame."""
    plan = plan_of(spark, "q228_spearman_activity_value")
    assert "CartesianProduct" not in plan
    assert plan.count("Window") >= 2


def test_q229_checks_fuse_into_one_scan(spark):
    """All row-level expectations ride one corpus scan."""
    plan = plan_of(spark, "q229_expectation_checks")
    assert plan.count("Scan parquet") == 1


def test_q230_histogram_side_is_one_pass(spark):
    """Probe math joins the (checkpointed) |bins| frame — no
    cartesian; the exact-percentile truth side broadcasts as a
    1-row frame."""
    plan = plan_of(spark, "q230_histogram_quantile_error")
    assert "CartesianProduct" not in plan
    assert "percentile" in plan  # truth side rides q99's surface
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_q231_confusion_single_agg_no_rescan(spark):
    """Scoring is scan-side; the confusion matrix is one map-side-
    combined aggregation, per-actual totals a window on the cell
    frame — the corpus is scanned once."""
    plan = plan_of(spark, "q231_langid_confusion")
    assert plan.count("Scan parquet") == 1
    assert "partial_count" in plan


def test_q232_sensitivity_rides_q92_pipeline(spark):
    """The banding adds only reductions above q92's verified pairs —
    no cartesian, verify joins stay equi-keyed."""
    plan = plan_of(spark, "q232_threshold_sensitivity")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# Round-9 additions: quantile sketch family, mixing program, Bloom
# decontamination, reservoir
# ---------------------------------------------------------------------------


def test_q253_histogram_map_side_combined(spark):
    """The sketch build is one scan into a map-side-combined
    per-(group, bucket) count; no cartesian, no global sort."""
    plan = plan_of(spark, "q253_quantile_sketch")
    assert "partial_count" in plan
    assert "CartesianProduct" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_q260_probe_is_broadcast_only_until_per_doc_agg(spark):
    """The decontamination probe must be K+1 broadcast hash lookups
    (4 bit positions + the exact-truth marker) with EXACTLY ONE
    shuffle in the whole corpus path — the per-doc aggregate. A
    second hashpartitioning exchange would mean a gram-keyed join
    crept back onto the training corpus."""
    plan = plan_of(spark, "q260_bloom_decontamination")
    assert plan.count("BroadcastHashJoin") == 5
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q261_prefix_audit_is_topk_not_global_sort(spark):
    """The schedule's head audit compiles to TakeOrderedAndProject
    (per-partition heaps); a global sort would materialize the order
    the operator exists to avoid."""
    plan = plan_of(spark, "q261_interleave_schedule")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_q262_reservoir_uses_window_group_limit(spark):
    """Bottom-k per stratum must be WindowGroupLimit twice (partial
    before the shuffle, final after) and the salted hash computed at
    ONE site — the q239 plan shape."""
    plan = plan_of(spark, "q262_reservoir_sample")
    assert plan.count("WindowGroupLimit") == 2
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("md5") == 1
    assert "Exchange rangepartitioning" not in plan


def test_q263_drift_monitor_broadcasts_target(spark):
    """The |types|-row target attaches by broadcast; daily counts are
    map-side combined; nothing range-partitions."""
    plan = plan_of(spark, "q263_mixture_drift_monitor")
    assert "BroadcastHashJoin" in plan
    assert "partial_count" in plan
    assert "Exchange rangepartitioning" not in plan


def test_q257_sampler_hash_single_site_and_broadcast_plan(spark):
    """The sampler's accept filter hashes each doc at ONE site and
    the mixing plan attaches by broadcast — the corpus side is one
    map-side pass into the realized-count aggregate."""
    plan = plan_of(spark, "q257_temperature_sampler")
    assert plan.count("md5") == 1
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q265_bitext_candidates_equi_join_never_allpairs(spark):
    """The bitext miner's pair generator must be an equi-join on the
    LSH bucket key — CartesianProduct/BNLJ anywhere is the O(n^2)
    fallback the margin pipeline exists to avoid. Post-checkpoint the
    assembly runs on anchor-keyed frames (SMJ is the at-scale shape)."""
    plan = plan_of(spark, "q265_margin_bitext_mining")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= 4


def test_q266_range_planner_is_one_corpus_pass(spark):
    """The histogram must map-side combine (partial_count) into one
    exchange; the walk's single-partition window runs on the sketch
    frame only; nothing range-partitions (the planner PLANS the range
    shuffle, it must not pay one)."""
    plan = plan_of(spark, "q266_range_partition_planner")
    assert "partial_count" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange rangepartitioning" not in plan


def test_q267_salt_planner_broadcasts_cells(spark):
    """The 4x512 cell frame attaches to the probe side by broadcast;
    no range partitioning; the probe groupBy is the only wide
    exchange after the checkpointed count frame."""
    plan = plan_of(spark, "q267_salt_factor_planner")
    assert plan.count("BroadcastHashJoin") == 1
    assert "CartesianProduct" not in plan
    assert "Exchange rangepartitioning" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_q268_dataset_card_rollups_combine_map_side(spark):
    """All three rollups over the checkpointed base must map-side
    combine; the dominant-language rank=1 compiles to WindowGroupLimit
    (partial + final); card assembly joins broadcast tiny frames."""
    plan = plan_of(spark, "q268_dataset_card")
    assert "partial_count" in plan
    assert plan.count("WindowGroupLimit") == 2
    assert plan.count("BroadcastHashJoin") >= 2
    assert "Exchange rangepartitioning" not in plan


def test_q269_span_probe_is_broadcast_map_side(spark):
    """Eval grams broadcast; the corpus takes one posexplode pass with
    no gram-keyed shuffle; the doc-keyed Exchange is shared by the
    island windows and the span aggregate."""
    plan = plan_of(spark, "q269_contamination_spans")
    assert plan.count("BroadcastHashJoin") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_q270_surgery_rebuild_touches_flagged_sliver_only(spark):
    """Both the contaminated-doc id set and the coverage positions
    attach by broadcast BEFORE the per-token rebuild, so the expensive
    pass runs on the flagged sliver, never the corpus."""
    plan = plan_of(spark, "q270_span_surgery")
    assert plan.count("BroadcastHashJoin") == 2
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "SortMergeJoin" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_q272_curve_rides_capped_pipeline_no_cartesian(spark):
    """The precision curve must ride the capped candidate pipeline:
    no CartesianProduct anywhere (the threshold cross join is a 4-row
    broadcast, which compiles to BroadcastNestedLoopJoin, fine); the
    label joins attach to the rank-1-sized mutual frame."""
    plan = plan_of(spark, "q272_mining_precision_curve")
    assert "CartesianProduct" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_q276_fused_frame_single_visible_exchange(spark):
    """Everything derives from ONE fused per-user count frame (the
    checkpointed conditional-count aggregation): the post-checkpoint
    plan carries a single exchange (the final filter/select path),
    rank-(k+1) offset probes, and no cartesian (1-row offset frames
    attach by broadcast NLJ, the accepted scalar-attach class)."""
    plan = plan_of(spark, "q276_mg_merge_bound")
    assert (
        plan.count("Exchange hashpartitioning")
        + plan.count("Exchange SinglePartition")
        <= 2
    )
    assert "CartesianProduct" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_q277_two_chains_no_cartesian(spark):
    """Both mining chains stay bucketed equi-joins (no cartesian, no
    range partitioning) even though the audit runs two of them."""
    plan = plan_of(spark, "q277_bucket_cap_recall")
    assert "CartesianProduct" not in plan
    assert "Exchange rangepartitioning" not in plan
