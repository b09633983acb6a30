"""Named-query registry: the oracle-checkable operator surface.

Every operator the engine claims (SURVEY.md §2) registers one named
query here via the ``@query`` decorator. Each entry carries:

- ``fn(spark, sf_dir) -> DataFrame`` — the Spark-first implementation;
- ``oracle`` — equivalent ANSI SQL runnable by DuckDB on the same
  parquet tables (views: region nation customer supplier part orders
  lineitem events documents embeddings), or ``None`` for genuinely
  non-SQL-expressible operators (driver then records a rows-only
  check).

Column names must match between the two: the comparison sorts columns
by name before hashing values, so every computed column is aliased
identically on both sides (lowercase, since DuckDB lowercases unquoted
identifiers).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Register an oracle-checkable named query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "", tags=tags
        )
        return fn

    return deco


# Evaluation-priority order. The round driver records correctness
# rows for only the FIRST 50 registered queries, so this tuple is the
# rotation schedule: rounds 1-2 put one representative of every
# component family in the window (all green — see CORRECTNESS_r01/r02
# at the repo root); round 3 rotates the 48 queries that had no
# driver row yet into positions 1-48, keeping two green veterans as
# canaries at 49-50 (q01 = the flagship scan/agg path, q85 = the CC
# pipeline rewritten this round). Cumulative driver-checked coverage
# after this rotation = the full registry. Queries not listed here
# follow in registration order; unknown names are ignored (safe
# against renames).
PRIORITY_ORDER = (
    # --- never-driver-checked block (48): TPC-H shapes -------------
    "q51_token_frequencies",      # L4 (bench headline — keep early)
    "q32_sliding_window",         # S2 sliding
    "q68_disjunctive_predicates", # E3 OR-pushdown
    "q72_applyinpandas_minmax_norm",  # E24 applyInPandas
    "q73_nation_pair_volume",     # TPC-H Q7 shape
    "q74_market_share",           # TPC-H Q8 shape
    "q75_customer_order_distribution",  # TPC-H Q13 shape
    "q76_top_supplier",           # TPC-H Q15 shape
    "q79_forecast_revenue_change",  # TPC-H Q6 shape
    "q80_product_profit",         # TPC-H Q9 shape
    "q81_returned_item_ranking",  # TPC-H Q10 shape
    "q82_important_part_value",   # TPC-H Q11 shape
    "q83_dominant_brand_suppliers",  # TPC-H Q16 shape
    "q84_sole_late_suppliers",    # TPC-H Q21 shape
    "q86_full_outer_year_activity",  # E4 full outer
    "q87_bag_set_ops",            # E16 bag semantics
    "q88_unpivot",                # E22 unpivot
    "q91_zorder_values",          # z-order interleave
    # --- similarity / ANN stack ------------------------------------
    "q48_embedding_neardup_pairs",  # L2/L3 embedding near-dup
    "q49_embedding_norms",        # L3 norms
    "q70_ann_ivf_multiprobe",     # L3 multi-probe IVF
    "q71_ann_recall",             # L3 in-engine recall@k
    "q77_hamming_rerank",         # L3 shortlist + exact re-rank
    "q78_kmeans_ivf_cells",       # L3 k-means (rows-only, iterative)
    "q89_pq_codes",               # L3 product quantization
    "q90_pq_adc_search",          # L3 PQ ADC search
    # --- text / curation tail --------------------------------------
    "q56_bigram_counts",
    "q57_document_chunks",
    "q58_redacted_documents",
    "q59_unicode_normalize",
    "q93_lsh_bucket_stats",
    "q95_lsh_editdistance_pairs",
    "q96_simhash_hamming_pairs",
    "q102_sequence_packing",
    "q103_repetition_quality",
    "q105_scd2_intervals",
    "q106_group_topk_sample",
    "q107_pit_feature_join",
    "q108_substring_duplication",
    "q109_bloom_join_reduction",
    "q110_subword_token_counts",
    "q111_oov_rate",
    "q112_trimmed_mean",
    "q113_weighted_sample",
    "q114_corpus_mixture",
    "q115_shard_manifest",
    "q116_incremental_dedup",
    "q117_quality_percentile_filter",
    # --- position 49: new this round (batch twin of the streaming
    # state-store dedup operator) -----------------------------------
    "q118_bucket_root_dedup",
    # --- position 50 canary: green veteran whose CC pipeline was
    # rewritten this round (q01 needs no canary slot — the driver's
    # entry() smoke check runs it every round anyway) ----------------
    "q85_dedup_clusters",
    # --- new in round 3, positions 51-53: first in line for the
    # round-4 window rotation --------------------------------------
    "q119_unigram_lm_quality",
    "q120_minhash_containment",
    "q121_priority_sample",
    "q122_pandas_cosine_topk",
    # --- driver-green veterans (rounds 1-2), family order ----------
    "q01_pricing_summary",
    "q02_filter_project",
    "q03_local_supplier_revenue",
    "q04_semi_join_urgent_customers",
    "q05_anti_join_orderless_customers",
    "q06_range_join_size_bands",
    "q30_asof_join_last_view",
    "q08_distinct",
    "q09_rollup",
    "q99_exact_percentiles",
    "q20_approx_aggs",
    "q10_window_rank",
    "q11_window_analytic",
    "q12_global_topk",
    "q13_set_ops",
    "q14_string_funcs",
    "q15_date_funcs",
    "q16_math_conditional",
    "q17_array_explode",
    "q18_json_extract",
    "q19_pivot",
    "q21_sample",
    "q22_pandas_udf",
    "q38_argmax_aggregates",
    "q40_exact_dedup",
    "q42_minhash_signatures",
    "q43_minhash_lsh_pairs",
    "q44_simhash",
    "q46_cosine_topk",
    "q47_ann_lsh_bucketed",
    "q63_ann_ivf",
    "q69_hamming_neighbors",
    "q50_token_stats",
    "q52_tfidf",
    "q53_lang_id",
    "q55_fingerprint",
    "q54_quality_filter",
    "q100_hash_split",
    "q101_decontamination",
    "q104_stratified_hash_sample",
    "q97_table_profile",
    "q60_binary_metadata",
    "q61_image_decode_pipeline",
    "q94_wav_audio_meta",
    "q31_tumbling_window",
    "q33_session_window",
    "q34_salted_skew_agg",
    "q92_lsh_verified_pairs",
    "q98_corpus_pipeline",
    "q39_null_semantics",
    "q25_below_average_lineitems",
    "q41_hash_dedup_groups",
    "q45_ngram_jaccard_pairs",
    "q62_frame_sampling",
    "q64_audio_features",
    "q07_agg_stats",
    "q23_shipping_priority",
    "q24_large_volume_orders",
    "q26_window_distribution",
    "q27_range_frame_spend",
    "q28_cube",
    "q29_grouping_sets_sql",
    "q35_parts_supplier_counts",
    "q36_rich_inactive_customers",
    "q37_cheapest_supplier_per_part",
    "q65_priority_order_counts",
    "q66_priority_shipping_buckets",
    "q67_brand_revenue_share",
)


def all_queries() -> dict[str, QuerySpec]:
    """Import all operator modules (side effect: registration) and
    return the registry in evaluation-priority order."""
    # Imports are deferred so `import target_hdfs_spark` stays cheap.
    from target_hdfs_spark.operators import (  # noqa: F401
        asof,
        curation,
        dedup,
        multimodal,
        relational,
        similarity,
        skew,
        text,
        windows,
    )

    ordered: dict[str, QuerySpec] = {}
    for name in PRIORITY_ORDER:
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered
