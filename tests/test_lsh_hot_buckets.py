"""Hot-bucket star linking: a template-heavy corpus (one text shared
by > MAX_BUCKET docs) must keep its duplicate cluster connected
through the LSH candidate stage, with pair volume linear — not
quadratic — in the bucket size. Round 1 dropped hot buckets entirely,
silently losing every pair in them (a recall cliff)."""

from __future__ import annotations

from pyspark.sql import functions as F

from target_hdfs_spark.operators.dedup import (
    MAX_BUCKET,
    connected_components,
    lsh_bucket_stats,
    lsh_candidate_pairs,
    minhash_signatures,
)

N_TEMPLATE = MAX_BUCKET + 36  # 100 docs sharing one template text


def _hot_corpus(spark):
    template = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, template) for i in range(N_TEMPLATE)]
    # a normal near-dup pair, textually distinct from the template
    rows += [
        (500, "completely different content about spark shuffle partitioning"),
        (501, "completely different content about spark shuffle partitioning"),
    ]
    # genuinely dissimilar singletons (no shared shingles)
    distinct_texts = [
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet",
        "one two three four five six seven eight nine ten eleven twelve",
        "rain snow hail thunder lightning cloud storm breeze frost mist",
        "copper iron zinc nickel cobalt silver gold platinum mercury lead",
        "violin cello oboe clarinet bassoon trumpet trombone tuba harp flute",
    ]
    rows += [(600 + i, t) for i, t in enumerate(distinct_texts)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hot_bucket_recall_preserved(spark):
    docs = _hot_corpus(spark)
    pairs = lsh_candidate_pairs(minhash_signatures(docs))
    labels = connected_components(docs.select("doc_id"), pairs)
    clusters = {r.doc_id: r.cluster for r in labels.collect()}
    # every template doc lands in the SAME cluster (rooted at doc 0):
    # star linking preserved the hot bucket's connectivity
    assert {clusters[i] for i in range(N_TEMPLATE)} == {0}
    # the distinct near-dup pair still clusters normally
    assert clusters[500] == clusters[501] == 500
    # singletons stay alone
    for i in range(5):
        assert clusters[600 + i] == 600 + i


def test_hot_bucket_pair_volume_is_linear(spark):
    docs = _hot_corpus(spark)
    pairs = lsh_candidate_pairs(minhash_signatures(docs))
    n_template_pairs = pairs.filter(
        (F.col("doc_a") < N_TEMPLATE) & (F.col("doc_b") < N_TEMPLATE)
    ).count()
    # star over identical signatures: exactly N-1 pairs (all bands give
    # the same (root, doc) pair, deduped), NOT N*(N-1)/2
    assert n_template_pairs == N_TEMPLATE - 1


def test_bucket_stats_reports_hot_buckets(spark):
    docs = _hot_corpus(spark)
    stats = {r.band_idx: r for r in lsh_bucket_stats(minhash_signatures(docs)).collect()}
    assert set(stats) == {0, 1, 2, 3}
    for r in stats.values():
        # the template bucket is hot in every band (identical sigs)
        assert r.n_hot_buckets == 1
        assert r.max_bucket_n == N_TEMPLATE
        assert r.n_star_pairs == N_TEMPLATE - 1
        # the 500/501 near-dup pair contributes join pairs in at least
        # one band; never more than 1 per band here
        assert 0 <= r.n_join_pairs <= 1
    assert any(r.n_join_pairs == 1 for r in stats.values())


def test_q45_df_cap_routes_hot_shingle_corpora_to_q92(spark, tmp_path):
    """The standalone exact Jaccard verifier must REFUSE a corpus with
    a stop-shingle hotter than its df cap — raising the routing error
    naming q92 — instead of silently going quadratic."""
    import pytest

    from target_hdfs_spark.operators.dedup import (
        _Q45_MAX_SHINGLE_DF,
        q45_ngram_jaccard_pairs,
    )

    n = _Q45_MAX_SHINGLE_DF + 8
    rows = [
        (i, f"shared stop shingle unique{i} tail{i}", "en", "test", 30)
        for i in range(n)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    docs.write.parquet(f"{tmp_path}/documents.parquet")
    with pytest.raises(Exception, match="q92_lsh_verified_pairs"):
        q45_ngram_jaccard_pairs(spark, str(tmp_path)).count()
