"""Deduplication operators for LLM-corpus pipelines (SURVEY.md §2B.2
L1/L2): exact, hash-based exact, MinHash+LSH near-dup, SimHash, and
n-gram Jaccard near-dup — all fully deterministic and verified value-
for-value against the DuckDB oracle (the portable md5-based hash family
in functions/hashing.py makes the sketches engine-agnostic).

Scale notes (the whole point of these formulations):
- exact dedup: one shuffle on the dedup key; with row_number instead
  of dropDuplicates the surviving representative is deterministic.
- MinHash+LSH: signatures are computed scan-side (no shuffle); the
  only shuffle is the band-key self-join, which touches candidate
  buckets instead of the O(n^2) pair space. Band-bucket skew is the
  known risk at 100 TB — monitor bucket sizes, add a bucket-size cap
  or salt hot buckets.
- SimHash: one explode + one groupBy(doc) — linear, and the 32-bit
  signature supports Hamming-distance blocking downstream.
- n-gram Jaccard: exploded shingle self-join; quadratic in the worst
  case, provided as the exact verifier for MinHash candidates, not as
  the 100 TB primary path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from target_hdfs_spark.functions.hashing import (
    MERSENNE_P,
    hash_coeffs,
    md5_hash32,
    md5_hash32_sql,
)
from target_hdfs_spark.functions.textfuncs import (
    TOKENS_SQL,
    shingles,
    shingles_sql,
    tokens,
)
from target_hdfs_spark.registry import query
from target_hdfs_spark.sources.readers import load_table

NUM_HASHES = 16
BANDS = 4
ROWS_PER_BAND = NUM_HASHES // BANDS
# LSH hot-bucket suppression threshold: buckets larger than this are
# degenerate (near-constant content) and would re-create the quadratic
# pair space; at cluster scale this cap is what keeps the worst
# executor bounded.
MAX_BUCKET = 64
COEFFS = hash_coeffs(NUM_HASHES)

_TOK = TOKENS_SQL.format(expr="text")
_SHINGLE_HASHES_SQL = (
    f"list_transform({shingles_sql(_TOK)}, s -> {md5_hash32_sql('s')})"
)



def _band_table(sig: DataFrame) -> DataFrame:
    """(doc_id, band_idx, band_key) banding of a minhash signature
    table — the shared first stage of candidate generation and bucket
    telemetry."""
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.concat_ws(
                    "_",
                    *[
                        F.col(f"mh_{b * ROWS_PER_BAND + r}").cast("string")
                        for r in range(ROWS_PER_BAND)
                    ],
                ).alias("band_key"),
            )
            for b in range(BANDS)
        ]
    )
    return sig.select("doc_id", F.explode(band_structs).alias("b")).select(
        "doc_id", F.col("b.band_idx").alias("band_idx"), F.col("b.band_key").alias("band_key")
    )


def lsh_candidate_pairs(sig: DataFrame) -> DataFrame:
    """(doc_a, doc_b) candidate pairs from a minhash signature table:
    band the signature (BANDS x ROWS_PER_BAND), self-join buckets of
    2..MAX_BUCKET docs, and STAR-LINK hot buckets (> MAX_BUCKET docs):
    each doc pairs with the bucket's minimum doc_id only. The single
    implementation behind q43 / q85 / q92 — banding changes happen
    here once (the oracle twin is _LSH_PAIRS_SQL).

    Hot-bucket star linking (vs round-1's silent drop): a degenerate
    bucket (template-heavy / near-constant content) would re-create
    the quadratic pair space; dropping it loses ALL its pairs — a
    recall cliff. The star keeps O(bucket_n) pairs that preserve the
    bucket's connectivity exactly, so downstream connected-components
    dedup (q85) sees the same clusters as the full pair set, while the
    worst executor stays linear in the bucket size. Pairwise verifiers
    (q92) see the star edges as candidates like any others.
    """
    # bucket size + root via ONE window over the bucket key instead of
    # a sizes aggregate joined back twice: the single Exchange that
    # hash-partitions bands by (band_idx, band_key) serves the window
    # AND pre-partitions both sides of the bucket self-join (no
    # re-shuffle — the join keys equal the window partition keys).
    # The windowed frame is CHECKPOINTED because three consumers read
    # it (self-join side a, side c, star filter): without the barrier
    # Catalyst replays the whole signature pipeline — tokenize →
    # shingle → md5 → 16-min groupBy → band explode → window — once
    # per consumer subtree (q43's compiled plan carried the scan 3x).
    # The materialized frame is 4 rows/doc of (id, band key, n, root)
    # — the same bytes the band exchange already shuffles — traded
    # for two full recomputes of the far heavier minhash stage.
    w = Window.partitionBy("band_idx", "band_key")
    bands = _band_table(sig).select(
        "doc_id",
        "band_idx",
        "band_key",
        F.count(F.lit(1)).over(w).alias("bucket_n"),
        F.min("doc_id").over(w).alias("root"),
    ).localCheckpoint(eager=True)
    kept = bands.filter(F.col("bucket_n").between(2, MAX_BUCKET)).select(
        "doc_id", "band_idx", "band_key"
    )
    a, c = kept.alias("a"), kept.alias("c")
    normal_pairs = a.join(
        c,
        (F.col("a.band_idx") == F.col("c.band_idx"))
        & (F.col("a.band_key") == F.col("c.band_key"))
        & (F.col("a.doc_id") < F.col("c.doc_id")),
    ).select(F.col("a.doc_id").alias("doc_a"), F.col("c.doc_id").alias("doc_b"))
    star_pairs = (
        bands.filter((F.col("bucket_n") > MAX_BUCKET) & (F.col("doc_id") > F.col("root")))
        .select(F.col("root").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    )
    return normal_pairs.unionByName(star_pairs).distinct()


def lsh_bucket_stats(sig: DataFrame) -> DataFrame:
    """Per-band LSH bucket telemetry: bucket counts, the largest
    bucket, how many buckets went hot (star-linked), and the resulting
    pair volumes. At 100 TB this is the side output an operator watches
    to catch signature degeneracy BEFORE it becomes a skewed join."""
    bands = _band_table(sig)
    sizes = bands.groupBy("band_idx", "band_key").agg(
        F.count(F.lit(1)).alias("bucket_n")
    )
    hot = F.col("bucket_n") > MAX_BUCKET
    normal = F.col("bucket_n").between(2, MAX_BUCKET)
    return sizes.groupBy("band_idx").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.max("bucket_n").cast("bigint").alias("max_bucket_n"),
        F.sum(F.when(hot, 1).otherwise(0)).cast("bigint").alias("n_hot_buckets"),
        F.sum(
            F.when(normal, F.expr("bucket_n * (bucket_n - 1) DIV 2")).otherwise(0)
        )
        .cast("bigint")
        .alias("n_join_pairs"),
        F.sum(F.when(hot, F.col("bucket_n") - 1).otherwise(0))
        .cast("bigint")
        .alias("n_star_pairs"),
    )


# ---------------------------------------------------------------------------
# L1a: exact dedup with deterministic survivor
# ---------------------------------------------------------------------------


@query(
    "q40_exact_dedup",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    QUALIFY row_number() OVER (PARTITION BY text, lang ORDER BY doc_id) = 1
    """,
    tags=("dedup", "exact"),
)
def q40_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on (text, lang), keeping the lowest doc_id.
    row_number (not dropDuplicates) so the survivor is deterministic —
    dropDuplicates keeps an arbitrary partition-order-dependent row,
    which is unacceptable for reproducible corpus builds."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("text", "lang").orderBy("doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "n_chars")
    )


# ---------------------------------------------------------------------------
# L1b: hash-groupBy exact dedup report (content-hash based)
# ---------------------------------------------------------------------------


@query(
    "q41_hash_dedup_groups",
    oracle=f"""
    SELECT {md5_hash32_sql('text')} AS content_hash,
           COUNT(*) AS n_copies,
           MIN(doc_id) AS keeper_doc_id
    FROM documents
    GROUP BY 1
    """,
    tags=("dedup", "exact", "hash"),
)
def q41_hash_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash dedup groups: hash the payload once scan-side, then
    group — at 100 TB this shuffles a 8-byte hash instead of the full
    document text."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(md5_hash32("text").alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
    )


# ---------------------------------------------------------------------------
# L2a: MinHash signatures
# ---------------------------------------------------------------------------


def minhash_signatures(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """(id, mh_0..mh_{k-1}) MinHash signature table.

    The tokenize -> shingle -> md5 chain is evaluated ONCE per document
    by exploding shingle hashes to rows and computing all k universal-
    hash minima in a single groupBy aggregation. The naive form — k
    array_min(transform(...)) projections — recomputes the md5 chain
    k times (Catalyst collapses projections and duplicates the common
    subexpression), which measured 16x slower at sf0.1.

    Scale: explode keeps it linear; the k mins combine map-side, so
    the shuffle carries one row per (doc, k mins), not per shingle.
    """
    from target_hdfs_spark.sources.readers import fan_out

    # parallelize-before-amplify: rebalance the compact (id, text)
    # rows across all cores BEFORE the shingle explosion + md5 chain —
    # a single-row-group input would otherwise run the whole sketch
    # stage on one task (see fan_out docstring)
    with_toks = fan_out(docs.select(id_col, text_col), id_col).select(
        id_col, tokens(text_col).alias("_toks")
    )
    hashed = with_toks.select(
        id_col,
        F.explode(F.transform(shingles(F.col("_toks")), md5_hash32)).alias("h"),
    )
    return hashed.groupBy(id_col).agg(*_mh_min_aggs())


def _mh_min_aggs() -> list:
    """The k universal-hash minimum aggregates over an exploded
    shingle-hash column ``h`` — shared by the text-input and
    set-input signature builders."""
    return [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % MERSENNE_P).alias(f"mh_{i}")
        for i, (a, b) in enumerate(COEFFS)
    ]


def shingle_sets(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(id, sh_arr) per-document DISTINCT shingle set, built MAP-SIDE
    with ``array_distinct`` over the shingle array (optimization guide
    §2.4: remove shuffles outright).

    This replaces the exploded-row construction of the verify family
    (tokenize → explode → DISTINCT → collect_set/countDistinct), which
    paid three shuffles of the full shingle strings — one for the
    distinct, one to re-collect the per-doc arrays, one for the sizes
    aggregate — with ZERO: the set never leaves the row it came from.
    ``array_distinct`` preserves first-occurrence order; set size and
    ``array_intersect`` overlap counts are order-independent, so every
    downstream value (na, nb, n_common) is identical to the exploded
    derivation the oracle SQL still uses.

    Callers that need posting rows (df guards, streaming verify)
    recover them with ``F.explode("sh_arr")`` — already distinct.
    """
    from target_hdfs_spark.sources.readers import fan_out

    return (
        fan_out(docs.select(id_col, text_col), id_col)
        .select(id_col, tokens(text_col).alias("_toks"))
        .select(
            id_col,
            F.array_distinct(shingles(F.col("_toks"))).alias("sh_arr"),
        )
    )


def minhash_signatures_from_sets(sets: DataFrame,
                                 id_col: str = "doc_id") -> DataFrame:
    """(id, mh_0..mh_{k-1}) signatures derived from a shingle_sets
    frame — duplicates never change a minimum, so the signature over
    the DISTINCT set equals minhash_signatures' over raw shingles
    (the oracle replays the raw-list form and agrees value-for-value).

    Sharing one checkpointed shingle_sets frame between the signature
    and the exact-verify stages makes the tokenize+shingle+md5 chain
    run ONCE per corpus in the composed LSH→verify queries (q92 /
    q120 / q214 / q232 / q242 / q299) instead of once per consumer
    subtree (measured 6-8 redundant scans in the round-10 plans)."""
    hashed = sets.select(
        id_col, F.explode(F.transform(F.col("sh_arr"), md5_hash32)).alias("h")
    )
    return hashed.groupBy(id_col).agg(*_mh_min_aggs())


def _minhash_sql_exprs() -> list[str]:
    return [
        f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {MERSENNE_P})) AS mh_{i}"
        for i, (a, b) in enumerate(COEFFS)
    ]


# Oracle twins of _band_table / lsh_candidate_pairs, shared by q43 /
# q85 / q92 / q93 / q98 so the banding + hot-bucket-star semantics
# live in exactly one SQL place, mirroring the single Python
# implementation. `source` is any relation exposing (doc_id, text).
def _lsh_bands_sql(source: str = "documents") -> str:
    return f"""
    hashed AS (
      SELECT doc_id, {_SHINGLE_HASHES_SQL} AS hs FROM {source}
    ),
    sigs AS (
      SELECT doc_id, {", ".join(_minhash_sql_exprs())} FROM hashed
    ),
    bands AS (
      SELECT doc_id, b.band_idx, b.band_key
      FROM sigs, UNNEST([{", ".join(
          "{'band_idx': %d, 'band_key': concat_ws('_', %s)}" % (
              b, ", ".join(f"mh_{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND))
          )
          for b in range(BANDS)
      )}]) AS t(b)
    )"""


def _lsh_pairs_sql(source: str = "documents") -> str:
    return f"""{_lsh_bands_sql(source)},
    bucket_sizes AS (
      SELECT band_idx, band_key, COUNT(*) AS bucket_n
      FROM bands GROUP BY 1, 2
    ),
    kept AS (
      SELECT bands.* FROM bands
      JOIN bucket_sizes USING (band_idx, band_key)
      WHERE bucket_n BETWEEN 2 AND {MAX_BUCKET}
    ),
    hot_docs AS (
      SELECT bands.* FROM bands
      JOIN bucket_sizes USING (band_idx, band_key)
      WHERE bucket_n > {MAX_BUCKET}
    ),
    hot_roots AS (
      SELECT band_idx, band_key, MIN(doc_id) AS root
      FROM hot_docs GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, c.doc_id AS doc_b
      FROM kept a JOIN kept c
        ON a.band_idx = c.band_idx AND a.band_key = c.band_key
           AND a.doc_id < c.doc_id
      UNION
      SELECT r.root AS doc_a, d.doc_id AS doc_b
      FROM hot_docs d JOIN hot_roots r USING (band_idx, band_key)
      WHERE d.doc_id > r.root
    )
"""


_LSH_BANDS_SQL = _lsh_bands_sql()
_LSH_PAIRS_SQL = _lsh_pairs_sql()


@query(
    "q42_minhash_signatures",
    oracle=f"""
    WITH hashed AS (
      SELECT doc_id, {_SHINGLE_HASHES_SQL} AS hs FROM documents
    ),
    sigs AS (
      SELECT doc_id, {", ".join(_minhash_sql_exprs())} FROM hashed
    )
    SELECT doc_id, u.h_idx, u.minhash
    FROM sigs,
         UNNEST([{", ".join(f"{{'h_idx': {i}, 'minhash': mh_{i}}}" for i in range(NUM_HASHES))}])
         AS t(u)
    """,
    tags=("dedup", "minhash"),
)
def q42_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (16 hashes over 3-word shingles), exploded to
    (doc_id, h_idx, minhash) rows. Fully deterministic via the portable
    hash family, so the oracle checks every signature value."""
    docs = load_table(spark, sf_dir, "documents")
    sig = minhash_signatures(docs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("h_idx"), F.col(f"mh_{i}").cast("bigint").alias("minhash")
            )
            for i in range(NUM_HASHES)
        ]
    )
    return sig.select("doc_id", F.explode(pairs).alias("u")).select(
        "doc_id", F.col("u.h_idx").alias("h_idx"), F.col("u.minhash").alias("minhash")
    )


# ---------------------------------------------------------------------------
# L2b: LSH banding -> near-dup candidate pairs
# ---------------------------------------------------------------------------


@query(
    "q43_minhash_lsh_pairs",
    oracle=f"""
    WITH {_LSH_PAIRS_SQL}
    SELECT DISTINCT doc_a, doc_b FROM pairs
    """,
    tags=("dedup", "minhash", "lsh"),
)
def q43_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate candidate pairs via MinHash LSH banding
    (4 bands x 4 rows): docs agreeing on any full band become a pair.

    Scale: the self-join key is (band_idx, band_key) — only docs that
    collide in a bucket are ever compared, which is the mechanism that
    replaces the O(n^2) pair space at 100 TB. Hot buckets (> MAX_BUCKET
    docs, i.e. degenerate near-constant content) are star-linked to the
    bucket minimum instead of self-joined — connectivity-preserving
    suppression; a full self-join on one pathological bucket re-creates
    the quadratic join this operator exists to avoid (observed: 132 s
    -> sub-second at sf0.1), while dropping the bucket entirely (round
    1) silently lost every pair in it.
    """
    docs = load_table(spark, sf_dir, "documents")
    sig = minhash_signatures(docs)
    return lsh_candidate_pairs(sig)


@query(
    "q93_lsh_bucket_stats",
    oracle=f"""
    WITH {_LSH_BANDS_SQL},
    bucket_sizes AS (
      SELECT band_idx, band_key, COUNT(*) AS bucket_n
      FROM bands GROUP BY 1, 2
    )
    SELECT band_idx,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(MAX(bucket_n) AS BIGINT) AS max_bucket_n,
           CAST(SUM(CASE WHEN bucket_n > {MAX_BUCKET} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hot_buckets,
           CAST(SUM(CASE WHEN bucket_n BETWEEN 2 AND {MAX_BUCKET}
                         THEN bucket_n * (bucket_n - 1) // 2 ELSE 0 END) AS BIGINT)
             AS n_join_pairs,
           CAST(SUM(CASE WHEN bucket_n > {MAX_BUCKET}
                         THEN bucket_n - 1 ELSE 0 END) AS BIGINT)
             AS n_star_pairs
    FROM bucket_sizes
    GROUP BY band_idx
    """,
    tags=("dedup", "lsh", "telemetry"),
)
def q93_lsh_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH bucket-skew telemetry (the side output q43's docstring
    promises): per band, how many buckets exist, the largest bucket,
    how many went hot, and the join-pair vs star-pair volumes the
    candidate stage will generate. An operator at 100 TB watches
    n_hot_buckets / max_bucket_n to catch content degeneracy before
    it skews the self-join."""
    docs = load_table(spark, sf_dir, "documents")
    return lsh_bucket_stats(minhash_signatures(docs))


# ---------------------------------------------------------------------------
# L2c: SimHash signatures
# ---------------------------------------------------------------------------

_SIMHASH_BITS = 32

# Oracle twin of simhash_table: CTE chain ending in `simhashes`.
_SIMHASH_SQL = f"""
    tok AS (
      SELECT doc_id, unnest({_TOK}) AS token FROM documents
    ),
    hashed AS (
      SELECT doc_id, {md5_hash32_sql('token')} AS h FROM tok
    ),
    bits AS (
      SELECT doc_id,
        {", ".join(
            f"SUM(CASE WHEN (h >> {j}) % 2 = 1 THEN 1 ELSE -1 END) AS s_{j}"
            for j in range(_SIMHASH_BITS)
        )}
      FROM hashed GROUP BY doc_id
    ),
    simhashes AS (
      SELECT doc_id,
        ({" + ".join(f"CASE WHEN s_{j} > 0 THEN {1 << j} ELSE 0 END"
                     for j in range(_SIMHASH_BITS))})
          AS simhash
      FROM bits
    )"""


def simhash_table(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """(id, simhash) 32-bit SimHash per document: each bit is the sign
    of the weighted vote of token-hash bits. Integer arithmetic only
    -> exactly reproducible (oracle twin: _SIMHASH_SQL)."""
    from target_hdfs_spark.sources.readers import fan_out

    tok = fan_out(docs.select(id_col, text_col), id_col).select(
        id_col, F.explode(tokens(text_col)).alias("token")
    )
    hashed = tok.select(id_col, md5_hash32("token").alias("h"))
    votes = hashed.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), j) % 2 == 1, 1).otherwise(-1)
            ).alias(f"s_{j}")
            for j in range(_SIMHASH_BITS)
        ]
    )
    sim = None
    for j in range(_SIMHASH_BITS):
        term = F.when(F.col(f"s_{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return votes.select(id_col, sim.cast("bigint").alias("simhash"))


@query(
    "q44_simhash",
    oracle=f"""
    WITH {_SIMHASH_SQL}
    SELECT doc_id, simhash FROM simhashes
    """,
    tags=("dedup", "simhash"),
)
def q44_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document (see simhash_table).

    Scale: explode + one groupBy(doc_id) — linear; the 32 conditional
    sums combine map-side.
    """
    docs = load_table(spark, sf_dir, "documents")
    return simhash_table(docs)


@query(
    "q96_simhash_hamming_pairs",
    oracle=f"""
    WITH {_SIMHASH_SQL},
    banded AS (
      SELECT doc_id, simhash, b.band_idx,
             (simhash >> (8 * b.band_idx)) & 255 AS band_val
      FROM simhashes,
           UNNEST([{", ".join("{'band_idx': %d}" % b for b in range(4))}]) AS t(b)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, a.simhash AS sim_a,
                      c.doc_id AS doc_b, c.simhash AS sim_b
      FROM banded a JOIN banded c
        ON a.band_idx = c.band_idx AND a.band_val = c.band_val
           AND a.doc_id < c.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(CAST(xor(sim_a, sim_b) AS BIGINT)) AS INT) AS hamming
    FROM cand
    WHERE bit_count(CAST(xor(sim_a, sim_b) AS BIGINT)) <= 3
    """,
    tags=("dedup", "simhash", "hamming"),
)
def q96_simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs via byte-band blocking + Hamming verify:
    the 32-bit signature splits into 4 bytes; by pigeonhole, any pair
    within Hamming distance 3 agrees on at least one full byte, so
    blocking on byte bands finds ALL such pairs (exact recall for the
    d<=3 predicate, no all-pairs scan). Pure integer arithmetic ->
    exact across engines.

    Scale: the band self-join touches only byte-colliding docs — the
    same bucketed shape as MinHash-LSH (q43), with the verification
    (popcount of XOR) costing a few cycles per candidate.
    """
    docs = load_table(spark, sf_dir, "documents")
    sim = simhash_table(docs)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.shiftright(F.col("simhash"), 8 * b)
                .bitwiseAND(F.lit(255))
                .alias("band_val"),
            )
            for b in range(4)
        ]
    )
    bands = sim.select("doc_id", "simhash", F.explode(band_structs).alias("b")).select(
        "doc_id",
        "simhash",
        F.col("b.band_idx").alias("band_idx"),
        F.col("b.band_val").alias("band_val"),
    )
    a, c = bands.alias("a"), bands.alias("c")
    cand = (
        a.join(
            c,
            (F.col("a.band_idx") == F.col("c.band_idx"))
            & (F.col("a.band_val") == F.col("c.band_val"))
            & (F.col("a.doc_id") < F.col("c.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("a.simhash").alias("sim_a"),
            F.col("c.doc_id").alias("doc_b"),
            F.col("c.simhash").alias("sim_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).cast("int")
    return (
        cand.select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= 3)
    )


# ---------------------------------------------------------------------------
# L2d: exact n-gram Jaccard similarity (verifier for LSH candidates)
# ---------------------------------------------------------------------------

_Q45_MAX_SHINGLE_DF = 512  # enforced per-shingle document-frequency cap

# pair_overlap_counts width bound: a doc with more DISTINCT shingles
# than this never gets a collected array — its pairs route to the
# streaming (exploded posting) verify, which computes the same exact
# counts without one unbounded-width row.
_POC_MAX_DOC_SHINGLES = 8192

# Enforced prefix-join fan-out bound for prefix_filter_pairs: mean
# candidates per document the prefix self-join may materialize before
# the plan routes the corpus to the LSH-verified pipeline instead
# (q243_dedup_planner's 'lsh-verify:q92' decision, made load-bearing).
_PREFIX_CAND_PER_DOC_MAX = 4096


@query(
    "q45_ngram_jaccard_pairs",
    oracle=f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, unnest({shingles_sql(_TOK)}) AS shingle
      FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.05
    """,
    tags=("dedup", "jaccard"),
)
def q45_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard similarity for document pairs sharing any
    shingle (threshold 0.05). Integer set sizes -> one exact double
    division -> deterministic.

    Scale contract (ENFORCED, not advisory): the standalone verifier
    is quadratic in colliding documents — one stop-shingle shared by
    d documents emits d^2/2 pairs. The plan therefore guards every
    shingle's document frequency: df <= {_Q45_MAX_SHINGLE_DF} runs
    exact, and a hotter shingle raises a routing error naming
    q92_lsh_verified_pairs (LSH candidates -> exact verify, one
    plan), which is the production path for hot-shingle corpora. The
    guard rides the shingle-keyed aggregation, so its exchange is
    reused by the pair join (no extra shuffle of the posting lists).
    """
    docs = load_table(spark, sf_dir, "documents")
    # one tokenize+explode+distinct pass, materialized (q144's
    # pattern): the frame feeds the df guard, both pair-join sides,
    # and the size aggregation — four consumers
    from target_hdfs_spark.sources.readers import fan_out

    sh = (
        fan_out(docs, "doc_id")
        .select("doc_id", tokens("text").alias("_toks"))
        .select("doc_id", F.explode(shingles(F.col("_toks"))).alias("shingle"))
        .distinct()
        .localCheckpoint()
    )
    # df-cap guard: evaluating the filter raises on any hot shingle
    # (raise_error, not a silent drop — dropped shingles would change
    # the exact semantics the oracle checks)
    checked = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(
            F.when(F.col("df") <= _Q45_MAX_SHINGLE_DF, F.lit(True)).otherwise(
                F.raise_error(
                    F.format_string(
                        "q45: shingle document frequency %s exceeds the "
                        f"exact-verifier cap {_Q45_MAX_SHINGLE_DF}; route this "
                        "corpus via q92_lsh_verified_pairs (LSH candidates -> "
                        "exact verify)",
                        F.col("df"),
                    )
                ).cast("boolean")
            )
        )
        .select("shingle")
    )
    sh = sh.join(checked, "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    jac = F.col("n_common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_common")
    )
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.05)
    )


# ---------------------------------------------------------------------------
# L2e: dedup clusters — connected components over near-dup pairs
# ---------------------------------------------------------------------------

def _large_star(e: DataFrame) -> DataFrame:
    """One large-star round: for every node u, connect each strictly
    larger neighbor v to min(N(u) ∪ {u}). Input `e` is any directed
    edge list; symmetrized internally. Output edges all point
    high → low (source > target).

    The per-u minimum rides a window over the SAME exchange that
    groups the neighborhood (guide §2.4: two operations keyed the
    same way share one exchange) — the previous groupBy+join-back
    shape paid a second shuffle of the symmetrized edges to re-attach
    the minima it had just aggregated."""
    sym = e.select("u", "v").unionAll(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    w = Window.partitionBy("u")
    return (
        sym.withColumn("_mn", F.least(F.col("u"), F.min("v").over(w)))
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("_mn").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star round over high → low edges: for every node u,
    connect u and all its smaller neighbors to the minimum among
    them. Output edges still point high → low.

    Same one-exchange window shape as _large_star; the center edge
    (u, min) is emitted once per input edge instead of once per u —
    duplicates the terminal distinct removes anyway — so the
    groupBy+join-back and its extra shuffle disappear."""
    w = Window.partitionBy("u")
    ms = e.withColumn("_mn", F.min("v").over(w))
    leaf_edges = ms.select(F.col("v").alias("w"), F.col("_mn"))
    center_edges = ms.select(F.col("u").alias("w"), F.col("_mn"))
    return (
        leaf_edges.unionAll(center_edges)
        .filter(F.col("w") != F.col("_mn"))
        .select(F.col("w").alias("u"), F.col("_mn").alias("v"))
        .distinct()
    )


def connected_components(
    nodes: DataFrame, edges: DataFrame, node_col: str = "doc_id", max_iter: int = 20
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce
    and Beyond") -> (node, cluster) where cluster is the smallest node
    id in the component. The fixpoint — a star forest rooted at each
    component's minimum — is unique, so the iterative computation is
    exactly reproducible (and oracle-checkable) despite being a loop.

    Scale: O(log^2 n) rounds regardless of graph diameter (label
    propagation needs diameter rounds — a chain graph kills it); each
    round is two groupBy+join stages on the node key. Convergence is
    detected STRUCTURALLY, not probabilistically: the edge set is a
    fixpoint iff every source has exactly one target and no target is
    itself a source (a high→low star forest) — two scalar checks,
    never data, to the driver. Both operations preserve the component
    partition, so stopping at the structural fixpoint is exact.

    Job fusion (round-2 verdict ask): each round runs ONE Spark job.
    The round's edge set is LAZILY local-checkpointed
    (``localCheckpoint(eager=False)``): the logical plan is truncated
    immediately — one star round references its input ~10 times, so
    without per-round truncation the plan tree grows exponentially —
    but nothing executes until the convergence probe, whose
    aggregates scan every partition of the new edge set (no
    limit/early-exit) and thereby materialize the checkpoint in the
    SAME job that decides convergence. The next round (or the final
    label join) reads the checkpointed partitions, not lineage.
    """
    # No init distinct: every star round symmetrizes + windows its
    # input and ends in a distinct of its own, so duplicate or
    # non-canonical input edges cannot change the fixpoint — the
    # init-time dedup was one extra full shuffle of the edge list
    # that round 1's window exchange immediately repeats. Callers
    # feeding LSH candidate pairs (already distinct by construction)
    # paid it for nothing; a caller with heavy input multiplicity
    # pays the same first-shuffle volume either way.
    e = (
        edges.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
    )
    converged = False
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint(eager=False)
        # star-forest check, the SAME job that materializes `e`: a
        # violation is either (a) a source with two distinct targets
        # or (b) a node that is both a source and a target (a chain).
        # Both are per-NODE properties, so ONE node-keyed aggregation
        # over the edge endpoints replaces the previous
        # groupBy+self-semi-join pair (three shuffles of `e` → one).
        # Full-scan count (not limit(1)): violation rows are near-zero
        # cardinality so the saving from early exit is nil, and the
        # full scan guarantees the checkpoint is fully written.
        v_type = dict(e.dtypes)["v"]
        endpoints = e.select(
            F.col("u").alias("node"), F.col("v").alias("tgt")
        ).unionAll(
            e.select(
                F.col("v").alias("node"),
                F.lit(None).cast(v_type).alias("tgt"),
            )
        )
        bad = (
            endpoints.groupBy("node")
            .agg(
                F.count_distinct("tgt").alias("nt"),
                F.max(F.col("tgt").isNotNull().cast("int")).alias("is_src"),
                F.max(F.col("tgt").isNull().cast("int")).alias("is_tgt"),
            )
            .filter(
                (F.col("nt") > 1)
                | ((F.col("is_src") == 1) & (F.col("is_tgt") == 1))
            )
        )
        if bad.count() == 0:
            converged = True
            break
    if not converged:
        # returning partial edges would silently split clusters
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            f"alternating star rounds (pathological graph; raise max_iter)"
        )
    labels = nodes.select(F.col(node_col).alias("node")).join(
        e.select(F.col("u").alias("node"), F.col("v").alias("_root")),
        "node",
        "left",
    )
    return labels.select(
        F.col("node").alias(node_col),
        F.coalesce(F.col("_root"), F.col("node")).alias("cluster"),
    )


@query(
    "q85_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_LSH_PAIRS_SQL},
    undirected AS (
      SELECT doc_a, doc_b FROM pairs
      UNION ALL
      SELECT doc_b, doc_a FROM pairs
    ),
    reach (src, dst) AS (
      SELECT doc_a, doc_b FROM undirected
      UNION
      SELECT r.src, u.doc_b
      FROM reach r JOIN undirected u ON u.doc_a = r.dst
    )
    SELECT d.doc_id,
           least(d.doc_id,
                 coalesce((SELECT MIN(r.dst) FROM reach r WHERE r.src = d.doc_id),
                          d.doc_id)) AS cluster
    FROM documents d
    """,
    tags=("dedup", "graph", "iterative"),
)
def q85_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup clusters: connected components over the MinHash-LSH
    near-dup pair graph — every document labeled with the minimum
    doc_id of its duplicate cluster (singletons label themselves).
    The downstream dedup keeps one representative per cluster, which
    q40's survivor rule (min id) then makes deterministic end-to-end.

    Exactness: the min-label fixpoint is unique, so Spark's iterative
    propagation and the oracle's recursive transitive closure agree
    exactly — an *iterative* operator with a full value check.
    """
    docs = load_table(spark, sf_dir, "documents")
    sig = minhash_signatures(docs)
    # EAGER checkpoint: the star rounds reference the pair graph many
    # times (union/groupBy/join branches), so it must be materialized
    # once up front — a lazy checkpoint here gets recomputed per
    # branch (measured 3-10x the pipeline cost)
    pairs = lsh_candidate_pairs(sig).localCheckpoint(eager=True)
    return connected_components(docs.select("doc_id"), pairs)


def paired_component_labels(pairs: DataFrame) -> DataFrame:
    """(doc_id, cluster) for the pair ENDPOINTS only. Every other doc
    is a singleton (its own cluster root) by construction — pairs
    have distinct endpoints, so every labeled doc sits in a >= 2
    cluster — which lets readouts that don't need per-doc labels
    (survivor sets, histograms, manifests) run components and their
    downstream joins over the duplicate-touched sliver instead of the
    corpus (guide §8: decide on small rows)."""
    endpoints = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    return connected_components(endpoints, pairs)


def pair_overlap_counts(
    pairs: DataFrame,
    sh: DataFrame,
    max_doc_shingles: int = _POC_MAX_DOC_SHINGLES,
) -> DataFrame:
    """Exact set-overlap counts for a candidate pair frame: joins
    (doc_a, doc_b) candidates against distinct element rows
    (doc_id, shingle) and returns (doc_a, doc_b, na, nb, n_common).

    The verify shape is q210's (prefix_filter_pairs): each doc's
    distinct shingles are collected ONCE into a doc-keyed array,
    candidates hash-join to the two array frames, and the overlap is
    counted MAP-SIDE with array_intersect. The family's previous
    shape re-joined candidates through exploded posting rows and
    aggregated pair-keyed — materializing |pairs| x |shingles-per-doc|
    intermediate rows, the dominant term at 100x docs (q232 ran 13.8x
    wall at 100x on it; BENCH_NOTES). Set sizes ride along as
    array sizes, so the separate per-doc size aggregation and its two
    join-backs disappear too.

    Pairs with ZERO overlap are KEPT (n_common = 0): q214 needs them
    (its oracle left-joins), q92/q120's similarity thresholds drop
    them naturally, and q232 filters n_common > 0 explicitly to match
    its oracle's inner-join derivation.

    Mega-doc guard (r7 verdict item 3 — the symmetric axis of q45's
    df-cap): collecting one array per doc makes a single pathological
    mega-doc one row of unbounded width in a task buffer. Per-doc
    DISTINCT-shingle sizes are therefore computed first (countDistinct,
    which also makes the function robust to duplicate element rows —
    previously a docstring-only precondition), and any doc above
    ``max_doc_shingles`` routes its candidate pairs to the STREAMING
    verify instead: posting rows hash-join pair-keyed and aggregate —
    the same exact counts, traded from one wide row to a streamed
    aggregation. Both paths keep zero-overlap pairs. The oversized
    slice is expected tiny (its doc ids broadcast), so the banded
    path's |pairs| x |shingles-per-doc| term applies only where the
    array path would have been the memory hazard.
    """
    sizes = sh.groupBy("doc_id").agg(
        F.countDistinct("shingle").alias("n_sh")
    )
    big_ids = sizes.filter(F.col("n_sh") > max_doc_shingles).select("doc_id")
    big_a = big_ids.select(F.col("doc_id").alias("doc_a")).withColumn(
        "_big_a", F.lit(True)
    )
    big_b = big_ids.select(F.col("doc_id").alias("doc_b")).withColumn(
        "_big_b", F.lit(True)
    )
    marked = (
        pairs.select("doc_a", "doc_b")
        .join(F.broadcast(big_a), "doc_a", "left")
        .join(F.broadcast(big_b), "doc_b", "left")
        .withColumn(
            "_oversized",
            F.coalesce(F.col("_big_a"), F.lit(False))
            | F.coalesce(F.col("_big_b"), F.lit(False)),
        )
        .drop("_big_a", "_big_b")
    )
    small_pairs = marked.filter(~F.col("_oversized")).drop("_oversized")
    big_pairs = marked.filter(F.col("_oversized")).drop("_oversized")

    # Array path: only docs under the cap are ever collected, so the
    # width bound survives by construction (left_anti against the
    # broadcast oversized set); collect_set dedups defensively.
    sh_small = sh.join(F.broadcast(big_ids), "doc_id", "left_anti")
    sets = sh_small.groupBy("doc_id").agg(F.collect_set("shingle").alias("_arr"))
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("_arr").alias("_arr_a"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("_arr").alias("_arr_b"))
    small_out = (
        small_pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size("_arr_a").cast("long").alias("na"),
            F.size("_arr_b").cast("long").alias("nb"),
            F.size(F.array_intersect("_arr_a", "_arr_b"))
            .cast("long")
            .alias("n_common"),
        )
    )

    # Streaming path for pairs touching an oversized doc: posting rows
    # (deduped — the slice is small enough that the defensive distinct
    # is cheap) join pair-keyed and aggregate; zero-overlap pairs are
    # restored by the left join against the sizes base.
    pair_docs = (
        big_pairs.select(F.col("doc_a").alias("doc_id"))
        .union(big_pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh_pairdocs = sh.join(pair_docs, "doc_id", "left_semi").dropDuplicates(
        ["doc_id", "shingle"]
    )
    ea = sh_pairdocs.select(
        F.col("doc_id").alias("doc_a"), F.col("shingle").alias("_sh_a")
    )
    eb = sh_pairdocs.select(
        F.col("doc_id").alias("_doc_b_e"), F.col("shingle").alias("_sh_b")
    )
    overlap = (
        big_pairs.join(ea, "doc_a")
        .join(
            eb,
            (F.col("doc_b") == F.col("_doc_b_e"))
            & (F.col("_sh_a") == F.col("_sh_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("_n_common"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    big_out = (
        big_pairs.join(za, "doc_a")
        .join(zb, "doc_b")
        .join(overlap, ["doc_a", "doc_b"], "left")
        .select(
            "doc_a",
            "doc_b",
            F.col("na").cast("long").alias("na"),
            F.col("nb").cast("long").alias("nb"),
            F.coalesce(F.col("_n_common"), F.lit(0))
            .cast("long")
            .alias("n_common"),
        )
    )
    return small_out.unionByName(big_out)


def pair_overlap_counts_sets(
    pairs: DataFrame,
    sets: DataFrame,
    max_doc_shingles: int = _POC_MAX_DOC_SHINGLES,
) -> DataFrame:
    """pair_overlap_counts over a ``shingle_sets`` frame (doc_id,
    sh_arr): same output columns and values, but the per-doc distinct
    sets and their sizes arrive MAP-SIDE (array_distinct + F.size)
    instead of through the exploded distinct → collect_set /
    countDistinct aggregations — the three shingle-string shuffles of
    the old derivation disappear (guide §2.3/§2.4: don't shuffle the
    heavy strings to make per-doc decisions you can make in place).

    The mega-doc guard keeps the identical routing semantics: docs
    above ``max_doc_shingles`` never ship their array through the
    pair join; their candidate pairs verify on exploded posting rows
    (already distinct by construction) exactly as before.
    """
    sizes = sets.select("doc_id", F.size("sh_arr").alias("n_sh"))
    big_ids = sizes.filter(F.col("n_sh") > max_doc_shingles).select("doc_id")
    big_a = big_ids.select(F.col("doc_id").alias("doc_a")).withColumn(
        "_big_a", F.lit(True)
    )
    big_b = big_ids.select(F.col("doc_id").alias("doc_b")).withColumn(
        "_big_b", F.lit(True)
    )
    marked = (
        pairs.select("doc_a", "doc_b")
        .join(F.broadcast(big_a), "doc_a", "left")
        .join(F.broadcast(big_b), "doc_b", "left")
        .withColumn(
            "_oversized",
            F.coalesce(F.col("_big_a"), F.lit(False))
            | F.coalesce(F.col("_big_b"), F.lit(False)),
        )
        .drop("_big_a", "_big_b")
    )
    small_pairs = marked.filter(~F.col("_oversized")).drop("_oversized")
    big_pairs = marked.filter(F.col("_oversized")).drop("_oversized")

    sets_small = sets.join(F.broadcast(big_ids), "doc_id", "left_anti")
    sa = sets_small.select(
        F.col("doc_id").alias("doc_a"), F.col("sh_arr").alias("_arr_a")
    )
    sb = sets_small.select(
        F.col("doc_id").alias("doc_b"), F.col("sh_arr").alias("_arr_b")
    )
    small_out = (
        small_pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size("_arr_a").cast("long").alias("na"),
            F.size("_arr_b").cast("long").alias("nb"),
            F.size(F.array_intersect("_arr_a", "_arr_b"))
            .cast("long")
            .alias("n_common"),
        )
    )

    # Streaming path for pairs touching an oversized doc: explode ONLY
    # the pair-relevant docs' arrays back to posting rows (distinct by
    # construction) and aggregate pair-keyed, exactly as the exploded
    # variant does.
    pair_docs = (
        big_pairs.select(F.col("doc_a").alias("doc_id"))
        .union(big_pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh_pairdocs = sets.join(pair_docs, "doc_id", "left_semi").select(
        "doc_id", F.explode("sh_arr").alias("shingle")
    )
    ea = sh_pairdocs.select(
        F.col("doc_id").alias("doc_a"), F.col("shingle").alias("_sh_a")
    )
    eb = sh_pairdocs.select(
        F.col("doc_id").alias("_doc_b_e"), F.col("shingle").alias("_sh_b")
    )
    overlap = (
        big_pairs.join(ea, "doc_a")
        .join(
            eb,
            (F.col("doc_b") == F.col("_doc_b_e"))
            & (F.col("_sh_a") == F.col("_sh_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("_n_common"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    big_out = (
        big_pairs.join(za, "doc_a")
        .join(zb, "doc_b")
        .join(overlap, ["doc_a", "doc_b"], "left")
        .select(
            "doc_a",
            "doc_b",
            F.col("na").cast("long").alias("na"),
            F.col("nb").cast("long").alias("nb"),
            F.coalesce(F.col("_n_common"), F.lit(0))
            .cast("long")
            .alias("n_common"),
        )
    )
    return small_out.unionByName(big_out)


def lsh_verify_base(
    docs: DataFrame, eager_pairs: bool = False
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(sets, sig, pairs) — the shared head of every LSH→exact-verify
    query: ONE checkpointed shingle_sets pass feeds both the minhash
    signature pipeline and the exact-verify arrays, so the corpus is
    tokenized and shingled exactly once per query instead of once per
    consumer subtree. ``eager_pairs`` matches the caller's checkpoint
    posture (eager when the pair frame fans out to several branches).
    """
    sets = shingle_sets(docs).localCheckpoint(eager=True)
    sig = minhash_signatures_from_sets(sets)
    pairs = lsh_candidate_pairs(sig).localCheckpoint(eager=eager_pairs)
    return sets, sig, pairs


# ---------------------------------------------------------------------------
# L2f: candidate generation + exact verification in one pipeline —
# the production near-dup query (LSH recall, exact precision)
# ---------------------------------------------------------------------------


@query(
    "q92_lsh_verified_pairs",
    oracle=f"""
    WITH {_LSH_PAIRS_SQL},
    doc_shingles AS (
      SELECT DISTINCT doc_id, unnest({shingles_sql(_TOK)}) AS shingle
      FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM doc_shingles GROUP BY doc_id),
    common AS (
      SELECT p.doc_a, p.doc_b, COUNT(*) AS n_common
      FROM pairs p
      JOIN doc_shingles sa ON sa.doc_id = p.doc_a
      JOIN doc_shingles sb ON sb.doc_id = p.doc_b AND sb.shingle = sa.shingle
      GROUP BY 1, 2
    )
    SELECT c.doc_a, c.doc_b,
           CAST(c.n_common AS DOUBLE) / (za.n_sh + zb.n_sh - c.n_common) AS jaccard
    FROM common c
    JOIN sizes za ON za.doc_id = c.doc_a
    JOIN sizes zb ON zb.doc_id = c.doc_b
    WHERE CAST(c.n_common AS DOUBLE) / (za.n_sh + zb.n_sh - c.n_common) >= 0.2
    """,
    tags=("dedup", "minhash", "lsh", "verify"),
)
def q92_lsh_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production near-duplicate query: MinHash-LSH candidate
    generation (probabilistic recall) followed by exact shingle-set
    Jaccard verification (exact precision, threshold 0.2) — composed
    as one plan.

    Scale: exact Jaccard runs on candidate pairs ONLY (vs q45's
    all-shared-shingle pairs) — the verification cost is proportional
    to LSH candidates, which the hot-bucket cap already bounds; this
    is the shape that stays tractable at 100 TB. Verification uses
    the collected-array shape (pair_overlap_counts): candidates join
    to two doc-keyed shingle arrays and the overlap is counted
    map-side, so the |pairs| x |shingles-per-doc| posting blow-up of
    the previous pair-keyed aggregation never materializes.
    """
    docs = load_table(spark, sf_dir, "documents")
    sets, _sig, pairs = lsh_verify_base(docs)
    counts = pair_overlap_counts_sets(pairs, sets)
    jac = F.col("n_common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_common")
    )
    return (
        counts.select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.2)
    )


# ---------------------------------------------------------------------------
# L2g: LSH candidates + edit-distance verification (character-level
# near-dup — catches small in-place edits Jaccard shingles miss)
# ---------------------------------------------------------------------------


@query(
    "q95_lsh_editdistance_pairs",
    oracle=f"""
    WITH {_LSH_PAIRS_SQL}
    SELECT p.doc_a, p.doc_b,
           CAST(levenshtein(da.text, db.text) AS INT) AS edit_dist
    FROM pairs p
    JOIN documents da ON da.doc_id = p.doc_a
    JOIN documents db ON db.doc_id = p.doc_b
    WHERE levenshtein(da.text, db.text) * 10
          <= 4 * greatest(len(da.text), len(db.text))
    """,
    tags=("dedup", "lsh", "editdistance"),
)
def q95_lsh_editdistance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs: MinHash-LSH candidate generation verified by
    character-level Levenshtein distance (relative threshold 0.4,
    compared in integers: lev*10 <= 4*maxlen, so the check is exact).
    Complements q92's Jaccard verifier: edit distance is the right
    precision metric for templated/boilerplate edits where shingle
    sets barely change.

    Scale: the O(len^2) DP runs on LSH candidates ONLY (bounded by
    the hot-bucket cap), never all pairs; both engines implement
    levenshtein natively, so the verification stays engine-side.
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(minhash_signatures(docs))
    ta = docs.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("_ta"))
    tb = docs.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("_tb"))
    lev = F.levenshtein("_ta", "_tb").cast("int")
    return (
        pairs.join(ta, "doc_a")
        .join(tb, "doc_b")
        .withColumn("edit_dist", lev)
        .filter(
            F.col("edit_dist") * 10
            <= 4 * F.greatest(F.length("_ta"), F.length("_tb"))
        )
        .select("doc_a", "doc_b", "edit_dist")
    )


# ---------------------------------------------------------------------------
# The flagship composition: a complete corpus-curation pipeline in ONE
# plan — quality gate -> lang whitelist -> exact dedup -> near-dup
# cluster dedup -> per-lang summary. This is the end-to-end shape a
# training-data build runs at 100 TB; every stage above is an operator
# the engine exposes individually (q54, q40, q43, q85).
# ---------------------------------------------------------------------------

_Q98_LANGS = ("en", "de", "fr", "es")


@query(
    "q98_corpus_pipeline",
    oracle=f"""
    WITH RECURSIVE m AS (
      SELECT doc_id, lang, text, n_chars,
             len({_TOK}) AS n_tokens,
             len(list_distinct({_TOK})) AS n_unique_tokens
      FROM documents
    ),
    quality AS (
      SELECT * FROM m
      WHERE n_tokens >= 20
        AND n_chars BETWEEN 100 AND 10000
        AND CAST(n_unique_tokens AS DOUBLE) / n_tokens >= 0.2
        AND lang IN {repr(_Q98_LANGS)}
    ),
    ex AS (
      SELECT * FROM quality
      QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
    ),
    {_lsh_pairs_sql("ex")},
    undirected AS (
      SELECT doc_a, doc_b FROM pairs
      UNION ALL
      SELECT doc_b, doc_a FROM pairs
    ),
    reach (src, dst) AS (
      SELECT doc_a, doc_b FROM undirected
      UNION
      SELECT r.src, u.doc_b
      FROM reach r JOIN undirected u ON u.doc_a = r.dst
    ),
    labels AS (
      SELECT e.doc_id,
             least(e.doc_id,
                   coalesce((SELECT MIN(r.dst) FROM reach r
                             WHERE r.src = e.doc_id), e.doc_id)) AS cluster
      FROM ex e
    ),
    keep AS (
      SELECT e.* FROM ex e
      JOIN labels l ON l.doc_id = e.doc_id AND l.cluster = e.doc_id
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           MIN(doc_id) AS min_doc_id,
           MAX(doc_id) AS max_doc_id
    FROM keep
    GROUP BY lang
    """,
    tags=("dedup", "pipeline", "composition"),
)
def q98_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation as one declarative plan:

    1. quality gate (token count, length band, unique-token ratio —
       q54 semantics);
    2. language whitelist;
    3. exact dedup on text, deterministic min-doc_id survivor (q40);
    4. near-dup cluster dedup: MinHash-LSH pairs over the survivors
       (q43) -> connected components (q85) -> keep each cluster's
       minimum doc_id;
    5. per-language corpus summary.

    Exactness: every stage is integer/string arithmetic plus the
    unique min-label fixpoint, so the full five-stage composition is
    value-exact against the oracle — the strongest kind of check,
    because stage boundaries (filter-before-dedup, dedup-before-
    cluster) are where composition bugs hide.

    Scale: stages pipeline without materialization except the pair
    graph checkpoint before iteration; LSH + star contraction keep the
    near-dup stage bounded (no all-pairs anywhere).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    m = docs.select(
        "doc_id",
        "lang",
        "text",
        "n_chars",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
    )
    quality = m.filter(
        (F.col("n_tokens") >= 20)
        & F.col("n_chars").between(100, 10000)
        & (F.col("n_unique_tokens").cast("double") / F.col("n_tokens") >= 0.2)
        & F.col("lang").isin(*_Q98_LANGS)
    )
    w = Window.partitionBy("text").orderBy("doc_id")
    # lazy checkpoint: three consumers replay this subtree otherwise
    # (the pair-graph build, the components' node frame, and the
    # survivor join) — each replay re-scans and re-tokenizes the
    # corpus; the first consumer materializes it instead
    ex = (
        quality.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .localCheckpoint(eager=False)
    )
    sig = minhash_signatures(ex.select("doc_id", "text"))
    # EAGER checkpoint: the star rounds reference the pair graph many
    # times (union/groupBy/join branches), so it must be materialized
    # once up front — a lazy checkpoint here gets recomputed per
    # branch (measured 3-10x the pipeline cost)
    pairs = lsh_candidate_pairs(sig).localCheckpoint(eager=True)
    labels = connected_components(ex.select("doc_id"), pairs)
    keep = ex.join(
        labels.filter(F.col("doc_id") == F.col("cluster")).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    return keep.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


# ---------------------------------------------------------------------------
# L2h: incremental dedup — triage a NEW batch against an existing base
# corpus without re-deduplicating the base (the daily-ingest shape: at
# 100 TB you dedup the 0.1% that arrived today against the index, not
# the whole corpus)
# ---------------------------------------------------------------------------

_INC_MOD = 5  # doc_id % 5 == 0 -> the "incoming batch" (~20%)
_INC_JACCARD = 0.2


@query(
    "q116_incremental_dedup",
    oracle=f"""
    WITH {_lsh_bands_sql()},
    base_bands AS (SELECT * FROM bands WHERE doc_id % {_INC_MOD} <> 0),
    inc_bands  AS (SELECT * FROM bands WHERE doc_id % {_INC_MOD} = 0),
    bsz AS (
      SELECT band_idx, band_key, COUNT(*) AS bucket_n, MIN(doc_id) AS rep
      FROM base_bands GROUP BY 1, 2
    ),
    base_kept AS (
      SELECT b.band_idx, b.band_key, b.doc_id
      FROM base_bands b JOIN bsz USING (band_idx, band_key)
      WHERE bucket_n <= {MAX_BUCKET}
      UNION ALL
      SELECT band_idx, band_key, rep AS doc_id
      FROM bsz WHERE bucket_n > {MAX_BUCKET}
    ),
    cand AS (
      SELECT DISTINCT i.doc_id, k.doc_id AS base_id
      FROM inc_bands i JOIN base_kept k USING (band_idx, band_key)
    ),
    doc_shingles AS (
      SELECT DISTINCT doc_id, unnest({shingles_sql(_TOK)}) AS shingle
      FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM doc_shingles GROUP BY doc_id),
    common AS (
      SELECT c.doc_id, c.base_id, COUNT(*) AS n_common
      FROM cand c
      JOIN doc_shingles si ON si.doc_id = c.doc_id
      JOIN doc_shingles sb ON sb.doc_id = c.base_id AND sb.shingle = si.shingle
      GROUP BY 1, 2
    ),
    near AS (
      SELECT co.doc_id, MIN(co.base_id) AS near_dup_of
      FROM common co
      JOIN sizes za ON za.doc_id = co.doc_id
      JOIN sizes zb ON zb.doc_id = co.base_id
      WHERE CAST(co.n_common AS DOUBLE) / (za.n_sh + zb.n_sh - co.n_common)
            >= {_INC_JACCARD}
      GROUP BY 1
    ),
    base_h AS (
      SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % {_INC_MOD} <> 0
    ),
    inc AS (
      SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % {_INC_MOD} = 0
    )
    SELECT i.doc_id,
           (bh.h IS NOT NULL) AS exact_dup,
           COALESCE(n.near_dup_of, -1) AS near_dup_of,
           (bh.h IS NULL AND n.near_dup_of IS NULL) AS is_new
    FROM inc i
    LEFT JOIN base_h bh ON bh.h = i.h
    LEFT JOIN near n ON n.doc_id = i.doc_id
    """,
    tags=("dedup", "lsh", "incremental"),
)
def q116_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (online) dedup: triage an incoming batch against an
    existing base corpus — exact content-hash membership, then
    MinHash-LSH candidate probing with exact-Jaccard verification,
    WITHOUT generating base-vs-base pairs. Each incoming doc gets
    (exact_dup, near_dup_of = min verified base doc or -1, is_new).

    Hot base buckets are probed via their min-doc_id representative
    only (same star idea as `lsh_candidate_pairs`): the incoming doc
    still collides with the bucket, but the verify fan-out stays
    linear in batch size instead of bucket size.

    Scale shape: this is the daily-ingest path — candidate generation
    joins the small batch's bands against the base band index (a
    broadcast at real batch/base ratios), and exact verification runs
    on probed candidates only; the base corpus is never self-joined.
    """
    docs = load_table(spark, sf_dir, "documents")
    is_inc = F.col("doc_id") % _INC_MOD == 0
    sig = minhash_signatures(docs)
    bands = _band_table(sig)
    base_bands = bands.where(~((F.col("doc_id") % _INC_MOD) == 0))
    inc_bands = bands.where((F.col("doc_id") % _INC_MOD) == 0)
    bsz = base_bands.groupBy("band_idx", "band_key").agg(
        F.count(F.lit(1)).alias("bucket_n"), F.min("doc_id").alias("rep")
    )
    base_kept = (
        base_bands.join(
            bsz.where(F.col("bucket_n") <= MAX_BUCKET).select("band_idx", "band_key"),
            ["band_idx", "band_key"],
        )
        .select("band_idx", "band_key", "doc_id")
        .unionByName(
            bsz.where(F.col("bucket_n") > MAX_BUCKET).select(
                "band_idx", "band_key", F.col("rep").alias("doc_id")
            )
        )
    )
    cand = (
        inc_bands.alias("i")
        .join(base_kept.alias("k"), ["band_idx", "band_key"])
        .select(
            F.col("i.doc_id").alias("doc_id"), F.col("k.doc_id").alias("base_id")
        )
        .distinct()
    )
    sh = (
        docs.select("doc_id", tokens("text").alias("_toks"))
        .select("doc_id", F.explode(shingles(F.col("_toks"))).alias("shingle"))
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    si = sh.select(F.col("doc_id").alias("doc_id"), F.col("shingle").alias("sh_i"))
    sb = sh.select(F.col("doc_id").alias("b_doc"), F.col("shingle").alias("sh_b"))
    common = (
        cand.join(si, "doc_id")
        .join(
            sb,
            (F.col("base_id") == F.col("b_doc")) & (F.col("sh_i") == F.col("sh_b")),
        )
        .groupBy("doc_id", "base_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_id"), F.col("n_sh").alias("n_i"))
    zb = sizes.select(F.col("doc_id").alias("base_id"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_common").cast("double") / (
        F.col("n_i") + F.col("n_b") - F.col("n_common")
    )
    near = (
        common.join(za, "doc_id")
        .join(zb, "base_id")
        .where(jac >= _INC_JACCARD)
        .groupBy("doc_id")
        .agg(F.min("base_id").alias("near_dup_of"))
    )
    base_h = (
        docs.where(~is_inc).select(F.md5("text").alias("h")).distinct()
    )
    inc = docs.where(is_inc).select("doc_id", F.md5("text").alias("h"))
    return (
        inc.join(base_h.withColumn("_hit", F.lit(1)), "h", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            F.col("_hit").isNotNull().alias("exact_dup"),
            F.coalesce(F.col("near_dup_of"), F.lit(-1)).cast("bigint").alias("near_dup_of"),
            (F.col("_hit").isNull() & F.col("near_dup_of").isNull()).alias("is_new"),
        )
    )


# ---------------------------------------------------------------------------
# L2i: bucket-root near-dup dedup — the state-store-friendly rule
# (batch twin of streaming/neardup.py; one signature per bucket of
# state, so a streaming executor holds O(buckets) not O(docs))
# ---------------------------------------------------------------------------

SINGLE_BAND_SIM = 0.5  # suppress when >= 8 of 16 signature components match


def _sig_cols() -> list[str]:
    return [f"mh_{i}" for i in range(NUM_HASHES)]


def bucket_root_dedup(sig: DataFrame, threshold: float = SINGLE_BAND_SIM) -> DataFrame:
    """Single-band LSH dedup against the bucket's root representative:
    bucket = band-0 key; root = min doc_id in the bucket; a doc is
    kept iff it IS the root or its estimated jaccard to the root
    (matching signature components / NUM_HASHES) is below `threshold`.

    This is the dedup rule whose per-bucket state is ONE signature —
    the property that makes its streaming twin
    (streaming/neardup.py::streaming_bucket_root_dedup) hold
    O(buckets) state in the state store instead of O(documents).
    Recall is that of one band (the batch multi-band path is
    q43/q85/q116); precision of the root probe is the same estimator
    LSH banding itself relies on.

    Plan shape: the root's id AND full signature come from one
    `min(struct(doc_id, sig...))` window over the bucket key — struct
    ordering is lexicographic, doc_id leads, so the min struct IS the
    min-doc_id row. No self-join back to fetch the root's signature,
    so the signature pipeline runs once and the whole operator is one
    Exchange (pinned in tests/test_plans.py).
    """
    bucket = F.concat_ws(
        "_", *[F.col(f"mh_{r}").cast("string") for r in range(ROWS_PER_BAND)]
    )
    b = sig.select("doc_id", bucket.alias("bucket"), *_sig_cols())
    w = Window.partitionBy("bucket")
    root = F.min(F.struct("doc_id", *_sig_cols())).over(w)
    matches = sum(
        F.when(F.col(c) == F.col(f"_root.{c}"), 1).otherwise(0)
        for c in _sig_cols()
    )
    return (
        b.withColumn("_root", root)
        .select(
            "doc_id",
            F.col("_root.doc_id").alias("root_id"),
            (matches.cast("double") / NUM_HASHES).alias("est_sim"),
        )
        .filter((F.col("doc_id") == F.col("root_id")) | (F.col("est_sim") < threshold))
    )


@query(
    "q118_bucket_root_dedup",
    oracle=f"""
    WITH hashed AS (
      SELECT doc_id, {_SHINGLE_HASHES_SQL} AS hs FROM documents
    ),
    sigs AS (
      SELECT doc_id, {", ".join(_minhash_sql_exprs())} FROM hashed
    ),
    b AS (
      SELECT *, concat_ws('_', {", ".join(f"mh_{r}" for r in range(ROWS_PER_BAND))})
             AS bucket
      FROM sigs
    ),
    roots AS (SELECT bucket, MIN(doc_id) AS root_id FROM b GROUP BY 1)
    SELECT x.doc_id, rt.root_id,
           CAST({" + ".join(
               f"CAST(x.mh_{i} = r.mh_{i} AS INT)" for i in range(NUM_HASHES)
           )} AS DOUBLE) / {NUM_HASHES} AS est_sim
    FROM b x
    JOIN roots rt ON rt.bucket = x.bucket
    JOIN b r ON r.doc_id = rt.root_id
    WHERE x.doc_id = rt.root_id
       OR CAST({" + ".join(
               f"CAST(x.mh_{i} = r.mh_{i} AS INT)" for i in range(NUM_HASHES)
           )} AS DOUBLE) / {NUM_HASHES} < {SINGLE_BAND_SIM}
    """,
    tags=("dedup", "minhash", "lsh", "streaming-analog"),
)
def q118_bucket_root_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-root near-dup dedup (batch twin of the streaming
    state-store operator): keep a document iff it is its single-band
    bucket's min-doc_id root, or its estimated signature similarity to
    that root is under the threshold. Exact-oracle-checked; the
    streaming twin is proven equivalent on ordered arrivals in
    tests/test_streaming_neardup.py."""
    docs = load_table(spark, sf_dir, "documents")
    return bucket_root_dedup(minhash_signatures(docs))


# ---------------------------------------------------------------------------
# L2j: LSH candidates + shingle CONTAINMENT verification — asymmetric
# near-dup (quote/subset detection that symmetric Jaccard misses:
# a short doc fully contained in a long one has low Jaccard but
# containment 1.0)
# ---------------------------------------------------------------------------


@query(
    "q120_minhash_containment",
    oracle=f"""
    WITH {_LSH_PAIRS_SQL},
    doc_shingles AS (
      SELECT DISTINCT doc_id, unnest({shingles_sql(_TOK)}) AS shingle
      FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM doc_shingles GROUP BY doc_id),
    common AS (
      SELECT p.doc_a, p.doc_b, COUNT(*) AS n_common
      FROM pairs p
      JOIN doc_shingles sa ON sa.doc_id = p.doc_a
      JOIN doc_shingles sb ON sb.doc_id = p.doc_b AND sb.shingle = sa.shingle
      GROUP BY 1, 2
    )
    SELECT c.doc_a, c.doc_b,
           CAST(c.n_common AS DOUBLE) / za.n_sh AS contain_a_in_b,
           CAST(c.n_common AS DOUBLE) / zb.n_sh AS contain_b_in_a
    FROM common c
    JOIN sizes za ON za.doc_id = c.doc_a
    JOIN sizes zb ON zb.doc_id = c.doc_b
    WHERE greatest(CAST(c.n_common AS DOUBLE) / za.n_sh,
                   CAST(c.n_common AS DOUBLE) / zb.n_sh) >= 0.6
    """,
    tags=("dedup", "lsh", "containment", "verify"),
)
def q120_minhash_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-duplicate detection: LSH candidate pairs
    verified by shingle-set CONTAINMENT (|A∩B|/|A| and |A∩B|/|B|)
    instead of Jaccard — the quote / excerpt / superset shape (Lee et
    al.'s "approximate containment"): a 100-shingle doc embedded in a
    5000-shingle doc scores containment 1.0 but Jaccard 0.02, so a
    Jaccard gate never sees it.

    Scale: same candidate-bounded join shape as q92 (verification
    touches LSH candidates only, hot buckets capped); the two
    containment ratios reuse one n_common readout from the
    collected-array verify (pair_overlap_counts — no posting-row
    re-explosion).
    """
    docs = load_table(spark, sf_dir, "documents")
    sets, _sig, pairs = lsh_verify_base(docs)
    counts = pair_overlap_counts_sets(pairs, sets)
    c_ab = F.col("n_common").cast("double") / F.col("na")
    c_ba = F.col("n_common").cast("double") / F.col("nb")
    return (
        counts.select(
            "doc_a",
            "doc_b",
            c_ab.alias("contain_a_in_b"),
            c_ba.alias("contain_b_in_a"),
        )
        .filter(
            F.greatest(F.col("contain_a_in_b"), F.col("contain_b_in_a")) >= 0.6
        )
    )


# ---------------------------------------------------------------------------
# L2k: MULTI-band root dedup — full-recall analog of q118's rule
# (a doc is suppressed if ANY of the 4 bands collides with its
# bucket root at >= threshold similarity)
# ---------------------------------------------------------------------------

_EST_SQL = (
    "CAST("
    + " + ".join(f"CAST(x.mh_{i} = r.mh_{i} AS INT)" for i in range(NUM_HASHES))
    + f" AS DOUBLE) / {NUM_HASHES}"
)


def _multiband_bands_sql() -> str:
    """UNION ALL of the 4 band projections over `sigs` (doc_id, key,
    full signature) — the oracle twin of the banded explode."""
    selects = []
    for b in range(BANDS):
        key = ", ".join(
            f"mh_{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)
        )
        cols = ", ".join(f"mh_{i}" for i in range(NUM_HASHES))
        selects.append(
            f"SELECT doc_id, {b} AS band_idx, concat_ws('_', {key}) AS band_key, "
            f"{cols} FROM sigs"
        )
    return " UNION ALL ".join(selects)


def multiband_root_dedup(
    sig: DataFrame, threshold: float = SINGLE_BAND_SIM
) -> DataFrame:
    """Multi-band bucket-root dedup: band the signature (BANDS x
    ROWS_PER_BAND, same banding as q43's candidate generation), elect
    each (band, key) bucket's min-doc_id row as root via one
    min(struct) window, and keep a document iff EVERY band says
    root-or-below-threshold. Output: (doc_id, max_root_sim) for the
    survivors, where max_root_sim is the largest estimated similarity
    to any non-self band root (0.0 when the doc roots all its
    buckets).

    Recall: exactly the LSH banding guarantee (any-band collision),
    closing the single-band trade-off q118 documents — this IS the
    dedup rule of the q43/q85 pipeline, restated root-wise so its
    streaming twin can hold ONE signature per (band, bucket) of state
    (O(BANDS x buckets), not O(documents)).

    Plan shape: one banded explode (x BANDS row amplification), one
    Exchange on (band_idx, band_key) serving the min(struct) window,
    one Exchange on doc_id for the all-bands conjunction. No
    self-join anywhere; the signature pipeline runs once.
    """
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.concat_ws(
                    "_",
                    *[
                        F.col(f"mh_{b * ROWS_PER_BAND + r}").cast("string")
                        for r in range(ROWS_PER_BAND)
                    ],
                ).alias("band_key"),
            )
            for b in range(BANDS)
        ]
    )
    bands = sig.select(
        "doc_id", F.explode(band_structs).alias("b"), *_sig_cols()
    ).select(
        "doc_id",
        F.col("b.band_idx").alias("band_idx"),
        F.col("b.band_key").alias("band_key"),
        *_sig_cols(),
    )
    w = Window.partitionBy("band_idx", "band_key")
    root = F.min(F.struct("doc_id", *_sig_cols())).over(w)
    matches = sum(
        F.when(F.col(c) == F.col(f"_root.{c}"), 1).otherwise(0)
        for c in _sig_cols()
    )
    per_band = bands.withColumn("_root", root).select(
        "doc_id",
        F.col("_root.doc_id").alias("root_id"),
        (matches.cast("double") / NUM_HASHES).alias("est"),
    )
    ok = (F.col("doc_id") == F.col("root_id")) | (F.col("est") < threshold)
    est_nonself = F.when(F.col("doc_id") != F.col("root_id"), F.col("est"))
    return (
        per_band.groupBy("doc_id")
        .agg(
            F.bool_and(ok).alias("_all_ok"),
            F.coalesce(F.max(est_nonself), F.lit(0.0)).alias("max_root_sim"),
        )
        .filter(F.col("_all_ok"))
        .select("doc_id", "max_root_sim")
    )


@query(
    "q127_multiband_root_dedup",
    oracle=f"""
    WITH hashed AS (
      SELECT doc_id, {_SHINGLE_HASHES_SQL} AS hs FROM documents
    ),
    sigs AS (
      SELECT doc_id, {", ".join(_minhash_sql_exprs())} FROM hashed
    ),
    bands AS ({{bands}}),
    roots AS (
      SELECT band_idx, band_key, MIN(doc_id) AS root_id
      FROM bands GROUP BY 1, 2
    ),
    verdict AS (
      SELECT x.doc_id,
             (x.doc_id = rt.root_id OR {_EST_SQL} < {SINGLE_BAND_SIM}) AS ok,
             CASE WHEN x.doc_id <> rt.root_id THEN {_EST_SQL} END AS est_nonself
      FROM bands x
      JOIN roots rt USING (band_idx, band_key)
      JOIN sigs r ON r.doc_id = rt.root_id
    )
    SELECT doc_id, COALESCE(MAX(est_nonself), 0.0) AS max_root_sim
    FROM verdict
    GROUP BY doc_id
    HAVING bool_and(ok)
    """.format(bands=_multiband_bands_sql()),
    tags=("dedup", "minhash", "lsh", "streaming-analog"),
)
def q127_multiband_root_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-band bucket-root near-dup dedup: full LSH-banding recall
    (suppressed if ANY band collides with its root) with per-bucket
    root state — the batch twin of
    streaming/neardup.py::streaming_multiband_root_dedup."""
    docs = load_table(spark, sf_dir, "documents")
    return multiband_root_dedup(minhash_signatures(docs))


# ---------------------------------------------------------------------------
# L1c: segment-level exact dedup (C4-style): dedup WITHIN documents at
# sub-document granularity — remove every repeated text segment
# corpus-wide (keep the first occurrence) and rebuild each document
# from its surviving segments. This is the C4 "three-sentence span"
# dedup adapted to token segments, the other half of exact dedup that
# whole-document hashing (q40) cannot see: boilerplate repeated inside
# otherwise-unique pages.
# ---------------------------------------------------------------------------

SEG_TOKENS = 16


def _seg_arr_sql() -> str:
    n = (
        f"GREATEST(CAST(ceil(len(ts) / {SEG_TOKENS}.0) AS BIGINT), 1)"
    )
    return (
        f"list_transform(generate_series(0, {n} - 1), "
        f"i -> array_to_string(ts[(i * {SEG_TOKENS} + 1):"
        f"(i * {SEG_TOKENS} + {SEG_TOKENS})], ' '))"
    )


@query(
    "q128_segment_dedup",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_TOK} AS ts FROM documents),
    seg AS (
      SELECT doc_id,
             unnest({_seg_arr_sql()}) AS seg_text,
             generate_subscripts({_seg_arr_sql()}, 1) - 1 AS seg_idx
      FROM tok
    ),
    firsts AS (
      SELECT *, row_number() OVER (
        PARTITION BY md5(seg_text) ORDER BY doc_id, seg_idx
      ) AS rn
      FROM seg
    ),
    kept AS (SELECT doc_id, seg_idx, seg_text FROM firsts WHERE rn = 1),
    rebuilt AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             string_agg(seg_text, ' ' ORDER BY seg_idx) AS dedup_text
      FROM kept GROUP BY doc_id
    ),
    nseg AS (
      SELECT doc_id,
             GREATEST(CAST(ceil(len(ts) / {SEG_TOKENS}.0) AS BIGINT), 1)
               AS n_segments
      FROM tok
    )
    SELECT n.doc_id, n.n_segments,
           COALESCE(r.n_kept, CAST(0 AS BIGINT)) AS n_kept,
           COALESCE(r.dedup_text, '') AS dedup_text
    FROM nseg n LEFT JOIN rebuilt r USING (doc_id)
    """,
    tags=("dedup", "exact", "segments", "c4"),
)
def q128_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide segment-level exact dedup: split every document
    into non-overlapping {SEG_TOKENS}-token segments, keep only the
    FIRST occurrence of each distinct segment (ordered by
    (doc_id, seg_idx) — deterministic survivor), and rebuild each
    document from its surviving segments in order. Documents reduced
    to nothing survive as empty strings with n_kept = 0.

    Scale: one explode + ONE shuffle, partitioned by the segment's
    128-bit md5 (narrow comparison key; the segment text rides the
    shuffle once because it must survive into the rebuild — that is
    the data itself, not overhead). The keep-first rule is the q118
    min(struct) window — no self-join back for the winner. The rebuild
    groups by doc_id (second shuffle) and sorts segments inside the
    aggregated array, never globally. Reducer skew is bounded: a
    segment's bucket holds its duplicates only, and the hottest
    segment (empty-page boilerplate) degrades to one reducer scanning
    its copies — the same profile as exact doc dedup (q40).
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("ts")
    )
    ts = F.col("ts")
    n_segs = F.greatest(
        F.ceil(F.size(ts) / F.lit(float(SEG_TOKENS))), F.lit(1).cast("long")
    )
    seg_arr = F.transform(
        F.sequence(F.lit(0).cast("long"), n_segs - 1),
        lambda i: F.concat_ws(" ", F.slice(ts, (i * SEG_TOKENS + 1).cast("int"), SEG_TOKENS)),
    )
    # EAGER checkpoint of the compact pre-explode form: both the
    # dedup pipeline and the per-doc segment counts derive from the
    # segment arrays, and Catalyst does not share unaliased subtrees —
    # without this the tokenize + slice-transform pass over the corpus
    # would execute twice (the q132/q151 multi-reference convention).
    arr = docs.select("doc_id", seg_arr.alias("segs")).localCheckpoint(
        eager=True
    )
    seg = arr.select(
        "doc_id",
        F.size("segs").cast("long").alias("n_segments"),
        F.posexplode("segs").alias("seg_idx", "seg_text"),
    )
    w = Window.partitionBy(F.md5("seg_text"))
    first = F.min(F.struct("doc_id", "seg_idx")).over(w)
    kept = (
        seg.withColumn("_first", first)
        .filter(
            (F.col("doc_id") == F.col("_first.doc_id"))
            & (F.col("seg_idx") == F.col("_first.seg_idx"))
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seg_idx", "seg_text"))),
                    lambda s: s.seg_text,
                ),
            ).alias("dedup_text"),
        )
    )
    nseg = arr.select(
        "doc_id", F.size("segs").cast("long").alias("n_segments")
    )
    return nseg.join(kept, "doc_id", "left").select(
        "doc_id",
        "n_segments",
        F.coalesce(F.col("n_kept"), F.lit(0).cast("long")).alias("n_kept"),
        F.coalesce(F.col("dedup_text"), F.lit("")).alias("dedup_text"),
    )


# ---------------------------------------------------------------------------
# L2m: iterative graph ranking — integer-arithmetic PageRank over the
# near-dup pair graph (which documents are the "hubs" of duplication)
# ---------------------------------------------------------------------------

_PR_SCALE = 10**12
_PR_ITERS = 3


def _pr_oracle() -> str:
    """Unrolled-iteration oracle: r0..r{k} as successive CTEs, exact
    int64 arithmetic only (// is floor division on non-negative
    values in both engines)."""
    steps = []
    prev = "r0"
    for i in range(1, _PR_ITERS + 1):
        steps.append(f"""
    contrib{i} AS (
      SELECT e.dst AS doc_id, SUM({prev}.rank // deg.outdeg) AS c
      FROM {prev} JOIN deg ON deg.src = {prev}.doc_id
      JOIN edges e ON e.src = {prev}.doc_id
      GROUP BY e.dst
    ),
    r{i} AS (
      SELECT n.doc_id,
             (15 * {_PR_SCALE} ) // (100 * nn.n) + (85 * COALESCE(c, 0)) // 100 AS rank
      FROM nodes n CROSS JOIN nn LEFT JOIN contrib{i} USING (doc_id)
    )""")
        prev = f"r{i}"
    return f"""
    WITH {_LSH_PAIRS_SQL},
    nodes AS (SELECT doc_id FROM documents),
    nn AS (SELECT COUNT(*) AS n FROM documents),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
    r0 AS (
      SELECT n.doc_id, {_PR_SCALE} // nn.n AS rank
      FROM nodes n CROSS JOIN nn
    ),{",".join(steps)}
    -- BIGINT cast: the contrib SUM promotes to HUGEINT in DuckDB,
    -- which the driver canonicalizer would coerce to float64
    SELECT doc_id, CAST(rank AS BIGINT) AS pagerank
    FROM {prev}
    ORDER BY pagerank DESC, doc_id
    LIMIT 100
    """


@query(
    "q151_pagerank_dup_graph",
    oracle=_pr_oracle(),
    tags=("dedup", "graph", "iterative", "pagerank"),
)
def q151_pagerank_dup_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 iterations, damping 0.85) over the undirected LSH
    candidate-pair graph — ranks the "hubs" of duplication the way CC
    (q85) finds its components. The iterative-join formulation is the
    one that generalizes to any fixed-point graph algorithm Spark
    lacks natively.

    Exactness: floating-point PageRank cannot be oracle-checked (the
    per-node SUM over in-neighbors is order-dependent), so ranks are
    integers scaled by 10^12 with floor division at every step —
    order-independent int64 sums, bit-identical across engines, and
    within 1e-12·deg of the real-valued iteration. Dangling mass is
    dropped (documented deterministic variant; both sides implement
    the same rule).

    Scale: each iteration is one join-aggregate on the EDGE list —
    the standard distributed PR shape (Pregel's shuffle pattern):
    cost O(|E|) per iteration, no all-pairs term anywhere; the edge
    list comes from the LSH-bounded pair generation, not n². Fixed
    iteration count keeps the plan static (no driver-side convergence
    loop at this size; the CC convergence-probe pattern from q85
    composes when needed). Static per-node facts (outdeg, n) are
    joined ONCE onto a checkpointed node frame and carried through
    the loop — the naive formulation re-joins deg and re-scans the
    corpus for |V| and the node list every iteration. (Pre-partitioning
    the edge checkpoint by src was measured and rejected: with AQE,
    localCheckpoint surfaces as UnknownPartitioning, so the planner
    re-exchanges anyway and the build-time shuffle is pure overhead.)
    """
    docs = load_table(spark, sf_dir, "documents")
    sig = minhash_signatures(docs)
    pairs = lsh_candidate_pairs(sig).localCheckpoint(eager=True)
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(
                F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
            )
        )
        .localCheckpoint(eager=True)
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nn = docs.agg(F.count(F.lit(1)).alias("n"))
    # node frame with the loop-invariant facts attached once: outdeg
    # (null for nodes without out-edges — exactly deg's inner-join
    # semantics below) and the broadcast scalar |V|
    base = (
        docs.select("doc_id")
        .join(deg.withColumnRenamed("src", "doc_id"), "doc_id", "left")
        .crossJoin(F.broadcast(nn))
        .localCheckpoint(eager=True)
    )
    ranks = base.select(
        "doc_id",
        "outdeg",
        "n",
        F.expr(f"CAST({_PR_SCALE} AS BIGINT) div n").alias("rank"),
    )
    for _ in range(_PR_ITERS):
        shares = ranks.filter(F.col("outdeg").isNotNull()).select(
            F.col("doc_id").alias("u"),
            F.expr("rank div outdeg").alias("share"),
        )
        contrib = (
            edges.withColumnRenamed("src", "u")
            .join(shares, "u")
            .groupBy("dst")
            .agg(F.sum("share").alias("c"))
            .withColumnRenamed("dst", "doc_id")
        )
        ranks = base.join(contrib, "doc_id", "left").select(
            "doc_id",
            "outdeg",
            "n",
            (
                F.expr(f"(15 * {_PR_SCALE}) div (100 * n)")
                + F.expr("(85 * COALESCE(c, 0)) div 100")
            ).alias("rank"),
        )
    return (
        ranks.select("doc_id", F.col("rank").alias("pagerank"))
        .orderBy(F.col("pagerank").desc(), "doc_id")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# L2m: leakage-safe dataset splitting — train/val/test assignment by
# DEDUP-CLUSTER root, so near-duplicate documents can never straddle
# splits (the train/test contamination channel a doc-id hash split
# leaves open)
# ---------------------------------------------------------------------------


@query(
    "q171_leakage_safe_split",
    oracle=f"""
    WITH RECURSIVE {_LSH_PAIRS_SQL},
    undirected AS (
      SELECT doc_a, doc_b FROM pairs
      UNION ALL
      SELECT doc_b, doc_a FROM pairs
    ),
    reach (src, dst) AS (
      SELECT doc_a, doc_b FROM undirected
      UNION
      SELECT r.src, u.doc_b
      FROM reach r JOIN undirected u ON u.doc_a = r.dst
    ),
    clustered AS (
      SELECT d.doc_id,
             least(d.doc_id,
                   coalesce((SELECT MIN(r.dst) FROM reach r
                             WHERE r.src = d.doc_id), d.doc_id)) AS cluster
      FROM documents d
    ),
    b AS (
      SELECT doc_id, cluster,
             {md5_hash32_sql("'csplit:' || CAST(cluster AS VARCHAR)")} % 100
               AS bucket
      FROM clustered
    )
    SELECT doc_id, cluster,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
    tags=("dedup", "split", "graph", "iterative"),
)
def q171_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe 80/10/10 split: documents are first clustered by
    near-duplicate connected components (the q85 pipeline), then the
    md5 split bucket is computed on the CLUSTER root — every member
    of a near-dup cluster inherits the same split, so a paraphrase of
    a training document cannot land in test. q100's per-doc hash
    split is the right tool only AFTER dedup; this is the split you
    run when duplicates are retained (e.g. for counting/weighting) or
    when dedup is soft. Assignment stays a pure function of content
    (cluster root = min doc_id of the component), so it is stable
    across engines, reruns, and corpus growth exactly like q100.

    Scale: LSH + star-contraction CC as q85 (never all-pairs,
    O(log^2 n) rounds); the split assignment itself is a map-side
    expression on the cluster label — zero additional shuffles.
    """
    docs = load_table(spark, sf_dir, "documents")
    sig = minhash_signatures(docs)
    pairs = lsh_candidate_pairs(sig).localCheckpoint(eager=True)
    labels = connected_components(docs.select("doc_id"), pairs)
    bucket = (
        md5_hash32(F.concat(F.lit("csplit:"), F.col("cluster").cast("string")))
        % 100
    )
    return labels.select(
        "doc_id",
        "cluster",
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
        .alias("split"),
    )


# ---------------------------------------------------------------------------
# L2n: dedup ROI readout — cluster-size histogram + corpus shrink ratio
# ---------------------------------------------------------------------------


@query(
    "q203_dedup_roi",
    oracle=f"""
    WITH RECURSIVE {_LSH_PAIRS_SQL},
    undirected AS (
      SELECT doc_a, doc_b FROM pairs
      UNION ALL
      SELECT doc_b, doc_a FROM pairs
    ),
    reach (src, dst) AS (
      SELECT doc_a, doc_b FROM undirected
      UNION
      SELECT r.src, u.doc_b
      FROM reach r JOIN undirected u ON u.doc_a = r.dst
    ),
    clustered AS (
      SELECT d.doc_id,
             least(d.doc_id,
                   coalesce((SELECT MIN(r.dst) FROM reach r
                             WHERE r.src = d.doc_id), d.doc_id)) AS cluster
      FROM documents d
    ),
    sizes AS (
      SELECT cluster, CAST(COUNT(*) AS BIGINT) AS csize
      FROM clustered GROUP BY cluster
    ),
    hist AS (
      SELECT csize, CAST(COUNT(*) AS BIGINT) AS n_clusters
      FROM sizes GROUP BY csize
    ),
    tot AS (
      SELECT CAST(SUM(csize * n_clusters) AS BIGINT) AS n_docs,
             CAST(SUM(n_clusters) AS BIGINT) AS n_kept
      FROM hist
    )
    SELECT h.csize, h.n_clusters,
           CAST(h.csize * h.n_clusters AS BIGINT) AS n_docs_at_size,
           CAST((t.n_docs - t.n_kept) * 1000000 // t.n_docs AS BIGINT)
             AS dedup_ppm
    FROM hist h CROSS JOIN tot t
    """,
    tags=("dedup", "graph", "profile"),
)
def q203_dedup_roi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup ROI readout: the near-dup CLUSTER-SIZE HISTOGRAM (how
    many singletons, pairs, triples, ... the q85 pipeline finds) plus
    the corpus shrink ratio if one representative per cluster is
    kept — the number that justifies (or kills) running dedup at all,
    and the skew telemetry for the cluster-keyed stages downstream
    (one mega-cluster = one hot key in every per-cluster operation).

    Scale: everything after the q85 pipeline is |clusters| ->
    |distinct sizes| reductions; the shrink ratio is a 1-row
    broadcast.
    """
    docs = load_table(spark, sf_dir, "documents")
    sig = minhash_signatures(docs)
    pairs = lsh_candidate_pairs(sig).localCheckpoint(eager=True)
    clustered = connected_components(docs.select("doc_id"), pairs)
    sizes = clustered.groupBy("cluster").agg(F.count(F.lit(1)).alias("csize"))
    hist = sizes.groupBy("csize").agg(F.count(F.lit(1)).alias("n_clusters"))
    # corpus totals via a global window over the HISTOGRAM — a
    # |distinct cluster sizes| frame (bounded: tens of rows even at
    # 100 TB), so the unpartitioned window is metadata-scale. The
    # previous crossJoin(broadcast(agg(hist))) planned `hist` — and
    # its whole upstream label-join — TWICE (once under the totals
    # aggregate, once as the probe side); the window reads it once.
    w_all = Window.partitionBy()
    return (
        hist.withColumn(
            "_nd", F.sum(F.col("csize") * F.col("n_clusters")).over(w_all)
        )
        .withColumn("_nk", F.sum("n_clusters").over(w_all))
        .select(
            "csize",
            "n_clusters",
            (F.col("csize") * F.col("n_clusters")).alias("n_docs_at_size"),
            F.expr("(_nd - _nk) * 1000000 div _nd").alias("dedup_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# L2o: dedup execution manifest (the keep/drop action plan)
# ---------------------------------------------------------------------------


@query(
    "q207_dedup_manifest",
    oracle=f"""
    WITH RECURSIVE {_LSH_PAIRS_SQL},
    undirected AS (
      SELECT doc_a, doc_b FROM pairs
      UNION ALL
      SELECT doc_b, doc_a FROM pairs
    ),
    reach (src, dst) AS (
      SELECT doc_a, doc_b FROM undirected
      UNION
      SELECT r.src, u.doc_b
      FROM reach r JOIN undirected u ON u.doc_a = r.dst
    ),
    clustered AS (
      SELECT d.doc_id, d.n_chars,
             least(d.doc_id,
                   coalesce((SELECT MIN(r.dst) FROM reach r
                             WHERE r.src = d.doc_id), d.doc_id)) AS cluster
      FROM documents d
    )
    SELECT doc_id, cluster,
           CASE WHEN doc_id = cluster THEN 'keep' ELSE 'drop' END AS action,
           CAST(CASE WHEN doc_id = cluster THEN 0
                     ELSE n_chars END AS BIGINT) AS chars_saved
    FROM clustered
    WHERE doc_id <> cluster
    """,
    tags=("dedup", "graph", "manifest"),
)
def q207_dedup_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup EXECUTION manifest: the concrete row-level action plan
    the q85 clustering implies — every non-representative document
    with its cluster root and the bytes reclaimed by dropping it
    (q203 prices dedup in aggregate; this is the plan a delete/
    tombstone job actually executes, and the audit trail reviewers
    sign off on). Representatives (doc_id == cluster root) are
    implicit keeps and excluded, so the manifest is exactly the
    delete set.

    Scale: the q85 pipeline plus one |docs|-frame join back to
    n_chars — manifest size is (corpus - clusters) rows by
    construction.
    """
    docs = load_table(spark, sf_dir, "documents")
    sig = minhash_signatures(docs)
    pairs = lsh_candidate_pairs(sig).localCheckpoint(eager=True)
    # the manifest is exactly the non-root PAIRED docs, so components
    # and the n_chars join-back run over the endpoint sliver — the
    # corpus side arrives pre-filtered by the join instead of
    # shuffling every doc through the cluster label join
    losers = paired_component_labels(pairs).filter(
        F.col("doc_id") != F.col("cluster")
    )
    return losers.join(docs.select("doc_id", "n_chars"), "doc_id").select(
        "doc_id",
        "cluster",
        F.lit("drop").alias("action"),
        F.col("n_chars").cast("long").alias("chars_saved"),
    )


# ---------------------------------------------------------------------------
# L2f: exact set-similarity join via prefix filtering (PPJoin-lite)
# ---------------------------------------------------------------------------

# Jaccard threshold for the prefix-filter join, as an exact rational
# (1/2) so every derived bound is integer arithmetic: required overlap
# ceil(s/2) = (s+1) div 2, prefix length s - (s+1) div 2 + 1, and the
# final predicate 3*n_common >= na + nb.
_PPJ_T_NUM, _PPJ_T_DEN = 1, 2


@query(
    "q210_prefix_filter_join",
    oracle=f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, unnest({_SHINGLE_HASHES_SQL}) AS shingle
      FROM documents
    ),
    dfreq AS (
      SELECT shingle, CAST(COUNT(*) AS BIGINT) AS df FROM sh GROUP BY shingle
    ),
    pos AS (
      SELECT s.doc_id, s.shingle,
             row_number() OVER (PARTITION BY s.doc_id
                                ORDER BY d.df, s.shingle) AS pos,
             COUNT(*) OVER (PARTITION BY s.doc_id) AS n_sh
      FROM sh s JOIN dfreq d ON d.shingle = s.shingle
    ),
    pref AS (
      SELECT doc_id, shingle, n_sh FROM pos
      WHERE pos <= n_sh - (n_sh + 1) // 2 + 1
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.n_sh AS na, b.n_sh AS nb
      FROM pref a JOIN pref b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      WHERE 2 * least(a.n_sh, b.n_sh) >= greatest(a.n_sh, b.n_sh)
    ),
    common AS (
      SELECT c.doc_a, c.doc_b, c.na, c.nb,
             CAST(COUNT(*) AS BIGINT) AS n_common
      FROM cand c
      JOIN sh x ON x.doc_id = c.doc_a
      JOIN sh y ON y.doc_id = c.doc_b AND y.shingle = x.shingle
      GROUP BY 1, 2, 3, 4
    )
    SELECT doc_a, doc_b, CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
           n_common,
           CAST(n_common * 1000000 // (na + nb - n_common) AS BIGINT)
             AS jaccard_ppm
    FROM common
    WHERE 3 * n_common >= na + nb
    """,
    tags=("dedup", "jaccard", "prefix-filter"),
)
def q210_prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-similarity join via prefix filtering (the PPJoin
    family, Xiao et al. WWW'08): all document pairs with 3-gram
    Jaccard >= 1/2, with NO false negatives and NO LSH randomness —
    the third point in the near-dup design space next to q45 (exact
    but df-capped) and q92 (LSH candidates, probabilistic recall).

    The filter: order every document's shingles by ascending global
    document frequency (rarest first, ties by shingle text); a pair
    with Jaccard >= t MUST share one of each side's first
    s - ceil(t*s) + 1 shingles (pigeonhole on the required overlap
    ceil(t*s), valid with the length filter t*max <= min). Candidates
    are therefore generated only from RARE shingles — the stop-shingle
    blow-up that forces q45's df cap never happens, because a shingle
    with high df sorts out of every prefix.

    Exactness: threshold 1/2 keeps every bound integral — prefix
    length s - (s+1) div 2 + 1, length filter 2*min >= max, verdict
    3*n_common >= na + nb; jaccard_ppm is one truncated division.

    Scale: the df frame is shingle-keyed (corpus-reduced); the prefix
    rank is a DOC-partitioned window (no global sort — the global
    order (df, shingle) is only a comparator inside each doc's local
    sort); the candidate join touches prefix postings whose length is
    bounded by the rarest-first order; verification joins candidate
    pairs to their two posting lists (shuffle keyed on doc_id). Every
    stage is key-partitioned; nothing is quadratic in corpus size —
    output is bounded by true near-dup pairs plus prefix collisions
    on rare shingles.
    """
    docs = load_table(spark, sf_dir, "documents")
    from target_hdfs_spark.sources.readers import fan_out

    sh = (
        fan_out(docs, "doc_id")
        .select("doc_id", tokens("text").alias("_toks"))
        .select(
            "doc_id",
            # hash shingles to int64 FIRST (portable md5, the q42
            # sketch-family convention): every downstream frame —
            # df counts, the prefix windows, both join sides, the
            # collected verify arrays — carries 8-byte longs instead
            # of shingle strings (~6x less shuffle/state at 100x;
            # the 8g-heap 100x run went from GC-bound to CPU-bound).
            # Semantics become "Jaccard over hashed shingles", the
            # same universe q42/q43 sketch; the oracle hashes
            # identically so exactness is preserved.
            F.explode(
                F.transform(shingles(F.col("_toks")), md5_hash32)
            ).alias("shingle"),
        )
        .distinct()
        .localCheckpoint()  # feeds df counts, prefix pass, and verify
    )
    return prefix_filter_pairs(sh)


def prefix_filter_pairs(
    sh: DataFrame,
    t_num: int = _PPJ_T_NUM,
    t_den: int = _PPJ_T_DEN,
    guard: bool = True,
    eager_guard: bool = False,
) -> DataFrame:
    """Exact Jaccard >= t_num/t_den pair join over (doc_id, shingle)
    element rows via prefix filtering — the reusable core behind q210.
    Input must be distinct per (doc_id, shingle); output columns:
    doc_a, doc_b, na, nb, n_common, jaccard_ppm.

    Every bound stays INTEGER for any rational t = p/q (r6 verdict
    item 5 generalized the hardcoded 1/2):

    - required overlap, pair form: J >= p/q <=> (p+q)*c >= p*(na+nb),
      i.e. c >= ceil(p*(na+nb)/(p+q)) — the final verify predicate
      and the positional filter's requirement;
    - required overlap, per-side form: with the length filter in
      force (q*min >= p*max), c >= ceil(p*s/q) for EACH side's size s
      (proof: c >= p(na+nb)/(p+q) >= p*s/q <=> q*(na+nb) >= s(p+q)
      <=> q*other >= p*s, which the length filter gives for s = max
      and min >= p*min/q gives trivially for s = min);
    - prefix length: s - ceil(p*s/q) + 1 (pigeonhole on the per-side
      required overlap over the doc's df-ordered shingles).

    Two PPJoin refinements beyond the plain prefix bound (both pure
    candidate PRUNING — provably no false negatives, so the oracle's
    unpruned derivation verifies to the same final set):

    - POSITIONAL filter inside the join: a shared prefix token at
      (ordered) positions pa / pb caps the achievable overlap at
      1 + min(na - pa, nb - pb); pairs whose every shared prefix
      token fails ceil(max/2) are dropped before the distinct
      (measured 310k -> 206k candidates on the sf0.1 corpus — the
      tiny synthetic vocabulary is prefix filtering's worst case;
      real web-scale shingle distributions prune far harder).
    - Verification joins each candidate to its two COLLECTED shingle
      arrays and counts the intersection map-side
      (array_intersect on distinct-element arrays) instead of
      re-exploding posting lists through a pair-keyed aggregation —
      the candidate x |doc| row blow-up never materializes.

    Routing guard (ENFORCED driver-side, r7 verdict item 2): on
    adversarially small vocabularies (tiny shingle universe, high df)
    the prefix self-join's fan-out — sum over prefix shingles of
    C(df_pref, 2) — goes super-linear in documents, and since the
    OUTPUT itself can be quadratic there, no exact algorithm fixes it;
    the right move is q243_dedup_planner's routing to the LSH-verified
    pipeline. The guard therefore prices the join before its plan is
    launched: if candidate volume exceeds {_PREFIX_CAND_PER_DOC_MAX}
    per document it raises a routing error naming
    q92_lsh_verified_pairs (a 1-row aggregate over the checkpointed
    prefix frame, evaluated driver-side BEFORE the join — mirroring
    q45's df-cap on the all-pairs axis), turning q243's advisory
    decision into a load-bearing one. The same guard row also enforces the
    ARRAY WIDTH cap: the verify collects one shingle array per doc,
    so a doc above {_POC_MAX_DOC_SHINGLES} distinct shingles fails
    fast with the routing message before any array is built (the LSH
    pipeline's pair_overlap_counts ROUTES such docs to a streaming
    verify — the exact-prefix path deliberately fail-fasts instead:
    routing machinery measured 3x slower at 10x/100x docs here, and
    this path is for corpora the planner already priced as clean).
    ``guard=False`` opts out for callers that have already routed.
    The guard always runs driver-side before the join plan launches
    (``eager_guard`` is accepted for compatibility; both values take
    the strict path — the historical in-plan race stopped being a
    guarantee once the prefix frame was checkpointed, because AQE's
    empty-relation propagation can prune the guard subtree when the
    candidate join is provably empty).
    Measured: sf0.1 corpus at t=1/3 sits far under both caps; the
    synthetic tiny-vocabulary 100x sweep corpus trips the volume cap
    in seconds instead of >25 min of join fan-out.
    """
    p, q = int(t_num), int(t_den)
    if not (0 < p <= q):
        raise ValueError(f"threshold must satisfy 0 < t <= 1, got {p}/{q}")
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    w_doc = Window.partitionBy("doc_id").orderBy("df", "shingle")
    w_cnt = Window.partitionBy("doc_id")
    pos = sh.join(dfreq, "shingle").select(
        "doc_id",
        "shingle",
        F.row_number().over(w_doc).alias("pos"),
        F.count(F.lit(1)).over(w_cnt).alias("n_sh"),
    )
    # prefix length s - ceil(p*s/q) + 1, with ceil(p*s/q) as the
    # integer (p*s + q - 1) div q
    # one plan consumes `pref` up to four times (guard volume, guard
    # width, both self-join sides), and every consumer would replay
    # the dfreq join + the two doc windows; the prefix frame is
    # linear-sized (<= one row per element), so materialize it once
    pref = (
        pos.filter(
            F.expr(f"pos <= n_sh - ({p} * n_sh + {q - 1}) div {q} + 1")
        )
        .select("doc_id", "shingle", "pos", "n_sh")
        .localCheckpoint()
    )
    if guard:
        # Candidate volume the self-join WOULD materialize, priced on
        # the prefix frame before the join exists. coalesce covers the
        # empty-input case (sum over zero rows is NULL, which must not
        # trip the otherwise-branch).
        vol = pref.groupBy("shingle").agg(
            F.count(F.lit(1)).alias("dfp")
        ).agg(
            F.coalesce(
                F.sum(F.expr("dfp * (dfp - 1) div 2")), F.lit(0)
            ).alias("n_cand")
        )
        ndocs = sh.agg(
            F.greatest(F.countDistinct("doc_id"), F.lit(1)).alias("n_docs")
        )
        # Max doc width rides the same prefix frame: the verify
        # collects one array per doc, so a doc above the array cap
        # must fail fast with the routing message BEFORE any array is
        # built (the LSH pipeline's pair_overlap_counts routes such
        # docs to a streaming verify; the exact-prefix path is for
        # corpora the planner already priced as clean). n_sh is the
        # doc's distinct-shingle count under the input contract and
        # appears on every prefix row.
        width = pref.agg(
            F.coalesce(F.max("n_sh"), F.lit(0)).alias("max_n_sh")
        )
        ok = vol.crossJoin(ndocs).crossJoin(width).select(
            F.when(
                F.col("max_n_sh") > _POC_MAX_DOC_SHINGLES,
                F.raise_error(
                    F.format_string(
                        "prefix_filter_pairs: a document has %s distinct "
                        f"shingles (array cap {_POC_MAX_DOC_SHINGLES}) — "
                        "route this corpus via q92_lsh_verified_pairs, "
                        "whose verify streams oversized docs instead of "
                        "collecting them",
                        F.col("max_n_sh"),
                    )
                ).cast("boolean"),
            )
            .when(
                F.col("n_cand")
                <= F.lit(_PREFIX_CAND_PER_DOC_MAX) * F.col("n_docs"),
                F.lit(True),
            )
            .otherwise(
                F.raise_error(
                    F.format_string(
                        "prefix_filter_pairs: prefix-join candidate volume "
                        "%s exceeds the exact-prefix routing bound "
                        f"{_PREFIX_CAND_PER_DOC_MAX} per document (%s docs) "
                        "— this corpus shape is the planner's "
                        "'lsh-verify:q92' case (q243_dedup_planner); run "
                        "the LSH-verified pipeline "
                        "(q92_lsh_verified_pairs) instead",
                        F.col("n_cand"),
                        F.col("n_docs"),
                    )
                )
                .cast("boolean")
            )
            .alias("_prefix_guard_ok")
        )
    else:
        ok = None
    if ok is not None:
        # ALWAYS enforced driver-side (was: only under eager_guard,
        # with the lazy default racing the join stages in-plan). Two
        # reasons: with `pref` checkpointed the guard aggregates read
        # materialized rows, so strict fail-fast ordering now costs
        # one small job instead of an element-frame replay; and the
        # in-plan attachment stopped being reliable — AQE's
        # empty-relation propagation can prune the guard's broadcast
        # subtree when the candidate join is provably empty, skipping
        # the raise entirely. eager_guard stays accepted; both values
        # take this path.
        ok.collect()  # raises the routing error here if the guard fires
        ok = None  # already enforced; nothing to attach in-plan
    a, b = pref.alias("a"), pref.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(
            # length filter: q*min >= p*max
            q * F.least(F.col("a.n_sh"), F.col("b.n_sh"))
            >= p * F.greatest(F.col("a.n_sh"), F.col("b.n_sh"))
        )
        .filter(
            # positional overlap bound vs the PAIR-form requirement
            # ceil(p*(na+nb)/(p+q)) — tighter than the per-side
            # ceil(p*max/q) the 1/2-only version used
            1
            + F.least(
                F.col("a.n_sh") - F.col("a.pos"),
                F.col("b.n_sh") - F.col("b.pos"),
            )
            >= F.expr(
                f"({p} * (a.n_sh + b.n_sh) + {p + q - 1}) div {p + q}"
            )
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("na"),
            F.col("b.n_sh").alias("nb"),
        )
        .distinct()
    )
    # inline collected-array verify: cand has exactly one consumer, so
    # the single collect_list pass beats routing through
    # pair_overlap_counts (measured 3x at 10x/100x docs: the shared
    # core's sizes pass + candidate checkpoint + two-branch scan only
    # pay off when pairs ARRIVE from an unbounded generator, the LSH
    # family's shape). Width safety comes from the guard above
    # instead: a doc over the array cap fails fast with the routing
    # message before any array is built.
    sets = sh.groupBy("doc_id").agg(F.collect_list("shingle").alias("arr"))
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("arr").alias("arr_a"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("arr").alias("arr_b"))
    common = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "na",
            "nb",
            F.size(F.array_intersect(F.col("arr_a"), F.col("arr_b")))
            .cast("long")
            .alias("n_common"),
        )
    )
    return common.filter(
        (p + q) * F.col("n_common") >= p * (F.col("na") + F.col("nb"))
    ).select(
        "doc_a",
        "doc_b",
        F.col("na").cast("long").alias("na"),
        F.col("nb").cast("long").alias("nb"),
        "n_common",
        F.expr("n_common * 1000000 div (na + nb - n_common)").alias(
            "jaccard_ppm"
        ),
    )


# ---------------------------------------------------------------------------
# L2g: sketch calibration — MinHash estimate vs exact Jaccard error
# ---------------------------------------------------------------------------

_CAL_MATCH_SQL = " + ".join(
    f"CASE WHEN a.mh_{i} = b.mh_{i} THEN 1 ELSE 0 END"
    for i in range(NUM_HASHES)
)


@query(
    "q214_sketch_calibration",
    oracle=f"""
    WITH {_LSH_PAIRS_SQL},
    ds AS (
      SELECT DISTINCT doc_id, unnest({shingles_sql(_TOK)}) AS shingle
      FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM ds GROUP BY doc_id),
    common AS (
      SELECT p.doc_a, p.doc_b, COUNT(sb.shingle) AS n_common
      FROM pairs p
      LEFT JOIN ds sa ON sa.doc_id = p.doc_a
      LEFT JOIN ds sb ON sb.doc_id = p.doc_b AND sb.shingle = sa.shingle
      GROUP BY 1, 2
    ),
    est AS (
      SELECT p.doc_a, p.doc_b, {_CAL_MATCH_SQL} AS n_match
      FROM pairs p
      JOIN sigs a ON a.doc_id = p.doc_a
      JOIN sigs b ON b.doc_id = p.doc_b
    ),
    j AS (
      SELECT e.n_match,
             c.n_common * 1000000
               // (za.n_sh + zb.n_sh - c.n_common) AS exact_ppm,
             e.n_match * 1000000 // {NUM_HASHES} AS est_ppm
      FROM est e
      JOIN common c ON c.doc_a = e.doc_a AND c.doc_b = e.doc_b
      JOIN sizes za ON za.doc_id = e.doc_a
      JOIN sizes zb ON zb.doc_id = e.doc_b
    )
    SELECT CAST(n_match AS BIGINT) AS n_match,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(abs(est_ppm - exact_ppm)) // COUNT(*) AS BIGINT)
             AS mean_abs_err_ppm,
           CAST(MIN(exact_ppm) AS BIGINT) AS min_exact_ppm,
           CAST(MAX(exact_ppm) AS BIGINT) AS max_exact_ppm
    FROM j GROUP BY n_match
    """,
    tags=("dedup", "minhash", "calibration", "observability"),
)
def q214_sketch_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash SKETCH CALIBRATION: for every LSH candidate pair, the
    signature-based Jaccard estimate (matching components / {NUM_HASHES})
    joined against the exact shingle-set Jaccard, summarized per
    match-count level — the error profile that tells an operator
    whether {NUM_HASHES} hashes are enough BEFORE trusting the sketch
    on a 100 TB dedup run (the observability twin of q71's ANN recall
    readout, applied to the dedup sketch). A drifting
    mean_abs_err_ppm at a given match level is the signal to widen
    the signature or re-band.

    Exactness: match counts, set sizes and both ppm readouts are
    exact integers (truncated divisions); the mean abs error is an
    integer div of integer sums.

    Scale: candidates come from the capped LSH pipeline (never
    all-pairs); the exact verify touches candidate pairs only (q92's
    posture); signatures join back on doc_id; the output is at most
    {NUM_HASHES}+1 rows.
    """
    docs = load_table(spark, sf_dir, "documents")
    # eager pairs: the verify references pairs on three branches and
    # the estimate join on a fourth (q275's collapsed-frame rule);
    # sig checkpoints too — it joins back on both pair sides below
    sets, sig, pairs = lsh_verify_base(docs, eager_pairs=True)
    sig = sig.localCheckpoint()
    # collected-array verify: zero-overlap candidates stay present
    # with n_common = 0, exactly what the previous left-join posting
    # shape guaranteed — but without the |pairs| x |shingles-per-doc|
    # row materialization
    counts = pair_overlap_counts_sets(pairs, sets)
    a = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh_{i}").alias(f"a_{i}") for i in range(NUM_HASHES)],
    )
    b = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh_{i}").alias(f"b_{i}") for i in range(NUM_HASHES)],
    )
    match_expr = None
    for i in range(NUM_HASHES):
        term = F.when(F.col(f"a_{i}") == F.col(f"b_{i}"), 1).otherwise(0)
        match_expr = term if match_expr is None else match_expr + term
    # signatures join straight onto the verified counts (every pair
    # endpoint has a signature, so the pair set is identical) — no
    # separate estimate branch, no pair-pair join to reunite them
    j = (
        counts.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            match_expr.alias("n_match"),
            F.expr("n_common * 1000000 div (na + nb - n_common)").alias(
                "exact_ppm"
            ),
        )
        .withColumn(
            "est_ppm", F.expr(f"n_match * 1000000 div {NUM_HASHES}")
        )
    )
    return j.groupBy(F.col("n_match").cast("long").alias("n_match")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.expr("sum(abs(est_ppm - exact_ppm)) div count(1)")
        .cast("long")
        .alias("mean_abs_err_ppm"),
        F.min("exact_ppm").cast("long").alias("min_exact_ppm"),
        F.max("exact_ppm").cast("long").alias("max_exact_ppm"),
    )


# ---------------------------------------------------------------------------
# L2h: label propagation communities (round-limited, deterministic)
# ---------------------------------------------------------------------------

_LPA_ROUNDS = 2


def _lpa_round_sql(prev: str, out: str) -> str:
    return f"""
    {out} AS (
      SELECT node, label FROM (
        SELECT s.u AS node, l.label,
               row_number() OVER (PARTITION BY s.u
                                  ORDER BY COUNT(*) DESC, l.label) AS rn
        FROM sym s JOIN {prev} l ON l.node = s.v
        GROUP BY s.u, l.label
      ) WHERE rn = 1
    )"""


@query(
    "q219_label_propagation",
    oracle=f"""
    WITH {_LSH_PAIRS_SQL},
    sym AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION ALL
      SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    l0 AS (SELECT DISTINCT u AS node, u AS label FROM sym),
    {_lpa_round_sql("l0", "l1")},
    {_lpa_round_sql("l1", "l2")}
    SELECT node AS doc_id, CAST(label AS BIGINT) AS label FROM l2
    """,
    tags=("dedup", "graph", "community"),
)
def q219_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection over the near-duplicate graph via
    {_LPA_ROUNDS} rounds of DETERMINISTIC synchronous label
    propagation: every node adopts the most frequent label among its
    neighbors (ties -> smallest label). Where q85's connected
    components merge everything reachable — one bridge edge glues two
    distinct boilerplate families into one cluster — round-limited
    LPA keeps densely-connected groups separate across weak bridges,
    which is the structure a curation reviewer wants when deciding
    what a "duplicate family" actually is.

    Determinism (the classic LPA pitfall, solved): synchronous
    updates (round k reads only round k-1 labels) + total-order
    tiebreak (count DESC, label ASC) make the fixed round count
    exactly reproducible — same discipline as q151's unrolled
    PageRank, so the iterative algorithm is fully oracle-checkable.

    Scale: per round, ONE join of the symmetrized edge list to the
    label frame (both keyed on node) + one (node, label) aggregation
    + one WindowGroupLimit-eligible rank — O(edges) per round,
    {_LPA_ROUNDS} rounds, edges come from the capped LSH pipeline
    (hot buckets star-linked upstream, so degree is bounded).
    """
    docs = load_table(spark, sf_dir, "documents")
    sig = minhash_signatures(docs).localCheckpoint(eager=True)
    pairs = lsh_candidate_pairs(sig).localCheckpoint(eager=False)
    sym = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .unionAll(
            pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
        )
        .localCheckpoint()  # reused every round
    )
    labels = sym.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    w = Window.partitionBy("u").orderBy(F.col("n").desc(), F.col("label"))
    for _ in range(_LPA_ROUNDS):
        nb = (
            sym.join(
                labels.select(F.col("node").alias("v"), "label"), "v"
            )
            .groupBy("u", "label")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        labels = (
            nb.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("u").alias("node"), "label")
        )
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").cast("long").alias("label")
    )


# ---------------------------------------------------------------------------
# L2i: dedup threshold sensitivity (what each cutoff would delete)
# ---------------------------------------------------------------------------


@query(
    "q232_threshold_sensitivity",
    oracle=f"""
    WITH {_LSH_PAIRS_SQL},
    doc_shingles AS (
      SELECT DISTINCT doc_id, unnest({shingles_sql(_TOK)}) AS shingle
      FROM documents
    ),
    sizes AS (
      SELECT doc_id, COUNT(*) AS n_sh FROM doc_shingles GROUP BY doc_id
    ),
    common AS (
      SELECT p.doc_a, p.doc_b, COUNT(*) AS n_common
      FROM pairs p
      JOIN doc_shingles sa ON sa.doc_id = p.doc_a
      JOIN doc_shingles sb ON sb.doc_id = p.doc_b AND sb.shingle = sa.shingle
      GROUP BY 1, 2
    ),
    j AS (
      SELECT c.n_common * 1000000
               // (za.n_sh + zb.n_sh - c.n_common) AS jac_ppm
      FROM common c
      JOIN sizes za ON za.doc_id = c.doc_a
      JOIN sizes zb ON zb.doc_id = c.doc_b
    ),
    jbands AS (
      SELECT CAST(jac_ppm // 100000 AS BIGINT) AS band,
             CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM j GROUP BY 1
    )
    SELECT band,
           CAST(band * 100000 AS BIGINT) AS threshold_ppm,
           n_pairs,
           CAST(SUM(n_pairs) OVER (ORDER BY band DESC
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS pairs_at_or_above
    FROM jbands
    """,
    tags=("dedup", "calibration", "observability"),
)
def q232_threshold_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup THRESHOLD sensitivity: exact-Jaccard pairs from the
    production q92 pipeline banded into 10%-wide similarity bands,
    with the reverse-cumulative count of pairs at or above each band
    — the knob-chooser that says, BEFORE a 100 TB dedup run, how many
    pairs each candidate threshold would suppress (q214 calibrates
    the sketch against exact truth; this turns the truth into the
    deletion-volume curve an operator actually tunes against).

    Exactness: exact shingle-set Jaccard in integer ppm (q92's
    verify), integer banding, exact cumulative counts.

    Scale: the expensive part IS q92 (LSH candidates -> exact verify
    — never all-pairs); the verify uses the collected-array shape
    (pair_overlap_counts — the |pairs| x |shingles-per-doc| posting
    blow-up that made this the family's 100x pain point never
    materializes); the banding adds one aggregation onto a <= 11-row
    frame and a window over it.
    """
    docs = load_table(spark, sf_dir, "documents")
    sets, _sig, pairs = lsh_verify_base(docs)
    # n_common > 0: the oracle derives `common` through inner posting
    # joins, so zero-overlap candidates never reach its banding
    j = (
        pair_overlap_counts_sets(pairs, sets)
        .filter(F.col("n_common") > 0)
        .select(
            F.expr("n_common * 1000000 div (na + nb - n_common)").alias(
                "jac_ppm"
            )
        )
    )
    bands = j.groupBy(F.expr("jac_ppm div 100000").cast("long").alias("band")).agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
    w = Window.orderBy(F.col("band").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return bands.select(
        "band",
        (F.col("band") * 100000).cast("long").alias("threshold_ppm"),
        "n_pairs",
        F.sum("n_pairs").over(w).cast("long").alias("pairs_at_or_above"),
    )


# ---------------------------------------------------------------------------
# L2n: EXACT threshold-sensitivity curve (deterministic complement of
# q232 — no LSH recall term anywhere in the counts)
# ---------------------------------------------------------------------------

# the curve's floor threshold: every pair with Jaccard >= 1/3 is
# enumerated exactly, so every cutoff band >= 333333 ppm is exact
_CURVE_T_NUM, _CURVE_T_DEN = 1, 3


@query(
    "q234_exact_threshold_curve",
    oracle=f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, unnest({_SHINGLE_HASHES_SQL}) AS shingle
      FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(*) AS BIGINT) AS n_common
      FROM sh a JOIN sh b
        ON b.shingle = a.shingle AND b.doc_id > a.doc_id
      GROUP BY 1, 2
    ),
    j AS (
      SELECT c.n_common * 1000000
               // (za.n_sh + zb.n_sh - c.n_common) AS jac_ppm
      FROM common c
      JOIN sizes za ON za.doc_id = c.doc_a
      JOIN sizes zb ON zb.doc_id = c.doc_b
      WHERE {_CURVE_T_NUM + _CURVE_T_DEN} * c.n_common
            >= {_CURVE_T_NUM} * (za.n_sh + zb.n_sh)
    ),
    jbands AS (
      SELECT CAST(jac_ppm // 100000 AS BIGINT) AS band,
             CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM j GROUP BY 1
    )
    SELECT band,
           CAST(band * 100000 AS BIGINT) AS threshold_ppm,
           n_pairs,
           CAST(SUM(n_pairs) OVER (ORDER BY band DESC
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS pairs_at_or_above
    FROM jbands
    """,
    tags=("dedup", "prefix-filter", "calibration", "observability"),
)
def q234_exact_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT dedup threshold-sensitivity curve: the deletion-volume
    knob q232 computes over LSH-candidate pairs, re-derived with ZERO
    recall term — one prefix-filter join (PPJoin, prefix_filter_pairs
    at its now-rational floor t = 1/3)
    enumerates EVERY pair with Jaccard >= 1/3 deterministically, and
    one banding pass turns them into the per-cutoff
    pairs_at_or_above curve. Where q232's counts inherit the sketch's
    banding recall (its caveat, not a bug — it calibrates the
    production pipeline), this curve is the ground truth an operator
    can diff q232 against: curve_exact - curve_lsh IS the recall gap
    per cutoff, measured on the corpus itself.

    Exactness: the prefix filter has provably zero false negatives at
    its threshold (integer bounds, property-tested at 1/3), the
    verify is exact set intersection, banding and the reverse
    cumulative are integer.

    Scale: q210's posture at a lower threshold — prefixes grow to
    s - ceil(s/3) + 1 (longer than t=1/2's, priced in the docstring
    bounds) but stay rare-shingle-ordered, so candidates never
    approach all-pairs on natural corpora; the verify joins
    candidates to collected arrays (pair_overlap_counts' shape,
    inlined in prefix_filter_pairs); the banding is a <= 11-row
    frame. The floor 1/3 bounds the enumerated pair set — curves
    below it need a lower floor, priced the same way.

    Measured limit (the honest price of exactness): at t=1/3 the
    prefix keeps ~2s/3 of each doc's shingles, so on ADVERSARIALLY
    tiny vocabularies (the synthetic sweep corpus is prefix
    filtering's documented worst case) candidate volume goes
    super-linear — the 100x docs sweep was killed at >25 min and the
    sweep is capped at 10x (scripts/scale_experiment.py
    DOC_EXPENSIVE_10X; 1x/10x: 4.7 s / 25.7 s). Production routing:
    run q243_dedup_planner first — on corpora shaped like this one it
    answers 'lsh-verify:q92', and the LSH curve (q232) is the right
    instrument there; the exact curve is for the corpora where the
    planner says prefix filtering is affordable.

    Cites reference behavior: none (beyond-reference operator; the
    reference has no dedup surface).
    """
    docs = load_table(spark, sf_dir, "documents")
    from target_hdfs_spark.sources.readers import fan_out

    sh = (
        fan_out(docs, "doc_id")
        .select("doc_id", tokens("text").alias("_toks"))
        .select(
            "doc_id",
            F.explode(
                F.transform(shingles(F.col("_toks")), md5_hash32)
            ).alias("shingle"),
        )
        .distinct()
        .localCheckpoint()  # feeds df counts, prefix pass, and verify
    )
    pairs = prefix_filter_pairs(sh, _CURVE_T_NUM, _CURVE_T_DEN)
    bands = pairs.groupBy(
        F.expr("jaccard_ppm div 100000").cast("long").alias("band")
    ).agg(F.count(F.lit(1)).alias("n_pairs"))
    w = Window.orderBy(F.col("band").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return bands.select(
        "band",
        (F.col("band") * 100000).cast("long").alias("threshold_ppm"),
        "n_pairs",
        F.sum("n_pairs").over(w).cast("long").alias("pairs_at_or_above"),
    )


# ---------------------------------------------------------------------------
# L2o: cross-source redundancy matrix (which sources duplicate which)
# ---------------------------------------------------------------------------


@query(
    "q242_cross_source_redundancy",
    oracle=f"""
    WITH {_LSH_PAIRS_SQL},
    doc_shingles AS (
      SELECT DISTINCT doc_id, unnest({shingles_sql(_TOK)}) AS shingle
      FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM doc_shingles GROUP BY doc_id),
    common AS (
      SELECT p.doc_a, p.doc_b, COUNT(*) AS n_common
      FROM pairs p
      JOIN doc_shingles sa ON sa.doc_id = p.doc_a
      JOIN doc_shingles sb ON sb.doc_id = p.doc_b AND sb.shingle = sa.shingle
      GROUP BY 1, 2
    ),
    verified AS (
      SELECT c.doc_a, c.doc_b
      FROM common c
      JOIN sizes za ON za.doc_id = c.doc_a
      JOIN sizes zb ON zb.doc_id = c.doc_b
      WHERE CAST(c.n_common AS DOUBLE)
            / (za.n_sh + zb.n_sh - c.n_common) >= 0.2
    ),
    src AS (
      SELECT v.doc_a, v.doc_b,
             least(da.source, db.source) AS source_x,
             greatest(da.source, db.source) AS source_y,
             CAST(length(db.text) AS BIGINT) AS dup_chars
      FROM verified v
      JOIN documents da ON da.doc_id = v.doc_a
      JOIN documents db ON db.doc_id = v.doc_b
    )
    SELECT source_x, source_y,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(dup_chars) AS BIGINT) AS dup_chars
    FROM src GROUP BY 1, 2
    """,
    tags=("dedup", "lsh", "verify", "observability"),
)
def q242_cross_source_redundancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-SOURCE redundancy matrix: q92's exact-verified near-dup
    pairs rolled up per unordered source pair — which sources
    duplicate which (the mixture-level diagonal is within-source
    boilerplate; off-diagonal mass is mirroring/plagiarism between
    feeds, the thing a mixture designer must know before weighting
    sources independently; q225's unigram cosine sees topical
    overlap, this sees literal duplication). dup_chars sums the
    higher-doc_id side's length per pair — the deletion upper bound
    a min-id survivor rule would reclaim from that source pair.

    Exactness: q92's candidate + exact-verify semantics verbatim
    (threshold 0.2), integer counts/sums; least/greatest give the
    unordered pair key identically in both engines.

    Scale: everything up to `verified` IS q92 (LSH-bounded, array
    verify via pair_overlap_counts); the source rollup adds two
    doc-keyed joins against the slim (doc_id, source, length) frame
    and an aggregation onto the |sources|² grid.
    """
    docs = load_table(spark, sf_dir, "documents")
    sets, _sig, pairs = lsh_verify_base(docs)
    counts = pair_overlap_counts_sets(pairs, sets)
    jac = F.col("n_common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_common")
    )
    verified = counts.filter(jac >= 0.2).select("doc_a", "doc_b")
    meta = docs.select(
        "doc_id", "source", F.length("text").cast("long").alias("n_chars")
    )
    ma = meta.select(
        F.col("doc_id").alias("doc_a"), F.col("source").alias("src_a")
    )
    mb = meta.select(
        F.col("doc_id").alias("doc_b"),
        F.col("source").alias("src_b"),
        F.col("n_chars").alias("dup_chars_b"),
    )
    return (
        verified.join(ma, "doc_a")
        .join(mb, "doc_b")
        .groupBy(
            F.least("src_a", "src_b").alias("source_x"),
            F.greatest("src_a", "src_b").alias("source_y"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("dup_chars_b").cast("long").alias("dup_chars"),
        )
    )


# ---------------------------------------------------------------------------
# L2p: dedup strategy planner — the q45/q210/q92 router, itself a
# checked query (plan the plan, exactly)
# ---------------------------------------------------------------------------

# Routing rule over corpus shingle statistics (each bound is priced in
# the routed query's own docstring):
#  - exact-all-pairs (q45)  : every shingle df <= the q45 cap — the
#    shared-shingle pair join is provably bounded;
#  - exact-prefix (q210)    : hot shingles exist but the MEAN posting
#    length stays small — rarest-first prefixes keep candidates
#    bounded (hot shingles sort out of every prefix);
#  - lsh-verify (q92)       : heavy posting mass — candidate volume
#    must be capped probabilistically (LSH bands + hot-bucket cap).
_PLANNER_MEAN_DF_X10_MAX = 80  # mean df <= 8.0 (x10 fixed-point)


@query(
    "q243_dedup_planner",
    oracle=f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, unnest({shingles_sql(_TOK)}) AS shingle
      FROM documents
    ),
    dfreq AS (
      SELECT shingle, CAST(COUNT(*) AS BIGINT) AS df FROM sh GROUP BY shingle
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_shingle_types,
             CAST(SUM(df) AS BIGINT) AS n_postings,
             CAST(MAX(df) AS BIGINT) AS max_df,
             CAST(SUM(df) * 10 // COUNT(*) AS BIGINT) AS mean_df_x10,
             CAST(SUM(CASE WHEN df > {_Q45_MAX_SHINGLE_DF} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_hot_shingles
      FROM dfreq
    ),
    docs_n AS (
      SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM sh
    )
    SELECT d.n_docs, s.n_shingle_types, s.n_postings, s.max_df,
           s.mean_df_x10, s.n_hot_shingles,
           CASE WHEN s.max_df <= {_Q45_MAX_SHINGLE_DF}
                  THEN 'exact-all-pairs:q45'
                WHEN s.mean_df_x10 <= {_PLANNER_MEAN_DF_X10_MAX}
                  THEN 'exact-prefix:q210'
                ELSE 'lsh-verify:q92' END AS strategy
    FROM stats s CROSS JOIN docs_n d
    """,
    tags=("dedup", "planner", "observability"),
)
def q243_dedup_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEDUP STRATEGY PLANNER: one shingle-statistics pass decides
    which of the engine's three exact/near-dup pair generators to run
    — the routing decision q45's df-cap guard makes reactively
    (raise_error on a hot shingle), made PROACTIVELY from the same
    statistics, as a query an orchestrator can run before committing
    a 100 TB dedup job. Routing: all postings under the q45 cap ->
    the plain shared-shingle exact join is safely bounded; hot
    shingles but small MEAN posting length -> q210's prefix filter
    (hot shingles sort out of every rarest-first prefix, so they
    cost nothing); heavy posting mass -> q92's LSH + exact verify
    (candidates must be capped probabilistically). The decision
    thresholds are the ones the routed queries' docstrings price.

    Exactness: every statistic is an exact integer (mean df in x10
    fixed point); the CASE routing is deterministic — the planner's
    DECISION is value-checked, not just its inputs.

    Scale: one tokenize+explode+distinct corpus pass reduced to the
    shingle-keyed df frame, then a single aggregation to ONE row —
    strictly cheaper than any of the three strategies it prices.
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = (
        docs.select("doc_id", tokens("text").alias("_toks"))
        .select("doc_id", F.explode(shingles(F.col("_toks"))).alias("shingle"))
        .distinct()
        .localCheckpoint()  # feeds the df stats AND the doc count
    )
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    stats = dfreq.agg(
        F.count(F.lit(1)).cast("long").alias("n_shingle_types"),
        F.sum("df").cast("long").alias("n_postings"),
        F.max("df").cast("long").alias("max_df"),
        F.expr("sum(df) * 10 div count(1)").cast("long").alias("mean_df_x10"),
        F.sum(
            F.when(F.col("df") > _Q45_MAX_SHINGLE_DF, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_hot_shingles"),
    )
    n_docs = sh.agg(F.count_distinct("doc_id").cast("long").alias("n_docs"))
    return (
        stats.join(F.broadcast(n_docs))
        .select(
            "n_docs",
            "n_shingle_types",
            "n_postings",
            "max_df",
            "mean_df_x10",
            "n_hot_shingles",
            F.when(
                F.col("max_df") <= _Q45_MAX_SHINGLE_DF,
                F.lit("exact-all-pairs:q45"),
            )
            .when(
                F.col("mean_df_x10") <= _PLANNER_MEAN_DF_X10_MAX,
                F.lit("exact-prefix:q210"),
            )
            .otherwise(F.lit("lsh-verify:q92"))
            .alias("strategy"),
        )
    )


# ---------------------------------------------------------------------------
# L2k: boilerplate segment pricing — the RefinedWeb/C4 in-source
# template rule: a segment repeated across MANY of a source's
# documents is boilerplate (nav bars, footers, license headers) and
# ALL its occurrences go, including the first — the complement of
# q128's keep-first segment dedup, which is about repeated CONTENT
# ---------------------------------------------------------------------------

_BLP_MIN_DOCS = 3  # a segment must appear in >= this many docs ...
_BLP_PCT = 5  # ... covering >= this % of the source's documents


def _boilerplate_oracle() -> str:
    tok = TOKENS_SQL.format(expr="text")
    return f"""
    WITH t AS (
      SELECT doc_id, source, {tok} AS ts FROM documents
    ),
    segs AS (
      SELECT doc_id, source, len(ts) AS n_toks,
             unnest({_seg_arr_sql()}) AS seg
      FROM t
    ),
    src AS (
      SELECT source, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(SUM(len({tok})) AS BIGINT) AS n_tokens
      FROM documents GROUP BY 1
    ),
    seg_df AS (
      SELECT source, seg,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
             CAST(COUNT(*) AS BIGINT) AS occurrences,
             CAST(SUM(len({TOKENS_SQL.format(expr='seg')})) AS BIGINT)
               AS seg_tokens
      FROM segs GROUP BY 1, 2
    ),
    boiler AS (
      SELECT d.source, d.seg, d.df, d.occurrences, d.seg_tokens
      FROM seg_df d JOIN src s ON s.source = d.source
      WHERE d.df >= {_BLP_MIN_DOCS}
        AND d.df * 100 >= s.n_docs * {_BLP_PCT}
    )
    SELECT s.source, s.n_docs, s.n_tokens,
           CAST(COALESCE(COUNT(b.seg), 0) AS BIGINT)
             AS n_boiler_segments,
           CAST(COALESCE(SUM(b.occurrences), 0) AS BIGINT)
             AS n_occurrences,
           CAST(COALESCE(SUM(b.seg_tokens), 0) AS BIGINT)
             AS tokens_removable,
           CAST(CASE WHEN s.n_tokens = 0 THEN 0
                     ELSE COALESCE(SUM(b.seg_tokens), 0) * 1000000
                          // s.n_tokens END
                AS BIGINT) AS removable_ppm
    FROM src s LEFT JOIN boiler b ON b.source = s.source
    GROUP BY s.source, s.n_docs, s.n_tokens
    """


@query(
    "q274_boilerplate_pricing",
    oracle=_boilerplate_oracle(),
    tags=("dedup", "curation", "text", "boilerplate", "observability"),
)
def q274_boilerplate_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOILERPLATE SEGMENT PRICING — the RefinedWeb/C4 in-source
    template rule, priced per source: a {SEG_TOKENS}-token segment
    that appears in >= {_BLP_MIN_DOCS} documents AND >= {_BLP_PCT}%
    of its source's documents is boilerplate (nav bars, footers,
    license headers — the furniture a domain stamps on every page),
    and a removal pass would drop ALL its occurrences, including the
    first. This is the complement of q128 (keep-first segment dedup
    targets repeated CONTENT; the in-source document-frequency rule
    targets TEMPLATES — the first occurrence of a footer is as
    worthless as the thousandth). Output per source: the boilerplate
    vocabulary size, occurrence and token totals the rule removes,
    and the removable share of the source's tokens in ppm — the
    number a curator reads before enabling the pass.

    Exactness: segments, document frequencies, occurrence counts,
    token sums, and the threshold comparison (df * 100 >= n_docs *
    {_BLP_PCT}) are pure integers/strings in both engines.

    Scale: one explode + ONE (source, segment)-keyed map-side-
    combined aggregation (the segment rides the shuffle as q128
    argues — it IS the data); source totals broadcast onto the
    segment-df frame; the priced rollup is |sources|-sized. A removal
    pass would then be one broadcast-semi-join filter over the
    corpus with the boilerplate vocabulary (benchmark q270's
    flagged-sliver posture).

    Cites reference behavior: none (beyond-reference operator).
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    t = docs.select(
        "doc_id", "source", tokens("text").alias("ts")
    ).localCheckpoint()  # one tokenization pass feeds segs AND src
    ts = F.col("ts")
    n_segs = F.greatest(
        F.ceil(F.size(ts) / F.lit(float(SEG_TOKENS))).cast("long"),
        F.lit(1).cast("long"),
    )
    segs = t.select(
        "doc_id",
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_segs - 1),
                lambda i: F.concat_ws(
                    " ", F.slice(ts, i * SEG_TOKENS + 1, SEG_TOKENS)
                ),
            )
        ).alias("seg"),
    )
    src = t.groupBy("source").agg(
        F.count_distinct("doc_id").cast("long").alias("n_docs"),
        F.sum(F.size("ts")).cast("long").alias("n_tokens"),
    )
    seg_df = segs.groupBy("source", "seg").agg(
        F.count_distinct("doc_id").cast("long").alias("df"),
        F.count(F.lit(1)).cast("long").alias("occurrences"),
        F.sum(F.size(tokens(F.col("seg")))).cast("long").alias("seg_tokens"),
    )
    boiler = seg_df.join(F.broadcast(src), "source").filter(
        (F.col("df") >= _BLP_MIN_DOCS)
        & (F.col("df") * 100 >= F.col("n_docs") * _BLP_PCT)
    )
    priced = boiler.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_boiler_segments"),
        F.sum("occurrences").cast("long").alias("n_occurrences"),
        F.sum("seg_tokens").cast("long").alias("tokens_removable"),
    )
    return src.join(priced, "source", "left").select(
        "source",
        "n_docs",
        "n_tokens",
        F.coalesce("n_boiler_segments", F.lit(0))
        .cast("long")
        .alias("n_boiler_segments"),
        F.coalesce("n_occurrences", F.lit(0))
        .cast("long")
        .alias("n_occurrences"),
        F.coalesce("tokens_removable", F.lit(0))
        .cast("long")
        .alias("tokens_removable"),
        # zero guard (q215's pattern, mirrored in the oracle): an
        # all-empty-tokenization source must read 0, not NULL in one
        # engine and a division error in the other
        F.expr(
            "case when n_tokens = 0 then 0"
            " else coalesce(tokens_removable, 0) * 1000000 div n_tokens end"
        )
        .cast("long")
        .alias("removable_ppm"),
    )


# ---------------------------------------------------------------------------
# L2s: survivor-policy delta — keep-BEST vs keep-FIRST per dedup
# cluster (the representative-selection choice every dedup pipeline
# makes, priced instead of defaulted)
# ---------------------------------------------------------------------------


@query(
    "q283_survivor_policy_delta",
    oracle=f"""
    WITH RECURSIVE {_LSH_PAIRS_SQL},
    undirected AS (
      SELECT doc_a, doc_b FROM pairs
      UNION ALL
      SELECT doc_b, doc_a FROM pairs
    ),
    reach (src, dst) AS (
      SELECT doc_a, doc_b FROM undirected
      UNION
      SELECT r.src, u.doc_b
      FROM reach r JOIN undirected u ON u.doc_a = r.dst
    ),
    clustered AS (
      SELECT d.doc_id,
             least(d.doc_id,
                   coalesce((SELECT MIN(r.dst) FROM reach r
                             WHERE r.src = d.doc_id), d.doc_id)) AS cluster,
             CAST(len({_TOK}) AS BIGINT) AS n_toks,
             CAST(len(list_distinct({_TOK})) AS BIGINT) AS n_unique
      FROM documents d
    ),
    ranked AS (
      SELECT *,
             row_number() OVER (PARTITION BY cluster
                                ORDER BY n_unique DESC, doc_id) AS q_rn,
             row_number() OVER (PARTITION BY cluster
                                ORDER BY doc_id) AS m_rn,
             COUNT(*) OVER (PARTITION BY cluster) AS csize
      FROM clustered
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN m_rn = 1 THEN 1 END) AS BIGINT)
             AS n_clusters,
           CAST(COALESCE(SUM(CASE WHEN m_rn = 1 AND csize > 1
                             THEN 1 END), 0) AS BIGINT)
             AS n_multi_clusters,
           CAST(COALESCE(SUM(CASE WHEN q_rn = 1 AND m_rn <> 1
                             THEN 1 END), 0) AS BIGINT) AS n_switched,
           CAST(SUM(CASE WHEN m_rn = 1 THEN n_toks END) AS BIGINT)
             AS tokens_kept_minid,
           CAST(SUM(CASE WHEN q_rn = 1 THEN n_toks END) AS BIGINT)
             AS tokens_kept_quality,
           CAST(SUM(CASE WHEN m_rn = 1 THEN n_unique END) AS BIGINT)
             AS unique_kept_minid,
           CAST(SUM(CASE WHEN q_rn = 1 THEN n_unique END) AS BIGINT)
             AS unique_kept_quality,
           CAST((SUM(CASE WHEN q_rn = 1 THEN n_unique END)
                 - SUM(CASE WHEN m_rn = 1 THEN n_unique END)) * 1000000
                // greatest(SUM(CASE WHEN m_rn = 1 THEN n_unique END), 1)
             AS BIGINT) AS unique_gain_ppm
    FROM ranked
    """,
    tags=("dedup", "graph", "curation", "observability"),
)
def q283_survivor_policy_delta(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SURVIVOR-POLICY DELTA — pricing the representative-selection
    choice instead of defaulting it: q85's clusters are resolved
    under BOTH survivor rules — keep-FIRST (min doc_id; q40/q207's
    deterministic default) and keep-BEST (max distinct-token count,
    tie min doc_id — the information-richest duplicate, the rule
    quality-aware pipelines actually want) — and the one-row readout
    prices the difference: clusters whose keeper switches, tokens and
    distinct-token mass kept under each rule, and the quality rule's
    distinct-token gain in ppm. unique_gain_ppm >= 0 by construction
    (the quality rule maximizes per cluster); a near-zero gain says
    min-id is fine and the simpler rule wins.

    Exactness: the cluster labels are the unique min-label fixpoint
    (q85's semantics in both engines); keepers are deterministic
    row_number rules with pinned tie-breaks; all sums and the ppm
    division are integers.

    Scale: a SINGLETON BYPASS — components are resolved over the pair
    ENDPOINTS only (every endpoint's cluster has >= 2 docs by
    construction, every other doc is its own keeper under both
    policies), so the survivor windows shuffle the |paired docs|
    frame, not the corpus; the untouched majority collapses in one
    map-side aggregate and the two partial readouts add up. At 100 TB
    the cluster-keyed exchange carries only the duplicate-touched
    sliver.

    Cites reference behavior: none (beyond-reference operator).
    """
    docs = load_table(spark, sf_dir, "documents")
    sig = minhash_signatures(docs)
    pairs = lsh_candidate_pairs(sig).localCheckpoint(eager=True)
    clustered = paired_component_labels(pairs)
    stats = docs.select("doc_id", tokens("text").alias("_toks")).select(
        "doc_id",
        F.size("_toks").cast("long").alias("n_toks"),
        F.size(F.array_distinct("_toks")).cast("long").alias("n_unique"),
    )
    # cluster is NULL exactly for the singleton docs (pairs have
    # distinct endpoints, so every labeled doc sits in a >=2 cluster)
    base = stats.join(clustered, "doc_id", "left").localCheckpoint(
        eager=False
    )  # feeds the window branch + the singleton aggregate
    w_q = Window.partitionBy("cluster").orderBy(
        F.col("n_unique").desc(), "doc_id"
    )
    w_m = Window.partitionBy("cluster").orderBy("doc_id")
    w_c = Window.partitionBy("cluster")
    ranked = base.filter(F.col("cluster").isNotNull()).select(
        "n_toks",
        "n_unique",
        F.row_number().over(w_q).alias("q_rn"),
        F.row_number().over(w_m).alias("m_rn"),
        F.count(F.lit(1)).over(w_c).alias("csize"),
    )
    m1 = F.col("m_rn") == 1
    q1 = F.col("q_rn") == 1
    agg_p = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("p_docs"),
        F.count(F.when(m1, 1)).cast("long").alias("p_clusters"),
        F.count(F.when(m1 & (F.col("csize") > 1), 1))
        .cast("long")
        .alias("p_multi"),
        F.count(F.when(q1 & ~m1, 1)).cast("long").alias("p_switched"),
        F.coalesce(F.sum(F.when(m1, F.col("n_toks"))), F.lit(0))
        .cast("long")
        .alias("p_tok_m"),
        F.coalesce(F.sum(F.when(q1, F.col("n_toks"))), F.lit(0))
        .cast("long")
        .alias("p_tok_q"),
        F.coalesce(F.sum(F.when(m1, F.col("n_unique"))), F.lit(0))
        .cast("long")
        .alias("p_unq_m"),
        F.coalesce(F.sum(F.when(q1, F.col("n_unique"))), F.lit(0))
        .cast("long")
        .alias("p_unq_q"),
    )
    # singletons: keeper under BOTH policies is the doc itself —
    # csize = 1, m_rn = q_rn = 1 — so the contribution is a plain sum
    agg_s = base.filter(F.col("cluster").isNull()).agg(
        F.count(F.lit(1)).cast("long").alias("s_docs"),
        F.coalesce(F.sum("n_toks"), F.lit(0)).cast("long").alias("s_tok"),
        F.coalesce(F.sum("n_unique"), F.lit(0))
        .cast("long")
        .alias("s_unq"),
    )
    n_docs = F.col("p_docs") + F.col("s_docs")
    # an empty corpus reads NULL sums (the oracle's SUM over zero
    # rows); a populated one adds the two partials
    total = lambda p, s: F.when(n_docs > 0, F.col(p) + F.col(s))  # noqa: E731
    return agg_p.crossJoin(F.broadcast(agg_s)).select(
        n_docs.cast("long").alias("n_docs"),
        F.when(n_docs > 0, F.col("p_clusters") + F.col("s_docs"))
        .cast("long")
        .alias("n_clusters"),
        F.col("p_multi").alias("n_multi_clusters"),
        F.col("p_switched").alias("n_switched"),
        total("p_tok_m", "s_tok").cast("long").alias("tokens_kept_minid"),
        total("p_tok_q", "s_tok").cast("long").alias("tokens_kept_quality"),
        total("p_unq_m", "s_unq").cast("long").alias("unique_kept_minid"),
        total("p_unq_q", "s_unq").cast("long").alias("unique_kept_quality"),
        F.when(
            n_docs > 0,
            F.expr(
                "(p_unq_q - p_unq_m) * 1000000"
                " div greatest(p_unq_m + s_unq, 1)"
            ),
        )
        .cast("long")
        .alias("unique_gain_ppm"),
    )


# ---------------------------------------------------------------------------
# L2f: winnowing fingerprints (Schleimer/Wilkerson/Aiken, MOSS) —
# guaranteed-density document fingerprinting + the plagiarism-style
# shared-fingerprint pair join
# ---------------------------------------------------------------------------

_WIN_W = 4  # winnowing window: any match of >= W + gram - 1 tokens is caught
_WIN_NGRAM = 3  # gram width (the family's shingle width)
# Fingerprint hashes selected by more distinct docs than this are
# boilerplate (the corpus's stock phrases) and would re-create the
# quadratic hot-bucket pair space q43 suppresses; the cap bounds every
# bucket's pair fan-out at _WIN_DF_CAP^2.
_WIN_DF_CAP = 16

_WIN_SEL_SQL = f"""
    d AS (
      SELECT doc_id, source, {shingles_sql(_TOK, _WIN_NGRAM)} AS grams
      FROM documents WHERE len({_TOK}) > 0
    ),
    g AS (
      SELECT doc_id, source, i - 1 AS pos,
             {md5_hash32_sql('grams[i]')} AS h
      FROM d, unnest(generate_series(1, len(grams))) AS t(i)
    ),
    w AS (
      SELECT doc_id, source, pos,
             min({{'h': h, 'np': -pos}}) OVER (
                 PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN CURRENT ROW AND {_WIN_W - 1} FOLLOWING) AS m,
             count(*) OVER (
                 PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN CURRENT ROW AND {_WIN_W - 1} FOLLOWING) AS cnt
      FROM g
    ),
    sel AS (
      SELECT DISTINCT doc_id, source, m.h AS fp_h, -m.np AS fp_pos
      FROM w WHERE cnt = {_WIN_W} OR (pos = 0 AND cnt < {_WIN_W})
    )
"""


def _winnowed_fps(
    spark: SparkSession, sf_dir: str, with_pos: bool = True
) -> DataFrame:
    """(doc_id, source, fp_h[, fp_pos]) — the winnowed fingerprint
    set: in every window of {_WIN_W} consecutive gram hashes select
    the minimum (rightmost on ties), dedup selections shared by
    adjacent windows. Short docs (< {_WIN_W} grams) keep their global
    minimum. The guarantee the density tests pin: at least one
    selection per window (no gap longer than {_WIN_W}), so any shared
    run of {_WIN_W + _WIN_NGRAM - 1} tokens yields a shared
    fingerprint.

    ``with_pos=False`` drops the position column BEFORE the distinct,
    so consumers that match on hash only (q293) dedupe straight to
    (doc, hash) in ONE shuffle instead of carrying positions through
    a wider distinct and deduping again. ``with_pos=True`` also
    carries ``n_grams`` (functionally dependent on doc_id — the
    distinct's cardinality is unchanged) so q292's density table
    needs no second corpus scan."""
    from target_hdfs_spark.sources.readers import fan_out

    d = (
        fan_out(
            load_table(spark, sf_dir, "documents").select(
                "doc_id", "source", "text"
            ),
            "doc_id",
        )
        .select("doc_id", "source", tokens("text").alias("toks"))
        .filter(F.size("toks") > 0)
    )
    g = d.select(
        "doc_id",
        "source",
        F.greatest(
            F.size("toks") - F.lit(_WIN_NGRAM - 1), F.lit(1)
        ).cast("long").alias("n_grams"),
        F.posexplode(shingles(F.col("toks"), _WIN_NGRAM)).alias("pos", "gram"),
    ).select(
        "doc_id", "source", "n_grams", "pos", md5_hash32("gram").alias("h")
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, _WIN_W - 1)
    )
    return (
        g.select(
            "doc_id",
            "source",
            "n_grams",
            "pos",
            F.min(
                F.struct(
                    F.col("h").alias("h"), (-F.col("pos")).alias("np")
                )
            )
            .over(w)
            .alias("m"),
            F.count(F.lit(1)).over(w).alias("cnt"),
        )
        .filter(
            (F.col("cnt") == _WIN_W)
            | ((F.col("pos") == 0) & (F.col("cnt") < _WIN_W))
        )
        .select(
            "doc_id",
            "source",
            F.col("m.h").alias("fp_h"),
            *(
                [
                    (-F.col("m.np")).alias("fp_pos"),
                    F.col("n_grams"),
                ]
                if with_pos
                else []
            ),
        )
        .distinct()
    )


@query(
    "q292_winnowing_fingerprints",
    oracle=f"""
    WITH {_WIN_SEL_SQL},
    per_doc AS (
      SELECT s.doc_id, s.source, COUNT(*) AS fps, any_value(n.n_grams) AS n_grams
      FROM sel s JOIN (SELECT doc_id, len(grams) AS n_grams FROM d) n
        ON s.doc_id = n.doc_id
      GROUP BY s.doc_id, s.source
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_grams) AS BIGINT) AS total_grams,
           CAST(SUM(fps) AS BIGINT) AS total_fps,
           CAST(SUM(CAST(fps AS HUGEINT)) * 1000000 // SUM(n_grams)
               AS BIGINT) AS density_ppm,
           CAST(MIN(fps * 1000000 // n_grams) AS BIGINT)
               AS min_doc_density_ppm,
           CAST(MAX(fps * 1000000 // n_grams) AS BIGINT)
               AS max_doc_density_ppm
    FROM per_doc GROUP BY source
    """,
    tags=("dedup", "fingerprint", "winnowing"),
)
def q292_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINNOWING fingerprint density per source (Schleimer et al.
    2003, the MOSS algorithm): each doc's gram-hash sequence is
    winnowed — min hash per {_WIN_W}-window, rightmost on ties,
    adjacent-window duplicates collapsed — giving a fingerprint set
    with a GUARANTEED detection property (any shared token run of
    length >= {_WIN_W + _WIN_NGRAM - 1} produces a shared
    fingerprint) at a bounded density (expected 2/(W+1) of grams,
    never less than 1/W on full windows). This is the principled
    alternative to q55's fixed-rate mod-p fingerprints: same storage
    knob, but with a correctness guarantee instead of a sampling
    rate. Output: per-source fingerprint economics (total and
    per-doc density bounds) — the table that sizes a fingerprint
    index before building q293's pair join.

    Scale: one tokenize+shingle pass; the winnow is a PARTITIONED
    window (per doc — never global); the rollup is |sources| rows.
    The doc-sized distinct is the only shuffle after the window."""
    sel = _winnowed_fps(spark, sf_dir)
    # n_grams rides the fingerprint frame (functionally dependent on
    # doc_id), so the density table needs no second corpus scan
    per_doc = sel.groupBy("doc_id", "source", "n_grams").agg(
        F.count(F.lit(1)).cast("long").alias("fps")
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_grams").cast("long").alias("total_grams"),
        F.sum("fps").cast("long").alias("total_fps"),
        F.expr(
            "CAST(SUM(CAST(fps AS DECIMAL(38,0))) * 1000000"
            " div SUM(n_grams) AS BIGINT)"
        ).alias("density_ppm"),
        F.min(F.expr("fps * 1000000 div n_grams"))
        .cast("long")
        .alias("min_doc_density_ppm"),
        F.max(F.expr("fps * 1000000 div n_grams"))
        .cast("long")
        .alias("max_doc_density_ppm"),
    )


@query(
    "q293_winnowing_pairs",
    oracle=f"""
    WITH {_WIN_SEL_SQL},
    dfp AS (
      SELECT DISTINCT doc_id, fp_h FROM sel
      WHERE fp_h IN (
        SELECT fp_h FROM (
          SELECT fp_h, COUNT(DISTINCT doc_id) AS df FROM sel GROUP BY fp_h
        ) WHERE df <= {_WIN_DF_CAP}
      )
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_fp FROM dfp GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(*) AS BIGINT) AS shared_fps
      FROM dfp a JOIN dfp b ON a.fp_h = b.fp_h AND a.doc_id < b.doc_id
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )
    SELECT p.doc_a, p.doc_b, p.shared_fps,
           CAST(p.shared_fps * 1000000
                // (sa.n_fp + sb.n_fp - p.shared_fps) AS BIGINT)
               AS winnow_jaccard_ppm
    FROM pairs p
    JOIN sizes sa ON p.doc_a = sa.doc_id
    JOIN sizes sb ON p.doc_b = sb.doc_id
    """,
    tags=("dedup", "fingerprint", "winnowing", "join"),
)
def q293_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-winnowed-fingerprint candidate pairs — the MOSS match
    step: docs sharing >= 2 surviving fingerprints, scored by the
    winnowed-set Jaccard (shared / union, exact integers in ppm).
    Because winnowing guarantees a fingerprint in every
    {_WIN_W}-window, every pair sharing a run of >=
    {_WIN_W + _WIN_NGRAM - 1} tokens of non-boilerplate text appears
    here — a detection GUARANTEE minhash (q43) can only give in
    expectation.

    Scale: the pair space is bounded by construction — fingerprints
    selected by more than {_WIN_DF_CAP} docs are dropped as
    boilerplate BEFORE the self-join (the q43 hot-bucket discipline),
    so every fingerprint bucket fans out at most {_WIN_DF_CAP}^2
    pairs; the join key is the fingerprint hash (uniform by md5).
    The sizes frame is doc-sized; both joins after the pair agg are
    on the |pairs| frame."""
    # hash-only fingerprints: (doc, h) is already distinct, so the
    # df count is a plain COUNT and the semi join needs no re-dedupe
    sel = _winnowed_fps(spark, sf_dir, with_pos=False).localCheckpoint(
        eager=False
    )
    df_cap = (
        sel.groupBy("fp_h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= _WIN_DF_CAP)
        .select("fp_h")
    )
    dfp = (
        sel.join(df_cap, "fp_h", "left_semi")
        .select("doc_id", "fp_h")
        .localCheckpoint(eager=False)  # feeds sizes AND both join sides
    )
    sizes = dfp.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fp"))
    a = dfp.select(F.col("doc_id").alias("doc_a"), "fp_h")
    b = dfp.select(F.col("doc_id").alias("doc_b"), "fp_h")
    pairs = (
        a.join(b, "fp_h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fps"))
        .filter(F.col("shared_fps") >= 2)
    )
    return (
        pairs.join(
            sizes.select(
                F.col("doc_id").alias("doc_a"), F.col("n_fp").alias("na")
            ),
            "doc_a",
        )
        .join(
            sizes.select(
                F.col("doc_id").alias("doc_b"), F.col("n_fp").alias("nb")
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "shared_fps",
            F.expr(
                "CAST(shared_fps * 1000000"
                " div (na + nb - shared_fps) AS BIGINT)"
            ).alias("winnow_jaccard_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# L1d: cross-split duplicate leakage — the eval-integrity audit a naive
# hash split needs (q171 fixes assignment; this measures the damage)
# ---------------------------------------------------------------------------

_SPLIT_RULE_SQL = (
    "CASE WHEN {h} % 100 < 80 THEN 'train' "
    "WHEN {h} % 100 < 90 THEN 'val' ELSE 'test' END"
).format(h=md5_hash32_sql("'split:' || CAST(doc_id AS VARCHAR)"))


@query(
    "q298_split_leakage_audit",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, {_SPLIT_RULE_SQL} AS split,
             {md5_hash32_sql('text')} AS h
      FROM documents
    ),
    c AS (
      SELECT h,
             SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS n_train,
             SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS n_val,
             SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS n_test
      FROM d GROUP BY h
    ),
    a AS (
      SELECT CAST(SUM(n_val) AS HUGEINT) AS tot_val,
             CAST(SUM(n_test) AS HUGEINT) AS tot_test,
             CAST(SUM(CASE WHEN n_train > 0 AND n_val > 0 THEN 1 ELSE 0
                 END) AS BIGINT) AS span_tv,
             CAST(SUM(CASE WHEN n_train > 0 AND n_test > 0 THEN 1 ELSE 0
                 END) AS BIGINT) AS span_tt,
             CAST(SUM(CASE WHEN n_val > 0 AND n_test > 0 THEN 1 ELSE 0
                 END) AS BIGINT) AS span_vt,
             CAST(SUM(CASE WHEN n_train > 0 THEN n_val ELSE 0 END)
                 AS HUGEINT) AS leak_tv,
             CAST(SUM(CASE WHEN n_train > 0 THEN n_test ELSE 0 END)
                 AS HUGEINT) AS leak_tt,
             CAST(SUM(CASE WHEN n_val > 0 THEN n_test ELSE 0 END)
                 AS HUGEINT) AS leak_vt
      FROM c
    ),
    p AS (
      SELECT 'train' AS split_a, 'val' AS split_b, span_tv AS
             n_spanning_clusters, leak_tv AS lk, tot_val AS tot FROM a
      UNION ALL SELECT 'train', 'test', span_tt, leak_tt, tot_test FROM a
      UNION ALL SELECT 'val', 'test', span_vt, leak_vt, tot_test FROM a
    )
    SELECT split_a, split_b, n_spanning_clusters,
           CAST(lk AS BIGINT) AS leaked_docs,
           CAST(tot AS BIGINT) AS eval_docs,
           CAST(lk * 1000000 // greatest(tot, 1) AS BIGINT) AS leak_ppm
    FROM p
    """,
    tags=("dedup", "split", "leakage"),
)
def q298_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-SPLIT DUPLICATE LEAKAGE under q100's naive 80/10/10 hash
    split: for each split pair, how many exact-duplicate content
    clusters straddle the boundary and how many eval-side documents
    are "leaked" (their text also appears on the other side) — the
    number that silently inflates every eval metric trained on the
    split. q171's cluster-aware split exists precisely to zero this
    table; this query MEASURES what the naive split costs, so the
    choice between them is priced, not assumed.

    Scale: one scan computes (split, content-hash) map-side; one
    |distinct texts|-sized hash aggregation; ONE further 1-row
    aggregation carries all six spanning/leak counters (totals
    derived in the same pass — no second corpus scan); the 3-row
    pair table is pure arithmetic on that row. HUGEINT/DECIMAL
    through the ppm products."""
    from target_hdfs_spark.sources.readers import fan_out

    bucket = (
        md5_hash32(
            F.concat(F.lit("split:"), F.col("doc_id").cast("string"))
        )
        % 100
    )
    split = (
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
    )
    d = fan_out(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        "doc_id",
    ).select(split.alias("split"), md5_hash32("text").alias("h"))
    c = d.groupBy("h").agg(
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias(
            "n_train"
        ),
        F.sum(F.when(F.col("split") == "val", 1).otherwise(0)).alias(
            "n_val"
        ),
        F.sum(F.when(F.col("split") == "test", 1).otherwise(0)).alias(
            "n_test"
        ),
    )
    dec = "decimal(38,0)"
    a = c.agg(
        F.sum("n_val").cast(dec).alias("tot_val"),
        F.sum("n_test").cast(dec).alias("tot_test"),
        F.sum(
            F.when((F.col("n_train") > 0) & (F.col("n_val") > 0), 1)
            .otherwise(0)
        ).cast("long").alias("span_tv"),
        F.sum(
            F.when((F.col("n_train") > 0) & (F.col("n_test") > 0), 1)
            .otherwise(0)
        ).cast("long").alias("span_tt"),
        F.sum(
            F.when((F.col("n_val") > 0) & (F.col("n_test") > 0), 1)
            .otherwise(0)
        ).cast("long").alias("span_vt"),
        F.sum(
            F.when(F.col("n_train") > 0, F.col("n_val")).otherwise(0)
        ).cast(dec).alias("leak_tv"),
        F.sum(
            F.when(F.col("n_train") > 0, F.col("n_test")).otherwise(0)
        ).cast(dec).alias("leak_tt"),
        F.sum(
            F.when(F.col("n_val") > 0, F.col("n_test")).otherwise(0)
        ).cast(dec).alias("leak_vt"),
    )
    p = a.select(
        F.expr(
            "stack(3,"
            " 'train', 'val', span_tv, leak_tv, tot_val,"
            " 'train', 'test', span_tt, leak_tt, tot_test,"
            " 'val', 'test', span_vt, leak_vt, tot_test)"
            " AS (split_a, split_b, n_spanning_clusters, lk, tot)"
        )
    )
    return p.select(
        "split_a",
        "split_b",
        "n_spanning_clusters",
        F.col("lk").cast("long").alias("leaked_docs"),
        F.col("tot").cast("long").alias("eval_docs"),
        F.expr(
            "CAST(lk * 1000000 div greatest(tot,"
            " CAST(1 AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("leak_ppm"),
    )


@query(
    "q299_neardup_split_leakage",
    oracle=f"""
    WITH {_LSH_PAIRS_SQL},
    doc_shingles AS (
      SELECT DISTINCT doc_id, unnest({shingles_sql(_TOK)}) AS shingle
      FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM doc_shingles
              GROUP BY doc_id),
    common AS (
      SELECT p.doc_a, p.doc_b, COUNT(*) AS n_common
      FROM pairs p
      JOIN doc_shingles sa ON sa.doc_id = p.doc_a
      JOIN doc_shingles sb ON sb.doc_id = p.doc_b
           AND sb.shingle = sa.shingle
      GROUP BY 1, 2
    ),
    verified AS (
      SELECT c.doc_a, c.doc_b FROM common c
      JOIN sizes za ON za.doc_id = c.doc_a
      JOIN sizes zb ON zb.doc_id = c.doc_b
      WHERE c.n_common * 5 >= (za.n_sh + zb.n_sh - c.n_common)
    ),
    cat AS (
      SELECT least(
               {_SPLIT_RULE_SQL.replace("doc_id", "doc_a")},
               {_SPLIT_RULE_SQL.replace("doc_id", "doc_b")}
             ) AS split_x,
             greatest(
               {_SPLIT_RULE_SQL.replace("doc_id", "doc_a")},
               {_SPLIT_RULE_SQL.replace("doc_id", "doc_b")}
             ) AS split_y
      FROM verified
    ),
    g AS (
      SELECT split_x, split_y, CAST(COUNT(*) AS HUGEINT) AS n_pairs
      FROM cat GROUP BY split_x, split_y
    )
    SELECT split_x, split_y,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(CASE WHEN split_x = split_y THEN 0 ELSE 1 END AS BIGINT)
               AS is_leak,
           CAST(n_pairs * 1000000 // SUM(n_pairs) OVER () AS BIGINT)
               AS pair_share_ppm
    FROM g
    """,
    tags=("dedup", "split", "leakage", "minhash"),
)
def q299_neardup_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-dup leakage across the naive hash split — the stronger
    form of q298's audit: exact-verified near-duplicate pairs (LSH
    candidates, shingle-Jaccard >= 0.2 — the q92 production pipeline
    with the threshold compared in exact integers) classified by the
    split pair of their endpoints. A pair with is_leak = 1 is a
    test/val document whose near-copy sits in another split: the
    contamination n-gram decontamination (q101/q260) and exact-dup
    audits (q298) both MISS, and precisely what a cluster-aware
    split (q171) prevents. The within-split rows complete the
    denominator: pair_share_ppm says how the corpus's near-dup mass
    distributes across the split grid.

    Scale: rides the q92 shape end-to-end (bucketed LSH candidates,
    hot-bucket star-linking, candidate-only verification); the split
    label is a pure doc_id function attached map-side (no join), the
    rollup is <= 6 rows, and the share window runs on that frame
    (GLOBAL_WINDOW_BOUNDS waiver)."""
    docs = load_table(spark, sf_dir, "documents")
    sets, _sig, pairs = lsh_verify_base(docs)
    counts = pair_overlap_counts_sets(pairs, sets)
    verified = counts.filter(
        F.col("n_common") * 5
        >= (F.col("na") + F.col("nb") - F.col("n_common"))
    )

    def split_of(col: str):
        bucket = (
            md5_hash32(
                F.concat(F.lit("split:"), F.col(col).cast("string"))
            )
            % 100
        )
        return (
            F.when(bucket < 80, "train")
            .when(bucket < 90, "val")
            .otherwise("test")
        )

    cat = verified.select(
        F.least(split_of("doc_a"), split_of("doc_b")).alias("split_x"),
        F.greatest(split_of("doc_a"), split_of("doc_b")).alias("split_y"),
    )
    g = cat.groupBy("split_x", "split_y").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n_pairs")
    )
    return g.select(
        "split_x",
        "split_y",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.when(F.col("split_x") == F.col("split_y"), 0)
        .otherwise(1)
        .cast("long")
        .alias("is_leak"),
        F.expr(
            "CAST(n_pairs * 1000000 div SUM(n_pairs) OVER () AS BIGINT)"
        ).alias("pair_share_ppm"),
    )
