"""Similarity search over embedding columns (SURVEY.md §2B.2 L3):
brute-force cosine top-k as the exact baseline, and a deterministic
sign-random-projection LSH bucketing as the scale path.

Float determinism: embeddings are float32; both engines cast to
double (exact) and reduce with a *sequential left fold* —
``F.aggregate`` in Spark, ``list_reduce`` in DuckDB — so every
intermediate IEEE operation happens in the same order and the cosine
values match bit-for-bit. No UDFs anywhere: array expressions are
JVM-side and codegen-friendly.

Scale notes:
- brute force is O(n_queries * n_corpus) — correct baseline, priced
  accordingly; the broadcast keeps the corpus scan shuffle-free.
- LSH buckets cut the candidate space to colliding buckets; at 100 TB
  add more planes (smaller buckets) and multiple tables (recall).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from target_hdfs_spark.registry import query
from target_hdfs_spark.sources.readers import load_table

EMB_DIM = 64
# SRP bucket width IS the scale knob for every bucketed-cosine
# operator (q47/q48/q130/q132): expected bucket occupancy is
# n / 2^N_PLANES, and the bucket self-joins are quadratic in
# occupancy, so the plane count must grow ~log2(n) to hold per-bucket
# work constant. Read from the environment AT IMPORT so the Spark
# expressions and the generated oracle SQL always agree (default 8 =
# the correctness-gate setting; scripts/scale_experiment.py sweeps
# larger corpora with proportionally more planes).
N_PLANES = int(os.environ.get("SPARK_GRAFT_SRP_PLANES", "8"))
_KNUTH = 2654435761


def _plane_signs(plane: int, dim: int = EMB_DIM) -> list[int]:
    """Deterministic +-1 hyperplane components (engine-agnostic integer
    recurrence — reproduced literally in the oracle SQL)."""
    return [
        1 if ((plane * 1000003 + j) * _KNUTH) % 4294967296 < 2147483648 else -1
        for j in range(dim)
    ]


def dot_fold(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two double arrays (order-stable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def as_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def cosine(a: Column, b: Column) -> Column:
    return dot_fold(a, b) / (
        F.sqrt(dot_fold(a, a)) * F.sqrt(dot_fold(b, b))
    )


def _load_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, v) corpus, hash-fanned-out across cores before the
    fold-heavy vector math — a single-row-group input would otherwise
    run every distance computation on one task (readers.fan_out)."""
    from target_hdfs_spark.sources.readers import fan_out

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array("embedding").alias("v")
    )
    return fan_out(emb, "vec_id")


def _load_query_vectors(
    spark: SparkSession, sf_dir: str, k: int = 5
) -> DataFrame:
    """(vec_id, v) for vec_id < k, UN-fanned: the predicate pushes to
    the parquet scan and the <= k-row frame goes straight to its
    broadcast build. Query-side frames must not ride the corpus
    ``fan_out`` — hash-redistributing a handful of rows across every
    core adds a full 32-task exchange stage (and a second scan
    subtree) ahead of a broadcast of ~5 rows."""
    return load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < k
    ).select("vec_id", as_double_array("embedding").alias("v"))


_DOT_SQL = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
    "list_transform(list_zip({a}, {b}), p -> p[1] * p[2])), (acc, x) -> acc + x)"
)


def _cos_sql(a: str, b: str) -> str:
    return (
        f"{_DOT_SQL.format(a=a, b=b)} / "
        f"(sqrt({_DOT_SQL.format(a=a, b=a)}) * sqrt({_DOT_SQL.format(a=b, b=b)}))"
    )


# ---------------------------------------------------------------------------
# L3a: brute-force cosine top-k
# ---------------------------------------------------------------------------


@query(
    "q46_cosine_topk",
    oracle=f"""
    WITH emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, e.vec_id,
             {_cos_sql('q.qv', 'e.v')} AS cos_sim
      FROM q JOIN emb e ON e.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, cos_sim, rn
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, vec_id
      ) AS rn
      FROM scored
    )
    WHERE rn <= 5
    """,
    tags=("similarity", "ann", "topk"),
)
def q46_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for 5 query vectors against the
    whole corpus (brute force baseline).

    Scale: query vectors are broadcast, so the corpus streams through
    map-side; rank<=k avoids a global sort. 100 TB path is q47.
    """
    emb = _load_vectors(spark, sf_dir)
    queries = _load_query_vectors(spark, sf_dir).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        emb.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            cosine(F.col("qv"), F.col("v")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5)


# ---------------------------------------------------------------------------
# L3b: sign-random-projection LSH bucketed ANN (the scale path)
# ---------------------------------------------------------------------------


def _bucket_sql(vec: str) -> str:
    bits = []
    for p in range(N_PLANES):
        plane = ", ".join(f"CAST({s} AS DOUBLE)" for s in _plane_signs(p))
        bits.append(
            f"CASE WHEN {_DOT_SQL.format(a=vec, b=f'[{plane}]')} >= 0 "
            f"THEN '1' ELSE '0' END"
        )
    return "concat(" + ", ".join(bits) + ")"


def lsh_bucket(vec: Column) -> Column:
    """8-bit sign-random-projection bucket key for a double array."""
    bits = []
    for p in range(N_PLANES):
        plane = F.array(*[F.lit(float(s)) for s in _plane_signs(p)])
        bits.append(F.when(dot_fold(vec, plane) >= 0, "1").otherwise("0"))
    return F.concat(*bits)


@query(
    "q47_ann_lsh_bucketed",
    oracle=f"""
    WITH emb AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
             {_bucket_sql('CAST(embedding AS DOUBLE[])')} AS bucket
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM emb WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, e.vec_id,
             {_cos_sql('q.qv', 'e.v')} AS cos_sim
      FROM q JOIN emb e ON e.bucket = q.bucket AND e.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, cos_sim, rn
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, vec_id
      ) AS rn
      FROM scored
    )
    WHERE rn <= 3
    """,
    tags=("similarity", "ann", "lsh"),
)
def q47_ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate nearest neighbors: candidates restricted to the
    query's sign-random-projection bucket (8 deterministic
    hyperplanes), exact cosine within the bucket, top-3.

    Scale: the bucket join is an equi-join on an 8-bit key — the
    candidate set shrinks ~2^8 versus brute force; recall is tuned
    with plane count / multiple hash tables. Everything stays
    JVM-side and shuffle-minimal.
    """
    emb = _load_vectors(spark, sf_dir)
    emb = emb.withColumn("bucket", lsh_bucket(F.col("v")))
    queries = _load_query_vectors(spark, sf_dir).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        lsh_bucket(F.col("v")).alias("qbucket"),
    )
    scored = (
        emb.join(
            F.broadcast(queries),
            (F.col("bucket") == F.col("qbucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            "vec_id",
            cosine(F.col("qv"), F.col("v")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)


# ---------------------------------------------------------------------------
# L3c: embedding-cosine near-duplicate pairs (dedup by embedding)
# ---------------------------------------------------------------------------


@query(
    "q48_embedding_neardup_pairs",
    oracle=f"""
    WITH emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             {_bucket_sql('CAST(embedding AS DOUBLE[])')} AS bucket
      FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           {_cos_sql('a.v', 'b.v')} AS cos_sim
    FROM emb a JOIN emb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE {_cos_sql('a.v', 'b.v')} >= 0.25
    """,
    tags=("similarity", "dedup", "lsh"),
)
def q48_embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space near-duplicate pairs: LSH-bucketed candidate
    generation, exact cosine filter at 0.25 (tuned to this corpus's cosine
    distribution, p99~0.29) — the embedding analog of
    MinHash+verify for text (same bucket -> candidate -> exact check).
    """
    emb = _load_vectors(spark, sf_dir)
    emb = emb.withColumn("bucket", lsh_bucket(F.col("v")))
    a = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("bucket").alias("ba")
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("bucket").alias("bb")
    )
    return (
        a.join(b, (F.col("ba") == F.col("bb")) & (F.col("vec_a") < F.col("vec_b")))
        .select("vec_a", "vec_b", cosine(F.col("va"), F.col("vb")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.25)
    )


# ---------------------------------------------------------------------------
# L3d/L5: vector statistics (norms per label — exact fold arithmetic)
# ---------------------------------------------------------------------------


@query(
    "q49_embedding_norms",
    oracle=f"""
    WITH emb AS (
      SELECT label,
             sqrt({_DOT_SQL.format(a='CAST(embedding AS DOUBLE[])',
                                   b='CAST(embedding AS DOUBLE[])')}) AS norm
      FROM embeddings
    )
    SELECT label, COUNT(*) AS n_vectors,
           MIN(norm) AS min_norm, MAX(norm) AS max_norm
    FROM emb GROUP BY label
    """,
    tags=("similarity", "vector", "agg"),
)
def q49_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector-norm profile: count + min/max L2 norm.
    min/max of doubles are exact (no accumulation), so the whole
    result is bit-deterministic; a mean would need the decimal route.

    Scale: map-only norm computation, one tiny groupBy(label) shuffle.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "label", F.sqrt(dot_fold(as_double_array("embedding"),
                                 as_double_array("embedding"))).alias("norm")
    )
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.min("norm").alias("min_norm"),
        F.max("norm").alias("max_norm"),
    )


# ---------------------------------------------------------------------------
# L3e: IVF-style ANN (coarse quantizer + in-cell search — the other
# classic scale path besides LSH)
# ---------------------------------------------------------------------------

N_CENTROIDS = 16
_IVF_TOPK = 3

_ASSIGN_SQL = f"""
    emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    cent AS (
      SELECT vec_id AS cid, v AS cv FROM emb WHERE vec_id < {N_CENTROIDS}
    ),
    assign AS (
      SELECT e.vec_id, e.v, c.cid,
             row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY {_DOT_SQL.format(a='e.v', b='c.cv')} DESC, c.cid
             ) AS crn
      FROM emb e CROSS JOIN cent c
    ),
    cells AS (
      SELECT vec_id, v, cid AS cell FROM assign WHERE crn = 1
    )
"""



def _ivf_assign(emb: DataFrame, cent: DataFrame | None = None) -> DataFrame:
    """(vec_id, v, cid, dot, crn) — every vector scored against the
    fixed IVF codebook (centroids := first N_CENTROIDS vectors), with
    crn ranking the centroids per vector (crn=1 is the cell
    assignment). Single implementation behind q63 / q70 / q71.

    ``cent`` lets the caller supply the N_CENTROIDS-row centroid
    frame from an UN-fanned pushed-down scan; by default it is sliced
    from ``emb`` (which, when emb is the fanned corpus, replays the
    corpus scan + fan_out exchange for a 16-row broadcast side)."""
    if cent is None:
        cent = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
            F.col("vec_id").alias("cid"), F.col("v").alias("cv")
        )
    w = Window.partitionBy("vec_id").orderBy(F.col("dot").desc(), F.col("cid"))
    return (
        emb.crossJoin(F.broadcast(cent))
        .select("vec_id", "v", "cid", dot_fold(F.col("v"), F.col("cv")).alias("dot"))
        .withColumn("crn", F.row_number().over(w))
    )


def _ivf_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fixed IVF codebook (first N_CENTROIDS vectors) from an
    un-fanned pushed-down scan."""
    return _load_query_vectors(spark, sf_dir, k=N_CENTROIDS).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )


def _ivf_cells(emb: DataFrame, cent: DataFrame | None = None) -> DataFrame:
    """(vec_id, v, cell): each vector in its nearest centroid's cell."""
    return (
        _ivf_assign(emb, cent)
        .filter(F.col("crn") == 1)
        .select("vec_id", "v", F.col("cid").alias("cell"))
    )


@query(
    "q63_ann_ivf",
    oracle=f"""
    WITH {_ASSIGN_SQL},
    q AS (SELECT vec_id AS query_id, v AS qv, cell FROM cells WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, e.vec_id,
             {_cos_sql('q.qv', 'e.v')} AS cos_sim
      FROM q JOIN cells e ON e.cell = q.cell AND e.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, cos_sim, rn
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, vec_id
      ) AS rn
      FROM scored
    )
    WHERE rn <= {_IVF_TOPK}
    """,
    tags=("similarity", "ann", "ivf"),
)
def q63_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate nearest neighbors: a deterministic coarse
    quantizer (centroids := the first N_CENTROIDS vectors; assignment
    by max dot product, centroid-id tiebreak) partitions the corpus
    into cells; search runs exact cosine inside the query's cell only
    (nprobe=1).

    Against real data the centroids come from k-means — the
    *engine-shape* is identical: a broadcast centroid table, a map-side
    argmax assignment, an equi-join on cell id. Everything is exact
    fold arithmetic, so even this ANN index is value-checked against
    the oracle.

    Scale: assignment is a broadcast cross join (corpus x K) evaluated
    scan-side; the cell equi-join replaces the O(n) probe of brute
    force with cell-sized candidate sets; recall tunes with K and
    nprobe (probe the p nearest cells by centroid distance).
    """
    emb = _load_vectors(spark, sf_dir)
    # centroid + query frames come from UN-fanned pushed-down scans:
    # slicing them out of the fanned corpus dragged each 5-16-row
    # broadcast side through its own corpus fan_out exchange
    cent = _ivf_centroids(spark, sf_dir)
    cells = _ivf_cells(emb, cent)
    queries = _ivf_cells(_load_query_vectors(spark, sf_dir), cent).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("cell").alias("qcell"),
    )
    scored = cells.join(
        F.broadcast(queries),
        (F.col("cell") == F.col("qcell")) & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id", "vec_id", cosine(F.col("qv"), F.col("v")).alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _IVF_TOPK
    )


# ---------------------------------------------------------------------------
# L3f: binary (sign) quantization + Hamming-distance search
# ---------------------------------------------------------------------------

def _qword_sql(vec: str, lo: int) -> str:
    terms = " + ".join(
        f"(CASE WHEN ({vec})[{lo + j + 1}] >= 0 THEN {1 << j} ELSE 0 END)"
        for j in range(32)
    )
    return f"CAST({terms} AS BIGINT)"


def quantize_words(vec: Column) -> tuple[Column, Column]:
    """Sign-quantize a 64-dim double array into two 32-bit words.
    64x compression (512B float32 -> 8B); Hamming distance on the
    words approximates angular distance (same guarantee family as
    sign-random-projection LSH, applied to the raw dims)."""
    def word(lo: int) -> Column:
        acc = None
        for j in range(32):
            term = F.when(
                F.element_at(vec, lo + j + 1) >= 0, F.lit(1 << j)
            ).otherwise(F.lit(0))
            acc = term if acc is None else acc + term
        return acc.cast("bigint")

    return word(0), word(32)


@query(
    "q69_hamming_neighbors",
    oracle=f"""
    WITH emb AS (
      SELECT vec_id,
             {_qword_sql('CAST(embedding AS DOUBLE[])', 0)} AS w1,
             {_qword_sql('CAST(embedding AS DOUBLE[])', 32)} AS w2
      FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, w1 AS qw1, w2 AS qw2 FROM emb WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, e.vec_id,
             bit_count(xor(e.w1, q.qw1)) + bit_count(xor(e.w2, q.qw2)) AS hamming
      FROM q JOIN emb e ON e.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, CAST(hamming AS BIGINT) AS hamming, rn
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY hamming, vec_id
      ) AS rn FROM scored
    )
    WHERE rn <= 5
    """,
    tags=("similarity", "quantization", "hamming"),
)
def q69_hamming_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 nearest neighbors under sign-quantized Hamming distance:
    embeddings compressed 64x to two int32 words, distance = popcount
    of XOR. Integer-only -> exact across engines.

    Scale: this is the memory-bound regime's answer — the quantized
    corpus fits executor RAM at sizes where float vectors cannot, the
    distance kernel is two XOR+POPCNT instructions, and the same
    re-rank pattern as IVF/LSH applies (Hamming shortlist -> exact
    cosine on candidates).
    """
    emb = _load_vectors(spark, sf_dir)
    w1, w2 = quantize_words(F.col("v"))
    coded = emb.select("vec_id", w1.alias("w1"), w2.alias("w2"))
    queries = _load_query_vectors(spark, sf_dir).select(
        F.col("vec_id").alias("query_id"),
        w1.alias("qw1"),
        w2.alias("qw2"),
    )
    hamming = (
        F.bit_count(F.col("w1").bitwiseXOR(F.col("qw1")))
        + F.bit_count(F.col("w2").bitwiseXOR(F.col("qw2")))
    ).cast("bigint")
    scored = coded.join(
        F.broadcast(queries), F.col("vec_id") != F.col("query_id")
    ).select("query_id", "vec_id", hamming.alias("hamming"))
    w = Window.partitionBy("query_id").orderBy("hamming", "vec_id")
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5)


# ---------------------------------------------------------------------------
# L3g: multi-probe IVF (nprobe=2) — recall knob of the IVF scale path
# ---------------------------------------------------------------------------


@query(
    "q70_ann_ivf_multiprobe",
    oracle=f"""
    WITH {_ASSIGN_SQL},
    qcells AS (
      SELECT vec_id AS query_id, v AS qv, cid AS cell
      FROM assign WHERE vec_id < 5 AND crn <= 2
    ),
    scored AS (
      SELECT DISTINCT q.query_id, e.vec_id,
             {_cos_sql('q.qv', 'e.v')} AS cos_sim
      FROM qcells q JOIN cells e ON e.cell = q.cell AND e.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, cos_sim, rn
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, vec_id
      ) AS rn
      FROM scored
    )
    WHERE rn <= {_IVF_TOPK}
    """,
    tags=("similarity", "ann", "ivf", "multiprobe"),
)
def q70_ann_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with nprobe=2: each query probes its TWO nearest cells
    (by centroid dot product), roughly doubling candidates and closing
    most of the recall gap of nprobe=1 (q63) at a fraction of brute
    force — the standard recall/cost knob of IVF indexes.

    Scale: identical plan shape to q63 with a 2x candidate fan-out;
    DISTINCT dedups the corner case where both probed cells contain
    the same candidate (impossible with rn=1 corpus assignment, kept
    for safety under future nprobe>1 corpus replication).
    """
    emb = _load_vectors(spark, sf_dir)
    cent = _ivf_centroids(spark, sf_dir)
    assign = _ivf_assign(emb, cent)
    cells = assign.filter(F.col("crn") == 1).select(
        "vec_id", "v", F.col("cid").alias("cell")
    )
    # un-fanned query-side re-derivation against the same centroids
    # (see q63)
    qassign = _ivf_assign(_load_query_vectors(spark, sf_dir), cent)
    qcells = qassign.filter(F.col("crn") <= 2).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("cid").alias("qcell"),
    )
    scored = (
        cells.join(
            F.broadcast(qcells),
            (F.col("cell") == F.col("qcell")) & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "vec_id", cosine(F.col("qv"), F.col("v")).alias("cos_sim"))
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _IVF_TOPK
    )


# ---------------------------------------------------------------------------
# L3h: ANN recall measurement (index quality as a first-class query)
# ---------------------------------------------------------------------------


@query(
    "q71_ann_recall",
    oracle=f"""
    WITH {_ASSIGN_SQL},
    q AS (SELECT vec_id AS query_id, v AS qv, cell FROM cells WHERE vec_id < 5),
    exact_scored AS (
      SELECT q.query_id, e.vec_id,
             row_number() OVER (
               PARTITION BY q.query_id
               ORDER BY {_cos_sql('q.qv', 'e.v')} DESC, e.vec_id
             ) AS rn
      FROM q JOIN emb e ON e.vec_id <> q.query_id
    ),
    truth AS (SELECT query_id, vec_id FROM exact_scored WHERE rn <= {_IVF_TOPK}),
    ann_scored AS (
      SELECT q.query_id, e.vec_id,
             row_number() OVER (
               PARTITION BY q.query_id
               ORDER BY {_cos_sql('q.qv', 'e.v')} DESC, e.vec_id
             ) AS rn
      FROM q JOIN cells e ON e.cell = q.cell AND e.vec_id <> q.query_id
    ),
    ann AS (SELECT query_id, vec_id FROM ann_scored WHERE rn <= {_IVF_TOPK}),
    hits AS (
      SELECT t.query_id, COUNT(a.vec_id) AS n_hits
      FROM truth t LEFT JOIN ann a
        ON a.query_id = t.query_id AND a.vec_id = t.vec_id
      GROUP BY t.query_id
    )
    SELECT query_id,
           CAST(n_hits AS DOUBLE) / {_IVF_TOPK} AS recall_at_k
    FROM hits
    """,
    tags=("similarity", "ann", "recall"),
)
def q71_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the IVF index (q63) against exact brute force —
    index quality measured *inside* the engine, deterministically
    (both rankings are total orders, so recall is a fixed rational
    per query and the oracle checks it exactly).

    Scale: this is the query you run on a sample after (re)building an
    ANN index at 100 TB — recall regression detection as a pipeline
    step, not a notebook afterthought.
    """
    emb = _load_vectors(spark, sf_dir)
    cent = _ivf_centroids(spark, sf_dir)
    cells = _ivf_cells(emb, cent)
    # un-fanned query-side re-derivation (see q63)
    queries = _ivf_cells(_load_query_vectors(spark, sf_dir), cent).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("cell").alias("qcell"),
    )
    wrank = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    truth = (
        emb.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cosine(F.col("qv"), F.col("v")).alias("cos_sim"))
        .withColumn("rn", F.row_number().over(wrank))
        .filter(F.col("rn") <= _IVF_TOPK)
        .select("query_id", "vec_id")
    )
    ann = (
        cells.join(
            F.broadcast(queries),
            (F.col("cell") == F.col("qcell")) & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "vec_id", cosine(F.col("qv"), F.col("v")).alias("cos_sim"))
        .withColumn("rn", F.row_number().over(wrank))
        .filter(F.col("rn") <= _IVF_TOPK)
        .select("query_id", F.col("vec_id").alias("ann_vec_id"))
    )
    hits = (
        truth.join(
            ann,
            (truth.query_id == ann.query_id)
            & (truth.vec_id == ann.ann_vec_id),
            "left",
        )
        .groupBy(truth.query_id)
        .agg(F.count(ann.ann_vec_id).alias("n_hits"))
    )
    return hits.select(
        "query_id",
        (F.col("n_hits").cast("double") / F.lit(_IVF_TOPK)).alias("recall_at_k"),
    )


# ---------------------------------------------------------------------------
# L3i: quantized shortlist -> exact re-rank (the production ANN shape)
# ---------------------------------------------------------------------------

_SHORTLIST = 20
_RERANK_TOPK = 5


@query(
    "q77_hamming_rerank",
    oracle=f"""
    WITH emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             {_qword_sql('CAST(embedding AS DOUBLE[])', 0)} AS w1,
             {_qword_sql('CAST(embedding AS DOUBLE[])', 32)} AS w2
      FROM embeddings
    ),
    q AS (
      SELECT vec_id AS query_id, v AS qv, w1 AS qw1, w2 AS qw2
      FROM emb WHERE vec_id < 5
    ),
    shortlist AS (
      SELECT query_id, vec_id, qv, v
      FROM (
        SELECT q.query_id, e.vec_id, q.qv, e.v,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY bit_count(xor(e.w1, q.qw1)) + bit_count(xor(e.w2, q.qw2)),
                          e.vec_id
               ) AS hrn
        FROM q JOIN emb e ON e.vec_id <> q.query_id
      ) WHERE hrn <= {_SHORTLIST}
    )
    SELECT query_id, vec_id, cos_sim, rn
    FROM (
      SELECT query_id, vec_id,
             {_cos_sql('qv', 'v')} AS cos_sim,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY {_cos_sql('qv', 'v')} DESC, vec_id
             ) AS rn
      FROM shortlist
    )
    WHERE rn <= {_RERANK_TOPK}
    """,
    tags=("similarity", "ann", "rerank", "quantization"),
)
def q77_hamming_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage ANN, the shape production systems actually run:
    a cheap Hamming-distance shortlist over 64x-compressed codes
    (top-{_SHORTLIST}), then exact cosine re-ranking of the shortlist
    (top-{_RERANK_TOPK}). Integer shortlist + fold-exact cosine ->
    the whole composition is value-checked.

    Scale: stage 1 touches only 8-byte codes (cache-resident even for
    billions of vectors); stage 2 reads full vectors for shortlist
    candidates only — IO proportional to k, not corpus size.
    """
    emb = _load_vectors(spark, sf_dir)
    w1, w2 = quantize_words(F.col("v"))
    coded = emb.select("vec_id", "v", w1.alias("w1"), w2.alias("w2"))
    queries = _load_query_vectors(spark, sf_dir).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        w1.alias("qw1"),
        w2.alias("qw2"),
    )
    hamming = (
        F.bit_count(F.col("w1").bitwiseXOR(F.col("qw1")))
        + F.bit_count(F.col("w2").bitwiseXOR(F.col("qw2")))
    )
    wham = Window.partitionBy("query_id").orderBy(hamming, F.col("vec_id"))
    shortlist = (
        coded.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .withColumn("hrn", F.row_number().over(wham))
        .filter(F.col("hrn") <= _SHORTLIST)
    )
    wcos = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    return (
        shortlist.select(
            "query_id", "vec_id", cosine(F.col("qv"), F.col("v")).alias("cos_sim")
        )
        .withColumn("rn", F.row_number().over(wcos))
        .filter(F.col("rn") <= _RERANK_TOPK)
    )


# ---------------------------------------------------------------------------
# L3j: k-means centroid training for IVF (iterative, integer-exact)
# ---------------------------------------------------------------------------

_KM_SCALE = 1_000_000  # fixed-point scale: vector coords -> int64
_KM_ITERATIONS = 3

_DOT_LONG_SQL = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(list_zip({a}, {b}), p -> p[1] * p[2])), (acc, x) -> acc + x)"
)


def _scaled_ints(v: Column) -> Column:
    """floor(x * scale) per coordinate — the q151-pagerank trick: all
    downstream sums/means are int64 and therefore order-independent,
    which is what makes iterative Lloyd training oracle-expressible.
    floor (not round) because floor semantics are identical across
    engines; the double multiply is IEEE-exact the same everywhere."""
    return F.transform(v, lambda x: F.floor(x * _KM_SCALE))


def dot_fold_long(a: Column, b: Column) -> Column:
    """Integer dot product of two int64 arrays (exact, order-free).
    Headroom: |coord| <= ~0.53 * scale, so a 64-dim term sum stays
    under 64 * (0.53e6)^2 ~ 1.8e13 << 2^63 even for unnormalized
    centroid magnitudes."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _km_assign(vi_df: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, vi, cid): each vector assigned to the centroid with
    the max integer dot product, centroid-id tiebreak. The centroid
    side broadcasts (K x dim int64s)."""
    w = Window.partitionBy("vec_id").orderBy(F.col("dot").desc(), F.col("cid"))
    return (
        vi_df.crossJoin(F.broadcast(cent))
        .select(
            "vec_id", "vi", "cid", dot_fold_long(F.col("vi"), F.col("cv")).alias("dot")
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("dot", "rn")
    )


def kmeans_train(
    emb: DataFrame, k: int = N_CENTROIDS, iterations: int = _KM_ITERATIONS
) -> DataFrame:
    """Distributed integer-exact Lloyd's iterations for IVF coarse
    centroids: returns a DataFrame ``(cid int, cv array<bigint>)`` in
    ``_KM_SCALE`` fixed-point — centroids NEVER materialize on the
    driver, so the same plan trains K ~ 10^6 codebooks (the sqrt-N
    regime for 1B vectors) without a per-round driver collect.

    Initialization is the first k vectors by vec_id; assignment ties
    break by centroid index; the per-cluster mean is integer
    truncated division (sum div n) over floor-scaled coords, so every
    iteration is bit-reproducible and DuckDB-expressible (q78's
    oracle unrolls these exact iterations). Empty clusters keep their
    previous centroid.

    Scale: per iteration, assignment is a broadcast cross join
    evaluated scan-side; the mean is posexplode -> partial-agg (the
    shuffle carries at most K x dim partial sums per task, combined
    map-side); the K x dim centroid frame is localCheckpoint-ed to
    truncate the iterative lineage — it lives in executor memory,
    not on the driver. Iterative refinement is inherently sequential
    across iterations, which is why IVF *training* is a job, while
    IVF *search* (q63/q70) stays one declarative query.
    """
    vi_df = emb.select("vec_id", _scaled_ints(F.col("v")).alias("vi")).localCheckpoint()
    cent = (
        vi_df.filter(F.col("vec_id") < k)
        .select(F.col("vec_id").cast("int").alias("cid"), F.col("vi").alias("cv"))
        .localCheckpoint()
    )
    for _ in range(iterations):
        assigned = _km_assign(vi_df, cent)
        upd = (
            assigned.select("cid", F.posexplode("vi").alias("dim", "x"))
            .groupBy("cid", "dim")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .select("cid", "dim", F.expr("s div n").alias("m"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
            .select("cid", F.transform(F.col("dm"), lambda s: s.m).alias("new_cv"))
        )
        cent = (
            cent.join(upd, "cid", "left")
            .select("cid", F.coalesce("new_cv", "cv").alias("cv"))
            .localCheckpoint()
        )
    return cent


def _km_ctes(train_where: str = "") -> tuple[list[str], str]:
    """CTE chain shared by every oracle that replays the scaled-int
    Lloyd training (q78, q168, q172): returns (ctes,
    final_centroid_cte). The chain ends with `af` = the final
    (vec_id, cid, dot) assignment of ALL vectors against the trained
    centroids; `train_where` restricts which vectors TRAIN (init +
    Lloyd updates) — empty means train on everything. Exactness
    hazards handled: SUM(BIGINT) is HUGEINT in DuckDB (cast back
    before //), and both engines' integer division truncates toward
    zero (Spark `div`, DuckDB `//`)."""
    a = []
    a.append("emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)")
    a.append(
        f"vi AS (SELECT vec_id, list_transform(v, "
        f"x -> CAST(floor(x * {_KM_SCALE}) AS BIGINT)) AS vi FROM emb)"
    )
    where = f" WHERE {train_where}" if train_where else ""
    a.append(f"tr AS (SELECT * FROM vi{where})")
    a.append(
        f"c0 AS (SELECT CAST(vec_id AS INT) AS cid, vi AS cv "
        f"FROM tr WHERE vec_id < {N_CENTROIDS})"
    )
    a.append(f"dims AS (SELECT unnest(generate_series(1, {EMB_DIM})) AS dim)")
    prev = "c0"
    for i in range(1, _KM_ITERATIONS + 1):
        dot = _DOT_LONG_SQL.format(a="t.vi", b="c.cv")
        a.append(
            f"a{i} AS (SELECT vec_id, vi, cid FROM ("
            f"SELECT t.vec_id, t.vi, c.cid, row_number() OVER ("
            f"PARTITION BY t.vec_id ORDER BY {dot} DESC, c.cid) AS rn "
            f"FROM tr t CROSS JOIN {prev} c) WHERE rn = 1)"
        )
        a.append(
            f"u{i} AS (SELECT cid, list(m ORDER BY dim) AS cv FROM ("
            f"SELECT t.cid, d.dim, "
            f"CAST(SUM(t.vi[d.dim]) AS BIGINT) // COUNT(*) AS m "
            f"FROM a{i} t CROSS JOIN dims d GROUP BY t.cid, d.dim) "
            f"GROUP BY cid)"
        )
        a.append(
            f"c{i} AS (SELECT c.cid, COALESCE(u.cv, c.cv) AS cv "
            f"FROM {prev} c LEFT JOIN u{i} u ON u.cid = c.cid)"
        )
        prev = f"c{i}"
    dot = _DOT_LONG_SQL.format(a="t.vi", b="c.cv")
    a.append(
        f"af AS (SELECT vec_id, cid, dot FROM ("
        f"SELECT t.vec_id, c.cid, {dot} AS dot, row_number() OVER ("
        f"PARTITION BY t.vec_id ORDER BY {dot} DESC, c.cid) AS rn "
        f"FROM vi t CROSS JOIN {prev} c) WHERE rn = 1)"
    )
    return a, prev


def _km_oracle_sql() -> str:
    """DuckDB twin of kmeans_train + final assignment (q78)."""
    a, prev = _km_ctes()
    csum = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), c.cv), (acc, x) -> acc + x)"
    )
    ctes = ",\n    ".join(a)
    return f"""
    WITH {ctes}
    SELECT c.cid, CAST(COALESCE(n.n, 0) AS BIGINT) AS n_vectors,
           CAST({csum} AS BIGINT) AS centroid_sum
    FROM {prev} c
    LEFT JOIN (SELECT cid, COUNT(*) AS n FROM af GROUP BY cid) n ON n.cid = c.cid
    """


@query(
    "q78_kmeans_ivf_cells",
    oracle=_km_oracle_sql(),
    tags=("similarity", "kmeans", "iterative"),
)
def q78_kmeans_ivf_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train IVF centroids with {_KM_ITERATIONS} integer-exact Lloyd
    iterations (kmeans_train), then report per-cell occupancy AND an
    integer centroid checksum. Previously rows-only (float means are
    aggregation-order-dependent); the fixed-point formulation makes
    every iteration order-independent, so the DuckDB oracle replays
    the exact training and the value hash now pins BOTH the final
    clustering and the trained centroids themselves.

    Scale: each iteration is one broadcast-assign + one explode-agg
    job; the driver never holds centroids (see kmeans_train).
    """
    emb = _load_vectors(spark, sf_dir)
    cent = kmeans_train(emb, k=N_CENTROIDS, iterations=_KM_ITERATIONS)
    vi_df = emb.select("vec_id", _scaled_ints(F.col("v")).alias("vi"))
    counts = (
        _km_assign(vi_df, cent)
        .groupBy("cid")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        cent.join(counts, "cid", "left")
        .select(
            "cid",
            F.coalesce("n", F.lit(0)).alias("n_vectors"),
            F.aggregate(
                "cv", F.lit(0).cast("long"), lambda acc, x: acc + x
            ).alias("centroid_sum"),
        )
    )


# ---------------------------------------------------------------------------
# L3j-2: prototype selection — per-cell data pruning for training sets
# ---------------------------------------------------------------------------

_PROTO_CAP = 8  # prototypes kept per cell


def _km_proto_oracle_sql() -> str:
    """Replay training (shared _km_ctes), then per-cell prototype
    ranking: most-central first (dot DESC), vec_id tiebreak."""
    a, _ = _km_ctes()
    ctes = ",\n    ".join(a)
    return f"""
    WITH {ctes},
    pr AS (
      SELECT vec_id, cid,
             row_number() OVER (PARTITION BY cid ORDER BY dot DESC, vec_id) AS rn
      FROM af
    )
    SELECT vec_id, cid, CAST(rn AS BIGINT) AS cell_rank
    FROM pr WHERE rn <= {_PROTO_CAP}
    """


@query(
    "q168_prototype_selection",
    oracle=_km_proto_oracle_sql(),
    tags=("similarity", "kmeans", "curation", "pruning"),
)
def q168_prototype_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic data pruning by prototype selection: train the
    integer-exact IVF centroids (kmeans_train, as in q78), assign
    every vector, and keep each cell's {_PROTO_CAP} most-central
    vectors (max integer dot with the trained centroid, vec_id
    tiebreak) — the SemDeDup/SSL-prototypes-style curation step that
    caps how much of any one semantic region enters a training mix.
    The oracle replays the exact Lloyd iterations (shared CTE chain
    with q78) and re-ranks, so the kept set is value-pinned
    end-to-end through an ITERATIVE training plus a ranking.

    Scale: assignment is the q78 broadcast-centroid scan; the per-cell
    ranking is a window over cells whose partitions are the cell
    populations — Spark's WindowGroupLimit pushes the rn <= cap
    filter below the sort, so the shuffle carries cell-sized groups
    and the sort never materializes beyond the cap per cell. Output
    is K x cap rows regardless of corpus size.
    """
    emb = _load_vectors(spark, sf_dir)
    cent = kmeans_train(emb, k=N_CENTROIDS, iterations=_KM_ITERATIONS)
    vi_df = emb.select("vec_id", _scaled_ints(F.col("v")).alias("vi"))
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("dot").desc(), F.col("cid")
    )
    assigned = (
        vi_df.crossJoin(F.broadcast(cent))
        .select(
            "vec_id", "cid", dot_fold_long(F.col("vi"), F.col("cv")).alias("dot")
        )
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    w_cell = Window.partitionBy("cid").orderBy(F.col("dot").desc(), F.col("vec_id"))
    return (
        assigned.withColumn("cell_rank", F.row_number().over(w_cell).cast("long"))
        .filter(F.col("cell_rank") <= _PROTO_CAP)
        .select("vec_id", "cid", "cell_rank")
    )


# ---------------------------------------------------------------------------
# L3j-3: incremental IVF maintenance — assign a new batch to FROZEN
# centroids (the daily-ingest ANN shape: no retrain per batch)
# ---------------------------------------------------------------------------

_IVF_DELTA_MOD = 10  # vec_id % mod == 0 plays the "newly arrived" batch


def _km_incr_oracle_sql() -> str:
    """Replay training on the BASE subset only, then assign everything
    (base + delta) to the frozen codebook."""
    a, prev = _km_ctes(train_where=f"vec_id % {_IVF_DELTA_MOD} <> 0")
    csum = "list_reduce(list_prepend(CAST(0 AS BIGINT), c.cv), (acc, x) -> acc + x)"
    ctes = ",\n    ".join(a)
    return f"""
    WITH {ctes}
    SELECT c.cid,
           CAST(COALESCE(nb.n, 0) AS BIGINT) AS n_base,
           CAST(COALESCE(nd.n, 0) AS BIGINT) AS n_delta,
           CAST({csum} AS BIGINT) AS centroid_sum
    FROM {prev} c
    LEFT JOIN (SELECT cid, COUNT(*) AS n FROM af
               WHERE vec_id % {_IVF_DELTA_MOD} <> 0 GROUP BY cid) nb
      ON nb.cid = c.cid
    LEFT JOIN (SELECT cid, COUNT(*) AS n FROM af
               WHERE vec_id % {_IVF_DELTA_MOD} = 0 GROUP BY cid) nd
      ON nd.cid = c.cid
    """


@query(
    "q172_incremental_ivf",
    oracle=_km_incr_oracle_sql(),
    tags=("similarity", "kmeans", "incremental"),
)
def q172_incremental_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF index maintenance: the codebook is trained ONCE
    on the base corpus (every vec_id not divisible by
    {_IVF_DELTA_MOD}), then a newly-arrived delta batch is assigned
    to the FROZEN centroids — no retraining, which is how a
    production ANN index absorbs daily ingest (periodic retrain is a
    separate offline job; q116 is the same posture for dedup). Output
    per cell: base occupancy, delta occupancy, and the integer
    centroid checksum pinning that the codebook really was not moved
    by the delta. The init set is base vectors with vec_id < K, so
    the run also exercises the fewer-than-K-seeds path
    deterministically.

    Scale: the delta assignment is ONE broadcast-codebook map pass
    over the new batch — cost proportional to |delta|, independent of
    the base corpus size (the base occupancies come from the index's
    existing assignment, recomputed here only to oracle-check them).
    """
    emb = _load_vectors(spark, sf_dir)
    base = emb.filter(F.col("vec_id") % _IVF_DELTA_MOD != 0)
    cent = kmeans_train(base, k=N_CENTROIDS, iterations=_KM_ITERATIONS)
    vi_all = emb.select("vec_id", _scaled_ints(F.col("v")).alias("vi"))
    assigned = _km_assign(vi_all, cent)
    counts = (
        assigned.withColumn(
            "is_delta", (F.col("vec_id") % _IVF_DELTA_MOD == 0).cast("long")
        )
        .groupBy("cid")
        .agg(
            F.sum(1 - F.col("is_delta")).alias("n_base"),
            F.sum("is_delta").alias("n_delta"),
        )
    )
    return cent.join(counts, "cid", "left").select(
        "cid",
        F.coalesce("n_base", F.lit(0)).alias("n_base"),
        F.coalesce("n_delta", F.lit(0)).alias("n_delta"),
        F.aggregate("cv", F.lit(0).cast("long"), lambda acc, x: acc + x).alias(
            "centroid_sum"
        ),
    )


# ---------------------------------------------------------------------------
# L3k: product quantization — codes + asymmetric-distance search
# ---------------------------------------------------------------------------

PQ_M = 8          # subspaces
PQ_SUBDIM = EMB_DIM // PQ_M
PQ_K = 16         # centroids per subspace (codebook: first K vectors)

_L2_SQL = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
    "list_transform(list_zip({a}, {b}), p -> (p[1] - p[2]) * (p[1] - p[2]))), "
    "(acc, x) -> acc + x)"
)

_PQ_BASE_SQL = f"""
    emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    subspaces AS (SELECT unnest(generate_series(0, {PQ_M - 1})) AS sub_idx),
    sub_vectors AS (
      SELECT vec_id, sub_idx,
             v[(sub_idx * {PQ_SUBDIM} + 1):(sub_idx * {PQ_SUBDIM} + {PQ_SUBDIM})] AS sv
      FROM emb CROSS JOIN subspaces
    ),
    codebook AS (
      SELECT vec_id AS cid, sub_idx, sv AS cv
      FROM sub_vectors WHERE vec_id < {PQ_K}
    ),
    codes AS (
      SELECT vec_id, sub_idx, cid AS code
      FROM (
        SELECT s.vec_id, s.sub_idx, c.cid,
               row_number() OVER (
                 PARTITION BY s.vec_id, s.sub_idx
                 ORDER BY {_L2_SQL.format(a='s.sv', b='c.cv')}, c.cid
               ) AS rn
        FROM sub_vectors s JOIN codebook c ON c.sub_idx = s.sub_idx
      ) WHERE rn = 1
    )
"""


def l2sq_fold(a: Column, b: Column) -> Column:
    """Sequential-fold squared L2 distance (order-stable, exact)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _pq_parts(spark: SparkSession, sf_dir: str):
    emb = _load_vectors(spark, sf_dir)
    subspaces = spark.range(PQ_M).select(F.col("id").cast("int").alias("sub_idx"))
    sub_vectors = emb.crossJoin(F.broadcast(subspaces)).select(
        "vec_id",
        "sub_idx",
        F.slice(
            F.col("v"), F.col("sub_idx") * PQ_SUBDIM + 1, PQ_SUBDIM
        ).alias("sv"),
    )
    # the PQ_K-row-per-subspace codebook comes from an UN-fanned
    # pushed-down scan (slicing it from the fanned sub_vectors dragged
    # the broadcast side through the corpus fan_out exchange)
    codebook = (
        _load_query_vectors(spark, sf_dir, k=PQ_K)
        .crossJoin(F.broadcast(subspaces))
        .select(
            F.col("vec_id").alias("cid"),
            F.col("sub_idx").alias("cb_sub"),
            F.slice(
                F.col("v"), F.col("sub_idx") * PQ_SUBDIM + 1, PQ_SUBDIM
            ).alias("cv"),
        )
    )
    w = Window.partitionBy("vec_id", "sub_idx").orderBy(F.col("d"), F.col("cid"))
    codes = (
        sub_vectors.join(F.broadcast(codebook), F.col("sub_idx") == F.col("cb_sub"))
        .select(
            "vec_id", "sub_idx", "cid",
            l2sq_fold(F.col("sv"), F.col("cv")).alias("d"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "sub_idx", F.col("cid").alias("code"))
    )
    return emb, sub_vectors, codebook, codes


@query(
    "q89_pq_codes",
    oracle=f"""
    WITH {_PQ_BASE_SQL}
    SELECT vec_id, sub_idx, code FROM codes
    """,
    tags=("similarity", "pq", "quantization"),
)
def q89_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codes: the 64-dim vector split into
    {PQ_M} subvectors, each assigned its nearest codebook entry
    ({PQ_K} per subspace; codebook := the first {PQ_K} vectors'
    subvectors, a deterministic stand-in for trained sub-k-means).
    {PQ_M} x 4-bit codes = 4 bytes/vector — 128x compression with
    finer granularity than the 1-bit sign quantization of q69.

    Exactness: squared-L2 folds + row_number argmin with cid
    tiebreak -> every code value-checked.
    """
    _, _, _, codes = _pq_parts(spark, sf_dir)
    return codes


@query(
    "q90_pq_adc_search",
    oracle=f"""
    WITH {_PQ_BASE_SQL},
    q AS (
      SELECT vec_id AS query_id, sub_idx, sv AS qsv
      FROM sub_vectors WHERE vec_id < 5
    ),
    subdists AS (
      SELECT q.query_id, codes.vec_id, codes.sub_idx,
             MIN({_L2_SQL.format(a='q.qsv', b='cb.cv')}) AS sd
      FROM codes
      JOIN codebook cb ON cb.cid = codes.code AND cb.sub_idx = codes.sub_idx
      JOIN q ON q.sub_idx = codes.sub_idx
      WHERE codes.vec_id <> q.query_id
      GROUP BY 1, 2, 3
    ),
    pivoted AS (
      SELECT query_id, vec_id,
             {", ".join(f"MIN(CASE WHEN sub_idx = {m} THEN sd END) AS d{m}" for m in range(PQ_M))}
      FROM subdists GROUP BY 1, 2
    )
    SELECT query_id, vec_id,
           {" + ".join(f"d{m}" for m in range(PQ_M))} AS adc_dist,
           rn
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id
        ORDER BY {" + ".join(f"d{m}" for m in range(PQ_M))}, vec_id
      ) AS rn
      FROM pivoted
    )
    WHERE rn <= 5
    """,
    tags=("similarity", "pq", "ann"),
)
def q90_pq_adc_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance (ADC) top-5 search over PQ codes: exact
    query subvectors against the corpus's quantized codes — distance
    = sum of per-subspace squared-L2 to the coded centroid. The
    {PQ_M} sub-distances are pivoted to columns and added in a fixed
    order, keeping the float sum deterministic (a groupBy SUM would
    be accumulation-order-dependent).

    Scale: the corpus contributes only 4-byte codes; per-query work is
    a {PQ_K} x {PQ_M} lookup table plus one add per code — the regime
    where billion-vector search fits one machine's cache.
    """
    _, sub_vectors, codebook, codes = _pq_parts(spark, sf_dir)
    # un-fanned query-side sub-vectors: same slice expressions over
    # the pushed-down vec_id < 5 scan instead of the corpus fan_out
    subspaces = spark.range(PQ_M).select(
        F.col("id").cast("int").alias("sub_idx")
    )
    q = (
        _load_query_vectors(spark, sf_dir)
        .crossJoin(F.broadcast(subspaces))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("sub_idx").alias("q_sub"),
            F.slice(
                F.col("v"), F.col("sub_idx") * PQ_SUBDIM + 1, PQ_SUBDIM
            ).alias("qsv"),
        )
    )
    subdists = (
        codes.join(
            F.broadcast(codebook),
            (F.col("cid") == F.col("code")) & (F.col("cb_sub") == F.col("sub_idx")),
        )
        .join(
            F.broadcast(q),
            (F.col("q_sub") == F.col("sub_idx"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id", "vec_id", "sub_idx",
            l2sq_fold(F.col("qsv"), F.col("cv")).alias("sd"),
        )
    )
    pivoted = (
        subdists.groupBy("query_id", "vec_id")
        .pivot("sub_idx", list(range(PQ_M)))
        .agg(F.min("sd"))
    )
    total = None
    for m in range(PQ_M):
        c = F.col(str(m))
        total = c if total is None else total + c
    w = Window.partitionBy("query_id").orderBy(F.col("adc_dist"), F.col("vec_id"))
    return (
        pivoted.withColumn("adc_dist", total)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("query_id", "vec_id", "adc_dist", "rn")
    )


# ---------------------------------------------------------------------------
# L3k / E24: Arrow-vectorized cosine top-k — the same semantics as q46
# through the Pandas-UDF path, as the measured reference point for
# "built-in fold vs vectorized Python" on this engine (BENCH_NOTES).
# ---------------------------------------------------------------------------


@query(
    "q122_pandas_cosine_topk",
    oracle=f"""
    WITH emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, e.vec_id,
             {_cos_sql('q.qv', 'e.v')} AS cos_sim
      FROM q JOIN emb e ON e.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, cos_sim, rn
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, vec_id
      ) AS rn
      FROM scored
    )
    WHERE rn <= 5
    """,
    tags=("similarity", "topk", "udf", "mapInPandas"),
)
def q122_pandas_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q46's exact semantics through the Arrow/Pandas path: corpus
    batches cross the Python boundary once per record batch, numpy
    does the element products, and the accumulation runs in an
    explicit per-dimension loop — vectorized ACROSS rows, sequential
    ACROSS dimensions, so every row's fold order (and thus every
    last-ulp) matches the JVM `F.aggregate` fold and the DuckDB
    `list_reduce` twin. (A plain np.dot would pairwise-sum and drift
    ulps — vectorization must not change the fold order when outputs
    are exactness-checked.)

    The 5 query vectors ride to the workers as a k x dim driver
    constant (same contract as the IVF centroid matrix — scalar-scale
    collect, never data). BENCH_NOTES records the measured JVM-fold
    vs Arrow-UDF comparison this query exists for.
    """
    import numpy as np
    import pandas as pd

    emb = _load_vectors(spark, sf_dir)
    qrows = (
        _load_query_vectors(spark, sf_dir).collect()
    )  # k x dim scalar-scale collect (5 x 64 doubles), un-fanned scan
    q_ids = [int(r.vec_id) for r in qrows]
    q_vecs = [np.asarray(r.v, dtype=np.float64) for r in qrows]

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("vec_id", T.LongType()),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )

    def _seq_fold_dot(mat: "np.ndarray", vec: "np.ndarray") -> "np.ndarray":
        acc = np.zeros(mat.shape[0], dtype=np.float64)
        for j in range(mat.shape[1]):  # sequential across dims
            acc = acc + mat[:, j] * vec[j]
        return acc

    def score_batches(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            sq = np.zeros(mat.shape[0], dtype=np.float64)
            for j in range(mat.shape[1]):
                sq = sq + mat[:, j] * mat[:, j]
            row_norm = np.sqrt(sq)
            vec_ids = pdf["vec_id"].to_numpy()
            frames = []
            for qid, qv in zip(q_ids, q_vecs):
                q_sq = 0.0
                for j in range(qv.shape[0]):
                    q_sq = q_sq + qv[j] * qv[j]
                cos = _seq_fold_dot(mat, qv) / (np.sqrt(q_sq) * row_norm)
                keep = vec_ids != qid
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "vec_id": vec_ids[keep],
                            "cos_sim": cos[keep],
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    scored = emb.mapInPandas(score_batches, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5)


# ---------------------------------------------------------------------------
# L3j: semantic dedup (SemDeDup) — embedding-space dedup SURVIVORS.
# q48 emits the near-dup PAIRS; this operator applies the suppression
# rule (a document is dropped iff it has a near-duplicate with a
# smaller vec_id) and emits the per-vector verdict — the operator a
# curation pipeline actually consumes.
# ---------------------------------------------------------------------------

_SEMDEDUP_TAU = 0.25


@query(
    "q130_semantic_dedup",
    oracle=f"""
    WITH emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             {_bucket_sql('CAST(embedding AS DOUBLE[])')} AS bucket
      FROM embeddings
    ),
    pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM emb a JOIN emb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      WHERE {_cos_sql('a.v', 'b.v')} >= {_SEMDEDUP_TAU}
    ),
    sup AS (
      SELECT vec_b AS vec_id, COUNT(*) AS n_smaller_dups FROM pairs GROUP BY 1
    )
    SELECT e.vec_id,
           COALESCE(s.n_smaller_dups, CAST(0 AS BIGINT)) AS n_smaller_dups,
           s.vec_id IS NULL AS kept
    FROM emb e LEFT JOIN sup s USING (vec_id)
    """,
    tags=("similarity", "dedup", "semdedup", "lsh"),
)
def q130_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication verdict: SRP-LSH buckets
    bound the candidate space, exact cosine >= 0.25 within the bucket
    defines near-duplication, and a vector is KEPT iff no
    near-duplicate with a smaller vec_id exists (deterministic
    min-id survivor, the same rule as exact dedup q40). Emits every
    vector with its suppression count so downstream can either filter
    (kept) or weight by duplication mass.

    Scale: identical candidate generation to q48 (bucketed self-join,
    never all-pairs); the verdict adds one aggregation on vec_b and a
    left join back to the corpus — both on the vector id, map-side
    combinable. At 100 TB the bucket cap / multi-table recall story is
    q43's, unchanged.
    """
    emb = _load_vectors(spark, sf_dir)
    emb = emb.withColumn("bucket", lsh_bucket(F.col("v")))
    a = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
        F.col("bucket").alias("ba"),
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
        F.col("bucket").alias("bb"),
    )
    sup = (
        a.join(b, (F.col("ba") == F.col("bb")) & (F.col("vec_a") < F.col("vec_b")))
        .filter(cosine(F.col("va"), F.col("vb")) >= _SEMDEDUP_TAU)
        .groupBy(F.col("vec_b").alias("vec_id"))
        .agg(F.count(F.lit(1)).alias("n_smaller_dups"))
    )
    return emb.select("vec_id").join(sup, "vec_id", "left").select(
        "vec_id",
        F.coalesce(F.col("n_smaller_dups"), F.lit(0).cast("long")).alias(
            "n_smaller_dups"
        ),
        F.col("n_smaller_dups").isNull().alias("kept"),
    )


# ---------------------------------------------------------------------------
# L3k: triangle counting on the near-duplicate graph — the classic
# graph-analytic over a similarity graph (community density, cluster
# quality). Ordered-wedge formulation: every triangle a<b<c is found
# exactly once by joining edge lists on the ordered endpoints.
# ---------------------------------------------------------------------------


@query(
    "q132_neardup_triangles",
    oracle=f"""
    WITH emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             {_bucket_sql('CAST(embedding AS DOUBLE[])')} AS bucket
      FROM embeddings
    ),
    edges AS (
      SELECT a.vec_id AS u, b.vec_id AS w
      FROM emb a JOIN emb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      WHERE {_cos_sql('a.v', 'b.v')} >= {_SEMDEDUP_TAU}
    ),
    tris AS (
      SELECT e1.u AS a, e1.w AS b, e2.w AS c
      FROM edges e1
      JOIN edges e2 ON e2.u = e1.w
      JOIN edges e3 ON e3.u = e1.u AND e3.w = e2.w
    ),
    nodes AS (
      SELECT a AS vec_id FROM tris
      UNION ALL SELECT b FROM tris
      UNION ALL SELECT c FROM tris
    )
    SELECT vec_id, COUNT(*) AS n_triangles
    FROM nodes GROUP BY vec_id
    """,
    tags=("similarity", "graph", "triangles"),
)
def q132_neardup_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector triangle counts over the embedding near-duplicate
    graph (edges = q48's bucketed cosine pairs): a vector's triangle
    count measures how densely its duplicate neighborhood
    interconnects — the standard signal separating tight duplicate
    clusters from star-shaped hub artifacts (and the denominator of
    local clustering coefficients).

    Scale: the ordered-wedge join (a<b<c) touches each triangle
    exactly once — the distributed-triangle-count formulation whose
    shuffle volume is O(edges^(3/2)) worst-case instead of the naive
    O(n^3); edges come pre-ordered from the pair generator. Wedge skew
    (a hub node's edge list) is the known hazard: the LSH bucket cap
    (q43) bounds degree upstream, which is exactly what keeps the
    wedge join's worst reducer bounded here.
    """
    emb = _load_vectors(spark, sf_dir)
    emb = emb.withColumn("bucket", lsh_bucket(F.col("v")))
    a = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
        F.col("bucket").alias("ba"),
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
        F.col("bucket").alias("bb"),
    )
    edges = (
        a.join(b, (F.col("ba") == F.col("bb")) & (F.col("vec_a") < F.col("vec_b")))
        .filter(cosine(F.col("va"), F.col("vb")) >= _SEMDEDUP_TAU)
        .select(F.col("vec_a").alias("u"), F.col("vec_b").alias("w"))
        # EAGER checkpoint: the wedge join references the edge list
        # three times — without materialization the whole bucketed
        # cosine pipeline re-runs per reference (q85's measured 3-10x)
        .localCheckpoint(eager=True)
    )
    e1 = edges
    e2 = edges.select(F.col("u").alias("u2"), F.col("w").alias("w2"))
    e3 = edges.select(F.col("u").alias("u3"), F.col("w").alias("w3"))
    tris = (
        e1.join(e2, F.col("u2") == F.col("w"))
        .join(e3, (F.col("u3") == F.col("u")) & (F.col("w3") == F.col("w2")))
        .select(F.col("u").alias("a"), F.col("w").alias("b"), F.col("w2").alias("c"))
    )
    nodes = (
        tris.select(F.col("a").alias("vec_id"))
        .unionAll(tris.select(F.col("b").alias("vec_id")))
        .unionAll(tris.select(F.col("c").alias("vec_id")))
    )
    return nodes.groupBy("vec_id").agg(F.count(F.lit(1)).alias("n_triangles"))


# ---------------------------------------------------------------------------
# L3j: filtered vector search (metadata predicate + top-k)
# ---------------------------------------------------------------------------


@query(
    "q149_filtered_cosine_topk",
    oracle=f"""
    WITH emb AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < 3),
    scored AS (
      SELECT q.query_id, e.vec_id, e.label,
             {_cos_sql('q.qv', 'e.v')} AS cos_sim
      FROM q JOIN emb e ON e.vec_id <> q.query_id
      WHERE e.label % 3 = 0
    )
    SELECT query_id, vec_id, label, cos_sim, rn
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, vec_id
      ) AS rn
      FROM scored
    )
    WHERE rn <= 5
    """,
    tags=("similarity", "ann", "filter", "topk"),
)
def q149_filtered_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered vector search — the vector-database operation plain
    ANN indexes fumble: top-k by cosine AMONG vectors passing a
    metadata predicate (label % 3 = 0). Pre-filtering is the correct
    strategy when the predicate is selective: the filter runs BEFORE
    any distance math, so cost is |matching| · |queries| dot products,
    and recall is exact (post-filtering an ANN shortlist can return
    < k survivors).

    Scale: the predicate is a scan-side pushdown (pinned in
    tests/test_plans.py — PushedFilters on the parquet scan, so row
    groups whose label stats exclude the predicate never decompress);
    query vectors broadcast; rank ≤ k compiles to WindowGroupLimit.
    For non-selective predicates the IVF path (q63) composes the same
    way — filter inside each probed cell.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double_array("embedding").alias("v")
    )
    from target_hdfs_spark.sources.readers import fan_out

    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    filtered = fan_out(emb.filter(F.col("label") % 3 == 0), "vec_id")
    scored = filtered.join(
        F.broadcast(queries), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "vec_id",
        "label",
        cosine(F.col("qv"), F.col("v")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    # rank cast to long: the driver canonicalizer must see int64 on
    # both engines (the q89/q90 int32-flag class, fixed at birth)
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 5)
    )


# ---------------------------------------------------------------------------
# L3j-4: batch-hard triplet mining — per-cell hardest positive/negative
# ---------------------------------------------------------------------------


def _km_mining_oracle_sql() -> str:
    """Replay training (shared _km_ctes), then per-anchor batch-hard
    mining inside each cell: hardest negative = max integer dot with a
    DIFFERENT label (other-id DESC tiebreak), hardest positive = min
    dot with the SAME label (other-id ASC tiebreak)."""
    a, _ = _km_ctes()
    ctes = ",\n    ".join(a)
    d = _DOT_LONG_SQL.format(a="a.vi", b="b.vi")
    return f"""
    WITH {ctes},
    lab AS (SELECT vec_id, label FROM embeddings),
    av AS (
      SELECT af.vec_id, af.cid, vi.vi, lab.label
      FROM af JOIN vi USING (vec_id) JOIN lab USING (vec_id)
    ),
    pr AS (
      SELECT a.vec_id AS anchor, b.vec_id AS other,
             a.label AS alab, b.label AS blab,
             CAST({d} AS BIGINT) AS d
      FROM av a JOIN av b ON a.cid = b.cid AND a.vec_id <> b.vec_id
    ),
    neg AS (
      SELECT anchor, other, d,
             row_number() OVER (PARTITION BY anchor
                                ORDER BY d DESC, other DESC) AS rn
      FROM pr WHERE alab <> blab
    ),
    pos AS (
      SELECT anchor, other, d,
             row_number() OVER (PARTITION BY anchor
                                ORDER BY d ASC, other ASC) AS rn
      FROM pr WHERE alab = blab
    )
    SELECT av.vec_id, av.cid, CAST(av.label AS BIGINT) AS anchor_label,
           n.other AS hard_neg_id, n.d AS hard_neg_dot,
           p.other AS hard_pos_id, p.d AS hard_pos_dot
    FROM av
    LEFT JOIN neg n ON n.anchor = av.vec_id AND n.rn = 1
    LEFT JOIN pos p ON p.anchor = av.vec_id AND p.rn = 1
    """


@query(
    "q180_hard_negative_mining",
    oracle=_km_mining_oracle_sql(),
    tags=("similarity", "kmeans", "mining", "training"),
)
def q180_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-hard triplet mining for contrastive training: train the
    integer-exact IVF codebook (kmeans_train — the q78 chain), assign
    every vector, and inside each cell find, per anchor, the HARDEST
    NEGATIVE (most-similar vector with a different label — the
    near-miss the loss should push apart) and the HARDEST POSITIVE
    (least-similar same-label vector — the far-flung pair to pull
    together). The cells play the role of training mini-batches:
    FaceNet-style batch-hard mining, but over the whole corpus with
    the "batch" chosen semantically rather than randomly, which is
    exactly what makes mined triplets informative.

    Anchors whose cell has no other same-label (resp. different-label)
    member emit NULL on that side — real mining output, and the left
    joins are part of the checked contract.

    Exactness: similarity is the int64 fixed-point dot (order-free),
    winners are row_number with full (dot, id) tiebreaks, and the
    oracle replays training through the shared _km_ctes chain — an
    end-to-end value pin across training, assignment, and mining.

    Scale: the pair space is within-cell only — sum over cells of m²,
    the q130/q168 SemDeDup posture, bounded by balanced cells (K
    tracks corpus size at √N, see BENCH_NOTES); the join key is cid,
    so the shuffle carries each cell once per side. No global
    pairing, no driver materialization at any stage.
    """
    emb = _load_vectors(spark, sf_dir)
    labels = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    cent = kmeans_train(emb, k=N_CENTROIDS, iterations=_KM_ITERATIONS)
    vi_df = emb.select("vec_id", _scaled_ints(F.col("v")).alias("vi"))
    # three consumers (both pair sides + the anchor spine): checkpoint
    # so the broadcast-assign job runs once, not three times
    av = (
        _km_assign(vi_df, cent)
        .join(labels, "vec_id")
        .localCheckpoint(eager=False)
    )
    a = av.select(
        F.col("vec_id").alias("anchor"),
        F.col("cid"),
        F.col("vi").alias("avi"),
        F.col("label").alias("alab"),
    )
    b = av.select(
        F.col("vec_id").alias("other"),
        F.col("cid"),
        F.col("vi").alias("bvi"),
        F.col("label").alias("blab"),
    )
    pr = (
        a.join(b, "cid")
        .filter(F.col("anchor") != F.col("other"))
        .select(
            "anchor",
            "other",
            "alab",
            "blab",
            dot_fold_long(F.col("avi"), F.col("bvi")).alias("d"),
        )
    )
    # ONE aggregation pass instead of two window branches: max/min of
    # (d, other) structs reproduce the (dot, id) lexicographic
    # tiebreaks exactly — max struct == ORDER BY d DESC, other DESC;
    # min struct == ORDER BY d ASC, other ASC — and the pair frame is
    # scanned once (a second consumer would recompute every dot).
    mined = pr.groupBy("anchor").agg(
        F.max(
            F.when(F.col("alab") != F.col("blab"), F.struct("d", "other"))
        ).alias("hn"),
        F.min(
            F.when(F.col("alab") == F.col("blab"), F.struct("d", "other"))
        ).alias("hp"),
    )
    return (
        av.select(
            "vec_id", "cid", F.col("label").cast("long").alias("anchor_label")
        )
        .join(mined, av.vec_id == mined.anchor, "left")
        .select(
            "vec_id",
            "cid",
            "anchor_label",
            F.col("hn.other").alias("hard_neg_id"),
            F.col("hn.d").alias("hard_neg_dot"),
            F.col("hp.other").alias("hard_pos_id"),
            F.col("hp.d").alias("hard_pos_dot"),
        )
    )


# ---------------------------------------------------------------------------
# L3n: int8 embedding quantization (storage-side compression, exact)
# ---------------------------------------------------------------------------


@query(
    "q215_int8_quantization",
    oracle=f"""
    WITH s AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(floor(x * {_KM_SCALE}) AS BIGINT)) AS si
      FROM embeddings
    ),
    m AS (
      SELECT vec_id, si,
             list_max(list_transform(si, x -> abs(x))) AS max_abs
      FROM s
    ),
    c AS (
      SELECT vec_id, si, max_abs,
             list_transform(si, x ->
               CASE WHEN max_abs = 0 THEN 0
                    WHEN x < 0 THEN -((-x) * 127 // max_abs)
                    ELSE (x * 127) // max_abs END) AS codes
      FROM m
    )
    SELECT vec_id,
           CAST(max_abs AS BIGINT) AS max_abs,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(codes, x -> abs(x))),
                  (acc, x) -> acc + x) AS BIGINT) AS sum_abs_code,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(codes, (x, i) -> x * i)),
                  (acc, x) -> acc + x) AS BIGINT) AS code_checksum,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                  list_transform(list_zip(si, codes),
                                 p -> abs(p[1] * 127 - p[2] * max_abs))),
                  (acc, x) -> acc + x) AS BIGINT) AS abs_err,
           CAST(CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(si, x -> abs(x) * 127)),
                       (acc, x) -> acc + x) = 0 THEN 0
                ELSE list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(list_zip(si, codes),
                                      p -> abs(p[1] * 127 - p[2] * max_abs))),
                       (acc, x) -> acc + x) * 1000000
                     // list_reduce(list_prepend(CAST(0 AS BIGINT),
                          list_transform(si, x -> abs(x) * 127)),
                          (acc, x) -> acc + x) END AS BIGINT) AS rel_err_ppm
    FROM c
    """,
    tags=("similarity", "quantization", "compression"),
)
def q215_int8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric INT8 quantization of the embedding column — the
    storage-side compression step a 100 TB vector corpus applies
    before indexing (4x smaller than float32; q89's PQ is the
    codebook-trained cousin, this is the training-free per-vector
    scheme every vector store ships). Per vector: max-abs scale,
    codes code_i = sign(s_i) * (|s_i| * 127 div max_abs) in
    [-127, 127], plus the exact reconstruction-error readouts that
    tell an operator whether int8 is safe for their corpus.

    Exactness: coords enter the {_KM_SCALE} fixed-point domain
    (floor — identical IEEE doubles both engines); quantization is
    integer division on NON-NEGATIVE operands (sign factored out, so
    Spark's truncating div and DuckDB's flooring // agree); the
    checksum pins every code against position (1-based weights:
    DuckDB's lambda index convention); errors compare s_i * 127
    against code_i * max_abs in exact int64.

    Scale: map-only — one scan, all array ops scan-side, no shuffle
    at any size; the readout is |vectors| rows. The codes column
    itself (not returned here — the driver canonicalizer takes scalar
    frames) is the array a writer would store alongside max_abs.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    s = emb.select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.floor(x * _KM_SCALE).cast("long"),
        ).alias("si"),
    )
    m = s.select(
        "vec_id",
        "si",
        F.array_max(F.transform(F.col("si"), F.abs)).alias("max_abs"),
    )
    c = m.select(
        "vec_id",
        "si",
        "max_abs",
        F.expr(
            "transform(si, x -> CASE WHEN max_abs = 0 THEN CAST(0 AS BIGINT)"
            " WHEN x < 0 THEN -(((-x) * 127) div max_abs)"
            " ELSE (x * 127) div max_abs END)"
        ).alias("codes"),
    )
    # exact int64 fold sums (order-free: integer addition)
    sums = c.select(
        "vec_id",
        "max_abs",
        F.aggregate(
            F.transform(F.col("codes"), F.abs),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("sum_abs_code"),
        F.aggregate(
            F.transform(F.col("codes"), lambda x, i: x * (i + F.lit(1).cast("long"))),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("code_checksum"),
        F.aggregate(
            F.zip_with(
                F.col("si"),
                F.col("codes"),
                lambda a, b: F.abs(a * 127 - b * F.col("max_abs")),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("abs_err"),
        F.aggregate(
            F.transform(F.col("si"), lambda x: F.abs(x) * 127),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("_denom"),
    )
    return sums.select(
        "vec_id",
        F.col("max_abs").cast("long").alias("max_abs"),
        "sum_abs_code",
        "code_checksum",
        "abs_err",
        F.expr(
            "CASE WHEN _denom = 0 THEN CAST(0 AS BIGINT)"
            " ELSE (abs_err * 1000000) div _denom END"
        ).alias("rel_err_ppm"),
    )


# ---------------------------------------------------------------------------
# L3j: margin-based bitext mining (Artetxe & Schwenk ratio margin —
# the CCMatrix/LASER parallel-corpus miner, on the SRP-LSH candidate
# path so the pair generator is bucketed, never all-pairs)
# ---------------------------------------------------------------------------

_BTX_TOPK = 4  # neighborhood size for the margin denominator
_BTX_MARGIN = 1.05  # mined when margin >= this ratio
# Per-bucket candidate-volume cap: a bucket contributes candidates
# only while |x| * |y| stays under this bound. Hot buckets are hub
# regions — exactly the pairs the margin rule rejects (margin ~1), so
# excluding them changes recall only where the miner would decline to
# mine anyway; production grows planes ~log2(n) and multi-tables for
# recall. This is the family's hot-bucket discipline (q43's star-link,
# q45's df cap) applied to the bitext join: candidate volume is
# bounded BY CONSTRUCTION, so one clustered region can never turn the
# bucket join into a straggler task (observed: a 100x sweep straggler
# before this cap existed).
_BTX_BUCKET_CAP = 4096


def _btx_mean_topk_sql(part: str, alias: str, ranked: str = "ranked") -> str:
    """Mean of the top-{_BTX_TOPK} candidate cosines for one anchor
    side, folded in rank order so the double sum is order-stable
    (list(... ORDER BY rn) pins the fold order; both engines add the
    same doubles in the same sequence)."""
    return f"""
      SELECT {part} AS anchor,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
                         list(cos_sim ORDER BY {part.replace('_id', '_rn')})),
                         (a, x) -> a + x)
               / COUNT(*) AS {alias},
             CAST(COUNT(*) AS BIGINT) AS n_{alias}
      FROM {ranked} WHERE {part.replace('_id', '_rn')} <= {_BTX_TOPK}
      GROUP BY 1"""


def _btx_cte(cap: int | None = None, suffix: str = "") -> str:
    """The shared WITH-chain from embeddings to the mutual-best margin
    frame (bucket split, occupancy cap, candidate cosines, two rank
    directions, top-k means) — used verbatim by the q265, q272, and
    q277 oracles so the mining rule cannot fork. `cap` overrides the
    production bucket cap (q277's audit variants); `suffix` renames
    every CTE so two chains can coexist in one query."""
    cap = _BTX_BUCKET_CAP if cap is None else cap
    x = f"x{suffix}"
    y = f"y{suffix}"
    g = f"good{suffix}"
    c = f"cand{suffix}"
    r = f"ranked{suffix}"
    return f"""emb{suffix} AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
             {_bucket_sql('CAST(embedding AS DOUBLE[])')} AS bucket
      FROM embeddings
    ),
    {x} AS (SELECT vec_id AS x_id, v AS xv, bucket FROM emb{suffix}
            WHERE vec_id % 2 = 0),
    {y} AS (SELECT vec_id AS y_id, v AS yv, bucket FROM emb{suffix}
            WHERE vec_id % 2 = 1),
    {g} AS (
      SELECT ox.bucket
      FROM (SELECT bucket, COUNT(*) AS nx FROM {x} GROUP BY 1) ox
      JOIN (SELECT bucket, COUNT(*) AS ny FROM {y} GROUP BY 1) oy
        ON oy.bucket = ox.bucket
      WHERE ox.nx * oy.ny <= {cap}
    ),
    {c} AS (
      SELECT {x}.x_id, {y}.y_id, {_cos_sql(f'{x}.xv', f'{y}.yv')} AS cos_sim
      FROM {x} JOIN {g} gg ON gg.bucket = {x}.bucket
      JOIN {y} ON {y}.bucket = {x}.bucket
    ),
    {r} AS (
      SELECT x_id, y_id, cos_sim,
             row_number() OVER (PARTITION BY x_id
                                ORDER BY cos_sim DESC, y_id) AS x_rn,
             row_number() OVER (PARTITION BY y_id
                                ORDER BY cos_sim DESC, x_id) AS y_rn
      FROM {c}
    ),
    mx{suffix} AS ({_btx_mean_topk_sql('x_id', 'mean_x', r)}),
    my{suffix} AS ({_btx_mean_topk_sql('y_id', 'mean_y', r)}),
    mutual{suffix} AS (
      SELECT r.x_id, r.y_id, r.cos_sim,
             r.cos_sim / ((mx.mean_x + my.mean_y) / 2) AS margin,
             mx.n_mean_x AS n_topk_x, my.n_mean_y AS n_topk_y
      FROM {r} r
      JOIN mx{suffix} mx ON mx.anchor = r.x_id
      JOIN my{suffix} my ON my.anchor = r.y_id
      WHERE r.x_rn = 1 AND r.y_rn = 1
    )"""


_BTX_SHARD_SALT = "btxa|"


def _btx_emb(
    spark: SparkSession, sf_dir: str, sample_ppm: int | None = None
) -> DataFrame:
    """Bucketed embedding corpus for the bitext-mining family, with an
    optional deterministic salted-hash shard (`sample_ppm` in parts
    per million of vec_ids kept — the q100/q104 hash-rule sampler, so
    a sharded audit is rerun-stable and engine-portable)."""
    from target_hdfs_spark.functions.hashing import md5_hash32

    emb = _load_vectors(spark, sf_dir)
    if sample_ppm is not None:
        emb = emb.filter(
            md5_hash32(
                F.concat(
                    F.lit(_BTX_SHARD_SALT), F.col("vec_id").cast("string")
                )
            )
            % 1_000_000
            < int(sample_ppm)
        )
    return emb.withColumn("bucket", lsh_bucket(F.col("v")))


def _btx_cand(
    spark: SparkSession,
    sf_dir: str,
    cap: int | None = None,
    sample_ppm: int | None = None,
    flag_cap: int | None = None,
    emb: DataFrame | None = None,
) -> DataFrame:
    """Candidate cosines for the bitext family: split the corpus into
    the two sides, keep buckets whose pair volume fits `cap`, and fold
    one cosine per bucket-sharing pair. With `flag_cap` the frame also
    carries `in_cap` = (nx*ny <= flag_cap) so a TIGHTER chain can be
    derived by filtering — the capped candidate set is a subset of the
    uncapped one, so q277's two chains share this one expensive
    pass instead of folding every cosine twice. `emb` lets a caller
    that already holds (and typically has checkpointed) the bucketed
    corpus pass it in, so the scan + per-row LSH-bucket fold are not
    re-derived; the x/y split below consumes it twice either way."""
    cap = _BTX_BUCKET_CAP if cap is None else cap
    if emb is None:
        # both join sides below re-derive this frame; the scan is
        # cheap but the per-row bucket fold is not — materialize once
        emb = _btx_emb(spark, sf_dir, sample_ppm).localCheckpoint(
            eager=False
        )
    x = emb.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("x_id"),
        F.col("v").alias("xv"),
        F.col("bucket").alias("bx"),
    )
    y = emb.filter(F.col("vec_id") % 2 == 1).select(
        F.col("vec_id").alias("y_id"),
        F.col("v").alias("yv"),
        F.col("bucket").alias("by"),
    )
    occ_x = x.groupBy(F.col("bx").alias("bucket")).agg(
        F.count(F.lit(1)).alias("nx")
    )
    occ_y = y.groupBy(F.col("by").alias("bucket")).agg(
        F.count(F.lit(1)).alias("ny")
    )
    vol = F.col("nx") * F.col("ny")
    good_cols = [F.col("bucket")]
    if flag_cap is not None:
        good_cols.append((vol <= flag_cap).alias("in_cap"))
    good = (
        occ_x.join(occ_y, "bucket").filter(vol <= cap).select(*good_cols)
    )
    out_cols = [
        F.col("x_id"),
        F.col("y_id"),
        cosine(F.col("xv"), F.col("yv")).alias("cos_sim"),
    ]
    if flag_cap is not None:
        out_cols.append(F.col("in_cap"))
    return (
        x.join(F.broadcast(good), F.col("bx") == F.col("bucket"))
        .drop("bucket")
        .join(y, F.col("by") == F.col("bx"))
        .select(*out_cols)
    )


def _btx_mutual_from_cand(cand: DataFrame) -> DataFrame:
    """Windows + top-k means + mutual-best margin over a candidate
    cosine frame (x_id, y_id, cos_sim) — the tail of the bitext
    pipeline, shared by every chain regardless of how the candidates
    were produced."""
    w_x = Window.partitionBy("x_id").orderBy(F.col("cos_sim").desc(), "y_id")
    w_y = Window.partitionBy("y_id").orderBy(F.col("cos_sim").desc(), "x_id")
    ranked = cand.select(
        "x_id",
        "y_id",
        "cos_sim",
        F.row_number().over(w_x).alias("x_rn"),
        F.row_number().over(w_y).alias("y_rn"),
    ).localCheckpoint()  # feeds mx, my AND the mutual frame — one
    # evaluation of the fold-heavy candidate cosines, not three
    return _btx_mutual_from_ranked(ranked)


def _btx_mutual_from_ranked(ranked: DataFrame) -> DataFrame:
    """Top-k means + mutual-best margin over an already-ranked
    candidate frame (x_id, y_id, cos_sim, x_rn, y_rn). Split out of
    `_btx_mutual_from_cand` so q277 can feed BOTH its chains from one
    dual-ranked frame instead of paying the two rank-window shuffles
    twice."""

    def mean_topk(anchor: str, rn: str, alias: str) -> DataFrame:
        # fold in rank order: the double sum is order-stable, mirroring
        # the oracle's list(cos ORDER BY rn) fold
        return (
            ranked.filter(F.col(rn) <= _BTX_TOPK)
            .groupBy(F.col(anchor).alias("anchor"))
            .agg(
                F.sort_array(
                    F.collect_list(F.struct(F.col(rn).alias("rn"), "cos_sim"))
                ).alias("topk"),
            )
            .select(
                "anchor",
                (
                    F.aggregate(
                        F.col("topk"),
                        F.lit(0.0),
                        lambda acc, s: acc + s["cos_sim"],
                    )
                    / F.size("topk")
                ).alias(alias),
                F.size("topk").cast("long").alias(f"n_{alias}"),
            )
        )

    mx = mean_topk("x_id", "x_rn", "mean_x")
    my = mean_topk("y_id", "y_rn", "mean_y")
    mutual = ranked.filter((F.col("x_rn") == 1) & (F.col("y_rn") == 1))
    out = (
        mutual.join(mx, mx["anchor"] == mutual["x_id"])
        .drop("anchor")
        .join(my, my["anchor"] == F.col("y_id"))
        .drop("anchor")
    )
    margin = F.col("cos_sim") / ((F.col("mean_x") + F.col("mean_y")) / 2)
    return out.select(
        "x_id",
        "y_id",
        "cos_sim",
        margin.alias("margin"),
        F.col("n_mean_x").alias("n_topk_x"),
        F.col("n_mean_y").alias("n_topk_y"),
    )


def _btx_mutual_frame(
    spark: SparkSession,
    sf_dir: str,
    cap: int | None = None,
    sample_ppm: int | None = None,
) -> DataFrame:
    """The shared Spark pipeline to the mutual-best margin frame
    (x_id, y_id, cos_sim, margin, n_topk_x, n_topk_y) — the single
    implementation behind q265 (mining), q272 (precision
    calibration), and q277 (cap recall audit; `cap` overrides the
    production bucket cap, `sample_ppm` shards the corpus by salted
    hash for budgeted audits)."""
    return _btx_mutual_from_cand(
        _btx_cand(spark, sf_dir, cap=cap, sample_ppm=sample_ppm)
    )


@query(
    "q265_margin_bitext_mining",
    oracle=f"""
    WITH {_btx_cte()}
    SELECT x_id, y_id, cos_sim, margin, n_topk_x, n_topk_y,
           (margin >= {_BTX_MARGIN}) AS mined
    FROM mutual
    """,
    tags=("similarity", "mining", "lsh", "margin", "bitext"),
)
def q265_margin_bitext_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MARGIN-BASED BITEXT MINING (Artetxe & Schwenk's ratio margin,
    the CCMatrix/LASER parallel-corpus miner): the corpus is split
    into two sides standing in for source/target languages (even/odd
    vec_id); candidates are pairs sharing an SRP-LSH bucket (q47's
    8-plane key — the pair generator is an equi-join, never
    all-pairs); each candidate's cosine is normalized by the mean of
    its two anchors' top-{_BTX_TOPK} neighborhoods
    (margin = cos / ((mean_x + mean_y) / 2)), and a pair is MINED
    when it is mutual-best (x's rank-1 y AND y's rank-1 x) with
    margin >= {_BTX_MARGIN} — the rule that separates true
    translations from hubs (vectors cosine-close to everything score
    margin ~1 and are rejected even when mutual-best).

    Exactness: cosines are order-stable sequential folds (q46's
    convention); the top-k means fold in rank order so both engines
    add the same doubles in the same sequence; ranks tie-break on id.

    Scale: the candidate join is an equi-join on the bucket key
    (planes grow ~log2(n), q47's knob); both rank windows compile to
    WindowGroupLimit-able rank<=k / rank=1 filters over the candidate
    frame; the means are k-element folds per anchor; the mutual join
    runs on two rank-1 frames — nothing after candidate generation is
    corpus-sized. At 100 TB the same plan mines per bucket-shard with
    multiple hash tables for recall.

    Cites reference behavior: none (beyond-reference operator).
    """
    mutual = _btx_mutual_frame(spark, sf_dir)
    return mutual.select(
        "x_id",
        "y_id",
        "cos_sim",
        "margin",
        "n_topk_x",
        "n_topk_y",
        (F.col("margin") >= _BTX_MARGIN).alias("mined"),
    )


# ---------------------------------------------------------------------------
# L3k: mining precision calibration — the evaluative member of the
# mining program (q71's recall-measurement pattern applied to q265)
# ---------------------------------------------------------------------------

_BTX_THRESHOLDS = (100, 102, 105, 110)  # margin thresholds, in centi-units


@query(
    "q272_mining_precision_curve",
    oracle=f"""
    WITH {_btx_cte()},
    labeled AS (
      SELECT m.margin,
             (ex.label = ey.label) AS agree
      FROM mutual m
      JOIN emb ex ON ex.vec_id = m.x_id
      JOIN emb ey ON ey.vec_id = m.y_id
    ),
    th AS (SELECT CAST(unnest(ARRAY{list(_BTX_THRESHOLDS)}) AS BIGINT)
               AS threshold_centi)
    SELECT t.threshold_centi,
           CAST(COUNT(CASE WHEN l.margin * 100 >= t.threshold_centi
                           THEN 1 END) AS BIGINT) AS n_mined,
           CAST(COUNT(CASE WHEN l.margin * 100 >= t.threshold_centi
                            AND l.agree THEN 1 END) AS BIGINT)
             AS n_label_agree,
           CAST(COUNT(CASE WHEN l.margin * 100 >= t.threshold_centi
                            AND l.agree THEN 1 END) * 1000000
                // greatest(COUNT(CASE WHEN l.margin * 100
                                       >= t.threshold_centi
                                  THEN 1 END), 1) AS BIGINT)
             AS precision_ppm
    FROM th t CROSS JOIN labeled l
    GROUP BY 1
    """,
    tags=("similarity", "mining", "calibration", "observability"),
)
def q272_mining_precision_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MINING PRECISION CURVE — the q71 discipline (measure the
    approximation, don't assume it) applied to the bitext miner: the
    mutual-best margin frame is labeled with each side's cluster id
    (the corpus's ground-truth grouping), and for each candidate
    margin threshold the curve reports pairs mined, label-agreeing
    pairs, and precision in ppm — the table a pipeline operator reads
    to SET q265's threshold instead of inheriting a paper's constant.
    Higher thresholds trade volume for precision; the curve makes the
    trade a measured fact on THIS corpus.

    Exactness: margins are the shared `_btx_mutual_frame` doubles
    (order-stable folds); threshold comparison happens in centi-units
    against exact integers; counts and ppm divisions are integers.

    Scale: rides the capped candidate pipeline (bucket equi-join,
    never all-pairs); the label joins attach to the mutual frame
    (rank-1-sized, far below corpus scale); the curve aggregate is a
    {len(_BTX_THRESHOLDS)}-row broadcast cross join over that frame.

    Cites reference behavior: none (beyond-reference operator).
    """
    mutual = _btx_mutual_frame(spark, sf_dir)
    labels = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label"
    )
    labeled = (
        mutual.join(
            labels.select(
                F.col("vec_id").alias("x_id"), F.col("label").alias("lx")
            ),
            "x_id",
        )
        .join(
            labels.select(
                F.col("vec_id").alias("y_id"), F.col("label").alias("ly")
            ),
            "y_id",
        )
        .select("margin", (F.col("lx") == F.col("ly")).alias("agree"))
    )
    th = spark.createDataFrame(
        [(t,) for t in _BTX_THRESHOLDS], "threshold_centi long"
    )
    mined = F.col("margin") * 100 >= F.col("threshold_centi")
    return (
        labeled.crossJoin(F.broadcast(th))
        .groupBy("threshold_centi")
        .agg(
            F.count(F.when(mined, 1)).cast("long").alias("n_mined"),
            F.count(F.when(mined & F.col("agree"), 1))
            .cast("long")
            .alias("n_label_agree"),
            F.expr(
                "count(case when margin * 100 >= threshold_centi"
                " and agree then 1 end) * 1000000"
                " div greatest(count(case when margin * 100"
                " >= threshold_centi then 1 end), 1)"
            )
            .cast("long")
            .alias("precision_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# L3l: bucket-cap recall audit — pricing the hot-bucket cap (the
# q71/q272 measure-don't-assume discipline applied to the cap itself)
# ---------------------------------------------------------------------------

_BTX_AUDIT_CAP = 64  # deliberately tight so the audit observes drops
_BTX_UNCAPPED = 1 << 60
# Preflight budget for the UNCAPPED chain's total candidate volume
# (sum over buckets of |x|*|y|). The uncapped side is the whole point
# of the audit — and the one join in this family with no constructive
# bound — so it gets the family's preflight discipline instead: the
# volume is priced from bucket occupancies BEFORE either chain's plan
# exists, and an over-budget corpus fails fast with the sharding
# remediation rather than launching a join that may never finish
# (observed pre-cap at the 100x sweep). 5M candidates is ~100x the
# sf0.1 corpus's uncapped volume (45k) and completes in seconds.
_BTX_AUDIT_BUDGET = 5_000_000


def bucket_cap_recall_audit(
    spark: SparkSession,
    sf_dir: str,
    sample_ppm: int | None = None,
    budget: int = _BTX_AUDIT_BUDGET,
) -> DataFrame:
    """q277's engine with the family's preflight guard: price the
    uncapped chain's candidate volume (one cheap aggregation over the
    two bucket-occupancy frames — the corpus is scanned once, the agg
    is bucket-count-sized) EAGERLY, before either mining chain's plan
    is constructed, and refuse to launch an over-budget audit. The
    remediation is constructive: volume scales ~quadratically in the
    shard fraction f (each bucket's |x| and |y| scale by f), so the
    error suggests sample_ppm ~ 1e6 * sqrt(budget/volume), and passing
    `sample_ppm` runs the SAME audit on a deterministic salted-hash
    shard of vec_ids — the "audit on a sampled shard at 100 TB" path,
    now enforced rather than advisory (r9 verdict item 1)."""
    # one scan + per-row bucket fold serves the preflight AND both
    # candidate sides: the preflight's blocking collect() below
    # materializes this lazy checkpoint, so x/y read stored rows
    emb = _btx_emb(spark, sf_dir, sample_ppm).localCheckpoint(eager=False)
    occ = (
        emb.groupBy(
            "bucket", (F.col("vec_id") % 2 == 0).alias("is_x")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("is_x"), F.col("n"))).alias("nx"),
            F.sum(F.when(~F.col("is_x"), F.col("n"))).alias("ny"),
        )
        .select((F.col("nx") * F.col("ny")).alias("vol"))
    )
    row = occ.agg(
        F.coalesce(F.sum("vol"), F.lit(0)).alias("total"),
        F.coalesce(F.max("vol"), F.lit(0)).alias("worst"),
    ).collect()[0]
    total, worst = int(row["total"]), int(row["worst"])
    if total > budget:
        # suggestion targets HALF the budget: volume scales
        # quadratically in the shard fraction, so an exact-budget
        # suggestion lands on the boundary and integer rounding can
        # re-trip the guard on the re-run
        frac = (budget / (2 * total)) ** 0.5
        base = sample_ppm if sample_ppm is not None else 1_000_000
        suggest = max(1, int(base * frac))
        raise RuntimeError(
            f"bucket_cap_recall_audit: uncapped candidate volume "
            f"{total} (worst bucket {worst}) exceeds the audit budget "
            f"{budget} — the uncapped chain would straggle or never "
            f"finish on this corpus. Audit on a sampled shard instead: "
            f"pass sample_ppm={suggest} (volume scales ~quadratically "
            f"in the shard fraction), or raise budget= if the cluster "
            f"can afford the priced volume."
        )
    # The capped candidate set is a strict subset of the uncapped one
    # (same buckets, tighter volume bound), so the expensive per-pair
    # cosine folds are computed ONCE over the uncapped candidates with
    # an in_cap flag, checkpointed, and both chains' windows read the
    # materialized frame — halving the scan+fold work of the audit.
    cand_all = _btx_cand(
        spark,
        sf_dir,
        cap=_BTX_UNCAPPED,
        sample_ppm=sample_ppm,
        flag_cap=_BTX_AUDIT_CAP,
        emb=emb,
    ).localCheckpoint()
    # BOTH chains' ranks ride the same two window shuffles: within a
    # (partition, ORDER BY cos_sim DESC, tiebreak) pass, the capped
    # chain's row_number equals the running count of in_cap rows —
    # the order is identical and filtering preserves it — so one
    # WindowExec per side computes x_rn AND x_rn_c (resp. y) instead
    # of re-shuffling the candidate frame for the capped subset.
    w_x = Window.partitionBy("x_id").orderBy(F.col("cos_sim").desc(), "y_id")
    w_y = Window.partitionBy("y_id").orderBy(F.col("cos_sim").desc(), "x_id")
    run = Window.unboundedPreceding, Window.currentRow
    flag = F.col("in_cap").cast("int")
    ranked = cand_all.select(
        "x_id",
        "y_id",
        "cos_sim",
        "in_cap",
        F.row_number().over(w_x).alias("x_rn"),
        F.sum(flag).over(w_x.rowsBetween(*run)).alias("x_rn_c"),
        F.row_number().over(w_y).alias("y_rn"),
        F.sum(flag).over(w_y.rowsBetween(*run)).alias("y_rn_c"),
    ).localCheckpoint()
    u = _btx_mutual_from_ranked(
        ranked.select("x_id", "y_id", "cos_sim", "x_rn", "y_rn")
    ).select("x_id", "y_id", "cos_sim", "margin")
    c = _btx_mutual_from_ranked(
        ranked.filter(F.col("in_cap")).select(
            "x_id",
            "y_id",
            "cos_sim",
            F.col("x_rn_c").alias("x_rn"),
            F.col("y_rn_c").alias("y_rn"),
        )
    ).select(
        F.col("x_id").alias("cx"),
        F.col("y_id").alias("cy"),
        F.col("cos_sim").alias("ccos"),
        F.col("margin").alias("cmargin"),
    )
    delta = (
        u.join(
            c,
            (F.col("cx") == F.col("x_id")) & (F.col("cy") == F.col("y_id")),
            "full_outer",
        )
        .filter(F.col("x_id").isNull() | F.col("cx").isNull())
        .select(
            F.coalesce("x_id", "cx").alias("x_id"),
            F.coalesce("y_id", "cy").alias("y_id"),
            F.coalesce("cos_sim", "ccos").alias("cos_sim"),
            F.coalesce("margin", "cmargin").alias("margin"),
            F.when(F.col("cx").isNull(), "dropped")
            .otherwise("appeared")
            .alias("direction"),
        )
    )
    w_all = Window.partitionBy()
    return delta.select(
        "x_id",
        "y_id",
        "cos_sim",
        "margin",
        "direction",
        (F.col("margin") >= _BTX_MARGIN).alias("would_mine"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("n_delta"),
        F.count(
            F.when(
                (F.col("margin") >= _BTX_MARGIN)
                & (F.col("direction") == "dropped"),
                1,
            )
        )
        .over(w_all)
        .cast("long")
        .alias("n_mined_dropped"),
    )


@query(
    "q277_bucket_cap_recall",
    oracle=f"""
    WITH {_btx_cte(cap=_BTX_UNCAPPED, suffix="_u")},
    {_btx_cte(cap=_BTX_AUDIT_CAP, suffix="_c")},
    delta AS (
      SELECT COALESCE(u.x_id, c.x_id) AS x_id,
             COALESCE(u.y_id, c.y_id) AS y_id,
             COALESCE(u.cos_sim, c.cos_sim) AS cos_sim,
             COALESCE(u.margin, c.margin) AS margin,
             CASE WHEN c.x_id IS NULL THEN 'dropped'
                  ELSE 'appeared' END AS direction
      FROM mutual_u u
      FULL OUTER JOIN mutual_c c
        ON c.x_id = u.x_id AND c.y_id = u.y_id
      WHERE u.x_id IS NULL OR c.x_id IS NULL
    )
    SELECT x_id, y_id, cos_sim, margin, direction,
           (margin >= {_BTX_MARGIN}) AS would_mine,
           CAST(COUNT(*) OVER () AS BIGINT) AS n_delta,
           CAST(COUNT(CASE WHEN margin >= {_BTX_MARGIN}
                            AND direction = 'dropped' THEN 1 END)
                OVER () AS BIGINT) AS n_mined_dropped
    FROM delta
    """,
    tags=("similarity", "mining", "calibration", "observability", "lsh"),
)
def q277_bucket_cap_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUCKET-CAP RECALL AUDIT — pricing q265's hot-bucket cap
    instead of asserting it: the mutual-best margin frame is built
    twice, uncapped and under a deliberately TIGHT audit cap
    ({_BTX_AUDIT_CAP} vs the production {_BTX_BUCKET_CAP} — tight so
    the audit actually observes drops at calibration scale), and the
    SYMMETRIC DIFFERENCE rides the rows: pairs the cap dropped, pairs
    that newly appeared (excluding a bucket re-ranks its anchors'
    best matches), each with its margin and whether the mining
    threshold would have taken it. The measurement CUT AGAINST the
    easy story: on this clustered corpus every pair the tight cap
    dropped would have been mined (n_mined_dropped == n_delta at
    sf0.01) — organic cluster buckets hold TRUE pairs, not just
    hubs. The documented takeaway is therefore sharper: the cap is
    safe only ABOVE organic bucket occupancy, which is exactly what
    the plane-growth schedule maintains (~log2(n) planes keep
    occupancy flat while the cap catches adversarial/hub buckets
    that grow faster) — and this audit is the preflight that checks
    a cap/planes setting against a corpus sample before a production
    run. q71's discipline (IVF recall) and q272's (threshold
    precision) applied to the third knob the miner has.

    Exactness: both chains are the one shared pipeline at different
    cap constants; the difference join, direction labels, and the
    window counts are deterministic.

    Scale: the audit is calibration-shaped — the uncapped chain is
    affordable only at calibration SF (that is WHY production needs
    the cap); at 100 TB you audit on a sampled shard, and that rule
    is ENFORCED: `bucket_cap_recall_audit` prices the uncapped
    chain's total candidate volume from the bucket occupancies
    EAGERLY (driver-side, before either chain's plan exists — the
    eager_guard discipline) and fails fast with a concrete
    `sample_ppm` remediation when the volume exceeds
    {_BTX_AUDIT_BUDGET}; the salted-hash shard then runs the same
    audit at affordable volume. Both chains stay bucketed equi-joins;
    the difference runs on two rank-1 frames.

    Cites reference behavior: none (beyond-reference operator).
    """
    return bucket_cap_recall_audit(spark, sf_dir)


# ---------------------------------------------------------------------------
# L3n: Matryoshka truncation calibration (how many dims do we need?)
# ---------------------------------------------------------------------------

_MRL_DIMS = (8, 16, 32, EMB_DIM)
_MRL_K = 5


@query(
    "q289_matryoshka_truncation",
    oracle=f"""
    WITH emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < 5),
    grid AS (SELECT unnest([{", ".join(str(d) for d in _MRL_DIMS)}]) AS dim),
    scored AS (
      SELECT g.dim, q.query_id, e.vec_id,
             {_cos_sql('(q.qv[1:g.dim])', '(e.v[1:g.dim])')} AS cos_sim
      FROM q JOIN emb e ON e.vec_id <> q.query_id CROSS JOIN grid g
    ),
    top AS (
      SELECT dim, query_id, vec_id,
             row_number() OVER (PARTITION BY dim, query_id
                                ORDER BY cos_sim DESC, vec_id) AS rn
      FROM scored
    ),
    kept AS (SELECT dim, query_id, vec_id FROM top WHERE rn <= {_MRL_K}),
    full_top AS (
      SELECT query_id, vec_id FROM kept WHERE dim = {EMB_DIM}
    )
    SELECT CAST(k.dim AS BIGINT) AS dim, k.query_id,
           CAST(COUNT(f.vec_id) AS BIGINT) AS overlap_at_{_MRL_K}
    FROM kept k LEFT JOIN full_top f
      ON f.query_id = k.query_id AND f.vec_id = k.vec_id
    WHERE k.dim <> {EMB_DIM}
    GROUP BY k.dim, k.query_id
    """,
    tags=("similarity", "ann", "matryoshka", "calibration"),
)
def q289_matryoshka_truncation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATRYOSHKA truncation calibration (MRL, Kusupati et al.): rank
    every query's exact cosine top-{_MRL_K} using only the first
    d in {_MRL_DIMS[:-1]} embedding dimensions and report the overlap
    with the full-{EMB_DIM}-dim top-{_MRL_K} — the table that decides
    how many dimensions a retrieval index actually needs (truncate at
    the smallest d whose overlap holds, shrink the index ~{EMB_DIM // _MRL_DIMS[0]}x).
    The production pattern this calibrates is truncated-dim ANN
    search + full-dim rerank (compose with q63's IVF / q77's rerank).

    Exactness: prefix slicing is exact; cosines fold sequentially on
    identical doubles (the q46 discipline; sqrt is correctly-rounded
    IEEE, not transcendental); ranks carry the vec_id tiebreak;
    overlap counting is integer.

    Scale: the 5-query frame is broadcast, the corpus streams through
    map-side with the dims grid a constant x{len(_MRL_DIMS)}
    multiplier; rank <= k filters compile to per-partition group
    limits; the overlap join runs on 4 x 5 x {_MRL_K} kept rows.
    """
    emb = _load_vectors(spark, sf_dir)
    queries = _load_query_vectors(spark, sf_dir).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    dims = F.explode(
        F.array(*[F.lit(d) for d in _MRL_DIMS])
    ).alias("dim")
    scored = (
        emb.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "qv", "v", dims)
        .select(
            "dim",
            "query_id",
            "vec_id",
            cosine(
                F.slice(F.col("qv"), 1, F.col("dim")),
                F.slice(F.col("v"), 1, F.col("dim")),
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("dim", "query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    kept = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _MRL_K)
        .select("dim", "query_id", "vec_id")
        .localCheckpoint(eager=False)  # feeds truncated AND full sides
    )
    full_top = kept.filter(F.col("dim") == EMB_DIM).select(
        F.col("query_id").alias("f_query"),
        F.col("vec_id").alias("f_vec"),
        F.lit(1).alias("m"),
    )
    return (
        kept.filter(F.col("dim") != EMB_DIM)
        .join(
            F.broadcast(full_top),
            (F.col("query_id") == F.col("f_query"))
            & (F.col("vec_id") == F.col("f_vec")),
            "left",
        )
        .groupBy("dim", "query_id")
        .agg(
            F.sum(F.coalesce(F.col("m"), F.lit(0)))
            .cast("long")
            .alias(f"overlap_at_{_MRL_K}")
        )
        .select(F.col("dim").cast("long").alias("dim"), "query_id", f"overlap_at_{_MRL_K}")
    )
