"""Entity resolution / record linkage (SURVEY.md §2B extension,
L1/L2-adjacent): blocking → bounded pairwise comparison → connected
components → survivorship merge ("golden record").

Near-dup document dedup (operators/dedup.py) asks "are these two TEXTS
the same content"; record linkage asks "do these two structured ROWS
describe the same real-world entity", matched on several typed
attributes at once (fuzzy name + close balance within a blocking key).
The pipeline shape is the classic one every large-scale MDM / identity
system runs: never all-pairs — only pairs sharing a blocking key are
compared — then transitive closure over match edges, then a
deterministic field-level merge.

The test tables have no naturally dirty records, so each query
synthesizes a deterministic "dirty twin" for every third customer
(one name character dropped at a key-derived position, balance nudged
by 0.05) with the SAME closed-form rule on the Spark and DuckDB
sides; the linkage logic downstream is generic.

Reference parity: the reference (Automattic/target-hdfs, 274 core
lines) has no query surface; this module is part of the mandated
LLM-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from target_hdfs_spark.operators.dedup import connected_components
from target_hdfs_spark.registry import query
from target_hdfs_spark.sources.readers import load_table

_LEV_MAX = 2  # max name edit distance for a match
_BAL_TOL = 1.0  # max abs balance difference for a match

# The dirty-twin synthesis, shared by both engines: drop the name char
# at 1-indexed position 10 + (custkey % 9) (inside the 9-digit suffix
# of 'Customer#%09d'), add 0.05 to the balance.
_DIRTY_NAME_SQL = (
    "substring(c_name, 1, 9 + c_custkey % 9) || "
    "substring(c_name, 11 + c_custkey % 9, 18)"
)

_RECS_SQL = f"""
    recs AS (
      SELECT c_custkey * 2 AS rid, c_name AS name, c_nationkey AS nk,
             c_mktsegment AS seg, c_acctbal AS bal
      FROM customer
      UNION ALL
      SELECT c_custkey * 2 + 1, {_DIRTY_NAME_SQL},
             c_nationkey, c_mktsegment, c_acctbal + 0.05
      FROM customer WHERE c_custkey % 3 = 0
    ),
    pairs AS (
      SELECT a.rid AS ra, b.rid AS rb
      FROM recs a JOIN recs b
        ON a.nk = b.nk AND a.seg = b.seg AND a.rid < b.rid
      WHERE levenshtein(a.name, b.name) <= {_LEV_MAX}
        AND abs(a.bal - b.bal) < {_BAL_TOL}
    ),
    undirected AS (
      SELECT ra, rb FROM pairs UNION ALL SELECT rb, ra FROM pairs
    ),
    reach (src, dst) AS (
      SELECT ra, rb FROM undirected
      UNION
      SELECT r.src, u.rb FROM reach r JOIN undirected u ON u.ra = r.dst
    ),
    linked AS (
      SELECT rec.rid,
             least(rec.rid,
                   coalesce((SELECT MIN(r.dst) FROM reach r
                             WHERE r.src = rec.rid), rec.rid)) AS entity
      FROM recs rec
    )
"""


def _records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer records plus deterministic dirty twins: (rid, name,
    nk, seg, bal)."""
    cust = load_table(spark, sf_dir, "customer")
    clean = cust.select(
        (F.col("c_custkey") * 2).alias("rid"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").alias("bal"),
    )
    dirty = cust.filter(F.col("c_custkey") % 3 == 0).select(
        (F.col("c_custkey") * 2 + 1).alias("rid"),
        F.expr(_DIRTY_NAME_SQL).alias("name"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_mktsegment").alias("seg"),
        (F.col("c_acctbal") + 0.05).alias("bal"),
    )
    return clean.unionByName(dirty)


def match_pairs(recs: DataFrame) -> DataFrame:
    """Blocked pairwise matching: only records sharing the
    (nationkey, segment) blocking key are compared — an EQUI-join on
    the block with the fuzzy predicates (levenshtein + balance
    tolerance) as residual filters, never an all-pairs scan. Returns
    (ra, rb) match edges with ra < rb.

    Scale: comparisons = sum over blocks of |block|^2, controlled by
    blocking-key cardinality — on real data the key includes a name
    prefix / phonetic code so blocks stay O(100). levenshtein runs
    JVM-side inside the join filter (no Python)."""
    a = recs.select(
        F.col("rid").alias("ra"),
        F.col("name").alias("name_a"),
        "nk",
        "seg",
        F.col("bal").alias("bal_a"),
    )
    b = recs.select(
        F.col("rid").alias("rb"),
        F.col("name").alias("name_b"),
        "nk",
        "seg",
        F.col("bal").alias("bal_b"),
    )
    return (
        a.join(b, ["nk", "seg"])
        .filter(F.col("ra") < F.col("rb"))
        .filter(F.levenshtein("name_a", "name_b") <= _LEV_MAX)
        .filter(F.abs(F.col("bal_a") - F.col("bal_b")) < _BAL_TOL)
        .select("ra", "rb")
    )


@query(
    "q169_record_linkage",
    oracle=f"""
    WITH RECURSIVE {_RECS_SQL}
    SELECT rid, entity FROM linked
    """,
    tags=("linkage", "dedup", "graph", "iterative"),
)
def q169_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage end-to-end: synthesize dirty twins, block on
    (nationkey, segment), match within blocks on name edit distance
    <= {_LEV_MAX} AND balance within {_BAL_TOL}, then connected
    components over the match edges — every record labeled with its
    entity id (the component's minimum rid; singletons label
    themselves). Multi-attribute fuzzy matching means occasional
    same-block false links are possible by construction; both engines
    resolve them identically, which is exactly what the oracle pins.

    Scale: the blocked join is an equi-join (no cartesian), the
    closure is the q85 star-contraction CC (O(log^2 n) rounds); the
    oracle cross-checks with a recursive-CTE transitive closure.
    """
    recs = _records(spark, sf_dir).localCheckpoint(eager=True)
    edges = match_pairs(recs).select(
        F.col("ra").alias("doc_a"), F.col("rb").alias("doc_b")
    )
    labels = connected_components(recs.select("rid"), edges, node_col="rid")
    return labels.select("rid", F.col("cluster").alias("entity"))


@query(
    "q170_golden_record",
    oracle=f"""
    WITH RECURSIVE {_RECS_SQL},
    ranked AS (
      SELECT l.entity, r.name, r.bal, r.seg,
             row_number() OVER (
               PARTITION BY l.entity
               ORDER BY length(r.name) DESC, r.name
             ) AS pick
      FROM linked l JOIN recs r ON r.rid = l.rid
    )
    SELECT entity,
           MAX(CASE WHEN pick = 1 THEN name END) AS name,
           MAX(bal) AS acctbal,
           MIN(seg) AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_records
    FROM ranked GROUP BY entity
    """,
    tags=("linkage", "merge", "survivorship"),
)
def q170_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship merge after linkage: one golden record per entity
    with deterministic field rules — canonical name = longest (then
    lexicographically smallest: the untruncated clean name wins over
    its dirty twin), balance = max, segment = min, plus the merged
    record count. The rules are per-field, so a false link merges
    fields from different source records — the standard MDM behavior
    the determinism makes auditable.

    Scale: linkage as q169, then one window (rank the name choice)
    and one aggregation, both keyed on entity.
    """
    recs = _records(spark, sf_dir).localCheckpoint(eager=True)
    edges = match_pairs(recs).select(
        F.col("ra").alias("doc_a"), F.col("rb").alias("doc_b")
    )
    labels = connected_components(recs.select("rid"), edges, node_col="rid")
    merged = recs.join(labels, "rid").select(
        F.col("cluster").alias("entity"), "name", "bal", "seg"
    )
    w = Window.partitionBy("entity").orderBy(
        F.length("name").desc(), F.col("name")
    )
    return (
        merged.withColumn("pick", F.row_number().over(w))
        .groupBy("entity")
        .agg(
            F.max(F.when(F.col("pick") == 1, F.col("name"))).alias("name"),
            F.max("bal").alias("acctbal"),
            F.min("seg").alias("segment"),
            F.count(F.lit(1)).alias("n_records"),
        )
    )
