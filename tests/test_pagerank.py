"""q151's integer PageRank: hand-checked small graph + invariants."""

from __future__ import annotations

from pyspark.sql import functions as F


def _pr_reference(n_nodes, edges, iters=3, scale=10**12):
    """Pure-Python mirror of the integer PR recurrence."""
    from collections import defaultdict

    out = defaultdict(list)
    deg = defaultdict(int)
    for a, b in edges:
        out[a].append(b)
        out[b].append(a)
        deg[a] += 1
        deg[b] += 1
    rank = {v: scale // n_nodes for v in range(n_nodes)}
    base = (15 * scale) // (100 * n_nodes)
    for _ in range(iters):
        contrib = defaultdict(int)
        for u in rank:
            if deg[u]:
                share = rank[u] // deg[u]
                for v in out[u]:
                    contrib[v] += share
        rank = {v: base + (85 * contrib[v]) // 100 for v in range(n_nodes)}
    return rank


def test_integer_pagerank_matches_reference_on_path_graph(spark):
    """Spark's iterative-join formulation must equal the sequential
    reference on a 6-node path + isolated node (hub gets max rank;
    isolated node gets exactly the base term)."""
    from target_hdfs_spark.operators.dedup import _PR_ITERS, _PR_SCALE

    n = 7
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)]  # node 6 isolated
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    nn = nodes.agg(F.count(F.lit(1)).alias("n"))
    edf = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    deg = edf.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "doc_id", F.expr(f"CAST({_PR_SCALE} AS BIGINT) div n").alias("rank")
    )
    for _ in range(_PR_ITERS):
        shares = (
            ranks.withColumnRenamed("doc_id", "u")
            .join(deg.withColumnRenamed("src", "u"), "u")
            .select("u", F.expr("rank div outdeg").alias("share"))
        )
        contrib = (
            edf.withColumnRenamed("src", "u")
            .join(shares, "u")
            .groupBy("dst")
            .agg(F.sum("share").alias("c"))
            .withColumnRenamed("dst", "doc_id")
        )
        ranks = (
            nodes.crossJoin(F.broadcast(nn))
            .join(contrib, "doc_id", "left")
            .select(
                "doc_id",
                (
                    F.expr(f"(15 * {_PR_SCALE}) div (100 * n)")
                    + F.expr("(85 * COALESCE(c, 0)) div 100")
                ).alias("rank"),
            )
        )
    got = {r.doc_id: r.rank for r in ranks.collect()}
    expected = _pr_reference(n, edges, iters=_PR_ITERS, scale=_PR_SCALE)
    assert got == expected
    base = (15 * _PR_SCALE) // (100 * n)
    assert got[6] == base              # isolated: base term only
    # after 3 iterations the endpoints' full-rank funnel puts nodes
    # 1 and 4 on top (symmetric), and the reference agrees
    assert max(got, key=got.get) in (1, 4)
    assert got[1] == got[4]  # path symmetry
    assert sum(got.values()) <= _PR_SCALE   # dangling-drop: mass shrinks
