"""Graph analytics over relational data (PageRank).

The supplier↔customer trade graph: an undirected edge for every
(supplier, customer) pair that traded, weighted by line revenue.
PageRank over it ranks entities by recursive trade centrality — the
classic iterative-algorithm shape (cf. llm_dedup_cluster's label
propagation for connected components).

Scale notes: the edge list is built with ONE aggregation over the
lineitem-orders join and persisted; each PageRank iteration is one
join + one groupBy on the node key, so the same hash partitioning is
reused across every round (at cluster scale, pre-`repartition` both
sides by node id to pin it). ``localCheckpoint`` per round truncates
lineage — without it round k re-executes rounds 1..k-1 (exponential
plan growth). The only driver-side values are the per-round
convergence scalar and the final model-sized result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from local_etl_spark.queries._util import t
from local_etl_spark.registry import query

DAMPING = 0.85
N_ITER = 12


def trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected weighted edges: supplier s traded with customer c.

    Node ids: suppliers as 's<k>', customers as 'c<k>'. Weight =
    revenue of the lines between them (used only for ranking flow,
    so plain double sums suffice — the driver check is rows-only).
    """
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_extendedprice")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pair = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_suppkey", "o_custkey")
        .agg(F.sum("l_extendedprice").alias("w"))
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("a"),
            F.concat(F.lit("c"), F.col("o_custkey")).alias("b"),
            "w",
        )
    )
    # undirected: emit both directions once, map-side
    return pair.select("a", "b", "w").unionAll(
        pair.select(F.col("b").alias("a"), F.col("a").alias("b"), "w")
    )


@query("graph_pagerank", family="graph", oracle=None)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the supplier↔customer trade graph
    (damping 0.85, 12 synchronous iterations — power iteration in
    DataFrame algebra):

        rank(v) ← (1-d)/N + d · Σ_{u→v} rank(u) · w(u,v)/outw(u)

    The symmetric edge construction leaves no dangling nodes, so the
    rank mass is conserved and the (1-d)/N teleport term is exact.
    Per iteration: one shuffle join of edges with the rank vector on
    the source id and one groupBy on the destination — both on node
    keys, so Catalyst reuses one partitioning; edges (with their
    precomputed outgoing-weight normalization) are computed once and
    persisted. Rows-only for the driver (iterative float fixpoint, not
    SQL-expressible); tests/test_graph.py checks convergence to a
    NumPy power iteration of the same matrix within 1e-9 and that
    total rank mass stays 1.
    """
    edges = trade_edges(spark, sf_dir)
    # normalize outgoing weights once: P(u→v) = w/outw(u)
    outw = edges.groupBy("a").agg(F.sum("w").alias("outw"))
    norm = (
        edges.join(outw, "a")
        .select("a", "b", (F.col("w") / F.col("outw")).alias("p"))
        .persist()
    )
    nodes = norm.select(F.col("a").alias("node")).distinct().persist()
    n_nodes = nodes.count()  # model-sized scalar (drives the teleport term)
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank")).localCheckpoint()
    for _ in range(N_ITER):
        contrib = (
            norm.join(ranks, norm.a == ranks.node)
            .groupBy(F.col("b").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("p")).alias("mass"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit((1.0 - DAMPING) / n_nodes)
                    + F.lit(DAMPING) * F.coalesce("mass", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    norm.unpersist()
    nodes.unpersist()
    return ranks.select(
        "node",
        "rank",
        F.substring("node", 1, 1).alias("kind"),
    )


@query(
    "graph_degree",
    family="graph",
    oracle="""
    WITH pair AS (
        SELECT l_suppkey, o_custkey,
               count(*) AS n_lines
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_suppkey, o_custkey
    ),
    deg AS (
        SELECT 's' || CAST(l_suppkey AS VARCHAR) AS node,
               count(*) AS degree, CAST(sum(n_lines) AS BIGINT) AS n_lines
        FROM pair GROUP BY l_suppkey
        UNION ALL
        SELECT 'c' || CAST(o_custkey AS VARCHAR) AS node,
               count(*) AS degree, CAST(sum(n_lines) AS BIGINT) AS n_lines
        FROM pair GROUP BY o_custkey
    )
    SELECT substr(node, 1, 1) AS kind, degree,
           count(*) AS n_nodes,
           CAST(sum(n_lines) AS BIGINT) AS total_lines
    FROM deg
    GROUP BY 1, 2
    """,
)
def graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the supplier↔customer trade graph: for
    each side of the bipartite graph, how many nodes have each degree
    (number of distinct counterparties) — the first diagnostic run on
    any graph before choosing partitioning (a power-law tail here is
    the skew that breaks naive edge-partitioned joins; cf.
    join_skew_salted). Exact counts end-to-end, so unlike
    graph_pagerank this one is SQL-oracled.

    Plan: the edge aggregate shuffles once on the (supp, cust) pair;
    both degree aggregates reuse subsets of that key, and the final
    histogram is distribution-sized. Nothing touches raw lineitem
    twice.
    """
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pair = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_suppkey", "o_custkey")
        .agg(F.count(F.lit(1)).alias("n_lines"))
        .persist()
    )
    sup = pair.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("degree"), F.sum("n_lines").alias("n_lines")
    ).select(F.lit("s").alias("kind"), "degree", "n_lines")
    cus = pair.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("degree"), F.sum("n_lines").alias("n_lines")
    ).select(F.lit("c").alias("kind"), "degree", "n_lines")
    return (
        sup.unionAll(cus)
        .groupBy("kind", "degree")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("n_lines").alias("total_lines"),
        )
    )
