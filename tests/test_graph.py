"""graph_pagerank ≡ NumPy power iteration on the same matrix."""

from __future__ import annotations

import numpy as np

from local_etl_spark.queries.graph import DAMPING, N_ITER, graph_pagerank, trade_edges

SF = "/root/testdata/sf0.001"


def test_pagerank_matches_numpy_power_iteration(spark):
    edges = trade_edges(spark, SF).collect()
    nodes = sorted({r["a"] for r in edges} | {r["b"] for r in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    W = np.zeros((n, n))
    for r in edges:
        W[idx[r["a"]], idx[r["b"]]] += r["w"]
    P = W / W.sum(axis=1, keepdims=True)  # row-stochastic (no dangling)
    rank = np.full(n, 1.0 / n)
    for _ in range(N_ITER):
        rank = (1.0 - DAMPING) / n + DAMPING * (P.T @ rank)

    got = {r["node"]: r["rank"] for r in graph_pagerank(spark, SF).collect()}
    assert set(got) == set(nodes)
    # mass conserved (no dangling nodes): Σrank = 1
    assert abs(sum(got.values()) - 1.0) < 1e-9
    diff = max(abs(got[nd] - rank[idx[nd]]) for nd in nodes)
    assert diff < 1e-9, diff
    # sanity: ranking is non-degenerate
    assert len({round(v, 12) for v in got.values()}) > n // 2


def test_kcore_matches_reference_peel(spark):
    """graph_kcore must equal a driver-side iterative peel of the same
    edge set: repeatedly delete nodes with degree < k until stable."""
    from local_etl_spark.queries.graph import KCORE_K, trade_edges
    from local_etl_spark.registry import get

    sf = "/root/testdata/sf0.01"
    edges = {
        (r["a"], r["b"])
        for r in trade_edges(spark, sf).select("a", "b").distinct().collect()
    }
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    while True:
        drop = {n for n, nb in adj.items() if len(nb) < KCORE_K}
        if not drop:
            break
        for n in drop:
            adj.pop(n)
        for nb in adj.values():
            nb.difference_update(drop)
    got = {r["node"] for r in get("graph_kcore").fn(spark, sf).collect()}
    assert got == set(adj)
    assert got, "k-core unexpectedly empty at k=3"
