"""Similarity-search invariants beyond the oracle hash-check."""

from __future__ import annotations

from local_etl_spark.registry import get

SF = "/root/testdata/sf0.01"


def test_ivf_recall_and_exactness(spark):
    """IVF probe must (a) return exact scores for what it returns and
    (b) recall at least half of the true top-10 with 4/16 cells probed
    on ~uniform vectors."""
    exact = {
        r["vec_id"]: r["score"]
        for r in get("llm_simsearch").fn(spark, SF).collect()
    }
    approx = {
        r["vec_id"]: r["score"]
        for r in get("llm_simsearch_ivf").fn(spark, SF).collect()
    }
    for vid, score in approx.items():
        if vid in exact:
            assert score == exact[vid]
    recall = len(set(approx) & set(exact)) / len(exact)
    assert recall >= 0.5, f"IVF recall {recall}"


def test_knn_join_k_per_query(spark):
    df = get("llm_knn_join").fn(spark, SF)
    counts = {r["qid"]: r["n"] for r in df.groupBy("qid").count().withColumnRenamed("count", "n").collect()}
    assert all(n == 3 for n in counts.values())
    assert len(counts) == 5  # vec_ids 0,100,200,300,400 at sf0.01


def test_approx_count_distinct_tolerance(spark):
    """SURVEY §2.4-E: HLL estimate within 5% of exact (impls differ
    across engines, so this replaces the hash check)."""
    row = get("agg_approx_cd").fn(spark, SF).collect()[0]
    assert abs(row["approx_orders"] - row["exact_orders"]) <= 0.05 * row["exact_orders"]


def test_sketch_rollup_merge_accuracy(spark):
    """Merged per-nation HLL sketches must estimate each region's
    distinct customers within 5% of the exact count."""
    for r in get("agg_sketch_rollup").fn(spark, SF).collect():
        assert abs(r["approx_custs"] - r["exact_custs"]) <= max(
            1, 0.05 * r["exact_custs"]
        )
