"""Behavior + plan-shape tests for the pipeline ops in
queries/llm_pipeline.py (chunking, PII scrub, stratified sampling).
Oracle parity is covered by test_oracle_parity; these assert the
operator-specific properties the hash check can't express.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from local_etl_spark.queries.llm_pipeline import CHUNK, STRIDE
from local_etl_spark.registry import get

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = get(name).fn(spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_chunk_covers_every_token_with_overlap(spark):
    docs = get("llm_chunk").fn(spark, SF)
    stats = (
        docs.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.max("chunk_id").alias("last_id"),
            F.sum("n_tokens").alias("tok_with_overlap"),
            F.max("n_tokens").alias("max_tok"),
        )
        .collect()
    )
    for r in stats:
        assert r["max_tok"] <= CHUNK
        assert r["last_id"] == r["n_chunks"] - 1  # dense chunk ids
        # sum of chunk sizes = n_words + overlap regions ≥ n_words
        assert r["tok_with_overlap"] >= r["n_chunks"] * 1


def test_chunk_reconstructs_document_prefix(spark):
    # chunk 0 must be exactly the first CHUNK tokens of the doc
    row = (
        get("llm_chunk")
        .fn(spark, SF)
        .filter((F.col("doc_id") == 0) & (F.col("chunk_id") == 0))
        .collect()[0]
    )
    from local_etl_spark.catalog import table

    text = table(spark, SF, "documents").filter(F.col("doc_id") == 0).collect()[
        0
    ]["text"]
    assert row["chunk_text"] == " ".join(text.split(" ")[:CHUNK])
    # successive chunks start STRIDE tokens apart
    assert STRIDE < CHUNK  # overlap actually exists


def test_chunk_plan_has_no_shuffle(spark):
    plan = _plan(spark, "llm_chunk")
    assert "Exchange" not in plan, (
        "chunking must be map-side fan-out only; a shuffle here is a "
        "100 TB regression"
    )


def test_pii_scrub_masks_everything(spark):
    df = get("llm_pii_scrub").fn(spark, SF)
    assert df.filter((F.col("n_emails") != 1) | (F.col("n_phones") != 1)).count() == 0
    leaked = df.filter(
        F.col("scrubbed").rlike("[A-Za-z0-9._%+-]+@")
        | F.col("scrubbed").rlike("[0-9]{3}-[0-9]{3}-[0-9]{4}")
    )
    assert leaked.count() == 0
    assert df.filter(~F.col("scrubbed").contains("<EMAIL>")).count() == 0


def test_stratified_sample_is_10pct_per_stratum(spark):
    import math

    from local_etl_spark.catalog import table

    sample = get("llm_sample_stratified").fn(spark, SF)
    got = {r["lang"]: r["n"] for r in sample.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    want = {
        r["lang"]: math.ceil(0.1 * r["n"])
        for r in table(spark, SF, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_stratified_sample_is_deterministic(spark):
    a = {r["doc_id"] for r in get("llm_sample_stratified").fn(spark, SF).collect()}
    b = {r["doc_id"] for r in get("llm_sample_stratified").fn(spark, SF).collect()}
    assert a == b and a


def test_quality_classifier_matches_numpy(spark):
    """The distributed GD trainer must reproduce a NumPy full-batch
    logistic regression run on the IDENTICAL features: same zero init,
    lr, iteration count. Spark's partition-order gradient sums differ
    from numpy's pairwise sums only in low-order bits, so weights agree
    to ~1e-9 and predictions agree exactly; the engineered TTR label is
    linearly separable enough for >=0.95 train accuracy."""
    import numpy as np

    from local_etl_spark.queries.llm_text import (
        QC_ITERS,
        QC_LR,
        QC_NFEAT,
        _qc_features,
        _train_quality_logreg,
        _QC_WEIGHT_CACHE,
    )
    from local_etl_spark.queries._util import t
    from local_etl_spark.registry import get

    sf = "/root/testdata/sf0.01"
    rows = _qc_features(t(spark, sf, "documents")).collect()
    X = np.array([[r[f"x{i}"] for i in range(QC_NFEAT)] for r in rows])
    y = np.array([r["y"] for r in rows])
    w = np.zeros(QC_NFEAT)
    for _ in range(QC_ITERS):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        w = w - QC_LR * (X.T @ (p - y)) / len(y)

    _QC_WEIGHT_CACHE.pop(sf, None)  # force a real training run
    ws = np.array(_train_quality_logreg(spark, sf))
    assert np.allclose(ws, w, rtol=1e-7, atol=1e-9), (ws, w)

    out = {r["doc_id"]: r for r in get("llm_quality_classifier").fn(spark, sf).collect()}
    assert len(out) == len(rows)
    np_pred = (1.0 / (1.0 + np.exp(-(X @ w))) >= 0.5).astype(int)
    acc = 0
    for r, pred in zip(rows, np_pred):
        got = out[r["doc_id"]]
        assert got["predicted"] == pred, r["doc_id"]
        acc += int(got["predicted"] == got["label_high_quality"])
    assert acc / len(rows) >= 0.95, acc / len(rows)
    # training must actually have reduced the loss below the w=0 start
    p = 1.0 / (1.0 + np.exp(-(X @ w)))
    loss = -np.mean(y * np.log(p) + (1 - y) * np.log(1 - p))
    assert loss < np.log(2)


def test_skyline_matches_dominance_scan(spark):
    """win_skyline must equal a brute-force dominance scan: an order
    survives iff no other order is >= on both (price, date) with at
    least one strict inequality."""
    from local_etl_spark.queries._util import t
    from local_etl_spark.registry import get

    sf = "/root/testdata/sf0.001"
    rows = [
        (r["o_orderkey"], r["o_totalprice"], r["o_orderdate"])
        for r in t(spark, sf, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .collect()
    ]
    want = set()
    for k, p, d in rows:
        dominated = any(
            (p2 >= p and d2 >= d and (p2 > p or d2 > d))
            for _k2, p2, d2 in rows
        )
        if not dominated:
            want.add(k)
    got = {
        r["o_orderkey"] for r in get("win_skyline").fn(spark, sf).collect()
    }
    assert got == want
    assert got, "skyline unexpectedly empty"
