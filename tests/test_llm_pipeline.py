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


def test_quality_classifier_exact_integer_replay(spark):
    """The fixed-point GD trainer must reproduce a pure-Python replay
    EXACTLY (the graph_pagerank pattern): per iteration, per-row
    margins are the same left-assoc float chain, the sigmoid is
    CPython math.exp (the engine's Arrow stage uses exactly this —
    JVM Math.exp and numpy's vectorized exp are both non-libm,
    measured), contributions are half-away 1e-12 fixed-point ints,
    sums exact integers, updates the identical w − lr·(S/1e12)/n
    chain. Also pins the |S| « 2^53 margin that makes the oracle's
    cast-then-divide equal Python's int/float true division, plus
    separability (≥0.95 accuracy) and loss decrease."""
    import math

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

    def micro12(v: float) -> int:
        m = math.floor(abs(v) * 1e12 + 0.5)
        return -m if v < 0 else m

    def sigmoid(z: float) -> float:
        try:
            return 1.0 / (1.0 + math.exp(-z))
        except OverflowError:
            return 0.0

    sf = "/root/testdata/sf0.01"
    rows = _qc_features(t(spark, sf, "documents")).collect()
    X = [[r[f"x{i}"] for i in range(QC_NFEAT)] for r in rows]
    y = [r["y"] for r in rows]
    n = len(rows)
    w = [0.0] * QC_NFEAT
    max_s = 0
    for _ in range(QC_ITERS):
        sums = [0] * QC_NFEAT
        for xr, yr in zip(X, y):
            z = 0.0
            for i in range(QC_NFEAT):
                z = z + w[i] * xr[i]
            g = sigmoid(z) - yr
            for i in range(QC_NFEAT):
                sums[i] += micro12(g * xr[i])
        max_s = max(max_s, max(abs(s) for s in sums))
        w = [w[i] - QC_LR * (sums[i] / 1e12) / n for i in range(QC_NFEAT)]
    # margin pin: every gradient sum far below 2^53, so the oracle's
    # CAST(S AS DOUBLE)/1e12 is exact and equals Python's S/1e12
    assert max_s < 2**52, max_s

    _QC_WEIGHT_CACHE.pop(sf, None)  # force a real training run
    ws = _train_quality_logreg(spark, sf)
    assert ws == w, (ws, w)  # EXACT equality — no tolerance

    out = {
        r["doc_id"]: r
        for r in get("llm_quality_classifier").fn(spark, sf).collect()
    }
    assert len(out) == len(rows)
    acc = 0
    for r, xr in zip(rows, X):
        z = 0.0
        for i in range(QC_NFEAT):
            z = z + w[i] * xr[i]
        p = sigmoid(z)
        got = out[r["doc_id"]]
        assert got["predicted"] == (1 if p >= 0.5 else 0), r["doc_id"]
        assert got["score"] == math.floor(p * 1e6 + 0.5) / 1e6
        acc += int(got["predicted"] == got["label_high_quality"])
    assert acc / len(rows) >= 0.95, acc / len(rows)
    # training must actually have reduced the loss below the w=0 start
    Xn, yn = np.array(X), np.array(y)
    p = 1.0 / (1.0 + np.exp(-(Xn @ np.array(w))))
    loss = -np.mean(yn * np.log(p) + (1 - yn) * np.log(1 - p))
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
