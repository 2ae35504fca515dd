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
