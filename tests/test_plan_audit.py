"""Engine-wide physical-plan audit: every registered query's plan is
checked for the anti-patterns that are invisible at test scale but
fatal at 100 TB.

  - CartesianProduct / BroadcastNestedLoopJoin: only queries that
    genuinely need one (declared cross/theta joins) may contain it.
  - BatchEvalPython (row-at-a-time Python): never allowed anywhere.
  - ArrowEvalPython / mapInPandas / FlatMapGroupsInPandas: only the
    UDF-surface and multimodal queries may ship rows to Python.

Per-query plan-shape assertions live in test_plan_shape.py; this file
is the blanket rule so a NEW query can't quietly regress.
"""

from __future__ import annotations

import pytest

from local_etl_spark import registry

SF = "/root/testdata/sf0.001"

registry._load_all_modules()
SPECS = sorted(registry.REGISTRY.values(), key=lambda s: s.name)

# queries whose SEMANTICS are a product/non-equi pair enumeration
ALLOW_NESTED_LOOP = {
    "join_cross",  # cartesian by definition
    "join_theta",  # non-equi inequality join (BNLJ w/ broadcast)
    "join_asof",  # union trick keeps it equi, but guard the alternative
    "llm_knn_join",  # bounded query-side broadcast enumeration
    "llm_dedup_embed",  # all-pairs cosine at oracle scale (IVF is the scale path)
    "llm_simsearch",  # scalar query-vector broadcast
    "llm_simsearch_ivf",
    "llm_tfidf",  # 1-row broadcast scalar parameter (corpus size N) —
    # a BNLJ against one broadcast row, not a pair enumeration
    "llm_bm25",  # same shape: 1-row broadcast stats (N, avgdl, df)
    "sink_zorder",  # same shape: 1-row broadcast min/max dimension stats
    "llm_shard_assign",  # same shape: 1-row broadcast corpus total for
    # the load-factor denominator
    "llm_dsir_weight",  # same shape: 1-row broadcast LM scalars (Nt, Ns, V)
    "llm_lm_kneser_ney",  # same shape: 1-row broadcast bigram type count
    "agg_welch_t",  # 1-row × 1-row group-pair product (test statistic)
    "agg_chi2",  # 1-row broadcast total + distinct-counts onto the
    # contingency-table aggregate
    "agg_benford",  # 1-row broadcast digit-count total
    "llm_mix_temperature",  # 1-row broadcast total + normalizer scalars
    "agg_pareto",  # 1-row broadcast total-revenue denominator
    "agg_ks_test",  # 1-row broadcast (n1, n2) sample-size scalars
    "sql_table_fn",  # 5-row broadcast TVF bucket spine, range-banded
    # by definition (the spine IS the dimension)
}

# queries whose CONTRACT is running Python (UDF surface, media decode)
ALLOW_PYTHON = {
    "udf_scalar",
    "udf_grouped",
    "udf_table",
    "llm_media_decode",
    "llm_media_framesample",
    "udf_arrow",
    "stream_stateful",
    # round-3 real-codec kernels (Arrow-batched mapInPandas by contract)
    "llm_media_resize",
    "llm_audio_features",
    "llm_video_scenes",
    "udf_cogrouped",  # two-sided Arrow surface (FlatMapCoGroupsInPandas)
}


def _plan(spark, spec) -> str:
    df = spec.fn(spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_no_scale_antipatterns(spark, spec):
    plan = _plan(spark, spec)
    if spec.name not in ALLOW_NESTED_LOOP:
        assert "CartesianProduct" not in plan, (
            f"{spec.name}: unplanned cartesian product"
        )
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{spec.name}: unplanned nested-loop join"
        )
    assert "BatchEvalPython" not in plan, (
        f"{spec.name}: row-at-a-time Python UDF in plan (use pandas_udf)"
    )
    if spec.name not in ALLOW_PYTHON:
        for node in (
            "ArrowEvalPython",
            "FlatMapGroupsInPandas",
            "MapInPandas",
            "MapInArrow",
        ):
            assert node not in plan, (
                f"{spec.name}: unexpected Python stage {node}"
            )
