"""Engine-wide physical-plan audit: every registered query's plan is
checked for the anti-patterns that are invisible at test scale but
fatal at 100 TB.

  - CartesianProduct / BroadcastNestedLoopJoin: only queries that
    genuinely need one (declared cross/theta joins) may contain it.
  - BatchEvalPython (row-at-a-time Python): never allowed anywhere.
  - ArrowEvalPython / mapInPandas / FlatMapGroupsInPandas: only the
    UDF-surface and multimodal queries may ship rows to Python.
  - Unpartitioned Window nodes (single-partition WindowExec — the
    whole input through ONE task): only windows over provably bounded
    relations (result-sized ranks, day/month grids) are allowed;
    corpus-sized exact ranks go through _util.ordered_prefix instead.

Per-query plan-shape assertions live in test_plan_shape.py; this file
is the blanket rule so a NEW query can't quietly regress.
"""

from __future__ import annotations

import pytest

from local_etl_spark import registry
from local_etl_spark.plancheck import unpartitioned_windows

SF = "/root/testdata/sf0.001"

registry._load_all_modules()
SPECS = sorted(registry.REGISTRY.values(), key=lambda s: s.name)

# queries whose SEMANTICS are a product/non-equi pair enumeration
ALLOW_NESTED_LOOP = {
    "join_cross",  # cartesian by definition
    "join_theta",  # non-equi inequality join (BNLJ w/ broadcast)
    "win_mann_kendall",  # day-pair sign join over the CALENDAR-BOUNDED
    # day grid (~n_days² pairs, grid-sized, never data-sized)
    "join_asof",  # union trick keeps it equi, but guard the alternative
    "llm_knn_join",  # bounded query-side broadcast enumeration
    "llm_hard_negatives",  # same shape: anchor-side broadcast enumeration
    # (IVF cell-probe prefilter is the scale path, as with knn)
    "llm_dedup_embed",  # all-pairs cosine at oracle scale (IVF is the scale path)
    "llm_simsearch",  # scalar query-vector broadcast
    "llm_simsearch_ivf",
    "llm_retrieval_eval",  # same 1-row query-vector broadcast feeding
    # the per-system TakeOrdered shortlists
    "llm_ivf_partitioned",  # same 1-row query-vector broadcast as ivf
    "llm_tfidf",  # 1-row broadcast scalar parameter (corpus size N) —
    # a BNLJ against one broadcast row, not a pair enumeration
    "llm_bm25",  # same shape: 1-row broadcast stats (N, avgdl, df)
    "sink_zorder",  # same shape: 1-row broadcast min/max dimension stats
    "llm_shard_assign",  # same shape: 1-row broadcast corpus total for
    # the load-factor denominator
    "llm_dsir_weight",  # same shape: 1-row broadcast LM scalars (Nt, Ns, V)
    "agg_permutation_test",  # same shape: 1-row broadcast observed
    # statistic + exceed count (the null distribution itself is K rows)
    "agg_power_mde",  # 1-row-per-group closed form (the welch_t shape)
    "llm_dedup_eval",  # 1-row metric-count broadcasts per system
    "llm_dedup_threshold_sweep",  # 5-row threshold-table broadcast
    # theta-joined against the pair set (bounded enumeration)
    "agg_uplift_qini",  # 10-row decile-table cumulative self theta-join
    "agg_meta_analysis",  # 1-row pooled-effect broadcast feeding the
    # Q-statistic residual fold (k-row stream side)
    "llm_lm_kneser_ney",  # same shape: 1-row broadcast bigram type count
    "llm_quality_buckets",  # same shape: 1-row broadcast corpus token
    # total onto the 5-row bucket aggregate (epochs denominator)
    "agg_welch_t",  # 1-row × 1-row group-pair product (test statistic)
    "agg_tost",  # same shape: 1-row × 1-row priority pair (TOST stats)
    "agg_cohens_d",  # same shape: 1-row × 1-row priority pair (effect size)
    "agg_mmd_poly",  # same shape: 1-row × 1-row arm-moment pair (the
    # closed-form kernel statistic)
    "agg_gst_obrien_fleming",  # 5-row looks-table broadcast theta-join
    # placing the interim analyses (the llm_dedup_threshold_sweep
    # shape: bounded literal enumeration, never data×data)
    "etl_freshness_sla",  # 1-row corpus-max broadcast onto the
    # per-stream high-water aggregate
    "llm_ppl_filter_sweep",  # 5-row keep-pct table theta-joined
    # against the ranked corpus + 1-row token-total broadcast (the
    # llm_dedup_threshold_sweep shape)
    "agg_chi2",  # 1-row broadcast total + distinct-counts onto the
    # contingency-table aggregate
    "agg_benford",  # 1-row broadcast digit-count total
    "llm_mix_temperature",  # 1-row broadcast total + normalizer scalars
    "agg_pareto",  # 1-row broadcast total-revenue denominator
    "agg_ks_test",  # 1-row broadcast (n1, n2) sample-size scalars
    "agg_theil",  # 1-row broadcast (N, total) mean scalars
    "llm_mix_capped",  # 1-row broadcast totals + capped-mass scalars
    "sql_table_fn",  # 5-row broadcast TVF bucket spine, range-banded
    # by definition (the spine IS the dimension)
    "llm_simsearch_pq",  # 1-row broadcast query vector for the exact
    # re-rank of the model-sized ADC shortlist (the llm_simsearch shape)
    "llm_embedding_drift",  # three 1-row broadcast summary relations
    # (L2-of-shift scalar, base norm stats, new norm stats) crossed
    # onto the 64-row per-dim table — never data×data (round 12)
    "win_theil_sen",  # day-pair slope join over the CALENDAR-BOUNDED
    # day grid (grid-sized, never data-sized — the win_mann_kendall
    # class)
    "win_pettitt",  # split-point × day-pair join over the same
    # calendar-bounded grid; plus a 1-row n_days broadcast
    "win_kaplan_meier",  # death-time-grid ≤-joins (at-risk counts +
    # running product) — the same calendar-bounded quadratic class;
    # plus a 1-row max-day broadcast
    "win_acf",  # 7-row lag spine × day grid (calendar-bounded) + a
    # 1-row moments broadcast
    "agg_heavy_hitters",  # 1-row broadcast token total joined to the
    # candidate-only exact recount
    "agg_jackknife_ratio",  # 1-row broadcast totals / jk_mean joined
    # to the JK_BUCKETS-sized replica table
    "agg_cuped",  # 1-row broadcast (n, Σx, Σy) joined back for the
    # centered folds
    "llm_kl_shift",  # 1-row broadcast global token total for the
    # p_global denominator
    "agg_lorenz",  # 1-row broadcast revenue total for the cumulative
    # share denominator
    "agg_mutual_information",  # 1-row broadcast joint total for the
    # p(l,s) denominator
    "agg_fdr_bh",  # two 1-row broadcasts (m_tests count, BH cut rank)
    # joined to the m-row (one per hypothesis) ranked table
    "llm_ann_ivf_incremental",  # same shape: 1-row base/new totals
    # broadcast onto the 16-row cell census (share denominators)
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
    "llm_image_phash",  # perceptual-hash kernel over the real pixel
    # planes (Arrow-batched mapInPandas, the media-codec contract);
    # banding/verify stay JVM-side
    "llm_audio_fingerprint",  # energy-envelope fingerprint kernel over
    # the real PCM streams (same media-codec contract as image_phash);
    # banding/census stay JVM-side
    "agg_heavy_hitters",  # Misra–Gries counters are partition-local
    # sequential state by definition — one Arrow pass, O(k) memory;
    # the summary merge is relational
    "udf_cogrouped",  # two-sided Arrow surface (FlatMapCoGroupsInPandas)
    # SRP hashing is one numpy matmul per Arrow batch by design — the
    # JVM per-row alternative is ~192 interpreted HOF folds/row
    "llm_dedup_lsh_cosine",
    # distributed footer reads: pyarrow opens each file's FOOTER only
    # (KBs) inside mapInPandas — there is no JVM surface for parquet
    # metadata, and the row data is never touched
    "scan_parquet_footer",
    # per-word Viterbi DP with the vocab-sized model in the Arrow
    # closure — inherently sequential per word, runs once per DISTINCT
    # (lang, word), the same contract as the unigram trainer's E-step
    "llm_unigram_apply",
    # best-fit-decreasing is inherently order-sequential; one
    # applyInPandas group per (lang, source) stratum over ids+lengths
    # only (few large groups — the regime where per-group pandas
    # overhead amortizes)
    "llm_pack_bfd",
    # r13 conversion: the logistic trainer's sigmoid is DELIBERATELY
    # staged through Arrow — CPython math.exp ≡ DuckDB exp (libm)
    # where JVM Math.exp is 1-ulp off (SCALE.md §20.1) — so the
    # cross-engine oracle exists at all; one pandas pass per GD
    # iteration over the feature relation, everything else JVM
    "llm_quality_classifier",
    # tri-channel census rides the media codec kernels (image aHash /
    # audio energy dHash — the same Arrow-batched media contract as
    # llm_image_phash / llm_audio_fingerprint); text simhash, banding
    # and the census joins stay JVM-side
    "llm_dedup_cross_modal",
}


# queries allowed an unpartitioned Window: every entry's window input
# is bounded by something other than the corpus size, so the one-task
# sort can never grow past it (VERDICT r3 item 6 allowlist).
ALLOW_GLOBAL_WINDOW = {
    "sort_multi",  # the emitted global position IS the query's output
    "llm_bpe_pairs",  # 20-row rank over the already-heaped top pairs
    "agg_autocorr",  # lag over the per-DAY aggregate (calendar-bounded)
    "etl_drift_psi",  # totals over the 8-bucket PSI histogram
    "sql_window_rollup",  # running total over the MONTH grid (12/yr)
    "win_drawdown",  # cum P&L over the per-day net (calendar-bounded)
    "win_interpolate",  # gap-fill over the per-day series (calendar-bounded)
    "win_seasonal_decompose",  # trend frame over the per-day series
    # (calendar-bounded day grid, same class as win_interpolate)
    "win_seasonality_strength",  # same decompose trend frame over the
    # calendar-bounded day grid (round 11)
    "agg_fdr_bh",  # BH rank over the m-row hypothesis table (one row
    # per event_type — hypothesis-family-bounded, never data-sized)
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
    if spec.name not in ALLOW_GLOBAL_WINDOW:
        hits = unpartitioned_windows(plan)
        assert not hits, (
            f"{spec.name}: unpartitioned Window (single task at scale):"
            f" {hits} — use _util.ordered_prefix or justify in"
            " ALLOW_GLOBAL_WINDOW"
        )
