"""Plan-shape assertions (SURVEY.md §5.2.4): the optimizations the
engine is designed around must be visible in the physical plan, not
assumed. A regression here is a 100×-at-scale problem even when the
sf0.001 result is still correct.
"""

from __future__ import annotations

import pytest

from local_etl_spark.registry import get

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = get(name).fn(spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_scan_parquet_pushdown_and_pruning(spark):
    plan = _plan(spark, "scan_parquet")
    assert "GreaterThanOrEqual(l_shipdate" in plan, "filter not pushed to scan"
    assert "GreaterThan(l_extendedprice" in plan
    # column pruning: the scan must read exactly the 3 referenced columns
    assert (
        "ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double,"
        "l_shipdate:timestamp_ntz>" in plan
    ), "scan reads more columns than the query references"


def test_dimension_joins_broadcast(spark):
    plan = _plan(spark, "join_broadcast")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, "dim join fell back to SMJ"


def test_multiway_star_all_broadcast(spark):
    # region→nation→customer→orders star: every dim side fits the
    # 64 MB threshold, so NO shuffle join should appear anywhere
    plan = _plan(spark, "join_multiway")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_topk_uses_heap_not_global_sort(spark):
    plan = _plan(spark, "llm_simsearch")
    assert "TakeOrderedAndProject" in plan, (
        "top-k compiled to a global sort instead of per-partition heaps"
    )


def test_groupby_has_partial_aggregation(spark):
    plan = _plan(spark, "agg_groupby")
    assert "partial_sum" in plan or "partial_count" in plan, (
        "no map-side combine before the shuffle"
    )


def test_simsearch_stays_jvm_side(spark):
    # the cosine fold must be codegen'd expressions, not a Python UDF
    plan = _plan(spark, "llm_simsearch")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


@pytest.mark.parametrize(
    "name", ["llm_text_stats", "llm_quality_score", "llm_lang_id"]
)
def test_text_ops_stay_jvm_side(spark, name):
    plan = _plan(spark, name)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bucketed_join_has_no_shuffle(spark):
    """The whole point of join_bucketed: with both sides bucketed+sorted
    on the key, the SortMergeJoin reads buckets directly — no Exchange
    on either input. Broadcast is disabled so the tiny test tables
    exercise the same plan a 100 TB fact-fact join would."""
    from local_etl_spark.queries.joins_scale import _ensure_bucketed

    li_name, o_name = _ensure_bucketed(spark, SF)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li, o = spark.table(li_name), spark.table(o_name)
        df = li.join(o, li.l_orderkey == o.o_orderkey)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join still shuffles"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_range_banded_is_equi_join(spark):
    # the whole point of banding: the interval join must compile to an
    # equi join on the band key, never a nested-loop/cartesian
    plan = _plan(spark, "join_range_banded")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan) or (
        "ShuffledHashJoin" in plan
    )


# --- TPC-H-adapted SQL suite (queries/sql_tpch.py) -----------------------


def test_tpch_q5_star_is_all_broadcast(spark):
    # 6-table star: every dimension side is below the broadcast
    # threshold, so the only Exchanges should belong to the final
    # aggregate/sort — never a shuffle join.
    plan = _plan(spark, "sql_q5")
    # formatted explain prints each node in tree + detail section
    assert plan.count("BroadcastHashJoin") >= 5
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "EqualTo(r_name,ASIA)" in plan, "region filter not pushed to scan"


def test_tpch_q6_filters_reach_scan(spark):
    plan = _plan(spark, "sql_q6")
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_quantity" in plan
    # pure scan+agg: no join of any kind
    assert "Join" not in plan


def test_tpch_q17_correlated_avg_decorrelates(spark):
    # the per-part scalar avg subquery must decorrelate to an aggregate
    # + join, not re-execute per outer row
    plan = _plan(spark, "sql_q17")
    assert "Join" in plan
    assert "EqualTo(p_brand,Brand#1)" in plan, "part filter not pushed"


def test_tpch_q21_exists_become_semi_anti_joins(spark):
    plan = _plan(spark, "sql_q21")
    assert "LeftSemi" in plan, "EXISTS did not plan as a semi join"
    assert "LeftAnti" in plan, "NOT EXISTS did not plan as an anti join"
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_tpch_q18_in_subquery_semi_join(spark):
    plan = _plan(spark, "sql_q18")
    assert "LeftSemi" in plan, "IN-subquery did not plan as a semi join"
    assert "CartesianProduct" not in plan


def test_repetition_is_map_only(spark):
    # the whole point of the in-row fold: no explode, no shuffle —
    # the operator must run entirely inside the scan stage
    plan = _plan(spark, "llm_repetition")
    assert "Exchange" not in plan, "repetition fold fell back to a shuffle"
    assert "Generate" not in plan, "repetition materialized an explode"


def test_pack_sequences_single_stratum_exchange(spark):
    # simple mode: one line per node, so Exchange counts are exact
    # (formatted mode prints every node twice — tree + details)
    df = get("llm_pack_sequences").fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, (
        "packing should shuffle exactly once (onto the strata)"
    )


def test_contamination_broadcasts_eval_side(spark):
    plan = _plan(spark, "llm_contamination")
    assert "BroadcastHashJoin" in plan, "eval-side gram join not broadcast"
    assert "SortMergeJoin" not in plan


def test_filter_pipeline_is_map_only(spark):
    plan = _plan(spark, "llm_filter_pipeline")
    assert "Exchange" not in plan, "quality filter fell back to a shuffle"


def test_minmax_by_is_partial_agg(spark):
    # argmax must partial-aggregate (shuffle ships one champion per
    # group per partition, never the raw rows); nation side broadcasts
    plan = _plan(spark, "agg_minmax_by")
    assert "partial_max_by" in plan, (
        "max_by lost map-side partial aggregation"
    )
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_exists_flag_plans_existence_join(spark):
    # EXISTS-as-column must decorrelate to ExistenceJoin (bit-emitting
    # semi-join) — never a row-multiplying outer join + aggregate
    plan = _plan(spark, "join_exists_flag")
    assert "ExistenceJoin" in plan
    assert "HashAggregate" not in plan, (
        "existence flag fell back to join+aggregate"
    )


def test_token_entropy_is_map_only(spark):
    # the run-length fold must run on the scan — zero shuffles
    plan = _plan(spark, "llm_token_entropy")
    assert "Exchange" not in plan, "token entropy introduced a shuffle"
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ngram_freq_uses_heap_topk(spark):
    plan = _plan(spark, "llm_ngram_freq")
    assert "TakeOrderedAndProject" in plan, (
        "corpus top-k compiled to a global sort"
    )


def test_scd2_single_shuffle(spark):
    # SCD2 build = one hash-partitioning exchange on the dimension key
    import re

    plan = _plan(spark, "etl_scd2")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_bm25_docs_side_never_hash_shuffles(spark):
    # BM25's only exchange is the 1-row global stats aggregate; the
    # docs side re-reads the scan and joins the broadcast stats — no
    # hash-partitioning of the corpus anywhere
    import re

    plan = _plan(spark, "llm_bm25")
    assert "BroadcastNestedLoopJoin" in plan
    assert "hashpartitioning" not in plan, (
        "BM25 shuffled the corpus; stats must broadcast instead"
    )


def test_compaction_reduces_files(spark):
    # the whole point: 64 splinter files in, a handful out, same rows
    import glob
    import os

    from local_etl_spark.queries.scans import _cache_dir

    get("sink_compaction").fn(spark, SF).count()
    frag = glob.glob(os.path.join(_cache_dir(SF, "events_fragmented"), "part-*"))
    comp = glob.glob(os.path.join(_cache_dir(SF, "events_compacted"), "part-*"))
    assert len(frag) == 64
    assert 1 <= len(comp) <= 4


def test_funnel_reuses_user_partitioning(spark):
    # all shuffles key on user_id; joins must not add nested loops and
    # the exchange count stays bounded (partitioning reuse, no blow-up)
    import re

    plan = _plan(spark, "agg_funnel")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 5


def test_zorder_clusters_files(spark):
    # after the Z-order rewrite each file must cover a narrow user_id
    # span: the sum of per-file spans stays well under n_files × the
    # global span (un-clustered writes give every file ~the full span)
    import glob
    import os

    from local_etl_spark.queries.scans import _cache_dir

    get("sink_zorder").fn(spark, SF).count()
    files = glob.glob(os.path.join(_cache_dir(SF, "events_zorder"), "part-*"))
    assert len(files) >= 4
    spans = []
    lo_g, hi_g = None, None
    for f in files:
        row = spark.read.parquet(f).agg(
            {"user_id": "min"}
        ).collect()[0][0], spark.read.parquet(f).agg({"user_id": "max"}).collect()[0][0]
        spans.append(row[1] - row[0])
        lo_g = row[0] if lo_g is None else min(lo_g, row[0])
        hi_g = row[1] if hi_g is None else max(hi_g, row[1])
    global_span = hi_g - lo_g
    assert sum(spans) < 0.75 * len(files) * global_span, (
        f"files not clustered: spans={spans}, global={global_span}"
    )


def test_curate_e2e_single_shuffle(spark):
    # four curation stages, ONE exchange: only the dedup window on
    # sha2(norm) moves data; filter + chunk fan-out stay map-side
    import re

    plan = _plan(spark, "llm_curate_e2e")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dpp_prunes_fact_partitions_at_runtime(spark):
    """join_dpp's fact scan must carry a dynamicpruningexpression in its
    PartitionFilters — the dim-side month-coverage filter cannot be
    evaluated statically, so only runtime pruning can skip the partial
    boundary year's directory."""
    plan = _plan(spark, "join_dpp")
    assert "dynamicpruningexpression(ship_year" in plan, (
        "fact scan is not dynamically partition-pruned"
    )
    # the dim side must broadcast (DPP reuses its exchange as the filter)
    assert "BroadcastHashJoin" in plan


def test_tfidf_vocab_broadcast_branches_on_corpus_size(spark, monkeypatch):
    """llm_tfidf force-broadcasts the vocab df table only while the
    source corpus is under VOCAB_BROADCAST_CORPUS_BYTES; past the cutoff
    the join is unhinted so AQE sizes the aggregate at runtime (a forced
    open-vocab broadcast could exceed executor memory at 100 TB). Both
    shapes must be visible in the plan."""
    from local_etl_spark.queries import llm_text

    # disable stats-based auto-broadcast so the HINT's presence/absence
    # is the only thing deciding the join strategy in the static plan
    # (at sf0.001 the size estimate would otherwise broadcast anyway)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # small corpus (the real sf0.001 footprint): hint forces BHJ
        plan = _plan(spark, "llm_tfidf")
        assert "BroadcastHashJoin" in plan

        # pretend the corpus is huge: hint dropped → static plan keeps
        # the shuffle join (AQE may still convert at runtime from the
        # ACTUAL aggregate size — that's the point of the branch)
        monkeypatch.setattr(llm_text, "_corpus_bytes", lambda *a, **k: 1 << 50)
        df = llm_text.llm_tfidf(spark, SF)
        plan_big = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "SortMergeJoin" in plan_big or "ShuffledHashJoin" in plan_big
        # the 1-row corpus-count broadcast is unconditional (hinted)
        assert "BroadcastNestedLoopJoin" in plan_big or "BroadcastHashJoin" in plan_big
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bloom_join_prunes_fact_rows_at_runtime(spark):
    """join_bloom's fact scan must carry a might_contain(l_orderkey)
    runtime filter fed by a bloom_filter_agg over the filtered dim side —
    row-level pruning BEFORE the exchange, the non-partition-key sibling
    of DPP. Without it every fact row crosses the shuffle just to be
    dropped by the join."""
    plan = _plan(spark, "join_bloom")
    assert "might_contain" in plan, "no runtime bloom filter on the fact scan"
    assert "bloom_filter_agg" in plan, "no bloom creation aggregate"


def test_interval_overlap_is_equi_join(spark):
    # the day band must make the interval-interval join an EQUI join
    # with residual filters — never a nested-loop interval scan
    plan = _plan(spark, "join_interval_overlap")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan) or (
        "ShuffledHashJoin" in plan
    )


def test_bpe_pairs_preaggregates_and_heaps(spark):
    # in-row run-length fold must partial-aggregate before the vocab
    # shuffle, and the final top-k must be per-partition heaps
    plan = _plan(spark, "llm_bpe_pairs")
    assert "partial_sum" in plan, "pair counts lost map-side combine"
    assert "TakeOrderedAndProject" in plan, "top-k compiled to global sort"


def test_corr_matrix_single_aggregate_pass(spark):
    # all nine cross-moments must come from ONE aggregation over ONE
    # scan — a second lineitem scan would double the 100 TB cost
    import re

    df = get("agg_corr_matrix").fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1 or plan.count("Scan parquet") == 1, (
        "corr matrix scans its input more than once"
    )


def test_triangle_enumeration_stays_equi(spark):
    plan = _plan(spark, "graph_triangles")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_collate_groups_without_normalization_projection(spark):
    # the collation must live inside the aggregate's key comparison —
    # one partial+final hash aggregate, same as any groupBy
    plan = _plan(spark, "fn_collate")
    assert "HashAggregate" in plan or "SortAggregate" in plan
    assert "BatchEvalPython" not in plan


def test_drawdown_sorts_days_not_events(spark):
    # the ordered windows must sit ABOVE the day aggregate: exactly one
    # aggregate pass over the raw stream before any Window node
    df = get("win_drawdown").fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    agg_pos = plan.find("HashAggregate")
    win_pos = plan.find("Window")
    assert win_pos >= 0 and agg_pos >= 0
    # in executedPlan string, downstream operators print FIRST — the
    # Window must appear before (above) the aggregate in the tree
    assert win_pos < plan.rfind("HashAggregate"), (
        "window not above the day aggregate"
    )


def test_aes_ciphertext_is_real(spark):
    """fn_aes's oracle can only see the identity round trip; this pins
    that encryption actually happened: ciphertext != plaintext bytes,
    and GCM framing adds exactly 12 IV + 16 tag bytes over the
    plaintext length."""
    from pyspark.sql import functions as F

    from local_etl_spark.queries._util import t as tbl
    from local_etl_spark.queries.functions import AES_KEY

    s = tbl(spark, SF, "supplier").select("s_suppkey", "s_name").limit(20)
    rows = s.select(
        "s_name",
        F.expr(f"aes_encrypt(s_name, '{AES_KEY}')").alias("ct"),
    ).collect()
    assert rows
    for r in rows:
        pt = r["s_name"].encode()
        assert bytes(r["ct"]) != pt
        assert len(r["ct"]) == len(pt) + 12 + 16


def _simple_plan(spark, name: str) -> str:
    return get(name).fn(spark, SF)._jdf.queryExecution().executedPlan().toString()


def test_sessionize_single_exchange(spark):
    """win_sessionize's claim: lag-flag, running-sum and the final
    session aggregate all key on user_id, so the whole operator rides
    ONE hash exchange and no global window appears."""
    plan = _simple_plan(spark, "win_sessionize")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange hashpartitioning(user_id" in plan
    import re

    specs = re.findall(r"windowspecdefinition\(([^,]+),", plan)
    assert specs and all(s.startswith("user_id") for s in specs), specs


def test_sessionize_split_row_identical(spark):
    """win_sessionize_split is win_sessionize's boundary-split skew
    mitigation (SCALE.md §16.3, VERDICT r8 #6) — same semantics by
    construction, so the row sets must be identical."""
    a = sorted(map(tuple, get("win_sessionize").fn(spark, SF).collect()))
    b = sorted(
        map(tuple, get("win_sessionize_split").fn(spark, SF).collect())
    )
    assert a == b


def test_sessionize_split_hot_task_bound(spark):
    """The split variant's scale claim: phase 1 windows partition by
    (user_id, day) — the hot task is bounded by one DAY of one user's
    events — and phase 2 (per-user stitch) runs over the (user, day,
    island) session-summary aggregate, never the raw event rows."""
    import re

    plan = _simple_plan(spark, "win_sessionize_split")
    # phase-1 lag + running sum both partition by (user_id, day)
    assert re.search(
        r"windowspecdefinition\(user_id#\d+L?, day#\d+", plan
    ), "phase-1 window not split by day"
    # the stitch is fed by the split-summary aggregate
    assert re.search(
        r"HashAggregate\(keys=\[user_id#\d+L?, day#\d+, local_sess#\d+",
        plan,
    ), "stitch not fed by session summaries"


def test_cusum_windows_over_day_grid(spark):
    """win_cusum's claim: every window partitions by event_type and
    runs over the type×day GRID (the upstream day-grain aggregate),
    never the raw fact table."""
    import re

    plan = _simple_plan(spark, "win_cusum")
    specs = re.findall(r"windowspecdefinition\(([^,]+)[,#]", plan)
    assert specs and all(s.startswith("event_type") for s in specs), specs
    # the day-grain aggregate (event_type × date_trunc grouping) feeds it
    assert re.search(
        r"HashAggregate\(keys=\[event_type#\d+, _groupingexpression", plan
    ), "windows not fed by the type×day aggregate"


def test_rolling_corr_windows_over_day_grid(spark):
    """win_rolling_corr's claim: the INTERVAL-range windows partition
    by nation and see only the nation×day grid built by the upstream
    aggregate."""
    import re

    plan = _simple_plan(spark, "win_rolling_corr")
    specs = re.findall(r"windowspecdefinition\(([^,]+)[,#]", plan)
    assert specs and all(s.startswith("nationkey") for s in specs), specs
    assert "INTERVAL '-90' DAY" in plan, "range frame lost"
    assert re.search(
        r"HashAggregate\(keys=\[c_nationkey#\d+, _groupingexpression", plan
    ), "windows not fed by the nation×day aggregate"


def test_bitmap_distinct_merges_partials_by_or(spark):
    """fn_bitmap's claim: the exact-distinct rollup builds bitmaps
    map-side (partial bitmap_construct_agg) and merges by OR across
    the (group, bucket) shuffle — the shuffle carries 4 KB bitmaps,
    never raw keys."""
    plan = _simple_plan(spark, "fn_bitmap")
    assert "partial_bitmap_construct_agg" in plan, "no map-side bitmap partials"
    assert "bitmapBucketNumber" in plan, "bucket grouping missing"


def test_bfs_round_is_node_keyed_equi_join(spark):
    """graph_bfs's claim: each level-synchronous round is node-keyed
    equi-joins only (frontier×edges inner + visited anti), never a
    nested-loop/cartesian expansion. The operator localCheckpoints
    each round, so the pin recreates one round's plan explicitly."""
    from pyspark.sql import functions as F

    from local_etl_spark.queries.graph import BFS_SOURCE, trade_edges

    pair = trade_edges(spark, SF).select("a", "b")
    frontier = spark.createDataFrame([(BFS_SOURCE, 0)], "node string, hop int")
    nxt = (
        frontier.join(pair, frontier.node == pair.a)
        .select(F.col("b").alias("node"))
        .distinct()
        .join(frontier.select("node"), "node", "left_anti")
        .select("node", F.lit(1).alias("hop"))
    )
    plan = nxt._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Join") >= 2, "expected inner + anti node joins"


def test_dedup_embed_gate_branches_on_corpus_size(spark, monkeypatch):
    """llm_dedup_embed routes through multi-probe IVF cell blocking
    above EMBED_ALLPAIRS_MAX_VECTORS (VERDICT r5 #4): below the gate
    the exact all-pairs broadcast nested-loop is the declared
    semantics (plan-audit allowlisted); above it the plan must contain
    NO nested-loop join — arrays move once onto cells (a posting-sized
    equi-join) and the quadratic verify runs CELL-LOCAL inside
    FlatMapGroupsInPandas (the r7 redesign: the old relational
    candidate join dragged two 64-float arrays per candidate row, the
    r4 array-drag class, and was slower than all-pairs at 20k
    vectors). Both shapes pinned, llm_tfidf-style."""
    from local_etl_spark.queries import llm_dedup

    # default gate (sf corpora are far below it): exact path, BNLJ
    plan_small = _plan(spark, "llm_dedup_embed")
    assert "BroadcastNestedLoopJoin" in plan_small

    monkeypatch.setattr(llm_dedup, "EMBED_ALLPAIRS_MAX_VECTORS", 0)
    df = llm_dedup.llm_dedup_embed(spark, SF)
    plan_big = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "BroadcastNestedLoopJoin" not in plan_big, (
        "gated scale path still plans a nested-loop join"
    )
    assert "CartesianProduct" not in plan_big
    assert "FlatMapGroupsInPandas" in plan_big, (
        "cell-local vectorized verify missing"
    )
    assert "MapInPandas" in plan_big, "numpy cell assignment missing"


def test_ivf_partitioned_probe_is_partition_prune(spark):
    """llm_ivf_partitioned realizes the IVF storage-layout claim: the
    probe must reach the parquet scan as PartitionFilters on the cell
    id (a directory prune — unprobed cells contribute zero input
    files), not a post-scan Filter."""
    import re

    plan = _plan(spark, "llm_ivf_partitioned")
    m = re.search(r"PartitionFilters: \[[^\]]*cid[^\]]*IN[^\]]*\]", plan)
    assert m, "probe not pushed as a partition filter"


def test_pq_scan_is_take_ordered(spark):
    """llm_simsearch_pq's ADC shortlist must compile to
    TakeOrderedAndProject (per-partition heaps + a k-row driver merge)
    — a global sort of the scored corpus would defeat the point of
    scanning codes instead of vectors."""
    plan = _plan(spark, "llm_simsearch_pq")
    assert "TakeOrderedAndProject" in plan
