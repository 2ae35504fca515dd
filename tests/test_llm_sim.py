"""Similarity-search invariants beyond the oracle hash-check."""

from __future__ import annotations

from local_etl_spark.catalog import table
from local_etl_spark.registry import get

SF = "/root/testdata/sf0.01"


def _graded(spark, system_queries: dict[str, str]) -> dict[str, dict]:
    """Grade ANN shortlists with the SAME retrieval_metrics aggregation
    the externally hash-checked llm_retrieval_eval query uses (VERDICT
    r7 #6 — the query is the ruler, tests reuse it)."""
    from functools import reduce

    from pyspark.sql import functions as F

    from local_etl_spark.queries.llm_sim import retrieval_metrics

    gold = get("llm_simsearch").fn(spark, SF).select("vec_id")
    sls = [
        get(qname)
        .fn(spark, SF)
        .select(F.lit(system).alias("system"), "vec_id", "score")
        for system, qname in system_queries.items()
    ]
    sl = reduce(lambda a, b: a.unionAll(b), sls)
    return {
        r["system"]: r.asDict()
        for r in retrieval_metrics(sl, gold).collect()
    }


def test_ivf_recall_and_exactness(spark):
    """IVF probe must (a) return exact scores for what it returns and
    (b) recall@10 ≥0.8 of the true top-10 with 4/16 trained spherical
    k-means cells probed (measured 0.9 at sf0.001 and sf0.01 — trained
    cells vs the old seed-vector stand-ins lifted this from ~0.5).
    Recall comes from retrieval_metrics — the single, externally
    hash-checked metric implementation."""
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
    m = _graded(spark, {"ivf": "llm_simsearch_ivf"})["ivf"]
    assert m["recall_at_k"] >= 0.8, f"IVF recall {m}"


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


def test_kmeans_objective_decreases(spark):
    """Lloyd's invariant: the within-cluster squared error never
    increases across iterations, and the final model covers the corpus."""
    from pyspark.sql import functions as F

    from local_etl_spark.queries.llm_sim import (
        KM_ITERS,
        KM_K,
        _km_assign_expr,
    )
    from local_etl_spark.queries._util import t

    sf = "/root/testdata/sf0.001"
    emb = t(spark, sf, "embeddings").select("vec_id", "embedding")
    centroids = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < KM_K).orderBy("vec_id").collect()
    ]

    def objective(cents):
        entries = []
        for c in cents:
            arr = "array(" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in c) + ")"
            entries.append(
                f"aggregate(zip_with(embedding, {arr}, "
                "(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
                "CAST(0 AS DOUBLE), (a, v) -> a + v)"
            )
        least = f"array_min(array({', '.join(entries)}))"
        return emb.agg(F.sum(F.expr(least))).collect()[0][0]

    objs = [objective(centroids)]
    for _ in range(KM_ITERS):
        assigned = emb.select("embedding", _km_assign_expr(centroids).alias("cell"))
        per_dim = (
            assigned.select("cell", F.posexplode("embedding").alias("dim", "x"))
            .groupBy("cell", "dim")
            .agg(F.avg("x").alias("m"))
            .orderBy("cell", "dim")
            .collect()
        )
        new_c = {}
        for r in per_dim:
            new_c.setdefault(r["cell"], []).append(float(r["m"]))
        centroids = [new_c.get(j, centroids[j]) for j in range(KM_K)]
        objs.append(objective(centroids))
    # non-increasing within fp slack
    for a, b in zip(objs, objs[1:]):
        assert b <= a * (1 + 1e-9), objs

    from local_etl_spark.registry import get

    out = get("llm_kmeans_train").fn(spark, sf).collect()
    assert sum(r["n_members"] for r in out) == emb.count()
    assert all(1 <= r["cell"] + 1 <= 8 for r in out)


def test_semdedup_exact_within_cells_and_recall(spark):
    """llm_semdedup's kept set must equal a brute-force recompute from
    the SAME cell assignment (sequential-fold cosine, bit-identical to
    the engine's), and same-cell blocking must capture true pairs at
    >= 2x the random size-weighted collision baseline (the testdata
    embeddings are isotropic — no semantic clusters — so absolute
    recall is data-limited; enrichment is the blocking property)."""
    from local_etl_spark.queries.llm_sim import SEM_T, llm_semdedup

    sf = "/root/testdata/sf0.001"
    rows = llm_semdedup(spark, sf).collect()
    emb = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in table(spark, sf, "embeddings").collect()
    }

    def cos(u, v):
        d = n1 = n2 = 0.0
        for x, y in zip(u, v):
            d += x * y
            n1 += x * x
            n2 += y * y
        return d / (n1**0.5 * n2**0.5)

    cells: dict[int, list[int]] = {}
    for r in rows:
        cells.setdefault(r["cid"], []).append(r["vec_id"])
    expect_sup = set()
    for vids in cells.values():
        vids.sort()
        for i, v in enumerate(vids):
            for u in vids[:i]:
                if cos(emb[u], emb[v]) >= SEM_T:
                    expect_sup.add(v)
                    break
    got_sup = {r["vec_id"] for r in rows if r["suppressed"]}
    assert got_sup == expect_sup

    # blocking enrichment: same-cell capture of true pairs vs the
    # random collision baseline sum((|cell|/N)^2)
    import itertools

    all_ids = sorted(emb)
    true_pairs = [
        (u, v)
        for u, v in itertools.combinations(all_ids, 2)
        if cos(emb[u], emb[v]) >= SEM_T
    ]
    assert true_pairs, "threshold should produce pairs at sf0.001"
    cid = {r["vec_id"]: r["cid"] for r in rows}
    captured = sum(1 for u, v in true_pairs if cid[u] == cid[v])
    n = len(all_ids)
    baseline = sum((len(v) / n) ** 2 for v in cells.values())
    enrichment = (captured / len(true_pairs)) / baseline
    assert enrichment >= 2.0, (captured, len(true_pairs), baseline)


def test_mmr_matches_numpy_greedy_spec(spark):
    """The MMR selection (order, ids, scores) must equal an independent
    NumPy implementation of the greedy λ-tradeoff over the same
    candidate pool, and must actually diversify (its tail diverges from
    pure relevance order on this pool)."""
    import numpy as np

    from local_etl_spark.queries.llm_sim import (
        K,
        MMR_CANDIDATES,
        MMR_LAMBDA,
        cosine,
    )
    from pyspark.sql import functions as F

    emb = table(spark, SF, "embeddings")
    qv = F.broadcast(
        emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    )
    pool = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(qv)
        .select(
            "vec_id", "embedding", F.round(cosine("embedding", "qv"), 6).alias("rel")
        )
        .orderBy(F.desc("rel"), "vec_id")
        .limit(MMR_CANDIDATES)
        .collect()
    )
    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in pool}
    rels = {r["vec_id"]: r["rel"] for r in pool}

    def ncos(a, b):
        return float(np.dot(a, b) / (np.sqrt(np.dot(a, a)) * np.sqrt(np.dot(b, b))))

    chosen, remaining = [], dict(vecs)
    while remaining and len(chosen) < K:
        best = None
        for vid in sorted(remaining):
            max_sim = max((ncos(vecs[vid], vecs[c]) for c, _ in chosen), default=0.0)
            score = MMR_LAMBDA * rels[vid] - (1.0 - MMR_LAMBDA) * max_sim
            if best is None or score > best[1]:
                best = (vid, score)
        remaining.pop(best[0])
        chosen.append(best)

    got = get("llm_mmr_diversify").fn(spark, SF).orderBy("rank").collect()
    assert [r["vec_id"] for r in got] == [vid for vid, _ in chosen]
    for r, (vid, score) in zip(got, chosen):
        assert r["relevance"] == rels[vid]
        assert abs(r["mmr_score"] - score) < 1e-9
    # diversification is real: MMR order != pure-relevance order
    rel_order = [r["vec_id"] for r in pool[:K]]
    assert [r["vec_id"] for r in got] != rel_order


def test_pq_search_recall_and_exact_scores(spark):
    """llm_simsearch_pq gates: returned scores are EXACT cosines
    (ADC only orders the shortlist; the output re-ranks on raw
    vectors), recall@10 >= 0.8 vs the brute-force top-k (measured 1.0
    at sf0.01, 0.9 at sf0.001/0.1 with the 32-entry codebooks and
    10K-deep shortlist), and every code is a valid 5-bit index."""
    from pyspark.sql import functions as F

    from local_etl_spark.queries.llm_sim import (
        PQ_K,
        PQ_M,
        _pq_code_expr,
        _train_pq,
        _UNIT_EMBEDDING,
    )

    exact = {
        r["vec_id"]: r["score"]
        for r in get("llm_simsearch").fn(spark, SF).collect()
    }
    got = get("llm_simsearch_pq").fn(spark, SF).collect()
    assert len(got) == 10
    for r in got:
        if r["vec_id"] in exact:
            assert r["score"] == exact[r["vec_id"]]
    m = _graded(spark, {"pq": "llm_simsearch_pq"})["pq"]
    assert m["recall_at_k"] >= 0.8, m

    books = _train_pq(spark, SF)
    assert len(books) == PQ_M and all(len(b) == PQ_K for b in books)
    codes = (
        table(spark, SF, "embeddings")
        .select(F.expr(_UNIT_EMBEDDING).alias("_u"))
        .select(_pq_code_expr(books).alias("codes"))
        .select(
            F.array_min("codes").alias("lo"), F.array_max("codes").alias("hi")
        )
        .agg(F.min("lo").alias("lo"), F.max("hi").alias("hi"))
        .first()
    )
    assert codes["lo"] >= 0 and codes["hi"] < PQ_K


def test_ivf_partitioned_equals_ivf(spark):
    """The partitioned-layout probe must change ONLY the access path:
    row-for-row equality with llm_simsearch_ivf (same model, same
    probes, same exact rescoring)."""
    a = [tuple(r) for r in get("llm_ivf_partitioned").fn(spark, SF).collect()]
    b = [tuple(r) for r in get("llm_simsearch_ivf").fn(spark, SF).collect()]
    assert a == b and len(a) == 10


def test_ann_ivf_incremental_rebuild_parity(spark):
    """The incremental layout (base write + new-batch append under the
    FROZEN model) must be indistinguishable from a full rebuild:
    (a) its (cid, vec_id) assignment set equals a from-scratch
    assignment of the whole corpus with the same model, and (b) a
    probe over it is row-identical to llm_simsearch_ivf. Also pins
    the census arithmetic: per-cell base+new counts sum to the corpus
    and the new slice is exactly the vec_id % IVF_INCR_MOD == 0 rows."""
    from local_etl_spark.queries.llm_sim import (
        _UNIT_EMBEDDING,
        _km_assign_expr,
        _lloyd,
        IVF_CELLS,
        IVF_INCR_MOD,
        IVF_NPROBE,
        KM_ITERS,
        K,
        cosine,
    )
    from local_etl_spark.queries._util import t
    from local_etl_spark.queries.scans import _cache_dir
    from pyspark.sql import functions as F

    census = {
        r["cid"]: (r["n_base"], r["n_new"])
        for r in get("llm_ann_ivf_incremental").fn(spark, SF).collect()
    }
    emb = t(spark, SF, "embeddings")
    n_total = emb.count()
    n_new = emb.filter(F.col("vec_id") % IVF_INCR_MOD == 0).count()
    assert sum(b + n for b, n in census.values()) == n_total
    assert sum(n for _, n in census.values()) == n_new

    # (a) layout ≡ full rebuild under the same frozen model
    centroids = _lloyd(spark, SF, k=IVF_CELLS, iters=KM_ITERS, spherical=True)
    rebuilt = {
        (r["cid"], r["vec_id"])
        for r in emb.select(
            "vec_id", F.expr(_UNIT_EMBEDDING).alias("_u")
        )
        .select("vec_id", _km_assign_expr(centroids, vector="_u").alias("cid"))
        .collect()
    }
    # r12 keyed the layout caches by the trained-model fingerprint
    # (_model_fp); read the keyed path the query actually writes
    from local_etl_spark.queries.llm_sim import _model_fp

    back = spark.read.parquet(
        _cache_dir(SF, f"embeddings_ivf_incr_{_model_fp(centroids)}")
    )
    layout = {(r["cid"], r["vec_id"]) for r in back.select("cid", "vec_id").collect()}
    assert layout == rebuilt

    # (b) probe over the incremental layout ≡ llm_simsearch_ivf
    q = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    qn = sum(float(x) * float(x) for x in q) ** 0.5
    qunit = [float(x) / qn for x in q]

    def cell_sim(c):
        cn = sum(v * v for v in c) ** 0.5
        return sum(u * v for u, v in zip(qunit, c)) / cn

    probe = sorted(
        range(len(centroids)), key=lambda j: (-cell_sim(centroids[j]), j)
    )[:IVF_NPROBE]
    qv = F.broadcast(
        emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    )
    got = [
        tuple(r)
        for r in back.filter(F.col("cid").isin(probe))
        .filter(F.col("vec_id") != 0)
        .crossJoin(qv)
        .select(
            "vec_id", "label", F.round(cosine("embedding", "qv"), 6).alias("score")
        )
        .orderBy(F.desc("score"), "vec_id")
        .limit(K)
        .collect()
    ]
    want = [tuple(r) for r in get("llm_simsearch_ivf").fn(spark, SF).collect()]
    assert got == want and len(got) == K


def test_embedding_drift_matches_numpy(spark):
    """llm_embedding_drift ≡ NumPy means/stds computed independently
    from the parquet (float64, tolerance-checked — the op's own
    determinism story is the two-level ordered fold; this test checks
    the MATH, the oracle checks the bits)."""
    import numpy as np

    from local_etl_spark.queries.llm_sim import IVF_INCR_MOD
    from local_etl_spark.registry import get

    rows = (
        table(spark, SF, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    base = np.array(
        [r["embedding"] for r in rows if r["vec_id"] % IVF_INCR_MOD != 0],
        dtype=np.float64,
    )
    new = np.array(
        [r["embedding"] for r in rows if r["vec_id"] % IVF_INCR_MOD == 0],
        dtype=np.float64,
    )
    got = {
        r["dim"]: r for r in get("llm_embedding_drift").fn(spark, SF).collect()
    }
    assert set(got) == set(range(64))
    mb, mn = base.mean(axis=0), new.mean(axis=0)
    for d in range(64):
        assert abs(got[d]["mean_base"] - mb[d]) < 2e-6, d
        assert abs(got[d]["mean_new"] - mn[d]) < 2e-6, d
        assert abs(got[d]["mean_shift"] - (mn[d] - mb[d])) < 2e-6, d
    r0 = got[0]
    assert r0["n_base"] == len(base) and r0["n_new"] == len(new)
    l2 = float(np.sqrt(((mn - mb) ** 2).sum()))
    assert abs(r0["l2_shift"] - l2) < 2e-6
    nb = np.sqrt((base**2).sum(axis=1))
    nn = np.sqrt((new**2).sum(axis=1))
    assert abs(r0["norm_mean_base"] - nb.mean()) < 2e-6
    assert abs(r0["norm_mean_new"] - nn.mean()) < 2e-6
    assert abs(r0["norm_std_base"] - nb.std()) < 2e-6
    assert abs(r0["norm_std_new"] - nn.std()) < 2e-6
