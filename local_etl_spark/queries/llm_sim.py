"""Similarity search over embeddings (SURVEY.md §2.4-J).

64-d float vectors (`embeddings.embedding`). All exact math stays
JVM-side as array-expression folds — no UDF: a 64-element
``aggregate(zip_with(...))`` compiles into codegen and costs ~nothing
next to the scan.

Float determinism policy (verified empirically, see tests): each
float32×float32 product is EXACT in double (24+24 mantissa bits < 53),
and both engines fold the 64 products sequentially left→right, so
dot products and norms are bit-identical across Spark and DuckDB;
``round(score, 6)`` then removes any residual libm divergence in sqrt.

Scale design:
  - ``llm_simsearch``: brute force is a single scan + top-k — at 100 TB
    it is embarrassingly parallel (per-partition top-k, then a k-row
    driver merge via TakeOrderedAndProject). The right baseline.
  - ``llm_knn_join``: the small (query) side is broadcast; the big side
    streams — no shuffle of the corpus.
  - ``llm_simsearch_ivf``: the scale path — partition the corpus by
    nearest-centroid cell once (a write-time clustering at 100 TB),
    then probe only nprobe cells per query: the scan drops from |corpus|
    to nprobe/ncells of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from local_etl_spark.queries._util import t
from local_etl_spark.registry import query

K = 10

# sequential double fold over paired arrays (bit-identical in DuckDB)
_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
)


def dot(a: str, b: str) -> F.Column:
    return F.expr(_DOT.format(a=a, b=b))


def cosine(a: str, b: str) -> F.Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


# DuckDB side of the same fold (list_transform+list_sum matches the
# sequential double fold; list_dot_product does NOT — it accumulates in
# float32)
_DUCK_DOT = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
)


def _duck_cosine(a: str, b: str) -> str:
    d = _DUCK_DOT.format(a=a, b=b)
    na = _DUCK_DOT.format(a=a, b=a)
    nb = _DUCK_DOT.format(a=b, b=b)
    return f"({d} / (sqrt({na}) * sqrt({nb})))"


@query(
    "llm_simsearch",
    family="llm",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, e.label,
           round({_duck_cosine('e.embedding', 'q.qv')}, 6) AS score
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id <> 0
    ORDER BY score DESC, e.vec_id
    LIMIT {K}
    """,
)
def llm_simsearch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k against one query vector.

    The 1-row query side is crossJoin(broadcast(...)) — a map-side
    closed form; orderBy().limit(k) compiles to TakeOrderedAndProject
    (per-partition heaps + driver merge of k rows, no global sort).
    """
    emb = t(spark, sf_dir, "embeddings")
    qv = F.broadcast(
        emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    )
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(qv)
        .select(
            "vec_id",
            "label",
            F.round(cosine("embedding", "qv"), 6).alias("score"),
        )
        .orderBy(F.desc("score"), "vec_id")
        .limit(K)
    )


@query(
    "llm_knn_join",
    family="llm",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qv
               FROM embeddings WHERE vec_id % 100 = 0),
    scored AS (
        SELECT q.qid, e.vec_id,
               round({_duck_cosine('e.embedding', 'q.qv')}, 6) AS score,
               row_number() OVER (
                   PARTITION BY q.qid
                   ORDER BY round({_duck_cosine('e.embedding', 'q.qv')}, 6) DESC,
                            e.vec_id) AS rn
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> q.qid
    )
    SELECT qid, vec_id, score FROM scored WHERE rn <= 3
    """,
)
def llm_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN join: 3 nearest corpus vectors for each query vector.

    Query side (1% of rows) is broadcast; the corpus side never
    shuffles for the join itself — only the per-query top-3 window
    shuffles, and that input is already down to |corpus|×|queries|
    scored pairs. At 100 TB with large query sets, swap the crossJoin
    for the IVF cell-probe prefilter below.

    Per-pair work is ONE dot-product fold: both sides carry their norm
    precomputed per ROW (cosine() inline would re-fold both norms per
    PAIR — 3x the work); dot/(na·nb) is arithmetically identical to the
    oracle's per-pair recomputation. The corpus side is round-robin
    repartitioned — the broadcast join's parallelism is the stream
    side's partitioning, and file-split packing of a small parquet
    leaves few, uneven partitions.
    """
    emb = t(spark, sf_dir, "embeddings")
    nrm = F.sqrt(dot("embedding", "embedding"))
    q = F.broadcast(
        emb.filter(F.col("vec_id") % 100 == 0).select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qv"),
            nrm.alias("qn"),
        )
    )
    from pyspark.sql import Window

    corpus = emb.repartition(
        spark.sparkContext.defaultParallelism
    ).select("vec_id", "embedding", nrm.alias("en"))
    score = dot("embedding", "qv") / (F.col("en") * F.col("qn"))
    scored = (
        corpus.crossJoin(q)
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", F.round(score, 6).alias("score"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("qid", "vec_id", "score")
    )


IVF_CELLS = 16
IVF_NPROBE = 4


def _lloyd_ctes(k: int, iters: int, spherical: bool) -> str:
    """CTE chain replaying the full Lloyd's loop relationally (the r12
    trainer-conversion core, shared by _kmeans_oracle and the
    spherical IVF oracle). Emits: `v` (pre-cast vectors), `vu` (+ the
    training vector u — unit-normalized when spherical), `c0..c{iters}`
    (centroid relations). Per iteration: (a) assignment = argmin over
    k squared-L2 sequential zip-folds, ties by cell (row_number ≡ the
    engine's array_min struct); (b) per-(cell, dim) means via the SAME
    two-level ordered fold _lloyd now uses (by vec_id inside 256-wide
    buckets, then by bucket); (c) empty cells carry the previous
    centroid, and the spherical variant RE-normalizes the carried
    value too — exactly the engine's renorm(new_c.get(j, prev))."""
    unit = (
        "list_transform({e}, x -> x / "
        "sqrt(list_sum(list_transform({e}, y -> y * y))))"
    )

    def renorm(expr: str) -> str:
        if not spherical:
            return expr
        n = f"sqrt(list_sum(list_transform({expr}, x -> x * x)))"
        return (
            f"CASE WHEN {n} > 0 THEN "
            f"list_transform({expr}, v -> v / {n}) ELSE {expr} END"
        )

    parts = [
        f"""v AS MATERIALIZED (
        SELECT vec_id, vec_id // 256 AS bucket,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ),
    vu AS MATERIALIZED (
        SELECT vec_id, bucket, e,
               {unit.format(e='e') if spherical else 'e'} AS u
        FROM v
    ),
    c0 AS MATERIALIZED (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
                   AS cell,
               {renorm('e')} AS arr
        FROM vu WHERE vec_id < {k}
    )"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
    a{i} AS MATERIALIZED (
        SELECT vec_id, bucket, u, cell FROM (
            SELECT vu.vec_id, vu.bucket, vu.u, c.cell,
                   row_number() OVER (PARTITION BY vu.vec_id
                       ORDER BY list_sum(list_transform(
                                    list_zip(vu.u, c.arr),
                                    q -> (q[1] - q[2]) * (q[1] - q[2]))),
                                c.cell) AS rn
            FROM vu CROSS JOIN c{i - 1} c
        ) WHERE rn = 1
    ),
    c{i} AS MATERIALIZED (
        SELECT pc.cell,
               {renorm('coalesce(nc.arr, pc.arr)')} AS arr
        FROM c{i - 1} pc LEFT JOIN (
            SELECT cell, list(m ORDER BY dim) AS arr FROM (
                SELECT cell, dim,
                       list_sum(list(s ORDER BY bucket))
                           / CAST(sum(n) AS BIGINT) AS m
                FROM (
                    SELECT a.cell, r.dim, a.bucket,
                           list_sum(list(a.u[r.dim + 1]
                                         ORDER BY a.vec_id)) AS s,
                           count(*) AS n
                    FROM a{i} a CROSS JOIN
                         (SELECT CAST(range AS INT) AS dim
                          FROM range(64)) r
                    GROUP BY a.cell, r.dim, a.bucket
                )
                GROUP BY cell, dim
            )
            GROUP BY cell
        ) nc ON nc.cell = pc.cell
    )"""
        )
    return "".join(parts)



def _ivf_oracle(k: int, iters: int, nprobe: int, topk: int) -> str:
    """Relational replay of the WHOLE IVF search (rows-only→SQL
    conversion #19, round 12): the spherical Lloyd machine
    (_lloyd_ctes — unit-normalized training vectors, per-round
    centroid renormalization), the query-side probe ranking (cosine of
    the unit query against each centroid, ties by cell — replaying the
    driver's (-sim, j) sort), the nprobe cell filter, and the exact
    cosine top-k over the probed cells. Every float step is a
    sequential fold shared with the engine; the final order is
    (rounded score DESC, vec_id), deterministic in both engines."""
    return f"""
    WITH {_lloyd_ctes(k, iters, spherical=True)},
    fin AS (
        SELECT vec_id, cell FROM (
            SELECT vu.vec_id, c.cell,
                   row_number() OVER (PARTITION BY vu.vec_id
                       ORDER BY list_sum(list_transform(
                                    list_zip(vu.u, c.arr),
                                    q -> (q[1] - q[2]) * (q[1] - q[2]))),
                                c.cell) AS rn
            FROM vu CROSS JOIN c{iters} c
        ) WHERE rn = 1
    ),
    q AS (SELECT e AS q FROM v WHERE vec_id = 0),
    qu AS (
        SELECT list_transform(q, x -> x /
                   sqrt(list_sum(list_transform(q, y -> y * y)))) AS qu
        FROM q
    ),
    probe AS MATERIALIZED (
        SELECT cell FROM (
            SELECT c.cell,
                   row_number() OVER (ORDER BY
                       (list_sum(list_transform(list_zip(qu.qu, c.arr),
                                                p -> p[1] * p[2]))
                        / sqrt(list_sum(list_transform(c.arr,
                                                       x -> x * x))))
                           DESC,
                       c.cell) AS rn
            FROM c{iters} c CROSS JOIN qu
        ) WHERE rn <= {nprobe}
    ),
    emb2 AS (
        SELECT e.vec_id, e.label,
               list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS ev
        FROM embeddings e
        JOIN fin f ON f.vec_id = e.vec_id
        JOIN probe p ON p.cell = f.cell
        WHERE e.vec_id <> 0
    )
    SELECT vec_id, label, score FROM (
        SELECT e2.vec_id, e2.label,
               round(list_sum(list_transform(list_zip(e2.ev, q.q),
                                             p -> p[1] * p[2]))
                     / (sqrt(list_sum(list_transform(e2.ev, x -> x * x)))
                        * sqrt(list_sum(list_transform(q.q,
                                                       x -> x * x)))),
                     6) AS score
        FROM emb2 e2 CROSS JOIN q
    )
    ORDER BY score DESC, vec_id
    LIMIT {topk}"""


@query(
    "llm_simsearch_ivf",
    family="llm",
    oracle=_ivf_oracle(IVF_CELLS, 4, IVF_NPROBE, K),
)
def llm_simsearch_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k over trained cells: probe only the nearest cells.

    The index is a real spherical k-means model (``_lloyd``, the same
    Lloyd's trainer behind llm_kmeans_train, run on L2-normalized
    vectors with per-iteration centroid renormalization — on unit
    vectors L2-argmin IS cosine-argmax, so the cells match the cosine
    geometry the query scores with). Every corpus vector computes its
    cell IN-ROW against the k×64 literal centroid matrix (codegen fold,
    zero shuffles, no join); the query probes the IVF_NPROBE cells whose
    centroids are most query-similar (a driver-side k-row argsort — the
    centroid matrix is model state, not data) and brute-forces only
    within them (~nprobe/ncells of the corpus; 100 TB deployments write
    the corpus partitioned BY cell so a probe is a partition prune, not
    a filter). Returned scores are exact cosines on the ORIGINAL
    vectors — IVF only prunes candidates, never perturbs scores.

    Approximate ⇒ rows-only driver check; tests/test_llm_sim.py asserts
    recall ≥ 0.8 vs the exact top-k and exactness of returned scores.
    """
    emb = t(spark, sf_dir, "embeddings")
    centroids = _lloyd(spark, sf_dir, k=IVF_CELLS, iters=KM_ITERS, spherical=True)

    # normalized vector staged through its own select so the 16-way
    # argmin binds it once, and the whole assignment PERSISTED: the
    # probe filter below would otherwise substitute the cid alias into
    # its predicate (filter pushdown undoes projection barriers),
    # re-embedding the normalize fold 16× per row in interpreted HOF
    # land — measured 11.5s vs 0.5s at sf0.1. At 100 TB the same
    # materialization is the partition-by-cell write the docstring
    # describes.
    assigned = emb.select(
        "vec_id", "label", "embedding", F.expr(_UNIT_EMBEDDING).alias("_u")
    ).select(
        "vec_id",
        "label",
        "embedding",
        _km_assign_expr(centroids, vector="_u").alias("cid"),
    ).persist()

    # probe selection: the query vector is a parameter, not data — a
    # 64-float driver fetch, then a k-row argsort against the model
    q = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    qn = sum(float(x) * float(x) for x in q) ** 0.5
    qunit = [float(x) / qn for x in q]

    def cell_sim(c: list[float]) -> float:
        cn = sum(v * v for v in c) ** 0.5
        return sum(u * v for u, v in zip(qunit, c)) / cn

    probe = sorted(
        range(len(centroids)), key=lambda j: (-cell_sim(centroids[j]), j)
    )[:IVF_NPROBE]

    qv = F.broadcast(
        emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    )
    return (
        assigned.filter(F.col("cid").isin(probe))
        .filter(F.col("vec_id") != 0)
        .crossJoin(qv)
        .select(
            "vec_id",
            "label",
            F.round(cosine("embedding", "qv"), 6).alias("score"),
        )
        .orderBy(F.desc("score"), "vec_id")
        .limit(K)
    )


KM_K = 8
KM_ITERS = 4
# the IVF oracle above is decorated before this line executes, so it
# bakes iters=4 — keep in lockstep
assert KM_ITERS == 4, "update _ivf_oracle's baked iteration count"

# in-row L2 normalization of the embedding column (unit vectors make
# L2-argmin equivalent to cosine-argmax for cell assignment)
_UNIT_EMBEDDING = (
    "transform(embedding, x -> CAST(x AS DOUBLE) / "
    f"sqrt({_DOT.format(a='embedding', b='embedding')}))"
)

# trained models are tiny (k×64 doubles) and deterministic — cache per
# (sf_dir, k, iters, spherical) so tests/bench don't retrain per call;
# FIFO-bounded so a long-lived process hosting many scale factors
# can't grow it without limit
_MODEL_CACHE: dict[tuple, list[list[float]]] = {}
_MODEL_CACHE_MAX = 8


def _model_fp(centroids: list[list[float]]) -> str:
    """Short fingerprint of a trained model, used to KEY the
    marker-gated parquet layouts (r12): a trainer arithmetic change
    (e.g. the avg→ordered-fold determinism fix) must invalidate any
    layout written under the old centroids, or a stale cache would
    silently desynchronize the read-back census from the live model
    (the VERDICT r11 stale-cache note, fixed for the disk caches)."""
    import hashlib

    return hashlib.md5(repr(centroids).encode()).hexdigest()[:10]


def _lloyd(
    spark: SparkSession,
    sf_dir: str,
    k: int,
    iters: int,
    spherical: bool = False,
) -> list[list[float]]:
    """Distributed Lloyd's k-means, returning the k×64 centroid matrix.

    Per iteration: (1) assign — centroids inlined as literal arrays,
    argmin cell computed IN-ROW (codegen fold, zero shuffles, no join);
    (2) recompute — posexplode dims → per-(cell, dim) mean → reassemble.
    Driver state between iterations is ONLY the k×64 matrix (model, not
    data). ``spherical`` trains on L2-normalized vectors and
    renormalizes centroids each round (cosine geometry for IVF).
    Deterministic init: the first k vec_ids.
    """
    key = (sf_dir, k, iters, spherical)
    if key in _MODEL_CACHE:
        return _MODEL_CACHE[key]
    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    vec = _UNIT_EMBEDDING if spherical else "embedding"

    def renorm(c: list[float]) -> list[float]:
        if not spherical:
            return c
        n = sum(v * v for v in c) ** 0.5
        return [v / n for v in c] if n > 0 else c

    centroids = [
        renorm([float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < k).orderBy("vec_id").collect()
    ]
    # Per-iteration assignment stays the in-row unrolled argmin fold,
    # with TWO load-bearing adjustments found by measurement (89s → 12s
    # spherical training at sf0.1):
    #   1. the (possibly normalized) vector is staged through its OWN
    #      persisted select — a same-select alias re-embeds the
    #      64-element normalize fold once PER CENTROID (SCALE.md §10's
    #      blowup class), and persisting it also deletes the per-round
    #      re-scan;
    #   2. a fully relational assignment (explode + broadcast
    #      centroid-dim join + decimal dot sums) was A/B-measured at
    #      1.8× SLOWER here — its extra shuffle jobs cost more than the
    #      interpreted HOF folds save at local scale; on a real cluster
    #      with big corpora the relational form wins and is what
    #      llm_kmeans_train documents as the scale path.
    staged = emb.select(
        "vec_id",
        F.expr("vec_id DIV 256").alias("bucket"),
        F.expr(vec).alias("v"),
    ).persist()
    _of = (
        "aggregate(array_sort(collect_list(struct({k}, {v}))), "
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.{v})"
    )
    for _ in range(iters):
        assigned = staged.select(
            "vec_id",
            "bucket",
            "v",
            _km_assign_expr(centroids, vector="v").alias("cell"),
        )
        # per-(cell, dim) mean as a TWO-LEVEL ordered fold (the
        # llm_embedding_drift tree: by vec_id inside 256-wide buckets,
        # then by bucket) instead of F.avg — deterministic doubles the
        # r12 SQL witness replays exactly, same distributed shape
        per_dim = (
            assigned.select(
                "vec_id",
                "bucket",
                "cell",
                F.posexplode("v").alias("dim", "x"),
            )
            .groupBy("cell", "dim", "bucket")
            .agg(
                F.expr(_of.format(k="vec_id", v="x")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .groupBy("cell", "dim")
            .agg(
                F.expr(_of.format(k="bucket", v="s")).alias("ts"),
                F.sum("n").cast("bigint").alias("n"),
            )
            .select("cell", "dim", (F.col("ts") / F.col("n")).alias("m"))
            .orderBy("cell", "dim")
            .collect()
        )
        new_c: dict[int, list[float]] = {}
        for r in per_dim:
            new_c.setdefault(r["cell"], []).append(float(r["m"]))
        # a cell can go empty mid-iteration: keep its previous centroid
        centroids = [renorm(new_c.get(j, centroids[j])) for j in range(k)]
    staged.unpersist()
    while len(_MODEL_CACHE) >= _MODEL_CACHE_MAX:
        _MODEL_CACHE.pop(next(iter(_MODEL_CACHE)))
    _MODEL_CACHE[key] = centroids
    return centroids


def _km_assign_expr(
    centroids: list[list[float]], vector: str = "embedding"
) -> "F.Column":
    """In-row argmin over k literal centroid arrays: for each corpus
    vector, squared-L2 against every centroid folds inside codegen and
    array_min over (d2, cell) structs picks the winner — assignment
    costs ZERO shuffles and no join at any corpus size. ``vector`` is
    the SQL expression for the vector column (e.g. a normalized view)."""
    return F.expr(f"array_min(array({_km_cell_structs(centroids, vector)})).cell")


def _km_cell_structs(centroids: list[list[float]], vector: str) -> str:
    """SQL text of the per-centroid (d2, cell) struct array entries.

    Unrolled per-centroid fold bodies: a generic loop over a 2-D
    literal matrix (element_at(array(array(...)), j)) was tried and is
    ~10× SLOWER at runtime — the matrix literal re-materializes per
    row per lambda element. The unrolled form keeps each centroid's
    constants in straight-line codegen.
    """
    entries = []
    for j, c in enumerate(centroids):
        arr = "array(" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in c) + ")"
        d2 = (
            f"aggregate(zip_with({vector}, {arr}, "
            "(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
            "CAST(0 AS DOUBLE), (a, v) -> a + v)"
        )
        entries.append(f"struct({d2} AS d2, {j} AS cell)")
    return ", ".join(entries)


def _km_topp_expr(
    centroids: list[list[float]], p: int, vector: str = "embedding"
) -> "F.Column":
    """Top-``p`` nearest cells per vector (IVF multi-probe assignment):
    same in-row unrolled fold as ``_km_assign_expr``, but the (d2, cell)
    structs are array_sort'ed ascending by d2 and the first ``p`` cells
    projected out. On unit vectors min-L2 ≡ max-cosine, so this is the
    p most cosine-similar cells. Zero shuffles, no join — used by
    llm_dedup_embed's gated scale path (a pair is compared iff the two
    vectors share one of their p cells)."""
    structs = _km_cell_structs(centroids, vector)
    return F.expr(
        f"transform(slice(array_sort(array({structs})), 1, {p}), s -> s.cell)"
    )


def _kmeans_oracle(k: int, iters: int) -> str:
    """Unrolled relational replay of the full Lloyd's loop (rows-only→
    SQL conversion #18, round 12): the TRAINER itself is now
    externally verifiable, not just its appliers. Machine in
    _lloyd_ctes; centroids flow between rounds as SQL doubles, and
    the engine's float-repr literal inlining round-trips to the
    identical bits, so the two trainers agree centroid-for-centroid."""
    return f"""
    WITH {_lloyd_ctes(k, iters, spherical=False)},
    fin AS (
        SELECT vec_id, cell FROM (
            SELECT v.vec_id, c.cell,
                   row_number() OVER (PARTITION BY v.vec_id
                       ORDER BY list_sum(list_transform(
                                    list_zip(v.e, c.arr),
                                    q -> (q[1] - q[2]) * (q[1] - q[2]))),
                                c.cell) AS rn
            FROM v CROSS JOIN c{iters} c
        ) WHERE rn = 1
    )
    SELECT f.cell, CAST(count(*) AS BIGINT) AS n_members,
           round(sqrt(list_sum(list_transform(c.arr, x -> x * x))), 4)
               AS centroid_norm
    FROM fin f JOIN c{iters} c ON c.cell = f.cell
    GROUP BY f.cell, c.arr"""


@query(
    "llm_kmeans_train",
    family="llm",
    oracle=_kmeans_oracle(KM_K, KM_ITERS),
)
def llm_kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means over the embedding corpus — the
    same ``_lloyd`` trainer whose spherical variant produces the cells
    llm_simsearch_ivf probes; this operator exposes the trained model
    summary as a queryable result.

    Per iteration (see ``_lloyd``): (1) assign — the k×64 centroid
    matrix is inlined as literal arrays and every vector computes its
    argmin cell IN-ROW (codegen fold, zero shuffles, no join);
    (2) recompute — posexplode dims → per-(cell, dim) mean →
    re-assemble arrays: one aggregate whose output is k×64 rows. Driver
    state between iterations is ONLY that k×64 matrix (model state, not
    data — the corpus-sized assignment never leaves the executors). At
    100 TB each iteration is one corpus scan + one tiny aggregate — the
    canonical broadcast-model / distribute-data iterative shape.

    Deterministic init (first k vec_ids, matching the IVF stand-in);
    fixed iteration count; ties broken by cell id in the argmin struct.
    SQL-ORACLED since round 12 (conversion #18 — the TRAINER itself):
    per-(cell, dim) means are two-level ordered folds (see _lloyd) and
    every other float step was already a sequential fold, so
    _kmeans_oracle replays the whole Lloyd loop relationally,
    centroid-for-centroid. pytest still asserts the k-means invariant
    (objective monotonically non-increasing) and full corpus coverage
    (tests/test_llm_sim.py::test_kmeans_objective_decreases).
    Output: one row per cell with its size and centroid norm — the
    model summary a feature store would version."""
    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    centroids = _lloyd(spark, sf_dir, k=KM_K, iters=KM_ITERS)
    final = emb.select("vec_id", _km_assign_expr(centroids).alias("cell"))
    norms = {j: sum(v * v for v in c) ** 0.5 for j, c in enumerate(centroids)}
    norm_expr = "CASE " + " ".join(
        f"WHEN cell = {j} THEN CAST({n!r} AS DOUBLE)" for j, n in norms.items()
    ) + " END"
    return (
        final.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .select("cell", "n_members", F.round(F.expr(norm_expr), 4).alias("centroid_norm"))
    )


@query(
    "llm_embed_quantize",
    family="llm",
    oracle="""
    WITH m AS (
        SELECT vec_id,
               embedding,
               list_max(list_transform(embedding,
                        x -> abs(CAST(x AS DOUBLE)))) AS ma
        FROM embeddings
    ),
    q AS (
        SELECT vec_id, embedding, ma,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / ma + 0.5)
                        AS BIGINT)) AS qv
        FROM m
    )
    SELECT vec_id,
           round(ma / 127.0, 6) AS scale,
           CAST(list_sum(qv) AS BIGINT) AS q_sum,
           CAST(list_min(qv) AS BIGINT) AS q_min,
           CAST(list_max(qv) AS BIGINT) AS q_max,
           round(list_sum(list_transform(list_zip(embedding, qv),
                 p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE) * ma / 127.0)
                    * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE) * ma / 127.0)))
                 / len(embedding), 9) AS mse
    FROM q
    """,
)
def llm_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization (the storage/serving trade
    every vector store makes: 4x smaller, ~1e-5 MSE): per-vector
    absmax scale, q = round(x·127/absmax), plus the reconstruction-MSE
    audit column a pipeline gates on before swapping in quantized
    vectors.

    All math is in-row JVM folds — quantizing 100 TB of embeddings is a
    map-only pass. Determinism: round-half-up via floor(x+0.5) (both
    engines' floor is exact on doubles; native round() differs in
    half-even vs half-away modes), squared error via explicit multiply
    (pow() routes through libm), sequential fold order identical to
    DuckDB's list_sum. The int8 range witness (q_min/q_max ∈ [-127,
    127]) and q_sum stand in for the array itself (canon-safe scalars).
    """
    e = t(spark, sf_dir, "embeddings")
    staged = e.select(
        "vec_id",
        "embedding",
        F.expr(
            "array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))"
        ).alias("ma"),
    ).select(
        "vec_id",
        "embedding",
        "ma",
        F.expr(
            "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / ma"
            " + 0.5) AS BIGINT))"
        ).alias("qv"),
    )
    sq_err = (
        "aggregate(zip_with(embedding, qv, (x, q) ->"
        " (CAST(x AS DOUBLE) - CAST(q AS DOUBLE) * ma / 127.0)"
        " * (CAST(x AS DOUBLE) - CAST(q AS DOUBLE) * ma / 127.0)),"
        " CAST(0 AS DOUBLE), (a, v) -> a + v)"
    )
    return staged.select(
        "vec_id",
        F.round(F.col("ma") / 127.0, 6).alias("scale"),
        F.expr("aggregate(qv, CAST(0 AS BIGINT), (a, v) -> a + v)").alias("q_sum"),
        F.array_min("qv").alias("q_min"),
        F.array_max("qv").alias("q_max"),
        F.round(F.expr(sq_err) / F.size("embedding"), 9).alias("mse"),
    )


SEM_T = 0.4  # same similarity bar as llm_dedup_embed's exact all-pairs


def _semdedup_oracle(k: int, iters: int, t: float) -> str:
    """Relational SemDeDup replay (rows-only→SQL conversion #22, round
    12): the spherical machine assigns cells, same-cell pairs verify
    with the exact sequential-fold cosine (per-vector precomputed
    norms — the same values the engine's inline folds produce), and
    greedy-by-id suppression is one DISTINCT + LEFT JOIN."""
    return f"""
    WITH {_lloyd_ctes(k, iters, spherical=True)},
    fin AS (
        SELECT vec_id, cell FROM (
            SELECT vu.vec_id, c.cell,
                   row_number() OVER (PARTITION BY vu.vec_id
                       ORDER BY list_sum(list_transform(
                                    list_zip(vu.u, c.arr),
                                    q -> (q[1] - q[2]) * (q[1] - q[2]))),
                                c.cell) AS rn
            FROM vu CROSS JOIN c{iters} c
        ) WHERE rn = 1
    ),
    emb2 AS MATERIALIZED (
        SELECT f.vec_id, f.cell, v.e,
               sqrt(list_sum(list_transform(v.e, x -> x * x))) AS nrm
        FROM fin f JOIN v ON v.vec_id = f.vec_id
    ),
    dropped AS MATERIALIZED (
        SELECT DISTINCT a.vec_id
        FROM emb2 a JOIN emb2 b
             ON a.cell = b.cell AND b.vec_id < a.vec_id
        WHERE list_sum(list_transform(list_zip(a.e, b.e),
                                      q -> q[1] * q[2]))
              / (a.nrm * b.nrm) >= {t}
    )
    SELECT f.vec_id, CAST(f.cell AS INT) AS cid,
           (d.vec_id IS NOT NULL) AS suppressed
    FROM fin f LEFT JOIN dropped d ON d.vec_id = f.vec_id"""


@query(
    "llm_semdedup",
    family="llm",
    oracle=_semdedup_oracle(IVF_CELLS, 4, SEM_T),
)
def llm_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup that only compares
    WITHIN k-means cells — the published answer to embedding dedup's
    all-pairs blowup (llm_dedup_embed is the exact ground truth here).

    Steps: (1) assign every vector to a trained spherical-kmeans cell
    in-row (same `_lloyd` model as IVF — zero shuffles, no join);
    (2) same-cell pairwise exact cosine ≥ SEM_T (an equi-join on the
    cell id, NOT a cross join); (3) greedy-by-id suppression: drop v
    iff some same-cell u < v has cos(u, v) ≥ SEM_T — deterministic,
    one distinct + one anti-flag join, keeps exactly one canonical
    per duplicate chain.

    Scale: the quadratic term collapses from N² to Σ_cells |cell|² —
    k grows with the corpus (cells of ~10⁴ vectors keep the per-cell
    pairing bounded), and cells are independent so parallelism = k.
    Cross-cell near-dups are the (paper-accepted) recall loss; the
    pytest gate measures it against the exact pair set. SQL-ORACLED
    since round 12 (conversion #22 — _semdedup_oracle rides the
    _lloyd_ctes machine); tests/test_llm_sim.py additionally
    recomputes the kept set from the SAME cell assignment with a
    bit-identical sequential fold and asserts exact equality, plus
    recall ≥ 0.8 of exact same-threshold dedup.
    """
    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    centroids = _lloyd(spark, sf_dir, k=IVF_CELLS, iters=KM_ITERS, spherical=True)
    assigned = emb.select(
        "vec_id", "embedding", F.expr(_UNIT_EMBEDDING).alias("_u")
    ).select(
        "vec_id",
        "embedding",
        _km_assign_expr(centroids, vector="_u").alias("cid"),
    ).persist()
    a, b = assigned.alias("a"), assigned.alias("b")
    dropped = (
        a.join(b, (F.col("a.cid") == F.col("b.cid")) & (F.col("b.vec_id") < F.col("a.vec_id")))
        .filter(cosine("a.embedding", "b.embedding") >= SEM_T)
        .select(F.col("a.vec_id").alias("vec_id"))
        .distinct()
    )
    return (
        assigned.join(dropped.withColumn("is_dup", F.lit(True)), "vec_id", "left")
        .select(
            "vec_id",
            "cid",
            F.coalesce("is_dup", F.lit(False)).alias("suppressed"),
        )
    )


MMR_LAMBDA = 0.7
MMR_CANDIDATES = 30


# LIST-MACHINE replay of the greedy MMR loop (rows-only→SQL conversion
# #9, round 11 — the graph_coreness pattern applied to a FLOAT greedy):
# the pool is MMR_CANDIDATES rows, every arithmetic step is an ordered
# sequential double fold (Python sum() ≡ index-ordered list_sum; the
# known float32 trap is dodged by pre-casting embeddings to DOUBLE
# once), and the argmax tie-break (first max in vec_id order) is
# list_filter(...)[1] over a vid-ordered remaining list. State =
# (step, remaining, selected, selected embeddings); scalar list
# lambdas only, which SQL recursion allows where aggregates are not.
_MMR_SCORE = (
    f"CAST({MMR_LAMBDA} AS DOUBLE) * struct_extract(c, 'rel')"
    f" - (CAST(1.0 AS DOUBLE) - CAST({MMR_LAMBDA} AS DOUBLE))"
    " * coalesce(list_max(list_transform(sembs, se ->"
    " list_sum(list_transform(list_zip(struct_extract(c, 'emb'), se),"
    " p -> p[1] * p[2]))"
    " / (sqrt(list_sum(list_transform(struct_extract(c, 'emb'),"
    " v -> v * v)))"
    " * sqrt(list_sum(list_transform(se, v -> v * v)))))),"
    " CAST(0 AS DOUBLE))"
)

_MMR_ORACLE = f"""
WITH RECURSIVE q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
pool AS MATERIALIZED (
    SELECT e.vec_id,
           list_transform(e.embedding, v -> CAST(v AS DOUBLE)) AS emb,
           round({{DUCK_COS}}, 6) AS rel
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id <> 0
    ORDER BY rel DESC, e.vec_id
    LIMIT {MMR_CANDIDATES}
),
init AS (
    SELECT 0 AS step,
           list({{{{'vid': vec_id, 'rel': rel, 'emb': emb}}}}
                ORDER BY vec_id) AS rem,
           CAST([] AS STRUCT(rnk INT, vid BIGINT, rel DOUBLE,
                             score DOUBLE)[]) AS sel,
           CAST([] AS DOUBLE[][]) AS sembs
    FROM pool
),
greedy AS (
    SELECT step, rem, sel, sembs FROM init
    UNION ALL
    SELECT step + 1,
           list_filter(rem, c -> struct_extract(c, 'vid')
                              <> struct_extract(pick, 'vid')),
           sel || [{{{{'rnk': CAST(step + 1 AS INT),
                    'vid': struct_extract(pick, 'vid'),
                    'rel': struct_extract(pick, 'rel'),
                    'score': struct_extract(pick, 'score')}}}}],
           sembs || [struct_extract(pick, 'emb')]
    FROM (
        SELECT step, rem, sel, sembs,
               list_filter(scored, s -> struct_extract(s, 'score') =
                   list_max(list_transform(scored,
                       z -> struct_extract(z, 'score'))))[1] AS pick
        FROM (
            SELECT step, rem, sel, sembs,
                   list_transform(rem, c -> {{{{
                       'vid': struct_extract(c, 'vid'),
                       'rel': struct_extract(c, 'rel'),
                       'emb': struct_extract(c, 'emb'),
                       'score': {_MMR_SCORE}
                   }}}}) AS scored
            FROM greedy
            WHERE step < {K} AND len(rem) > 0
        )
    )
)
SELECT struct_extract(u, 'rnk') AS rank,
       struct_extract(u, 'vid') AS vec_id,
       struct_extract(u, 'rel') AS relevance,
       struct_extract(u, 'score') AS mmr_score
FROM (SELECT sel FROM greedy
      WHERE step = (SELECT max(step) FROM greedy)) f,
     LATERAL unnest(f.sel) AS t(u)
""".format(DUCK_COS=_duck_cosine("e.embedding", "q.qv"))


@query("llm_mmr_diversify", family="llm", oracle=_MMR_ORACLE)
def llm_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998) over the brute-force candidate pool: greedy selection of K
    results maximizing λ·relevance − (1−λ)·max-similarity-to-selected —
    the diversity step between retrieval and context assembly in a RAG
    / dedup-aware sampling pipeline.

    Distribution shape: candidate scoring is the full distributed
    cosine scan (same TakeOrderedAndProject top-k as llm_simsearch);
    only the MMR_CANDIDATES-row pool crosses to the driver for the
    inherently sequential greedy loop (each pick depends on all prior
    picks), mirroring the IVF-centroid allowance — model-sized, never
    corpus-sized.

    SQL-ORACLED since round 11 (the 9th rows-only→SQL conversion, and
    the first FLOAT-greedy one): every arithmetic step of the loop is
    an ordered sequential double fold — Python sum() ≡ index-ordered
    list_sum, math.sqrt ≡ sqrt, and the strictly-greater argmax scan
    ≡ first-max-in-vid-order — so _MMR_ORACLE replays the selection
    bit-for-bit as a LIST-MACHINE recursive CTE (the graph_coreness
    pattern). tests/test_llm_sim.py additionally re-runs the greedy
    spec in NumPy and asserts the identical selection, order, scores.
    """
    emb = t(spark, sf_dir, "embeddings")
    qv = F.broadcast(
        emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    )
    pool = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(qv)
        .select(
            "vec_id",
            "embedding",
            F.round(cosine("embedding", "qv"), 6).alias("rel"),
        )
        .orderBy(F.desc("rel"), "vec_id")
        .limit(MMR_CANDIDATES)
        .collect()
    )
    import math

    def cos(a, b):
        num = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) * float(x) for x in a))
        nb = math.sqrt(sum(float(y) * float(y) for y in b))
        return num / (na * nb)

    selected: list[tuple] = []
    remaining = {r["vec_id"]: r for r in pool}
    while remaining and len(selected) < K:
        best = None
        for vid in sorted(remaining):  # vec_id-ordered scan → stable ties
            r = remaining[vid]
            max_sim = max(
                (cos(r["embedding"], s[3]) for s in selected), default=0.0
            )
            score = MMR_LAMBDA * r["rel"] - (1.0 - MMR_LAMBDA) * max_sim
            if best is None or score > best[1]:
                best = (vid, score)
        vid, score = best
        r = remaining.pop(vid)
        selected.append((len(selected) + 1, vid, r["rel"], r["embedding"], score))
    rows = [
        (rank, vid, float(rel), float(score))
        for rank, vid, rel, _, score in selected
    ]
    return spark.createDataFrame(
        rows, "rank INT, vec_id BIGINT, relevance DOUBLE, mmr_score DOUBLE"
    )


@query(
    "llm_hard_negatives",
    family="llm",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, label AS qlabel, embedding AS qv
               FROM embeddings WHERE vec_id % 200 = 0),
    scored AS (
        SELECT q.qid, q.qlabel, e.vec_id, e.label,
               round({_duck_cosine('e.embedding', 'q.qv')}, 6) AS score,
               row_number() OVER (
                   PARTITION BY q.qid
                   ORDER BY round({_duck_cosine('e.embedding', 'q.qv')}, 6) DESC,
                            e.vec_id) AS rn
        FROM embeddings e CROSS JOIN q
        WHERE e.label <> q.qlabel
    )
    SELECT qid, qlabel, vec_id AS neg_id, label AS neg_label, score
    FROM scored WHERE rn <= 3
    """,
)
def llm_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive/retrieval training: for
    each anchor vector, the 3 most-similar vectors carrying a
    DIFFERENT label — the highest-loss negatives a dual-encoder
    trains against (random negatives are too easy; same-label
    near-neighbors would be false negatives and are excluded by the
    label filter, the standard in-batch-negatives correction).

    Scale shape = llm_knn_join's: anchors broadcast, corpus never
    shuffles for the scoring, per-pair cost is ONE dot fold with both
    norms precomputed per row, and only |anchors|×|corpus| scored
    pairs enter the per-anchor top-k window. At real scale the IVF
    cell-probe prefilter (llm_simsearch_ivf) bounds the candidate
    set; mined pairs are what the training-data assembler
    (llm_dpo_format-style) consumes downstream.
    """
    emb = t(spark, sf_dir, "embeddings")
    nrm = F.sqrt(dot("embedding", "embedding"))
    q = F.broadcast(
        emb.filter(F.col("vec_id") % 200 == 0).select(
            F.col("vec_id").alias("qid"),
            F.col("label").alias("qlabel"),
            F.col("embedding").alias("qv"),
            nrm.alias("qn"),
        )
    )
    corpus = emb.repartition(
        spark.sparkContext.defaultParallelism
    ).select("vec_id", "label", "embedding", nrm.alias("en"))
    from pyspark.sql import Window

    score = dot("embedding", "qv") / (F.col("en") * F.col("qn"))
    scored = (
        corpus.crossJoin(q)
        .filter(F.col("label") != F.col("qlabel"))
        .select(
            "qid",
            "qlabel",
            F.col("vec_id").alias("neg_id"),
            F.col("label").alias("neg_label"),
            F.round(score, 6).alias("score"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), "neg_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("qid", "qlabel", "neg_id", "neg_label", "score")
    )


PQ_M = 8  # subspaces (64 dims → 8 per subspace)
PQ_K = 32  # centroids per subspace (5-bit codes; 16 measured recall
# 0.4-0.5 on these near-uniform synthetic embeddings — weak cluster
# structure needs the finer quantizer)
PQ_TRAIN_N = 500  # deterministic training sample (vec_id < N)
PQ_ITERS = 6
PQ_SHORTLIST = 10  # re-rank pool = PQ_SHORTLIST×K ADC-top candidates


def _train_pq(spark: SparkSession, sf_dir: str) -> list[list[list[float]]]:
    """Per-subspace codebooks: k-means on the UNIT vectors' 8-dim
    slices, trained driver-side on a deterministic sample (vec_id <
    PQ_TRAIN_N — standard PQ practice: codebooks are model state
    learned from a sample, the corpus-sized work is encoding). Init =
    first PQ_K sample subvectors; fixed PQ_ITERS Lloyd rounds; empty
    cells keep their previous centroid. Pure-Python arithmetic on
    float64 — deterministic."""
    key = ("pq", sf_dir)
    if key in _MODEL_CACHE:
        return _MODEL_CACHE[key]
    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    rows = (
        emb.filter(F.col("vec_id") < PQ_TRAIN_N).orderBy("vec_id").collect()
    )
    dim = len(rows[0]["embedding"])
    sub = dim // PQ_M
    units = []
    for r in rows:
        v = [float(x) for x in r["embedding"]]
        n = sum(x * x for x in v) ** 0.5
        units.append([x / n for x in v])
    books: list[list[list[float]]] = []
    for m in range(PQ_M):
        xs = [u[m * sub : (m + 1) * sub] for u in units]
        cents = [list(x) for x in xs[:PQ_K]]
        for _ in range(PQ_ITERS):
            sums = [[0.0] * sub for _ in range(PQ_K)]
            ns = [0] * PQ_K
            for x in xs:
                best, bd = 0, float("inf")
                for j, c in enumerate(cents):
                    d = sum((a - b) * (a - b) for a, b in zip(x, c))
                    if d < bd:
                        best, bd = j, d
                ns[best] += 1
                for i, a in enumerate(x):
                    sums[best][i] += a
            cents = [
                [s / ns[j] for s in sums[j]] if ns[j] else cents[j]
                for j in range(PQ_K)
            ]
        books.append(cents)
    while len(_MODEL_CACHE) >= _MODEL_CACHE_MAX:
        _MODEL_CACHE.pop(next(iter(_MODEL_CACHE)))
    _MODEL_CACHE[key] = books
    return books


def _pq_code_expr(books: list[list[list[float]]], unit: str = "_u") -> "F.Column":
    """In-row PQ encoding: per subspace, argmin squared-L2 of the unit
    vector's slice against the PQ_K codebook entries (unrolled literal
    folds, the _km_assign_expr pattern) — returns the M-element code
    array. Zero shuffles at any corpus size."""
    sub_codes = []
    for m, cents in enumerate(books):
        sub = len(cents[0])
        off = m * sub + 1  # slice() is 1-based
        entries = []
        for j, c in enumerate(cents):
            arr = "array(" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in c) + ")"
            d2 = (
                f"aggregate(zip_with(slice({unit}, {off}, {sub}), {arr}, "
                "(x, y) -> (x - y) * (x - y)), "
                "CAST(0 AS DOUBLE), (a, v) -> a + v)"
            )
            entries.append(f"struct({d2} AS d2, {j} AS c)")
        sub_codes.append(f"array_min(array({', '.join(entries)})).c")
    return F.expr(f"array({', '.join(sub_codes)})")


def _pq_oracle() -> str:
    """Relational replay of the ENTIRE PQ pipeline (rows-only→SQL
    conversion #23, round 12): the per-subspace Lloyd trainer
    (_train_pq is pure sequential Python over the vec_id-ordered
    sample — first-min argmin ≡ row_number (d2, cell), per-cell sums
    in vec_id order ≡ list_sum(ORDER BY vec_id), s/n raw division),
    the corpus encoding (argmin per (vector, subspace) against the
    final codebooks), the ADC table (query-subvector dots), the
    adc-ranked shortlist, and the exact-cosine re-rank. All 8
    subspaces train in lockstep as one (m, cell)-keyed relation, so
    the 6 rounds unroll once, not per subspace."""
    sub = 64 // PQ_M
    dims8 = f"(SELECT CAST(range AS INT) AS dim FROM range({sub}))"
    parts = [
        f"""
    WITH v AS MATERIALIZED (
        SELECT e.vec_id, e.label,
               list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings e
    ),
    u AS MATERIALIZED (
        SELECT vec_id, label,
               e,
               list_transform(e, x -> x /
                   sqrt(list_sum(list_transform(e, y -> y * y)))) AS uv
        FROM v
    ),
    msel AS (SELECT CAST(range AS INT) AS m FROM range({PQ_M})),
    sx AS MATERIALIZED (
        SELECT s.vec_id, ms.m,
               list_transform(generate_series(ms.m * {sub} + 1,
                                              ms.m * {sub} + {sub}),
                              i -> s.uv[i]) AS x
        FROM u s CROSS JOIN msel ms
        WHERE s.vec_id < {PQ_TRAIN_N}
    ),
    pc0 AS MATERIALIZED (
        SELECT m, CAST(rn - 1 AS INT) AS cell, x AS arr FROM (
            SELECT m, x,
                   row_number() OVER (PARTITION BY m ORDER BY vec_id)
                       AS rn
            FROM sx
        ) WHERE rn <= {PQ_K}
    )"""
    ]
    for i in range(1, PQ_ITERS + 1):
        parts.append(
            f""",
    pa{i} AS MATERIALIZED (
        SELECT vec_id, m, x, cell FROM (
            SELECT sx.vec_id, sx.m, sx.x, c.cell,
                   row_number() OVER (PARTITION BY sx.vec_id, sx.m
                       ORDER BY list_sum(list_transform(
                                    list_zip(sx.x, c.arr),
                                    q -> (q[1] - q[2]) * (q[1] - q[2]))),
                                c.cell) AS rn
            FROM sx JOIN pc{i - 1} c ON c.m = sx.m
        ) WHERE rn = 1
    ),
    pc{i} AS MATERIALIZED (
        SELECT pc.m, pc.cell, coalesce(nc.arr, pc.arr) AS arr
        FROM pc{i - 1} pc LEFT JOIN (
            SELECT m, cell, list(mn ORDER BY dim) AS arr FROM (
                SELECT a.m, a.cell, r.dim,
                       list_sum(list(a.x[r.dim + 1] ORDER BY a.vec_id))
                           / CAST(count(*) AS BIGINT) AS mn
                FROM pa{i} a CROSS JOIN {dims8} r
                GROUP BY a.m, a.cell, r.dim
            ) GROUP BY m, cell
        ) nc ON nc.m = pc.m AND nc.cell = pc.cell
    )"""
        )
    parts.append(
        f""",
    codes AS MATERIALIZED (
        SELECT vec_id, m, cell AS code FROM (
            SELECT u.vec_id, ms.m, c.cell,
                   row_number() OVER (PARTITION BY u.vec_id, ms.m
                       ORDER BY list_sum(list_transform(
                                    list_zip(
                                        list_transform(
                                            generate_series(
                                                ms.m * {sub} + 1,
                                                ms.m * {sub} + {sub}),
                                            i -> u.uv[i]),
                                        c.arr),
                                    q -> (q[1] - q[2]) * (q[1] - q[2]))),
                                c.cell) AS rn
            FROM u CROSS JOIN msel ms
            JOIN pc{PQ_ITERS} c ON c.m = ms.m
        ) WHERE rn = 1
    ),
    q AS (SELECT e AS q FROM v WHERE vec_id = 0),
    qu AS (
        SELECT list_transform(q, x -> x /
                   sqrt(list_sum(list_transform(q, y -> y * y)))) AS qu
        FROM q
    ),
    adctab AS MATERIALIZED (
        SELECT c.m, c.cell,
               list_sum(list_transform(
                   list_zip(list_transform(
                       generate_series(c.m * {sub} + 1,
                                       c.m * {sub} + {sub}),
                       i -> qu.qu[i]), c.arr),
                   p -> p[1] * p[2])) AS t
        FROM pc{PQ_ITERS} c CROSS JOIN qu
    ),
    adc AS MATERIALIZED (
        SELECT cd.vec_id, list_sum(list(at.t ORDER BY cd.m)) AS adc
        FROM codes cd JOIN adctab at
             ON at.m = cd.m AND at.cell = cd.code
        WHERE cd.vec_id <> 0
        GROUP BY cd.vec_id
    ),
    short AS (
        SELECT vec_id, adc FROM adc
        ORDER BY adc DESC, vec_id LIMIT {PQ_SHORTLIST * K}
    )
    SELECT vec_id, label, adc, score FROM (
        SELECT s.vec_id, u2.label, round(s.adc, 6) AS adc,
               round(list_sum(list_transform(list_zip(u2.e, q.q),
                                             p -> p[1] * p[2]))
                     / (sqrt(list_sum(list_transform(u2.e, x -> x * x)))
                        * sqrt(list_sum(list_transform(q.q,
                                                       x -> x * x)))),
                     6) AS score
        FROM short s JOIN u u2 ON u2.vec_id = s.vec_id CROSS JOIN q
    )
    ORDER BY score DESC, vec_id
    LIMIT {K}"""
    )
    return "".join(parts)


@query("llm_simsearch_pq", family="llm", oracle=_pq_oracle())
def llm_simsearch_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011): the memory-bound
    scale path next to IVF's compute-bound one. Unit vectors are
    encoded into PQ_M 5-bit codes (in-row argmin against per-subspace
    codebooks — 64 doubles collapse to 8 codes, a 64× compression);
    the query scan is ADC (asymmetric distance computation): the
    driver precomputes the query's per-(subspace, code) inner-product
    table (PQ_M×PQ_K floats — model-sized), and each corpus row's
    approximate cosine is 8 literal-array lookups + adds, no vector
    math at scan time. Top candidates re-rank with the EXACT cosine
    (returned scores are exact — PQ only orders candidates).

    At 100 TB the codes table (1+8 bytes/vector) replaces the 512-byte
    vector column for the scan; only the top re-rank touches raw
    vectors. Shortlist sizing measured: PQ_SHORTLIST×K re-rank pool
    gives recall@10 = 1.0 (sf0.01) / 0.9 (sf0.1) on the synthetic
    corpus, vs 0.4-0.5 at 3×K — these near-uniform vectors are PQ's
    hard case (true neighbors barely separate from the bulk), so the
    pool is deliberately generous. SQL-ORACLED since round 12
    (conversion #23 — _pq_oracle replays the trainer, encoding, ADC
    table and exact re-rank relationally);
    tests/test_llm_sim.py gates recall@10 vs the exact top-k and
    checks returned scores are exact cosines.
    """
    emb = t(spark, sf_dir, "embeddings")
    books = _train_pq(spark, sf_dir)
    encoded = emb.select(
        "vec_id", "label", "embedding", F.expr(_UNIT_EMBEDDING).alias("_u")
    ).select(
        "vec_id", "label", "embedding", _pq_code_expr(books).alias("codes")
    ).persist()

    q = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    qn = sum(float(x) * float(x) for x in q) ** 0.5
    qunit = [float(x) / qn for x in q]
    sub = len(qunit) // PQ_M
    # ADC lookup tables: <q_m, c_(m,j)> per subspace/code (model-sized)
    adc_terms = []
    for m, cents in enumerate(books):
        qm = qunit[m * sub : (m + 1) * sub]
        tbl = [sum(a * b for a, b in zip(qm, c)) for c in cents]
        lits = ", ".join(f"CAST({v!r} AS DOUBLE)" for v in tbl)
        adc_terms.append(f"element_at(array({lits}), codes[{m}] + 1)")
    adc = F.expr(" + ".join(adc_terms))

    qv = F.broadcast(
        emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    )
    shortlist = (
        encoded.filter(F.col("vec_id") != 0)
        .select("vec_id", "label", "embedding", adc.alias("adc"))
        .orderBy(F.desc("adc"), "vec_id")
        .limit(PQ_SHORTLIST * K)
    )
    return (
        shortlist.crossJoin(qv)
        .select(
            "vec_id",
            "label",
            F.round("adc", 6).alias("adc"),
            F.round(cosine("embedding", "qv"), 6).alias("score"),
        )
        .orderBy(F.desc("score"), "vec_id")
        .limit(K)
    )


@query(
    "llm_ivf_partitioned",
    family="llm",
    # identical result to llm_simsearch_ivf by construction (same
    # model, probes, exact re-scoring) — the SAME oracle verifies both
    # (conversion #20, round 12): the layout changes the access path,
    # and now the external hash check proves it changes nothing else
    oracle=_ivf_oracle(IVF_CELLS, 4, IVF_NPROBE, K),
)
def llm_ivf_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF claim REALIZED as storage layout: the corpus is written
    to parquet PARTITIONED BY its trained cell id, and a probe becomes
    a directory prune — llm_simsearch_ivf's docstring promises "at
    100 TB, write the corpus partitioned BY cell so a probe is a
    partition prune, not a filter"; this operator is that write + the
    pruned read-back. The probe filter shows up as PartitionFilters on
    the scan (plan-pinned in tests/test_plan_shape.py) and untouched
    cells contribute ZERO input files, at any corpus size.

    Result is identical to llm_simsearch_ivf by construction (same
    model, same probes, same exact re-scoring on original vectors) —
    the pytest asserts row-for-row equality, so the layout is proven
    to change the ACCESS PATH and nothing else. Rows-only (trained
    model in the path); the write is marker-gated like the other
    sink-backed scans.
    """
    import os

    from local_etl_spark.queries.scans import _cache_dir

    emb = t(spark, sf_dir, "embeddings")
    centroids = _lloyd(spark, sf_dir, k=IVF_CELLS, iters=KM_ITERS, spherical=True)
    path = _cache_dir(sf_dir, f"embeddings_by_cell_{_model_fp(centroids)}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        emb.select(
            "vec_id", "label", "embedding", F.expr(_UNIT_EMBEDDING).alias("_u")
        ).select(
            "vec_id",
            "label",
            "embedding",
            _km_assign_expr(centroids, vector="_u").alias("cid"),
        ).write.mode("overwrite").partitionBy("cid").parquet(path)

    q = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    qn = sum(float(x) * float(x) for x in q) ** 0.5
    qunit = [float(x) / qn for x in q]

    def cell_sim(c: list[float]) -> float:
        cn = sum(v * v for v in c) ** 0.5
        return sum(u * v for u, v in zip(qunit, c)) / cn

    probe = sorted(
        range(len(centroids)), key=lambda j: (-cell_sim(centroids[j]), j)
    )[:IVF_NPROBE]

    back = spark.read.parquet(path)
    qv = F.broadcast(
        emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    )
    return (
        back.filter(F.col("cid").isin(probe))
        .filter(F.col("vec_id") != 0)
        .crossJoin(qv)
        .select(
            "vec_id",
            "label",
            F.round(cosine("embedding", "qv"), 6).alias("score"),
        )
        .orderBy(F.desc("score"), "vec_id")
        .limit(K)
    )


# Ideal DCG for a binary-relevance K-list, embedded as ONE double
# literal in BOTH engines (a model constant, like the centroid
# matrices): the numerator DCG uses each engine's ln() — proven
# bit-identical cross-engine by the graph.py ordered folds — while a
# shared literal denominator removes any fold-order question from the
# constant side entirely.
import math as _math

IDCG_AT_K = repr(sum(1.0 / _math.log(i + 1) for i in range(1, K + 1)))


def retrieval_metrics(
    shortlists: DataFrame, gold: DataFrame, k: int = K
) -> DataFrame:
    """recall@k / MRR / nDCG@k of ranked shortlists vs a gold id set.

    ``shortlists``: (system, vec_id, score) rows, ranked here by
    (score desc, vec_id) and truncated to the top k per system;
    ``gold``: (vec_id), the exact answer set (size k for top-k
    retrieval; for pair-recall use the exact pair-key set and
    k = |gold|). This is THE metric implementation: the registry's
    llm_retrieval_eval query aggregates through it, and the pytest
    recall gates for the trained ANN paths (IVF / PQ / LSH) call it on
    their own shortlists — one implementation, externally
    hash-checked, then reused as the test ruler (VERDICT r7 #6).

    Determinism: relevance is integer; recall and MRR are single
    divisions of small exact integers; DCG is an ORDERED fold of
    1/ln(rank+1) terms (rank-ascending, ≡ DuckDB list(... ORDER BY
    rank)); the IDCG denominator is a python-computed literal (for
    k = K it is bit-identical to the IDCG_AT_K constant embedded in
    the SQL witness).
    """
    from pyspark.sql import Window

    idcg = sum(1.0 / _math.log(i + 1) for i in range(1, k + 1))
    w = Window.partitionBy("system").orderBy(F.desc("score"), "vec_id")
    ranked = shortlists.select(
        "system", "vec_id", F.row_number().over(w).alias("rank")
    ).filter(F.col("rank") <= k)
    j = ranked.join(
        F.broadcast(gold.select("vec_id", F.lit(1).alias("rel"))),
        "vec_id",
        "left",
    ).select("system", "rank", F.coalesce("rel", F.lit(0)).alias("rel"))
    dcg = (
        "aggregate(array_sort(collect_list(struct(rank, rel))),"
        " CAST(0 AS DOUBLE),"
        " (a, s) -> a + IF(s.rel = 1,"
        " CAST(1 AS DOUBLE) / ln(CAST(s.rank + 1 AS DOUBLE)),"
        " CAST(0 AS DOUBLE)))"
    )
    return (
        j.groupBy("system")
        .agg(
            F.sum("rel").cast("bigint").alias("hits"),
            F.min(F.when(F.col("rel") == 1, F.col("rank"))).alias("_fr"),
            F.expr(dcg).alias("_dcg"),
        )
        .select(
            "system",
            F.lit(k).cast("bigint").alias("k"),
            "hits",
            (F.round(F.col("hits").cast("double") / k, 6) + 0.0).alias(
                "recall_at_k"
            ),
            (
                F.round(
                    F.coalesce(F.lit(1.0) / F.col("_fr"), F.lit(0.0)), 6
                )
                + 0.0
            ).alias("mrr"),
            (
                F.round(F.col("_dcg") / F.lit(idcg), 6) + 0.0
            ).alias("ndcg"),
        )
    )


_DEQUANT = (
    "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / ma"
    " + 0.5) AS BIGINT) * ma / 127.0)"
)


@query(
    "llm_retrieval_eval",
    family="llm",
    oracle=f"""
    WITH p AS (
        SELECT vec_id, embedding,
               list_max(list_transform(embedding,
                        x -> abs(CAST(x AS DOUBLE)))) AS ma
        FROM embeddings
    ),
    s AS MATERIALIZED (
        SELECT vec_id, embedding,
               list_transform(embedding, x ->
                   CAST(floor(CAST(x AS DOUBLE) * 127.0 / ma + 0.5)
                        AS BIGINT) * ma / 127.0) AS dqv,
               embedding[1:16] AS e16
        FROM p
    ),
    q AS (SELECT embedding AS qv, dqv AS qdq, e16 AS q16
          FROM s WHERE vec_id = 0),
    gold AS (
        SELECT s.vec_id, 1 AS rel
        FROM s CROSS JOIN q WHERE s.vec_id <> 0
        ORDER BY round({_duck_cosine('s.embedding', 'q.qv')}, 6) DESC,
                 s.vec_id
        LIMIT {K}
    ),
    sys1 AS (
        SELECT 'int8' AS system, s.vec_id,
               round({_duck_cosine('s.dqv', 'q.qdq')}, 6) AS score
        FROM s CROSS JOIN q WHERE s.vec_id <> 0
        ORDER BY score DESC, s.vec_id LIMIT {K}
    ),
    sys2 AS (
        SELECT 'trunc16' AS system, s.vec_id,
               round({_duck_cosine('s.e16', 'q.q16')}, 6) AS score
        FROM s CROSS JOIN q WHERE s.vec_id <> 0
        ORDER BY score DESC, s.vec_id LIMIT {K}
    ),
    sl AS (
        SELECT system, vec_id,
               row_number() OVER (PARTITION BY system
                                  ORDER BY score DESC, vec_id) AS rank
        FROM (SELECT * FROM sys1 UNION ALL SELECT * FROM sys2)
    ),
    j AS (
        SELECT system, rank, COALESCE(rel, 0) AS rel
        FROM sl LEFT JOIN gold USING (vec_id)
    )
    SELECT system, CAST({K} AS BIGINT) AS k,
           CAST(sum(rel) AS BIGINT) AS hits,
           round(CAST(sum(rel) AS DOUBLE) / {K}, 6) + 0.0 AS recall_at_k,
           round(COALESCE(CAST(1 AS DOUBLE)
                 / min(CASE WHEN rel = 1 THEN rank END),
                 CAST(0 AS DOUBLE)), 6) + 0.0 AS mrr,
           round(list_sum(list(CASE WHEN rel = 1
                     THEN CAST(1 AS DOUBLE) / ln(CAST(rank + 1 AS DOUBLE))
                     ELSE CAST(0 AS DOUBLE) END ORDER BY rank))
                 / {IDCG_AT_K}, 6) + 0.0 AS ndcg
    FROM j GROUP BY system
    """,
)
def llm_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation — recall@K, MRR, nDCG@K of an
    approximate shortlist against the exact cosine top-K gold set: the
    eval harness every ANN deployment runs before swapping an index
    in. Two SQL-replayable approximate systems are graded here so the
    whole pipeline (shortlist → rank → integer relevance → metric
    folds) is externally hash-checked end to end:

      - 'int8':    search over symmetrically dequantized int8 vectors
                   (the llm_embed_quantize arithmetic — what serving
                   on quantized storage actually returns);
      - 'trunc16': search over the first 16 of 64 dims (Matryoshka-
                   style truncation — the cheap-first-pass trade).

    The TRAINED paths (IVF / PQ / LSH) can't be replayed in the SQL
    witness (sample-trained k-means state), so they are graded by the
    SAME ``retrieval_metrics`` aggregation in
    tests/test_llm_sim.py::test_retrieval_eval_trained_paths — this
    query is the externally-verified ruler; the tests reuse it, which
    retires the ad-hoc set-intersection recall assertions.

    Scale: each shortlist is a TakeOrderedAndProject (per-partition
    heaps, no global sort) over a map-only scored scan; everything
    after the K-row shortlists is model-sized. The rank window
    partitions by system over 2K rows.
    """
    emb = t(spark, sf_dir, "embeddings")
    staged = (
        emb.select(
            "vec_id",
            "embedding",
            F.expr(
                "array_max(transform(embedding,"
                " x -> abs(CAST(x AS DOUBLE))))"
            ).alias("ma"),
        )
        .select(
            "vec_id",
            "embedding",
            F.expr(_DEQUANT).alias("dqv"),
            F.expr("slice(embedding, 1, 16)").alias("e16"),
        )
    )
    q = F.broadcast(
        staged.filter(F.col("vec_id") == 0).select(
            F.col("embedding").alias("qv"),
            F.col("dqv").alias("qdq"),
            F.col("e16").alias("q16"),
        )
    )
    corpus = staged.filter(F.col("vec_id") != 0).crossJoin(q)

    def shortlist(score: F.Column, name: str) -> DataFrame:
        return (
            corpus.select("vec_id", F.round(score, 6).alias("score"))
            .orderBy(F.desc("score"), "vec_id")
            .limit(K)
            .select(F.lit(name).alias("system"), "vec_id", "score")
        )

    gold = (
        corpus.select(
            "vec_id", F.round(cosine("embedding", "qv"), 6).alias("score")
        )
        .orderBy(F.desc("score"), "vec_id")
        .limit(K)
        .select("vec_id")
    )
    sl = shortlist(cosine("dqv", "qdq"), "int8").unionAll(
        shortlist(cosine("e16", "q16"), "trunc16")
    )
    return retrieval_metrics(sl, gold)


# --- Incremental ANN maintenance (VERDICT r10 #7) -----------------------

IVF_INCR_MOD = 10  # vec_id % MOD == 0 plays the "new daily batch" role
# the incremental oracle above bakes mod=10 at decoration time
assert IVF_INCR_MOD == 10, "update _INCR_ORACLE's baked modulus"


_INCR_ORACLE = """
WITH {machine},
fin AS (
    SELECT vec_id, cell FROM (
        SELECT vu.vec_id, c.cell,
               row_number() OVER (PARTITION BY vu.vec_id
                   ORDER BY list_sum(list_transform(
                                list_zip(vu.u, c.arr),
                                q -> (q[1] - q[2]) * (q[1] - q[2]))),
                            c.cell) AS rn
        FROM vu CROSS JOIN c4 c
    ) WHERE rn = 1
),
census AS (
    SELECT cell AS cid,
           CAST(sum(CASE WHEN vec_id % {mod} <> 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_base,
           CAST(sum(CASE WHEN vec_id % {mod} = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_new
    FROM fin GROUP BY cell
),
tot AS (
    SELECT CAST(sum(n_base) AS BIGINT) AS tb,
           CAST(sum(n_new) AS BIGINT) AS tn
    FROM census
)
SELECT CAST(cid AS INT) AS cid, n_base, n_new,
       round(CAST(n_base AS DOUBLE) / tb, 6) AS share_base,
       round(CAST(n_new AS DOUBLE) / tn, 6) AS share_new,
       round(CAST(n_new AS DOUBLE) / tn
             - CAST(n_base AS DOUBLE) / tb, 6) + 0.0 AS drift
FROM census CROSS JOIN tot
"""


@query(
    "llm_ann_ivf_incremental",
    family="llm",
    # conversion #21, round 12: the census is fully machine-derivable —
    # the spherical Lloyd replay (_lloyd_ctes) assigns every vector,
    # the layout is pytest-proven ≡ a full rebuild of exactly those
    # assignments, so the oracle counts the machine's fin relation
    # split by the deterministic vec_id % 10 batch rule. The engine
    # still reads its counts back FROM THE WRITTEN LAYOUT (that's the
    # op's point); the model fingerprint in the cache path guarantees
    # the layout was written by THIS model.
    oracle=_INCR_ORACLE.format(
        machine=_lloyd_ctes(IVF_CELLS, 4, spherical=True), mod=10
    ),
)
def llm_ann_ivf_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF index maintenance — the op every GROWING corpus
    needs between retrains: assign a NEW vector batch to the EXISTING
    trained cells (broadcast model, map-only, no retrain), APPEND it to
    the cell-partitioned layout, and report the per-cell drift witness
    (new-batch cell shares vs the base corpus — the signal a pipeline
    watches to decide when the frozen centroids have gone stale and a
    retrain is due).

    The batch split is deterministic: vec_id % IVF_INCR_MOD == 0 is
    "today's crawl" (10%), the rest is the already-indexed base. Both
    slices assign with the SAME frozen spherical-kmeans model the rest
    of the ANN shelf uses (_lloyd — cached, so no extra training), so
    the incremental layout is bit-identical to a full rebuild:
    tests/test_llm_sim.py asserts (a) the appended layout's (cid,
    vec_id) set equals a from-scratch rebuild's, and (b) a probe over
    the incremental layout is row-identical to llm_simsearch_ivf.

    Output (one row per cell, IVF_CELLS rows): base/new counts read
    back FROM THE LAYOUT (so the append path itself is what is
    witnessed), cell shares, and the share drift. SQL-ORACLED since
    round 12 (conversion #21): the _lloyd_ctes machine re-derives
    every assignment and the oracle censuses its fin relation under
    the same vec_id % 10 split — agreement therefore ALSO proves the
    written layout matches the live model (the cache path carries a
    model fingerprint so a trainer change invalidates old layouts).

    Scale: assignment is the in-row codegen fold (zero shuffles); the
    append writes only the new batch's files (partition-sized, not
    corpus-sized — the whole point vs rebuild); the census is one
    cell-keyed aggregate over the read-back. At 100 TB the same op is
    the nightly index roll: freeze model → assign delta → append to
    the partitioned store → alert on drift.
    """
    import os

    from local_etl_spark.queries.scans import _cache_dir

    emb = t(spark, sf_dir, "embeddings")
    centroids = _lloyd(
        spark, sf_dir, k=IVF_CELLS, iters=KM_ITERS, spherical=True
    )

    def assigned(df: DataFrame, is_new: bool) -> DataFrame:
        # staged normalize (the llm_simsearch_ivf barrier pattern)
        return df.select(
            "vec_id",
            "label",
            "embedding",
            F.expr(_UNIT_EMBEDDING).alias("_u"),
        ).select(
            "vec_id",
            "label",
            "embedding",
            F.lit(is_new).alias("is_new"),
            _km_assign_expr(centroids, vector="_u").alias("cid"),
        )

    base = emb.filter(F.col("vec_id") % IVF_INCR_MOD != 0)
    new = emb.filter(F.col("vec_id") % IVF_INCR_MOD == 0)
    path = _cache_dir(
        sf_dir, f"embeddings_ivf_incr_{_model_fp(centroids)}"
    )
    # two-phase marker: parquet's own _SUCCESS lands after the FIRST
    # write, so gating on it would skip the append forever if the
    # sequence were interrupted — the custom marker is only created
    # once BOTH phases committed
    marker = os.path.join(path, "_INCR_DONE")
    if not os.path.exists(marker):
        assigned(base, False).write.mode("overwrite").partitionBy(
            "cid"
        ).parquet(path)
        assigned(new, True).write.mode("append").partitionBy(
            "cid"
        ).parquet(path)
        with open(marker, "w", encoding="utf-8") as fh:
            fh.write("")

    back = spark.read.parquet(path)
    census = back.groupBy("cid").agg(
        F.sum((~F.col("is_new")).cast("long")).alias("n_base"),
        F.sum(F.col("is_new").cast("long")).alias("n_new"),
    )
    tot = census.agg(
        F.sum("n_base").alias("tb"), F.sum("n_new").alias("tn")
    )
    share_base = F.col("n_base").cast("double") / F.col("tb")
    share_new = F.col("n_new").cast("double") / F.col("tn")
    return (
        census.crossJoin(F.broadcast(tot))
        .select(
            F.col("cid").cast("int").alias("cid"),
            "n_base",
            "n_new",
            F.round(share_base, 6).alias("share_base"),
            F.round(share_new, 6).alias("share_new"),
            (F.round(share_new - share_base, 6) + 0.0).alias("drift"),
        )
        .orderBy("cid")
    )


# --- Embedding-distribution drift (round 12) ---------------------------

DRIFT_BUCKET = 256  # fixed vec_id bucket width for the two-level fold

# Deterministic distributed summation: every double sum is a TWO-LEVEL
# ordered fold with a FIXED tree shape — fold values by vec_id inside
# constant-width vec_id buckets, then fold the bucket partials in
# bucket order. Level 1 is embarrassingly parallel (one task per
# bucket), level 2 is bucket-count-sized; the shape depends only on
# vec_id, never on partitioning, so Spark and DuckDB accumulate in the
# exact same sequence (the llm_mmr_diversify ordered-fold discipline,
# made scalable).
_DRIFT_ORACLE = f"""
WITH ex AS MATERIALIZED (
    SELECT vec_id, (vec_id % {IVF_INCR_MOD} = 0) AS is_new,
           vec_id // {DRIFT_BUCKET} AS bucket,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
    FROM embeddings
),
vals AS MATERIALIZED (
    SELECT vec_id, is_new, bucket, CAST(r.range AS INT) AS dim,
           e[CAST(r.range AS INT) + 1] AS val
    FROM ex CROSS JOIN range(64) r
),
b1 AS (
    SELECT is_new, dim, bucket,
           list_sum(list(val ORDER BY vec_id)) AS s,
           count(*) AS n
    FROM vals GROUP BY is_new, dim, bucket
),
dimstat AS MATERIALIZED (
    SELECT is_new, dim,
           list_sum(list(s ORDER BY bucket)) AS total,
           CAST(sum(n) AS BIGINT) AS n
    FROM b1 GROUP BY is_new, dim
),
means AS MATERIALIZED (
    SELECT b.dim AS dim,
           b.total / b.n AS mean_base,
           w.total / w.n AS mean_new
    FROM dimstat b JOIN dimstat w ON w.dim = b.dim
    WHERE NOT b.is_new AND w.is_new
),
l2 AS (
    SELECT sqrt(list_sum(list(
               (mean_new - mean_base) * (mean_new - mean_base)
               ORDER BY dim))) AS l2_shift
    FROM means
),
norms AS MATERIALIZED (
    SELECT vec_id, is_new, bucket,
           sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
    FROM ex
),
nb1 AS (
    SELECT is_new, bucket,
           list_sum(list(nrm ORDER BY vec_id)) AS s,
           list_sum(list(nrm * nrm ORDER BY vec_id)) AS ss,
           count(*) AS n
    FROM norms GROUP BY is_new, bucket
),
nstat AS (
    SELECT is_new,
           list_sum(list(s ORDER BY bucket)) AS tot,
           list_sum(list(ss ORDER BY bucket)) AS tot2,
           CAST(sum(n) AS BIGINT) AS n
    FROM nb1 GROUP BY is_new
),
nsumm AS (
    SELECT b.tot / b.n AS norm_mean_base,
           w.tot / w.n AS norm_mean_new,
           sqrt(greatest(b.tot2 / b.n - (b.tot / b.n) * (b.tot / b.n),
                         0.0)) AS norm_std_base,
           sqrt(greatest(w.tot2 / w.n - (w.tot / w.n) * (w.tot / w.n),
                         0.0)) AS norm_std_new,
           b.n AS n_base, w.n AS n_new
    FROM nstat b, nstat w WHERE NOT b.is_new AND w.is_new
)
SELECT CAST(m.dim AS INT) AS dim,
       round(m.mean_base, 6) + 0.0 AS mean_base,
       round(m.mean_new, 6) + 0.0 AS mean_new,
       round(m.mean_new - m.mean_base, 6) + 0.0 AS mean_shift,
       round(l.l2_shift, 6) + 0.0 AS l2_shift,
       round(s.norm_mean_base, 6) + 0.0 AS norm_mean_base,
       round(s.norm_mean_new, 6) + 0.0 AS norm_mean_new,
       round(s.norm_std_base, 6) + 0.0 AS norm_std_base,
       round(s.norm_std_new, 6) + 0.0 AS norm_std_new,
       round(s.norm_mean_new - s.norm_mean_base, 6) + 0.0 AS norm_shift,
       s.n_base AS n_base, s.n_new AS n_new
FROM means m CROSS JOIN l2 l CROSS JOIN nsumm s
"""

_OFOLD_VAL = (
    "aggregate(array_sort(collect_list(struct({k}, {v}))), "
    "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.{v})"
)


@query("llm_embedding_drift", family="llm", oracle=_DRIFT_ORACLE)
def llm_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift of the NEW embedding batch vs the base corpus
    (VERDICT r11 #6) — the retrain trigger that pairs with
    llm_ann_ivf_incremental's per-cell share deltas: when the nightly
    crawl's embedding distribution moves (new domains, model version
    skew, encoder regression), per-dimension mean shift and
    norm-distribution shift fire BEFORE cell shares visibly rot. Same
    deterministic batch split (vec_id % 10 == 0 is "today's crawl").

    Output: one row per dimension (64) with base/new means and the
    per-dim shift, plus cross-dim summary columns — the L2 norm of the
    mean-shift vector (the single drift scalar to alert on) and the
    norm-distribution mean/std shift (catches scale drift a mean shift
    misses, e.g. an un-normalized encoder rollout).

    Determinism (SQL-oracled): every cross-row double sum is a
    TWO-LEVEL ordered fold with a fixed tree shape — level 1 folds by
    vec_id within constant DRIFT_BUCKET-wide vec_id buckets, level 2
    folds the bucket partials in bucket order — so both engines
    accumulate in the exact same sequence regardless of partitioning.
    In-row norms are the _DOT sequential fold; embeddings pre-cast to
    DOUBLE once (the float32 trap).

    Scale: unlike a single corpus-wide collect_list fold (one task),
    the bucket level parallelizes across N/DRIFT_BUCKET tasks and only
    bucket partials cross the shuffle — at 100 TB add a third level
    (bucket-of-buckets) and the tree stays fixed-shape deterministic;
    the explode is map-side and 64× row-bounded, never array-dragging.
    """
    emb = t(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id",
        (F.col("vec_id") % IVF_INCR_MOD == 0).alias("is_new"),
        F.expr(f"vec_id DIV {DRIFT_BUCKET}").alias("bucket"),
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("e"),
    ).persist()
    vals = ex.select(
        "vec_id",
        "is_new",
        "bucket",
        F.posexplode("e").alias("dim", "val"),
    )
    b1 = vals.groupBy("is_new", "dim", "bucket").agg(
        F.expr(_OFOLD_VAL.format(k="vec_id", v="val")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    dimstat = b1.groupBy("is_new", "dim").agg(
        F.expr(_OFOLD_VAL.format(k="bucket", v="s")).alias("total"),
        F.sum("n").cast("bigint").alias("n"),
    )
    mean = (F.col("total") / F.col("n")).alias("m")
    base = dimstat.filter(~F.col("is_new")).select(
        "dim", mean.alias("mean_base")
    )
    new = dimstat.filter(F.col("is_new")).select(
        "dim", mean.alias("mean_new")
    )
    means = base.join(new, "dim").persist()
    l2 = means.select(
        "dim",
        (
            (F.col("mean_new") - F.col("mean_base"))
            * (F.col("mean_new") - F.col("mean_base"))
        ).alias("sq"),
    ).agg(
        F.sqrt(
            F.expr(_OFOLD_VAL.format(k="dim", v="sq"))
        ).alias("l2_shift")
    )
    norms = ex.select(
        "vec_id",
        "is_new",
        "bucket",
        F.expr(
            "sqrt(aggregate(transform(e, x -> x * x),"
            " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"
        ).alias("nrm"),
    )
    nb1 = norms.groupBy("is_new", "bucket").agg(
        F.expr(_OFOLD_VAL.format(k="vec_id", v="nrm")).alias("s"),
        F.expr(
            "aggregate(array_sort(collect_list(struct(vec_id,"
            " nrm * nrm AS nrm2))), CAST(0.0 AS DOUBLE),"
            " (acc, x) -> acc + x.nrm2)"
        ).alias("ss"),
        F.count(F.lit(1)).alias("n"),
    )
    nstat = nb1.groupBy("is_new").agg(
        F.expr(_OFOLD_VAL.format(k="bucket", v="s")).alias("tot"),
        F.expr(_OFOLD_VAL.format(k="bucket", v="ss")).alias("tot2"),
        F.sum("n").cast("bigint").alias("n"),
    )
    nmean = F.col("tot") / F.col("n")
    nstd = F.sqrt(
        F.greatest(
            F.col("tot2") / F.col("n") - nmean * nmean, F.lit(0.0)
        )
    )
    nbase = nstat.filter(~F.col("is_new")).select(
        nmean.alias("norm_mean_base"),
        nstd.alias("norm_std_base"),
        F.col("n").alias("n_base"),
    )
    nnew = nstat.filter(F.col("is_new")).select(
        nmean.alias("norm_mean_new"),
        nstd.alias("norm_std_new"),
        F.col("n").alias("n_new"),
    )
    r6 = lambda c: F.round(c, 6) + 0.0  # noqa: E731
    return (
        means.crossJoin(F.broadcast(l2))
        .crossJoin(F.broadcast(nbase))
        .crossJoin(F.broadcast(nnew))
        .select(
            F.col("dim").cast("int").alias("dim"),
            r6(F.col("mean_base")).alias("mean_base"),
            r6(F.col("mean_new")).alias("mean_new"),
            r6(F.col("mean_new") - F.col("mean_base")).alias("mean_shift"),
            r6(F.col("l2_shift")).alias("l2_shift"),
            r6(F.col("norm_mean_base")).alias("norm_mean_base"),
            r6(F.col("norm_mean_new")).alias("norm_mean_new"),
            r6(F.col("norm_std_base")).alias("norm_std_base"),
            r6(F.col("norm_std_new")).alias("norm_std_new"),
            r6(
                F.col("norm_mean_new") - F.col("norm_mean_base")
            ).alias("norm_shift"),
            "n_base",
            "n_new",
        )
    )
