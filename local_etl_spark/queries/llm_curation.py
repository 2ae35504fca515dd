"""Corpus-curation operators, round 3 (SURVEY.md §2.4-J extensions):
sub-document boilerplate removal, lexical-diversity and readability
scoring, Zipf-law fitting, and the BPE pair-count step of tokenizer
training. All hot-path logic is JVM array/regex expressions over the
scan stage; corpus-sized shuffles appear only where inherent (the
chunk-frequency aggregate, the corpus pair count).

Determinism contract (see registry docstring): integer folds are exact;
every double is produced by a fixed-operand-order expression (single
divisions/ln of identical inputs, or ordered folds via the
list_sum(list(x ORDER BY k)) ≡ aggregate(array_sort(...)) identity),
then rounded to 6 dp.

Caching policy: intermediates consumed by 2+ downstream branches are
persist()ed and deliberately NOT unpersisted inside the query fn — the
returned DataFrame still references them, and callers collect lazily.
The per-query leak is bounded (narrow projections) and evicted LRU by
the storage manager; a driver that hosts many scale factors should
clearCache() between corpora.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type-hint inference
# under `from __future__ import annotations` resolves hints from module
# globals (r4 gotcha — a local import leaves 'pd' unresolvable)
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from local_etl_spark.queries._util import ordered_prefix, t
from local_etl_spark.registry import query

# Sub-document dedup granularity: chunks of CHUNK_TOKENS consecutive
# tokens; a chunk present in more than BOILERPLATE_DOC_FREQ distinct
# documents is boilerplate (CCNet §4.1 paragraph dedup, Dolma §C.2).
CHUNK_TOKENS = 2
BOILERPLATE_DOC_FREQ = 25

# MATTR lexical-diversity window (Covington & McFall 2010)
TTR_WINDOW = 25

# Flesch pseudo-sentence length: the corpus has no sentence punctuation,
# so readability segments every WORDS_PER_SENTENCE tokens (documented
# divergence from prose Flesch; the mechanics are the contract).
WORDS_PER_SENTENCE = 15

BPE_TOP_PAIRS = 20


@query(
    "llm_boilerplate_chunks",
    family="llm",
    oracle=f"""
    WITH chunks AS (
        SELECT doc_id, i - 1 AS pos,
               array_to_string(list_slice(string_split(text, ' '),
                                          (i - 1) * {CHUNK_TOKENS} + 1,
                                          i * {CHUNK_TOKENS}), ' ') AS chunk
        FROM documents,
             LATERAL (SELECT unnest(range(1,
                 CAST(ceil(len(string_split(text, ' ')) * 1.0
                           / {CHUNK_TOKENS}) AS INT) + 1)) AS i)
    ),
    hot AS (
        SELECT chunk FROM chunks
        GROUP BY chunk
        HAVING count(DISTINCT doc_id) > {BOILERPLATE_DOC_FREQ}
    ),
    kept AS (
        SELECT c.doc_id,
               string_agg(c.chunk, ' ' ORDER BY c.pos) AS clean_text,
               count(*) AS n_kept
        FROM chunks c ANTI JOIN hot USING (chunk)
        GROUP BY c.doc_id
    ),
    totals AS (
        SELECT doc_id, count(*) AS n_chunks FROM chunks GROUP BY doc_id
    )
    SELECT t.doc_id,
           coalesce(k.clean_text, '') AS clean_text,
           CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(t.n_chunks - coalesce(k.n_kept, 0) AS BIGINT) AS n_removed
    FROM totals t LEFT JOIN kept k USING (doc_id)
    """,
)
def llm_boilerplate_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document boilerplate removal (CCNet/Dolma paragraph dedup).

    Documents are segmented into consecutive fixed-token chunks; a chunk
    occurring in more than ``BOILERPLATE_DOC_FREQ`` distinct documents
    is corpus boilerplate (headers, navigation, license blurbs) and is
    struck from every document; the survivors are re-assembled in
    position order. This is the step between exact-document dedup and
    quality filtering in a pretraining pipeline — near-duplicate PARTS
    of otherwise-unique pages.

    Scale shape: chunk-frequency aggregate (one hash shuffle on the
    chunk, map-side partial distinct), LEFT ANTI join of the chunk
    stream against the hot set co-partitioned on the same key, then one
    reassembly shuffle on doc_id. No array column ever crosses an
    exchange; the hot set is selectivity-sized (could broadcast, but at
    100 TB its size is data-dependent, so the co-partitioned anti join
    is the safe default and AQE may still convert it).
    """
    docs = t(spark, sf_dir, "documents")
    # persisted: the chunk stream feeds THREE consumers (hot set, kept
    # reassembly, per-doc totals) — without it each consumer re-scans
    # and re-explodes the whole corpus (3× the dominant cost at 100 TB)
    chunks = (
        docs.select("doc_id", F.split("text", " ").alias("_w"))
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, CAST(ceil(size(_w) / {CHUNK_TOKENS}.0) AS INT)),"
                    f" i -> array_join(slice(_w, (i - 1) * {CHUNK_TOKENS} + 1,"
                    f" {CHUNK_TOKENS}), ' '))"
                )
            ).alias("pos", "chunk"),
        )
        .persist()
    )
    hot = (
        chunks.groupBy("chunk")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") > BOILERPLATE_DOC_FREQ)
        .select("chunk")
    )
    kept = (
        chunks.join(hot, "chunk", "left_anti")
        .groupBy("doc_id")
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list(struct(pos, chunk))),"
                " s -> s.chunk), ' ')"
            ).alias("clean_text"),
            F.count(F.lit(1)).alias("n_kept"),
        )
    )
    totals = chunks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_chunks"))
    return totals.join(kept, "doc_id", "left").select(
        "doc_id",
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
        (F.col("n_chunks") - F.coalesce("n_kept", F.lit(0)))
        .cast("bigint")
        .alias("n_removed"),
    )


@query(
    "llm_readability",
    family="llm",
    oracle=f"""
    WITH s AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
               CAST(list_sum(list_transform(string_split(text, ' '),
                    w -> greatest(len(regexp_extract_all(w, '[aeiou]+')), 1)))
                    AS BIGINT) AS n_syllables
        FROM documents
    )
    SELECT doc_id, n_words, n_syllables,
           round(206.835
                 - 1.015 * (n_words * 1.0
                            / ceil(n_words * 1.0 / {WORDS_PER_SENTENCE}))
                 - 84.6 * (n_syllables * 1.0 / n_words), 6) AS flesch
    FROM s
    """,
)
def llm_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease scoring with a vowel-run syllable heuristic.

    Syllables per word = number of maximal vowel runs (min 1) — the
    standard cheap approximation; sentences are fixed token segments
    because the corpus carries no punctuation (documented divergence
    from prose Flesch). Map-only: both folds are in-row integer sums,
    the score is one fixed-operand-order double expression rounded to
    6 dp — nothing leaves the scan stage.
    """
    docs = t(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id",
        F.expr("size(split(text, ' '))").cast("bigint").alias("n_words"),
        F.expr(
            "aggregate(transform(split(text, ' '),"
            " w -> greatest(size(regexp_extract_all(w, '[aeiou]+', 0)), 1)),"
            " 0L, (a, x) -> a + x)"
        ).alias("n_syllables"),
    )
    n, syl = F.col("n_words"), F.col("n_syllables")
    sentences = F.ceil(n * F.lit(1.0) / WORDS_PER_SENTENCE)
    flesch = F.round(
        F.lit(206.835)
        - F.lit(1.015) * (n * F.lit(1.0) / sentences)
        - F.lit(84.6) * (syl * F.lit(1.0) / n),
        6,
    )
    return staged.select("doc_id", "n_words", "n_syllables", flesch.alias("flesch"))


@query(
    "llm_ttr",
    family="llm",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS n
        FROM documents
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_words,
           round(len(list_distinct(toks)) * 1.0 / n, 6) AS ttr,
           CASE WHEN n >= {TTR_WINDOW} THEN
               round(CAST(list_sum(list_transform(range(1, n - {TTR_WINDOW} + 2),
                    i -> len(list_distinct(list_slice(toks, i,
                                           i + {TTR_WINDOW} - 1)))))
                     AS BIGINT) * 1.0
                     / ({TTR_WINDOW} * (n - {TTR_WINDOW} + 1)), 6)
           ELSE round(len(list_distinct(toks)) * 1.0 / n, 6)
           END AS mattr
    FROM w
    """,
)
def llm_ttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity: plain type-token ratio + MATTR.

    MATTR (moving-average TTR, Covington & McFall 2010) averages the
    distinct-token ratio over every sliding ``TTR_WINDOW``-token window,
    removing plain TTR's length bias — a standard quality signal for
    pretraining corpora (low diversity ⇒ template/spam text). Map-only
    in-row fold, O(n·window) per document; short docs fall back to
    whole-doc TTR. Integer sums are exact; the two divisions are single
    fixed-order double ops rounded to 6 dp. Spark ``sequence(1, 0)``
    descends rather than yielding empty — the short-doc CASE guards it.
    """
    docs = t(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id", F.split("text", " ").alias("_t"), F.expr("size(split(text, ' '))").alias("_n")
    )
    n = F.col("_n")
    ttr = F.round(F.expr("size(array_distinct(_t))") * F.lit(1.0) / n, 6)
    win_sum = F.expr(
        f"aggregate(transform(sequence(1, _n - {TTR_WINDOW} + 1),"
        f" i -> size(array_distinct(slice(_t, i, {TTR_WINDOW})))),"
        " 0L, (a, x) -> a + x)"
    )
    mattr = F.when(
        n >= TTR_WINDOW,
        F.round(
            win_sum * F.lit(1.0) / (F.lit(TTR_WINDOW) * (n - TTR_WINDOW + 1)), 6
        ),
    ).otherwise(ttr)
    return staged.select(
        "doc_id",
        n.cast("bigint").alias("n_words"),
        ttr.alias("ttr"),
        mattr.alias("mattr"),
    )


@query(
    "llm_zipf_fit",
    family="llm",
    oracle="""
    WITH freq AS (
        SELECT w AS term, count(*) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        GROUP BY w
    ),
    ranked AS (
        SELECT term, cnt,
               row_number() OVER (ORDER BY cnt DESC, term) AS rnk
        FROM freq
    ),
    pts AS (
        SELECT rnk, ln(rnk * 1.0) AS x, ln(cnt * 1.0) AS y FROM ranked
    ),
    m AS (
        SELECT count(*) * 1.0 AS n,
               list_sum(list(x ORDER BY rnk)) AS sx,
               list_sum(list(y ORDER BY rnk)) AS sy,
               list_sum(list(x * x ORDER BY rnk)) AS sxx,
               list_sum(list(x * y ORDER BY rnk)) AS sxy
        FROM pts
    )
    SELECT CAST(n AS BIGINT) AS n_vocab,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n,
                 6) AS intercept
    FROM m
    """,
)
def llm_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit over the corpus rank-frequency curve.

    OLS of ln(freq) on ln(rank) — natural text has slope ≈ −1; a flat
    or cliff-shaped curve flags template spam or a broken tokenizer, so
    the slope is a one-number corpus health check. Term frequencies
    pre-aggregate in-row (tfidf's sorted-runs trick is overkill here:
    the unnest+groupBy df shuffle ships one row per (doc, distinct
    term), vocabulary-bounded). Rank is EXACT but sort-free-at-one-task:
    ``ordered_prefix`` range-partitions the vocabulary on
    (cnt DESC, term) and adds per-partition offsets, so no
    single-partition WindowExec ever materializes the ~1e8-term
    vocabulary in one task (VERDICT r3 #2c). The four OLS moments are
    folded in explicit rank order on both engines (ordered-fold
    identity, see module docstring) because a plain sum(double)
    diverges cross-engine in the low bits; slope/intercept are then
    single fixed-order expressions rounded to 6 dp.
    """
    docs = t(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    ranked, _n = ordered_prefix(freq, [F.desc("cnt"), "term"], rank_col="rnk")
    pts = ranked.select(
        "rnk",
        F.log(F.col("cnt") * F.lit(1.0)).alias("y"),
    ).select("rnk", F.log(F.col("rnk") * F.lit(1.0)).alias("x"), "y")
    folded = pts.agg(
        (F.count(F.lit(1)) * F.lit(1.0)).alias("n"),
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(rnk, x))),"
            " s -> s.x), CAST(0.0 AS DOUBLE), (a, v) -> a + v)"
        ).alias("sx"),
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(rnk, y))),"
            " s -> s.y), CAST(0.0 AS DOUBLE), (a, v) -> a + v)"
        ).alias("sy"),
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(rnk, x))),"
            " s -> s.x * s.x), CAST(0.0 AS DOUBLE), (a, v) -> a + v)"
        ).alias("sxx"),
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(rnk, x, y))),"
            " s -> s.x * s.y), CAST(0.0 AS DOUBLE), (a, v) -> a + v)"
        ).alias("sxy"),
    )
    n, sx, sy, sxx, sxy = (F.col(c) for c in ("n", "sx", "sy", "sxx", "sxy"))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return folded.select(
        n.cast("bigint").alias("n_vocab"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
    )


@query(
    "llm_bpe_pairs",
    family="llm",
    oracle=f"""
    WITH toks AS (
        SELECT string_split(text, ' ') AS l FROM documents
    ),
    pairs AS (
        SELECT unnest(list_zip(list_slice(l, 1, len(l) - 1),
                               list_slice(l, 2, len(l)))) AS p
        FROM toks WHERE len(l) >= 2
    ),
    counted AS (
        -- list_zip yields unnamed structs in DuckDB: numeric index only
        SELECT p[1] || ' ' || p[2] AS pair,
               count(*) AS cnt
        FROM pairs GROUP BY 1
    )
    SELECT pair, CAST(cnt AS BIGINT) AS cnt,
           CAST(row_number() OVER (ORDER BY cnt DESC, pair) AS BIGINT) AS rnk
    FROM counted
    ORDER BY cnt DESC, pair
    LIMIT {BPE_TOP_PAIRS}
    """,
)
def llm_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-pair frequency — the candidate-scoring step of one BPE
    tokenizer-training merge round (Sennrich et al. 2016 §3.2).

    Corpus-wide counts of every adjacent token pair, top
    ``BPE_TOP_PAIRS`` by count (pair-lexicographic tie-break, so the
    'merge choice' is engine-independent). Pairs pre-aggregate IN-ROW
    with the sorted-runs fold before the corpus shuffle, so the
    exchange ships one row per (doc, distinct pair) instead of one per
    token — at 100 TB that is the difference between shuffling the
    corpus and shuffling its vocabulary profile. Final top-k is a
    per-partition heap (TakeOrderedAndProject), never a global sort.
    """
    docs = t(spark, sf_dir, "documents")
    # in-row: build pair strings, sort, fold runs into (pair, cnt)
    staged = (
        docs.select(F.split("text", " ").alias("_w"))
        .filter(F.size("_w") >= 2)
        .select(
            F.expr(
                "array_sort(zip_with(slice(_w, 1, size(_w) - 1),"
                " slice(_w, 2, size(_w) - 1), (a, b) -> concat(a, ' ', b)))"
            ).alias("_p")
        )
        .select(
            F.expr(
                "filter(sequence(0, size(_p) - 1),"
                " i -> i = size(_p) - 1 OR _p[i] != _p[i+1])"
            ).alias("_ends"),
            "_p",
        )
        .select(
            F.explode(
                F.expr(
                    "zip_with(_ends, concat(array(-1),"
                    " slice(_ends, 1, size(_ends) - 1)),"
                    " (e, p) -> named_struct('pair', _p[e],"
                    " 'cnt', CAST(e - p AS BIGINT)))"
                )
            ).alias("pc")
        )
        .select("pc.pair", "pc.cnt")
    )
    from pyspark.sql import Window

    counted = staged.groupBy("pair").agg(F.sum("cnt").alias("cnt"))
    top = counted.orderBy(F.desc("cnt"), "pair").limit(BPE_TOP_PAIRS)
    return top.select(
        "pair",
        "cnt",
        F.row_number()
        .over(Window.orderBy(F.desc("cnt"), "pair"))
        .cast("bigint")
        .alias("rnk"),
    )


@query(
    "llm_rouge_overlap",
    family="llm",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ),
    grams AS (
        SELECT doc_id, p[1] || ' ' || p[2] AS g
        FROM (SELECT doc_id,
                     unnest(list_zip(list_slice(l, 1, len(l) - 1),
                                     list_slice(l, 2, len(l)))) AS p
              FROM toks WHERE len(l) >= 2)
    ),
    counts AS (
        SELECT doc_id // 2 AS pair_id, doc_id % 2 AS side, g, count(*) AS c
        FROM grams GROUP BY 1, 2, 3
    ),
    tot AS (
        SELECT pair_id, side, CAST(sum(c) AS BIGINT) AS n
        FROM counts GROUP BY 1, 2
    ),
    ov AS (
        SELECT r.pair_id, CAST(sum(least(r.c, q.c)) AS BIGINT) AS overlap
        FROM (SELECT * FROM counts WHERE side = 0) r
        JOIN (SELECT * FROM counts WHERE side = 1) q
          USING (pair_id, g)
        GROUP BY r.pair_id
    )
    SELECT tr.pair_id,
           tr.n AS n_ref_grams, tq.n AS n_cand_grams,
           CAST(coalesce(ov.overlap, 0) AS BIGINT) AS overlap,
           round(coalesce(ov.overlap, 0) * 1.0 / tr.n, 6) AS rouge2_recall,
           round(coalesce(ov.overlap, 0) * 1.0 / tq.n, 6) AS rouge2_precision,
           CASE WHEN coalesce(ov.overlap, 0) = 0 THEN 0.0
                ELSE round(2.0 * (ov.overlap * 1.0 / tr.n)
                           * (ov.overlap * 1.0 / tq.n)
                           / (ov.overlap * 1.0 / tr.n
                              + ov.overlap * 1.0 / tq.n), 6)
           END AS rouge2_f1
    FROM (SELECT * FROM tot WHERE side = 0) tr
    JOIN (SELECT * FROM tot WHERE side = 1) tq USING (pair_id)
    LEFT JOIN ov USING (pair_id)
    """,
)
def llm_rouge_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-2 at corpus scale: multiset bigram recall / precision / F1
    between deterministically paired documents (even doc_id = reference,
    odd = candidate) — the batch eval metric of a summarization /
    generation pipeline, where millions of (reference, output) pairs
    are scored per run.

    Multiset overlap Σ_g min(c_ref, c_cand) is computed RELATIONALLY on
    pre-aggregated counts: bigrams fold to (gram, count) IN-ROW (the
    tfidf sorted-runs trick — the exchange carries one row per (doc,
    distinct gram), never one per token), then one co-partitioned join
    on (pair, gram). Integer counts are exact; recall/precision are
    single divisions and F1 one fixed-order expression, all rounded to
    6 dp. An in-row array-intersection fold was rejected: per-gram
    min-counting inside interpreted HOFs is O(|doc|²) per pair and
    ~100× slower than this codegen join at sf0.1.
    """
    docs = t(spark, sf_dir, "documents")
    counts = (
        docs.select("doc_id", F.split("text", " ").alias("_w"))
        .filter(F.size("_w") >= 2)
        .select(
            "doc_id",
            F.expr(
                "array_sort(zip_with(slice(_w, 1, size(_w) - 1),"
                " slice(_w, 2, size(_w) - 1), (a, b) -> concat(a, ' ', b)))"
            ).alias("_p"),
        )
        .select(
            "doc_id",
            F.expr(
                "filter(sequence(0, size(_p) - 1),"
                " i -> i = size(_p) - 1 OR _p[i] != _p[i+1])"
            ).alias("_ends"),
            "_p",
        )
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "zip_with(_ends, concat(array(-1),"
                    " slice(_ends, 1, size(_ends) - 1)),"
                    " (e, p) -> named_struct('g', _p[e],"
                    " 'c', CAST(e - p AS BIGINT)))"
                )
            ).alias("gc"),
        )
        .select(
            (F.col("doc_id") / 2).cast("bigint").alias("pair_id"),
            (F.col("doc_id") % 2).alias("side"),
            F.col("gc.g").alias("g"),
            F.col("gc.c").alias("c"),
        )
        .persist()
    )
    tot = counts.groupBy("pair_id", "side").agg(
        F.sum("c").cast("bigint").alias("n")
    )
    ref_c = counts.filter(F.col("side") == 0).select("pair_id", "g", F.col("c").alias("cr"))
    cand_c = counts.filter(F.col("side") == 1).select("pair_id", "g", F.col("c").alias("cq"))
    ov = (
        ref_c.join(cand_c, ["pair_id", "g"])
        .groupBy("pair_id")
        .agg(F.sum(F.least("cr", "cq")).cast("bigint").alias("overlap"))
    )
    tr = tot.filter(F.col("side") == 0).select("pair_id", F.col("n").alias("n_ref_grams"))
    tq = tot.filter(F.col("side") == 1).select("pair_id", F.col("n").alias("n_cand_grams"))
    j = tr.join(tq, "pair_id").join(ov, "pair_id", "left")
    o = F.coalesce("overlap", F.lit(0))
    r = o * F.lit(1.0) / F.col("n_ref_grams")
    p = o * F.lit(1.0) / F.col("n_cand_grams")
    return j.select(
        "pair_id",
        "n_ref_grams",
        "n_cand_grams",
        o.cast("bigint").alias("overlap"),
        F.round(r, 6).alias("rouge2_recall"),
        F.round(p, 6).alias("rouge2_precision"),
        F.when(o == 0, F.lit(0.0))
        .otherwise(F.round(F.lit(2.0) * r * p / (r + p), 6))
        .alias("rouge2_f1"),
    )


SPAN_TOKENS = 5  # corruption granularity (block = span candidate)
SPAN_MASK_HEX = "28"  # first 2 md5 hex chars below this ⇒ masked (~16%)


@query(
    "llm_span_corruption",
    family="llm",
    oracle=f"""
    WITH blocks AS (
        SELECT doc_id, i - 1 AS blk,
               array_to_string(list_slice(string_split(text, ' '),
                                          (i - 1) * {SPAN_TOKENS} + 1,
                                          i * {SPAN_TOKENS}), ' ') AS chunk
        FROM documents,
             LATERAL (SELECT unnest(range(1,
                 CAST(ceil(len(string_split(text, ' ')) * 1.0
                           / {SPAN_TOKENS}) AS INT) + 1)) AS i)
    ),
    flagged AS (
        SELECT doc_id, blk, chunk,
               substr(md5(doc_id || ':' || blk), 1, 2) < '{SPAN_MASK_HEX}'
                   AS masked
        FROM blocks
    ),
    numbered AS (
        SELECT *,
               CAST(row_number() OVER (
                   PARTITION BY doc_id, masked ORDER BY blk) AS BIGINT)
                   AS k
        FROM flagged
    )
    SELECT doc_id,
           string_agg(CASE WHEN masked
                           THEN '<extra_id_' || (k - 1) || '>'
                           ELSE chunk END, ' ' ORDER BY blk)
               AS corrupted_text,
           coalesce(string_agg(CASE WHEN masked
                        THEN '<extra_id_' || (k - 1) || '> ' || chunk END,
                        ' ' ORDER BY blk), '') AS target_text,
           CAST(sum(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT)
               AS n_masked_spans
    FROM numbered
    GROUP BY doc_id
    """,
)
def llm_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5/UL2 span corruption — the denoising-objective preprocessing
    step: fixed-width token spans are masked by a DETERMINISTIC
    per-(doc, span) md5 gate (seedless, partitioning-independent,
    reproducible on any engine — the same reason the samplers use
    md5-rank), each masked span is replaced by a numbered sentinel in
    the corrupted text, and the target sequence pairs each sentinel
    with the span it hides. ~16% of spans mask at the '{0x28}/256'
    threshold (T5 trains at 15%).

    Shape: spans derive in-row (the boilerplate chunk transform), the
    sentinel numbering is a per-doc window over span flags, and both
    output sequences reassemble with position-ordered aggregation —
    one exchange on doc_id after the map-side span stream. Lexicographic
    comparison of lowercase hex prefixes equals numeric comparison, so
    the mask gate is identical in both engines bit-for-bit.
    """
    docs = t(spark, sf_dir, "documents")
    from pyspark.sql import Window

    blocks = (
        docs.select("doc_id", F.split("text", " ").alias("_w"))
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, CAST(ceil(size(_w) / {SPAN_TOKENS}.0) AS INT)),"
                    f" i -> array_join(slice(_w, (i - 1) * {SPAN_TOKENS} + 1,"
                    f" {SPAN_TOKENS}), ' '))"
                )
            ).alias("blk", "chunk"),
        )
    )
    flagged = blocks.select(
        "doc_id",
        "blk",
        "chunk",
        (
            F.substring(
                F.md5(F.concat_ws(":", F.col("doc_id"), F.col("blk"))), 1, 2
            )
            < SPAN_MASK_HEX
        ).alias("masked"),
    )
    w = Window.partitionBy("doc_id", "masked").orderBy("blk")
    numbered = flagged.withColumn(
        "k", F.row_number().over(w).cast("bigint")
    )
    sentinel = F.concat(F.lit("<extra_id_"), (F.col("k") - 1), F.lit(">"))
    corrupted_piece = F.when(F.col("masked"), sentinel).otherwise(F.col("chunk"))
    target_piece = F.when(
        F.col("masked"), F.concat(sentinel, F.lit(" "), F.col("chunk"))
    )
    numbered = numbered.withColumn("cp", corrupted_piece).withColumn(
        "tp", target_piece
    )
    return numbered.groupBy("doc_id").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(blk, cp))),"
            " s -> s.cp), ' ')"
        ).alias("corrupted_text"),
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(blk, tp))),"
            " s -> s.tp), ' ')"
        ).alias("target_text"),
        F.sum(F.col("masked").cast("int")).cast("bigint").alias("n_masked_spans"),
    ).select("doc_id", "corrupted_text", "target_text", "n_masked_spans")


# FIM gate and cut-point derivation: md5-seeded like span corruption.
# hex chars → ints via ascii() (portable to both engines; conv() is
# Spark-only and DuckDB lacks hex-string casts).
_FIM_GATE_HEX = "80"  # first 2 md5 hex chars below this ⇒ transform (~50%)


def _fim_cut_sql(doc: str, tag: str, n: str) -> str:
    """1-based cut point in [1, n-1] from two md5-hex chars (shared
    Spark/DuckDB text). greatest(n-1, 1) guards the single-token doc:
    ``% 0`` errors in ANSI Spark and DuckDB alike; for n = 1 the cut
    collapses to 1 and both slices around it are empty (legal FIM)."""
    h = f"md5({doc} || ':{tag}')"
    return (
        f"(1 + (ascii(substr({h}, 1, 1)) * 256 + ascii(substr({h}, 2, 1)))"
        f" % greatest({n} - 1, 1))"
    )


@query(
    "llm_fim_transform",
    family="llm",
    oracle=f"""
    WITH s AS (
        SELECT doc_id, string_split(text, ' ') AS l,
               len(string_split(text, ' ')) AS n,
               substr(md5(doc_id || ':fim'), 1, 2) < '{_FIM_GATE_HEX}'
                   AS apply_fim
        FROM documents
    ),
    cuts AS (
        SELECT doc_id, l, n, apply_fim,
               least({_fim_cut_sql('doc_id', 'c1', 'n')},
                     {_fim_cut_sql('doc_id', 'c2', 'n')}) AS c1,
               greatest({_fim_cut_sql('doc_id', 'c1', 'n')},
                        {_fim_cut_sql('doc_id', 'c2', 'n')}) AS c2
        FROM s
    )
    SELECT doc_id,
           CAST(apply_fim AS INT) AS fim_applied,
           -- coalesce: DuckDB array_to_string of an EMPTY slice is
           -- NULL (Spark array_join gives ''), and one NULL segment
           -- nulls the whole concatenation
           CASE WHEN apply_fim THEN
               '<PRE> ' || coalesce(array_to_string(list_slice(l, 1, c1), ' '), '')
               || ' <SUF> ' || coalesce(array_to_string(list_slice(l, c2 + 1, n), ' '), '')
               || ' <MID> ' || coalesce(array_to_string(list_slice(l, c1 + 1, c2), ' '), '')
           ELSE array_to_string(l, ' ') END AS fim_text,
           CAST(CASE WHEN apply_fim THEN c2 - c1 ELSE 0 END AS BIGINT)
               AS n_middle_tokens
    FROM cuts
    """,
)
def llm_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-the-middle transform (Bavarian et al. 2022, PSM format):
    ~half the corpus (md5-gated, seedless and partitioning-independent)
    is rearranged to ``<PRE> prefix <SUF> suffix <MID> middle`` so an
    autoregressive model learns infilling for free; the rest passes
    through untouched — exactly the mixed objective the paper trains.
    Cut points derive from per-doc md5 chars (ascii() folding — the
    hex→int path both engines share), ordered by least/greatest so the
    middle span is well-formed; empty middles (c1 = c2) are legal FIM.
    Map-only: slicing and tagging happen in-row on the scan, nothing
    shuffles.
    """
    docs = t(spark, sf_dir, "documents")
    cut1 = _fim_cut_sql("doc_id", "c1", "_n")
    cut2 = _fim_cut_sql("doc_id", "c2", "_n")
    staged = docs.select(
        "doc_id",
        F.split("text", " ").alias("_l"),
        F.expr("size(split(text, ' '))").alias("_n"),
        (
            F.substring(F.md5(F.concat(F.col("doc_id"), F.lit(":fim"))), 1, 2)
            < _FIM_GATE_HEX
        ).alias("apply_fim"),
    ).select(
        "doc_id",
        "_l",
        "_n",
        "apply_fim",
        F.expr(f"least({cut1}, {cut2})").alias("c1"),
        F.expr(f"greatest({cut1}, {cut2})").alias("c2"),
    )
    psm = F.concat(
        F.lit("<PRE> "),
        F.expr("array_join(slice(_l, 1, c1), ' ')"),
        F.lit(" <SUF> "),
        F.expr("array_join(slice(_l, c2 + 1, _n - c2), ' ')"),
        F.lit(" <MID> "),
        F.expr("array_join(slice(_l, c1 + 1, c2 - c1), ' ')"),
    )
    return staged.select(
        "doc_id",
        F.col("apply_fim").cast("int").alias("fim_applied"),
        F.when(F.col("apply_fim"), psm)
        .otherwise(F.expr("array_join(_l, ' ')"))
        .alias("fim_text"),
        F.when(F.col("apply_fim"), F.col("c2") - F.col("c1"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("n_middle_tokens"),
    )


BPE_TRAIN_ROUNDS = 8


def _bpe_quote(sym: str) -> str:
    """Literal-safe regex/replacement text for a learned symbol."""
    return "\\Q" + sym.replace("\\E", "\\E\\\\E\\Q") + "\\E"


# Explicit whitespace class shared by the engine tokenizers and the
# DuckDB oracle machines (ADVICE r11): Java's \s includes \x0B
# (vertical tab) where RE2's does not, so a document containing \x0B
# would tokenize differently engine-vs-oracle under a bare '\\s+'.
# Both sides now split on exactly these five characters. Inert on the
# shipped corpora (no \x0B anywhere) — every hash is unchanged.
WS_SPLIT = r"[ \t\n\f\r]+"


# LIST-MACHINE replay of the full BPE training loop (rows-only→SQL
# conversions #11/#12, round 11): the corpus collapses to the distinct
# (word, freq) table — 31 words here, vocab-sized anywhere — so the
# whole trainer state fits ONE machine row: a list of (word, symbol
# list, freq) structs plus the learned merge table. Per round the
# machine (a) enumerates adjacent symbol pairs with word weights,
# (b) scores each distinct pair by an exact BIGINT weighted count,
# (c) picks argmax with the trainer's exact tie-break ((cnt DESC, l,
# r) ≡ list_sort on (-cnt, l, r) structs, binary string order both
# engines), and (d) applies the merge to every word as a left-to-right
# singleton-list fold — verified to reproduce the engine's
# lookaround-anchored non-overlapping regex substitution exactly
# ('a a a a' → 'aa aa', never 'aa a a'). Integer counts end to end;
# the only strings are the symbols themselves.
_BPE_MACHINE = f"""words AS MATERIALIZED (
    SELECT t.w AS w, CAST(count(*) AS BIGINT) AS freq
    FROM documents, unnest(regexp_split_to_array(text, '{WS_SPLIT}')) AS t(w)
    WHERE t.w <> ''
    GROUP BY t.w
),
init AS (
    SELECT 0 AS step,
           list({{'w': w, 'syms': string_split(w, ''), 'freq': freq}}
                ORDER BY w) AS vocab,
           CAST([] AS STRUCT(st INT, l VARCHAR, r VARCHAR, m VARCHAR,
                             wt BIGINT)[]) AS merges
    FROM words
),
bpe AS (
    SELECT step, vocab, merges FROM init
    UNION ALL
    SELECT step + 1,
           list_transform(vocab, v -> {{
               'w': struct_extract(v, 'w'),
               'syms': list_reduce(
                   list_transform(struct_extract(v, 'syms'), s -> [s]),
                   (acc, x) -> CASE
                       WHEN len(acc) > 0
                            AND acc[-1] = struct_extract(best, 'l')
                            AND x[1] = struct_extract(best, 'r')
                       THEN acc[1:len(acc) - 1]
                            || [struct_extract(best, 'l')
                                || struct_extract(best, 'r')]
                       ELSE acc || x END),
               'freq': struct_extract(v, 'freq')}}) AS vocab,
           merges || [{{'st': CAST(step + 1 AS INT),
                       'l': struct_extract(best, 'l'),
                       'r': struct_extract(best, 'r'),
                       'm': struct_extract(best, 'l')
                            || struct_extract(best, 'r'),
                       'wt': -struct_extract(best, 'negc')}}] AS merges
    FROM (
        SELECT step, vocab, merges,
               list_sort(list_transform(keys, k -> {{
                   'negc': -list_sum(list_transform(
                       list_filter(pairs,
                           p -> struct_extract(p, 'l')
                                    = string_split(k, chr(31))[1]
                            AND struct_extract(p, 'r')
                                    = string_split(k, chr(31))[2]),
                       p -> struct_extract(p, 'f'))),
                   'l': string_split(k, chr(31))[1],
                   'r': string_split(k, chr(31))[2]}}))[1] AS best
        FROM (
            SELECT step, vocab, merges, pairs,
                   list_distinct(list_transform(pairs, p ->
                       struct_extract(p, 'l') || chr(31)
                       || struct_extract(p, 'r'))) AS keys
            FROM (
                SELECT step, vocab, merges,
                       flatten(list_transform(vocab, v ->
                           list_transform(
                               generate_series(1,
                                   len(struct_extract(v, 'syms')) - 1),
                               i -> {{'l': struct_extract(v, 'syms')[i],
                                     'r': struct_extract(v, 'syms')[i + 1],
                                     'f': struct_extract(v, 'freq')}})))
                           AS pairs
                FROM bpe
                WHERE step < {BPE_TRAIN_ROUNDS}
            )
        )
        WHERE len(pairs) > 0
    )
)"""

_BPE_TRAIN_ORACLE = f"""
WITH RECURSIVE {_BPE_MACHINE}
SELECT struct_extract(u, 'st') AS step,
       struct_extract(u, 'l') AS "left",
       struct_extract(u, 'r') AS "right",
       struct_extract(u, 'm') AS merged,
       struct_extract(u, 'wt') AS weight
FROM (SELECT merges FROM bpe
      WHERE step = (SELECT max(step) FROM bpe)) f,
     LATERAL unnest(f.merges) AS t(u)
"""

_BPE_APPLY_ORACLE = f"""
WITH RECURSIVE {_BPE_MACHINE},
fv AS (
    SELECT struct_extract(u, 'w') AS w,
           CAST(len(struct_extract(u, 'syms')) AS BIGINT) AS nsyms
    FROM (SELECT vocab FROM bpe
          WHERE step = (SELECT max(step) FROM bpe)) f,
         LATERAL unnest(f.vocab) AS t(u)
),
langw AS (
    SELECT lang, t.w AS w, CAST(count(*) AS BIGINT) AS freq
    FROM documents, unnest(regexp_split_to_array(text, '{WS_SPLIT}')) AS t(w)
    WHERE t.w <> ''
    GROUP BY lang, t.w
)
SELECT lw.lang,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(length(lw.w) * lw.freq) AS BIGINT) AS total_chars,
       CAST(sum(fv.nsyms * lw.freq) AS BIGINT) AS total_symbols,
       round(CAST(sum(fv.nsyms * lw.freq) AS DOUBLE)
             / sum(length(lw.w) * lw.freq), 6) AS compression
FROM langw lw JOIN fv ON fv.w = lw.w
GROUP BY lw.lang
"""


@query("llm_bpe_train", family="llm", oracle=_BPE_TRAIN_ORACLE)
def llm_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full BPE tokenizer training (Sennrich et al. 2016 §3.1), 8
    merge rounds: start from characters, repeatedly count adjacent
    symbol pairs weighted by word frequency, merge the most frequent
    pair corpus-wide. Completes the bpe_pairs story — that operator
    scores ONE round's candidates; this one runs the training loop
    and emits the learned merge table (step, left, right, merged,
    weight), pytest-verified against a pure-Python reference
    implementation of the same algorithm AND SQL-ORACLED since round
    11 (conversion #11): _BPE_TRAIN_ORACLE replays the whole loop as
    a single-row vocab LIST-MACHINE — exact BIGINT pair counts, the
    (cnt DESC, l, r) argmax as a struct sort, and the merge
    application as a left-to-right singleton-list fold proven
    equivalent to the lookaround regex substitution.

    Scale design: all state is the DISTINCT-WORD table (vocab-sized —
    the corpus collapses to (word, freq) once, up front), so each
    round is one vocab-sized pair-count shuffle plus a map-only merge
    application; the only driver-side value per round is the single
    best (pair, count) row, exactly like llm_kmeans_train's
    model-sized collect. Merge application mimics the reference
    implementation's regex: lookaround-anchored non-overlapping
    left-to-right substitution (plain string replace CONSUMES the
    separator space and mis-merges runs — 'a a a a' must become
    'aa aa', not 'aa a a'). Tie-break: (count DESC, left, right) in
    binary order, which equals Python's tuple compare.
    """
    merges = _learn_bpe(spark, sf_dir)
    return spark.createDataFrame(
        merges,
        "step int, left string, right string, merged string, weight bigint",
    )


_BPE_MERGE_CACHE: dict[str, list[tuple]] = {}
_BPE_MERGE_CACHE_MAX = 8


def _learn_bpe(spark: SparkSession, sf_dir: str) -> list[tuple]:
    """The 8-round merge-learning loop (llm_bpe_train docstring);
    memoized per sf_dir so llm_bpe_apply reuses the learned table
    instead of re-running the loop (model-sized values, bounded)."""
    if sf_dir in _BPE_MERGE_CACHE:
        return _BPE_MERGE_CACHE[sf_dir]
    docs = t(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split("text", WS_SPLIT)).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    sym = (
        words.select(F.split("w", "").alias("a"), "freq")
        .localCheckpoint()  # vocab-sized; truncates lineage per round
    )
    merges = []
    for step in range(1, BPE_TRAIN_ROUNDS + 1):
        best = (
            sym.filter(F.size("a") >= 2)
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "zip_with(slice(a, 1, size(a) - 1),"
                        " slice(a, 2, size(a) - 1),"
                        " (x, y) -> struct(x AS l, y AS r))"
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not best:
            break
        l, r, cnt = best[0]["l"], best[0]["r"], best[0]["cnt"]
        merged = l + r
        merges.append((step, l, r, merged, cnt))
        pat = r"(?<!\S)" + _bpe_quote(l + " " + r) + r"(?!\S)"
        repl = merged.replace("\\", "\\\\").replace("$", "\\$")
        sym = sym.select(
            F.split(
                F.regexp_replace(F.array_join("a", " "), pat, repl), " "
            ).alias("a"),
            "freq",
        ).localCheckpoint()
    while len(_BPE_MERGE_CACHE) >= _BPE_MERGE_CACHE_MAX:
        _BPE_MERGE_CACHE.pop(next(iter(_BPE_MERGE_CACHE)))
    _BPE_MERGE_CACHE[sf_dir] = merges
    return merges


@query("llm_bpe_apply", family="llm", oracle=_BPE_APPLY_ORACLE)
def llm_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize with the learned merges — the apply half of
    llm_bpe_train, reporting what the 8 merges actually bought per
    language: distinct words, total characters, total symbols after
    applying every merge in order, and the symbols/chars compression
    ratio (the fertility gain a tokenizer-training pipeline gates on
    before committing to a vocab).

    Apply is a map-only chain of the SAME lookaround substitutions the
    trainer used (order matters: merge k can consume merge k-1's
    output, e.g. 'p'+'ar' after 'a'+'r'), over the per-(lang, word)
    distinct table — vocab-sized input, one lang-keyed aggregate out,
    nothing corpus-sized anywhere. SQL-ORACLED since round 11
    (conversion #12): the _BPE_MACHINE's final vocab already holds
    every word's fully-merged symbol count, so the oracle joins it to
    the per-(lang, word) frequency table — no second machine needed.
    The pytest additionally re-derives the merge table in pure Python
    and checks the per-lang symbol counts."""
    merges = _learn_bpe(spark, sf_dir)
    docs = t(spark, sf_dir, "documents")
    words = (
        docs.select("lang", F.explode(F.split("text", WS_SPLIT)).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    sym = F.array_join(F.split("w", ""), " ")
    for _, l, r, merged, _w in merges:
        pat = r"(?<!\S)" + _bpe_quote(l + " " + r) + r"(?!\S)"
        repl = merged.replace("\\", "\\\\").replace("$", "\\$")
        sym = F.regexp_replace(sym, pat, repl)
    return (
        words.select(
            "lang",
            "freq",
            F.length("w").cast("bigint").alias("chars"),
            F.size(F.split(sym, " ")).cast("bigint").alias("symbols"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum(F.col("chars") * F.col("freq")).cast("bigint").alias("total_chars"),
            F.sum(F.col("symbols") * F.col("freq"))
            .cast("bigint")
            .alias("total_symbols"),
        )
        .select(
            "lang",
            "n_words",
            "total_chars",
            "total_symbols",
            F.round(
                F.col("total_symbols") * F.lit(1.0) / F.col("total_chars"), 6
            ).alias("compression"),
        )
    )


# --- BPE vocab-checkpoint sweep (round 12) ------------------------------

BPE_SWEEP_CHECKPOINTS = (2, 4, 8)  # merge counts audited off ONE chain

_BPE_SWEEP_ORACLE = f"""
WITH RECURSIVE {_BPE_MACHINE},
ck AS (
    SELECT step AS k, vocab FROM bpe
    WHERE step IN {BPE_SWEEP_CHECKPOINTS}
),
per AS (
    SELECT k,
           CAST(count(*) AS BIGINT) AS n_word_types,
           CAST(sum(struct_extract(u, 'freq')) AS BIGINT) AS total_words,
           CAST(sum(length(struct_extract(u, 'w'))
                    * struct_extract(u, 'freq')) AS BIGINT) AS total_chars,
           CAST(sum(len(struct_extract(u, 'syms'))
                    * struct_extract(u, 'freq')) AS BIGINT)
               AS total_symbols,
           CAST(sum(CASE WHEN len(struct_extract(u, 'syms')) >= 2
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS multi_piece_words
    FROM ck, LATERAL unnest(ck.vocab) AS t(u)
    GROUP BY k
),
vs AS (
    SELECT k, CAST(count(DISTINCT s) AS BIGINT) AS vocab_size
    FROM (SELECT k, unnest(struct_extract(u, 'syms')) AS s
          FROM ck, LATERAL unnest(ck.vocab) AS t(u))
    GROUP BY k
)
SELECT CAST(per.k AS INT) AS n_merges,
       per.n_word_types, per.total_words, per.total_chars,
       per.total_symbols, per.multi_piece_words, vs.vocab_size,
       CAST(per.total_symbols AS DOUBLE) / per.total_words AS fertility,
       CAST(per.total_symbols AS DOUBLE) / per.total_chars AS compression
FROM per JOIN vs ON vs.k = per.k
"""


@query("llm_bpe_vocab_sweep", family="llm", oracle=_BPE_SWEEP_ORACLE)
def llm_bpe_vocab_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-shelf sweep (VERDICT r11 #7): compression, fertility,
    vocab size, and unmerged-word-type count at merge checkpoints
    k ∈ {BPE_SWEEP_CHECKPOINTS} of the SAME trained merge chain — the
    llm_lsh_band_sweep idea applied to the tokenizer: every vocab-size
    decision trades fertility (tokens per word occurrence) against
    vocab growth, and the trainer's own checkpoints answer it without
    retraining (checkpoint k's state is a PREFIX of the chain).

    Engine: one _learn_bpe chain (memoized), then per checkpoint the
    first k lookaround substitutions apply map-only over the distinct
    global word table; the per-k aggregates are exact-BIGINT
    model-sized collects re-emitted as one DataFrame (the band-sweep
    pattern) so the fertility/compression divisions happen in Spark
    SQL as RAW int/int double divisions — bit-identical everywhere,
    never rounded (the llm_pack_bfd banker's-rounding lesson). Oracle:
    the _BPE_MACHINE recursion already materializes every step's vocab
    state, so ONE machine run serves all checkpoints — the oracle just
    filters step IN {BPE_SWEEP_CHECKPOINTS}.

    Scale: vocab-sized everything (the corpus collapsed once to
    (word, freq)); per checkpoint one map-only segmentation pass + two
    vocab-keyed aggregates. At 100 TB the same audit reads the trained
    merge table and the distinct-word table — no corpus pass at all.
    """
    merges = _learn_bpe(spark, sf_dir)
    docs = t(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split("text", WS_SPLIT)).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .persist()
    )
    rows = []
    for k in BPE_SWEEP_CHECKPOINTS:
        sym = F.array_join(F.split("w", ""), " ")
        for _, l, r, merged, _w in merges[:k]:
            pat = r"(?<!\S)" + _bpe_quote(l + " " + r) + r"(?!\S)"
            repl = merged.replace("\\", "\\\\").replace("$", "\\$")
            sym = F.regexp_replace(sym, pat, repl)
        seg = words.select(
            "w", "freq", F.split(sym, " ").alias("syms")
        ).persist()
        a = seg.agg(
            F.count(F.lit(1)).cast("bigint").alias("nt"),
            F.sum("freq").cast("bigint").alias("tw"),
            F.sum(F.length("w").cast("bigint") * F.col("freq"))
            .cast("bigint")
            .alias("tc"),
            F.sum(F.size("syms").cast("bigint") * F.col("freq"))
            .cast("bigint")
            .alias("ts"),
            F.sum((F.size("syms") >= 2).cast("bigint"))
            .cast("bigint")
            .alias("mp"),
        ).collect()[0]
        vocab_size = (
            seg.select(F.explode("syms").alias("s")).distinct().count()
        )
        seg.unpersist()
        rows.append(
            (k, a["nt"], a["tw"], a["tc"], a["ts"], a["mp"], vocab_size)
        )
    words.unpersist()
    out = spark.createDataFrame(
        rows,
        "n_merges int, n_word_types bigint, total_words bigint,"
        " total_chars bigint, total_symbols bigint,"
        " multi_piece_words bigint, vocab_size bigint",
    )
    return out.select(
        "n_merges",
        "n_word_types",
        "total_words",
        "total_chars",
        "total_symbols",
        "multi_piece_words",
        "vocab_size",
        (
            F.col("total_symbols").cast("double") / F.col("total_words")
        ).alias("fertility"),
        (
            F.col("total_symbols").cast("double") / F.col("total_chars")
        ).alias("compression"),
    )


# --- Unigram-LM tokenizer trainer (Kudo 2018) ---------------------------

UNI_MAX_PIECE = 4  # seed pieces: substrings up to this many chars
UNI_SEED_SIZE = 160  # multi-char seed pieces kept (by corpus freq)
UNI_VOCAB = 96  # target vocab after pruning (single chars always kept)
UNI_EM_ROUNDS = 3
UNI_PRUNE_FRAC = 0.25  # drop at most this fraction of pieces per round
_UNI_MODEL_CACHE: dict[str, list[tuple]] = {}
_UNI_CACHE_MAX = 8


# Per-word Viterbi DP as a DuckDB list_reduce (rows-only→SQL
# conversions #24/#25, round 13 — the LAST convertible trainer). The
# accumulator is the DP TABLE itself: a plain LIST of (score, npieces,
# best-path pieces) structs, one per word position, grown left to
# right; list_reduce's (acc, x, i) index IS the position (i = 1 for
# the first lambda call after the seed element). A struct accumulator
# with a LIST field is BROKEN in DuckDB 1.0 (the list field reads as
# its initial value every iteration — measured), so each DP state
# carries its full best path and no separate backwalk pass exists.
#
# Candidate argmax replays _viterbi_segment's tuple max EXACTLY:
# maximize (score, -npieces, _desc(piece)). _desc prefers the
# lexicographically SMALLER piece except on prefix ties, where the
# LONGER piece wins (Python tuple compare: (-100,) < (-100, -100), so
# max picks 'dd' over 'd') — encoded as 'invp': each char mapped to
# format('%06x', 0x10FFFF - codepoint), fixed width so string order
# over the hex blocks ≡ the (-ord) tuple order including the prefix
# rule, then a single struct list_sort 'DESC' on (s, -np, invp).
# Float identity: every score is the same left-to-right chain of IEEE
# adds the CPython DP performs — same values, same order, bit-equal.
# Missing vocab pieces: element_at(map)[1] is NULL, the candidate's
# score goes NULL, list_filter drops it. Proven on 2 182 random +
# adversarial-tie words (0 mismatches) before landing.
_UNI_DP = f"""list_reduce(
  [[{{'s': CAST(0.0 AS DOUBLE), 'np': 0, 'ps': CAST([] AS VARCHAR[])}}]] ||
  list_transform(generate_series(1, length(w)),
                 z -> CAST([] AS STRUCT(s DOUBLE, np INTEGER, ps VARCHAR[])[])),
  (acc, x, i) -> acc || [
    list_transform([
      list_sort(list_filter(
        list_transform(generate_series(1, least({UNI_MAX_PIECE}, i)),
          l -> {{'s': struct_extract(acc[i - l + 1], 's')
                      + element_at(m, substr(w, i - l + 1, l))[1],
                'negn': -(struct_extract(acc[i - l + 1], 'np') + 1),
                'invp': array_to_string(list_transform(
                    string_split(substr(w, i - l + 1, l), ''),
                    c -> format('{{:06x}}', 1114111 - unicode(c))), ''),
                'piece': substr(w, i - l + 1, l),
                'pps': struct_extract(acc[i - l + 1], 'ps')}}),
        c -> struct_extract(c, 's') IS NOT NULL), 'DESC')[1]],
      b -> {{'s': struct_extract(b, 's'),
            'np': -struct_extract(b, 'negn'),
            'ps': list_append(struct_extract(b, 'pps'),
                              struct_extract(b, 'piece'))}})[1]
  ])"""


def _uni_map_cte(name: str, vocab_cte: str) -> str:
    """One-row CTE holding the piece → log-prob MAP for an EM round:
    lp = ln(cnt / total) — the int/int ratio cast to DOUBLE on both
    operands before one correctly-rounded division (counts « 2^53),
    then DuckDB ln ≡ CPython math.log bit-for-bit (SCALE.md §20.1:
    ln IS bit-identical, unlike exp)."""
    return f"""{name} AS (
    SELECT map(list(piece ORDER BY piece), list(lp ORDER BY piece)) AS m
    FROM (SELECT piece,
                 ln(CAST(cnt AS DOUBLE)
                    / (SELECT CAST(sum(cnt) AS DOUBLE) FROM {vocab_cte})) AS lp
          FROM {vocab_cte})
)"""


def _uni_seg_cte(name: str, words_cte: str, map_cte: str,
                 with_lang: bool = False) -> str:
    """Segmentation CTE: Viterbi-segment every (word, freq) row of
    ``words_cte`` under ``map_cte``'s model; emits a pieces list per
    word (the DP's last state carries the whole best path)."""
    lang_out = "lang, " if with_lang else ""
    lang_in = "t.lang AS lang, " if with_lang else ""
    return f"""{name} AS MATERIALIZED (
    SELECT {lang_out}w, freq,
           struct_extract(dp[length(w) + 1], 'ps') AS pieces
    FROM (SELECT {lang_in}t.w AS w, t.freq AS freq, mp.m AS m,
                 {_UNI_DP} AS dp
          FROM {words_cte} t, {map_cte} mp)
)"""


def _uni_round_ctes(r: int) -> str:
    """One EM round: E-step (segment + exact BIGINT piece counts),
    then the prune step — survivors = vocab LEFT JOIN used (count 0
    when unused), drop the lowest-(count, piece) multi-char pieces,
    at most nv // 4 (== int(nv * UNI_PRUNE_FRAC) exactly, 0.25 being
    a power of two) and never below max(UNI_VOCAB, n_single_chars);
    single chars are never dropped and zero counts floor to 1."""
    return f"""{_uni_map_cte(f'umap{r}', f'uvocab{r}')},
{_uni_seg_cte(f'useg{r}', 'uwords', f'umap{r}')},
uused{r} AS MATERIALIZED (
    SELECT f.piece AS piece, CAST(sum(freq) AS BIGINT) AS cnt
    FROM useg{r}, unnest(pieces) AS f(piece)
    GROUP BY f.piece
),
usurv{r} AS (
    SELECT v.piece AS piece, coalesce(u.cnt, CAST(0 AS BIGINT)) AS cnt
    FROM uvocab{r} v LEFT JOIN uused{r} u ON v.piece = u.piece
),
ust{r} AS (
    SELECT count(*) AS nv,
           count(*) FILTER (WHERE length(piece) = 1) AS nc
    FROM usurv{r}
),
uvocab{r + 1} AS MATERIALIZED (
    SELECT piece, CASE WHEN cnt > 0 THEN cnt ELSE CAST(1 AS BIGINT) END AS cnt
    FROM (SELECT piece, cnt,
                 row_number() OVER (ORDER BY cnt, piece) AS rk
          FROM usurv{r} WHERE length(piece) >= 2), ust{r}
    WHERE rk > least(greatest(0, nv - greatest({UNI_VOCAB}, nc)), nv // 4)
    UNION ALL
    SELECT piece, CASE WHEN cnt > 0 THEN cnt ELSE CAST(1 AS BIGINT) END
    FROM usurv{r} WHERE length(piece) = 1
)"""


# Full relational replay of _learn_unigram: seed substring counts →
# UNI_EM_ROUNDS unrolled EM/prune rounds → final E-step → the model
# with exact-integer counts and ln log-probs. Fixed unroll (the
# kcore/Lloyd precedent) — rounds are a module constant, not data.
_UNI_MACHINE = f"""uwords AS MATERIALIZED (
    SELECT t.w AS w, CAST(count(*) AS BIGINT) AS freq
    FROM documents, unnest(regexp_split_to_array(text, '{WS_SPLIT}')) AS t(w)
    WHERE t.w <> ''
    GROUP BY t.w
),
upieces AS (
    SELECT piece, CAST(sum(freq) AS BIGINT) AS pfreq
    FROM (SELECT f.piece AS piece, u.freq AS freq
          FROM uwords u,
               unnest(flatten(list_transform(
                   generate_series(1, length(u.w)), i ->
                   list_transform(
                       generate_series(1, least({UNI_MAX_PIECE},
                                                length(u.w) - i + 1)),
                       l -> substr(u.w, i, l))))) AS f(piece))
    GROUP BY piece
),
uvocab0 AS MATERIALIZED (
    SELECT piece, pfreq AS cnt FROM upieces WHERE length(piece) = 1
    UNION ALL
    SELECT piece, pfreq FROM (
        SELECT piece, pfreq,
               row_number() OVER (ORDER BY pfreq DESC, piece) AS rk
        FROM upieces WHERE length(piece) >= 2)
    WHERE rk <= {UNI_SEED_SIZE}
),
{",".join(_uni_round_ctes(r) for r in range(UNI_EM_ROUNDS))},
{_uni_map_cte(f'umap{UNI_EM_ROUNDS}', f'uvocab{UNI_EM_ROUNDS}')},
{_uni_seg_cte(f'useg{UNI_EM_ROUNDS}', 'uwords', f'umap{UNI_EM_ROUNDS}')},
uused{UNI_EM_ROUNDS} AS MATERIALIZED (
    SELECT f.piece AS piece, CAST(sum(freq) AS BIGINT) AS cnt
    FROM useg{UNI_EM_ROUNDS}, unnest(pieces) AS f(piece)
    GROUP BY f.piece
),
ufin AS MATERIALIZED (
    SELECT CAST(row_number() OVER (ORDER BY cnt DESC, piece) AS INTEGER)
               AS rank,
           piece, cnt,
           ln(CAST(cnt AS DOUBLE)
              / (SELECT CAST(sum(cnt) AS DOUBLE)
                 FROM uused{UNI_EM_ROUNDS})) AS lp
    FROM uused{UNI_EM_ROUNDS} WHERE cnt > 0
)"""

# logprob presentation: half-away-from-zero micro-units — micro =
# sign · floor(|lp|·1e6 + 0.5) as an exact BIGINT, shown as
# micro / 1e6. Python round() is BANKER'S and engine-arbitrary at a
# midpoint; this formula is the same |x|·1e6 multiply, +0.5 add and
# exact floor on both engines (the graph_pagerank fixed-point rule).
_UNI_TRAIN_ORACLE = f"""
WITH {_UNI_MACHINE}
SELECT rank, piece, cnt AS "count",
       (CASE WHEN lp < 0 THEN -1 ELSE 1 END
        * CAST(floor(abs(lp) * 1e6 + 0.5) AS BIGINT)) / 1e6 AS logprob
FROM ufin
"""

_UNI_APPLY_ORACLE = f"""
WITH {_UNI_MACHINE},
ulw AS MATERIALIZED (
    SELECT lang, t.w AS w, CAST(count(*) AS BIGINT) AS freq
    FROM documents, unnest(regexp_split_to_array(text, '{WS_SPLIT}')) AS t(w)
    WHERE t.w <> ''
    GROUP BY lang, t.w
),
uamap AS (
    SELECT map(list(piece ORDER BY piece), list(lp ORDER BY piece)) AS m
    FROM ufin
),
{_uni_seg_cte('usega', 'ulw', 'uamap', with_lang=True)},
uagg AS (
    SELECT lang,
           CAST(sum(freq * len(pieces)) AS BIGINT) AS total_pieces,
           CAST(sum(freq * len(list_filter(pieces, p -> length(p) >= 2)))
                AS BIGINT) AS multi_char_pieces,
           CAST(sum(freq * list_sum(list_transform(pieces,
                                                   p -> length(p))))
                AS BIGINT) AS total_chars
    FROM usega GROUP BY lang
)
SELECT lang, total_pieces, multi_char_pieces,
       multi_char_pieces / total_pieces AS multi_frac,
       total_chars / total_pieces AS chars_per_piece
FROM uagg
"""


def _viterbi_segment(word: str, logp: dict[str, float], max_len: int) -> list[str]:
    """Best segmentation of ``word`` under piece log-probs: maximize
    total log-prob; ties broken by FEWER pieces, then lexicographically
    smaller final piece — a total, engine-independent order. Pure
    function shared verbatim by the executor UDF and the pytest
    Python reference, so agreement is exact, not approximate."""
    n = len(word)
    NEG = float("-inf")
    # (score, -npieces, last_piece_desc) maximized; None = unreachable
    best: list[tuple | None] = [(0.0, 0)] + [None] * n
    back: list[int] = [0] * (n + 1)
    for i in range(1, n + 1):
        cand = None
        cand_l = 0
        for ln in range(1, min(max_len, i) + 1):
            prev = best[i - ln]
            if prev is None:
                continue
            lp = logp.get(word[i - ln : i])
            if lp is None:
                continue
            key = (prev[0] + lp, prev[1] - 1, word[i - ln : i])
            # max by (score, fewer pieces, smaller piece) — tuple order
            if cand is None or (key[0], key[1], _desc(key[2])) > (
                cand[0], cand[1], _desc(cand[2])
            ):
                cand = key
                cand_l = ln
        if cand is not None:
            best[i] = (cand[0], cand[1])
            back[i] = cand_l
    if best[n] is None:  # unreachable with single chars in vocab
        return list(word)
    out = []
    i = n
    while i > 0:
        out.append(word[i - back[i] : i])
        i -= back[i]
    out.reverse()
    return out


def _desc(s: str) -> tuple:
    """Order-reversing key for strings (prefer lexicographically
    SMALLER piece under a max())."""
    return tuple(-ord(c) for c in s)


def _word_freqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", WS_SPLIT)).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )


def _learn_unigram(spark: SparkSession, sf_dir: str) -> list[tuple]:
    """Unigram-LM training loop (Kudo 2018, Viterbi-EM variant).

    Scale shape (the _learn_bpe pattern): the corpus collapses ONCE to
    the distinct-(word, freq) table; seed-candidate counting is an
    explode+sum over that table; each EM round broadcasts the
    vocab-sized log-prob model into an Arrow-batched segmentation pass
    and reduces piece counts back with one vocab-keyed aggregate.
    Driver state is only the model (piece → prob). E-step counts are
    exact BIGINTs, M-step probs identical double divisions on both the
    engine and the pytest Python reference — so the reference check is
    EXACT equality, not tolerance.

    Rounds: EM re-estimation on the seed vocab, pruning the
    lowest-probability quarter (never single chars — segmentability
    invariant) until UNI_VOCAB remains, then a final EM round on the
    pruned vocab.
    """
    if sf_dir in _UNI_MODEL_CACHE:
        return _UNI_MODEL_CACHE[sf_dir]
    import math

    from pyspark.sql.functions import pandas_udf

    words = _word_freqs(spark, sf_dir).persist()

    # seed: all substrings of length 1..UNI_MAX_PIECE (per occurrence),
    # frequency-weighted; keep top UNI_SEED_SIZE multi-char pieces
    # (freq DESC, piece ASC — binary order = Python tuple order) plus
    # every single char
    subs = F.expr(
        f"""flatten(transform(sequence(1, length(w)), i ->
              transform(sequence(1, least({UNI_MAX_PIECE}, length(w) - i + 1)),
                        l -> substring(w, i, l))))"""
    )
    piece_freq = (
        words.select(F.explode(subs).alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").alias("pfreq"))
        .persist()
    )
    chars = {
        r["piece"]: r["pfreq"]
        for r in piece_freq.filter(F.length("piece") == 1).collect()
    }
    multi = {
        r["piece"]: r["pfreq"]
        for r in piece_freq.filter(F.length("piece") >= 2)
        .orderBy(F.col("pfreq").desc(), "piece")
        .limit(UNI_SEED_SIZE)
        .collect()
    }
    counts = {**chars, **multi}

    def estep(logp: dict[str, float]) -> dict[str, int]:
        # UDF built inside the round (module-level pandas_udf gotcha);
        # the model rides the pickled closure — vocab-sized, bounded
        @pandas_udf("array<string>")
        def seg(ws: pd.Series) -> pd.Series:
            return ws.map(
                lambda w: _viterbi_segment(w, logp, UNI_MAX_PIECE)
            )

        rows = (
            words.select(F.explode(seg("w")).alias("piece"), "freq")
            .groupBy("piece")
            .agg(F.sum("freq").alias("cnt"))
            .collect()
        )
        return {r["piece"]: r["cnt"] for r in rows}

    def to_logp(c: dict[str, int]) -> dict[str, float]:
        total = sum(c.values())
        return {p: math.log(v / total) for p, v in c.items() if v > 0}

    vocab = dict(counts)
    for _ in range(UNI_EM_ROUNDS):
        used = estep(to_logp(vocab))
        # prune: drop the lowest-count multi-char pieces (unused ones
        # first — count 0), at most PRUNE_FRAC of the vocab per round,
        # never below the UNI_VOCAB target, never single chars
        survivors = {p: used.get(p, 0) for p in vocab}
        multi_sorted = sorted(
            (p for p in survivors if len(p) >= 2),
            key=lambda p: (survivors[p], p),
        )
        n_char = len(vocab) - len(multi_sorted)
        droppable = max(0, len(vocab) - max(UNI_VOCAB, n_char))
        drop = set(
            multi_sorted[: min(droppable, int(len(vocab) * UNI_PRUNE_FRAC))]
        )
        vocab = {
            p: (c if c > 0 else 1)  # floor keeps pruned-survivors alive
            for p, c in survivors.items()
            if p not in drop
        }
    final = estep(to_logp(vocab))
    total = sum(final.values())
    model = sorted(
        ((p, c) for p, c in final.items() if c > 0),
        key=lambda kv: (-kv[1], kv[0]),
    )

    def _micro(x: float) -> int:
        # half-away-from-zero at 6 dp as an exact integer — Python
        # round() is banker's; this is the cross-engine-identical form
        # shared with the oracle (|x|*1e6 multiply, +0.5 add, exact
        # floor — same IEEE ops both sides)
        m = math.floor(abs(x) * 1e6 + 0.5)
        return -m if x < 0 else m

    out = [
        (rank + 1, p, int(c), _micro(math.log(c / total)) / 1e6)
        for rank, (p, c) in enumerate(model)
    ]
    words.unpersist()
    piece_freq.unpersist()
    while len(_UNI_MODEL_CACHE) >= _UNI_CACHE_MAX:
        _UNI_MODEL_CACHE.pop(next(iter(_UNI_MODEL_CACHE)))
    _UNI_MODEL_CACHE[sf_dir] = out
    return out


@query("llm_tokenizer_unigram", family="llm", oracle=_UNI_TRAIN_ORACLE)
def llm_tokenizer_unigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM tokenizer training (Kudo 2018) — the second trainer
    of the tokenizer family next to llm_bpe_train: seed a substring
    vocabulary from corpus frequencies, run Viterbi-EM rounds that
    re-estimate piece probabilities from the best segmentations, prune
    low-probability pieces toward the vocab target, and emit the
    learned (rank, piece, count, logprob) table.

    Scale design in _learn_unigram (the memoized-model _learn_bpe
    pattern); the segmentation E-step is Arrow-batched with the
    vocab-sized model broadcast in the closure — per-word Viterbi is an
    inherently sequential DP, the textbook case for a pandas UDF over
    rows rather than a JVM expression.

    SQL-ORACLED since round 13 (conversion #24, the LAST convertible
    trainer): _UNI_TRAIN_ORACLE replays the whole seed → 3×(E-step +
    prune) → final E-step loop in DuckDB; the per-word Viterbi DP is a
    list_reduce whose accumulator IS the DP table (_UNI_DP), with the
    exact _desc prefix-tie argmax via fixed-width inverted-codepoint
    keys. Counts are exact BIGINTs end-to-end; log-probs are one
    cast-to-double division + ln (bit-identical cross-engine, SCALE.md
    §20.1); the presented logprob is half-away micro fixed-point.
    tests/test_llm_curation.py keeps the exact pure-Python replay.
    """
    model = _learn_unigram(spark, sf_dir)
    return spark.createDataFrame(
        model, "rank int, piece string, count bigint, logprob double"
    )


@query("llm_unigram_apply", family="llm", oracle=_UNI_APPLY_ORACLE)
def llm_unigram_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize with the learned Unigram-LM model — the apply half of
    llm_tokenizer_unigram (mirroring llm_bpe_apply): Viterbi-segment
    every distinct (lang, word) under the trained piece log-probs and
    report what the vocabulary actually buys per language: distinct
    words, total pieces, pieces per word, and the fraction of piece
    mass that is multi-character (the compression the trainer exists
    to create; 1.0-fertility single-char fallback is the floor).

    Scale: the memoized model (vocab-sized) rides the Arrow closure;
    segmentation runs once per DISTINCT (lang, word) — the corpus
    collapses before any Python is involved — and one lang-keyed
    aggregate finishes. SQL-ORACLED since round 13 (conversion #25):
    the oracle re-runs _UNI_MACHINE and segments the (lang, word)
    table with the final model's EXACT ln log-probs (the engine's
    apply map is likewise rebuilt from exact count ratios, not the
    rounded display logprob); ratio columns are RAW BIGINT/BIGINT
    double divisions on both engines — never a rounded form. pytest
    keeps the exact driver-side reference walk via the shared
    _viterbi_segment. Reachability: every single char of every corpus
    word survives into the final model on all shipped SFs (margin
    pytest) so the oracle's DP never needs the engine's list(word)
    fallback.
    """
    import math

    from pyspark.sql.functions import pandas_udf

    model = _learn_unigram(spark, sf_dir)
    total = sum(c for _r, _p, c, _l in model)
    logp = {p: math.log(c / total) for _r, p, c, _l in model}

    docs = t(spark, sf_dir, "documents")
    words = (
        docs.select("lang", F.explode(F.split("text", WS_SPLIT)).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )

    @pandas_udf("array<string>")
    def seg(ws: pd.Series) -> pd.Series:
        return ws.map(lambda w: _viterbi_segment(w, logp, UNI_MAX_PIECE))

    pieces = words.select(
        "lang", "freq", F.explode(seg("w")).alias("piece")
    )
    return (
        pieces.groupBy("lang")
        .agg(
            F.sum("freq").cast("bigint").alias("total_pieces"),
            F.sum(F.when(F.length("piece") >= 2, F.col("freq")).otherwise(0))
            .cast("bigint")
            .alias("multi_char_pieces"),
            F.sum(F.length("piece") * F.col("freq")).cast("bigint").alias(
                "total_chars"
            ),
        )
        .select(
            "lang",
            "total_pieces",
            "multi_char_pieces",
            # RAW BIGINT/BIGINT double divisions (no round) — the one
            # cross-engine-identical form (the llm_pack_bfd lesson)
            (F.col("multi_char_pieces") / F.col("total_pieces")).alias(
                "multi_frac"
            ),
            (F.col("total_chars") / F.col("total_pieces")).alias(
                "chars_per_piece"
            ),
        )
    )


WORDPIECE_ROUNDS = 8


# LIST-MACHINE replay of the WordPiece trainer (conversion #13, round
# 11): the _BPE_MACHINE skeleton with the likelihood score — per round
# the machine also tallies SYMBOL occurrence counts, scores each
# distinct pair cnt/(cl·cr) as one IEEE division of exact BIGINTs, and
# argmaxes (score DESC, l, r) via a struct sort on (-score, l, r).
# '##' continuation symbols seed as first-char-bare / rest-prefixed,
# and merges concatenate dropping the right side's '##'.
_WP_MACHINE = f"""words AS MATERIALIZED (
    SELECT t.w AS w, CAST(count(*) AS BIGINT) AS freq
    FROM documents, unnest(regexp_split_to_array(text, '{WS_SPLIT}')) AS t(w)
    WHERE t.w <> ''
    GROUP BY t.w
),
init AS (
    SELECT 0 AS step,
           list({{'w': w,
                 'syms': list_transform(generate_series(1, length(w)),
                     i -> CASE WHEN i = 1 THEN w[1]
                               ELSE '##' || w[i] END),
                 'freq': freq}} ORDER BY w) AS vocab,
           CAST([] AS STRUCT(st INT, l VARCHAR, r VARCHAR, m VARCHAR,
                             wt BIGINT, sc DOUBLE)[]) AS merges
    FROM words
),
wp AS (
    SELECT step, vocab, merges FROM init
    UNION ALL
    SELECT step + 1,
           list_transform(vocab, v -> {{
               'w': struct_extract(v, 'w'),
               'syms': list_reduce(
                   list_transform(struct_extract(v, 'syms'), s -> [s]),
                   (acc, x) -> CASE
                       WHEN len(acc) > 0
                            AND acc[-1] = struct_extract(best, 'l')
                            AND x[1] = struct_extract(best, 'r')
                       THEN acc[1:len(acc) - 1]
                            || [struct_extract(best, 'l')
                                || CASE WHEN starts_with(
                                            struct_extract(best, 'r'), '##')
                                        THEN struct_extract(best, 'r')[3:]
                                        ELSE struct_extract(best, 'r') END]
                       ELSE acc || x END),
               'freq': struct_extract(v, 'freq')}}) AS vocab,
           merges || [{{'st': CAST(step + 1 AS INT),
                       'l': struct_extract(best, 'l'),
                       'r': struct_extract(best, 'r'),
                       'm': struct_extract(best, 'l')
                            || CASE WHEN starts_with(
                                        struct_extract(best, 'r'), '##')
                                    THEN struct_extract(best, 'r')[3:]
                                    ELSE struct_extract(best, 'r') END,
                       'wt': struct_extract(best, 'cnt'),
                       'sc': -struct_extract(best, 'negs')}}] AS merges
    FROM (
        SELECT step, vocab, merges,
               list_sort(list_transform(keys, k -> {{
                   'negs': -(CAST(list_sum(list_transform(
                       list_filter(pairs,
                           p -> struct_extract(p, 'l')
                                    = string_split(k, chr(31))[1]
                            AND struct_extract(p, 'r')
                                    = string_split(k, chr(31))[2]),
                       p -> struct_extract(p, 'f'))) AS DOUBLE)
                     / CAST(
                         list_filter(symc, e -> struct_extract(e, 's')
                             = string_split(k, chr(31))[1])[1]['c']
                         * list_filter(symc, e -> struct_extract(e, 's')
                             = string_split(k, chr(31))[2])[1]['c']
                       AS DOUBLE)),
                   'l': string_split(k, chr(31))[1],
                   'r': string_split(k, chr(31))[2],
                   'cnt': list_sum(list_transform(
                       list_filter(pairs,
                           p -> struct_extract(p, 'l')
                                    = string_split(k, chr(31))[1]
                            AND struct_extract(p, 'r')
                                    = string_split(k, chr(31))[2]),
                       p -> struct_extract(p, 'f')))}}))[1] AS best
        FROM (
            SELECT step, vocab, merges, pairs,
                   list_distinct(list_transform(pairs, p ->
                       struct_extract(p, 'l') || chr(31)
                       || struct_extract(p, 'r'))) AS keys,
                   list_transform(
                       list_distinct(list_transform(occs,
                           o -> struct_extract(o, 's'))),
                       s -> {{'s': s,
                             'c': list_sum(list_transform(
                                 list_filter(occs,
                                     o -> struct_extract(o, 's') = s),
                                 o -> struct_extract(o, 'f')))}}) AS symc
            FROM (
                SELECT step, vocab, merges,
                       flatten(list_transform(vocab, v ->
                           list_transform(
                               generate_series(1,
                                   len(struct_extract(v, 'syms')) - 1),
                               i -> {{'l': struct_extract(v, 'syms')[i],
                                     'r': struct_extract(v, 'syms')[i + 1],
                                     'f': struct_extract(v, 'freq')}})))
                           AS pairs,
                       flatten(list_transform(vocab, v ->
                           list_transform(struct_extract(v, 'syms'),
                               s -> {{'s': s,
                                     'f': struct_extract(v, 'freq')}})))
                           AS occs
                FROM wp
                WHERE step < {WORDPIECE_ROUNDS}
            )
        )
        WHERE len(pairs) > 0
    )
)"""

_WP_TRAIN_ORACLE = f"""
WITH RECURSIVE {_WP_MACHINE}
SELECT struct_extract(u, 'st') AS step,
       struct_extract(u, 'l') AS "left",
       struct_extract(u, 'r') AS "right",
       struct_extract(u, 'm') AS merged,
       struct_extract(u, 'wt') AS pair_weight,
       struct_extract(u, 'sc') AS score
FROM (SELECT merges FROM wp
      WHERE step = (SELECT max(step) FROM wp)) f,
     LATERAL unnest(f.merges) AS t(u)
"""


@query("llm_wordpiece_train", family="llm", oracle=_WP_TRAIN_ORACLE)
def llm_wordpiece_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece tokenizer training (Schuster & Nakajima 2012; the BERT
    tokenizer), 8 merge rounds — the LIKELIHOOD-scored sibling of
    llm_bpe_train: where BPE merges the most FREQUENT adjacent pair,
    WordPiece merges the pair maximizing count(ab)/(count(a)·count(b))
    (the language-model likelihood gain of fusing the two symbols), so
    a rare-but-strongly-associated pair beats a frequent-but-
    independent one. Symbols carry the '##' continuation convention
    (word-initial bare, non-initial prefixed) and merges concatenate
    dropping the right side's '##'.

    Scale shape identical to _learn_bpe: the corpus collapses ONCE to
    the (word, freq) vocab table; each round is one vocab-sized
    pair-count shuffle + one symbol-count aggregate + a map-only merge
    application; only the single best row is collected per round.
    Determinism: pair and symbol counts are exact BIGINTs, the score
    is one IEEE division of exact ints (identical everywhere), and
    ties break (left, right) in binary order — the pytest reference
    reproduces the same arithmetic in pure Python and the merge
    tables match exactly. SQL-ORACLED since round 11 (conversion #13):
    _WP_TRAIN_ORACLE replays the loop as the _BPE_MACHINE skeleton
    plus per-round symbol-occurrence counts and the (−score, l, r)
    struct-sort argmax; '##' seeding and the drop-right-marker merge
    concatenation included.
    """
    merges = _learn_wordpiece(spark, sf_dir)
    return spark.createDataFrame(
        merges,
        "step int, left string, right string, merged string,"
        " pair_weight bigint, score double",
    )


_WP_MERGE_CACHE: dict[str, list[tuple]] = {}


def _learn_wordpiece(spark: SparkSession, sf_dir: str) -> list[tuple]:
    if sf_dir in _WP_MERGE_CACHE:
        return _WP_MERGE_CACHE[sf_dir]
    docs = t(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split("text", WS_SPLIT)).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    # '##' continuation convention: first char bare, rest prefixed
    sym = words.select(
        F.expr(
            "transform(split(w, ''), (c, i) ->"
            " CASE WHEN i = 0 THEN c ELSE concat('##', c) END)"
        ).alias("a"),
        "freq",
    ).localCheckpoint()
    merges: list[tuple] = []
    for step in range(1, WORDPIECE_ROUNDS + 1):
        pairs = (
            sym.filter(F.size("a") >= 2)
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "zip_with(slice(a, 1, size(a) - 1),"
                        " slice(a, 2, size(a) - 1),"
                        " (x, y) -> struct(x AS l, y AS r))"
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").cast("bigint").alias("cnt"))
        )
        symc = (
            sym.select(F.explode("a").alias("s"), "freq")
            .groupBy("s")
            .agg(F.sum("freq").cast("bigint").alias("sc"))
        )
        sl = symc.select(F.col("s").alias("l"), F.col("sc").alias("cl"))
        sr = symc.select(F.col("s").alias("r"), F.col("sc").alias("cr"))
        best = (
            pairs.join(sl, "l")
            .join(sr, "r")
            .select(
                "l",
                "r",
                "cnt",
                (
                    F.col("cnt").cast("double")
                    / (F.col("cl") * F.col("cr")).cast("double")
                ).alias("score"),
            )
            .orderBy(F.col("score").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not best:
            break
        l, r, cnt, score = (
            best[0]["l"],
            best[0]["r"],
            best[0]["cnt"],
            best[0]["score"],
        )
        merged = l + (r[2:] if r.startswith("##") else r)
        merges.append((step, l, r, merged, cnt, score))
        pat = r"(?<!\S)" + _bpe_quote(l + " " + r) + r"(?!\S)"
        repl = merged.replace("\\", "\\\\").replace("$", "\\$")
        sym = sym.select(
            F.split(
                F.regexp_replace(F.array_join("a", " "), pat, repl), " "
            ).alias("a"),
            "freq",
        ).localCheckpoint()
    while len(_WP_MERGE_CACHE) >= _BPE_MERGE_CACHE_MAX:
        _WP_MERGE_CACHE.pop(next(iter(_WP_MERGE_CACHE)))
    _WP_MERGE_CACHE[sf_dir] = merges
    return merges


# --- Tokenizer deployment gate: vocab coverage / OOV (VERDICT r10 #8) ---

TOKCOV_VOCAB = 16  # top-V words kept in the deployed vocab (the corpus
# has 31 distinct words — templated synthetic text — so V=16 leaves a
# non-degenerate OOV tail at every SF; at production scale V is the
# tokenizer's real vocab size and the shape below is unchanged)

_TOKCOV_ORACLE = f"""
WITH wf AS MATERIALIZED (
    SELECT lang, t.w AS w, count(*) AS freq
    FROM documents, unnest(string_split(text, ' ')) AS t(w)
    WHERE t.w <> ''
    GROUP BY lang, t.w
),
gf AS (SELECT w, sum(freq) AS gfreq FROM wf GROUP BY w),
vocab AS MATERIALIZED (
    SELECT w FROM (
        SELECT w, row_number() OVER (ORDER BY gfreq DESC, w) AS rn FROM gf
    ) WHERE rn <= {TOKCOV_VOCAB}
),
vchars AS MATERIALIZED (
    SELECT DISTINCT t.c AS c FROM vocab, unnest(string_split(w, '')) AS t(c)
),
oov AS MATERIALIZED (
    SELECT lang, w, freq FROM wf
    WHERE NOT EXISTS (SELECT 1 FROM vocab v WHERE v.w = wf.w)
),
base AS (
    SELECT lang, sum(freq) AS n_tokens, count(*) AS n_types
    FROM wf GROUP BY lang
),
om AS (
    SELECT lang, sum(freq) AS n_oov, count(*) AS n_oov_types,
           max(freq) AS mx
    FROM oov GROUP BY lang
),
worst AS (
    SELECT o.lang, min(o.w) AS worst_oov
    FROM oov o JOIN om ON om.lang = o.lang AND o.freq = om.mx
    GROUP BY o.lang
),
ochar AS (
    SELECT o.lang, o.freq, t.c AS c
    FROM oov o, unnest(string_split(o.w, '')) AS t(c)
),
charcov AS (
    SELECT oc.lang,
           sum(oc.freq) AS total_c,
           sum(CASE WHEN v.c IS NOT NULL THEN oc.freq ELSE 0 END) AS cov_c
    FROM ochar oc LEFT JOIN vchars v ON v.c = oc.c
    GROUP BY oc.lang
)
SELECT b.lang,
       CAST(b.n_tokens AS BIGINT) AS n_tokens,
       CAST(b.n_types AS BIGINT) AS n_types,
       CAST(COALESCE(om.n_oov, 0) AS BIGINT) AS n_oov,
       CAST(COALESCE(om.n_oov_types, 0) AS BIGINT) AS n_oov_types,
       round(CAST(COALESCE(om.n_oov, 0) AS DOUBLE) / b.n_tokens, 6)
           AS oov_rate,
       round(CASE WHEN COALESCE(cc.total_c, 0) = 0 THEN CAST(1.0 AS DOUBLE)
                  ELSE CAST(cc.cov_c AS DOUBLE) / cc.total_c END, 6)
           AS oov_char_coverage,
       COALESCE(w2.worst_oov, '') AS worst_oov
FROM base b
LEFT JOIN om ON om.lang = b.lang
LEFT JOIN charcov cc ON cc.lang = b.lang
LEFT JOIN worst w2 ON w2.lang = b.lang
"""


@query("llm_tokenizer_coverage", family="llm", oracle=_TOKCOV_ORACLE)
def llm_tokenizer_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocab coverage / OOV audit per language slice — the deployment
    gate the tokenizer shelf (bpe/wordpiece/unigram train+apply,
    fertility) was missing: before committing a trained vocab, a
    pipeline checks what fraction of each language's token stream the
    vocab covers, how much falls to the unknown path, and whether the
    CHARACTER fallback can even spell the misses.

    Vocab = the top-TOKCOV_VOCAB words by corpus frequency (ties by
    word — a deterministic, SQL-derivable table, which is what makes
    this op hash-checkable end to end where the iterative trainers are
    rows-only). Per lang: token/type counts, OOV occurrences and
    types, oov_rate, the fraction of OOV character occurrences whose
    character appears in some vocab word (char-fallback coverage), and
    the worst OOV word (max freq, ties by min word — the two-level
    argmax pattern, exact in both engines).

    Scale: ONE corpus-wide shuffle builds the (lang, word, freq) table
    (vocab×lang-sized from then on); the vocab is a constant-size
    TakeOrdered (map-side partial top-V, no single-task window);
    vocab/vchars are broadcast-sized; every metric is an exact integer
    aggregate plus one double division. The (lang, word) relation is
    persisted — three branches (totals, OOV metrics, char explode)
    consume it.
    """
    docs = t(spark, sf_dir, "documents")
    wf = (
        docs.select("lang", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .persist()
    )
    gf = wf.groupBy("w").agg(F.sum("freq").alias("gfreq"))
    vocab = (
        gf.orderBy(F.col("gfreq").desc(), "w")
        .limit(TOKCOV_VOCAB)
        .select("w")
        .persist()
    )
    vchars = vocab.select(F.explode(F.split("w", "")).alias("c")).distinct()
    oov = wf.join(vocab, "w", "left_anti").persist()
    base = wf.groupBy("lang").agg(
        F.sum("freq").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
    )
    om = oov.groupBy("lang").agg(
        F.sum("freq").alias("n_oov"),
        F.count(F.lit(1)).cast("bigint").alias("n_oov_types"),
        F.max("freq").alias("mx"),
    )
    worst = (
        oov.join(om.select("lang", "mx"), "lang")
        .filter(F.col("freq") == F.col("mx"))
        .groupBy("lang")
        .agg(F.min("w").alias("worst_oov"))
    )
    ochar = oov.select(
        "lang", "freq", F.explode(F.split("w", "")).alias("c")
    )
    charcov = (
        ochar.join(vchars.withColumn("hit", F.lit(1)), "c", "left")
        .groupBy("lang")
        .agg(
            F.sum("freq").alias("total_c"),
            F.sum(
                F.when(F.col("hit").isNotNull(), F.col("freq")).otherwise(
                    F.lit(0)
                )
            ).alias("cov_c"),
        )
    )
    return (
        base.join(om, "lang", "left")
        .join(charcov, "lang", "left")
        .join(worst, "lang", "left")
        .select(
            "lang",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            "n_types",
            F.coalesce("n_oov", F.lit(0)).cast("bigint").alias("n_oov"),
            F.coalesce("n_oov_types", F.lit(0))
            .cast("bigint")
            .alias("n_oov_types"),
            F.round(
                F.coalesce("n_oov", F.lit(0)).cast("double")
                / F.col("n_tokens"),
                6,
            ).alias("oov_rate"),
            F.round(
                F.when(
                    F.coalesce("total_c", F.lit(0)) == 0, F.lit(1.0)
                ).otherwise(
                    F.col("cov_c").cast("double") / F.col("total_c")
                ),
                6,
            ).alias("oov_char_coverage"),
            F.coalesce("worst_oov", F.lit("")).alias("worst_oov"),
        )
    )
