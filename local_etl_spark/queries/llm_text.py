"""Text-analysis operators for training-data pipelines (SURVEY.md §2.4-J).

All hot-path logic is JVM array/regex expressions — the natural Spark
translation of corpus heuristics (token counting, quality scoring,
language ID, TF-IDF, winnowing fingerprints). No Python UDF anywhere:
at 100 TB these run inside whole-stage codegen right on top of the
parquet scan, shuffling only the (small) aggregated outputs.

Determinism: scores are ratios of integers (bit-exact) or single
ln()/divisions rounded to 6 dp — safely inside cross-engine libm
agreement at these magnitudes.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type-hint inference
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from local_etl_spark.queries._util import t
from local_etl_spark.registry import query

# deterministic marker profiles over the corpus vocabulary — the
# operator contract is the scoring mechanics (n-gram/stopword presence
# voting), not real-world language detection, which needs real profiles.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "fast", "slow"),
    "de": ("table", "window", "hash", "batch"),
    "es": ("data", "sort", "row", "group"),
    "fr": ("query", "join", "line", "order"),
    "zh": ("spark", "stream", "scan", "merge"),
}

STOPWORDS = ("the", "a")

# BPE-ish tokenizer: letter runs, digit runs, single other non-space
TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def _words(col: str = "text") -> F.Column:
    return F.split(F.col(col), " ")


# Corpus-size cutoff for forcing the vocab-table broadcast in llm_tfidf:
# below this, the distinct-term table certainly fits in executor memory
# (vocab grows sub-linearly with corpus bytes — Heaps' law); above it,
# the hint is dropped and AQE sizes the ACTUAL aggregate output at
# runtime, converting to broadcast iff it fits the configured threshold.
VOCAB_BROADCAST_CORPUS_BYTES = 1 << 30  # 1 GiB


def _corpus_bytes(sf_dir: str, table: str = "documents") -> int:
    """Driver-side parquet footprint of one table — filesystem metadata
    only, no Spark job. Used for cheap broadcast-vs-shuffle branches."""
    import os

    path = os.path.join(sf_dir, f"{table}.parquet")
    if os.path.isdir(path):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(path)
            for f in fs
        )
    try:
        return os.path.getsize(path)
    except OSError:
        # unknown source (URI, view) → never force the broadcast
        return VOCAB_BROADCAST_CORPUS_BYTES


@query(
    "llm_text_stats",
    family="llm",
    oracle="""
    SELECT doc_id, lang, source,
           len(string_split(text, ' ')) AS n_words,
           len(list_distinct(string_split(text, ' '))) AS n_unique,
           round(list_sum(list_transform(string_split(text, ' '),
                                         w -> len(w))) * 1.0
                 / len(string_split(text, ' ')), 6) AS avg_word_len
    FROM documents
    """,
)
def llm_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics (counts, vocabulary, word length)."""
    w = _words()
    total_len = F.expr(
        "aggregate(transform(split(text, ' '), w -> length(w)), 0, (a, x) -> a + x)"
    )
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        F.size(w).alias("n_words"),
        F.size(F.array_distinct(w)).alias("n_unique"),
        F.round(total_len / F.size(w), 6).alias("avg_word_len"),
    )


@query(
    "llm_token_count",
    family="llm",
    oracle=f"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_ws_tokens,
           len(regexp_extract_all(text, '{TOKEN_RE}')) AS n_re_tokens
    FROM documents
    """,
)
def llm_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish-regex token counts per document."""
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(_words()).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(TOKEN_RE), 0)).alias(
            "n_re_tokens"
        ),
    )


@query(
    "llm_tfidf",
    family="llm",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
    n AS (SELECT count(*) AS n FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               round(tf.tf * ln(n.n * 1.0 / df.df), 6) AS score,
               row_number() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY round(tf.tf * ln(n.n * 1.0 / df.df), 6) DESC,
                            tf.term) AS rn
        FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, score FROM scored WHERE rn <= 3
    """,
)
def llm_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document.

    Per-doc term frequencies are computed IN-ROW, not with a groupBy:
    sort the word array, find run boundaries (O(n) filter over
    positions), and zip consecutive boundaries into (term, tf) structs.
    That deletes the corpus-wide (doc, term) shuffle the relational
    shape needs — the only remaining corpus-sized exchanges are the df
    aggregate over distinct pairs and the per-doc top-3 window, both of
    which are inherent to the result. N (a 1-row agg) always broadcasts
    back; the vocab df table is broadcast-HINTED only while the source
    corpus is under ``VOCAB_BROADCAST_CORPUS_BYTES`` — at open-vocab
    100 TB a forced vocab broadcast could exceed executor memory, so
    past the cutoff the join is left unhinted and AQE converts to
    broadcast at runtime iff the aggregate actually fits the configured
    threshold. Staged through two selects + persist
    so Generate doesn't re-evaluate the fold per output row (see
    llm_dedup.py) and CollapseProject can't inline the multiply-
    referenced sort.
    """
    docs = t(spark, sf_dir, "documents")
    staged = (
        docs.select("doc_id", F.expr("array_sort(split(text, ' '))").alias("_s"))
        .select(
            "doc_id",
            "_s",
            F.expr(
                "filter(sequence(0, size(_s) - 1),"
                " i -> i = size(_s) - 1 OR _s[i] != _s[i+1])"
            ).alias("_ends"),
        )
        .select(
            "doc_id",
            F.expr(
                "zip_with(_ends, concat(array(-1), slice(_ends, 1, size(_ends) - 1)),"
                " (e, p) -> named_struct('term', _s[e], 'tf', CAST(e - p AS BIGINT)))"
            ).alias("_tf"),
        )
        .persist()
    )
    tf = staged.select("doc_id", F.inline("_tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # N stays IN the plan as a broadcast 1-row aggregate — a driver-side
    # docs.count() here would be a second full corpus scan per run
    n_df = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    score = F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6)
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    vocab = (
        F.broadcast(df)
        if _corpus_bytes(sf_dir) < VOCAB_BROADCAST_CORPUS_BYTES
        else df
    )
    return (
        tf.join(vocab, "term")
        .join(F.broadcast(n_df))
        .select("doc_id", "term", score.alias("score"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "score")
    )


def _duck_lang_score(markers: tuple[str, ...]) -> str:
    toks = "string_split(text, ' ')"
    return " + ".join(
        f"CASE WHEN list_contains({toks}, '{m}') THEN 1 ELSE 0 END"
        for m in markers
    )


def _spark_lang_score(markers: tuple[str, ...]) -> F.Column:
    w = _words()
    score = None
    for m in markers:
        c = F.array_contains(w, m).cast("int")
        score = c if score is None else score + c
    return score


# the oracle is generated from LANG_MARKERS so Spark and SQL can never
# disagree on the profile set: argmax + lexicographic tie-break as a
# CASE cascade (first match in sorted lang order wins)
_LANG_SCORES = ", ".join(
    f"({_duck_lang_score(m)}) AS s_{lang}"
    for lang, m in sorted(LANG_MARKERS.items())
)
_BEST = "greatest(" + ", ".join(f"s_{lang}" for lang in sorted(LANG_MARKERS)) + ")"
_PRED = (
    "CASE "
    + " ".join(
        f"WHEN s_{lang} = {_BEST} THEN '{lang}'" for lang in sorted(LANG_MARKERS)
    )
    + " END"
)


@query(
    "llm_lang_id",
    family="llm",
    oracle=f"""
    WITH scores AS (SELECT doc_id, {_LANG_SCORES} FROM documents)
    SELECT doc_id, {_PRED} AS pred_lang, {_BEST} AS score FROM scores
    """,
)
def llm_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID: argmax of per-language presence votes,
    ties broken by language code. A real deployment swaps LANG_MARKERS
    for learned n-gram profiles; the dataflow is identical."""
    docs = t(spark, sf_dir, "documents")
    cols = {
        lang: _spark_lang_score(markers)
        for lang, markers in sorted(LANG_MARKERS.items())
    }
    scored = docs.select(
        "doc_id", *[c.alias(f"s_{lang}") for lang, c in cols.items()]
    )
    best = F.greatest(*[F.col(f"s_{lang}") for lang in cols])
    pred = None
    for lang in sorted(cols):  # lexicographic tie-break
        cond = F.col(f"s_{lang}") == best
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    return scored.select(
        "doc_id", pred.alias("pred_lang"), best.alias("score")
    )


@query(
    "llm_quality_score",
    family="llm",
    oracle=f"""
    WITH f AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_words,
               len(text) AS n_chars,
               len(list_filter(string_split(text, ' '),
                   w -> list_contains({list(STOPWORDS)!r}, w))) AS n_stop,
               len(list_distinct(string_split(text, ' '))) AS n_unique
        FROM documents
    )
    SELECT doc_id,
           round(0.3 * least(n_words / 200.0, 1.0)
               + 0.3 * least(5.0 * n_stop / n_words, 1.0)
               + 0.4 * (n_unique * 1.0 / n_words), 6) AS quality
    FROM f
    """,
)
def llm_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality: length, stopword density, lexical
    diversity — the standard cheap pre-filter before expensive dedup/
    model scoring in a data pipeline. Pure column arithmetic."""
    w = _words()
    n_words = F.size(w)
    # count with multiplicity (array_intersect would dedup)
    n_stop = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS)))
    n_unique = F.size(F.array_distinct(w))
    quality = F.round(
        0.3 * F.least(n_words / F.lit(200.0), F.lit(1.0))
        + 0.3 * F.least(F.lit(5.0) * n_stop / n_words, F.lit(1.0))
        + 0.4 * (n_unique / n_words.cast("double")),
        6,
    )
    return t(spark, sf_dir, "documents").select(
        "doc_id", quality.alias("quality")
    )


# 60-bit 3-gram hash, cross-engine exact: Spark conv(md5-prefix, 16, 10)
# ≡ DuckDB CAST('0x' || md5-prefix AS BIGINT) — 15 hex chars < 2^60 so
# the BIGINT parse never overflows in either engine (the
# llm_dataset_split hex-parse pattern). Shared with the pytest twin.
GRAM_HASH_EXPR = (
    "CASE WHEN size(_w) >= 3 THEN transform(sequence(1, size(_w)-2),"
    " i -> CAST(conv(substring(md5(concat_ws(' ', _w[i-1], _w[i], _w[i+1])),"
    " 1, 15), 16, 10) AS BIGINT))"
    " ELSE array() END"
)


@query(
    "llm_fingerprint",
    family="llm",
    oracle="""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (
    SELECT doc_id, i,
           CAST(('0x' || substring(
               md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]), 1, 15))
             AS BIGINT) AS h
    FROM w, unnest(range(1, len(ws) - 1)) AS t(i)
    WHERE len(ws) >= 3
),
fp AS (
    SELECT DISTINCT doc_id,
           min(h) OVER (PARTITION BY doc_id ORDER BY i
                        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
    FROM g
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp, bit_xor(fp) AS fp_xor
FROM fp GROUP BY doc_id
""",
)
def llm_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints: min 3-gram hash per sliding window of 4.

    The standard document-fingerprint scheme (local minima of k-gram
    hashes) — guarantees any shared run of ≥ 6 words yields a shared
    fingerprint. One explode + window-min + distinct; per-doc output is
    O(words/window). The gram hash is md5-derived (GRAM_HASH_EXPR) so
    DuckDB reproduces it bit-for-bit ⇒ SQL-oracled (was xxhash64 /
    rows-only before round 7); pytest still asserts near-dup pairs
    share most fingerprints.
    """
    sh = t(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("_w")
    ).select(
        "doc_id",
        F.posexplode(F.expr(GRAM_HASH_EXPR)).alias("pos", "h"),
    )
    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(0, 3)
    )
    fp = sh.select(
        "doc_id", F.min("h").over(win).alias("fp")
    ).distinct()
    return fp.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_fp"),
        F.expr("bit_xor(fp)").alias("fp_xor"),  # order-free, overflow-free digest
    )


# run-length fold over the sorted token array: acc = (prev token, run
# length, entropy-so-far); each run boundary contributes its term in
# sorted order, finish() flushes the last run. References columns ``ws``
# (token array) and ``total`` (token count). Module-level so the
# hypothesis property test checks the same expression the query runs.
_ENTROPY_TERM = "-(CAST({c} AS DOUBLE) / total) * ln(CAST({c} AS DOUBLE) / total)"
ENTROPY_FOLD = (
    "aggregate(array_sort(ws), "
    "named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'acc', CAST(0 AS DOUBLE)), "
    "(s, x) -> IF(x <=> s.prev, "
    "  named_struct('prev', s.prev, 'run', s.run + 1L, 'acc', s.acc), "
    "  named_struct('prev', x, 'run', 1L, "
    f"    'acc', s.acc + IF(s.run = 0L, CAST(0 AS DOUBLE), {_ENTROPY_TERM.format(c='s.run')}))), "
    f"s -> s.acc + IF(s.run = 0L, CAST(0 AS DOUBLE), {_ENTROPY_TERM.format(c='s.run')}))"
)


@query(
    "llm_token_entropy",
    family="llm",
    oracle="""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tok AS (SELECT doc_id, unnest(ws) AS tok FROM w),
tc AS (SELECT doc_id, tok, count(*) AS cnt FROM tok GROUP BY doc_id, tok),
l AS (
    SELECT doc_id,
           list(cnt ORDER BY tok) AS cnts,
           sum(cnt) AS total,
           count(*) AS n_distinct
    FROM tc GROUP BY doc_id
)
SELECT doc_id,
       CAST(total AS BIGINT) AS n_tokens,
       CAST(n_distinct AS BIGINT) AS n_distinct,
       round(list_sum(list_transform(cnts,
             c -> -(CAST(c AS DOUBLE) / total) * ln(CAST(c AS DOUBLE) / total))), 6)
         AS entropy
FROM l
""",
)
def llm_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon token entropy per document — the information-density
    quality signal (near-zero entropy = degenerate/repeated text; used
    alongside the Gopher repetition rules). Map-only, zero shuffle: the
    run-length fold walks ONE sorted copy of the token array per row —
    O(n log n) sort + O(n) fold, no per-distinct-token rescans, no
    explode. Cross-engine determinism: both engines add the identical
    -(c/total)*ln(c/total) doubles in sorted-token order (Spark: fold
    over the sorted array; DuckDB: list_sum over a token-ordered list
    — a sequential left→right fold), then round 6 dp."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", _words().alias("ws"))
        .select(
            "doc_id",
            F.size("ws").cast("long").alias("n_tokens"),
            F.size(F.array_distinct("ws")).cast("long").alias("n_distinct"),
            F.col("ws"),
        )
        .withColumn("total", F.col("n_tokens"))
        .select(
            "doc_id",
            "n_tokens",
            "n_distinct",
            F.round(F.expr(ENTROPY_FOLD), 6).alias("entropy"),
        )
    )


NGRAM_TOP_K = 50


@query(
    "llm_ngram_freq",
    family="llm",
    oracle=f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh AS (
    SELECT doc_id, unnest(list_distinct(list_transform(
               generate_series(1, len(ws) - 2),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS gram
    FROM w WHERE len(ws) >= 3
)
SELECT gram, count(*) AS doc_freq
FROM sh
GROUP BY gram
ORDER BY doc_freq DESC, gram
LIMIT {NGRAM_TOP_K}
""",
)
def llm_ngram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level n-gram document frequency, top {K}: the profiling
    pass behind stop-shingle caps (llm_dedup docstring) and boilerplate
    detection — which 3-grams saturate the corpus. One distinct-shingle
    explode + one count shuffle, then TakeOrderedAndProject (each
    partition ships only its local top {K}). The (doc_freq DESC, gram)
    ordering is a total order, so the LIMIT boundary is deterministic
    across engines."""
    from local_etl_spark.queries.llm_dedup import with_shingles

    d = t(spark, sf_dir, "documents")
    # persist before explode — Generate would otherwise re-evaluate the
    # shingle-array expression per OUTPUT row (see llm_dedup_ngram)
    return (
        with_shingles(d)
        .persist()
        .select(F.explode("shingles").alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), F.asc("gram"))
        .limit(NGRAM_TOP_K)
    )


BM25_TERMS = ("spark", "table", "hash")
BM25_K1 = 1.2
BM25_B = 0.75


def _bm25_oracle() -> str:
    tf_cols = ",\n           ".join(
        f"len(list_filter(ws, x -> x = '{t}')) AS tf_{i}"
        for i, t in enumerate(BM25_TERMS)
    )
    df_cols = ", ".join(
        f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(BM25_TERMS))
    )
    score_terms = " + ".join(
        f"(ln((n_docs - df_{i} + 0.5) / (df_{i} + 0.5) + 1.0)"
        f" * (tf_{i} * ({BM25_K1} + 1.0))"
        f" / (tf_{i} + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl / avgdl)))"
        for i in range(len(BM25_TERMS))
    )
    return f"""
WITH tf AS (
    SELECT doc_id,
           len(string_split(text, ' ')) AS dl,
           {tf_cols.replace("ws", "string_split(text, ' ')")}
    FROM documents
),
stats AS (
    SELECT count(*) AS n_docs,
           CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
           {df_cols}
    FROM tf
)
SELECT doc_id,
       CAST(dl AS BIGINT) AS dl,
       CAST(tf_0 + tf_1 + tf_2 AS BIGINT) AS tf_total,
       round({score_terms}, 6) AS bm25
FROM tf CROSS JOIN stats
WHERE tf_0 + tf_1 + tf_2 > 0
"""


@query("llm_bm25", family="llm", oracle=_bm25_oracle())
def llm_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance scoring of the corpus against a fixed query-term
    set — the lexical-retrieval primitive (and the classic quality
    prior for retrieval-augmented data curation). Two passes: a
    map-only per-doc tf/dl projection, then ONE single-row global
    stats aggregate (N, avgdl, per-term df) broadcast back onto the
    docs — the same broadcast-scalar shape as llm_tfidf, so the big
    side never shuffles. Determinism: tf/df/dl/N are integers; each
    term's score is a fixed expression tree and the terms are added in
    declared order, so the doubles are bit-identical; round 6 dp."""
    d = t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    tf_doc = d.select(
        "doc_id",
        F.size(toks).alias("dl"),
        *[
            F.size(
                F.expr(f"filter(split(text, ' '), x -> x = '{term}')")
            ).alias(f"tf_{i}")
            for i, term in enumerate(BM25_TERMS)
        ],
    )
    stats = tf_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(BM25_TERMS))
        ],
    )
    joined = tf_doc.join(F.broadcast(stats))
    score = None
    for i in range(len(BM25_TERMS)):
        idf = F.log(
            (F.col("n_docs") - F.col(f"df_{i}") + 0.5)
            / (F.col(f"df_{i}") + 0.5)
            + 1.0
        )
        s = (
            idf
            * (F.col(f"tf_{i}") * (BM25_K1 + 1.0))
            / (
                F.col(f"tf_{i}")
                + BM25_K1
                * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
            )
        )
        score = s if score is None else score + s
    tf_total = sum(F.col(f"tf_{i}") for i in range(len(BM25_TERMS)))
    return (
        joined.filter(tf_total > 0)
        .select(
            "doc_id",
            F.col("dl").cast("long").alias("dl"),
            tf_total.cast("long").alias("tf_total"),
            F.round(score, 6).alias("bm25"),
        )
    )


# Shared with llm_quality_buckets (llm_pipeline.py), which buckets the
# corpus by exactly this score — the composite's oracle embeds this
# text as a CTE so the two stay in lockstep.
LM_SCORE_ORACLE = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
big AS (
    SELECT doc_id, i AS pos, ws[i] AS w1, ws[i+1] AS w2
    FROM w, unnest(generate_series(1, len(ws) - 1)) AS t(i)
    WHERE len(ws) >= 2
),
uni AS (SELECT w1, count(*) AS c1 FROM big GROUP BY w1),
bi AS (SELECT w1, w2, count(*) AS c2 FROM big GROUP BY w1, w2),
scored AS (
    SELECT b.doc_id, b.pos,
           ln(bi.c2 * 1.0 / uni.c1) AS lnp
    FROM big b
    JOIN bi  ON bi.w1 = b.w1 AND bi.w2 = b.w2
    JOIN uni ON uni.w1 = b.w1
),
folded AS (
    SELECT doc_id,
           list(lnp ORDER BY pos) AS lnps,
           count(*) AS n_bigrams
    FROM scored GROUP BY doc_id
)
SELECT doc_id,
       CAST(n_bigrams AS BIGINT) AS n_bigrams,
       round(list_sum(lnps) / n_bigrams, 6) AS avg_logprob
FROM folded
"""


@query("llm_lm_score", family="llm", oracle=LM_SCORE_ORACLE)
def llm_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-trained bigram language-model score per document — the
    KenLM-style perplexity-proxy quality filter, with the model
    estimated FROM the corpus itself (P(w2|w1) = c(w1,w2)/c(w1)):
    gibberish and boilerplate-repetition score far from the corpus
    mean. Three shuffles, all on small keys: the unigram and bigram
    count aggregates (vocabulary-sized), and the per-doc re-aggregation
    of scored bigrams; probabilities broadcast back onto the exploded
    bigram stream. Cross-engine determinism: ln(c2/c1) terms are
    identical integer-ratio logs, summed in POSITION order via a
    sequential list fold on both engines (SCALE.md §11: list_sum ≡
    left→right), then round 6 dp."""
    d = t(spark, sf_dir, "documents")
    big = (
        d.select("doc_id", F.split("text", " ").alias("ws"))
        .filter(F.size("ws") >= 2)
        .persist()  # Generate re-evaluation gotcha (llm_dedup.py)
        .select(
            "doc_id",
            F.posexplode(
                F.expr("transform(sequence(1, size(ws) - 1), i -> struct(ws[i-1] AS w1, ws[i] AS w2))")
            ).alias("pos0", "pair"),
        )
        .select(
            "doc_id",
            (F.col("pos0") + 1).alias("pos"),
            F.col("pair.w1").alias("w1"),
            F.col("pair.w2").alias("w2"),
        )
        # r13: the exploded bigram stream itself is read THREE times
        # (unigram counts, bigram counts, the scoring join) — persist
        # it so the explode runs once, not per consumer (guide §5;
        # the ws persist above still guards the O(L²) generator-input
        # re-evaluation inside the single fill pass)
        .persist()
    )
    uni = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    bi = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    # no broadcast hint: a bigram model outgrows broadcast on a real
    # corpus — AQE picks broadcast here and hash joins at scale
    scored = (
        big.join(bi, ["w1", "w2"])
        .join(uni, "w1")
        .select("doc_id", "pos", F.log(F.col("c2") / F.col("c1")).alias("lnp"))
    )
    fold = (
        "aggregate(transform(array_sort(collect_list(struct(pos, lnp))), s -> s.lnp), "
        "CAST(0 AS DOUBLE), (a, v) -> a + v)"
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(
            F.expr(fold) / F.count(F.lit(1)),
            6,
        ).alias("avg_logprob"),
    )


@query(
    "llm_dsir_weight",
    family="llm",
    oracle="""
WITH w AS (
    SELECT doc_id, lang,
           list_filter(string_split(text, ' '), x -> x <> '') AS ws
    FROM documents
),
tok AS (
    SELECT doc_id, lang, ws[i] AS wd
    FROM w, unnest(generate_series(1, len(ws))) AS t(i)
    WHERE len(ws) >= 1
),
tf AS (
    SELECT doc_id, wd, count(*) AS tf FROM tok GROUP BY doc_id, wd
),
vocab AS (SELECT count(DISTINCT wd) AS v FROM tok),
tgt AS (
    SELECT wd, count(*) AS ct FROM tok WHERE lang = 'en' GROUP BY wd
),
src AS (SELECT wd, count(*) AS cs FROM tok GROUP BY wd),
tot AS (
    SELECT (SELECT count(*) FROM tok WHERE lang = 'en') AS nt,
           (SELECT count(*) FROM tok) AS ns
),
scored AS (
    SELECT f.doc_id, f.wd, f.tf,
           f.tf * (ln((coalesce(t.ct, 0) + 1.0) / (tot.nt + vocab.v))
                   - ln((s.cs + 1.0) / (tot.ns + vocab.v))) AS wllr
    FROM tf f
    JOIN src s ON s.wd = f.wd
    LEFT JOIN tgt t ON t.wd = f.wd
    CROSS JOIN tot CROSS JOIN vocab
),
folded AS (
    SELECT doc_id, list(wllr ORDER BY wd) AS wllrs,
           CAST(sum(tf) AS BIGINT) AS n_tokens
    FROM scored GROUP BY doc_id
)
SELECT f.doc_id,
       f.n_tokens,
       -- + 0.0 collapses IEEE -0.0 to +0.0 (repr-level canon parity)
       round(list_sum(f.wllrs) / f.n_tokens, 6) + 0.0 AS avg_log_ratio
FROM folded f
""",
)
def llm_dsir_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, Data Selection
    via Importance Resampling): per-document avg log p_target/p_source
    under Laplace-smoothed unigram models, target = the 'en' slice,
    source = the whole corpus. Documents whose token distribution
    looks target-like get high weight — the principled replacement for
    hard domain filters when composing a training mixture (resample
    ∝ exp(weight)). DSIR hashes n-grams into a fixed bucket space to
    bound model size; here the features are the words themselves
    (testdata vocabulary is small), with hashed buckets via
    ``pmod(xxhash64(w), B)`` as the documented at-scale variant — the
    plan is identical, only the feature key changes (note: hashed
    buckets would be Spark-only; word features keep the model
    re-derivable by any engine, which is what the oracle checks).

    Plan (the llm_tfidf shape): per-doc term frequencies computed
    IN-ROW (sorted word array → run boundaries — no corpus-wide
    (doc, token) shuffle), so the model joins touch one row per
    DISTINCT (doc, word) instead of one per token; the two
    vocabulary-keyed count aggregates (target + source token totals,
    derived from the same tf stream as sum(tf)) and three
    broadcast-sized scalars join back onto it, and the per-doc fold
    runs word-sorted (Σ_w tf·llr — bit-identical sequential fold in
    both engines).
    """
    d = t(spark, sf_dir, "documents")
    staged = (
        d.select(
            "doc_id",
            "lang",
            F.expr("array_sort(filter(split(text, ' '), x -> x != ''))").alias(
                "_s"
            ),
        )
        .filter(F.size("_s") >= 1)
        .select(
            "doc_id",
            "lang",
            "_s",
            F.expr(
                "filter(sequence(0, size(_s) - 1),"
                " i -> i = size(_s) - 1 OR _s[i] != _s[i+1])"
            ).alias("_ends"),
        )
        .select(
            "doc_id",
            "lang",
            F.expr(
                "zip_with(_ends, concat(array(-1), slice(_ends, 1, size(_ends) - 1)),"
                " (e, p) -> named_struct('wd', _s[e], 'tf', CAST(e - p AS BIGINT)))"
            ).alias("_tf"),
        )
        .persist()
    )
    tf = staged.select("doc_id", "lang", F.inline("_tf"))
    src = tf.groupBy("wd").agg(F.sum("tf").alias("cs"))
    tgt = (
        tf.filter(F.col("lang") == "en").groupBy("wd").agg(F.sum("tf").alias("ct"))
    )
    scalars = tf.agg(
        F.sum("tf").alias("ns"),
        F.sum(F.when(F.col("lang") == "en", F.col("tf")).otherwise(0)).alias("nt"),
        F.countDistinct("wd").alias("v"),
    )
    scored = (
        tf.join(src, "wd")
        .join(tgt, "wd", "left")
        .crossJoin(F.broadcast(scalars))
        .select(
            "doc_id",
            "wd",
            "tf",
            (
                F.col("tf")
                * (
                    F.log(
                        (F.coalesce("ct", F.lit(0)) + F.lit(1.0))
                        / (F.col("nt") + F.col("v"))
                    )
                    - F.log(
                        (F.col("cs") + F.lit(1.0)) / (F.col("ns") + F.col("v"))
                    )
                )
            ).alias("wllr"),
        )
    )
    fold = (
        "aggregate(transform(array_sort(collect_list(struct(wd, wllr))), s -> s.wllr), "
        "CAST(0 AS DOUBLE), (a, v) -> a + v)"
    )
    return scored.groupBy("doc_id").agg(
        F.sum("tf").alias("n_tokens"),
        # + 0.0 collapses IEEE -0.0 to +0.0 (repr-level canon parity)
        (F.round(F.expr(fold) / F.sum("tf"), 6) + F.lit(0.0)).alias(
            "avg_log_ratio"
        ),
    )


@query(
    "llm_lm_kneser_ney",
    family="llm",
    oracle="""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
big AS (
    SELECT doc_id, i AS pos, ws[i] AS w1, ws[i+1] AS w2
    FROM w, unnest(generate_series(1, len(ws) - 1)) AS t(i)
    WHERE len(ws) >= 2
),
uni AS (SELECT w1, count(*) AS c1 FROM big GROUP BY w1),
bi AS (SELECT w1, w2, count(*) AS c2 FROM big GROUP BY w1, w2),
fol AS (SELECT w1, count(DISTINCT w2) AS nfol FROM big GROUP BY w1),
pre AS (SELECT w2, count(DISTINCT w1) AS npre FROM big GROUP BY w2),
types AS (SELECT count(*) AS ntypes FROM bi),
scored AS (
    SELECT b.doc_id, b.pos,
           ln(greatest(bi.c2 - 0.75, 0.0) / uni.c1
              + 0.75 * fol.nfol / uni.c1
                * (pre.npre * 1.0 / types.ntypes)) AS lnp
    FROM big b
    JOIN bi  ON bi.w1 = b.w1 AND bi.w2 = b.w2
    JOIN uni ON uni.w1 = b.w1
    JOIN fol ON fol.w1 = b.w1
    JOIN pre ON pre.w2 = b.w2
    CROSS JOIN types
),
folded AS (
    SELECT doc_id, list(lnp ORDER BY pos) AS lnps, count(*) AS n_bigrams
    FROM scored GROUP BY doc_id
)
SELECT doc_id,
       CAST(n_bigrams AS BIGINT) AS n_bigrams,
       round(list_sum(lnps) / n_bigrams, 6) + 0.0 AS avg_logprob_kn
FROM folded
""",
)
def llm_lm_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM score per document — the
    standard n-gram smoothing (Kneser & Ney 1995; Chen & Goodman 1999)
    upgrading llm_lm_score's MLE model: absolute discount D=0.75 with
    the freed mass backed off to the CONTINUATION probability (how many
    distinct contexts a word follows, not how often it occurs):

        P(w2|w1) = max(c12-D, 0)/c1 + D·N1+(w1,·)/c1 · N1+(·,w2)/N1+(·,·)

    Every model quantity is an integer count (bigram/unigram counts,
    distinct-follower/-predecessor counts, bigram type count), so the
    per-bigram probability is the identical double arithmetic in both
    engines; per-doc sums fold in position order (bit-identical, cf.
    llm_lm_score). Plan: four vocabulary-sized aggregates off ONE
    persisted bigram stream + one 1-row type-count broadcast, then the
    per-doc re-aggregation — same shuffle classes as llm_lm_score plus
    two more small-key aggregates.
    """
    d = t(spark, sf_dir, "documents")
    big = (
        d.select("doc_id", F.split("text", " ").alias("ws"))
        .filter(F.size("ws") >= 2)
        .persist()  # Generate re-evaluation gotcha (llm_dedup.py)
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    "transform(sequence(1, size(ws) - 1),"
                    " i -> struct(ws[i-1] AS w1, ws[i] AS w2))"
                )
            ).alias("pos0", "pair"),
        )
        .select(
            "doc_id",
            (F.col("pos0") + 1).alias("pos"),
            F.col("pair.w1").alias("w1"),
            F.col("pair.w2").alias("w2"),
        )
        .persist()
    )
    uni = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    bi = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    fol = big.groupBy("w1").agg(F.countDistinct("w2").alias("nfol"))
    pre = big.groupBy("w2").agg(F.countDistinct("w1").alias("npre"))
    types = bi.agg(F.count(F.lit(1)).alias("ntypes"))
    p_kn = F.log(
        F.greatest(F.col("c2") - F.lit(0.75), F.lit(0.0)) / F.col("c1")
        + F.lit(0.75)
        * F.col("nfol")
        / F.col("c1")
        * (F.col("npre") * F.lit(1.0) / F.col("ntypes"))
    )
    scored = (
        big.join(bi, ["w1", "w2"])
        .join(uni, "w1")
        .join(fol, "w1")
        .join(pre, "w2")
        .crossJoin(F.broadcast(types))
        .select("doc_id", "pos", p_kn.alias("lnp"))
    )
    fold = (
        "aggregate(transform(array_sort(collect_list(struct(pos, lnp))), s -> s.lnp), "
        "CAST(0 AS DOUBLE), (a, v) -> a + v)"
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (F.round(F.expr(fold) / F.count(F.lit(1)), 6) + F.lit(0.0)).alias(
            "avg_logprob_kn"
        ),
    )


@query(
    "llm_token_fertility",
    family="llm",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           sum(n_chars) * 1.0 / sum(len(string_split(text, ' ')))
               AS chars_per_token,
           sum(len(string_split(text, ' '))) * 1.0 / count(*)
               AS tokens_per_doc
    FROM documents
    GROUP BY lang
    """,
)
def llm_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility profile per language: chars/token and
    tokens/doc — the stat that decides whether a tokenizer (here the
    whitespace baseline) is efficient for a language before burning a
    training run on it (CJK famously blows up fertility; the corpus'
    space-free zh documents surface exactly that).

    Determinism: token and char counts are exact integers summed
    exactly; each reported ratio is ONE division of two exact integers
    (correctly rounded in both engines). Scale: map-side size(split())
    per row, one lang-keyed partial+final aggregate — no shuffle wider
    than the language cardinality.
    """
    d = t(spark, sf_dir, "documents")
    toks = F.size(F.split("text", " ")).cast("bigint")
    return (
        d.select("lang", toks.alias("tk"), "n_chars")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tk").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
        .select(
            "lang",
            "n_docs",
            "total_tokens",
            "total_chars",
            (F.col("total_chars") * F.lit(1.0) / F.col("total_tokens")).alias(
                "chars_per_token"
            ),
            (F.col("total_tokens") * F.lit(1.0) / F.col("n_docs")).alias(
                "tokens_per_doc"
            ),
        )
    )


# --- distributed quality classifier (fastText/CCNet-style linear model) ---

QC_TTR_LABEL = 0.46  # corpus-median TTR: quality label = high lexical diversity
QC_LR = 2.0
QC_ITERS = 30
QC_NFEAT = 6
# weights memoized per sf_dir: training is deterministic, and repeat
# callers (bench best-of-2, plan audit, driver re-runs) shouldn't pay
# the 30 corpus scans again. Model-sized values (6 doubles), bounded.
_QC_WEIGHT_CACHE: dict[str, list[float]] = {}
_QC_CACHE_MAX = 8


def _qc_features(docs: DataFrame) -> DataFrame:
    """Per-doc CCNet-style feature vector — pure JVM expressions.

    x0 bias, x1 log-length, x2 mean word length, x3 TTR, x4 stopword
    ratio, x5 long-word ratio; label y = 1 when TTR clears the
    corpus-median threshold (the 'high-lexical-diversity docs are the
    quality slice' proxy CCNet uses with a real LM in the loop).
    Features are staged through one select so the words array binds
    once; everything stays inside whole-stage codegen.
    """
    nw = F.size("_w").cast("double")
    feats = docs.select(
        "doc_id", "text", F.split("text", " ").alias("_w")
    ).select(
        "doc_id",
        (F.size(F.array_distinct("_w")) / F.size("_w")).alias("_ttr"),
        F.lit(1.0).alias("x0"),
        (F.log(F.lit(1.0) + nw) / F.lit(10.0)).alias("x1"),
        (
            (F.length("text") - F.size("_w") + F.lit(1)) / nw / F.lit(10.0)
        ).alias("x2"),
        (F.size(F.array_distinct("_w")) / F.size("_w")).alias("x3"),
        (
            F.expr("size(filter(_w, w -> w IN ('the', 'a')))") / nw
        ).alias("x4"),
        (F.expr("size(filter(_w, w -> length(w) >= 6))") / nw).alias("x5"),
    )
    return feats.select(
        "doc_id",
        F.when(F.col("_ttr") >= QC_TTR_LABEL, 1.0).otherwise(0.0).alias("y"),
        *[f"x{i}" for i in range(QC_NFEAT)],
    )


def _qc_margin(w: list[float]) -> F.Column:
    z = F.lit(0.0)
    for i, wi in enumerate(w):
        z = z + F.lit(float(wi)) * F.col(f"x{i}")
    return z


def _qc_sigmoid_udf():
    """Arrow-batched libm sigmoid — the escape hatch that DEFEATS the
    exp blocker (SCALE.md §20.1): JVM Math.exp is NOT bit-identical to
    libm (4/4000 1-ulp diffs) and neither is numpy's vectorized exp
    (measured 1931/8000 vs math.exp), but elementwise CPython math.exp
    ≡ DuckDB exp at 0/8000. Routing ONLY the sigmoid through an Arrow
    stage keeps every other float op (margins, contributions) in
    whole-stage codegen — JVM +,-,*,/ are IEEE-identical to DuckDB's.
    OverflowError on exp(|z|>709) maps to 0.0, mirroring DuckDB's
    1/(1+inf). Built inside the function (module-level pandas_udf
    gotcha)."""
    import math

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def sig(z: pd.Series) -> pd.Series:
        def s(v: float) -> float:
            try:
                return 1.0 / (1.0 + math.exp(-v))
            except OverflowError:
                return 0.0

        return z.map(s)

    return sig


def _qc_micro12(v: F.Column) -> F.Column:
    """Per-row gradient contribution in exact 1e-12 fixed-point:
    sign · floor(|v|·1e12 + 0.5) — one multiply, one add, one exact
    floor, identical IEEE ops on both engines (the graph_pagerank
    rule), then DECIMAL-cast pre-sum so the cross-row sum is an exact
    integer hash aggregate: ORDER-FREE, map-side combinable, no
    ordered-fold cost (ANSI long sums would overflow at ~7.6M rows;
    DECIMAL(28,0) is exact to 1e16 rows)."""
    m = F.floor(F.abs(v) * F.lit(1e12) + F.lit(0.5))
    return F.when(v < 0, -m).otherwise(m).cast("decimal(28,0)")


def _train_quality_logreg(
    spark: SparkSession, sf_dir: str, iters: int = QC_ITERS, lr: float = QC_LR
) -> list[float]:
    """Full-batch logistic-regression GD with the broadcast-model /
    distribute-data split (the llm_kmeans_train shape, llm_sim.py):
    per iteration the 6 current weights are inlined as literals, every
    row computes its margin IN-ROW (codegen), the sigmoid runs through
    the Arrow/libm stage (_qc_sigmoid_udf — the ONLY non-JVM float
    op), and ONE aggregate reduces 6 exact fixed-point gradient sums
    to the driver, which applies the k-sized update. Driver state and
    per-iteration traffic are model-sized (6 values); each iteration
    is one scan of the persisted feature relation. Deterministic AND
    SQL-replayable: integer gradient sums are order-free, the update
    chain w − lr·(S/1e12)/n is the same float expression in Python and
    the oracle."""
    if sf_dir in _QC_WEIGHT_CACHE:
        return _QC_WEIGHT_CACHE[sf_dir]
    feats = _qc_features(t(spark, sf_dir, "documents")).persist()
    n = feats.count()
    sig = _qc_sigmoid_udf()
    xcols = [f"x{i}" for i in range(QC_NFEAT)]
    w = [0.0] * QC_NFEAT
    for _ in range(iters):
        staged = feats.select(
            "y", *xcols, sig(_qc_margin(w)).alias("p")
        )
        g = F.col("p") - F.col("y")
        grads = staged.agg(
            *[
                F.sum(_qc_micro12(g * F.col(f"x{i}"))).alias(f"g{i}")
                for i in range(QC_NFEAT)
            ]
        ).first()
        w = [
            w[i] - lr * (int(grads[f"g{i}"]) / 1e12) / n
            for i in range(QC_NFEAT)
        ]
    feats.unpersist()
    while len(_QC_WEIGHT_CACHE) >= _QC_CACHE_MAX:
        _QC_WEIGHT_CACHE.pop(next(iter(_QC_WEIGHT_CACHE)))
    _QC_WEIGHT_CACHE[sf_dir] = w
    return w


def _qc_oracle() -> str:
    """Full DuckDB replay of the fixed-point GD (rows-only→SQL
    conversion #26, round 13 — the measured exp blocker DEFEATED, not
    documented): features are the same +,-,*,/ and ln chains; each of
    the QC_ITERS unrolled iterations carries the 6 weights in a
    one-row CTE, computes per-row sigmoid with DuckDB exp (≡ libm ≡
    the engine's Arrow stage), reduces exact BIGINT fixed-point
    contribution sums, and applies the identical update expression."""
    nf = range(QC_NFEAT)
    feats = f"""qf AS MATERIALIZED (
    SELECT doc_id,
           CASE WHEN tt >= {QC_TTR_LABEL} THEN 1.0 ELSE 0.0 END AS y,
           1.0 AS x0,
           ln(1.0 + nw) / 10.0 AS x1,
           (length(text) - len(ws) + 1) / nw / 10.0 AS x2,
           tt AS x3,
           len(list_filter(ws, w -> w IN ('the', 'a'))) / nw AS x4,
           len(list_filter(ws, w -> length(w) >= 6)) / nw AS x5
    FROM (SELECT doc_id, text, ws,
                 CAST(len(ws) AS DOUBLE) AS nw,
                 len(list_distinct(ws)) / len(ws) AS tt
          FROM (SELECT doc_id, text,
                       string_split(text, ' ') AS ws
                FROM documents))
),
qn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM qf)"""
    z = "(0.0" + "".join(f" + w.a{i} * x{i}" for i in nf) + ")"
    sig = f"1.0 / (1.0 + exp(-{z}))"
    contribs = ", ".join(
        f"""CASE WHEN (p - y) * x{i} < 0
             THEN -CAST(floor(abs((p - y) * x{i}) * 1e12 + 0.5) AS BIGINT)
             ELSE CAST(floor(abs((p - y) * x{i}) * 1e12 + 0.5) AS BIGINT)
        END AS c{i}"""
        for i in nf
    )
    parts = [
        feats,
        "w0 AS (SELECT "
        + ", ".join(f"CAST(0.0 AS DOUBLE) AS a{i}" for i in nf)
        + ")",
    ]
    for r in range(1, QC_ITERS + 1):
        parts.append(f"""g{r} AS MATERIALIZED (
    SELECT {", ".join(f"sum(c{i}) AS s{i}" for i in nf)}
    FROM (SELECT {contribs}
          FROM (SELECT y, {", ".join(f"x{i}" for i in nf)}, {sig} AS p
                FROM qf, w{r - 1} w))
)""")
        parts.append(f"""w{r} AS MATERIALIZED (
    SELECT {", ".join(
        f"w.a{i} - {QC_LR} * (CAST(g.s{i} AS DOUBLE) / 1e12) / n.n AS a{i}"
        for i in nf)}
    FROM w{r - 1} w, g{r} g, qn n
)""")
    joined = ",\n".join(parts)
    return f"""
WITH {joined}
SELECT doc_id,
       CAST(y AS INTEGER) AS label_high_quality,
       CAST(floor(p * 1e6 + 0.5) AS BIGINT) / 1e6 AS score,
       CASE WHEN p >= 0.5 THEN 1 ELSE 0 END AS predicted
FROM (SELECT doc_id, y, {sig} AS p FROM qf, w{QC_ITERS} w)
"""


@query("llm_quality_classifier", family="llm", oracle=_qc_oracle())
def llm_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed linear quality classifier over document features —
    the fastText/CCNet pattern: cheap per-doc features, a linear model
    trained ON the cluster, scores usable as filter/mixing weights.

    Training: see _train_quality_logreg (broadcast weights → in-row
    margin → Arrow/libm sigmoid → one exact fixed-point 6-value
    gradient aggregate per iteration — at 100 TB each iteration is one
    scan + one tiny order-free agg, the canonical iterative-training
    shape; the corpus-sized design matrix never leaves the executors).
    Scoring: one more map-only pass with the final weights inlined.

    SQL-ORACLED since round 13 (conversion #26): round 12 MEASURED
    that JVM Math.exp breaks cross-engine bit-identity, and this round
    measured the escape hatch — elementwise CPython math.exp ≡ DuckDB
    exp (0/8000; numpy's vectorized exp is NOT, 1931/8000), so the
    sigmoid rides an Arrow stage while gradients became order-free
    exact fixed-point integers (the graph_pagerank rule), making the
    whole 30-iteration GD replayable in _qc_oracle's unrolled CTEs.
    tests/test_llm_pipeline.py keeps an exact integer Python replay
    plus the separability/accuracy pins.
    """
    w = _train_quality_logreg(spark, sf_dir)
    feats = _qc_features(t(spark, sf_dir, "documents"))
    sig = _qc_sigmoid_udf()
    scored = feats.select(
        "doc_id",
        F.col("y").cast("int").alias("label_high_quality"),
        sig(_qc_margin(w)).alias("_p"),
    )
    return scored.select(
        "doc_id",
        "label_high_quality",
        # half-away micro fixed-point (p ≥ 0 so no sign branch), the
        # shared presentation form — Spark round() would be HALF_UP on
        # a BigDecimal of the double, not the same double
        (F.floor(F.col("_p") * F.lit(1e6) + F.lit(0.5)).cast("long")
         / F.lit(1e6)).alias("score"),
        F.when(F.col("_p") >= 0.5, 1).otherwise(0).alias("predicted"),
    ).orderBy("doc_id")


@query(
    "llm_ngram_novelty",
    family="llm",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    sh AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
                   generate_series(1, len(ws) - 2),
                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS s
        FROM w WHERE len(ws) >= 3
    ),
    dfreq AS (SELECT s, count(*) AS df FROM sh GROUP BY s)
    SELECT sh.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_novel,
           round(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
               AS novelty
    FROM sh JOIN dfreq ON sh.s = dfreq.s
    GROUP BY sh.doc_id
    """,
)
def llm_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a doc's distinct
    word-3-grams that occur in NO other document — the curation signal
    that separates generic/boilerplate-heavy documents (low novelty)
    from unique content worth upweighting (the inverse of what the
    dedup family removes; curriculum/mixing consumes it as a score,
    not a drop decision).

    Scale: the same df-capped-index machinery class as llm_dedup_ngram
    but with NO pair join at all — one shingle exchange builds
    document frequencies, one co-keyed join + doc-keyed aggregate
    scores every document. A df of 1 is exact by definition
    (count-distinct-free). Determinism: counts and one int division.
    """
    from local_etl_spark.queries.llm_dedup import with_shingles

    sh = with_shingles(t(spark, sf_dir, "documents")).persist()
    posting = sh.filter(F.size("shingles") > 0).select(
        "doc_id", F.explode("shingles").alias("s")
    )
    dfreq = posting.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    return (
        posting.join(dfreq, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            F.round(F.col("n_novel") * F.lit(1.0) / F.col("n_shingles"), 6).alias(
                "novelty"
            ),
        )
    )


# safety-scan marker lists: deterministic corpus-vocabulary stand-ins —
# the operator contract is the scanning mechanics (multi-pattern regex
# flags + corpus rates), not a production blocklist, mirroring
# LANG_MARKERS' approach to language ID
INJECTION_RE = "(ignore (all|previous)|system prompt|disregard)"
CONTACT_RE = "[a-z0-9._]+@[a-z0-9.]+|\\\\+?[0-9][0-9 -]{7,}[0-9]"
SHOUT_RE = "[A-Z]{6,}"


@query(
    "llm_safety_scan",
    family="llm",
    oracle=f"""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN regexp_matches(text, '{INJECTION_RE}')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_injection,
           CAST(sum(CASE WHEN regexp_matches(text, '{CONTACT_RE.replace(chr(92)*2, chr(92))}')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_contact,
           CAST(sum(CASE WHEN regexp_matches(text, '{SHOUT_RE}')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_shouting,
           round(sum(CASE WHEN regexp_matches(text, '{INJECTION_RE}')
                          THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
               AS injection_rate
    FROM documents
    GROUP BY lang
    """,
)
def llm_safety_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus safety scan: per language, how many documents trip the
    prompt-injection, contact-info (email/phone), and shouting
    heuristics — the cheap regex screening pass that runs BEFORE
    expensive model-based safety classifiers and decides what fraction
    of a crawl needs them at all (the llm_pii_scrub operator REDACTS;
    this one MEASURES, which is what a curation dashboard needs).

    Scale: three compiled regexes per row inside codegen on top of the
    scan, one lang-keyed aggregate — rates are exact counts and one
    division. Pattern lists are deterministic corpus-shaped stand-ins
    (the LANG_MARKERS approach): mechanics are the contract, real
    blocklists are configuration.
    """
    d = t(spark, sf_dir, "documents")
    inj = F.col("text").rlike(INJECTION_RE)
    contact = F.col("text").rlike(CONTACT_RE.replace("\\\\", "\\"))
    shout = F.col("text").rlike(SHOUT_RE)
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(inj, 1).otherwise(0)).cast("bigint").alias("n_injection"),
        F.sum(F.when(contact, 1).otherwise(0)).cast("bigint").alias("n_contact"),
        F.sum(F.when(shout, 1).otherwise(0)).cast("bigint").alias("n_shouting"),
        F.round(
            F.sum(F.when(inj, 1).otherwise(0)) * F.lit(1.0) / F.count(F.lit(1)),
            6,
        ).alias("injection_rate"),
    )


@query(
    "llm_kl_shift",
    family="llm",
    oracle="""
    WITH wc AS (
        SELECT source, w, CAST(count(*) AS BIGINT) AS c
        FROM (
            SELECT source, unnest(string_split(text, ' ')) AS w
            FROM documents
        )
        WHERE w <> ''
        GROUP BY source, w
    ),
    st AS (
        SELECT source, CAST(sum(c) AS BIGINT) AS n FROM wc GROUP BY source
    ),
    gt AS (
        SELECT w, CAST(sum(c) AS BIGINT) AS gc FROM wc GROUP BY w
    ),
    g AS (SELECT CAST(sum(c) AS BIGINT) AS gn FROM wc),
    terms AS (
        SELECT wc.source, wc.w,
               (CAST(wc.c AS DOUBLE) / st.n)
                   * ln((CAST(wc.c AS DOUBLE) / st.n)
                        / (CAST(gt.gc AS DOUBLE) / g.gn)) AS term
        FROM wc
        JOIN st USING (source)
        JOIN gt USING (w)
        CROSS JOIN g
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_words,
           round(list_sum(list(term ORDER BY w)), 6) + 0.0 AS kl_vs_global
    FROM terms GROUP BY source
    """,
)
def llm_kl_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distribution shift: KL(P_source ‖ P_corpus) over the
    unigram word distributions — the drift monitor a mixture pipeline
    runs per ingest source (a source whose KL jumps changed register/
    topic/spam profile; pairs with etl_drift_psi, which watches a
    NUMERIC column, and agg_entropy, which watches one categorical
    mix). The global distribution is the word-marginal of all sources,
    so every source word has global support — no smoothing needed.

    Determinism: counts are exact BIGINTs; each term is a fixed
    expression over two exact-int divisions (ln matched cross-engine
    everywhere it's used — agg_theil); per-source term sums fold in
    explicit word order; `+ 0.0` normalizes −0.0. Scale: one
    (source, word)-keyed aggregate over the corpus (the shuffle),
    then everything is vocab-sized; the ordered fold buffers
    |vocab_source| terms.
    """
    d = t(spark, sf_dir, "documents")
    wc = (
        d.select("source", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .persist()
    )
    st = wc.groupBy("source").agg(F.sum("c").cast("bigint").alias("n"))
    gt = wc.groupBy("w").agg(F.sum("c").cast("bigint").alias("gc"))
    g = wc.agg(F.sum("c").cast("bigint").alias("gn"))
    ps = F.col("c").cast("double") / F.col("n")
    pg = F.col("gc").cast("double") / F.col("gn")
    terms = (
        wc.join(st, "source")
        .join(gt, "w")
        .crossJoin(F.broadcast(g))
        .select("source", "w", (ps * F.log(ps / pg)).alias("term"))
    )
    fold = (
        "aggregate(transform(array_sort(collect_list(struct(w, term))),"
        " s -> s.term), CAST(0 AS DOUBLE), (a, v) -> a + v)"
    )
    return terms.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        (F.round(F.expr(fold), 6) + 0.0).alias("kl_vs_global"),
    )


@query(
    "llm_lang_confusion",
    family="llm",
    oracle=f"""
    WITH scores AS (SELECT doc_id, {_LANG_SCORES} FROM documents),
    pred AS (SELECT doc_id, {_PRED} AS pred_lang FROM scores),
    cm AS (
        SELECT d.lang, p.pred_lang, CAST(count(*) AS BIGINT) AS n
        FROM documents d JOIN pred p ON d.doc_id = p.doc_id
        GROUP BY 1, 2
    ),
    tot AS (
        SELECT lang, CAST(sum(n) AS BIGINT) AS n_label FROM cm GROUP BY 1
    )
    SELECT cm.lang, cm.pred_lang, cm.n, tot.n_label,
           round(CAST(cm.n AS DOUBLE) / tot.n_label, 6) + 0.0 AS frac,
           (cm.lang = cm.pred_lang) AS is_correct
    FROM cm JOIN tot ON cm.lang = tot.lang
    """,
)
def llm_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix — the eval harness for
    llm_lang_id graded against the corpus's LABELED lang column (the
    llm_retrieval_eval / llm_dedup_eval principle applied to the text
    classifiers): one row per (label, prediction) cell with its count,
    the label's row total, the row-normalized fraction, and the
    diagonal flag — per-language recall is the diagonal frac, and
    every off-diagonal cell says exactly WHICH languages the
    marker-word heuristic conflates before anyone trusts its routing
    decisions at 100 TB.

    Determinism: cell counts are exact integers; frac is one IEEE
    division; the prediction itself reuses llm_lang_id's exact
    marker-vote argmax (lexicographic tie-break) on both sides.

    Scale: classification is a map-only pass (word-set containment
    votes); the matrix is |langs|²-bounded — one tiny shuffle.
    """
    pred = llm_lang_id(spark, sf_dir).select("doc_id", "pred_lang")
    docs = t(spark, sf_dir, "documents").select("doc_id", "lang")
    cm = (
        docs.join(pred, "doc_id")
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = cm.groupBy("lang").agg(
        F.sum("n").cast("bigint").alias("n_label")
    )
    return cm.join(tot, "lang").select(
        "lang",
        "pred_lang",
        "n",
        "n_label",
        (
            F.round(F.col("n").cast("double") / F.col("n_label"), 6) + 0.0
        ).alias("frac"),
        (F.col("lang") == F.col("pred_lang")).alias("is_correct"),
    )
