"""Corpus-preparation operators for training-data pipelines.

Extends the SURVEY.md §2.4-J/L surface with three ops every large-scale
pretraining pipeline runs between filtering and tokenization:

  repetition     Gopher-style n-gram repetition signals (quality filter)
  pack_sequences token-budget sequence packing (batch assembly)
  contamination  eval-set n-gram overlap audit (decontamination)

Scale notes:
  - ``repetition`` is a pure per-row fold over a sorted in-row gram
    array — zero shuffles, runs inside whole-stage codegen directly on
    the parquet scan. The alternative (explode → two groupBys) would
    shuffle every 2-gram occurrence in the corpus; at 100 TB that is
    the difference between a map-only pass and the largest shuffle in
    the pipeline.
  - ``pack_sequences`` windows within (lang, source) strata, so the
    running-offset state never concentrates on one task; at real scale
    the stratum key is whatever the ingest already partitions by
    (shard file, crawl dump, date), keeping the sort partition-local.
  - ``contamination``'s eval side is tiny by construction (the held-out
    benchmark), so the gram join broadcasts — the corpus side is never
    shuffled, only scanned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from local_etl_spark.queries._util import t
from local_etl_spark.registry import query

PACK_BUDGET = 256  # tokens per packed training sequence
EVAL_MOD = 97  # doc_id % EVAL_MOD == 0 → held-out "benchmark" doc
CONTAM_N = 5  # n-gram size for contamination overlap

# sorted 2-gram array, built and folded entirely inside the row
_SORTED_2GRAMS = (
    "CASE WHEN size(_w) >= 2 THEN array_sort(transform("
    "  sequence(1, size(_w) - 1),"
    "  i -> concat_ws(' ', _w[i-1], _w[i])))"
    " ELSE array() END"
)

# single left-to-right fold over the sorted grams: tracks the current
# run of equal grams, accumulating (a) occurrences inside runs longer
# than 1 — the duplicated-2-gram mass — and (b) the longest run — the
# top-2-gram count. The finish lambda closes the trailing run.
_REP_FOLD = """
aggregate(
  _g,
  named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'dup', 0L, 'top', 0L),
  (a, x) -> IF(x <=> a.prev,
      named_struct('prev', x, 'run', a.run + 1L, 'dup', a.dup, 'top', a.top),
      named_struct('prev', x, 'run', 1L,
                   'dup', a.dup + IF(a.run > 1L, a.run, 0L),
                   'top', greatest(a.top, a.run))),
  a -> named_struct('dup', a.dup + IF(a.run > 1L, a.run, 0L),
                    'top', greatest(a.top, a.run))
)
"""


@query(
    "llm_repetition",
    family="llm",
    oracle="""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    g AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(2, len(ws)),
                      i -> ws[i-1] || ' ' || ws[i])) AS gram
        FROM w
    ),
    c AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2),
    p AS (
        SELECT doc_id,
               sum(cnt) AS n,
               sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup,
               max(cnt) AS top
        FROM c GROUP BY 1
    )
    SELECT d.doc_id,
           round(coalesce(p.dup * 1.0 / p.n, 0.0), 6) AS dup_2gram_frac,
           round(coalesce(p.top * 1.0 / p.n, 0.0), 6) AS top_2gram_frac
    FROM documents d LEFT JOIN p USING (doc_id)
    """,
)
def llm_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document.

    ``dup_2gram_frac``: fraction of 2-gram occurrences that belong to a
    2-gram appearing more than once; ``top_2gram_frac``: share of the
    most frequent 2-gram. Both are the standard repetition filters
    applied before training (Rae et al., Gopher §A1.1).

    Spark-first shape: the grams are sorted and folded IN-ROW (one
    ``aggregate`` over an ``array_sort``), so the whole operator is a
    map-only projection — no explode, no shuffle, nothing leaves the
    scan stage. The DuckDB oracle computes the same counts relationally
    (unnest + two GROUP BYs), which is exactly the shuffle this shape
    avoids.
    """
    folded = (
        t(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("_w"))
        .select("doc_id", F.expr(_SORTED_2GRAMS).alias("_g"))
        .select("doc_id", F.size("_g").alias("_n"), F.expr(_REP_FOLD).alias("_f"))
    )
    n = F.col("_n")
    frac = lambda c: F.round(  # noqa: E731
        F.when(n == 0, F.lit(0.0)).otherwise(c / n), 6
    )
    return folded.select(
        "doc_id",
        frac(F.col("_f.dup")).alias("dup_2gram_frac"),
        frac(F.col("_f.top")).alias("top_2gram_frac"),
    )


@query(
    "llm_pack_sequences",
    family="llm",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, lang, source,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT *,
               -- CAST: DuckDB windowed sum(BIGINT) is HUGEINT → pandas
               -- float64 → driver hash mismatch vs Spark's BIGINT.
               CAST(sum(n_tokens) OVER (
                   PARTITION BY lang, source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_tokens AS BIGINT) AS t_offset
        FROM tok
    )
    SELECT doc_id, lang, source, n_tokens, t_offset,
           CAST(t_offset // {PACK_BUDGET} AS BIGINT) AS seq_id
    FROM c
    """,
)
def llm_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing (concat-and-chunk assignment).

    Documents are laid out deterministically (by doc_id) into a
    concatenated token stream per (lang, source) stratum; each doc is
    assigned the packed training sequence its first token lands in
    (``seq_id`` = offset // budget). This is the pack-and-split scheme
    used to assemble fixed-length pretraining batches without padding
    waste.

    Scale shape: the running sum is a window WITHIN the stratum — state
    is partition-local, never a global single-task sort. At 100 TB the
    stratum is the ingest shard, so packing parallelizes with the data
    and the only movement is the hash exchange onto strata.
    """
    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang", "source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    offset = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("t_offset")
    return docs.select("doc_id", "lang", "source", "n_tokens", offset).select(
        "*", F.expr(f"t_offset DIV {PACK_BUDGET}").alias("seq_id")
    )


def bfd_pack(sizes: list[tuple[int, int]], budget: int) -> dict[int, int]:
    """Best-fit-decreasing bin packing, fully deterministic: docs sorted
    by (n_tokens DESC, doc_id ASC); each goes to the open bin with the
    SMALLEST remaining capacity that still fits (ties → lowest bin id,
    via the sorted (remaining, bin_id) order), else opens a new bin.
    Docs longer than the budget get their own bin. O(n log n) via
    bisect. Returns {doc_id: bin_id}. Module-level and pure so the
    pytest ground truth replays the EXACT same function driver-side.
    """
    import bisect

    order = sorted(sizes, key=lambda p: (-p[1], p[0]))
    open_bins: list[tuple[int, int]] = []  # (remaining, bin_id) sorted
    assign: dict[int, int] = {}
    n_bins = 0
    for doc_id, n in order:
        i = bisect.bisect_left(open_bins, (n, -1))
        if n <= budget and i < len(open_bins):
            rem, b = open_bins.pop(i)
            assign[doc_id] = b
            rem -= n
            if rem > 0:
                bisect.insort(open_bins, (rem, b))
        else:
            assign[doc_id] = n_bins
            rem = budget - n
            if rem > 0:
                bisect.insort(open_bins, (rem, n_bins))
            n_bins += 1
    return assign


# LIST-MACHINE replay of best-fit-decreasing (rows-only→SQL conversion
# #10, round 11): BFD is an INTEGER greedy, so unlike the float folds
# there is no arithmetic subtlety at all — the machine just has to
# reproduce bfd_pack's exact choice rule: items sorted (n DESC, d ASC);
# per item the OPEN bin with the smallest (remaining, bin_id) that
# fits (list_sort(fits)[1] ≡ the bisect_left scan), else a new bin
# numbered by opening order; zero-remaining bins close. One machine
# row per (lang, source) stratum evolves through the recursion — the
# multi-row twin of the graph_coreness single-row machine; depth =
# max stratum size (≤ ~112 on shipped corpora).
_BFD_ORACLE = f"""
WITH RECURSIVE docs AS MATERIALIZED (
    SELECT doc_id, lang, source,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
    FROM documents
),
init AS (
    SELECT lang, source, 0 AS idx,
           list({{'d': doc_id, 'n': n_tokens}}
                ORDER BY n_tokens DESC, doc_id) AS items,
           CAST([] AS STRUCT(rem INT, bid BIGINT)[]) AS bins,
           CAST([] AS STRUCT(d BIGINT, s BIGINT)[]) AS assigns,
           CAST(0 AS BIGINT) AS nb
    FROM docs GROUP BY lang, source
),
pack AS (
    SELECT lang, source, idx, items, bins, assigns, nb FROM init
    UNION ALL
    SELECT lang, source, idx + 1, items,
           CASE WHEN hit THEN
               list_filter(bins, x -> struct_extract(x, 'bid')
                                   <> struct_extract(pick, 'bid'))
               || CASE WHEN struct_extract(pick, 'rem') - n > 0
                       THEN [{{'rem': struct_extract(pick, 'rem') - n,
                              'bid': struct_extract(pick, 'bid')}}]
                       ELSE CAST([] AS STRUCT(rem INT, bid BIGINT)[]) END
           ELSE
               bins || CASE WHEN {PACK_BUDGET} - n > 0
                            THEN [{{'rem': {PACK_BUDGET} - n, 'bid': nb}}]
                            ELSE CAST([] AS STRUCT(rem INT,
                                                   bid BIGINT)[]) END
           END AS bins,
           assigns || [{{'d': d,
                        's': CASE WHEN hit
                             THEN struct_extract(pick, 'bid')
                             ELSE nb END}}],
           CASE WHEN hit THEN nb ELSE nb + 1 END AS nb
    FROM (
        SELECT lang, source, idx, items, bins, assigns, nb, d, n,
               list_sort(list_filter(bins,
                   b -> struct_extract(b, 'rem') >= n))[1] AS pick,
               (n <= {PACK_BUDGET} AND len(list_filter(bins,
                   b -> struct_extract(b, 'rem') >= n)) > 0) AS hit
        FROM (
            SELECT lang, source, idx, items, bins, assigns, nb,
                   struct_extract(items[idx + 1], 'd') AS d,
                   struct_extract(items[idx + 1], 'n') AS n
            FROM pack WHERE idx < len(items)
        )
    )
),
final AS (
    SELECT lang, source, assigns, nb FROM pack WHERE idx = len(items)
),
asg AS (
    SELECT f.lang, f.source, f.nb,
           struct_extract(u, 'd') AS doc_id,
           struct_extract(u, 's') AS seq_id
    FROM final f, LATERAL unnest(f.assigns) AS t(u)
),
eff AS (
    SELECT a.lang, a.source, a.nb,
           sum(least(CAST(d.n_tokens AS BIGINT), {PACK_BUDGET})) AS filled
    FROM asg a JOIN docs d ON d.doc_id = a.doc_id
    GROUP BY a.lang, a.source, a.nb
)
SELECT d.doc_id, d.lang, d.source, d.n_tokens,
       a.seq_id,
       CAST(e.filled AS DOUBLE) / (e.nb * {PACK_BUDGET}) AS efficiency
FROM docs d
JOIN asg a ON a.doc_id = d.doc_id
JOIN eff e ON e.lang = d.lang AND e.source = d.source
"""


@query("llm_pack_bfd", family="llm", oracle=_BFD_ORACLE)
def llm_pack_bfd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-fit-decreasing sequence packing — the production upgrade
    over llm_pack_sequences' concat-and-chunk: documents are never
    split across training sequences (concat-and-chunk cuts ~1 doc per
    boundary), and BFD's waste is provably ≤ 11/9·OPT+1 bins where
    first-fit layout can leave large holes. Per doc: its packed bin and
    the stratum's packing efficiency witness (filled token fraction
    over all its bins, counting oversized docs at the budget cap).

    Distribution contract: packing runs independently per (lang,
    source) stratum — at 100 TB the stratum is the ingest shard, so
    each applyInPandas group is one shard's model-sized doc-length
    table (ids + lengths only, never text) and the sequential BFD loop
    (inherently order-dependent, the reason this is Python) runs once
    per shard in parallel. Few large groups — the regime where
    per-group pandas overhead amortizes (the r5 applyInPandas lesson
    inverted). The two failure regimes of that assumption, and the
    rewires: if strata COUNT explodes (fine-grained keys → millions of
    tiny groups) the ~2 ms/group pandas overhead dominates — re-key to
    coarser shards (hash lang‖source into N buckets) before packing;
    if one stratum's (doc_id, n_tokens) table outgrows a single
    executor (≳10⁸ docs/stratum) BFD must go hierarchical — pack
    fixed-size doc blocks, then pack the residual bins — since the
    loop is sequential per group by construction. Rows-only for the
    driver (BFD is not SQL-expressible);
    pytest replays bfd_pack driver-side and checks exact equality plus
    the no-overflow and efficiency-dominates-chunk-layout invariants.
    """
    import pandas as pd  # noqa: F401 (executors re-import the module)

    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        F.size(F.split("text", " ")).alias("n_tokens"),
    )

    # budget binds via the factory's default arg (executor re-import
    # gotcha); a 2-arg applyInPandas fn would be called as (key, pdf)
    def make_pack(budget=PACK_BUDGET):
        def pack_stratum(pdf):
            import pandas as pd  # noqa: F401

            assign = bfd_pack(
                list(zip(pdf["doc_id"], (int(x) for x in pdf["n_tokens"]))),
                budget,
            )
            out = pdf.copy()
            out["seq_id"] = out["doc_id"].map(assign)
            n_bins = int(out["seq_id"].max()) + 1 if len(out) else 0
            filled = int(out["n_tokens"].clip(upper=budget).sum())
            # RAW double division, no rounding: with a power-of-two
            # budget the ratio lands on exact 6-dp half-ties
            # constantly, where Python round (banker's) and SQL round
            # (half-away) DIVERGE — the bare int/int division is
            # bit-identical in every engine (round 11, found by the
            # oracle conversion)
            out["efficiency"] = (
                filled / (n_bins * budget) if n_bins else 0.0
            )
            return out

        return pack_stratum

    pack_stratum = make_pack()

    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_tokens", T.IntegerType()),
            T.StructField("seq_id", T.LongType()),
            T.StructField("efficiency", T.DoubleType()),
        ]
    )
    return docs.groupBy("lang", "source").applyInPandas(pack_stratum, schema)


_CONTAM_WORDS = ", ".join(f"_w[i-{CONTAM_N - 1 - k}]" for k in range(CONTAM_N))
# DuckDB lists are 1-based, so the window is ws[i-(n-1)] .. ws[i] with i
# running from n to len(ws)
_CONTAM_DUCK_WORDS = " || ' ' || ".join(
    f"ws[i-{CONTAM_N - 1 - k}]" for k in range(CONTAM_N)
)
_CONTAM_GRAMS = (
    f"CASE WHEN size(_w) >= {CONTAM_N} THEN array_distinct(transform("
    f"  sequence({CONTAM_N} - 1, size(_w) - 1),"
    f"  i -> concat_ws(' ', {_CONTAM_WORDS})))"
    " ELSE array() END"
)


def _contam_grams(docs: DataFrame) -> DataFrame:
    # persist-before-explode pattern (see llm_dedup.py): Generate would
    # otherwise re-evaluate the gram-array expression per output row
    return (
        docs.select("doc_id", F.split("text", " ").alias("_w"))
        .select("doc_id", F.expr(_CONTAM_GRAMS).alias("_g"))
    )


@query(
    "llm_contamination",
    family="llm",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    g AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   generate_series({CONTAM_N}, len(ws)),
                   i -> {_CONTAM_DUCK_WORDS}))) AS gram
        FROM w
    ),
    e AS (SELECT doc_id AS eval_doc_id, gram FROM g
          WHERE doc_id % {EVAL_MOD} = 0),
    c AS (SELECT doc_id, gram FROM g WHERE doc_id % {EVAL_MOD} <> 0)
    SELECT c.doc_id, e.eval_doc_id, count(*) AS n_shared
    FROM c JOIN e USING (gram)
    GROUP BY 1, 2
    """,
)
def llm_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set contamination audit: distinct 5-gram overlap counts
    between every corpus document and every held-out benchmark document
    (here: doc_id % 97 == 0 stands in for the benchmark set).

    Scale shape: the benchmark side is small by construction, so its
    gram postings broadcast; the corpus side streams through one
    map-side hash join — the 100 TB corpus is scanned once and never
    shuffled. Output is only the contaminated (doc, eval_doc) pairs.
    """
    grams = _contam_grams(t(spark, sf_dir, "documents")).persist()
    exploded = grams.select("doc_id", F.explode("_g").alias("gram"))
    eval_g = (
        exploded.filter(F.col("doc_id") % EVAL_MOD == 0)
        .withColumnRenamed("doc_id", "eval_doc_id")
    )
    corp_g = exploded.filter(F.col("doc_id") % EVAL_MOD != 0)
    return (
        corp_g.join(F.broadcast(eval_g), "gram")
        .groupBy("doc_id", "eval_doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


@query(
    "llm_dedup_norm",
    family="llm",
    oracle="""
    WITH n AS (
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(lower(text),
                    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
        FROM documents
    )
    SELECT sha256(norm) AS norm_hash, min(doc_id) AS keep_id,
           count(*) AS n_copies
    FROM n GROUP BY norm
    """,
)
def llm_dedup_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-then-exact dedup (the CCNet/Dolma "fuzzy exact"
    step): lowercase, strip non-alphanumerics, collapse whitespace,
    then hash-group. Catches trivially-reformatted copies that byte
    dedup misses, at byte-dedup cost — one hash shuffle, and at 100 TB
    the shuffle key is the 32-byte digest, never the document."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return (
        t(spark, sf_dir, "documents")
        .select("doc_id", norm.alias("norm"))
        .groupBy("norm")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
        .select(F.sha2("norm", 256).alias("norm_hash"), "keep_id", "n_copies")
    )


# composite quality-filter thresholds (corpus-calibrated so the verdict
# actually splits: sf0.01 word counts span 10-99, dup fractions 0-0.27)
MIN_WORDS = 25
MAX_DUP_FRAC = 0.12
MAX_TOP_FRAC = 0.08


@query(
    "llm_filter_pipeline",
    family="llm",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    g AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(2, len(ws)),
                      i -> ws[i-1] || ' ' || ws[i])) AS gram
        FROM w
    ),
    c AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2),
    p AS (
        SELECT doc_id, sum(cnt) AS n,
               sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup,
               max(cnt) AS top
        FROM c GROUP BY 1
    ),
    f AS (
        SELECT w.doc_id, len(ws) AS n_words,
               coalesce(p.dup * 1.0 / p.n, 0.0) AS dup_frac,
               coalesce(p.top * 1.0 / p.n, 0.0) AS top_frac
        FROM w LEFT JOIN p USING (doc_id)
    )
    SELECT doc_id,
           coalesce(array_to_string(list_filter([
               CASE WHEN n_words < {MIN_WORDS} THEN 'too_short' END,
               CASE WHEN dup_frac > {MAX_DUP_FRAC} THEN 'repetitive' END,
               CASE WHEN top_frac > {MAX_TOP_FRAC} THEN 'top_heavy' END
           ], x -> x IS NOT NULL), '|'), '') AS reasons,
           (n_words >= {MIN_WORDS} AND dup_frac <= {MAX_DUP_FRAC}
            AND top_frac <= {MAX_TOP_FRAC}) AS keep
    FROM f
    """,
)
def llm_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality filter — the decision step that consumes the
    repetition/length signals: per doc, a keep verdict plus the list of
    violated rules (the audit trail a curation pipeline keeps so
    filtered mass is attributable per rule).

    Same in-row fold as llm_repetition, so the whole filter — signals,
    verdict, reasons — is still a map-only projection over the scan:
    filtering 100 TB shuffles nothing.
    """
    folded = (
        t(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("_w"))
        .select(
            "doc_id",
            F.size("_w").alias("n_words"),
            F.expr(_SORTED_2GRAMS).alias("_g"),
        )
        .select(
            "doc_id",
            "n_words",
            F.size("_g").alias("_n"),
            F.expr(_REP_FOLD).alias("_f"),
        )
    )
    n = F.col("_n")
    dup_frac = F.when(n == 0, F.lit(0.0)).otherwise(F.col("_f.dup") / n)
    top_frac = F.when(n == 0, F.lit(0.0)).otherwise(F.col("_f.top") / n)
    staged = folded.select(
        "doc_id",
        "n_words",
        dup_frac.alias("_dup_frac"),
        top_frac.alias("_top_frac"),
    )
    rules = F.array(
        F.when(F.col("n_words") < MIN_WORDS, "too_short"),
        F.when(F.col("_dup_frac") > MAX_DUP_FRAC, "repetitive"),
        F.when(F.col("_top_frac") > MAX_TOP_FRAC, "top_heavy"),
    )
    return staged.select(
        "doc_id",
        F.array_join(F.filter(rules, lambda x: x.isNotNull()), "|").alias("reasons"),
        (
            (F.col("n_words") >= MIN_WORDS)
            & (F.col("_dup_frac") <= MAX_DUP_FRAC)
            & (F.col("_top_frac") <= MAX_TOP_FRAC)
        ).alias("keep"),
    )


@query(
    "llm_eval_coverage",
    family="llm",
    oracle="""
    WITH train AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
    eval_ AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
    tb AS (
        SELECT DISTINCT ws[i] || ' ' || ws[i+1] AS bigram
        FROM (SELECT string_split(text, ' ') AS ws FROM train),
             unnest(generate_series(1, len(ws) - 1)) AS t(i)
        WHERE len(ws) >= 2
    ),
    eb AS (
        SELECT doc_id, ws[i] || ' ' || ws[i+1] AS bigram
        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM eval_),
             unnest(generate_series(1, len(ws) - 1)) AS t(i)
        WHERE len(ws) >= 2
    ),
    per_doc AS (
        SELECT eb.doc_id,
               count(*) AS n_bigrams,
               count(tb.bigram) AS n_covered
        FROM eb LEFT JOIN tb ON tb.bigram = eb.bigram
        GROUP BY eb.doc_id
    )
    SELECT doc_id, n_bigrams, n_covered,
           n_covered * 1.0 / n_bigrams AS coverage
    FROM per_doc
    """,
)
def llm_eval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set n-gram coverage: for each held-out document (every
    10th doc), the fraction of its bigrams that appear ANYWHERE in the
    training split — the aggregate counterpart of llm_contamination
    (which flags individual leaked spans): high coverage means the
    eval set does not measure generalization; near-total coverage
    flags a split leak. Bigram membership is exact (no sketch), counts
    are integers, the ratio divides two exact longs.

    Scale: the train side reduces to DISTINCT bigrams before the join
    (vocabulary-sized, not corpus-sized); the eval side is the small
    split. The join key is the bigram string here for oracle
    readability — xxhash64 it at 100 TB (llm_dedup_ngram's trick)
    to shuffle 8-byte keys.
    """
    d = t(spark, sf_dir, "documents")
    train = d.filter(F.col("doc_id") % 10 != 0)
    ev = d.filter(F.col("doc_id") % 10 == 0)

    def bigrams(df, with_doc):
        staged = (
            df.select("doc_id", F.split("text", " ").alias("ws"))
            .filter(F.size("ws") >= 2)
            .persist()  # Generate re-evaluation gotcha (llm_dedup.py)
        )
        ex = staged.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws) - 1),"
                    " i -> concat(ws[i-1], ' ', ws[i]))"
                )
            ).alias("bigram"),
        )
        return ex if with_doc else ex.select("bigram").distinct()

    tb = bigrams(train, with_doc=False).withColumn("hit", F.lit(1))
    eb = bigrams(ev, with_doc=True)
    per_doc = (
        eb.join(tb, "bigram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.count("hit").alias("n_covered"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        "n_covered",
        (F.col("n_covered") * F.lit(1.0) / F.col("n_bigrams")).alias("coverage"),
    )
