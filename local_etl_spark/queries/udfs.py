"""UDF / UDAF / UDTF surface (SURVEY.md §2.4-K).

The engine's rule is expressions-first (UDFs are the slow path); this
module exists to prove the THREE Python extension points work and to
pin their semantics against expression/SQL oracles:

  udf_scalar   Arrow-vectorized pandas_udf — the reference's R12
               job-fix in literal Python, checked equal to the
               expression version (etl/transforms.fix_job)
  udf_grouped  applyInPandas grouped-map — per-group min-max scaling
               (chosen over z-score deliberately: min/max/x are exact
               doubles, so the result is bit-identical to the SQL
               window oracle; mean/std would be summation-order-noisy)
  udf_table    UDTF — one doc row → one row per 10-word chunk

Scale notes: pandas_udf/applyInPandas move data Python-side through
Arrow once per batch — 10-100× over row-at-a-time pickling, still ~2-5×
slower than staying in codegen. applyInPandas shuffles by the group key
and materializes EACH GROUP as one pandas frame: fine for bounded
groups (returnflag has 3), a skew hazard for unbounded ones — the
min-max example would be a window expression in production.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from local_etl_spark.queries._util import t
from local_etl_spark.registry import query

# NOTE: UDF objects are created INSIDE the query functions. A
# module-level @pandas_udf would be re-evaluated when executors unpickle
# by module reference, and UDF construction needs a live session
# (SESSION_OR_CONTEXT_NOT_EXISTS on the worker). Locally-defined
# functions are pickled by value instead — no worker-side import.


def _fix_job_py(j: str | None) -> str | None:
    """The reference's fix_job_field (main.py:118-124) verbatim, with
    the engine's split-limit-2 divergence — the executable spec the
    expression version is property-tested against, here as UDF body."""
    if j is None or "," not in j:
        return j
    general, spec = j.split(",", 1)
    spec = spec.lstrip()
    return f"{spec} {general}".capitalize()


@query(
    "udf_scalar",
    family="udf",
    oracle="""
    WITH j AS (
      SELECT p_partkey, CASE WHEN p_partkey % 3 = 0
                             THEN p_type || ', ' || p_brand
                             ELSE p_type END AS job
      FROM part
    ), s AS (
      SELECT p_partkey, job,
             concat_ws(' ',
                       regexp_replace(substr(job, strpos(job, ',') + 1), '^\\s+', ''),
                       substr(job, 1, strpos(job, ',') - 1)) AS reordered
      FROM j
    )
    SELECT p_partkey AS partkey,
           CASE WHEN contains(job, ',')
                THEN upper(substr(reordered, 1, 1)) || lower(substr(reordered, 2))
                ELSE job END AS fixed_job
    FROM s
    """,
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas UDF vs the expression oracle: same rows as etl_fix_job,
    computed by the Arrow-batched Python path instead of codegen."""
    from pyspark.sql.functions import pandas_udf

    spec = _fix_job_py

    @pandas_udf("string")
    def fix_job_udf(job: pd.Series) -> pd.Series:
        return job.map(spec)

    p = t(spark, sf_dir, "part")
    job = F.when(
        F.col("p_partkey") % 3 == 0,
        F.concat(F.col("p_type"), F.lit(", "), F.col("p_brand")),
    ).otherwise(F.col("p_type"))
    return p.select(
        F.col("p_partkey").alias("partkey"),
        fix_job_udf(job).alias("fixed_job"),
    )


@query(
    "udf_grouped",
    family="udf",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag,
           round((l_quantity - min(l_quantity) OVER w)
                 / (max(l_quantity) OVER w - min(l_quantity) OVER w),
                 6) AS scaled
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag)
    """,
)
def udf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas per-group min-max scaling ≡ SQL window oracle."""

    def _minmax_scale(pdf: pd.DataFrame) -> pd.DataFrame:
        lo, hi = pdf["l_quantity"].min(), pdf["l_quantity"].max()
        span = hi - lo
        pdf = pdf.copy()
        pdf["scaled"] = ((pdf["l_quantity"] - lo) / span if span else 0.0)
        pdf["scaled"] = pdf["scaled"].round(6)
        return pdf[["l_orderkey", "l_linenumber", "l_returnflag", "scaled"]]

    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    out_schema = (
        "l_orderkey long, l_linenumber long, l_returnflag string, scaled double"
    )
    return li.groupBy("l_returnflag").applyInPandas(
        _minmax_scale, schema=out_schema
    )


CHUNK = 10


@query(
    "udf_table",
    family="udf",
    oracle=f"""
    SELECT doc_id, i AS chunk_idx,
           array_to_string(ws[i * {CHUNK} + 1 : (i + 1) * {CHUNK}], ' ')
               AS chunk
    FROM (
        SELECT doc_id, ws,
               unnest(generate_series(0, (len(ws) - 1) // {CHUNK})) AS i
        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    )
    """,
)
def udf_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF: split one document row into one row per 10-word chunk.

    Spark 4's @udtf with lateral join — the table-function extension
    point itself is the operator under test (chunking is also
    expressible as explode(transform(...)); the oracle pins equality).
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk string")
    class ChunkDoc:
        def eval(self, text: str):
            words = text.split(" ")
            for i in range(0, len(words), CHUNK):
                yield i // CHUNK, " ".join(words[i : i + CHUNK])

    docs = t(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("udtf_docs_src")
    spark.udtf.register("chunk_doc", ChunkDoc)
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk
        FROM udtf_docs_src d, LATERAL chunk_doc(d.text) c
        """
    )


@query(
    "udf_arrow",
    family="udf",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_py,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens_py
    FROM documents
    """,
)
def udf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the zero-copy batch extension point — RecordBatches
    reach Python as raw Arrow (no pandas conversion at all), the
    lowest-overhead Python hook Spark has. The kernel recomputes char
    and whitespace-token counts with pyarrow.compute (vectorized C++),
    and the SQL oracle pins them to the JVM expressions — proving the
    Arrow path is lossless. Use this over mapInPandas when the kernel
    speaks Arrow natively (tokenizers, Arrow-native ML preprocessing);
    per-batch overhead is pure function dispatch."""

    def count_batches(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            text = batch.column(batch.schema.get_field_index("text"))
            n_chars = pc.utf8_length(text)
            n_tokens = pc.list_value_length(pc.split_pattern(text, " "))
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(batch.schema.get_field_index("doc_id")),
                    pc.cast(n_chars, pa.int64()),
                    pc.cast(n_tokens, pa.int64()),
                ],
                names=["doc_id", "n_chars_py", "n_tokens_py"],
            )

    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInArrow(
        count_batches, "doc_id long, n_chars_py long, n_tokens_py long"
    )


@query(
    "udf_cogrouped",
    family="udf",
    oracle="""
    WITH c AS (
        SELECT user_id, count(*) AS n_clicks FROM events
        WHERE event_type = 'click' GROUP BY user_id
    ),
    p AS (
        SELECT user_id, count(*) AS n_purchases FROM events
        WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT coalesce(c.user_id, p.user_id) AS user_id,
           CAST(coalesce(n_clicks, 0) AS BIGINT) AS n_clicks,
           CAST(coalesce(n_purchases, 0) AS BIGINT) AS n_purchases,
           CASE WHEN coalesce(n_clicks, 0) > 0
                THEN round(coalesce(n_purchases, 0) * 1.0 / n_clicks, 6)
           END AS conversion
    FROM c FULL JOIN p ON c.user_id = p.user_id
    """,
)
def udf_cogrouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped pandas map (`groupby().cogroup().applyInPandas`) — the
    two-sided Arrow surface: each key's click rows AND purchase rows
    arrive as a pandas DataFrame pair in one Python call, the shape for
    custom per-key alignment logic no single-input UDF can express
    (here: conversion stats; in production: per-key reconciliation,
    feature joins with bespoke matching). Keys present on only one side
    arrive with an empty partner frame — the full-outer semantics the
    oracle mirrors relationally. Both sides co-shuffle on the key, one
    Python round-trip per key group.
    """

    def stats(clicks: "pd.DataFrame", purchases: "pd.DataFrame") -> "pd.DataFrame":
        key_src = clicks if len(clicks) else purchases
        uid = int(key_src["user_id"].iloc[0])
        n_c, n_p = len(clicks), len(purchases)
        conv = round(n_p * 1.0 / n_c, 6) if n_c > 0 else None
        return pd.DataFrame(
            {
                "user_id": [uid],
                "n_clicks": [n_c],
                "n_purchases": [n_p],
                "conversion": [conv],
            }
        )

    e = t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "event_id")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id"
    )
    return (
        clicks.groupby("user_id")
        .cogroup(purchases.groupby("user_id"))
        .applyInPandas(
            stats,
            "user_id long, n_clicks long, n_purchases long, conversion double",
        )
    )


@query(
    "api_pandas_on_spark",
    family="udf",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lang
    """,
)
def api_pandas_on_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pandas-API-on-Spark front door (`df.pandas_api()`, the
    Koalas lineage): a pandas-shaped groupby/agg that PLANS as ordinary
    Catalyst operators — the migration path for pandas codebases that
    outgrew one machine. The ps ops here (groupby, count/sum, concat,
    reset_index) compile to the same partial+final hash aggregate the
    oracle's GROUP BY runs; `to_spark()` hands the logical plan back
    with zero materialization. Integer-exact aggregates keep it
    SQL-oracled.
    """
    import pyspark.pandas as ps_api

    psdf = (
        t(spark, sf_dir, "documents").select("lang", "n_chars").pandas_api()
    )
    g = psdf.groupby("lang")["n_chars"]
    stats = ps_api.concat(
        [g.count().rename("n_docs"), g.sum().rename("total_chars")], axis=1
    ).reset_index()
    return stats.to_spark().select(
        "lang",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("total_chars").cast("bigint").alias("total_chars"),
    )
