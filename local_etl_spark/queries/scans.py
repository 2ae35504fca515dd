"""Source/sink queries (SURVEY.md §2.4-B).

The reference's only source is a directory-of-JSON-files scan
(main.py:150-151,163-167) and its only sinks are CSV/error-log/quarantine
(main.py:156-161,34-56). The engine generalizes both ends: parquet /
JSON / CSV readers with explicit schemas, and partitioned columnar
sinks — the 100 TB path is parquet in, partition-pruned parquet out.

Round-trip strategy for the oracle: JSON/CSV scans materialize a
testdata table to a /tmp cache, read it back through the format under
test, and the oracle checks the *content* against the original parquet
view — so correctness covers the full write→read cycle without the
oracle needing to read the intermediate file.

Scale notes:
  - `scan_parquet` keeps selection declarative so Catalyst pushes the
    filter into the scan (`PushedFilters` in explain) and prunes to the
    two referenced columns (`ReadSchema`). At 100 TB this is the
    difference between reading 2 columns × matching row-groups and
    reading everything.
  - `sink_partitioned` writes `partitionBy(o_orderpriority)`; the
    read-back filter on the partition column is satisfied by directory
    pruning (zero data files of other partitions opened).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from local_etl_spark.queries._util import t
from local_etl_spark.registry import query

_CACHE_ROOT = os.path.join(tempfile.gettempdir(), "local_etl_spark_scan_cache")


def _cache_dir(sf_dir: str, name: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join(_CACHE_ROOT, tag, name)


def _materialize(df: DataFrame, path: str, fmt: str, **options) -> str:
    """Write ``df`` to ``path`` as ``fmt`` once (marker-gated, overwrite-safe)."""
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        df.write.mode("overwrite").options(**options).format(fmt).save(path)
    return path


NATION_SCHEMA = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

SUPPLIER_SCHEMA = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)


@query(
    "scan_parquet",
    family="scans",
    oracle="""
    SELECT l_orderkey, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_extendedprice > 4000.0
    """,
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projecting parquet scan with pushed-down filter.

    Plan contract (asserted in tests/test_plan_shape.py): explain shows
    ``PushedFilters: [GreaterThanOrEqual(l_shipdate,...), ...]`` and a
    two-column ``ReadSchema`` — Catalyst, not the engine, does the work.
    """
    return (
        t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_extendedprice") > 4000.0)
        )
        .select("l_orderkey", "l_extendedprice")
    )


@query(
    "scan_json",
    family="scans",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
)
def scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines scan with explicit schema (no inference pass).

    Reference analog: R1/R2 directory JSON scan (main.py:150-172), there
    one pretty-printed document per file read with ``multiLine``; the
    engine's ETL pipeline (etl/pipeline.py) keeps that mode, while this
    query exercises the scale-friendly JSONL layout. Explicit schema
    matters at 100 TB: schema inference is a full extra pass over data.
    """
    path = _materialize(
        t(spark, sf_dir, "nation"), _cache_dir(sf_dir, "nation_json"), "json"
    )
    return spark.read.schema(NATION_SCHEMA).json(path).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


@query(
    "scan_csv",
    family="scans",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey,
           CAST(CAST(s_acctbal AS DECIMAL(18,6)) AS DOUBLE) AS s_acctbal
    FROM supplier
    """,
)
def scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV scan with explicit schema + header.

    Reference analog: the CSV *sink* (R14, main.py:156-161) — here the
    engine proves the reverse direction reads back losslessly. The
    acctbal double goes through a text round-trip, so both sides pin it
    to DECIMAL(18,6) (the testdata generates 2dp values; exact).
    """
    path = _materialize(
        t(spark, sf_dir, "supplier"),
        _cache_dir(sf_dir, "supplier_csv"),
        "csv",
        header="true",
    )
    df = spark.read.schema(SUPPLIER_SCHEMA).option("header", "true").csv(path)
    return df.select(
        "s_suppkey",
        "s_name",
        "s_nationkey",
        F.col("s_acctbal").cast("decimal(18,6)").cast("double").alias("s_acctbal"),
    )


@query(
    "scan_orc",
    family="scans",
    oracle="""
    SELECT p_brand, count(*) AS n, min(p_retailprice) AS min_price,
           max(p_retailprice) AS max_price
    FROM part
    WHERE p_size >= 25
    GROUP BY p_brand
    """,
)
def scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC write + read-back (Spark's second built-in columnar format).

    Same round-trip contract as scan_json/scan_csv: part goes to ORC
    once, is read back through the ORC reader (typed, vectorized, with
    predicate pushdown like parquet), and the aggregate is checked
    against the original parquet view — covering the full write→read
    cycle losslessly. min/max on raw doubles are order-independent, so
    no decimal discipline is needed here.
    """
    path = _materialize(
        t(spark, sf_dir, "part"), _cache_dir(sf_dir, "part_orc"), "orc"
    )
    return (
        spark.read.orc(path)
        .filter(F.col("p_size") >= 25)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n"),
            F.min("p_retailprice").alias("min_price"),
            F.max("p_retailprice").alias("max_price"),
        )
    )


@query(
    "sink_partitioned",
    family="scans",
    oracle="""
    SELECT o_orderpriority, count(*) AS n,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(28,6))
                AS DOUBLE) AS total
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned parquet sink + partition-pruned read-back.

    Writes orders partitioned by ``o_orderpriority``, reads it back, and
    aggregates only status-F rows. At scale the partition layout turns
    the common per-priority query into a directory prune; the read-back
    proves values and the partition column itself survive the cycle.
    """
    path = _cache_dir(sf_dir, "orders_by_priority")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        t(spark, sf_dir, "orders").write.mode("overwrite").partitionBy(
            "o_orderpriority"
        ).parquet(path)
    back = spark.read.parquet(path)
    return (
        back.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("decimal(28,6)")
            .cast("double")
            .alias("total"),
        )
    )


@query(
    "sink_compaction",
    family="scans",
    oracle="""
    SELECT event_type, count(*) AS n,
           min(event_id) AS min_id, max(event_id) AS max_id,
           CAST(sum(event_id) AS BIGINT) AS id_sum,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(28,6))
                AS DOUBLE) AS value_sum
    FROM events
    GROUP BY event_type
    """,
)
def sink_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction: a deliberately fragmented copy of events
    (64 splinter files — the shape a streaming sink or over-parallel
    job leaves behind) is rewritten into a handful of right-sized files,
    then read back and content-checked against the original. THE
    operational maintenance op of a 100 TB lake: many-small-files
    poisons scan planning (per-file open cost, §SCALE.4) and object-
    store listing; the compactor is a read → repartition(target) →
    write with NO logical transformation, so the oracle proves the
    rewrite is lossless. File-count reduction is pytest-asserted
    (tests/test_plan_shape.py::test_compaction_reduces_files)."""
    ev = t(spark, sf_dir, "events")
    frag = _materialize(
        ev.repartition(64), _cache_dir(sf_dir, "events_fragmented"), "parquet"
    )
    compacted = _materialize(
        spark.read.parquet(frag).coalesce(4),
        _cache_dir(sf_dir, "events_compacted"),
        "parquet",
    )
    from local_etl_spark.queries._util import dec, dsum

    return (
        spark.read.parquet(compacted)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("event_id").alias("min_id"),
            F.max("event_id").alias("max_id"),
            F.sum("event_id").alias("id_sum"),
            dsum(dec("value")).alias("value_sum"),
        )
    )


@query(
    "scan_text",
    family="scans",
    oracle="""
    SELECT doc_id, CAST(length(text) AS BIGINT) AS text_len, text
    FROM documents
    """,
)
def scan_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw text source round-trip: documents are landed as delimited
    plain-text lines (`df.write.text`), read back through the line
    reader (`spark.read.text` — the ingestion format of most raw web
    corpora), and re-parsed. Row-level oracle vs the parquet view
    proves the cycle is lossless. The text source splits by line, so
    at 100 TB the files are parallel-read like any splittable format."""
    d = t(spark, sf_dir, "documents")
    path = _materialize(
        d.select(
            F.concat(F.col("doc_id").cast("string"), F.lit("|"), F.col("text"))
            .alias("value")
        ),
        _cache_dir(sf_dir, "documents_text"),
        "text",
    )
    lines = spark.read.text(path)
    doc_id = F.split(F.col("value"), r"\|", 2).getItem(0).cast("long")
    text = F.split(F.col("value"), r"\|", 2).getItem(1)
    return lines.select(
        doc_id.alias("doc_id"),
        F.length(text).cast("long").alias("text_len"),
        text.alias("text"),
    )


@query(
    "sink_zorder",
    family="scans",
    oracle="""
    SELECT event_id, user_id, event_type,
           CAST(value AS DOUBLE) AS value
    FROM events
    """,
)
def sink_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustered rewrite (the OPTIMIZE ZORDER lake op): events
    are rewritten ordered by a bit-interleaved (user_id, time-bucket)
    key, so parquet row-group min/max stats become selective on BOTH
    dimensions at once — point/range reads on either column skip most
    files. The Z-key is pure bitwise codegen (16 bits per dimension
    interleaved); the clustered write is repartitionByRange + in-task
    sort, i.e. one range shuffle. The oracle proves the rewrite is
    content-lossless; file-level clustering is pytest-asserted
    (tests/test_plan_shape.py::test_zorder_clusters_files)."""
    ev = t(spark, sf_dir, "events")
    # range-normalize each dimension to 16 bits first (the production
    # Z-order: without min-max scaling the wider dimension's high bits
    # dominate the interleave and clustering degenerates to 1-D), then
    # bit-interleave. The min/max stats are a 1-row broadcast aggregate.
    hour = (F.unix_timestamp("ts") / 3600).cast("long")
    stats = ev.agg(
        F.min("user_id").alias("u_lo"),
        F.max("user_id").alias("u_hi"),
        F.min(hour).alias("h_lo"),
        F.max(hour).alias("h_hi"),
    )

    def scale16(col, lo, hi):
        span = F.greatest(F.col(hi) - F.col(lo) + 1, F.lit(1))
        return ((col - F.col(lo)) * 65536 / span).cast("long").bitwiseAND(
            F.lit(0xFFFF)
        )

    u = scale16(F.col("user_id"), "u_lo", "u_hi")
    h = scale16(hour, "h_lo", "h_hi")
    zkey = None
    for bit in range(16):
        u_bit = F.shiftright(u, bit).bitwiseAND(F.lit(1))
        h_bit = F.shiftright(h, bit).bitwiseAND(F.lit(1))
        pair = F.shiftleft(u_bit, 2 * bit + 1) + F.shiftleft(h_bit, 2 * bit)
        zkey = pair if zkey is None else zkey + pair
    path = _materialize(
        ev.join(F.broadcast(stats))
        .withColumn("_z", zkey)
        .repartitionByRange(8, "_z")
        .sortWithinPartitions("_z")
        .drop("u_lo", "u_hi", "h_lo", "h_hi"),
        _cache_dir(sf_dir, "events_zorder"),
        "parquet",
    )
    return spark.read.parquet(path).select(
        "event_id", "user_id", "event_type", F.col("value").cast("double").alias("value")
    )


@query(
    "scan_parquet_evolve",
    family="scans",
    oracle="""
    SELECT o_orderpriority, coalesce(o_orderstatus, 'UNKNOWN') AS status,
           count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS key_sum
    FROM (
      SELECT o_orderkey, o_orderpriority, NULL AS o_orderstatus
      FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
      UNION ALL
      SELECT o_orderkey, o_orderpriority, o_orderstatus
      FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    )
    GROUP BY 1, 2
    """,
)
def scan_parquet_evolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution scan: two parquet batches written under one
    dataset with DIFFERENT schemas (the later batch adds
    ``o_orderstatus`` — the additive-column evolution every long-lived
    lake accumulates), read back through ``mergeSchema`` so old files
    surface NULL for the new column. The oracle re-derives
    union-by-name semantics from the base table, so the check proves
    Spark's merged read equals the declarative spec.

    Scale note: mergeSchema reads every file footer at planning time —
    fine per-batch, expensive across millions of files; production
    lakes pin the merged schema in a metastore/table format and read
    WITHOUT mergeSchema. The operator demonstrates the semantics; the
    docs carry the deployment caveat.
    """
    orders = t(spark, sf_dir, "orders")
    cut = F.lit("1997-01-01").cast("timestamp")
    v1 = _materialize(
        orders.filter(F.col("o_orderdate") < cut).select(
            "o_orderkey", "o_orderpriority"
        ),
        _cache_dir(sf_dir, "orders_evolve/v1"),
        "parquet",
    )
    v2 = _materialize(
        orders.filter(F.col("o_orderdate") >= cut).select(
            "o_orderkey", "o_orderpriority", "o_orderstatus"
        ),
        _cache_dir(sf_dir, "orders_evolve/v2"),
        "parquet",
    )
    back = spark.read.option("mergeSchema", "true").parquet(v1, v2)
    return back.groupBy(
        "o_orderpriority",
        F.coalesce("o_orderstatus", F.lit("UNKNOWN")).alias("status"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_orderkey").alias("key_sum"),
    )


N_CORRUPT_LINES = 3


@query(
    "scan_csv_malformed",
    family="scans",
    oracle=f"""
    SELECT count(*) AS n_valid,
           CAST({N_CORRUPT_LINES} AS BIGINT) AS n_corrupt,
           CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
           count(DISTINCT n_regionkey) AS n_regions
    FROM nation
    """,
)
def scan_csv_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE CSV scan over a file with injected corrupt lines:
    malformed rows land in ``_corrupt_record`` (null data columns)
    instead of failing the scan — the ingestion posture any large
    pipeline needs (count + quarantine bad rows, never abort a 100 TB
    job for one truncated line). The output reconciles: valid rows
    equal the clean source exactly, corrupt count equals the injected
    line count.

    Same reader contract the reference needed for its corrupt-JSON
    files (main.py json.load uncaught crash — SURVEY §2.2 R1): the
    engine's declarative answer is mode=PERMISSIVE + corrupt-record
    routing rather than a per-file try/except.
    """
    clean = _materialize(
        t(spark, sf_dir, "nation"),
        _cache_dir(sf_dir, "nation_csv_malformed"),
        "csv",
        header="true",
    )
    bad_file = os.path.join(clean, "zz_corrupt.csv")
    if not os.path.exists(bad_file):
        with open(bad_file, "w") as f:
            f.write("n_nationkey,n_name,n_regionkey\n")
            f.write("not_an_int,BROKEN,also_bad\n")
            f.write('12,"unterminated quote,1\n')
            f.write("99,TOO,MANY,COLUMNS,HERE\n")
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(clean)
        .cache()  # SPARK-21610: corrupt-record column needs the raw row retained
    )
    bad = F.col("_corrupt_record").isNotNull()
    return df.agg(
        F.count(F.when(~bad, 1)).alias("n_valid"),
        F.count(F.when(bad, 1)).alias("n_corrupt"),
        F.sum(F.when(~bad, F.col("n_nationkey"))).alias("key_sum"),
        F.countDistinct(F.when(~bad, F.col("n_regionkey"))).alias("n_regions"),
    )


PYDS_N = 10_000
PYDS_PARTS = 8


def _make_pyds():
    """Spark 4 Python Data Source: a deterministic sensor-readings
    generator exercising the full custom-source contract (name /
    schema / reader / partition planning / per-partition iterators).
    Built lazily to keep pyspark.sql.datasource imports off module
    import time."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class _Reader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("n", PYDS_N))
            self.parts = int(options.get("parts", PYDS_PARTS))

        def partitions(self):
            return [InputPartition(i) for i in range(self.parts)]

        def read(self, partition):
            p = partition.value
            per = (self.n + self.parts - 1) // self.parts
            for i in range(p * per, min((p + 1) * per, self.n)):
                yield (i % 50, i, ((i * 7919) % 10007) / 100.0)

    class SyntheticReadings(DataSource):
        @classmethod
        def name(cls):
            return "synthetic_readings"

        def schema(self):
            return "sensor_id int, reading_idx bigint, value double"

        def reader(self, schema):
            return _Reader(self.options)

    return SyntheticReadings


@query(
    "scan_python_ds",
    family="scans",
    oracle=f"""
    WITH r AS (
        SELECT i AS reading_idx,
               CAST(i % 50 AS INT) AS sensor_id,
               ((i * 7919) % 10007) / 100.0 AS value
        FROM generate_series(0, {PYDS_N - 1}) AS t(i)
    )
    SELECT sensor_id, count(*) AS n,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(28,6))
                AS DOUBLE) AS total,
           min(reading_idx) AS first_idx, max(reading_idx) AS last_idx
    FROM r GROUP BY sensor_id
    """,
)
def scan_python_ds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom source via the Spark 4 Python Data Source API: the
    engine-extension point for systems with no built-in connector
    (internal services, bespoke formats). The source plans
    ``parts`` splits, each executor materializes its split from the
    generator — genuinely parallel, Arrow-batched back into the JVM.
    The deterministic arithmetic content is re-derived by the oracle
    from generate_series, so the check proves the whole custom-source
    read path (partition planning, per-partition iterators, type
    mapping) delivers exactly the declared rows.

    Scale note: a Python source pays one Python->Arrow hop at the scan
    edge — fine for sources whose bottleneck is the remote system, the
    wrong tool to re-implement parquet. That trade, not the row count,
    decides when to use this API.
    """
    if "synthetic_readings" not in getattr(spark, "_pyds_registered", set()):
        spark.dataSource.register(_make_pyds())
        reg = getattr(spark, "_pyds_registered", set())
        reg.add("synthetic_readings")
        spark._pyds_registered = reg
    df = (
        spark.read.format("synthetic_readings")
        .option("n", str(PYDS_N))
        .option("parts", str(PYDS_PARTS))
        .load()
    )
    return df.groupBy("sensor_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("decimal(28,6)")
        .cast("double")
        .alias("total"),
        F.min("reading_idx").alias("first_idx"),
        F.max("reading_idx").alias("last_idx"),
    )


_SKIP_REV = (
    "CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(28,6))"
    " AS DOUBLE)"
)


@query(
    "scan_skipping",
    family="scans",
    oracle=f"""
    SELECT CAST(extract(YEAR FROM l_shipdate) AS INT) AS ship_year,
           count(*) AS n, {_SKIP_REV} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      AND l_shipdate < TIMESTAMP '1999-01-01'
    GROUP BY 1
    """,
)
def scan_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-based file skipping (the Delta/Iceberg stats pattern on
    plain parquet): the sink writes lineitem RANGE-CLUSTERED by
    l_shipdate into k files and one aggregation pass builds a manifest
    of per-file (min, max) shipdate; at read time the predicate prunes
    the manifest FIRST and only overlapping files are read (residual
    filter still applied — pruning is an optimization, never a
    correctness dependency). Because the layout is range-clustered, a
    one-year predicate touches ~1/7 of the files; on unclustered data
    the same manifest prunes nothing — clustering is what MAKES stats
    skip (sink_zorder is the multi-dimensional version).

    At 100 TB the manifest (2 timestamps × file count) replaces
    footer-reads of every file with one tiny table lookup — this is
    exactly what table formats store in their metadata layer; the
    manifest here is derived once at write time and is itself a
    DataFrame (broadcastable, cacheable). The driver-side collect is
    the matching file PATH LIST (model-sized: k entries), never data.
    """
    path = _cache_dir(sf_dir, "lineitem_clustered")
    marker = os.path.join(path, "_SUCCESS")
    li = t(spark, sf_dir, "lineitem")
    if not os.path.exists(marker):
        # range-cluster by shipdate into 14 files (~6mo each)
        (
            li.repartitionByRange(14, "l_shipdate")
            .sortWithinPartitions("l_shipdate")
            .write.mode("overwrite")
            .parquet(path)
        )
    clustered = spark.read.parquet(path)
    manifest = (
        clustered.groupBy(F.input_file_name().alias("file"))
        .agg(F.min("l_shipdate").alias("lo"), F.max("l_shipdate").alias("hi"))
    )
    lo, hi = "1998-01-01", "1999-01-01"
    keep_files = [
        r["file"]
        for r in manifest.filter(
            (F.col("lo") < F.lit(hi).cast("timestamp"))
            & (F.col("hi") >= F.lit(lo).cast("timestamp"))
        ).collect()
    ]
    assert 0 < len(keep_files) < 14, "clustering should prune most files"
    pruned = spark.read.parquet(*keep_files)
    return (
        pruned.filter(
            (F.col("l_shipdate") >= F.lit(lo).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(hi).cast("timestamp"))
        )
        .groupBy(F.year("l_shipdate").cast("int").alias("ship_year"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
            .cast("decimal(28,6)")
            .cast("double")
            .alias("revenue"),
        )
    )


# sf-INDEPENDENT binary corpus: the oracle's read_blob glob is baked
# into static SQL, so the payload bytes must not depend on which sf_dir
# the engine ran at — files derive from doc ids alone.
_BINSCAN_DIR = os.path.join(tempfile.gettempdir(), "local_etl_spark_binscan")
_BINSCAN_DOCS = 40


def _write_binscan_corpus() -> str:
    """Write the deterministic real-media file corpus (PPM/WAV/Y4M via
    the multimodal generator) once; idempotent re-write if absent."""
    from local_etl_spark.multimodal.columns import _gen_payload

    os.makedirs(_BINSCAN_DIR, exist_ok=True)
    for doc_id in range(_BINSCAN_DOCS):
        path = os.path.join(_BINSCAN_DIR, f"doc{doc_id:05d}.bin")
        if not os.path.exists(path):
            _, payload = _gen_payload(doc_id, f"doc{doc_id}")
            with open(path, "wb") as fh:
                fh.write(payload)
    return _BINSCAN_DIR


# Written at import (= registration) time, not first engine run: a
# driver may evaluate the DuckDB oracle BEFORE the engine query on a
# fresh machine, and the oracle's read_blob glob must already see the
# corpus (40 tiny files, idempotent). Best-effort only (ADVICE r4): a
# read-only or full filesystem must not take down the whole registry —
# the in-function call in scan_binaryfile retries at first use, so only
# the binscan query (and its oracle-first-run convenience) degrades.
try:
    _write_binscan_corpus()
except OSError:
    pass


@query(
    "scan_binaryfile",
    family="scans",
    oracle=f"""
    SELECT parse_filename(filename) AS fname,
           CAST(size AS BIGINT) AS n_bytes,
           md5(to_base64(content)) AS payload_md5
    FROM read_blob('{_BINSCAN_DIR}/*.bin')
    """,
)
def scan_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-file binary ingestion (`binaryFile` source): the landing
    scan of every multimodal pipeline — media files become (path,
    length, content) rows with bytes intact, ready for the
    mapInPandas decode kernels (multimodal/columns.py). Content
    addressing via md5-over-base64, the one hash both engines compute
    identically on blobs. The corpus is the deterministic real-media
    fileset (PPM/WAV/Y4M), written sf-independently so the oracle's
    static glob always sees the same bytes. Scale: binaryFile is
    splittable per FILE (one task per file, never mid-file), so the
    partition count is the file count — compaction/packing (cf.
    sink_compaction) applies to blobs exactly as to parquet.
    """
    d = _write_binscan_corpus()
    df = spark.read.format("binaryFile").load(d)
    return df.select(
        F.element_at(F.split("path", "/"), -1).alias("fname"),
        F.length("content").cast("bigint").alias("n_bytes"),
        # Spark base64 MIME-wraps at 76 chars (RFC 2045); DuckDB
        # to_base64 never wraps — strip the CR/LF before hashing
        F.md5(F.regexp_replace(F.base64("content"), "[\\r\\n]", "")).alias(
            "payload_md5"
        ),
    )


@query(
    "sink_snapshot",
    family="scans",
    oracle="""
    SELECT 1 AS version, count(*) AS n_orders,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                AS DECIMAL(28,6)) AS DOUBLE) AS revenue
    FROM orders WHERE year(o_orderdate) = 1995
    UNION ALL
    SELECT 2, count(*),
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                AS DECIMAL(28,6)) AS DOUBLE)
    FROM orders WHERE year(o_orderdate) IN (1995, 1996)
    """,
)
def sink_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot versioning + time travel on plain parquet — the
    manifest pattern under Iceberg/Delta, re-implemented with files
    (the format jars are absent; cf. scan_skipping's min/max
    manifests). Version 1 lands the 1995 orders; version 2 APPENDS the
    1996 file and a new manifest LISTING both — readers of v1 keep a
    consistent view because manifests are immutable and data files are
    never rewritten (snapshot isolation by construction). The query
    time-travels to BOTH versions through their manifests and
    aggregates each state; the oracle recomputes both states from the
    source table, proving the versioned reads are lossless. Scale:
    manifest size = file count, commits are O(1) manifest writes —
    exactly why every lakehouse format works this way.
    """
    import json

    from local_etl_spark.queries._util import dec, dsum

    base = _cache_dir(sf_dir, "orders_snapshots")
    o = t(spark, sf_dir, "orders")
    f1 = _materialize(
        o.filter(F.year("o_orderdate") == 1995),
        os.path.join(base, "data", "f1"),
        "parquet",
    )
    f2 = _materialize(
        o.filter(F.year("o_orderdate") == 1996),
        os.path.join(base, "data", "f2"),
        "parquet",
    )
    manifests = {1: [f1], 2: [f1, f2]}
    for v, files in manifests.items():
        mpath = os.path.join(base, f"manifest-v{v}.json")
        if not os.path.exists(mpath):
            with open(mpath, "w") as fh:
                json.dump({"version": v, "files": files}, fh)

    out = None
    for v in (1, 2):
        with open(os.path.join(base, f"manifest-v{v}.json")) as fh:
            snap_files = json.load(fh)["files"]
        state = spark.read.parquet(*snap_files)
        agg = state.agg(
            F.lit(v).alias("version"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum(dec("o_totalprice")).alias("revenue"),
        ).select("version", "n_orders", "revenue")
        out = agg if out is None else out.unionAll(agg)
    return out


def _make_pyds_sink():
    """Factory for the Python Data Source SINK (classes built here so
    pickling ships them by value to executors; cf. scan_python_ds)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceWriter,
        WriterCommitMessage,
    )

    class _Writer(DataSourceWriter):
        def __init__(self, options):
            self.path = options["path"]

        def write(self, iterator):
            import json as _json
            import os as _os

            from pyspark import TaskContext

            # partition-id filenames make task retries idempotent
            # (a rerun overwrites its own file, never duplicates)
            pid = TaskContext.get().partitionId()
            _os.makedirs(self.path, exist_ok=True)
            n = 0
            with open(
                _os.path.join(self.path, f"part-{pid:05d}.jsonl"), "w"
            ) as fh:
                for row in iterator:
                    fh.write(_json.dumps(row.asDict()) + "\n")
                    n += 1
            return WriterCommitMessage()

    class JsonlSink(DataSource):
        @classmethod
        def name(cls):
            return "jsonl_sink"

        def writer(self, schema, overwrite):
            return _Writer(self.options)

    return JsonlSink


@query(
    "sink_python_ds",
    family="scans",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
)
def sink_python_ds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom SINK via the Spark 4 Python Data Source writer API — the
    reverse of scan_python_ds and the extension point for bespoke
    destinations (internal services, exotic formats). Each executor
    task streams its partition through the Python writer (partition-id
    filenames keep retries idempotent — the exactly-once discipline
    every custom sink needs); the commit protocol gathers one
    WriterCommitMessage per task. The query then reads the files back
    through the ordinary JSON reader and the oracle checks content
    against the source table — proving the full custom write → read
    cycle is lossless. Scale: writer parallelism = partition count, no
    driver involvement in the data path.
    """
    import shutil

    if "jsonl_sink" not in getattr(spark, "_pyds_registered", set()):
        spark.dataSource.register(_make_pyds_sink())
        reg = getattr(spark, "_pyds_registered", set())
        reg.add("jsonl_sink")
        spark._pyds_registered = reg
    out = _cache_dir(sf_dir, "nation_pyds_sink")
    shutil.rmtree(out, ignore_errors=True)
    (
        t(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .write.format("jsonl_sink")
        .option("path", out)
        .mode("append")
        .save()
    )
    return spark.read.schema(NATION_SCHEMA).json(out).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


@query(
    "sink_vacuum",
    family="scans",
    oracle="""
    SELECT 2 AS version, count(*) AS n_orders,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                AS DECIMAL(28,6)) AS DOUBLE) AS revenue
    FROM orders WHERE year(o_orderdate) IN (1995, 1996)
    """,
)
def sink_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VACUUM for the manifest-versioned store (sink_snapshot's
    completion): expire old snapshots, then delete every data file no
    surviving manifest references — exactly Delta VACUUM / Iceberg
    expire_snapshots, jar-free. The dir first gains an ORPHAN file (a
    failed-write simulation) plus the v1-only manifest; vacuum retains
    only v2, walks the surviving manifests' file lists, and removes the
    orphan and nothing else. The oracle checks the v2 read AFTER vacuum
    against the source table — lossless by construction because vacuum
    never touches referenced files. pytest asserts the orphan is gone
    and the v1 manifest expired. Scale: vacuum cost = listing ∪
    manifest union — metadata-sized, no data scan.
    """
    import json

    from local_etl_spark.queries._util import dec, dsum

    # reuse (or build) the snapshot layout, then add an orphan file
    sink_snapshot(spark, sf_dir).collect()
    base = _cache_dir(sf_dir, "orders_snapshots")
    orphan_dir = os.path.join(base, "data", "f_orphan")
    os.makedirs(orphan_dir, exist_ok=True)
    orphan = os.path.join(orphan_dir, "leftover.parquet")
    with open(orphan, "wb") as fh:
        fh.write(b"PAR1 not really parquet PAR1")

    # expire every version but the latest
    versions = sorted(
        int(f.split("-v")[1].split(".")[0])
        for f in os.listdir(base)
        if f.startswith("manifest-v")
    )
    keep = versions[-1]
    referenced: set[str] = set()
    for v in versions:
        mpath = os.path.join(base, f"manifest-v{v}.json")
        if v == keep:
            with open(mpath) as fh:
                referenced.update(json.load(fh)["files"])
        else:
            os.remove(mpath)
    data_root = os.path.join(base, "data")
    for name in list(os.listdir(data_root)):
        path = os.path.join(data_root, name)
        if path not in referenced:
            import shutil

            shutil.rmtree(path, ignore_errors=True)

    with open(os.path.join(base, f"manifest-v{keep}.json")) as fh:
        files = json.load(fh)["files"]
    state = spark.read.parquet(*files)
    return state.agg(
        F.lit(keep).alias("version"),
        F.count(F.lit(1)).alias("n_orders"),
        dsum(dec("o_totalprice")).alias("revenue"),
    ).select("version", "n_orders", "revenue")


@query(
    "sink_rebalance",
    family="scans",
    oracle="""
    SELECT event_type, count(*) AS n,
           CAST(sum(event_id) AS BIGINT) AS id_sum
    FROM events
    GROUP BY event_type
    """,
)
def sink_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQE REBALANCE hint on the write path: ``hint("rebalance")``
    inserts a shuffle whose partition sizes AQE coalesces AND splits to
    the target advisory size — unlike ``repartition(n)`` (fixed n,
    skew-blind) or ``coalesce`` (merge-only), rebalance fixes both
    too-many-small and too-few-giant output files, which is THE
    file-sizing tool for a 100 TB sink. The rewritten copy is read back
    and content-checked against the source (rebalance moves rows, never
    changes them); pytest pins the file count within the advisory
    envelope.
    """
    ev = t(spark, sf_dir, "events")
    out = _cache_dir(sf_dir, "events_rebalanced")
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        ev.hint("rebalance").write.mode("overwrite").parquet(out)
    return (
        spark.read.parquet(out)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("event_id").cast("bigint").alias("id_sum"),
        )
    )


@query(
    "scan_observe",
    family="scans",
    oracle="""
    SELECT count(*) AS n_rows,
           CAST(sum(CASE WHEN value > 50.0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_high,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(28,6))
                AS DOUBLE) AS total_value
    FROM events
    """,
)
def scan_observe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observation API (`df.observe`): named metrics accumulate ON the
    stream during a normal action — zero extra scans, zero extra
    shuffles — and surface to the driver afterwards; this is how the
    ETL pipeline's R15 counters work (etl/pipeline.py `observe()`), and
    the only sane way to count rows/validity at 100 TB (a separate
    count() doubles the scan). The query materializes the observed
    metrics as a 1-row DataFrame; the oracle recomputes them
    relationally, proving the accumulated values equal the declarative
    aggregates.
    """
    from pyspark.sql import Observation

    obs = Observation("scan_metrics")
    ev = t(spark, sf_dir, "events").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("value") > 50.0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_high"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("decimal(28,6)")
        .cast("double")
        .alias("total_value"),
    )
    ev.write.format("noop").mode("overwrite").save()  # one pass, no sink
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["n_high"], m["total_value"])],
        "n_rows BIGINT, n_high BIGINT, total_value DOUBLE",
    )


@query(
    "etl_backfill_partitions",
    family="etl",
    oracle="""
    SELECT o_orderpriority AS priority, count(*) AS n,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                AS DECIMAL(28,6)) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def etl_backfill_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idempotent partition backfill — the recovery op every
    partitioned lake needs: diff the DECLARED partition keys (from the
    source) against the directories that actually exist in the sink,
    and rewrite ONLY the missing ones. A partition is deliberately
    deleted first (a failed/interrupted job simulation); the backfill
    restores exactly it, touching nothing else (existing partition
    dirs keep their mtimes — pytest-pinned), and the read-back must
    equal the source. Scale: the diff is metadata-only (distinct keys
    vs a directory listing); the rewrite scans only the missing
    partitions' source rows via partition-pruned predicates — never a
    full re-land.
    """
    import shutil

    from local_etl_spark.queries._util import dec, dsum

    o = t(spark, sf_dir, "orders")
    path = _cache_dir(sf_dir, "orders_backfill")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        o.write.mode("overwrite").partitionBy("o_orderpriority").parquet(path)
    # simulate a lost partition
    victims = [
        d for d in os.listdir(path) if d.startswith("o_orderpriority=")
    ]
    lost = sorted(victims)[0]
    shutil.rmtree(os.path.join(path, lost))

    declared = {
        r["o_orderpriority"] for r in o.select("o_orderpriority").distinct().collect()
    }
    present = {
        d.split("=", 1)[1]
        for d in os.listdir(path)
        if d.startswith("o_orderpriority=")
    }
    missing = sorted(declared - present)
    for key in missing:
        # partition-pruned source scan; write straight into the dir
        (
            o.filter(F.col("o_orderpriority") == key)
            .drop("o_orderpriority")
            .write.mode("overwrite")
            .parquet(os.path.join(path, f"o_orderpriority={key}"))
        )
    back = spark.read.option("basePath", path).parquet(
        *[
            os.path.join(path, d)
            for d in os.listdir(path)
            if d.startswith("o_orderpriority=")
        ]
    )
    return back.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n"),
        dsum(dec("o_totalprice")).alias("revenue"),
    )


@query(
    "scan_recursive_glob",
    family="scans",
    oracle="""
    SELECT event_type, count(*) AS n,
           CAST(sum(event_id) AS BIGINT) AS id_sum
    FROM events
    GROUP BY event_type
    """,
)
def scan_recursive_glob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive directory ingestion with file filtering
    (``recursiveFileLookup`` + ``pathGlobFilter``): the landing-zone
    reality where producers drop files into arbitrary nested folders
    with manifests/receipts mixed in. The corpus is rewritten into a
    3-level tree (type/shard/files) with decoy ``.txt`` receipts in
    every folder; the scan walks the tree (partition inference OFF —
    directory names are NOT data here) and the glob admits only the
    parquet payload. The oracle proves the filtered recursive read is
    exactly the flat table. Scale: listing is the only extra cost —
    driver-side on a filesystem, delegated to the object-store listing
    API in production.
    """
    ev = t(spark, sf_dir, "events")
    root = _cache_dir(sf_dir, "events_nested")
    marker = os.path.join(root, "_DONE")
    if not os.path.exists(marker):
        for et in ("click", "error", "purchase", "signup", "view"):
            (
                ev.filter(F.col("event_type") == et)
                .coalesce(2)
                .write.mode("overwrite")
                .parquet(os.path.join(root, et, "shard0"))
            )
            # decoy non-data files the glob must skip
            with open(os.path.join(root, et, "receipt.txt"), "w") as fh:
                fh.write("manifest placeholder\n")
        with open(marker, "w") as fh:
            fh.write("ok")
    back = (
        spark.read.option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .parquet(root)
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("event_id").cast("bigint").alias("id_sum"),
    )


@query(
    "scan_xml",
    family="scans",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
)
def scan_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native XML file source (spark-xml, merged into Spark 4): the
    nation table round-trips through element-per-row XML files
    (``rowTag``-delimited) and is read back with an explicit schema —
    the enterprise-interchange format the built-in JSON/CSV readers
    don't cover (fn_xml exercises the to_xml/from_xml FUNCTIONS; this
    is the FILE connector, with the same write→read lossless contract
    as scan_json/scan_csv/scan_orc). Explicit schema skips the
    inference pass, exactly like the other text formats at scale.
    """
    path = _cache_dir(sf_dir, "nation_xml")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        (
            t(spark, sf_dir, "nation")
            .select("n_nationkey", "n_name", "n_regionkey")
            .write.format("xml")
            .option("rowTag", "nation")
            .mode("overwrite")
            .save(path)
        )
    return (
        spark.read.format("xml")
        .option("rowTag", "nation")
        .schema(NATION_SCHEMA)
        .load(path)
        .select("n_nationkey", "n_name", "n_regionkey")
    )


@query(
    "sink_codec",
    family="scans",
    oracle="""
    SELECT event_type, count(*) AS n,
           CAST(sum(event_id) AS BIGINT) AS id_sum
    FROM events
    GROUP BY event_type
    """,
)
def sink_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-codec round-trip (zstd parquet): the codec decision
    every 100 TB sink makes — zstd trades a little write CPU for
    materially smaller files than the snappy default (ratio
    pytest-pinned in tests/test_lake_ops.py), which at scale is less
    object-store footprint AND fewer bytes scanned per query. The
    rewritten copy is read back and content-checked; codecs are
    framing-only, so the oracle proves losslessness.
    """
    ev = t(spark, sf_dir, "events")
    for codec in ("snappy", "zstd"):
        out = _cache_dir(sf_dir, f"events_{codec}")
        if not os.path.exists(os.path.join(out, "_SUCCESS")):
            ev.coalesce(4).write.mode("overwrite").option(
                "compression", codec
            ).parquet(out)
    back = spark.read.parquet(_cache_dir(sf_dir, "events_zstd"))
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("event_id").cast("bigint").alias("id_sum"),
    )


BLOOM_PROBE_CUSTKEY = 371  # point-lookup key the bloom filter serves


@query(
    "scan_parquet_bloomfilter",
    family="scans",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders WHERE o_custkey = {BLOOM_PROBE_CUSTKEY}
    ORDER BY o_orderkey
    """,
)
def scan_parquet_bloomfilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet column bloom filters on the write path + a point lookup
    on the read path — the needle-in-a-haystack pattern at 100 TB:
    min/max row-group stats are useless for a high-cardinality key
    that is uniformly spread (every row group's [min,max] contains
    every probe), but a per-row-group bloom filter lets the reader
    skip row groups that provably lack the key, turning a full-column
    scan into a handful of row-group reads. The filter also reaches
    the scan as an ordinary pushed predicate, so correctness never
    depends on the bloom metadata (it only prunes I/O).

    Dictionary encoding is disabled for this layout on purpose:
    parquet-mr SKIPS the bloom filter for fully dictionary-encoded
    column chunks (the dictionary is already an exact membership
    filter — measured: the option alone adds 0 bytes at test scale),
    and the 100 TB case this layout exists for is precisely the
    high-cardinality key that has fallen back to plain encoding.
    tests/test_lake_ops.py proves the filter is really in the file:
    an identical dictionary-off write without the option is
    byte-smaller by at least the filter's size (neither this
    container's pyarrow nor DuckDB exposes bloom offsets, so the size
    delta is the observable).
    """
    out = _cache_dir(sf_dir, "orders_bloom")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        (
            t(spark, sf_dir, "orders")
            .coalesce(4)
            .write.mode("overwrite")
            .option("parquet.bloom.filter.enabled#o_custkey", "true")
            .option("parquet.bloom.filter.expected.ndv#o_custkey", "20000")
            .option("parquet.enable.dictionary", "false")
            .parquet(out)
        )
    back = spark.read.parquet(out)
    return (
        back.filter(F.col("o_custkey") == BLOOM_PROBE_CUSTKEY)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
        )
    )


@query(
    "sink_dynamic_overwrite",
    family="scans",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_custkey
    FROM orders
    WHERE o_orderstatus <> 'F' OR o_orderkey % 2 = 0
    ORDER BY o_orderkey
    """,
)
def sink_dynamic_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite — the lakehouse backfill primitive:
    ``partitionOverwriteMode=dynamic`` replaces ONLY the partitions
    present in the incoming write (here: o_orderstatus='F' rewritten
    to its even-keyed rows) and leaves every other partition's files
    untouched; the STATIC default would truncate the whole table
    first, which on a 100 TB partitioned store turns a one-partition
    correction into a full rewrite. The conf is pinned around the
    write and restored (session-shared); tests/test_lake_ops.py
    proves untouched partitions kept their original data files
    (mtime-stable), i.e. the overwrite really was partition-scoped.
    """
    out = _cache_dir(sf_dir, "orders_dynpart")
    src = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_custkey"
    )
    marker = os.path.join(out, "_built")
    if not os.path.exists(marker):
        src.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
        _dynamic_overwrite_f_even(spark, src, out)
        with open(marker, "w") as fh:
            fh.write("ok")
    return spark.read.parquet(out).select(
        "o_orderkey", "o_orderstatus", "o_custkey"
    )


def _dynamic_overwrite_f_even(spark: SparkSession, src: DataFrame, out: str) -> None:
    """The partition-scoped correction step (also driven directly by
    tests/test_lake_ops.py to prove non-target partitions' files stay
    byte-untouched on a re-run)."""
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (
            src.filter(
                (F.col("o_orderstatus") == "F")
                & (F.col("o_orderkey") % 2 == 0)
            )
            .write.mode("overwrite")
            .partitionBy("o_orderstatus")
            .parquet(out)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


@query(
    "scan_csv_multiline",
    family="scans",
    oracle="""
    SELECT s_suppkey,
           s_name || chr(10) || 'nation=' || CAST(s_nationkey AS VARCHAR)
               AS note
    FROM supplier ORDER BY s_suppkey
    """,
)
def scan_csv_multiline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV round trip with QUOTED EMBEDDED NEWLINES (multiLine read):
    the classic CSV trap — a record spanning physical lines. The
    writer quotes the newline-bearing field; the reader must be told
    ``multiLine`` or it would split records mid-field. The honest
    scale note cuts the other way from every other scan here: a
    multiLine CSV file is NOT line-splittable (a worker cannot know
    whether an arbitrary byte offset sits inside a quoted field), so
    Spark parses each file whole — at 100 TB you keep records
    one-per-line (scan_csv) or switch to a framed format; this query
    exists to prove correctness of the escape hatch, and its
    docstring is the warning label.
    """
    path = _cache_dir(sf_dir, "supplier_multiline_csv")
    marker = os.path.join(path, "_SUCCESS")
    src = t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.concat(
            F.col("s_name"),
            F.lit("\n"),
            F.lit("nation="),
            F.col("s_nationkey").cast("string"),
        ).alias("note"),
    )
    if not os.path.exists(marker):
        src.write.mode("overwrite").option("header", "true").csv(path)
    schema = T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("note", T.StringType()),
        ]
    )
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("multiLine", "true")
        .csv(path)
    )


# deterministic multi-file/multi-rowgroup parquet corpus for the footer
# audit — static path + fixed bytes (pyarrow writes, independent of
# Spark partitioning), the scan_binaryfile precedent: the oracle's
# static parquet_metadata() glob must see identical footers on every
# machine and scale factor.
_FOOTER_DIR = os.path.join(tempfile.gettempdir(), "local_etl_spark_footer")
_FOOTER_FILES = 4
_FOOTER_ROWS = 1000  # per file, 2 row groups of 500


def _write_footer_corpus() -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(_FOOTER_DIR, exist_ok=True)
    for f in range(_FOOTER_FILES):
        path = os.path.join(_FOOTER_DIR, f"shard{f:02d}.parquet")
        if os.path.exists(path):
            continue
        base = f * _FOOTER_ROWS
        tbl = pa.table(
            {
                "k": pa.array(
                    [base + i for i in range(_FOOTER_ROWS)], pa.int64()
                ),
                "bucket": pa.array(
                    [(base + i) % 7 for i in range(_FOOTER_ROWS)], pa.int64()
                ),
            }
        )
        pq.write_table(tbl, path, row_group_size=_FOOTER_ROWS // 2)
    return _FOOTER_DIR


@query(
    "scan_parquet_footer",
    family="scans",
    oracle=f"""
    SELECT parse_filename(file_name) AS fname,
           CAST(row_group_id AS BIGINT) AS rg,
           path_in_schema AS column_name,
           CAST(num_values AS BIGINT) AS n_values,
           CAST(stats_min_value AS BIGINT) AS min_value,
           CAST(stats_max_value AS BIGINT) AS max_value
    FROM parquet_metadata('{_FOOTER_DIR}/*.parquet')
    """,
)
def scan_parquet_footer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed parquet-footer audit: one row per (file, row group,
    column) with value counts and min/max statistics — the raw
    material of manifest building (scan_skipping reads a manifest like
    this), row-group-skipping validation, and lake health checks (a
    column whose stats are absent cannot be pruned on).

    Scale shape: the FILE LIST is driver-sized (a listing, not data),
    but the footer READS are distributed — paths parallelize across
    the cluster and each task opens only its files' footers
    (Arrow-batched mapInPandas; ~KBs per footer, never row data).
    Auditing a 100 TB lake this way touches megabytes. The corpus is
    a deterministic static multi-file/multi-rowgroup fileset (the
    scan_binaryfile pattern) so the oracle's parquet_metadata() glob
    sees identical footers; BIGINT columns keep min/max text forms
    engine-independent.
    """
    import pandas as pd  # noqa: F401 (executor-side frames)

    d = _write_footer_corpus()
    files = sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    )
    paths = spark.createDataFrame(
        [(p,) for p in files], "path string"
    ).repartition(min(len(files), spark.sparkContext.defaultParallelism))

    def read_footers(batches):
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for p in pdf["path"]:
                md = pq.ParquetFile(p).metadata
                fname = p.rsplit("/", 1)[-1]
                for rg_i in range(md.num_row_groups):
                    rg = md.row_group(rg_i)
                    for ci in range(rg.num_columns):
                        c = rg.column(ci)
                        st = c.statistics
                        out.append(
                            (
                                fname,
                                rg_i,
                                c.path_in_schema,
                                c.num_values,
                                int(st.min),
                                int(st.max),
                            )
                        )
            yield pd.DataFrame(
                out,
                columns=[
                    "fname", "rg", "column_name", "n_values",
                    "min_value", "max_value",
                ],
            )

    schema = T.StructType(
        [
            T.StructField("fname", T.StringType()),
            T.StructField("rg", T.LongType()),
            T.StructField("column_name", T.StringType()),
            T.StructField("n_values", T.LongType()),
            T.StructField("min_value", T.LongType()),
            T.StructField("max_value", T.LongType()),
        ]
    )
    return paths.mapInPandas(read_footers, schema)


@query(
    "scan_file_lineage",
    family="scans",
    oracle=f"""
    SELECT parse_filename(filename) AS fname,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(k) AS BIGINT) AS min_k,
           CAST(max(k) AS BIGINT) AS max_k,
           CAST(sum(bucket) AS BIGINT) AS bucket_sum
    FROM read_parquet('{_FOOTER_DIR}/*.parquet', filename = true)
    GROUP BY 1
    """,
)
def scan_file_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level file lineage: every row tagged with its source file
    via input_file_name(), rolled up to a per-file profile — the
    provenance primitive behind selective reprocessing ('which shard
    produced these bad rows?'), incremental backfills, and blast-
    radius analysis after a bad writer deploy. DuckDB's
    filename=true read option is the oracle twin.

    Scale: input_file_name() is metadata the scan already carries —
    zero extra IO, no shuffle beyond the per-file rollup (group count
    = file count). Runs over the deterministic static multi-file
    corpus (shared with scan_parquet_footer) so both engines glob
    identical files.
    """
    d = _write_footer_corpus()
    return (
        spark.read.parquet(d)
        .select(
            F.element_at(F.split(F.input_file_name(), "/"), -1).alias("fname"),
            "k",
            "bucket",
        )
        .groupBy("fname")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("k").cast("bigint").alias("min_k"),
            F.max("k").cast("bigint").alias("max_k"),
            F.sum("bucket").cast("bigint").alias("bucket_sum"),
        )
    )


@query(
    "scan_json_variant",
    family="scans",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
)
def scan_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-less JSON ingestion as ONE VARIANT column (Spark 4's
    ``singleVariantColumn`` reader mode): every document lands as a
    semi-structured value with NO inference pass and NO declared
    schema, and fields are projected out lazily with variant_get —
    the open-schema landing-zone pattern (ingest first, type later)
    that schema-on-read lakes run on. Compare scan_json: same bytes,
    but there the schema is fixed at read time; here adding a field
    upstream changes nothing about ingestion.

    The typed projection casts recover the exact original values
    (oracle = the source nation view), proving the round trip through
    variant encoding is lossless. Scale: variant decode is columnar
    and pushdown-friendly (variant_get shredding); the scan stays
    splittable JSONL.
    """
    path = _materialize(
        t(spark, sf_dir, "nation"), _cache_dir(sf_dir, "nation_json"), "json"
    )
    raw = (
        spark.read.option("singleVariantColumn", "v").json(path)
    )
    return raw.select(
        F.variant_get(F.col("v"), "$.n_nationkey", "int").alias("n_nationkey"),
        F.variant_get(F.col("v"), "$.n_name", "string").alias("n_name"),
        F.variant_get(F.col("v"), "$.n_regionkey", "int").alias("n_regionkey"),
    )
