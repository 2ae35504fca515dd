"""Scalar-function family queries (SURVEY.md §2.4-H).

One query per family, many functions each — all JVM-side built-ins
(whole-stage codegen; no Python in the hot path). Where Spark and DuckDB
name or type a function differently, both sides are written to the same
result type (casts noted inline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from local_etl_spark.queries._util import t
from local_etl_spark.registry import query


@query(
    "fn_string",
    family="functions",
    oracle="""
SELECT p_partkey AS partkey,
       upper(p_name) AS up_name,
       lower(p_brand) AS low_brand,
       trim('  ' || p_name || ' ') AS trimmed,
       substr(p_name, 1, 5) AS first5,
       CAST(length(p_name) AS BIGINT) AS name_len,
       array_to_string(str_split(p_name, ' '), '|') AS words,
       CAST(len(str_split(p_name, ' ')) AS INT) AS n_words,
       regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
       concat_ws('|', p_brand, p_type) AS brand_type,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded_size,
       translate(p_name, 'aeiou', 'AEIOU') AS vowelled,
       upper(substr(p_name, 1, 1)) || lower(substr(p_name, 2)) AS capitalized,
       replace(p_type, 'A', '@') AS replaced,
       p_name LIKE '%widget%' AS is_widget
FROM part
""",
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: case, trim, substring, split, regexp_extract,
    concat_ws, lpad, translate, replace, LIKE — plus a Python-
    ``str.capitalize()`` equivalent (first-upper + rest-LOWER; note
    ``initcap`` is NOT equivalent, it capitalizes every word — the same
    distinction the reference's job-fix transform needs, main.py:124)."""
    p = t(spark, sf_dir, "part")
    name = F.col("p_name")
    return p.select(
        F.col("p_partkey").alias("partkey"),
        F.upper(name).alias("up_name"),
        F.lower(F.col("p_brand")).alias("low_brand"),
        F.trim(F.concat(F.lit("  "), name, F.lit(" "))).alias("trimmed"),
        F.substring(name, 1, 5).alias("first5"),
        F.length(name).cast("long").alias("name_len"),
        F.array_join(F.split(name, " "), "|").alias("words"),
        F.size(F.split(name, " ")).alias("n_words"),
        F.regexp_extract(name, r"([a-z]+)$", 1).alias("last_word"),
        F.concat_ws("|", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("padded_size"),
        F.translate(name, "aeiou", "AEIOU").alias("vowelled"),
        F.concat(
            F.upper(F.substring(name, 1, 1)),
            F.lower(F.expr("substring(p_name, 2)")),
        ).alias("capitalized"),
        F.regexp_replace(F.col("p_type"), "A", "@").alias("replaced"),
        name.like("%widget%").alias("is_widget"),
    )


@query(
    "fn_date",
    family="functions",
    oracle="""
SELECT o_orderkey AS orderkey,
       CAST(year(o_orderdate) AS INT) AS yr,
       CAST(month(o_orderdate) AS INT) AS mo,
       CAST(dayofmonth(o_orderdate) AS INT) AS dom,
       CAST(quarter(o_orderdate) AS INT) AS qtr,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS INT) AS days_to_y2k,
       CAST(o_orderdate AS DATE) + 30 AS due_date,
       CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s,
       strftime(o_orderdate, '%Y-%m-%d') AS iso_day,
       CAST(dayofweek(CAST(o_orderdate AS DATE)) AS INT) AS dow
FROM orders
""",
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: component extraction, truncation, diff,
    arithmetic, epoch, formatting. DuckDB's dayofweek is 0=Sunday while
    Spark's dayofweek is 1=Sunday → Spark side subtracts 1."""
    o = t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dom"),
        F.quarter(d).alias("qtr"),
        F.date_trunc("month", d).alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("date"), d).alias("days_to_y2k"),
        F.date_add(d.cast("date"), 30).alias("due_date"),
        F.unix_timestamp(d).alias("epoch_s"),
        F.date_format(d, "yyyy-MM-dd").alias("iso_day"),
        (F.dayofweek(d.cast("date")) - F.lit(1)).alias("dow"),
    )


@query(
    "fn_math",
    family="functions",
    oracle="""
SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
       round(l_extendedprice, 1) AS rounded,
       abs(l_discount - 0.05) AS abs_dev,
       CAST(ceil(l_quantity / 7) AS BIGINT) AS ceil_q7,
       CAST(floor(l_quantity / 7) AS BIGINT) AS floor_q7,
       round(pow(l_quantity, 2), 6) AS qty_sq,
       round(ln(l_extendedprice), 6) AS ln_price,
       round(exp(l_discount), 6) AS exp_disc,
       round(sqrt(l_quantity), 6) AS sqrt_qty,
       CAST(sign(l_discount - 0.05) AS DOUBLE) AS sign_dev,
       l_linenumber % 3 AS mod3,
       CAST(greatest(l_quantity, 25.0) AS DOUBLE) AS at_least_25,
       CAST(least(l_quantity, 25.0) AS DOUBLE) AS at_most_25
FROM lineitem
WHERE l_returnflag = 'R'
""",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family. Transcendentals (pow/ln/exp/sqrt) are rounded to 6dp —
    libm results can differ in the last ulp across engines; everything
    else is exact."""
    li = t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    return li.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        F.round(F.col("l_extendedprice"), 1).alias("rounded"),
        F.abs(F.col("l_discount") - 0.05).alias("abs_dev"),
        F.ceil(q / 7).alias("ceil_q7"),
        F.floor(q / 7).alias("floor_q7"),
        F.round(F.pow(q, 2), 6).alias("qty_sq"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("ln_price"),
        F.round(F.exp(F.col("l_discount")), 6).alias("exp_disc"),
        F.round(F.sqrt(q), 6).alias("sqrt_qty"),
        F.signum(F.col("l_discount") - 0.05).alias("sign_dev"),
        (F.col("l_linenumber") % 3).alias("mod3"),
        F.greatest(q, F.lit(25.0)).alias("at_least_25"),
        F.least(q, F.lit(25.0)).alias("at_most_25"),
    )


@query(
    "fn_array",
    family="functions",
    oracle="""
SELECT vec_id,
       CAST(len(embedding) AS INT) AS dim,
       embedding[1] AS first_val,
       CAST(round(list_sum(list_transform(embedding[1:4], x -> CAST(x AS DOUBLE))), 6) AS DOUBLE) AS head4_sum,
       list_sort(embedding[1:4])[1] AS head4_min,
       list_sort(embedding[1:4])[4] AS head4_max,
       list_reverse_sort(embedding)[1] AS max_val,
       CAST(round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS DOUBLE) AS vec_sum
FROM embeddings
""",
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family on the 64-d embedding column: size, indexing, slice,
    sort, max-element, and a fold (aggregate) — all native array
    expressions, no UDF. Array-valued intermediates (slice, sort_array)
    are reduced to scalar witnesses (min/max/sum of the slice) so the
    final schema stays driver-canon-safe; the float fold is a sequential
    double accumulation identical to DuckDB's list_sum-over-doubles."""
    e = t(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    head4 = F.slice(emb, 1, 4)
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.element_at(emb, 1).alias("first_val"),
        F.round(
            F.aggregate(head4, F.lit(0.0), lambda acc, x: acc + x.cast("double")), 6
        ).alias("head4_sum"),
        F.element_at(F.sort_array(head4), 1).alias("head4_min"),
        F.element_at(F.sort_array(head4), 4).alias("head4_max"),
        F.array_max(emb).alias("max_val"),
        F.round(
            F.aggregate(emb, F.lit(0.0), lambda acc, x: acc + x.cast("double")), 6
        ).alias("vec_sum"),
    )


@query(
    "fn_explode",
    family="functions",
    oracle="""
SELECT e.vec_id, u.pos AS pos, u.val AS val
FROM (SELECT vec_id, unnest(embedding[1:8]) AS val,
             CAST(generate_subscripts(embedding[1:8], 1) - 1 AS INT) AS pos
      FROM embeddings) u
JOIN embeddings e USING (vec_id)
WHERE u.vec_id < 10
""",
)
def fn_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode (UNNEST WITH ORDINALITY): one row per array element
    with its position."""
    e = t(spark, sf_dir, "embeddings")
    return (
        e.where(F.col("vec_id") < 10)
        .select("vec_id", F.posexplode(F.slice(F.col("embedding"), 1, 8)).alias("pos", "val"))
        .select("vec_id", "pos", "val")
    )


@query(
    "fn_map_json",
    family="functions",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.missing') AS BIGINT) AS missing_val
FROM events
""",
)
def fn_map_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-path extraction from the events.props JSON string, typed and
    untyped, plus a missing-path null. Spark side also round-trips
    through from_json→map to exercise MapType (same value)."""
    e = t(spark, sf_dir, "events")
    props_map = F.from_json(F.col("props"), T.MapType(T.StringType(), T.LongType()))
    return e.select(
        "event_id",
        F.element_at(props_map, "k").alias("k_val"),
        F.get_json_object(F.col("props"), "$.k").alias("k_str"),
        F.get_json_object(F.col("props"), "$.missing").cast("long").alias("missing_val"),
    )


@query(
    "fn_cond",
    family="functions",
    oracle="""
SELECT o_orderkey AS orderkey,
       CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'finished' ELSE 'other' END AS status_word,
       coalesce(nullif(o_orderpriority, '1-URGENT'), 'URGENT!') AS prio_renamed,
       nullif(o_orderstatus, 'P') AS status_nullable,
       CAST(if(o_totalprice > 200000, o_totalprice, 0) AS DOUBLE) AS big_or_zero,
       ifnull(nullif(o_orderstatus, 'O'), 'was-open') AS nvl_demo
FROM orders
""",
)
def fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family: CASE (simple form), coalesce, nullif, if, nvl."""
    o = t(spark, sf_dir, "orders")
    s = F.col("o_orderstatus")
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.when(s == "O", "open").when(s == "F", "finished").otherwise("other").alias("status_word"),
        F.coalesce(F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")), F.lit("URGENT!")).alias("prio_renamed"),
        F.nullif(s, F.lit("P")).alias("status_nullable"),
        F.when(F.col("o_totalprice") > 200000, F.col("o_totalprice")).otherwise(F.lit(0.0)).alias("big_or_zero"),
        F.nvl(F.nullif(s, F.lit("O")), F.lit("was-open")).alias("nvl_demo"),
    )


@query(
    "fn_bitwise",
    family="functions",
    oracle="""
SELECT o_orderkey,
       o_orderkey & o_custkey AS band,
       o_orderkey | o_custkey AS bor,
       xor(o_orderkey, o_custkey) AS bxor,
       o_custkey << 3 AS shl,
       o_orderkey >> 2 AS shr,
       CAST(bit_count(o_orderkey) AS INTEGER) AS nbits,
       ~o_custkey AS bnot
FROM orders
""",
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: and/or/xor/not, shifts, popcount — the building
    blocks of the engine's hash-partitioning, bloom and sketch ops."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.expr("o_orderkey & o_custkey").alias("band"),
        F.expr("o_orderkey | o_custkey").alias("bor"),
        F.expr("o_orderkey ^ o_custkey").alias("bxor"),
        F.shiftleft(F.col("o_custkey"), 3).alias("shl"),
        F.shiftright(F.col("o_orderkey"), 2).alias("shr"),
        F.bit_count(F.col("o_orderkey")).alias("nbits"),
        F.expr("~o_custkey").alias("bnot"),
    )


@query(
    "fn_struct",
    family="functions",
    oracle="""
SELECT c_custkey,
       struct_pack(k := c_custkey, bal := c_acctbal).bal AS bal_out,
       struct_pack(i := struct_pack(k := c_custkey),
                   seg := c_mktsegment).i.k AS k_nested,
       struct_pack(k := c_custkey, bal := c_acctbal)
         = struct_pack(k := c_custkey, bal := c_acctbal) AS eq_self,
       struct_pack(k := c_custkey).k + 1 AS k_plus
FROM customer
""",
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct family: named_struct construction, field access (flat and
    nested), struct equality. Output stays flat so the cross-engine
    canonicalizer compares scalars, not engine-specific struct reprs."""
    c = t(spark, sf_dir, "customer")
    s = F.named_struct(
        F.lit("k"), F.col("c_custkey"), F.lit("bal"), F.col("c_acctbal")
    )
    nested = F.named_struct(
        F.lit("i"), F.named_struct(F.lit("k"), F.col("c_custkey")),
        F.lit("seg"), F.col("c_mktsegment"),
    )
    return c.select(
        "c_custkey",
        s.getField("bal").alias("bal_out"),
        nested.getField("i").getField("k").alias("k_nested"),
        (s == s).alias("eq_self"),
        (F.named_struct(F.lit("k"), F.col("c_custkey")).getField("k") + 1).alias(
            "k_plus"
        ),
    )


@query(
    "fn_try",
    family="functions",
    oracle="""
SELECT o_orderkey,
       TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS prio_digit,
       TRY_CAST(o_orderstatus AS BIGINT) AS status_num,
       CASE WHEN o_orderkey % 3 = 0 THEN NULL
            ELSE o_totalprice / (o_orderkey % 3) END AS div_guarded,
       string_split(o_orderpriority, '-')[2] AS prio_word,
       string_split(o_orderpriority, '-')[5] AS beyond_end
FROM orders
""",
)
def fn_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe function family: under ANSI SQL (the engine's mode,
    and DuckDB's) a bad cast, division by zero, or out-of-bounds index
    is a runtime ERROR — try_* variants return NULL instead, which is
    what a 100 TB pipeline wants (route the bad row, don't kill the
    job). 'F'/'O'/'P' fail the numeric cast; every third key divides by
    zero; index 5 is past the split array's end."""
    o = t(spark, sf_dir, "orders")
    parts = F.split(F.col("o_orderpriority"), "-")
    return o.select(
        "o_orderkey",
        F.expr("try_cast(substr(o_orderpriority, 1, 1) AS BIGINT)").alias(
            "prio_digit"
        ),
        F.expr("try_cast(o_orderstatus AS BIGINT)").alias("status_num"),
        F.try_divide(F.col("o_totalprice"), F.col("o_orderkey") % 3).alias(
            "div_guarded"
        ),
        F.try_element_at(parts, F.lit(2)).alias("prio_word"),
        F.try_element_at(parts, F.lit(5)).alias("beyond_end"),
    )


@query(
    "fn_hof",
    family="functions",
    oracle="""
SELECT vec_id,
       len(list_filter(embedding, x -> x > 0)) AS n_pos,
       len(list_filter(embedding, x -> abs(x) > 1)) = 0 AS all_unit,
       len(list_filter(embedding, x -> x > 0.5)) > 0 AS any_large,
       len(list_filter(list_zip(embedding, list_reverse(embedding)),
           p -> p[1] < p[2])) AS n_lt_rev
FROM embeddings
""",
)
def fn_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array function family: filter/exists/forall/
    zip_with lambdas over the 64-d embedding column. All predicates are
    exact float comparisons on identical stored values, so counts and
    booleans are bit-deterministic across engines (no float arithmetic
    crosses rows)."""
    e = t(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        F.forall("embedding", lambda x: F.abs(x) <= 1).alias("all_unit"),
        F.exists("embedding", lambda x: x > 0.5).alias("any_large"),
        F.expr(
            "size(filter(zip_with(embedding, reverse(embedding),"
            " (a, b) -> a < b), x -> x))"
        ).alias("n_lt_rev"),
    )


@query(
    "fn_hash",
    family="functions",
    oracle="""
SELECT p_partkey AS partkey,
       md5(p_name) AS md5_name,
       sha256(p_name || '|' || p_brand) AS sha_name_brand,
       CAST(length(md5(p_name)) AS BIGINT) AS md5_len,
       substr(sha256(p_name), 1, 8) AS sha_prefix
FROM part
""",
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic-hash family (md5 / sha2-256): content addressing
    and stable row fingerprints — the primitives behind exact dedup,
    shard assignment and cache keys. Pure codegen expressions; both
    engines emit lowercase hex. (xxhash64 — the engine's cheap
    partitioning hash — is Spark-specific and therefore exercised by
    the rows-only dedup queries instead.)"""
    p = t(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").alias("partkey"),
        F.md5(F.col("p_name")).alias("md5_name"),
        F.sha2(F.concat_ws("|", F.col("p_name"), F.col("p_brand")), 256).alias(
            "sha_name_brand"
        ),
        F.length(F.md5(F.col("p_name"))).cast("long").alias("md5_len"),
        F.substring(F.sha2(F.col("p_name"), 256), 1, 8).alias("sha_prefix"),
    )


@query(
    "fn_url",
    family="functions",
    oracle="""
WITH u AS (
    SELECT p_partkey,
           'https://shop-' || CAST(p_partkey % 50 AS VARCHAR)
             || '.example.com/catalog/' || replace(lower(p_brand), '#', '-')
             || '?size=' || CAST(p_size AS VARCHAR)
             || '&type=' || replace(lower(p_type), ' ', '+') AS url
    FROM part
)
SELECT p_partkey AS partkey,
       url,
       regexp_extract(url, '^https?://([^/]+)', 1) AS host,
       regexp_extract(url, '^https?://[^/]+(/[^?#]*)', 1) AS path,
       regexp_extract(url, '\\?([^#]*)', 1) AS query,
       regexp_extract(url, '[?&]size=([^&#]*)', 1) AS size_param,
       regexp_extract(url, '^([a-z]+)://', 1) AS protocol
FROM u
""",
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL family: synthesize well-formed URLs from part attributes,
    then parse host/path/query/param/protocol with Spark's native
    parse_url (JVM java.net.URI under the hood — the crawl-processing
    primitive for a web-corpus pipeline). The DuckDB oracle parses the
    same URLs with anchored regexes — equivalent on well-formed URLs
    with sanitized components ('#'→'-', ' '→'+')."""
    p = t(spark, sf_dir, "part")
    url = F.concat(
        F.lit("https://shop-"),
        (F.col("p_partkey") % 50).cast("string"),
        F.lit(".example.com/catalog/"),
        F.replace(F.lower(F.col("p_brand")), F.lit("#"), F.lit("-")),
        F.lit("?size="),
        F.col("p_size").cast("string"),
        F.lit("&type="),
        F.replace(F.lower(F.col("p_type")), F.lit(" "), F.lit("+")),
    )
    return p.select(
        F.col("p_partkey").alias("partkey"), url.alias("url")
    ).select(
        "partkey",
        "url",
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY")).alias("query"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("size")).alias(
            "size_param"
        ),
        F.parse_url(F.col("url"), F.lit("PROTOCOL")).alias("protocol"),
    )


@query(
    "fn_datetime_arith",
    family="functions",
    oracle="""
SELECT o_orderkey AS orderkey,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus_3mo,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       make_date(CAST(year(o_orderdate) AS INT), CAST(month(o_orderdate) AS INT), 1) AS month_start,
       CAST(week(CAST(o_orderdate AS DATE)) AS INT) AS iso_week,
       CAST(dayofyear(o_orderdate) AS INT) AS doy,
       CAST(o_orderdate - INTERVAL 90 DAY AS TIMESTAMP) AS minus_90d,
       greatest(CAST(o_orderdate AS DATE), DATE '1995-01-01') AS clamped_lo
FROM orders
""",
)
def fn_datetime_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-arithmetic family: month addition WITH month-end
    clamping (add_months ≡ + INTERVAL MONTH in DuckDB — both clamp
    Jan 31 + 1mo → Feb 29), last_day, make_date, ISO week number,
    day-of-year, interval subtraction, date clamping via greatest.
    All codegen expressions on the scan — the building blocks of
    calendar bucketing and retention windows."""
    o = t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.add_months(d.cast("date"), 3).alias("plus_3mo"),
        F.last_day(d.cast("date")).alias("month_end"),
        F.make_date(F.year(d), F.month(d), F.lit(1)).alias("month_start"),
        F.weekofyear(d.cast("date")).alias("iso_week"),
        F.dayofyear(d).alias("doy"),
        (d - F.expr("INTERVAL 90 DAY")).alias("minus_90d"),
        F.greatest(d.cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "clamped_lo"
        ),
    )


@query(
    "fn_map",
    family="functions",
    oracle="""
WITH m AS (
    SELECT event_id,
           map(['type', 'uid'],
               [event_type, CAST(user_id AS VARCHAR)]) AS props_map
    FROM events
)
SELECT event_id,
       array_to_string(map_keys(props_map), '|') AS ks,
       array_to_string(map_values(props_map), '|') AS vs,
       props_map['type'][1] AS type_val,
       CAST(cardinality(props_map) AS INT) AS n_entries,
       props_map['missing'][1] AS absent
FROM m
""",
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType family: construct a map from key/value arrays, then
    map_keys / map_values / element lookup / size / missing-key null.
    The output carries map-DERIVED columns only — raw MAP values
    canonicalize differently across engines (DuckDB fetches a
    {key:[...], value:[...]} struct), so the contract is the lookups,
    which is what pipelines consume anyway. All codegen expressions."""
    e = t(spark, sf_dir, "events")
    m = F.map_from_arrays(
        F.array(F.lit("type"), F.lit("uid")),
        F.array(F.col("event_type"), F.col("user_id").cast("string")),
    )
    return e.select("event_id", m.alias("props_map")).select(
        "event_id",
        F.array_join(F.map_keys(F.col("props_map")), "|").alias("ks"),
        F.array_join(F.map_values(F.col("props_map")), "|").alias("vs"),
        F.col("props_map").getItem("type").alias("type_val"),
        F.size(F.col("props_map")).alias("n_entries"),
        F.col("props_map").getItem("missing").alias("absent"),
    )


@query(
    "fn_variant",
    family="functions",
    oracle="""
WITH j AS (
    SELECT o_orderkey,
           '{"order": {"key": ' || CAST(o_orderkey AS VARCHAR)
             || ', "price": ' || CAST(round(o_totalprice * 100) / 100.0 AS VARCHAR)
             || '}, "tags": ["' || o_orderstatus || '", "'
             || o_orderpriority || '"]}' AS doc
    FROM orders
)
SELECT o_orderkey,
       CAST(json_extract(doc, '$.order.key') AS BIGINT) AS key_typed,
       CAST(json_extract(doc, '$.order.price') AS DOUBLE) AS price_typed,
       json_extract_string(doc, '$.tags[0]') AS tag0,
       json_extract_string(doc, '$.tags[1]') AS tag1,
       json_extract_string(doc, '$.missing.path') AS absent
FROM j
""",
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT family (Spark 4's native semi-structured
    type — the same machinery the ETL pipeline's validity compiler is
    built on, etl/pipeline.py): parse once with parse_json, then typed
    path extraction (variant_get with target types), array indexing and
    missing-path null. Unlike per-path get_json_object (which re-parses
    the string per call, cf. fn_map_json), a VARIANT column is parsed
    ONCE into a binary encoding and every extraction is a cheap typed
    probe — the 100 TB answer for wide event payloads probed by many
    paths."""
    o = t(spark, sf_dir, "orders")
    doc = F.concat(
        F.lit('{"order": {"key": '),
        F.col("o_orderkey").cast("string"),
        F.lit(', "price": '),
        (F.round(F.col("o_totalprice") * 100) / 100.0).cast("string"),
        F.lit('}, "tags": ["'),
        F.col("o_orderstatus"),
        F.lit('", "'),
        F.col("o_orderpriority"),
        F.lit('"]}'),
    )
    v = F.parse_json(doc)
    return o.select("o_orderkey", v.alias("v")).select(
        "o_orderkey",
        F.expr("variant_get(v, '$.order.key', 'bigint')").alias("key_typed"),
        F.expr("variant_get(v, '$.order.price', 'double')").alias(
            "price_typed"
        ),
        F.expr("variant_get(v, '$.tags[0]', 'string')").alias("tag0"),
        F.expr("variant_get(v, '$.tags[1]', 'string')").alias("tag1"),
        F.expr("variant_get(v, '$.missing.path', 'string')").alias("absent"),
    )


@query(
    "fn_xml",
    family="functions",
    oracle="""
    SELECT c_custkey,
           '<ROW><k>' || CAST(c_custkey AS VARCHAR) || '</k><n>'
               || replace(replace(replace(c_name, '&', '&amp;'),
                          '<', '&lt;'), '>', '&gt;')
               || '</n><s>' || c_mktsegment || '</s></ROW>' AS xml_doc,
           c_custkey AS rt_key,
           c_name AS rt_name,
           c_mktsegment AS rt_segment
    FROM customer
    """,
)
def fn_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML family (to_xml / from_xml, Spark 4): render each customer row
    to an XML document and parse it straight back, emitting both the
    document and the round-tripped scalars. DuckDB has no XML type, so
    the oracle re-derives the document with the same entity-escaping
    rules (&, <, > — the only characters Spark's XML writer escapes in
    element text besides quotes, and the only specials the corpus can
    contain) and the round-trip columns directly from the source —
    i.e. the oracle checks BOTH the serialized bytes and that
    from_xml(to_xml(x)) == x. The XML doc is rendered compact
    (no indent) so the text is byte-deterministic.

    Scale: pure map-side expression work, zero shuffle; at 100 TB this
    is the scan-transform-sink shape for XML interchange feeds.
    """
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("n", T.StringType()),
            T.StructField("s", T.StringType()),
        ]
    )
    c = t(spark, sf_dir, "customer")
    xml = c.select(
        "c_custkey",
        F.to_xml(
            F.struct(
                F.col("c_custkey").alias("k"),
                F.col("c_name").alias("n"),
                F.col("c_mktsegment").alias("s"),
            ),
            {"indent": ""},
        ).alias("raw_xml"),
    ).select(
        "c_custkey",
        # Spark's XML writer terminates the document with one newline;
        # strip it so the bytes match the oracle's rendering exactly
        # (rtrim only strips spaces, so use an anchored replace)
        F.regexp_replace("raw_xml", "\n+$", "").alias("xml_doc"),
    )
    parsed = xml.select(
        "c_custkey",
        "xml_doc",
        F.from_xml("xml_doc", schema).alias("rt"),
    )
    return parsed.select(
        "c_custkey",
        "xml_doc",
        F.col("rt.k").alias("rt_key"),
        F.col("rt.n").alias("rt_name"),
        F.col("rt.s").alias("rt_segment"),
    )


@query(
    "fn_csv",
    family="functions",
    oracle="""
    SELECT s_suppkey,
           CAST(s_suppkey AS VARCHAR) || ','
               || s_name || ','
               || CAST(s_nationkey AS VARCHAR) AS csv_line,
           s_suppkey AS rt_key,
           s_name AS rt_name,
           s_nationkey AS rt_nation
    FROM supplier
    """,
)
def fn_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV line family (to_csv / from_csv): render each supplier row to
    a CSV line and parse it straight back, emitting the line and the
    round-tripped scalars — the in-expression (not sink-level) CSV
    path used for embedding delimited payloads in message envelopes.
    Supplier names are quote/comma/newline-free in this corpus, so the
    unquoted oracle rendering is exact (to_csv would quote otherwise —
    the fn_xml oracle shows the escaping-aware variant of this
    pattern). Round-trip typing: from_csv parses back to the declared
    long/string/int schema, which the oracle checks by emitting the
    source columns directly.

    Scale: pure map-side expression work, zero shuffle.
    """
    schema = "k LONG, n STRING, nk INT"
    s = t(spark, sf_dir, "supplier")
    rendered = s.select(
        "s_suppkey",
        F.to_csv(
            F.struct(
                F.col("s_suppkey").alias("k"),
                F.col("s_name").alias("n"),
                F.col("s_nationkey").alias("nk"),
            )
        ).alias("csv_line"),
    )
    parsed = rendered.select(
        "s_suppkey",
        "csv_line",
        F.from_csv("csv_line", schema).alias("rt"),
    )
    return parsed.select(
        "s_suppkey",
        "csv_line",
        F.col("rt.k").alias("rt_key"),
        F.col("rt.n").alias("rt_name"),
        F.col("rt.nk").alias("rt_nation"),
    )


@query(
    "fn_mask",
    family="functions",
    oracle="""
    SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(
               c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'),
               '[0-9]', 'n', 'g') AS masked_name,
           regexp_replace(regexp_replace(regexp_replace(
               c_mktsegment, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'),
               '[0-9]', '*', 'g') AS masked_segment
    FROM customer
    """,
)
def fn_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data redaction with ``mask()`` (Spark 3.4+): upper→X, lower→x,
    digit→n (or a custom digit char) while preserving string SHAPE and
    punctuation — the display-layer redaction that keeps formats
    recognizable (IDs still look like IDs), complementing
    etl_pseudonymize's joinable tokens (mask destroys joinability by
    design: equal inputs of the same shape collide). DuckDB has no
    mask(), so the oracle re-derives it as three global
    character-class regexp_replace passes — exactly mask()'s ASCII
    semantics on this corpus (mask() additionally handles Unicode
    case categories; corpus is ASCII so the oracle is exact).

    Scale: map-side expression, zero shuffle.
    """
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.mask("c_name").alias("masked_name"),
        F.mask(
            "c_mktsegment",
            F.lit("X"),
            F.lit("x"),
            F.lit("*"),
        ).alias("masked_segment"),
    )


@query(
    "fn_collate",
    family="functions",
    oracle="""
    WITH mixed AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                    ELSE lower(c_mktsegment) END AS seg_mixed,
               c_acctbal
        FROM customer
    )
    SELECT min(seg_mixed) AS seg_repr,
           count(*) AS n,
           CAST(sum(CASE WHEN seg_mixed = upper(seg_mixed)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_upper
    FROM mixed
    GROUP BY lower(seg_mixed)
    """,
)
def fn_collate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive grouping via Spark 4 COLLATION (`COLLATE
    UTF8_LCASE`) — the declarative alternative to lower()-normalizing
    every comparison site, and a headline Spark 4 SQL feature. The
    collated key is LOAD-BEARING (it defines the groups: upper- and
    lower-cased segment spellings land together) but never emitted —
    a collated group's representative value is engine-arbitrary, so the
    output key is the group's binary min (deterministic everywhere),
    which is exactly how the lower()-based oracle reproduces the same
    rows. Scale: the collation applies inside the hash-aggregate's key
    comparison — same one-shuffle plan as any groupBy, no normalization
    projection needed.
    """
    c = t(spark, sf_dir, "customer")
    mixed = c.select(
        "c_custkey",
        F.when(
            F.col("c_custkey") % 2 == 0, F.upper("c_mktsegment")
        ).otherwise(F.lower("c_mktsegment")).alias("seg_mixed"),
    )
    g = mixed.groupBy(F.expr("seg_mixed COLLATE UTF8_LCASE").alias("k")).agg(
        F.min(F.expr("seg_mixed COLLATE UTF8_BINARY")).alias("seg_repr"),
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("seg_mixed") == F.upper("seg_mixed"), 1).otherwise(0)
        ).cast("bigint").alias("n_upper"),
    )
    return g.select("seg_repr", "n", "n_upper")


AES_KEY = "0123456789abcdef0123456789abcdef"  # 32-byte demo key


@query(
    "fn_aes",
    family="functions",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier ORDER BY s_suppkey
    """,
)
def fn_aes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level AES round trip (aes_encrypt → aes_decrypt,
    AES-256-GCM): the at-rest field-encryption primitive for PII
    columns where fn_mask/etl_pseudonymize are one-way. GCM's random
    IV makes ciphertext nondeterministic per run, so the oracle
    checks the only stable contract — decrypt(encrypt(x)) is the
    IDENTITY — by comparing the decrypted output against the plain
    source; tests/test_plan_shape.py additionally pins that the
    ciphertext itself differs from the plaintext and carries the
    12-byte IV + 16-byte tag overhead. Map-only both ways; key
    distribution (a literal here) is a KMS concern, not a plan one.
    """
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    enc = F.expr(f"aes_encrypt(s_name, '{AES_KEY}')")
    return (
        s.select("s_suppkey", enc.alias("ct"))
        .select(
            "s_suppkey",
            F.expr(
                f"CAST(aes_decrypt(ct, '{AES_KEY}') AS STRING)"
            ).alias("s_name"),
        )
    )


@query(
    "fn_bitmap",
    family="functions",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_distinct
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def fn_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 bitmap function family (bitmap_bucket_number /
    bitmap_bit_position / bitmap_construct_agg / bitmap_count): EXACT
    distinct counting as a two-level rollup — keys hash to a
    (bucket, bit) address, each (group, bucket) partial aggregates to
    one fixed 4 KB bitmap, and the group's distinct count is the sum
    of per-bucket popcounts. This is the warehouse pattern for exact
    COUNT(DISTINCT) at 100 TB: the shuffle carries one bitmap per
    (group, bucket) instead of one row per distinct key, partials
    merge by OR (associative, any order), and — unlike HLL sketches
    (agg_approx_cd) — the answer is exact. The oracle is the plain
    COUNT(DISTINCT), proving the bitmap algebra loses nothing;
    agg_bitmap_distinct is the hand-rolled bit_or forebear of the
    same idea for key spaces under 64.
    """
    from local_etl_spark.queries.sql_tpch import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_mktsegment,
               CAST(sum(cnt) AS BIGINT) AS n_distinct
        FROM (
            SELECT c_mktsegment,
                   bitmap_bucket_number(c_custkey) AS bucket,
                   bitmap_count(
                       bitmap_construct_agg(bitmap_bit_position(c_custkey))
                   ) AS cnt
            FROM customer
            GROUP BY c_mktsegment, bitmap_bucket_number(c_custkey)
        )
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """
    )


@query(
    "fn_regexp",
    family="functions",
    oracle=r"""
    SELECT p_partkey,
           CAST(len(regexp_extract_all(p_name, '[aeiou]+')) AS BIGINT)
               AS n_vowel_runs,
           regexp_extract(p_name, '^[a-z]+') AS first_word,
           coalesce(array_to_string(
               regexp_extract_all(p_name, '[a-z]{4,}'), '|'), '')
               AS long_tokens,
           CAST(len(regexp_split_to_array(p_name, '[^a-z]+')) AS BIGINT)
               AS n_fields,
           regexp_replace(p_name, '(^| )([a-z])', '\1<\2>', 'g')
               AS marked
    FROM part
    """,
)
def fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-expression function family over part names: match
    counting (regexp_count), anchored first-match extraction
    (regexp_extract with EXPLICIT group 0 — Spark requires the index
    for group-free patterns), all-matches extraction flattened to a
    scalar witness, regex splitting, and group-referencing
    replacement.

    Cross-engine notes baked into the oracle: DuckDB spells count as
    len(regexp_extract_all(..)); backreferences in replacements are
    \\1 in DuckDB vs $1 in Spark (same Java/RE2-compatible pattern
    semantics on this alphabet); array results collapse through
    array_join/array_to_string with a coalesce('') because DuckDB
    returns NULL for the empty-list join. All map-side, codegen'd,
    pushdown-transparent.
    """
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_count("p_name", F.lit("[aeiou]+"))
        .cast("bigint")
        .alias("n_vowel_runs"),
        F.regexp_extract("p_name", "^[a-z]+", 0).alias("first_word"),
        F.array_join(
            F.regexp_extract_all("p_name", F.lit("[a-z]{4,}"), 0), "|"
        ).alias("long_tokens"),
        F.size(F.split("p_name", "[^a-z]+")).cast("bigint").alias("n_fields"),
        F.regexp_replace("p_name", "(^| )([a-z])", "$1<$2>").alias("marked"),
    )


@query(
    "fn_variant_explode",
    family="functions",
    oracle="""
    SELECT doc_id, CAST(0 AS INT) AS pos, 'lang' AS key,
           '"' || lang || '"' AS value_json
    FROM documents
    UNION ALL
    SELECT doc_id, CAST(1 AS INT), 'n_chars', CAST(n_chars AS VARCHAR)
    FROM documents
    """,
)
def fn_variant_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 ``variant_explode`` lateral TVF: fan a semi-structured
    VARIANT object out to (pos, key, value) rows — the generic
    schema-on-read walk for payloads whose keys aren't known at write
    time (the complement of scan_json_variant's whole-document
    ingestion). Each document's (lang, n_chars) pair is packed into a
    variant object and exploded back; ``pos`` is the field's rank in
    the variant's SORTED key order (probed: insertion order is NOT
    preserved — variant objects canonicalize keys), so the oracle
    assigns pos by key rank. ``value`` is VARIANT-typed and not
    canon-safe; ``to_json`` gives its exact JSON spelling as a scalar
    witness.

    Scale: parse + lateral explode are map-only (a Generate over each
    row's bounded field list — no shuffle at any corpus size).
    """
    d = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    d.select(
        "doc_id",
        F.parse_json(
            F.concat(
                F.lit('{"n_chars": '),
                F.col("n_chars").cast("string"),
                F.lit(', "lang": "'),
                F.col("lang"),
                F.lit('"}'),
            )
        ).alias("pj"),
    ).createOrReplaceTempView("_fn_vexp_docs")
    return spark.sql(
        """
        SELECT doc_id, v.pos, v.key, to_json(v.value) AS value_json
        FROM _fn_vexp_docs, LATERAL variant_explode(pj) v
        """
    )
