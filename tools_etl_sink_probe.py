"""ETL fixed-cost floor probe (VERDICT r10 #9, SCALE.md §18.3).

At 2k files the v2 pipeline's bill is almost entirely fixed cost: job
scheduling × sinks + file commits. The clean-batch skip (round 10)
already dropped the two error-path jobs; this probe measures the
remaining idea — fusing the TWO OUTPUT sinks (payload + metadata CSVs)
into ONE Spark job by pre-rendering each row to a quoted CSV line and
writing a single text sink partitioned by target table.

Method: classify a 2000-file corpus once (warm persisted cache), then
best-of-N timings of
  (a) CURRENT  — payload CSV write, then metadata CSV write threaded
                 (exactly write_sinks' shape minus the error sinks);
  (b) FUSED    — union of pre-quoted payload/metadata lines,
                 one write.partitionBy('tbl').text() job.
Parity: parsed-row equality of (b)'s output against (a)'s.

Usage: python tools_etl_sink_probe.py [n_files]
"""

from __future__ import annotations

import csv
import glob
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F


def _quoted(col):
    """RFC-4180 field quoting matching Python's csv module (and the
    engine's escape='\"' CSV sink): quote iff the value contains a
    quote, comma, CR or LF; embedded quotes double."""
    c = F.coalesce(F.col(col).cast("string"), F.lit(""))  # concat_ws
    # SKIPS nulls (column misalignment — the first probe run's parity
    # failure), so null→'' like the CSV writer's default nullValue
    needs = c.rlike('[",\n\r]')
    return F.when(
        needs,
        F.concat(F.lit('"'), F.regexp_replace(c, '"', '""'), F.lit('"')),
    ).otherwise(c)


def main() -> int:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from local_etl_spark.etl.corpus import (
        write_per_file_corpus,
        write_user_schema,
    )
    from local_etl_spark.etl.pipeline import (
        classify,
        read_event_docs,
        v2_rows,
    )
    from local_etl_spark.etl.schema_translate import load_schema
    from local_etl_spark.session import get_spark

    spark = get_spark("etl-sink-probe")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="etl_sink_probe_")
    files_dir = write_per_file_corpus(os.path.join(root, "users"), n_files)
    schema = load_schema(write_user_schema(os.path.join(root, "schema.json")))

    classified = classify(
        read_event_docs(spark, files_dir), schema
    ).persist()
    classified.count()  # warm the cache so both variants time sinks only
    keep = F.col("is_valid") | (F.col("error_class") == "missing")
    kept = classified.where(keep)
    payload, metadata = v2_rows(kept, schema)

    verbatim = {
        "header": True,
        "ignoreLeadingWhiteSpace": False,
        "ignoreTrailingWhiteSpace": False,
        "escape": '"',
    }

    def run_current(out: str) -> float:
        from concurrent.futures import ThreadPoolExecutor

        t0 = time.perf_counter()
        ws_key = "spark.sql.codegen.wholeStage"
        old = spark.conf.get(ws_key, "true")
        spark.conf.set(ws_key, "false")
        try:
            payload.write.mode("append").options(**verbatim).csv(
                os.path.join(out, "users.csv")
            )
        finally:
            spark.conf.set(ws_key, old)
        with ThreadPoolExecutor(max_workers=1) as pool:
            pool.submit(
                lambda: metadata.write.mode("append")
                .options(**verbatim)
                .csv(os.path.join(out, "metadata.csv"))
            ).result()
        return time.perf_counter() - t0

    def lines(df, tbl: str):
        return df.select(
            F.lit(tbl).alias("tbl"),
            F.concat_ws(",", *[_quoted(c) for c in df.columns]).alias(
                "value"
            ),
        )

    fused_src = lines(payload, "users").unionByName(
        lines(metadata, "metadata")
    )

    def run_fused(out: str) -> float:
        t0 = time.perf_counter()
        ws_key = "spark.sql.codegen.wholeStage"
        old = spark.conf.get(ws_key, "true")
        spark.conf.set(ws_key, "false")
        try:
            fused_src.write.mode("append").partitionBy("tbl").text(out)
        finally:
            spark.conf.set(ws_key, old)
        return time.perf_counter() - t0

    reps = 3
    cur = fus = float("inf")
    for i in range(reps):
        o = os.path.join(root, f"cur{i}")
        cur = min(cur, run_current(o))
        o2 = os.path.join(root, f"fus{i}")
        fus = min(fus, run_fused(o2))

    # parity: parsed data rows of fused == current (headers aside —
    # the fused text sink writes none; a production version would
    # prepend them driver-side like the blank-layout part-00000)
    def rows_csv(d):
        out = []
        for p in sorted(glob.glob(os.path.join(d, "part-*.csv"))):
            with open(p, newline="", encoding="utf-8") as fh:
                it = list(csv.reader(fh))
            out.extend(it[1:])
        return sorted(map(tuple, out))

    def rows_text(d):
        out = []
        for p in sorted(set(glob.glob(os.path.join(d, "part-*")))):
            if os.path.isdir(p) or p.endswith(".crc"):
                continue
            with open(p, newline="", encoding="utf-8") as fh:
                out.extend(list(csv.reader(fh)))
        return sorted(map(tuple, out))

    par_u = rows_csv(os.path.join(root, "cur0", "users.csv")) == rows_text(
        os.path.join(root, "fus0", "tbl=users")
    )
    par_m = rows_csv(
        os.path.join(root, "cur0", "metadata.csv")
    ) == rows_text(os.path.join(root, "fus0", "tbl=metadata"))
    print(
        f"n_files={n_files} current_2job={cur:.3f}s fused_1job={fus:.3f}s "
        f"ratio={fus / cur:.2f} parity_users={par_u} parity_meta={par_m}"
    )
    shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
