"""Bisect which ETL projection fails codegen under fallback=false.

Diagnostic twin of
tests/test_etl_pipeline.py::test_classify_and_renders_stay_codegen_compiled
— runs each projection separately and prints OK/FAIL per step instead
of stopping at the first failure. classified is persisted like the
product pipeline: without the InMemoryRelation barrier, filter pushdown
substitutes the full is_valid CASE into the sink predicates and the
collapsed plan legitimately exceeds 64 KB (a shape that never executes
in the product).
"""

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from local_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    tmp = tempfile.mkdtemp(prefix="codegen_bisect_")
    spark = get_spark("codegen-bisect")
    spark.conf.set("spark.sql.codegen.fallback", "false")

    from local_etl_spark.etl.config import reference_config
    from local_etl_spark.etl.pipeline import (
        classify,
        error_log_lines,
        read_event_docs,
        v1_rows,
        v2_rows,
    )
    from local_etl_spark.etl.schema_translate import load_schema

    for d in ("users", "cards"):
        os.makedirs(os.path.join(tmp, d))
        doc = {
            "metadata": {"type": "x", "event_at": "t", "event_id": "e1"},
            "payload": {"id": 1},
        }
        with open(os.path.join(tmp, d, "a.json"), "w") as fh:
            json.dump(doc, fh)
    for s in ("user-events-schema.json", "card-events-schema.json"):
        shutil.copy(f"/root/reference/{s}", os.path.join(tmp, s))
    cfg = reference_config(tmp)

    for table in cfg.tables:
        schema = load_schema(cfg.path(table.schema_file))
        docs = read_event_docs(spark, cfg.path(table.data_dir))
        classified = classify(docs, schema).persist()
        # (step, runs-with-wholeStage-off) — the wide render sinks plan
        # non-fused in the product (write_sinks): fused, all of a
        # Project's renders share one doConsume and 9 slots cross 64 KB
        steps = [
            ("classify", lambda: classified.collect(), False),
            ("v1_rows", lambda: v1_rows(classified, schema).collect(), True),
            (
                "v2_payload",
                lambda: v2_rows(classified, schema)[0].collect(),
                True,
            ),
            (
                "v2_metadata",
                lambda: v2_rows(classified, schema)[1].collect(),
                True,
            ),
            (
                "error_log",
                lambda: error_log_lines(
                    classified.where(~classified.is_valid)
                ).collect(),
                False,
            ),
        ]
        for name, fn, ws_off in steps:
            if ws_off:
                spark.conf.set("spark.sql.codegen.wholeStage", "false")
            try:
                fn()
                print(f"OK   {table.name}:{name}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"FAIL {table.name}:{name}: {str(e)[:120]}", flush=True)
            finally:
                spark.conf.set("spark.sql.codegen.wholeStage", "true")
        classified.unpersist()
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
