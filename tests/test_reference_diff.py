"""THE parity test: run the actual reference (/root/reference/main2.py)
as a subprocess on a reference-survivable corpus, run the engine on the
same corpus, and diff the output tables row-for-row.

Golden-fixture tests (test_etl_pipeline.py) encode the reference's
semantics as expectations; this test removes the encoding step — the
reference itself produces the expected output. The corpus is generated
with corrupt_rate=0, repair_rate=0 so none of the reference's crash
paths fire (SURVEY.md §2.2 R12/R13 notes; engine behavior on those
inputs is defined+documented divergence, tested elsewhere).
"""

from __future__ import annotations

import csv
import glob
import json
import os
import shutil
import subprocess
import sys

import pytest

REFERENCE = "/root/reference/main2.py"


@pytest.fixture(scope="module")
def corpus_run(spark, tmp_path_factory):
    from local_etl_spark.etl.corpus import generate
    from local_etl_spark.etl.pipeline import (
        PipelineConfig,
        TableConfig,
        run_table,
    )

    base = tmp_path_factory.mktemp("refdiff")

    # --- shared corpus: reference-survivable users events, per-file ---
    ref_cwd = base / "ref"
    (ref_cwd / "users").mkdir(parents=True)
    (ref_cwd / "cards").mkdir()
    for s in ("user-events-schema.json", "card-events-schema.json"):
        shutil.copy(f"/root/reference/{s}", ref_cwd / s)
    n = 0
    for i, raw in enumerate(generate(200, seed=5, corrupt_rate=0, repair_rate=0)):
        doc = json.loads(raw)
        (ref_cwd / "users" / f"ev{i:05d}.json").write_text(
            json.dumps(doc, indent=2)
        )
        n += 1

    # --- reference run (its own cwd; hard-coded relative registry) ---
    proc = subprocess.run(
        [sys.executable, REFERENCE],
        cwd=ref_cwd,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]

    # --- engine run on the SAME files ---
    out = base / "engine"
    cfg = PipelineConfig(
        tables=(
            TableConfig(
                name="users",
                schema_file=str(ref_cwd / "user-events-schema.json"),
                data_dir=str(ref_cwd / "users"),
                schema_mismatch_dir=str(out / "quarantine"),
                payload_file=str(out / "users.csv"),
                metadata_file=str(out / "metadata.csv"),
            ),
        ),
        base_dir=str(out),
    )
    run_table(spark, cfg, cfg.tables[0], version=2)
    return ref_cwd, out, n


def _ref_rows(path: str) -> list[dict]:
    with open(path, newline="", encoding="utf-8") as fh:
        return list(csv.DictReader(fh))


def _engine_rows(path_dir: str) -> list[dict]:
    rows = []
    for part in sorted(glob.glob(os.path.join(path_dir, "part-*.csv"))):
        with open(part, newline="", encoding="utf-8") as fh:
            rows.extend(csv.DictReader(fh))
    return rows


def test_payload_rows_identical(corpus_run):
    ref_cwd, out, n = corpus_run
    ref = {r["event_id"]: r for r in _ref_rows(str(ref_cwd / "users.csv"))}
    eng = {r["event_id"]: r for r in _engine_rows(str(out / "users.csv"))}
    assert len(ref) == n and set(ref) == set(eng)
    mismatches = [
        (k, ref[k], eng[k]) for k in ref if dict(ref[k]) != dict(eng[k])
    ]
    assert not mismatches, mismatches[:3]


def test_metadata_rows_identical(corpus_run):
    ref_cwd, out, _ = corpus_run
    ref = {r["event_id"]: r for r in _ref_rows(str(ref_cwd / "metadata.csv"))}
    eng = {r["event_id"]: r for r in _engine_rows(str(out / "metadata.csv"))}
    assert set(ref) == set(eng)
    mismatches = [
        (k, ref[k], eng[k]) for k in ref if dict(ref[k]) != dict(eng[k])
    ]
    assert not mismatches, mismatches[:3]


def test_no_quarantine_on_survivable_corpus(corpus_run):
    # survivable corpus ⇒ the reference quarantined nothing; if its
    # mismatch dir was created at all it must be empty
    ref_cwd, _, _ = corpus_run
    mismatch = ref_cwd / "users_schema_mismatches"
    if mismatch.exists():
        assert not list(mismatch.glob("*"))
