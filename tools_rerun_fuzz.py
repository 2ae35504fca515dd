"""Fuzz round 11: the RE-RUN / append axis (VERDICT r10 #5).

Every prior fuzz round diffed a SINGLE invocation. This one runs both
reference binaries TWICE into the same output dirs and the engine
pipeline twice over the same config, live-diffing the accumulation
semantics:

  (a) v1 flat CSV — main.py opens in append mode and calls
      ``writeheader()`` UNCONDITIONALLY (main.py:161), so a re-run
      plants a duplicate header MID-FILE which csv.reader sees as a
      data row. The engine's distributed sink writes per-part headers
      (the established convention), so its re-run adds new part files
      — data-row multisets match the reference EXCLUDING the embedded
      header rows, whose count must equal runs−1. Engine-defined
      divergence of the same class as the reference's crash bugs: the
      duplicated mid-file header is a reference BUG (a downstream
      csv.DictReader yields a row where every field equals the column
      name), not behavior to reproduce.
  (b) v2 payload/metadata — main2.py's ``tell() == 0`` check writes
      the header once ACROSS runs; rows re-append. Engine likewise
      re-appends; data-row multisets must match exactly.
  (c) errors.log — both accumulate: every (file, message) pair must
      appear exactly ``runs`` times on both sides (multiset compare,
      not the single-run set compare).
  (d) quarantine — the reference's ``shutil.copy`` OVERWRITES the
      same-named destination (idempotent set); the engine's parquet
      sink appends a duplicate (file_path, raw) row per run. Basename
      SETS and per-name bytes must agree; the engine's row count per
      name must equal ``runs`` (documented append semantics — the
      driver compares contents, not multiplicity).
  (e) re-run after corpus GROWTH — both the reference and the batch
      engine reprocess EVERYTHING (old rows duplicated + new rows
      once); the engine's ``run_table_incremental`` is the fix:
      its second run must process ONLY the new files.

Usage: python tools_rerun_fuzz.py [scenario ...]   (default: all)
"""

from __future__ import annotations

import collections
import csv
import glob
import json
import os
import shutil
import sys
import tempfile
from pathlib import Path

import tools_schema_fuzz as sf

RUNS = 2


def _engine_cfg(ref_dir: Path, out: Path):
    from local_etl_spark.etl.pipeline import PipelineConfig, TableConfig

    return PipelineConfig(
        tables=(
            TableConfig(
                name="users",
                schema_file=str(ref_dir / "user-events-schema.json"),
                data_dir=str(ref_dir / "users"),
                schema_mismatch_dir=str(out / "users_q"),
                output_file=str(out / "users_flat.csv"),
                payload_file=str(out / "users.csv"),
                metadata_file=str(out / "metadata.csv"),
            ),
            TableConfig(
                name="cards",
                schema_file=str(ref_dir / "card-events-schema.json"),
                data_dir=str(ref_dir / "cards"),
                schema_mismatch_dir=str(out / "cards_q"),
                output_file=str(out / "cards_flat.csv"),
                payload_file=str(out / "cards.csv"),
                metadata_file=str(out / "metadata.csv"),
            ),
        ),
        base_dir=str(out),
    )


def _ref_rows_split(path) -> tuple[list[list[str]], int]:
    """Reference CSV → (data rows, embedded duplicate-header count).
    The FIRST line is the real header; any LATER line equal to it is a
    re-run's writeheader() artifact."""
    rows = sf._csv_lists(path)
    if not rows:
        return [], 0
    header, body = rows[0], rows[1:]
    dup = sum(1 for r in body if r == header)
    return [r for r in body if r != header], dup


def _errors_multi(path_or_dir) -> collections.Counter:
    out: collections.Counter = collections.Counter()
    paths = (
        [path_or_dir]
        if os.path.isfile(str(path_or_dir))
        else glob.glob(os.path.join(str(path_or_dir), "part-*"))
    )
    for p in paths:
        for line in open(p, encoding="utf-8").read().splitlines():
            if not line.strip():
                continue
            parts = line.split(", ", 4)
            out[(os.path.basename(parts[3]), parts[4])] += 1
    return out


def scenario_rerun_accumulation(spark, root: Path) -> list[str]:
    """Both binaries + the engine, twice, intact schemas (a–d)."""
    from local_etl_spark.etl.pipeline import run_pipeline

    diffs: list[str] = []
    u = json.load(open("/root/reference/user-events-schema.json"))
    c = json.load(open("/root/reference/card-events-schema.json"))
    ref1, ref2 = root / "ref1", root / "ref2"
    sf._build(ref1, u, c)
    shutil.copytree(ref1, ref2)

    for _ in range(RUNS):
        p1 = sf._run_reference("/root/reference/main.py", ref1)
        p2 = sf._run_reference("/root/reference/main2.py", ref2)
        if p1.returncode or p2.returncode:
            diffs.append(f"reference crashed on re-run: {p1.returncode}/{p2.returncode}")
            return diffs

    out = root / "engine"
    cfg = _engine_cfg(ref1, out)
    for version in (1, 2):
        for _ in range(RUNS):
            run_pipeline(spark, cfg, version=version)

    # (a) v1: data multisets equal AFTER stripping the reference's
    # embedded duplicate headers, whose count must be RUNS-1 per table
    for tbl in ("users", "cards"):
        ref_rows, dup_hdrs = _ref_rows_split(ref1 / f"{tbl}.csv")
        if dup_hdrs != RUNS - 1:
            diffs.append(
                f"v1 {tbl}: expected {RUNS - 1} embedded duplicate "
                f"header(s) in the reference re-run output, saw {dup_hdrs}"
            )
        eh, er = sf._engine_csv_lists(out / f"{tbl}_flat.csv")
        if sorted(map(tuple, ref_rows)) != sorted(map(tuple, er)):
            diffs.append(
                f"v1 {tbl} re-run ROWS differ ({len(ref_rows)} vs {len(er)})"
            )

    # (b) v2 payload: tell()==0 header-once; rows duplicated both sides
    for tbl in ("users", "cards"):
        ref_rows, dup_hdrs = _ref_rows_split(ref2 / f"{tbl}.csv")
        if dup_hdrs != 0:
            diffs.append(f"v2 {tbl}: unexpected duplicate header in reference")
        eh, er = sf._engine_csv_lists(out / f"{tbl}.csv")
        if sorted(map(tuple, ref_rows)) != sorted(map(tuple, er)):
            diffs.append(
                f"v2 {tbl} re-run ROWS differ ({len(ref_rows)} vs {len(er)})"
            )

    # (c) errors.log accumulation: every pair exactly RUNS times.
    # engine ran v1 AND v2 loops (2×RUNS appends) vs the reference's
    # per-binary dir (RUNS appends) — normalize per-run first.
    ref_errs = _errors_multi(ref2 / "errors.log")
    eng_errs = _errors_multi(out / "errors.log.d")
    if set(ref_errs) != set(eng_errs):
        diffs.append(
            f"errors.log key sets differ: only_ref="
            f"{sorted(set(ref_errs) - set(eng_errs))[:3]} only_eng="
            f"{sorted(set(eng_errs) - set(ref_errs))[:3]}"
        )
    else:
        bad_ref = {k: v for k, v in ref_errs.items() if v != RUNS}
        bad_eng = {k: v for k, v in eng_errs.items() if v != 2 * RUNS}
        if bad_ref:
            diffs.append(f"reference errors.log not {RUNS}x: {bad_ref}")
        if bad_eng:
            diffs.append(f"engine errors.log not {2 * RUNS}x: {bad_eng}")

    # (d) quarantine: reference overwrites (idempotent set); engine
    # appends one row per processing run — sets + bytes equal,
    # engine multiplicity = 2×RUNS (v1 loop + v2 loop)
    for tbl in ("users", "cards"):
        rq = {
            os.path.basename(p): open(p, encoding="utf-8").read()
            for p in glob.glob(str(ref2 / f"{tbl}_schema_mismatches" / "*"))
        }
        qdir = str(out / f"{tbl}_q")
        rows = []
        if glob.glob(os.path.join(qdir, "part-*")):
            rows = spark.read.parquet(qdir).collect()
        counts = collections.Counter(
            os.path.basename(r["file_path"]) for r in rows
        )
        eq = {os.path.basename(r["file_path"]): r["raw"] for r in rows}
        if set(rq) != set(eq):
            diffs.append(
                f"{tbl} quarantine SETS differ after re-run: "
                f"{sorted(set(rq) ^ set(eq))[:4]}"
            )
            continue
        bad = [k for k in rq if rq[k] != eq[k]]
        if bad:
            diffs.append(f"{tbl} quarantine BYTES differ: {bad[:3]}")
        wrong = {k: v for k, v in counts.items() if v != 2 * RUNS}
        if wrong:
            diffs.append(
                f"{tbl} engine quarantine multiplicity != {2 * RUNS}: {wrong}"
            )
    return diffs


def scenario_rerun_growth(spark, root: Path) -> list[str]:
    """(e) second run after the corpus GROWS: batch reprocesses all
    (ref parity); run_table_incremental processes only the delta."""
    from local_etl_spark.etl.pipeline import (
        run_pipeline,
        run_table_incremental,
    )

    diffs: list[str] = []
    u = json.load(open("/root/reference/user-events-schema.json"))
    c = json.load(open("/root/reference/card-events-schema.json"))
    ref2 = root / "ref2"
    sf._build(ref2, u, c)
    p = sf._run_reference("/root/reference/main2.py", ref2)
    if p.returncode:
        diffs.append(f"reference run1 crashed: {p.returncode}")
        return diffs

    out = root / "engine"
    cfg = _engine_cfg(ref2, out)
    run_pipeline(spark, cfg, version=2)
    # incremental twin, separate sinks + state
    inc = root / "engine_inc"
    icfg = _engine_cfg(ref2, inc)
    m1 = [
        run_table_incremental(spark, icfg, t, str(root / "state"), version=2)
        for t in icfg.tables
    ]

    # grow the corpus: one valid + one invalid user doc
    (ref2 / "users" / "ev_new_ok.json").write_text(
        json.dumps(sf._user_doc(991), indent=2)
    )
    bad = sf._user_doc(992)
    bad["payload"]["score"] = "low"
    (ref2 / "users" / "ev_new_bad.json").write_text(json.dumps(bad, indent=2))

    p = sf._run_reference("/root/reference/main2.py", ref2)
    if p.returncode:
        diffs.append(f"reference run2 crashed: {p.returncode}")
        return diffs
    run_pipeline(spark, cfg, version=2)
    m2 = [
        run_table_incremental(spark, icfg, t, str(root / "state"), version=2)
        for t in icfg.tables
    ]

    # batch engine ≡ reference (both reprocess everything)
    for tbl in ("users", "cards"):
        ref_rows, dup = _ref_rows_split(ref2 / f"{tbl}.csv")
        if dup:
            diffs.append(f"v2 {tbl}: unexpected duplicate header in reference")
        eh, er = sf._engine_csv_lists(out / f"{tbl}.csv")
        if sorted(map(tuple, ref_rows)) != sorted(map(tuple, er)):
            diffs.append(
                f"growth {tbl} batch ROWS differ "
                f"({len(ref_rows)} vs {len(er)})"
            )

    # incremental: run2 touches ONLY the 2 new files (1 valid, 1 bad)
    mu2 = next(m for m in m2 if m.table == "users")
    mc2 = next(m for m in m2 if m.table == "cards")
    if (mu2.file_count, mu2.valid_count, mu2.invalid_count) != (2, 1, 1):
        diffs.append(
            f"incremental users run2 processed {mu2} (expected 2/1/1)"
        )
    if mc2.file_count != 0:
        diffs.append(f"incremental cards run2 processed {mc2} (expected 0)")
    # and its cumulative valid output equals one pass over the final
    # corpus (no duplicates, no misses): ref rows from run2 alone =
    # full corpus; incremental sink = run1 rows + run2 delta
    full = sf._build  # silence linters; comparison below is on counts
    mu1 = next(m for m in m1 if m.table == "users")
    eh, inc_rows = sf._engine_csv_lists(inc / "users.csv")
    expect = mu1.valid_count + 1  # + the one new valid doc
    got_ids = collections.Counter(r[0] for r in inc_rows)
    if len(inc_rows) != expect or any(v != 1 for v in got_ids.values()):
        diffs.append(
            f"incremental users sink rows {len(inc_rows)} (expected "
            f"{expect}, each id once)"
        )
    return diffs


def scenario_rerun_blank_layout(spark, root: Path) -> list[str]:
    """v1 zero-column re-run: the reference re-appends ONE blank header
    line + N blank rows per run (DictWriter fieldnames=[]); the
    engine's driver-written part-00000 is created ONCE (header-once)
    and each run appends N blank text rows — so blank-line totals
    differ by exactly runs−1 (the duplicated blank header), the same
    documented class as (a)."""
    from local_etl_spark.etl.pipeline import run_pipeline

    diffs: list[str] = []
    us, cs = sf.scenarios()["empty_both_required"]
    ref1 = root / "ref1"
    sf._build(ref1, us, cs)
    for _ in range(RUNS):
        p = sf._run_reference("/root/reference/main.py", ref1)
        if p.returncode:
            diffs.append(f"reference crashed: {p.returncode}")
            return diffs
    out = root / "engine"
    cfg = _engine_cfg(ref1, out)
    for _ in range(RUNS):
        run_pipeline(spark, cfg, version=1)

    raw = (ref1 / "users.csv").read_text(encoding="utf-8")
    ref_blank = sum(1 for ln in raw.splitlines() if not ln)
    eng_blank = 0
    part_dir = out / "users_flat.csv"
    hdr = part_dir / "part-00000"
    if not hdr.exists():
        diffs.append("engine blank header part-00000 missing")
        return diffs
    eng_blank += sum(1 for ln in hdr.read_text().splitlines()) or 1
    for part in glob.glob(str(part_dir / "part-*.txt")):
        eng_blank += sum(
            1 if not ln else 0
            for ln in open(part, encoding="utf-8").read().splitlines()
        )
    if ref_blank != eng_blank + (RUNS - 1):
        diffs.append(
            f"blank-line totals: ref={ref_blank} eng={eng_blank} "
            f"(expected ref = eng + {RUNS - 1} duplicate blank headers)"
        )
    return diffs


def scenario_rerun_quarantine_mutation(spark, root: Path) -> list[str]:
    """THE round-11 find: a file that is invalid in BOTH runs but whose
    BYTES changed between them. The reference's shutil.copy OVERWRITES
    the same-named quarantine file, so its quarantine holds the RUN-2
    bytes; the engine's append-only table holds both versions — and
    before the batch_seq recency column, materialize_quarantine wrote
    whichever duplicate collected last (uuid-named part files, i.e.
    random), silently flipping between runs' bytes. With batch_seq,
    latest-wins is deterministic and must byte-match the reference."""
    from local_etl_spark.etl.pipeline import (
        materialize_quarantine,
        run_pipeline,
    )

    diffs: list[str] = []
    u = json.load(open("/root/reference/user-events-schema.json"))
    c = json.load(open("/root/reference/card-events-schema.json"))
    ref2 = root / "ref2"
    sf._build(ref2, u, c)
    out = root / "engine"
    cfg = _engine_cfg(ref2, out)

    p = sf._run_reference("/root/reference/main2.py", ref2)
    if p.returncode:
        return [f"reference run1 crashed: {p.returncode}"]
    run_pipeline(spark, cfg, version=2)

    # mutate the invalid doc's bytes (still type-invalid)
    bad = sf._user_doc(90)
    bad["payload"]["score"] = "sky-high-v2"
    (ref2 / "users" / "bad_type.json").write_text(json.dumps(bad, indent=2))

    p = sf._run_reference("/root/reference/main2.py", ref2)
    if p.returncode:
        return [f"reference run2 crashed: {p.returncode}"]
    run_pipeline(spark, cfg, version=2)

    rq = {
        os.path.basename(pth): open(pth, encoding="utf-8").read()
        for pth in glob.glob(str(ref2 / "users_schema_mismatches" / "*"))
    }
    mat = root / "materialized"
    materialize_quarantine(spark, str(out / "users_q"), str(mat))
    eq = {
        os.path.basename(pth): open(pth, encoding="utf-8").read()
        for pth in glob.glob(str(mat / "*"))
    }
    if set(rq) != set(eq):
        diffs.append(f"mutation quarantine SETS differ: {sorted(set(rq) ^ set(eq))}")
        return diffs
    for k in rq:
        if rq[k] != eq[k]:
            diffs.append(
                f"mutation quarantine BYTES differ for {k}: the engine "
                f"materialized a stale run's version (latest-wins broken)"
            )
    # the append-only table must still hold BOTH versions (audit trail)
    n_versions = (
        spark.read.parquet(str(out / "users_q"))
        .where("file_path LIKE '%bad_type.json'")
        .count()
    )
    if n_versions != 2:
        diffs.append(f"expected 2 quarantined versions in the table, saw {n_versions}")
    return diffs


def sweep_randomized(spark, root: Path, seeds: int) -> list[str]:
    """Randomized re-run sweep (--sweep N): per seed, build an intact
    corpus, run reference main2.py + the engine, apply 2–4 RANDOM
    corpus edits (add a valid doc / add an invalid doc / REWRITE an
    invalid doc's bytes / delete a doc), run both again, and diff the
    three accumulation surfaces: v2 data-row multisets, errors.log
    multisets, and quarantine latest-wins bytes via
    materialize_quarantine (the reference's overwrite semantics)."""
    import random

    from local_etl_spark.etl.pipeline import (
        materialize_quarantine,
        run_pipeline,
    )

    u = json.load(open("/root/reference/user-events-schema.json"))
    c = json.load(open("/root/reference/card-events-schema.json"))
    all_diffs: list[str] = []
    for seed in range(seeds):
        rng = random.Random(1000 + seed)
        tag = f"s{seed}"
        ref2 = root / tag / "ref2"
        sf._build(ref2, u, c)
        out = root / tag / "engine"
        cfg = _engine_cfg(ref2, out)
        p = sf._run_reference("/root/reference/main2.py", ref2)
        if p.returncode:
            all_diffs.append(f"[{tag}] reference run1 crashed")
            continue
        run_pipeline(spark, cfg, version=2)

        # 2-4 random edits between the runs
        for n_edit in range(rng.randint(2, 4)):
            kind = rng.choice(["add_valid", "add_bad", "mutate_bad", "del"])
            if kind == "add_valid":
                (ref2 / "users" / f"new_ok_{n_edit}.json").write_text(
                    json.dumps(sf._user_doc(500 + seed * 10 + n_edit), indent=2)
                )
            elif kind == "add_bad":
                bad = sf._user_doc(600 + seed * 10 + n_edit)
                bad["payload"]["score"] = f"bad-{seed}-{n_edit}"
                (ref2 / "users" / f"new_bad_{n_edit}.json").write_text(
                    json.dumps(bad, indent=2)
                )
            elif kind == "mutate_bad":
                bad = sf._user_doc(90)
                bad["payload"]["score"] = f"mutated-{seed}-{n_edit}"
                (ref2 / "users" / "bad_type.json").write_text(
                    json.dumps(bad, indent=2)
                )
            else:
                victims = sorted(
                    f for f in os.listdir(ref2 / "users")
                    if f.startswith("ev")
                )
                if victims:
                    os.unlink(ref2 / "users" / victims[rng.randrange(len(victims))])

        p = sf._run_reference("/root/reference/main2.py", ref2)
        if p.returncode:
            all_diffs.append(f"[{tag}] reference run2 crashed")
            continue
        run_pipeline(spark, cfg, version=2)

        # v2 rows (multiset, duplicate-free headers)
        for tbl in ("users", "cards"):
            ref_rows, dup = _ref_rows_split(ref2 / f"{tbl}.csv")
            if dup:
                all_diffs.append(f"[{tag}] v2 {tbl}: dup header in reference")
            eh, er = sf._engine_csv_lists(out / f"{tbl}.csv")
            if sorted(map(tuple, ref_rows)) != sorted(map(tuple, er)):
                all_diffs.append(
                    f"[{tag}] v2 {tbl} ROWS differ "
                    f"({len(ref_rows)} vs {len(er)})"
                )
        # errors.log multiset
        if _errors_multi(ref2 / "errors.log") != _errors_multi(
            out / "errors.log.d"
        ):
            all_diffs.append(f"[{tag}] errors.log multisets differ")
        # quarantine latest-wins bytes
        rq = {
            os.path.basename(pth): open(pth, encoding="utf-8").read()
            for pth in glob.glob(str(ref2 / "users_schema_mismatches" / "*"))
        }
        mat = root / tag / "materialized"
        if glob.glob(str(out / "users_q" / "part-*")):
            materialize_quarantine(spark, str(out / "users_q"), str(mat))
        eq = {
            os.path.basename(pth): open(pth, encoding="utf-8").read()
            for pth in glob.glob(str(mat / "*"))
        }
        if rq != eq:
            all_diffs.append(
                f"[{tag}] quarantine latest-wins differ: "
                f"{sorted(set(rq) ^ set(eq))[:3] or [k for k in rq if rq[k] != eq.get(k)][:3]}"
            )
        print(f"seed {seed}: {'OK' if not all_diffs else 'diffs so far ' + str(len(all_diffs))}")
    return all_diffs


SCENARIOS = {
    "rerun_accumulation": scenario_rerun_accumulation,
    "rerun_growth": scenario_rerun_growth,
    "rerun_blank_layout": scenario_rerun_blank_layout,
    "rerun_quarantine_mutation": scenario_rerun_quarantine_mutation,
}


def main() -> int:
    argv = list(sys.argv[1:])
    sweep_n = 0
    if "--sweep" in argv:
        i = argv.index("--sweep")
        sweep_n = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    only = set(argv)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from local_etl_spark.session import get_spark

    spark = get_spark("rerun-fuzz")
    spark.sparkContext.setLogLevel("ERROR")
    all_diffs: list[str] = []
    root = Path(tempfile.mkdtemp(prefix="rerun_fuzz_"))
    if sweep_n:
        d = root / "sweep"
        d.mkdir(parents=True)
        diffs = sweep_randomized(spark, d, sweep_n)
        print(f"randomized sweep ({sweep_n} seeds): {len(diffs)} diff(s)")
        for x in diffs:
            print(f"   {x}")
        print(f"\ntotal scenarios diffs: {len(diffs)}")
        return 1 if diffs else 0
    for name, fn in SCENARIOS.items():
        if only and name not in only:
            continue
        d = root / name
        d.mkdir(parents=True)
        diffs = fn(spark, d)
        if diffs:
            print(f"{name}: {len(diffs)} DIFF(S)")
            for x in diffs:
                print(f"   [{name}] {x}")
        else:
            print(f"{name}: CLEAN")
        all_diffs += diffs
    print(f"\ntotal scenarios diffs: {len(all_diffs)}")
    return 1 if all_diffs else 0


if __name__ == "__main__":
    sys.exit(main())
