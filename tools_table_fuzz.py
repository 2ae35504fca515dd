"""Multi-table / registry-dimension fuzz (round 10): live-diff the
PER-TABLE LOOP, not the per-doc path (VERDICT r9 #6 — rounds 1-9
fuzzed document bytes and schema files; the least-fuzzed surface left
is main.py:150-193 / main2.py:278-330's table iteration itself).

Scenarios:
  a. cross_schema_docs — a valid CARDS doc sits in the users data dir
     (and vice versa): which fields repair, what do prefix/suffix get?
  b. shared_output_v1 / shared_output_v2 — both tables configured onto
     ONE output file (patched-config copies of the reference scripts):
     append interleaving + the v2 tell()==0 header-once check vs v1's
     unconditional writeheader.
  c. empty_data_dir — a table whose dir exists but holds no files:
     header-only CSV + zeroed counters.
  d. json_case_files — files named *.JSON / *.Json / *.jsonx / bare
     '.json': the endswith('.json') filter at main.py:163-167 vs the
     engine's pathGlobFilter.
  e. dup_filename_both_dirs — the same (invalid) filename in both
     tables' dirs: errors.log attribution by full path, quarantine
     separation by table dir.
  f. nested_subdir — a subdirectory with .json files inside the data
     dir: next(os.walk(...)) reads top-level only.

The reference's table configs are hardcoded dict literals, so
scenario b runs PATCHED COPIES of the scripts (textual substitution
of the output-file values in a /tmp copy — live-diffing a
reconfigured reference, the config.toml it never actually loads).

Stable findings get pinned in tests/test_table_fuzz.py.

Usage: python tools_table_fuzz.py [scenario ...]   (default: all)
"""

from __future__ import annotations

import csv
import glob
import json
import os
import re
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import tools_schema_fuzz as sfz  # reuse doc builders + low-level diffs


def _write_docs(base: Path) -> None:
    (base / "users").mkdir(parents=True, exist_ok=True)
    (base / "cards").mkdir(exist_ok=True)
    for s in ("user-events-schema.json", "card-events-schema.json"):
        shutil.copy(f"/root/reference/{s}", base / s)
    for i in range(4):
        (base / "users" / f"ev{i:05d}.json").write_text(
            json.dumps(sfz._user_doc(i), indent=2)
        )
        (base / "cards" / f"cd{i:05d}.json").write_text(
            json.dumps(sfz._card_doc(i), indent=2)
        )


def _run_ref(script: str, cwd: Path, patch: dict[str, str] | None = None):
    """Run a reference script (optionally with config values textually
    substituted into a /tmp copy) and return the CompletedProcess."""
    if patch:
        src = open(script, encoding="utf-8").read()
        for old, new in patch.items():
            assert old in src, f"patch target {old!r} not in {script}"
            src = src.replace(old, new)
        target = cwd / ("patched_" + os.path.basename(script))
        target.write_text(src)
        script = str(target)
    return subprocess.run(
        [sys.executable, script],
        cwd=cwd,
        capture_output=True,
        text=True,
        timeout=600,
    )


def _ref_counts(stdout: str) -> list[tuple[int, int, int]]:
    """(file_count, valid, invalid) per table from the stdout report."""
    total = re.findall(r"Total JSON data files[^:]*: (\d+)", stdout)
    valid = re.findall(r"Number of files that match schema: (\d+)", stdout)
    bad = re.findall(r"Number of files with schema errors: (\d+)", stdout)
    return [
        (int(t), int(v), int(b)) for t, v, b in zip(total, valid, bad)
    ]


def _engine_cfg(base: Path, out: Path, shared_payload: bool = False):
    from local_etl_spark.etl.pipeline import PipelineConfig, TableConfig

    pay_u = str(out / ("shared.csv" if shared_payload else "users.csv"))
    pay_c = str(out / ("shared.csv" if shared_payload else "cards.csv"))
    return PipelineConfig(
        tables=(
            TableConfig(
                name="users",
                schema_file=str(base / "user-events-schema.json"),
                data_dir=str(base / "users"),
                schema_mismatch_dir=str(out / "users_q"),
                output_file=str(
                    out / ("shared_flat.csv" if shared_payload else "users_flat.csv")
                ),
                payload_file=pay_u,
                metadata_file=str(out / "metadata.csv"),
            ),
            TableConfig(
                name="cards",
                schema_file=str(base / "card-events-schema.json"),
                data_dir=str(base / "cards"),
                schema_mismatch_dir=str(out / "cards_q"),
                output_file=str(
                    out / ("shared_flat.csv" if shared_payload else "cards_flat.csv")
                ),
                payload_file=pay_c,
                metadata_file=str(out / "metadata.csv"),
            ),
        ),
        base_dir=str(out),
    )


def _engine_all_rows(part_dir) -> list[list[str]]:
    """EVERY csv row (headers included) across part files — the
    shared-file scenarios compare header+data multisets because per-
    part headers are the engine's documented layout convention."""
    rows: list[list[str]] = []
    for part in sorted(glob.glob(os.path.join(str(part_dir), "part-*.csv"))):
        with open(part, newline="", encoding="utf-8") as fh:
            rows.extend(csv.reader(fh))
    return rows


def _errors_fullpath(path_or_dir) -> set[tuple[str, str]]:
    """errors.log entries keyed by FULL recorded path (the dup-filename
    scenario needs attribution, which basenames would mask)."""
    out: set[tuple[str, str]] = set()
    paths = (
        [str(path_or_dir)]
        if os.path.isfile(str(path_or_dir))
        else glob.glob(os.path.join(str(path_or_dir), "part-*"))
    )
    for p in paths:
        for line in open(p, encoding="utf-8").read().splitlines():
            if not line.strip():
                continue
            parts = line.split(", ", 4)
            # normalize: ref records the path it opened (absolute via
            # CWD join); engine records the absolute scan path
            out.add((os.path.normpath(parts[3]), parts[4]))
    return out


def _std_diff(name: str, ref1: Path, ref2: Path, out: Path) -> list[str]:
    """The tools_schema_fuzz comparison core over default table
    configs (v1 flat CSVs, v2 payload+metadata, errors.log,
    quarantine), path-normalized errors."""
    diffs: list[str] = []
    for tbl in ("users", "cards"):
        ref_rows = sfz._csv_lists(ref1 / f"{tbl}.csv")
        eh, er = sfz._engine_csv_lists(out / f"{tbl}_flat.csv")
        if ref_rows and ref_rows[0] != eh:
            diffs.append(f"[{name}] v1 {tbl} HEADER: ref={ref_rows[0]} eng={eh}")
        if sorted(map(tuple, ref_rows[1:])) != sorted(map(tuple, er)):
            diffs.append(
                f"[{name}] v1 {tbl} ROWS differ "
                f"({len(ref_rows) - 1 if ref_rows else 0} vs {len(er)})"
            )
        ref_rows2 = sfz._csv_lists(ref2 / f"{tbl}.csv")
        eh2, er2 = sfz._engine_csv_lists(out / f"{tbl}.csv")
        if ref_rows2 and ref_rows2[0] != eh2:
            diffs.append(f"[{name}] v2 {tbl} HEADER: ref={ref_rows2[0]} eng={eh2}")
        if sorted(map(tuple, ref_rows2[1:])) != sorted(map(tuple, er2)):
            diffs.append(
                f"[{name}] v2 {tbl} ROWS differ "
                f"({len(ref_rows2) - 1 if ref_rows2 else 0} vs {len(er2)})"
            )
        # quarantine file sets + bytes
        rq = {
            os.path.basename(p): open(p, encoding="utf-8").read()
            for p in glob.glob(str(ref2 / f"{tbl}_schema_mismatches" / "*"))
        }
        qdir = str(out / f"{tbl}_q")
        eq: dict[str, str] = {}
        if glob.glob(os.path.join(qdir, "part-*")):
            eq = {
                os.path.basename(r["file_path"]): r["raw"]
                for r in _SPARK[0].read.parquet(qdir).collect()
            }
        if set(rq) != set(eq):
            diffs.append(
                f"[{name}] {tbl} quarantine SETS: only_ref="
                f"{sorted(set(rq) - set(eq))[:3]} only_eng="
                f"{sorted(set(eq) - set(rq))[:3]}"
            )
        elif [k for k in rq if rq[k] != eq[k]]:
            diffs.append(f"[{name}] {tbl} quarantine BYTES differ")
    ref_errs = sfz._errors(ref2 / "errors.log")
    eng_errs = sfz._errors(out / "errors.log.d")
    if ref_errs != eng_errs:
        diffs.append(
            f"[{name}] errors.log: only_ref={sorted(ref_errs - eng_errs)[:3]}"
            f" only_eng={sorted(eng_errs - ref_errs)[:3]}"
        )
    # v2 metadata (shared file, both tables): data-row multiset
    ref_meta = sfz._csv_lists(ref2 / "metadata.csv")
    eh, er = (None, [])
    try:
        eh, er = sfz._engine_csv_lists(out / "metadata.csv")
    except AssertionError as ex:
        diffs.append(f"[{name}] v2 metadata parts: {ex}")
    if ref_meta and eh is not None and ref_meta[0] != eh:
        diffs.append(f"[{name}] v2 metadata HEADER: {ref_meta[0]} vs {eh}")
    if sorted(map(tuple, [r for r in ref_meta[1:] if r])) != sorted(
        map(tuple, er)
    ):
        diffs.append(
            f"[{name}] v2 metadata ROWS differ "
            f"({len(ref_meta) - 1 if ref_meta else 0} vs {len(er)})"
        )
    return diffs


_SPARK = [None]


def _run_engine(cfg, version: int):
    from local_etl_spark.etl.pipeline import run_pipeline

    return run_pipeline(_SPARK[0], cfg, version=version)


# ----------------------------------------------------------------- #
# scenarios


def scen_cross_schema_docs(root: Path) -> list[str]:
    ref1 = root / "ref1"
    _write_docs(ref1)
    # a valid CARDS doc in the users dir, a valid USERS doc in cards
    (ref1 / "users" / "stray_card.json").write_text(
        json.dumps(sfz._card_doc(7), indent=2)
    )
    (ref1 / "cards" / "stray_user.json").write_text(
        json.dumps(sfz._user_doc(7), indent=2)
    )
    ref2 = root / "ref2"
    shutil.copytree(ref1, ref2)
    p1 = _run_ref("/root/reference/main.py", ref1)
    p2 = _run_ref("/root/reference/main2.py", ref2)
    diffs = []
    for label, p in (("main.py", p1), ("main2.py", p2)):
        if p.returncode != 0:
            diffs.append(
                f"[cross] reference {label} CRASHED: "
                + p.stderr.strip().splitlines()[-1][:160]
            )
    out = root / "engine"
    cfg = _engine_cfg(ref1, out)
    for v in (1, 2):
        _run_engine(cfg, v)
    if p1.returncode == 0 and p2.returncode == 0:
        diffs += _std_diff("cross", ref1, ref2, out)
    return diffs


def scen_shared_output(root: Path, version: int) -> list[str]:
    name = f"shared_v{version}"
    ref = root / "ref"
    _write_docs(ref)
    if version == 1:
        patch = {
            '"output_file": "users.csv"': '"output_file": "shared.csv"',
            '"output_file": "cards.csv"': '"output_file": "shared.csv"',
        }
        p = _run_ref("/root/reference/main.py", ref, patch)
        ref_file = ref / "shared.csv"
        eng_dir = "shared_flat.csv"
    else:
        patch = {
            '"payload_file": "users.csv"': '"payload_file": "shared.csv"',
            '"payload_file": "cards.csv"': '"payload_file": "shared.csv"',
        }
        p = _run_ref("/root/reference/main2.py", ref, patch)
        ref_file = ref / "shared.csv"
        eng_dir = "shared.csv"
    diffs = []
    if p.returncode != 0:
        diffs.append(
            f"[{name}] patched reference CRASHED: "
            + p.stderr.strip().splitlines()[-1][:160]
        )
        return diffs
    out = root / "engine"
    cfg = _engine_cfg(ref, out, shared_payload=True)
    _run_engine(cfg, version)
    ref_rows = sfz._csv_lists(ref_file)
    eng_rows = _engine_all_rows(out / eng_dir)
    # v1 writes BOTH headers as in-file rows (no tell check); v2 writes
    # the first table's header only — the engine's per-part headers
    # carry each table's header exactly once per part-writing table, so
    # the comparable invariant is: DATA rows as a multiset, plus which
    # headers appear at all.
    data_ref = [tuple(r) for r in ref_rows if r and not (r[0] == "id" and ("name" in r or "user_id" in r))]
    data_eng = [tuple(r) for r in eng_rows if r and not (r[0] == "id" and ("name" in r or "user_id" in r))]
    if sorted(data_ref) != sorted(data_eng):
        diffs.append(
            f"[{name}] shared-file DATA rows differ "
            f"({len(data_ref)} vs {len(data_eng)})"
        )
    hdr_ref = {tuple(r) for r in ref_rows if r and r[0] == "id" and ("name" in r or "user_id" in r)}
    hdr_eng = {tuple(r) for r in eng_rows if r and r[0] == "id" and ("name" in r or "user_id" in r)}
    if version == 1 and hdr_ref != hdr_eng:
        diffs.append(
            f"[{name}] header set: ref={sorted(hdr_ref)} eng={sorted(hdr_eng)}"
        )
    if version == 2 and not (hdr_ref <= hdr_eng):
        # ref keeps only the first writer's header; engine keeps both
        # (per-part) — ref's must be a subset of the engine's
        diffs.append(
            f"[{name}] first-writer header missing engine-side: "
            f"ref={sorted(hdr_ref)} eng={sorted(hdr_eng)}"
        )
    return diffs


def scen_empty_data_dir(root: Path) -> list[str]:
    ref1 = root / "ref1"
    _write_docs(ref1)
    for f in (ref1 / "users").iterdir():
        f.unlink()  # users dir exists but is EMPTY
    ref2 = root / "ref2"
    shutil.copytree(ref1, ref2)
    p1 = _run_ref("/root/reference/main.py", ref1)
    p2 = _run_ref("/root/reference/main2.py", ref2)
    diffs = []
    for label, p in (("main.py", p1), ("main2.py", p2)):
        if p.returncode != 0:
            diffs.append(
                f"[empty_dir] reference {label} CRASHED: "
                + p.stderr.strip().splitlines()[-1][:160]
            )
    out = root / "engine"
    cfg = _engine_cfg(ref1, out)
    metrics = {}
    for v in (1, 2):
        metrics[v] = _run_engine(cfg, v)
    # counters: ref prints 0/0/0 for users
    for label, p in (("v1", p1), ("v2", p2)):
        counts = _ref_counts(p.stdout)
        if counts and counts[0] != (0, 0, 0):
            diffs.append(f"[empty_dir] ref {label} users counts {counts[0]}")
    m = metrics[2][0]
    if (m.file_count, m.valid_count, m.invalid_count) != (0, 0, 0):
        diffs.append(
            f"[empty_dir] engine users metrics "
            f"{(m.file_count, m.valid_count, m.invalid_count)}"
        )
    # header-only CSV: reference writes the header line even with zero
    # rows; what does the engine's CSV sink do with an empty frame?
    ref_users = sfz._csv_lists(ref2 / "users.csv")
    eh, er = sfz._engine_csv_lists(out / "users.csv")
    if ref_users and not er:
        if eh is None:
            diffs.append(
                "[empty_dir] v2 users: ref wrote header-only CSV "
                f"{ref_users[0]}, engine wrote NO part files"
            )
        elif eh != ref_users[0]:
            diffs.append(f"[empty_dir] v2 users header {ref_users[0]} vs {eh}")
    return diffs


def scen_json_case_files(root: Path) -> list[str]:
    ref1 = root / "ref1"
    _write_docs(ref1)
    u = ref1 / "users"
    # non-matching extensions: the reference's endswith('.json') skips
    # these entirely (not counted, not quarantined)
    (u / "upper.JSON").write_text(json.dumps(sfz._user_doc(11)))
    (u / "mixed.Json").write_text(json.dumps(sfz._user_doc(12)))
    (u / "suffixed.jsonx").write_text(json.dumps(sfz._user_doc(13)))
    (u / "backup.json.bak").write_text(json.dumps(sfz._user_doc(14)))
    (u / "notes.txt").write_text("not json at all")
    # bare '.json': endswith matches; hidden-file semantics may differ
    (u / ".json").write_text(json.dumps(sfz._user_doc(15)))
    ref2 = root / "ref2"
    shutil.copytree(ref1, ref2)
    p1 = _run_ref("/root/reference/main.py", ref1)
    p2 = _run_ref("/root/reference/main2.py", ref2)
    diffs = []
    for label, p in (("main.py", p1), ("main2.py", p2)):
        if p.returncode != 0:
            diffs.append(
                f"[json_case] reference {label} CRASHED: "
                + p.stderr.strip().splitlines()[-1][:160]
            )
    out = root / "engine"
    cfg = _engine_cfg(ref1, out)
    metrics = {}
    for v in (1, 2):
        metrics[v] = _run_engine(cfg, v)
    if p1.returncode == 0 and p2.returncode == 0:
        diffs += _std_diff("json_case", ref1, ref2, out)
        counts = _ref_counts(p2.stdout)
        m = metrics[2][0]
        if counts and counts[0] != (
            m.file_count,
            m.valid_count,
            m.invalid_count,
        ):
            diffs.append(
                f"[json_case] users counters ref={counts[0]} engine="
                f"{(m.file_count, m.valid_count, m.invalid_count)}"
            )
    return diffs


def scen_dup_filename_both_dirs(root: Path) -> list[str]:
    ref1 = root / "ref1"
    _write_docs(ref1)
    # same FILENAME in both dirs, both invalid (wrong-type values) and
    # with DIFFERENT bytes — errors.log must attribute by path and the
    # quarantine copies must separate by table dir
    bad_u = sfz._user_doc(21)
    bad_u["payload"]["score"] = "high"
    bad_c = sfz._card_doc(21)
    bad_c["payload"]["active"] = "yes"
    (ref1 / "users" / "dup.json").write_text(json.dumps(bad_u, indent=2))
    (ref1 / "cards" / "dup.json").write_text(json.dumps(bad_c, indent=2))
    ref2 = root / "ref2"
    shutil.copytree(ref1, ref2)
    p1 = _run_ref("/root/reference/main.py", ref1)
    p2 = _run_ref("/root/reference/main2.py", ref2)
    diffs = []
    for label, p in (("main.py", p1), ("main2.py", p2)):
        if p.returncode != 0:
            diffs.append(
                f"[dup_file] reference {label} CRASHED: "
                + p.stderr.strip().splitlines()[-1][:160]
            )
    out = root / "engine"
    cfg = _engine_cfg(ref1, out)
    for v in (1, 2):
        _run_engine(cfg, v)
    if p1.returncode == 0 and p2.returncode == 0:
        diffs += _std_diff("dup_file", ref1, ref2, out)
        # full-path attribution: relative ref paths vs absolute engine
        # paths — compare (dirname-tail, basename, message)
        def tails(entries):
            return {
                (os.path.basename(os.path.dirname(p)), os.path.basename(p), m)
                for p, m in entries
            }

        r = tails(_errors_fullpath(ref2 / "errors.log"))
        e = tails(_errors_fullpath(out / "errors.log.d"))
        if r != e:
            diffs.append(
                f"[dup_file] path attribution: only_ref={sorted(r - e)[:3]} "
                f"only_eng={sorted(e - r)[:3]}"
            )
    return diffs


def scen_nested_subdir(root: Path) -> list[str]:
    ref1 = root / "ref1"
    _write_docs(ref1)
    sub = ref1 / "users" / "archive"
    sub.mkdir()
    (sub / "nested.json").write_text(json.dumps(sfz._user_doc(31), indent=2))
    ref2 = root / "ref2"
    shutil.copytree(ref1, ref2)
    p1 = _run_ref("/root/reference/main.py", ref1)
    p2 = _run_ref("/root/reference/main2.py", ref2)
    diffs = []
    for label, p in (("main.py", p1), ("main2.py", p2)):
        if p.returncode != 0:
            diffs.append(
                f"[nested] reference {label} CRASHED: "
                + p.stderr.strip().splitlines()[-1][:160]
            )
    out = root / "engine"
    cfg = _engine_cfg(ref1, out)
    eng_crash = {}
    for v in (1, 2):
        try:
            _run_engine(cfg, v)
        except Exception as ex:  # noqa: BLE001
            eng_crash[v] = f"{type(ex).__name__}: {ex}"
    for v, msg in eng_crash.items():
        diffs.append(f"[nested] engine v{v} CRASHED: {msg[:300]}")
    if p1.returncode == 0 and p2.returncode == 0 and not eng_crash:
        diffs += _std_diff("nested", ref1, ref2, out)
    return diffs


SCENARIOS = {
    "cross_schema_docs": scen_cross_schema_docs,
    "shared_output_v1": lambda root: scen_shared_output(root, 1),
    "shared_output_v2": lambda root: scen_shared_output(root, 2),
    "empty_data_dir": scen_empty_data_dir,
    "json_case_files": scen_json_case_files,
    "dup_filename_both_dirs": scen_dup_filename_both_dirs,
    "nested_subdir": scen_nested_subdir,
}


def main() -> int:
    only = set(sys.argv[1:])
    from local_etl_spark.session import get_spark

    _SPARK[0] = get_spark("table-fuzz")
    _SPARK[0].sparkContext.setLogLevel("ERROR")
    tmp = Path(tempfile.mkdtemp(prefix="table_fuzz_"))
    all_diffs: list[str] = []
    for name, fn in SCENARIOS.items():
        if only and name not in only:
            continue
        root = tmp / name
        root.mkdir(parents=True)
        try:
            d = fn(root)
        except Exception as ex:  # noqa: BLE001
            d = [f"[{name}] HARNESS ERROR: {type(ex).__name__}: {ex}"]
        print(f"{name}: {'CLEAN' if not d else f'{len(d)} DIFF(S)'}", flush=True)
        for line in d:
            print("   " + line, flush=True)
        all_diffs.extend(d)
    print(f"\ntotal scenario diffs: {len(all_diffs)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
