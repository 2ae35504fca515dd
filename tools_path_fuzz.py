"""Filename/directory-shape fuzz (round 12): live-diff the PATH LAYER
between the reference's `next(os.walk(dir))` + `endswith('.json')`
(main.py:150-167, main2.py:295-318) and the engine's Hadoop-listing
binaryFile scan with pathGlobFilter (etl/pipeline.read_event_docs) —
the last never-fuzzed surface (VERDICT r11 #4). Rounds 1-11 fuzzed
document bytes, schema files, the table loop, and re-run semantics;
the question here is whether a FILENAME can make the two listings
disagree.

Scenarios:
  a. glob_meta   — filenames containing glob metacharacters
     (`ev[1].json`, `ev*.json`, `ev?.json`, `ev{a,b}.json`, a space)
     plus an INVALID doc in a metachar name: does Spark's glob layer
     interpret what os.walk lists literally? Do errors.log/quarantine
     record the same full path?
  b. uri_hazard  — filenames with URI-special bytes (`ev%41.json`,
     `ev#1.json`, `ev+1.json`, `ev&x.json`, `ev=1.json`): Hadoop Path
     round-trips through URIs; a percent or fragment that decodes
     differently would corrupt file_path attribution.
  c. colon_name  — `ev:1.json`: Hadoop historically REJECTS colons in
     path names (HADOOP-3257) where os.walk does not care.
  d. dir_named_json — a DIRECTORY named `decoy.json` inside the data
     dir (with a .json file inside it): os.walk puts it in dir_names
     (skipped); the engine's glob filter must not read the directory
     (or its children) either.
  e. missing_data_dir — the users data dir does not exist: the
     reference crashes (StopIteration off next(os.walk)); what does
     the engine do? Both-crash is parity-of-outcome; the shapes are
     pinned in tests/test_path_fuzz.py.

Stable findings get pinned in tests/test_path_fuzz.py.

Usage: python tools_path_fuzz.py [scenario ...]   (default: all)
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import tools_schema_fuzz as sfz  # doc builders + low-level diffs
import tools_table_fuzz as tfz  # runner/diff core (shares _SPARK)


def _invalid_user_doc(i: int) -> dict:
    # a repairable TYPE violation (score must be a number): routes to
    # errors.log + quarantine in BOTH reference versions — a missing
    # 'name' would instead trip main2.py's documented NameError crash
    # (main2.py:242) and mask the path-layer comparison
    d = sfz._user_doc(i)
    d["payload"]["score"] = "high"
    return d


def _write_corpus(base: Path, user_names: list[str], invalid: dict[str, dict] | None = None) -> None:
    (base / "users").mkdir(parents=True, exist_ok=True)
    (base / "cards").mkdir(exist_ok=True)
    for s in ("user-events-schema.json", "card-events-schema.json"):
        shutil.copy(f"/root/reference/{s}", base / s)
    for i, name in enumerate(user_names):
        (base / "users" / name).write_text(
            json.dumps(sfz._user_doc(i), indent=2)
        )
    for name, doc in (invalid or {}).items():
        (base / "users" / name).write_text(json.dumps(doc, indent=2))
    for i in range(2):
        (base / "cards" / f"cd{i:05d}.json").write_text(
            json.dumps(sfz._card_doc(i), indent=2)
        )


def _live_diff(name: str, root: Path, user_names: list[str], invalid: dict[str, dict] | None = None) -> list[str]:
    ref1 = root / "ref1"
    _write_corpus(ref1, user_names, invalid)
    ref2 = root / "ref2"
    shutil.copytree(ref1, ref2)
    p1 = tfz._run_ref("/root/reference/main.py", ref1)
    p2 = tfz._run_ref("/root/reference/main2.py", ref2)
    diffs = []
    for label, p in (("main.py", p1), ("main2.py", p2)):
        if p.returncode != 0:
            diffs.append(
                f"[{name}] reference {label} CRASHED: "
                + p.stderr.strip().splitlines()[-1][:200]
            )
    out = root / "engine"
    cfg = tfz._engine_cfg(ref1, out)
    for v in (1, 2):
        try:
            tfz._run_engine(cfg, v)
        except Exception as ex:  # noqa: BLE001
            diffs.append(
                f"[{name}] engine v{v} CRASHED:"
                f" {type(ex).__name__}: {str(ex)[:300]}"
            )
            return diffs
    if p1.returncode == 0 and p2.returncode == 0:
        diffs += tfz._std_diff(name, ref1, ref2, out)
    return diffs


def scen_glob_meta(root: Path) -> list[str]:
    names = [
        "ev00000.json",  # control
        "ev[1].json",
        "ev*.json",
        "ev?.json",
        "ev{a,b}.json",
        "ev 5.json",
    ]
    return _live_diff(
        "glob_meta", root, names, {"bad[2].json": _invalid_user_doc(9)}
    )


def scen_uri_hazard(root: Path) -> list[str]:
    names = [
        "ev00000.json",
        "ev%41.json",
        "ev#1.json",
        "ev+1.json",
        "ev&x.json",
        "ev=1.json",
    ]
    return _live_diff(
        "uri_hazard", root, names, {"bad%7e.json": _invalid_user_doc(9)}
    )


def scen_colon_name(root: Path) -> list[str]:
    return _live_diff("colon_name", root, ["ev00000.json", "ev:1.json"])


def scen_colon_dir(root: Path) -> list[str]:
    """Colon-named child DIRECTORIES (ADVICE r12): unlike a colon
    FILE read as data (whose checksum-sibling Path construction
    throws), Hadoop's dir LISTING tolerates colon-named children —
    measured: the scan completes and reads every normal file. The
    reference's next(os.walk(...)) never opens dirs either, so both
    engines skip them; this scenario pins that no repair branch is
    needed for colon DIRS (with and without a '.json' suffix, plus a
    file inside so os.walk's recursion difference can't surface)."""
    ref1 = root / "ref1"
    _write_corpus(ref1, ["ev00000.json", "ev00001.json"],
                  {"bad0.json": _invalid_user_doc(9)})
    for dname in ("we:ird", "also:bad.json"):
        d = ref1 / "users" / dname
        d.mkdir()
        (d / "inner.json").write_text(json.dumps(sfz._user_doc(7), indent=2))
    ref2 = root / "ref2"
    shutil.copytree(ref1, ref2)
    p1 = tfz._run_ref("/root/reference/main.py", ref1)
    p2 = tfz._run_ref("/root/reference/main2.py", ref2)
    diffs = []
    for label, p in (("main.py", p1), ("main2.py", p2)):
        if p.returncode != 0:
            diffs.append(
                f"[colon_dir] reference {label} CRASHED: "
                + p.stderr.strip().splitlines()[-1][:200]
            )
    out = root / "engine"
    cfg = tfz._engine_cfg(ref1, out)
    for v in (1, 2):
        try:
            tfz._run_engine(cfg, v)
        except Exception as ex:  # noqa: BLE001
            diffs.append(
                f"[colon_dir] engine v{v} CRASHED:"
                f" {type(ex).__name__}: {str(ex)[:300]}"
            )
            return diffs
    if p1.returncode == 0 and p2.returncode == 0:
        diffs += tfz._std_diff("colon_dir", ref1, ref2, out)
    return diffs


def scen_dir_named_json(root: Path) -> list[str]:
    ref1 = root / "ref1"
    _write_corpus(ref1, ["ev00000.json", "ev00001.json"])
    decoy = ref1 / "users" / "decoy.json"
    decoy.mkdir()
    (decoy / "inner.json").write_text(
        json.dumps(sfz._user_doc(7), indent=2)
    )
    ref2 = root / "ref2"
    shutil.copytree(ref1, ref2)
    p1 = tfz._run_ref("/root/reference/main.py", ref1)
    p2 = tfz._run_ref("/root/reference/main2.py", ref2)
    diffs = []
    for label, p in (("main.py", p1), ("main2.py", p2)):
        if p.returncode != 0:
            diffs.append(
                f"[dir_named_json] reference {label} CRASHED: "
                + p.stderr.strip().splitlines()[-1][:200]
            )
    out = root / "engine"
    cfg = tfz._engine_cfg(ref1, out)
    for v in (1, 2):
        try:
            tfz._run_engine(cfg, v)
        except Exception as ex:  # noqa: BLE001
            diffs.append(
                f"[dir_named_json] engine v{v} CRASHED:"
                f" {type(ex).__name__}: {str(ex)[:300]}"
            )
            return diffs
    if p1.returncode == 0 and p2.returncode == 0:
        diffs += tfz._std_diff("dir_named_json", ref1, ref2, out)
    return diffs


def scen_missing_data_dir(root: Path) -> list[str]:
    """Both sides are EXPECTED to fail; report the SHAPES so the pin
    test can assert them. A 'diff' here is only a silent success."""
    ref1 = root / "ref1"
    _write_corpus(ref1, ["ev00000.json"])
    shutil.rmtree(ref1 / "users")
    ref2 = root / "ref2"
    shutil.copytree(ref1, ref2)
    p1 = tfz._run_ref("/root/reference/main.py", ref1)
    p2 = tfz._run_ref("/root/reference/main2.py", ref2)
    diffs = []
    for label, p in (("main.py", p1), ("main2.py", p2)):
        tail = p.stderr.strip().splitlines()[-1] if p.stderr.strip() else ""
        print(f"   [missing_data_dir] reference {label}: rc={p.returncode} {tail[:120]}")
        if p.returncode == 0:
            diffs.append(
                f"[missing_data_dir] reference {label} unexpectedly OK"
            )
    out = root / "engine"
    cfg = tfz._engine_cfg(ref1, out)
    for v in (1, 2):
        try:
            tfz._run_engine(cfg, v)
            diffs.append(
                f"[missing_data_dir] engine v{v} unexpectedly OK"
            )
        except Exception as ex:  # noqa: BLE001
            print(
                f"   [missing_data_dir] engine v{v}:"
                f" {type(ex).__name__}: {str(ex)[:160]}"
            )
    return diffs


SCENARIOS = {
    "glob_meta": scen_glob_meta,
    "uri_hazard": scen_uri_hazard,
    "colon_name": scen_colon_name,
    "colon_dir": scen_colon_dir,
    "dir_named_json": scen_dir_named_json,
    "missing_data_dir": scen_missing_data_dir,
}


def main() -> int:
    only = set(sys.argv[1:])
    from local_etl_spark.session import get_spark

    tfz._SPARK[0] = get_spark("path-fuzz")
    tfz._SPARK[0].sparkContext.setLogLevel("ERROR")
    tmp = Path(tempfile.mkdtemp(prefix="path_fuzz_"))
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
    raise SystemExit(main())
