"""Filesystem-STATE fuzz (round 13): live-diff the FS layer between
the reference's `next(os.walk(dir))` + `open()` and the engine's
Hadoop-listing scan — symlinks, hardlinks, and link pathologies (the
PATH layer was round 12's axis; this is what the directory's INODES
can do). VERDICT r12 #5.

Scenarios:
  a. symlink_valid — a *.json that is a SYMLINK to a real file
     elsewhere in the corpus tree: os.walk lists it, open() follows;
     Hadoop stats through symlinks. Expect full parity.
  b. symlink_dangling — a *.json symlink whose target does not exist:
     os.walk LISTS it (it is a dir entry), the reference's open()
     crashes with FileNotFoundError; every Spark file source SILENTLY
     DROPS an unstatable entry (measured), so the engine processes
     the rest. Parity is impossible: documented divergence, shapes
     pinned in tests/test_fs_fuzz.py.
  c. symlink_dir_decoy — a SYMLINKED directory named `decoy.json`
     (with a .json inside): os.walk puts symlinked dirs in dir_names
     (skipped, followlinks=False); the engine's listing must likewise
     neither read it as a file nor recurse.
  d. symlink_cycle — a dir symlink inside the data dir pointing back
     at the data dir: non-recursive listings on both sides must not
     loop or change results.
  e. hardlink_dup — the SAME inode under two *.json names (one
     invalid doc): both sides must treat them as two independent
     files (two errors.log lines, two quarantine copies).

NOT testable in this container: chmod-000 unreadability — the suite
runs as root and Linux DAC is bypassed (open() on a 000 file
succeeds for uid 0; verified), so the reference's PermissionError
path cannot be reproduced. The nearest reproducible relative is the
dangling symlink (same OSError family at the same open() site),
which scenario (b) covers.

Usage: python tools_fs_fuzz.py [scenario ...]   (default: all)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import tools_schema_fuzz as sfz  # doc builders
import tools_table_fuzz as tfz  # runner/diff core (shares _SPARK)


def _invalid_user_doc(i: int) -> dict:
    # repairable TYPE violation (score must be a number) — the
    # path-fuzz choice: routes through errors.log + quarantine in
    # BOTH reference versions without tripping main2's NameError
    d = sfz._user_doc(i)
    d["payload"]["score"] = "high"
    return d


def _write_corpus(base: Path, user_names: list[str],
                  invalid: dict[str, dict] | None = None) -> None:
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


def _diff_both(name: str, root: Path, mutate) -> list[str]:
    """Build corpus, apply ``mutate(base)`` to BOTH reference copies
    and the engine input (symlinks preserved), run all three, diff."""
    ref1 = root / "ref1"
    _write_corpus(ref1, ["ev00000.json", "ev00001.json"],
                  {"bad0.json": _invalid_user_doc(9)})
    mutate(ref1)
    ref2 = root / "ref2"
    shutil.copytree(ref1, ref2, symlinks=True)
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


def scen_symlink_valid(root: Path) -> list[str]:
    def mutate(base: Path) -> None:
        store = base / "store"
        store.mkdir()
        (store / "t0.json").write_text(
            json.dumps(sfz._user_doc(7), indent=2)
        )
        os.symlink("../store/t0.json", base / "users" / "ev_link.json")

    return _diff_both("symlink_valid", root, mutate)


def scen_symlink_dangling(root: Path) -> list[str]:
    """BOTH references are expected to crash (FileNotFoundError at
    open()); the engine must NOT crash — Hadoop listings silently
    drop unstatable entries — and must process every real file. A
    'diff' here is a reference that does NOT crash or an engine that
    does."""
    ref1 = root / "ref1"
    _write_corpus(ref1, ["ev00000.json", "ev00001.json"],
                  {"bad0.json": _invalid_user_doc(9)})
    os.symlink("gone-target.json", ref1 / "users" / "dang.json")
    ref2 = root / "ref2"
    shutil.copytree(ref1, ref2, symlinks=True)
    p1 = tfz._run_ref("/root/reference/main.py", ref1)
    p2 = tfz._run_ref("/root/reference/main2.py", ref2)
    diffs = []
    for label, p in (("main.py", p1), ("main2.py", p2)):
        if p.returncode == 0:
            diffs.append(
                f"[symlink_dangling] reference {label} did NOT crash"
            )
        elif "FileNotFoundError" not in p.stderr:
            diffs.append(
                f"[symlink_dangling] reference {label} crashed with an"
                " unexpected shape: "
                + p.stderr.strip().splitlines()[-1][:200]
            )
    out = root / "engine"
    cfg = tfz._engine_cfg(ref1, out)
    for v in (1, 2):
        try:
            tfz._run_engine(cfg, v)
        except Exception as ex:  # noqa: BLE001
            diffs.append(
                f"[symlink_dangling] engine v{v} CRASHED:"
                f" {type(ex).__name__}: {str(ex)[:300]}"
            )
    return diffs


def scen_symlink_dir_decoy(root: Path) -> list[str]:
    def mutate(base: Path) -> None:
        real = base / "realdir"
        real.mkdir()
        (real / "inner.json").write_text(
            json.dumps(sfz._user_doc(7), indent=2)
        )
        os.symlink("../realdir", base / "users" / "decoy.json")

    return _diff_both("symlink_dir_decoy", root, mutate)


def scen_symlink_cycle(root: Path) -> list[str]:
    def mutate(base: Path) -> None:
        os.symlink("../users", base / "users" / "loop")
        os.symlink(".", base / "users" / "self_loop")

    return _diff_both("symlink_cycle", root, mutate)


def scen_hardlink_dup(root: Path) -> list[str]:
    def mutate(base: Path) -> None:
        src = base / "users" / "hl_a.json"
        src.write_text(json.dumps(_invalid_user_doc(8), indent=2))
        os.link(src, base / "users" / "hl_b.json")

    return _diff_both("hardlink_dup", root, mutate)


SCENARIOS = {
    "symlink_valid": scen_symlink_valid,
    "symlink_dangling": scen_symlink_dangling,
    "symlink_dir_decoy": scen_symlink_dir_decoy,
    "symlink_cycle": scen_symlink_cycle,
    "hardlink_dup": scen_hardlink_dup,
}


def main() -> int:
    only = set(sys.argv[1:])
    from local_etl_spark.session import get_spark

    tfz._SPARK[0] = get_spark("fs-fuzz")
    tfz._SPARK[0].sparkContext.setLogLevel("ERROR")
    tmp = Path(tempfile.mkdtemp(prefix="fs_fuzz_"))
    all_diffs: list[str] = []
    for name, fn in SCENARIOS.items():
        if only and name not in only:
            continue
        r = tmp / name
        r.mkdir(parents=True)
        try:
            d = fn(r)
        except Exception as ex:  # noqa: BLE001
            d = [f"[{name}] HARNESS ERROR: {type(ex).__name__}: {ex}"]
        print(f"{name}: {'CLEAN' if not d else f'{len(d)} DIFF(S)'}",
              flush=True)
        for line in d:
            print("   " + line, flush=True)
        all_diffs.extend(d)
    print(f"\ntotal scenario diffs: {len(all_diffs)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
