"""Out-of-suite deep fuzz: MULTI-error mutation corpora live-diffed
against BOTH reference binaries (round-8 harness, kept as a tool so
every round can re-run/extend it — the in-suite fuzz tests cover the
seeded shapes; this sweeps randomized multi-error documents at scale).

Per seed: 20 valid user docs + 5 valid cards + 100 multi-error docs
per schema (2-4 corruptions each, drawn from the suite's _MUT_VALUES
pool with the same still-valid/required-property skip rules). Diffs:
  - errors.log (file, message) multisets — v1 vs v2 vs engine
  - quarantine file SETS and BYTES (invalid docs must quarantine
    verbatim)
  - valid-row CSV equality by event_id

Usage: python tools_deep_fuzz.py [n_seeds] [docs_per_schema]
"""
from __future__ import annotations

import glob
import importlib.util
import json
import os
import random
import shutil
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "fz", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "tests", "test_reference_diff_fuzz.py")
)
fz = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(fz)

from local_etl_spark.session import get_spark
from local_etl_spark.etl.pipeline import run_pipeline

UMETA = {"type": "user", "event_at": "2023-10-05 22:55:01", "event_id": "m"}
UPAY = {"id": 1, "name": "Ada Lovelace", "address": "1 Main St\nCity, ST 11111",
        "job": "Engineer", "score": 5.0}
CMETA = {"type": "card", "event_at": "2023-10-05 22:55:01", "event_id": "c"}
CPAY = {"id": 1, "user_id": 3, "created_by_name": "Grace Hopper",
        "updated_at": "2023-11-05 10:00:00",
        "created_at": "2023-10-05 09:00:00", "active": True}


def _valid_sub(path, val, orig):
    if val == orig or (isinstance(val, type(orig)) and not isinstance(val, bool)):
        return True
    leaf = path[-1]
    if leaf in ("id", "user_id"):
        return isinstance(val, int) and not isinstance(val, bool)
    if leaf == "score":
        return isinstance(val, (int, float)) and not isinstance(val, bool)
    if leaf == "active":
        return isinstance(val, bool)
    if len(path) == 1:
        return isinstance(val, dict)
    return isinstance(val, str)


def multi_corpus(n, seed, meta, pay):
    paths = [("payload", k) for k in pay] + [("metadata", k) for k in meta] \
        + [("payload",), ("metadata",)]
    rng = random.Random(seed)
    out, made = {}, 0
    while made < n:
        doc = {"metadata": json.loads(json.dumps(meta)),
               "payload": json.loads(json.dumps(pay))}
        k_err, placed, used = rng.choice([2, 2, 3, 4]), 0, set()
        for _ in range(12):
            if placed >= k_err:
                break
            path = rng.choice(paths)
            if path in used or (len(path) == 1 and used):
                continue
            val = rng.choice(fz._MUT_VALUES)
            cur = doc
            for kk in path[:-1]:
                cur = cur[kk]
            if not isinstance(cur, dict) or path[-1] not in cur:
                continue
            if _valid_sub(path, val, cur[path[-1]]):
                continue
            if len(path) == 1 and isinstance(val, dict):
                continue  # envelope dict swap -> required-property path
            cur[path[-1]] = val
            used.add(path)
            placed += 1
        if placed < 2:
            continue
        if isinstance(doc["metadata"], dict):
            doc["metadata"]["event_id"] = f"dm{made:03d}"
        out[f"deep_{made:03d}.json"] = doc
        made += 1
    return out


def _ref_qset(d):
    return {os.path.basename(p): open(p, encoding="utf-8").read()
            for p in glob.glob(os.path.join(d, "*.json"))}


def _eng_qset(spark, d):
    return {os.path.basename(r["file_path"]): r["raw"]
            for r in spark.read.parquet(d).collect()}


def run_seed(spark, seed, base: Path, n_docs: int) -> bool:
    ref1 = base / f"s{seed}" / "ref1"
    (ref1 / "users").mkdir(parents=True)
    (ref1 / "cards").mkdir()
    for s in ("user-events-schema.json", "card-events-schema.json"):
        shutil.copy(f"/root/reference/{s}", ref1 / s)
    from local_etl_spark.etl.corpus import generate
    for i, raw in enumerate(generate(20, seed=seed, corrupt_rate=0, repair_rate=0)):
        (ref1 / "users" / f"ev{i:05d}.json").write_text(
            json.dumps(json.loads(raw), indent=2))
    for i in range(5):
        doc = {"metadata": {**CMETA, "event_id": f"c{i}"},
               "payload": {**CPAY, "id": i}}
        (ref1 / "cards" / f"cd{i:05d}.json").write_text(json.dumps(doc, indent=2))
    for fn, doc in multi_corpus(n_docs, seed, UMETA, UPAY).items():
        (ref1 / "users" / fn).write_text(json.dumps(doc, indent=2))
    for fn, doc in multi_corpus(n_docs, seed * 7 + 1, CMETA, CPAY).items():
        (ref1 / "cards" / fn).write_text(json.dumps(doc, indent=2))

    ref2 = base / f"s{seed}" / "ref2"
    shutil.copytree(ref1, ref2)
    fz._run_reference("/root/reference/main.py", ref1)
    fz._run_reference("/root/reference/main2.py", ref2)

    out = base / f"s{seed}" / "engine"
    cfg = fz._engine_cfg(ref1, out)
    run_pipeline(spark, cfg, version=2)

    ok = True
    r = fz._ref_error_entries(str(ref1 / "errors.log"))
    e = fz._engine_error_entries(str(out / "errors.log.d"))
    r2 = fz._ref_error_entries(str(ref2 / "errors.log"))
    if r != r2:
        print(f"seed {seed}: v1/v2 reference DISAGREE: {sorted(r ^ r2)[:3]}")
        ok = False
    if r != e:
        print(f"seed {seed}: errors.log diverges: missing "
              f"{sorted(r - e)[:3]} extra {sorted(e - r)[:3]}")
        ok = False
    # quarantine: same files, same text (reference moves files; the
    # engine records (file_path, raw) rows in a parquet sink)
    for table, qdir in (("users", "users_q"), ("cards", "cards_q")):
        rq = _ref_qset(str(ref1 / f"{table}_schema_mismatches"))
        eq = _eng_qset(spark, str(out / qdir))
        if set(rq) != set(eq):
            print(f"seed {seed}: {table} quarantine sets differ: "
                  f"{sorted(set(rq) ^ set(eq))[:3]}")
            ok = False
        else:
            bad = [k for k in rq if rq[k] != eq[k]]
            if bad:
                print(f"seed {seed}: {table} quarantine bytes differ: {bad[:3]}")
                ok = False
    # valid rows survive identically
    ref_users = {row["event_id"]: row for row in fz._ref_rows(str(ref2 / "users.csv"))}
    eng_users = {row["event_id"]: row
                 for row in fz._engine_rows(str(out / "users.csv"))}
    if ref_users != eng_users:
        ks = [k for k in set(ref_users) | set(eng_users)
              if ref_users.get(k) != eng_users.get(k)]
        print(f"seed {seed}: users.csv rows differ: {ks[:3]}")
        ok = False
    nq = sum(len(_ref_qset(str(ref1 / (t + '_schema_mismatches'))))
             for t in ('users', 'cards'))
    print(f"seed {seed}: errors {len(r)}, quarantine {nq}, "
          f"valid users {len(ref_users)} — {'OK' if ok else 'DIVERGED'}",
          flush=True)
    return ok


def main() -> None:
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    spark = get_spark(cpus=8)
    base = Path("/tmp/deep_fuzz_tool")
    shutil.rmtree(base, ignore_errors=True)
    seeds = [11 + 13 * i for i in range(n_seeds)]
    ok = True
    for seed in seeds:
        ok = run_seed(spark, seed, base, n_docs) and ok
    print("DEEP FUZZ:", "0 divergences" if ok else "DIVERGENCES FOUND")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
