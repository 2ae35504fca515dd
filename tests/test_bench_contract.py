"""Pins for bench.contract_line — the ONE stdout JSON line the driver
records (last-2000-chars capture). No Spark needed."""

from __future__ import annotations

import json

from bench import contract_line


def _mk(n: int) -> dict:
    return {f"some_quite_long_query_name_{i:03d}": 0.1 + i * 0.037 for i in range(n)}


def test_small_map_keeps_full_precision():
    line = contract_line(12.345678, _mk(10), 0.1)
    d = json.loads(line)
    assert d["metric"] == "headline-suite-total"
    assert d["value"] == 12.345678
    assert len(d["queries"]) == 10
    assert "omitted_cheapest" not in d
    assert len(line) <= 1850


def test_precision_steps_down_before_pruning():
    # 46 entries of these name lengths: over the cap at 6 significant
    # digits, under it at a reduced level — all entries survive
    timings = _mk(46)
    full = json.dumps(
        {n: float(f"{v:.6g}") for n, v in timings.items()},
        separators=(",", ":"),
    )
    assert len(full) > 1850 - 80  # the borderline premise
    line = contract_line(99.9, timings, 0.1)
    d = json.loads(line)
    assert len(d["queries"]) == 46
    assert "omitted_cheapest" not in d
    assert len(line) <= 1850


def test_overflow_prunes_cheapest_keeps_heaviest():
    timings = _mk(120)  # far past the cap even at 2 sig digits
    line = contract_line(99.9, timings, 0.1)
    assert len(line) <= 1850
    d = json.loads(line)
    assert d["omitted_cheapest"] == 120 - len(d["queries"])
    assert d["omitted_cheapest"] >= 1
    # the heaviest entries survive; the dropped ones are the cheapest
    kept_min = min(d["queries"].values())
    dropped = [v for n, v in timings.items() if n not in d["queries"]]
    assert max(dropped) <= kept_min + 1e-9
    # contract fields always survive
    assert d["metric"] == "headline-suite-total" and d["sf"] == 0.1


def test_pathological_cap_never_breaks_contract_fields():
    # even with a tiny cap the line stays valid JSON with the totals
    line = contract_line(1.0, _mk(50), 0.01, cap=120)
    d = json.loads(line)
    assert d["value"] == 1.0 and d["queries"] == {}
    assert len(line) <= 120


def test_pruning_floor_protects_etl_and_heaviest():
    # VERDICT r10 #6: whatever the registry grows to, the regression-
    # relevant entries — the ETL entries (CHEAP relative to the graph
    # ops, so cheapest-first pruning would otherwise cut them) and the
    # top-10 heaviest — must survive the prune
    timings = _mk(400)  # deep overflow even at 2 sig digits
    timings["etl_files_2000"] = 1.37
    timings["etl_jsonl_50000"] = 2.7
    line = contract_line(99.9, timings, 0.1)
    assert len(line) <= 1850
    d = json.loads(line)
    assert d["omitted_cheapest"] >= 1
    assert "etl_files_2000" in d["queries"]
    assert "etl_jsonl_50000" in d["queries"]
    top10 = sorted(timings, key=lambda n: -timings[n])[:10]
    assert all(n in d["queries"] for n in top10)
    # the dropped set is the cheapest of the UNPROTECTED entries
    protected = set(top10) | {"etl_files_2000", "etl_jsonl_50000"}
    dropped = [n for n in timings if n not in d["queries"]]
    assert not (set(dropped) & protected)
    kept_unprot_min = min(
        timings[n] for n in d["queries"] if n not in protected
    )
    assert max(timings[n] for n in dropped) <= kept_unprot_min + 1e-9
