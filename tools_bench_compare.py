"""Compare two bench.py JSON outputs and print per-query deltas.

Usage: python tools_bench_compare.py A.json B.json [pct] [--calib CA CB]

Prints queries present in both files whose relative change exceeds
``pct`` (default 25%), plus entries added/removed. Machine load moves
totals 1.5-2x uniformly (SCALE.md §13.9) and the HOST CLOCK itself is
bimodal (bench._cpu_calibration: 2.3x same-loop swings) — a UNIFORM
shift across queries is the host, not a regression; look for OUTLIERS
against the median ratio, which is what the output is sorted by.

Calibration (VERDICT r10 #3): when both artifacts carry host-speed
probes, the cross-round median is also printed NORMALIZED by the calib
ratio — that number, not the raw median, is the one to bisect on. The
driver-recorded BENCH_r{N}.json wrapper strips calib fields (the
contract line must stay under the stdout cap), so this tool falls back
to a sibling BENCH_ambient_last.json when its timings match the
compared file, or takes explicit values via --calib; when no calib can
be found it says so loudly instead of silently skipping normalization.
"""

from __future__ import annotations

import json
import os
import statistics
import sys


_CALIB_KINDS = (
    # all-core first: local[32] workloads ride the multi-core clock,
    # which moves independently of the single-thread one
    ("calib_mt_miter_s_start", "calib_mt_miter_s_end"),
    ("calib_miter_s_start", "calib_miter_s_end"),
)


def _calibs(d: dict) -> dict[int, float]:
    """Host-speed probes from a bench artifact, one value per probe
    KIND (mean of start/end when both endpoints were recorded). The
    caller must normalize with the SAME kind on both sides — mt and
    single-thread readings are different units (aggregate vs per-core
    Miter/s) and must never be cross-divided."""
    out: dict[int, float] = {}
    for i, keys in enumerate(_CALIB_KINDS):
        vals = [float(d[k]) for k in keys if d.get(k)]
        if vals:
            out[i] = sum(vals) / len(vals)
    return out


def _calib(d: dict) -> dict[int, float] | None:
    c = _calibs(d)
    return c or None


def _sidecar_calib(
    path: str, queries: dict[str, float]
) -> dict[int, float] | None:
    """BENCH_ambient_last.json fallback for driver-wrapped artifacts.
    The sidecar is overwritten per bench run, so it is trusted ONLY
    when its timings match the compared file (same run): >=80% of the
    shared entries agree within 5% (the wrapper rounds to 2-6
    significant digits and may prune cheapest entries)."""
    sib = os.path.join(
        os.path.dirname(os.path.abspath(path)) or ".",
        "BENCH_ambient_last.json",
    )
    try:
        with open(sib) as fh:
            s = json.load(fh)
    except (OSError, ValueError):
        return None
    sq = {k: float(v) for k, v in s.get("queries", {}).items()}
    shared = [k for k in queries if k in sq and sq[k] > 0]
    if len(shared) < max(3, len(queries) // 2):
        return None
    close = sum(1 for k in shared if abs(queries[k] / sq[k] - 1.0) < 0.05)
    if close < 0.8 * len(shared):
        return None
    return _calib(s)


def load(path: str) -> tuple[dict[str, float], float | None]:
    """Accepts bench.py's raw JSON line, the side artifact, or the
    driver's BENCH_r{N}.json wrapper (which nests the parsed line under
    'parsed'). Returns (timings, host calibration Miter/s or None)."""
    with open(path) as fh:
        d = json.load(fh)
    inner = d
    if "queries" not in d and isinstance(d.get("parsed"), dict):
        inner = d["parsed"]
    queries = {k: float(v) for k, v in inner["queries"].items()}
    calib = _calib(d) or _calib(inner) or _sidecar_calib(path, queries)
    return queries, calib


def main(argv: list[str]) -> int:
    calib_override: tuple[float, float] | None = None
    if "--calib" in argv:
        i = argv.index("--calib")
        calib_override = (float(argv[i + 1]), float(argv[i + 2]))
        argv = argv[:i] + argv[i + 3 :]
    if len(argv) < 2:
        print(__doc__)
        return 2
    (a, ca), (b, cb) = load(argv[0]), load(argv[1])
    if calib_override:
        ca, cb = calib_override
    pct = float(argv[2]) / 100.0 if len(argv) > 2 else 0.25
    shared = sorted(set(a) & set(b))
    if not shared:
        print("no shared queries")
        return 1
    ratios = {k: b[k] / a[k] for k in shared if a[k] > 0}
    med = statistics.median(ratios.values())
    pair = None
    if isinstance(ca, dict) and isinstance(cb, dict):
        common = sorted(set(ca) & set(cb))
        if common:
            kind = common[0]
            pair = (ca[kind], cb[kind], _CALIB_KINDS[kind][0])
    elif ca and cb and not isinstance(ca, dict):
        pair = (float(ca), float(cb), "--calib")
    if pair:
        va, vb, kind_name = pair
        # time ~ 1/speed: a host that probes at vb < va inflates B's
        # times by va/vb, so the code-attributable median is med*vb/va
        norm = med * vb / va
        print(
            f"host calib ({kind_name}): {va:.1f} vs {vb:.1f} Miter/s — "
            f"raw median {med:.2f}x, calib-normalized {norm:.2f}x "
            f"(bisect only if the NORMALIZED median moved)"
        )
    else:
        print(
            "WARNING: no host calibration recorded in one or both "
            "artifacts (and no matching BENCH_ambient_last.json sidecar)"
            " — the host clock is bimodal, NORMALIZE MANUALLY via "
            "--calib CA CB before believing any cross-round shift"
        )
    print(
        f"shared {len(shared)}  median ratio {med:.2f}x "
        f"(uniform shift = ambient load / host mode)"
    )
    flagged = [
        (k, r) for k, r in ratios.items() if abs(r / med - 1.0) > pct
    ]
    for k, r in sorted(flagged, key=lambda kr: -kr[1]):
        print(
            f"  {k}: {a[k]:.3f}s -> {b[k]:.3f}s  "
            f"({r:.2f}x, {r / med:.2f}x vs median)"
        )
    if not flagged:
        print("  no per-query outliers beyond the threshold")
    added, removed = sorted(set(b) - set(a)), sorted(set(a) - set(b))
    if added:
        print(f"added: {', '.join(added)}")
    if removed:
        print(f"removed: {', '.join(removed)}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
