"""Compare two bench.py JSON outputs and print per-query deltas.

Usage: python tools_bench_compare.py BENCH_r02.json BENCH_r03.json [pct]

Prints queries present in both files whose relative change exceeds
``pct`` (default 25%), plus entries added/removed. Machine load moves
totals 1.5-2× uniformly (SCALE.md §13.9) — a UNIFORM shift across queries is
ambient load, not a regression; look for OUTLIERS against the median
ratio, which is what the output is sorted by.
"""

from __future__ import annotations

import json
import statistics
import sys


def load(path: str) -> tuple[dict[str, float], float | None]:
    """Accepts bench.py's raw JSON line or the driver's BENCH_r{N}.json
    wrapper (which nests the parsed line under 'parsed'). Returns
    (timings, host calibration Miter/s if recorded)."""
    with open(path) as fh:
        d = json.load(fh)
    if "queries" not in d and "parsed" in d:
        d = d["parsed"]
    calib = d.get("calib_miter_s_start")
    return {k: float(v) for k, v in d["queries"].items()}, calib


def main(argv: list[str]) -> int:
    if len(argv) < 2:
        print(__doc__)
        return 2
    (a, ca), (b, cb) = load(argv[0]), load(argv[1])
    pct = float(argv[2]) / 100.0 if len(argv) > 2 else 0.25
    if ca and cb:
        # the host clock is bimodal (bench._cpu_calibration) — a
        # median shift ~ ca/cb is the HOST, not the code
        print(
            f"host calib: {ca} vs {cb} Miter/s "
            f"(expect median ratio ~{ca / cb:.2f}x from host speed alone)"
        )
    shared = sorted(set(a) & set(b))
    if not shared:
        print("no shared queries")
        return 1
    ratios = {k: b[k] / a[k] for k in shared if a[k] > 0}
    med = statistics.median(ratios.values())
    print(
        f"shared {len(shared)}  median ratio {med:.2f}x "
        f"(uniform shift = ambient load)"
    )
    flagged = [
        (k, r) for k, r in ratios.items() if abs(r / med - 1.0) > pct
    ]
    for k, r in sorted(flagged, key=lambda kr: -kr[1]):
        print(f"  {k}: {a[k]:.3f}s -> {b[k]:.3f}s  ({r:.2f}x, {r / med:.2f}x vs median)")
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
