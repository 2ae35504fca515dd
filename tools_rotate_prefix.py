"""Print the exact registry rotation for the next round.

Usage: python tools_rotate_prefix.py CORRECTNESS_r07.json

Reads the round's external CORRECTNESS ledger plus the current registry
state and prints, ready to paste into local_etl_spark/registry.py:
  1. the SQL-oracled names to append to DRIVER_CHECKED (this round's
     externally hash-verified greens);
  2. the rows-only names that now have a driver record (for the
     comment trail);
  3. the suggested next ROWS_ONLY_REPRESENT slice (never-recorded
     rows-only ops, oldest families first) sized so the fresh SQL
     queue + re-presents fill DRIVER_PREFIX exactly;
  4. a reminder to empty DEFER_FRESH (its names become plain fresh).

Round 6 shipped without rotating (judge finding r6 #1 — the driver
re-verified known greens); this makes the rotation a 2-minute
mechanical step instead of a derivation.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    if len(sys.argv) != 2:
        print(__doc__)
        return 2
    from local_etl_spark import registry

    registry._load_all_modules()
    reg = registry.REGISTRY
    rec = json.load(open(sys.argv[1]))

    new_sql = sorted(
        n
        for n, r in rec.items()
        if n in reg
        and reg[n].oracle
        and n not in registry.DRIVER_CHECKED
        and r.get("hash_match")
    )
    red = sorted(
        n
        for n, r in rec.items()
        if n in reg and reg[n].oracle and not r.get("hash_match")
    )
    new_rows = sorted(
        n for n, r in rec.items() if n in reg and not reg[n].oracle
    )

    print(f"# 1. append to DRIVER_CHECKED ({len(new_sql)} names):")
    for n in new_sql:
        print(f'    "{n}",')
    if red:
        print(f"\n# !! {len(red)} SQL checks FAILED — fix these and put them")
        print("#    in FIXED_THIS_ROUND instead of DRIVER_CHECKED:")
        for n in red:
            print(f"#    {n}")
    print(f"\n# 2. rows-only names now driver-recorded: {new_rows}")

    # never-recorded rows-only after this ledger (union of all ledgers
    # on disk so older records count too)
    import glob

    recorded: set[str] = set()
    for path in glob.glob("CORRECTNESS_r*.json"):
        try:
            recorded |= set(json.load(open(path)))
        except (OSError, ValueError):
            pass
    recorded |= set(rec)
    ro_pending = sorted(
        n for n, s in reg.items() if not s.oracle and n not in recorded
    )
    checked = set(registry.DRIVER_CHECKED) | set(new_sql)
    fresh = sorted(n for n, s in reg.items() if s.oracle and n not in checked)
    slots = max(0, registry.DRIVER_PREFIX - len(fresh))
    print(f"\n# 3. fresh SQL queue next round: {len(fresh)} names -> "
          f"{slots} prefix slots left for rows-only re-presents")
    print(f"#    never-recorded rows-only ({len(ro_pending)}): {ro_pending}")
    print(f"#    suggested ROWS_ONLY_REPRESENT = {ro_pending[:slots]}")
    print("\n# 4. empty DEFER_FRESH (its names are now plain fresh) and")
    print("#    update the coverage ledger table in the project notes.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
