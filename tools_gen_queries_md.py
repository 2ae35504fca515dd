"""Regenerate QUERIES.md from the registry (run: python tools_gen_queries_md.py)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

from local_etl_spark import registry  # noqa: E402

registry._load_all_modules()

HEADER = """# QUERIES — the declared engine inventory, generated

One row per registry entry (`local_etl_spark/registry.py`); regenerate
with `python tools_gen_queries_md.py`. `oracle` = SQL means the driver
hash-checks the query against DuckDB at sf0.01; `rows` means a
rows-only driver check backed by pytest ground truth (see the query's
docstring for which test).

| # | query | family | oracle | what it does |
|---|---|---|---|---|
"""


def first_sentence(doc: str) -> str:
    flat = " ".join(doc.split())
    for stop in (". ", ".\n"):
        if stop in flat:
            return flat.split(stop)[0] + "."
    return flat


def main() -> None:
    rows = []
    for i, spec in enumerate(
        sorted(registry.REGISTRY.values(), key=lambda s: (s.family, s.name)), 1
    ):
        kind = "SQL" if spec.oracle else "rows"
        rows.append(
            f"| {i} | `{spec.name}` | {spec.family} | {kind} "
            f"| {first_sentence(spec.doc)} |"
        )
    out = Path(__file__).parent / "QUERIES.md"
    out.write_text(HEADER + "\n".join(rows) + "\n")
    n_sql = sum(1 for s in registry.REGISTRY.values() if s.oracle)
    print(f"wrote {out} ({len(rows)} queries, {n_sql} SQL oracles)")


if __name__ == "__main__":
    main()
