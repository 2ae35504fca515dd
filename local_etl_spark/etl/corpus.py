"""Deterministic synthetic event corpora for ETL benchmarking/testing.

Shapes mirror the reference's sample events (users-sample.json,
cards-complete-sample.json): ~10% of events exercise the repair path
(missing required field), ~2% are corrupt JSON — the same mix the
routing logic has to handle in production.

Two layouts, matching etl/pipeline's two scan paths:
  - one-doc-per-file (the reference's layout, main.py:163-172)
  - JSONL shards (the 100 TB layout: splittable, listing-friendly)
"""

from __future__ import annotations

import json
import os
import random

FIRST = ("Lawrence", "Ada", "Grace", "Alan", "Edsger", "Barbara", "John")
LAST = ("Welch", "Lovelace", "Hopper", "Turing", "Dijkstra", "Liskov", "Doe")
TITLES = ("Dr.", "Mr.", "Mrs.", "Ms.")
SUFFIX = ("PhD", "MD", "Jr.", "II")
JOBS = (
    "Commercial horticulturist, retail",
    "Engineer, software",
    "Scientist",
    "Analyst, data",
    "Operator",
)
STREETS = ("Rodriguez Ports", "Main St", "Elm Ave", "Oak Blvd")


def user_schema() -> dict:
    """JSON Schema (draft-07) for users events — re-expressed from the
    semantics documented in SURVEY.md §1.1/§1.2 (reference
    user-events-schema.json): envelope of metadata{type,event_at,
    event_id} + payload{id,name,address,job,score}, all required,
    types + presence enforced."""
    meta_props = {
        "type": {"type": "string"},
        "event_at": {"type": "string", "format": "date-time"},
        "event_id": {"type": "string", "format": "uuid"},
    }
    payload_props = {
        "id": {"type": "integer"},
        "name": {"type": "string"},
        "address": {"type": "string"},
        "job": {"type": "string"},
        "score": {"type": "number"},
    }
    return {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "type": "object",
        "properties": {
            "metadata": {
                "type": "object",
                "properties": meta_props,
                "required": list(meta_props),
            },
            "payload": {
                "type": "object",
                "properties": payload_props,
                "required": list(payload_props),
            },
        },
        "required": ["metadata", "payload"],
    }


def write_user_schema(path: str) -> str:
    with open(path, "w") as fh:
        json.dump(user_schema(), fh, indent=2)
    return path


def _user_event(rng: random.Random, i: int, repair_rate: float) -> dict:
    name = f"{rng.choice(FIRST)} {rng.choice(LAST)}"
    if rng.random() < 0.2:
        name = f"{rng.choice(TITLES)} {name}"
    if rng.random() < 0.2:
        name = f"{name} {rng.choice(SUFFIX)}"
    payload = {
        "id": i,
        "name": name,
        "address": f"{rng.randint(1, 9999)} {rng.choice(STREETS)}\nCity, ST {rng.randint(10000, 99999)}",
        "job": rng.choice(JOBS),
        "score": round(rng.uniform(0, 10), 2),
    }
    if rng.random() < repair_rate:  # repairable: drop one required field
        del payload[rng.choice(("name", "job", "address"))]
    return {
        "metadata": {
            "type": "user",
            "event_at": f"2023-10-{rng.randint(1, 28):02d} 22:55:01",
            "event_id": f"e{i}",
        },
        "payload": payload,
    }


def generate(
    n: int,
    seed: int = 7,
    corrupt_rate: float = 0.02,
    repair_rate: float = 0.10,
) -> list[str]:
    """n raw event documents (JSON strings).

    Defaults model a realistic dirty feed. ``corrupt_rate=0,
    repair_rate=0`` yields a corpus the REFERENCE can survive — it
    crashes on corrupt JSON (json.load, main2.py:326 uncaught) and on
    repaired rows missing name/job (main2.py:242 NameError) — used for
    honest head-to-head throughput timing.
    """
    rng = random.Random(seed)
    docs = []
    for i in range(n):
        if rng.random() < corrupt_rate:
            docs.append('{"metadata": {broken')
        else:
            docs.append(json.dumps(_user_event(rng, i, repair_rate)))
    return docs


def write_per_file_corpus(dirname: str, n: int, seed: int = 7) -> str:
    """One pretty-printed doc per file — the reference's layout."""
    os.makedirs(dirname, exist_ok=True)
    marker = os.path.join(dirname, ".complete")
    if os.path.exists(marker):
        return dirname
    for i, raw in enumerate(generate(n, seed)):
        try:
            pretty = json.dumps(json.loads(raw), indent=2)
        except json.JSONDecodeError:
            pretty = raw
        with open(os.path.join(dirname, f"ev{i:07d}.json"), "w") as fh:
            fh.write(pretty)
    open(marker, "w").close()
    return dirname


def write_jsonl_corpus(
    dirname: str, n: int, shards: int = 8, seed: int = 7
) -> str:
    """JSONL shards — the scale layout (one event per line)."""
    os.makedirs(dirname, exist_ok=True)
    marker = os.path.join(dirname, ".complete")
    if os.path.exists(marker):
        return dirname
    docs = generate(n, seed)
    per = (n + shards - 1) // shards
    for s in range(shards):
        with open(os.path.join(dirname, f"shard{s:03d}.jsonl"), "w") as fh:
            for raw in docs[s * per : (s + 1) * per]:
                fh.write(raw.replace("\n", " ") + "\n")
    open(marker, "w").close()
    return dirname
