"""Generate a derived sf1-scale corpus (10× sf0.1) for scale-proofing.

The driver ships sf{0.001,0.01,0.1}; the 100 TB claims rest on plan
shape plus sf0.1 timings. This tool materializes a 10× corpus under
.scale/sf1/ (gitignored, ~200 MB) so the heaviest bench entries can be
ratio-tested at one more decade (VERDICT r6 item 2: catch df-cap /
hot-bucket thresholds that bind differently at 10×).

Scaling rules (replica i ∈ 0..9, i=0 is the original):
- region/nation: copied (dimension tables — fixed size at any SF,
  like TPC-H).
- customer/supplier/part/orders/lineitem/events: keys shifted by
  i × (max_key+1) so every replica keeps the original's per-key
  densities, join fan-outs and skew profile; values/dates unchanged
  (the time RANGE stays fixed — per-day volumes grow 10×, which is
  how real event streams scale).
- documents: doc_id shifted; every WORD gets a replica tag for i>0
  ('the' → 'r3_the'), so each replica preserves its internal near-dup
  structure exactly while replicas never collide in ANY sketch space
  (n-gram, minhash, simhash, prefix): the honest dedup scaling —
  10× the work at the same per-bucket densities, no artificial
  quadratic pair blowup from replica-vs-replica matches.
- embeddings: vec_id shifted; vectors get small deterministic per-dim
  perturbations (±0.3% direction noise, renormalization left to the
  queries) so replicas are near but not exactly at the originals —
  cluster geometry and IVF cell populations scale ~10×.

Usage: python tools_make_sf1.py [dest_dir]  (default .scale/sf1)
       python tools_make_sf1.py --skew [dest_dir]  (default .scale/sf0.1skew)

--skew (VERDICT r7 #8): the replica scaling above preserves per-key
densities, so salted joins and hot-bucket caps never face real skew at
10×. Skew mode emits a SAME-SIZE variant of sf0.1 where one key owns
~20% of its fact table (every 5th row reassigned — deterministic, no
rand()), so skew-vs-uniform timing ratios isolate the skew handling:
- customer.c_nationkey → nation 0 (join_skew_salted's build side:
  one nation goes from ~4% to ~23% of customers);
- lineitem.l_suppkey → supplier 1 (graph node 's1' owns ~20% of all
  trade edges — the hot-vertex regime for pagerank/label-prop);
- documents.text → every 5th doc gets a shared 40-word hot core
  prepended (its ~38 shingles reach df ≈ 20%·n_docs ≫ DF_CAP, so the
  ngram df-cap must engage; cores add J ≈ 0.1 pairwise — far below
  the 0.5 threshold, so no true-pair blowup, only candidate pressure);
- events.user_id → user 0 (one user owns ~20% of events — the
  per-user window straggler regime for sessionize).
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
REPLICAS = 10


def make_skew(dest: str, src_dir: str = SRC) -> None:
    """Same-size variant of ``src_dir`` with one ~20%-hot key per fact
    table. src_dir defaults to sf0.1; pass the derived .scale/sf1 to
    combine BOTH scale axes (10× data AND 20% skew — VERDICT r8 #5,
    the regime where a straggler can no longer hide behind short
    runtimes)."""
    os.makedirs(dest, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {max(4, (os.cpu_count() or 8) // 2)}")

    def src(t: str) -> str:
        return f"read_parquet('{src_dir}/{t}.parquet')"

    def write(t: str, sql: str) -> None:
        out = os.path.join(dest, f"{t}.parquet")
        con.execute(
            f"COPY ({sql}) TO '{out}' (FORMAT PARQUET, COMPRESSION ZSTD)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")

    for t in ("region", "nation", "orders", "part", "supplier", "embeddings"):
        write(t, f"SELECT * FROM {src(t)}")
    write(
        "customer",
        f"""SELECT c_custkey,
                   c_name,
                   CASE WHEN c_custkey % 5 = 0 THEN 0
                        ELSE c_nationkey END AS c_nationkey,
                   c_acctbal, c_mktsegment
            FROM {src('customer')}""",
    )
    write(
        "lineitem",
        f"""SELECT l_orderkey, l_partkey,
                   CASE WHEN (l_orderkey * 7 + l_linenumber) % 5 = 0 THEN 1
                        ELSE l_suppkey END AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM {src('lineitem')}""",
    )
    hot_core = " ".join(f"hotw{j}" for j in range(40))
    write(
        "documents",
        f"""SELECT doc_id,
                   CASE WHEN doc_id % 5 = 0
                        THEN '{hot_core}' || ' ' || text
                        ELSE text END AS text,
                   lang, source,
                   CAST(CASE WHEN doc_id % 5 = 0
                        THEN n_chars + {len(hot_core) + 1}
                        ELSE n_chars END AS BIGINT) AS n_chars
            FROM {src('documents')}""",
    )
    write(
        "events",
        f"""SELECT event_id, ts,
                   CASE WHEN event_id % 5 = 0 THEN 0
                        ELSE user_id END AS user_id,
                   event_type, value, props
            FROM {src('events')}""",
    )
    print(f"done -> {dest}")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--skew":
        make_skew(
            sys.argv[2]
            if len(sys.argv) > 2
            else os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                ".scale",
                "sf0.1skew",
            ),
            src_dir=sys.argv[3] if len(sys.argv) > 3 else SRC,
        )
        return
    dest = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".scale", "sf1"
    )
    os.makedirs(dest, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {max(4, (os.cpu_count() or 8) // 2)}")

    def src(t: str) -> str:
        return f"read_parquet('{SRC}/{t}.parquet')"

    def write(t: str, sql: str) -> None:
        out = os.path.join(dest, f"{t}.parquet")
        con.execute(
            f"COPY ({sql}) TO '{out}' (FORMAT PARQUET, COMPRESSION ZSTD)"
        )
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{t}: {n} rows")

    for t in ("region", "nation"):
        write(t, f"SELECT * FROM {src(t)}")

    reps = f"(SELECT unnest(range({REPLICAS})) AS i) reps"

    # key offsets: max+1 per keyed table, computed once
    offs = {}
    for t, k in (
        ("customer", "c_custkey"),
        ("supplier", "s_suppkey"),
        ("part", "p_partkey"),
        ("orders", "o_orderkey"),
        ("events", "event_id"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ):
        offs[t] = con.execute(f"SELECT max({k}) + 1 FROM {src(t)}").fetchone()[0]
    offs["user"] = con.execute(
        f"SELECT max(user_id) + 1 FROM {src('events')}"
    ).fetchone()[0]

    write(
        "customer",
        f"""SELECT c_custkey + i * {offs['customer']} AS c_custkey,
                   c_name, c_nationkey, c_acctbal, c_mktsegment
            FROM {src('customer')}, {reps}""",
    )
    write(
        "supplier",
        f"""SELECT s_suppkey + i * {offs['supplier']} AS s_suppkey,
                   s_name, s_nationkey, s_acctbal
            FROM {src('supplier')}, {reps}""",
    )
    write(
        "part",
        f"""SELECT p_partkey + i * {offs['part']} AS p_partkey,
                   p_name, p_brand, p_type, p_size, p_retailprice
            FROM {src('part')}, {reps}""",
    )
    write(
        "orders",
        f"""SELECT o_orderkey + i * {offs['orders']} AS o_orderkey,
                   o_custkey + i * {offs['customer']} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM {src('orders')}, {reps}""",
    )
    write(
        "lineitem",
        f"""SELECT l_orderkey + i * {offs['orders']} AS l_orderkey,
                   l_partkey + i * {offs['part']} AS l_partkey,
                   l_suppkey + i * {offs['supplier']} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM {src('lineitem')}, {reps}""",
    )
    write(
        "events",
        f"""SELECT event_id + i * {offs['events']} AS event_id,
                   ts,
                   user_id + i * {offs['user']} AS user_id,
                   event_type, value, props
            FROM {src('events')}, {reps}""",
    )
    # word-tag replica texts: every word prefixed 'r<i>_' for i>0
    write(
        "documents",
        f"""SELECT doc_id + i * {offs['documents']} AS doc_id,
                   CASE WHEN i = 0 THEN text
                        ELSE array_to_string(
                            list_transform(string_split(text, ' '),
                                           w -> 'r' || i || '_' || w),
                            ' ')
                   END AS text,
                   lang, source,
                   CAST(CASE WHEN i = 0 THEN n_chars
                        ELSE length(array_to_string(
                            list_transform(string_split(text, ' '),
                                           w -> 'r' || i || '_' || w),
                            ' '))
                   END AS BIGINT) AS n_chars
            FROM {src('documents')}, {reps}""",
    )
    # perturbed replica vectors: ±0.3% deterministic per-dim noise
    write(
        "embeddings",
        f"""SELECT s.vec_id + i * {offs['embeddings']} AS vec_id,
                   CASE WHEN i = 0 THEN embedding
                        ELSE list_transform(
                            list_zip(embedding,
                                     range(1, len(embedding) + 1)),
                            p -> CAST(p[1] * (1.0 + 0.003 *
                                 sin(CAST(s.vec_id * 131 + p[2] * 17 + i
                                          AS DOUBLE))) AS FLOAT))
                   END AS embedding,
                   label
            FROM {src('embeddings')} AS s, {reps}""",
    )
    print(f"done -> {dest}")


if __name__ == "__main__":
    main()
