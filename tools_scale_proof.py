"""Scale-proof the heaviest bench entries at sf1 (10× sf0.1).

Runs each entry at sf0.1 and at the derived sf1 corpus
(tools_make_sf1.py) in ONE session, best-of-2 per (query, sf), and
prints a JSON ledger with per-query ratios. On 32 cores a ~10× data
ratio is the linear expectation for shuffle-bound work; entries far
above it indicate super-linearity (quadratic candidate blowup, a
threshold binding differently at 10×) — exactly what the plan audit
cannot see (VERDICT r6 item 2).

Usage: python tools_scale_proof.py [sf1_dir] [query ...]
       python tools_scale_proof.py --skew [skew_dir] [query ...]

--skew (VERDICT r7 #8): compares each query on uniform sf0.1 vs the
SAME-SIZE skewed corpus from `tools_make_sf1.py --skew` (one key owns
~20% of its fact table). Because the corpora are equal-sized, the
skew/uniform time ratio isolates the skew handling — a robust path
stays near 1×; a straggler-bound one degrades toward the hot share.
"""

from __future__ import annotations

import json
import os
import sys
import time

SKEW_QUERIES = [
    "join_skew_salted",  # salted build side: hot nation split N_SALTS ways
    "llm_dedup_ngram",  # df-cap must absorb the hot shingle core
    "llm_dedup_minhash",  # banded path over the same hot-core corpus
    "graph_pagerank",  # hot vertex s1 with ~20% of all edges
    "graph_label_prop",
    "win_sessionize",  # hot user: per-user window straggler regime
    "win_sessionize_split",  # the (user, day)-split mitigation — must
    # hold ≤ the plain form under the same hot user (SCALE.md §16.3)
]

HEAVY = [
    # round-8 additions with standing scale claims
    "llm_softdedup",
    "llm_dedup_incremental_near",
    "llm_dedup_eval",
    "graph_pagerank",
    "graph_label_prop",
    "llm_dedup_ngram",
    "llm_dedup_minhash",
    "llm_dedup_prefix",
    "llm_dedup_lsh_cosine",
    "llm_dedup_simhash",
    "llm_dedup_embed",
    "llm_dedup_substring",
    "llm_semdedup",
    "llm_simsearch_ivf",
    "llm_tfidf",
    "agg_ks_test",
    "agg_corr_matrix",
    "win_sessionize",
    "sql_q2",
    # r10-r12 heavy additions (folded into the standing ledger at the
    # r12 full re-proof, VERDICT r11 #5)
    "llm_audio_fingerprint",
    "graph_betweenness_sample",
    "graph_closeness_sample",
    "graph_kcore",
    "graph_coreness",
    "llm_lsh_band_sweep",
    "llm_ann_ivf_incremental",
    "llm_embedding_drift",
    "llm_bpe_vocab_sweep",
]


def run_skew() -> None:
    """--skew [skew_dir [uniform_dir]] [query ...] — uniform_dir
    defaults to sf0.1; pass .scale/sf1skew .scale/sf1 to ratio the
    COMBINED 10×+skew corpus against its own uniform baseline."""
    args = sys.argv[2:]
    skew_dir = (
        args[0]
        if args and os.path.isdir(args[0])
        else os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".scale", "sf0.1skew"
        )
    )
    if args and os.path.isdir(args[0]):
        args = args[1:]
    uniform_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        uniform_dir = args[0]
        args = args[1:]
    names = args or SKEW_QUERIES
    from local_etl_spark.registry import all_queries
    from local_etl_spark.session import get_spark

    spark = get_spark("skew-proof")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    ledger: dict[str, dict] = {}
    for name in names:
        fn = queries[name]
        entry: dict[str, float] = {}
        for label, sf_dir in (("uniform", uniform_dir), ("skew", skew_dir)):
            best = float("inf")
            rows = -1
            for _ in range(2):
                t0 = time.perf_counter()
                rows = fn(spark, sf_dir).count()
                best = min(best, time.perf_counter() - t0)
            entry[label] = round(best, 3)
            entry[f"rows_{label}"] = rows
        entry["ratio"] = round(entry["skew"] / entry["uniform"], 2)
        ledger[name] = entry
        print(json.dumps({name: entry}), flush=True)
    try:
        load = round(os.getloadavg()[0], 2)
    except OSError:
        load = None
    print(json.dumps({"skew_ledger": ledger, "loadavg_1m": load}))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--skew":
        run_skew()
        return
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".scale", "sf1"
    )
    names = sys.argv[2:] or HEAVY
    from local_etl_spark.registry import all_queries
    from local_etl_spark.session import get_spark

    import bench

    print(
        json.dumps(
            {
                "calib_miter_s_start": bench._cpu_calibration(),
                "calib_mt_miter_s_start": bench._cpu_calibration_mt(),
            }
        ),
        flush=True,
    )
    spark = get_spark("scale-proof")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    ledger: dict[str, dict] = {}
    for name in names:
        fn = queries[name]
        entry: dict[str, float] = {}
        for sf_label, sf_dir in (("sf0.1", "/root/testdata/sf0.1"), ("sf1", sf1_dir)):
            best = float("inf")
            rows = -1
            for _ in range(2):
                t0 = time.perf_counter()
                rows = fn(spark, sf_dir).count()
                best = min(best, time.perf_counter() - t0)
            entry[sf_label] = round(best, 3)
            entry[f"rows_{sf_label}"] = rows
        entry["ratio"] = round(entry["sf1"] / entry["sf0.1"], 2)
        ledger[name] = entry
        print(json.dumps({name: entry}), flush=True)

    # ETL layouts scale via the sf parameter (10× events at sf=1.0)
    import tempfile

    import bench

    etl = {}
    for sf_label, sf_num in (("sf0.1", 0.1), ("sf1", 1.0)):
        t = bench.bench_etl(
            spark, sf_num,
            os.path.join(tempfile.gettempdir(), f"scale_proof_etl_{sf_label}"),
        )
        for k, v in t.items():
            base = k.rsplit("_", 1)[0]
            etl.setdefault(base, {})[sf_label] = v
    for base, e in etl.items():
        e["ratio"] = round(e["sf1"] / e["sf0.1"], 2)
        ledger[base] = e
        print(json.dumps({base: e}), flush=True)

    try:
        load = round(os.getloadavg()[0], 2)
    except OSError:
        load = None
    import bench

    print(
        json.dumps(
            {
                "ledger": ledger,
                "loadavg_1m": load,
                # both host-clock probes (VERDICT r11 #5): the single-
                # thread clock is bimodal and the all-core clock moves
                # independently — cross-round ratio comparisons
                # normalize by these
                "calib_miter_s_end": bench._cpu_calibration(),
                "calib_mt_miter_s_end": bench._cpu_calibration_mt(),
            }
        )
    )


if __name__ == "__main__":
    main()
