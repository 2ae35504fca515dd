"""Ground-truth tests for the corpus-preparation operators
(llm_corpus.py) and the sketch-based approximate quantile.

The SQL-oracle queries in llm_corpus.py are already hash-checked by
test_oracle_parity; these tests add independent pure-Python
recomputation (the oracle and engine could in principle share a
misreading of the spec — Python here is a third implementation).
"""

from __future__ import annotations

from collections import Counter

import duckdb
import pytest

from local_etl_spark.queries.llm_corpus import EVAL_MOD, PACK_BUDGET
from local_etl_spark.registry import get

SF = "/root/testdata/sf0.01"


def _docs():
    con = duckdb.connect()
    try:
        return con.execute(
            f"SELECT doc_id, text, lang, source FROM '{SF}/documents.parquet'"
        ).fetchall()
    finally:
        con.close()


def test_repetition_matches_python_reference(spark):
    rows = {
        r.doc_id: r
        for r in get("llm_repetition").fn(spark, SF).collect()
    }
    docs = _docs()
    assert set(rows) == {d[0] for d in docs}
    for doc_id, text, _, _ in docs[:50]:
        ws = text.split(" ")
        grams = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        n = len(grams)
        counts = Counter(grams)
        dup = sum(c for c in counts.values() if c > 1)
        top = max(counts.values(), default=0)
        got = rows[doc_id]
        assert got.dup_2gram_frac == pytest.approx(
            dup / n if n else 0.0, abs=1e-6
        )
        assert got.top_2gram_frac == pytest.approx(
            top / n if n else 0.0, abs=1e-6
        )


def test_pack_sequences_greedy_offsets(spark):
    out = get("llm_pack_sequences").fn(spark, SF).collect()
    by_stratum: dict[tuple, list] = {}
    for r in out:
        by_stratum.setdefault((r.lang, r.source), []).append(r)
    assert len(by_stratum) > 1  # packing actually parallelizes
    for rows in by_stratum.values():
        rows.sort(key=lambda r: r.doc_id)
        offset = 0
        for r in rows:
            assert r.t_offset == offset
            assert r.seq_id == offset // PACK_BUDGET
            offset += r.n_tokens


def test_contamination_matches_python_reference(spark):
    got = {
        (r.doc_id, r.eval_doc_id): r.n_shared
        for r in get("llm_contamination").fn(spark, SF).collect()
    }
    n = 5
    grams: dict[int, set] = {}
    for doc_id, text, _, _ in _docs():
        ws = text.split(" ")
        grams[doc_id] = {
            " ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)
        }
    expected = {}
    evals = {d: g for d, g in grams.items() if d % EVAL_MOD == 0}
    assert evals  # the benchmark stand-in set is non-empty at sf0.01
    for doc_id, g in grams.items():
        if doc_id % EVAL_MOD == 0:
            continue
        for eval_id, eg in evals.items():
            shared = len(g & eg)
            if shared:
                expected[(doc_id, eval_id)] = shared
    assert got == expected


def test_approx_quantile_rank_error(spark):
    approx = {
        r.l_returnflag: r for r in get("agg_approx_quantile").fn(spark, SF).collect()
    }
    con = duckdb.connect()
    try:
        exact = con.execute(
            f"""
            SELECT l_returnflag,
                   quantile_cont(l_extendedprice, [0.25, 0.5, 0.75]) AS qs,
                   count(*) AS n
            FROM '{SF}/lineitem.parquet' GROUP BY 1
            """
        ).fetchall()
    finally:
        con.close()
    for flag, qs, n in exact:
        got = approx[flag]
        assert got.n == n
        # GK guarantee: rank error ≤ n/accuracy; translate to a value
        # tolerance via the empirical spread (prices span ~1..105k,
        # so a 0.1% rank slack is well under 1% of the value range)
        for got_q, exact_q in zip((got.q25, got.q50, got.q75), qs):
            assert abs(got_q - exact_q) <= 0.01 * exact_q


def test_repetition_fold_property(spark):
    """The in-row fold must agree with a Counter-based reference on
    arbitrary word sequences — tiny alphabet so duplicate runs, ties,
    and single-gram documents all occur."""
    import itertools
    import random

    from pyspark.sql import functions as F

    from local_etl_spark.queries.llm_corpus import _REP_FOLD, _SORTED_2GRAMS

    rng = random.Random(11)
    seqs = [
        [rng.choice("ab cd ef".split()) for _ in range(n)]
        for n in itertools.chain(range(0, 6), (20, 40))
        for _ in range(6)
    ]
    rows = [(i, " ".join(s)) for i, s in enumerate(seqs)]
    df = (
        spark.createDataFrame(rows, "doc_id int, text string")
        .select("doc_id", F.split("text", " ").alias("_w"))
        .select("doc_id", F.expr(_SORTED_2GRAMS).alias("_g"))
        .select("doc_id", F.size("_g").alias("n"), F.expr(_REP_FOLD).alias("f"))
    )
    got = {r.doc_id: (r.n, r.f.dup, r.f.top) for r in df.collect()}
    for i, (_, text) in enumerate(rows):
        ws = text.split(" ")
        grams = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        counts = Counter(grams)
        dup = sum(c for c in counts.values() if c > 1)
        top = max(counts.values(), default=0)
        assert got[i] == (len(grams), dup, top), f"doc {i}: {text!r}"


def test_pack_bfd_matches_reference_and_beats_chunk_layout(spark):
    """llm_pack_bfd ground truth: (1) the Spark assignment equals a
    driver-side replay of the SAME bfd_pack function per stratum (the
    applyInPandas plumbing adds nothing); (2) no bin exceeds the budget
    unless it holds a single oversized doc; (3) the efficiency witness
    is the recomputed filled fraction and is ≥ the concat-and-chunk
    bin count's implied efficiency on every stratum (BFD never needs
    more bins than chunking needs sequences, since chunking's
    ceil(total/budget) is the LP lower bound only when docs split —
    BFD must be within 11/9·OPT+1 of it)."""
    from collections import defaultdict

    from local_etl_spark.queries.llm_corpus import bfd_pack

    rows = get("llm_pack_bfd").fn(spark, SF).collect()
    assert rows
    strata = defaultdict(list)
    for r in rows:
        strata[(r["lang"], r["source"])].append(r)

    for key, docs in strata.items():
        want = bfd_pack([(r["doc_id"], r["n_tokens"]) for r in docs], PACK_BUDGET)
        got = {r["doc_id"]: r["seq_id"] for r in docs}
        assert got == want, key

        fill = defaultdict(int)
        for r in docs:
            fill[r["seq_id"]] += r["n_tokens"]
        for b, tot in fill.items():
            members = [r for r in docs if r["seq_id"] == b]
            assert tot <= PACK_BUDGET or (
                len(members) == 1 and members[0]["n_tokens"] > PACK_BUDGET
            ), (key, b, tot)

        n_bins = max(fill) + 1
        filled = sum(min(r["n_tokens"], PACK_BUDGET) for r in docs)
        # raw division — no rounding; see the engine comment (Python
        # banker's round vs SQL half-away diverge on the power-of-two
        # budget's constant half-ties)
        eff = filled / (n_bins * PACK_BUDGET)
        assert all(r["efficiency"] == eff for r in docs), key
        # BFD bin count within the Wahba/Johnson guarantee of the
        # split-allowed lower bound (chunk layout = ceil(total/budget))
        lower = -(-sum(r["n_tokens"] for r in docs) // PACK_BUDGET)
        assert n_bins <= (11 * lower) // 9 + 1, (key, n_bins, lower)


def test_rolling_median_gapped_grid(spark, tmp_path):
    """win_rolling_median's frame is CALENDAR days, not rows (VERDICT
    r7 #4): on a day grid with a gap, the post-gap day's frame must
    NOT reach back past 6 calendar days to pick up older rows the way
    a rowsBetween(-6, 0) frame silently does. Grid: Jan 1, Jan 2,
    Jan 10 — the Jan 10 frame spans [Jan 4, Jan 10] and contains only
    itself (a ROWS frame would report n_frame=3 and a 3-row median).
    The oracle SQL is replayed on the same gapped fixture so both
    sides carry the calendar-exact semantics."""
    import datetime as dt

    days = [
        (dt.datetime(2024, 1, 1, 5), 1.00),
        (dt.datetime(2024, 1, 2, 5), 2.00),
        (dt.datetime(2024, 1, 10, 5), 9.00),
    ]
    df = spark.createDataFrame(
        [("x", ts, v, 7) for ts, v in days],
        "event_type string, ts timestamp, value double, user_id bigint",
    )
    sf = str(tmp_path)
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf}/events.parquet")

    out = {
        r["d"].date().isoformat(): r
        for r in get("win_rolling_median").fn(spark, sf).collect()
    }
    assert out["2024-01-01"]["n_frame"] == 1
    assert out["2024-01-02"]["n_frame"] == 2
    assert out["2024-01-02"]["roll_median"] == 1.5
    # the gapped day: calendar frame contains ONLY itself
    assert out["2024-01-10"]["n_frame"] == 1
    assert out["2024-01-10"]["roll_median"] == 9.0

    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"'{sf}/events.parquet/*.parquet'"
        )
        res = con.execute(get("win_rolling_median").oracle)
        drows = {r[1].date().isoformat(): r for r in res.fetchall()}
    finally:
        con.close()
    for k, r in out.items():
        assert drows[k][2] == r["n_frame"]
        assert drows[k][3] == r["roll_median"]


def test_holt_winters_seasonal_python_replay(spark):
    """Third-implementation check for win_holt_winters_seasonal (the
    oracle and engine share the fold text, so an independent pure-
    Python replay of the recursion guards against a shared misreading
    of the Holt-Winters spec): replay l/b/s chain on the day series
    pulled via DuckDB and match every output column at 6 dp."""
    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    try:
        rows = con.execute(
            f"""
            SELECT event_type, date_trunc('day', ts) AS d,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                       / 100 AS y
            FROM read_parquet('{sf}/events.parquet')
            GROUP BY 1, 2 ORDER BY 1, 2
            """
        ).fetchall()
    finally:
        con.close()
    series: dict[str, list[float]] = {}
    for et, _, y in rows:
        series.setdefault(et, []).append(y)

    out = {
        r["event_type"]: r
        for r in get("win_holt_winters_seasonal").fn(spark, sf).collect()
    }
    a = b = g = 0.25
    for et, ys in series.items():
        if len(ys) < 8:
            assert et not in out
            continue
        l = sum(ys[:7]) / 7.0
        bb = 0.0
        s = [ys[i] - l for i in range(7)]
        for t in range(7, len(ys)):
            sl = t % 7
            lp = a * (ys[t] - s[sl]) + (1 - a) * (l + bb)
            bp = b * (lp - l) + (1 - b) * bb
            sp = g * (ys[t] - l - bb) + (1 - g) * s[sl]
            l, bb, s[sl] = lp, bp, sp
        n = len(ys)
        r = out[et]
        assert r["n_days"] == n
        assert abs(r["level"] - l) < 1e-6
        assert abs(r["trend"] - bb) < 1e-6
        assert abs(r["season_next"] - s[n % 7]) < 1e-6
        assert abs(r["forecast_1"] - (l + bb + s[n % 7])) < 1e-6
        assert abs(r["forecast_7"] - (l + 7 * bb + s[(n + 6) % 7])) < 1e-6
        assert abs(r["season_range"] - (max(s) - min(s))) < 1e-6


def test_interval_merge_running_max_semantics(spark, tmp_path):
    """win_interval_merge must use a PREFIX running max of interval
    ends, not lag(e): with a long interval followed by short ones
    entirely inside it, lag-based merging would wrongly split a block
    when a short interval's predecessor (by start order) ends before
    the long one's reach. Synthetic: supplier 1 ships on days
    [0, +7], [1, +7(=8)], [10, 17] — days 0 and 1 overlap; day 10
    starts past max(7+7=8)... actually [1..8] ends day 8 < 10, so two
    blocks; and the killer case: [0,7] long reach with [2,9*]? The
    windows here are fixed-length (+7), so the lag trap needs TOUCHING
    chains: [0,7], [3,10], [8,15] — each overlaps the previous, one
    block spanning [0,15]. A lag-only impl agrees here, so the pin is
    the chain + the split + exact span/raw accounting, replayed in
    pure Python against arbitrary day sets."""
    import random

    from local_etl_spark.registry import get

    rng = random.Random(88)
    rows = []
    for supp in range(1, 6):
        days = sorted(rng.sample(range(0, 60), rng.randint(3, 12)))
        for i, d0 in enumerate(days):
            rows.append(
                (supp, 1, i, __import__("datetime").date(2023, 1, 1)
                 + __import__("datetime").timedelta(days=d0))
            )
    df = spark.createDataFrame(
        rows, "l_suppkey int, l_partkey int, l_linenumber int, l_shipdate date"
    ).selectExpr(
        "l_suppkey",
        "l_partkey",
        "l_suppkey AS l_orderkey",
        "l_linenumber",
        "CAST(1 AS DOUBLE) AS l_quantity",
        "CAST(1 AS DOUBLE) AS l_extendedprice",
        "CAST(0 AS DOUBLE) AS l_discount",
        "CAST(0 AS DOUBLE) AS l_tax",
        "'N' AS l_returnflag",
        "'O' AS l_linestatus",
        "l_shipdate",
    )
    sf = str(tmp_path)
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf}/lineitem.parquet")

    got = {}
    for r in get("win_interval_merge").fn(spark, sf).collect():
        got.setdefault(r["suppkey"], []).append(r)

    from local_etl_spark.queries.windows import SHIP_WINDOW_DAYS

    epoch = __import__("datetime").date(1970, 1, 1)
    by_supp = {}
    for supp, _, _, d in rows:
        dn = (d - epoch).days
        by_supp.setdefault(supp, set()).add((dn, dn + SHIP_WINDOW_DAYS))
    for supp, ivs in by_supp.items():
        ivs = sorted(ivs)
        blocks, cur = [], None
        for s, e in ivs:
            if cur is None or s > cur[1]:
                if cur is not None:
                    blocks.append(cur)
                cur = [s, e, 1, e - s]
            else:
                cur[1] = max(cur[1], e)
                cur[2] += 1
                cur[3] += e - s
        blocks.append(cur)
        out = sorted(got[supp], key=lambda r: r["block_start_dn"])
        assert len(out) == len(blocks), supp
        for r, (s, e, n, raw) in zip(out, blocks):
            assert r["block_start_dn"] == s
            assert r["block_end_dn"] == e
            assert r["n_intervals"] == n
            assert r["raw_days"] == raw
            assert r["span_days"] == e - s


def test_permutation_test_python_replay(spark):
    """Third implementation for agg_permutation_test: replay the md5
    bit-coin permutation stream and the exact-cents mean differences
    in pure Python; every output column must match (the oracle and
    engine share the hash expressions, so a common misreading of
    'bit k of which digest' would pass the hash check — this won't)."""
    import duckdb
    import hashlib

    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    try:
        rows = con.execute(
            f"""
            SELECT o_orderkey, o_orderpriority,
                   CAST(round(o_totalprice * 100) AS BIGINT)
            FROM read_parquet('{sf}/orders.parquet')
            WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
            """
        ).fetchall()
    finally:
        con.close()

    from local_etl_spark.queries.stats import N_PERMS

    def side(okey: int, k: int) -> int:
        h = hashlib.md5(
            f"{okey}:{0 if k <= 128 else 1}".encode()
        ).hexdigest()
        j = (k - 1) % 128
        return (int(h[j // 4], 16) >> (j % 4)) & 1

    n_a = sum(1 for _, p, _ in rows if p == "1-URGENT")
    n_b = len(rows) - n_a
    sa = sum(c for _, p, c in rows if p == "1-URGENT")
    sb = sum(c for _, p, c in rows if p != "1-URGENT")
    d_obs = sa / n_a - sb / n_b
    n_ge = 0
    for k in range(1, N_PERMS + 1):
        s0 = s1 = c0 = c1 = 0
        for okey, _, cents in rows:
            if side(okey, k) == 0:
                s0 += cents
                c0 += 1
            else:
                s1 += cents
                c1 += 1
        if abs(s0 / c0 - s1 / c1) >= abs(d_obs):
            n_ge += 1

    r = get("agg_permutation_test").fn(spark, sf).collect()[0]
    assert r["n_a"] == n_a and r["n_b"] == n_b
    assert r["obs_diff"] == round(abs(d_obs) / 100, 6) + 0.0
    assert r["p_value"] == round((1 + n_ge) / (N_PERMS + 1), 6) + 0.0


def test_permutation_side_word_form_identity(spark):
    """r13 optimization pin: the engine's integer-word bit extraction
    (_PERM_SIDE_WORDS over eight pre-parsed 32-bit words) reads the
    EXACT same bit as the original per-nibble string form
    (_PERM_SIDE_SPARK, still the oracle's text) for every k and a
    spread of real md5 digests."""
    from pyspark.sql import functions as F

    from local_etl_spark.queries.stats import (
        N_PERMS,
        _PERM_SIDE_SPARK,
        _PERM_SIDE_WORDS,
        _PERM_WORD_COLS,
    )

    base = spark.range(64).select(
        F.md5(F.concat(F.col("id").cast("string"), F.lit(":0"))).alias("h0"),
        F.md5(F.concat(F.col("id").cast("string"), F.lit(":1"))).alias("h1"),
    )
    both = (
        base.selectExpr("h0", "h1", *_PERM_WORD_COLS)
        .select(
            "*",
            F.explode(F.sequence(F.lit(1), F.lit(N_PERMS))).alias("k"),
        )
        .select(
            F.expr(_PERM_SIDE_SPARK).alias("s_str"),
            F.expr(_PERM_SIDE_WORDS).alias("s_word"),
        )
    )
    assert both.filter(F.col("s_str") != F.col("s_word")).count() == 0
    assert both.count() == 64 * N_PERMS


def test_kalman_python_replay(spark):
    """Third implementation for win_kalman_1d: replay the predict/
    update recursion in pure Python on the day series."""
    import duckdb

    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    try:
        rows = con.execute(
            f"""
            SELECT event_type, date_trunc('day', ts) AS d,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                       / 100 AS y
            FROM read_parquet('{sf}/events.parquet')
            GROUP BY 1, 2 ORDER BY 1, 2
            """
        ).fetchall()
    finally:
        con.close()
    series: dict[str, list[float]] = {}
    for et, _, y in rows:
        series.setdefault(et, []).append(y)

    from local_etl_spark.queries.windows import KF_P0, KF_Q, KF_R

    out = {
        r["event_type"]: r
        for r in get("win_kalman_1d").fn(spark, sf).collect()
    }
    for et, ys in series.items():
        x, p = ys[0], KF_P0
        for y in ys[1:]:
            pp = p + KF_Q
            g = pp / (pp + KF_R)
            x = x + g * (y - x)
            p = (1 - g) * pp
        r = out[et]
        assert abs(r["level"] - x) < 1e-6
        assert abs(r["variance"] - p) < 1e-6
        assert abs(r["steady_gain"] - p / (p + KF_R)) < 1e-6


def test_audit_chain_python_replay(spark):
    """Third implementation for etl_audit_chain: replay the md5 link
    chain in pure Python (digest text layout AND fold direction)."""
    import duckdb
    import hashlib

    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    try:
        rows = con.execute(
            f"""
            SELECT event_type,
                   date_diff('day', DATE '1970-01-01',
                             CAST(date_trunc('day', ts) AS DATE)) AS dn,
                   sum(CAST(round(value * 100) AS BIGINT)) AS cents,
                   count(*) AS n
            FROM read_parquet('{sf}/events.parquet')
            GROUP BY 1, 2 ORDER BY 1, 2
            """
        ).fetchall()
    finally:
        con.close()
    chains: dict[str, list] = {}
    for et, dn, cents, n in rows:
        d = hashlib.md5(f"{dn}|{cents}|{n}".encode()).hexdigest()
        chains.setdefault(et, []).append(d)
    out = {
        r["event_type"]: r
        for r in get("etl_audit_chain").fn(spark, sf).collect()
    }
    for et, ds in chains.items():
        chain = ds[0]
        for d in ds[1:]:
            chain = hashlib.md5((chain + d).encode()).hexdigest()
        r = out[et]
        assert r["n_days"] == len(ds)
        assert r["head_digest"] == ds[0]
        assert r["chain_digest"] == chain


def _day_cents(sf):
    con = duckdb.connect()
    try:
        return con.execute(
            f"""
            SELECT event_type,
                   date_diff('day', DATE '1970-01-01',
                             CAST(date_trunc('day', ts) AS DATE)) AS dn,
                   sum(CAST(round(value * 100) AS BIGINT)) AS cents
            FROM read_parquet('{sf}/events.parquet')
            GROUP BY 1, 2 ORDER BY 1, 2
            """
        ).fetchall()
    finally:
        con.close()


def test_rolling_wau_python_replay(spark):
    """Third implementation for win_rolling_wau: exact DAU/WAU from
    set arithmetic over (user, day) activity."""
    import duckdb

    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    try:
        rows = con.execute(
            f"""
            SELECT DISTINCT user_id,
                   date_diff('day', DATE '1970-01-01',
                             CAST(date_trunc('day', ts) AS DATE)) AS dn
            FROM read_parquet('{sf}/events.parquet')
            """
        ).fetchall()
    finally:
        con.close()
    by_day: dict[int, set] = {}
    for u, dn in rows:
        by_day.setdefault(dn, set()).add(u)
    out = {r["dn"]: r for r in get("win_rolling_wau").fn(spark, sf).collect()}
    assert set(out) == set(by_day)
    for dn, users in by_day.items():
        wau = set()
        for d in range(dn - 6, dn + 1):
            wau |= by_day.get(d, set())
        r = out[dn]
        assert r["dau"] == len(users)
        assert r["wau"] == len(wau)
        assert r["stickiness"] == round(len(users) / len(wau), 6) + 0.0


def test_history_compress_python_replay(spark):
    """Third implementation for win_history_compress: replay dominant-
    status selection (max count, min event_type on ties) and the
    gap/change island compression for a sample of users."""
    import duckdb

    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    try:
        rows = con.execute(
            f"""
            SELECT user_id,
                   date_diff('day', DATE '1970-01-01',
                             CAST(date_trunc('day', ts) AS DATE)) AS dn,
                   event_type, count(*) AS cnt
            FROM read_parquet('{sf}/events.parquet')
            WHERE user_id < 60
            GROUP BY 1, 2, 3 ORDER BY 1, 2, 4 DESC, 3
            """
        ).fetchall()
    finally:
        con.close()
    dom: dict[tuple, str] = {}
    best: dict[tuple, tuple] = {}
    for u, dn, et, cnt in rows:
        k = (u, dn)
        cand = (-cnt, et)
        if k not in best or cand < best[k]:
            best[k] = cand
            dom[k] = et
    ranges: dict[int, list] = {}
    for (u, dn), status in sorted(dom.items()):
        rs = ranges.setdefault(u, [])
        if rs and rs[-1][1] == status and rs[-1][3] == dn - 1:
            rs[-1][3] = dn
            rs[-1][4] += 1
        else:
            rs.append([u, status, dn, dn, 1])
    got = [
        (r["user_id"], r["status"], r["valid_from_dn"], r["valid_to_dn"],
         r["n_days"])
        for r in get("win_history_compress").fn(spark, sf).collect()
        if r["user_id"] < 60
    ]
    want = [tuple(x) for rs in ranges.values() for x in rs]
    assert sorted(got) == sorted(want)


def test_forecast_backtest_python_replay(spark):
    """Third implementation for win_forecast_backtest: replay the
    fixed-origin split and all three baseline error sets."""
    sf = "/root/testdata/sf0.01"
    series: dict[str, list[tuple[int, int]]] = {}
    for et, dn, cents in _day_cents(sf):
        series.setdefault(et, []).append((dn, cents))

    out = {
        (r["event_type"], r["method"]): r
        for r in get("win_forecast_backtest").fn(spark, sf).collect()
    }
    for et, pts in series.items():
        pts.sort()
        if len(pts) < 9:
            assert not any(k[0] == et for k in out)
            continue
        train, test = pts[:-7], pts[-7:]
        by_dn = dict(pts)
        last_dn, last_c = train[-1]
        first_dn, first_c = train[0]
        errs = {
            "naive": [c - last_c for _, c in test],
            "drift": [
                c - (last_c + (dn - last_dn) * (last_c - first_c)
                     / (last_dn - first_dn))
                for dn, c in test
            ],
            "seasonal_naive": [
                c - by_dn[dn - 7] for dn, c in test if dn - 7 in by_dn
            ],
        }
        for method, es in errs.items():
            r = out[(et, method)]
            assert r["n_eval"] == len(es)
            mae = sum(abs(e) for e in es) / len(es) / 100
            rmse = (sum(e * e for e in es) / len(es)) ** 0.5 / 100
            assert abs(r["mae"] - mae) < 1e-6, (et, method)
            assert abs(r["rmse"] - rmse) < 1e-6, (et, method)


def test_uplift_qini_python_replay(spark):
    """Third implementation for agg_uplift_qini: replay the md5-parity
    split, the total-order rank, the integer-DIV decile formula and
    the cumulative Qini values (the engine ranks via ordered_prefix —
    a very different plan from the oracle's row_number window, so an
    independent replay guards both)."""
    import duckdb
    import hashlib

    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    try:
        rows = con.execute(
            f"""
            SELECT user_id,
                   max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END),
                   count(*)
            FROM read_parquet('{sf}/events.parquet') GROUP BY user_id
            """
        ).fetchall()
    finally:
        con.close()
    units = []
    for u, conv, score in rows:
        in_a = 1 if hashlib.md5(str(u).encode()).hexdigest()[0] < "8" else 0
        units.append((u, in_a, conv, score))
    units.sort(key=lambda t: (-t[3], t[0]))
    n = len(units)
    per = {}
    for rnk, (u, in_a, conv, _) in enumerate(units, start=1):
        d = (rnk - 1) * 10 // n + 1
        e = per.setdefault(d, [0, 0, 0, 0])  # n_t, x_t, n_c, x_c
        if in_a:
            e[0] += 1
            e[1] += conv
        else:
            e[2] += 1
            e[3] += conv
    out = {r["decile"]: r for r in get("agg_uplift_qini").fn(spark, sf).collect()}
    cum = [0, 0, 0, 0]
    for d in sorted(per):
        cum = [a + b for a, b in zip(cum, per[d])]
        r = out[d]
        assert (r["cn_t"], r["cx_t"], r["cn_c"], r["cx_c"]) == tuple(cum)
        qini = cum[1] - cum[3] * cum[0] / cum[2]
        assert abs(r["qini"] - qini) < 1e-6, d


def test_theta_forecast_python_replay(spark):
    """Third implementation for win_theta_forecast: replay OLS fit,
    the theta(2) line and its SES in pure Python."""
    sf = "/root/testdata/sf0.01"
    series: dict[str, list[float]] = {}
    for et, dn, cents in _day_cents(sf):
        series.setdefault(et, []).append(cents / 100)

    from local_etl_spark.queries.windows import THETA_ALPHA

    out = {
        r["event_type"]: r
        for r in get("win_theta_forecast").fn(spark, sf).collect()
    }
    for et, ys in series.items():
        n = len(ys)
        if n < 3:
            assert et not in out
            continue
        st = n * (n + 1) / 2
        stt = n * (n + 1) * (2 * n + 1) / 6
        sy = sum(ys)
        sty = sum((i + 1) * y for i, y in enumerate(ys))
        b = (n * sty - st * sy) / (n * stt - st * st)
        a = (sy - b * st) / n
        l2 = 2 * ys[0] - a - b
        for i, y in enumerate(ys[1:], start=2):
            z = 2 * y - a - b * i
            l2 = THETA_ALPHA * z + (1 - THETA_ALPHA) * l2
        r = out[et]
        assert abs(r["slope"] - b) < 1e-6
        assert abs(r["intercept"] - a) < 1e-6
        assert abs(r["theta_f1"] - (l2 + a + b * (n + 1)) / 2) < 1e-6
        assert abs(r["theta_f7"] - (l2 + a + b * (n + 7)) / 2) < 1e-6


def test_spc_control_python_replay(spark):
    """Third implementation for win_spc_control: replay z-scores and
    the same-side run detection."""
    sf = "/root/testdata/sf0.01"
    series: dict[str, list[tuple[int, int]]] = {}
    for et, dn, cents in _day_cents(sf):
        series.setdefault(et, []).append((dn, cents))

    from local_etl_spark.queries.windows import SPC_RUN

    out = {
        (r["event_type"], r["d"].date().toordinal()): r
        for r in get("win_spc_control").fn(spark, sf).collect()
    }
    import datetime as dt

    epoch = dt.date(1970, 1, 1).toordinal()
    for et, pts in series.items():
        pts.sort()
        n = len(pts)
        if n < 2:
            continue
        s1 = sum(c for _, c in pts)
        s2 = sum(c * c for _, c in pts)
        mu = s1 / n
        sd = ((s2 - s1 * s1 / n) / (n - 1)) ** 0.5
        # runs of same side
        runs, cur = [], None
        for dn, c in pts:
            hi = c > mu
            if cur is None or cur[0] != hi:
                cur = [hi, []]
                runs.append(cur)
            cur[1].append(dn)
        run_len = {dn: len(r[1]) for r in runs for dn in r[1]}
        for dn, c in pts:
            r = out[(et, dn + epoch)]
            z = (c - mu) / sd
            assert abs(r["zscore"] - z) < 1e-6
            assert r["rule1_3sigma"] == (abs(z) > 3)
            assert r["run_len"] == run_len[dn]
            assert r["rule4_run"] == (run_len[dn] >= SPC_RUN)


def test_volume_anomaly_python_replay(spark):
    """Third implementation for etl_volume_anomaly: replay the
    calendar-trailing median baseline and the flag rule."""
    import duckdb
    import statistics

    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    try:
        rows = con.execute(
            f"""
            SELECT event_type,
                   date_diff('day', DATE '1970-01-01',
                             CAST(date_trunc('day', ts) AS DATE)) AS dn,
                   count(*) AS n
            FROM read_parquet('{sf}/events.parquet') GROUP BY 1, 2
            """
        ).fetchall()
    finally:
        con.close()
    from local_etl_spark.queries.etl import VOL_TOL, VOL_WINDOW_DAYS

    by_et: dict[str, dict[int, int]] = {}
    for et, dn, n in rows:
        by_et.setdefault(et, {})[dn] = n
    out = {
        (r["event_type"], r["d"].date().isoformat()): r
        for r in get("etl_volume_anomaly").fn(spark, sf).collect()
    }
    import datetime as dt

    for et, days in by_et.items():
        for dn, n in days.items():
            prior = [
                days[d]
                for d in range(dn - VOL_WINDOW_DAYS, dn)
                if d in days
            ]
            key = (et, (dt.date(1970, 1, 1) + dt.timedelta(days=dn)).isoformat())
            r = out[key]
            assert r["n_events"] == n
            assert r["n_prior"] == len(prior)
            if prior:
                med = statistics.median(prior)
                assert abs(r["trailing_median"] - med) < 1e-9
                assert r["vol_ratio"] == round(n / med, 6) + 0.0
                assert r["is_anomaly"] == (
                    len(prior) >= 3 and abs(n - med) > VOL_TOL * med
                )
            else:
                assert r["trailing_median"] is None
                assert r["is_anomaly"] is False or r["is_anomaly"] is None


def test_wilson_ci_python_replay(spark):
    """Third implementation for agg_wilson_ci: closed-form replay."""
    import duckdb

    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    try:
        rows = con.execute(
            f"""
            SELECT event_type, count(*),
                   sum(CASE WHEN CAST(round(value * 100) AS BIGINT) > 10000
                            THEN 1 ELSE 0 END)
            FROM read_parquet('{sf}/events.parquet') GROUP BY 1
            """
        ).fetchall()
    finally:
        con.close()
    from local_etl_spark.queries.stats import Z_CI_975 as z

    out = {
        r["event_type"]: r for r in get("agg_wilson_ci").fn(spark, sf).collect()
    }
    for et, n, x in rows:
        p = x / n
        center = p + z * z / (2 * n)
        half = z * (p * (1 - p) / n + z * z / (4 * n * n)) ** 0.5
        denom = 1 + z * z / n
        r = out[et]
        assert r["n"] == n and r["x"] == x
        assert abs(r["p_hat"] - p) < 1e-6
        assert abs(r["wilson_lo"] - (center - half) / denom) < 1e-6
        assert abs(r["wilson_hi"] - (center + half) / denom) < 1e-6


def test_msprt_python_replay(spark):
    """Third implementation for agg_msprt: day aggregates come from
    DuckDB, then the sequential mixture-likelihood fold (cumulative
    moments -> delta/V -> ln Lambda -> running-max always-valid
    ln(1/p)) replays in pure Python floats."""
    import math

    from local_etl_spark.queries.stats import (
        MSPRT_LN_INV_ALPHA,
        MSPRT_TAU2,
    )

    con = duckdb.connect()
    try:
        days = con.execute(
            f"""
            WITH u AS (
                SELECT event_type,
                       CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
                       CASE WHEN substring(md5(CAST(user_id AS VARCHAR)),
                                           1, 1) < '8'
                            THEN 1 ELSE 0 END AS a,
                       CAST(round(value * 100) AS BIGINT) AS c
                FROM read_parquet('{SF}/events.parquet')
            )
            SELECT event_type, d,
                   sum(a), count(*) - sum(a),
                   sum(CASE WHEN a = 1 THEN c ELSE 0 END),
                   sum(CASE WHEN a = 0 THEN c ELSE 0 END)
            FROM u GROUP BY 1, 2 ORDER BY 1, 2
            """
        ).fetchall()
        sig = dict(
            (et, (float(tn), float(sc), float(scc)))
            for et, tn, sc, scc in con.execute(
                f"""
                SELECT event_type, count(*),
                       sum(CAST(round(value * 100) AS BIGINT)),
                       sum(CAST(round(value * 100) AS BIGINT)
                           * CAST(round(value * 100) AS BIGINT))
                FROM read_parquet('{SF}/events.parquet') GROUP BY 1
                """
            ).fetchall()
        )
    finally:
        con.close()

    out = {
        (r["event_type"], r["d"]): r
        for r in get("agg_msprt").fn(spark, SF).collect()
    }
    assert out
    series: dict[str, list] = {}
    for et, d, na, nb, sa, sb in days:
        series.setdefault(et, []).append((d, int(na), int(nb), int(sa), int(sb)))
    tau2 = float(MSPRT_TAU2)
    n_checked = 0
    for et, rows_ in series.items():
        tn, sc, scc = sig[et]
        sigma2 = ((scc - (sc * sc) / tn) / (tn - 1.0)) / 10000.0
        n_a = n_b = s_a = s_b = 0
        best = 0.0
        for d, na, nb, sa, sb in rows_:
            n_a += na
            n_b += nb
            s_a += sa
            s_b += sb
            if n_a == 0 or n_b == 0:
                continue
            delta = (
                float(s_a) / float(n_a) - float(s_b) / float(n_b)
            ) / 100.0
            v = sigma2 * (1.0 / float(n_a) + 1.0 / float(n_b))
            logl = 0.5 * math.log(v / (v + tau2)) + (
                (delta * delta) * tau2
            ) / ((2.0 * v) * (v + tau2))
            best = max(best, logl)
            r = out[(et, d)]
            assert r["n_a"] == n_a and r["n_b"] == n_b
            assert abs(r["log_lambda"] - logl) < 2e-6
            assert abs(r["ln_inv_p"] - best) < 2e-6
            assert r["rejected"] == (best > MSPRT_LN_INV_ALPHA)
            n_checked += 1
    assert n_checked == len(out)


def test_cusum_ab_python_replay(spark):
    """Third implementation for agg_cusum_ab: the RECURSIVE Page CUSUM
    (S+ = max(0, S+ + x), S- = max(0, S- - x)) replayed in pure Python
    must equal the engine's prefix-sum/running-extremum closed form."""
    import math

    from local_etl_spark.queries.stats import CUSUM_AB_H

    con = duckdb.connect()
    try:
        days = con.execute(
            f"""
            SELECT event_type,
                   CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
                   sum(CASE WHEN substring(md5(CAST(user_id AS VARCHAR)),
                                           1, 1) < '8'
                            THEN 1 ELSE 0 END) AS n_a,
                   sum(CASE WHEN substring(md5(CAST(user_id AS VARCHAR)),
                                           1, 1) < '8'
                            THEN 0 ELSE 1 END) AS n_b
            FROM read_parquet('{SF}/events.parquet')
            GROUP BY 1, 2 ORDER BY 1, 2
            """
        ).fetchall()
    finally:
        con.close()

    out = {
        (r["event_type"], r["d"]): r
        for r in get("agg_cusum_ab").fn(spark, SF).collect()
    }
    assert out
    state: dict[str, list[int]] = {}
    n_checked = 0
    for et, d, na, nb in days:
        sp, sn, cn = state.get(et, [0, 0, 0])
        x = int(na) - int(nb)
        sp = max(0, sp + x)
        sn = max(0, sn - x)
        cn += int(na) + int(nb)
        state[et] = [sp, sn, cn]
        r = out[(et, d)]
        thr = CUSUM_AB_H * math.sqrt(cn)
        assert r["cusum_pos"] == sp and r["cusum_neg"] == sn
        assert r["cum_n"] == cn
        assert abs(r["threshold"] - thr) < 2e-6
        assert r["alarm"] == (sp > thr or sn > thr)
        n_checked += 1
    assert n_checked == len(out)


def test_gst_obrien_fleming_python_replay(spark):
    """Third implementation for agg_gst_obrien_fleming: DuckDB day
    aggregates, then the look placement (first day cum_n*K >= k*tot,
    exact ints), Z = delta/sqrt(V) and the OBF boundary C*sqrt(K/k)
    replayed in pure Python floats."""
    import math

    from local_etl_spark.queries.stats import GST_K, GST_OBF_C

    con = duckdb.connect()
    try:
        days = con.execute(
            f"""
            WITH u AS (
                SELECT event_type,
                       CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
                       CASE WHEN substring(md5(CAST(user_id AS VARCHAR)),
                                           1, 1) < '8'
                            THEN 1 ELSE 0 END AS a,
                       CAST(round(value * 100) AS BIGINT) AS c
                FROM read_parquet('{SF}/events.parquet')
            )
            SELECT event_type, d,
                   sum(a), count(*) - sum(a),
                   sum(CASE WHEN a = 1 THEN c ELSE 0 END),
                   sum(CASE WHEN a = 0 THEN c ELSE 0 END)
            FROM u GROUP BY 1, 2 ORDER BY 1, 2
            """
        ).fetchall()
        sig = dict(
            (et, (float(tn), float(sc), float(scc), int(tn)))
            for et, tn, sc, scc in con.execute(
                f"""
                SELECT event_type, count(*),
                       sum(CAST(round(value * 100) AS BIGINT)),
                       sum(CAST(round(value * 100) AS BIGINT)
                           * CAST(round(value * 100) AS BIGINT))
                FROM read_parquet('{SF}/events.parquet') GROUP BY 1
                """
            ).fetchall()
        )
    finally:
        con.close()

    out = {
        (r["event_type"], r["look_k"]): r
        for r in get("agg_gst_obrien_fleming").fn(spark, SF).collect()
    }
    assert out
    series: dict[str, list] = {}
    for et, d, na, nb, sa, sb in days:
        series.setdefault(et, []).append(
            (d, int(na), int(nb), int(sa), int(sb))
        )
    n_checked = 0
    for et, rows_ in series.items():
        tn, sc, scc, tot_n = sig[et]
        sigma2 = ((scc - (sc * sc) / tn) / (tn - 1.0)) / 10000.0
        n_a = n_b = s_a = s_b = 0
        next_k = 1
        for d, na, nb, sa, sb in rows_:
            n_a += na
            n_b += nb
            s_a += sa
            s_b += sb
            while next_k <= GST_K and (n_a + n_b) * GST_K >= next_k * tot_n:
                k = next_k
                next_k += 1
                r = out[(et, k)]
                assert r["d"] == d and r["n_a"] == n_a and r["n_b"] == n_b
                bound = GST_OBF_C * math.sqrt(float(GST_K) / float(k))
                assert abs(r["boundary"] - bound) < 2e-6
                assert abs(
                    r["info_frac"] - float(n_a + n_b) / float(tot_n)
                ) < 2e-6
                if n_a > 0 and n_b > 0 and sigma2 > 0:
                    delta = (
                        float(s_a) / float(n_a) - float(s_b) / float(n_b)
                    ) / 100.0
                    v = sigma2 * (1.0 / float(n_a) + 1.0 / float(n_b))
                    zz = delta / math.sqrt(v)
                    assert abs(r["z"] - zz) < 2e-6
                    assert r["rejected"] == (abs(zz) >= bound)
                else:
                    assert r["z"] is None
                n_checked += 1
    assert n_checked == len(out) == 5 * GST_K


def test_mmd_poly_python_replay(spark):
    """Third implementation for agg_mmd_poly: exact integer moments
    from DuckDB, then the closed-form degree-3 polynomial-kernel MMD
    (3c^2*dmu^2 + 3c*dm2^2 + dm3^2, c=1 in dollars/1e5 units) in pure
    Python floats. Also pins the factorization against a literal
    O(n^2) kernel-mean computation on a small subsample."""
    con = duckdb.connect()
    try:
        rows = con.execute(
            f"""
            SELECT o_orderpriority, count(*),
                   sum(CAST(floor(o_totalprice) AS BIGINT)),
                   sum(CAST(floor(o_totalprice) AS BIGINT)
                       * CAST(floor(o_totalprice) AS BIGINT)),
                   sum(CAST(floor(o_totalprice) AS BIGINT)
                       * CAST(floor(o_totalprice) AS BIGINT)
                       * CAST(floor(o_totalprice) AS BIGINT))
            FROM read_parquet('{SF}/orders.parquet')
            WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
            GROUP BY 1
            """
        ).fetchall()
        vals = {
            g: [
                float(v) / 100000.0
                for (v,) in con.execute(
                    f"""
                    SELECT CAST(floor(o_totalprice) AS BIGINT)
                    FROM read_parquet('{SF}/orders.parquet')
                    WHERE o_orderpriority = '{g}'
                    ORDER BY o_orderkey LIMIT 60
                    """
                ).fetchall()
            ]
            for g in ("1-URGENT", "5-LOW")
        }
    finally:
        con.close()
    mom = {}
    for g, n, s1, s2, s3 in rows:
        n = float(n)
        mom[g] = (
            float(s1) / (1e5 * n),
            float(s2) / (1e10 * n),
            float(s3) / (1e15 * n),
        )
    mx, my = mom["1-URGENT"], mom["5-LOW"]
    t1 = 3.0 * (mx[0] - my[0]) * (mx[0] - my[0])
    t2 = 3.0 * (mx[1] - my[1]) * (mx[1] - my[1])
    t3 = (mx[2] - my[2]) * (mx[2] - my[2])
    r = get("agg_mmd_poly").fn(spark, SF).collect()
    assert len(r) == 1
    r = r[0]
    # the engine rounds to 8 dp: quantization alone is up to 5e-9
    assert abs(r["mean_term"] - t1) < 6e-9
    assert abs(r["m2_term"] - t2) < 6e-9
    assert abs(r["m3_term"] - t3) < 6e-9
    assert abs(r["mmd2"] - ((t1 + t2) + t3)) < 6e-9
    for term in ("mean_term", "m2_term", "m3_term", "mmd2"):
        assert r[term] >= 0.0

    # factorization sanity on a literal subsample: mean of (1+ab)^3
    # over X×X + Y×Y − 2·X×Y equals the closed form from moments
    xs, ys = vals["1-URGENT"], vals["5-LOW"]

    def kmean(a, b):
        return sum(
            (1.0 + u * v) ** 3 for u in a for v in b
        ) / (len(a) * len(b))

    lit = kmean(xs, xs) + kmean(ys, ys) - 2.0 * kmean(xs, ys)

    def moments(a):
        n = float(len(a))
        return (
            sum(a) / n,
            sum(u * u for u in a) / n,
            sum(u**3 for u in a) / n,
        )

    ax, ay = moments(xs), moments(ys)
    closed = (
        3.0 * (ax[0] - ay[0]) ** 2
        + 3.0 * (ax[1] - ay[1]) ** 2
        + (ax[2] - ay[2]) ** 2
    )
    assert abs(lit - closed) < 1e-9 * max(1.0, abs(lit))
