"""Unit tests for the scalar column-function library (F1/F3/F9/F12/F15
helpers not already covered by an oracle probe)."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_financial_transactions_data_pipeline_spark.functions import scalar


def test_date_id_roundtrip(spark):
    """id→date→id is the identity over the generator's 2-year domain
    (F9, generate_fact_transactions_data.py:66-67)."""
    df = spark.range(0, 731).select(
        F.col("id").cast("int").alias("date_id"),
        scalar.id_from_date(scalar.date_from_id(F.col("id").cast("int"))).alias("back"),
    )
    assert df.filter(F.col("date_id") != F.col("back")).count() == 0


def test_high_risk_threshold_matches_band_boundary(spark):
    """F15: the 0.6 threshold is the generator's band boundary — 0.6 is
    high-risk, 0.59 is not."""
    df = spark.createDataFrame([(0.59,), (0.6,), (0.95,)], ["risk"]).select(
        "risk", scalar.is_high_risk(F.col("risk")).alias("hi")
    )
    got = {r.risk: r.hi for r in df.collect()}
    assert got == {0.59: False, 0.6: True, 0.95: True}


def test_total_amount_formula(spark):
    """F12: total = round(amount + tax − discount, 2)
    (generate_fact_transactions_data.py:143)."""
    df = spark.createDataFrame([(100.0, 18.0, 2.555)], ["a", "t", "d"]).select(
        scalar.total_amount(F.col("a"), F.col("t"), F.col("d")).alias("total")
    )
    assert df.collect()[0].total == 115.45


def test_mask_pan_null_safe(spark):
    """F1: null PAN yields null mask (pipeline.py:101-104)."""
    df = spark.createDataFrame([("4000123456789012",), (None,)], ["pan"]).select(
        scalar.mask_pan(F.col("pan")).alias("m")
    )
    vals = [r.m for r in df.collect()]
    assert vals[0] == "400012******9012"
    assert vals[1] is None


def test_f17_luhn_against_stdlib_vectors(spark):
    """f17's Luhn folds agree with a from-scratch Python Luhn on the
    probe's own output at sf0.001, and every synthesized PAN is valid;
    known published vectors pin the validator's polarity."""
    from realtime_financial_transactions_data_pipeline_spark.operators.relational import (
        f17_card_brand_luhn,
    )

    def luhn_ok(pan: str) -> bool:
        s = 0
        for i, ch in enumerate(reversed(pan), 1):
            d = int(ch)
            if i % 2 == 0:
                d *= 2
                if d > 9:
                    d -= 9
            s += d
        return s % 10 == 0

    # published vectors: a valid Visa test number and its corruption
    assert luhn_ok("4539578763621486")
    assert not luhn_ok("4539578763621487")
    rows = f17_card_brand_luhn(spark, "/root/testdata/sf0.001").collect()
    assert rows
    brands = {r.brand for r in rows}
    assert brands == {"visa", "mastercard", "amex", "discover", "unknown"}
    for r in rows:
        assert r.luhn_valid, r.pan
        assert luhn_ok(r.pan), r.pan
        assert len(r.pan) == r.pan_len
        if r.brand == "amex":
            assert r.pan_len == 15
        # the 2221-2720 family must classify as mastercard, not unknown
        if r.c_custkey % 6 == 2:
            assert r.brand == "mastercard" and r.pan.startswith("2345")


def test_sql1_scripting_binary_search_parity(spark):
    """The SQL-script binary search converges to the same threshold a
    Python bisection finds over the same data at sf0.001, and the
    invariant holds on both sides of the answer."""
    import duckdb

    from realtime_financial_transactions_data_pipeline_spark.operators.relational import (
        _SQL1_DIV,
        sql1_scripting_threshold_search,
    )

    sf = "/root/testdata/sf0.001"
    vals = [
        v
        for (v,) in duckdb.sql(
            f"SELECT value FROM read_parquet('{sf}/events.parquet')"
        ).fetchall()
    ]

    def above(t):
        return sum(1 for v in vals if v > t)

    lim = len(vals) // _SQL1_DIV
    lo, hi = 0, 200
    while lo < hi:
        mid = (lo + hi) // 2
        if above(mid) < lim:
            hi = mid
        else:
            lo = mid + 1
    (row,) = sql1_scripting_threshold_search(spark, sf).collect()
    assert row.threshold == lo
    assert row.n_above == above(lo) < lim
    assert lo == 0 or above(lo - 1) >= lim  # minimality


def test_f18_collation_folds_what_binary_splits(spark):
    """UTF8_LCASE grouping folds the three planted case variants of
    each segment into one group (5 groups), while binary grouping
    splits them (15); every collated group reports exactly 3
    variants."""
    from pyspark.sql import functions as F

    from realtime_financial_transactions_data_pipeline_spark.operators.relational import (
        f18_collation_groupby,
    )
    from realtime_financial_transactions_data_pipeline_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    rows = f18_collation_groupby(spark, sf).collect()
    assert len(rows) == 5
    assert all(r.n_case_variants == 3 for r in rows)
    mixed = load_table(spark, sf, "customer").select(
        F.expr(
            "CASE c_custkey % 3 WHEN 0 THEN c_mktsegment"
            " WHEN 1 THEN lower(c_mktsegment)"
            " ELSE concat(substr(c_mktsegment, 1, 1),"
            "             lower(substr(c_mktsegment, 2))) END"
        ).alias("seg")
    )
    assert mixed.select("seg").distinct().count() == 15


def test_o10_range_frame_brute_force(spark):
    """The RANGE frame's trailing-24h totals equal an O(n²) Python
    replay at sf0.001, including event-time-tie peer inclusion."""
    import duckdb

    from realtime_financial_transactions_data_pipeline_spark.operators.relational import (
        o10_range_frame_trailing,
    )

    sf = "/root/testdata/sf0.001"
    events = duckdb.sql(
        f"""SELECT event_id, user_id, epoch(ts) AS s,
                   CAST(round(value * 1000) AS BIGINT) AS vm
            FROM read_parquet('{sf}/events.parquet')
            WHERE user_id % 20 = 11"""
    ).fetchall()
    by_user: dict[int, list] = {}
    for eid, uid, s, vm in events:
        by_user.setdefault(uid, []).append((s, vm, eid))
    want = {}
    for uid, evs in by_user.items():
        for s, vm, eid in evs:
            inframe = [
                (s2, vm2)
                for s2, vm2, _ in evs
                if s - 24 * 3600 <= s2 <= s
            ]
            want[eid] = (len(inframe), sum(v for _, v in inframe))
    rows = o10_range_frame_trailing(spark, sf).collect()
    assert len(rows) == len(want)
    for r in rows:
        assert (r.n_24h, r.mills_24h) == want[r.event_id], r.event_id


def test_o11_gaps_islands_brute_force(spark):
    """Streak arithmetic equals a pure-Python replay over every
    customer's sorted month set at sf0.001 — islands, counts, and the
    year-boundary survival of the month-id encoding."""
    import duckdb

    from realtime_financial_transactions_data_pipeline_spark.operators.relational import (
        o11_gaps_islands,
    )

    sf = "/root/testdata/sf0.001"
    rows = duckdb.sql(
        f"""SELECT o_custkey,
                   year(o_orderdate) * 12 + month(o_orderdate) AS mid
            FROM read_parquet('{sf}/orders.parquet')"""
    ).fetchall()
    months: dict[int, set] = {}
    for ck, m in rows:
        months.setdefault(ck, set()).add(m)
    want = {}
    for ck, ms in months.items():
        seq = sorted(ms)
        streaks, cur = [], 1
        for a, b in zip(seq, seq[1:]):
            if b == a + 1:
                cur += 1
            else:
                streaks.append(cur)
                cur = 1
        streaks.append(cur)
        want[ck] = (len(seq), len(streaks), max(streaks))
    got = {
        r.custkey: (r.active_months, r.n_streaks, r.longest_streak)
        for r in o11_gaps_islands(spark, sf).collect()
    }
    assert got == want
    # the corpus must actually exercise multi-month streaks
    assert any(v[2] >= 2 for v in want.values())


def test_a28_transitions_brute_force(spark):
    """The transition matrix equals a pure-Python replay of each
    user's (ts, event_id)-ordered sequence at sf0.001, and every
    source row's probabilities sum to ~1."""
    from collections import defaultdict

    import duckdb

    from realtime_financial_transactions_data_pipeline_spark.operators.relational import (
        a28_path_transitions,
    )

    sf = "/root/testdata/sf0.001"
    rows = duckdb.sql(
        f"""SELECT user_id, epoch(ts) AS s, event_id, event_type
            FROM read_parquet('{sf}/events.parquet')
            ORDER BY user_id, s, event_id"""
    ).fetchall()
    seqs: dict[int, list] = defaultdict(list)
    for uid, _, _, et in rows:
        seqs[uid].append(et)
    n: dict[tuple, int] = defaultdict(int)
    for evs in seqs.values():
        for a, b in zip(evs, evs[1:]):
            n[(a, b)] += 1
    src_tot: dict[str, int] = defaultdict(int)
    for (a, _), c in n.items():
        src_tot[a] += c
    got = {(r.src, r.dst): r for r in a28_path_transitions(spark, sf).collect()}
    assert set(got) == set(n)
    for k, r in got.items():
        assert r.n_transitions == n[k]
        assert abs(r.p_transition - round(n[k] / src_tot[k[0]], 4)) < 1e-9
    for src in src_tot:
        s = sum(r.p_transition for k, r in got.items() if k[0] == src)
        assert abs(s - 1.0) < 1e-2  # rounding slack, 4 dp per cell


def test_a30_assignment_deterministic_and_balanced(spark):
    """The md5 arm assignment is a pure function of user_id (two runs
    agree), the split is near-50/50 on this corpus, and the chi2
    arithmetic matches a Python replay."""
    from realtime_financial_transactions_data_pipeline_spark.operators.relational import (
        a30_ab_assignment_srm,
    )

    sf = "/root/testdata/sf0.001"
    r1 = a30_ab_assignment_srm(spark, sf).collect()[0]
    r2 = a30_ab_assignment_srm(spark, sf).collect()[0]
    assert r1 == r2
    n_t, n_c = r1.n_treatment, r1.n_control
    assert n_t + n_c > 0
    half = (n_t + n_c) / 2.0
    chi2 = (n_t - half) ** 2 / half + (n_c - half) ** 2 / half
    assert abs(r1.chi2 - round(chi2, 4)) < 1e-9
    assert r1.srm_flag == (1 if chi2 > 3.841 else 0)


def test_f19_fiscal_law_brute_force(spark):
    """Period mapping and YoY alignment equal a pure-Python replay at
    sf0.001: 364-day years from the Monday epoch, 13 28-day periods,
    prior-year lookup on (fy-1, period)."""
    import datetime as dt
    from collections import defaultdict

    import duckdb

    from realtime_financial_transactions_data_pipeline_spark.operators.relational import (
        _F19_EPOCH,
        f19_fiscal_445_yoy,
    )

    sf = "/root/testdata/sf0.001"
    epoch = dt.date.fromisoformat(_F19_EPOCH)
    rows = duckdb.sql(
        f"""SELECT CAST(o_orderdate AS DATE) d,
                   CAST(round(o_totalprice*100) AS BIGINT) cents
            FROM read_parquet('{sf}/orders.parquet')
            WHERE o_orderdate >= TIMESTAMP '{_F19_EPOCH}'"""
    ).fetchall()
    agg = defaultdict(lambda: [0, 0])
    for d, cents in rows:
        fd = (d - epoch).days
        key = (fd // 364, (fd % 364) // 28)
        agg[key][0] += 1
        agg[key][1] += cents
    got = {
        (r.fiscal_year, r.period): r
        for r in f19_fiscal_445_yoy(spark, sf).collect()
    }
    assert set(got) == set(agg)
    for key, (n, cents) in agg.items():
        r = got[key]
        assert (r.n_orders, r.revenue_cents) == (n, cents)
        prior = agg.get((key[0] - 1, key[1]))
        assert r.prior_year_cents == (prior[1] if prior else 0)
        assert r.yoy_delta_cents == r.revenue_cents - r.prior_year_cents
    assert all(0 <= k[1] <= 12 for k in agg)


def test_o14_rolling_distinct_brute_force(spark):
    """The trailing-20 distinct part count equals a pure-Python sliding
    set replay over each supplier's totalized shipment order at
    sf0.001."""
    import duckdb

    from realtime_financial_transactions_data_pipeline_spark.operators.relational import (
        o14_rolling_distinct,
    )

    sf = "/root/testdata/sf0.001"
    rows = duckdb.sql(
        f"""SELECT l_suppkey, l_orderkey, l_linenumber, l_partkey
            FROM read_parquet('{sf}/lineitem.parquet')
            ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber"""
    ).fetchall()
    want = {}
    hist: dict[int, list] = {}
    for sk, ok, ln, pk in rows:
        h = hist.setdefault(sk, [])
        h.append(pk)
        want[(sk, ok, ln)] = len(set(h[-20:]))
    got = {
        (r.l_suppkey, r.l_orderkey, r.l_linenumber): r.distinct_parts_20
        for r in o14_rolling_distinct(spark, sf).collect()
    }
    assert got == want
    assert max(want.values()) > 1
