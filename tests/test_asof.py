"""J6 as-of join: semantics, tolerance, and the no-join-node plan."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from realtime_financial_transactions_data_pipeline_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    txns = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:05"), "t1"),
            (1, _ts("2024-01-01T09:00:00"), "t2"),  # before any quote
            (2, _ts("2024-01-01T12:00:00"), "t3"),  # equal-ts match
            (3, _ts("2024-01-01T12:00:00"), "t4"),  # key with no quotes
        ],
        ["k", "ts", "txn_id"],
    )
    quotes = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:30:00"), 5.0),
            (1, _ts("2024-01-01T10:00:00"), 7.0),  # latest <= t1
            (1, _ts("2024-01-01T11:00:00"), 9.0),  # after t1 - ignored
            (2, _ts("2024-01-01T12:00:00"), 2.0),  # ties t3 exactly
        ],
        ["k", "qts", "rate"],
    )
    return txns, quotes


def test_asof_picks_latest_at_or_before(spark):
    txns, quotes = _frames(spark)
    out = {
        r.txn_id: (r.rate, r._asof_ts)
        for r in asof_join(
            txns, quotes, key="k", left_ts="ts", right_ts="qts",
            right_payload=["rate"],
        ).collect()
    }
    assert out["t1"] == (7.0, _ts("2024-01-01T10:00:00"))  # not 5.0, not 9.0
    assert out["t2"] == (None, None)  # no quote yet
    assert out["t3"] == (2.0, _ts("2024-01-01T12:00:00"))  # >= includes equal
    assert out["t4"] == (None, None)  # key never quoted


def test_asof_tolerance_nulls_stale_matches(spark):
    txns, quotes = _frames(spark)
    out = {
        r.txn_id: r.rate
        for r in asof_join(
            txns, quotes, key="k", left_ts="ts", right_ts="qts",
            right_payload=["rate"], tolerance_seconds=1,
        ).collect()
    }
    assert out["t1"] is None  # 5s-old quote > 1s tolerance
    assert out["t3"] == 2.0  # 0s old


def test_asof_plan_has_single_window_and_no_join(spark):
    """The union-window formulation must never degrade into a join with
    a per-key pair blow-up: no join node of any kind, exactly one
    Window, and the left/right scans shuffled once for it."""
    txns, quotes = _frames(spark)
    out = asof_join(
        txns, quotes, key="k", left_ts="ts", right_ts="qts",
        right_payload=["rate"],
    )
    plan = out._jdf.queryExecution().explainString(
        out.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "Join" not in plan, plan
    assert plan.count("(.*Window") <= 1 or plan.count(") Window") == 1
    assert "Union" in plan


def test_j6_probe_matches_naive_join_formulation(spark, sf_dir):
    """Cross-check the window plan against an independently-written
    naive Spark formulation (join + row_number) on real testdata."""
    from realtime_financial_transactions_data_pipeline_spark.operators.asof import (
        j6_asof_join,
    )
    from realtime_financial_transactions_data_pipeline_spark.tables import load_table
    from pyspark.sql import Window

    fast = {
        (r.user_id, r.purchase_id): (r.click_id, r.mins_since_click)
        for r in j6_asof_join(spark, sf_dir).collect()
    }

    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.date_trunc("second", "ts").alias("pts"),
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .select("user_id", "event_id", F.date_trunc("second", "ts").alias("cts"))
        .groupBy("user_id", "cts")
        .agg(F.max("event_id").alias("click_id"))
    )
    # The eligibility predicate lives IN the join condition so a
    # purchase whose clicks are all in the future still survives as an
    # unmatched null row (a WHERE would drop it).
    pa, ca = p.alias("p"), c.alias("c")
    w = Window.partitionBy("p.user_id", "p.purchase_id").orderBy(
        F.col("c.cts").desc()
    )
    naive = (
        pa.join(
            ca,
            (F.col("p.user_id") == F.col("c.user_id"))
            & (F.col("c.cts") <= F.col("p.pts")),
            "left",
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("p.user_id").alias("user_id"),
            "p.purchase_id",
            "c.click_id",
            "p.pts",
            "c.cts",
        )
    )
    slow = {}
    for r in naive.collect():
        mins = (
            None
            if r.cts is None
            else round((r.pts - r.cts).total_seconds() / 60.0, 2)
        )
        slow[(r.user_id, r.purchase_id)] = (r.click_id, mins)
    assert set(fast) == set(slow)
    mismatches = {k: (fast[k], slow[k]) for k in fast if fast[k] != slow[k]}
    assert not mismatches, list(mismatches.items())[:5]


def test_asof_nearest_directions_ties_and_tolerance(spark):
    """Pins j9's nearest semantics on a crafted frame: backward-closer,
    forward-closer, exact tie (earlier/backward wins), equal-timestamp
    (distance 0), out-of-tolerance on both sides (null), and a key with
    no right rows at all (null)."""
    from realtime_financial_transactions_data_pipeline_spark.operators.asof import (
        asof_nearest,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    s = lambda k: t0 + dt.timedelta(seconds=k)  # noqa: E731
    left = spark.createDataFrame(
        [
            (1, s(100), "back-closer"),    # rights at 90 (d=10) and 130 (d=30)
            (2, s(100), "fwd-closer"),     # rights at 60 (d=40) and 110 (d=10)
            (3, s(100), "tie"),            # rights at 80 and 120 (d=20 both)
            (4, s(100), "equal-ts"),       # right exactly at 100
            (5, s(100), "out-of-window"),  # rights at 0 and 500, tol=60
            (6, s(100), "no-rights"),
        ],
        "k long, lts timestamp, label string",
    )
    right = spark.createDataFrame(
        [
            (1, s(90), 190), (1, s(130), 1130),
            (2, s(60), 260), (2, s(110), 2110),
            (3, s(80), 380), (3, s(120), 3120),
            (4, s(100), 4100),
            (5, s(0), 500), (5, s(500), 5500),
        ],
        "k long, rts timestamp, rid long",
    )
    out = {
        r.label: (r.rid, r._asof_ts)
        for r in asof_nearest(
            left, right, key="k", left_ts="lts", right_ts="rts",
            right_payload=["rid"], tolerance_seconds=60,
        ).collect()
    }
    assert out["back-closer"] == (190, s(90))
    assert out["fwd-closer"] == (2110, s(110))
    assert out["tie"] == (380, s(80))          # earlier (backward) wins
    assert out["equal-ts"] == (4100, s(100))   # distance 0
    assert out["out-of-window"] == (None, None)
    assert out["no-rights"] == (None, None)


def test_asof_nearest_plan_single_sort_no_join(spark):
    """The nearest join must keep j6's plan shape: one union, one
    window sort computing BOTH direction frames, and no join node
    anywhere."""
    from realtime_financial_transactions_data_pipeline_spark.operators.asof import (
        asof_nearest,
    )

    left = spark.createDataFrame([(1, dt.datetime(2024, 1, 1), "x")],
                                 "k long, lts timestamp, p string")
    right = spark.createDataFrame([(1, dt.datetime(2024, 1, 1), 5)],
                                  "k long, rts timestamp, rid long")
    plan = asof_nearest(
        left, right, key="k", left_ts="lts", right_ts="rts",
        right_payload=["rid"], tolerance_seconds=60,
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert plan.count("Window") <= 2  # both frames share one sort


def test_pit_join_expiry_gap_and_boundaries(spark):
    """Crafted PIT corpus pinning every boundary the leakage guard
    exists for: fact AT valid_from matches (>= semantics); fact just
    inside the TTL matches; fact AT the expiry instant gets NULL
    (half-open interval); fact in the gap between an expired version
    and the next one gets NULL even though a stale version exists —
    the case a plain as-of silently gets wrong; fact before any
    version gets NULL; a same-instant version+fact matches the new
    version, not the prior one."""
    import datetime as dt

    from realtime_financial_transactions_data_pipeline_spark.operators.asof import pit_join

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(days=0, secs=0):
        return t0 + dt.timedelta(days=days, seconds=secs)

    # user 1: v10 [day0, day7) (TTL-expired), v20 [day10, day11),
    #         v30 [day11, day18)  (closed by next change, then TTL)
    versions = spark.createDataFrame(
        [
            (1, 10, ts(0), ts(7)),
            (1, 20, ts(10), ts(11)),
            (1, 30, ts(11), ts(18)),
        ],
        "user_id long, ver_id long, vf timestamp, vt timestamp",
    )
    facts = spark.createDataFrame(
        [
            (100, 1, ts(0)),            # at valid_from -> v10
            (101, 1, ts(6, 86399)),     # just inside TTL -> v10
            (102, 1, ts(7)),            # at expiry instant -> NULL
            (103, 1, ts(8)),            # in the gap, stale v10 -> NULL
            (104, 1, ts(11)),           # same-instant new version -> v30
            (105, 1, ts(-1)),           # before any version -> NULL
            (106, 2, ts(3)),            # keyless user -> NULL
        ],
        "event_id long, user_id long, ts timestamp",
    )
    got = {
        r.event_id: r.ver_id
        for r in pit_join(
            facts, versions, key="user_id", fact_ts="ts",
            valid_from="vf", valid_to="vt", version_cols=["ver_id"],
        ).collect()
    }
    assert got == {100: 10, 101: 10, 102: None, 103: None,
                   104: 30, 105: None, 106: None}


def test_j12_temporal_fx_rate_law_and_coverage(spark):
    """The as-of FX conversion: rates are bounded bps (the hash law),
    conversion is exact-integer per order (sum(base) <= 1.5 * sum
    (native) by the law's 15000 bps ceiling), two invocations agree,
    and sparse publication really excludes pre-first-rate orders on
    some month or covers all — either way deterministically."""
    from realtime_financial_transactions_data_pipeline_spark.operators.asof import (
        j12_temporal_fx,
    )

    sf = "/root/testdata/sf0.001"
    rows1 = sorted(map(tuple, j12_temporal_fx(spark, sf).collect()))
    rows2 = sorted(map(tuple, j12_temporal_fx(spark, sf).collect()))
    assert rows1 == rows2 and rows1
    for month, ccy, n, native, base in rows1:
        assert n > 0 and native > 0
        # rate_bps in [5000, 15000) -> base in [native/2, native*1.5)
        assert native // 2 - n <= base < native * 3 // 2 + n
