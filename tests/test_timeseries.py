"""A11–A13 time-series/behavioral analytics + J7 interval overlap +
X5c heavy hitters + X13 quantile gate: semantic unit tests on
hand-built frames (the sf0.01 oracle sweep covers the testdata path)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from realtime_financial_transactions_data_pipeline_spark.operators.asof import (
    interval_overlap_join,
)
from realtime_financial_transactions_data_pipeline_spark.operators.curation import (
    quantile_gate,
)
from realtime_financial_transactions_data_pipeline_spark.operators.sketches import (
    misra_gries_candidates,
)
from realtime_financial_transactions_data_pipeline_spark.operators.timeseries import (
    cohort_retention,
    funnel,
    funnel_single_pass,
    gapfill_daily,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_gapfill_fills_silent_days_and_mas(spark):
    facts = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01T10:00:00"), 10.0),
            ("a", _ts("2024-01-04T10:00:00"), 40.0),  # 2nd/3rd silent
            ("b", _ts("2024-01-02T10:00:00"), 5.0),
        ],
        ["dim", "ts", "v"],
    )
    out = gapfill_daily(facts, "ts", "dim", "v", ma_days=2)
    rows = {(r.dim, r.day): r for r in out.collect()}
    # Every (dim, day) cell exists for the full global span.
    assert len(rows) == 2 * 4
    assert rows[("a", "2024-01-02")].revenue == 0.0
    assert rows[("b", "2024-01-04")].revenue == 0.0
    # 2-day trailing MA: day4 for a = (0 + 40)/2.
    assert rows[("a", "2024-01-04")].ma2 == 20.0
    assert rows[("a", "2024-01-01")].ma2 == 5.0  # frame clipped at start


def test_funnel_requires_strict_order(spark):
    ev = spark.createDataFrame(
        [
            # u1 converts fully in order.
            (1, _ts("2024-01-01T10:00:00"), "view"),
            (1, _ts("2024-01-01T10:01:00"), "click"),
            (1, _ts("2024-01-01T10:02:00"), "purchase"),
            # u2 clicked BEFORE viewing - click must not count.
            (2, _ts("2024-01-01T09:00:00"), "click"),
            (2, _ts("2024-01-01T10:00:00"), "view"),
            # u3 viewed only.
            (3, _ts("2024-01-01T10:00:00"), "view"),
            # u4 purchased without view - not even stage 1.
            (4, _ts("2024-01-01T10:00:00"), "purchase"),
        ],
        ["user_id", "ts", "event_type"],
    )
    stages = ["view", "click", "purchase"]
    # Both plans (staged multi-join, single-shuffle array walk) must
    # produce identical funnels.
    for impl in (funnel, funnel_single_pass):
        row = impl(ev, "user_id", "ts", "event_type", stages).head()
        assert (row.n_view, row.n_click, row.n_purchase) == (3, 1, 1), impl
        assert abs(row.rate_purchase - round(1 / 3, 4)) < 1e-9, impl


def test_cohort_retention_offsets(spark):
    ev = spark.createDataFrame(
        [
            # u1 first in week of Mon 2024-01-01, active again 2 weeks on.
            (1, _ts("2024-01-02T10:00:00")),
            (1, _ts("2024-01-16T10:00:00")),
            # u2 same cohort week, active only then.
            (2, _ts("2024-01-05T10:00:00")),
            # u3 cohort week of Mon 2024-01-08.
            (3, _ts("2024-01-10T10:00:00")),
        ],
        ["user_id", "ts"],
    )
    out = {
        (r.cohort_week, r.week_offset): r.active_users
        for r in cohort_retention(ev, "user_id", "ts").collect()
    }
    assert out[("2024-01-01", 0)] == 2
    assert out[("2024-01-01", 2)] == 1
    assert out[("2024-01-08", 0)] == 1
    assert ("2024-01-01", 1) not in out  # silent week absent (sparse matrix)


def test_interval_overlap_closed_endpoints(spark):
    a = spark.createDataFrame(
        [(1, "a1", 0, 10), (1, "a2", 20, 30), (2, "a3", 0, 10)],
        ["k", "id_a", "s_a", "e_a"],
    )
    b = spark.createDataFrame(
        [(1, "b1", 10, 15), (1, "b2", 31, 40), (2, "b3", 11, 12)],
        ["k", "id_b", "s_b", "e_b"],
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in interval_overlap_join(a, b, "k", "s_a", "e_a", "s_b", "e_b")
        .select("id_a", "id_b")
        .collect()
    }
    # a1/b1 touch at 10 (closed), a2/b2 gap of 1, a3/b3 disjoint, and
    # no cross-key pair (a3 would overlap b1 if keys were ignored).
    assert pairs == {("a1", "b1")}


def test_misra_gries_superset_of_heavy_hitters(spark):
    # 60 'hot' + 40 singletons over >=2 partitions; theta = 1/4.
    rows = [("hot",)] * 60 + [(f"w{i}",) for i in range(40)]
    items = spark.createDataFrame(rows, ["w"]).repartition(4)
    cand = {r.w for r in misra_gries_candidates(items, "w", k=8).collect()}
    assert "hot" in cand
    # Summary stayed bounded: each of the 4 partitions emits <= k items.
    assert len(cand) <= 4 * 8


def test_quantile_gate_keeps_top_three_quarters(spark):
    docs = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 9)], ["doc_id", "s"]
    )
    kept = quantile_gate(docs, F.col("s"), q=0.25)
    ids = sorted(r.doc_id for r in kept.collect())
    # Exact P25 of 1..8 = 2.75 (linear interpolation) -> keep 3..8.
    assert ids == [3, 4, 5, 6, 7, 8]


def test_daily_anomalies_flags_outlier(spark):
    import datetime as dt

    from realtime_financial_transactions_data_pipeline_spark.operators.timeseries import (
        daily_anomalies,
    )

    rows = []
    # 10 quiet days of 100, one spike day of 1000.
    for day in range(1, 11):
        rows.append((dt.datetime(2024, 1, day, 12), 100.0))
    rows.append((dt.datetime(2024, 1, 11, 12), 1000.0))
    out = {r.day: r for r in daily_anomalies(
        spark.createDataFrame(rows, ["ts", "v"]), "ts", "v"
    ).collect()}
    assert out["2024-01-11"].is_anomaly
    assert not out["2024-01-05"].is_anomaly
    assert out["2024-01-11"].z > 2.0


def test_znormalized_similarity_is_shape_based(spark):
    """Two users with IDENTICAL shape at different volume (10x) have
    z-distance 0; an anti-correlated user is farther than both."""
    import datetime as dt

    from realtime_financial_transactions_data_pipeline_spark.operators.timeseries import (
        daily_profile_series,
        znormalize,
    )
    from pyspark.sql import functions as F

    rows = []
    base = dt.datetime(2024, 1, 1)
    shape = [1.0, 5.0, 2.0, 8.0, 3.0]
    for day, v in enumerate(shape):
        ts = base + dt.timedelta(days=day)
        rows.append((1, ts, v))          # the shape
        rows.append((2, ts, v * 10))     # same shape, 10x volume
        rows.append((3, ts, 10.0 - v))   # anti-correlated
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    z = znormalize(daily_profile_series(df, n_days=5), n=5)
    zz = {r.user_id: r.z for r in z.collect()}
    d12 = sum((a - b) ** 2 for a, b in zip(zz[1], zz[2])) ** 0.5
    d13 = sum((a - b) ** 2 for a, b in zip(zz[1], zz[3])) ** 0.5
    assert d12 < 1e-9          # volume invariance
    assert d13 > 1.0           # shape difference dominates


def test_constant_series_dropped(spark):
    import datetime as dt

    from realtime_financial_transactions_data_pipeline_spark.operators.timeseries import (
        daily_profile_series,
        znormalize,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [(1, base + dt.timedelta(days=d), 5.0) for d in range(3)]
    rows += [(2, base + dt.timedelta(days=d), float(d)) for d in range(3)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    z = znormalize(daily_profile_series(df, n_days=3), n=3)
    assert [r.user_id for r in z.collect()] == [2]


def test_incremental_agg_equals_full_recompute_any_split(spark):
    """Fold-in invariance: splitting the stream at ANY boundary and
    merging states equals the one-shot aggregate."""
    import datetime as dt

    from realtime_financial_transactions_data_pipeline_spark.operators.relational import (
        agg_state,
        merge_agg_state,
    )
    from pyspark.sql import functions as F

    base = dt.datetime(2024, 1, 1)
    rows = [
        ("a", base + dt.timedelta(hours=h), float(h)) for h in range(10)
    ] + [("b", base + dt.timedelta(hours=h), 2.0 * h) for h in range(7)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    df = df.select("event_type", F.date_format("ts", "yyyy-MM-dd").alias("day"), "value")
    keys = ["event_type", "day"]
    full = {
        tuple(r[k] for k in keys): (round(r.sum_value, 6), r.n)
        for r in agg_state(df, keys).collect()
    }
    for threshold in (0.0, 3.0, 8.0, 17.0):
        left = df.filter(F.col("value") < threshold)
        right = df.filter(F.col("value") >= threshold)
        merged = merge_agg_state(agg_state(left, keys), agg_state(right, keys), keys)
        got = {
            tuple(r[k] for k in keys): (round(r.sum_value, 6), r.n)
            for r in merged.collect()
        }
        assert got == full, threshold


def test_scd2_intervals_abut_and_single_current(spark):
    """SCD2 invariants on real data: per user, intervals sort by
    valid_from, each valid_to equals the next valid_from, and exactly
    one open (is_current) row exists."""
    from realtime_financial_transactions_data_pipeline_spark.operators.relational import (
        k9_scd2_build,
    )

    rows = k9_scd2_build(spark, "/root/testdata/sf0.001").collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for user, rs in by_user.items():
        rs.sort(key=lambda r: r.valid_from)
        assert sum(r.is_current for r in rs) == 1, user
        assert rs[-1].is_current and rs[-1].valid_to == "9999-12-31 00:00:00"
        for a, b in zip(rs, rs[1:]):
            assert a.valid_to == b.valid_from, (user, a, b)


def test_ts4_acf_bounded_and_complete(spark, sf_dir):
    """ACF estimates are bounded by |r_k| <= 1 (Cauchy-Schwarz on the
    full-mean estimator) and the probe reports every lag 1..14 over a
    consistent gap-filled day count."""
    from realtime_financial_transactions_data_pipeline_spark.operators.timeseries import (
        ts4_autocorrelation,
    )

    rows = ts4_autocorrelation(spark, sf_dir).collect()
    assert sorted(r.lag for r in rows) == list(range(1, 15))
    assert all(abs(r.acf) <= 1.0 + 1e-9 for r in rows)
    assert len({r.n_days for r in rows}) == 1 and rows[0].n_days >= 14


def test_ts5_cusum_invariants(spark, sf_dir):
    """CUSUM of deviations from the series mean telescopes to ~0 on the
    last day, exactly one day carries the changepoint flag at the
    |CUSUM| max, and the calendar is gap-free."""
    from realtime_financial_transactions_data_pipeline_spark.operators.timeseries import (
        ts5_cusum_changepoint,
    )

    rows = sorted(ts5_cusum_changepoint(spark, sf_dir).collect(), key=lambda r: r.d)
    assert abs(rows[-1].cusum) < 1e-3  # Σ(x - μ) over all days == 0
    peaks = [r for r in rows if r.is_changepoint]
    m = max(abs(r.cusum) for r in rows)
    assert peaks and all(abs(r.cusum) == m for r in peaks)
    import datetime as dt

    days = [dt.date.fromisoformat(r.d) for r in rows]
    assert (days[-1] - days[0]).days + 1 == len(days)


def test_ts5_detects_planted_level_shift(spark):
    """A synthetic series with a level shift at day 20 of 40 puts the
    |CUSUM| peak exactly on the last pre-shift day."""
    import datetime as dt

    from realtime_financial_transactions_data_pipeline_spark.operators import timeseries

    base = dt.datetime(2024, 3, 1, 12, 0)
    rows = []
    eid = 0
    for day in range(40):
        n = 5 if day < 20 else 15  # level shift upward at day 20
        for _ in range(n):
            rows.append((eid, 1, "click", base + dt.timedelta(days=day), 1.0, "{}"))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp, value double, props string"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(f"{d}/events.parquet")
        out = sorted(
            timeseries.ts5_cusum_changepoint(spark, d).collect(), key=lambda r: r.d
        )
    flagged = [r.d for r in out if r.is_changepoint]
    assert flagged == ["2024-03-20"]  # last day of the low regime


def test_a20_attribution_matches_pandas_recompute(spark):
    """First/last-touch credit recomputed independently in pandas from
    the raw events: same per-(model, channel) conversion counts, both
    models attribute the same conversion total (every purchase with a
    touch in the lookback gets exactly one credit per model), shares
    sum to 1 per model."""
    import pandas as pd

    from realtime_financial_transactions_data_pipeline_spark.operators.relational import (
        a20_touch_attribution,
    )

    sf = "/root/testdata/sf0.001"
    pdf = pd.read_parquet(sf + "/events.parquet")
    p = pdf[pdf.event_type == "purchase"][["user_id", "event_id", "ts"]]
    t = pdf[pdf.event_type.isin(["click", "view"])][
        ["user_id", "event_type", "ts", "event_id"]
    ].rename(columns={"event_type": "channel", "ts": "tt", "event_id": "tid"})
    j = p.merge(t, on="user_id")
    j = j[(j.tt <= j.ts) & (j.tt >= j.ts - pd.Timedelta(days=7))]
    expect = {}
    for model, asc in (("first_touch", True), ("last_touch", False)):
        picked = (
            j.sort_values(["tt", "tid"], ascending=asc)
            .groupby("event_id")
            .head(1)
        )
        for ch, n in picked.channel.value_counts().items():
            expect[(model, ch)] = n
    rows = a20_touch_attribution(spark, sf).collect()
    got = {(r.model, r.channel): r.n_conversions for r in rows}
    assert got == expect
    for model in ("first_touch", "last_touch"):
        share = sum(r.share for r in rows if r.model == model)
        assert abs(share - 1.0) < 1e-3, (model, share)
    totals = {
        m: sum(n for (mm, _), n in got.items() if mm == m)
        for m in ("first_touch", "last_touch")
    }
    assert totals["first_touch"] == totals["last_touch"]


def test_ts6_trend_matches_numpy_polyfit(spark):
    """Slope/intercept/r2/forecast recomputed independently with numpy
    from the same daily sums."""
    import numpy as np
    import pandas as pd

    from realtime_financial_transactions_data_pipeline_spark.operators.timeseries import (
        ts6_trend_forecast,
    )

    sf = "/root/testdata/sf0.001"
    pdf = pd.read_parquet(sf + "/events.parquet")
    pdf["day"] = pdf["ts"].dt.normalize()
    got = {r.event_type: r for r in ts6_trend_forecast(spark, sf).collect()}
    for et, grp in pdf.groupby("event_type"):
        daily = grp.groupby("day")["value"].sum().sort_index()
        x = np.array([(d - daily.index[0]).days for d in daily.index], float)
        y = daily.to_numpy()
        slope, intercept = np.polyfit(x, y, 1)
        r2 = np.corrcoef(x, y)[0, 1] ** 2
        mx = x.max()
        fc = 7 * intercept + slope * (7 * mx + 28)
        g = got[et]
        assert g.n_days == len(x)
        assert abs(g.slope - slope) < 1e-2 * max(1, abs(slope)), (et, g.slope, slope)
        assert abs(g.intercept - intercept) < 1e-2 * max(1, abs(intercept))
        assert abs(g.r2 - r2) < 1e-3
        assert abs(g.forecast_next7 - fc) < max(0.1, 1e-4 * abs(fc))


def test_a21_percentile_bands_match_numpy(spark):
    """Daily p50/p95 recomputed with numpy's linear interpolation (the
    quantile_cont definition), and the spike flag re-derived from the
    rounded values."""
    import numpy as np
    import pandas as pd

    from realtime_financial_transactions_data_pipeline_spark.operators.timeseries import (
        a21_daily_percentile_bands,
    )

    sf = "/root/testdata/sf0.001"
    pdf = pd.read_parquet(sf + "/events.parquet")
    pdf["day"] = pdf["ts"].dt.strftime("%Y-%m-%d")
    rows = a21_daily_percentile_bands(spark, sf).collect()
    assert rows
    by_series = {}
    for r in rows:
        by_series.setdefault(r.event_type, {})[r.day] = r
    for (et, day), grp in pdf.groupby(["event_type", "day"]):
        r = by_series[et][day]
        assert r.n == len(grp)
        v = grp["value"].to_numpy()
        assert abs(r.p50 - round(float(np.quantile(v, 0.5)), 4)) < 1e-9
        assert abs(r.p95 - round(float(np.quantile(v, 0.95)), 4)) < 1e-9
    for et, days in by_series.items():
        p95s = [r.p95 for r in days.values()]
        med = round(float(np.quantile(np.array(p95s), 0.5)), 4)
        for r in days.values():
            assert abs(r.series_median_p95 - med) < 1e-9
            assert r.p95_spike == (r.p95 > 1.5 * med)


def test_o9_weighted_median_semantics(spark, monkeypatch):
    """Lower weighted median on a hand frame: weights pull the median
    away from the unweighted one, a dominant weight IS the median, and
    the exact-half boundary picks the lower value (2*cw >= W at the
    first value crossing half)."""
    from realtime_financial_transactions_data_pipeline_spark.operators import relational
    from realtime_financial_transactions_data_pipeline_spark.tables import load_table as real_load

    rows = [
        # flag A: values 1(w=1), 2(w=1), 100(w=6) -> half of 8 is 4,
        # cum at 100 first reaches >= 4 -> median 100 (dominant weight)
        ("A", 1.0, 1.0), ("A", 2.0, 1.0), ("A", 100.0, 6.0),
        # flag B: 1(w=2), 2(w=2) -> W=4, cum(1)=2, 2*2>=4 -> lower value 1
        ("B", 1.0, 2.0), ("B", 2.0, 2.0),
        # flag C: repeated value rows collapse: 5 appears twice w=1 each
        ("C", 5.0, 1.0), ("C", 5.0, 1.0), ("C", 9.0, 1.0),
    ]
    df = spark.createDataFrame(
        rows, "l_returnflag string, l_extendedprice double, l_quantity double"
    )
    monkeypatch.setattr(
        relational, "load_table", lambda s, d, t: df if t == "lineitem" else real_load(s, d, t)
    )
    got = {
        r.l_returnflag: (r.weighted_median, r.total_weight, r.n_values)
        for r in relational.o9_weighted_median(spark, "unused").collect()
    }
    assert got == {"A": (100.0, 8, 3), "B": (1.0, 4, 2), "C": (5.0, 3, 2)}


def test_a23_gini_closed_forms(spark, monkeypatch):
    """Gini closed forms on planted distributions: perfect equality
    -> 0; one customer holding everything -> (n-1)/n; top-decile share
    = 1.0 in the monopoly case. Regions isolate the cases."""
    import datetime as _dt

    from realtime_financial_transactions_data_pipeline_spark.operators import relational
    from realtime_financial_transactions_data_pipeline_spark.tables import load_table as real_load

    # region EQ: 4 customers, 10.00 each -> gini 0, top decile = 1 cust = 0.25
    # region MONO: 5 customers, one has 50.00, rest 0.00 -> gini 4/5
    custs, nats, regs, orders = [], [], [], []
    regs = [(0, "EQ"), (1, "MONO")]
    nats = [(0, 0), (1, 1)]  # nationkey -> regionkey
    oid = 0
    for ck in range(1, 5):
        custs.append((ck, 0))
        oid += 1
        orders.append((oid, ck, 10.0, _dt.datetime(2024, 1, 1)))
    for ck in range(10, 15):
        custs.append((ck, 1))
        oid += 1
        orders.append((oid, ck, 50.0 if ck == 10 else 0.0, _dt.datetime(2024, 1, 1)))
    frames = {
        "orders": spark.createDataFrame(
            orders, "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate timestamp"
        ),
        "customer": spark.createDataFrame(custs, "c_custkey long, c_nationkey int"),
        "nation": spark.createDataFrame(nats, "n_nationkey int, n_regionkey int"),
        "region": spark.createDataFrame(regs, "r_regionkey int, r_name string"),
    }
    monkeypatch.setattr(
        relational, "load_table", lambda s, d, t: frames.get(t) or real_load(s, d, t)
    )
    got = {
        r.region: r for r in relational.a23_revenue_concentration(spark, "unused").collect()
    }
    assert got["EQ"].gini == 0.0
    assert abs(got["EQ"].top_decile_share - 0.25) < 1e-9
    assert abs(got["MONO"].gini - 4 / 5) < 1e-9
    assert got["MONO"].top_decile_share == 1.0
    assert got["EQ"].total_cents == 4000 and got["MONO"].total_cents == 5000


def test_a24_rfm_python_parity(spark):
    """a24 parity against a from-scratch Python recompute at sf0.001,
    including exact ntile bucket-size semantics (first n%4 buckets get
    the extra row) and the segment ladder."""
    import duckdb

    from realtime_financial_transactions_data_pipeline_spark.operators.timeseries import (
        a24_rfm_segmentation,
    )

    sf = "/root/testdata/sf0.001"
    orders = duckdb.sql(
        f"SELECT o_custkey, CAST(o_orderdate AS DATE) AS d, o_totalprice "
        f"FROM read_parquet('{sf}/orders.parquet')"
    ).fetchall()
    agg: dict[int, list] = {}
    maxd = max(r[1] for r in orders)
    for ck, d, tp in orders:
        a = agg.setdefault(ck, [d, 0, 0.0])
        a[0] = max(a[0], d)
        a[1] += 1
        a[2] += tp
    base = {
        ck: ((maxd - a[0]).days, a[1], round(a[2], 2))
        for ck, a in agg.items()
    }

    def ntile4(order):  # order: list of custkeys already sorted
        n = len(order)
        size, extra = divmod(n, 4)
        out, i = {}, 0
        for b in range(1, 5):
            cnt = size + (1 if b <= extra else 0)
            for ck in order[i : i + cnt]:
                out[ck] = b
            i += cnt
        return out

    r_s = ntile4(sorted(base, key=lambda c: (-base[c][0], c)))
    f_s = ntile4(sorted(base, key=lambda c: (base[c][1], c)))
    m_s = ntile4(sorted(base, key=lambda c: (base[c][2], c)))

    def seg(r, f, m):
        if r == 4 and f == 4 and m == 4:
            return "champion"
        if r >= 3 and f >= 3:
            return "loyal"
        if r <= 1 and f >= 3:
            return "at_risk"
        if r <= 1 and f <= 1:
            return "lost"
        return "regular"

    rows = a24_rfm_segmentation(spark, sf).collect()
    assert len(rows) == len(base)
    for row in rows:
        ck = row.c_custkey
        rec, freq, mon = base[ck]
        assert (row.recency_days, row.frequency) == (rec, freq)
        assert abs(row.monetary - mon) < 1e-6
        r, f, m = r_s[ck], f_s[ck], m_s[ck]
        assert (row.r_score, row.f_score, row.m_score) == (r, f, m), ck
        assert row.rfm_code == f"{r}{f}{m}"
        assert row.segment == seg(r, f, m)


def test_ts7_holt_python_parity(spark):
    """ts7 parity against a from-scratch Python Holt recursion at
    sf0.001 — every fold step, the init convention (l0=y0, b0=y1-y0,
    fold from the third point), and the 7-day forecast."""
    import duckdb

    from realtime_financial_transactions_data_pipeline_spark.operators.timeseries import (
        _TS7_ALPHA,
        _TS7_BETA,
        _TS7_H,
        ts7_holt_forecast,
    )

    sf = "/root/testdata/sf0.001"
    daily = duckdb.sql(
        f"""SELECT event_type, CAST(ts AS DATE) AS day,
                   sum(CAST(round(value * 1000) AS BIGINT)) AS y
            FROM read_parquet('{sf}/events.parquet') GROUP BY 1, 2
            ORDER BY event_type, day"""
    ).fetchall()
    series: dict[str, list[float]] = {}
    for et, _, y in daily:
        series.setdefault(et, []).append(float(y))
    rows = {r.event_type: r for r in ts7_holt_forecast(spark, sf).collect()}
    assert set(rows) == set(series)
    a, b = _TS7_ALPHA, _TS7_BETA
    for et, ys in series.items():
        l, t = ys[0], ys[1] - ys[0]
        for y in ys[2:]:
            nl = a * y + (1 - a) * (l + t)
            t = b * (nl - l) + (1 - b) * t
            l = nl
        r = rows[et]
        assert r.n_days == len(ys)
        assert abs(r.level_mills - round(l, 4)) < 1e-6, et
        assert abs(r.trend_mills - round(t, 4)) < 1e-6, et
        assert abs(r.forecast_7d_mills - round(l + _TS7_H * t, 4)) < 1e-6, et


def test_ts8_holt_winters_python_parity(spark):
    """ts8 parity against a from-scratch Python Holt-Winters additive
    recursion at sf0.001 — the week-1/week-2 init convention, every
    fold step of the 9-dimensional state, and the 7-day forecast."""
    import duckdb

    from realtime_financial_transactions_data_pipeline_spark.operators.timeseries import (
        _TS8_M,
        ts8_holt_winters_forecast,
    )

    a, na, b, nb, g, ng = 0.4, 0.6, 0.2, 0.8, 0.3, 0.7
    sf = "/root/testdata/sf0.001"
    daily = duckdb.sql(
        f"""SELECT event_type, CAST(ts AS DATE) AS day,
                   sum(CAST(round(value * 1000) AS BIGINT)) AS y
            FROM read_parquet('{sf}/events.parquet') GROUP BY 1, 2
            ORDER BY event_type, day"""
    ).fetchall()
    series: dict[str, list[float]] = {}
    for et, _, y in daily:
        series.setdefault(et, []).append(float(y))
    rows = {
        r.event_type: r
        for r in ts8_holt_winters_forecast(spark, sf).collect()
    }
    assert set(rows) == {et for et, ys in series.items() if len(ys) >= 14}
    for et, ys in series.items():
        if len(ys) < 14:
            continue
        l = sum(ys[:7]) / 7.0
        t = (sum(ys[7:14]) / 7.0 - l) / 7.0
        s = [y - l for y in ys[:7]]
        for y in ys[7:]:
            s0 = s.pop(0)
            nl = a * (y - s0) + na * (l + t)
            t = b * (nl - l) + nb * t
            s.append(g * (y - nl) + ng * s0)
            l = nl
        r = rows[et]
        assert r.n_days == len(ys)
        assert abs(r.level_mills - round(l, 4)) < 1e-5, et
        assert abs(r.trend_mills - round(t, 4)) < 1e-5, et
        assert abs(r.season_mills - round(s[-1], 4)) < 1e-5, et
        assert (
            abs(r.forecast_7d_mills - round(l + _TS8_M * t + s[-1], 4)) < 1e-5
        ), et


def test_ts9_backtest_python_parity(spark):
    """ts9 parity against a from-scratch Python backtest at sf0.001:
    the truncated Holt fit, both holdout error sets, the in-sample
    seasonal-naive denominator, and the MASE ratios."""
    import duckdb

    from realtime_financial_transactions_data_pipeline_spark.operators.timeseries import (
        _TS7_ALPHA,
        _TS7_BETA,
        _TS9_H,
        ts9_forecast_backtest,
    )

    a, b, m = _TS7_ALPHA, _TS7_BETA, _TS9_H
    sf = "/root/testdata/sf0.001"
    daily = duckdb.sql(
        f"""SELECT event_type, CAST(ts AS DATE) AS day,
                   sum(CAST(round(value * 1000) AS BIGINT)) AS y
            FROM read_parquet('{sf}/events.parquet') GROUP BY 1, 2
            ORDER BY event_type, day"""
    ).fetchall()
    series: dict[str, list[float]] = {}
    for et, _, y in daily:
        series.setdefault(et, []).append(float(y))
    rows = {
        r.event_type: r for r in ts9_forecast_backtest(spark, sf).collect()
    }
    assert set(rows) == {et for et, ys in series.items() if len(ys) >= 3 * m}
    for et, ys in series.items():
        if len(ys) < 3 * m:
            continue
        n = len(ys)
        train = ys[: n - m]
        l, t = train[0], train[1] - train[0]
        for y in train[2:]:
            nl = a * y + (1 - a) * (l + t)
            t = b * (nl - l) + (1 - b) * t
            l = nl
        e_holt = [abs(ys[n - m + h - 1] - (l + h * t)) for h in range(1, m + 1)]
        e_naive = [
            abs(ys[n - m + h - 1] - ys[n - 2 * m + h - 1])
            for h in range(1, m + 1)
        ]
        e_ins = [abs(ys[i] - ys[i - m]) for i in range(m, n - m)]
        d = sum(e_ins) / len(e_ins)
        naive_mae, holt_mae = sum(e_naive) / m, sum(e_holt) / m
        r = rows[et]
        assert r.n_train == n - m and r.n_test == m
        assert abs(r.insample_naive_mae_mills - round(d, 4)) < 1e-6, et
        assert abs(r.naive_mae_mills - round(naive_mae, 4)) < 1e-6, et
        assert abs(r.holt_mae_mills - round(holt_mae, 4)) < 1e-5, et
        assert abs(r.naive_mase - round(naive_mae / d, 4)) < 1e-6, et
        assert abs(r.holt_mase - round(holt_mae / d, 4)) < 1e-5, et
        assert r.holt_beats_naive == (holt_mae < naive_mae), et


def test_a25_pvm_bridge_identity(spark):
    """a25: the Laspeyres/Paasche split reconstructs the exact revenue
    delta per brand, and totals match a DuckDB brute-force replay at
    sf0.001."""
    import duckdb

    from realtime_financial_transactions_data_pipeline_spark.operators.relational import (
        _A25_M1,
        _A25_M2,
        a25_price_volume_mix,
    )

    sf = "/root/testdata/sf0.001"
    rows = a25_price_volume_mix(spark, sf).collect()
    assert rows, "both months must have activity at sf0.001"
    exp = {
        b: (q1, r1, q2, r2)
        for b, q1, r1, q2, r2 in duckdb.sql(
            f"""SELECT p_brand,
                       sum(CASE WHEN l_shipdate < DATE '{_A25_M2[0]}'
                                THEN l_quantity ELSE 0 END),
                       sum(CASE WHEN l_shipdate < DATE '{_A25_M2[0]}'
                           THEN CAST(round(l_extendedprice * (1 - l_discount)
                                           * 10000) AS BIGINT) ELSE 0 END),
                       sum(CASE WHEN l_shipdate >= DATE '{_A25_M2[0]}'
                                THEN l_quantity ELSE 0 END),
                       sum(CASE WHEN l_shipdate >= DATE '{_A25_M2[0]}'
                           THEN CAST(round(l_extendedprice * (1 - l_discount)
                                           * 10000) AS BIGINT) ELSE 0 END)
                FROM read_parquet('{sf}/lineitem.parquet') l
                JOIN read_parquet('{sf}/part.parquet') p
                  ON l.l_partkey = p.p_partkey
                WHERE l_shipdate >= DATE '{_A25_M1[0]}'
                  AND l_shipdate < DATE '{_A25_M2[1]}'
                GROUP BY 1"""
        ).fetchall()
    }
    for r in rows:
        q1, r1, q2, r2 = exp[r.p_brand]
        assert (r.qty_m1, r.rev_m1_dm, r.qty_m2, r.rev_m2_dm) == (
            q1, r1, q2, r2,
        ), r.p_brand
        assert r.delta_dm == r2 - r1
        # exact identity: volume + price effect = delta (pre-rounding)
        assert (
            abs(r.volume_effect_dm + r.price_effect_dm - r.delta_dm) < 0.01
        ), r.p_brand
    # every brand active in only one month is excluded
    active_both = {b for b, (q1, _, q2, _) in exp.items() if q1 > 0 and q2 > 0}
    assert {r.p_brand for r in rows} == active_both


def test_a27_growth_accounting_conservation(spark):
    """Growth-accounting identities at sf0.001: actives(M) = new +
    retained + resurrected, and retained(M) + churned(M) =
    actives(M-1) — the books must balance month over month."""
    import duckdb

    from realtime_financial_transactions_data_pipeline_spark.operators.timeseries import (
        a27_growth_accounting,
    )

    sf = "/root/testdata/sf0.001"
    actives = {
        m: n
        for m, n in duckdb.sql(
            f"""SELECT strftime(date_trunc('month', CAST(o_orderdate AS DATE)),
                               '%Y-%m'),
                       count(DISTINCT o_custkey)
                FROM read_parquet('{sf}/orders.parquet') GROUP BY 1"""
        ).fetchall()
    }
    rows = {r.month: r for r in a27_growth_accounting(spark, sf).collect()}
    assert set(rows) == set(actives)
    months = sorted(actives)
    for i, m in enumerate(months):
        r = rows[m]
        assert r.n_new + r.n_retained + r.n_resurrected == actives[m], m
        if i > 0:
            prev = months[i - 1]
            # consecutive calendar months only — TPC-H orders span
            # continuous months, so every step here is consecutive
            assert r.n_retained + r.n_churned == actives[prev], m


def test_a26_ltv_monotone_and_totals(spark):
    """LTV curves are monotone in age, and each cohort's final
    cumulative equals its total 12-month revenue recomputed in
    DuckDB."""
    import duckdb

    from realtime_financial_transactions_data_pipeline_spark.operators.timeseries import (
        _A26_MONTHS,
        a26_cohort_ltv,
    )

    sf = "/root/testdata/sf0.001"
    rows = a26_cohort_ltv(spark, sf).collect()
    assert rows
    by_cohort: dict[str, list] = {}
    for r in rows:
        by_cohort.setdefault(r.cohort, []).append(r)
    want = {
        c: t
        for c, t in duckdb.sql(
            f"""WITH o AS (SELECT o_custkey,
                        date_trunc('month', CAST(o_orderdate AS DATE)) AS m,
                        CAST(round(o_totalprice * 100) AS BIGINT) AS cents
                 FROM read_parquet('{sf}/orders.parquet')),
            f AS (SELECT o_custkey, min(m) AS cohort FROM o GROUP BY 1)
            SELECT strftime(f.cohort, '%Y-%m'), sum(o.cents)
            FROM o JOIN f USING (o_custkey)
            WHERE f.cohort >= DATE '{_A26_MONTHS[0]}'
              AND f.cohort < DATE '{_A26_MONTHS[1]}'
              AND (EXTRACT(year FROM o.m) - EXTRACT(year FROM f.cohort)) * 12
                  + (EXTRACT(month FROM o.m) - EXTRACT(month FROM f.cohort))
                  <= 11
            GROUP BY 1"""
        ).fetchall()
    }
    for c, rs in by_cohort.items():
        rs.sort(key=lambda r: r.age_months)
        cums = [r.cum_revenue_cents for r in rs]
        assert cums == sorted(cums)  # monotone
        assert cums[-1] == want[c], c
        for r in rs:
            assert (
                abs(
                    r.ltv_per_customer
                    - round(r.cum_revenue_cents / r.n_customers / 100.0, 4)
                )
                < 1e-9
            )


def test_a29_sessionization_brute_force(spark):
    """Session splits, counts, spans, and bounce tallies equal a
    pure-Python replay of the 30-minute gap rule at sf0.001."""
    import duckdb

    from realtime_financial_transactions_data_pipeline_spark.operators.timeseries import (
        _A29_GAP_S,
        a29_batch_sessionization,
    )

    sf = "/root/testdata/sf0.001"
    rows = duckdb.sql(
        f"""SELECT user_id, epoch_ms(ts) // 1000 AS s, event_id
            FROM read_parquet('{sf}/events.parquet')
            ORDER BY user_id, s, event_id"""
    ).fetchall()
    per_user: dict[int, list] = {}
    for uid, s, _ in rows:
        per_user.setdefault(uid, []).append(s)
    want = {}
    for uid, ss in per_user.items():
        sessions = [[ss[0]]]
        for prev, cur in zip(ss, ss[1:]):
            if cur - prev > _A29_GAP_S:
                sessions.append([cur])
            else:
                sessions[-1].append(cur)
        want[uid] = (
            len(sessions),
            sum(len(x) for x in sessions),
            max(len(x) for x in sessions),
            max(x[-1] - x[0] for x in sessions),
            sum(1 for x in sessions if len(x) == 1),
        )
    got = {
        r.user_id: (
            r.n_sessions,
            r.n_events,
            r.max_session_events,
            r.max_session_span_s,
            r.n_bounce_sessions,
        )
        for r in a29_batch_sessionization(spark, sf).collect()
    }
    assert got == want
    # the corpus must exercise both regimes
    assert any(v[0] > 1 for v in want.values())
    assert any(v[4] > 0 for v in want.values())


def test_t15_builtin_agrees_with_a29_up_to_boundary(spark):
    """The built-in session_window and a29's manual islands implement
    the same gap rule except at EXACTLY gap-sized adjacencies (the
    built-in splits, the lag rule merges), so per-user session counts
    may differ only where such an adjacency exists — and event totals
    must always match."""
    import duckdb

    from realtime_financial_transactions_data_pipeline_spark.operators.timeseries import (
        _A29_GAP_S,
        a29_batch_sessionization,
        t15_session_window_builtin,
    )

    sf = "/root/testdata/sf0.001"
    a = {r.user_id: r for r in a29_batch_sessionization(spark, sf).collect()}
    t = {r.user_id: r for r in t15_session_window_builtin(spark, sf).collect()}
    assert set(a) == set(t)
    exact_gap_users = {
        row[0]
        for row in duckdb.sql(
            f"""WITH e AS (
                  SELECT user_id, epoch_ms(ts) // 1000 AS s,
                         lag(epoch_ms(ts) // 1000) OVER (
                           PARTITION BY user_id ORDER BY epoch_ms(ts) // 1000,
                           event_id) AS prev_s
                  FROM read_parquet('{sf}/events.parquet'))
                SELECT DISTINCT user_id FROM e
                WHERE s - prev_s = {_A29_GAP_S}"""
        ).fetchall()
    }
    for uid in a:
        assert a[uid].n_events == t[uid].n_events
        if uid not in exact_gap_users:
            assert a[uid].n_sessions == t[uid].n_sessions, uid
        else:
            assert t[uid].n_sessions >= a[uid].n_sessions, uid


def test_ts10_drawdown_matches_python_replay(spark):
    """ts10 parity against a from-scratch Python replay of the
    cumulative-mills curve at sf0.001: running peak, deepest drawdown,
    earliest-worst-day tie-break, final level — plus the invariant that
    a drawdown is never negative (peak is a running max of cum)."""
    from collections import defaultdict

    import duckdb

    from realtime_financial_transactions_data_pipeline_spark.operators.timeseries import (
        ts10_max_drawdown,
    )

    sf = "/root/testdata/sf0.001"
    daily = duckdb.sql(
        f"""SELECT event_type, CAST(ts AS DATE) AS day,
                   sum(CAST(round(value * 1000) AS BIGINT)) AS mills
            FROM read_parquet('{sf}/events.parquet')
            GROUP BY 1, 2 ORDER BY 1, 2"""
    ).fetchall()
    series = defaultdict(list)
    for et, day, mills in daily:
        series[et].append((day, mills))
    expected = {}
    for et, rows in series.items():
        cum, peak, best = 0, None, None  # best = (draw, day, peak_at_trough)
        for day, mills in rows:
            cum += mills
            peak = cum if peak is None else max(peak, cum)
            draw = peak - cum
            if best is None or draw > best[0]:
                best = (draw, day, peak)
        expected[et] = (cum, best[0], str(best[1]), best[2])
    got = {r.event_type: r for r in ts10_max_drawdown(spark, sf).collect()}
    assert set(got) == set(expected)
    for et, (final, draw, day, peak_at) in expected.items():
        r = got[et]
        assert r.final_mills == final, et
        assert r.max_drawdown_mills == draw >= 0, et
        assert r.worst_day == day, et
        want = round(draw / peak_at, 6) if peak_at else 0.0
        assert abs(r.max_dd_frac - want) < 1e-9, et


def test_ts12_acf_matches_numpy(spark):
    """ts12 parity vs numpy.corrcoef over the same calendar-aligned
    lag pairs at sf0.001 — certifies the integer-moment Pearson against
    an independent float implementation (agreement to the 4-decimal
    rounding the probe emits)."""
    from collections import defaultdict

    import duckdb
    import numpy as np

    from realtime_financial_transactions_data_pipeline_spark.operators.timeseries import (
        _TS12_LAGS,
        ts12_autocorrelation,
    )

    sf = "/root/testdata/sf0.001"
    daily = duckdb.sql(
        f"""SELECT event_type, CAST(ts AS DATE) AS day,
                   sum(CAST(round(value) AS BIGINT)) AS x
            FROM read_parquet('{sf}/events.parquet') GROUP BY 1, 2"""
    ).fetchall()
    series = defaultdict(dict)
    for et, day, x in daily:
        series[et][day] = x
    import datetime

    expected = {}
    for et, d in series.items():
        for k in _TS12_LAGS:
            xs, ys = [], []
            for day, x in d.items():
                prev = d.get(day - datetime.timedelta(days=k))
                if prev is not None:
                    xs.append(x)
                    ys.append(prev)
            if len(xs) >= 2:
                expected[(et, k)] = (len(xs), np.corrcoef(xs, ys)[0, 1])
    rows = {
        (r.event_type, r.lag): r
        for r in ts12_autocorrelation(spark, sf).collect()
    }
    assert set(rows) == set(expected)
    for key, (n, acf) in expected.items():
        r = rows[key]
        assert r.n_pairs == n, key
        assert abs(r.acf - acf) < 5e-4, (key, r.acf, acf)
