"""Time-series & behavioral analytics extensions (A11–A13): calendar
gap-fill + moving average, event funnels, cohort retention.

The reference dashboard's timeline chart (README.md:91, the A7 daily
time-series) silently drops days with no transactions and has no
trend smoothing, funnel, or retention view — BigQuery dashboards
usually bolt these on with generate_series + window SQL. Here they are
first-class operators on the events stream table.

Scale notes (100 TB):
  * Gap-fill builds the calendar spine from a 1-row min/max aggregate
    crossed with the distinct dimension values — spine size is
    |dims| x |days| (thousands), never proportional to the fact table;
    the fact side is pre-aggregated to daily grain BEFORE the join, so
    the spine join touches ~rows-per-day-per-dim aggregates only.
  * The moving average runs on integer cents (exact arithmetic), so
    window-sum implementation details (running accumulation vs DuckDB's
    segment tree) cannot produce cross-engine FP drift.
  * Funnel stages are min-timestamp aggregates per user joined on the
    user key — shuffle on the natural key, each stage's frame shrinks
    monotonically (only users who reached the prior stage survive).
  * Cohort retention is two user-grain aggregates joined on user_id and
    re-aggregated to (cohort_week, week_offset) — output cardinality is
    weeks², independent of fact scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from realtime_financial_transactions_data_pipeline_spark.functions.compat import dround
from realtime_financial_transactions_data_pipeline_spark.registry import probe
from realtime_financial_transactions_data_pipeline_spark.tables import load_table


def gapfill_daily(
    facts: DataFrame,
    ts_col: str,
    dim_col: str,
    value_col: str,
    ma_days: int = 7,
) -> DataFrame:
    """Daily ``value_col`` totals per ``dim_col`` with every calendar day
    between the global min and max date present (0.0 where no rows), plus
    an ``ma{n}`` trailing moving average over the last ``ma_days`` days.

    Totals are carried as exact integer cents through the window so the
    moving average is engine-portable (no FP summation-order drift).
    """
    daily = (
        facts.groupBy(
            F.col(dim_col), F.to_date(ts_col).alias("d")
        ).agg(
            F.round(F.sum(value_col) * 100, 0).cast("long").alias("cents")
        )
    )
    bounds = facts.agg(
        F.min(F.to_date(ts_col)).alias("d0"), F.max(F.to_date(ts_col)).alias("d1")
    )
    spine = (
        facts.select(dim_col).distinct()
        .crossJoin(F.broadcast(bounds))
        .select(dim_col, F.explode(F.sequence("d0", "d1")).alias("d"))
    )
    filled = spine.join(daily, [dim_col, "d"], "left").withColumn(
        "cents", F.coalesce("cents", F.lit(0).cast("long"))
    )
    w = (
        Window.partitionBy(dim_col)
        .orderBy("d")
        .rowsBetween(-(ma_days - 1), Window.currentRow)
    )
    return filled.select(
        F.col(dim_col),
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        (F.col("cents") / 100.0).alias("revenue"),
        dround(
            F.sum("cents").over(w) / (100.0 * ma_days), 2
        ).alias(f"ma{ma_days}"),
    )


@probe(
    "a11_gapfill_moving_avg",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(round(sum(value) * 100, 0) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
      FROM events
    ),
    spine AS (
      SELECT t.event_type, g.d
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS d
                  FROM bounds) g
    ),
    filled AS (
      SELECT s.event_type, s.d, coalesce(daily.cents, 0) AS cents
      FROM spine s LEFT JOIN daily ON s.event_type = daily.event_type
                                  AND s.d = daily.d
    )
    SELECT event_type, strftime(d, '%Y-%m-%d') AS day,
           cents / 100.0 AS revenue,
           round(sum(cents) OVER (PARTITION BY event_type ORDER BY d
                                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                 / 700.0, 2) AS ma7
    FROM filled
    """,
)
def a11_gapfill_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: calendar gap-fill + 7-day trailing moving average of daily
    revenue per event_type. Every day in [min, max] appears for every
    type (revenue 0.0 on silent days); the MA sums integer cents in the
    window frame, so Spark's running accumulation and DuckDB's segment
    tree agree bit-for-bit."""
    return gapfill_daily(
        load_table(spark, sf_dir, "events"),
        ts_col="ts",
        dim_col="event_type",
        value_col="value",
        ma_days=7,
    )


def funnel(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: list[str],
) -> DataFrame:
    """Ordered-funnel user counts: stage i counts users whose earliest
    ``stages[i]`` event STRICTLY AFTER their stage i-1 entry time exists.
    Returns one row: ``n_<stage>`` user counts plus ``rate_<stage>``
    conversion vs the first stage.

    Each stage is a min-timestamp aggregate over the (shrinking) set of
    users who reached the previous stage — no window over the full
    event stream, no per-user event sorting. The whole funnel is ONE
    declarative plan (1-row stage counts broadcast-crossJoined), so a
    3-stage funnel is one Spark job, not an action per stage.
    """
    reached = (
        events.filter(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t0"))
    )
    stage_counts = [reached.agg(F.count(F.lit(1)).alias(f"n_{stages[0]}"))]
    prev_ts = "t0"
    for i, stage in enumerate(stages[1:], start=1):
        reached = (
            events.filter(F.col(type_col) == stage)
            .join(reached, user_col)
            .filter(F.col(ts_col) > F.col(prev_ts))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t{i}"))
        )
        prev_ts = f"t{i}"
        stage_counts.append(reached.agg(F.count(F.lit(1)).alias(f"n_{stage}")))
    out = stage_counts[0]
    for c in stage_counts[1:]:
        out = out.crossJoin(F.broadcast(c))
    for stage in stages[1:]:
        out = out.withColumn(
            f"rate_{stage}",
            F.when(
                F.col(f"n_{stages[0]}") > 0,
                dround(F.col(f"n_{stage}") / F.col(f"n_{stages[0]}"), 4),
            ).otherwise(F.lit(0.0)),
        )
    return out


def funnel_single_pass(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: list[str],
) -> DataFrame:
    """Single-shuffle funnel: ONE groupBy(user) collects each later
    stage's sorted timestamp array plus the first stage's min, then JVM
    array lambdas (`filter` + `array_min`) walk the stages per user —
    stage i's entry is the earliest stage-i timestamp strictly after
    stage i-1's entry (null-propagating: a user who missed stage i-1
    can't enter stage i, since `ts > NULL` filters everything).

    vs the staged ``funnel``: one shuffle instead of one per stage, but
    per-user state is the user's funnel-type timestamps (same per-key
    boundedness class as sessionization). For funnels over event types
    a single user can emit unboundedly, use ``funnel`` — it only ever
    aggregates min-timestamps.
    """

    def _gt(bound_col: str):
        # Single-arg closure: a 2-arg lambda would receive the array
        # index as its second argument (PySpark dispatches on arity).
        return lambda x: x > F.col(bound_col)

    g = events.groupBy(user_col).agg(
        F.min(
            F.when(F.col(type_col) == stages[0], F.col(ts_col))
        ).alias("t0"),
        *[
            F.array_sort(
                F.collect_list(
                    F.when(F.col(type_col) == s, F.col(ts_col))
                )
            ).alias(f"_arr{i}")
            for i, s in enumerate(stages[1:], start=1)
        ],
    )
    for i in range(1, len(stages)):
        g = g.withColumn(
            f"t{i}", F.array_min(F.filter(F.col(f"_arr{i}"), _gt(f"t{i-1}")))
        )
    out = g.agg(
        *[
            F.count(f"t{i}").alias(f"n_{s}")
            for i, s in enumerate(stages)
        ]
    )
    for stage in stages[1:]:
        out = out.withColumn(
            f"rate_{stage}",
            F.when(
                F.col(f"n_{stages[0]}") > 0,
                dround(F.col(f"n_{stage}") / F.col(f"n_{stages[0]}"), 4),
            ).otherwise(F.lit(0.0)),
        )
    return out


@probe(
    "a12_funnel",
    oracle="""
    WITH v AS (SELECT user_id, min(ts) AS t0 FROM events
               WHERE event_type = 'view' GROUP BY user_id),
         c AS (SELECT e.user_id, min(e.ts) AS t1
               FROM events e JOIN v ON e.user_id = v.user_id
               WHERE e.event_type = 'click' AND e.ts > v.t0
               GROUP BY e.user_id),
         p AS (SELECT e.user_id, min(e.ts) AS t2
               FROM events e JOIN c ON e.user_id = c.user_id
               WHERE e.event_type = 'purchase' AND e.ts > c.t1
               GROUP BY e.user_id)
    SELECT (SELECT count(*) FROM v) AS n_view,
           (SELECT count(*) FROM c) AS n_click,
           (SELECT count(*) FROM p) AS n_purchase,
           round((SELECT count(*) FROM c) * 1.0 / (SELECT count(*) FROM v), 4)
             AS rate_click,
           round((SELECT count(*) FROM p) * 1.0 / (SELECT count(*) FROM v), 4)
             AS rate_purchase
    """,
)
def a12_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: ordered view → click → purchase funnel over the events
    stream. A user converts at stage N only with an event strictly
    after their stage N-1 entry timestamp (min-ts semantics, so
    re-orderings of same-type events don't matter). Probe uses the
    single-shuffle array-walk plan; the staged multi-join variant
    (`funnel`) computes the identical result (unit-asserted)."""
    out = funnel_single_pass(
        load_table(spark, sf_dir, "events"),
        user_col="user_id",
        ts_col="ts",
        type_col="event_type",
        stages=["view", "click", "purchase"],
    )
    return out.select(
        F.col("n_view").cast("long"),
        F.col("n_click").cast("long"),
        F.col("n_purchase").cast("long"),
        F.col("rate_click").cast("double"),
        F.col("rate_purchase").cast("double"),
    )


def cohort_retention(
    events: DataFrame, user_col: str, ts_col: str
) -> DataFrame:
    """Weekly cohort retention matrix: users bucketed by the ISO week of
    their first event; ``active_users`` counts distinct users of that
    cohort active in each subsequent week (``week_offset`` weeks after
    the cohort week)."""
    first = events.groupBy(user_col).agg(
        F.date_trunc("week", F.min(F.to_date(ts_col))).cast("date").alias("cw")
    )
    activity = events.select(
        F.col(user_col),
        F.date_trunc("week", F.to_date(ts_col)).cast("date").alias("aw"),
    ).distinct()
    return (
        activity.join(first, user_col)
        .groupBy(
            F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("aw", "cw") / 7).cast("long").alias("week_offset"),
        )
        .agg(F.countDistinct(user_col).alias("active_users"))
    )


@probe(
    "a13_cohort_retention",
    oracle="""
    WITH first AS (
      SELECT user_id,
             date_trunc('week', min(CAST(ts AS DATE))) AS cw
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', CAST(ts AS DATE)) AS aw
      FROM events
    )
    SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', cw, aw) / 7 AS BIGINT) AS week_offset,
           CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
    FROM activity JOIN first USING (user_id)
    GROUP BY 1, 2
    """,
)
def a13_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13: weekly cohort retention over events. Both engines truncate
    to Monday-start weeks (Spark date_trunc('week') and DuckDB
    date_trunc('week') share ISO semantics); offsets are exact integer
    day-diffs / 7."""
    return cohort_retention(
        load_table(spark, sf_dir, "events"), user_col="user_id", ts_col="ts"
    )


def daily_anomalies(
    facts: DataFrame, ts_col: str, value_col: str, z_threshold: float = 2.0
) -> DataFrame:
    """A14 — z-score anomaly flags on the daily total series: each day's
    revenue scored against the mean/stddev of ALL days; |z| above the
    threshold flags the day. The stats are one 1-row aggregate over the
    (tiny) daily series, broadcast back — the fact table aggregates
    once, daily rows never shuffle again."""
    daily = facts.groupBy(F.to_date(ts_col).alias("d")).agg(
        dround(F.sum(value_col), 2).alias("revenue")
    )
    stats = daily.agg(
        F.avg("revenue").alias("_mu"), F.stddev_samp("revenue").alias("_sd")
    )
    return (
        daily.crossJoin(F.broadcast(stats))
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "revenue",
            dround((F.col("revenue") - F.col("_mu")) / F.col("_sd"), 4).alias("z"),
            (
                F.abs(F.col("revenue") - F.col("_mu"))
                > F.lit(z_threshold) * F.col("_sd")
            ).alias("is_anomaly"),
        )
    )


@probe(
    "a14_daily_anomalies",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, round(sum(value), 2) AS revenue
      FROM events GROUP BY 1
    ),
    stats AS (SELECT avg(revenue) AS mu, stddev_samp(revenue) AS sd FROM daily)
    SELECT strftime(d, '%Y-%m-%d') AS day,
           revenue,
           round((revenue - mu) / sd, 4) AS z,
           abs(revenue - mu) > 2.0 * sd AS is_anomaly
    FROM daily, stats
    """,
)
def a14_daily_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14: daily revenue outlier detection — z-score each day against
    the whole series, flag |z| > 2 (the dashboard's 'unusual day'
    marker). Mean/stddev agree cross-engine (both stddev_samp over the
    same rounded daily totals)."""
    return daily_anomalies(
        load_table(spark, sf_dir, "events"), ts_col="ts", value_col="value"
    )


# ---------------------------------------------------------------------------
# ts1 — time-series similarity search (the EDBT'19 streaming-similarity
# theme, batch form): z-normalized daily activity profiles per user,
# top-k closest pairs under Euclidean distance. Z-normalization makes
# the match about SHAPE (correlation), not volume — the standard
# pre-step of matrix-profile / UCR-suite pipelines.
# ---------------------------------------------------------------------------

_TS_DAYS = 30
_TS_EPOCH = "2024-01-01"
_TS_TOPK = 5


def daily_profile_series(events: DataFrame, n_days: int = _TS_DAYS) -> DataFrame:
    """(user_id, v): each user's daily value totals as a fixed
    ``n_days`` array (missing days 0.0). One groupBy shuffle; the
    gap-fill is a JVM map lookup over a literal day sequence, no spine
    join."""
    daily = (
        events.withColumn(
            "idx", F.datediff(F.to_date("ts"), F.lit(_TS_EPOCH).cast("date"))
        )
        .filter((F.col("idx") >= 0) & (F.col("idx") < n_days))
        .groupBy("user_id", "idx")
        .agg(F.sum("value").alias("s"))
    )
    m = F.map_from_entries(F.collect_list(F.struct("idx", "s")))
    slots = F.transform(
        F.sequence(F.lit(0), F.lit(n_days - 1)),
        lambda i: F.coalesce(_elem(m, i), F.lit(0.0)),
    )
    return daily.groupBy("user_id").agg(slots.alias("v"))


def _elem(m, i):
    return F.element_at(m, i.cast("int"))


def znormalize(series: DataFrame, n: int = _TS_DAYS) -> DataFrame:
    """Append ``z``: (v - mean) / population-std per series; constant
    series (zero variance) drop — shape similarity is undefined for
    them. Pure array lambdas, no shuffle."""
    mean = F.expr("aggregate(v, 0.0D, (a, x) -> a + x)") / n
    var = F.expr("aggregate(v, 0.0D, (a, x) -> a + x * x)") / n - mean * mean
    d = series.withColumn("_m", mean).withColumn("_var", var)
    return (
        d.filter(F.col("_var") > 1e-12)
        .withColumn(
            "z",
            F.expr("transform(v, x -> (x - _m) / sqrt(_var))"),
        )
        .drop("_m", "_var")
    )


@probe(
    "ts1_series_similarity",
    oracle=f"""
    WITH daily AS (
      SELECT user_id,
             datediff('day', DATE '{_TS_EPOCH}', CAST(ts AS DATE)) AS idx,
             sum(value) AS s
      FROM events
      WHERE datediff('day', DATE '{_TS_EPOCH}', CAST(ts AS DATE)) BETWEEN 0 AND {_TS_DAYS - 1}
      GROUP BY 1, 2),
    ser AS (
      SELECT u.user_id, list(coalesce(d2.s, 0.0) ORDER BY r.i) AS v
      FROM (SELECT DISTINCT user_id FROM daily) u
      CROSS JOIN (SELECT unnest(range(0, {_TS_DAYS})) AS i) r
      LEFT JOIN daily d2 ON d2.user_id = u.user_id AND d2.idx = r.i
      GROUP BY u.user_id),
    st AS (
      SELECT user_id, v,
             list_sum(v) / {_TS_DAYS} AS m,
             list_sum(list_transform(v, x -> x * x)) / {_TS_DAYS}
               - (list_sum(v) / {_TS_DAYS}) ^ 2 AS var
      FROM ser),
    z AS (
      SELECT user_id,
             list_transform(v, x -> (x - m) / sqrt(var)) AS z
      FROM st WHERE var > 1e-12),
    p AS (
      SELECT a.user_id AS user_a, b.user_id AS user_b,
             sqrt(list_sum(list_transform(range(1, {_TS_DAYS + 1}),
               i -> (a.z[CAST(i AS INTEGER)] - b.z[CAST(i AS INTEGER)]) ^ 2))) AS d
      FROM z a JOIN z b ON a.user_id < b.user_id)
    SELECT user_a, user_b, round(d, 4) AS zdist
    FROM p ORDER BY d, user_a, user_b LIMIT {_TS_TOPK}
    """,
)
def ts1_series_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_TS_TOPK} most similar user pairs by z-normalized daily
    activity shape — EXACT, via the tiled pairwise scan (the x2f
    pattern; VERDICT r06 #2 replaced the BroadcastNestedLoopJoin
    ``user_a < user_b`` theta join that exploded 10,000× at 100×
    users):

    - series hash into approximately even ⌈N/tile⌉ blocks —
      pmod(xxhash64) spreads keys statistically, so a block can exceed
      ``tile`` rows and the two-tile memory bound below holds in
      expectation, not worst case (an exactly-even row_number()/tile
      assignment would cost one extra shuffle; ADVICE r07 #4);
    - the unordered block-pair space is generated DISTRIBUTED
      (spark.range(n_blocks) self-join on blk_a <= blk_b — at ~10 M
      series the pair relation is ~200 M rows, too big to build as a
      driver-side Python list; VERDICT r07 note #1) and equi-joined to
      each side, so the plan holds two shuffle-hash joins on block ids
      and NO nested-loop node anywhere (pinned in test_plans.py);
    - each tile computes its squared-diff distance matrix vectorized
      in one Arrow batch and emits only its LOCAL lexicographic
      top-{_TS_TOPK} (tie-break (d, user_a, user_b), matching the
      global sort), so the shuffle after the scan carries
      ≤ {_TS_TOPK}·n_tiles rows instead of the N² pair space;
    - the global orderBy+limit over those survivors compiles to
      TakeOrderedAndProject.

    Per-task memory is two tile blocks regardless of N, and the result
    is bit-for-bit the exact all-pairs answer — the DuckDB oracle
    still runs the plain quadratic join."""
    import math

    e = load_table(spark, sf_dir, "events")
    # Eager localCheckpoint: the series table is consumed twice (the
    # block-count sizing action and the tile scan) — without it the
    # events aggregation runs twice end-to-end.
    z = znormalize(daily_profile_series(e)).localCheckpoint(eager=True)
    n = z.count()
    tile = 512
    n_blocks = max(1, math.ceil(n / tile))
    packed = (
        z.withColumn("_blk", F.pmod(F.xxhash64("user_id"), F.lit(n_blocks)).cast("int"))
        .groupBy("_blk")
        .agg(F.collect_list(F.struct("user_id", "z")).alias("items"))
    )
    # Distributed pair generation: sequence+explode is map-side (no
    # join node, nothing driver-materialized) and emits each unordered
    # block pair exactly once (blk_a <= blk_b).
    block_pairs = spark.range(n_blocks).select(
        F.col("id").cast("int").alias("blk_a"),
        F.explode(
            F.sequence(F.col("id").cast("int"), F.lit(n_blocks - 1))
        ).alias("blk_b"),
    )
    lhs = packed.select(F.col("_blk").alias("blk_a"), F.col("items").alias("items_a"))
    rhs = packed.select(F.col("_blk").alias("blk_b"), F.col("items").alias("items_b"))
    tiles = (
        block_pairs.join(lhs, "blk_a")
        .join(rhs, "blk_b")
        .withColumn("is_diag", F.col("blk_a") == F.col("blk_b"))
    )
    return _tile_scan_topk(tiles, _TS_TOPK)


def _tile_scan_topk(tiles: DataFrame, topk: int) -> DataFrame:
    """Shared exact tile scan: each row of ``tiles`` carries two packed
    blocks (``items_a``/``items_b`` of (user_id, z) structs) plus an
    ``is_diag`` flag for same-block tiles; compute the pairwise
    z-distances vectorized, emit each tile's local top-``topk`` under
    the global tie-break, and rank globally (TakeOrderedAndProject)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("user_a", T.LongType()),
            T.StructField("user_b", T.LongType()),
            T.StructField("_d", T.DoubleType()),
        ]
    )

    def tile_topk(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                ia, ib = row["items_a"], row["items_b"]
                ids_a = np.array([r["user_id"] for r in ia], dtype=np.int64)
                ids_b = np.array([r["user_id"] for r in ib], dtype=np.int64)
                A = np.array([r["z"] for r in ia], dtype=np.float64)
                B = np.array([r["z"] for r in ib], dtype=np.float64)
                # squared-diff form (not 2n - 2·A@Bᵀ): Σz² only
                # approximates n in floats, and the oracle sums the
                # squared differences — accumulating day-by-day keeps
                # BOTH the fold order of the oracle's list_sum AND
                # small cache-resident temporaries (a full
                # tile×tile×days broadcast temp is ~60 MB per task).
                D2 = np.zeros((len(ids_a), len(ids_b)))
                for k in range(A.shape[1]):
                    diff = A[:, k][:, None] - B[:, k][None, :]
                    D2 += diff * diff
                D = np.sqrt(D2)
                ua = np.broadcast_to(ids_a[:, None], D.shape)
                ub = np.broadcast_to(ids_b[None, :], D.shape)
                lo, hi = np.minimum(ua, ub), np.maximum(ua, ub)
                if row["is_diag"]:
                    # Diagonal tile: each unordered pair once. Cross
                    # tiles already ship once via blk_a < blk_b (ids
                    # there may sort either way; lo/hi normalizes).
                    keep = ua < ub
                else:
                    keep = np.ones(D.shape, dtype=bool)
                d, lo, hi = D[keep], lo[keep], hi[keep]
                # Local top-k under the GLOBAL tie-break (d, user_a,
                # user_b): a plain value partition could drop the
                # pair a full-precision tie would rank first.
                order = np.lexsort((hi, lo, d))[:topk]
                yield pd.DataFrame(
                    {"user_a": lo[order], "user_b": hi[order], "_d": d[order]}
                )

    return (
        tiles.mapInPandas(tile_topk, out_schema)
        .orderBy("_d", "user_a", "user_b")
        .limit(topk)
        .select("user_a", "user_b", dround(F.col("_d"), 4).alias("zdist"))
    )


#: Candidate-generation cluster count — a PROBE-SCALE constant (the
#: sf0.01 corpus holds ~1.5k users and the DuckDB oracle replays the
#: same seeded assignment, so k must be small and fixed). At corpus
#: scale pick k ~ N / target_cluster_size (similarity.py's IVF rule,
#: x2h: sqrt(N)-ish clusters sized so one cluster's pair block fits a
#: task) — do NOT carry 4 into a production run: distance work is
#: Σ_c N_c²/2, which only beats N²/2 when k grows with N.
_TS1B_K = 4


@probe(
    "ts1b_series_similarity_blocked",
    oracle=f"""
    WITH daily AS (
      SELECT user_id,
             datediff('day', DATE '{_TS_EPOCH}', CAST(ts AS DATE)) AS idx,
             sum(value) AS s
      FROM events
      WHERE datediff('day', DATE '{_TS_EPOCH}', CAST(ts AS DATE)) BETWEEN 0 AND {_TS_DAYS - 1}
      GROUP BY 1, 2),
    ser AS (
      SELECT u.user_id, list(coalesce(d2.s, 0.0) ORDER BY r.i) AS v
      FROM (SELECT DISTINCT user_id FROM daily) u
      CROSS JOIN (SELECT unnest(range(0, {_TS_DAYS})) AS i) r
      LEFT JOIN daily d2 ON d2.user_id = u.user_id AND d2.idx = r.i
      GROUP BY u.user_id),
    st AS (
      SELECT user_id, v,
             list_sum(v) / {_TS_DAYS} AS m,
             list_sum(list_transform(v, x -> x * x)) / {_TS_DAYS}
               - (list_sum(v) / {_TS_DAYS}) ^ 2 AS var
      FROM ser),
    z AS (
      SELECT user_id,
             list_transform(v, x -> (x - m) / sqrt(var)) AS z
      FROM st WHERE var > 1e-12),
    seeds AS (
      SELECT user_id AS cl, z AS centroid FROM z
      ORDER BY md5(CAST(user_id AS VARCHAR)) LIMIT {_TS1B_K}),
    s1 AS (
      SELECT z.user_id, seeds.cl,
             list_inner_product(z.z, seeds.centroid)
             / (sqrt(list_inner_product(z.z, z.z))
                * sqrt(list_inner_product(seeds.centroid, seeds.centroid))) AS sim
      FROM z CROSS JOIN seeds),
    a1 AS (
      SELECT user_id, cl FROM (
        SELECT user_id, cl,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY sim DESC, cl) AS rnk
        FROM s1) WHERE rnk = 1),
    za AS (SELECT z.user_id, z.z, a1.cl FROM z JOIN a1 USING (user_id)),
    p AS (
      SELECT a.user_id AS user_a, b.user_id AS user_b,
             sqrt(list_sum(list_transform(range(1, {_TS_DAYS + 1}),
               i -> (a.z[CAST(i AS INTEGER)] - b.z[CAST(i AS INTEGER)]) ^ 2))) AS d
      FROM za a JOIN za b ON a.user_id < b.user_id AND a.cl = b.cl)
    SELECT user_a, user_b, round(d, 4) AS zdist
    FROM p ORDER BY d, user_a, user_b LIMIT {_TS_TOPK}
    """,
)
def ts1b_series_similarity_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ts1's CORPUS-SCALE candidate step (VERDICT r07 #4): the SemDeDup
    shape applied to series. ts1's exact scan is intrinsically N²/2 in
    distance work; this variant first CLUSTERS the z-vectors (one
    seeded assignment pass of the x2j k-means machinery — cosine argmax
    is the euclidean argmin for z-normalized series, since |z|² is the
    constant n_days) and generates candidate pairs only WITHIN each
    cluster, then verifies candidates with the SAME exact tiled
    distance scan (`_tile_scan_topk`, is_diag keyed on
    (cluster, block)). Distance work drops from N²/2 to Σ_c N_c²/2 —
    k× less under balanced clusters — at the documented cost of
    missing pairs split across clusters (the candidate-generation
    recall tradeoff every blocked scheme makes; the DuckDB oracle
    replays seed -> assign -> within-cluster pairs, so the hash
    certifies exactly that semantics). Per-task memory stays two tile
    blocks: blocks hash WITHIN clusters, so a big cluster tiles into
    bounded tasks instead of one collect_list giant."""
    import math

    from realtime_financial_transactions_data_pipeline_spark.operators.similarity import (
        _norm,
        ivf_assign,
    )

    e = load_table(spark, sf_dir, "events")
    z = znormalize(daily_profile_series(e)).localCheckpoint(eager=True)
    n = z.count()
    tile = 512
    n_blocks = max(1, math.ceil(n / (_TS1B_K * tile)))
    emb = z.select(F.col("user_id").alias("vec_id"), F.col("z").alias("emb"))
    seeds = (
        emb.withColumn("_h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("_h")
        .limit(_TS1B_K)
    )
    cents = seeds.select(
        F.col("vec_id").alias("list_id"), F.col("emb").alias("centroid")
    ).withColumn("c_nrm2", _norm("centroid"))
    assign = ivf_assign(emb, cents, nprobe=1).select(
        F.col("vec_id").alias("user_id"),
        F.col("emb").alias("z"),
        F.col("list_id").alias("cl"),
    )
    # Eager localCheckpoint: packed feeds THREE consumers (the distinct
    # cluster set, lhs, rhs) — without it the whole assignment pass
    # (including its corpus x centroids crossJoin) recomputes per
    # consumer. The checkpoint also keeps that bounded-broadcast
    # nested-loop out of the final tile plan entirely.
    packed = (
        assign.withColumn(
            "_blk", F.pmod(F.xxhash64("user_id"), F.lit(n_blocks)).cast("int")
        )
        .groupBy("cl", "_blk")
        .agg(F.collect_list(F.struct("user_id", "z")).alias("items"))
        .localCheckpoint(eager=True)
    )
    # Per-cluster unordered block pairs, generated map-side (the ts1
    # sequence+explode pattern) from the tiny distinct-cluster set.
    block_pairs = (
        packed.select("cl")
        .distinct()
        .select(
            "cl",
            F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1))).alias("blk_a"),
        )
        .select(
            "cl",
            "blk_a",
            F.explode(F.sequence(F.col("blk_a"), F.lit(n_blocks - 1))).alias(
                "blk_b"
            ),
        )
    )
    lhs = packed.select(
        F.col("cl"), F.col("_blk").alias("blk_a"), F.col("items").alias("items_a")
    )
    rhs = packed.select(
        F.col("cl"), F.col("_blk").alias("blk_b"), F.col("items").alias("items_b")
    )
    tiles = (
        block_pairs.join(lhs, ["cl", "blk_a"])
        .join(rhs, ["cl", "blk_b"])
        .withColumn("is_diag", F.col("blk_a") == F.col("blk_b"))
    )
    return _tile_scan_topk(tiles, _TS_TOPK)


# ---------------------------------------------------------------------------
# TS2 — exponentially weighted moving average (EWMA) smoothing: the
# recursive smoother behind monitoring baselines and drift detectors
# (ewma_t = α·x_t + (1-α)·ewma_{t-1}, seeded with x_1). Recursion over
# an ordered series is not a windowed SUM, but per key the series is
# bounded by the calendar — so the scalable shape is a prefix
# collect_list window + an in-row fold: state per row is the prefix
# array (≤ days), the fold is codegen'd, and keys parallelize freely.
# Both engines run the IDENTICAL fold (Spark `aggregate` seeded with
# the first element == DuckDB `list_reduce`), and the series values
# are integer daily counts, so the folds are bit-identical.
# ---------------------------------------------------------------------------

_TS2_ALPHA = 0.25


@probe(
    "ts2_ewma_smoothing",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    pref AS (
      SELECT event_type, d, n,
             list(CAST(n AS DOUBLE))
               OVER (PARTITION BY event_type ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS xs
      FROM daily)
    SELECT event_type, strftime(d, '%Y-%m-%d') AS d, n,
           round(list_reduce(xs, (acc, x) -> {_TS2_ALPHA} * x
                 + {1 - _TS2_ALPHA} * acc) * 1000000) / 1000000 AS ewma
    FROM pref
    """,
)
def ts2_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS2 — EWMA (α = {_TS2_ALPHA}) over each event type's daily
    event-count series. The fold is seeded with the first element and
    applies α·x + (1-α)·acc left-to-right — exactly DuckDB's
    ``list_reduce`` contract — over integer daily counts, so the two
    engines' recursions are bit-identical and the 1e-6 rounding is
    belt-and-braces, not a crutch."""
    from pyspark.sql import Window

    from realtime_financial_transactions_data_pipeline_spark.functions.compat import (
        dround,
    )

    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pref = daily.withColumn(
        "xs", F.collect_list(F.col("n").cast("double")).over(w)
    )
    fold = F.expr(
        f"aggregate(slice(xs, 2, size(xs) - 1), xs[0],"
        f" (acc, x) -> CAST({_TS2_ALPHA} AS DOUBLE) * x"
        f" + CAST({1 - _TS2_ALPHA} AS DOUBLE) * acc)"
    )
    return pref.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("d"),
        "n",
        dround(fold, 6).alias("ewma"),
    )


@probe(
    "a18_rolling_active_users",
    oracle="""
    WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
    days AS (SELECT DISTINCT d FROM du)
    SELECT strftime(days.d, '%Y-%m-%d') AS day,
           CAST((SELECT count(DISTINCT user_id) FROM du
                 WHERE du.d = days.d) AS BIGINT) AS dau,
           CAST((SELECT count(DISTINCT user_id) FROM du
                 WHERE du.d BETWEEN days.d - 6 AND days.d) AS BIGINT) AS wau
    FROM days
    """,
)
def a18_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A18 — DAU + trailing-7-day WAU per calendar day: rolling DISTINCT
    counts, which no windowed aggregate computes directly (distinct
    does not decompose over sliding frames). The exact shape: reduce
    the log to distinct (day, user) pairs ONCE — the only touch of the
    fact table — then a bounded range join fans each pair to at most 7
    spine days before the per-day distinct count. At 100 TB the pair
    reduce is the map-side-combined heavy step, the spine is
    calendar-sized, and the 7x fan-out is the exact-WAU floor
    (swap in per-day HLL sketch unions — x5d's portable HLL — when
    approximate rolling actives are acceptable)."""
    e = load_table(spark, sf_dir, "events")
    du = e.select(
        F.to_date("ts").alias("d"), "user_id"
    ).distinct()
    days = du.select("d").distinct()
    dau = du.groupBy("d").agg(F.countDistinct("user_id").alias("dau"))
    pairs = du.select(F.col("d").alias("pd"), "user_id")
    wau = (
        days.join(
            pairs,
            (F.col("pd") <= F.col("d"))
            & (F.col("pd") >= F.date_sub(F.col("d"), 6)),
        )
        .groupBy("d")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        dau.join(wau, "d")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
        )
    )


# ---------------------------------------------------------------------------
# TS3 — classical additive seasonal decomposition (trend + weekly
# seasonal + residual), the moving-average method behind monitoring
# dashboards and STL's inner loop: trend is a CENTERED 7-day moving
# average (defined only where the full window exists), the seasonal
# index is the per-day-of-week mean of the detrended series re-centered
# to sum to zero, and the residual is what's left. Everything is
# windows + hash aggregates over a days-sized series per key — at
# 100 TB the daily reduction is the only fact-sized shuffle; the
# decomposition itself runs on |keys| × |days| rows.
# ---------------------------------------------------------------------------


@probe(
    "ts3_seasonal_decomposition",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    t AS (
      SELECT event_type, d, n,
             CASE WHEN count(*) OVER w7 = 7
                  THEN avg(CAST(n AS DOUBLE)) OVER w7 END AS trend
      FROM daily
      WINDOW w7 AS (PARTITION BY event_type ORDER BY d
                    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
    det AS (SELECT event_type, isodow(d) - 1 AS dow, n - trend AS dt
            FROM t WHERE trend IS NOT NULL),
    sraw AS (SELECT event_type, dow, avg(dt) AS s FROM det GROUP BY 1, 2),
    sadj AS (SELECT event_type, dow,
                    s - avg(s) OVER (PARTITION BY event_type) AS seasonal
             FROM sraw)
    SELECT t.event_type, strftime(t.d, '%Y-%m-%d') AS d, t.n,
           round(t.trend * 1000000) / 1000000 AS trend,
           round(sadj.seasonal * 1000000) / 1000000 AS seasonal,
           round((t.n - t.trend - sadj.seasonal) * 1000000) / 1000000
             AS residual
    FROM t JOIN sadj ON t.event_type = sadj.event_type
                    AND isodow(t.d) - 1 = sadj.dow
    """,
)
def ts3_seasonal_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS3 — additive decomposition of each event type's daily count
    series (see block comment). Day-of-week indexing uses Monday=0 in
    both engines (Spark ``weekday`` == DuckDB ``isodow - 1``); trend is
    NULL on the 3-row edges (the centered window's honest domain), and
    seasonal applies to every row via the dow join. Double averaging
    chains agree across engines well inside the 1e-6 rounding (integer
    counts, ~50-term means: accumulated ULP error ~1e-12)."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    w7 = Window.partitionBy("event_type").orderBy("d").rowsBetween(-3, 3)
    t = daily.withColumn(
        "trend",
        F.when(
            F.count(F.lit(1)).over(w7) == 7,
            F.avg(F.col("n").cast("double")).over(w7),
        ),
    )
    det = t.filter(F.col("trend").isNotNull()).select(
        "event_type",
        F.weekday("d").alias("dow"),
        (F.col("n") - F.col("trend")).alias("dt"),
    )
    sadj = (
        det.groupBy("event_type", "dow")
        .agg(F.avg("dt").alias("s"))
        .withColumn(
            "seasonal",
            F.col("s") - F.avg("s").over(Window.partitionBy("event_type")),
        )
        .select("event_type", "dow", "seasonal")
    )
    return (
        t.withColumn("dow", F.weekday("d"))
        .join(sadj, ["event_type", "dow"])
        .select(
            "event_type",
            F.date_format("d", "yyyy-MM-dd").alias("d"),
            "n",
            dround("trend", 6).alias("trend"),
            dround("seasonal", 6).alias("seasonal"),
            dround(F.col("n") - F.col("trend") - F.col("seasonal"), 6).alias(
                "residual"
            ),
        )
    )


# ---------------------------------------------------------------------------
# TS4 — autocorrelation function of the daily event-count series: the
# diagnostic every forecasting pipeline runs before picking seasonal
# terms (ts3's period-7 assumption is exactly what an ACF validates).
# Estimator: r_k = Σ(x_t - μ)(x_{t-k} - μ) / Σ(x_t - μ)² over the
# GAP-FILLED calendar (a missing day is a 0-count observation, not a
# missing one). Scale shape: the daily reduction is the only
# fact-sized shuffle; the series itself is |days| rows, the lag join
# is |days| × |lags|, and the two scalar moments ride the
# broadcast-scalar pattern (crossJoin of a 1-row aggregate).
# ---------------------------------------------------------------------------

_TS4_MAX_LAG = 14


@probe(
    "ts4_autocorrelation",
    oracle=f"""
    WITH daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
                          count(*) AS n
                   FROM events GROUP BY 1),
    bounds AS (SELECT min(d) AS lo, max(d) AS hi FROM daily),
    cal AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d
            FROM bounds),
    s AS (SELECT date_diff('day', (SELECT lo FROM bounds), cal.d) AS i,
                 CAST(COALESCE(n, 0) AS DOUBLE) AS x
          FROM cal LEFT JOIN daily ON daily.d = cal.d),
    st AS (SELECT avg(x) AS mu, count(*) AS nd FROM s),
    dev AS (SELECT i, x - (SELECT mu FROM st) AS dx FROM s),
    den AS (SELECT sum(dx * dx) AS dd FROM dev),
    lags AS (SELECT unnest(range(1, {_TS4_MAX_LAG + 1})) AS lag),
    num AS (SELECT lags.lag, sum(a.dx * b.dx) AS nn
            FROM lags CROSS JOIN dev a
            JOIN dev b ON b.i = a.i - lags.lag
            GROUP BY lags.lag)
    SELECT CAST(lag AS INTEGER) AS lag,
           round(nn / (SELECT dd FROM den), 6) AS acf,
           CAST((SELECT nd FROM st) AS BIGINT) AS n_days
    FROM num
    """,
)
def ts4_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS4 — ACF at lags 1..14 of the gap-filled daily event-count
    series (block comment above). The oracle replays calendar
    gap-filling, the mean/variance moments, the lag join, and the
    normalized sums; integer counts keep the double chains well inside
    the 1e-6 rounding."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    bounds = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    cal = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("d"),
        "lo",
    )
    s = (
        cal.join(daily, "d", "left")
        .select(
            F.datediff("d", "lo").alias("i"),
            F.coalesce(F.col("n"), F.lit(0)).cast("double").alias("x"),
        )
    )
    st = s.agg(F.avg("x").alias("mu"), F.count(F.lit(1)).alias("nd"))
    dev = s.crossJoin(F.broadcast(st)).select(
        "i", (F.col("x") - F.col("mu")).alias("dx"), "nd"
    )
    den = dev.agg(F.sum(F.col("dx") * F.col("dx")).alias("dd"))
    lags = spark.range(1, _TS4_MAX_LAG + 1).select(F.col("id").alias("lag"))
    cur = dev.crossJoin(F.broadcast(lags))
    prev = dev.select(F.col("i").alias("pi"), F.col("dx").alias("pdx"))
    num = (
        cur.join(prev, cur.i - cur.lag == prev.pi)
        .groupBy("lag")
        .agg(F.sum(F.col("dx") * F.col("pdx")).alias("nn"), F.first("nd").alias("nd"))
    )
    return num.crossJoin(F.broadcast(den)).select(
        F.col("lag").cast("int").alias("lag"),
        dround(F.col("nn") / F.col("dd"), 6).alias("acf"),
        F.col("nd").cast("long").alias("n_days"),
    )


# ---------------------------------------------------------------------------
# TS5 — CUSUM changepoint scan over the gap-filled daily event-count
# series: the level-shift detector that complements ts3 (seasonality)
# and ts4 (autocorrelation) — a sustained shift in daily volume makes
# the cumulative sum of deviations from the global mean drift
# monotonically, and the |CUSUM| peak marks the most likely change
# day (Page's classic statistic, evaluated offline). Scale shape:
# identical to ts4 — the daily reduction is the only fact-sized
# shuffle; everything after runs on the |days|-row series, with the
# global mean riding the broadcast-scalar pattern and the single
# ordered running sum on a |days|-row single partition (days are
# thousands even at decade horizons — this is deliberately NOT a
# partitioned window).
# ---------------------------------------------------------------------------


@probe(
    "ts5_cusum_changepoint",
    oracle="""
    WITH daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
                          count(*) AS n
                   FROM events GROUP BY 1),
    bounds AS (SELECT min(d) AS lo, max(d) AS hi FROM daily),
    cal AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d
            FROM bounds),
    s AS (SELECT cal.d, CAST(COALESCE(n, 0) AS DOUBLE) AS x
          FROM cal LEFT JOIN daily ON daily.d = cal.d),
    st AS (SELECT avg(x) AS mu FROM s),
    c AS (SELECT d, x, sum(x - (SELECT mu FROM st))
                         OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
                               PRECEDING AND CURRENT ROW) AS cusum
          FROM s),
    mx AS (SELECT max(abs(cusum)) AS m FROM c)
    SELECT strftime(d, '%Y-%m-%d') AS d, CAST(x AS BIGINT) AS n,
           round(cusum, 6) AS cusum,
           abs(cusum) = (SELECT m FROM mx) AS is_changepoint
    FROM c
    """,
)
def ts5_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TS5 — per-day CUSUM of deviations from the global daily mean,
    with the |CUSUM|-argmax day flagged as the changepoint (block
    comment above). Deterministic across engines: daily counts are
    integers (their double sums are exact well below 2^53), the mean
    is an exact-sum average, and both engines accumulate the running
    sum in the same calendar order — the 1e-6 rounding is belt and
    braces, the flag compares identical doubles."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    bounds = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    cal = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("d")
    )
    s = cal.join(daily, "d", "left").select(
        "d", F.coalesce(F.col("n"), F.lit(0)).cast("double").alias("x")
    )
    st = s.agg(F.avg("x").alias("mu"))
    dev = s.crossJoin(F.broadcast(st))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = dev.select(
        "d", "x", F.sum(F.col("x") - F.col("mu")).over(w).alias("cusum")
    )
    mx = c.agg(F.max(F.abs("cusum")).alias("m"))
    return c.crossJoin(F.broadcast(mx)).select(
        F.date_format(F.col("d").cast("date"), "yyyy-MM-dd").alias("d"),
        F.col("x").cast("long").alias("n"),
        dround("cusum", 6).alias("cusum"),
        (F.abs("cusum") == F.col("m")).alias("is_changepoint"),
    )


# ---------------------------------------------------------------------------
# ts6 — per-series linear-trend fit + forecast: the closed-form OLS
# baseline every forecasting stack starts from (and the honest
# complement to ts3's seasonal decomposition: trend here is FIT, not
# extracted by smoothing). One daily rollup per series (the only
# data-sized pass, map-combinable), then the slope/intercept/r²
# normal equations over the metadata-sized (series, day) frame and a
# closed-form 7-day-ahead sum forecast — no iterative optimizer, so
# the whole fit replays bit-for-bit in DuckDB.
# ---------------------------------------------------------------------------


@probe(
    "ts6_trend_forecast",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, sum(value) AS y
      FROM events GROUP BY 1, 2),
    m AS (SELECT event_type, min(day) AS d0 FROM daily GROUP BY 1),
    xy AS (SELECT daily.event_type,
                  CAST(date_diff('day', d0, day) AS DOUBLE) AS x, y
           FROM daily JOIN m USING (event_type)),
    reg AS (SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                   sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy,
                   max(x) AS mx
            FROM xy GROUP BY 1),
    fit AS (SELECT event_type, n, mx,
                   (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
                   (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
                     AS intercept,
                   (n * sxy - sx * sy) * (n * sxy - sx * sy)
                     / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
            FROM reg)
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           round(slope, 4) AS slope,
           round(intercept, 4) AS intercept,
           round(r2, 4) AS r2,
           round(7 * intercept + slope * (7 * mx + 28), 2) AS forecast_next7
    FROM fit
    """,
)
def ts6_trend_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ts6 — OLS trend per event_type over daily revenue (block comment
    above): x = days since the series' first day, y = daily sum; slope
    and intercept from the normal equations, r² as the squared
    correlation, and forecast_next7 = Σ_{j=mx+1..mx+7}(intercept +
    slope·j) in closed form (7·intercept + slope·(7·mx + 28))."""
    from realtime_financial_transactions_data_pipeline_spark.functions.compat import dround

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.sum("value").alias("y"))
    )
    m = daily.groupBy("event_type").agg(F.min("day").alias("d0"))
    xy = daily.join(m, "event_type").select(
        "event_type",
        F.datediff(F.col("day"), F.col("d0")).cast("double").alias("x"),
        "y",
    )
    reg = xy.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.max("x").alias("mx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = num / den
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    r2 = (num * num) / (
        den * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return reg.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        dround(slope, 4).alias("slope"),
        dround(intercept, 4).alias("intercept"),
        dround(r2, 4).alias("r2"),
        dround(
            F.lit(7.0) * intercept + slope * (7.0 * F.col("mx") + 28.0), 2
        ).alias("forecast_next7"),
    )


# ---------------------------------------------------------------------------
# a21 — daily percentile-band panel (the p50/p95 latency-style
# dashboard): per (series, day) exact interpolated percentiles, plus a
# per-series spike flag — a day is flagged when its p95 exceeds 1.5x
# the series' median daily p95 (the robust threshold ops dashboards
# use, insensitive to the spike days themselves). Exact percentiles
# per day group (tens of values each — sort-within-group, never a
# global sort); the second-level median runs over the metadata-sized
# daily frame.
# ---------------------------------------------------------------------------


@probe(
    "a21_daily_percentile_bands",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(strftime(ts, '%Y-%m-%d') AS VARCHAR) AS day,
             CAST(count(*) AS BIGINT) AS n,
             round(quantile_cont(value, 0.5), 4) AS p50,
             round(quantile_cont(value, 0.95), 4) AS p95
      FROM events GROUP BY 1, 2),
    m AS (SELECT event_type,
                 round(quantile_cont(p95, 0.5), 4) AS med95
          FROM daily GROUP BY 1)
    SELECT daily.event_type, day, n, p50, p95,
           round(med95, 4) AS series_median_p95,
           p95 > 1.5 * med95 AS p95_spike
    FROM daily JOIN m USING (event_type)
    """,
)
def a21_daily_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a21 — per-(series, day) p50/p95 bands with a robust spike flag
    (block comment above). Uses the engine's proven exact-percentile
    pairing (Spark `percentile` == DuckDB `quantile_cont`, x5b);
    flag arithmetic runs on the ROUNDED percentiles so both engines
    compare identical doubles."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            dround(F.percentile("value", 0.5), 4).alias("p50"),
            dround(F.percentile("value", 0.95), 4).alias("p95"),
        )
    )
    m = daily.groupBy("event_type").agg(
        dround(F.percentile("p95", 0.5), 4).alias("med95")
    )
    return daily.join(F.broadcast(m), "event_type").select(
        "event_type",
        "day",
        "n",
        "p50",
        "p95",
        dround(F.col("med95"), 4).alias("series_median_p95"),
        (F.col("p95") > 1.5 * F.col("med95")).alias("p95_spike"),
    )


# ---------------------------------------------------------------------------
# a24 — RFM segmentation: the classic financial-customer panel
# (recency / frequency / monetary quartile scores → segment code) the
# reference's Power BI layer would build from the star schema. The
# quartiles are EXACT ntile(4) semantics (rank-split with unique
# tiebreak, not value boundaries — ties at a quartile edge land in
# different tiles by c_custkey order, which percentile boundaries
# cannot express), but computed WITHOUT `ntile() OVER (ORDER BY …)`'s
# SinglePartition collapse: each score rides the two-phase
# range-partitioned rank (scale.two_phase_rank — per-partition
# row_number + driver prefix-summed offsets), and ntile is then a pure
# closed-form function of (rank, N): with q, r = divmod(N, 4), tiles
# 1..r hold q+1 rows and tiles r+1..4 hold q. At 100 TB the
# customer-grain rollup is hundreds of millions of rows; the r15 form
# funneled them through ONE task three times — this form never builds
# a partition larger than N/32.
# ---------------------------------------------------------------------------


def _ntile4_from_rank(rank, n: int):
    """Closed-form ntile(4) from a unique 1..n rank (block comment
    above); matches SQL NTILE exactly, including the n<4 degenerate
    case where row i lands alone in tile i."""
    q, r = divmod(n, 4)
    if q == 0:
        return rank.cast("int")
    t = r * (q + 1)  # rows covered by the q+1-sized leading tiles
    return (
        F.when(rank <= t, F.floor((rank - 1) / (q + 1)))
        .otherwise(r + F.floor((rank - t - 1) / q))
        + 1
    ).cast("int")


@probe(
    "a24_rfm_segmentation",
    oracle="""
    WITH base AS (
      SELECT o_custkey AS c_custkey,
             date_diff('day', max(CAST(o_orderdate AS DATE)),
                       (SELECT max(CAST(o_orderdate AS DATE)) FROM orders))
               AS recency_days,
             count(*) AS frequency,
             round(sum(o_totalprice), 2) AS monetary
      FROM orders GROUP BY 1),
    scored AS (
      SELECT *,
             ntile(4) OVER (ORDER BY recency_days DESC, c_custkey) AS r_score,
             ntile(4) OVER (ORDER BY frequency, c_custkey) AS f_score,
             ntile(4) OVER (ORDER BY monetary, c_custkey) AS m_score
      FROM base)
    SELECT c_custkey,
           CAST(recency_days AS BIGINT) AS recency_days,
           CAST(frequency AS BIGINT) AS frequency,
           monetary,
           r_score, f_score, m_score,
           CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
             || CAST(m_score AS VARCHAR) AS rfm_code,
           CASE WHEN r_score = 4 AND f_score = 4 AND m_score = 4
                  THEN 'champion'
                WHEN r_score >= 3 AND f_score >= 3 THEN 'loyal'
                WHEN r_score <= 1 AND f_score >= 3 THEN 'at_risk'
                WHEN r_score <= 1 AND f_score <= 1 THEN 'lost'
                ELSE 'regular' END AS segment
    FROM scored
    """,
)
def a24_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a24 — per-customer RFM panel: recency (days since last order,
    against the corpus max date so the panel is reproducible),
    frequency (order count), monetary (total spend), each quartiled
    with exact ntile(4) semantics and the unique-custkey tiebreak that
    keeps assignment deterministic across engines (the o6 discipline;
    recency sorts DESC so 'bought most recently' earns score 4 like
    the other two), plus the concatenated RFM code and the standard
    segment ladder. The oracle stays the naive three-window ntile SQL;
    the implementation computes each rank via the two-phase
    range-partitioned pattern and maps rank→tile in closed form, so
    the hash certifies all three orderings, the quartile boundaries,
    and the CASE ladder — and the plan carries no SinglePartition
    window (pinned in tests/test_plans.py)."""
    o = load_table(spark, sf_dir, "orders")
    base = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.max(F.to_date("o_orderdate")).alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        dround(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    maxd = o.agg(F.max(F.to_date("o_orderdate")).alias("maxd"))
    base = base.crossJoin(F.broadcast(maxd)).select(
        "c_custkey",
        F.datediff("maxd", "last_order").cast("long").alias("recency_days"),
        "frequency",
        "monetary",
    )
    from realtime_financial_transactions_data_pipeline_spark.operators.scale import two_phase_rank

    # One range-partitioned rank per ordering; the base rollup is
    # checkpointed by the first pass, so the other two re-rank the
    # pinned relation instead of recomputing the orders scan.
    ranked, n = two_phase_rank(
        base, [F.col("recency_days").desc(), F.col("c_custkey")], "_ri"
    )
    ranked, _ = two_phase_rank(ranked, ["frequency", "c_custkey"], "_fi")
    ranked, _ = two_phase_rank(ranked, ["monetary", "c_custkey"], "_mi")
    scored = ranked.select(
        "c_custkey",
        "recency_days",
        "frequency",
        "monetary",
        _ntile4_from_rank(F.col("_ri"), n).alias("r_score"),
        _ntile4_from_rank(F.col("_fi"), n).alias("f_score"),
        _ntile4_from_rank(F.col("_mi"), n).alias("m_score"),
    )
    seg = (
        F.when(
            (F.col("r_score") == 4) & (F.col("f_score") == 4)
            & (F.col("m_score") == 4),
            F.lit("champion"),
        )
        .when((F.col("r_score") >= 3) & (F.col("f_score") >= 3), F.lit("loyal"))
        .when((F.col("r_score") <= 1) & (F.col("f_score") >= 3), F.lit("at_risk"))
        .when((F.col("r_score") <= 1) & (F.col("f_score") <= 1), F.lit("lost"))
        .otherwise(F.lit("regular"))
    )
    return scored.select(
        "c_custkey",
        "recency_days",
        "frequency",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ).alias("rfm_code"),
        seg.alias("segment"),
    )


# ---------------------------------------------------------------------------
# ts7 — Holt double-exponential smoothing (level + trend), the
# recursive forecaster ts6's closed-form OLS line cannot express: each
# step's state depends on the previous step's, so the computation is a
# SEQUENTIAL fold. The Spark-native shape for that at scale: collect
# each series into an ordered array (per-key, bounded — a daily series
# is metadata-sized) and run the recursion as a JVM `aggregate` lambda
# fold — shuffle-free per series after the daily rollup, no Python,
# no window tricks pretending recursion is associative. DuckDB replays
# the identical fold via list_reduce with a [level, trend]-encoded
# accumulator, so the hash certifies every step of the recursion.
# Inputs are EXACT integer mills (the scale_dynamic_pruning pairing),
# making the double fold bit-identical across engines.
# ---------------------------------------------------------------------------

_TS7_ALPHA = 0.5
_TS7_BETA = 0.3
_TS7_H = 7  # forecast horizon, days


def _ts7_oracle() -> str:
    a, b, h = _TS7_ALPHA, _TS7_BETA, _TS7_H
    return f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             sum(CAST(round(value * 1000) AS BIGINT)) AS y
      FROM events GROUP BY 1, 2),
    series AS (
      SELECT event_type,
             list(CAST(y AS DOUBLE) ORDER BY day) AS ys
      FROM daily GROUP BY event_type),
    fitted AS (
      SELECT event_type, len(ys) AS n_days,
             list_reduce(
               list_concat([[ys[1], ys[2] - ys[1]]],
                           list_transform(ys[3:], y -> [y, 0.0])),
               (acc, e) -> [
                 {a} * e[1] + {1 - a} * (acc[1] + acc[2]),
                 {b} * (({a} * e[1] + {1 - a} * (acc[1] + acc[2])) - acc[1])
                   + {1 - b} * acc[2]
               ]
             ) AS st
      FROM series)
    SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
           round(st[1], 4) AS level_mills,
           round(st[2], 4) AS trend_mills,
           round(st[1] + {h} * st[2], 4) AS forecast_{h}d_mills
    FROM fitted
    """


@probe("ts7_holt_forecast", oracle=_ts7_oracle())
def ts7_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ts7 — Holt's linear method per event type over the daily
    value-mills series: l_t = αy_t + (1−α)(l+b), b_t = β(l_t−l) +
    (1−β)b, initialized l₀=y₀, b₀=y₁−y₀, folded from the third point
    on; forecast = l + {_TS7_H}·b. One daily-rollup shuffle, one
    per-key collect_list (array_sort by day pins the fold order), then
    the whole recursion is a single codegen'd `aggregate` expression.
    α/β literals bind to the same nearest-double in both engines, and
    the exact-mills inputs make every fold step IEEE-identical — an
    inherently sequential model under a bit-exact cross-engine
    hash."""
    a, b, h = _TS7_ALPHA, _TS7_BETA, _TS7_H
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.col("ts").cast("date").alias("day")
        )
        .agg(
            F.sum(F.round(F.col("value") * 1000, 0).cast("long")).alias("y")
        )
    )
    series = daily.groupBy("event_type").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(day, y))),"
            " p -> CAST(p.y AS DOUBLE))"
        ).alias("ys")
    )
    fold = (
        f"aggregate("
        f"  slice(ys, 3, greatest(size(ys) - 2, 0)),"
        f"  named_struct('l', element_at(ys, 1),"
        f"               'b', element_at(ys, 2) - element_at(ys, 1)),"
        f"  (acc, y) -> named_struct("
        f"    'l', {a}D * y + {1 - a}D * (acc.l + acc.b),"
        f"    'b', {b}D * (({a}D * y + {1 - a}D * (acc.l + acc.b)) - acc.l)"
        f"         + {1 - b}D * acc.b))"
    )
    return series.select(
        "event_type",
        F.size("ys").cast("long").alias("n_days"),
        F.expr(fold).alias("st"),
    ).select(
        "event_type",
        "n_days",
        dround(F.col("st.l"), 4).alias("level_mills"),
        dround(F.col("st.b"), 4).alias("trend_mills"),
        dround(F.col("st.l") + h * F.col("st.b"), 4).alias(
            f"forecast_{h}d_mills"
        ),
    )


# ---------------------------------------------------------------------------
# ts8 — Holt-Winters additive triple-exponential smoothing (level +
# trend + weekly seasonality), completing the ts6 (closed-form OLS) →
# ts7 (double-exponential fold) ladder with the model production
# demand forecasts actually use. Same Spark-native shape as ts7: the
# recursion is inherently sequential, so each bounded daily series
# collects into an ordered array and the whole fit runs as ONE
# codegen'd `aggregate` fold — the accumulator carries (level, trend,
# 7-slot seasonal ring) and each step consumes the ring head and
# appends the refreshed seasonal. DuckDB replays the identical fold
# via list_reduce over a flat 9-double accumulator. Smoothing
# constants are written as plain decimal literals ("0.4", "0.6" — not
# Python-computed 1-α, which would print 0.6000000000000001) so both
# engines bind the identical doubles, and the exact-mills inputs make
# every step IEEE-identical: a 9-state recursive model under a
# bit-exact cross-engine hash.
# ---------------------------------------------------------------------------

_TS8_M = 7  # season length (weekly), also the forecast horizon
#: (alpha, one_minus_alpha, beta, one_minus_beta, gamma, one_minus_gamma)
#: as DECIMAL-EXACT literal strings — both engines parse each to the
#: same nearest double; never compute the complements in Python.
_TS8_CONST = ("0.4", "0.6", "0.2", "0.8", "0.3", "0.7")


def _ts8_oracle() -> str:
    a, na, b, nb, g, ng, m = *_TS8_CONST, _TS8_M
    l0 = "((ys[1]+ys[2]+ys[3]+ys[4]+ys[5]+ys[6]+ys[7])/7.0)"
    w2 = "((ys[8]+ys[9]+ys[10]+ys[11]+ys[12]+ys[13]+ys[14])/7.0)"
    lnew = f"({a}*(e[1] - acc[3]) + {na}*(acc[1] + acc[2]))"
    return f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             sum(CAST(round(value * 1000) AS BIGINT)) AS y
      FROM events GROUP BY 1, 2),
    series AS (
      SELECT event_type,
             list(CAST(y AS DOUBLE) ORDER BY day) AS ys
      FROM daily GROUP BY event_type HAVING count(*) >= 2 * {m}),
    init AS (
      SELECT event_type, ys, len(ys) AS n_days,
             list_concat(
               list_concat([{l0}, (({w2} - {l0})/7.0)],
                           list_transform(ys[1:7], y -> y - {l0})),
               []) AS acc0
      FROM series),
    fitted AS (
      SELECT event_type, n_days,
             list_reduce(
               list_concat([acc0], list_transform(ys[8:], y -> [y])),
               (acc, e) -> list_concat(
                 list_concat(
                   [{lnew},
                    {b}*({lnew} - acc[1]) + {nb}*acc[2]],
                   acc[4:9]),
                 [{g}*(e[1] - {lnew}) + {ng}*acc[3]])
             ) AS st
      FROM init)
    SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
           round(st[1], 4) AS level_mills,
           round(st[2], 4) AS trend_mills,
           round(st[9], 4) AS season_mills,
           round(st[1] + {m} * st[2] + st[9], 4) AS forecast_{m}d_mills
    FROM fitted
    """


@probe("ts8_holt_winters_forecast", oracle=_ts8_oracle())
def ts8_holt_winters_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ts8 — additive Holt-Winters per event type over the daily
    value-mills series (block comment above): l₀ = mean of week 1,
    b₀ = (mean of week 2 − mean of week 1)/7, s₁..₇ = week-1
    deviations; then from day 8 on,
    lₜ = α(yₜ−sₜ₋₇) + (1−α)(l+b), bₜ = β(lₜ−l) + (1−β)b,
    sₜ = γ(yₜ−lₜ) + (1−γ)sₜ₋₇, folded in one `aggregate` expression
    whose accumulator rotates the 7-slot seasonal ring. Forecast at
    horizon m=7 reuses the freshest seasonal (t+7−7 = t). The oracle
    replays all three recurrences step-for-step, so the hash certifies
    the full 9-dimensional state trajectory."""
    a, na, b, nb, g, ng, m = *_TS8_CONST, _TS8_M
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 1000, 0).cast("long")).alias("y"))
    )
    series = daily.groupBy("event_type").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(day, y))),"
            " p -> CAST(p.y AS DOUBLE))"
        ).alias("ys")
    ).filter(F.size("ys") >= 2 * m)
    el = "element_at(ys, {})".format
    l0 = f"(({'+'.join(el(i) for i in range(1, 8))})/7.0)"
    w2 = f"(({'+'.join(el(i) for i in range(8, 15))})/7.0)"
    lnew = f"({a}D*(y - element_at(acc.s, 1)) + {na}D*(acc.l + acc.b))"
    fold = (
        f"aggregate("
        f"  slice(ys, 8, size(ys) - 7),"
        f"  named_struct("
        f"    'l', {l0},"
        f"    'b', ({w2} - {l0})/7.0,"
        f"    's', transform(slice(ys, 1, 7), y -> y - {l0})),"
        f"  (acc, y) -> named_struct("
        f"    'l', {lnew},"
        f"    'b', {b}D*({lnew} - acc.l) + {nb}D*acc.b,"
        f"    's', concat(slice(acc.s, 2, 6),"
        f"                array({g}D*(y - {lnew}) + {ng}D*element_at(acc.s, 1)))))"
    )
    return series.select(
        "event_type",
        F.size("ys").cast("long").alias("n_days"),
        F.expr(fold).alias("st"),
    ).select(
        "event_type",
        "n_days",
        dround(F.col("st.l"), 4).alias("level_mills"),
        dround(F.col("st.b"), 4).alias("trend_mills"),
        dround(F.expr("element_at(st.s, 7)"), 4).alias("season_mills"),
        dround(
            F.col("st.l") + m * F.col("st.b") + F.expr("element_at(st.s, 7)"),
            4,
        ).alias(f"forecast_{m}d_mills"),
    )


# ---------------------------------------------------------------------------
# ts9 — forecast accuracy backtest (MASE panel): the evaluation half
# of the ts6/ts7/ts8 forecasting ladder — fit on a truncated series,
# score on a 7-day holdout, report MAE and MASE (Hyndman's
# scale-free accuracy metric: model MAE over the in-sample one-step
# seasonal-naive MAE). Determinism inventory: every seasonal-naive
# error is a difference of integer-valued mills (exact in doubles, so
# their sums are order-independent); only the Holt forecast errors are
# inexact, and THEIR sum runs as an ordered left fold over the 7-slot
# error array, identical in both engines. Same scale shape as ts7:
# one daily rollup + per-series bounded-array folds, shuffle-free
# after the rollup.
# ---------------------------------------------------------------------------

_TS9_H = 7  # holdout length (days) = seasonal period


def _ts9_oracle() -> str:
    a, b, m = _TS7_ALPHA, _TS7_BETA, _TS9_H
    lnew = f"({a} * e[1] + {1 - a} * (acc[1] + acc[2]))"
    return f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             sum(CAST(round(value * 1000) AS BIGINT)) AS y
      FROM events GROUP BY 1, 2),
    series AS (
      SELECT event_type,
             list(CAST(y AS DOUBLE) ORDER BY day) AS ys,
             len(list(y)) AS n
      FROM daily GROUP BY event_type HAVING count(*) >= 3 * {m}),
    fitted AS (
      SELECT event_type, ys, n,
             list_reduce(
               list_concat([[ys[1], ys[2] - ys[1]]],
                           list_transform(ys[3:n-{m}], y -> [y, 0.0])),
               (acc, e) -> [
                 {lnew},
                 {b} * ({lnew} - acc[1]) + {1 - b} * acc[2]
               ]
             ) AS st
      FROM series),
    errs AS (
      SELECT event_type, n, st,
             list_transform(range(1, {m} + 1),
               h -> abs(ys[n - {m} + h] - (st[1] + h * st[2]))) AS e_holt,
             list_transform(range(1, {m} + 1),
               h -> abs(ys[n - {m} + h] - ys[n - 2 * {m} + h])) AS e_naive,
             list_transform(range({m} + 1, n - {m} + 1),
               t -> abs(ys[t] - ys[t - {m}])) AS e_insample
      FROM fitted),
    mae AS (
      SELECT event_type,
             CAST(n - {m} AS BIGINT) AS n_train,
             CAST({m} AS BIGINT) AS n_test,
             list_reduce(e_insample, (x, y) -> x + y)
               / CAST(len(e_insample) AS DOUBLE) AS d,
             list_reduce(e_naive, (x, y) -> x + y) / {m}.0 AS naive_mae,
             list_reduce(e_holt, (x, y) -> x + y) / {m}.0 AS holt_mae
      FROM errs)
    SELECT event_type, n_train, n_test,
           round(d, 4) AS insample_naive_mae_mills,
           round(naive_mae, 4) AS naive_mae_mills,
           round(holt_mae, 4) AS holt_mae_mills,
           round(naive_mae / d, 4) AS naive_mase,
           round(holt_mae / d, 4) AS holt_mase,
           holt_mae < naive_mae AS holt_beats_naive
    FROM mae
    """


@probe("ts9_forecast_backtest", oracle=_ts9_oracle())
def ts9_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ts9 — 7-day-holdout backtest per event type (block comment
    above): Holt (ts7's fold, fit on the truncated series) against the
    seasonal-naive baseline ŷₜ = yₜ₋₇, scored by MAE over the holdout
    and MASE against the in-sample one-step seasonal-naive MAE. The
    oracle replays the truncated fit, all three error arrays, and both
    ordered fold-sums — so the hash certifies fit, forecast, and
    metric arithmetic together."""
    a, b, m = _TS7_ALPHA, _TS7_BETA, _TS9_H
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 1000, 0).cast("long")).alias("y"))
    )
    series = daily.groupBy("event_type").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(day, y))),"
            " p -> CAST(p.y AS DOUBLE))"
        ).alias("ys")
    ).filter(F.size("ys") >= 3 * m)
    lnew = f"({a}D * y + {1 - a}D * (acc.l + acc.b))"
    fold = (
        f"aggregate("
        f"  slice(ys, 3, greatest(size(ys) - 2 - {m}, 0)),"
        f"  named_struct('l', element_at(ys, 1),"
        f"               'b', element_at(ys, 2) - element_at(ys, 1)),"
        f"  (acc, y) -> named_struct("
        f"    'l', {lnew},"
        f"    'b', {b}D * ({lnew} - acc.l) + {1 - b}D * acc.b))"
    )
    errs = series.select(
        "event_type",
        F.size("ys").alias("n"),
        F.expr(fold).alias("st"),
        F.expr(
            f"transform(sequence(1, {m}), h -> "
            f"abs(element_at(ys, size(ys) - {m} + h)"
            f"    - (st.l + h * st.b)))"
        ).alias("e_holt"),
        F.expr(
            f"transform(sequence(1, {m}), h -> "
            f"abs(element_at(ys, size(ys) - {m} + h)"
            f"    - element_at(ys, size(ys) - {2 * m} + h)))"
        ).alias("e_naive"),
        F.expr(
            f"transform(sequence({m} + 1, size(ys) - {m}), t -> "
            f"abs(element_at(ys, t) - element_at(ys, t - {m})))"
        ).alias("e_insample"),
    )
    fsum = "aggregate({0}, 0.0D, (x, y) -> x + y)".format
    mae = errs.select(
        "event_type",
        (F.col("n") - m).cast("long").alias("n_train"),
        F.lit(m).cast("long").alias("n_test"),
        (
            F.expr(fsum("e_insample"))
            / F.size("e_insample").cast("double")
        ).alias("d"),
        (F.expr(fsum("e_naive")) / float(m)).alias("naive_mae"),
        (F.expr(fsum("e_holt")) / float(m)).alias("holt_mae"),
    )
    return mae.select(
        "event_type",
        "n_train",
        "n_test",
        dround(F.col("d"), 4).alias("insample_naive_mae_mills"),
        dround(F.col("naive_mae"), 4).alias("naive_mae_mills"),
        dround(F.col("holt_mae"), 4).alias("holt_mae_mills"),
        dround(F.col("naive_mae") / F.col("d"), 4).alias("naive_mase"),
        dround(F.col("holt_mae") / F.col("d"), 4).alias("holt_mase"),
        (F.col("holt_mae") < F.col("naive_mae")).alias("holt_beats_naive"),
    )


# ---------------------------------------------------------------------------
# a26 — cohort LTV curves: cumulative revenue per customer by cohort
# age (the growth-analytics companion to a13's retention counts — "how
# much has the average Jan-1996 customer spent by month 3?"). Exact
# integer cents throughout; the cumulative window runs over the
# cohort×age rollup (months × cohorts rows, metadata-sized), never the
# fact table. One fact shuffle (per-customer first-month join), one
# rollup, one tiny window.
# ---------------------------------------------------------------------------

_A26_MONTHS = ("1996-01-01", "1996-07-01")  # six cohort months


@probe(
    "a26_cohort_ltv",
    oracle=f"""
    WITH o AS (
      SELECT o_custkey,
             date_trunc('month', CAST(o_orderdate AS DATE)) AS m,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    first_m AS (
      SELECT o_custkey, min(m) AS cohort FROM o GROUP BY 1),
    j AS (
      SELECT f.cohort, o.m, o.cents, o.o_custkey
      FROM o JOIN first_m f USING (o_custkey)
      WHERE f.cohort >= DATE '{_A26_MONTHS[0]}'
        AND f.cohort < DATE '{_A26_MONTHS[1]}'),
    sized AS (
      SELECT cohort, count(DISTINCT o_custkey) AS n_customers
      FROM j GROUP BY 1),
    per_age AS (
      SELECT cohort,
             (EXTRACT(year FROM m) - EXTRACT(year FROM cohort)) * 12
               + (EXTRACT(month FROM m) - EXTRACT(month FROM cohort))
               AS age_months,
             sum(cents) AS rev_cents
      FROM j GROUP BY 1, 2),
    cum AS (
      SELECT cohort, age_months,
             sum(rev_cents) OVER (PARTITION BY cohort ORDER BY age_months)
               AS cum_cents
      FROM per_age)
    SELECT strftime(cohort, '%Y-%m') AS cohort,
           CAST(age_months AS BIGINT) AS age_months,
           CAST(cum_cents AS BIGINT) AS cum_revenue_cents,
           CAST(n_customers AS BIGINT) AS n_customers,
           round(cum_cents / CAST(n_customers AS DOUBLE) / 100.0, 4)
             AS ltv_per_customer
    FROM cum JOIN sized USING (cohort)
    WHERE age_months <= 11
    """,
)
def a26_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a26 — per-cohort cumulative-revenue (LTV) curves for six cohort
    months, ages 0–11 (block comment above): exact-cents cumulative
    sums per cohort age, cohort size, and the per-customer LTV ratio —
    the oracle replays the first-month assignment, the age arithmetic,
    and the cumulative window."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.trunc(F.to_date("o_orderdate"), "month").alias("m"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    first_m = o.groupBy("o_custkey").agg(F.min("m").alias("cohort"))
    j = o.join(first_m, "o_custkey").filter(
        (F.col("cohort") >= F.lit(_A26_MONTHS[0]))
        & (F.col("cohort") < F.lit(_A26_MONTHS[1]))
    )
    sized = j.groupBy("cohort").agg(
        F.countDistinct("o_custkey").alias("n_customers")
    )
    age = (
        (F.year("m") - F.year("cohort")) * 12
        + (F.month("m") - F.month("cohort"))
    ).alias("age_months")
    per_age = j.groupBy("cohort", age).agg(F.sum("cents").alias("rev_cents"))
    w = Window.partitionBy("cohort").orderBy("age_months")
    cum = per_age.withColumn("cum_cents", F.sum("rev_cents").over(w))
    return (
        cum.join(F.broadcast(sized), "cohort")
        .filter(F.col("age_months") <= 11)
        .select(
            F.date_format("cohort", "yyyy-MM").alias("cohort"),
            F.col("age_months").cast("long").alias("age_months"),
            F.col("cum_cents").alias("cum_revenue_cents"),
            "n_customers",
            dround(
                F.col("cum_cents") / F.col("n_customers").cast("double") / 100.0,
                4,
            ).alias("ltv_per_customer"),
        )
    )


# ---------------------------------------------------------------------------
# a27 — growth accounting (the new/retained/resurrected/churned state
# machine over monthly actives): the canonical "where did this month's
# customers come from" panel. Per (customer, active-month), the lag of
# the previous active month classifies NEW (no prior activity),
# RETAINED (active last month), RESURRECTED (gap ≥ 2 months); CHURNED
# for month M = customers active in M−1 but not M (a self-join of the
# distinct actives against the next month, counted per month). All
# classification happens on the per-customer distinct-month relation
# (customers × active-months, far below fact size); exact counts only.
# ---------------------------------------------------------------------------


@probe(
    "a27_growth_accounting",
    oracle="""
    WITH am AS (
      SELECT DISTINCT o_custkey,
             date_trunc('month', CAST(o_orderdate AS DATE)) AS m
      FROM orders),
    lagged AS (
      SELECT o_custkey, m,
             lag(m) OVER (PARTITION BY o_custkey ORDER BY m) AS prev_m
      FROM am),
    classed AS (
      SELECT m,
             CASE WHEN prev_m IS NULL THEN 'new'
                  WHEN prev_m = m - INTERVAL 1 MONTH THEN 'retained'
                  ELSE 'resurrected' END AS cls
      FROM lagged),
    inflow AS (
      SELECT m, 
             CAST(count(*) FILTER (WHERE cls = 'new') AS BIGINT) AS n_new,
             CAST(count(*) FILTER (WHERE cls = 'retained') AS BIGINT)
               AS n_retained,
             CAST(count(*) FILTER (WHERE cls = 'resurrected') AS BIGINT)
               AS n_resurrected
      FROM classed GROUP BY m),
    churn AS (
      SELECT a.m + INTERVAL 1 MONTH AS m,
             CAST(count(*) AS BIGINT) AS n_churned
      FROM am a LEFT JOIN am b
        ON a.o_custkey = b.o_custkey AND b.m = a.m + INTERVAL 1 MONTH
      WHERE b.o_custkey IS NULL
      GROUP BY 1)
    SELECT strftime(CAST(i.m AS DATE), '%Y-%m') AS month,
           i.n_new, i.n_retained, i.n_resurrected,
           CAST(coalesce(c.n_churned, 0) AS BIGINT) AS n_churned
    FROM inflow i LEFT JOIN churn c ON c.m = i.m
    """,
)
def a27_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a27 — monthly growth accounting over order activity (block
    comment above): inflow classes from one lag window, churn from one
    next-month anti-join, both over the distinct (customer, month)
    relation. Months with inflow but no prior month report zero
    churn (coalesce), matching the oracle's left join."""
    am = (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.trunc(F.to_date("o_orderdate"), "month").alias("m"),
        )
        .distinct()
    )
    w = Window.partitionBy("o_custkey").orderBy("m")
    lagged = am.withColumn("prev_m", F.lag("m").over(w))
    cls = (
        F.when(F.col("prev_m").isNull(), "new")
        .when(F.col("prev_m") == F.add_months(F.col("m"), -1), "retained")
        .otherwise("resurrected")
    )
    inflow = (
        lagged.withColumn("cls", cls)
        .groupBy("m")
        .agg(
            F.count(F.when(F.col("cls") == "new", 1)).alias("n_new"),
            F.count(F.when(F.col("cls") == "retained", 1)).alias(
                "n_retained"
            ),
            F.count(F.when(F.col("cls") == "resurrected", 1)).alias(
                "n_resurrected"
            ),
        )
    )
    nxt = am.select(
        F.col("o_custkey").alias("b_cust"),
        F.col("m").alias("b_m"),
    )
    churn = (
        am.join(
            nxt,
            (F.col("o_custkey") == F.col("b_cust"))
            & (F.col("b_m") == F.add_months(F.col("m"), 1)),
            "left",
        )
        .filter(F.col("b_cust").isNull())
        .groupBy(F.add_months(F.col("m"), 1).alias("m"))
        .agg(F.count(F.lit(1)).alias("n_churned"))
    )
    return (
        inflow.join(churn, "m", "left")
        .select(
            F.date_format("m", "yyyy-MM").alias("month"),
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce("n_churned", F.lit(0)).cast("long").alias("n_churned"),
        )
    )


# ---------------------------------------------------------------------------
# A29 — batch sessionization (the batch twin of the streaming t4b/t9
# session windows): split each user's event stream on inactivity gaps
# > 30 minutes and profile the resulting sessions. Same island
# arithmetic as o11 — a lag() gap flag cumulative-summed into session
# ids — so the whole operator is one user-keyed window pass plus two
# map-side-combined aggregations; at 100 TB it shuffles once on
# user_id and the session/user rollups aggregate partials locally.
# Batch is where sessionization REPROCESSES (backfills, definition
# changes — streaming state can't replay history); the two paths
# sharing one gap rule is the t12 unification story at session grain.
# ---------------------------------------------------------------------------

_A29_GAP_S = 30 * 60


@probe(
    "a29_batch_sessionization",
    oracle=f"""
    WITH e AS (
      -- epoch_ms // 1000 truncates like Spark's cast-to-long; plain
      -- epoch() rounds fractional seconds and drifts spans by 1 s.
      SELECT user_id, event_id, epoch_ms(ts) // 1000 AS s,
             lag(epoch_ms(ts) // 1000) OVER (PARTITION BY user_id
                                             ORDER BY epoch_ms(ts) // 1000,
                                                      event_id) AS prev_s
      FROM events),
    flagged AS (
      SELECT user_id, event_id, s,
             CASE WHEN prev_s IS NULL OR s - prev_s > {_A29_GAP_S}
                  THEN 1 ELSE 0 END AS is_new
      FROM e),
    sess AS (
      -- every window orders by (s, event_id): a tiebreak-free ORDER
      -- BY s would let same-second peers land on either side of a
      -- session boundary nondeterministically.
      SELECT user_id, s,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY s, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS sid
      FROM flagged),
    per_session AS (
      SELECT user_id, sid, count(*) AS n_events,
             max(s) - min(s) AS span_s
      FROM sess GROUP BY user_id, sid)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           CAST(max(n_events) AS BIGINT) AS max_session_events,
           CAST(max(span_s) AS BIGINT) AS max_session_span_s,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounce_sessions
    FROM per_session GROUP BY user_id
    """,
)
def a29_batch_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A29 — per-user session profile under a 30-minute inactivity
    gap rule (block comment above): session count, event totals, the
    largest session by events and by wall-clock span, and the bounce
    (single-event-session) count. Ties in event time order by
    event_id, matching the oracle; the session-id cumulative sum runs
    over epoch seconds so the gap rule is integer-exact."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("long").alias("s"), "event_id"
    )
    # Order matches the oracle's (ts, event_id) on the projected
    # epoch-seconds column.
    w_ord = Window.partitionBy("user_id").orderBy("s", "event_id")
    flagged = e.withColumn("prev_s", F.lag("s").over(w_ord)).withColumn(
        "is_new",
        F.when(
            F.col("prev_s").isNull() | (F.col("s") - F.col("prev_s") > _A29_GAP_S),
            1,
        ).otherwise(0),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sess = flagged.withColumn("sid", F.sum("is_new").over(w_run))
    per_session = sess.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("s") - F.min("s")).alias("span_s"),
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.max("n_events").alias("max_session_events"),
        F.max("span_s").alias("max_session_span_s"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0)).alias(
            "n_bounce_sessions"
        ),
    )


# ---------------------------------------------------------------------------
# T15 — the BUILT-IN session_window in batch mode (a29's manual-island
# twin): Spark's streaming session operator groups batch rows too, and
# running both against one corpus pins their boundary semantics
# against each other. The rules differ at exactly gap: session_window
# opens a NEW session when next - prev >= gap (the window closes at
# last_ts + gap, exclusive), while a29's lag rule keeps next - prev ==
# gap in-session. The oracle replays session_window's >= rule; the
# unit test certifies the two probes agree everywhere except ==gap
# adjacencies. Events truncate to whole seconds first — session_window
# compares raw microseconds, the epoch-seconds oracle can't see them.
# ---------------------------------------------------------------------------


@probe(
    "t15_session_window_builtin",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id, epoch_ms(ts) // 1000 AS s,
             lag(epoch_ms(ts) // 1000) OVER (PARTITION BY user_id
                                             ORDER BY epoch_ms(ts) // 1000,
                                                      event_id) AS prev_s
      FROM events),
    flagged AS (
      SELECT user_id, event_id, s,
             CASE WHEN prev_s IS NULL OR s - prev_s >= {_A29_GAP_S}
                  THEN 1 ELSE 0 END AS is_new
      FROM e),
    sess AS (
      SELECT user_id, s,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY s, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS sid
      FROM flagged),
    per_session AS (
      SELECT user_id, sid, count(*) AS n_events,
             max(s) - min(s) + {_A29_GAP_S} AS span_s
      FROM sess GROUP BY user_id, sid)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           CAST(max(span_s) AS BIGINT) AS max_window_span_s
    FROM per_session GROUP BY user_id
    """,
)
def t15_session_window_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T15 — per-user session panel via the BUILT-IN
    ``session_window`` aggregating a BATCH frame (block comment
    above): session count, event total, and the widest session window
    (window end = last event + gap, so span = last - first + gap).
    Events truncate to whole epoch seconds before windowing so the
    engine's microsecond comparisons and the oracle's integer ones
    see identical gaps."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").cast("long").cast("timestamp").alias("tss"),
    )
    per_session = e.groupBy(
        "user_id", F.session_window("tss", f"{_A29_GAP_S} seconds")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return (
        per_session.select(
            "user_id",
            "n_events",
            (
                F.col("session_window.end").cast("long")
                - F.col("session_window.start").cast("long")
            ).alias("span_s"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.max("span_s").alias("max_window_span_s"),
        )
    )


# ---------------------------------------------------------------------------
# ts10 — maximum drawdown (the risk panel every treasury/trading
# dashboard carries): per event_type, treat the cumulative daily value
# series as an equity curve and report the deepest peak-to-trough fall,
# when it bottomed, and the curve's final level. All state is EXACT
# INTEGER MILLS (the scale_dynamic_pruning pairing: round(value·1000)
# per event, bigint sums), so cum, running peak, drawdown, and the
# argmax are integer arithmetic — nothing floating touches the hash
# except the final depth ratio (dround 6). Scale shape: one daily
# rollup shuffle, then ALL windows partition by event_type (running sum
# and running max over the per-type daily series — days per type, never
# corpus-sized), and the worst-day argmax is the window-free
# max(struct) idiom; no SinglePartition anywhere (the global-window
# tripwire covers this probe like every other).
# ---------------------------------------------------------------------------


@probe(
    "ts10_max_drawdown",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             sum(CAST(round(value * 1000) AS BIGINT)) AS mills
      FROM events GROUP BY 1, 2),
    curve AS (
      SELECT event_type, day,
             sum(mills) OVER w AS cum,
             max(sum(mills)) OVER (PARTITION BY event_type
                                   ORDER BY day ROWS BETWEEN UNBOUNDED
                                   PRECEDING AND CURRENT ROW) AS peak
      FROM daily
      GROUP BY event_type, day, mills
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    dd AS (
      SELECT event_type, day, cum, peak, peak - cum AS draw,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY peak - cum DESC, day) AS rn
      FROM curve)
    SELECT event_type,
           CAST((SELECT max(cum) FROM dd x
                 WHERE x.event_type = dd.event_type
                   AND x.day = (SELECT max(day) FROM dd y
                                WHERE y.event_type = dd.event_type))
             AS BIGINT) AS final_mills,
           CAST(draw AS BIGINT) AS max_drawdown_mills,
           CAST(day AS VARCHAR) AS worst_day,
           round(CASE WHEN peak = 0 THEN 0.0
                      ELSE draw / CAST(peak AS DOUBLE) END, 6) AS max_dd_frac
    FROM dd WHERE rn = 1
    """,
)
def ts10_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ts10 — per-event_type maximum drawdown over the cumulative
    daily mills curve (block comment above): running sum + running
    peak per type, drawdown = peak − cum (exact bigint), worst day =
    argmax(drawdown) with earliest-day tie-break via the window-free
    max(struct(draw, −epoch_day)) idiom, depth ratio vs the peak at
    the trough. The oracle replays the curve, the argmax, and the
    ratio."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 1000, 0).cast("long")).alias("mills")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    curve = daily.select(
        "event_type",
        "day",
        F.sum("mills").over(w).alias("cum"),
    ).withColumn("peak", F.max("cum").over(w))
    dd = curve.select(
        "event_type",
        "cum",
        "peak",
        (F.col("peak") - F.col("cum")).alias("draw"),
        F.datediff("day", F.lit("1970-01-01").cast("date")).alias("di"),
    )
    panel = dd.groupBy("event_type").agg(
        # worst (draw, earliest day): max draw, then max(-di) = min di
        F.max(F.struct(F.col("draw"), (-F.col("di")).alias("nd"), "peak")).alias("m"),
        # final level: the last day's cum = cum at max di
        F.max(F.struct(F.col("di"), F.col("cum"))).alias("last"),
    )
    return panel.select(
        "event_type",
        F.col("last.cum").cast("long").alias("final_mills"),
        F.col("m.draw").cast("long").alias("max_drawdown_mills"),
        F.date_add(F.lit("1970-01-01").cast("date"), (-F.col("m.nd")).cast("int"))
        .cast("string")
        .alias("worst_day"),
        dround(
            F.when(F.col("m.peak") == 0, F.lit(0.0)).otherwise(
                F.col("m.draw") / F.col("m.peak").cast("double")
            ),
            6,
        ).alias("max_dd_frac"),
    )


# ---------------------------------------------------------------------------
# ts11 — MAD robust outliers: the median-absolute-deviation twin of
# a14's percentile-spike panel. a14 flags p95 excursions; MAD flags
# |x − median| > 3·1.4826·MAD — the robust z-score that ignores the
# outliers' own pull on the scale estimate (the textbook reason ops
# dashboards prefer it over stddev when incidents skew the series).
# Exact-arithmetic discipline: the daily series is integer mills, both
# medians are exact-half interpolations over integers (bit-identical
# in Spark's percentile and DuckDB's quantile_cont — the x5b
# precedent), deviations are exact double subtractions, and the flag
# threshold 3·1.4826·MAD is the same literal·double product in both
# engines, so the flag set matches bit-for-bit and the day checksum
# pins exact membership. Scale shape: two grouped aggregates over the
# per-(type, day) rollup plus two broadcast joins back — no windows at
# all, partial-aggregable end to end.
# ---------------------------------------------------------------------------

_TS11_K = 3 * 1.4826  # 3 robust sigmas


@probe(
    "ts11_mad_outliers",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             sum(CAST(round(value * 1000) AS BIGINT)) AS mills
      FROM events GROUP BY 1, 2),
    m AS (SELECT event_type, quantile_cont(mills, 0.5) AS med
          FROM daily GROUP BY 1),
    d AS (SELECT daily.*, med, abs(mills - med) AS dev
          FROM daily JOIN m USING (event_type)),
    md AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad
           FROM d GROUP BY 1),
    f AS (SELECT d.*, mad, dev > {_TS11_K} * mad AS is_out
          FROM d JOIN md USING (event_type))
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           round(max(med), 4) AS med_mills,
           round(max(mad), 4) AS mad_mills,
           CAST(count(*) FILTER (WHERE is_out) AS BIGINT) AS n_outliers,
           CAST(coalesce(sum(date_diff('day', DATE '1970-01-01', day))
                         FILTER (WHERE is_out), 0) AS BIGINT)
             AS outlier_day_checksum
    FROM f GROUP BY 1
    """,
)
def ts11_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ts11 — per-event_type MAD outlier panel over daily mills (block
    comment above): median, MAD, robust-threshold flag count, and an
    epoch-day checksum pinning exactly WHICH days flagged. The oracle
    replays both medians, the threshold product, and the flag set."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 1000, 0).cast("long")).alias("mills")
    )
    m = daily.groupBy("event_type").agg(
        F.percentile("mills", 0.5).alias("med")
    )
    d = daily.join(F.broadcast(m), "event_type").withColumn(
        "dev", F.abs(F.col("mills") - F.col("med"))
    )
    md = d.groupBy("event_type").agg(F.percentile("dev", 0.5).alias("mad"))
    f = d.join(F.broadcast(md), "event_type").withColumn(
        "is_out", F.col("dev") > F.lit(_TS11_K) * F.col("mad")
    )
    return f.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        dround(F.max("med"), 4).alias("med_mills"),
        dround(F.max("mad"), 4).alias("mad_mills"),
        F.count(F.when(F.col("is_out"), F.lit(1))).alias("n_outliers"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("is_out"),
                    F.datediff("day", F.lit("1970-01-01").cast("date")),
                )
            ),
            F.lit(0),
        ).cast("long").alias("outlier_day_checksum"),
    )


# ---------------------------------------------------------------------------
# ts12 — autocorrelation panel (ACF at lags 1 and 7): the diagnostic
# read before fitting any of ts2/ts7/ts8's smoothers — is the daily
# series momentum-driven (high lag-1), weekly-seasonal (high lag-7),
# or noise? Determinism discipline: Pearson over lagged pairs is
# normally a float-sum-order hazard, so EVERY moment accumulates as an
# exact BIGINT (daily units = round(value) sums — small enough that
# Σx² at years of days stays far under int64), and only the final
# correlation ratio is floating — computed from identical integers by
# identical expressions in both engines (IEEE division and sqrt are
# correctly rounded), so the hash holds without tolerance. Lag pairs
# come from a calendar-exact self-equi-join (day = day + k), not a
# row-lag window, so gaps in the series never misalign the pairs; the
# join keys on (event_type, day) — partitioned, bounded, no windows.
# ---------------------------------------------------------------------------

_TS12_LAGS = (1, 7)


def _ts12_oracle() -> str:
    lag_rows = ",".join(str(k) for k in _TS12_LAGS)
    return f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             sum(CAST(round(value) AS BIGINT)) AS x
      FROM events GROUP BY 1, 2),
    lags AS (SELECT unnest([{lag_rows}]) AS k),
    p AS (
      SELECT a.event_type, lags.k, a.x AS xt, b.x AS xl
      FROM daily a
      JOIN lags ON TRUE
      JOIN daily b ON b.event_type = a.event_type
                  AND b.day = a.day - CAST(lags.k AS INTEGER)),
    m AS (
      SELECT event_type, k,
             count(*) AS n,
             sum(xt) AS sx, sum(xl) AS sy,
             sum(xt * xl) AS sxy,
             sum(xt * xt) AS sxx, sum(xl * xl) AS syy
      FROM p GROUP BY 1, 2)
    SELECT event_type, CAST(k AS INT) AS lag,
           CAST(n AS BIGINT) AS n_pairs,
           round((n * sxy - sx * sy)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 4) AS acf
    FROM m
    """


@probe("ts12_autocorrelation", oracle=_ts12_oracle())
def ts12_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ts12 — per-event_type ACF at lags 1 and 7 over the daily
    integer-unit series (block comment above): calendar-exact lag
    pairs via a (type, day−k) self-equi-join, exact bigint moments,
    one floating Pearson ratio per (type, lag). The oracle replays the
    pairs, every integer moment, and the ratio."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(F.round("value", 0).cast("long")).alias("x"))
    lags = F.explode(
        F.array(*[F.lit(k) for k in _TS12_LAGS])
    ).alias("k")
    a = daily.select("event_type", "day", F.col("x").alias("xt"), lags)
    b = daily.select(
        F.col("event_type").alias("_et"),
        F.col("day").alias("_day"),
        F.col("x").alias("xl"),
    )
    p = a.join(
        b,
        (F.col("_et") == F.col("event_type"))
        & (F.col("_day") == F.date_sub(F.col("day"), F.col("k"))),
    )
    m = p.groupBy("event_type", "k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xt").alias("sx"),
        F.sum("xl").alias("sy"),
        F.sum(F.col("xt") * F.col("xl")).alias("sxy"),
        F.sum(F.col("xt") * F.col("xt")).alias("sxx"),
        F.sum(F.col("xl") * F.col("xl")).alias("syy"),
    )
    num = m["n"] * m["sxy"] - m["sx"] * m["sy"]
    den = F.sqrt(
        (m["n"] * m["sxx"] - m["sx"] * m["sx"]).cast("double")
    ) * F.sqrt((m["n"] * m["syy"] - m["sy"] * m["sy"]).cast("double"))
    return m.select(
        "event_type",
        F.col("k").cast("int").alias("lag"),
        F.col("n").cast("long").alias("n_pairs"),
        dround(num / den, 4).alias("acf"),
    )
