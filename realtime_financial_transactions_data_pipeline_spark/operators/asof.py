"""J6 — as-of (point-in-time) join: for every left row, the single most
recent right row with the same key at-or-before the left timestamp.

The canonical financial lookup the reference's star schema implies but
BigQuery had to emulate with correlated subqueries: attribute each
transaction to the prevailing exchange rate / risk score / consent
snapshot *as of* the transaction time (reference README.md:40-49's
slowly-changing dimensions are the batch cousin of this).

Scale design — union + one window pass, NO join node:

    left(key, ts, payload_l)  ─┐ tag side=1
                               ├─ union → window PARTITION BY key
    right(key, ts, payload_r) ─┘ tag side=0     ORDER BY ts, side
                                   last(payload_r, ignorenulls) ⇒ match

A naive formulation (equi-join on key + ts filter + row_number to keep
the latest) shuffles BOTH tables on the key and then explodes every
(left, right) candidate pair before pruning — O(matches²) per key in
the worst case. The union-window plan shuffles each row exactly once,
carries no pair blow-up, and AQE handles key skew like any other
window. Rows at identical (ts) order right-before-left (side 0 < 1),
giving the standard >= semantics; the right side is pre-reduced to one
row per (key, ts) so the match is unique and deterministic.

Oracle: DuckDB's native ASOF LEFT JOIN — an independent engine's
implementation of the same semantics, not a replay of our plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from realtime_financial_transactions_data_pipeline_spark.functions.compat import dround
from realtime_financial_transactions_data_pipeline_spark.registry import probe
from realtime_financial_transactions_data_pipeline_spark.tables import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Append ``right_payload`` columns (plus ``_asof_ts``, the matched
    right timestamp) to ``left``: values from the latest right row with
    the same ``key`` whose ``right_ts`` <= ``left_ts``; all null when no
    right row qualifies. ``tolerance_seconds`` additionally nulls
    matches older than the window (the "don't join to a quote from last
    month" guard).

    The right side must be unique per (key, right_ts) — reduce it first
    (e.g. max/last by tie-break column) so the result is deterministic;
    this function asserts nothing about it and simply takes the last
    row in (ts, input-order), which is only stable if uniqueness holds.
    """
    lcols = [c for c in left.columns]
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*lcols).alias("_l"),
        F.lit(None).cast(
            right.select(F.struct(*right_payload, right_ts).alias("s")).schema[
                "s"
            ].dataType
        ).alias("_r"),
    )
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(F.struct(*lcols).alias("s")).schema["s"].dataType
        ).alias("_l"),
        F.struct(*right_payload, right_ts).alias("_r"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = (
        l.unionByName(r)
        .withColumn("_match", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if tolerance_seconds is not None:
        joined = joined.withColumn(
            "_match",
            F.when(
                F.unix_timestamp("_ts")
                - F.unix_timestamp(F.col("_match")[right_ts])
                <= tolerance_seconds,
                F.col("_match"),
            ),
        )
    out = joined.select(
        *[F.col(f"_l.{c}").alias(c) for c in lcols],
        *[F.col(f"_match.{c}").alias(c) for c in right_payload],
        F.col(f"_match.{right_ts}").alias("_asof_ts"),
    )
    return out


@probe(
    "j6_asof_join",
    oracle="""
    WITH p AS (SELECT user_id, event_id AS purchase_id,
                      date_trunc('second', ts) AS pts
               FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, date_trunc('second', ts) AS cts,
                      max(event_id) AS click_id
               FROM events WHERE event_type = 'click'
               GROUP BY user_id, date_trunc('second', ts))
    SELECT p.user_id, p.purchase_id, c.click_id,
           round(epoch(p.pts - c.cts) / 60.0, 2) AS mins_since_click
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND p.pts >= c.cts
    """,
)
def j6_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join each purchase event to the user's most recent click
    at-or-before it (last-touch attribution, point-in-time-correct).
    Hash-checked against DuckDB's NATIVE ASOF LEFT JOIN — an
    independent implementation of the semantics, so the oracle match
    certifies ordering, tie-breaks, and the unmatched-null contract,
    not just our own plan replayed. Clicks reduce to one row per
    (user, second) with the max event id first, making the match
    unique in both engines; both sides truncate to seconds (the
    delay-arithmetic granularity, matching t7/t8)."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.date_trunc("second", "ts").alias("pts"),
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .select("user_id", "event_id", F.date_trunc("second", "ts").alias("cts"))
        .groupBy("user_id", "cts")
        .agg(F.max("event_id").alias("click_id"))
    )
    out = asof_join(
        purchases,
        clicks,
        key="user_id",
        left_ts="pts",
        right_ts="cts",
        right_payload=["click_id"],
    )
    return out.select(
        "user_id",
        "purchase_id",
        "click_id",
        dround(
            (F.unix_timestamp("pts") - F.unix_timestamp("_asof_ts")) / 60.0, 2
        ).alias("mins_since_click"),
    )


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    key: str,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
) -> DataFrame:
    """J7 — interval-overlap join: all (a, b) row pairs sharing ``key``
    whose [start, end] intervals intersect (closed-interval semantics:
    touching endpoints overlap).

    With an equi key, this is a plain shuffle join on the key with the
    overlap conjunction as a post-join predicate — per-key work is
    bounded by per-key interval counts (AQE splits skewed keys), and no
    all-pairs blow-up crosses key boundaries. For the KEYLESS variant at
    corpus scale, bucketize time into fixed-width epochs, emit each
    interval into every epoch it touches, equi-join on the epoch, and
    dedup pairs — the standard range-bucketing rewrite; not needed here
    because every reference query carries a key.
    """
    return a.join(
        b,
        (a[key] == b[key])
        & (a[a_start] <= b[b_end])
        & (b[b_start] <= a[a_end]),
    )


@probe(
    "j7_interval_overlap",
    oracle="""
    WITH o AS (
      SELECT o_custkey AS k, o_orderkey AS id, o_orderdate AS s,
             o_orderdate + INTERVAL 30 DAY AS e
      FROM orders
    )
    SELECT a.k AS custkey,
           CAST(count(*) AS BIGINT) AS n_overlap_pairs,
           CAST(max(date_diff('day',
                              greatest(a.s, b.s),
                              least(a.e, b.e))) AS BIGINT) AS max_overlap_days
    FROM o a JOIN o b
      ON a.k = b.k AND a.id < b.id AND a.s <= b.e AND b.s <= a.e
    GROUP BY a.k
    """,
)
def j7_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: per-customer overlapping 30-day order windows — the
    'concurrent exposure' query (how many of a customer's transaction
    windows were simultaneously open, and for how long). Self
    interval-overlap join on the customer key; pair order pinned by
    orderkey so each unordered pair counts once."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderkey").alias("id"),
        F.col("o_orderdate").alias("s"),
        F.date_add(F.col("o_orderdate"), 30).cast("timestamp").alias("e"),
    )
    a = o.alias("a")
    b = o.alias("b")
    pairs = a.join(
        b,
        (F.col("a.k") == F.col("b.k"))
        & (F.col("a.id") < F.col("b.id"))
        & (F.col("a.s") <= F.col("b.e"))
        & (F.col("b.s") <= F.col("a.e")),
    )
    return pairs.groupBy(F.col("a.k").alias("custkey")).agg(
        F.count(F.lit(1)).alias("n_overlap_pairs"),
        F.max(
            F.datediff(
                F.least(F.col("a.e"), F.col("b.e")),
                F.greatest(F.col("a.s"), F.col("b.s")),
            )
        ).cast("long").alias("max_overlap_days"),
    )


@probe(
    "j6b_asof_tolerance",
    oracle="""
    WITH p AS (SELECT user_id, event_id AS purchase_id,
                      date_trunc('second', ts) AS pts
               FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, date_trunc('second', ts) AS cts,
                      max(event_id) AS click_id
               FROM events WHERE event_type = 'click'
               GROUP BY user_id, date_trunc('second', ts)),
         j AS (SELECT p.user_id, p.purchase_id, c.click_id, c.cts, p.pts
               FROM p ASOF LEFT JOIN c
                 ON p.user_id = c.user_id AND p.pts >= c.cts)
    SELECT user_id, purchase_id,
           CASE WHEN cts IS NOT NULL AND epoch(pts - cts) <= 1800
                THEN click_id END AS click_id,
           CASE WHEN cts IS NOT NULL AND epoch(pts - cts) <= 1800
                THEN round(epoch(pts - cts) / 60.0, 2) END AS mins_since_click
    FROM j
    """,
)
def j6b_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness bound (pandas ``merge_asof``'s
    ``tolerance`` / kdb wj parity): purchases attribute only to clicks
    at most 30 minutes old — older matches null out rather than
    attributing to a stale touchpoint. Same union+window plan as j6;
    the tolerance is a post-window conditional, not a second join. The
    oracle applies the identical bound on top of DuckDB's native ASOF
    join."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.date_trunc("second", "ts").alias("pts"),
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .select("user_id", "event_id", F.date_trunc("second", "ts").alias("cts"))
        .groupBy("user_id", "cts")
        .agg(F.max("event_id").alias("click_id"))
    )
    out = asof_join(
        purchases,
        clicks,
        key="user_id",
        left_ts="pts",
        right_ts="cts",
        right_payload=["click_id"],
        tolerance_seconds=1800,
    )
    return out.select(
        "user_id",
        "purchase_id",
        "click_id",
        dround(
            (F.unix_timestamp("pts") - F.unix_timestamp("_asof_ts")) / 60.0, 2
        ).alias("mins_since_click"),
    )


# ---------------------------------------------------------------------------
# J8 — keyless band join, bucketed: match rows from two sides whose
# VALUES are within delta, with no equi-key anywhere in the predicate.
# Spark plans a raw |l - r| <= d join as BroadcastNestedLoopJoin —
# O(n·m) comparisons, the shape that dies first at scale. The rewrite
# every interval/band-join engine uses: bucket both sides at width
# delta, explode ONE side to its {b-1, b, b+1} neighborhood, equi-join
# on the bucket (hash join — each qualifying pair meets in exactly one
# bucket since |l-r| <= d bounds the bucket gap to 1), then apply the
# exact band predicate to the in-bucket candidates. Comparisons drop
# from n·m to sum over buckets of |l_b|·|r_b±1| — linear in matches for
# uniform data — and the join parallelizes on the bucket key.
# j5/j7 ride an equi-key so the theta stays a post-join filter; j8 is
# the case with NO key, where the bucket IS the manufactured key.
# ---------------------------------------------------------------------------

_J8_DELTA = 0.05


@probe(
    "j8_band_join_bucketed",
    oracle=f"""
    WITH l AS (SELECT value AS lv FROM events WHERE event_type = 'error'),
         r AS (SELECT value AS rv FROM events WHERE event_type = 'purchase')
    SELECT CAST(floor(lv / 100) AS BIGINT) AS value_band,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(avg(abs(lv - rv)), 4) AS avg_gap
    FROM l JOIN r ON abs(lv - rv) <= {_J8_DELTA}
    GROUP BY 1
    """,
)
def j8_band_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 — error events matched to purchase events with values within
    {_J8_DELTA} (block comment above): bucket at width delta, explode
    the purchase side to its 3-bucket neighborhood, hash-join on the
    bucket, exact band filter on candidates. The oracle states the
    plain theta join — the hash certifies the bucketing rewrite finds
    EXACTLY the theta join's pairs (every qualifying pair lands in one
    bucket; the exact predicate prunes false in-bucket candidates).
    Plan-pinned nested-loop-free in tests/test_plans.py."""
    e = load_table(spark, sf_dir, "events")
    lb = (
        e.filter(F.col("event_type") == "error")
        .select(F.col("value").alias("lv"))
        .withColumn("bkt", F.floor(F.col("lv") / _J8_DELTA))
    )
    rb = (
        e.filter(F.col("event_type") == "purchase")
        .select(F.col("value").alias("rv"))
        .withColumn("bkt0", F.floor(F.col("rv") / _J8_DELTA))
        .select(
            "rv",
            # {b-2..b+2}, not {b-1..b+1}: two independent fp divisions
            # can straddle TWO integer boundaries when |lv-rv| is within
            # a few ulps of delta (ADVICE r13) — the wider neighborhood
            # keeps the gap bound exact while staying O(1) fan-out, and
            # the exact band predicate still prunes false candidates; a
            # qualifying pair still meets at most once (lv has one bkt,
            # the five exploded buckets are distinct).
            F.explode(
                F.expr("array(bkt0 - 2L, bkt0 - 1L, bkt0, bkt0 + 1L, bkt0 + 2L)")
            ).alias("bkt"),
        )
    )
    pairs = lb.join(rb, "bkt").filter(
        F.abs(F.col("lv") - F.col("rv")) <= _J8_DELTA
    )
    return pairs.groupBy(
        F.floor(F.col("lv") / 100).cast("long").alias("value_band")
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        dround(F.avg(F.abs(F.col("lv") - F.col("rv"))), 4).alias("avg_gap"),
    )


# ---------------------------------------------------------------------------
# J9 — NEAREST-direction as-of join (pandas merge_asof
# direction='nearest' with tolerance): for every left row, the right
# row with the same key minimizing |right_ts − left_ts|, bounded by a
# tolerance window; ties break toward the EARLIER (backward) match.
# j6 is the backward (<=) form; j9 completes the direction family.
#
# Scale design — the SAME union + one-window-sort plan as j6, no join
# node, no pair blow-up: one pass computes BOTH direction candidates
# (last right-at-or-before via an unbounded-preceding frame, first
# right-after via an unbounded-following frame over the identical
# sort), then nearest is a null-safe arithmetic pick. One shuffle per
# side, total.
# ---------------------------------------------------------------------------


def asof_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tolerance_seconds: int,
) -> DataFrame:
    """Append ``right_payload`` + ``_asof_ts`` from the nearest right
    row per key within ``tolerance_seconds``; nulls when none
    qualifies. Right must be unique per (key, right_ts) — reduce it
    first (j6's contract). A right row at exactly the left timestamp
    is a distance-0 backward match by the union sort order (right
    sorts before left at equal ts), so the backward branch alone
    covers equality and the tie rule stays 'earlier wins'."""
    lcols = list(left.columns)
    rstruct = F.struct(*right_payload, right_ts)
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*lcols).alias("_l"),
        F.lit(None).cast(
            right.select(rstruct.alias("s")).schema["s"].dataType
        ).alias("_r"),
    )
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(F.struct(*lcols).alias("s")).schema["s"].dataType
        ).alias("_l"),
        rstruct.alias("_r"),
    )
    order = [F.col("_ts").asc(), F.col("_side").asc()]
    back = (
        Window.partitionBy("_k").orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("_k").orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    u = (
        l.unionByName(r)
        .withColumn("_b", F.last("_r", ignorenulls=True).over(back))
        .withColumn("_f", F.first("_r", ignorenulls=True).over(fwd))
        .filter(F.col("_side") == 1)
    )
    ts_of = lambda c: F.unix_timestamp(F.col(c)[right_ts])  # noqa: E731
    db = F.unix_timestamp("_ts") - ts_of("_b")
    df_ = ts_of("_f") - F.unix_timestamp("_ts")
    b_ok = F.col("_b").isNotNull() & (db <= tolerance_seconds)
    f_ok = F.col("_f").isNotNull() & (df_ <= tolerance_seconds)
    # Nearest with earlier-wins ties: backward unless forward is
    # STRICTLY closer (or backward missing/out-of-window).
    pick = (
        F.when(b_ok & f_ok, F.when(df_ < db, F.col("_f")).otherwise(F.col("_b")))
        .when(b_ok, F.col("_b"))
        .when(f_ok, F.col("_f"))
    )
    out = u.withColumn("_match", pick).select(
        *[F.col(f"_l.{c}").alias(c) for c in lcols],
        *[F.col(f"_match.{c}").alias(c) for c in right_payload],
        F.col(f"_match.{right_ts}").alias("_asof_ts"),
    )
    return out


_J9_TOL_S = 6 * 3600


@probe(
    "j9_asof_nearest",
    oracle=f"""
    WITH p AS (SELECT user_id, event_id AS purchase_id,
                      date_trunc('second', ts) AS pts
               FROM events WHERE event_type = 'purchase'),
         e AS (SELECT user_id, date_trunc('second', ts) AS ets,
                      max(event_id) AS error_id
               FROM events WHERE event_type = 'error'
               GROUP BY user_id, date_trunc('second', ts)),
    cand AS (SELECT p.user_id, p.purchase_id, p.pts, e.error_id, e.ets,
                    abs(epoch(p.pts) - epoch(e.ets)) AS d
             FROM p JOIN e USING (user_id)
             WHERE abs(epoch(p.pts) - epoch(e.ets)) <= {_J9_TOL_S}),
    best AS (SELECT *, row_number() OVER (
                 PARTITION BY user_id, purchase_id
                 ORDER BY d, ets) AS rn
             FROM cand)
    SELECT p.user_id, p.purchase_id, b.error_id,
           CAST(epoch(b.ets) - epoch(p.pts) AS BIGINT) AS offset_sec
    FROM p LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
      ON p.user_id = b.user_id AND p.purchase_id = b.purchase_id
    """,
)
def j9_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 — each purchase matched to the user's NEAREST error event
    within ±{_J9_TOL_S // 3600} h (block comment above): the
    incident-correlation lookup ("which failure is this purchase
    closest to?"). The oracle states the brute-force argmin over all
    in-window pairs with the same earlier-wins tie rule, so the hash
    certifies the two-direction window construction, the tolerance
    nulling, and the tie-break — against an implementation-independent
    formulation. ``offset_sec`` is SIGNED (negative = matched error
    precedes the purchase)."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.date_trunc("second", "ts").alias("pts"),
    )
    errors = (
        e.filter(F.col("event_type") == "error")
        .select("user_id", F.date_trunc("second", "ts").alias("ets"), "event_id")
        .groupBy("user_id", "ets")
        .agg(F.max("event_id").alias("error_id"))
    )
    out = asof_nearest(
        purchases,
        errors,
        key="user_id",
        left_ts="pts",
        right_ts="ets",
        right_payload=["error_id"],
        tolerance_seconds=_J9_TOL_S,
    )
    return out.select(
        "user_id",
        "purchase_id",
        "error_id",
        (F.unix_timestamp("_asof_ts") - F.unix_timestamp("pts"))
        .cast("long")
        .alias("offset_sec"),
    )


# ---------------------------------------------------------------------------
# J10 — point-in-time (PIT) join against SCD2 validity intervals with
# EXPIRING versions: the feature-store read (Feast/Tecton's
# point_in_time_join, Databricks FS's training-set build) that j6's
# plain as-of cannot express — an as-of match is wrong when the
# matched version has lapsed (consent snapshots, KYC attestations,
# rate locks: the reference's financial domain is full of attributes
# that are only valid for a bounded window). Same union+window plan as
# j6 — one shuffle, no join node, no pair blow-up — plus a carried
# valid_to so each fact checks the matched version's expiry instead of
# blindly taking the most recent one (the feature-leakage guard).
# ---------------------------------------------------------------------------

_J10_TTL_DAYS = 7
_J10_FMT = "yyyy-MM-dd HH:mm:ss"


def pit_join(
    facts: DataFrame,
    versions: DataFrame,
    key: str,
    fact_ts: str,
    valid_from: str,
    valid_to: str,
    version_cols: list[str],
) -> DataFrame:
    """Generic PIT join: every fact row gains ``version_cols`` from the
    version whose [valid_from, valid_to) interval contains its
    timestamp, or NULLs when none does — including when the most
    recent version has EXPIRED (the feature-leakage case a plain as-of
    gets wrong). Requires disjoint intervals per key (SCD2 invariant).
    Union + one window pass per key (j10 block comment): version rows
    sort before same-instant facts for >= semantics; fact rows check
    the carried valid_to before surfacing the match."""
    vcols = [c for c in version_cols if c != valid_from] + [valid_from]
    dimu = versions.select(
        F.col(key).alias("_k"),
        F.col(valid_from).alias("_t"),
        F.lit(0).alias("_side"),
        F.col(valid_to).alias("_vt"),
        *[F.col(c).alias(f"_v_{c}") for c in vcols],
        *[F.lit(None).cast(facts.schema[c].dataType).alias(c)
          for c in facts.columns if c != key],
    )
    factu = facts.select(
        F.col(key).alias("_k"),
        F.col(fact_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(versions.schema[valid_to].dataType).alias("_vt"),
        *[F.lit(None).cast(versions.schema[c].dataType).alias(f"_v_{c}")
          for c in vcols],
        *[F.col(c) for c in facts.columns if c != key],
    )
    wu = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = dimu.unionByName(factu).select(
        "*",
        F.last("_vt", ignorenulls=True).over(wu).alias("_cur_vt"),
        *[
            F.last(f"_v_{c}", ignorenulls=True).over(wu).alias(f"_cur_{c}")
            for c in vcols
        ],
    )
    live = F.col("_t") < F.col("_cur_vt")  # NULL _cur_vt ⇒ no match
    return carried.filter(F.col("_side") == 1).select(
        F.col("_k").alias(key),
        F.col("_t").alias(fact_ts),
        *[F.col(c) for c in facts.columns if c not in (key, fact_ts)],
        *[
            F.when(live, F.col(f"_cur_{c}")).alias(c)
            for c in version_cols
        ],
    )


@probe(
    "j10_pit_join",
    oracle=f"""
    WITH ch0 AS (
      SELECT user_id, event_id, date_trunc('second', ts) AS vf
      FROM events
      WHERE user_id % 5 = 3 AND event_type IN ('signup', 'error')),
    ch AS (
      SELECT user_id, max(event_id) AS ver_id, vf
      FROM ch0 GROUP BY user_id, vf),
    v AS (
      SELECT user_id, ver_id, vf,
             least(lead(vf) OVER (PARTITION BY user_id ORDER BY vf),
                   vf + INTERVAL {_J10_TTL_DAYS} DAY) AS vt
      FROM ch),
    f AS (
      SELECT event_id, user_id, ts FROM events
      WHERE user_id % 5 = 3 AND event_type = 'purchase')
    SELECT f.event_id, f.user_id,
           strftime(f.ts, '%Y-%m-%d %H:%M:%S') AS fact_ts,
           CAST(v.ver_id AS BIGINT) AS version_id,
           strftime(v.vf, '%Y-%m-%d %H:%M:%S') AS version_valid_from
    FROM f LEFT JOIN v
      ON v.user_id = f.user_id AND v.vf <= f.ts AND f.ts < v.vt
    """,
)
def j10_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10 — PIT-join purchases to the profile version valid AT the
    purchase instant. Versions come from each user's signup/error
    change events (k9's SCD2 recipe: same-second dedupe, lead() close)
    but additionally EXPIRE after {_J10_TTL_DAYS} days without a new
    change — so validity intervals have real gaps, and a purchase
    landing in a gap must yield NULLs, never the stale version (the
    leakage case a plain as-of silently gets wrong; DuckDB's interval
    LEFT JOIN is the independent oracle, exactly one row per fact
    because intervals are disjoint by construction). Plan: union the
    version starts with the facts, ONE window pass per user carrying
    (version id, valid_from, valid_to) via last(ignorenulls) ordered
    by (t, side) — version rows sort before same-instant facts for >=
    semantics — then fact rows null the match out when t >= the
    carried valid_to. One shuffle total; at 100 TB this is the j6
    economics with a two-column wider carry, and AQE handles hot keys
    as ordinary window skew."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 5 == 3)
    ch = (
        e.filter(F.col("event_type").isin("signup", "error"))
        .select(
            "user_id",
            "event_id",
            F.date_trunc("second", "ts").alias("vf"),
        )
        .groupBy("user_id", "vf")
        .agg(F.max("event_id").alias("ver_id"))
    )
    w = Window.partitionBy("user_id").orderBy("vf")
    v = ch.withColumn(
        "vt",
        F.least(
            F.lead("vf").over(w),
            F.col("vf") + F.expr(f"INTERVAL {_J10_TTL_DAYS} DAYS"),
        ),
    )
    f = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    out = pit_join(
        f,
        v,
        key="user_id",
        fact_ts="ts",
        valid_from="vf",
        valid_to="vt",
        version_cols=["ver_id", "vf"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", _J10_FMT).alias("fact_ts"),
        F.col("ver_id").alias("version_id"),
        F.date_format("vf", _J10_FMT).alias("version_valid_from"),
    )


# ---------------------------------------------------------------------------
# J12 — temporal FX conversion: the reference's domain (financial
# transactions) applied to the as-of machinery — convert every order's
# total into base currency at the rate IN EFFECT on its order date,
# from a rate table that is deliberately SPARSE (rates publish every
# third day, so the lookup is a genuine as-of, not an equi-join).
# Rates are hash-derived integer basis points and the conversion is
# cents × bps // 10000 — integer end-to-end, so the monthly rollup
# hash has no float in it. The oracle runs DuckDB's native ASOF JOIN
# against the identical derived rate relation: two engines, two as-of
# IMPLEMENTATIONS (our union-window plan vs their range join), one
# certified result.
# ---------------------------------------------------------------------------


@probe(
    "j12_temporal_fx",
    oracle="""
    WITH o AS (
      SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d,
             CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
               AS month,
             (['USD','EUR','GBP','JPY','CHF'])[
                        CAST(o_orderkey % 5 AS INTEGER) + 1] AS ccy,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    days AS (
      SELECT DISTINCT d FROM o
      WHERE CAST(epoch_ms(CAST(d AS TIMESTAMP)) // 86400000 AS BIGINT) % 3 = 0),
    fx AS (
      SELECT c.ccy, days.d AS fx_date,
             5000 + CAST(('0x' || substr(md5(c.ccy || '@' ||
                     strftime(days.d, '%Y-%m-%d')), 1, 8)) AS BIGINT) % 10000
               AS rate_bps
      FROM days, (SELECT unnest(['USD','EUR','GBP','JPY','CHF']) AS ccy) c),
    conv AS (
      SELECT o.month, o.ccy, o.cents,
             fx.rate_bps,
             o.cents * fx.rate_bps // 10000 AS base_cents
      FROM o ASOF JOIN fx ON o.ccy = fx.ccy AND o.d >= fx.fx_date)
    SELECT month, ccy,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS native_cents,
           CAST(sum(base_cents) AS BIGINT) AS base_cents
    FROM conv GROUP BY month, ccy
    """,
)
def j12_temporal_fx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J12 — monthly revenue by currency converted at the as-of FX
    rate (block comment above). Spark side: derive the sparse rate
    relation with the same portable md5 bps law, reduce nothing (one
    rate per (ccy, fx_date) by construction), and run the engine's
    asof_join; orders whose date precedes the first rate publication
    are excluded by the inner-asof semantics on BOTH engines (DuckDB
    ASOF JOIN is inner by default; we filter the null matches)."""
    from realtime_financial_transactions_data_pipeline_spark.tables import load_table

    ccys = ["USD", "EUR", "GBP", "JPY", "CHF"]
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("d"),
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("long")
        .alias("month"),
        F.element_at(
            F.array(*[F.lit(c) for c in ccys]),
            (F.col("o_orderkey") % 5).cast("int") + 1,
        ).alias("ccy"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    days = (
        o.select("d")
        .distinct()
        .filter(
            F.pmod(
                (F.unix_timestamp(F.col("d").cast("timestamp")) / 86400)
                .cast("long"),
                F.lit(3),
            )
            == 0
        )
    )
    fx = days.crossJoin(
        o.sparkSession.createDataFrame([(c,) for c in ccys], "ccy string")
    ).select(
        "ccy",
        F.col("d").alias("fx_date"),
        (
            F.lit(5000)
            + F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("ccy"),
                            F.lit("@"),
                            F.date_format("d", "yyyy-MM-dd"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 10000
        ).alias("rate_bps"),
    )
    joined = asof_join(
        o.withColumn("_ets", F.col("d").cast("timestamp")),
        fx.withColumn("_fts", F.col("fx_date").cast("timestamp")),
        key="ccy",
        left_ts="_ets",
        right_ts="_fts",
        right_payload=["rate_bps"],
    ).filter(F.col("rate_bps").isNotNull())
    conv = joined.withColumn(
        "base_cents",
        F.floor(F.col("cents") * F.col("rate_bps") / F.lit(10000)).cast("long"),
    )
    return conv.groupBy("month", "ccy").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").alias("native_cents"),
        F.sum("base_cents").alias("base_cents"),
    )
