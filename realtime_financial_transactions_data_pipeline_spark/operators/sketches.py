"""Sketch / approximate aggregates (north-star X5; SURVEY §2.7 A10 scale
path): approx distinct, approximate percentiles — plus the exact
percentile twin that the DuckDB oracle can verify.

At 100 TB, `approx_count_distinct` (HyperLogLog++) and
`percentile_approx` (Greenwald-Khanna) replace their exact twins to keep
the aggregation single-pass and bounded-memory; the exact versions stay
available for dimension-sized inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_financial_transactions_data_pipeline_spark.functions.compat import dround
from realtime_financial_transactions_data_pipeline_spark.registry import probe
from realtime_financial_transactions_data_pipeline_spark.tables import load_table


@probe("x5_approx_sketches", oracle=None)
def x5_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct + GK percentile sketches per event_type. Rows-only:
    sketch outputs are implementation-defined (DuckDB's approx functions
    use different estimators); accuracy vs exact is asserted in
    tests/test_sketches.py."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.percentile_approx("value", 0.5).alias("p50_approx"),
        F.percentile_approx("value", 0.9).alias("p90_approx"),
    )


@probe(
    "x5b_exact_percentiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.9), 4) AS p90,
           round(min(value), 2) AS v_min,
           round(max(value), 2) AS v_max
    FROM events GROUP BY event_type
    """,
)
def x5b_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` == DuckDB
    `quantile_cont`) + min/max per group."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        dround(F.percentile("value", 0.5), 4).alias("p50"),
        dround(F.percentile("value", 0.9), 4).alias("p90"),
        dround(F.min("value"), 2).alias("v_min"),
        dround(F.max("value"), 2).alias("v_max"),
    )


def misra_gries_candidates(
    items: DataFrame, col: str, k: int, target_partitions: int | None = None
) -> DataFrame:
    """Per-partition Misra-Gries frequent-items summary (k counters) →
    the union of per-partition candidates.

    Guarantee (pigeonhole + MG bound): any item with GLOBAL count
    >= N/(k+1) has count >= N_i/(k+1) in at least one partition i, and
    a k-counter MG summary retains every item with partition count
    > N_i/(k+1) — so the union is a SUPERSET of the true heavy hitters.
    An exact second pass over the candidates (see
    ``x5c_heavy_hitters``) then removes false positives, making the
    two-pass result exactly correct with O(k) memory per task in the
    first pass — the cardinality-unbounded groupBy never happens.

    Batched decrement: after merging a batch's value_counts, if more
    than k counters remain, subtract the (len-k)-th smallest count from
    all and drop the non-positive — the generalized MG step (each unit
    of decrement hits > k counters at once, preserving the bound).

    ``target_partitions`` bounds the summary-pass fan-out: the merged
    candidate set is <= partitions x k rows, and each partition costs a
    Python-worker round trip — on a cluster leave it None (natural
    partitioning, workers are already warm); a small value suits
    local mode where 32 cold Arrow workers dominate the pass.
    """
    import pandas as pd

    if target_partitions is not None:
        items = items.coalesce(target_partitions)

    def mg(batches):
        counters: "pd.Series | None" = None
        for pdf in batches:
            vc = pdf[col].value_counts()
            counters = vc if counters is None else counters.add(vc, fill_value=0)
            if len(counters) > k:
                m = counters.nsmallest(len(counters) - k).iloc[-1]
                counters = counters - m
                counters = counters[counters > 0]
        if counters is not None and len(counters):
            yield pd.DataFrame({col: counters.index})

    return items.mapInPandas(mg, schema=f"{col} string")


@probe(
    "x5c_heavy_hitters",
    oracle="""
    WITH toks AS (
      SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
    ),
    nz AS (SELECT w FROM toks WHERE w <> '')
    SELECT w AS token, CAST(count(*) AS BIGINT) AS n_occurrences
    FROM nz GROUP BY w
    HAVING 512 * count(*) >= (SELECT count(*) FROM nz)
    """,
)
def x5c_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5c: exact corpus heavy hitters (tokens with frequency >= 1/512
    of all tokens) via the scale-correct two-pass sketch: (1) bounded-
    memory Misra-Gries candidates per partition (1024 counters — twice
    the 512 needed, headroom for batch-decrement slack), (2) exact
    recount of candidates only (broadcast semi-join prunes the shuffle
    to candidate rows), (3) integer threshold filter. Exactly equal to
    the naive full groupBy, without its unbounded aggregation state."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .filter(F.col("w") != "")
    )
    # No persist: the explode is a cheap narrow pass over a pruned
    # single-column scan; re-deriving it per consumer beats
    # materializing the full token stream (measured 0.3 s/pass vs
    # several seconds of cache build at sf0.1).
    candidates = misra_gries_candidates(
        toks, "w", k=1024, target_partitions=8
    ).distinct()
    total = toks.agg(F.count(F.lit(1)).alias("_n"))
    return (
        toks.join(F.broadcast(candidates), "w", "left_semi")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .crossJoin(F.broadcast(total))
        .filter(F.lit(512) * F.col("n_occurrences") >= F.col("_n"))
        .select(F.col("w").alias("token"), "n_occurrences")
    )


# ---------------------------------------------------------------------------
# x5d — portable HyperLogLog (Flajolet et al. 2007). The built-in
# approx_count_distinct is rows-only by nature (HLL++ internals differ
# per engine); this from-scratch HLL uses an md5-derived 32-bit hash
# and string-exact bit lengths (bin()) so BOTH engines compute the
# identical registers and the identical estimate — an approximate
# algorithm under an exact-equality oracle. One groupBy(register)
# max-aggregate per input: single-pass, 64 registers of state,
# mergeable across partitions by construction (max commutes).
# ---------------------------------------------------------------------------

_HLL_B = 6  # register-index bits
_HLL_M = 1 << _HLL_B  # 64 registers
_HLL_WBITS = 32 - _HLL_B  # 26 rank bits
_HLL_ALPHA = 0.709  # alpha_64 (m >= 128 uses 0.7213/(1+1.079/m); 64 -> 0.709)


def hll_estimate(df: DataFrame, col: str, out: str = "hll_distinct") -> DataFrame:
    """One-row DataFrame with the portable-HLL distinct estimate of
    ``col``. Hash law: hv = first-8-hex of md5('u:' || value) as a
    32-bit uint; register = hv >> 26; rank = leading zeros of the low
    26 bits + 1 (27 for w = 0), computed as 27 - length(bin(w)) —
    integer-exact in Spark and DuckDB alike. Estimate: alpha·m²/Σ2^-M
    with the standard small-range linear-counting correction
    (m·ln(m/V) when E <= 2.5m and V empty registers remain)."""
    hv = F.expr(
        f"CAST(conv(substr(md5(concat('u:', CAST({col} AS STRING))), 1, 8),"
        f" 16, 10) AS BIGINT)"
    )
    d = df.filter(F.col(col).isNotNull()).select(
        hv.alias("_hv")
    ).select(
        (F.col("_hv") / (1 << _HLL_WBITS)).cast("long").alias("reg"),
        F.pmod("_hv", F.lit(1 << _HLL_WBITS)).alias("w"),
    ).select(
        "reg",
        F.when(F.col("w") == 0, F.lit(_HLL_WBITS + 1))
        .otherwise(_HLL_WBITS + 1 - F.length(F.expr("bin(w)")))
        .alias("rank"),
    )
    regs = d.groupBy("reg").agg(F.max("rank").alias("mx"))
    # 64 one-row values; the 2^-mx terms are exact dyadic doubles, so
    # the sum is order-insensitive and both engines agree bit-for-bit.
    agg = regs.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mx"))).alias("s"),
        F.count(F.lit(1)).alias("nz"),
    )
    raw = F.lit(_HLL_ALPHA * _HLL_M * _HLL_M) / (
        F.col("s") + F.lit(float(_HLL_M)) - F.col("nz")  # empty regs add 2^0
    )
    v = F.lit(_HLL_M) - F.col("nz")  # empty registers
    est = F.when(
        (raw <= 2.5 * _HLL_M) & (v > 0),
        F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / v),
    ).otherwise(raw)
    return agg.select(dround(est, 2).alias(out))


@probe(
    "x5d_hll_distinct",
    oracle=f"""
    WITH h AS (
      SELECT CAST(('0x' || substr(md5('u:' || CAST(user_id AS VARCHAR)), 1, 8))
               AS BIGINT) AS hv
      FROM events WHERE user_id IS NOT NULL),
    r AS (
      SELECT hv // {1 << _HLL_WBITS} AS reg, hv % {1 << _HLL_WBITS} AS w FROM h),
    rk AS (
      SELECT reg,
             CASE WHEN w = 0 THEN {_HLL_WBITS + 1}
                  ELSE {_HLL_WBITS + 1} - length(bin(w)) END AS rank
      FROM r),
    regs AS (SELECT reg, max(rank) AS mx FROM rk GROUP BY reg),
    agg AS (SELECT sum(power(2.0, -mx)) AS s, count(*) AS nz FROM regs),
    est AS (
      SELECT CASE
        WHEN {_HLL_ALPHA} * {_HLL_M} * {_HLL_M} / (s + {_HLL_M} - nz)
               <= 2.5 * {_HLL_M}
             AND {_HLL_M} - nz > 0
        THEN {_HLL_M} * ln(CAST({_HLL_M} AS DOUBLE) / ({_HLL_M} - nz))
        ELSE {_HLL_ALPHA} * {_HLL_M} * {_HLL_M} / (s + {_HLL_M} - nz)
        END AS e
      FROM agg)
    SELECT round(e, 2) AS hll_users,
           (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events)
             AS exact_users
    FROM est
    """,
)
def x5d_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5d: approximate distinct users with an ENGINE-PORTABLE
    HyperLogLog — unlike x5's built-in HLL++ (rows-only by nature),
    every step here (hash, register, rank, harmonic sum, linear-
    counting correction) is replayed identically by DuckDB, so the
    value hash certifies an approximate algorithm exactly. The exact
    distinct rides along so the record shows the estimation error the
    64-register sketch actually achieves (~13 % standard error)."""
    e = load_table(spark, sf_dir, "events")
    est = hll_estimate(e, "user_id", out="hll_users")
    exact = e.agg(F.countDistinct("user_id").alias("exact_users"))
    return est.crossJoin(exact)


# ---------------------------------------------------------------------------
# X5E — Count-Min sketch (Cormode–Muthukrishnan 2005), portable replay:
# the x5 family's HLL (x5d) covers distinct counting; this covers
# frequency estimation — the sketch a 100 TB pipeline keeps when exact
# per-term counts don't fit but "how often does THIS term occur" must
# be answerable with a one-sided bound (estimate ≥ truth, always).
# d=4 hash rows × w=512 buckets; bucket(r, term) = first 32 bits of
# md5('r-term') mod 512 — the hash_uniform idiom, bit-identical in
# DuckDB, so unlike x5/x5d's engine-native estimators the ENTIRE sketch
# is oracle-replayable. Scale shape: the sketch builds from the
# already-aggregated term-count relation (one token shuffle — the exact
# pass any corpus profile runs anyway), explodes each term to its 4
# (row, bucket) cells, and partial-aggregates into ≤ 2,048 cells — the
# sketch itself is kilobytes regardless of corpus size, and the query
# side broadcasts 40 probe keys against it. The probe estimates the
# exact top-10 terms so the one-sided error (overestimate ≥ 0, bounded
# by collisions) is visible in the output and pinned by the hash.
# ---------------------------------------------------------------------------

_X5E_D = 4
_X5E_W = 512
_X5E_TOPK = 10


def _x5e_oracle() -> str:
    from realtime_financial_transactions_data_pipeline_spark.operators.text import _TOKEN_RE

    b = (
        "('0x' || substr(md5(CAST({r} AS VARCHAR) || '-' || {t}), 1, 8))"
        f"::UINTEGER % {_X5E_W}"
    )
    return f"""
    WITH tok AS (
      SELECT unnest(regexp_extract_all(lower(text), '{_TOKEN_RE}')) AS term
      FROM documents),
    tc AS (SELECT term, count(*) AS freq FROM tok GROUP BY term),
    rows_ AS (SELECT unnest([{','.join(str(r) for r in range(_X5E_D))}]) AS r),
    cells AS (
      SELECT r, {b.format(r='r', t='term')} AS b, sum(freq) AS cell
      FROM tc, rows_ GROUP BY 1, 2),
    top AS (SELECT term, freq FROM tc
            ORDER BY freq DESC, term LIMIT {_X5E_TOPK}),
    est AS (
      SELECT t.term, t.freq, min(c.cell) AS cm_est
      FROM top t, rows_
      JOIN cells c
        ON c.r = rows_.r AND c.b = {b.format(r='rows_.r', t='t.term')}
      GROUP BY 1, 2)
    SELECT term,
           CAST(freq AS BIGINT) AS true_freq,
           CAST(cm_est AS BIGINT) AS cm_est,
           CAST(cm_est - freq AS BIGINT) AS overestimate
    FROM est
    """


def _cm_bucket(r: int, term_col: str) -> F.Column:
    """bucket(r, term): first 32 md5 bits of 'r-term' mod _X5E_W — the
    hash_uniform idiom, bit-identical to the oracle's UINTEGER cast."""
    h = F.md5(F.concat(F.lit(f"{r}-"), F.col(term_col)))
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % _X5E_W
    )


@probe("x5e_countmin_freq", oracle=_x5e_oracle())
def x5e_countmin_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x5e — Count-Min frequency sketch over the documents token stream
    (block comment above): build 4×512 cells from the term-count
    relation, estimate the exact top-10 terms via min-over-rows, emit
    (term, true_freq, cm_est, overestimate). The oracle replays
    tokenization, the cell sums, the top-10 cut, and every bucket hash.
    """
    from realtime_financial_transactions_data_pipeline_spark.operators.text import _TOKEN_RE

    tok = load_table(spark, sf_dir, "documents").select(
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(_TOKEN_RE), 0)
        ).alias("term")
    )
    tc = tok.groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    # One (row, bucket) pair per term per hash row; ≤ d·w cells out.
    cells = (
        tc.select(
            "freq",
            F.posexplode(
                F.array(*[_cm_bucket(r, "term") for r in range(_X5E_D)])
            ).alias("r", "b"),
        )
        .groupBy("r", "b")
        .agg(F.sum("freq").alias("cell"))
    )
    top = tc.orderBy(F.col("freq").desc(), "term").limit(_X5E_TOPK)
    probe_keys = top.select(
        "term",
        "freq",
        F.posexplode(
            F.array(*[_cm_bucket(r, "term") for r in range(_X5E_D)])
        ).alias("r", "b"),
    )
    return (
        cells.join(F.broadcast(probe_keys), ["r", "b"])
        .groupBy("term")
        .agg(
            F.max("freq").cast("long").alias("true_freq"),
            F.min("cell").cast("long").alias("cm_est"),
            (F.min("cell") - F.max("freq")).cast("long").alias("overestimate"),
        )
        .select("term", "true_freq", "cm_est", "overestimate")
    )


# ---------------------------------------------------------------------------
# X5F — mergeable log-histogram QUANTILE sketch (the HdrHistogram /
# DDSketch family: Masson et al., "DDSketch: a fast and fully-mergeable
# quantile sketch with relative-error guarantees", VLDB 2019 — public
# paper; this is a from-scratch integer-arithmetic variant, not a
# transcription). The x5 family's missing class: x5b's exact
# percentiles need a rank pass, GK sketches (x5's percentile_approx)
# are implementation-defined and engine-incomparable — this sketch is
# BOTH scalable and bit-replayable:
#   bucket = (k, sub): k = floor(log2(v)) computed EXACTLY as
#   length(bin(v)) - 1 (minimal binary repr in both engines — no
#   float log near power boundaries), sub = the G-way linear subdivide
#   of [2^k, 2^{k+1}) via integer multiply/divide. Relative error of
#   any quantile estimate is bounded by the sub-bucket width:
#   ≤ 1/G (G = 64 → ≤ 1.6 %), asserted vs numpy-exact in
#   tests/test_sketches.py.
# Scale shape: the sketch IS a groupBy count over ≤ 64·G buckets —
# partial-aggregable (map-side combine), trivially mergeable across
# shards/days (add counts), single pass, bounded memory. The quantile
# walk runs on the COLLECTED sketch — bounded by construction at
# ≤ 64·G = 4,096 rows, the x5c/x1db bounded-collect class, never by
# data volume. The oracle replays bucketization, the cumulative walk,
# and the in-bucket interpolation in the same integer arithmetic, so
# the hash certifies the whole estimator, not just its outputs.
# ---------------------------------------------------------------------------

_X5F_G = 64
_X5F_QS = (500, 900, 950, 990)  # per-mille targets


def quantile_histogram(df: DataFrame, col: str, g: int = _X5F_G) -> DataFrame:
    """The mergeable sketch: (k, sub) bucket counts over a positive
    integer column. Merging two sketches = unioning and re-summing —
    the groupBy is the merge."""
    v = F.col(col)
    k = (F.length(F.bin(v)) - 1).alias("k")
    d = df.select(v.alias("_v"), k).withColumn(
        # python-side shiftleft() wants an int literal for the bit
        # count; the SQL form accepts a column
        "pow", F.expr("shiftleft(CAST(1 AS BIGINT), k)")
    )
    sub = ((F.col("_v") - F.col("pow")) * g / F.col("pow")).cast("long")
    return (
        d.withColumn("sub", sub)
        .groupBy("k", "sub")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _x5f_oracle() -> str:
    g = _X5F_G
    q_rows = ", ".join(f"({q})" for q in _X5F_QS)
    return f"""
    WITH v AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem),
    b AS (
      SELECT length(bin(cents)) - 1 AS k,
             (1::BIGINT << (length(bin(cents)) - 1)) AS pow,
             cents
      FROM v),
    sk AS (
      SELECT k, ((cents - pow) * {g}) // pow AS sub, count(*) AS cnt
      FROM b GROUP BY 1, 2),
    walk AS (
      SELECT k, sub, cnt,
             sum(cnt) OVER (ORDER BY k, sub
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum,
             sum(cnt) OVER () AS n
      FROM sk),
    qs AS (SELECT q FROM (VALUES {q_rows}) t(q)),
    hit AS (
      SELECT q, k, sub, cnt, cum, n,
             CAST(ceil(q * n / 1000.0) AS BIGINT) AS r,
             row_number() OVER (
               PARTITION BY q ORDER BY k, sub) AS pick
      FROM qs JOIN walk
        ON cum >= CAST(ceil(q * n / 1000.0) AS BIGINT)),
    est AS (
      SELECT q, n, k, sub, cnt, cum, r,
             (1::BIGINT << k) + sub * (1::BIGINT << k) // {g} AS lo,
             (1::BIGINT << k) + (sub + 1) * (1::BIGINT << k) // {g} AS hi
      FROM hit WHERE pick = 1)
    SELECT CAST(q AS INTEGER) AS q_permille,
           CAST(n AS BIGINT) AS n_rows,
           CAST(lo + (r - (cum - cnt) - 1) * (hi - lo) // cnt AS BIGINT)
             AS est_cents,
           CAST((SELECT count(*) FROM sk) AS BIGINT) AS n_buckets
    FROM est
    """


@probe("x5f_quantile_histogram", oracle=_x5f_oracle())
def x5f_quantile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5F — mergeable log-histogram quantile sketch over lineitem
    price cents (block comment above): one partial-aggregable bucket
    count, a ≤4,096-row bounded collect, and the integer quantile walk
    (rank r = ceil(q·n/1000), first bucket whose cumulative count
    reaches r, linear in-bucket interpolation) — every step replayed
    by the oracle in the same integer arithmetic."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents")
    )
    sk = quantile_histogram(li, "cents")
    rows = sorted(
        ((r.k, r.sub, r.cnt) for r in sk.collect())
    )  # bounded: <= 64 * G buckets by construction
    n = sum(c for _, _, c in rows)
    g = _X5F_G
    out = []
    for q in _X5F_QS:
        r_target = -(-q * n // 1000)  # ceil(q*n/1000) in exact int math
        cum = 0
        for k, sub, cnt in rows:
            cum += cnt
            if cum >= r_target:
                lo = (1 << k) + sub * (1 << k) // g
                hi = (1 << k) + (sub + 1) * (1 << k) // g
                est = lo + (r_target - (cum - cnt) - 1) * (hi - lo) // cnt
                out.append((q, n, est, len(rows)))
                break
    return spark.createDataFrame(
        out, "q_permille int, n_rows long, est_cents long, n_buckets long"
    )
