"""Distributed data generator (SURVEY §7 Phase 5; F8/F13/F14, J2
semantics, FIXTURES.md §A star schema).

The reference generates its data with single-process Python loops
(generate_fact_transactions_data.py:119-231, generate_dim_cust_data.py,
generate_dim_account_data.py). Spark-first re-expression: every table is
a ``spark.range(n)`` plus seeded ``rand()`` + chained ``when`` columns —
the whole generator is one codegen'd projection, so synthesizing a
100 TB fact table is embarrassingly parallel (range splits across
executors, no shuffle at all).

Determinism: every uniform draw is a COUNTER-BASED generator —
``md5(seed || '-' || row_id)`` truncated to 32 bits and scaled to
[0, 1). Unlike ``rand(seed)`` (whose stream depends on the physical
partitioning), this is a pure function of the row id, so the generated
tables are identical under any partitioning/AQE decision AND the same
construction is expressible in DuckDB SQL — which is what lets the
generated-star probes below be hash-checked instead of rows-only.
Surrogate ids use sha2-truncation of the row id (F14's deterministic
twin — ``uuid()`` exists but would defeat the oracle and re-run
stability; the reference itself seeds Faker for the same reason,
generate_dim_cust_data.py:17-18).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_financial_transactions_data_pipeline_spark.functions.compat import dround
from realtime_financial_transactions_data_pipeline_spark.functions.scalar import (
    BASE_DATE,
    date_from_id,
    period_am_pm,
)
from realtime_financial_transactions_data_pipeline_spark.registry import probe

_SEED = 42
_N_PARTITIONS = 8  # parallelism only; draws no longer depend on it

#: Channel mix, generate_fact_transactions_data.py:119-128 (recurring
#: transactions are always OPG, :115).
CHANNELS = ["POS", "Online Payment Gateway", "Net Banking", "UPI"]
#: dashboard mix (demo_images/dashboard.png): OPG .37, UPI .27, POS .27, NB .09
_CHANNEL_CUM = [("Online Payment Gateway", 0.37), ("UPI", 0.64), ("POS", 0.91), ("Net Banking", 1.0)]

#: Customer segments + weights, generate_dim_cust_data.py:34-45.
_SEGMENT_CUM = [
    ("Retail Banking", 0.45),
    ("Salaried Professionals", 0.60),
    ("Self-Employed / Business Owners", 0.70),
    ("NRI Banking", 0.77),
    ("Senior Citizens", 0.84),
    ("Students", 0.89),
    ("Private Banking", 0.93),
    ("Business Correspondent Customers", 0.96),
    ("Rural & Agriculture", 0.985),
    ("Retirees", 1.0),
]

_STATUS_CUM = [("Active", 0.75), ("Closed", 0.85), ("Inactive", 0.95), ("Suspended", 1.0)]

CUSTOMER_ID_BASE = 1968022735  # generate_dim_cust_data.py:129
ACCOUNT_ID_BASE = 500025171  # generate_dim_account_data.py:197


def weighted_choice(u: F.Column, cum_weights: list[tuple[str, float]]) -> F.Column:
    """F13 — ``random.choices(weights)`` as a chained ``when`` over one
    uniform draw (generate_fact_transactions_data.py:119-128)."""
    expr = F.when(u < cum_weights[0][1], cum_weights[0][0])
    for label, cum in cum_weights[1:-1]:
        expr = expr.when(u < cum, label)
    return expr.otherwise(cum_weights[-1][0])


def surrogate_id(prefix: str, id_col: F.Column, length: int = 20) -> F.Column:
    """F14 — deterministic uuid twin: ``uuid.uuid4().hex[:20]``
    (generate_fact_transactions_data.py:201) becomes a sha2-derived
    20-hex-char id, reproducible across runs."""
    return F.substring(F.sha2(F.concat(F.lit(prefix), id_col.cast("string")), 256), 1, length)


def hash_uniform(seed: int, id_col: str = "id") -> F.Column:
    """Counter-based uniform in [0, 1): first 32 bits of
    ``md5(seed-rowid)`` scaled by 2^-32. Pure function of the row id —
    partitioning-independent, re-run stable, and bit-identical to the
    DuckDB twin :func:`sql_uniform` (verified by the hash-checked
    generated-star probes below)."""
    h = F.md5(F.concat(F.lit(f"{seed}-"), F.col(id_col).cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") / F.lit(4294967296.0)


def sql_uniform(seed: int, id_expr: str = "id") -> str:
    """DuckDB twin of :func:`hash_uniform` (md5 and IEEE division agree
    bit-for-bit across the engines)."""
    return (
        f"(('0x' || substr(md5('{seed}-' || CAST({id_expr} AS VARCHAR)), 1, 8))::UINTEGER"
        " / 4294967296.0)"
    )


def _with_draws(df: DataFrame, seeds: dict[str, int]) -> DataFrame:
    """Materialize every uniform draw as a named column (one projection).
    Historical note: the first implementation used ``F.rand(seed)``,
    whose stream advances per evaluated row per partition — results
    silently changed with partitioning and with WHICH branch evaluated
    a draw. The counter-based generator has no such stream state."""
    return df.select("*", *[hash_uniform(s).alias(name) for name, s in seeds.items()])


def gen_dim_customer(spark: SparkSession, n: int = 1000) -> DataFrame:
    """dim_customer (FIXTURES §A): seeded segment/status mixes, signup
    date ids as day offsets (generate_dim_cust_data.py:77-82)."""
    r = _with_draws(
        spark.range(0, n, 1, _N_PARTITIONS),
        {"_u_signup": _SEED, "_u_status": _SEED + 1, "_u_segment": _SEED + 2},
    )
    idx = F.col("id")
    return r.select(
        (F.lit(CUSTOMER_ID_BASE) + idx).alias("customer_id"),
        F.concat(F.lit("first_"), idx.cast("string")).alias("first_name"),
        F.concat(F.lit("last_"), idx.cast("string")).alias("last_name"),
        F.concat(
            F.lit("first_"), idx.cast("string"), F.lit(".last_"), idx.cast("string"),
            F.lit("@example.com"),
        ).alias("email"),
        F.lpad((idx % 10_000_000_000).cast("string"), 10, "9").alias("phone"),
        F.date_add(F.lit("1955-01-01").cast("date"), (idx % 19000).cast("int")).alias(
            "date_of_birth"
        ),
        F.floor(F.col("_u_signup") * 729 + 1).cast("bigint").alias("signup_date_id"),
        weighted_choice(F.col("_u_status"), _STATUS_CUM).alias("customer_status"),
        weighted_choice(F.col("_u_segment"), _SEGMENT_CUM).alias("customer_segment"),
        F.concat(F.lit("addr1_"), idx.cast("string")).alias("address_line_1"),
        F.lit(None).cast("string").alias("address_line_2"),
        F.concat(F.lit("city_"), (idx % 50).cast("string")).alias("city"),
        F.concat(F.lit("state_"), (idx % 28).cast("string")).alias("state"),
        F.lpad((100000 + idx % 899999).cast("string"), 6, "0").alias("pincode"),
    )


def gen_dim_account(spark: SparkSession, n_customers: int = 1000, accounts_per: int = 2) -> DataFrame:
    """dim_account: FK to customer, open/close day-offset ids with
    close > open only for Closed accounts
    (generate_dim_account_data.py:142-173)."""
    n = n_customers * accounts_per
    r = _with_draws(
        spark.range(0, n, 1, _N_PARTITIONS),
        {"_u_open": _SEED + 3, "_u_status": _SEED + 4, "_u_type": _SEED + 5,
         "_u_close": _SEED + 6},
    )
    idx = F.col("id")
    open_id = F.floor(F.col("_u_open") * 700 + 1).cast("bigint")
    status = weighted_choice(
        F.col("_u_status"), [("Open", 0.85), ("Closed", 0.95), ("Suspended", 1.0)]
    )
    return r.select(
        (F.lit(ACCOUNT_ID_BASE) + idx).alias("account_id"),
        (F.lit(CUSTOMER_ID_BASE) + idx % n_customers).alias("customer_id"),
        weighted_choice(
            F.col("_u_type"),
            [("Savings Account", 0.5), ("Basic Credit Card", 0.8),
             ("Business Credit Card", 0.9), ("Private Banking Account", 1.0)],
        ).alias("account_type"),
        open_id.alias("open_date_id"),
        F.when(
            status == "Closed",
            open_id + F.floor(F.col("_u_close") * 100 + 1).cast("bigint"),
        ).alias("close_date_id"),
        status.alias("account_status"),
    )


def gen_fact_transactions(spark: SparkSession, n: int = 100_000) -> DataFrame:
    """fact_transactions (FIXTURES §A): one seeded codegen'd projection —
    weighted channel mix, banded amounts, 20/80 risk-score band
    (generate_fact_transactions_data.py:119-199), deterministic
    surrogate ids, day-offset datetimes rendered as ISO strings."""
    r = _with_draws(
        spark.range(0, n, 1, _N_PARTITIONS),
        {"_u_chan": _SEED + 7, "_u_rec": _SEED + 8, "_u_big": _SEED + 9,
         "_u_amt": _SEED + 10, "_u_tax": _SEED + 11, "_u_hasdisc": _SEED + 12,
         "_u_disc": _SEED + 13, "_u_band": _SEED + 14, "_u_risk": _SEED + 15,
         "_u_date": _SEED + 16, "_u_prov": _SEED + 17},
    )
    idx = F.col("id")
    channel = weighted_choice(F.col("_u_chan"), _CHANNEL_CUM)
    is_recurring = F.col("_u_rec") < 0.2  # P_RECURRING, :87
    channel = F.when(is_recurring, "Online Payment Gateway").otherwise(channel)  # :115
    amount = dround(
        F.when(F.col("_u_big") < 0.1, F.col("_u_amt") * 40000 + 10000)
        .otherwise(F.col("_u_amt") * 4950 + 50),
        2,
    )
    tax = dround(amount * F.col("_u_tax") * 0.18, 2)
    discount = dround(
        F.when(F.col("_u_hasdisc") < 0.1, amount * F.col("_u_disc") * 0.10).otherwise(0.0), 2
    )
    risk = dround(
        F.when(F.col("_u_band") < 0.2, F.col("_u_risk") * 0.4 + 0.6)
        .otherwise(F.col("_u_risk") * 0.6),
        2,
    )  # :196-199 — high-risk ⇔ ≥ 0.6
    txn_date = date_from_id(F.floor(F.col("_u_date") * 730).cast("int"))
    card_channel = channel.isin("POS", "Online Payment Gateway")
    pan = F.rpad(F.concat(F.lit("4"), (idx % 10**9).cast("string")), 16, "7")
    return r.select(
        surrogate_id("txn", idx).alias("transaction_id"),
        (F.lit(CUSTOMER_ID_BASE) + idx % 1000).alias("customer_id"),
        (F.lit(ACCOUNT_ID_BASE) + idx % 2000).alias("account_id"),
        (idx % 38 + 1).alias("merchant_id"),
        (idx % 19 + 1).alias("merchant_category_code_id"),
        is_recurring.alias("is_recurring"),
        F.concat(
            F.date_format(txn_date, "yyyy-MM-dd"),
            F.lit("T"),
            F.lpad((idx % 24).cast("string"), 2, "0"),
            F.lit(":00:00"),
        ).alias("transaction_datetime"),
        amount.alias("amount"),
        tax.alias("tax_amount"),
        discount.alias("discount_amount"),
        dround(amount + tax - discount, 2).alias("total_amount"),
        channel.alias("transaction_channel"),
        F.when(card_channel, F.concat(F.substring(pan, 1, 6), F.lit("******"),
                                      F.substring(pan, -4, 4))).alias("masked_card_number"),
        F.when(card_channel, surrogate_id("tok", idx, 16)).alias("card_token"),
        F.when(card_channel, F.substring(pan, 1, 6)).alias("card_bin"),
        F.when(card_channel, weighted_choice(
            F.col("_u_prov"), [("VISA", 0.5), ("Mastercard", 0.85), ("RuPay", 1.0)]
        )).alias("card_provider"),
        F.when(card_channel, F.concat(F.lit("holder_"), idx.cast("string"))).alias(
            "cardholder_name"
        ),
        F.when(card_channel, F.concat(
            F.lpad((idx % 12 + 1).cast("string"), 2, "0"), F.lit("/2"),
            (F.lit(6) + idx % 4).cast("string"),
        )).alias("card_expiry_date"),
        F.when(card_channel, (idx % 10 + 1)).alias("payment_gateway_id"),
        F.when(channel == "POS", F.lit(7)).otherwise((idx % 6 + 1)).alias("device_type_id"),
        F.concat_ws(".", (idx % 223 + 1).cast("string"), (idx % 256).cast("string"),
                    ((idx * 7) % 256).cast("string"), ((idx * 13) % 256).cast("string")).alias(
            "ip_address"
        ),
        risk.alias("risk_score"),
    )


def gen_date_dim(spark: SparkSession, n_days: int = 731) -> DataFrame:
    """date_dim (README.md:48): day-offset surrogate key + calendar
    attributes (F10) — pure arithmetic, no randomness."""
    r = spark.range(0, n_days, 1, _N_PARTITIONS)
    d = date_from_id(F.col("id").cast("int"))
    return r.select(
        F.col("id").cast("int").alias("date_id"),
        d.alias("date"),
        F.year(d).alias("year"),
        F.quarter(d).alias("quarter"),
        F.month(d).alias("month"),
        F.dayofmonth(d).alias("day"),
        F.dayofweek(d).alias("day_of_week"),
    )


def gen_time_dim(spark: SparkSession) -> DataFrame:
    """time_dim (README.md:49): one row per second of day with AM/PM
    period."""
    r = spark.range(0, 86400, 1, _N_PARTITIONS)
    sec = F.col("id").cast("int")
    ts = F.timestamp_seconds(F.col("id"))
    return r.select(
        sec.alias("time_id"),
        (sec / 3600).cast("int").alias("hour"),
        ((sec % 3600) / 60).cast("int").alias("minute"),
        (sec % 60).alias("second"),
        period_am_pm(ts).alias("period"),
    )


STATIC_CHANNELS = [(i + 1, name) for i, name in enumerate(CHANNELS)]


def gen_dim_transaction_channel(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        STATIC_CHANNELS, "transaction_channel_id INT, transaction_channel_name STRING"
    )


def write_star_schema(spark: SparkSession, out_root: str, n_fact: int = 100_000) -> None:
    """Materialize the full FIXTURES §A star schema. The fact table is
    partitioned by transaction date so L1 date slicers partition-prune
    (§4's 100 TB physical design)."""
    gen_dim_customer(spark).write.mode("overwrite").parquet(f"{out_root}/dim_customer")
    gen_dim_account(spark).write.mode("overwrite").parquet(f"{out_root}/dim_account")
    gen_date_dim(spark).write.mode("overwrite").parquet(f"{out_root}/date_dim")
    gen_time_dim(spark).write.mode("overwrite").parquet(f"{out_root}/time_dim")
    gen_dim_transaction_channel(spark).write.mode("overwrite").parquet(
        f"{out_root}/dim_transaction_channel"
    )
    fact = gen_fact_transactions(spark, n_fact).withColumn(
        "transaction_date", F.to_date(F.substring("transaction_datetime", 1, 10))
    )
    fact.write.mode("overwrite").partitionBy("transaction_date").parquet(
        f"{out_root}/fact_transactions"
    )


# ---------------------------------------------------------------------------
# Probes
# ---------------------------------------------------------------------------


@probe(
    "f10b_date_dim_build",
    oracle=f"""
    SELECT CAST(range AS INTEGER) AS date_id,
           strftime(DATE '{BASE_DATE}' + CAST(range AS INTEGER), '%Y-%m-%d') AS date,
           CAST(year(DATE '{BASE_DATE}' + CAST(range AS INTEGER)) AS INTEGER) AS year,
           CAST(quarter(DATE '{BASE_DATE}' + CAST(range AS INTEGER)) AS INTEGER) AS quarter,
           CAST(month(DATE '{BASE_DATE}' + CAST(range AS INTEGER)) AS INTEGER) AS month,
           CAST(dayofmonth(DATE '{BASE_DATE}' + CAST(range AS INTEGER)) AS INTEGER) AS day,
           CAST(dayofweek(DATE '{BASE_DATE}' + CAST(range AS INTEGER)) + 1 AS INTEGER) AS day_of_week
    FROM range(0, 731)
    """,
)
def f10b_date_dim_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated date_dim vs DuckDB's calendar arithmetic — day-offset
    surrogate keys and every calendar attribute (F9+F10 composed).
    DuckDB's dayofweek is 0-based Sunday, Spark's 1-based: oracle adds 1.
    The date renders as yyyy-MM-dd text on both sides (pandas would
    otherwise surface DuckDB DATEs as midnight timestamps)."""
    return gen_date_dim(spark).withColumn("date", F.date_format("date", "yyyy-MM-dd"))


@probe(
    "f14_surrogate_ids",
    oracle="""
    SELECT substring(sha256('txn' || CAST(range AS VARCHAR)), 1, 20) AS transaction_id,
           CAST(range AS BIGINT) AS row_id
    FROM range(0, 1000)
    """,
)
def f14_surrogate_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14 — id generation. The deterministic sha2-truncation twin of
    ``uuid.uuid4().hex[:20]`` is oracle-checked (sha256 is identical in
    both engines); collision-freedom is asserted in tests."""
    r = spark.range(0, 1000, 1, _N_PARTITIONS)
    return r.select(
        surrogate_id("txn", F.col("id")).alias("transaction_id"),
        F.col("id").alias("row_id"),
    )


#: Shared SQL twin of the fact generator's money/risk columns (the
#: CTE bodies the generated-star oracles compose; seeds 49-58 =
#: _SEED + 7.._SEED + 16, the _with_draws map in gen_fact_transactions).
def _sql_fact(n: int) -> str:
    u = sql_uniform
    return f"""
      draws AS (
        SELECT range AS id,
               {u(49)} AS u_chan, {u(50)} AS u_rec, {u(51)} AS u_big,
               {u(52)} AS u_amt, {u(53)} AS u_tax, {u(54)} AS u_hasdisc,
               {u(55)} AS u_disc, {u(56)} AS u_band, {u(57)} AS u_risk,
               {u(58)} AS u_date
        FROM range(0, {n})),
      amt AS (
        SELECT *,
               round(CASE WHEN u_big < 0.1 THEN u_amt * 40000 + 10000
                          ELSE u_amt * 4950 + 50 END, 2) AS amount
        FROM draws),
      fact AS (
        SELECT id, u_rec < 0.2 AS is_recurring, amount,
               CASE WHEN u_rec < 0.2 THEN 'Online Payment Gateway'
                    WHEN u_chan < 0.37 THEN 'Online Payment Gateway'
                    WHEN u_chan < 0.64 THEN 'UPI'
                    WHEN u_chan < 0.91 THEN 'POS'
                    ELSE 'Net Banking' END AS transaction_channel,
               round(amount * u_tax * 0.18, 2) AS tax_amount,
               round(CASE WHEN u_hasdisc < 0.1 THEN amount * u_disc * 0.10
                          ELSE 0.0 END, 2) AS discount_amount,
               round(CASE WHEN u_band < 0.2 THEN u_risk * 0.4 + 0.6
                          ELSE u_risk * 0.6 END, 2) AS risk_score,
               strftime(DATE '2023-01-01' + CAST(floor(u_date * 730) AS INTEGER), '%Y-%m-%d')
                 || 'T' || lpad(CAST(id % 24 AS VARCHAR), 2, '0') || ':00:00'
                 AS transaction_datetime
        FROM amt),
      fact2 AS (
        SELECT *, round(amount + tax_amount - discount_amount, 2) AS total_amount
        FROM fact)
"""


@probe(
    "f8_f13_generator_mix",
    oracle=f"""
    WITH {_sql_fact(20_000)}
    SELECT transaction_channel, CAST(count(*) AS BIGINT) AS n,
           strftime(now(), '%Y') AS generated_year
    FROM fact2 GROUP BY 1
    """,
)
def f8_f13_generator_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 + F13 — weighted-random generation: the channel mix from one
    uniform draw + chained when, stamped with processing time (F8).
    Hash-checked: the counter-based md5 uniforms reproduce exactly in
    DuckDB, so the oracle re-derives the same mix (ratios vs declared
    weights are additionally asserted in tests/test_datagen.py)."""
    fact = gen_fact_transactions(spark, 20_000)
    return fact.groupBy("transaction_channel").agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.date_format(F.current_timestamp(), "yyyy")).alias("generated_year"),
    )


@probe(
    "a8b_generated_dashboard_charts",
    oracle=f"""
    WITH {_sql_fact(50_000)}
    SELECT 'state_' || CAST((id % 1000) % 28 AS VARCHAR) AS state,
           CAST(count(*) AS BIGINT) AS volume,
           round(sum(total_amount), 2) AS revenue,
           round(avg(risk_score), 4) AS avg_risk
    FROM fact2
    WHERE transaction_datetime >= '2023-04-01'
      AND transaction_datetime < '2024-10-01'
      AND transaction_channel IN ('POS', 'UPI', 'Online Payment Gateway')
    GROUP BY 1
    """,
)
def a8b_generated_dashboard_charts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's dashboard chart suite on its OWN star schema
    (README.md:91-97): avg risk by state + revenue/volume by state
    (A8/A9), over a date slicer (L1) and channel slicer (L2), fact
    broadcast-joined to the generated dim_customer (J1). Hash-checked:
    the oracle re-derives the fact columns from the counter-based
    uniforms and the joined state from the dim's deterministic
    ``state_(idx % 28)`` layout."""
    fact = gen_fact_transactions(spark, 50_000)
    cust = gen_dim_customer(spark)
    sliced = fact.filter(
        (F.col("transaction_datetime") >= "2023-04-01")
        & (F.col("transaction_datetime") < "2024-10-01")  # L1
        & F.col("transaction_channel").isin("POS", "UPI", "Online Payment Gateway")  # L2
    )
    return (
        sliced.join(F.broadcast(cust), "customer_id")
        .groupBy("state")
        .agg(
            F.count(F.lit(1)).alias("volume"),
            dround(F.sum("total_amount"), 2).alias("revenue"),
            dround(F.avg("risk_score"), 4).alias("avg_risk"),
        )
    )


@probe(
    "a1_a6_generated_star",
    oracle=f"""
    WITH {_sql_fact(50_000)}
    SELECT CAST(count(*) AS BIGINT) AS total_txns,
           round(sum(total_amount), 2) AS total_revenue,
           round(avg(amount), 2) AS avg_txn_amount,
           round(avg(CASE WHEN is_recurring THEN 1.0 ELSE 0.0 END), 4) AS recurring_pct,
           CAST(count(CASE WHEN risk_score >= 0.6 THEN 1 END) AS BIGINT) AS high_risk_txns,
           round(avg(risk_score), 4) AS avg_risk_score
    FROM fact2
    """,
)
def a1_a6_generated_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dashboard stat-card suite (A1-A6) over the *generated*
    reference-schema fact table — proves the engine answers the
    reference's own dashboard queries on its own schema, not just the
    TPC-H proxies. Hash-checked end-to-end: generator AND aggregate are
    re-derived in DuckDB from the counter-based uniforms; invariants
    (recurring ≈ 20%, high-risk ≈ 20%, total = amount+tax-disc) are
    additionally asserted in tests/test_datagen.py."""
    fact = gen_fact_transactions(spark, 50_000)
    return fact.agg(
        F.count(F.lit(1)).alias("total_txns"),
        dround(F.sum("total_amount"), 2).alias("total_revenue"),
        dround(F.avg("amount"), 2).alias("avg_txn_amount"),
        dround(F.avg(F.col("is_recurring").cast("double")), 4).alias("recurring_pct"),
        F.count(F.when(F.col("risk_score") >= 0.6, 1)).alias("high_risk_txns"),
        dround(F.avg("risk_score"), 4).alias("avg_risk_score"),
    )
