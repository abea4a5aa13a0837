"""Single-pass table profiling — the `ANALYZE TABLE` / dbt-test /
data-catalog statistics sweep: per-column non-null counts, exact
distinct cardinality, and min/max, computed for EVERY column in one
scan of the table.

Plan shape: one `agg` carrying all columns' statistics (Spark plans the
multiple exact count-distincts via a single Expand + two aggregate
levels — still exactly one pass over the data), then the 1-row result
pivots to long form through an `explode` of a literal struct array —
driver-side cost is zero, the explode runs on a single row.

At 100 TB the same plan holds: the scan dominates, every statistic is
partial-aggregable (count/min/max map-side combine; the Expand
multiplies rows by the number of distinct-aggregated columns before
the shuffle, the documented cost of EXACT cardinality — swap
`approx_count_distinct` to drop the Expand when ±2 % suffices).
Numeric min/max travel as DOUBLE and text/date min/max as STRING in
separate columns, so no engine-specific double→string formatting ever
enters the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_financial_transactions_data_pipeline_spark.registry import probe
from realtime_financial_transactions_data_pipeline_spark.tables import load_table


def profile_table(
    df: DataFrame, num_cols: list[str], str_cols: list[str], date_cols: list[str]
) -> DataFrame:
    """Long-format profile: one row per column with
    (col_name, n_nonnull, n_distinct, min_num, max_num, min_str,
    max_str). Dates report through the string channel as yyyy-MM-dd."""
    aggs, rows = [], []
    for c in num_cols:
        aggs += [
            F.count(c).alias(f"nn_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            F.min(c).cast("double").alias(f"mn_{c}"),
            F.max(c).cast("double").alias(f"mx_{c}"),
        ]
    for c in str_cols:
        aggs += [
            F.count(c).alias(f"nn_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            F.min(c).alias(f"mn_{c}"),
            F.max(c).alias(f"mx_{c}"),
        ]
    for c in date_cols:
        aggs += [
            F.count(c).alias(f"nn_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            F.date_format(F.min(c).cast("date"), "yyyy-MM-dd").alias(f"mn_{c}"),
            F.date_format(F.max(c).cast("date"), "yyyy-MM-dd").alias(f"mx_{c}"),
        ]
    onerow = df.agg(*aggs)
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    for c in num_cols:
        rows.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"nn_{c}").alias("n_nonnull"),
                F.col(f"nd_{c}").alias("n_distinct"),
                F.col(f"mn_{c}").alias("min_num"),
                F.col(f"mx_{c}").alias("max_num"),
                null_s.alias("min_str"),
                null_s.alias("max_str"),
            )
        )
    for c in str_cols + date_cols:
        rows.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"nn_{c}").alias("n_nonnull"),
                F.col(f"nd_{c}").alias("n_distinct"),
                null_d.alias("min_num"),
                null_d.alias("max_num"),
                F.col(f"mn_{c}").alias("min_str"),
                F.col(f"mx_{c}").alias("max_str"),
            )
        )
    return onerow.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


def _profile_oracle_block(col: str, kind: str) -> str:
    nn = f"CAST(count({col}) AS BIGINT) AS n_nonnull"
    nd = f"CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct"
    if kind == "num":
        vals = (
            f"CAST(min({col}) AS DOUBLE) AS min_num, "
            f"CAST(max({col}) AS DOUBLE) AS max_num, "
            "CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str"
        )
    elif kind == "str":
        vals = (
            "CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num, "
            f"min({col}) AS min_str, max({col}) AS max_str"
        )
    else:  # date
        vals = (
            "CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num, "
            f"CAST(CAST(min({col}) AS DATE) AS VARCHAR) AS min_str, "
            f"CAST(CAST(max({col}) AS DATE) AS VARCHAR) AS max_str"
        )
    return f"SELECT '{col}' AS col_name, {nn}, {nd}, {vals} FROM orders"


_PROFILE_COLS = [
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_totalprice", "num"),
    ("o_orderstatus", "str"),
    ("o_orderpriority", "str"),
    ("o_orderdate", "date"),
]


@probe(
    "prof1_table_profile",
    oracle="\nUNION ALL\n".join(
        _profile_oracle_block(c, k) for c, k in _PROFILE_COLS
    ),
)
def prof1_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile every column of `orders` in one scan: non-null count,
    exact distinct cardinality, min/max. The DuckDB oracle computes
    the same statistics as a UNION ALL of per-column aggregates —
    six passes there, ONE here, same values."""
    o = load_table(spark, sf_dir, "orders")
    return profile_table(
        o,
        num_cols=[c for c, k in _PROFILE_COLS if k == "num"],
        str_cols=[c for c, k in _PROFILE_COLS if k == "str"],
        date_cols=[c for c, k in _PROFILE_COLS if k == "date"],
    )


def skew_profile(df: DataFrame, key: str) -> DataFrame:
    """Key-distribution skew diagnostics for one join/agg key: distinct
    key count, max single-key share of all rows, and the frequency at
    selected quantiles — the numbers that decide between a plain
    shuffle join, AQE skew splitting, and explicit salting. Two small
    aggregates over the per-key count table; the per-key table itself
    is the only real shuffle."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    return counts.agg(
        F.lit(key).alias("key_col"),
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_key_rows"),
        F.expr("percentile(n, 0.5)").cast("double").alias("p50_key_rows"),
        F.expr("percentile(n, 0.99)").cast("double").alias("p99_key_rows"),
    ).select(
        "key_col",
        "n_keys",
        "n_rows",
        "max_key_rows",
        (F.col("max_key_rows") / F.col("n_rows")).alias("max_share"),
        "p50_key_rows",
        "p99_key_rows",
    )


@probe(
    "prof2_skew_profile",
    oracle="""
    WITH ec AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
    lc AS (SELECT l_orderkey, count(*) AS n FROM lineitem GROUP BY l_orderkey)
    SELECT 'user_id' AS key_col,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(max(n) AS BIGINT) AS max_key_rows,
           max(n) / CAST(sum(n) AS DOUBLE) AS max_share,
           quantile_cont(n, 0.5) AS p50_key_rows,
           quantile_cont(n, 0.99) AS p99_key_rows
    FROM ec
    UNION ALL
    SELECT 'l_orderkey',
           CAST(count(*) AS BIGINT),
           CAST(sum(n) AS BIGINT),
           CAST(max(n) AS BIGINT),
           max(n) / CAST(sum(n) AS DOUBLE),
           quantile_cont(n, 0.5),
           quantile_cont(n, 0.99)
    FROM lc
    """,
)
def prof2_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew diagnostics for the two hottest shuffle keys in the
    workload (events.user_id, lineitem.l_orderkey): distinct keys, max
    single-key share, median/p99 per-key frequency. exact percentile
    here; `percentile_approx` at 100 TB (same plan shape)."""
    e = load_table(spark, sf_dir, "events")
    l = load_table(spark, sf_dir, "lineitem")
    return skew_profile(e, "user_id").unionByName(
        skew_profile(l, "l_orderkey")
    )


# ---------------------------------------------------------------------------
# prof3 — frequent-values profile: the third profiler panel next to
# prof1's column stats and prof2's skew diagnostics — per categorical
# column, the top-3 most frequent values with counts and corpus share
# (what Deequ/Great-Expectations-style profilers print per column, and
# the first thing a data engineer reads before choosing partition or
# dictionary-encoding keys). ONE scan: the three profiled columns
# unpivot through a posexploded struct array (scan-level, codegen),
# counts partial-aggregate on (column, value) — cardinality bounded by
# Σ per-column distincts, never row count — and the per-column top-3 is
# a column-name-PARTITIONED rank (WindowGroupLimit pushes the k=3 heap
# below the sort; never a global window).
# ---------------------------------------------------------------------------

_PROF3_TOPK = 3


@probe(
    "prof3_frequent_values",
    oracle=f"""
    WITH uv AS (
      SELECT 'o_orderstatus' AS col_name, o_orderstatus AS value
      FROM orders
      UNION ALL
      SELECT 'o_orderpriority', o_orderpriority FROM orders
      UNION ALL
      SELECT 'order_year', CAST(year(CAST(o_orderdate AS DATE)) AS VARCHAR)
      FROM orders),
    c AS (SELECT col_name, value, count(*) AS n FROM uv GROUP BY 1, 2),
    t AS (SELECT count(*) AS total FROM orders),
    r AS (SELECT col_name, value, n,
                 row_number() OVER (PARTITION BY col_name
                                    ORDER BY n DESC, value) AS rnk
          FROM c)
    SELECT col_name, value, CAST(n AS BIGINT) AS n,
           CAST(rnk AS INT) AS rnk,
           round(n / CAST(t.total AS DOUBLE), 6) AS share
    FROM r, t WHERE rnk <= {_PROF3_TOPK}
    """,
)
def prof3_frequent_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """prof3 — top-{_PROF3_TOPK} frequent values per profiled column of
    `orders` (block comment above): one unpivoting scan, one bounded
    (column, value) aggregate, a per-column WindowGroupLimit top-k, and
    the share against the row total. The oracle replays the unpivot,
    counts, ranks, and shares."""
    from realtime_financial_transactions_data_pipeline_spark.functions.compat import dround
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    total = o.count()  # one bounded scalar; reused as a literal
    uv = o.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("o_orderstatus").alias("col_name"),
                    F.col("o_orderstatus").alias("value"),
                ),
                F.struct(
                    F.lit("o_orderpriority").alias("col_name"),
                    F.col("o_orderpriority").alias("value"),
                ),
                F.struct(
                    F.lit("order_year").alias("col_name"),
                    F.year(F.to_date("o_orderdate")).cast("string").alias(
                        "value"
                    ),
                ),
            )
        ).alias("e")
    ).select("e.col_name", "e.value")
    c = uv.groupBy("col_name", "value").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("col_name").orderBy(F.col("n").desc(), "value")
    return (
        c.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _PROF3_TOPK)
        .select(
            "col_name",
            "value",
            "n",
            F.col("rnk").cast("int").alias("rnk"),
            dround(F.col("n") / F.lit(float(total)), 6).alias("share"),
        )
    )
