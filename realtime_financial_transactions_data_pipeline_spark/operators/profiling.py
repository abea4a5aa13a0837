"""Single-pass table profiling — the `ANALYZE TABLE` / dbt-test /
data-catalog statistics sweep: per-column non-null counts, exact
distinct cardinality, and min/max, computed for EVERY column in one
scan of the table.

Plan shape: the table explodes to long (col_name, value) form — ONE
scan, rows × columns generated rows, the same multiplication Spark's
own multi-count-distinct Expand pays — then aggregates in two hash
levels (per-value counts, then per-column statistics over the distinct
values; see `profile_table`'s docstring for why this beats the single
wide agg the module shipped through r16).

At 100 TB the same plan holds: the scan dominates, every statistic is
partial-aggregable (counts and min/max map-side combine; the row
multiplication before the first shuffle is the documented cost of
EXACT cardinality — swap `approx_count_distinct` in a plain one-level
agg to drop it when ±2 % suffices). Numeric min/max travel as DOUBLE
and text/date min/max as STRING in separate columns, so no
engine-specific double→string formatting ever enters the hash.
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
    max_str). Dates report through the string channel as yyyy-MM-dd.

    Plan shape (r17 optimization, guide §5 "hash aggregate vs sort
    aggregate"): the previous form ran ONE wide agg mixing exact
    count-distincts with string min/max — string-buffered DeclarativeAggregates
    disqualify HashAggregate, so Spark SORTED the whole Expand output
    (columns × rows) by a 7-part key before aggregating (measured
    4.8 s min at sf0.1). This form explodes to long format itself
    (still exactly one scan) and aggregates in two levels: level 1
    groups by (col_name, value) — plain count, string KEYS are
    hash-friendly — and level 2 reduces only the DISTINCT VALUES per
    column, so the unavoidable string-min/max sort aggregate runs over
    |distinct| rows instead of columns × |rows| (measured 2.0 s min;
    SortAggregate over the full table -> HashAggregate).

    Value equivalences with the old one-agg form, kept deliberately:
    n_distinct over distinct nonnull values ≡ countDistinct;
    sum-of-group-counts ≡ count (coalesced to 0 for an all-null
    column, which count() reported as 0); numeric min/max cast before
    vs after reduction agree within double's 2^53 integer range (table
    keys sit far inside it); ISO yyyy-MM-dd min/max is lexicographic ≡
    chronological."""
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    rows = []
    for c in num_cols:
        rows.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(c).cast("double").alias("vn"),
                null_s.alias("vs"),
            )
        )
    for c in str_cols:
        rows.append(
            F.struct(
                F.lit(c).alias("col_name"),
                null_d.alias("vn"),
                F.col(c).alias("vs"),
            )
        )
    for c in date_cols:
        rows.append(
            F.struct(
                F.lit(c).alias("col_name"),
                null_d.alias("vn"),
                F.date_format(F.col(c).cast("date"), "yyyy-MM-dd").alias("vs"),
            )
        )
    long = df.select(F.explode(F.array(*rows)).alias("p")).select("p.*")
    lvl1 = long.groupBy("col_name", "vn", "vs").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    nonnull = F.col("vn").isNotNull() | F.col("vs").isNotNull()
    return lvl1.groupBy("col_name").agg(
        F.coalesce(
            F.sum(F.when(nonnull, F.col("cnt"))), F.lit(0).cast("long")
        ).alias("n_nonnull"),
        F.count(F.when(nonnull, F.lit(1))).alias("n_distinct"),
        F.min("vn").alias("min_num"),
        F.max("vn").alias("max_num"),
        F.min("vs").alias("min_str"),
        F.max("vs").alias("max_str"),
    )


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
