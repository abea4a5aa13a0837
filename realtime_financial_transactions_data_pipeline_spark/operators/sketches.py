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
