"""Stream-stream time-bounded join (extension beyond the reference's
stream-static lookups, J2/J3 — the capability a scaled deployment adds
when BOTH sides are unbounded, e.g. attributing a purchase stream to a
click stream).

Semantics: inner equi-join on the key plus an event-time range bound
(`purchase.ts ∈ [click.ts, click.ts + horizon]`). With watermarks on
both sides, Spark keeps only rows inside the join horizon in the state
store and evicts them as the watermark passes — state is
O(rows in horizon), not O(stream length), which is what makes a
stream-stream join runnable forever on an unbounded feed. On batch
DataFrames the identical expression computes the identical result, so
the probe below is hash-checked against a DuckDB range-join oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_financial_transactions_data_pipeline_spark.functions.compat import dround
from realtime_financial_transactions_data_pipeline_spark.registry import probe
from realtime_financial_transactions_data_pipeline_spark.tables import load_table


def stream_stream_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    horizon: str = "1 hour",
    streaming: bool = True,
    watermark: str = "2 hours",
) -> DataFrame:
    """Attribute each purchase to every click by the same key within
    ``horizon`` before it. The range bound is part of the join
    condition — in streaming mode that (plus the watermarks) is what
    lets Spark age out join state."""
    c = clicks.withWatermark(ts_col, watermark) if streaming else clicks
    p = purchases.withWatermark(ts_col, watermark) if streaming else purchases
    c = c.select(
        F.col(key).alias("c_key"),
        F.col("event_id").alias("click_id"),
        F.col(ts_col).alias("click_ts"),
    )
    p = p.select(
        F.col(key).alias("p_key"),
        F.col("event_id").alias("purchase_id"),
        F.col(ts_col).alias("purchase_ts"),
    )
    return c.join(
        p,
        (F.col("c_key") == F.col("p_key"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")),
        "inner",
    ).select(
        F.col("c_key").alias("user_id"),
        "click_id",
        "purchase_id",
        dround(
            (F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts")) / 60.0, 2
        ).alias("mins_to_purchase"),
    )


@probe(
    "t7_stream_stream_join",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           round(epoch(date_trunc('second', p.ts) - date_trunc('second', c.ts)) / 60.0, 2)
             AS mins_to_purchase
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)
def t7_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream attribution join (identical
    expression; streaming state-eviction semantics are unit-tested in
    tests/test_stream_joins.py). The oracle is the same range join in
    DuckDB; both sides truncate ts to seconds for the delay arithmetic
    (unix_timestamp's granularity)."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click")
    purchases = e.filter(F.col("event_type") == "purchase")
    return stream_stream_attribution(clicks, purchases, streaming=False)
