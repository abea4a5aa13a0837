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
