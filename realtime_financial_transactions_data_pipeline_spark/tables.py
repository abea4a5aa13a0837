"""Loaders for the driver-provided TPC-H-ish probe tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under an ``sf*`` dir.
At cluster scale these would be partitioned datasets; the loader is
path-shaped so swapping in a partitioned root is transparent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Dimension-sized tables that should broadcast in star joins. ``customer``
#: is ~150k rows at sf1 (a few MB) — well under the 64 MB broadcast
#: threshold; at 100 TB fact scale these dims stay small, which is the
#: whole point of a star schema.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier", "part", "customer"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown test table {name!r}; expected one of {TABLE_NAMES}")
    # Calendar extraction / date truncation is session-tz-dependent in
    # Spark but tz-naive in the DuckDB oracle — pin UTC no matter what
    # session the caller hands us, so results are deterministic.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet has shipped with two physical schemas for ``ts``:
    TIMESTAMP(NANOS) (which Spark's parquet reader rejects by default —
    read nanos as raw int64 via the legacy conf and truncate to micros,
    matching DuckDB) and plain TIMESTAMP(MICROS) (read directly). Detect
    which one this file is and normalize to the same logical shape either
    way: a microsecond ``ts`` plus a bigint ``ts_ns`` for callers that
    need full-resolution ordering."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = raw.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        ts = F.timestamp_micros(F.expr("ts div 1000"))
        ts_ns = F.col("ts")
    elif isinstance(ts_type, (TimestampType, TimestampNTZType)):
        ts = F.col("ts").cast(TimestampType())
        ts_ns = (F.unix_micros(F.col("ts").cast(TimestampType())) * F.lit(1000)).cast(LongType())
    else:  # pragma: no cover - future schema drift should fail loudly
        raise TypeError(f"unsupported events.ts physical type: {ts_type}")
    return raw.select(
        "event_id",
        ts.alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
        ts_ns.alias("ts_ns"),
    )


def widen_scan(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition an UNDER-partitioned input to the
    session's parallelism before a heavy per-row compute pass
    (shingling, PRF signatures, hyperplane dots, media decode) — the
    guide-§2.5 fix for unsplittable small inputs: each sf testdata
    table is ONE single-row-group parquet file, so its scan is one
    task and any map-heavy pass over it runs serial no matter how many
    cores the session has (r18; the reason compute-bound probes showed
    ≈1.0 low/high-core scaling). No-op when the input already has >=
    target partitions — at corpus scale a table scan is thousands of
    splits, so this never inserts a shuffle there; the cost is bounded
    by probe-scale inputs (one exchange of the small file's rows).
    Deterministic under retry: round-robin repartition sorts within
    input partitions first (spark.sql.execution.sortBeforeRepartition,
    on by default). Results are unaffected — consumers are per-row
    transforms and key-based aggregations/joins, never
    partition-id-dependent."""
    target = target or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view (for the SQL API path)."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
