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
    """events.parquet carries TIMESTAMP(NANOS) which Spark's parquet
    reader rejects by default. Read nanos as raw int64 (legacy conf) and
    derive a microsecond timestamp — the same truncation DuckDB applies
    when it reads the file — plus keep the raw nanos as ``ts_ns`` for
    callers that need full-resolution ordering."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    return raw.select(
        "event_id",
        F.timestamp_micros(F.expr("ts div 1000")).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
        F.col("ts").alias("ts_ns"),
    )


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view (for the SQL API path)."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
