"""K8 — streaming CDC merge sink: ``foreachBatch`` latest-wins upsert
into a pointer-managed snapshot table.

This is the lakehouse ingestion pattern the reference's BigQuery
streaming inserts approximate (reference `dataflow_pipeline/
pipeline.py:180-200` appends; BigQuery dedupes by insertId best-effort):
a CDC stream lands in micro-batches, each batch MERGEs into the current
snapshot (update-or-insert per key, delete on tombstone), and readers
always see a complete consistent generation via the atomic ``CURRENT``
pointer flip (operators/scale.py's crash-safe protocol).

Correctness under arbitrary batch splits: the snapshot RETAINS delete
tombstones, and every merge is a latest-wins reduction over
(ts, event_id) — so a late-arriving OLDER upsert can neither resurrect
a deleted key nor overwrite a newer value, and the final snapshot
equals the global latest-wins over the whole stream no matter how the
micro-batches slice it. (Tombstone GC — dropping tombstones older than
the source's max lateness — is the standard follow-up compaction;
retention here is unbounded for the probe.)

Scale: each merge shuffles |snapshot ∪ batch| rows on the key once. At
100 TB you partition the snapshot (e.g. by key-hash bucket) and merge
only the buckets a batch touches (merge-on-read with periodic
compact_table passes); the per-batch latest-wins reduction and pointer
protocol are unchanged.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from realtime_financial_transactions_data_pipeline_spark.operators.scale import (
    current_table_path,
    init_pointer_table,
)
from realtime_financial_transactions_data_pipeline_spark.registry import pin_result, probe
from realtime_financial_transactions_data_pipeline_spark.tables import load_table

_SCRATCH = "/tmp/spark_graft_streaming"

#: CDC wire schema: seconds-truncated event time (the JSON wire's
#: millisecond timestamp format would otherwise silently drop parquet's
#: microseconds and reorder same-millisecond ties).
CDC_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def merge_latest_wins(
    current: DataFrame,
    batch: DataFrame,
    key: str,
    order_cols: list[str],
) -> DataFrame:
    """One MERGE step: union the snapshot with the tagged batch and keep
    the single newest row per key (ties broken by the trailing order
    columns, all descending). Tombstones compete like any row, so the
    newest state — live or deleted — always wins."""
    w = Window.partitionBy(key).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        current.unionByName(batch)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def run_cdc_merge_stream(
    spark: SparkSession,
    input_dir: str,
    root: str,
    key: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> str:
    """Stream JSON CDC records from ``input_dir`` (one file per
    micro-batch) and merge each batch into the pointer-managed snapshot
    under ``root``. ``event_type = 'error'`` records are delete
    tombstones; everything else upserts. Returns the final snapshot
    generation path."""
    snap_root = f"{root}/snapshot"
    empty = spark.createDataFrame(
        [], schema=T.StructType(CDC_SCHEMA.fields + [T.StructField("op", T.StringType())])
    )
    init_pointer_table(empty, snap_root)
    stream = (
        spark.readStream.schema(CDC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(input_dir)
    )

    def _merge(batch: DataFrame, batch_id: int) -> None:
        cur_path = current_table_path(snap_root)
        cur = batch.sparkSession.read.parquet(cur_path)
        tagged = batch.withColumn(
            "op",
            F.when(F.col("event_type") == "error", F.lit("delete")).otherwise(
                F.lit("upsert")
            ),
        )
        merged = merge_latest_wins(cur, tagged, key, list(order_cols))
        gen = int(os.path.basename(cur_path).split("=")[1]) + 1
        new = os.path.join(snap_root, f"gen={gen}")
        shutil.rmtree(new, ignore_errors=True)
        merged.write.mode("overwrite").parquet(new)
        tmp = os.path.join(snap_root, "CURRENT.tmp")
        with open(tmp, "w") as fh:
            fh.write(f"gen={gen}\n")
        os.replace(tmp, os.path.join(snap_root, "CURRENT"))

    q = (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", f"{root}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return current_table_path(snap_root)


@probe(
    "k8_stream_merge_sink",
    oracle="""
    SELECT user_id, event_id, event_type, value FROM (
      SELECT user_id, event_id, event_type, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY date_trunc('second', ts) DESC,
                                         event_id DESC) AS rn
      FROM events) WHERE rn = 1 AND event_type <> 'error'
    """,
)
def k8_stream_merge_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K8: the events table replayed as a 4-micro-batch CDC stream
    through the foreachBatch merge sink; 'error' events are delete
    tombstones. The final snapshot's live rows must equal the global
    latest-wins per user computed directly in SQL — certifying the
    merge reduction, tombstone retention, AND the pointer protocol in
    one hash check (any batch-split leakage would change the result)."""
    root = f"{_SCRATCH}/k8"
    shutil.rmtree(root, ignore_errors=True)
    input_dir = f"{root}/incoming"
    (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            "event_type",
            "value",
            F.date_trunc("second", "ts").alias("ts"),
        )
        .repartition(4)
        .write.mode("overwrite")
        .json(input_dir)
    )
    final_path = run_cdc_merge_stream(spark, input_dir, root)
    snap = spark.read.parquet(final_path)
    return pin_result(
        snap.filter(F.col("op") == "upsert").select(
            "user_id", "event_id", "event_type", "value"
        )
    )
