"""Multimodal columns (north-star X4): image/audio/video as opaque
``binary`` columns with typed metadata, plus the Spark-side plumbing for
decode / feature-extraction / frame-sampling UDFs.

Design for 100 TB of media:

- Content is an opaque ``binary`` column (or a ``path`` column pointing
  into object storage for payloads too big to inline); metadata travels
  as a typed struct so filters on width/duration/codec stay JVM-side
  and never touch the bytes.
- Heavy per-item work (decode, resize, embed) runs in ``mapInPandas`` —
  Arrow ships the binary batches to Python once, the UDF is free to use
  numpy/codec libs, and the operation parallelizes per partition with
  no shuffle.
- The actual codec step is STUBBED here (no image/audio libs in this
  container): `decode_stub=True` produces a deterministic fake decode
  (metadata derived from the bytes), `decode_stub=False` raises
  NotImplementedError where a real ``PIL.Image.open`` / ``soundfile``
  call would go. Schema, batching, and partitioning — the Spark side —
  are real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from realtime_financial_transactions_data_pipeline_spark.registry import probe
from realtime_financial_transactions_data_pipeline_spark.tables import load_table

#: Typed multimodal record: opaque payload + path + declared metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("path", T.StringType(), True),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("checksum", T.LongType()),
    ]
)


def synth_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic multimodal table from `documents`: the text bytes
    stand in for an encoded payload; modality round-robins; metadata is
    derived JVM-side. (At scale this is the schema a real ingest would
    produce; only the payload synthesis is fake.)"""
    d = load_table(spark, sf_dir, "documents")
    content = F.encode("text", "UTF-8")
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return d.select(
        F.col("doc_id").alias("media_id"),
        modality.alias("modality"),
        F.concat(F.lit("s3://media-bucket/"), modality, F.lit("/"),
                 F.col("doc_id").cast("string"), F.lit(".bin")).alias("path"),
        content.alias("content"),
        F.struct(
            F.octet_length(content).cast("long").alias("n_bytes"),
            F.when(modality == "image", (F.octet_length(content) % 640 + 16).cast("int"))
            .alias("width"),
            F.when(modality == "image", (F.octet_length(content) % 480 + 16).cast("int"))
            .alias("height"),
            F.when(modality == "audio", F.lit(16000)).cast("int").alias("sample_rate"),
            F.when(modality == "video", (F.octet_length(content) % 300 + 1).cast("int"))
            .alias("n_frames"),
        ).alias("meta"),
    )


def decode_media(df: DataFrame, stub: bool = True) -> DataFrame:
    """Decode step as ``mapInPandas``: Arrow-batched binary in, typed
    rows out. ``stub=True`` derives deterministic fake dimensions from
    the payload bytes; ``stub=False`` marks where the real codec call
    goes (PIL/libsndfile/ffmpeg — not in this container)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        if not stub:
            raise NotImplementedError(
                "real media decode requires codec libraries (PIL/soundfile/ffmpeg); "
                "install them and implement here — the Spark plumbing is complete"
            )
        for pdf in batches:
            payloads = [np.frombuffer(b, dtype=np.uint8) if b is not None else
                        np.empty(0, dtype=np.uint8) for b in pdf["content"]]
            n = np.array([p.size for p in payloads], dtype=np.int64)
            checksum = np.array([int(p.sum()) for p in payloads], dtype=np.int64)
            width = (n % 640 + 16).astype(np.int32)
            height = (n % 480 + 16).astype(np.int32)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "width": width,
                    "height": height,
                    "n_pixels": (width.astype(np.int64) * height),
                    "checksum": checksum,
                }
            )

    return df.mapInPandas(decode, DECODED_SCHEMA)


@probe(
    "x4_binary_columns",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           substring(hex(encode(text)), 1, 16) AS hex_prefix,
           CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS modality
    FROM documents
    """,
)
def x4_binary_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary + path + metadata columns (X4), oracle-checked on the
    deterministic parts: payload byte length, hex prefix, modality."""
    m = synth_media(spark, sf_dir)
    return m.select(
        "media_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.substring(F.hex("content"), 1, 16).alias("hex_prefix"),
        "modality",
    )


_PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("hex_prefix", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_pixels", T.LongType()),
    ]
)


@probe(
    "x4_multimodal_decode",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id,
             CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
                  WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             substring(hex(encode(text)), 1, 16) AS hex_prefix
      FROM documents
    )
    SELECT media_id, modality, n_bytes, hex_prefix,
           CAST(n_bytes % 640 + 16 AS INTEGER) AS width,
           CAST(n_bytes % 480 + 16 AS INTEGER) AS height,
           CAST((n_bytes % 640 + 16) * (n_bytes % 480 + 16) AS BIGINT) AS n_pixels
    FROM m
    """,
)
def x4_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 driver-window probe: binary/meta columns AND the mapInPandas
    Arrow decode plumbing in one hash-checked pass. The stub decode's
    outputs are deterministic functions of the payload bytes, so the
    whole Arrow round-trip (binary batches → Python → typed rows) is
    oracle-verified — the only fake part is the codec arithmetic itself
    (see decode_media for the honest stub boundary)."""

    def profile(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            raw = [b if b is not None else b"" for b in pdf["content"]]
            n = np.array([len(b) for b in raw], dtype=np.int64)
            width = (n % 640 + 16).astype(np.int32)
            height = (n % 480 + 16).astype(np.int32)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": n,
                    "hex_prefix": [b.hex().upper()[:16] for b in raw],
                    "width": width,
                    "height": height,
                    "n_pixels": width.astype(np.int64) * height,
                }
            )

    return synth_media(spark, sf_dir).mapInPandas(profile, _PROFILE_SCHEMA)


@probe("x4b_decode_stub", oracle=None)
def x4b_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode plumbing (stubbed codec): binary batches →
    typed decoded rows; aggregated per modality. Rows-only (the fake
    decode has no SQL twin); batch shape and determinism are tested in
    tests/test_multimodal.py."""
    decoded = decode_media(synth_media(spark, sf_dir))
    return decoded.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_pixels").alias("total_pixels"),
        F.sum("checksum").alias("checksum_sum"),
    )
