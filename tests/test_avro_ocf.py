"""Avro OCF codec tests: primitive encoding edges, container framing,
codec negotiation, corruption detection, Spark roundtrip."""

from __future__ import annotations

import pytest

from realtime_financial_transactions_data_pipeline_spark.sources.avro_ocf import (
    EVENT_AVRO_SCHEMA,
    _zigzag_decode,
    _zigzag_encode,
    decode_ocf,
    encode_ocf,
    from_ocf_blobs,
    to_ocf_blobs,
)

_RECS = [
    {"user_id": 1, "event_id": 10, "event_type": "click", "value": 1.5},
    {"user_id": -3, "event_id": 2**40, "event_type": "héllo", "value": -0.25},
    {"user_id": 0, "event_id": 0, "event_type": "", "value": 0.0},
]


def test_zigzag_edges():
    for n in (0, -1, 1, 63, -64, 64, 2**62, -(2**62)):
        b = _zigzag_encode(n)
        v, p = _zigzag_decode(memoryview(b), 0)
        assert (v, p) == (n, len(b)), n


def test_roundtrip_deflate_and_null():
    for codec in ("deflate", "null"):
        blob = encode_ocf(_RECS, EVENT_AVRO_SCHEMA, codec=codec)
        out, schema = decode_ocf(blob)
        assert out == _RECS
        assert schema["name"] == "event"
    assert not encode_ocf(_RECS, EVENT_AVRO_SCHEMA).startswith(
        encode_ocf([], EVENT_AVRO_SCHEMA)
    )


def test_magic_and_sync_validation():
    blob = bytearray(encode_ocf(_RECS, EVENT_AVRO_SCHEMA))
    with pytest.raises(ValueError, match="not an Avro"):
        decode_ocf(b"NOPE" + bytes(blob[4:]))
    blob[-1] ^= 0xFF  # trailing sync marker corrupted
    with pytest.raises(ValueError, match="sync marker"):
        decode_ocf(bytes(blob))


def test_unsupported_type_raises():
    schema = {"type": "record", "name": "r",
              "fields": [{"name": "x", "type": "bytes"}]}
    with pytest.raises(NotImplementedError, match="bytes"):
        encode_ocf([{"x": b""}], schema)


def test_spark_blob_roundtrip_preserves_rows(spark):
    rows = [(i % 3, 100 + i, "t" + str(i % 2), float(i)) for i in range(20)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, value double"
    ).withColumn("grp", __import__("pyspark").sql.functions.col("user_id") % 2)
    blobs = to_ocf_blobs(df)
    assert blobs.count() == 2
    back = from_ocf_blobs(blobs)
    assert sorted(
        (r.user_id, r.event_id, r.event_type, r.value) for r in back.collect()
    ) == sorted(rows)


def test_multi_block_files_decode():
    """decode_ocf's block loop: splice a second data block (same sync
    marker, deterministic writer) onto a one-block file."""
    import struct

    from realtime_financial_transactions_data_pipeline_spark.sources.avro_ocf import (
        _MAGIC,
    )

    blob1 = encode_ocf(_RECS[:2], EVENT_AVRO_SCHEMA)
    blob2 = encode_ocf(_RECS[2:], EVENT_AVRO_SCHEMA)
    # blob2's block section starts right after its header: find it by
    # locating the first sync marker (16 bytes after the metadata map).
    assert blob2.startswith(_MAGIC)
    from realtime_financial_transactions_data_pipeline_spark.sources.avro_ocf import (
        _SYNC,
    )

    hdr_end = blob2.index(_SYNC) + 16
    spliced = blob1 + blob2[hdr_end:]
    out, _ = decode_ocf(spliced)
    assert out == _RECS


def test_s16_pyds_partition_per_file(spark, tmp_path):
    """The registered avro_ocf data source plans one input partition
    per file (two files -> two partitions via spark_partition_id),
    infers the schema from the embedded header, and round-trips
    values."""
    from pyspark.sql import functions as F

    from realtime_financial_transactions_data_pipeline_spark.sources import pyds
    from realtime_financial_transactions_data_pipeline_spark.sources.avro_ocf import (
        EVENT_AVRO_SCHEMA,
        encode_ocf,
    )

    recs_a = [
        {"user_id": 1, "event_id": 10, "event_type": "click", "value": 1.5},
        {"user_id": 2, "event_id": 11, "event_type": "view", "value": -2.0},
    ]
    recs_b = [
        {"user_id": 3, "event_id": 12, "event_type": "click", "value": 0.25},
    ]
    for name, recs in (("a", recs_a), ("b", recs_b)):
        (tmp_path / f"{name}.avro").write_bytes(
            encode_ocf(recs, EVENT_AVRO_SCHEMA)
        )
    pyds.register(spark)
    df = spark.read.format("avro_ocf").option("path", str(tmp_path)).load()
    assert df.columns == ["user_id", "event_id", "event_type", "value"]
    rows = sorted(map(tuple, df.collect()))
    assert rows == sorted(
        tuple(r[k] for k in ("user_id", "event_id", "event_type", "value"))
        for r in recs_a + recs_b
    )
    n_parts = df.select(
        F.spark_partition_id().alias("p")
    ).distinct().count()
    assert n_parts == 2
