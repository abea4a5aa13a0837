"""Avro Object Container File (OCF) codec — pure stdlib, no spark-avro.

The reference's transport format IS Avro (`fact_transactions_pub-sub
.avsc`; Pub/Sub topics registered with `--type=avro`), but the
spark-avro connector is an external module absent from this
environment. The format itself needs nothing beyond stdlib: zigzag
varints, IEEE doubles, UTF-8 strings, and the deflate codec is RFC 1951
raw deflate (zlib with wbits=-15). So, as with PNG (multimodal.py),
the engine ships a REAL reader and writer:

* :func:`encode_ocf` — serialize a list of records to a complete OCF:
  magic, metadata map (embedded schema JSON + codec), sync marker,
  deflate-compressed data blocks.
* :func:`decode_ocf` — parse any conforming OCF produced by this or
  another writer (magic + metadata validated, sync markers checked
  per block, blocks inflated and decoded by the embedded schema's
  field order).

Spark-side: :func:`to_ocf_blobs` packs each group of rows into one OCF
as a binary column via ``applyInPandas`` (Arrow batches in, bytes out —
the multimodal plumbing); :func:`from_ocf_blobs` explodes OCF blobs
back to rows. At scale each task encodes/decodes only its own
partitions' blobs; nothing is driver-side.

Supported schema subset: a non-nullable record of {long, double,
string} fields — the reference's fact-event shape. Other types raise
``NotImplementedError`` (the honest-stub discipline).
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MAGIC = b"Obj\x01"
#: Deterministic sync marker (a real writer uses random bytes; the
#: roundtrip is hash-checked, so determinism is a feature here).
_SYNC = bytes(range(16))


# --- primitive encoders (Avro spec §primitive types) -----------------------


def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: memoryview, pos: int) -> tuple[int, int]:
    shift = z = 0
    while True:
        b = buf[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (z >> 1) ^ -(z & 1), pos


def _enc_value(v, typ: str) -> bytes:
    if typ == "long":
        return _zigzag_encode(int(v))
    if typ == "double":
        return struct.pack("<d", float(v))
    if typ == "string":
        b = str(v).encode("utf-8")
        return _zigzag_encode(len(b)) + b
    raise NotImplementedError(f"avro type {typ!r} not supported")


def _dec_value(buf: memoryview, pos: int, typ: str):
    if typ == "long":
        return _zigzag_decode(buf, pos)
    if typ == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if typ == "string":
        n, pos = _zigzag_decode(buf, pos)
        return bytes(buf[pos : pos + n]).decode("utf-8"), pos + n
    raise NotImplementedError(f"avro type {typ!r} not supported")


# --- container -------------------------------------------------------------


def encode_ocf(records: list[dict], schema: dict, codec: str = "deflate") -> bytes:
    """Serialize ``records`` (dicts keyed by field name) into one OCF
    under ``schema`` (an Avro record schema dict)."""
    fields = [(f["name"], f["type"]) for f in schema["fields"]]
    body = bytearray()
    for rec in records:
        for name, typ in fields:
            body += _enc_value(rec[name], typ)
    data = bytes(body)
    if codec == "deflate":
        comp = zlib.compressobj(wbits=-15)
        data = comp.compress(data) + comp.flush()
    elif codec != "null":
        raise NotImplementedError(f"avro codec {codec!r} not supported")
    out = bytearray(_MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    out += _zigzag_encode(len(meta))
    for k, v in meta.items():
        kb = k.encode()
        out += _zigzag_encode(len(kb)) + kb
        out += _zigzag_encode(len(v)) + v
    out += _zigzag_encode(0)  # end of metadata map
    out += _SYNC
    out += _zigzag_encode(len(records))
    out += _zigzag_encode(len(data))
    out += data
    out += _SYNC
    return bytes(out)


def decode_ocf(blob: bytes) -> tuple[list[dict], dict]:
    """Parse a conforming OCF: returns (records, schema). Magic,
    metadata, per-block sync markers, and codec are all validated."""
    if blob[:4] != _MAGIC:
        raise ValueError("not an Avro object container file")
    buf = memoryview(blob)
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _zigzag_decode(buf, pos)
        if n == 0:
            break
        if n < 0:  # spec: negative count prefixes a block byte-size
            _, pos = _zigzag_decode(buf, pos)
            n = -n
        for _ in range(n):
            klen, pos = _zigzag_decode(buf, pos)
            key = bytes(buf[pos : pos + klen]).decode()
            pos += klen
            vlen, pos = _zigzag_decode(buf, pos)
            meta[key] = bytes(buf[pos : pos + vlen])
            pos += vlen
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    fields = [(f["name"], f["type"]) for f in schema["fields"]]
    sync = bytes(buf[pos : pos + 16])
    pos += 16
    records: list[dict] = []
    while pos < len(buf):
        n_recs, pos = _zigzag_decode(buf, pos)
        n_bytes, pos = _zigzag_decode(buf, pos)
        data = bytes(buf[pos : pos + n_bytes])
        pos += n_bytes
        if codec == "deflate":
            data = zlib.decompress(data, wbits=-15)
        elif codec != "null":
            raise NotImplementedError(f"avro codec {codec!r} not supported")
        if bytes(buf[pos : pos + 16]) != sync:
            raise ValueError("sync marker mismatch (corrupt block boundary)")
        pos += 16
        dbuf = memoryview(data)
        dpos = 0
        for _ in range(n_recs):
            rec = {}
            for name, typ in fields:
                rec[name], dpos = _dec_value(dbuf, dpos, typ)
            records.append(rec)
    return records, schema


# --- Spark plumbing --------------------------------------------------------

EVENT_AVRO_SCHEMA = {
    "type": "record",
    "name": "event",
    "fields": [
        {"name": "user_id", "type": "long"},
        {"name": "event_id", "type": "long"},
        {"name": "event_type", "type": "string"},
        {"name": "value", "type": "double"},
    ],
}

_BLOB_SCHEMA = T.StructType(
    [
        T.StructField("grp", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("n_records", T.LongType()),
    ]
)


def to_ocf_blobs(df: DataFrame, group_col: str = "grp") -> DataFrame:
    """Pack each group's rows into ONE deflate-coded OCF blob
    (applyInPandas: Arrow batch in, one binary row out). Rows are
    sorted by (user_id, event_id) inside the blob so the encoding is
    deterministic regardless of upstream partitioning."""
    fields = [f["name"] for f in EVENT_AVRO_SCHEMA["fields"]]

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["user_id", "event_id"])
        recs = pdf[fields].to_dict("records")
        blob = encode_ocf(recs, EVENT_AVRO_SCHEMA)
        return pd.DataFrame(
            {
                "grp": [int(pdf[group_col].iloc[0])],
                "content": [blob],
                "n_records": [len(recs)],
            }
        )

    return df.groupBy(group_col).applyInPandas(pack, _BLOB_SCHEMA)


def from_ocf_blobs(blobs: DataFrame) -> DataFrame:
    """Decode OCF blobs back to rows (mapInPandas)."""
    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for blob in pdf["content"]:
                recs, _ = decode_ocf(bytes(blob))
                rows.extend(recs)
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_schema.fields]
            ) if rows else pd.DataFrame(
                {f.name: [] for f in out_schema.fields}
            )

    return blobs.mapInPandas(unpack, out_schema)


from pyspark.sql import SparkSession  # noqa: E402

from realtime_financial_transactions_data_pipeline_spark.functions.compat import (  # noqa: E402
    dround,
)
from realtime_financial_transactions_data_pipeline_spark.registry import probe  # noqa: E402
from realtime_financial_transactions_data_pipeline_spark.tables import load_table  # noqa: E402


@probe(
    "s11_avro_ocf_roundtrip",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           round(sum(value), 2) AS total_value
    FROM events
    WHERE user_id % 10 = 4
    GROUP BY event_type
    """,
)
def s11_avro_ocf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro OCF end-to-end through the REAL container format: an
    `events` slice packs into deflate-coded OCF blobs (one per user
    bucket — magic, embedded schema, sync-marked blocks, RFC 1951
    deflate), then decodes back and aggregates. The oracle computes
    the same aggregate from the parquet source, so the hash certifies
    the zigzag/IEEE/UTF-8 encoding and the container framing are
    lossless — the reference's own transport format
    (fact_transactions_pub-sub.avsc) as a first-class source/sink,
    with no spark-avro dependency."""
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 10 == 4)
        .select(
            "user_id",
            "event_id",
            "event_type",
            "value",
            (F.col("user_id") % 8).alias("grp"),
        )
    )
    back = from_ocf_blobs(to_ocf_blobs(e))
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        dround(F.sum("value"), 2).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# S16 — the same codec as a FIRST-CLASS reader via Spark 4's Python
# Data Source API (`sources/pyds.py`): `spark.read.format("avro_ocf")`
# with one input partition per file and schema-on-read from the first
# file's embedded header. The probe materializes a 4-file OCF dataset
# (one deflate-coded container per user bucket), reads it back through
# the registered format, and aggregates; the oracle recomputes from
# parquet, so the hash certifies planner-driven partitioned reads of
# the container format end to end.
# ---------------------------------------------------------------------------


@probe(
    "s16_python_datasource",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
             AS value_mills
    FROM events
    WHERE user_id % 10 = 9
    GROUP BY event_type
    """,
)
def s16_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S16 — partition-parallel OCF reads through the registered Python
    data source (block comment above). The fixture's four container
    files come out of the SAME distributed packer s11 certifies
    (`to_ocf_blobs`); only the bounded blob rows (4) touch the
    driver."""
    from realtime_financial_transactions_data_pipeline_spark.caching import (
        disk_fixture,
        source_fingerprint,
    )
    from realtime_financial_transactions_data_pipeline_spark.sources import pyds

    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 10 == 9)
        .select(
            "user_id",
            "event_id",
            "event_type",
            "value",
            (F.col("user_id") % 4).alias("grp"),
        )
    )

    def build(tmp: str) -> None:
        import os

        os.makedirs(tmp, exist_ok=True)
        for row in to_ocf_blobs(e).collect():
            with open(f"{tmp}/{row['grp']}.avro", "wb") as fh:
                fh.write(bytes(row["content"]))

    path = disk_fixture(
        "s16-events-ocf", source_fingerprint(sf_dir, "events"), build
    )
    pyds.register(spark)
    back = spark.read.format("avro_ocf").option("path", path).load()
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.round(F.col("value") * 1000, 0).cast("long")).alias(
            "value_mills"
        ),
    )
