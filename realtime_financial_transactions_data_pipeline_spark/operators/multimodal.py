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
- Decoding: REAL parsers ship for the formats stdlib + numpy can
  handle — PCM-WAV (:func:`decode_wav`, RIFF/fmt/data chunk parsing +
  numpy sample views), binary PPM (:func:`decode_ppm`), 24-bit BMP
  (:func:`decode_bmp`), truecolor PNG (:func:`decode_png`, chunk walk
  + CRC verify + zlib inflate + all five scanline unfilters), and
  baseline JPEG (:func:`decode_jpeg`, from-spec Huffman entropy
  decode + dequantize + IDCT + 4:2:0 upsample + JFIF YCbCr->RGB),
  and GIF (:func:`decode_gif`, block walk + a full variable-width LZW
  codec + palette lookup), each hash-checked end-to-end. Only codecs
  needing external
  libraries (mp3/h264: soundfile/ffmpeg, absent in this container —
  ``tests/test_multimodal.py::test_codec_lib_appeared_requires_wiring``
  re-probes availability every run and fails with wiring instructions
  if one appears) plus JPEG's progressive/arithmetic modes remain
  stubbed behind NotImplementedError. Schema, batching, and
  partitioning are identical across the real and stubbed paths.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from realtime_financial_transactions_data_pipeline_spark.functions.compat import dround
from realtime_financial_transactions_data_pipeline_spark.registry import probe
from realtime_financial_transactions_data_pipeline_spark.tables import (
    load_table,
    widen_scan,
)

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
    d = widen_scan(load_table(spark, sf_dir, "documents"))  # r18: parallel decode
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


def stub_dims(n):
    """The deterministic fake decode arithmetic, shared by the stub
    decoder, the hash-checked profile probe, and (as SQL) their oracles:
    width = n % 640 + 16, height = n % 480 + 16 for payload byte
    length ``n`` (numpy int64 array in, int32 arrays out)."""
    import numpy as np

    width = (n % 640 + 16).astype(np.int32)
    height = (n % 480 + 16).astype(np.int32)
    return width, height


def decode_media(df: DataFrame, stub: bool = True) -> DataFrame:
    """Decode step as ``mapInPandas``: Arrow-batched binary in, typed
    rows out. ``stub=True`` derives deterministic fake dimensions from
    the payload bytes; ``stub=False`` marks where the real codec call
    goes (PIL/libsndfile/ffmpeg — not in this container)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        if not stub:
            raise NotImplementedError(
                "mp3/h264 decode requires soundfile/ffmpeg (absent in this "
                "container); REAL parsers exist in this module for PCM-WAV, "
                "PPM, BMP, zlib-compressed PNG, baseline JPEG, and "
                "LZW-compressed GIF (decode_wav / decode_ppm / decode_bmp / "
                "decode_png / decode_jpeg / decode_gif)"
            )
        for pdf in batches:
            payloads = [np.frombuffer(b, dtype=np.uint8) if b is not None else
                        np.empty(0, dtype=np.uint8) for b in pdf["content"]]
            n = np.array([p.size for p in payloads], dtype=np.int64)
            checksum = np.array([int(p.sum()) for p in payloads], dtype=np.int64)
            width, height = stub_dims(n)
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
            width, height = stub_dims(n)
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


@probe(
    "x4b_decode_stub",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
                  WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
             octet_length(encode(text)) AS n,
             (SELECT coalesce(sum(ord(u.c)), 0)
              FROM (SELECT unnest(string_split(text, '')) AS c) u) AS checksum
      FROM documents)
    SELECT modality, CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum((n % 640 + 16) * (n % 480 + 16)) AS BIGINT)
             AS total_pixels,
           CAST(sum(checksum) AS BIGINT) AS checksum_sum
    FROM m GROUP BY modality
    """,
)
def x4b_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode plumbing (stubbed codec): binary batches →
    typed decoded rows; aggregated per modality. Hash-checked since
    round 12 (VERDICT r11 #8): the "fake" decode is fully deterministic
    arithmetic on the payload bytes — stub_dims on the byte length,
    byte-sum checksum — so DuckDB replays it exactly. The byte-sum
    replay uses per-character code points, which equals the UTF-8
    byte sum because the documents corpus is ASCII at every shipped SF
    (asserted: octet_length(encode(text)) == length(text) for all
    rows); if the driver ever regenerates non-ASCII testdata this
    oracle fails loudly rather than drifting. Batch shape and
    determinism are additionally tested in tests/test_multimodal.py."""
    decoded = decode_media(synth_media(spark, sf_dir))
    return decoded.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_pixels").alias("total_pixels"),
        F.sum("checksum").alias("checksum_sum"),
    )


# ---------------------------------------------------------------------------
# Real decoders (no external codec libs needed): PCM-WAV and binary PPM
# are fully parseable with stdlib struct/numpy. decode_media's stub
# remains the boundary for COMPRESSED codecs only (jpeg/mp3/h264 need
# PIL/soundfile/ffmpeg, absent in this container).
# ---------------------------------------------------------------------------

WAV_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("bits_per_sample", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("amplitude", T.IntegerType()),
    ]
)

PPM_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("mean_red", T.IntegerType()),
    ]
)

_WAV_RATE = 8000


def _wav_bytes(samples: bytes) -> bytes:
    """Wrap raw 16-bit mono little-endian PCM in the RIFF/fmt/data
    container at _WAV_RATE — the ONE place the WAV header law lives
    (synth_wav_media, synth_tone_media, and x4k's mixed corpus all
    serialize through it)."""
    import struct

    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(samples))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, _WAV_RATE, _WAV_RATE * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(samples))
        + samples
    )


def _ppm_bytes(px) -> bytes:
    """Binary P6 serialization of an (h, w, 3) uint8 array — the one
    place the PPM header law lives."""
    h, w = px.shape[0], px.shape[1]
    return f"P6\n{w} {h}\n255\n".encode() + px.tobytes()


def synth_wav_media(docs: DataFrame) -> DataFrame:
    """Build VALID 16-bit PCM mono WAV payloads (RIFF/fmt/data chunks)
    per document: n_samples = len(text) % 400 + 10, constant amplitude
    doc_id % 2000. Runs in mapInPandas (binary assembly is byte work,
    not expression work); fully deterministic."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                n = len(text) % 400 + 10
                amp = int(doc_id) % 2000
                payloads.append(_wav_bytes(np.full(n, amp, dtype="<i2").tobytes()))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": payloads})

    return docs.select("doc_id", "text").mapInPandas(
        build,
        T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )


def _parse_wav(b: bytes, mid: object = None):
    """Shared RIFF/WAVE parse (decode_wav and the x4h feature
    extractor): walk the chunk list (tag + little-endian size) instead
    of assuming the canonical 44-byte layout — encoders commonly emit
    an 18-byte fmt chunk (cbSize extension) or LIST/INFO chunks before
    data. Returns (sample_rate, n_channels, bits, samples int16
    array). Truncation/garbage raise ValueError tagged with the media
    id; non-16-bit-PCM raises too (the honest boundary)."""
    import struct

    import numpy as np

    if b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError(f"media {mid}: not a RIFF/WAVE payload")
    pos, fmt_chunk, data = 12, None, None
    while pos + 8 <= len(b):
        tag = b[pos : pos + 4]
        size = struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        # A declared size past the buffer end means a truncated
        # payload — refuse rather than silently parsing a short body.
        if pos + 8 + size > len(b):
            raise ValueError(
                f"media {mid}: truncated chunk {tag!r} "
                f"(declares {size} bytes, {len(b) - pos - 8} remain)"
            )
        body = b[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            fmt_chunk = body
        elif tag == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt_chunk is None or data is None:
        raise ValueError(f"media {mid}: missing fmt/data chunk")
    if len(fmt_chunk) < 16:
        raise ValueError(f"media {mid}: truncated fmt chunk")
    fmt, n_ch, rate, _, _, bits = struct.unpack("<HHIIHH", fmt_chunk[:16])
    if fmt != 1 or bits != 16:
        raise ValueError(
            f"media {mid}: only 16-bit PCM is parseable here (fmt={fmt})"
        )
    if rate == 0:
        raise ValueError(f"media {mid}: zero sample rate")
    if len(data) % 2:
        raise ValueError(
            f"media {mid}: truncated data chunk "
            f"({len(data)} bytes is not whole 16-bit samples)"
        )
    return rate, n_ch, bits, np.frombuffer(data, dtype="<i2")


def decode_wav(media: DataFrame) -> DataFrame:
    """REAL audio decode: parse the RIFF header and fmt/data chunks,
    validate magic numbers, and read the PCM samples (numpy view) —
    stdlib-only, so 'no codec libs in the container' does not apply.
    Arrow-batched mapInPandas, one pass, no shuffle."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "sample_rate", "n_channels", "bits_per_sample",
                    "n_samples", "duration_ms", "amplitude")}
            for mid, raw in zip(pdf["media_id"], pdf["content"]):
                rate, n_ch, bits, samples = _parse_wav(bytes(raw), mid)
                n_frames = len(samples) // max(n_ch, 1)
                out["media_id"].append(mid)
                out["sample_rate"].append(rate)
                out["n_channels"].append(n_ch)
                out["bits_per_sample"].append(bits)
                out["n_samples"].append(n_frames)  # per-channel frames
                out["duration_ms"].append(n_frames * 1000 // rate)
                out["amplitude"].append(int(samples.max(initial=0)))
            yield pd.DataFrame(out)

    return media.mapInPandas(parse, WAV_SCHEMA)


def synth_ppm_media(docs: DataFrame) -> DataFrame:
    """Valid binary PPM (P6) payloads: width = len(text) % 32 + 4,
    height = doc_id % 24 + 4, all pixels (doc_id % 256, 0, 255)."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                w = len(text) % 32 + 4
                h = int(doc_id) % 24 + 4
                px = np.empty((h, w, 3), dtype=np.uint8)
                px[:, :, 0] = int(doc_id) % 256
                px[:, :, 1] = 0
                px[:, :, 2] = 255
                payloads.append(_ppm_bytes(px))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": payloads})

    return docs.select("doc_id", "text").mapInPandas(
        build,
        T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )


def decode_ppm(media: DataFrame) -> DataFrame:
    """REAL image decode for binary PPM: parse the P6 header, reshape
    the pixel buffer, compute per-image channel stats with numpy."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def header_tokens(b: bytes):
            """P6 header = magic + 3 whitespace-separated integers
            (width, height, maxval), '#' comments allowed, then ONE
            whitespace byte before the pixel data."""
            if not b.startswith(b"P6"):
                raise ValueError("not a binary PPM")
            toks, pos = [], 2
            while len(toks) < 3:
                while pos < len(b) and b[pos : pos + 1].isspace():
                    pos += 1
                if b[pos : pos + 1] == b"#":  # comment to end of line
                    pos = b.index(b"\n", pos) + 1
                    continue
                start = pos
                while pos < len(b) and not b[pos : pos + 1].isspace():
                    pos += 1
                toks.append(int(b[start:pos]))
            return toks, pos + 1  # single whitespace after maxval

        for pdf in batches:
            out = {k: [] for k in ("media_id", "width", "height", "n_pixels", "mean_red")}
            for mid, raw in zip(pdf["media_id"], pdf["content"]):
                b = bytes(raw)
                try:
                    (w, h, maxval), start = header_tokens(b)
                except ValueError as exc:
                    raise ValueError(f"media {mid}: {exc}") from exc
                if maxval != 255:
                    raise ValueError(
                        f"media {mid}: only 8-bit-per-channel PPM supported "
                        f"(maxval={maxval})"
                    )
                px = np.frombuffer(b[start : start + w * h * 3], dtype=np.uint8)
                if px.size != w * h * 3:
                    raise ValueError(f"media {mid}: truncated pixel buffer")
                px = px.reshape(h, w, 3)
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["n_pixels"].append(w * h)
                out["mean_red"].append(int(round(px[:, :, 0].mean())))
            yield pd.DataFrame(out)

    return media.mapInPandas(parse, PPM_SCHEMA)


@probe(
    "x4c_real_decode",
    oracle="""
    WITH wav AS (
      SELECT doc_id % 2 AS grp,
             (length(text) % 400 + 10) AS n_samples
      FROM documents WHERE doc_id % 2 = 0),
    ppm AS (
      SELECT doc_id % 2 AS grp,
             (length(text) % 32 + 4) * (doc_id % 24 + 4) AS n_px
      FROM documents WHERE doc_id % 2 = 1)
    SELECT 'audio' AS modality,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(n_samples) AS BIGINT) AS total_units,
           CAST(max(n_samples) * 1000 // 8000 AS BIGINT) AS max_duration_ms
    FROM wav
    UNION ALL
    SELECT 'image', CAST(count(*) AS BIGINT), CAST(sum(n_px) AS BIGINT),
           CAST(NULL AS BIGINT)
    FROM ppm
    """,
)
def x4c_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 with REAL codecs: even docs become valid PCM-WAV payloads,
    odd docs valid binary PPM images; the decoders parse actual RIFF /
    P6 headers and pixel/sample buffers (stdlib struct + numpy — the
    'no codec libs' limitation only applies to compressed formats).
    Hash-checked: header-derived fields are deterministic functions of
    the source docs, so DuckDB re-derives the decode output without
    ever seeing the binary."""
    d = widen_scan(load_table(spark, sf_dir, "documents"))  # r18: parallel decode
    wav = decode_wav(synth_wav_media(d.filter(F.col("doc_id") % 2 == 0)))
    ppm = decode_ppm(synth_ppm_media(d.filter(F.col("doc_id") % 2 == 1)))
    a = wav.agg(
        F.lit("audio").alias("modality"),
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_samples").cast("long").alias("total_units"),
        F.max("duration_ms").cast("long").alias("max_duration_ms"),
    ).select("modality", "n_items", "total_units", "max_duration_ms")
    b = ppm.agg(
        F.lit("image").alias("modality"),
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_pixels").cast("long").alias("total_units"),
        F.lit(None).cast("long").alias("max_duration_ms"),
    ).select("modality", "n_items", "total_units", "max_duration_ms")
    return a.unionByName(b)


# ---------------------------------------------------------------------------
# BMP (third real codec): Windows DIB files exercise two parsing hazards
# the PPM path cannot — 4-byte row padding and bottom-up row storage
# (positive biHeight stores the LAST logical row first; negative means
# top-down). Uncompressed 24-bit BI_RGB only; compressed BMPs raise like
# every other compressed format.
# ---------------------------------------------------------------------------

BMP_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("corner_red", T.IntegerType()),
        T.StructField("sum_red", T.LongType()),
        T.StructField("mean_blue", T.IntegerType()),
    ]
)


def _bmp_bytes(w: int, h: int, blue: int, top_down: bool = False) -> bytes:
    """Serialize a 24-bit BI_RGB BMP: blue channel constant, green 77,
    red = 7 × logical row index. Rows are padded to 4 bytes and written
    bottom-up unless ``top_down`` (negative biHeight)."""
    import struct

    import numpy as np

    row_stride = (w * 3 + 3) & ~3
    px = np.zeros((h, w, 3), dtype=np.uint8)  # BGR order on disk
    px[:, :, 0] = blue
    px[:, :, 1] = 77
    px[:, :, 2] = (7 * np.arange(h, dtype=np.uint16)[:, None] % 256).astype(np.uint8)
    rows = px if top_down else px[::-1]
    body = b"".join(
        rows[y].tobytes() + b"\x00" * (row_stride - w * 3) for y in range(h)
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return header + info + body


def synth_bmp_media(docs: DataFrame) -> DataFrame:
    """Valid 24-bit BMP payloads: width = len(text) % 16 + 4 (odd widths
    force nonzero row padding), height = doc_id % 12 + 4, blue channel
    = doc_id % 256, red a per-row gradient (7y) that makes the
    bottom-up flip observable in the decoded corner pixel."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                _bmp_bytes(len(t) % 16 + 4, int(i) % 12 + 4, int(i) % 256)
                for i, t in zip(pdf["doc_id"], pdf["text"])
            ]
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": payloads})

    return docs.select("doc_id", "text").mapInPandas(
        build,
        T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )


def decode_bmp(media: DataFrame) -> DataFrame:
    """REAL BMP decode: parse BITMAPFILEHEADER + BITMAPINFOHEADER with
    stdlib struct, strip per-row padding, un-flip bottom-up storage,
    and compute channel stats over the logical (top-down) image."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        for pdf in batches:
            out = {f.name: [] for f in BMP_SCHEMA.fields}
            for mid, raw in zip(pdf["media_id"], pdf["content"]):
                b = bytes(raw)
                if b[:2] != b"BM":
                    raise ValueError(f"media {mid}: not a BMP")
                _, _, _, _, data_off = struct.unpack_from("<2sIHHI", b, 0)
                hdr_size, w, h_signed, planes, bpp, compression = struct.unpack_from(
                    "<IiiHHI", b, 14
                )
                if hdr_size < 40 or planes != 1:
                    raise ValueError(f"media {mid}: unsupported DIB header")
                if compression != 0 or bpp != 24:
                    raise NotImplementedError(
                        f"media {mid}: only uncompressed 24-bit BI_RGB supported "
                        f"(compression={compression}, bpp={bpp})"
                    )
                top_down = h_signed < 0
                h = -h_signed if top_down else h_signed
                row_stride = (w * 3 + 3) & ~3
                body = np.frombuffer(b, dtype=np.uint8, count=row_stride * h,
                                     offset=data_off)
                rows = body.reshape(h, row_stride)[:, : w * 3].reshape(h, w, 3)
                logical = rows if top_down else rows[::-1]  # BGR, top-down
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["n_pixels"].append(w * h)
                out["corner_red"].append(int(logical[0, 0, 2]))
                out["sum_red"].append(int(logical[:, :, 2].astype(np.int64).sum()))
                out["mean_blue"].append(int(round(float(logical[:, :, 0].mean()))))
            yield pd.DataFrame(out)

    return media.mapInPandas(parse, BMP_SCHEMA)


@probe(
    "x4d_bmp_decode",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(length(text) % 16 + 4 AS INTEGER) AS width,
           CAST(doc_id % 12 + 4 AS INTEGER) AS height,
           CAST((length(text) % 16 + 4) * (doc_id % 12 + 4) AS BIGINT) AS n_pixels,
           0 AS corner_red,
           CAST((length(text) % 16 + 4) * 7 * (doc_id % 12 + 4) * (doc_id % 12 + 3) / 2
                AS BIGINT) AS sum_red,
           CAST(doc_id % 256 AS INTEGER) AS mean_blue
    FROM documents
    """,
)
def x4d_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 third real codec: every doc becomes a valid 24-bit BMP (padded
    rows, bottom-up storage) and is decoded back by parsing the actual
    file + DIB headers. corner_red certifies the bottom-up flip (an
    unflipped read would see the LAST logical row's gradient value);
    sum_red = w·7·h(h−1)/2 certifies the full pixel buffer; mean_blue
    the per-doc constant channel. All header-derived fields are
    deterministic functions of the source docs, so DuckDB re-derives
    the decode output without seeing the binary."""
    d = widen_scan(load_table(spark, sf_dir, "documents"))  # r18: parallel decode
    return decode_bmp(synth_bmp_media(d))


# ---------------------------------------------------------------------------
# PNG — the first COMPRESSED real codec: stdlib zlib covers the DEFLATE
# stream, so truecolor PNG decodes with no external library. The parser
# walks the chunk layout (CRC-verified), inflates the concatenated
# IDATs, and reverses all five scanline filters (None/Sub/Up/Average/
# Paeth). The encoder below cycles the filter type per row, so the
# round-trip probe exercises every unfilter branch on every image.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_filter_row(row, prev, ft):
    """Apply PNG filter ``ft`` to one RGB scanline (uint8 arrays;
    bpp=3). uint8 arithmetic wraps mod 256, as the spec requires."""
    import numpy as np

    if ft == 0:
        return row.copy()
    left = np.zeros_like(row)
    left[3:] = row[:-3]
    if ft == 1:  # Sub
        return row - left
    if ft == 2:  # Up
        return row - prev
    if ft == 3:  # Average
        return row - (
            (left.astype(np.uint16) + prev.astype(np.uint16)) // 2
        ).astype(np.uint8)
    # Paeth
    ul = np.zeros_like(prev)
    ul[3:] = prev[:-3]
    a, b, c = left.astype(np.int16), prev.astype(np.int16), ul.astype(np.int16)
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return row - pred.astype(np.uint8)


def _png_unfilter_row(ft, f, prev):
    """Reverse one scanline filter. Sub/Up vectorize (prefix-sum /
    elementwise); Average and Paeth are inherently sequential along x
    (each pixel depends on the reconstructed left neighbor), so they
    loop — the spec's data dependency, not an implementation shortcut."""
    import numpy as np

    if ft == 0:
        return f.copy()
    if ft == 2:
        return f + prev  # uint8 wrap
    if ft == 1:
        # recon[x] = f[x] + recon[x-3]: a mod-256 prefix sum per lane.
        lanes = f.reshape(-1, 3).astype(np.int64)
        return (lanes.cumsum(axis=0) % 256).astype(np.uint8).reshape(-1)
    recon = np.zeros_like(f)
    for x in range(f.size):
        a = int(recon[x - 3]) if x >= 3 else 0
        b = int(prev[x])
        c = int(prev[x - 3]) if x >= 3 else 0
        if ft == 3:
            pred = (a + b) >> 1
        elif ft == 4:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        recon[x] = (int(f[x]) + pred) & 0xFF
    return recon


def _png_bytes(w: int, h: int, blue: int) -> bytes:
    """Serialize a truecolor 8-bit non-interlaced PNG: red = 7 × row
    index, green 77, blue constant. Row y uses filter type y % 5, so a
    5-row image exercises every filter. Chunks carry real CRCs."""
    import struct
    import zlib

    import numpy as np

    px = np.zeros((h, w, 3), dtype=np.uint8)  # RGB order
    px[:, :, 0] = (7 * np.arange(h, dtype=np.uint16)[:, None] % 256).astype(np.uint8)
    px[:, :, 1] = 77
    px[:, :, 2] = blue
    raw = bytearray()
    prev = np.zeros(w * 3, dtype=np.uint8)
    for y in range(h):
        row = px[y].reshape(-1)
        ft = y % 5
        raw.append(ft)
        raw += _png_filter_row(row, prev, ft).tobytes()
        prev = row

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def synth_png_media(docs: DataFrame) -> DataFrame:
    """Valid compressed PNG payloads per document: width =
    len(text) % 16 + 4, height = doc_id % 12 + 4 (>= 5 rows hits all
    five filter types), blue = doc_id % 256."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                _png_bytes(len(t) % 16 + 4, int(i) % 12 + 4, int(i) % 256)
                for i, t in zip(pdf["doc_id"], pdf["text"])
            ]
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": payloads})

    return docs.select("doc_id", "text").mapInPandas(
        build,
        T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )


def _parse_png(b: bytes, mid: object = None):
    """Shared PNG parse used by BOTH decode paths (ADVICE r06: the
    resize path had duplicated the chunk walk minus every validation):
    verify signature + per-chunk CRC, require IHDR, reject unsupported
    depth/color/interlace with NotImplementedError, inflate IDAT,
    reverse the scanline filters. Returns an (h, w, 3) uint8 array."""
    import struct
    import zlib

    import numpy as np

    if b[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError(f"media {mid}: not a PNG")
    pos, ihdr, idat = len(_PNG_SIG), None, bytearray()
    while pos < len(b):
        if pos + 8 > len(b):
            raise ValueError(f"media {mid}: truncated chunk header")
        (length,) = struct.unpack_from(">I", b, pos)
        # A corrupt length field would otherwise run struct.unpack_from
        # past the buffer and surface as a bare struct.error, bypassing
        # the ValueError contract (ADVICE r07 #2).
        if pos + 12 + length > len(b):
            raise ValueError(f"media {mid}: truncated chunk")
        tag = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", b, pos + 8 + length)
        if crc != zlib.crc32(tag + data) & 0xFFFFFFFF:
            raise ValueError(f"media {mid}: CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError(f"media {mid}: missing IHDR")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or color != 2 or interlace != 0:
        raise NotImplementedError(
            f"media {mid}: only 8-bit truecolor non-interlaced "
            f"supported (depth={depth}, color={color}, "
            f"interlace={interlace})"
        )
    stream = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = w * 3 + 1  # +1 filter byte per scanline
    if stream.size != stride * h:
        raise ValueError(f"media {mid}: truncated pixel stream")
    rows = stream.reshape(h, stride)
    prev = np.zeros(w * 3, dtype=np.uint8)
    px = np.empty((h, w, 3), dtype=np.uint8)
    for y in range(h):
        prev = _png_unfilter_row(int(rows[y, 0]), rows[y, 1:], prev)
        px[y] = prev.reshape(w, 3)
    return px


def decode_png(media: DataFrame) -> DataFrame:
    """REAL compressed-image decode, stdlib only: verify the signature
    and every chunk CRC, parse IHDR, inflate the IDAT stream with zlib,
    reverse the per-scanline filters, and compute channel stats.
    Supports truecolor 8-bit non-interlaced (color type 2) — palette/
    alpha/16-bit/interlaced raise NotImplementedError, keeping the
    honest-stub discipline for the unimplemented corners."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {f.name: [] for f in BMP_SCHEMA.fields}
            for mid, raw in zip(pdf["media_id"], pdf["content"]):
                px = _parse_png(bytes(raw), mid)
                h, w = px.shape[0], px.shape[1]
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["n_pixels"].append(w * h)
                out["corner_red"].append(int(px[0, 0, 0]))
                out["sum_red"].append(int(px[:, :, 0].astype(np.int64).sum()))
                out["mean_blue"].append(int(round(float(px[:, :, 2].mean()))))
            yield pd.DataFrame(out)

    return media.mapInPandas(parse, BMP_SCHEMA)


@probe(
    "x4e_png_decode",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(length(text) % 16 + 4 AS INTEGER) AS width,
           CAST(doc_id % 12 + 4 AS INTEGER) AS height,
           CAST((length(text) % 16 + 4) * (doc_id % 12 + 4) AS BIGINT) AS n_pixels,
           0 AS corner_red,
           CAST((length(text) % 16 + 4) * 7 * (doc_id % 12 + 4) * (doc_id % 12 + 3) / 2
                AS BIGINT) AS sum_red,
           CAST(doc_id % 256 AS INTEGER) AS mean_blue
    FROM documents
    """,
)
def x4e_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 fourth real codec — and the first COMPRESSED one: every doc
    becomes a valid truecolor PNG (DEFLATE-compressed, CRC'd chunks,
    filter type cycling 0-4 across rows) and is decoded back by the
    stdlib-zlib parser. sum_red certifies every scanline survived all
    five unfilter branches; the header-derived fields are deterministic
    functions of the source docs, so DuckDB re-derives the decode
    output without seeing the binary."""
    d = widen_scan(load_table(spark, sf_dir, "documents"))  # r18: parallel decode
    return decode_png(synth_png_media(d))


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("src_w", T.IntegerType()),
        T.StructField("src_h", T.IntegerType()),
        T.StructField("out_size", T.IntegerType()),
        T.StructField("sum_red_resized", T.LongType()),
        T.StructField("mean_blue_resized", T.IntegerType()),
    ]
)


def decode_and_resize_png(media: DataFrame, out_size: int = 8) -> DataFrame:
    """REAL image resize on the real codec path: decode each PNG
    (CRC-verified, inflated, unfiltered — the decode_png machinery),
    then nearest-neighbor-resample to ``out_size`` x ``out_size`` with
    numpy index arithmetic (src index = floor(dst * src / out)), and
    emit channel stats of the RESIZED image. This is the
    thumbnail/vision-preprocessing step of a multimodal training
    pipeline, end-to-end real from container bytes to resampled
    pixels."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {f.name: [] for f in RESIZE_SCHEMA.fields}
            for mid, raw in zip(pdf["media_id"], pdf["content"]):
                px = _parse_png(bytes(raw), mid)
                h, w = px.shape[0], px.shape[1]
                # nearest-neighbor resample
                ys = (np.arange(out_size) * h) // out_size
                xs = (np.arange(out_size) * w) // out_size
                small = px[np.ix_(ys, xs)]
                out["media_id"].append(mid)
                out["src_w"].append(w)
                out["src_h"].append(h)
                out["out_size"].append(out_size)
                out["sum_red_resized"].append(
                    int(small[:, :, 0].astype(np.int64).sum())
                )
                out["mean_blue_resized"].append(
                    int(round(float(small[:, :, 2].mean())))
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(parse, RESIZE_SCHEMA)


@probe(
    "x4f_png_resize",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(length(text) % 16 + 4 AS INTEGER) AS src_w,
           CAST(doc_id % 12 + 4 AS INTEGER) AS src_h,
           8 AS out_size,
           CAST(8 * list_sum(list_transform(range(0, 8),
                 j -> 7 * ((j * (doc_id % 12 + 4)) // 8))) AS BIGINT)
             AS sum_red_resized,
           CAST(doc_id % 256 AS INTEGER) AS mean_blue_resized
    FROM documents
    """,
)
def x4f_png_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 resize step, REAL end-to-end: synth PNG → stdlib decode →
    nearest-neighbor 8x8 resample → channel stats. The pixel law
    (red = 7·row, blue = doc_id % 256) lets DuckDB re-derive the
    RESIZED sums exactly: sampled source row for output row j is
    floor(j·h/8), so sum_red = 8·Σ_j 7·floor(j·h/8) — the oracle
    certifies the resampling index arithmetic, not just the decode."""
    d = widen_scan(load_table(spark, sf_dir, "documents"))  # r18: parallel decode
    return decode_and_resize_png(synth_png_media(d))


# ---------------------------------------------------------------------------
# X4g — baseline JPEG (ITU-T T.81 / JFIF), stdlib + numpy only.
#
# The fifth real codec and the first ENTROPY-CODED one: PNG exercised
# DEFLATE via zlib, but JPEG's Huffman layer has no stdlib shortcut, so
# both the encoder and decoder below implement it from the spec —
# canonical Huffman tables read from DHT, DC prediction, (run, size)
# AC run-length coding, ZRL/EOB, byte stuffing, restart markers,
# dequantization, 8x8 IDCT, 4:2:0 chroma upsampling, and JFIF
# YCbCr->RGB. Progressive (SOF2) / arithmetic (SOF9+) / 12-bit stay
# behind NotImplementedError — the honest-stub discipline.
#
# Oracle strategy (JPEG is lossy, so exactness needs construction):
# quantization tables are all-ones and every synthesized block is
# DCT-sparse-exact — a constant level (DC only) plus one AC basis
# coefficient at (u, v) = (4, 4), whose IDCT contribution is
# F/8 * (+-1) per pixel because cos((2x+1)pi/4) = +-sqrt(2)/2 and the
# basis product squares to exactly 1/8. Both terms reconstruct to
# integers (float error ~1e-13 << rounding slack), so DuckDB re-derives
# the decoded pixel sums from the synthesis law without touching bytes.
# Extension beyond the reference surface (the reference pipeline carries
# no media; demo_images/ there is documentation).
# ---------------------------------------------------------------------------

#: zigzag position k -> (u, v): even diagonals run bottom-left to
#: top-right (u descending), odd ones the reverse (T.81 figure 5).
_JPEG_ZZ = sorted(
    ((u, v) for u in range(8) for v in range(8)),
    key=lambda t: (t[0] + t[1], -t[0] if (t[0] + t[1]) % 2 == 0 else t[0]),
)
_JPEG_ZZ_INDEX = {uv: k for k, uv in enumerate(_JPEG_ZZ)}

#: Minimal spec-valid Huffman tables (BITS[1..16], HUFFVAL), written to
#: DHT and read back by the decoder — the decoder never assumes them.
#: DC: all 12 categories at 4 bits (12 codes of 16; all-ones unused).
#: AC luma: EOB, ZRL, and the (run=6, size=6) symbol the synthesized
#: AC(4,4)=40 coefficient needs after two ZRLs (zigzag index 39 ->
#: 38 leading zeros = 16+16+6). AC chroma: EOB only.
_JPEG_DC_BITS = [0, 0, 0, 12] + [0] * 12
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_LUMA_BITS = [0, 3] + [0] * 14
_JPEG_AC_LUMA_VALS = [0x00, 0xF0, 0x66]
_JPEG_AC_CHROMA_BITS = [0, 1] + [0] * 14
_JPEG_AC_CHROMA_VALS = [0x00]


def _jpeg_huff_encode_table(bits: list[int], vals: list[int]) -> dict:
    """Canonical Huffman assignment (T.81 annex C): symbol -> (code, length)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _jpeg_huff_decode_table(bits: list[int], vals: list[int]) -> dict:
    """Canonical Huffman assignment for decode: (length, code) -> symbol."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _JpegBitWriter:
    """MSB-first bit accumulator with T.81 byte stuffing (0xFF -> 0xFF00)."""

    def __init__(self):
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self._n -= 8
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
        self._acc &= (1 << self._n) - 1

    def align(self) -> None:
        """Pad to a byte boundary with 1-bits (spec: fill bits are 1s)."""
        if self._n:
            self.write((1 << (8 - self._n)) - 1, 8 - self._n)


def _jpeg_enc_block(w: _JpegBitWriter, zz: list[int], pred: int,
                    dc_tab: dict, ac_tab: dict) -> int:
    """Entropy-encode one block given its zigzag coefficient vector;
    returns the new DC predictor. Generic (run, size) RLE — the table
    lookup raises KeyError if the data needs a symbol the fixed tables
    don't carry, which is an encoder-side assertion, not a decode path."""
    diff = zz[0] - pred
    s = abs(diff).bit_length()
    code, ln = dc_tab[s]
    w.write(code, ln)
    if s:
        w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    run = 0
    for k in range(1, last_nz + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            zc, zl = ac_tab[0xF0]
            w.write(zc, zl)
            run -= 16
        s2 = abs(v).bit_length()
        ac, al = ac_tab[(run << 4) | s2]
        w.write(ac, al)
        w.write(v if v > 0 else v + (1 << s2) - 1, s2)
        run = 0
    if last_nz < 63:
        ec, el = ac_tab[0x00]
        w.write(ec, el)
    return zz[0]


def _jpeg_bytes(y_vals, cb_off: int, amp: int = 5,
                restart_interval: int = 2) -> bytes:
    """Serialize a baseline 4:2:0 JFIF JPEG. ``y_vals`` is an (hb, wb)
    array of per-8x8-block luma levels (hb, wb even); every Y block is
    that constant plus an AC(4,4) checkerboard of amplitude ``amp``;
    chroma is Cb = 128 + cb_off, Cr = 128 image-wide. All-ones quant
    tables keep the file losslessly round-trippable (see section
    comment). Emits DQT/SOF0/DHT/DRI/SOS with restart markers every
    ``restart_interval`` MCUs."""
    import struct

    import numpy as np

    y_vals = np.asarray(y_vals, dtype=np.int64)
    hb, wb = y_vals.shape
    if hb % 2 or wb % 2:
        raise ValueError("4:2:0 synthesis needs even block counts")
    h, w = hb * 8, wb * 8

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes([1] * 64) + bytes([1]) + bytes([1] * 64))
    out += seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, 0x22, 0])   # Y: 2x2 sampling, qtable 0
        + bytes([2, 0x11, 1])   # Cb: 1x1, qtable 1
        + bytes([3, 0x11, 1]),  # Cr
    )
    dht = bytearray()
    for cls, tid, bits, vals in (
        (0, 0, _JPEG_DC_BITS, _JPEG_DC_VALS),
        (0, 1, _JPEG_DC_BITS, _JPEG_DC_VALS),
        (1, 0, _JPEG_AC_LUMA_BITS, _JPEG_AC_LUMA_VALS),
        (1, 1, _JPEG_AC_CHROMA_BITS, _JPEG_AC_CHROMA_VALS),
    ):
        dht += bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
    out += seg(0xC4, bytes(dht))
    out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    dc_tab = _jpeg_huff_encode_table(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_luma = _jpeg_huff_encode_table(_JPEG_AC_LUMA_BITS, _JPEG_AC_LUMA_VALS)
    ac_chroma = _jpeg_huff_encode_table(_JPEG_AC_CHROMA_BITS, _JPEG_AC_CHROMA_VALS)
    k44 = _JPEG_ZZ_INDEX[(4, 4)]

    writer = _JpegBitWriter()
    preds = [0, 0, 0]
    rst = 0
    n_mcus = (hb // 2) * (wb // 2)
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            writer.align()
            writer.buf += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            preds = [0, 0, 0]
        my, mx = divmod(m, wb // 2)
        for r in range(2):
            for c in range(2):
                zz = [0] * 64
                zz[0] = 8 * (int(y_vals[2 * my + r, 2 * mx + c]) - 128)
                zz[k44] = 8 * amp
                preds[0] = _jpeg_enc_block(writer, zz, preds[0], dc_tab, ac_luma)
        for comp, level in ((1, cb_off), (2, 0)):
            zz = [0] * 64
            zz[0] = 8 * level
            preds[comp] = _jpeg_enc_block(
                writer, zz, preds[comp], dc_tab, ac_chroma
            )
    writer.align()
    return bytes(out) + bytes(writer.buf) + b"\xff\xd9"  # EOI


class _JpegBitReader:
    """MSB-first bit reader over one entropy-coded segment (stuffing
    already stripped). Running past the end raises ValueError — a
    truncated scan, not an index error."""

    def __init__(self, data: bytes, mid: object = None):
        import numpy as np

        self._bits = np.unpackbits(np.frombuffer(bytes(data), dtype=np.uint8))
        self._pos = 0
        self._mid = mid

    def read_bit(self) -> int:
        if self._pos >= self._bits.size:
            raise ValueError(f"media {self._mid}: truncated JPEG scan")
        b = int(self._bits[self._pos])
        self._pos += 1
        return b

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _jpeg_huff_read(reader: _JpegBitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _jpeg_extend(v: int, s: int) -> int:
    """T.81 EXTEND: map an s-bit magnitude to its signed value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _jpeg_idct_mat():
    import numpy as np

    u = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    m = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    m[0] *= 1 / np.sqrt(2)
    return m


def _parse_jpeg(b: bytes, mid: object = None):
    """Baseline sequential JPEG decoder, stdlib + numpy: marker walk,
    DQT/DHT/SOF0/DRI/SOS parse, Huffman + DC-prediction entropy decode
    with byte-unstuffing and restart handling, dequantize, de-zigzag,
    8x8 IDCT, per-component clip, chroma upsample to the luma grid, and
    JFIF YCbCr->RGB. Returns an (h, w, 3) uint8 array. Progressive /
    arithmetic / hierarchical frames and 12-bit precision raise
    NotImplementedError; malformed or truncated streams raise
    ValueError tagged with the media id."""
    import struct

    import numpy as np

    if len(b) < 4 or b[:2] != b"\xff\xd8":
        raise ValueError(f"media {mid}: not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    scan = None
    pos = 2
    while pos < len(b):
        if b[pos] != 0xFF:
            raise ValueError(f"media {mid}: expected marker at byte {pos}")
        while pos < len(b) and b[pos] == 0xFF:
            pos += 1  # fill bytes
        if pos >= len(b):
            raise ValueError(f"media {mid}: truncated marker stream")
        marker = b[pos]
        pos += 1
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7:  # stray RST outside a scan
            continue
        if pos + 2 > len(b):
            raise ValueError(f"media {mid}: truncated segment header")
        (length,) = struct.unpack_from(">H", b, pos)
        if pos + length > len(b):
            raise ValueError(f"media {mid}: truncated segment")
        payload = b[pos + 2 : pos + length]
        pos += length
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(payload):
                pq, tq = payload[i] >> 4, payload[i] & 15
                i += 1
                if pq:
                    vals = np.frombuffer(payload[i : i + 128], dtype=">u2")
                    i += 128
                else:
                    vals = np.frombuffer(payload[i : i + 64], dtype=np.uint8)
                    i += 64
                qt[tq] = vals.astype(np.int64)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(payload):
                cls, tid = payload[i] >> 4, payload[i] & 15
                bits = list(payload[i + 1 : i + 17])
                n = sum(bits)
                vals = list(payload[i + 17 : i + 17 + n])
                huff[(cls, tid)] = _jpeg_huff_decode_table(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/1: baseline / ext. sequential
            precision, fh, fw, nc = struct.unpack_from(">BHHB", payload, 0)
            if precision != 8:
                raise NotImplementedError(
                    f"media {mid}: {precision}-bit JPEG unsupported"
                )
            comps = []
            for ci in range(nc):
                cid, samp, tq = payload[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, samp >> 4, samp & 15, tq))
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"media {mid}: only baseline sequential JPEG supported "
                f"(SOF marker 0x{marker:02X} is progressive/arithmetic/"
                f"hierarchical)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", payload, 0)
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            ns = payload[0]
            scan_comps = []
            for ci in range(ns):
                cs, tabs = payload[1 + 2 * ci], payload[2 + 2 * ci]
                scan_comps.append((cs, tabs >> 4, tabs & 15))
            scan = (scan_comps, pos)
            break
        # else: APPn / COM / unknown — skipped via the length field
    if frame is None or scan is None:
        raise ValueError(f"media {mid}: missing SOF or SOS")
    fh, fw, comps = frame
    scan_comps, data_pos = scan

    # Split the entropy-coded data into restart segments, stripping
    # byte stuffing; stop at the first non-RST marker.
    segments, cur = [], bytearray()
    i = data_pos
    while i < len(b):
        byte = b[i]
        if byte == 0xFF:
            nxt = b[i + 1] if i + 1 < len(b) else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # EOI or next marker
        cur.append(byte)
        i += 1
    segments.append(bytes(cur))

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))
    planes = {
        cid: np.zeros((mcus_y * vi * 8, mcus_x * hi * 8), dtype=np.float64)
        for cid, hi, vi, _ in comps
    }
    comp_by_id = {cid: (hi, vi, tq) for cid, hi, vi, tq in comps}
    idct = _jpeg_idct_mat()
    zz_u = np.array([uv[0] for uv in _JPEG_ZZ])
    zz_v = np.array([uv[1] for uv in _JPEG_ZZ])

    # Validate every table selector ONCE before entropy decode: a corrupt
    # stream (SOS before DHT/DQT, or a bad selector byte) must surface as
    # the documented media-id-tagged ValueError, not a bare KeyError
    # (ADVICE r08 — same contract _parse_png enforces for chunk lengths).
    for cs, td, ta in scan_comps:
        if cs not in comp_by_id:
            raise ValueError(f"media {mid}: scan references undefined component {cs}")
        if (0, td) not in huff or (1, ta) not in huff:
            raise ValueError(
                f"media {mid}: undefined Huffman table (dc={td}, ac={ta})"
            )
        if comp_by_id[cs][2] not in qt:
            raise ValueError(
                f"media {mid}: undefined quantization table {comp_by_id[cs][2]}"
            )

    seg_idx = 0
    reader = _JpegBitReader(segments[0], mid)
    preds = {cid: 0 for cid, *_ in comps}
    for m in range(mcus_x * mcus_y):
        if restart_interval and m and m % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError(f"media {mid}: missing restart segment")
            reader = _JpegBitReader(segments[seg_idx], mid)
            preds = {cid: 0 for cid, *_ in comps}
        my, mx = divmod(m, mcus_x)
        for cs, td, ta in scan_comps:
            hi, vi, tq = comp_by_id[cs]
            dc_tab, ac_tab = huff[(0, td)], huff[(1, ta)]
            for r in range(vi):
                for c in range(hi):
                    s = _jpeg_huff_read(reader, dc_tab)
                    diff = _jpeg_extend(reader.receive(s), s)
                    preds[cs] += diff
                    zz = np.zeros(64, dtype=np.int64)
                    zz[0] = preds[cs]
                    k = 1
                    while k < 64:
                        sym = _jpeg_huff_read(reader, ac_tab)
                        if sym == 0x00:  # EOB
                            break
                        if sym == 0xF0:  # ZRL
                            k += 16
                            continue
                        k += sym >> 4
                        if k > 63:
                            raise ValueError(
                                f"media {mid}: AC run past block end"
                            )
                        zz[k] = _jpeg_extend(
                            reader.receive(sym & 15), sym & 15
                        )
                        k += 1
                    coef = np.zeros((8, 8), dtype=np.float64)
                    coef[zz_u, zz_v] = zz * qt[tq]
                    block = idct.T @ coef @ idct + 128.0
                    y0 = (my * vi + r) * 8
                    x0 = (mx * hi + c) * 8
                    planes[cs][y0 : y0 + 8, x0 : x0 + 8] = block
    # Per-component sample clip (T.81 output precision), then upsample
    # chroma to the luma grid and convert per JFIF.
    up = {}
    for cid, hi, vi, _ in comps:
        p = np.clip(np.floor(planes[cid] + 0.5), 0, 255)
        if vmax // vi > 1:
            p = np.repeat(p, vmax // vi, axis=0)
        if hmax // hi > 1:
            p = np.repeat(p, hmax // hi, axis=1)
        up[cid] = p[:fh, :fw]
    ids = [c[0] for c in comps]
    if len(ids) == 1:
        y = up[ids[0]]
        rgb = np.stack([y, y, y], axis=-1)
    else:
        y, cb, cr = up[ids[0]], up[ids[1]], up[ids[2]]
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        bl = y + 1.772 * (cb - 128.0)
        rgb = np.stack([r, g, bl], axis=-1)
    return np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)


JPEG_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("corner_red", T.IntegerType()),
        T.StructField("sum_red", T.LongType()),
        T.StructField("sum_blue", T.LongType()),
        T.StructField("sum_green", T.LongType()),
    ]
)


def synth_jpeg_media(docs: DataFrame) -> DataFrame:
    """Valid baseline 4:2:0 JFIF payloads per document: width =
    16·(doc_id % 2 + 1), height = 16·(len(text) % 2 + 1); per-8x8-block
    luma level (doc_id·7 + by·16 + bx·5) % 224 + 16 (kept inside
    [16, 239] so the +-5 AC checkerboard and the chroma shift never
    clip); Cb = 128 + (doc_id % 7 - 3), Cr = 128. The varying per-block
    DC walks the Huffman categories and signs; the fixed AC(4,4)
    coefficient exercises ZRL runs; DRI=2 plants restart markers."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = []
            for i, t in zip(pdf["doc_id"], pdf["text"]):
                i = int(i)
                wb = 2 * (i % 2 + 1)
                hb = 2 * (len(t) % 2 + 1)
                y = (
                    i * 7
                    + 16 * np.arange(hb, dtype=np.int64)[:, None]
                    + 5 * np.arange(wb, dtype=np.int64)[None, :]
                ) % 224 + 16
                payloads.append(_jpeg_bytes(y, i % 7 - 3))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": payloads})

    return docs.select("doc_id", "text").mapInPandas(
        build,
        T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )


def decode_jpeg(media: DataFrame) -> DataFrame:
    """REAL entropy-coded image decode, stdlib + numpy only: Huffman
    tables read from DHT, DC prediction, run-length AC, restart
    markers, dequantize, IDCT, 4:2:0 upsample, JFIF YCbCr->RGB — then
    per-channel stats of the reconstructed RGB image. Progressive and
    arithmetic-coded files raise NotImplementedError (honest stub for
    the unimplemented corners, as with PNG's palette/interlace)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {f.name: [] for f in JPEG_SCHEMA.fields}
            for mid, raw in zip(pdf["media_id"], pdf["content"]):
                px = _parse_jpeg(bytes(raw), mid)
                h, w = px.shape[0], px.shape[1]
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["n_pixels"].append(w * h)
                out["corner_red"].append(int(px[0, 0, 0]))
                out["sum_red"].append(int(px[:, :, 0].astype(np.int64).sum()))
                out["sum_blue"].append(int(px[:, :, 2].astype(np.int64).sum()))
                out["sum_green"].append(int(px[:, :, 1].astype(np.int64).sum()))
            yield pd.DataFrame(out)

    return media.mapInPandas(parse, JPEG_SCHEMA)




def _media_fixture(spark: SparkSession, sf_dir: str, name: str, synth_fn):
    """Synthesized media payloads as a shared on-disk fixture: the
    synthesizers are pure functions of `documents`, and ENCODING is
    harness overhead, not what the decode probes certify — so the
    expensive encoders (JPEG's per-block Huffman walk, GIF's LZW) run
    once per (testdata state, codec-module version) instead of on
    every invocation (the driver invokes each probe twice; bench
    another two). The module-source hash rides the build closure as a
    scalar, so ANY codec edit invalidates every media fixture — codec
    fixtures trade a coarse rebuild (~seconds) for never serving
    stale encodings."""
    import hashlib

    from realtime_financial_transactions_data_pipeline_spark.caching import (
        disk_fixture,
        source_fingerprint,
    )

    with open(__file__, "rb") as fh:
        module_ver = hashlib.md5(fh.read()).hexdigest()[:8]

    def build(tmp: str) -> None:
        assert module_ver  # closure scalar -> folded into the recipe token
        # widen_scan (r18): encode in parallel AND land one part file
        # per partition, so the fixture READ is a multi-split scan and
        # every consumer's decode pass parallelizes — the single-file
        # fixture made x4g/x4i/x4j decode on one task regardless of
        # cores.
        synth_fn(
            widen_scan(load_table(spark, sf_dir, "documents"))
        ).write.mode("overwrite").parquet(tmp)

    path = disk_fixture(name, source_fingerprint(sf_dir, "documents"), build)
    return spark.read.parquet(path)


@probe(
    "x4g_jpeg_decode",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             2 * (doc_id % 2 + 1) AS wb,
             2 * (length(text) % 2 + 1) AS hb,
             doc_id % 7 - 3 AS cb
      FROM documents),
    s AS (
      SELECT doc_id, wb, hb, cb,
             list_sum(list_transform(range(0, wb * hb),
               i -> (doc_id * 7 + (i // wb) * 16 + (i % wb) * 5) % 224 + 16
             )) AS vsum
      FROM m)
    SELECT doc_id AS media_id,
           CAST(8 * wb AS INTEGER) AS width,
           CAST(8 * hb AS INTEGER) AS height,
           CAST(64 * wb * hb AS BIGINT) AS n_pixels,
           CAST((doc_id * 7) % 224 + 16 + 5 AS INTEGER) AS corner_red,
           CAST(64 * vsum AS BIGINT) AS sum_red,
           CAST(64 * vsum + 64 * wb * hb * FLOOR(1.772 * cb + 0.5) AS BIGINT)
             AS sum_blue,
           CAST(64 * vsum + 64 * wb * hb * FLOOR(-0.344136 * cb + 0.5) AS BIGINT)
             AS sum_green
    FROM s
    """,
)
def x4g_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 fifth real codec, first ENTROPY-CODED one (VERDICT r07 #2):
    every doc becomes a valid baseline 4:2:0 JFIF (per-block DC walk,
    AC(4,4) checkerboard, two DHT table pairs, restart interval 2) and
    is decoded back by the from-spec Huffman+IDCT parser. The all-ones
    quant tables and DCT-sparse-exact synthesis make the lossy codec
    lossless on these files, so DuckDB re-derives per-channel pixel
    sums from the synthesis law: sum_red certifies luma DC+AC across
    every block, corner_red the checkerboard sign, sum_blue/sum_green
    the chroma DC path and the JFIF conversion rounding."""
    media = _media_fixture(spark, sf_dir, "x4g-jpeg-media", synth_jpeg_media)
    return decode_jpeg(media)


# ---------------------------------------------------------------------------
# X4h — audio feature extraction (the audio-preprocessing step of a
# multimodal training pipeline): RMS energy, zero-crossing count, and
# FFT dominant frequency over decoded PCM. All numpy (rfft included) —
# no codec libs needed because the container format is PCM-WAV.
#
# Oracle strategy: tones are synthesized with an INTEGER number of
# cycles per window (freq = k·sr/N for integer bin k), so the rfft
# peak lands exactly on bin k with no spectral leakage — DuckDB never
# runs an FFT, it re-derives k from the synthesis law. RMS and
# zero-crossings are integer-exact: sum of squared int16 samples stays
# far below 2^53, so Spark's numpy sum and DuckDB's list_sum compute
# the same exact integer before the one final sqrt.
# ---------------------------------------------------------------------------

_TONE_N = 1024  # samples per clip (power of two for the rfft)
_TONE_AMP = 16384


def synth_tone_media(docs: DataFrame) -> DataFrame:
    """Valid PCM-WAV payloads, each a pure sine tone at FFT bin
    k = doc_id % 300 + 20 (an exact integer number of cycles in the
    {_TONE_N}-sample window): sample[n] = floor(16384·sin(2π·k·n/N)
    + 0.5) at {_WAV_RATE} Hz. floor(x+0.5) instead of round() keeps
    the quantization engine-portable (banker's rounding differs)."""
    import struct

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        n = np.arange(_TONE_N, dtype=np.float64)
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                k = int(doc_id) % 300 + 20
                x = np.floor(
                    _TONE_AMP * np.sin(2 * np.pi * k * n / _TONE_N) + 0.5
                ).astype("<i2")
                payloads.append(_wav_bytes(x.tobytes()))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": payloads})

    return docs.select("doc_id").mapInPandas(
        build,
        T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sum_sq", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("n_zero_crossings", T.LongType()),
        T.StructField("dominant_bin", T.LongType()),
        T.StructField("dominant_hz", T.DoubleType()),
    ]
)


def audio_features(media: DataFrame) -> DataFrame:
    """REAL audio feature extraction over decoded PCM: RMS energy
    (from the exact integer sum of squares), zero-crossing count
    (strict sign changes, x[n-1]·x[n] < 0), and the dominant frequency
    via numpy rfft argmax over bins 1..N/2 (DC excluded). Arrow-batched
    mapInPandas — at 100 TB this is a map-only pass, one FFT per clip,
    no shuffle."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {f.name: [] for f in AUDIO_FEATURES_SCHEMA.fields}
            for mid, raw in zip(pdf["media_id"], pdf["content"]):
                rate, n_ch, _bits, samples = _parse_wav(bytes(raw), mid)
                if n_ch != 1:
                    raise ValueError(f"media {mid}: feature pass expects mono")
                x = samples.astype(np.float64)
                n = x.size
                sum_sq = int((samples.astype(np.int64) ** 2).sum())
                zc = int(((x[:-1] * x[1:]) < 0).sum())
                mag = np.abs(np.fft.rfft(x))
                dom = int(np.argmax(mag[1:]) + 1)  # skip DC
                out["media_id"].append(mid)
                out["n_samples"].append(n)
                out["sum_sq"].append(sum_sq)
                out["rms"].append(float(np.sqrt(sum_sq / n)))
                out["n_zero_crossings"].append(zc)
                out["dominant_bin"].append(dom)
                out["dominant_hz"].append(dom * rate / n)
            yield pd.DataFrame(out)

    return media.mapInPandas(feats, AUDIO_FEATURES_SCHEMA)


@probe(
    "x4h_audio_features",
    oracle=f"""
    WITH m AS (SELECT doc_id, doc_id % 300 + 20 AS k FROM documents),
    s AS (
      SELECT doc_id, k,
             list_transform(range(0, {_TONE_N}),
               n -> CAST(floor({_TONE_AMP} * sin(2 * pi() * k * n / {_TONE_N})
                         + 0.5) AS BIGINT)) AS x
      FROM m)
    SELECT doc_id AS media_id,
           CAST({_TONE_N} AS BIGINT) AS n_samples,
           CAST(list_sum(list_transform(x, v -> v * v)) AS BIGINT) AS sum_sq,
           round(sqrt(list_sum(list_transform(x, v -> v * v)) / {_TONE_N}.0), 6)
             AS rms,
           CAST(len(list_filter(range(1, {_TONE_N}),
                                n -> x[n] * x[n + 1] < 0)) AS BIGINT)
             AS n_zero_crossings,
           CAST(k AS BIGINT) AS dominant_bin,
           k * {_WAV_RATE} / {_TONE_N}.0 AS dominant_hz
    FROM s
    """,
)
def x4h_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4h — audio preprocessing, REAL end-to-end: synth pure tones as
    PCM-WAV, parse the container, and extract RMS / zero-crossings /
    FFT dominant frequency. The integer-cycle synthesis law puts the
    spectral peak exactly on bin k = doc_id % 300 + 20, so the DuckDB
    oracle re-derives the FFT's answer analytically and replays RMS
    and zero-crossings integer-exactly from the same quantized sine —
    the hash certifies the whole decode→window→FFT→argmax path without
    DuckDB running an FFT. rms is rounded to 6 dp on both sides (the
    sum of squares is exact; only the final sqrt is floating)."""
    d = widen_scan(load_table(spark, sf_dir, "documents"))  # r18: parallel decode
    feats = audio_features(synth_tone_media(d))
    return feats.select(
        "media_id",
        "n_samples",
        "sum_sq",
        dround(F.col("rms"), 6).alias("rms"),
        "n_zero_crossings",
        "dominant_bin",
        "dominant_hz",
    )


# ---------------------------------------------------------------------------
# GIF — the last common image container within from-spec stdlib reach
# (VERDICT r08 #5): an 87a/89a chunk walk + a full LZW codec (variable
# code width, early-change growth, KwKwK, 4096-entry freeze) built the
# same way as the PNG/JPEG pair — synthesizer and parser are mirrored
# from the GIF89a spec, and the probe hash-checks per-pixel sums
# against a synthesis-law oracle. Interlaced storage, local color
# tables, animation, partial-frame compositing with all three
# disposal methods (do-not-dispose, restore-to-background,
# restore-to-previous; reserved methods rejected at GCE parse), and
# GCE transparency masking are all decoded for real — the GIF89a
# rendering feature set is complete (plain-text extensions are walked
# and skipped, not rendered).
# ---------------------------------------------------------------------------

_GIF_MAX_CODE = 4096  # 12-bit ceiling; both sides freeze the table here


def _gif_lzw_encode(indices, mcs: int) -> bytes:
    """GIF-variant LZW encoder (LSB-first bit packing, clear/EOI codes,
    code width mcs+1..12). Width grows when the next free code no
    longer fits the current width — the encoder bumps at
    ``next == 2**width + 1`` because the decoder's table lags the
    encoder's by exactly one entry (it can only reconstruct an entry
    after reading the FOLLOWING code), so its mirrored bump at
    ``next == 2**width`` lands on the same code boundary. At 4096 the
    table freezes (deferred clear) on both sides."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = mcs + 1
    table: dict[tuple, int] = {(i,): i for i in range(clear)}
    nxt = eoi + 1
    emit(clear, width)
    cur: tuple = ()
    for sym in indices:
        cand = cur + (int(sym),)
        if cand in table:
            cur = cand
            continue
        emit(table[cur], width)
        if nxt < _GIF_MAX_CODE:
            table[cand] = nxt
            nxt += 1
            if nxt == (1 << width) + 1 and width < 12:
                width += 1
        cur = (int(sym),)
    if cur:
        emit(table[cur], width)
    # End-of-stream width sync: the decoder's add-count catches up to
    # the encoder's exactly here (the encoder never adds after its
    # final code; the decoder never adds after its first), so the
    # usual one-entry lag vanishes for the EOI read. If the table size
    # lands exactly on 2**width, the decoder's early-change rule bumps
    # BEFORE reading EOI — mirror it or the EOI code desyncs (found by
    # the exhaustive-shape test: 10x14 = 127 data codes hits 256
    # exactly at mcs=7).
    if nxt == (1 << width) and width < 12:
        width += 1
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_lzw_decode(data: bytes, mcs: int, mid: object = None) -> list[int]:
    """Mirror of :func:`_gif_lzw_encode`: LSB-first variable-width code
    stream -> index list. Handles mid-stream clear codes, the KwKwK
    case (``code == next``), early-change width growth at
    ``next == 2**width``, and the 4096-entry freeze."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    table: dict[int, tuple] = {i: (i,) for i in range(clear)}
    nxt = eoi + 1
    out: list[int] = []
    prev: int | None = None
    acc = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError(f"media {mid}: LZW stream ended without EOI")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = {i: (i,) for i in range(clear)}
            nxt = eoi + 1
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:
            if code >= clear:
                raise ValueError(f"media {mid}: first LZW code {code} not a literal")
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == nxt:
            entry = table[prev] + (table[prev][0],)  # KwKwK
        else:
            raise ValueError(f"media {mid}: LZW code {code} out of range")
        out.extend(entry)
        if prev is not None and nxt < _GIF_MAX_CODE:
            table[nxt] = table[prev] + (entry[0],)
            nxt += 1
            if nxt == (1 << width) and width < 12:
                width += 1
        prev = code


_GIF_PALETTE_N = 128  # 2**7 entries; every synthesized index < 117 fits


def _gif_interlace_order(h: int) -> list:
    """The four-pass GIF row interleave: rows are STORED pass 1 (every
    8th from 0), pass 2 (every 8th from 4), pass 3 (every 4th from 2),
    pass 4 (every 2nd from 1); entry j is the DISPLAY row of the j-th
    stored row."""
    return (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )


def _gif_bytes(
    w: int, h: int, blue: int, interlaced: bool = False, local_palette: bool = False
) -> bytes:
    """Serialize a GIF89a: 128-entry palette (entry i = (i, 77,
    ``blue``)), one image whose pixel index at (x, y) is ``7*y + x``
    (max 7*14 + 18 = 116 < 128), real LZW-compressed data sub-blocks.
    ``interlaced`` stores the rows in the four-pass interleave;
    ``local_palette`` moves the color table into the image descriptor
    (no global table at all). The red law matches the PNG
    synthesizer's row ramp plus a column ramp, so decoded channel sums
    have a closed form regardless of the storage variant."""
    import struct

    import numpy as np

    mcs = 7  # log2(palette size); LZW codes start at 8 bits
    palette = bytearray()
    for i in range(_GIF_PALETTE_N):
        palette += bytes((i, 77, blue))
    y_idx, x_idx = np.mgrid[0:h, 0:w]
    px_rows = 7 * y_idx + x_idx
    if interlaced:
        px_rows = px_rows[_gif_interlace_order(h)]
    lzw = _gif_lzw_encode(px_rows.reshape(-1), mcs)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)  # sub-block terminator
    gct_packed = 0x70 if local_palette else 0xF0 | (mcs - 1)
    img_packed = (0x40 if interlaced else 0) | (
        0x80 | (mcs - 1) if local_palette else 0
    )
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, gct_packed, 0, 0)
        + (b"" if local_palette else bytes(palette))
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, w, h, img_packed)
        + (bytes(palette) if local_palette else b"")
        + bytes((mcs,))
        + bytes(blocks)
        + b"\x3b"
    )


def synth_gif_media(docs: DataFrame) -> DataFrame:
    """Valid GIF payloads per document, same dimension law as the PNG
    synthesizer: width = len(text) % 16 + 4, height = doc_id % 12 + 4,
    palette blue = doc_id % 256."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                _gif_bytes(len(t) % 16 + 4, int(i) % 12 + 4, int(i) % 256)
                for i, t in zip(pdf["doc_id"], pdf["text"])
            ]
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": payloads})

    return docs.select("doc_id", "text").mapInPandas(
        build,
        T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )


def _parse_gif_frames(b: bytes, mid: object = None):
    """GIF parse shared by the still and animated paths: signature,
    logical screen descriptor, global color table, extension-block
    skipping (GCE/comment/application), one-or-more image blocks, LZW
    decode, interlace row reordering, local-or-global palette lookup.
    Returns a list of (sh, sw, 3) uint8 RGB arrays, one per frame —
    each the full logical screen AFTER compositing: a frame smaller
    than the screen is pasted onto the previous canvas at its
    (left, top) offset (do-not-dispose semantics; the first frame must
    cover the screen so the canvas is never undefined), and a Graphic
    Control Extension's transparent index masks the paste — transparent
    pixels keep the canvas value (background-initialized from the
    LSD's color index). Structural corruption raises the
    media-id-tagged ValueError (the PNG/JPEG contract)."""
    import struct

    import numpy as np

    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError(f"media {mid}: not a GIF")
    if len(b) < 13:
        raise ValueError(f"media {mid}: truncated screen descriptor")
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", b, 6)
    pos = 13

    def read_palette(p: int, pk: int, kind: str):
        n = 2 << (pk & 0x07)
        if p + 3 * n > len(b):
            raise ValueError(f"media {mid}: truncated {kind} color table")
        pal = np.frombuffer(b, dtype=np.uint8, count=3 * n, offset=p).reshape(n, 3)
        return pal, p + 3 * n

    gpalette = None
    if packed & 0x80:
        gpalette, pos = read_palette(pos, packed, "global")

    def skip_subblocks(p: int) -> int:
        while True:
            if p >= len(b):
                raise ValueError(f"media {mid}: truncated sub-blocks")
            n = b[p]
            p += 1 + n
            if n == 0:
                return p

    frames = []
    canvas = None  # the base the NEXT image block composites onto
    trans_idx = None  # set by a GCE, consumed by the next image block
    disposal = 0  # ditto: how the NEXT frame's region is disposed
    while True:
        if pos >= len(b):
            raise ValueError(f"media {mid}: missing trailer")
        block = b[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label byte + sub-blocks
            if pos >= len(b):
                raise ValueError(f"media {mid}: truncated extension")
            # A Graphic Control Extension applies to the NEXT image —
            # and a new GCE REPLACES any pending one, so a GCE without
            # the transparency flag clears a previously recorded index.
            if b[pos] == 0xF9:
                # The GCE data block is spec-fixed at 4 bytes; verify
                # the size byte instead of assuming the field offsets.
                if pos + 5 >= len(b):
                    raise ValueError(f"media {mid}: truncated GCE")
                if b[pos + 1] != 4:
                    raise ValueError(
                        f"media {mid}: GCE block size {b[pos + 1]}, expected 4"
                    )
                gpacked = b[pos + 2]
                trans_idx = b[pos + 5] if gpacked & 0x01 else None
                disposal = (gpacked >> 2) & 0x07
                if disposal > 3:
                    raise ValueError(
                        f"media {mid}: reserved GIF disposal method {disposal}"
                    )
            pos = skip_subblocks(pos + 1)
            continue
        if block != 0x2C:
            raise ValueError(f"media {mid}: unknown block 0x{block:02x}")
        if pos + 9 > len(b):
            raise ValueError(f"media {mid}: truncated image descriptor")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", b, pos)
        pos += 9
        if ipacked & 0x80:  # local color table overrides the global one
            palette, pos = read_palette(pos, ipacked, "local")
        elif gpalette is not None:
            palette = gpalette
        else:
            raise ValueError(f"media {mid}: no color table for image")
        if left + w > sw or top + h > sh:
            raise ValueError(
                f"media {mid}: frame {left},{top} {w}x{h} exceeds "
                f"screen {sw}x{sh}"
            )
        if canvas is None and (left, top, w, h) != (0, 0, sw, sh):
            raise ValueError(
                f"media {mid}: first frame must cover the screen "
                f"(got {left},{top} {w}x{h} vs {sw}x{sh})"
            )
        if pos >= len(b):
            raise ValueError(f"media {mid}: missing LZW minimum code size")
        mcs = b[pos]
        pos += 1
        if not 2 <= mcs <= 11:
            raise ValueError(f"media {mid}: bad LZW minimum code size {mcs}")
        lzw = bytearray()
        while True:
            if pos >= len(b):
                raise ValueError(f"media {mid}: truncated image data")
            n = b[pos]
            pos += 1
            if n == 0:
                break
            lzw += b[pos : pos + n]
            pos += n
        indices = np.array(_gif_lzw_decode(bytes(lzw), mcs, mid), dtype=np.int64)
        if indices.size != w * h:
            raise ValueError(
                f"media {mid}: LZW decoded {indices.size} pixels, expected {w * h}"
            )
        if indices.size and int(indices.max()) >= palette.shape[0]:
            raise ValueError(f"media {mid}: pixel index past palette end")
        idx2 = indices.reshape(h, w)
        if ipacked & 0x40:  # interlaced: stored rows -> display rows
            disp = np.empty_like(idx2)
            disp[_gif_interlace_order(h)] = idx2
            idx2 = disp
        px = palette[idx2]
        # Composite onto the running canvas: each emitted frame is the
        # full screen after this image's paste. The initial canvas is
        # the LSD background color (through the global palette) so a
        # transparent region in an early frame shows the spec'd
        # background, not garbage.
        if canvas is None:
            canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
            if gpalette is not None and _bg < gpalette.shape[0]:
                canvas[:, :] = gpalette[_bg]
        base = canvas
        composed = base.copy()
        if trans_idx is None:
            composed[top : top + h, left : left + w] = px
        else:
            opaque = idx2 != trans_idx
            composed[top : top + h, left : left + w][opaque] = px[opaque]
        frames.append(composed)
        # The GCE's disposal method decides what the NEXT frame
        # composites onto: 0/1 keep this frame, 2 restores the frame's
        # region to the background color, 3 restores the pre-paste
        # canvas (reserved methods already rejected at GCE parse).
        if disposal == 2:
            canvas = composed.copy()
            bgcolor = (
                gpalette[_bg]
                if gpalette is not None and _bg < gpalette.shape[0]
                else np.zeros(3, dtype=np.uint8)
            )
            canvas[top : top + h, left : left + w] = bgcolor
        elif disposal == 3:
            canvas = base
        else:
            canvas = composed
        trans_idx = None  # a GCE governs exactly one rendering block
        disposal = 0
    if not frames:
        raise ValueError(f"media {mid}: no image block before trailer")
    return frames


def _parse_gif(b: bytes, mid: object = None):
    """Single-image wrapper over :func:`_parse_gif_frames`: the still
    decode contract returns one (h, w, 3) array; a multi-frame file is
    an error here — callers wanting frames use
    :func:`gif_frame_sample` / ``_parse_gif_frames`` directly."""
    frames = _parse_gif_frames(b, mid)
    if len(frames) > 1:
        raise ValueError(
            f"media {mid}: {len(frames)} frames in still-image decode "
            "(use gif_frame_sample for animations)"
        )
    return frames[0]


def decode_gif(media: DataFrame) -> DataFrame:
    """REAL GIF decode, stdlib + numpy only: container walk, full LZW
    decompression, interlace reordering, local/global palette lookup,
    channel stats — the same output contract as :func:`decode_bmp` /
    :func:`decode_png`."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {f.name: [] for f in BMP_SCHEMA.fields}
            for mid, raw in zip(pdf["media_id"], pdf["content"]):
                px = _parse_gif(bytes(raw), mid)
                h, w = px.shape[0], px.shape[1]
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["n_pixels"].append(w * h)
                out["corner_red"].append(int(px[0, 0, 0]))
                out["sum_red"].append(int(px[:, :, 0].astype(np.int64).sum()))
                out["mean_blue"].append(int(round(float(px[:, :, 2].mean()))))
            yield pd.DataFrame(out)

    return media.mapInPandas(parse, BMP_SCHEMA)


@probe(
    "x4i_gif_decode",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(length(text) % 16 + 4 AS INTEGER) AS width,
           CAST(doc_id % 12 + 4 AS INTEGER) AS height,
           CAST((length(text) % 16 + 4) * (doc_id % 12 + 4) AS BIGINT) AS n_pixels,
           0 AS corner_red,
           CAST((length(text) % 16 + 4) * 7 * (doc_id % 12 + 4) * (doc_id % 12 + 3) // 2
                + (doc_id % 12 + 4) * (length(text) % 16 + 4) * (length(text) % 16 + 3) // 2
                AS BIGINT) AS sum_red,
           CAST(doc_id % 256 AS INTEGER) AS mean_blue
    FROM documents
    """,
)
def x4i_gif_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4i — sixth real codec, second COMPRESSED one: every doc becomes
    a valid GIF89a (128-entry palette, real LZW data stream) and is
    decoded back by the from-spec LZW decoder. The pixel-index law
    7*y + x makes sum_red a closed form — w*7*h*(h-1)/2 (row ramp)
    + h*w*(w-1)/2 (column ramp) — so DuckDB re-derives the decode
    output without seeing the binary; a wrong code-width bump, a
    mangled KwKwK entry, or a palette misread all shift sum_red and
    break the hash."""
    media = _media_fixture(spark, sf_dir, "x4i-gif-media", synth_gif_media)
    return decode_gif(media)


# ---------------------------------------------------------------------------
# Animated GIF + frame sampling (x4j) — the video-shaped training-data
# op (decode container -> sample every k-th frame -> per-frame stats),
# exercised on the one multi-frame container the stdlib codec family
# can decode for real. Partial frames composite onto the running
# canvas and GCE transparency masks the paste — full GIF89a.
# ---------------------------------------------------------------------------


def _gif_anim_bytes(w: int, h: int, blue: int, n_frames: int) -> bytes:
    """Serialize an animated GIF89a: one global 128-entry palette, a
    Netscape looping application extension, and ``n_frames``
    full-screen frames each preceded by a Graphic Control Extension.
    Frame f's pixel index at (x, y) is ``7*y + x + f`` (max 116 + f,
    so f <= 11 stays inside the palette) — each frame's channel sums
    shift by a closed-form f * w * h."""
    import struct

    import numpy as np

    mcs = 7
    palette = bytearray()
    for i in range(_GIF_PALETTE_N):
        palette += bytes((i, 77, blue))
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0xF0 | (mcs - 1), 0, 0)
    out += palette
    # Netscape 2.0 looping extension — a real-world application block
    # the parser must skip (sub-block id 1, loop count 0 = forever).
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    y_idx, x_idx = np.mgrid[0:h, 0:w]
    base = 7 * y_idx + x_idx
    for f in range(n_frames):
        # Graphic Control Extension: 4-byte block, 4/100 s delay, no
        # transparency, disposal 1 (do not dispose).
        out += b"\x21\xf9\x04" + bytes((0x04, 4, 0, 0)) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out += bytes((mcs,))
        lzw = _gif_lzw_encode((base + f).reshape(-1), mcs)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)


def synth_gif_anim_media(docs: DataFrame) -> DataFrame:
    """Animated-GIF payloads per document: the still synthesizer's
    dimension law plus n_frames = doc_id % 6 + 2 (2..7 frames)."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                _gif_anim_bytes(
                    len(t) % 16 + 4, int(i) % 12 + 4, int(i) % 256, int(i) % 6 + 2
                )
                for i, t in zip(pdf["doc_id"], pdf["text"])
            ]
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": payloads})

    return docs.select("doc_id", "text").mapInPandas(
        build,
        T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_id", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sum_red", T.LongType()),
        T.StructField("mean_blue", T.IntegerType()),
    ]
)


def gif_frame_sample(media: DataFrame, every_k: int = 2) -> DataFrame:
    """Video-style frame sampling over animated GIFs: decode the whole
    container ONCE per item in Arrow batches, emit one row per sampled
    frame (frames 0, k, 2k, ...) with per-frame channel stats. The
    map-only shape scales like every decode op here — no shuffle, rows
    fan out ~n_frames/k per input item."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {f.name: [] for f in FRAME_SCHEMA.fields}
            for mid, raw in zip(pdf["media_id"], pdf["content"]):
                frames = _parse_gif_frames(bytes(raw), mid)
                for fid in range(0, len(frames), every_k):
                    px = frames[fid]
                    out["media_id"].append(mid)
                    out["frame_id"].append(fid)
                    out["n_frames"].append(len(frames))
                    out["width"].append(px.shape[1])
                    out["height"].append(px.shape[0])
                    out["sum_red"].append(int(px[:, :, 0].astype(np.int64).sum()))
                    out["mean_blue"].append(int(round(float(px[:, :, 2].mean()))))
            yield pd.DataFrame(out)

    return media.mapInPandas(parse, FRAME_SCHEMA)


@probe(
    "x4j_gif_frame_sample",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             length(text) % 16 + 4 AS w,
             doc_id % 12 + 4 AS h,
             doc_id % 256 AS blue,
             doc_id % 6 + 2 AS nf
      FROM documents),
    f AS (
      SELECT doc_id, w, h, blue, nf, unnest(range(0, nf, 2)) AS fid FROM m)
    SELECT doc_id AS media_id,
           CAST(fid AS INTEGER) AS frame_id,
           CAST(nf AS INTEGER) AS n_frames,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(w * 7 * h * (h - 1) // 2 + h * w * (w - 1) // 2
                + fid * w * h AS BIGINT) AS sum_red,
           CAST(blue AS INTEGER) AS mean_blue
    FROM f
    """,
)
def x4j_gif_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4j — multi-frame (video-shaped) decode + every-2nd-frame
    sampling: each doc becomes an animated GIF (2..7 full-screen
    frames, real per-frame LZW streams, GCE + Netscape-loop extension
    blocks the parser must walk), and the sampler emits per-frame
    channel stats. Frame f shifts every pixel index by f, so sum_red =
    still-image closed form + f*w*h and DuckDB replays the whole
    container->frames->sample->stats path analytically. Fan-out,
    ordering, and the frame-id arithmetic are all under the hash."""
    media = _media_fixture(spark, sf_dir, "x4j-gif-anim-media", synth_gif_anim_media)
    return gif_frame_sample(media, every_k=2)


# ---------------------------------------------------------------------------
# x4k — header-only media sniffing: the cheap metadata pass every media
# pipeline runs BEFORE expensive decode (route by container, partition
# by dimensions, triage corrupt files) — magic-byte detection + the
# minimal header walk per format, never touching pixel/sample payloads.
# ---------------------------------------------------------------------------

SNIFF_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("dim1", T.LongType()),  # images: width; wav: n_samples
        T.StructField("dim2", T.LongType()),  # images: height; wav: sample_rate
    ]
)


def _sniff_one(b: bytes):
    """(format, dim1, dim2) from headers alone. Corrupt/truncated
    headers and unknown magics classify as ('unknown', 0, 0) — a
    sniffer triages, it never throws."""
    import struct

    try:
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            # RIFF does not mandate chunk order — collect fmt and data
            # independently, derive n_samples at the end.
            pos, rate, block, data_size = 12, 0, 0, 0
            while pos + 8 <= len(b):
                tag = b[pos : pos + 4]
                (size,) = struct.unpack_from("<I", b, pos + 4)
                if tag == b"fmt ":
                    rate = struct.unpack_from("<I", b, pos + 12)[0]
                    block = struct.unpack_from("<H", b, pos + 20)[0]
                elif tag == b"data":
                    data_size = size
                pos += 8 + size + (size & 1)
            return "wav", data_size // max(block, 1), rate
        if b[:2] == b"P6":
            head = b[:64].split()
            return "ppm", int(head[1]), int(head[2])
        if b[:2] == b"BM":
            w, h = struct.unpack_from("<ii", b, 18)
            return "bmp", w, abs(h)
        if b[: len(_PNG_SIG)] == _PNG_SIG:
            w, h = struct.unpack_from(">II", b, 16)
            return "png", w, h
        if b[:2] == b"\xff\xd8":
            pos = 2
            while pos + 2 <= len(b):
                if b[pos] != 0xFF:
                    break
                # legal 0xFF fill bytes may pad before any marker
                while pos + 1 < len(b) and b[pos + 1] == 0xFF:
                    pos += 1
                marker = b[pos + 1]
                if marker == 0x01 or 0xD0 <= marker <= 0xD9:
                    pos += 2  # standalone marker, no length field
                    continue
                if pos + 4 > len(b):
                    break
                (size,) = struct.unpack_from(">H", b, pos + 2)
                if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
                    h, w = struct.unpack_from(">HH", b, pos + 5)
                    return "jpeg", w, h
                pos += 2 + size
            return "unknown", 0, 0
        if b[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack_from("<HH", b, 6)
            return "gif", w, h
        if b[:4] == b"qoif":
            w, h = struct.unpack_from(">II", b, 4)
            return "qoi", w, h
        if b[:3] == b"ID3" or (
            len(b) >= 2 and b[0] == 0xFF and b[1] & 0xE0 == 0xE0
        ):
            return _sniff_mp3(b)
        if b[4:8] == b"ftyp":
            return _sniff_mp4(b)
    except Exception:  # noqa: BLE001 — triage, never throw
        return "unknown", 0, 0
    return "unknown", 0, 0


#: MPEG audio frame-header tables (ISO/IEC 11172-3 / 13818-3): sample
#: rates by version, bitrates (kbps) by (version, layer), samples per
#: frame by (version, layer). Index 0 maps MPEG2.5, 2 -> MPEG2, 3 ->
#: MPEG1 (version bits); layer bits 1/2/3 -> III/II/I.
_MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000),
              0: (11025, 12000, 8000)}
_MP3_BITRATES = {
    (3, 1): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (3, 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (3, 3): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (2, 1): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (2, 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (2, 3): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
}
_MP3_BITRATES[(0, 1)] = _MP3_BITRATES[(2, 1)]
_MP3_BITRATES[(0, 2)] = _MP3_BITRATES[(2, 2)]
_MP3_BITRATES[(0, 3)] = _MP3_BITRATES[(2, 3)]
_MP3_SAMPLES = {(3, 1): 1152, (3, 2): 1152, (3, 3): 384,
                (2, 1): 576, (2, 2): 1152, (2, 3): 384,
                (0, 1): 576, (0, 2): 1152, (0, 3): 384}


def _sniff_mp3(b: bytes):
    """Walk MPEG audio frame headers: 4 bytes each carry version,
    layer, bitrate index, sample-rate index, and padding, which fix
    the frame's byte length — so the whole stream is walkable without
    touching a single audio sample. Returns ('mp3', n_frames,
    sample_rate) from the walk; an ID3v2 tag (syncsafe size) is
    skipped first. A stream whose first header is invalid classifies
    as unknown; a mid-stream corruption truncates the count at the
    last whole valid frame (triage semantics)."""
    import struct

    pos = 0
    if b[:3] == b"ID3" and len(b) >= 10:
        ss = struct.unpack_from(">4B", b, 6)
        pos = 10 + ((ss[0] << 21) | (ss[1] << 14) | (ss[2] << 7) | ss[3])
    n_frames, rate0 = 0, 0
    while pos + 4 <= len(b):
        h0, h1, h2 = b[pos], b[pos + 1], b[pos + 2]
        if h0 != 0xFF or h1 & 0xE0 != 0xE0:
            break
        version = (h1 >> 3) & 0x03  # 0=2.5, 2=2, 3=1 (1 reserved)
        layer = (h1 >> 1) & 0x03    # 1=III, 2=II, 3=I (0 reserved)
        br_idx, sr_idx = h2 >> 4, (h2 >> 2) & 0x03
        padding = (h2 >> 1) & 0x01
        if version == 1 or layer == 0 or br_idx in (0, 15) or sr_idx == 3:
            break
        rate = _MP3_RATES[version][sr_idx]
        kbps = _MP3_BITRATES[(version, layer)][br_idx]
        samples = _MP3_SAMPLES[(version, layer)]
        if layer == 3:  # Layer I: slots are 4 bytes, truncate pre-scale
            flen = (12 * kbps * 1000 // rate + padding) * 4
        else:
            flen = samples // 8 * kbps * 1000 // rate + padding
        if flen < 4 or pos + flen > len(b):
            break
        if n_frames == 0:
            rate0 = rate
        n_frames += 1
        pos += flen
    if n_frames == 0:
        return "unknown", 0, 0
    return "mp3", n_frames, rate0


def _sniff_mp4(b: bytes):
    """ISO BMFF box walk to the video sample entry: descend the pure
    container chain moov/trak/mdia/minf/stbl, skip stsd's
    version/flags + entry count, and read width/height straight from
    the avc1/hev1/hvc1/mp4v visual sample entry (bytes 24-27 of the
    entry body, ISO 14496-12 §12.1.3) — no mdat byte is ever touched.
    An MP4 without a recognized video entry still routes as
    ('mp4', 0, 0): container identification is the triage signal even
    when dimensions are absent."""
    import struct

    def walk(pos: int, end: int):
        while pos + 8 <= end:
            (size,) = struct.unpack_from(">I", b, pos)
            typ = b[pos + 4 : pos + 8]
            if size == 1:
                if pos + 16 > end:
                    return None
                (size,) = struct.unpack_from(">Q", b, pos + 8)
                body = pos + 16
            elif size == 0:
                size = end - pos
                body = pos + 8
            else:
                body = pos + 8
            box_end = pos + size
            if box_end <= pos or box_end > end:
                return None
            if typ in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
                r = walk(body, box_end)
                if r is not None:
                    return r
            elif typ == b"stsd":
                r = walk(body + 8, box_end)
                if r is not None:
                    return r
            elif typ in (b"avc1", b"hev1", b"hvc1", b"mp4v", b"encv"):
                if body + 28 <= box_end:
                    w, h = struct.unpack_from(">HH", b, body + 24)
                    return w, h
            pos = box_end
        return None

    dims = walk(0, len(b))
    if dims is None:
        return "mp4", 0, 0
    return "mp4", dims[0], dims[1]


def sniff_media(media: DataFrame) -> DataFrame:
    """Map-only Arrow-batched sniff over (media_id, content)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in SNIFF_SCHEMA.fields}
            for mid, raw in zip(pdf["media_id"], pdf["content"]):
                fmt, d1, d2 = _sniff_one(bytes(raw) if raw is not None else b"")
                out["media_id"].append(mid)
                out["format"].append(fmt)
                out["dim1"].append(int(d1))
                out["dim2"].append(int(d2))
            yield pd.DataFrame(out)

    return media.mapInPandas(run, SNIFF_SCHEMA)


@probe(
    "x4k_media_sniff",
    oracle=f"""
    SELECT doc_id AS media_id,
           CASE doc_id % 6 WHEN 0 THEN 'wav' WHEN 1 THEN 'ppm'
                WHEN 2 THEN 'bmp' WHEN 3 THEN 'png'
                WHEN 4 THEN 'jpeg' ELSE 'gif' END AS format,
           CAST(CASE doc_id % 6
             WHEN 0 THEN length(text) % 400 + 10
             WHEN 1 THEN length(text) % 32 + 4
             WHEN 2 THEN length(text) % 16 + 4
             WHEN 3 THEN length(text) % 16 + 4
             WHEN 4 THEN 16 * (doc_id % 2 + 1)
             ELSE length(text) % 16 + 4 END AS BIGINT) AS dim1,
           CAST(CASE doc_id % 6
             WHEN 0 THEN {_WAV_RATE}
             WHEN 1 THEN doc_id % 24 + 4
             WHEN 2 THEN doc_id % 12 + 4
             WHEN 3 THEN doc_id % 12 + 4
             WHEN 4 THEN 16 * (length(text) % 2 + 1)
             ELSE doc_id % 12 + 4 END AS BIGINT) AS dim2
    FROM documents
    """,
)
def x4k_media_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4k — mixed-container metadata pass: each doc becomes ONE of the
    six real containers (doc_id % 6 routes wav/ppm/bmp/png/jpeg/gif,
    full valid payloads from the codec synthesizers) and the sniffer
    must identify every format and read its dimensions from the header
    alone — no LZW/Huffman/inflate work. The oracle re-derives format
    and dims from each codec's synthesis law, so the hash certifies
    magic-byte routing plus six header parsers in one pass. This is
    the triage shape for 100 TB of crawled media: route-by-format and
    dimension partitioning cost one header read per object."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                i, t = int(doc_id), text
                kind = i % 6
                if kind == 0:
                    n = len(t) % 400 + 10
                    payloads.append(
                        _wav_bytes(np.full(n, i % 2000, dtype="<i2").tobytes())
                    )
                elif kind == 1:
                    w, h = len(t) % 32 + 4, i % 24 + 4
                    payloads.append(_ppm_bytes(np.zeros((h, w, 3), dtype=np.uint8)))
                elif kind == 2:
                    payloads.append(_bmp_bytes(len(t) % 16 + 4, i % 12 + 4, i % 256))
                elif kind == 3:
                    payloads.append(_png_bytes(len(t) % 16 + 4, i % 12 + 4, i % 256))
                elif kind == 4:
                    # (hb, wb) per-8x8-block grid -> image 8*hb x 8*wb
                    # = 16*(len%2+1) x 16*(i%2+1), the synth_jpeg law
                    wb, hb = 2 * (i % 2 + 1), 2 * (len(t) % 2 + 1)
                    y = np.full((hb, wb), 16 + (i * 7) % 224, dtype=np.int64)
                    payloads.append(_jpeg_bytes(y, i % 7 - 3))
                else:
                    payloads.append(_gif_bytes(len(t) % 16 + 4, i % 12 + 4, i % 256))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": payloads})

    def synth_mixed(docs: DataFrame) -> DataFrame:
        return docs.select("doc_id", "text").mapInPandas(
            build,
            T.StructType(
                [
                    T.StructField("media_id", T.LongType()),
                    T.StructField("content", T.BinaryType()),
                ]
            ),
        )

    media = _media_fixture(spark, sf_dir, "x4k-mixed-media", synth_mixed)
    return sniff_media(media)


# ---------------------------------------------------------------------------
# x4l — audio/video container sniffing (VERDICT r10 #4): mp3 frame-
# header walk and MP4 box walk, the two containers whose DECODE is
# honestly library-bound (the mp3/h264 stub at the top of this module)
# but whose TRIAGE is pure header arithmetic. This is what the 100 TB
# crawl pass actually needs from these formats: route-by-container,
# duration/dimension partitioning, corrupt-file quarantine — one
# header walk per object, zero codec work.
# ---------------------------------------------------------------------------


def _mp3_bytes(
    n_frames: int, sr_idx: int, br_idx: int, id3_pad: int = 0
) -> bytes:
    """Serialize an MPEG1 Layer III stream: ``n_frames`` frames of the
    exact header-derived length (144 * bitrate / rate, no padding
    bit), deterministic filler payload, optionally prefixed by an
    ID3v2.4 tag of ``id3_pad`` bytes (syncsafe size). Synthesis law
    mirrored by the x4l oracle."""
    import struct

    rate = _MP3_RATES[3][sr_idx]
    kbps = _MP3_BITRATES[(3, 1)][br_idx]
    flen = 144 * kbps * 1000 // rate
    out = bytearray()
    if id3_pad:
        out += b"ID3" + bytes((4, 0, 0))
        out += bytes(
            ((id3_pad >> 21) & 0x7F, (id3_pad >> 14) & 0x7F,
             (id3_pad >> 7) & 0x7F, id3_pad & 0x7F)
        )
        out += bytes((i * 7 + 3) % 256 for i in range(id3_pad))
    for f in range(n_frames):
        hdr = bytes((0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2), 0x00))
        out += hdr
        out += bytes((f * 31 + i * 11 + 5) % 256 for i in range(flen - 4))
    return bytes(out)


def _mp4_box(typ: bytes, payload: bytes) -> bytes:
    import struct

    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _mp4_bytes(w: int, h: int, mdat_n: int = 16) -> bytes:
    """Serialize a minimal ISO BMFF file: ftyp, a moov/trak/mdia/minf/
    stbl/stsd chain holding ONE avc1 visual sample entry (spec 78-byte
    body: width/height at bytes 24-27), and an mdat of deterministic
    filler. The avcC configuration record is where real encoders put
    SPS bytes; the sniffer reads the sample-entry dims, which ISO
    14496-15 requires to match the SPS — so header-only triage needs
    no bitstream parse."""
    import struct

    entry = (
        bytes(6) + struct.pack(">H", 1)          # reserved + data_ref_index
        + bytes(16)                               # pre_defined/reserved
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + bytes(4)                                # reserved
        + struct.pack(">H", 1)                    # frame_count
        + bytes(32)                               # compressorname
        + struct.pack(">Hh", 24, -1)              # depth, pre_defined
    )
    stsd = _mp4_box(
        b"stsd", bytes(4) + struct.pack(">I", 1) + _mp4_box(b"avc1", entry)
    )
    moov = _mp4_box(
        b"moov",
        _mp4_box(
            b"trak",
            _mp4_box(b"mdia", _mp4_box(b"minf", _mp4_box(b"stbl", stsd))),
        ),
    )
    ftyp = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomavc1")
    mdat = _mp4_box(b"mdat", bytes((i * 13 + 7) % 256 for i in range(mdat_n)))
    return ftyp + moov + mdat


@probe(
    "x4l_av_container_sniff",
    oracle="""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 2 = 0 THEN 'mp3' ELSE 'mp4' END AS format,
           CAST(CASE WHEN doc_id % 2 = 0 THEN length(text) % 20 + 2
                ELSE 16 * (length(text) % 8 + 1) END AS BIGINT) AS dim1,
           CAST(CASE WHEN doc_id % 2 = 0 THEN
                  CASE doc_id % 3 WHEN 0 THEN 44100
                       WHEN 1 THEN 48000 ELSE 32000 END
                ELSE 16 * (doc_id % 8 + 1) END AS BIGINT) AS dim2
    FROM documents
    """,
)
def x4l_av_container_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4l — mp3/MP4 triage: even docs become MPEG1 Layer III streams
    (sample rate from doc_id % 3, bitrate index doc_id % 5 + 5 so the
    frame STRIDE varies with the bitrate table, frame count from
    len(text) % 20 + 2, every fourth doc prefixed with an ID3v2 tag
    the walk must skip), odd docs become ISO BMFF files with one avc1
    sample entry (dims 16*(len%8+1) x 16*(doc_id%8+1)). The sniffer
    walks mp3 frame headers (counting frames certifies the
    version/layer/bitrate/rate tables — a wrong stride desyncs
    immediately) and descends the MP4 box tree to the sample entry's
    width/height. The oracle re-derives everything from the synthesis
    law, so the hash certifies both walks end-to-end. Decode of these
    containers stays honestly stubbed (module header); triage is the
    header-only op the crawl pass needs."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                i, t = int(doc_id), text
                if i % 2 == 0:
                    payloads.append(
                        _mp3_bytes(
                            len(t) % 20 + 2,
                            i % 3,
                            i % 5 + 5,
                            id3_pad=(i % 50 + 1) if i % 4 == 0 else 0,
                        )
                    )
                else:
                    payloads.append(
                        _mp4_bytes(
                            16 * (len(t) % 8 + 1),
                            16 * (i % 8 + 1),
                            mdat_n=len(t) % 32 + 1,
                        )
                    )
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": payloads})

    def synth_av(docs: DataFrame) -> DataFrame:
        return docs.select("doc_id", "text").mapInPandas(
            build,
            T.StructType(
                [
                    T.StructField("media_id", T.LongType()),
                    T.StructField("content", T.BinaryType()),
                ]
            ),
        )

    media = _media_fixture(spark, sf_dir, "x4l-av-media", synth_av)
    return sniff_media(media)


# ---------------------------------------------------------------------------
# QOI (x4m) — seventh real codec, third COMPRESSED one: the Quite OK
# Image format (qoiformat.org, public spec). One byte-stream of six op
# types (RUN / INDEX / DIFF / LUMA / RGB / RGBA) over a 64-entry
# running color index — small enough to implement from the spec
# completely, rich enough that a decoder bug in any op or in the index
# hash shifts the channel sums and breaks the oracle hash. Mirrored
# encoder + decoder, like the PNG/JPEG/GIF pairs.
# ---------------------------------------------------------------------------


def _qoi_hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def _qoi_bytes(px, channels: int = 3) -> bytes:
    """Spec-complete QOI encoder over an (h, w, 3|4) uint8 array:
    longest-run first, then index hit, then DIFF, then LUMA, else
    RGB/RGBA. The header declares ``channels``; alpha is 255
    throughout for RGB input."""
    import struct

    import numpy as np

    h, w = px.shape[0], px.shape[1]
    has_a = px.shape[2] == 4
    out = bytearray()
    out += b"qoif" + struct.pack(">IIBB", w, h, channels, 0)
    index = [(0, 0, 0, 0)] * 64
    prev = (0, 0, 0, 255)
    run = 0
    flat = px.reshape(-1, px.shape[2])
    for i in range(flat.shape[0]):
        p = flat[i]
        cur = (int(p[0]), int(p[1]), int(p[2]), int(p[3]) if has_a else 255)
        if cur == prev:
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        hpos = _qoi_hash(*cur)
        if index[hpos] == cur:
            out.append(hpos)
        else:
            index[hpos] = cur
            r, g, b, a = cur
            pr, pg, pb, pa = prev
            if a == pa:
                dr = (r - pr + 128) % 256 - 128
                dg = (g - pg + 128) % 256 - 128
                db = (b - pb + 128) % 256 - 128
                if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                    out.append(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
                elif (
                    -32 <= dg <= 31
                    and -8 <= dr - dg <= 7
                    and -8 <= db - dg <= 7
                ):
                    out.append(0x80 | (dg + 32))
                    out.append(((dr - dg + 8) << 4) | (db - dg + 8))
                else:
                    out += bytes((0xFE, r, g, b))
            else:
                out += bytes((0xFF, r, g, b, a))
        prev = cur
    if run:
        out.append(0xC0 | (run - 1))
    out += bytes(7) + b"\x01"
    return bytes(out)


def _parse_qoi(b: bytes, mid: object = None):
    """From-spec QOI decoder → (h, w, 3) uint8 RGB array (alpha
    tracked for the index hash and RGBA op, dropped on output).
    Truncation, a pixel overrun, and a missing/garbled end marker are
    errors — a decoder that silently pads corrupt streams poisons a
    training corpus."""
    import struct

    import numpy as np

    if len(b) < 14 or b[:4] != b"qoif":
        raise ValueError(f"media {mid}: not a QOI stream")
    w, h, channels, colorspace = struct.unpack_from(">IIBB", b, 4)
    if channels not in (3, 4) or colorspace not in (0, 1):
        raise ValueError(
            f"media {mid}: bad QOI header channels={channels} cs={colorspace}"
        )
    if w == 0 or h == 0 or w * h > 1 << 24:
        raise ValueError(f"media {mid}: unreasonable dims {w}x{h}")
    n = w * h
    out = np.empty((n, 4), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, bl, a = 0, 0, 0, 255
    pos, i = 14, 0
    while i < n:
        if pos >= len(b):
            raise ValueError(f"media {mid}: truncated QOI stream at pixel {i}")
        op = b[pos]
        pos += 1
        if op == 0xFE:  # RGB
            if pos + 3 > len(b):
                raise ValueError(f"media {mid}: truncated RGB op")
            r, g, bl = b[pos], b[pos + 1], b[pos + 2]
            pos += 3
        elif op == 0xFF:  # RGBA
            if pos + 4 > len(b):
                raise ValueError(f"media {mid}: truncated RGBA op")
            r, g, bl, a = b[pos], b[pos + 1], b[pos + 2], b[pos + 3]
            pos += 4
        elif op >> 6 == 0:  # INDEX
            r, g, bl, a = index[op]
        elif op >> 6 == 1:  # DIFF
            r = (r + ((op >> 4) & 3) - 2) % 256
            g = (g + ((op >> 2) & 3) - 2) % 256
            bl = (bl + (op & 3) - 2) % 256
        elif op >> 6 == 2:  # LUMA
            if pos >= len(b):
                raise ValueError(f"media {mid}: truncated LUMA op")
            dg = (op & 0x3F) - 32
            b2 = b[pos]
            pos += 1
            r = (r + dg + ((b2 >> 4) & 0xF) - 8) % 256
            g = (g + dg) % 256
            bl = (bl + dg + (b2 & 0xF) - 8) % 256
        else:  # RUN
            run = (op & 0x3F) + 1
            if i + run > n:
                raise ValueError(f"media {mid}: run past image end")
            out[i : i + run] = (r, g, bl, a)
            i += run
            continue
        index[_qoi_hash(r, g, bl, a)] = (r, g, bl, a)
        out[i] = (r, g, bl, a)
        i += 1
    if b[pos : pos + 8] != bytes(7) + b"\x01":
        raise ValueError(f"media {mid}: missing QOI end marker")
    if pos + 8 != len(b):
        # Strict corrupt-stream contract: the stream must END at the
        # end marker — trailing garbage means a corrupt/concatenated
        # payload, not a valid image (ADVICE r11).
        raise ValueError(f"media {mid}: trailing bytes after QOI end marker")
    return out[:, :3].reshape(h, w, 3)


def decode_qoi(media: DataFrame) -> DataFrame:
    """REAL QOI decode — same output contract as decode_bmp/png/gif."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {f.name: [] for f in BMP_SCHEMA.fields}
            for mid, raw in zip(pdf["media_id"], pdf["content"]):
                px = _parse_qoi(bytes(raw), mid)
                h, w = px.shape[0], px.shape[1]
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["n_pixels"].append(w * h)
                out["corner_red"].append(int(px[0, 0, 0]))
                out["sum_red"].append(int(px[:, :, 0].astype(np.int64).sum()))
                out["mean_blue"].append(int(round(float(px[:, :, 2].mean()))))
            yield pd.DataFrame(out)

    return media.mapInPandas(parse, BMP_SCHEMA)


def synth_qoi_media(docs: DataFrame) -> DataFrame:
    """Each doc becomes a QOI image with the x4i pixel law — red =
    7*y + x (dims keep it under 256), green 77, blue doc_id % 256 —
    so the channel sums keep their closed form. The +1 red ramp along
    a row makes the encoder emit DIFF ops; row wraps emit LUMA or RGB;
    later rows revisit earlier red values and hit the 64-entry index
    (INDEX ops) — four of the six op types from real data, the other
    two (RUN, RGBA) pinned by unit tests."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                i, t = int(doc_id), text
                w, h = len(t) % 16 + 4, i % 12 + 4
                y, x = np.mgrid[0:h, 0:w]
                px = np.stack(
                    [
                        (7 * y + x).astype(np.uint8),
                        np.full((h, w), 77, dtype=np.uint8),
                        np.full((h, w), i % 256, dtype=np.uint8),
                    ],
                    axis=2,
                )
                payloads.append(_qoi_bytes(px))
            yield pd.DataFrame({"media_id": pdf["doc_id"], "content": payloads})

    return docs.select("doc_id", "text").mapInPandas(
        build,
        T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        ),
    )


@probe(
    "x4m_qoi_decode",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(length(text) % 16 + 4 AS INTEGER) AS width,
           CAST(doc_id % 12 + 4 AS INTEGER) AS height,
           CAST((length(text) % 16 + 4) * (doc_id % 12 + 4) AS BIGINT) AS n_pixels,
           0 AS corner_red,
           CAST((length(text) % 16 + 4) * 7 * (doc_id % 12 + 4) * (doc_id % 12 + 3) // 2
                + (doc_id % 12 + 4) * (length(text) % 16 + 4) * (length(text) % 16 + 3) // 2
                AS BIGINT) AS sum_red,
           CAST(doc_id % 256 AS INTEGER) AS mean_blue
    FROM documents
    """,
)
def x4m_qoi_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4m — from-spec QOI round-trip: every doc becomes a real QOI
    stream (RUN/INDEX/DIFF/LUMA/RGB op soup over the 64-entry running
    index) and is decoded back; the x4i pixel law keeps sum_red in
    closed form so DuckDB re-derives the decode output without seeing
    a byte. A wrong DIFF bias, a mis-hashed index slot, or a LUMA
    half-delta error shifts sum_red and breaks the hash."""
    media = _media_fixture(spark, sf_dir, "x4m-qoi-media", synth_qoi_media)
    return decode_qoi(media)
