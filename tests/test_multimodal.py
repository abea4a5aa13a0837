"""Multimodal-column tests (X4): schema, deterministic synth, the
mapInPandas decode plumbing (stub), and the not-implemented gate for
real codecs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_financial_transactions_data_pipeline_spark.operators import multimodal


def test_media_schema_shape(spark, sf_dir):
    m = multimodal.synth_media(spark, sf_dir)
    assert [f.name for f in m.schema.fields] == [
        "media_id", "modality", "path", "content", "meta",
    ]
    assert dict(m.dtypes)["content"] == "binary"
    row = m.filter(F.col("modality") == "image").first()
    assert row.meta.width is not None and row.meta.sample_rate is None
    arow = m.filter(F.col("modality") == "audio").first()
    assert arow.meta.sample_rate == 16000 and arow.meta.width is None
    assert row.path.startswith("s3://media-bucket/image/")


def test_binary_matches_text_bytes(spark, sf_dir):
    m = multimodal.synth_media(spark, sf_dir).limit(5).collect()
    from pyspark.sql import functions as F

    from realtime_financial_transactions_data_pipeline_spark.tables import load_table

    # Fetch texts BY ID: widen_scan's round-robin repartition (r18)
    # makes limit(5) return five arbitrary docs, not the file's first
    # five — the old first-50 slice assumed scan order.
    ids = [r.media_id for r in m]
    texts = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isin(ids))
        .collect()
    }
    for r in m:
        assert bytes(r.content) == texts[r.media_id].encode("utf-8")
        assert r.meta.n_bytes == len(bytes(r.content))


def test_decode_stub_deterministic(spark, sf_dir):
    d1 = multimodal.decode_media(multimodal.synth_media(spark, sf_dir))
    d2 = multimodal.decode_media(multimodal.synth_media(spark, sf_dir))
    assert d1.exceptAll(d2).count() == 0
    row = d1.first()
    assert row.n_pixels == row.width * row.height
    assert row.checksum > 0


def test_decode_real_raises_not_implemented(spark, sf_dir):
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        multimodal.decode_media(
            multimodal.synth_media(spark, sf_dir), stub=False
        ).collect()


def test_wav_round_trip_decodes_real_header(spark):
    docs = spark.createDataFrame(
        [(4, "x" * 123), (10, "y" * 50)], ["doc_id", "text"]
    )
    out = {r.media_id: r for r in multimodal.decode_wav(
        multimodal.synth_wav_media(docs)).collect()}
    assert out[4].sample_rate == 8000
    assert out[4].n_channels == 1 and out[4].bits_per_sample == 16
    assert out[4].n_samples == 123 % 400 + 10
    assert out[4].amplitude == 4 % 2000
    assert out[10].duration_ms == (50 % 400 + 10) * 1000 // 8000


def test_ppm_round_trip_decodes_real_pixels(spark):
    docs = spark.createDataFrame([(7, "z" * 40)], ["doc_id", "text"])
    r = multimodal.decode_ppm(multimodal.synth_ppm_media(docs)).collect()[0]
    assert (r.width, r.height) == (40 % 32 + 4, 7 % 24 + 4)
    assert r.n_pixels == r.width * r.height
    assert r.mean_red == 7  # constant-red plane


def test_wav_decoder_rejects_garbage(spark):
    import pyspark.errors

    bad = spark.createDataFrame(
        [(1, bytearray(b"not a wav file at all........"))],
        "media_id LONG, content BINARY",
    )
    try:
        multimodal.decode_wav(bad).collect()
        raise AssertionError("garbage payload must fail decode")
    except Exception as exc:  # Py4J wraps the ValueError
        assert "RIFF" in str(exc) or "PythonException" in type(exc).__name__


def test_bmp_decode_flips_bottom_up_and_strips_padding(spark):
    """Width 5 forces 1 byte of row padding; the red gradient makes an
    unflipped read visible in corner_red."""
    from realtime_financial_transactions_data_pipeline_spark.operators.multimodal import (
        _bmp_bytes,
        decode_bmp,
    )

    rows = [(1, _bmp_bytes(5, 4, blue=9)), (2, _bmp_bytes(5, 4, blue=9, top_down=True))]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r.media_id: r for r in decode_bmp(media).collect()}
    for mid in (1, 2):  # bottom-up and top-down must decode identically
        r = got[mid]
        assert (r.width, r.height, r.n_pixels) == (5, 4, 20)
        assert r.corner_red == 0          # logical top row has red 0
        assert r.sum_red == 5 * 7 * (0 + 1 + 2 + 3)
        assert r.mean_blue == 9


def test_bmp_decode_rejects_compressed(spark):
    import struct

    from realtime_financial_transactions_data_pipeline_spark.operators.multimodal import (
        _bmp_bytes,
        decode_bmp,
    )

    good = bytearray(_bmp_bytes(4, 4, blue=1))
    struct.pack_into("<I", good, 14 + 16, 1)  # biCompression = BI_RLE8
    media = spark.createDataFrame(
        [(1, bytes(good))], "media_id long, content binary"
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="BI_RGB|NotImplemented"):
        decode_bmp(media).collect()


def test_png_roundtrip_all_filters():
    """Direct (no-Spark) round-trip: a 7-row image cycles filter types
    0-4 (plus repeats); decode must reproduce the exact pixel design."""
    import struct
    import zlib

    import numpy as np

    from realtime_financial_transactions_data_pipeline_spark.operators.multimodal import (
        _PNG_SIG,
        _png_bytes,
        _png_unfilter_row,
    )

    b = _png_bytes(5, 7, 200)
    assert b.startswith(_PNG_SIG)
    # Walk to the IDAT, inflate, unfilter, and check the pixel law.
    pos, idat = len(_PNG_SIG), b""
    while pos < len(b):
        (length,) = struct.unpack_from(">I", b, pos)
        tag = b[pos + 4 : pos + 8]
        if tag == b"IDAT":
            idat += b[pos + 8 : pos + 8 + length]
        pos += 12 + length
    stream = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    rows = stream.reshape(7, 5 * 3 + 1)
    assert sorted(set(rows[:, 0])) == [0, 1, 2, 3, 4]  # every filter used
    prev = np.zeros(15, dtype=np.uint8)
    for y in range(7):
        prev = _png_unfilter_row(int(rows[y, 0]), rows[y, 1:], prev)
        px = prev.reshape(5, 3)
        assert (px[:, 0] == 7 * y).all()      # red gradient
        assert (px[:, 1] == 77).all()         # green constant
        assert (px[:, 2] == 200).all()        # blue constant


def test_png_decode_spark_roundtrip(spark):
    from realtime_financial_transactions_data_pipeline_spark.operators.multimodal import (
        decode_png,
        synth_png_media,
    )

    docs = spark.createDataFrame(
        [(3, "x" * 10), (17, "y" * 23)], "doc_id long, text string"
    )
    out = {r.media_id: r for r in decode_png(synth_png_media(docs)).collect()}
    r = out[3]
    assert (r.width, r.height) == (10 % 16 + 4, 3 % 12 + 4)
    assert r.sum_red == r.width * 7 * r.height * (r.height - 1) // 2
    assert r.mean_blue == 3
    assert out[17].mean_blue == 17


def test_png_crc_corruption_raises(spark):
    import pytest as _pytest

    from realtime_financial_transactions_data_pipeline_spark.operators.multimodal import (
        _png_bytes,
        decode_png,
    )

    b = bytearray(_png_bytes(4, 5, 9))
    b[-17] ^= 0xFF  # flip a byte inside the IDAT payload
    df = spark.createDataFrame([(1, bytes(b))], "media_id long, content binary")
    with _pytest.raises(Exception, match="CRC mismatch|PythonException"):
        decode_png(df).collect()


def test_png_unsupported_color_type_raises(spark):
    import struct
    import zlib

    import pytest as _pytest

    from realtime_financial_transactions_data_pipeline_spark.operators.multimodal import (
        _PNG_SIG,
        decode_png,
    )

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    # Grayscale (color type 0) header — valid CRCs, unsupported layout.
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    b = _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(b"\x00" * 6)) + chunk(b"IEND", b"")
    df = spark.createDataFrame([(1, b)], "media_id long, content binary")
    with _pytest.raises(Exception, match="NotImplementedError|only 8-bit truecolor|PythonException"):
        decode_png(df).collect()


def test_png_truncated_stream_raises(spark):
    """A PNG whose IDAT inflates to fewer bytes than h scanlines must
    raise, not mis-decode."""
    import struct
    import zlib

    import pytest as _pytest

    from realtime_financial_transactions_data_pipeline_spark.operators.multimodal import (
        _PNG_SIG,
        decode_png,
    )

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    # Header claims 4x4 RGB but the stream holds one scanline.
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    idat = zlib.compress(b"\x00" + b"\x01" * 12)
    b = _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    df = spark.createDataFrame([(1, b)], "media_id long, content binary")
    with _pytest.raises(Exception, match="truncated|PythonException"):
        decode_png(df).collect()


def test_jpeg_roundtrip_exact():
    """Direct (no-Spark) round trip of the baseline JPEG codec: the
    DCT-sparse-exact synthesis (all-ones quant, per-block DC walk,
    AC(4,4) checkerboard) must decode bit-exactly, restart markers and
    all."""
    import numpy as np

    from realtime_financial_transactions_data_pipeline_spark.operators.multimodal import (
        _jpeg_bytes,
        _parse_jpeg,
    )

    for seed, hb, wb, cb in [(0, 2, 2, -3), (1, 4, 2, 0), (9, 2, 4, 3)]:
        y = (
            seed * 7
            + 16 * np.arange(hb, dtype=np.int64)[:, None]
            + 5 * np.arange(wb, dtype=np.int64)[None, :]
        ) % 224 + 16
        b = _jpeg_bytes(y, cb)
        assert b.startswith(b"\xff\xd8") and b.endswith(b"\xff\xd9")
        if (hb // 2) * (wb // 2) > 2:  # DRI=2: restart markers present
            assert any(bytes([0xFF, 0xD0 + i]) in b for i in range(8))
        px = _parse_jpeg(b)
        s = np.array([1, -1, -1, 1, 1, -1, -1, 1])
        checker = 5 * np.tile(np.outer(s, s), (hb, wb))
        exp_r = np.kron(y, np.ones((8, 8), dtype=np.int64)) + checker
        rc = int(np.floor(1.772 * cb + 0.5))
        gc = int(np.floor(-0.344136 * cb + 0.5))
        assert (px[:, :, 0] == exp_r).all()
        assert (px[:, :, 1] == exp_r + gc).all()
        assert (px[:, :, 2] == exp_r + rc).all()


def test_jpeg_decode_spark_roundtrip(spark):
    from realtime_financial_transactions_data_pipeline_spark.operators.multimodal import (
        decode_jpeg,
        synth_jpeg_media,
    )

    docs = spark.createDataFrame(
        [(3, "x" * 10), (18, "y" * 23)], "doc_id long, text string"
    )
    out = {r.media_id: r for r in decode_jpeg(synth_jpeg_media(docs)).collect()}
    r = out[3]
    assert (r.width, r.height) == (32, 16)  # doc 3: wb=4, len 10 even: hb=2
    assert r.corner_red == (3 * 7) % 224 + 16 + 5
    assert r.n_pixels == 32 * 16
    vsum = sum(
        (3 * 7 + by * 16 + bx * 5) % 224 + 16 for by in range(2) for bx in range(4)
    )
    assert r.sum_red == 64 * vsum
    assert out[18].width == 16


def test_jpeg_progressive_raises(spark):
    """Progressive (SOF2) files hit the honest NotImplementedError, not
    a wrong decode."""
    import pytest as _pytest

    from realtime_financial_transactions_data_pipeline_spark.operators.multimodal import (
        _jpeg_bytes,
        decode_jpeg,
    )
    import numpy as np

    b = bytearray(_jpeg_bytes(np.full((2, 2), 100), 0))
    i = b.index(b"\xff\xc0")
    b[i + 1] = 0xC2  # rewrite the frame marker to progressive
    df = spark.createDataFrame([(1, bytes(b))], "media_id long, content binary")
    with _pytest.raises(Exception, match="progressive|NotImplemented|PythonException"):
        decode_jpeg(df).collect()


def test_jpeg_truncated_scan_raises():
    import numpy as np
    import pytest as _pytest

    from realtime_financial_transactions_data_pipeline_spark.operators.multimodal import (
        _jpeg_bytes,
        _parse_jpeg,
    )

    b = _jpeg_bytes(np.full((2, 2), 100), 0)
    with _pytest.raises(ValueError, match="truncated"):
        _parse_jpeg(b[: len(b) - 8], mid=7)


def test_jpeg_undefined_table_selector_raises_tagged_valueerror():
    """ADVICE r08: a scan referencing a never-defined DHT table id must
    raise the documented media-id-tagged ValueError, not a bare
    KeyError (same contract as PNG's chunk-length guard)."""
    import numpy as np
    import pytest as _pytest

    from realtime_financial_transactions_data_pipeline_spark.operators.multimodal import (
        _jpeg_bytes,
        _parse_jpeg,
    )

    b = bytearray(_jpeg_bytes(np.full((8, 8), 100), 0))
    i = b.index(b"\xff\xda")
    # SOS layout: FFDA len(2) Ns cs1 (td<<4|ta) ... — corrupt comp 1's
    # table-selector byte to point at Huffman tables that were never
    # defined by any DHT segment.
    b[i + 6] = 0x33
    with _pytest.raises(ValueError, match="media 9: undefined Huffman"):
        _parse_jpeg(bytes(b), mid=9)


def test_jpeg_grayscale_single_component():
    """The decoder handles single-component (grayscale, no-subsampling)
    frames — a file shape the 4:2:0 synthesizer never emits."""
    import struct

    import numpy as np

    from realtime_financial_transactions_data_pipeline_spark.operators.multimodal import (
        _JPEG_AC_CHROMA_BITS,
        _JPEG_AC_CHROMA_VALS,
        _JPEG_DC_BITS,
        _JPEG_DC_VALS,
        _JpegBitWriter,
        _jpeg_enc_block,
        _jpeg_huff_encode_table,
        _parse_jpeg,
    )

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    v = 173
    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes([1] * 64))
    out += seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    dht = bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
    dht += bytes([0x10]) + bytes(_JPEG_AC_CHROMA_BITS) + bytes(_JPEG_AC_CHROMA_VALS)
    out += seg(0xC4, dht)
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    w = _JpegBitWriter()
    zz = [0] * 64
    zz[0] = 8 * (v - 128)
    _jpeg_enc_block(
        w,
        zz,
        0,
        _jpeg_huff_encode_table(_JPEG_DC_BITS, _JPEG_DC_VALS),
        _jpeg_huff_encode_table(_JPEG_AC_CHROMA_BITS, _JPEG_AC_CHROMA_VALS),
    )
    w.align()
    px = _parse_jpeg(bytes(out) + bytes(w.buf) + b"\xff\xd9")
    assert px.shape == (8, 8, 3)
    assert (px == v).all()


# ---------------------------------------------------------------------------
# Codec-availability re-probe (VERDICT r07 #6): these tests LIGHT UP —
# fail with wiring instructions — the round an external codec library
# appears in the container, so a non-stub path can't silently stay
# unwired. While the libs are absent they skip, and the stub contract
# stays pinned by test_decode_real_raises_not_implemented.
# ---------------------------------------------------------------------------
import importlib.util as _ilu

_CODEC_LIBS = {
    "PIL": "wire decode_media(stub=False) images to PIL.Image and add a "
           "hash-checked probe alongside x4g_jpeg_decode",
    "soundfile": "wire audio decode to soundfile and extend decode_wav's "
                 "oracle pattern to compressed audio",
    "cv2": "wire video frame-sampling to cv2.VideoCapture behind "
           "decode_media(stub=False)",
    "librosa": "wire mp3/ogg decode to librosa.load",
}


@pytest.mark.parametrize("lib", sorted(_CODEC_LIBS))
def test_codec_lib_appeared_requires_wiring(lib):
    if _ilu.find_spec(lib) is None:
        pytest.skip(f"{lib} absent from container (re-probed every run)")
    pytest.fail(
        f"{lib} is now importable — the decode_media(stub=False) stub is "
        f"no longer honest: {_CODEC_LIBS[lib]}"
    )


# ---------------------------------------------------------------------------
# GIF / LZW (x4i)
# ---------------------------------------------------------------------------


def test_gif_lzw_roundtrip_properties():
    """The encoder/decoder pair must agree across code sizes, width
    growth (early-change at 2^w), the KwKwK case, and the 4096-entry
    table freeze — a 20k-symbol low-alphabet stream forces every one
    of those paths."""
    import random

    from realtime_financial_transactions_data_pipeline_spark.operators.multimodal import (
        _gif_lzw_decode,
        _gif_lzw_encode,
    )

    rng = random.Random(11)
    for mcs in (2, 4, 7):
        for trial in range(8):
            n = rng.choice([1, 7, 400, 20000])
            k = 1 << mcs
            alphabet = min(3, k) if trial % 2 else k
            seq = [rng.randrange(alphabet) for _ in range(n)]
            assert _gif_lzw_decode(_gif_lzw_encode(seq, mcs), mcs) == seq
    # KwKwK explicitly: a run of one symbol makes the encoder emit a
    # code the decoder has not finished defining yet.
    assert _gif_lzw_decode(_gif_lzw_encode([1] * 9, 2), 2) == [1] * 9


def test_gif_roundtrip_exact():
    """Direct (no-Spark) round-trip: decode must reproduce the exact
    pixel law (index 7*y + x through the (i, 77, blue) palette)."""
    import numpy as np

    from realtime_financial_transactions_data_pipeline_spark.operators.multimodal import (
        _gif_bytes,
        _parse_gif,
    )

    # EVERY shape the synthesizer can emit: the 10x14 case lands the
    # LZW table size exactly on 2^width at stream end and caught the
    # encoder-side EOI width-sync bug — keep the sweep exhaustive.
    for w in range(4, 20):
        for h in range(4, 16):
            blue = (w * h) % 256
            for interlaced in (False, True):
                for local_palette in (False, True):
                    px = _parse_gif(
                        _gif_bytes(w, h, blue, interlaced=interlaced,
                                   local_palette=local_palette),
                        mid=(w, h),
                    )
                    assert px.shape == (h, w, 3)
                    y, x = np.mgrid[0:h, 0:w]
                    assert (px[:, :, 0] == (7 * y + x)).all()
                    assert (px[:, :, 1] == 77).all()
                    assert (px[:, :, 2] == blue).all()


def test_gif_decode_spark_roundtrip(spark):
    from realtime_financial_transactions_data_pipeline_spark.operators.multimodal import (
        decode_gif,
        synth_gif_media,
    )

    docs = spark.createDataFrame(
        [(3, "x" * 10), (17, "y" * 23)], "doc_id long, text string"
    )
    out = {r.media_id: r for r in decode_gif(synth_gif_media(docs)).collect()}
    r = out[3]
    assert (r.width, r.height) == (10 % 16 + 4, 3 % 12 + 4)
    assert r.sum_red == (
        r.width * 7 * r.height * (r.height - 1) // 2
        + r.height * r.width * (r.width - 1) // 2
    )
    assert r.corner_red == 0
    assert r.mean_blue == 3
    assert out[17].mean_blue == 17


def test_gif_unsupported_variants_raise():
    """Structural corruption hits the media-id-tagged ValueError; the
    remaining honest stub (GCE transparency) is covered in
    test_gif_partial_frame_compositing."""
    import pytest as _pytest

    from realtime_financial_transactions_data_pipeline_spark.operators.multimodal import (
        _GIF_PALETTE_N,
        _gif_bytes,
        _parse_gif,
    )

    b = _gif_bytes(6, 5, 9)
    img_at = b.index(b"\x2c", 13 + 3 * _GIF_PALETTE_N)
    # A multi-frame file through the STILL decode contract: animation
    # is real now (gif_frame_sample), so this is a contract ValueError,
    # not a stub.
    img_block = b[img_at:-1]
    with _pytest.raises(ValueError, match="frames in still-image decode"):
        _parse_gif(b[:-1] + img_block + b"\x3b", mid=3)
    # A shifted FIRST frame leaves the canvas undefined.
    shifted = bytearray(b)
    shifted[img_at + 1] = 1  # image-descriptor left = 1
    with _pytest.raises(ValueError, match="first frame must cover|exceeds"):
        _parse_gif(bytes(shifted), mid=6)
    with _pytest.raises(ValueError, match="media 4: truncated image data"):
        _parse_gif(b[: len(b) - 6], mid=4)
    with _pytest.raises(ValueError, match="media 5: not a GIF"):
        _parse_gif(b"JIF89a" + b[6:], mid=5)


def test_gif_animation_frames_exact():
    """Animated container: every frame decodes to the shifted pixel
    law, extension blocks (GCE + Netscape loop) are walked, and frame
    order is preserved."""
    import numpy as np

    from realtime_financial_transactions_data_pipeline_spark.operators.multimodal import (
        _gif_anim_bytes,
        _parse_gif_frames,
    )

    for w, h, blue, nf in [(4, 4, 0, 2), (19, 15, 255, 7), (10, 14, 10, 5)]:
        frames = _parse_gif_frames(_gif_anim_bytes(w, h, blue, nf), mid=1)
        assert len(frames) == nf
        y, x = np.mgrid[0:h, 0:w]
        for f, px in enumerate(frames):
            assert (px[:, :, 0] == (7 * y + x + f)).all()
            assert (px[:, :, 2] == blue).all()


def test_gif_frame_sample_spark(spark):
    """Every-2nd-frame sampling: fan-out count, frame ids, and the
    per-frame sum_red shift."""
    from realtime_financial_transactions_data_pipeline_spark.operators.multimodal import (
        gif_frame_sample,
        synth_gif_anim_media,
    )

    docs = spark.createDataFrame(
        [(3, "x" * 10), (17, "y" * 23)], "doc_id long, text string"
    )
    rows = gif_frame_sample(synth_gif_anim_media(docs), every_k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.media_id, []).append(r)
    # doc 3: n_frames = 3 % 6 + 2 = 5 -> frames 0, 2, 4
    assert sorted(r.frame_id for r in by_doc[3]) == [0, 2, 4]
    # doc 17: n_frames = 17 % 6 + 2 = 7 -> frames 0, 2, 4, 6
    assert sorted(r.frame_id for r in by_doc[17]) == [0, 2, 4, 6]
    for r in by_doc[3]:
        base = r.width * 7 * r.height * (r.height - 1) // 2 + r.height * r.width * (
            r.width - 1
        ) // 2
        assert r.sum_red == base + r.frame_id * r.width * r.height
        assert r.n_frames == 5 and r.mean_blue == 3


def test_gif_partial_frame_compositing():
    """A frame smaller than the screen pastes onto the previous canvas
    at its (left, top) offset; full-screen follow-up frames fully
    replace; a partial FIRST frame and a GCE transparency flag are
    rejected."""
    import struct

    import numpy as np
    import pytest as _pytest

    from realtime_financial_transactions_data_pipeline_spark.operators.multimodal import (
        _GIF_PALETTE_N,
        _gif_lzw_encode,
        _parse_gif_frames,
    )

    def img_block(left, top, w, h, indices):
        lzw = _gif_lzw_encode(list(indices), 7)
        blocks = bytearray()
        for i in range(0, len(lzw), 255):
            c = lzw[i : i + 255]
            blocks.append(len(c))
            blocks += c
        blocks.append(0)
        return (
            b"\x2c" + struct.pack("<HHHHB", left, top, w, h, 0)
            + bytes((7,)) + bytes(blocks)
        )

    palette = bytearray()
    for i in range(_GIF_PALETTE_N):
        palette += bytes((i, 77, 3))
    sw, sh = 8, 6
    head = b"GIF89a" + struct.pack("<HHBBB", sw, sh, 0xF6, 0, 0) + bytes(palette)
    y, x = np.mgrid[0:sh, 0:sw]
    base = (7 * y + x).reshape(-1)
    patch = [5] * (3 * 2)  # 3x2 patch, constant index 5
    b = head + img_block(0, 0, sw, sh, base) + img_block(2, 1, 3, 2, patch) + b"\x3b"
    f1, f2 = _parse_gif_frames(b, mid=1)
    assert (f1[:, :, 0] == 7 * y + x).all()
    expect = (7 * y + x).copy()
    expect[1:3, 2:5] = 5
    assert (f2[:, :, 0] == expect).all()
    assert f2.shape == (sh, sw, 3)
    # partial FIRST frame is undefined-canvas -> ValueError
    bad = head + img_block(2, 1, 3, 2, patch) + b"\x3b"
    with _pytest.raises(ValueError, match="first frame must cover"):
        _parse_gif_frames(bad, mid=2)
    # frame exceeding the screen -> ValueError
    oob = head + img_block(0, 0, sw, sh, base) + img_block(7, 5, 3, 2, patch) + b"\x3b"
    with _pytest.raises(ValueError, match="exceeds"):
        _parse_gif_frames(oob, mid=3)
    # GCE transparency: frame 2 is full-screen but pixels carrying the
    # transparent index (9) keep frame 1's canvas values.
    gce_t = b"\x21\xf9\x04" + bytes((0x05, 4, 0, 9)) + b"\x00"
    overlay = np.full(sh * sw, 9, dtype=np.int64)
    overlay[:4] = [60, 61, 62, 63]  # only the first four pixels opaque
    trans = (
        head + img_block(0, 0, sw, sh, base)
        + gce_t + img_block(0, 0, sw, sh, overlay) + b"\x3b"
    )
    t1, t2 = _parse_gif_frames(trans, mid=4)
    expect_t = (7 * y + x).copy()
    expect_t.reshape(-1)[:4] = [60, 61, 62, 63]
    assert (t2[:, :, 0] == expect_t).all()
    assert (t1[:, :, 0] == 7 * y + x).all()  # frame 1 untouched
    # the GCE governs exactly ONE image: a third frame after it pastes
    # opaquely again.
    trans3 = (
        head + img_block(0, 0, sw, sh, base)
        + gce_t + img_block(0, 0, sw, sh, overlay)
        + img_block(0, 0, sw, sh, base) + b"\x3b"
    )
    f3 = _parse_gif_frames(trans3, mid=5)[2]
    assert (f3[:, :, 0] == 7 * y + x).all()


def test_gif_disposal_methods():
    """GCE disposal semantics (VERDICT r10 #3): method 2 restores the
    frame's region to the LSD background color before the next paste,
    method 3 restores the pre-paste canvas; the GCE's size byte is
    validated and reserved methods are rejected at parse."""
    import struct

    import numpy as np
    import pytest as _pytest

    from realtime_financial_transactions_data_pipeline_spark.operators.multimodal import (
        _GIF_PALETTE_N,
        _gif_lzw_encode,
        _parse_gif_frames,
    )

    def img_block(left, top, w, h, indices):
        lzw = _gif_lzw_encode(list(indices), 7)
        blocks = bytearray()
        for i in range(0, len(lzw), 255):
            c = lzw[i : i + 255]
            blocks.append(len(c))
            blocks += c
        blocks.append(0)
        return (
            b"\x2c" + struct.pack("<HHHHB", left, top, w, h, 0)
            + bytes((7,)) + bytes(blocks)
        )

    def gce(packed):
        return b"\x21\xf9\x04" + bytes((packed, 0, 0, 0)) + b"\x00"

    palette = bytearray()
    for i in range(_GIF_PALETTE_N):
        palette += bytes((i, 77, 3))
    sw, sh = 8, 6
    # LSD background index 0 -> palette[0] = (0, 77, 3)
    head = b"GIF89a" + struct.pack("<HHBBB", sw, sh, 0xF6, 0, 0) + bytes(palette)
    y, x = np.mgrid[0:sh, 0:sw]
    base = (7 * y + x).reshape(-1)
    patch = [5] * (3 * 2)  # 3x2 patch, constant index 5

    # Disposal 2 on frame 1: frame 2 composites onto the background
    # color, not onto frame 1's pixels.
    d2 = (
        head + gce(0x08) + img_block(0, 0, sw, sh, base)
        + img_block(2, 1, 3, 2, patch) + b"\x3b"
    )
    f1, f2 = _parse_gif_frames(d2, mid=1)
    assert (f1[:, :, 0] == 7 * y + x).all()  # emitted frame 1 intact
    expect2 = np.zeros((sh, sw), dtype=np.int64)  # bg color idx 0
    expect2[1:3, 2:5] = 5
    assert (f2[:, :, 0] == expect2).all()
    assert (f2[:, :, 1] == 77).all()  # bg color green channel

    # Disposal 3 on frame 2: frame 3 composites onto the PRE-frame-2
    # canvas — frame 2's patch must not leak into frame 3.
    d3 = (
        head + img_block(0, 0, sw, sh, base)
        + gce(0x0C) + img_block(2, 1, 3, 2, patch)
        + img_block(5, 3, 2, 2, [9] * 4) + b"\x3b"
    )
    g1, g2, g3 = _parse_gif_frames(d3, mid=2)
    exp_g2 = (7 * y + x).copy()
    exp_g2[1:3, 2:5] = 5
    assert (g2[:, :, 0] == exp_g2).all()  # frame 2 shows its own paste
    exp_g3 = (7 * y + x).copy()  # frame 2's patch restored away...
    exp_g3[3:5, 5:7] = 9         # ...only frame 3's paste remains
    assert (g3[:, :, 0] == exp_g3).all()
    assert (g1[:, :, 0] == 7 * y + x).all()

    # Default disposal (0/1) still accumulates: same stream without the
    # disposal-3 GCE keeps frame 2's patch in frame 3.
    d0 = (
        head + img_block(0, 0, sw, sh, base)
        + img_block(2, 1, 3, 2, patch)
        + img_block(5, 3, 2, 2, [9] * 4) + b"\x3b"
    )
    h3 = _parse_gif_frames(d0, mid=3)[2]
    exp_h3 = exp_g2.copy()
    exp_h3[3:5, 5:7] = 9
    assert (h3[:, :, 0] == exp_h3).all()

    # Malformed GCE size byte -> tagged error, not a fixed-offset read.
    bad_size = (
        head + b"\x21\xf9\x05" + bytes((0x04, 0, 0, 0, 0)) + b"\x00"
        + img_block(0, 0, sw, sh, base) + b"\x3b"
    )
    with _pytest.raises(ValueError, match="GCE block size"):
        _parse_gif_frames(bad_size, mid=4)

    # Reserved disposal method (4-7) -> rejected at parse.
    with _pytest.raises(ValueError, match="reserved GIF disposal"):
        _parse_gif_frames(
            head + gce(0x10) + img_block(0, 0, sw, sh, base) + b"\x3b", mid=5
        )


def test_av_container_sniff_edges():
    """x4l header-walk edges: ID3v2 skip, mid-stream corruption
    truncating the frame count, MP4 64-bit box sizes, an MP4 with no
    video sample entry, and triage (never-throw) on garbage."""
    import struct

    from realtime_financial_transactions_data_pipeline_spark.operators.multimodal import (
        _mp3_bytes,
        _mp4_box,
        _mp4_bytes,
        _sniff_one,
    )

    # Plain stream: count + rate from the walk.
    assert _sniff_one(_mp3_bytes(7, 1, 9)) == ("mp3", 7, 48000)
    # ID3v2-prefixed: the tag is skipped via its syncsafe size.
    assert _sniff_one(_mp3_bytes(5, 0, 5, id3_pad=37)) == ("mp3", 5, 44100)
    # Mid-stream corruption: the count stops at the last whole frame.
    b = bytearray(_mp3_bytes(6, 2, 7))
    flen = 144 * 96 * 1000 // 32000  # bitrate index 7 -> 96 kbps
    b[3 * flen] = 0x00  # clobber the 4th frame's sync byte
    assert _sniff_one(bytes(b)) == ("mp3", 3, 32000)
    # A lone ID3 tag with no audio behind it is not an mp3.
    assert _sniff_one(_mp3_bytes(0, 0, 5, id3_pad=10)) == ("unknown", 0, 0)

    assert _sniff_one(_mp4_bytes(320, 128)) == ("mp4", 320, 128)
    # 64-bit box size on the moov chain still walks.
    w, h = 64, 48
    inner = _mp4_bytes(w, h)
    # splice: rebuild moov with size=1 + largesize
    (ftyp_size,) = struct.unpack_from(">I", inner, 0)
    (moov_size,) = struct.unpack_from(">I", inner, ftyp_size)
    moov = inner[ftyp_size : ftyp_size + moov_size]
    big_moov = (
        struct.pack(">I", 1) + b"moov" + struct.pack(">Q", moov_size + 8)
        + moov[8:]
    )
    assert _sniff_one(inner[:ftyp_size] + big_moov) == ("mp4", w, h)
    # No video entry: routes as mp4 with zero dims (container triage).
    no_vid = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 512)) + _mp4_box(
        b"moov", _mp4_box(b"trak", b"")
    )
    assert _sniff_one(no_vid) == ("mp4", 0, 0)
    # Garbage after a valid ftyp magic: triage, never throw.
    assert _sniff_one(b"\x00\x00\x00\x20ftyp" + b"\xff" * 3)[0] == "mp4"
    assert _sniff_one(b"\xff\xe0\x00") == ("unknown", 0, 0)


def test_media_sniff_triage_never_throws(spark):
    """The sniffer classifies; it never raises: corrupt headers,
    truncated payloads, unknown magics, and NULL content all land in
    ('unknown', 0, 0) — and real headers of every container parse."""
    from realtime_financial_transactions_data_pipeline_spark.operators.multimodal import (
        _bmp_bytes,
        _gif_bytes,
        _png_bytes,
        _sniff_one,
        sniff_media,
    )

    assert _sniff_one(b"") == ("unknown", 0, 0)
    assert _sniff_one(b"GARBAGE BYTES") == ("unknown", 0, 0)
    assert _sniff_one(b"RIFF\x04\x00\x00\x00WAVE") == ("wav", 0, 0)
    assert _sniff_one(b"P6\nnot numbers") == ("unknown", 0, 0)
    assert _sniff_one(b"\xff\xd8\xff\xee\x00\x04ab") == ("unknown", 0, 0)
    assert _sniff_one(_bmp_bytes(5, 4, 1)) == ("bmp", 5, 4)
    assert _sniff_one(_bmp_bytes(5, 4, 1, top_down=True)) == ("bmp", 5, 4)
    assert _sniff_one(_png_bytes(6, 7, 1)) == ("png", 6, 7)
    assert _sniff_one(_gif_bytes(8, 9, 1)) == ("gif", 8, 9)
    rows = spark.createDataFrame(
        [(1, _png_bytes(6, 7, 1)), (2, None), (3, b"junk")],
        "media_id long, content binary",
    )
    got = {r.media_id: r for r in sniff_media(rows).collect()}
    assert (got[1].format, got[1].dim1, got[1].dim2) == ("png", 6, 7)
    assert got[2].format == "unknown" and got[3].format == "unknown"


def test_media_sniff_tolerates_real_world_layouts():
    """Chunk order and fill bytes the synthesizers never emit: RIFF
    data-before-fmt still sniffs as wav with correct counts; JPEG 0xFF
    fill bytes before a marker still reach the SOF."""
    import struct

    import numpy as np

    from realtime_financial_transactions_data_pipeline_spark.operators.multimodal import (
        _jpeg_bytes,
        _sniff_one,
    )

    samples = b"\x00\x00" * 7
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(samples)) + b"WAVE"
        + b"data" + struct.pack("<I", len(samples)) + samples
        + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)[4:]
    )
    # fmt chunk body must be the 16-byte block; rebuild precisely:
    fmt_body = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    wav = (
        b"RIFF" + struct.pack("<I", 28 + len(samples) + len(fmt_body)) + b"WAVE"
        + b"data" + struct.pack("<I", len(samples)) + samples
        + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    )
    assert _sniff_one(wav) == ("wav", 7, 8000)
    b = bytearray(_jpeg_bytes(np.full((2, 2), 100, dtype=np.int64), 0))
    b[2:2] = b"\xff\xff"  # legal fill bytes straight after SOI
    fmt, w, h = _sniff_one(bytes(b))
    assert fmt == "jpeg" and (w, h) == (16, 16)


def test_gif_gce_replacement_clears_transparency():
    """A GCE without the transparency flag REPLACES a pending
    transparent index — the following image pastes opaquely."""
    import struct

    import numpy as np

    from realtime_financial_transactions_data_pipeline_spark.operators.multimodal import (
        _GIF_PALETTE_N,
        _gif_lzw_encode,
        _parse_gif_frames,
    )

    def img_block(w, h, indices):
        lzw = _gif_lzw_encode(list(indices), 7)
        blocks = bytearray()
        for i in range(0, len(lzw), 255):
            c = lzw[i : i + 255]
            blocks.append(len(c))
            blocks += c
        blocks.append(0)
        return (
            b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
            + bytes((7,)) + bytes(blocks)
        )

    palette = bytearray()
    for i in range(_GIF_PALETTE_N):
        palette += bytes((i, 77, 3))
    sw, sh = 4, 3
    head = b"GIF89a" + struct.pack("<HHBBB", sw, sh, 0xF6, 0, 0) + bytes(palette)
    base = list(range(sw * sh))
    overlay = [9] * (sw * sh)
    gce_t = b"\x21\xf9\x04" + bytes((0x05, 4, 0, 9)) + b"\x00"   # trans idx 9
    gce_o = b"\x21\xf9\x04" + bytes((0x04, 4, 0, 0)) + b"\x00"   # no transparency
    b = (
        head + img_block(sw, sh, base)
        + gce_t + gce_o + img_block(sw, sh, overlay) + b"\x3b"
    )
    f1, f2 = _parse_gif_frames(b, mid=1)
    # gce_o replaced gce_t: index-9 pixels paste OPAQUELY (red 9 everywhere)
    assert (f2[:, :, 0] == 9).all()
    assert (np.asarray(f1[:, :, 0]).reshape(-1) == np.arange(sw * sh)).all()


def test_qoi_roundtrip_all_ops():
    """QOI codec edges the probe law doesn't reach: RUN (incl. the
    62-pixel chunk split), RGBA alpha changes, INDEX hits after alpha
    changes, and the error paths (truncation, run past end, missing
    end marker, bad header)."""
    import numpy as np
    import pytest as _pytest

    from realtime_financial_transactions_data_pipeline_spark.operators.multimodal import (
        _parse_qoi,
        _qoi_bytes,
    )

    rng_free = []
    # 200-pixel constant run (crosses the 62-run chunk limit twice) then
    # a ramp, as one 8 x 50 image.
    w, h = 50, 8
    px = np.zeros((h, w, 3), dtype=np.uint8)
    px[:4] = (10, 20, 30)                      # 200-px run
    ramp = np.arange(4 * w, dtype=np.uint8).reshape(4, w)
    px[4:, :, 0] = ramp
    px[4:, :, 1] = 77
    px[4:, :, 2] = 200
    got = _parse_qoi(_qoi_bytes(px), mid=1)
    assert (got == px).all()

    # RGBA stream: alpha varies -> RGBA ops + alpha-sensitive index.
    pxa = np.zeros((3, 5, 4), dtype=np.uint8)
    pxa[..., :3] = 9
    pxa[..., 3] = 255
    pxa[1, :, 3] = 128                          # alpha change mid-image
    pxa[2] = pxa[0]                             # returns to an indexed color
    got_a = _parse_qoi(_qoi_bytes(pxa, channels=4), mid=2)
    assert (got_a == pxa[..., :3]).all()        # RGB recovered; alpha tracked

    enc = bytearray(_qoi_bytes(px))
    with _pytest.raises(ValueError, match="truncated QOI stream|truncated"):
        _parse_qoi(bytes(enc[: len(enc) // 2]), mid=3)
    with _pytest.raises(ValueError, match="end marker"):
        _parse_qoi(bytes(enc[:-1]) + b"\x02", mid=4)
    with _pytest.raises(ValueError, match="not a QOI"):
        _parse_qoi(b"qoix" + bytes(20), mid=5)
    with _pytest.raises(ValueError, match="bad QOI header"):
        _parse_qoi(b"qoif" + b"\x00\x00\x00\x02\x00\x00\x00\x02\x05\x00" + bytes(8), mid=6)
    # run past image end: craft 2x2 image whose stream runs 62 pixels
    import struct as _struct

    bad = (
        b"qoif" + _struct.pack(">IIBB", 2, 2, 3, 0)
        + bytes((0xFE, 1, 2, 3)) + bytes((0xC0 | 61,))
        + bytes(7) + b"\x01"
    )
    with _pytest.raises(ValueError, match="run past image end"):
        _parse_qoi(bad, mid=7)

    # sniffer routes QOI headers
    from realtime_financial_transactions_data_pipeline_spark.operators.multimodal import (
        _sniff_one,
    )

    assert _sniff_one(_qoi_bytes(px)) == ("qoi", w, h)
