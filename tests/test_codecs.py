"""The multimodal decode step is REAL for PNG and WAV (pure-stdlib
codecs, operators/codecs.py); pin it on real pixels/headers, both
directly and through the Spark mapInPandas operators."""

from __future__ import annotations

import zlib

import numpy as np
import pytest

from ghcrawler_datalake_etl_spark.operators import codecs
from ghcrawler_datalake_etl_spark.operators import multimodal as M


def _gradient(h, w, ch):
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_png_roundtrip_lossless(ch):
    arr = _gradient(13, 17, ch)
    out = codecs.png_decode(codecs.png_encode(arr))
    assert out.shape == arr.shape
    assert (out == arr).all()


def test_png_decode_all_filter_types():
    """Hand-build a PNG exercising filters 0-4 (our encoder only emits
    filter 0, so craft the stream directly)."""
    w, ch = 4, 3
    rows = [
        bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120]),
        bytes([1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12]),
        bytes([5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5]),
        bytes([200, 100, 50, 25, 12, 6, 3, 1, 0, 255, 128, 64]),
        bytes([9, 8, 7, 6, 5, 4, 3, 2, 1, 0, 1, 2]),
    ]
    # reference image: what the filters should reconstruct to
    expected = np.array(
        [np.frombuffer(r, dtype=np.uint8) for r in rows]
    ).reshape(5, w, ch)

    def filt(ftype, cur, prior):
        out = bytearray()
        for x in range(len(cur)):
            left = cur[x - ch] if x >= ch else 0
            up = prior[x]
            upleft = prior[x - ch] if x >= ch else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) >> 1
            else:
                pred = codecs._paeth(left, up, upleft)
            out.append((cur[x] - pred) & 0xFF)
        return bytes(out)

    raw = bytearray()
    prior = bytes(w * ch)
    for ftype, r in zip([0, 1, 2, 3, 4], rows):
        raw.append(ftype)
        raw.extend(filt(ftype, r, prior))
        prior = r
    import struct

    ihdr = struct.pack(">IIBBBBB", w, 5, 8, 2, 0, 0, 0)
    png = (
        codecs.PNG_MAGIC
        + codecs._chunk(b"IHDR", ihdr)
        + codecs._chunk(b"IDAT", zlib.compress(bytes(raw)))
        + codecs._chunk(b"IEND", b"")
    )
    out = codecs.png_decode(png)
    assert (out == expected).all()


def test_png_palette_expands_to_rgb():
    import struct

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    raw = bytes([0, 0, 1, 0, 2, 0])  # rows: [idx0, idx1], [idx2, idx0]
    png = (
        codecs.PNG_MAGIC
        + codecs._chunk(b"IHDR", ihdr)
        + codecs._chunk(b"PLTE", plte)
        + codecs._chunk(b"IDAT", zlib.compress(raw))
        + codecs._chunk(b"IEND", b"")
    )
    out = codecs.png_decode(png)
    assert out.shape == (2, 2, 3)
    assert (out[0, 0] == [255, 0, 0]).all()
    assert (out[0, 1] == [0, 255, 0]).all()
    assert (out[1, 0] == [0, 0, 255]).all()


def test_mean_luma_known_values():
    white = np.full((4, 4, 3), 255, dtype=np.uint8)
    black = np.zeros((4, 4, 1), dtype=np.uint8)
    assert codecs.mean_luma(white) == pytest.approx(1.0)
    assert codecs.mean_luma(black) == 0.0
    red = np.zeros((2, 2, 3), dtype=np.uint8)
    red[:, :, 0] = 255
    assert codecs.mean_luma(red) == pytest.approx(0.299)


def test_resize_nearest_shape_and_determinism():
    arr = _gradient(10, 20, 3)
    small = codecs.resize_nearest(arr, 5, 4)
    assert small.shape == (4, 5, 3)
    assert (small == codecs.resize_nearest(arr, 5, 4)).all()
    # upscale replicates pixels
    up = codecs.resize_nearest(np.array([[[7]]], dtype=np.uint8), 3, 2)
    assert (up == 7).all() and up.shape == (2, 3, 1)


def test_wav_info_real_header():
    wav = codecs.wav_encode_silence(16000, 1234, channels=2)
    sr, dur = codecs.wav_info(wav)
    assert sr == 16000
    assert dur == 1234 - (1234 * 16 % 1000 == 0) * 0 and abs(dur - 1234) <= 1
    assert codecs.wav_info(b"not a wav") is None


def test_extract_features_real_png_through_spark(spark):
    """A real PNG flows through attach_binary -> mapInPandas and comes
    back with REAL dimensions and luminance, while a text payload in
    the same batch takes the surrogate arm."""
    arr = np.zeros((6, 8, 3), dtype=np.uint8)
    arr[:, :, 0] = 255  # pure red
    png = codecs.png_encode(arr)
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(b"plain text bytes"))],
        "doc_id long, payload binary",
    )
    media = df.select(
        "doc_id",
        df.payload.alias("content"),
    ).selectExpr(
        "doc_id",
        "'image/png' AS media_type",
        "content",
        "CAST(NULL AS INT) width",
        "CAST(NULL AS INT) height",
        "CAST(NULL AS INT) sample_rate",
        "CAST(NULL AS LONG) duration_ms",
    )
    feats = {r.doc_id: r for r in M.extract_features(media).collect()}
    assert feats[1].width == 8 and feats[1].height == 6
    assert feats[1].n_frames == 1
    assert feats[1].mean_luma == pytest.approx(0.299)
    assert feats[2].width is None and feats[2].height is None


def test_resize_real_png_through_spark(spark):
    arr = _gradient(12, 16, 3)
    png = codecs.png_encode(arr)
    df = spark.createDataFrame(
        [(1, bytearray(png))], "doc_id long, payload binary"
    )
    media = df.selectExpr(
        "doc_id",
        "'image/png' AS media_type",
        "payload AS content",
        "CAST(NULL AS INT) width",
        "CAST(NULL AS INT) height",
        "CAST(NULL AS INT) sample_rate",
        "CAST(NULL AS LONG) duration_ms",
    )
    out = M.resize_images(media, 8, 6).collect()[0]
    resized = codecs.png_decode(bytes(out.content))
    assert resized.shape == (6, 8, 3)
    assert (resized == codecs.resize_nearest(arr, 8, 6)).all()
    assert out.width == 8 and out.height == 6


def test_chunk_audio_real_wav_through_spark(spark):
    wav = codecs.wav_encode_silence(8000, 2500)
    df = spark.createDataFrame(
        [(1, bytearray(wav))], "doc_id long, payload binary"
    )
    media = df.selectExpr(
        "doc_id",
        "'audio/wav' AS media_type",
        "payload AS content",
        "CAST(NULL AS INT) width",
        "CAST(NULL AS INT) height",
        "CAST(NULL AS INT) sample_rate",
        "CAST(NULL AS LONG) duration_ms",
    )
    chunks = M.chunk_audio(media, chunk_ms=1000).collect()
    assert len(chunks) == 3  # 2500 ms -> 1000, 1000, 500
    assert chunks[-1].end_ms == 2500
    assert chunks[-1].start_ms == 2000


def _minimal_jpeg(width: int, height: int) -> bytes:
    """Hand-built JPEG header stream: SOI, APP0, DQT stub, SOF0, SOS."""
    import struct

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    app0 = seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    dqt = seg(0xDB, bytes(65))
    sof0 = seg(
        0xC0,
        struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]),
    )
    sos = seg(0xDA, bytes([1, 1, 0, 0, 63, 0]))
    return b"\xff\xd8" + app0 + dqt + sof0 + sos + b"\x00\xff\xd9"


def test_jpeg_dims_header_scan():
    from ghcrawler_datalake_etl_spark.operators import codecs as C

    data = _minimal_jpeg(640, 480)
    assert C.is_jpeg(data)
    assert C.jpeg_dims(data) == (640, 480)
    # progressive SOF2 parses too
    prog = data.replace(b"\xff\xc0", b"\xff\xc2")
    assert C.jpeg_dims(prog) == (640, 480)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        C.jpeg_dims(b"\xff\xd8\xff\xda\x00\x04\x00\x00")  # SOS before SOF
    with _pytest.raises(ValueError):
        C.jpeg_dims(b"not a jpeg")


def test_extract_features_real_jpeg_dims(spark):
    """JPEG payloads flow the real-dims path through the Spark
    mapInPandas operator (luma stays surrogate by design)."""
    from ghcrawler_datalake_etl_spark.operators import multimodal as MM

    data = _minimal_jpeg(320, 200)
    df = spark.createDataFrame(
        [
            (1, "image/jpeg", data, None, None, None, None),
            (2, "application/octet-stream", b"not media", None, None, None, None),
        ],
        "doc_id long, media_type string, content binary, width int,"
        " height int, sample_rate int, duration_ms long",
    )
    out = {r["doc_id"]: r for r in MM.extract_features(df).collect()}
    assert out[1]["width"] == 320 and out[1]["height"] == 200
    assert out[1]["n_frames"] == 1
    assert out[2]["width"] is None  # surrogate arm unchanged
    assert out[2]["n_frames"] >= 1
