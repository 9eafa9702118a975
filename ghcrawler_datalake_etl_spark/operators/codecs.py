"""Pure-stdlib media codecs for the multimodal operators.

This container has no PIL/libav, so the "real decode path" is
implemented from the public file-format specs with nothing but
``zlib``/``struct``/numpy:

- PNG decode/encode (ISO/IEC 15948): 8-bit depth, color types
  0/2/3/4/6, all five scanline filters, non-interlaced. Enough to
  decode real-world screenshots/thumbnails and to round-trip our own
  encoder output losslessly.
- JPEG baseline (ITU T.81): encoder (FDCT + Annex-K quant + canonical
  Huffman, a fixture generator) and a DC-only entropy decoder - real
  mean luma from DC coefficients alone, no IDCT.
- GIF (GIF87a/89a): header walk for dims/frame count, full LZW decode
  of the first frame (interlace included), and a fixture encoder.
- BMP (BITMAPINFOHEADER): full decode of the uncompressed 24/32-bit
  subset.
- WAV/RIFF header parse: sample rate + duration from ``fmt ``/``data``
  chunk sizes - no sample decoding needed for chunking metadata.

At 100 TB these Python codecs are NOT the throughput path - a real
deployment swaps in native decoders behind the same function
signatures - but they make the multimodal operators genuinely decode
real bytes rather than faking everything, which is what the pipeline
plumbing tests need to mean something.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

#: channels per PNG color type (8-bit depth)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return len(data) >= 8 and data[:8] == PNG_MAGIC


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array of shape (height, width, channels).
    Palette images expand to RGB. Raises ValueError on anything the
    subset doesn't cover (16-bit depth, Adam7 interlace, truncation).
    """
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    depth = ctype = interlace = None
    idat = bytearray()
    palette = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        if tag == b"IHDR":
            width, height, depth, ctype, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif tag == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length  # len + tag + body + crc
    if width is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth}")
    if interlace != 0:
        raise ValueError("Adam7 interlace unsupported")
    if ctype not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {ctype}")
    ch = _CHANNELS[ctype]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG pixel data length mismatch")
    out = np.empty((height, stride), dtype=np.uint8)
    prior = bytearray(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for x in range(ch, stride):
                line[x] = (line[x] + line[x - ch]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prior[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = line[x - ch] if x >= ch else 0
                line[x] = (line[x] + ((left + prior[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = line[x - ch] if x >= ch else 0
                upleft = prior[x - ch] if x >= ch else 0
                line[x] = (line[x] + _paeth(left, prior[x], upleft)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = np.frombuffer(bytes(line), dtype=np.uint8)
        prior = line
    arr = out.reshape(height, width, ch)
    if ctype == 3:
        if palette is None:
            raise ValueError("palette image missing PLTE")
        arr = palette[arr[:, :, 0]]
    return arr


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray) -> bytes:
    """uint8 (H, W) or (H, W, C) array -> PNG bytes (filter 0 rows,
    single IDAT). Lossless: png_decode(png_encode(a)) == a."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.dtype != np.uint8:
        raise ValueError("png_encode expects uint8")
    h, w, ch = arr.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if ctype is None:
        raise ValueError(f"unsupported channel count {ch}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    rows = bytearray()
    for y in range(h):
        rows.append(0)
        rows.extend(arr[y].tobytes())
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(rows), 6))
        + _chunk(b"IEND", b"")
    )


def mean_luma(arr: np.ndarray) -> float:
    """Mean luminance in [0, 1]: Rec.601 weights for color images,
    plain mean for grayscale; alpha ignored."""
    a = arr.astype(np.float64)
    if a.ndim == 2 or a.shape[2] == 1:
        y = a.reshape(a.shape[0], a.shape[1], -1)[:, :, 0]
    elif a.shape[2] == 2:  # gray + alpha
        y = a[:, :, 0]
    else:  # RGB / RGBA
        y = 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]
    return float(y.mean() / 255.0)


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize (deterministic, no resampling filter
    choices to disagree about across platforms)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w = arr.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return arr[ys][:, xs]


def wav_info(data: bytes) -> tuple[int, int] | None:
    """(sample_rate, duration_ms) from a RIFF/WAVE header, or None if
    the bytes aren't a parseable WAV. Duration comes from the data
    chunk size and byte rate - no sample decode."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    data_size = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if tag == b"fmt " and size >= 16:
            fmt = data[pos + 8 : pos + 8 + size]
        elif tag == b"data":
            data_size = size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data_size is None or len(fmt) < 16:
        return None
    (sample_rate,) = struct.unpack("<I", fmt[4:8])
    (byte_rate,) = struct.unpack("<I", fmt[8:12])
    if byte_rate == 0:
        return None
    return sample_rate, data_size * 1000 // byte_rate


def wav_encode_silence(
    sample_rate: int, duration_ms: int, channels: int = 1
) -> bytes:
    """Minimal 16-bit PCM WAV of silence - a test fixture generator so
    the parser can be exercised without audio libraries."""
    n_samples = sample_rate * duration_ms // 1000
    data = b"\x00\x00" * n_samples * channels
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


JPEG_MAGIC = b"\xff\xd8"
#: SOF markers that carry frame dimensions (baseline, extended,
#: progressive, lossless, and their arithmetic-coded twins); C4/C8/CC
#: are DHT/JPG/DAC, not frames.
_JPEG_SOF = frozenset(
    range(0xC0, 0xD0)
) - {0xC4, 0xC8, 0xCC}


def is_jpeg(data: bytes) -> bool:
    return len(data) >= 2 and data[:2] == JPEG_MAGIC


# -- JPEG baseline entropy layer (ITU T.81, public spec) ---------------
#
# Enough of the baseline-sequential process to (a) ENCODE real arrays
# into spec-valid JPEGs as test fixtures (FDCT + Annex-K quant tables +
# canonical single-length Huffman tables written to DHT) and (b) DECODE
# the entropy stream of any baseline JPEG far enough to recover every
# block's DC coefficient - which is exactly the 8x8-block mean, so the
# image-wide mean luma needs NO IDCT and no AC dequantization: AC
# coefficients are Huffman-walked to keep bitstream position and then
# dropped. Progressive (SOF2) streams get BOTH treatments: the cheap
# DC-only luma walk (jpeg_progressive_dc_luma) and, since round 9, a
# full pixel decode (jpeg_decode_progressive - every scan's entropy:
# DC/AC first and refinement, spectral selection, EOB runs).
# Arithmetic-coded processes raise, routing to callers' surrogates.

#: Annex K.1/K.2 example quantization tables (luminance, chrominance).
_JQ_LUM = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int32)
_JQ_CHROM = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int32)


def _zigzag_positions() -> list[tuple[int, int]]:
    """The 64 (row, col) positions in JPEG zigzag order, generated from
    the anti-diagonal walk rather than hardcoded."""
    out = []
    for s in range(15):
        rng = list(range(max(0, s - 7), min(7, s) + 1))
        for r in (rng if s % 2 else reversed(rng)):
            out.append((r, s - r))
    return out


_ZIGZAG = _zigzag_positions()

#: orthonormal DCT-II basis: C @ block @ C.T == the T.81 A.3.3 FDCT
_DCT_C = np.array([
    [
        (np.sqrt(1 / 8) if u == 0 else 0.5)
        * np.cos((2 * x + 1) * u * np.pi / 16)
        for x in range(8)
    ]
    for u in range(8)
])


def _bit_category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)
        return bytes(self.out)


def _canonical_codes(symbols: list[int]) -> tuple[bytes, dict[int, tuple[int, int]]]:
    """A spec-valid DHT payload giving every symbol the SAME canonical
    9-bit code (counts fit: <= 256 symbols < 2^9 - 1, the all-ones code
    stays unused as T.81 requires). Fixture-encoder simplicity over
    compression - any conforming decoder accepts it."""
    assert 0 < len(symbols) <= 256
    bits = [0] * 16
    bits[8] = len(symbols)  # 9-bit codes (bits[i] = codes of length i+1)
    table = {s: (i, 9) for i, s in enumerate(symbols)}
    return bytes(bits) + bytes(symbols), table


def _jpeg_coefficients(arr: np.ndarray):
    """Shared encoder front half: uint8 image -> (h, w, nch, coeffs)
    with coeffs one (blocks_y, blocks_x, 64) zigzag int array per
    component (4:4:4, Annex-K quant tables, edge-replication pad)."""
    if arr.dtype != np.uint8:
        raise ValueError("jpeg_encode expects uint8")
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nch = arr.shape
    if nch not in (1, 3):
        raise ValueError(f"unsupported channel count {nch}")
    a = arr.astype(np.float64)
    if nch == 3:
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        comps = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
        quants = [_JQ_LUM, _JQ_CHROM, _JQ_CHROM]
    else:
        comps = [a[:, :, 0]]
        quants = [_JQ_LUM]
    # pad to 8x8 blocks by edge replication
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    coeffs = []  # per component: (blocks_y, blocks_x, 64) zigzag ints
    for plane, q in zip(comps, quants):
        p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge") - 128.0
        blocks = p.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
        f = np.einsum("ux,byxv,wv->byuw", _DCT_C, blocks, _DCT_C)
        qz = np.round(f / q).astype(np.int64)
        zz = np.stack([qz[:, :, r, c] for (r, c) in _ZIGZAG], axis=-1)
        coeffs.append(zz)
    return h, w, nch, coeffs


def _jpeg_headers(h: int, w: int, nch: int, sof_marker: int) -> bytearray:
    """DQT + SOFn header segments shared by the baseline and
    progressive fixture encoders."""

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    zz_lum = bytes(int(_JQ_LUM[r, c]) for (r, c) in _ZIGZAG)
    out = bytearray(JPEG_MAGIC)
    out += seg(0xDB, b"\x00" + zz_lum)
    if nch == 3:
        zz_chr = bytes(int(_JQ_CHROM[r, c]) for (r, c) in _ZIGZAG)
        out += seg(0xDB, b"\x01" + zz_chr)
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof.append(nch)
    for ci in range(nch):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += seg(sof_marker, bytes(sof))
    return out


def jpeg_encode(arr: np.ndarray) -> bytes:
    """uint8 (H, W) grayscale or (H, W, 3) RGB -> baseline JPEG bytes
    (SOF0, 4:4:4, Annex-K quant tables, single-length canonical Huffman
    tables). The fixture generator for the DC-luma decoder - the same
    role png_encode/wav_encode_silence play for their parsers."""
    h, w, nch, coeffs = _jpeg_coefficients(arr)
    ph, pw = coeffs[0].shape[0] * 8, coeffs[0].shape[1] * 8

    # entropy-code with per-table symbol collection first
    dc_syms: list[set[int]] = [set(), set()]
    ac_syms: list[set[int]] = [set(), set()]
    tokens = []  # (tbl, kind, symbol, extra_value, extra_len)
    preds = [0] * len(coeffs)
    for by in range(ph // 8):
        for bx in range(pw // 8):
            for ci, zz in enumerate(coeffs):
                tbl = 0 if ci == 0 else 1
                blk = zz[by, bx]
                diff = int(blk[0]) - preds[ci]
                preds[ci] = int(blk[0])
                t = _bit_category(diff)
                dc_syms[tbl].add(t)
                extra = diff if diff >= 0 else diff + (1 << t) - 1
                tokens.append((tbl, "dc", t, extra, t))
                run = 0
                last_nz = max(
                    (i for i in range(1, 64) if blk[i]), default=0
                )
                for i in range(1, last_nz + 1):
                    v = int(blk[i])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        ac_syms[tbl].add(0xF0)
                        tokens.append((tbl, "ac", 0xF0, 0, 0))
                        run -= 16
                    t = _bit_category(v)
                    sym = (run << 4) | t
                    ac_syms[tbl].add(sym)
                    extra = v if v >= 0 else v + (1 << t) - 1
                    tokens.append((tbl, "ac", sym, extra, t))
                    run = 0
                if last_nz < 63:
                    ac_syms[tbl].add(0x00)
                    tokens.append((tbl, "ac", 0x00, 0, 0))

    n_tbl = 1 if nch == 1 else 2
    dc_tables = [_canonical_codes(sorted(dc_syms[i])) for i in range(n_tbl)]
    ac_tables = [_canonical_codes(sorted(ac_syms[i])) for i in range(n_tbl)]
    bw = _BitWriter()
    for tbl, kind, sym, extra, elen in tokens:
        code, length = (dc_tables if kind == "dc" else ac_tables)[tbl][1][sym]
        bw.write(code, length)
        if elen:
            bw.write(extra, elen)
    entropy = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = _jpeg_headers(h, w, nch, 0xC0)
    for i in range(n_tbl):
        out += seg(0xC4, bytes([0x00 | i]) + dc_tables[i][0])
        out += seg(0xC4, bytes([0x10 | i]) + ac_tables[i][0])
    sos = bytearray([nch])
    for ci in range(nch):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, bytes(sos))
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


def _ac_first_scan_tokens(blk, ss: int, se: int, al: int):
    """Per-block tokens for a progressive AC FIRST scan (Ah=0): the
    coefficient band at magnitude scale Al (point transform truncates
    toward zero, T.81 G.1.2.2), run/size coded. Returns
    ``(tokens, ends_early)``: the CALLER owns EOB emission, so empty
    and early-ending bands can fold into cross-block EOBn runs (the
    path real progressive streams exercise heavily). Token =
    (symbol, extra, extra_len, corr_bits)."""
    toks = []
    tv = []
    for k in range(ss, se + 1):
        v = int(blk[k])
        tv.append(v >> al if v >= 0 else -((-v) >> al))
    last = -1
    for i, t in enumerate(tv):
        if t:
            last = i
    run = 0
    for i in range(last + 1):
        t = tv[i]
        if t == 0:
            run += 1
            continue
        while run > 15:
            toks.append((0xF0, 0, 0, []))
            run -= 16
        s = _bit_category(t)
        extra = t if t >= 0 else t + (1 << s) - 1
        toks.append(((run << 4) | s, extra, s, []))
        run = 0
    return toks, last < se - ss


def _eobrun_tokens(n: int):
    """EOBn tokens covering ``n`` end-of-band blocks: symbol (r<<4)|0
    terminates 2^r blocks plus an r-bit extra (T.81 G.1.2.2), so one
    code covers up to 32767 consecutive all-done bands - the
    cross-block folding real progressive encoders (jcphuff) emit and
    the decoder's eobrun balance walks."""
    toks = []
    while n > 0:
        chunk = min(n, 32767)
        r = chunk.bit_length() - 1
        toks.append((r << 4, chunk - (1 << r), r, []))
        n -= chunk
    return toks


def _ac_refine_scan_tokens(blk, ss: int, se: int, al: int):
    """Per-block tokens for a progressive AC REFINEMENT scan
    (Ah=Al+1; T.81 G.1.2.3, the jcphuff encode_mcu_AC_refine shape):
    already-nonzero coefficients contribute one buffered correction
    bit each (appended after the next emitted symbol's bits, in k
    order - exactly where the decoder's remainder walk reads them);
    newly-nonzero ones emit (zero-history-run, size=1) + a sign bit;
    a trailing EOB carries the band-end correction bits."""
    toks = []
    run = 0
    corr: list[int] = []
    # EOB position: the last NEWLY-nonzero coefficient - ZRLs after it
    # fold into the trailing EOB (the jcphuff `k <= EOB` guard)
    eob_idx = -1
    for k in range(ss, se + 1):
        v = int(blk[k])
        if (abs(v) >> al) == 1:
            eob_idx = k
    for k in range(ss, se + 1):
        v = int(blk[k])
        a = abs(v) >> al
        if a == 0:
            run += 1
            continue
        # flush pending ZRLs at EVERY nonzero coefficient (correction
        # ones included) so buffered bits stay within the decoder's
        # 16-zero ZRL walk - but never past the EOB position
        while run > 15 and k <= eob_idx:
            toks.append((0xF0, 0, 0, corr))
            corr = []
            run -= 16
        if a > 1:  # history nonzero at scale Al+1: correction bit
            corr.append(a & 1)
            continue
        # a == 1: newly nonzero in this scan
        toks.append(((run << 4) | 1, 1 if v > 0 else 0, 1, corr))
        corr = []
        run = 0
    if run > 0 or corr:
        toks.append((0x00, 0, 0, corr))
    return toks


def jpeg_encode_progressive(arr: np.ndarray, spectral: bool = False) -> bytes:
    """uint8 image -> PROGRESSIVE JPEG bytes (SOF2, 4:4:4): a DC
    first-approximation scan at Al=1, a DC refinement scan (Ah=1,
    Al=0, raw bits), then per-component AC scans. Default: one
    full-precision AC scan per component (Ss=1..63; per-block EOB is
    the EOBRUN=1 code 0x00, so baseline-style run/size coding is
    spec-valid here). ``spectral=True`` (round-9) instead splits each
    component's AC into FOUR scans - bands 1-5 and 6-63 first at Al=1,
    then their Ah=1/Al=0 refinements - exercising spectral selection,
    AC successive approximation, and refinement correction bits in
    jpeg_decode_progressive. Also the fixture generator for
    jpeg_progressive_dc_luma - the AC scans exist precisely so the
    DC-only consumer must prove it SKIPS their entropy."""
    h, w, nch, coeffs = _jpeg_coefficients(arr)
    bys, bxs = coeffs[0].shape[0], coeffs[0].shape[1]
    n_tbl = 1 if nch == 1 else 2

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    # --- scan 1: DC first approximation (interleaved, Al=1) ---
    dc_syms: list[set[int]] = [set() for _ in range(n_tbl)]
    dc_tokens = []  # (tbl, t, extra)
    preds = [0] * nch
    for by in range(bys):
        for bx in range(bxs):
            for ci in range(nch):
                tbl = 0 if ci == 0 else 1
                v = int(coeffs[ci][by, bx, 0]) >> 1  # point transform
                diff = v - preds[ci]
                preds[ci] = v
                t = _bit_category(diff)
                dc_syms[tbl].add(t)
                extra = diff if diff >= 0 else diff + (1 << t) - 1
                dc_tokens.append((tbl, t, extra))
    dc_tables = [_canonical_codes(sorted(dc_syms[i])) for i in range(n_tbl)]
    bw = _BitWriter()
    for tbl, t, extra in dc_tokens:
        code, length = dc_tables[tbl][1][t]
        bw.write(code, length)
        if t:
            bw.write(extra, t)
    scan1 = bw.flush()

    # --- scan 2: DC refinement (Ah=1, Al=0): one raw bit per block ---
    bw = _BitWriter()
    for by in range(bys):
        for bx in range(bxs):
            for ci in range(nch):
                bw.write(int(coeffs[ci][by, bx, 0]) & 1, 1)
    scan2 = bw.flush()

    # --- AC scans: per-component band/approximation plan ---
    if spectral:
        band_plan = [(1, 5, 0, 1), (6, 63, 0, 1), (1, 5, 1, 0), (6, 63, 1, 0)]
    else:
        band_plan = [(1, 63, 0, 0)]
    ac_scans = []  # (ci, ss, se, ah, al, dht_payload, stream)
    for ci in range(nch):
        for ss, se, ah, al in band_plan:
            tokens = []
            if ah == 0:
                eobrun = 0
                for by in range(bys):
                    for bx in range(bxs):
                        toks, ends_early = _ac_first_scan_tokens(
                            coeffs[ci][by, bx], ss, se, al
                        )
                        if toks:
                            # pending EOBn must land before the next
                            # block's symbols (same stream position as
                            # the end of the last covered band)
                            tokens.extend(_eobrun_tokens(eobrun))
                            eobrun = 0
                            tokens.extend(toks)
                        if ends_early:
                            eobrun += 1
                tokens.extend(_eobrun_tokens(eobrun))
            else:
                for by in range(bys):
                    for bx in range(bxs):
                        tokens.extend(
                            _ac_refine_scan_tokens(coeffs[ci][by, bx], ss, se, al)
                        )
            syms = sorted({t[0] for t in tokens})
            if not syms:
                syms = [0x00]  # empty scan still needs a legal table
            payload, codes = _canonical_codes(syms)
            bw = _BitWriter()
            for sym, extra, elen, corr in tokens:
                code, length = codes[sym]
                bw.write(code, length)
                if elen:
                    bw.write(extra, elen)
                for bit in corr:
                    bw.write(bit, 1)
            ac_scans.append((ci, ss, se, ah, al, payload, bw.flush()))

    out = _jpeg_headers(h, w, nch, 0xC2)
    for i in range(n_tbl):
        out += seg(0xC4, bytes([0x00 | i]) + dc_tables[i][0])
    # DC first scan (interleaved all components)
    sos = bytearray([nch])
    for ci in range(nch):
        sos += bytes([ci + 1, (0 if ci == 0 else 1) << 4])
    sos += bytes([0, 0, 0x01])  # Ss=0 Se=0 Ah=0 Al=1
    out += seg(0xDA, bytes(sos))
    out += scan1
    # DC refinement scan (no Huffman table needed)
    sos = bytearray([nch])
    for ci in range(nch):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 0, 0x10])  # Ss=0 Se=0 Ah=1 Al=0
    out += seg(0xDA, bytes(sos))
    out += scan2
    # AC scans, one component each (tables redefined per scan - legal
    # per B.2.4.2 and how real progressive encoders emit them)
    for ci, ss, se, ah, al, payload, stream in ac_scans:
        out += seg(0xC4, bytes([0x10 | ci]) + payload)
        sos = bytearray([1, ci + 1, ci])  # Ta = ci
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, bytes(sos))
        out += stream
    out += b"\xff\xd9"
    return bytes(out)


class _BitReader:
    """MSB-first reader over a JPEG entropy segment: un-stuffs FF 00,
    surfaces RSTn as restart events, stops at any other marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.done = False

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            self.done = True
            return
        byte = d[self.pos]
        if byte == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # restart: caller handles via sync
                self.done = True
                return
            else:  # EOI or next segment
                self.done = True
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
            if self.nbits == 0:
                # past the marker: T.81 says pad with 1s
                return 1
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Consume an expected RSTn marker and realign to byte."""
        self.acc = 0
        self.nbits = 0
        self.done = False
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected JPEG restart marker")


def _huff_decode_table(body: bytes, at: int) -> tuple[int, dict, int]:
    """One DHT table from a DHT segment body -> (class<<4|id, lookup,
    next_offset); lookup maps (length, code) -> symbol."""
    tc_th = body[at]
    counts = body[at + 1 : at + 17]
    total = sum(counts)
    values = body[at + 17 : at + 17 + total]
    if len(values) != total:
        raise ValueError("truncated DHT")
    lookup: dict[tuple[int, int], int] = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            lookup[(length, code)] = values[vi]
            code += 1
            vi += 1
        code <<= 1
    return tc_th, lookup, at + 17 + total


def _read_huff(br: _BitReader, lookup: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = lookup.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _jpeg_parse(data: bytes):
    """Marker scan of a baseline JPEG up to SOS: returns (sof, scan,
    qtables, htables, restart, entropy_pos). Raises ValueError on
    non-baseline processes, 12-bit precision, 16-bit quant tables, or
    malformed structure - callers route to their surrogate arms."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG (bad signature)")
    i, n = 2, len(data)
    qtables: dict[int, list[int]] = {}
    htables: dict[int, dict] = {}
    sof = None
    restart = 0
    while i + 3 < n:
        while i < n and data[i] == 0xFF:
            i += 1
        if i >= n:
            break
        marker = data[i]
        i += 1
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        seglen = int.from_bytes(data[i : i + 2], "big")
        if seglen < 2 or i + seglen > n:
            raise ValueError("truncated JPEG segment")
        body = data[i + 2 : i + seglen]
        if marker == 0xDB:
            at = 0
            while at < len(body):
                pq, tq = body[at] >> 4, body[at] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant table unsupported")
                qtables[tq] = list(body[at + 1 : at + 65])
                at += 65
        elif marker == 0xC4:
            at = 0
            while at < len(body):
                tc_th, lookup, at = _huff_decode_table(body, at)
                htables[tc_th] = lookup
        elif marker == 0xDD:
            restart = int.from_bytes(body[:2], "big")
        elif marker in _JPEG_SOF:
            if marker != 0xC0 and marker != 0xC1:
                raise ValueError(
                    f"non-baseline JPEG process (SOF{marker - 0xC0})"
                )
            if body[0] != 8:
                raise ValueError("12-bit JPEG unsupported")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            sof = (w, h, comps)
        elif marker == 0xDA:
            if sof is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tdta = body[1 + 2 * c], body[2 + 2 * c]
                scan.append((cs, tdta >> 4, tdta & 0x0F))
            return sof, scan, qtables, htables, restart, i + seglen
        i += seglen
    raise ValueError("JPEG has no scan")


def jpeg_dc_luma(data: bytes) -> float:
    """Mean luminance in [0, 1] of a baseline OR progressive JPEG from
    its DC coefficients alone (ITU T.81): Huffman-decode the entropy
    stream, keep each luma block's cumulative DC (the dequantized DC
    of an 8x8 block is 8x the block's mean-minus-128), walk-and-drop
    the ACs, do no IDCT. Baseline streams take the single-scan path;
    progressive (SOF2) streams decode only their DC scans - first
    approximation plus successive-approximation refinement bits - and
    SKIP the AC scans' entropy entirely (spectral selection puts DC in
    its own scans, and the mean needs nothing else). Sampling factors
    (4:2:0 etc.) and restart intervals are honored; padding blocks
    outside the frame are excluded from the mean.
    Arithmetic-coded/hierarchical/12-bit streams raise ValueError (the
    callers' surrogate arms)."""
    try:
        sof, scan, qtables, htables, restart, pos = _jpeg_parse(data)
    except ValueError as exc:
        if "non-baseline" in str(exc):
            return jpeg_progressive_dc_luma(data)
        raise
    return _jpeg_dc_scan(data, pos, sof, scan, qtables, htables, restart)


def _jpeg_parse_scans(data: bytes):
    """Full multi-scan marker walk (ITU T.81 B.2, progressive or
    baseline): returns (process_marker, sof, scans, qtables) where
    each scan is (comps, ss, se, ah, al, entropy_pos, htables-snapshot,
    restart-at-scan). Entropy data between scans is SKIPPED by byte
    scan (0xFF followed by a non-stuffing, non-RST byte ends a scan) -
    the reason a DC-only consumer never pays for AC scans. Raises on
    arithmetic coding (SOF9+), hierarchical, 12-bit, or malformed
    structure."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG (bad signature)")
    i, n = 2, len(data)
    qtables: dict[int, list[int]] = {}
    htables: dict[int, dict] = {}
    sof = None
    proc = None
    restart = 0
    scans = []
    while i + 1 < n:
        while i < n and data[i] == 0xFF:
            i += 1
        if i >= n:
            break
        marker = data[i]
        i += 1
        if marker == 0xD9:
            break
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        seglen = int.from_bytes(data[i : i + 2], "big")
        if seglen < 2 or i + seglen > n:
            raise ValueError("truncated JPEG segment")
        body = data[i + 2 : i + seglen]
        if marker == 0xDB:
            at = 0
            while at < len(body):
                pq, tq = body[at] >> 4, body[at] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant table unsupported")
                qtables[tq] = list(body[at + 1 : at + 65])
                at += 65
        elif marker == 0xC4:
            at = 0
            while at < len(body):
                tc_th, lookup, at = _huff_decode_table(body, at)
                htables[tc_th] = lookup
        elif marker == 0xDD:
            restart = int.from_bytes(body[:2], "big")
        elif marker in _JPEG_SOF:
            if marker not in (0xC0, 0xC1, 0xC2):
                raise ValueError(
                    f"unsupported JPEG process (SOF{marker - 0xC0})"
                )
            if body[0] != 8:
                raise ValueError("12-bit JPEG unsupported")
            proc = marker
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            sof = (w, h, comps)
        elif marker == 0xDA:
            if sof is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            comps = []
            for c in range(ns):
                cs, tdta = body[1 + 2 * c], body[2 + 2 * c]
                comps.append((cs, tdta >> 4, tdta & 0x0F))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            scans.append(
                (comps, ss, se, ahal >> 4, ahal & 0x0F, i + seglen,
                 dict(htables), restart)
            )
            # skip this scan's entropy bytes to the next marker
            j = i + seglen
            while j + 1 < n:
                if (
                    data[j] == 0xFF
                    and data[j + 1] != 0x00
                    and not (0xD0 <= data[j + 1] <= 0xD7)
                ):
                    break
                j += 1
            i = j
            continue
        i += seglen
    if sof is None or not scans:
        raise ValueError("JPEG has no frame/scan")
    return proc, sof, scans, qtables


def jpeg_progressive_dc_luma(data: bytes) -> float:
    """DC-coefficient mean luma of a PROGRESSIVE JPEG (ITU T.81
    Annex G): decode the DC first-approximation scan (interleaved or
    single-component, restart-aware) and every DC successive-
    approximation refinement bit, assemble each luma block's final DC,
    and never touch an AC scan's entropy. The luma arithmetic is then
    identical to the baseline path: dequantized DC / 8 + 128 is the
    block mean."""
    proc, sof, scans, qtables = _jpeg_parse_scans(data)
    if proc != 0xC2:
        raise ValueError("not a progressive JPEG")
    w, h, comps = sof
    by_id = {cid: (hi, vi, tq) for cid, hi, vi, tq in comps}
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))
    dc = {
        cid: np.zeros((mcus_y * vi, mcus_x * hi), dtype=np.int64)
        for cid, hi, vi, _tq in comps
    }
    saw_dc_scan = False
    for comps_s, ss, _se, ah, al, pos, ht, restart in scans:
        if ss != 0:
            continue  # AC scan: skipped entirely
        saw_dc_scan = True
        br = _BitReader(data, pos)
        if len(comps_s) > 1:
            # interleaved: MCU order, vi x hi blocks per component
            order = []
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    unit = []
                    for cs, td, _ta in comps_s:
                        hi, vi, _tq = by_id[cs]
                        for bv in range(vi):
                            for bh in range(hi):
                                unit.append(
                                    (cs, td, my * vi + bv, mx * hi + bh)
                                )
                    order.append(unit)
        else:
            cs, td, _ta = comps_s[0]
            hi, vi, _tq = by_id[cs]
            cw = -(-(w * hi) // (8 * max_h))   # blocks across
            chh = -(-(h * vi) // (8 * max_v))  # blocks down
            order = [
                [(cs, td, by, bx)]
                for by in range(chh)
                for bx in range(cw)
            ]
        preds = {cs: 0 for cs, _td, _ta in comps_s}
        for ui, unit in enumerate(order):
            if restart and ui and ui % restart == 0:
                br.sync_restart()
                preds = {cs: 0 for cs in preds}
            for cs, td, by, bx in unit:
                if ah == 0:
                    lookup = ht.get(0x00 | td)
                    if lookup is None:
                        raise ValueError("missing DC Huffman table")
                    t = _read_huff(br, lookup)
                    diff = _extend(br.read_bits(t), t) if t else 0
                    preds[cs] += diff
                    dc[cs][by, bx] = preds[cs] << al
                else:
                    dc[cs][by, bx] |= br.read_bit() << al
    if not saw_dc_scan:
        raise ValueError("progressive JPEG has no DC scan")
    luma_id, luma_hi, luma_vi, luma_tq = comps[0]
    lq = qtables.get(luma_tq)
    if lq is None:
        raise ValueError("missing quant table")
    cw = -(-(w * luma_hi) // max_h)
    ch = -(-(h * luma_vi) // max_v)
    total = 0.0
    count = 0
    arr = dc[luma_id]
    for by in range(arr.shape[0]):
        for bx in range(arr.shape[1]):
            if bx * 8 < cw and by * 8 < ch:
                mean = int(arr[by, bx]) * lq[0] / 8.0 + 128.0
                total += min(max(mean, 0.0), 255.0)
                count += 1
    if count == 0:
        raise ValueError("progressive JPEG decoded no luma blocks")
    return total / count / 255.0


def _ac_first_block(br, blk, ss, se, al, lookup, eobrun):
    """One block of a progressive AC FIRST scan (Ah=0; T.81 G.1.2.2 /
    libjpeg decode_mcu_AC_first): run/size symbols place values at
    magnitude scale Al; EOBn codes start an end-of-band run covering
    this and the next 2^r-1(+bits) blocks. Returns the eobrun balance
    AFTER this block."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = _read_huff(br, lookup)
        r, s = sym >> 4, sym & 0x0F
        if s == 0:
            if r == 15:  # ZRL: sixteen zero coefficients
                k += 16
                continue
            eobrun = 1 << r
            if r:
                eobrun += br.read_bits(r)
            return eobrun - 1  # this block is one of them
        k += r
        if k > se:
            raise ValueError("JPEG AC overrun")
        blk[k] = _extend(br.read_bits(s), s) << al
        k += 1
    return 0


def _ac_refine_block(br, blk, ss, se, al, lookup, eobrun):
    """One block of a progressive AC REFINEMENT scan (Ah=Al+1; T.81
    G.1.2.3 / libjpeg decode_mcu_AC_refine): coefficients already
    nonzero receive one correction bit each; newly-nonzero
    coefficients arrive as (run-of-zero-history, size=1) symbols with
    a sign bit; EOBn runs carry correction bits for the remainder of
    each covered band. Returns the eobrun balance AFTER this block."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = _read_huff(br, lookup)
            r, s = sym >> 4, sym & 0x0F
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read_bits(r)
                    break  # remainder of the band corrected below
                val = 0  # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("bad JPEG refinement AC symbol")
                val = p1 if br.read_bit() else m1
            # advance over r zero-history coefficients, handing one
            # correction bit to every nonzero-history one passed
            while k <= se:
                if blk[k] != 0:
                    if br.read_bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] > 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s:
                if k > se:
                    # the coded zero-run overran the band end with a
                    # newly-nonzero coefficient still pending: the
                    # stream is desynced - raise like _ac_first_block
                    # so corrupt streams route to callers' surrogate
                    # arms instead of decoding garbage pixels.
                    # Deliberate divergence from libjpeg (which warns
                    # and drops the coefficient): in a pipeline the
                    # surrogate arm is the recorded, deterministic
                    # "corrupt input" signal - a silently-patched
                    # decode would feed downstream features
                    # nondeterministically-wrong pixels with no flag
                    raise ValueError("JPEG AC overrun")
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:  # correction bits through the band's end
            if blk[k] != 0:
                if br.read_bit() and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _jpeg_progressive_coefficients(data: bytes):
    """Decode EVERY scan of a progressive JPEG (DC first + refinement,
    AC first + refinement, spectral selection, EOB runs, restarts) into
    final coefficient blocks: returns (sof, qtables, blocks) with
    blocks[cid] a (blocks_y, blocks_x, 64) zigzag int64 array - the
    same shape the baseline entropy decoder produces, so pixel
    reconstruction is shared."""
    proc, sof, scans, qtables = _jpeg_parse_scans(data)
    if proc != 0xC2:
        raise ValueError("not a progressive JPEG")
    w, h, comps = sof
    by_id = {cid: (hi, vi, tq) for cid, hi, vi, tq in comps}
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))
    blocks = {
        cid: np.zeros((mcus_y * vi, mcus_x * hi, 64), dtype=np.int64)
        for cid, hi, vi, _tq in comps
    }
    for comps_s, ss, se, ah, al, pos, ht, restart in scans:
        br = _BitReader(data, pos)
        if ss == 0:
            if se != 0:
                raise ValueError("progressive DC scan with Se != 0")
            # DC scan: interleaved MCU order or single-component raster
            if len(comps_s) > 1:
                order = []
                for my in range(mcus_y):
                    for mx in range(mcus_x):
                        unit = []
                        for cs, td, _ta in comps_s:
                            hi, vi, _tq = by_id[cs]
                            for bv in range(vi):
                                for bh in range(hi):
                                    unit.append(
                                        (cs, td, my * vi + bv, mx * hi + bh)
                                    )
                        order.append(unit)
            else:
                cs, td, _ta = comps_s[0]
                hi, vi, _tq = by_id[cs]
                cw = -(-(w * hi) // (8 * max_h))
                chh = -(-(h * vi) // (8 * max_v))
                order = [
                    [(cs, td, by, bx)]
                    for by in range(chh)
                    for bx in range(cw)
                ]
            preds = {cs: 0 for cs, _td, _ta in comps_s}
            for ui, unit in enumerate(order):
                if restart and ui and ui % restart == 0:
                    br.sync_restart()
                    preds = {cs: 0 for cs in preds}
                for cs, td, by, bx in unit:
                    if ah == 0:
                        lookup = ht.get(0x00 | td)
                        if lookup is None:
                            raise ValueError("missing DC Huffman table")
                        t = _read_huff(br, lookup)
                        diff = _extend(br.read_bits(t), t) if t else 0
                        preds[cs] += diff
                        blocks[cs][by, bx, 0] = preds[cs] << al
                    else:
                        blocks[cs][by, bx, 0] |= br.read_bit() << al
        else:
            # AC scan: T.81 G.1.1 - never interleaved
            if len(comps_s) != 1:
                raise ValueError("interleaved progressive AC scan")
            cs, _td, ta = comps_s[0]
            lookup = ht.get(0x10 | ta)
            if lookup is None:
                raise ValueError("missing AC Huffman table")
            hi, vi, _tq = by_id[cs]
            cw = -(-(w * hi) // (8 * max_h))
            chh = -(-(h * vi) // (8 * max_v))
            eobrun = 0
            bi = 0
            step = _ac_first_block if ah == 0 else _ac_refine_block
            for by in range(chh):
                for bx in range(cw):
                    if restart and bi and bi % restart == 0:
                        br.sync_restart()
                        eobrun = 0
                    bi += 1
                    eobrun = step(
                        br, blocks[cs][by, bx], ss, se, al, lookup, eobrun
                    )
    return sof, qtables, blocks


def _jpeg_reconstruct(sof, members, blocks, qtables) -> np.ndarray:
    """Shared back half of baseline and progressive decode: dequantize,
    de-zigzag, IDCT, crop, nearest-neighbor chroma upsample, YCbCr ->
    RGB. ``members`` is [(cid, hi, vi, tq)] with the luma component
    first; ``blocks[cid]`` is (blocks_y, blocks_x, 64) zigzag ints."""
    w, h, _comps = sof
    max_h = max(m[1] for m in members)
    max_v = max(m[2] for m in members)
    zz_r = np.array([r for r, _ in _ZIGZAG])
    zz_c = np.array([c for _, c in _ZIGZAG])
    planes = []
    for cs, hi, vi, tq in members:
        q_list = qtables.get(tq)
        if q_list is None:
            raise ValueError("missing quant table")
        q = np.array(q_list, dtype=np.int64)  # zigzag order per DQT
        zzb = blocks[cs] * q  # (by, bx, 64) dequantized, zigzag
        sq = np.zeros(zzb.shape[:2] + (8, 8), dtype=np.float64)
        sq[:, :, zz_r, zz_c] = zzb
        pix = np.einsum("ux,byuw,wv->byxv", _DCT_C, sq, _DCT_C) + 128.0
        by, bx = sq.shape[:2]
        plane = pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        cw = -(-(w * hi) // max_h)
        ch = -(-(h * vi) // max_v)
        plane = plane[:ch, :cw]
        ys = (np.arange(h) * ch // h).clip(0, ch - 1)
        xs = (np.arange(w) * cw // w).clip(0, cw - 1)
        planes.append(plane[ys][:, xs])
    if len(planes) == 1:
        return np.clip(planes[0], 0, 255).round().astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return np.clip(rgb, 0, 255).round().astype(np.uint8)


def jpeg_decode_progressive(data: bytes) -> np.ndarray:
    """FULL progressive-JPEG pixel decode (ITU T.81 Annex G, round-9 -
    the DC-only restriction is gone): every scan's entropy is decoded -
    DC first/refinement, AC first/refinement with spectral selection
    and EOB runs - into final coefficients, then the SAME dequantize/
    IDCT/upsample/color path as the baseline decoder. Returns uint8
    (h, w) grayscale or (h, w, 3) RGB."""
    sof, qtables, blocks = _jpeg_progressive_coefficients(data)
    _w, _h, comps = sof
    members = [(cid, hi, vi, tq) for cid, hi, vi, tq in comps]
    return _jpeg_reconstruct(sof, members, blocks, qtables)


def jpeg_decode(data: bytes) -> np.ndarray:
    """FULL JPEG pixel decode (ITU T.81), baseline AND progressive
    (round-9): Huffman entropy decode of every coefficient,
    dequantization, de-zigzag, IDCT (the inverse of jpeg_encode's
    orthonormal DCT matrix), nearest-neighbor chroma upsampling per
    the sampling factors, YCbCr -> RGB. Returns uint8 (h, w) grayscale
    or (h, w, 3) RGB. The pixel path behind the real-resize arm;
    jpeg_dc_luma remains the cheap metadata-scale path. SOF2 streams
    route through jpeg_decode_progressive; arithmetic-coded streams
    still raise ValueError."""
    if _jpeg_sof_process(data) == 0xC2:
        return jpeg_decode_progressive(data)
    sof, scan, qtables, htables, restart, pos = _jpeg_parse(data)
    w, h, comps = sof
    by_id = {cid: (hi, vi, tq) for cid, hi, vi, tq in comps}
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))
    members = []
    blocks: dict[int, np.ndarray] = {}
    for cs, td, ta in scan:
        hi, vi, tq = by_id[cs]
        dc = htables.get(0x00 | td)
        ac = htables.get(0x10 | ta)
        q = qtables.get(tq)
        if dc is None or ac is None or q is None:
            raise ValueError("missing JPEG table")
        members.append((cs, hi, vi, dc, ac))
        blocks[cs] = np.zeros((mcus_y * vi, mcus_x * hi, 64), dtype=np.int32)
    br = _BitReader(data, pos)
    preds = {cs: 0 for cs, *_ in members}
    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu_i and mcu_i % restart == 0:
                br.sync_restart()
                preds = {cs: 0 for cs in preds}
            mcu_i += 1
            for cs, hi, vi, dc, ac in members:
                for bv in range(vi):
                    for bh in range(hi):
                        blk = blocks[cs][my * vi + bv, mx * hi + bh]
                        t = _read_huff(br, dc)
                        diff = _extend(br.read_bits(t), t) if t else 0
                        preds[cs] += diff
                        blk[0] = preds[cs]
                        k = 1
                        while k < 64:
                            sym = _read_huff(br, ac)
                            if sym == 0x00:
                                break
                            run, size = sym >> 4, sym & 0x0F
                            if size == 0 and run != 15:
                                raise ValueError("bad JPEG AC symbol")
                            k += run
                            if size:
                                if k > 63:
                                    raise ValueError("JPEG AC overrun")
                                blk[k] = _extend(br.read_bits(size), size)
                            k += 1
    recon_members = [(cs, hi, vi, by_id[cs][2]) for cs, hi, vi, _d, _a in members]
    return _jpeg_reconstruct(sof, recon_members, blocks, qtables)


def _jpeg_dc_scan(
    data: bytes, pos: int, sof, scan, qtables, htables, restart
) -> float:
    w, h, comps = sof
    by_id = {cid: (hi, vi, tq) for cid, hi, vi, tq in comps}
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))
    luma_id = comps[0][0]
    lq = qtables.get(by_id[luma_id][2])
    if lq is None:
        raise ValueError("missing quant table")
    members = []
    for cs, td, ta in scan:
        hi, vi, _tq = by_id[cs]
        dc = htables.get(0x00 | td)
        ac = htables.get(0x10 | ta)
        if dc is None or ac is None:
            raise ValueError("missing Huffman table")
        cw = -(-(w * hi) // max_h)   # component pixel width
        ch = -(-(h * vi) // max_v)
        members.append((cs, hi, vi, dc, ac, cw, ch))
    br = _BitReader(data, pos)
    preds = {cs: 0 for cs, *_ in members}
    total = 0.0
    count = 0
    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu_i and mcu_i % restart == 0:
                br.sync_restart()
                preds = {cs: 0 for cs in preds}
            mcu_i += 1
            for cs, hi, vi, dc, ac, cw, ch in members:
                for bv in range(vi):
                    for bh in range(hi):
                        t = _read_huff(br, dc)
                        diff = _extend(br.read_bits(t), t) if t else 0
                        preds[cs] += diff
                        k = 1
                        while k < 64:
                            sym = _read_huff(br, ac)
                            if sym == 0x00:
                                break
                            run, size = sym >> 4, sym & 0x0F
                            if size == 0 and run != 15:
                                raise ValueError("bad JPEG AC symbol")
                            k += run + 1
                            if size:
                                br.read_bits(size)  # AC value dropped
                        if cs == luma_id:
                            x0 = (mx * hi + bh) * 8
                            y0 = (my * vi + bv) * 8
                            if x0 < cw and y0 < ch:
                                mean = preds[cs] * lq[0] / 8.0 + 128.0
                                total += min(max(mean, 0.0), 255.0)
                                count += 1
    if count == 0:
        raise ValueError("JPEG scan decoded no luma blocks")
    return total / count / 255.0


def _jpeg_first_sof(data: bytes) -> tuple[int, int]:
    """(SOF marker id, offset of its segment body) from ONE pure
    header walk (ITU T.81 B.2) - the single marker-walk shared by
    jpeg_dims (reads dims out of the body) and the decode dispatch
    (reads only the marker id), so the fill-byte / standalone-marker /
    truncation edge handling lives in exactly one place."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG (bad signature)")
    i = 2
    n = len(data)
    while i + 3 < n:
        if data[i] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        # fill bytes: FF may repeat before the marker id
        while i < n and data[i] == 0xFF:
            i += 1
        if i >= n:
            break
        marker = data[i]
        i += 1
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue  # SOI / TEM / RSTn carry no length
        if i + 1 >= n:
            break
        seglen = int.from_bytes(data[i:i + 2], "big")
        if seglen < 2 or i + seglen > n:
            raise ValueError("truncated JPEG segment")
        if marker in _JPEG_SOF:
            return marker, i
        if marker == 0xDA:  # SOS: entropy data follows, no SOF seen
            break
        i += seglen
    raise ValueError("JPEG has no SOF frame header")


def _jpeg_sof_process(data: bytes) -> int:
    """The first SOF marker id of a JPEG stream (0xC0 baseline, 0xC2
    progressive, ...) - how jpeg_decode picks its entropy path without
    a full parse."""
    return _jpeg_first_sof(data)[0]


def jpeg_dims(data: bytes) -> tuple[int, int]:
    """(width, height) from the first SOF marker of a JPEG stream -
    a pure header scan (ITU T.81 B.2), no entropy decode. The 100 TB
    use case is exactly this: dimension/metadata extraction over binary
    columns without paying for pixel decode."""
    _marker, i = _jpeg_first_sof(data)
    seglen = int.from_bytes(data[i:i + 2], "big")
    if seglen < 7:
        raise ValueError("truncated JPEG SOF")
    height = int.from_bytes(data[i + 3:i + 5], "big")
    width = int.from_bytes(data[i + 5:i + 7], "big")
    return width, height


# -- GIF (GIF87a/89a, public spec) ------------------------------------

GIF_MAGICS = (b"GIF87a", b"GIF89a")


def is_gif(data: bytes) -> bool:
    return len(data) >= 6 and data[:6] in GIF_MAGICS


def gif_info(data: bytes) -> tuple[int, int, int]:
    """(width, height, n_frames) from a GIF stream: logical-screen
    descriptor for the dims, then a block walk counting image
    descriptors - color tables and LZW data are SKIPPED by their
    declared sizes, never decoded (the metadata-extraction path,
    same contract as jpeg_dims)."""
    if not is_gif(data):
        raise ValueError("not a GIF (bad signature)")
    n = len(data)
    if n < 13:
        raise ValueError("truncated GIF header")
    width = int.from_bytes(data[6:8], "little")
    height = int.from_bytes(data[8:10], "little")
    flags = data[10]
    i = 13
    if flags & 0x80:  # global color table: 3 * 2^(N+1) bytes
        i += 3 * (2 << (flags & 0x07))

    def _skip_subblocks(j: int) -> int:
        while True:
            if j >= n:
                raise ValueError("truncated GIF sub-blocks")
            size = data[j]
            j += 1
            if size == 0:
                return j
            j += size

    frames = 0
    while i < n:
        block = data[i]
        i += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label byte + sub-blocks
            if i >= n:
                raise ValueError("truncated GIF extension")
            i += 1
            i = _skip_subblocks(i)
        elif block == 0x2C:  # image descriptor
            if i + 9 > n:
                raise ValueError("truncated GIF image descriptor")
            lflags = data[i + 8]
            i += 9
            if lflags & 0x80:  # local color table
                i += 3 * (2 << (lflags & 0x07))
            if i >= n:
                raise ValueError("truncated GIF image data")
            i += 1  # LZW minimum code size
            i = _skip_subblocks(i)
            frames += 1
        else:
            raise ValueError(f"bad GIF block id 0x{block:02x}")
    if frames == 0:
        raise ValueError("GIF contains no image descriptor")
    return width, height, frames


def _gif_lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytes:
    """GIF-variant LZW (GIF89a spec appendix): LSB-first codes of
    growing width, CLEAR resets the dictionary, codes cap at 12 bits.
    Returns exactly n_pixels palette indices."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    # bit reader state
    acc = 0
    nbits = 0
    pos = 0
    code_size = min_code_size + 1
    dictionary: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    while len(out) < n_pixels:
        while nbits < code_size:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            dictionary = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(dictionary):
            entry = dictionary[code]
        elif code == len(dictionary) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("bad GIF LZW code")
        out.extend(entry)
        if prev is not None and len(dictionary) < 4096:
            dictionary.append(prev + entry[:1])
        if len(dictionary) >= (1 << code_size) and code_size < 12:
            code_size += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("GIF LZW stream ended early")
    return bytes(out[:n_pixels])


#: GIF interlace passes: (first_row, step)
_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def gif_decode_first_frame(data: bytes) -> np.ndarray:
    """Decode the FIRST image of a GIF into an (h, w, 3) RGB uint8
    array: color-table lookup after a real LZW decode of the image
    data; interlaced frames are de-interlaced. The frame is returned on
    its own w x h canvas (disposal/composition across frames is out of
    scope - frame 1 IS the canvas for the luma use case). Raises
    ValueError on anything malformed so callers fall back to their
    surrogate arm."""
    if not is_gif(data):
        raise ValueError("not a GIF (bad signature)")
    n = len(data)
    if n < 13:
        raise ValueError("truncated GIF header")
    flags = data[10]
    i = 13
    global_pal = None
    if flags & 0x80:
        size = 3 * (2 << (flags & 0x07))
        global_pal = np.frombuffer(
            data[i : i + size], dtype=np.uint8
        ).reshape(-1, 3)
        i += size

    def _subblocks(j: int) -> tuple[bytes, int]:
        chunks = bytearray()
        while True:
            if j >= n:
                raise ValueError("truncated GIF sub-blocks")
            size = data[j]
            j += 1
            if size == 0:
                return bytes(chunks), j
            chunks.extend(data[j : j + size])
            j += size

    while i < n:
        block = data[i]
        i += 1
        if block == 0x3B:
            break
        if block == 0x21:
            i += 1
            _, i = _subblocks(i)
        elif block == 0x2C:
            if i + 9 > n:
                raise ValueError("truncated GIF image descriptor")
            w = int.from_bytes(data[i + 4 : i + 6], "little")
            h = int.from_bytes(data[i + 6 : i + 8], "little")
            lflags = data[i + 8]
            i += 9
            pal = global_pal
            if lflags & 0x80:
                size = 3 * (2 << (lflags & 0x07))
                pal = np.frombuffer(
                    data[i : i + size], dtype=np.uint8
                ).reshape(-1, 3)
                i += size
            if pal is None:
                raise ValueError("GIF image has no color table")
            if i >= n:
                raise ValueError("truncated GIF image data")
            min_code = data[i]
            if not 2 <= min_code <= 11:
                raise ValueError(f"bad GIF LZW minimum code size {min_code}")
            lzw, i = _subblocks(i + 1)
            idx = np.frombuffer(
                _gif_lzw_decode(min_code, lzw, w * h), dtype=np.uint8
            )
            if idx.max(initial=0) >= len(pal):
                raise ValueError("GIF pixel index outside color table")
            rows = idx.reshape(h, w)
            if lflags & 0x40:  # interlaced: reorder rows into passes
                out = np.empty_like(rows)
                src = 0
                for first, step in _GIF_INTERLACE:
                    for y in range(first, h, step):
                        out[y] = rows[src]
                        src += 1
                rows = out
            return pal[rows]
        else:
            raise ValueError(f"bad GIF block id 0x{block:02x}")
    raise ValueError("GIF contains no image descriptor")


def _gif_assemble_subblocks(data: bytes, j: int) -> tuple[bytes, int]:
    """Assemble a GIF sub-block chain starting at ``j`` into one body;
    returns (body, index-after-terminator). The ONE walk both
    gif_decode_frames and gif_frame_delays use to read a Graphic
    Control Extension, so a GCE split across sub-blocks can never give
    the two functions different delays (ADVICE r8)."""
    n = len(data)
    chunks = bytearray()
    while True:
        if j >= n:
            raise ValueError("truncated GIF sub-blocks")
        size = data[j]
        j += 1
        if size == 0:
            return bytes(chunks), j
        chunks.extend(data[j : j + size])
        j += size


def gif_frame_delays(data: bytes) -> list[int]:
    """Per-frame GCE delays in ms (0 where a frame has no Graphic
    Control Extension). Extension bodies are assembled by the same
    sub-block walk gif_decode_frames uses (shared helper); color
    tables and LZW image data are still skipped un-decoded, so this is
    metadata-cheap even for large animations."""
    if not is_gif(data):
        raise ValueError("not a GIF (bad signature)")
    n = len(data)
    if n < 13:
        raise ValueError("truncated GIF header")
    flags = data[10]
    i = 13
    if flags & 0x80:
        i += 3 * (2 << (flags & 0x07))

    def _skip_subblocks(j: int) -> int:
        while True:
            if j >= n:
                raise ValueError("truncated GIF sub-blocks")
            size = data[j]
            j += 1
            if size == 0:
                return j
            j += size

    delays: list[int] = []
    pending = 0
    while i < n:
        block = data[i]
        i += 1
        if block == 0x3B:
            break
        if block == 0x21:
            if i >= n:
                raise ValueError("truncated GIF extension")
            label = data[i]
            body, i = _gif_assemble_subblocks(data, i + 1)
            if label == 0xF9 and len(body) >= 4:
                pending = int.from_bytes(body[1:3], "little") * 10
        elif block == 0x2C:
            if i + 9 > n:
                raise ValueError("truncated GIF image descriptor")
            lflags = data[i + 8]
            i += 9
            if lflags & 0x80:
                i += 3 * (2 << (lflags & 0x07))
            if i >= n:
                raise ValueError("truncated GIF image data")
            i = _skip_subblocks(i + 1)
            delays.append(pending)
            pending = 0
        else:
            raise ValueError(f"bad GIF block id 0x{block:02x}")
    if not delays:
        raise ValueError("GIF contains no image descriptor")
    return delays


def gif_decode_frames(
    data: bytes, max_frames: int | None = None
) -> tuple[list[np.ndarray], list[int]]:
    """Decode up to ``max_frames`` frames of an animated GIF with FULL
    inter-frame composition (round-8, VERDICT r7 #7 - the first-frame
    restriction is gone): each yielded frame is the logical-screen
    canvas AFTER drawing that image, honoring the GIF89a Graphic
    Control Extension per frame:

    - **transparency**: pixels equal to the GCE's transparent index
      leave the canvas unchanged (the previous frame shows through);
    - **disposal 0/1** (unspecified / do not dispose): the drawn frame
      stays as the base for the next one;
    - **disposal 2** (restore to background): the frame's REGION is
      cleared to the background color before the next frame draws;
    - **disposal 3** (restore to previous): the canvas reverts to its
      pre-draw state before the next frame draws.

    Returns ``(frames, timestamps_ms)``: (h, w, 3) RGB uint8 canvases
    and each frame's cumulative presentation time (sum of prior GCE
    delays; a frame with no/zero delay advances 0 ms, frame 0 is
    always at 0 ms). ``max_frames`` stops the block walk early, so
    sampling the head of a long animation never decodes the tail.
    Raises ValueError on anything malformed so callers fall back to
    their surrogate arm (same contract as gif_decode_first_frame)."""
    if not is_gif(data):
        raise ValueError("not a GIF (bad signature)")
    n = len(data)
    if n < 13:
        raise ValueError("truncated GIF header")
    sw = int.from_bytes(data[6:8], "little")
    sh = int.from_bytes(data[8:10], "little")
    if sw == 0 or sh == 0:
        raise ValueError("zero-sized GIF logical screen")
    flags = data[10]
    bg_index = data[11]
    i = 13
    global_pal = None
    if flags & 0x80:
        size = 3 * (2 << (flags & 0x07))
        global_pal = np.frombuffer(
            data[i : i + size], dtype=np.uint8
        ).reshape(-1, 3)
        i += size
    if global_pal is not None and bg_index < len(global_pal):
        bg_color = global_pal[bg_index]
    else:
        bg_color = np.zeros(3, dtype=np.uint8)
    canvas = np.empty((sh, sw, 3), dtype=np.uint8)
    canvas[:] = bg_color

    def _subblocks(j: int) -> tuple[bytes, int]:
        return _gif_assemble_subblocks(data, j)

    frames: list[np.ndarray] = []
    stamps: list[int] = []
    t_ms = 0
    # pending Graphic Control Extension state (applies to next image)
    disposal = 0
    delay_ms = 0
    transparent: int | None = None
    while i < n:
        block = data[i]
        i += 1
        if block == 0x3B:
            break
        if block == 0x21:
            if i >= n:
                raise ValueError("truncated GIF extension")
            label = data[i]
            body, i = _subblocks(i + 1)
            if label == 0xF9 and len(body) >= 4:  # Graphic Control
                packed = body[0]
                disposal = (packed >> 2) & 0x07
                delay_ms = int.from_bytes(body[1:3], "little") * 10
                transparent = body[3] if packed & 0x01 else None
        elif block == 0x2C:
            if i + 9 > n:
                raise ValueError("truncated GIF image descriptor")
            left = int.from_bytes(data[i : i + 2], "little")
            top = int.from_bytes(data[i + 2 : i + 4], "little")
            w = int.from_bytes(data[i + 4 : i + 6], "little")
            h = int.from_bytes(data[i + 6 : i + 8], "little")
            lflags = data[i + 8]
            i += 9
            if left + w > sw or top + h > sh:
                raise ValueError("GIF frame region outside logical screen")
            pal = global_pal
            if lflags & 0x80:
                size = 3 * (2 << (lflags & 0x07))
                pal = np.frombuffer(
                    data[i : i + size], dtype=np.uint8
                ).reshape(-1, 3)
                i += size
            if pal is None:
                raise ValueError("GIF image has no color table")
            if i >= n:
                raise ValueError("truncated GIF image data")
            min_code = data[i]
            if not 2 <= min_code <= 11:
                raise ValueError(f"bad GIF LZW minimum code size {min_code}")
            lzw, i = _subblocks(i + 1)
            idx = np.frombuffer(
                _gif_lzw_decode(min_code, lzw, w * h), dtype=np.uint8
            )
            if transparent is not None:
                opaque = idx[idx != transparent]
                if opaque.size and opaque.max() >= len(pal):
                    raise ValueError("GIF pixel index outside color table")
            elif idx.max(initial=0) >= len(pal):
                raise ValueError("GIF pixel index outside color table")
            rows = idx.reshape(h, w)
            if lflags & 0x40:  # interlaced: reorder rows into passes
                out = np.empty_like(rows)
                src = 0
                for first, step in _GIF_INTERLACE:
                    for y in range(first, h, step):
                        out[y] = rows[src]
                        src += 1
                rows = out
            before = canvas.copy() if disposal == 3 else None
            region = canvas[top : top + h, left : left + w]
            if transparent is not None:
                mask = rows != transparent
                # clip transparent index out so the palette lookup is
                # in-range even when it exceeds the table
                safe = np.where(mask, rows, 0)
                region[mask] = pal[safe][mask]
            else:
                region[:] = pal[rows]
            frames.append(canvas.copy())
            stamps.append(t_ms)
            t_ms += delay_ms
            if max_frames is not None and len(frames) >= max_frames:
                return frames, stamps
            if disposal == 2:
                canvas[top : top + h, left : left + w] = bg_color
            elif disposal == 3:
                canvas = before
            disposal = 0
            delay_ms = 0
            transparent = None
        else:
            raise ValueError(f"bad GIF block id 0x{block:02x}")
    if not frames:
        raise ValueError("GIF contains no image descriptor")
    return frames, stamps


def gif_encode(arr: np.ndarray, interlace: bool = False) -> bytes:
    """uint8 (H, W, 3) RGB array -> single-frame GIF89a bytes. Fixture
    generator for the LZW decoder: the palette is the image's unique
    colors (<= 256 or ValueError); compression is the spec-valid
    CLEAR-before-every-code scheme (code width never grows), which any
    conforming decoder accepts."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("gif_encode expects uint8 (H, W, 3)")
    h, w = arr.shape[:2]
    flat = arr.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("gif_encode fixture supports <= 256 colors")
    pal_bits = max((len(colors) - 1).bit_length(), 1)
    pal_n = 1 << pal_bits
    pal = np.zeros((pal_n, 3), dtype=np.uint8)
    pal[: len(colors)] = colors
    min_code = max(pal_bits, 2)
    clear = 1 << min_code
    code_size = min_code + 1
    bits = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    pix = idx.reshape(h, w)
    if interlace:
        order = [
            y for first, step in _GIF_INTERLACE for y in range(first, h, step)
        ]
        pix = pix[order]
    for v in pix.ravel():
        emit(clear)
        emit(int(v))
    emit(clear + 1)  # end-of-information
    if nbits:
        bits.append(acc & 0xFF)

    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (pal_bits - 1), 0, 0])
    out += pal.tobytes()
    out += b"\x2c" + b"\x00\x00\x00\x00"
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x40 if interlace else 0x00])
    out += bytes([min_code])
    for at in range(0, len(bits), 255):
        chunk = bits[at : at + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def gif_encode_animation(
    screen: tuple[int, int],
    items: list[tuple[np.ndarray, int, int, int, int, np.ndarray | None]],
    bg_index: int = 0,
) -> bytes:
    """Multi-frame GIF89a fixture generator (round-8) for the
    composition decoder: ``screen`` is (width, height); each item is
    ``(arr, left, top, delay_ms, disposal, transparent_mask)`` - an
    (h, w, 3) uint8 RGB region drawn at (left, top), shown for
    ``delay_ms`` (rounded down to centiseconds, per the format), then
    disposed per the GIF89a code (0/1 keep, 2 restore-background,
    3 restore-previous). ``transparent_mask`` (h, w) bool marks pixels
    encoded as the transparent index (True = see-through). One GLOBAL
    color table holds the union of all frames' colors plus one
    transparent slot (<= 255 distinct colors or ValueError);
    compression is gif_encode's spec-valid CLEAR-before-every-code
    scheme."""
    sw, sh = screen
    for arr, left, top, *_ in items:
        if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
            raise ValueError("animation frames must be uint8 (H, W, 3)")
        if left + arr.shape[1] > sw or top + arr.shape[0] > sh:
            raise ValueError("frame region outside logical screen")
    colors = np.unique(
        np.concatenate([arr.reshape(-1, 3) for arr, *_ in items]), axis=0
    )
    if len(colors) > 255:
        raise ValueError("animation fixture supports <= 255 colors")
    transparent_idx = len(colors)
    pal_bits = max((transparent_idx + 1 - 1).bit_length(), 1)
    pal_n = 1 << pal_bits
    pal = np.zeros((pal_n, 3), dtype=np.uint8)
    pal[: len(colors)] = colors
    min_code = max(pal_bits, 2)
    clear = 1 << min_code
    code_size = min_code + 1
    # vectorized palette lookup (ADVICE r8): np.unique(axis=0) returns
    # rows lexicographically sorted, so packing RGB to int24 gives a
    # strictly-increasing key array and searchsorted maps every pixel
    # to its palette index without a per-pixel Python dict probe
    keys = (
        (colors[:, 0].astype(np.int32) << 16)
        | (colors[:, 1].astype(np.int32) << 8)
        | colors[:, 2].astype(np.int32)
    )

    out = bytearray(b"GIF89a")
    out += sw.to_bytes(2, "little") + sh.to_bytes(2, "little")
    out += bytes([0x80 | (pal_bits - 1), bg_index, 0])
    out += pal.tobytes()
    for arr, left, top, delay_ms, disposal, mask in items:
        h, w = arr.shape[:2]
        flat = arr.reshape(-1, 3).astype(np.int32)
        packed_px = (flat[:, 0] << 16) | (flat[:, 1] << 8) | flat[:, 2]
        pos = np.clip(np.searchsorted(keys, packed_px), 0, len(keys) - 1)
        # searchsorted returns an arbitrary insertion point for a color
        # absent from the palette - assert exact membership so a future
        # palette-construction change fails loudly instead of silently
        # corrupting encoded indices (the dict lookup this replaced
        # raised KeyError)
        if not (keys[pos] == packed_px).all():
            raise ValueError("frame pixel color missing from palette")
        idx = pos.astype(np.uint8)
        if mask is not None:
            idx = np.where(mask.ravel(), transparent_idx, idx).astype(
                np.uint8
            )
        # Graphic Control Extension
        packed = (disposal & 0x07) << 2 | (1 if mask is not None else 0)
        out += bytes([0x21, 0xF9, 4, packed])
        out += (delay_ms // 10).to_bytes(2, "little")
        out += bytes([transparent_idx if mask is not None else 0, 0])
        # image descriptor, no local table, no interlace
        out += b"\x2c"
        out += left.to_bytes(2, "little") + top.to_bytes(2, "little")
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        out += b"\x00"
        out += bytes([min_code])
        bits = bytearray()
        acc = 0
        nbits = 0
        for v in idx:
            for code in (clear, int(v)):
                acc |= code << nbits
                nbits += code_size
                while nbits >= 8:
                    bits.append(acc & 0xFF)
                    acc >>= 8
                    nbits -= 8
        acc |= (clear + 1) << nbits
        nbits += code_size
        while nbits > 0:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        for at in range(0, len(bits), 255):
            chunk = bits[at : at + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


# -- BMP (BITMAPINFOHEADER / BITMAPCOREHEADER, public spec) -----------


def is_bmp(data: bytes) -> bool:
    return len(data) >= 2 and data[:2] == b"BM"


#: DIB header sizes actually defined by the spec lineage (CORE, INFO,
#: V2/V3 INFO, V4, V5). An exact-match whitelist, NOT `>= 40`: the "BM"
#: magic is printable ASCII, so a text payload starting with "BM" would
#: otherwise read letters as a huge header size and return garbage dims
#: instead of falling back to the surrogate arm.
_BMP_HEADER_SIZES = frozenset({12, 40, 52, 56, 108, 124})


def bmp_info(data: bytes) -> tuple[int, int]:
    """(width, height) from a BMP file header. Negative height means a
    top-down DIB - dimensions are reported absolute."""
    if not is_bmp(data):
        raise ValueError("not a BMP (bad signature)")
    if len(data) < 26:
        raise ValueError("truncated BMP header")
    hdr = int.from_bytes(data[14:18], "little")
    if hdr not in _BMP_HEADER_SIZES:
        raise ValueError(f"unsupported BMP header size {hdr}")
    if hdr == 12:  # BITMAPCOREHEADER: u16 dims
        w = int.from_bytes(data[18:20], "little")
        h = int.from_bytes(data[20:22], "little")
    else:  # BITMAPINFOHEADER and successors: i32 dims
        w = int.from_bytes(data[18:22], "little", signed=True)
        h = int.from_bytes(data[22:26], "little", signed=True)
    if w == 0 or h == 0:
        raise ValueError("degenerate BMP dimensions")
    return abs(w), abs(h)


def bmp_encode(arr: np.ndarray) -> bytes:
    """uint8 (H, W, 3) RGB -> 24-bit BI_RGB BMP bytes (BITMAPINFOHEADER,
    bottom-up rows, 4-byte stride padding). The encoder complement of
    bmp_decode: bmp_decode(bmp_encode(a)) == a."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("bmp_encode expects uint8 (H, W, 3)")
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, [2, 1, 0]].reshape(h, w * 3)
    pixels = rows.tobytes()
    info = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(pixels).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    header = (
        b"BM"
        + (14 + 40 + len(pixels)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
    )
    return header + info + pixels


def bmp_decode(data: bytes) -> np.ndarray:
    """Decode an UNCOMPRESSED (BI_RGB) 24/32-bit BMP into an (h, w, 3)
    RGB array: BGR(A) pixel order per the spec, 4-byte row padding,
    bottom-up rows unless height is negative. The common screenshot/
    export subset - anything else raises and the caller falls back to
    its surrogate arm."""
    w, h = bmp_info(data)
    hdr = int.from_bytes(data[14:18], "little")
    if hdr < 40:
        raise ValueError("bmp_decode needs BITMAPINFOHEADER")
    if len(data) < 34:
        raise ValueError("truncated BMP info header")
    raw_h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    compression = int.from_bytes(data[30:34], "little")
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(
            f"unsupported BMP (compression={compression}, bpp={bpp})"
        )
    offset = int.from_bytes(data[10:14], "little")
    if offset < 14 + hdr:
        # bfOffBits pointing inside the headers would silently decode
        # header bytes as pixels - route to the surrogate arm instead
        raise ValueError("BMP pixel offset inside header")
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    need = offset + stride * h
    if len(data) < need:
        raise ValueError("truncated BMP pixel array")
    rows = np.frombuffer(
        data[offset:offset + stride * h], dtype=np.uint8
    ).reshape(h, stride)[:, : w * nch].reshape(h, w, nch)
    if raw_h > 0:  # bottom-up storage
        rows = rows[::-1]
    return rows[:, :, [2, 1, 0]].copy()  # BGR(A) -> RGB, alpha dropped


def wav_samples(data: bytes):
    """Decode a 16-bit PCM WAV to float64 samples in [-1, 1],
    channel-mixed to mono (mean across channels). None when the bytes
    are not a parseable 16-bit PCM WAV (other formats/bit depths keep
    the surrogate arm upstream)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    body = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if tag == b"fmt " and size >= 16:
            fmt = data[pos + 8 : pos + 8 + size]
        elif tag == b"data":
            body = data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    if fmt is None or body is None or len(fmt) < 16:
        return None
    audio_format, channels = struct.unpack("<HH", fmt[0:4])
    (bits,) = struct.unpack("<H", fmt[14:16])
    if audio_format != 1 or bits != 16 or channels < 1:
        return None
    usable = len(body) - (len(body) % (2 * channels))
    if usable == 0:
        return np.zeros(0)
    x = np.frombuffer(body[:usable], dtype="<i2").astype(np.float64)
    x = x.reshape(-1, channels).mean(axis=1)
    return x / 32768.0


def wav_encode_pcm(
    sample_rate: int, pcm: "np.ndarray", channels: int = 1
) -> bytes:
    """Wrap raw int16 samples in a RIFF/WAVE header (round-8 fixture
    generator): the arbitrary-waveform sibling of wav_encode_silence /
    wav_encode_tone, for oracle queries that need exactly-known sample
    values (step/constant waveforms whose RMS and silence ratio are
    closed-form rationals)."""
    pcm = np.asarray(pcm, dtype="<i2")
    data = pcm.tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_encode_tone(
    sample_rate: int,
    duration_ms: int,
    freq_hz: float,
    amplitude: float = 0.5,
    channels: int = 1,
) -> bytes:
    """16-bit PCM WAV of a sine tone - the fixture generator for the
    sample-decode path (wav_encode_silence's non-trivial sibling)."""
    n = sample_rate * duration_ms // 1000
    t = np.arange(n, dtype=np.float64) / sample_rate
    wave = np.clip(amplitude * np.sin(2 * np.pi * freq_hz * t), -1, 1)
    pcm = (wave * 32767.0).astype("<i2")
    if channels > 1:
        pcm = np.repeat(pcm[:, None], channels, axis=1).reshape(-1)
    data = pcm.tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
