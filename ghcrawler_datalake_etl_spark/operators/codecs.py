"""Pure-stdlib media codecs for the multimodal operators.

This container has no PIL/libav, so the "real decode path" is
implemented from the public file-format specs with nothing but
``zlib``/``struct``/numpy:

- PNG decode/encode (ISO/IEC 15948): 8-bit depth, color types
  0/2/3/4/6, all five scanline filters, non-interlaced. Enough to
  decode real-world screenshots/thumbnails and to round-trip our own
  encoder output losslessly.
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


def jpeg_dims(data: bytes) -> tuple[int, int]:
    """(width, height) from the first SOF marker of a JPEG stream -
    a pure header scan (ITU T.81 B.2), no entropy decode. The 100 TB
    use case is exactly this: dimension/metadata extraction over binary
    columns without paying for pixel decode."""
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
            if seglen < 7:
                raise ValueError("truncated JPEG SOF")
            height = int.from_bytes(data[i + 3:i + 5], "big")
            width = int.from_bytes(data[i + 5:i + 7], "big")
            return width, height
        if marker == 0xDA:  # SOS: entropy data follows, no SOF seen
            break
        i += seglen
    raise ValueError("JPEG has no SOF frame header")


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
