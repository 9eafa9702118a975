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
