"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs.

The Spark-side design is fully real - schemas, batch iteration,
partition discipline - while the codec step is stubbed behind
``_decode_image_bytes`` (the runtime image/audio libraries are not in
this container). Swapping the stub for PIL/ffmpeg changes no plan shape:
``mapInPandas`` streams Arrow record batches either way, and the 100 TB
properties (no shuffle, per-batch vectorization, bounded memory via
``spark.sql.execution.arrow.maxRecordsPerBatch``) are identical.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, content binary, "
    "width int, height int, sample_rate int, duration_ms long"
)

FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, content_sha256 string, "
    "fake_mean_luma double, fake_n_frames int"
)

_REAL_CODECS = False
try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401

    _REAL_CODECS = True
except Exception:
    _REAL_CODECS = False


def _decode_image_bytes(content: bytes) -> dict:
    """Codec stub: deterministic fake features derived from the bytes.

    With real codecs installed this is where PIL/libav decode happens;
    the deterministic fake keeps every downstream test meaningful
    (stable values, correct types) without the native libraries.
    """
    if _REAL_CODECS:
        raise NotImplementedError(
            "real decode path intentionally unimplemented in this build; "
            "plug PIL/av decoding here"
        )
    digest = hashlib.sha256(content).digest()
    return {
        "content_sha256": hashlib.sha256(content).hexdigest(),
        # fake luma in [0,1) from the first digest bytes - deterministic
        "fake_mean_luma": int.from_bytes(digest[:4], "big") / 2**32,
        "fake_n_frames": digest[4] % 16 + 1,
    }


def attach_binary(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Wrap a column's bytes as a media row set (MEDIA_SCHEMA shape):
    the ingestion adapter from any source that yields (id, bytes)."""
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.lit("image/fake").alias("media_type"),
        F.encode(F.col(payload_col).cast("string"), "utf-8").alias("content"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("sample_rate"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract every media row (mapInPandas, Arrow
    batches). No shuffle: a pure per-partition pass."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            content = [b if b is not None else b"" for b in pdf["content"]]
            feats = [_decode_image_bytes(b) for b in content]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(b) for b in content],
                    "content_sha256": [f["content_sha256"] for f in feats],
                    "fake_mean_luma": [f["fake_mean_luma"] for f in feats],
                    "fake_n_frames": [f["fake_n_frames"] for f in feats],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize every image row to (width, height) - MEDIA_SCHEMA in,
    MEDIA_SCHEMA out, so resize stages compose/chain freely.

    Plumbing is real (Arrow batches, binary in/binary out, no shuffle);
    the pixel work is the codec stub: the fake "resized" payload is the
    sha256 digest of (content, size) - deterministic, content- and
    size-sensitive, so tests can pin exact bytes. With PIL installed the
    stub body is the only thing that changes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tag = f":{width}x{height}".encode()
        for pdf in batches:
            if not len(pdf):
                continue
            content = [b if b is not None else b"" for b in pdf["content"]]
            out = pdf.copy()
            out["content"] = [
                hashlib.sha256(b + tag).digest() for b in content
            ]
            out["width"] = width
            out["height"] = height
            out["width"] = out["width"].astype("int32")
            out["height"] = out["height"].astype("int32")
            yield out

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


FRAME_SCHEMA = (
    "doc_id long, media_type string, frame_idx int, frame_ts_ms long, "
    "frame binary"
)

FRAME_INTERVAL_MS = 40  # fake 25 fps


def sample_frames(media: DataFrame, max_frames: int = 8) -> DataFrame:
    """Sample frames from every video row: one input row fans out to
    n_frames output rows (FRAME_SCHEMA) - the row-multiplying UDTF shape
    (mapInPandas yielding more rows than it consumes), which is the part
    worth pinning with tests regardless of codec.

    Frame count and bytes are the codec stub: n = digest[4] % max_frames
    + 1 deterministic fake frames, frame i = sha256(content + b":" + i).
    Every value is reproducible in SQL (sha256 is portable), so the
    query layer carries a full DuckDB oracle despite the Python hop.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids, mtypes, idxs, tss, frames = [], [], [], [], []
            for doc_id, mtype, b in zip(
                pdf["doc_id"], pdf["media_type"], pdf["content"]
            ):
                b = b if b is not None else b""
                n = hashlib.sha256(b).digest()[4] % max_frames + 1
                for i in range(n):
                    ids.append(doc_id)
                    mtypes.append(mtype)
                    idxs.append(i)
                    tss.append(i * FRAME_INTERVAL_MS)
                    frames.append(
                        hashlib.sha256(b + b":" + str(i).encode()).digest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "media_type": mtypes,
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_ts_ms": pd.Series(tss, dtype="int64"),
                    "frame": frames,
                }
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


AUDIO_CHUNK_SCHEMA = (
    "doc_id long, media_type string, chunk_idx int, "
    "start_ms long, end_ms long, chunk binary"
)

# codec stub: 5 "ms" of fake audio per payload byte
AUDIO_MS_PER_BYTE = 5


def _decode_audio_duration_ms(content: bytes) -> int:
    """STUB for the audio decode step (no audio libs in this
    container): deterministic fake duration derived from payload size.
    A real deployment swaps in soundfile/ffprobe behind the same
    signature."""
    return len(content) * AUDIO_MS_PER_BYTE


def chunk_audio(media: DataFrame, chunk_ms: int = 1000) -> DataFrame:
    """Split every audio row into fixed-duration chunks: the same
    row-multiplying mapInPandas shape as sample_frames, with the extra
    contract that the LAST chunk is truncated to the stream's duration
    (end_ms = min((i+1)*chunk_ms, duration)) - the detail that matters
    when chunk boundaries feed a transcription window downstream.

    Chunk bytes are the codec stub sha256(content + b"@" + i); duration
    is the stub above - both reproducible in SQL, so the query layer
    carries a full DuckDB oracle despite the Python hop. Empty payloads
    yield zero chunks (nothing to transcribe).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids, mtypes, idxs, starts, ends, chunks = [], [], [], [], [], []
            for doc_id, mtype, b in zip(
                pdf["doc_id"], pdf["media_type"], pdf["content"]
            ):
                b = b if b is not None else b""
                dur = _decode_audio_duration_ms(b)
                n = (dur + chunk_ms - 1) // chunk_ms
                for i in range(n):
                    ids.append(doc_id)
                    mtypes.append(mtype)
                    idxs.append(i)
                    starts.append(i * chunk_ms)
                    ends.append(min((i + 1) * chunk_ms, dur))
                    chunks.append(
                        hashlib.sha256(b + b"@" + str(i).encode()).digest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "media_type": mtypes,
                    "chunk_idx": pd.Series(idxs, dtype="int32"),
                    "start_ms": pd.Series(starts, dtype="int64"),
                    "end_ms": pd.Series(ends, dtype="int64"),
                    "chunk": chunks,
                }
            )

    return media.mapInPandas(run, schema=AUDIO_CHUNK_SCHEMA)
