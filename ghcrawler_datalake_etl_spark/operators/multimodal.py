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
            feats = [_decode_image_bytes(b) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "content_sha256": [f["content_sha256"] for f in feats],
                    "fake_mean_luma": [f["fake_mean_luma"] for f in feats],
                    "fake_n_frames": [f["fake_n_frames"] for f in feats],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)
