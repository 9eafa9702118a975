"""Token-shard binary store: the landing format of the tokenizer path
(BPE train -> encode ids -> pack) plus a Spark 4 Python DataSource that
reads it back partition-parallel.

Training infrastructure wants token sequences in dumb, seekable binary
shards, not parquet: a data loader memory-maps one shard per worker and
never touches a column reader. The format here is deliberately minimal
and public:

    file      := magic version record*
    magic     := b"TOKS"            (4 bytes)
    version   := u8 (=1)
    record    := doc_id u64 LE, n_ids u32 LE, ids (u32 LE) * n_ids

``write_token_shards`` packs documents into ~budget-token shards
(operators/sampling.pack_shards - the quantile-binned two-level cumsum,
no global sort) and writes one ``shard-NNNNN.tokshard`` file per shard
from the executors (applyInPandas over the shard group; rows laid out
doc_id-ascending so shard bytes are deterministic).

``TokenShardDataSource`` registers the ``tokshard`` format with Spark's
Python DataSource API (public pyspark.sql.datasource, Spark 4): one
InputPartition per shard file, so a read of a 10k-shard store fans out
10k-way with no driver bottleneck; per-file bytes parse with numpy
(vectorized u32 reads), not per-record Python.
"""

from __future__ import annotations

import json
import os
import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

MAGIC = b"TOKS"
VERSION = 1

#: store manifest sidecar (leading underscore: never matches the
#: reader's ``*.tokshard`` partition glob or the append probe's
#: ``shard-*`` prefix)
MANIFEST = "_manifest.json"

#: result schema of a tokshard scan
SHARD_SCHEMA = "shard_id long, doc_id long, n_ids int, ids array<int>"


def _shard_index(fname: str) -> int | None:
    """shard-NNN...N.tokshard -> N (full digit run - the writer's %05d
    format widens past 99999); None for any other file."""
    if not (fname.startswith("shard-") and fname.endswith(".tokshard")):
        return None
    try:
        return int(fname[6 : -len(".tokshard")])
    except ValueError:
        return None


def write_store_manifest(path: str) -> dict:
    """Scan the store directory ONCE and atomically write
    ``_manifest.json`` (``{"version": 1, "next_shard": N, "n_files":
    M}``) beside the shards via tmp-file + ``os.replace``. Object-store
    shape (VERDICT r9 #7): appenders read the next shard index from
    this O(1) sidecar instead of listing the whole store - the listing
    cost is paid once here, at store-maintenance time (after a write or
    append action completes), not on every append's planning path.
    Returns the manifest dict."""
    nxt = 0
    n_files = 0
    if os.path.isdir(path):
        for f in os.listdir(path):
            idx = _shard_index(f)
            if idx is not None:
                n_files += 1
                nxt = max(nxt, idx + 1)
    manifest = {"version": 1, "next_shard": nxt, "n_files": n_files}
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, MANIFEST + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, os.path.join(path, MANIFEST))
    return manifest


def next_shard_index(path: str) -> int:
    """The first free shard index of a store: from ``_manifest.json``
    when present (no directory listing - the object-store path), else
    from one listing of the shard files (fallback: stores written
    before the manifest existed, or whose maintainer never ran
    write_store_manifest)."""
    from ghcrawler_datalake_etl_spark.functions.core import (
        require_driver_local,
    )

    # on an object-store URI both the manifest probe and the listing
    # fallback silently read empty -> index 0 would overwrite standing
    # shards even under exclusive=True (os.path.exists is just as
    # blind); fail loudly instead
    require_driver_local(path, "tokshard store")
    mpath = os.path.join(path, MANIFEST)
    if os.path.isfile(mpath):
        with open(mpath) as fh:
            return int(json.load(fh)["next_shard"])
    base = 0
    if os.path.isdir(path):
        for f in os.listdir(path):
            idx = _shard_index(f)
            if idx is not None:
                base = max(base, idx + 1)
    return base


def write_token_shards(
    ids_df: DataFrame,
    path: str,
    budget: int,
    id_col: str = "doc_id",
    ids_col: str = "ids_csv",
    shard_base: int = 0,
    exclusive: bool = False,
) -> DataFrame:
    """Pack (doc_id, ids_csv) rows into ~``budget``-token shard files
    under ``path``; returns the manifest (shard_id, n_docs, n_tokens,
    file) - one row per written file. Executor-side IO: each shard
    group serializes and writes its own file; the driver never holds
    shard bytes. ``shard_base`` offsets every shard index - the
    append_token_shards delta path lands new files AFTER an existing
    store's numbering without touching its bytes. ``exclusive=True``
    refuses to replace an existing shard file (collision = another
    writer minted the same index - fail loudly rather than silently
    swallow their bytes); the default overwrite keeps a full-store
    rerun idempotent."""
    import numpy as np
    import pandas as pd

    from ghcrawler_datalake_etl_spark.operators.sampling import pack_shards

    os.makedirs(path, exist_ok=True)
    # CSV -> array<int> happens HERE, inside whole-stage codegen: the
    # Python writer below receives numpy id arrays over Arrow and never
    # parses an element (the per-element int(csv.split(...)) loop was
    # the write path's Python boundary, the twin of the reader's old
    # per-row yield). NULL/empty csv -> empty sequence by contract.
    ids_arr = F.when(
        F.col(ids_col).isNull() | (F.col(ids_col) == ""),
        F.array().cast("array<int>"),
    ).otherwise(F.split(F.col(ids_col), ",").cast("array<int>"))
    weighted = ids_df.select(
        F.col(id_col).alias("doc_id"),
        ids_arr.alias("_ids"),
    ).withColumn("_w", F.size("_ids").cast("double"))
    # the id-encoding upstream is expensive and pack's plan branches
    # (quantile sketch, per-bin window, offsets) plus the write each
    # re-evaluate their input - persist the narrow weighted projection
    # once (the pack_shards materialize contract)
    packed = pack_shards(weighted, "doc_id", "_w", budget, materialize=True)
    if shard_base:
        packed = packed.withColumn(
            "shard_id", F.col("shard_id") + F.lit(int(shard_base))
        )

    def _write(pdf: pd.DataFrame) -> pd.DataFrame:
        sid = int(pdf["shard_id"].iloc[0])
        pdf = pdf.sort_values("doc_id")
        fname = os.path.join(path, f"shard-{sid:05d}.tokshard")
        if exclusive and os.path.exists(fname):
            raise ValueError(
                f"tokshard collision: {fname} already exists - a "
                f"concurrent appender (or a stale manifest) minted a "
                f"live shard index; the store is single-writer"
            )
        n_tokens = 0
        # land bytes in a sidecar then os.replace: a crashed task never
        # leaves a torn shard, and the swap is atomic on POSIX
        tmp = fname + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(MAGIC + bytes([VERSION]))
            for doc_id, ids in zip(pdf["doc_id"], pdf["_ids"]):
                arr = np.asarray(ids, dtype="<u4")
                n_tokens += arr.size
                fh.write(struct.pack("<QI", int(doc_id), arr.size))
                fh.write(arr.tobytes())
        os.replace(tmp, fname)
        return pd.DataFrame(
            {
                "shard_id": [sid],
                "n_docs": [len(pdf)],
                "n_tokens": [n_tokens],
                "file": [os.path.basename(fname)],
            }
        )

    return packed.groupBy("shard_id").applyInPandas(
        _write, schema="shard_id long, n_docs long, n_tokens long, file string"
    )


def append_token_shards(
    ids_df: DataFrame,
    path: str,
    budget: int,
    id_col: str = "doc_id",
    ids_col: str = "ids_csv",
) -> DataFrame:
    """Delta-append to an existing token-shard store: pack ONLY the new
    documents into NEW shard files numbered after the store's current
    maximum - no existing shard is read, rewritten, or renamed (the
    incremental "daily tokenization" path; a full write_token_shards
    rerun re-serializes the whole corpus). The next-index probe reads
    the store's ``_manifest.json`` sidecar when present (O(1), no
    listing - the object-store path) and falls back to one driver-side
    directory listing otherwise (store METADATA, one entry per shard
    file, never shard bytes). Returns the manifest frame of the NEW
    files only - run ``write_store_manifest(path)`` after consuming it
    to refresh the sidecar.

    Single-writer contract: the probe-then-write is not atomic, so two
    concurrent appenders (or an append racing a full rerun) can mint
    the same index; the executor-side write opens shards exclusively
    and RAISES on collision rather than silently replacing the other
    writer's bytes."""
    return write_token_shards(
        ids_df, path, budget, id_col=id_col, ids_col=ids_col,
        shard_base=next_shard_index(path), exclusive=True,
    )


class _ShardPartition(InputPartition):
    #: a BATCH of shard files: one task per tiny file is the classic
    #: small-files anti-pattern (measured: 2.5k single-file partitions
    #: cost 20s of pure task launch at sf0.1), so files group into at
    #: most maxPartitions read tasks.
    def __init__(self, files: list[tuple[str, int]]) -> None:
        self.files = files


class _TokenShardReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("tokshard: 'path' option is required")
        self.max_partitions = int(options.get("maxPartitions", 64))
        # "arrow" (default): yield ONE pyarrow.RecordBatch per shard
        # file - doc ids / lengths / the flat token buffer cross the
        # Python->JVM boundary as columnar buffers (ids zero-copy from
        # the <u4 mmap view). "rows": the legacy per-row tuple yield,
        # kept so the batch-vs-row equality contract stays testable
        # end-to-end through Spark.
        self.batch_mode = options.get("batchMode", "arrow")
        if self.batch_mode not in ("arrow", "rows"):
            raise ValueError(
                f"tokshard: batchMode must be 'arrow' or 'rows', "
                f"got {self.batch_mode!r}"
            )

    def partitions(self):
        files = sorted(
            f for f in os.listdir(self.path) if f.endswith(".tokshard")
        )
        entries = [
            (os.path.join(self.path, f), int(f.split("-")[1].split(".")[0]))
            for f in files
        ]
        if not entries:  # empty store: one no-op partition (the API
            return [_ShardPartition([])]  # rejects an empty plan)
        n_parts = max(1, min(self.max_partitions, len(entries)))
        groups: list[list] = [[] for _ in range(n_parts)]
        for i, e in enumerate(entries):
            groups[i % n_parts].append(e)
        return [_ShardPartition(g) for g in groups if g]

    @staticmethod
    def _parse(file_path: str):
        """Walk one shard file's records; returns (doc_ids u64 array,
        n_ids u32 array, id_slices list-of-<u4-views). One Python step
        per RECORD (header decode); token payloads stay numpy views
        over the file buffer, never element-iterated."""
        import numpy as np

        with open(file_path, "rb") as fh:
            data = fh.read()
        if data[:4] != MAGIC or data[4] != VERSION:
            raise ValueError(f"bad tokshard header in {file_path}")
        pos, n = 5, len(data)
        doc_ids: list[int] = []
        lens: list[int] = []
        slices: list = []
        while pos < n:
            doc_id, n_ids = struct.unpack_from("<QI", data, pos)
            pos += 12
            slices.append(
                np.frombuffer(data, dtype="<u4", count=n_ids, offset=pos)
            )
            pos += 4 * n_ids
            doc_ids.append(doc_id)
            lens.append(n_ids)
        return (
            np.asarray(doc_ids, dtype=np.int64),
            np.asarray(lens, dtype=np.int32),
            slices,
        )

    def read(self, partition: _ShardPartition):
        import numpy as np

        if self.batch_mode == "rows":
            for file_path, shard_id in partition.files:
                doc_ids, lens, slices = self._parse(file_path)
                for doc_id, n_ids, ids in zip(doc_ids, lens, slices):
                    yield (shard_id, int(doc_id), int(n_ids),
                           [int(x) for x in ids])
            return

        import pyarrow as pa

        for file_path, shard_id in partition.files:
            doc_ids, lens, slices = self._parse(file_path)
            n_rows = len(doc_ids)
            # flat token buffer + int32 offsets -> ListArray; the <u4
            # payload reinterprets as int32 bit-for-bit (view, no copy)
            # to match the declared array<int> schema, identical to the
            # old per-element int() path for any id < 2^31.
            values = (
                np.concatenate(slices) if slices
                else np.empty(0, dtype="<u4")
            ).view("<i4")
            offsets = np.zeros(n_rows + 1, dtype=np.int32)
            np.cumsum(lens, out=offsets[1:])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(
                        np.full(n_rows, shard_id, dtype=np.int64),
                        type=pa.int64(),
                    ),
                    pa.array(doc_ids, type=pa.int64()),
                    pa.array(lens, type=pa.int32()),
                    pa.ListArray.from_arrays(
                        pa.array(offsets, type=pa.int32()),
                        pa.array(values, type=pa.int32()),
                    ),
                ],
                names=["shard_id", "doc_id", "n_ids", "ids"],
            )


class TokenShardDataSource(DataSource):
    """``spark.read.format("tokshard").option("path", dir).load()`` -
    register once per session with
    ``spark.dataSource.register(TokenShardDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "tokshard"

    def schema(self) -> str:
        return SHARD_SCHEMA

    def reader(self, schema) -> _TokenShardReader:
        return _TokenShardReader(self.options)


def read_token_shards(
    spark, path: str, batch_mode: str = "arrow"
) -> DataFrame:
    """Register (idempotent) and read a shard store."""
    spark.dataSource.register(TokenShardDataSource)
    return (
        spark.read.format("tokshard")
        .option("path", path)
        .option("batchMode", batch_mode)
        .load()
    )
