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

import os
import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

MAGIC = b"TOKS"
VERSION = 1

#: result schema of a tokshard scan
SHARD_SCHEMA = "shard_id long, doc_id long, n_ids int, ids array<int>"


def write_token_shards(
    ids_df: DataFrame,
    path: str,
    budget: int,
    id_col: str = "doc_id",
    ids_col: str = "ids_csv",
) -> DataFrame:
    """Pack (doc_id, ids_csv) rows into ~``budget``-token shard files
    under ``path``; returns the manifest (shard_id, n_docs, n_tokens,
    file) - one row per written file. Executor-side IO: each shard
    group serializes and writes its own file; the driver never holds
    shard bytes."""
    import pandas as pd

    from ghcrawler_datalake_etl_spark.operators.sampling import pack_shards

    os.makedirs(path, exist_ok=True)
    weighted = ids_df.select(
        F.col(id_col).alias("doc_id"),
        F.col(ids_col).alias("_csv"),
        F.size(F.split(F.col(ids_col), ",")).cast("double").alias("_w"),
    )
    # the id-encoding upstream is expensive and pack's plan branches
    # (quantile sketch, per-bin window, offsets) plus the write each
    # re-evaluate their input - persist the narrow weighted projection
    # once (the pack_shards materialize contract)
    packed = pack_shards(weighted, "doc_id", "_w", budget, materialize=True)

    def _write(pdf: pd.DataFrame) -> pd.DataFrame:
        sid = int(pdf["shard_id"].iloc[0])
        pdf = pdf.sort_values("doc_id")
        fname = os.path.join(path, f"shard-{sid:05d}.tokshard")
        n_tokens = 0
        with open(fname, "wb") as fh:
            fh.write(MAGIC + bytes([VERSION]))
            for doc_id, csv in zip(pdf["doc_id"], pdf["_csv"]):
                ids = [int(x) for x in csv.split(",")] if csv else []
                n_tokens += len(ids)
                fh.write(struct.pack("<QI", int(doc_id), len(ids)))
                fh.write(struct.pack(f"<{len(ids)}I", *ids))
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

    def read(self, partition: _ShardPartition):
        import numpy as np

        for file_path, shard_id in partition.files:
            with open(file_path, "rb") as fh:
                data = fh.read()
            if data[:4] != MAGIC or data[4] != VERSION:
                raise ValueError(f"bad tokshard header in {file_path}")
            pos = 5
            n = len(data)
            while pos < n:
                doc_id, n_ids = struct.unpack_from("<QI", data, pos)
                pos += 12
                ids = np.frombuffer(
                    data, dtype="<u4", count=n_ids, offset=pos
                )
                pos += 4 * n_ids
                yield (shard_id, doc_id, n_ids, [int(x) for x in ids])


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


def read_token_shards(spark, path: str) -> DataFrame:
    """Register (idempotent) and read a shard store."""
    spark.dataSource.register(TokenShardDataSource)
    return spark.read.format("tokshard").option("path", path).load()
