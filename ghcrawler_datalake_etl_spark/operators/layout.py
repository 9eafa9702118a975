"""Multi-dimensional data layout: Z-order (Morton) clustering.

The reference engine controls layout one-dimensionally - every table is
hash-distributed and range-indexed on a single key chain (the
``DISTRIBUTED BY HASH / INDEX ... CLUSTERED BY`` clauses in
``USQL/CreateAndInitialize*.usql``); a predicate on any OTHER column
scans everything. Z-ordering interleaves the bits of several columns
into one sort key so that range-partitioned files are bounding BOXES:
min/max footer stats prune scans on EVERY participating dimension, not
just the leading one (the technique behind Delta Lake OPTIMIZE ZORDER
and the classic UB-tree).

Everything here is integer bit arithmetic (shift / and / or on
BIGINTs), replayable bit-for-bit by a DuckDB oracle and fully inside
whole-stage codegen - no UDFs.

Scale notes: :func:`write_zordered` is repartitionByRange on the
z-key + an in-partition sort - ONE range-exchange (with Spark's
sampled bounds) regardless of dimension count, then a parallel write.
The z-key itself is a per-row projection; nothing about the layout
pass is data-size-bound beyond the shuffle every clustered write
already pays.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits kept per dimension (values are masked into [0, 2^16))
ZORDER_BITS = 16

#: magic-number bit spreads: 16 source bits -> every second bit of 32
_SPREAD = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread16(col: Column) -> Column:
    """Spread the low 16 bits of ``col`` to the even bit positions of a
    32-bit value (Morton encoding step), as pure integer ops."""
    x = col.cast("long").bitwiseAND(F.lit((1 << ZORDER_BITS) - 1))
    for shift, mask in _SPREAD:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zorder_key(cols: Sequence[Column | str]) -> Column:
    """Interleave the low 16 bits of exactly TWO integer columns into
    one Morton key: column 0 holds the even key bits, column 1 the odd
    ones. (The every-second-bit spread masks are specific to 2-way
    interleaving; higher arity needs every-Nth-bit masks - extend
    ``_SPREAD`` before widening this signature.)

    Rows where any participating column is NULL get a NULL key (they
    sort together at the range edge; callers decide whether to drop).
    """
    if len(cols) != 2:
        raise ValueError("zorder_key interleaves exactly 2 columns")
    parts = [
        F.shiftleft(_spread16(F.col(c) if isinstance(c, str) else c), i)
        for i, c in enumerate(cols)
    ]
    return parts[0].bitwiseOR(parts[1])


def minmax_scale16(col: str, lo: str, hi: str) -> Column:
    """Linearly map ``col`` from ``[lo, hi]`` onto the z-key's 16-bit
    budget as exact BIGINT arithmetic: ``(col-lo)*65535 DIV (hi-lo)``.

    Raw values rarely fill 16 bits evenly (a custkey that tops out at
    2000 leaves the key's high interleaved bits constant and the
    z-ranges degenerate to one dimension), so dimensions are scaled by
    their observed bounds first - the same idea as Delta's per-column
    range ids, kept as integer division so an oracle replays it. A
    degenerate dimension (hi == lo) maps to 0. Arguments are COLUMN
    NAMES (the bounds usually arrive via a broadcast 1-row aggregate
    cross join).
    """
    return F.expr(
        f"CASE WHEN {hi} > {lo} THEN "
        f"CAST((({col} - {lo}) * 65535) DIV ({hi} - {lo}) AS LONG) "
        f"ELSE 0 END"
    )


def write_zordered(
    df: DataFrame,
    cols: Sequence[str],
    path: str,
    *,
    n_files: int,
    key_col: str = "_zorder",
) -> None:
    """Write ``df`` as ~``n_files`` parquet files range-clustered on
    the Morton key of ``cols``: each output file covers a contiguous
    z-range, i.e. a bounding box in every clustered dimension, so
    min/max footer stats prune on any of them.
    """
    c0, c1 = cols
    bounds = df.agg(
        F.min(c0).alias("_lo0"),
        F.max(c0).alias("_hi0"),
        F.min(c1).alias("_lo1"),
        F.max(c1).alias("_hi1"),
    )
    keyed = df.crossJoin(F.broadcast(bounds)).withColumn(
        key_col,
        zorder_key(
            [
                minmax_scale16(c0, "_lo0", "_hi0"),
                minmax_scale16(c1, "_lo1", "_hi1"),
            ]
        ),
    )
    (
        keyed.repartitionByRange(n_files, key_col)
        .sortWithinPartitions(key_col)
        .drop(key_col, "_lo0", "_hi0", "_lo1", "_hi1")
        .write.mode("overwrite")
        .parquet(path)
    )
