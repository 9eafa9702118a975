"""Temporal join operators Spark lacks as built-ins: as-of join and
interval (range) join.

The reference has no temporal joins (all its joins are URN equi-joins,
SURVEY.md 2.3); these are extension operators for event-stream analytics
at scale, built as compositions of DataFrame primitives:

- ``asof_join``: NOT the naive "join all earlier rows then pick max"
  (which materializes O(left x right-per-key) pairs before pruning).
  Both sides are tagged and unioned, shuffled ONCE on the key, sorted
  within partition by time, and the right payload is carried forward
  with last(ignorenulls) - O((|L|+|R|) log) per key, one exchange, no
  pair blowup. This is the standard merge-join formulation of as-of.
- ``interval_join``: a pure range predicate (no equi key) would be a
  broadcast-nested-loop join in Spark. Binning makes it an equi-join:
  each left row lands in one fixed-width time bin, each right interval
  explodes to every bin it covers, the join runs on bin id, and the
  exact BETWEEN predicate prunes bin-edge false positives. A pair can
  only meet in the left row's own bin, so no dedup is needed.
  Bin width tunes the replicate-vs-prune trade: ~median interval width
  is a good default.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` (direction="backward") or the smallest
    ``right_ts`` >= ``left_ts`` ("forward") within the same ``on`` key -
    a left join (no match -> NULLs). Ties on the timestamp: the right
    row counts as happening before the left row (inclusive match).

    Right payload columns are appended with ``suffix``; the right
    timestamp itself comes back as ``{right_ts}{suffix}``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    on = list(on)
    r_payload = [c for c in right.columns if c not in on]
    r_struct_type = right.select(
        F.struct(*[F.col(c) for c in r_payload]).alias("_r")
    ).schema["_r"].dataType

    l_tag = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    r_tag = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns]).alias("x"))
            .schema["x"].dataType
        ).alias("_l"),
        F.struct(*[F.col(c) for c in r_payload]).alias("_r"),
    )
    merged = l_tag.unionByName(r_tag)

    # backward: ascending time, right rows sort before left rows at equal
    # ts so an exactly-simultaneous right row matches. forward: mirror.
    if direction == "backward":
        order = [F.col("_ts").asc(), F.col("_is_left").asc()]
    else:
        order = [F.col("_ts").desc(), F.col("_is_left").asc()]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        merged.withColumn("_match", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_is_left") == 1)
    )
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"_match.{c}").alias(f"{c}{suffix}") for c in r_payload]
    return matched.select(*out_cols)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    start_col: str,
    end_col: str,
    bin_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each left row to every right interval containing its
    timestamp (``start_col`` <= ``left_ts`` <= ``end_col``, inclusive),
    with no equi key - the binned form of a range join.
    """
    if how != "inner":
        raise ValueError("interval_join supports inner only")
    w = F.lit(bin_seconds)
    lb = left.withColumn(
        "_bin", F.floor(F.col(left_ts).cast("double") / w).cast("long")
    )
    rb = right.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col).cast("double") / w).cast("long"),
                F.floor(F.col(end_col).cast("double") / w).cast("long"),
            )
        ),
    )
    return (
        lb.join(rb, "_bin")
        .filter(
            (F.col(left_ts) >= F.col(start_col))
            & (F.col(left_ts) <= F.col(end_col))
        )
        .drop("_bin")
    )


def fill_forward(
    df: DataFrame,
    cols: Sequence[str],
    partition_by: Sequence[str],
    order_by: Sequence[str],
) -> DataFrame:
    """Last-observation-carried-forward gap filling: for each column in
    ``cols``, nulls take the most recent non-null value within the
    partition under ``order_by`` (which must be a TOTAL order - include
    a unique tiebreak column - or the fill is nondeterministic).

    One window pass over a running ROWS frame: Spark keeps only the
    current last-seen non-null per column in the frame state, so cost is
    one shuffle on ``partition_by`` + a per-partition sort, independent
    of gap length. The filled column keeps its source name with an
    ``_filled`` suffix; originals are preserved.
    """
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in cols:
        out = out.withColumn(
            f"{c}_filled", F.last(F.col(c), ignorenulls=True).over(w)
        )
    return out


def interpolate_linear(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    partition_by: Sequence[str],
    tiebreak: Sequence[str],
    digits: int = 6,
) -> DataFrame:
    """Linear interpolation of NULL values between the nearest non-null
    observations within a partition - the INTERIOR complement of
    :func:`fill_forward` (LOCF carries one side; this draws the line
    between both): ``v = prev + (next - prev) * (t - t_prev) /
    (t_next - t_prev)`` over exact microsecond timestamps, floor-
    quantized. Rows missing a neighbor on EITHER side stay NULL
    (leading/trailing gaps are LOCF's job, not a line's); non-null
    rows keep their value untouched. Rows whose two neighbors share a
    timestamp also stay NULL (the line is undefined; possible only
    under duplicate timestamps).

    ``ts_col`` must be non-null on every row (filter first - engines
    disagree on NULL placement in window order) and (``ts_col``,
    ``tiebreak``) must be a total order.

    Scale: one shuffle on ``partition_by`` + one per-partition sort;
    both neighbor scans are running-frame window passes over the same
    sort (Spark evaluates them in a single WindowExec), state = one
    (t, v) struct per direction - independent of gap length, same
    contract as fill_forward.
    """
    from ghcrawler_datalake_etl_spark.functions.core import quantize

    tus = F.unix_micros(F.col(ts_col))
    obs = F.when(
        F.col(value_col).isNotNull(),
        F.struct(tus.alias("t"), F.col(value_col).alias("v")),
    )
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak]]
    w_prev = (
        Window.partitionBy(*partition_by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_next = (
        Window.partitionBy(*partition_by)
        .orderBy(*order)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    prev = F.last(obs, ignorenulls=True).over(w_prev)
    nxt = F.first(obs, ignorenulls=True).over(w_next)
    frac = (tus - prev["t"]).cast("double") / (nxt["t"] - prev["t"])
    line = prev["v"] + (nxt["v"] - prev["v"]) * frac
    return df.withColumn(
        f"{value_col}_interp",
        F.when(F.col(value_col).isNotNull(), F.col(value_col)).otherwise(
            F.when(
                prev.isNotNull() & nxt.isNotNull()
                & (nxt["t"] != prev["t"]),
                quantize(line, digits),
            )
        ),
    )


def gap_fill(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    aggs: Sequence,
    *,
    unit: str = "hour",
    fill: dict | None = None,
) -> DataFrame:
    """Densify a per-(key, time-bucket) aggregate onto a complete,
    gap-free calendar spine - the complement of :func:`fill_forward`
    (LOCF fills NULLs at EXISTING rows; this CREATES the missing rows).

    Steps, all declarative:

    1. bucket ``ts_col`` with ``date_trunc(unit)`` and aggregate
       ``aggs`` per (keys, bucket); NULL timestamps are dropped (no
       bucket to land in), while a NULL KEY is a legitimate group (SQL
       GROUP BY semantics) and densifies like any other - the spine
       join is null-safe;
    2. one bounded aggregate finds the global [min, max] bucket;
    3. the spine is ``distinct keys x sequence(min, max, 1 unit)`` -
       the 1-row bounds frame is broadcast, so the spine costs one
       scan of the (already bounded) aggregate frame, never of the
       raw data;
    4. a left join puts the aggregates on the spine; ``fill`` maps
       output column -> literal for the created rows (e.g. ``{"n": 0}``).

    Scale: the joined frames are both bounded by |keys| x |buckets|,
    not by the input rows - the only data-sized pass is the initial
    map-side-combined aggregation. An empty input yields NULL bounds,
    ``sequence(NULL, NULL)`` explodes to nothing, and the result is
    empty (the oracle's ``generate_series(NULL, NULL)`` agrees).
    """
    keys = list(key_cols)
    base = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(*keys, F.date_trunc(unit, F.col(ts_col)).alias("bucket"))
        .agg(*aggs)
    )
    bounds = base.agg(F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi"))
    spine = (
        base.select(*keys)
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            *keys,
            F.explode(
                F.sequence("_lo", "_hi", F.expr(f"INTERVAL 1 {unit}"))
            ).alias("bucket"),
        )
    )
    # NULL-SAFE key equality: NULL is a legitimate GROUP BY key value
    # (SQL semantics) and the spine's distinct carries it, but a plain
    # multi-column join would never match NULL=NULL - the NULL group's
    # real aggregates would silently zero-fill (caught in review, not
    # by the differential: the oracle had the identical bug)
    cond = F.col("_sp.bucket").eqNullSafe(F.col("_b.bucket"))
    for k in keys:
        cond = cond & F.col(f"_sp.{k}").eqNullSafe(F.col(f"_b.{k}"))
    agg_cols = [c for c in base.columns if c not in keys and c != "bucket"]
    out = (
        spine.alias("_sp")
        .join(base.alias("_b"), cond, "left")
        .select(
            *[F.col(f"_sp.{k}").alias(k) for k in keys],
            F.col("_sp.bucket").alias("bucket"),
            *[F.col(f"_b.{c}").alias(c) for c in agg_cols],
        )
    )
    for col, lit in (fill or {}).items():
        out = out.withColumn(col, F.coalesce(F.col(col), F.lit(lit)))
    return out


def scd2_intervals(
    df: DataFrame,
    key_cols: Sequence[str],
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Build a slowly-changing-dimension (SCD type 2) table from an
    event log: per key, collapse consecutive runs of the same
    ``attr_col`` value (gaps-and-islands) into validity intervals.

    The reference's RepoLog/version-log scripts keep every version row
    and pick latest-wins at read time (ROW_NUMBER ... RowNumber == 1,
    USQL/CreateAndInitializeRepo.usql:122-127); an SCD2 dimension is
    the warehouse-shaped complement: ``[valid_from, valid_to)``
    intervals with ``is_current`` on the open one.

    Semantics:
    - rows are ordered per key by ``(ts, tiebreak)`` - pass a unique
      tiebreak (e.g. the event id) or runs at equal timestamps are
      nondeterministic;
    - change points use null-safe comparison, so NULL attribute values
      form runs like any other value;
    - NULL keys / NULL timestamps are dropped by contract (they have
      no position in any per-key order).

    Plan shape: ONE shuffle on the key - the change-flag lag, the
    running island sum, the per-island aggregate and the island lead
    all reuse the same (key, ts) partitioning/sort, so Catalyst plans
    a single Exchange followed by windows + a partial-free aggregate.
    """
    keys = list(key_cols)
    clean = df.where(F.col(ts_col).isNotNull())
    for k in keys:
        clean = clean.where(F.col(k).isNotNull())
    w = Window.partitionBy(*keys).orderBy(ts_col, tiebreak_col)
    flagged = clean.select(
        *keys,
        F.col(attr_col).alias("_attr"),
        F.col(ts_col).alias("_ts"),
        F.col(tiebreak_col).alias("_tb"),
        F.when(
            ~F.col(attr_col).eqNullSafe(F.lag(attr_col).over(w)), 1
        )
        .otherwise(0)
        .alias("_chg"),
    )
    wrun = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islands = flagged.withColumn("_island", F.sum("_chg").over(wrun))
    runs = islands.groupBy(*keys, "_island").agg(
        F.min("_ts").alias("valid_from"),
        F.max("_attr").alias(attr_col),  # constant within an island
        F.count(F.lit(1)).alias("n_rows"),
    )
    wnext = Window.partitionBy(*keys).orderBy("_island")
    return runs.select(
        *keys,
        attr_col,
        F.col("valid_from"),
        F.lead("valid_from").over(wnext).alias("valid_to"),
        "n_rows",
        F.lead("valid_from").over(wnext).isNull().alias("is_current"),
    )


def max_concurrency(
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    *,
    num_bins: int | None = None,
) -> DataFrame:
    """Sweep-line maximum concurrency over CLOSED integer intervals
    (e.g. sessions as [start_us, end_us]): the classic +1/-1 endpoint
    walk, built scale-safe.

    Returns ONE row: ``(n_intervals, max_concurrent, first_peak_us)``
    - how many intervals, the highest number simultaneously open, and
    the earliest time that peak is reached.

    Closed-interval contract: intervals touching at a point COUNT as
    concurrent (both endpoints inclusive), pinned by ordering +1
    endpoints before -1 at equal times: the sort key is
    ``2*t`` for starts and ``2*t + 1`` for ends. A zero-length
    interval therefore counts as momentarily open, never drives the
    running sum negative. Intervals with a NULL endpoint are dropped
    whole by contract (they have no place on the line).

    Scale shape: the global running sum is the pack_shards two-level
    construction (operators/sampling.py:410) - endpoints bin by key
    range via one GK-sketch quantile pass, each bin runs its own
    RANGE-frame window in parallel, and bin offsets come from a
    single-partition window over the BINS-sized aggregate, broadcast
    back. No stage funnels the endpoint set through one task. The
    RANGE frame (not ROWS) makes every row of an equal-key tie group
    carry the group-total sum, so the result is deterministic without
    a unique tiebreak - and matches DuckDB's default window frame.
    """
    from ghcrawler_datalake_etl_spark.operators.dedup import _materialize

    spark = intervals.sparkSession
    if num_bins is None:
        num_bins = max(int(spark.sparkContext.defaultParallelism), 1)

    # an interval with a NULL endpoint has no place on the line; drop
    # it whole (a half-kept interval would push the running sum
    # negative, and NULL keys sort NULLS FIRST into the walk)
    clean = intervals.where(
        F.col(start_col).isNotNull() & F.col(end_col).isNotNull()
    )
    starts = clean.select(
        (F.col(start_col).cast("long") * 2).alias("_k"),
        F.lit(1).alias("_d"),
    )
    ends = clean.select(
        (F.col(end_col).cast("long") * 2 + 1).alias("_k"),
        F.lit(-1).alias("_d"),
    )
    # the endpoint frame feeds ~5 plan branches (the quantile action,
    # the in-bin cumsum, the offsets aggregate, and the run frame's two
    # consumers) - without an eager persist each one recomputes the
    # caller's interval derivation (measured: sessionize re-ran ~5x,
    # 4.9s -> see _materialize's docstring for the race)
    ep = _materialize(starts.unionByName(ends))
    from ghcrawler_datalake_etl_spark.operators.sampling import (
        quantile_bins,
    )

    ep = ep.withColumn(
        "_bin",
        quantile_bins(ep, F.col("_k"), ep.schema["_k"].dataType, num_bins),
    )

    in_bin = (
        Window.partitionBy("_bin")
        .orderBy("_k")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_cum = ep.withColumn("_c_in", F.sum("_d").over(in_bin))
    offsets = (
        ep.groupBy("_bin")
        .agg(F.sum("_d").alias("_w"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_w").over(
                    Window.orderBy("_bin").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_bin", "_off")
    )
    run = with_cum.join(F.broadcast(offsets), "_bin", "left").select(
        "_k", (F.col("_off") + F.col("_c_in")).cast("long").alias("_c")
    )

    # ONE aggregate over the run frame: the peak and its earliest key
    # together (min_by over the (-count, key) struct = "smallest key
    # among the rows with the largest count"), so the windowed subtree
    # executes exactly once instead of once per output column
    peak = run.select(
        "_c",
        F.struct((-F.col("_c")).alias("c"), F.col("_k").alias("k")).alias(
            "_ord"
        ),
        F.col("_k").alias("_pk"),
    ).agg(
        F.max("_c").alias("max_concurrent"),
        # integer halving (the key is 2t for the +1 rows where peaks
        # occur) - float /2 would round keys past 2^53
        F.expr("min_by(_pk, _ord) DIV 2").alias("first_peak_us"),
    )
    # count intervals from the persisted endpoints (one +1 each), not
    # from `intervals` - that branch would recompute the caller's
    # derivation again
    n = ep.where(F.col("_d") == 1).agg(
        F.count(F.lit(1)).alias("n_intervals")
    )
    return n.crossJoin(peak).select(
        "n_intervals", "max_concurrent", "first_peak_us"
    )
