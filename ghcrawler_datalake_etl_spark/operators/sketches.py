"""Distributed cardinality / frequency sketches.

The reference engine has no sketch surface (its aggregations are exact
GROUP BYs - e.g. the distinct-count rollups in
``Queries/StdObjectModel/`` U-SQL scripts); these are extension-layer
operators a 100 TB training-data pipeline needs when exact DISTINCT or
exact per-token counts would shuffle corpus-sized state:

- ``hll_distinct``      - HyperLogLog (Flajolet et al. 2007) distinct
  estimate per group. Shuffle state: <= m=256 registers per group.
- ``cms_token_counts`` / ``cms_estimate`` - Count-Min sketch (Cormode &
  Muthukrishnan 2005) frequency table + point estimates. Sketch size:
  d x w counters total, map-side combined.
- ``kmv_distinct``      - K-Minimum-Values / bottom-k (Bar-Yossef et
  al. 2002) distinct estimate per group. Shuffle state: k hashes per
  group.

Portability contract (the repo-wide convention from queries.py): all
hashing is md5-derived so a DuckDB oracle can replay the SAME sketch
bit-for-bit. Estimates stay in integer arithmetic as long as possible
(register sums are summed as ``2^(45-rho)`` BIGINTs, never floats;
CMS is pure integers; KMV divides two exactly-representable values
once) so the only cross-engine float risk is a final single division /
log, which the callers quantize.

Scale notes: every sketch here is a map-side-combinable aggregation
whose combined state is bounded by the sketch size, not the data -
the entire point vs exact DISTINCT at 100 TB. No Python UDFs, no
collects, no windows over corpus-sized frames (KMV's row_number
window runs per group over hashes that a pre-aggregation has already
reduced to distinct values; for unbounded groups compose with
``hll_distinct`` instead).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------

#: 2^8 = 256 registers: first 2 md5 hex chars are the bucket.
HLL_P = 8
HLL_M = 1 << HLL_P
#: 11 hex chars = 44 bits of rho material -> rho in [1, 45]; 44-bit
#: values stay exact in BIGINT and (unlike 60-bit) the register sum
#: scaled by 2^45 stays exact too: 256 * 2^45 = 2^53 fits a BIGINT
#: with room and every term is an exact power of two.
HLL_TAIL_HEX = 11
_HLL_RHO_MAX = 4 * HLL_TAIL_HEX + 1
#: alpha_m for m >= 128 (Flajolet et al. 2007, fig. 3)
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def _hll_rho(tail: Column) -> Column:
    """rho = 1 + leading zero BITS of an 11-hex-char string, computed
    with string ops only (no float log2 - exact on any engine)."""
    stripped = F.regexp_replace(tail, "^0+", "")
    len_rem = F.length(stripped)
    first = F.substring(stripped, 1, 1)
    lz_in_digit = (
        F.when(first == "1", F.lit(3))
        .when(first.isin("2", "3"), F.lit(2))
        .when(first.isin("4", "5", "6", "7"), F.lit(1))
        .otherwise(F.lit(0))
    )
    return F.when(len_rem == 0, F.lit(_HLL_RHO_MAX)).otherwise(
        4 * (F.lit(HLL_TAIL_HEX) - len_rem) + lz_in_digit + 1
    )


def hll_bucket_rho(value: Column) -> tuple[Column, Column]:
    """The sketch's hash split as reusable Columns: (bucket, rho) of a
    value - shared by the batch register builder and the streaming
    register maintenance (streaming/ingest.stream_hll_registers)."""
    h = F.md5(value.cast("string"))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    rho = _hll_rho(F.substring(h, 3, HLL_TAIL_HEX))
    return bucket, rho


def hll_registers(
    df: DataFrame, value_col: str, group_cols: list[str]
) -> DataFrame:
    """The sketch STATE: one (group, bucket, m_rho) row per non-empty
    register - the mergeable partial that ``hll_merge`` can re-group
    and ``hll_estimate_from_registers`` turns into an estimate. The
    (group, bucket) max-rho aggregation combines map-side to <= m
    rows per group per task. NULL values are ignored (md5(NULL) is
    NULL), matching the SQL oracles' ``WHERE value IS NOT NULL``."""
    bucket, rho = hll_bucket_rho(F.col(value_col))
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("m_rho"))
    )


def hll_merge(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge register frames down to coarser groups (or, with
    ``group_cols=[]``, to one global sketch): max per bucket. Exactly
    lossless - max is associative/commutative/idempotent, so merging
    per-partition or per-group partials yields bit-identical registers
    to sketching the unioned data directly (the property that lets
    100 TB of per-shard sketches roll up without rescanning; pinned by
    the sketch_hll_merge driver oracle, which replays the DIRECT
    global sketch against this merged one)."""
    return regs.groupBy(*group_cols, "bucket").agg(
        F.max("m_rho").alias("m_rho")
    )


def hll_estimate_from_registers(
    regs: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Estimate from a register frame: ``n_registers`` (non-empty),
    ``register_sum`` (sum of 2^(45-rho_j) over ALL m registers - the
    exact-integer harmonic denominator scaled by 2^45) and
    ``hll_estimate`` (raw estimate with the standard linear-counting
    small-range correction; the caller quantizes). The rollup runs
    over <= m rows per group."""
    per_group = regs.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n_registers"),
        # SQL-form shiftleft: the Python helper only takes a literal
        # shift; each term is an exact power of two summed as BIGINT
        F.sum(F.expr(f"shiftleft(1L, {_HLL_RHO_MAX} - m_rho)"))
        .cast("long")
        .alias("s_present"),
    )
    zeros = F.lit(HLL_M).cast("long") - F.col("n_registers")
    s_total = (
        F.col("s_present") + zeros * F.lit(1 << _HLL_RHO_MAX).cast("long")
    )
    raw = (
        F.lit(HLL_ALPHA * HLL_M * HLL_M * float(1 << _HLL_RHO_MAX))
        / s_total.cast("double")
    )
    corrected = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (zeros > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros.cast("double")),
    ).otherwise(raw)
    return per_group.select(
        *group_cols,
        "n_registers",
        (F.col("s_present") + zeros * F.lit(1 << _HLL_RHO_MAX).cast("long"))
        .alias("register_sum"),
        corrected.alias("hll_estimate"),
    )


def hll_distinct(
    df: DataFrame, value_col: str, group_cols: list[str]
) -> DataFrame:
    """HyperLogLog distinct-count estimate of ``value_col`` per group:
    ``hll_registers`` composed with ``hll_estimate_from_registers``.
    Two bounded shuffles; see the stage docstrings."""
    return hll_estimate_from_registers(
        hll_registers(df, value_col, group_cols), group_cols
    )


def stats_state(
    df: DataFrame, keys: list[str], value_col: str, distinct_col: str
) -> DataFrame:
    """Mergeable per-key aggregate STATE - the materialized-view-
    maintenance primitive: (keys..., n, sum_v, min_v, max_v,
    regs map<bucket, m_rho>). Every component merges losslessly
    (count/sum add, min/max fold, HLL registers take elementwise max),
    so a standing stats table grows by folding in each day's state
    with stats_merge - never rescanning history - and finalizes on
    demand with stats_finalize. Persist as parquet keyed by ``keys``.

    Two bounded shuffles (scalar agg + the (keys, bucket) register
    agg, both map-side combined) and one co-partitioned join; the
    register map is <= m entries per key."""
    scalars = df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(value_col).cast("double")).alias("sum_v"),
        F.min(F.col(value_col).cast("double")).alias("min_v"),
        F.max(F.col(value_col).cast("double")).alias("max_v"),
    )
    regs = (
        hll_registers(df, distinct_col, list(keys))
        .groupBy(*keys)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("bucket", "m_rho"))
            ).alias("regs")
        )
    )
    # left: a key whose distinct_col is all-NULL has no registers -
    # its state row carries an empty map, not a dropped key
    out = scalars.join(regs, list(keys), "left")
    return out.withColumn("regs", F.coalesce("regs", _empty_regs()))


def _empty_regs() -> Column:
    """Empty register map with the exact entry types hll_registers
    emits (built per call: F.expr needs an active session)."""
    return F.expr("cast(map() AS map<bigint, int>)")


def stats_merge(states: DataFrame, keys: list[str]) -> DataFrame:
    """Fold state rows (e.g. a union of per-day stats_state frames, or
    a standing table plus today's delta) down to ONE state row per
    key: n/sum add, min/max fold, registers take per-bucket max.
    n, min_v, max_v and the registers are BIT-identical to building
    the state from the unioned raw data (integer add / fold / max are
    associative+commutative); sum_v agrees up to float reassociation -
    the same tolerance any Spark partial-aggregate sum already carries,
    so report it rounded (the sketch_incremental_stats driver oracle
    rounds to 2 digits). Pinned by test and driver oracle."""
    scalars = states.groupBy(*keys).agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )
    regs = (
        states.select(*keys, F.explode("regs").alias("bucket", "m_rho"))
        .groupBy(*keys, "bucket")
        .agg(F.max("m_rho").alias("m_rho"))
        .groupBy(*keys)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("bucket", "m_rho"))
            ).alias("regs")
        )
    )
    out = scalars.join(regs, list(keys), "left")
    return out.withColumn("regs", F.coalesce("regs", _empty_regs()))


def stats_finalize(state: DataFrame, keys: list[str]) -> DataFrame:
    """Finalize a state frame into reportable stats: n, sum_v, min_v,
    max_v pass through; the register map becomes the standard HLL
    estimate (identical arithmetic to hll_estimate_from_registers -
    the register rows are just packed in a map here; the caller
    quantizes). Keys with an empty map estimate 0 distinct."""
    rows = state.select(
        *keys, F.explode("regs").alias("bucket", "m_rho")
    )
    est = hll_estimate_from_registers(rows, list(keys)).select(
        *keys, "hll_estimate"
    )
    return (
        state.join(est, list(keys), "left")
        .select(
            *keys,
            "n",
            "sum_v",
            "min_v",
            "max_v",
            F.coalesce("hll_estimate", F.lit(0.0)).alias("distinct_est"),
        )
    )


def hll_oracle_sql(
    source_sql: str, value_expr: str, group_cols: list[str]
) -> str:
    """DuckDB SQL computing the IDENTICAL HLL sketch: same md5 bucket /
    rho split, same integer register sum, same correction - so the
    estimate hash-matches the Spark side after quantization.
    ``source_sql`` must be a relation exposing ``value_expr`` and the
    group columns."""
    g = ", ".join(group_cols)
    rho_max = _HLL_RHO_MAX
    return f"""
    hashed AS (
      SELECT {g}, md5(cast({value_expr} AS VARCHAR)) AS h
      FROM {source_sql} WHERE {value_expr} IS NOT NULL
    ),
    brho AS (
      SELECT {g},
             cast(('0x' || substr(h, 1, 2)) AS BIGINT) AS bucket,
             CASE WHEN length(regexp_replace(substr(h, 3, {HLL_TAIL_HEX}), '^0+', '')) = 0
                  THEN {rho_max}
                  ELSE 4 * ({HLL_TAIL_HEX} - length(regexp_replace(substr(h, 3, {HLL_TAIL_HEX}), '^0+', '')))
                       + (CASE substr(regexp_replace(substr(h, 3, {HLL_TAIL_HEX}), '^0+', ''), 1, 1)
                          WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
                          WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1
                          ELSE 0 END) + 1
             END AS rho
      FROM hashed
    ),
    regs AS (
      SELECT {g}, bucket, max(rho) AS m_rho FROM brho GROUP BY {g}, bucket
    ),
    hll AS (
      SELECT {g},
             cast(count(*) AS BIGINT) AS n_registers,
             cast(sum(1::BIGINT << ({rho_max} - m_rho)) AS BIGINT) AS s_present
      FROM regs GROUP BY {g}
    ),
    hll_est AS (
      SELECT {g}, n_registers,
             s_present + ({HLL_M} - n_registers) * (1::BIGINT << {rho_max})
               AS register_sum,
             CASE WHEN ({HLL_ALPHA * HLL_M * HLL_M * float(1 << _HLL_RHO_MAX)!r}
                        / (s_present + ({HLL_M} - n_registers) * (1::BIGINT << {rho_max}))::DOUBLE)
                       <= {2.5 * HLL_M!r}
                   AND ({HLL_M} - n_registers) > 0
             THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / ({HLL_M} - n_registers)::DOUBLE)
             ELSE {HLL_ALPHA * HLL_M * HLL_M * float(1 << _HLL_RHO_MAX)!r}
                  / (s_present + ({HLL_M} - n_registers) * (1::BIGINT << {rho_max}))::DOUBLE
             END AS hll_estimate
      FROM hll
    )"""


# ---------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------

CMS_DEPTH = 3
CMS_WIDTH = 1024


def _cms_bucket(value: Column, seed: int, width: int) -> Column:
    """60-bit md5 of '<seed>\\x1f<value>' mod width - the repo-standard
    portable hash (queries.py conventions; sampling.py:54)."""
    tagged = F.concat_ws("\x1f", F.lit(str(seed)), value.cast("string"))
    return (
        F.conv(F.substring(F.md5(tagged), 1, 15), 16, 10).cast("long")
        % width
    )


def cms_sketch(
    df: DataFrame,
    value_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build the d x w Count-Min counter table over ``value_col``
    occurrences: one row per (seed, bucket) with its collision-summed
    count. ONE pass over the data (the d hash rows ride a single
    inline array explode); the groupBy combines map-side to <= d*w
    partial rows per task regardless of corpus size."""
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(s).alias("seed"),
                    _cms_bucket(F.col(value_col), s, width).alias("bucket"),
                )
                for s in range(depth)
            ]
        )
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(rows.alias("sb"))
        .groupBy(F.col("sb.seed").alias("seed"), F.col("sb.bucket").alias("bucket"))
        .agg(F.count("*").cast("long").alias("c"))
    )


def cms_merge(sketch: DataFrame) -> DataFrame:
    """Merge Count-Min counter tables built over disjoint slices of a
    stream: counters ADD per (seed, bucket) - the same lossless rollup
    contract as ``hll_merge``/``histogram_merge`` (sum is associative/
    commutative), so per-shard sketches aggregate to the sketch of the
    union without rescanning. Input: a union of sketch frames."""
    return sketch.groupBy("seed", "bucket").agg(
        F.sum("c").cast("long").alias("c")
    )


def cms_estimate(
    candidates: DataFrame,
    sketch: DataFrame,
    value_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-estimate every candidate's count: min over the d rows it
    hashes to. The sketch (d*w rows) broadcasts; estimates never
    undercount (est >= true), the classic CMS guarantee the tests
    pin. Adds column ``cms_estimate`` to ``candidates``."""
    est = None
    for s in range(depth):
        sk = sketch.filter(F.col("seed") == s).select(
            F.col("bucket").alias(f"b{s}"), F.col("c").alias(f"c{s}")
        )
        candidates = candidates.join(
            F.broadcast(sk),
            _cms_bucket(F.col(value_col), s, width) == F.col(f"b{s}"),
            "left",
        ).drop(f"b{s}")
        this = F.coalesce(F.col(f"c{s}"), F.lit(0).cast("long"))
        est = this if est is None else F.least(est, this)
    return candidates.withColumn("cms_estimate", est).drop(
        *[f"c{s}" for s in range(depth)]
    )


def cms_oracle_sql(
    tok_sql: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> str:
    """DuckDB CTEs replaying the identical sketch over a ``tok``
    relation with a ``term`` column: ends with CTE ``cms_est``
    (term, n, cms_estimate). Pure integers -> exact match."""
    seeds = ", ".join(f"({s})" for s in range(depth))
    bucket = (
        "cast(('0x' || substr(md5(cast(s.seed AS VARCHAR) || chr(31) || "
        "c.term), 1, 15)) AS BIGINT) % " + str(width)
    )
    return f"""
    tok AS ({tok_sql}),
    cms_sk AS (
      SELECT s.seed,
             cast(('0x' || substr(md5(cast(s.seed AS VARCHAR) || chr(31) || t.term), 1, 15)) AS BIGINT) % {width} AS bucket,
             cast(count(*) AS BIGINT) AS c
      FROM tok t CROSS JOIN (VALUES {seeds}) s(seed)
      GROUP BY 1, 2
    ),
    cms_cand AS (SELECT term, cast(count(*) AS BIGINT) AS n FROM tok GROUP BY term),
    cms_est AS (
      SELECT c.term, c.n, min(k.c) AS cms_estimate
      FROM cms_cand c
      CROSS JOIN (VALUES {seeds}) s(seed)
      JOIN cms_sk k ON k.seed = s.seed AND k.bucket = {bucket}
      GROUP BY c.term, c.n
    )"""


# ---------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------

BLOOM_M = 1 << 15
BLOOM_K = 3


def bloom_bits(
    df: DataFrame, value_col: str, m: int = BLOOM_M, k: int = BLOOM_K
) -> DataFrame:
    """The set-bit positions of a Bloom filter (Bloom 1970) over
    ``value_col``: k md5-derived positions per value (the same
    '<seed>\\x1f<value>' tagged-hash construction as the CMS buckets),
    deduplicated - a one-column frame of <= m rows, broadcastable no
    matter how large the input set. The Dolma-style bloom dedup /
    decontamination primitive."""
    rows = F.explode(
        F.array(
            *[_cms_bucket(F.col(value_col), s, m) for s in range(k)]
        )
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(rows.alias("pos"))
        .distinct()
    )


def bloom_probe(
    df: DataFrame,
    value_col: str,
    bits: DataFrame,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """Membership test: ``bloom_maybe`` is true iff ALL k of the
    value's positions are set - no false negatives, false-positive
    rate ~ (k*n/m)^k. The bits frame broadcasts into k equi-joins, so
    probing a 100 TB corpus is k broadcast map-side lookups, no
    shuffle of the probed side."""
    maybe = None
    for s in range(k):
        b = bits.select(F.col("pos").alias(f"p{s}"))
        df = df.join(
            F.broadcast(b),
            _cms_bucket(F.col(value_col), s, m) == F.col(f"p{s}"),
            "left",
        )
        this = F.col(f"p{s}").isNotNull()
        maybe = this if maybe is None else (maybe & this)
    return df.withColumn("bloom_maybe", maybe).drop(
        *[f"p{s}" for s in range(k)]
    )


# ---------------------------------------------------------------------
# Fixed-bin histogram quantile sketch
# ---------------------------------------------------------------------


def histogram_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    lo: float,
    hi: float,
    bins: int,
) -> DataFrame:
    """Mergeable equi-width histogram: (group, bin, c) with
    bin = clamp(floor((x-lo)/width), 0, bins-1). Out-of-range values
    land deterministically in the edge bins; NULLs are dropped. The
    groupBy combines map-side to <= bins rows per group per task -
    the bounded-state twin of an exact percentile sort. The bin
    arithmetic is two exact-rounded float ops on identical doubles,
    so any engine bins identically."""
    width = (hi - lo) / bins
    b = F.floor((F.col(value_col).cast("double") - F.lit(lo)) / F.lit(width))
    b = F.least(F.greatest(b, F.lit(0)), F.lit(bins - 1)).cast("long")
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, b.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count("*").cast("long").alias("c"))
    )


def histogram_merge(hist: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge histograms to coarser groups: counts add. Exactly
    lossless (sum is associative/commutative), the same rollup
    contract as ``hll_merge``."""
    return hist.groupBy(*group_cols, "bin").agg(
        F.sum("c").cast("long").alias("c")
    )


def histogram_quantiles(
    hist: DataFrame,
    group_cols: list[str],
    qs: list[float],
    lo: float,
    hi: float,
    bins: int,
) -> DataFrame:
    """Quantile estimates from a histogram frame: for each q, the
    lower edge of the first bin whose cumulative count reaches
    ceil(q*n) - error bounded by one bin width. The running-sum
    window runs over <= bins rows per group, never the data. Output:
    group cols, ``n``, and one ``p<q>_est`` double per q (the caller
    quantizes per the repo convention)."""
    width = (hi - lo) / bins
    w = Window.partitionBy(*group_cols).orderBy("bin")
    cum = hist.select(
        *group_cols,
        "bin",
        "c",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(Window.partitionBy(*group_cols)).alias("n"),
    )
    aggs = [F.max("n").cast("long").alias("n")]
    for q in qs:
        tag = f"p{round(q * 100):02d}_est"
        target = F.ceil(F.lit(q) * F.col("n"))
        best_bin = F.min(F.when(F.col("cum") >= target, F.col("bin")))
        aggs.append(
            (F.lit(lo) + best_bin.cast("double") * F.lit(width)).alias(tag)
        )
    return cum.groupBy(*group_cols).agg(*aggs)


# ---------------------------------------------------------------------
# K-Minimum-Values (bottom-k)
# ---------------------------------------------------------------------

#: 13 hex chars = 52 bits: exact in BIGINT and in an IEEE double, so
#: the single (k-1)*2^52 / h_k division is the only float op and both
#: operands are exactly representable.
KMV_HASH_HEX = 13
_KMV_SPACE = float(1 << (4 * KMV_HASH_HEX))


def kmv_distinct(
    df: DataFrame, value_col: str, group_cols: list[str], k: int = 64
) -> DataFrame:
    """Bottom-k distinct estimate per group: keep each group's k
    smallest 52-bit value hashes; estimate = (k-1) * 2^52 / h_k, or
    the EXACT distinct count when the group holds fewer than k
    distinct values (the sketch saw them all). Returns ``kth_hash``
    (-1 on the exact path), ``n_seen`` and ``kmv_estimate``.

    The pre-aggregation to distinct (group, hash) combines map-side;
    the row_number window then ranks the already-distinct hashes.
    Ties are impossible (distinct hashes), so the ranking is
    deterministic on any engine.
    """
    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, KMV_HASH_HEX),
        16,
        10,
    ).cast("long")
    hashes = (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, h.alias("h"))
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("h")
    bottom = hashes.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") <= k
    )
    per_group = bottom.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n_seen"),
        F.max("h").alias("max_h"),
    )
    exact = F.col("n_seen") < k
    return per_group.select(
        *group_cols,
        "n_seen",
        F.when(exact, F.lit(-1).cast("long")).otherwise(F.col("max_h")).alias(
            "kth_hash"
        ),
        F.when(exact, F.col("n_seen").cast("double")).otherwise(
            F.lit(float(k - 1) * _KMV_SPACE) / F.col("max_h").cast("double")
        ).alias("kmv_estimate"),
    )


def kmv_overlap(
    df_a: DataFrame, df_b: DataFrame, value_col: str, k: int = 64
) -> DataFrame:
    """Set-overlap estimation from two bottom-k sketches (the
    audience-overlap / cross-corpus-contamination ask): take S = the k
    smallest hashes of A union B; any member of S that belongs to A at
    all must already be in bottom-k(A) (it is smaller than A's k-th
    smallest), so membership flags come from a full-outer join of the
    two bottom-k frames - no rescan of either side.

    One row out: ``n_union_seen`` (= min(k, |A u B|)), ``n_shared``
    (|S n A n B|, exact integers), ``kth_hash`` (-1 when the union fit
    inside k and everything is exact), ``jaccard_est`` = n_shared /
    n_union_seen and ``union_est``/``intersection_est`` via the
    (k-1)*2^52/h_k estimator. Two float ops total (one division, one
    multiplication), both on exactly-representable operands - callers
    quantize."""

    def _bottom(df: DataFrame) -> DataFrame:
        h = F.conv(
            F.substring(
                F.md5(F.col(value_col).cast("string")), 1, KMV_HASH_HEX
            ),
            16,
            10,
        ).cast("long")
        hashes = (
            df.filter(F.col(value_col).isNotNull())
            .select(h.alias("h"))
            .distinct()
        )
        # distributed top-k (TakeOrderedAndProject), NOT a global
        # row_number window - a single-partition sort over the whole
        # distinct-hash set would not survive 100 TB
        return hashes.orderBy("h").limit(k)

    a = _bottom(df_a).withColumn("in_a", F.lit(True))
    b = _bottom(df_b).withColumn("in_b", F.lit(True))
    merged = a.join(b, "h", "full_outer").select(
        "h",
        F.coalesce(F.col("in_a"), F.lit(False)).alias("in_a"),
        F.coalesce(F.col("in_b"), F.lit(False)).alias("in_b"),
    )
    s = merged.orderBy("h").limit(k)  # <= 2k rows in, top-k out
    agg = s.agg(
        F.count("*").cast("long").alias("n_union_seen"),
        # count-of-when, not sum: 0 (never NULL) over an empty union,
        # so both-empty input yields a well-defined all-zeros row
        F.count(F.when(F.col("in_a") & F.col("in_b"), F.lit(1)))
        .cast("long")
        .alias("n_shared"),
        F.max("h").alias("max_h"),
    )
    exact = F.col("n_union_seen") < k
    union_est = F.when(
        exact, F.col("n_union_seen").cast("double")
    ).otherwise(
        F.lit(float(k - 1) * _KMV_SPACE) / F.col("max_h").cast("double")
    )
    jac = F.when(F.col("n_union_seen") == 0, F.lit(0.0)).otherwise(
        F.col("n_shared").cast("double") / F.col("n_union_seen")
    )
    return agg.select(
        "n_union_seen",
        "n_shared",
        F.when(exact, F.lit(-1).cast("long")).otherwise(F.col("max_h")).alias(
            "kth_hash"
        ),
        jac.alias("jaccard_est"),
        union_est.alias("union_est"),
        (jac * union_est).alias("intersection_est"),
    )


def kmv_overlap_oracle_sql(
    a_sql: str, b_sql: str, value_expr: str, k: int = 64
) -> str:
    """DuckDB CTEs replaying the identical bottom-k overlap; ends with
    CTE ``kmv_ov`` exposing the same six columns."""
    space = float(1 << (4 * KMV_HASH_HEX))
    hash_expr = (
        f"cast(('0x' || substr(md5(cast({value_expr} AS VARCHAR)), 1, "
        f"{KMV_HASH_HEX})) AS BIGINT)"
    )
    return f"""
    kmv_a AS (
      SELECT h FROM (
        SELECT h, row_number() OVER (ORDER BY h) AS r FROM (
          SELECT DISTINCT {hash_expr} AS h FROM {a_sql}
          WHERE {value_expr} IS NOT NULL)
      ) WHERE r <= {k}
    ),
    kmv_b AS (
      SELECT h FROM (
        SELECT h, row_number() OVER (ORDER BY h) AS r FROM (
          SELECT DISTINCT {hash_expr} AS h FROM {b_sql}
          WHERE {value_expr} IS NOT NULL)
      ) WHERE r <= {k}
    ),
    kmv_m AS (
      SELECT coalesce(a.h, b.h) AS h,
             a.h IS NOT NULL AS in_a, b.h IS NOT NULL AS in_b
      FROM kmv_a a FULL OUTER JOIN kmv_b b ON a.h = b.h
    ),
    kmv_s AS (
      SELECT h, in_a, in_b, row_number() OVER (ORDER BY h) AS r
      FROM kmv_m
    ),
    kmv_g AS (
      SELECT cast(count(*) AS BIGINT) AS n_union_seen,
             cast(count(*) FILTER (WHERE in_a AND in_b) AS BIGINT)
               AS n_shared,
             max(h) AS max_h
      FROM kmv_s WHERE r <= {k}
    ),
    kmv_ov AS (
      SELECT n_union_seen, n_shared,
             CASE WHEN n_union_seen < {k} THEN -1 ELSE max_h END AS kth_hash,
             CASE WHEN n_union_seen = 0 THEN 0.0
                  ELSE n_shared::DOUBLE / n_union_seen END AS jaccard_est,
             CASE WHEN n_union_seen < {k} THEN n_union_seen::DOUBLE
                  ELSE {float(k - 1) * space!r} / max_h::DOUBLE
             END AS union_est,
             (CASE WHEN n_union_seen = 0 THEN 0.0
                   ELSE n_shared::DOUBLE / n_union_seen END) *
             (CASE WHEN n_union_seen < {k} THEN n_union_seen::DOUBLE
                   ELSE {float(k - 1) * space!r} / max_h::DOUBLE END)
               AS intersection_est
      FROM kmv_g
    )"""


def kmv_oracle_sql(
    source_sql: str, value_expr: str, group_cols: list[str], k: int = 64
) -> str:
    """DuckDB CTEs for the identical bottom-k sketch; ends with CTE
    ``kmv`` exposing group cols + n_seen, kth_hash, kmv_estimate."""
    g = ", ".join(group_cols)
    return f"""
    kmv_hashes AS (
      SELECT DISTINCT {g},
             cast(('0x' || substr(md5(cast({value_expr} AS VARCHAR)), 1, {KMV_HASH_HEX})) AS BIGINT) AS h
      FROM {source_sql} WHERE {value_expr} IS NOT NULL
    ),
    kmv_bottom AS (
      SELECT {g}, h,
             row_number() OVER (PARTITION BY {g} ORDER BY h) AS r
      FROM kmv_hashes
    ),
    kmv_g AS (
      SELECT {g}, cast(count(*) AS BIGINT) AS n_seen, max(h) AS max_h
      FROM kmv_bottom WHERE r <= {k} GROUP BY {g}
    ),
    kmv AS (
      SELECT {g}, n_seen,
             CASE WHEN n_seen < {k} THEN -1 ELSE max_h END AS kth_hash,
             CASE WHEN n_seen < {k} THEN n_seen::DOUBLE
                  ELSE {float(k - 1) * _KMV_SPACE!r} / max_h::DOUBLE
             END AS kmv_estimate
      FROM kmv_g
    )"""
