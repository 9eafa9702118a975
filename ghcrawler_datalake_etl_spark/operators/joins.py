"""Skew-aware join/aggregation rewrites.

The reference's joins are all equi-joins on high-cardinality URN keys
(SURVEY.md 2.3), where plain shuffle joins distribute fine. At 100 TB,
two other shapes appear that DON'T distribute fine, and these are their
standard rewrites:

- A large fact joined on a LOW-cardinality / hot key (a handful of join
  keys -> a handful of reduce tasks own all the data). ``salted_join``
  splits every hot key into ``n_salt`` sub-keys: the skewed side gets a
  deterministic salt, the compact side is replicated n_salt times, and
  the join key becomes (key, salt) - n_salt times the parallelism for
  n_salt times the small side's (tiny) shuffle volume. AQE's skew-join
  splitting handles moderate skew automatically; salting is the explicit
  form for extreme skew and for aggregations AQE can't split.
- COUNT(DISTINCT x) grouped by a hot key: the distinct set for a hot
  group must assemble on one task. ``two_stage_distinct_count`` rewrites
  it as groupBy(key, x) -> groupBy(key): both stages hash-aggregate with
  map-side partial combine, and stage 1's key space (key x value) is
  high-cardinality, so no task owns a whole hot group.

Both rewrites are result-identical to their naive forms - pinned by the
DuckDB oracles of the queries that use them.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "_salt"


def salted_join(
    skewed: DataFrame,
    compact: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    n_salt: int = 16,
) -> DataFrame:
    """Equi-join a skewed large frame against a compact frame on ``on``,
    salting the key to spread each hot key over ``n_salt`` reduce tasks.

    ``compact`` is replicated n_salt times (cheap only because it is the
    small side - do not pass two large frames). Supported ``how``:
    inner/left - semantics identical to the unsalted join. The salt is a
    deterministic hash of the skewed row's full tuple, so the plan is
    stable run to run (no rand(): a retried task must re-derive the same
    salt or shuffle retries double-count rows).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted = skewed.withColumn(
        SALT, F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salt))
    )
    replicated = compact.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<long>"))
    )
    return salted.join(replicated, [*on, SALT], how).drop(SALT)


def two_stage_distinct_count(
    df: DataFrame,
    keys: Sequence[str],
    distinct_col: str,
    alias: str = "n_distinct",
) -> DataFrame:
    """COUNT(DISTINCT distinct_col) GROUP BY keys, rewritten so no
    single task ever materializes a hot group's distinct set."""
    return (
        df.select(*keys, distinct_col)
        .distinct()
        .groupBy(*keys)
        .agg(F.count(F.col(distinct_col)).alias(alias))
    )


def bloom_prefiltered_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "inner",
    materialize_bits: bool = True,
) -> DataFrame:
    """Runtime-filter join (the sketch-driven shuffle reducer): a Bloom
    filter of the dim side's join keys (operators/sketches.bloom_bits,
    <= m rows, broadcast) prefilters the fact side BEFORE the shuffle
    join, so fact rows whose key cannot match never enter the exchange.
    Semantically transparent for inner/semi joins: the filter has no
    false negatives, and its false positives are eliminated by the
    exact join that follows - the oracle is the plain join itself.

    When the dim is broadcast-small Spark's own broadcast join already
    avoids the fact shuffle and this wrapper adds nothing; the payoff
    is a SELECTIVE dim too large to broadcast, where the fact side's
    shuffle volume drops by the join selectivity while the bit frame
    stays m rows no matter how many keys the dim holds (the classic
    runtime-filter/sideways-information-passing move).
    """
    from ghcrawler_datalake_etl_spark.operators.sketches import (
        bloom_bits,
        bloom_probe,
    )

    bits = bloom_bits(dim.select(on), on)
    if materialize_bits:
        # each of the k probe lookups broadcasts its own copy of the
        # bits subplan; without an eager persist that re-scans the dim
        # k times (the _materialize discipline - and the dim being too
        # large to broadcast is this operator's whole use case)
        bits.persist()
        bits.count()
    pref = bloom_probe(fact, on, bits).filter(
        F.col("bloom_maybe")
    ).drop("bloom_maybe")
    return pref.join(dim, on, how)


def edit_distance_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int = 1,
    seg_len: int = 8,
) -> DataFrame:
    """Self-join on edit distance: pairs with
    ``levenshtein(a, b) <= max_dist`` (currently max_dist=1), found via
    the fixed-window segment filter (the PassJoin family of
    partition-signature schemes, Li et al. 2011): a single edit at
    position p leaves the first ``seg_len`` characters untouched when
    p > seg_len, and the LAST ``seg_len`` characters untouched when
    p <= len - seg_len. For strings of length >= 2*seg_len one of the
    two always holds, so every qualifying pair matches EXACTLY on the
    length-``seg_len`` prefix or the end-aligned suffix - candidates
    come from two equi-joins, never a cross join - and the exact
    ``levenshtein`` predicate prunes filter collisions.

    Strings shorter than ``2 * seg_len`` (where the prefix and suffix
    windows overlap and the guarantee lapses) pair within a dedicated
    short-bucket by length band - exact, and bounded as long as the
    short tail is small (tune ``seg_len`` down for short-string
    corpora). NULL strings never pair. Output:
    ``(id_a, id_b, dist)`` with ``id_a < id_b``, deduplicated across
    the signature channels.

    Scale: two equi-shuffles on 8-char keys plus the short-bucket
    length-band join; the verify is a per-row levenshtein on
    candidates only. Both engines implement classic Levenshtein, so a
    DuckDB oracle replays the exact same pair set.
    """
    if max_dist != 1:
        raise ValueError("segment scheme implemented for max_dist=1")
    base = df.select(
        F.col(id_col).alias("_id"), F.col(str_col).alias("_s")
    ).where(F.col("_s").isNotNull())
    long_s = base.where(F.length("_s") >= 2 * seg_len)
    # the band bucket takes everything below 2*seg_len + max_dist: a
    # short string (< 2*seg_len) can pair across the boundary with one
    # of length up to 2*seg_len + max_dist - 1, and a pair is only
    # guaranteed by the band join when BOTH members are in the bucket.
    # Pairs whose members are both >= 2*seg_len ride the segment
    # channel; overlap between channels folds in the final distinct.
    short_s = base.where(F.length("_s") < 2 * seg_len + max_dist)

    sigs = long_s.select(
        "_id",
        "_s",
        F.explode(
            F.array(
                F.concat(F.lit("p:"), F.expr(f"left(_s, {seg_len})")),
                F.concat(F.lit("s:"), F.expr(f"right(_s, {seg_len})")),
            )
        ).alias("_sig"),
    )
    a = sigs.select(
        F.col("_id").alias("id_a"), F.col("_s").alias("sa"), "_sig"
    )
    b = sigs.select(
        F.col("_id").alias("id_b"), F.col("_s").alias("sb"), "_sig"
    )
    long_pairs = (
        a.join(b, "_sig")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sa", "sb")
    )

    # short strings: length-band self-join (|len diff| <= max_dist);
    # exact because the candidate set is a superset of every pair the
    # segment filter could miss in the overlap regime
    sa = short_s.select(
        F.col("_id").alias("id_a"),
        F.col("_s").alias("sa"),
        F.length("_s").alias("_la"),
    )
    sb = short_s.select(
        F.col("_id").alias("id_b"),
        F.col("_s").alias("sb"),
        F.length("_s").alias("_lb"),
    )
    short_pairs = (
        sa.join(
            sb,
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("_la") - F.col("_lb")) <= max_dist),
        )
        .select("id_a", "id_b", "sa", "sb")
    )

    return (
        long_pairs.unionByName(short_pairs)
        .withColumn("dist", F.levenshtein(F.col("sa"), F.col("sb")))
        .where(F.col("dist") <= max_dist)
        .select("id_a", "id_b", F.col("dist").cast("long").alias("dist"))
        .distinct()
    )
