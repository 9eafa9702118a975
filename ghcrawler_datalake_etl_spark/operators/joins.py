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

    # the prefilter DROPS fact rows before the join, which only
    # preserves semantics when unmatched fact rows are dropped anyway;
    # an outer join would silently lose the rows it must keep
    if how not in ("inner", "semi", "left_semi", "leftsemi"):
        raise ValueError(
            f"bloom_prefiltered_join is semantics-preserving only for "
            f"inner/left_semi joins, got how={how!r}"
        )
    bits = bloom_bits(dim.select(on), on)
    if materialize_bits:
        # each of the k probe lookups broadcasts its own copy of the
        # bits subplan; without an eager persist that re-scans the dim
        # k times (the _materialize discipline - and the dim being too
        # large to broadcast is this operator's whole use case)
        from ghcrawler_datalake_etl_spark.operators.dedup import register_release

        bits.persist()
        bits.count()
        register_release(bits.unpersist)
    pref = bloom_probe(fact, on, bits).filter(
        F.col("bloom_maybe")
    ).drop("bloom_maybe")
    return pref.join(dim, on, how)



def edit_distance_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """Self-join on edit distance: pairs with
    ``levenshtein(a, b) <= max_dist`` (max_dist 1 or 2), via the
    DELETION-NEIGHBORHOOD signature scheme (the FastSS / SymSpell
    family): each string emits its <= max_dist-deletion neighborhood -
    itself plus every variant reachable by deleting up to ``max_dist``
    characters - and any two strings within ``max_dist`` edits share
    at least one variant (FastSS: align the edit script's touched
    positions and delete them from both sides). Candidates come from
    ONE equi-join on the variant itself, and the exact ``levenshtein``
    predicate prunes the collisions (sharing a <= d-deletion variant
    only bounds the distance by 2d).

    Why not prefix/suffix segment filtering (PassJoin-style): a
    segment key carries the UNCHANGED region, so it degenerates to an
    all-pairs join whenever the corpus shares that region - measured:
    TPC-H customer names all share their first 10 characters, and an
    8-char-prefix channel put 15k rows in one signature group (~112M
    candidate pairs, 272s at sf0.1). A deletion variant keys on
    everything EXCEPT the edited positions, so two strings collide
    only when they agree on all of it - group sizes track true
    neighbor counts, not shared affixes.

    Costs and contracts: the signature frame is ``O(L^max_dist)``
    variants per length-L string (L+1 at d=1, ~(L+1)^2/2 at d=2 - the
    reason the cap is 2; SymSpell's production sweet spot is the
    same), keyed on the raw variant string (collision-free; swap in
    ``F.xxhash64`` for a fixed 8-byte key if variants ever get long) -
    sized for identifier-like short strings (names, titles, URLs,
    SKUs), not documents. Candidate GROUP sizes stay bounded by true
    neighborhood density: a variant group holds exactly the strings
    whose <= d-deletion neighborhoods contain that variant, so a group
    can only be large where many strings genuinely agree on all
    non-deleted positions (at d=2 each group member pairs within
    Levenshtein 4 of every other member - never a corpus-wide
    degenerate group). NULL strings never pair; duplicate variants
    within one string (e.g. deleting either 'a' of ``"aa"``) are
    deduplicated before the join; empty strings work (their identity
    variant pairs them with short strings). Output
    ``(id_a, id_b, dist)`` with ``id_a < id_b``, distinct.
    """
    if max_dist not in (1, 2):
        raise ValueError(
            "deletion-neighborhood scheme implemented for max_dist in "
            "(1, 2): variants per string grow as L^max_dist, so wider "
            "radii need a different blocking scheme"
        )
    base = df.select(
        F.col(id_col).alias("_id"), F.col(str_col).alias("_s")
    ).where(F.col("_s").isNotNull())
    # each round applies "delete one char OR keep" to the previous
    # round's variants: after r rounds _vh spans the full
    # <= r-deletion neighborhood (the _i = length sentinel keeps the
    # unchanged variant - substring past the end is '' on both
    # engines)
    sigs = base.withColumn("_vh", F.col("_s"))
    for _ in range(max_dist):
        sigs = (
            sigs.select(
                "_id",
                "_s",
                "_vh",
                F.explode(
                    F.sequence(F.lit(0), F.length("_vh"))
                ).alias("_i"),
            )
            .select(
                "_id",
                "_s",
                F.expr(
                    "concat(substring(_vh, 1, _i), substring(_vh, _i + 2))"
                ).alias("_vh"),
            )
            .distinct()
        )
    # join on the 8-byte hash of the variant, not the string itself -
    # smaller shuffle keys; a hash collision only ever ADDS a candidate
    # pair, which the exact levenshtein verify prunes (no false
    # negatives: equal variants hash equal)
    sigs = sigs.select("_id", "_s", F.xxhash64("_vh").alias("_vk"))
    a = sigs.select(
        F.col("_id").alias("id_a"), F.col("_s").alias("sa"), "_vk"
    )
    b = sigs.select(
        F.col("_id").alias("id_b"), F.col("_s").alias("sb"), "_vk"
    )
    collisions = a.join(b, "_vk").where(F.col("id_a") < F.col("id_b"))
    if max_dist >= 2:
        # dedup candidate PAIRS before the verify: at d=2 a collision
        # only bounds the distance by 4, so most collisions are d=3..4
        # rejects and true pairs share several variants - levenshtein,
        # the expensive step, should run once per distinct pair
        cand = collisions.select("id_a", "id_b", "sa", "sb").distinct()
        return cand.select(
            "id_a",
            "id_b",
            F.levenshtein(F.col("sa"), F.col("sb"))
            .cast("long")
            .alias("dist"),
        ).where(F.col("dist") <= max_dist)
    # at d=1 collision multiplicity is ~1-2 per true pair: verify
    # directly and dedup the (already filtered, smaller) result
    return (
        collisions.select(
            "id_a",
            "id_b",
            F.levenshtein(F.col("sa"), F.col("sb"))
            .cast("long")
            .alias("dist"),
        )
        .where(F.col("dist") <= max_dist)
        .distinct()
    )
