"""Iterative graph algorithms as unrolled DataFrame plans.

The reference engine has no graph surface (its link tables -
``USQL/CreateAndInitializeCommitParent.usql``, Referrers, Paths - are
plain equi-join edges consumed relationally); connected components
already live in ``operators/dedup.py`` for the near-dup cluster step.
This module adds the ranking side: PageRank (Brin & Page 1998) over an
edge frame, for link-graph weighting of crawl/training corpora.

Determinism contract (the repo-wide oracle convention): PageRank here
is INTEGER-SCALED - ranks live in BIGINTs scaled by ``scale`` (default
1e12) and every update is integer arithmetic::

    contrib(e)  = (rank[src] * w(e)) div out_w[src]
    rank'[v]    = (15 * scale) div (100 * n)  +  (85 * in(v)) div 100

Float PageRank sums in engine-dependent order and never bit-matches
across engines; integer division is exact everywhere, so a DuckDB
oracle replays the whole fixed-point to the last unit. The cost is a
documented quantization: each division floors away < 1 unit of rank
mass (at scale=1e12, nanoscale truncation per edge per round), and
dangling-node mass is NOT redistributed (the classic simplification;
ranks then sum to slightly under ``scale``).

Scale notes: the edge frame keeps its (src,dst)-aggregated weight, the
rank frame is |V|-sized, and each of the ``iterations`` rounds is one
join (rank onto edges, broadcast when |V| is small / AQE-planned
otherwise) + one map-side-combinable sum per dst + one left join back
onto the node frame. Everything stays declarative in ONE lazy plan; no
driver-side loops over data, only over the iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: default rank scale: 1e12 units = rank 1.0
PAGERANK_SCALE = 10**12


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    *,
    iterations: int = 3,
    scale: int = PAGERANK_SCALE,
) -> DataFrame:
    """Integer-scaled PageRank with damping 0.85 over ``iterations``
    synchronous rounds.

    ``edges`` rows with a NULL endpoint are dropped; parallel edges
    are merged by summing ``weight`` (1 when ``weight`` is None). The
    node set is the union of sources and destinations. Returns
    ``(node, rank_scaled)`` where ``rank_scaled / scale`` is the rank.

    The one driver-side action is ``nodes.count()`` (the scalar ``n``
    in the update rule) - a single long, the same bounded-pull contract
    as the k-means centroid collect.
    """
    from ghcrawler_datalake_etl_spark.operators.dedup import _materialize

    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = edges.where(F.col(src).isNotNull() & F.col(dst).isNotNull())
    w = F.col(weight) if weight else F.lit(1)
    ew = e.groupBy(
        F.col(src).alias("_src"), F.col(dst).alias("_dst")
    ).agg(F.sum(w).alias("_w"))
    ow = ew.groupBy("_src").agg(F.sum("_w").alias("_ow"))
    # every iteration joins against ew and nodes: persist both eagerly
    # or each round re-derives the caller's edge construction
    # (iterative-algorithm discipline, same as connected components'
    # localCheckpoint - see dedup._materialize)
    ew = _materialize(ew.join(ow, "_src"))
    nodes = _materialize(
        ew.select(F.col("_src").alias("node"))
        .unionByName(ew.select(F.col("_dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank_scaled", F.lit(0).cast("long"))
    base = (15 * scale) // (100 * n)
    ranks = nodes.withColumn(
        "rank_scaled", F.lit(scale // n).cast("long")
    )
    for _ in range(iterations):
        # contrib = rank*w DIV ow, decomposed so no intermediate
        # product can overflow BIGINT for any realistic weights:
        #   rank = q*ow + r  =>  rank*w DIV ow = q*w + (r*w DIV ow)
        # q*w <= rank (because w <= ow), and r*w < ow*w <= ow^2 - the
        # naive rank*w wrapped silently (non-ANSI) once an aggregated
        # edge weight passed ~9.2e6 at scale=1e12; the decomposed form
        # is exact until a node's TOTAL out-weight exceeds ~3e9
        # (sqrt(2^63)), which a caller can always rescale away.
        contribs = (
            ew.join(ranks, ew["_src"] == ranks["node"])
            .select(
                F.col("_dst").alias("node"),
                F.expr(
                    "(rank_scaled DIV _ow) * _w"
                    " + ((rank_scaled % _ow) * _w) DIV _ow"
                ).alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_in"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr("85 * coalesce(_in, 0L) DIV 100")
                ).cast("long").alias("rank_scaled"),
            )
        )
    return ranks
