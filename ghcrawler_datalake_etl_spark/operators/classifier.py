"""Distributed supervised learning: a logistic-regression document
classifier trained by full-batch gradient descent - the quality/domain
classifier step of real training-data pipelines (a linear model over
cheap text features, fastText-style), as a Spark-first iterative
algorithm with an EXACT cross-engine oracle.

Exactness recipe (the kmeans_fit contract applied to supervised
learning):

- features are integer-ratio expressions both engines compute
  bit-identically (counts, capped ratios - no ln/exp in the features);
- the per-row sigmoid is floor-quantized AT THE SOURCE (6 decimals), so
  exp()'s libm wobble never enters the gradient arithmetic;
- per-row gradient contributions are floor-scaled to int64 and SUMMED
  AS INTEGERS - exact in any order, so the one shuffle per iteration is
  an ordinary map-side-combinable aggregate;
- weights re-quantize to the 1e-6 grid after every update, so each
  iteration starts from bit-identical state on both engines.

A fixed iteration count (not a convergence test) keeps the oracle
expressible as unrolled SQL and the cost predictable - iterations x
(one scan + one k-feature aggregate), O(features) driver state only.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ghcrawler_datalake_etl_spark.functions.core import quantize
from ghcrawler_datalake_etl_spark.operators.text import (
    LANG_LEXICONS,
    tokenize,
)

SCALE = 1_000_000

#: feature names in model order (bias is implicit at index 0)
FEATURES = ("len_cap", "alpha_ratio", "stop_ratio", "digit_ratio")


def quality_feature_frame(
    df: DataFrame, id_col: str, text_col: str, label: Column
) -> DataFrame:
    """(doc_id, y, f1..f4): the classifier's feature projection.

    All four features are ratios of integer counts (exact IEEE
    divisions) - deliberately no log/exp so the frame itself is
    bit-reproducible. ``label`` is any boolean Column; NULL counts as
    false."""
    toks = tokenize(F.col(text_col))
    # NULL text = zero features (the repo-wide coalesce convention):
    # without it the regexp lengths go NULL and the row silently drops
    # from the gradient on both engines - defined zeros beat accidental
    # agreement
    text = F.coalesce(F.col(text_col), F.lit(""))
    n_toks = F.size(toks)
    safe_chars = F.greatest(F.length(text), F.lit(1)).cast("double")
    lex = list(LANG_LEXICONS["en"])
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(label.cast("boolean"), F.lit(False))
        .cast("int")
        .alias("y"),
        F.least(n_toks.cast("double") / F.lit(200.0), F.lit(1.0)).alias("f1"),
        (
            F.length(F.regexp_replace(text, "[^A-Za-z]", "")).cast("double")
            / safe_chars
        ).alias("f2"),
        (
            F.size(F.array_intersect(F.array_distinct(toks), F.lit(lex)))
            .cast("double")
            / F.greatest(n_toks, F.lit(1)).cast("double")
        ).alias("f3"),
        (
            F.length(F.regexp_replace(text, "[^0-9]", "")).cast("double")
            / safe_chars
        ).alias("f4"),
    )


def _z(w: list[float]) -> Column:
    """Left-associated linear form - the SAME association the SQL
    oracle writes, so z is bit-identical given quantized weights."""
    z = F.lit(w[0])
    for j in range(1, 5):
        z = z + F.lit(w[j]) * F.col(f"f{j}")
    return z


def _p(w: list[float]) -> Column:
    """Floor-quantized sigmoid: the one libm call (exp) leaves only a
    1e-6-grid value behind."""
    return quantize(F.lit(1.0) / (F.lit(1.0) + F.exp(-_z(w))), 6)


def logreg_fit(
    feats: DataFrame,
    iterations: int = 3,
    lr: float = 0.5,
) -> list[float]:
    """Full-batch GD from zero weights; returns [b, w1..w4] quantized.

    Each iteration is one job: a 5-value integer aggregate of
    floor-scaled per-row gradients plus the row count (the bounded-pull
    contract - O(features) to the driver). An empty feature frame is a
    no-op fit (gradient descent from zeros sees no gradient): the zero
    weights come back and scoring the empty frame yields the empty
    result - the same empty-in/empty-out contract the SQL oracle's
    unrolled form has by construction."""
    from ghcrawler_datalake_etl_spark.operators.dedup import _materialize

    feats = _materialize(feats)
    w = [0.0] * 5
    for _ in range(iterations):
        p = _p(w)
        err = p - F.col("y")
        row = feats.agg(
            F.count("*").alias("n"),
            *[
                # per-row terms are +-1e6-bounded longs; SUM as
                # decimal(38,0), not int64 - an int64 sum overflows (and
                # under ANSI mode throws mid-fit) past ~9.2e12 rows,
                # while DuckDB's BIGINT sum widens to HUGEINT. Same
                # widen-the-accumulator fix as connected_components.
                F.sum(
                    F.floor(
                        err * (F.lit(1.0) if j == 0 else F.col(f"f{j}"))
                        * SCALE
                    ).cast("decimal(38,0)")
                ).alias(f"g{j}")
                for j in range(5)
            ],
        ).collect()[0]
        n = row["n"]
        if not n:
            break
        # int(Decimal) is exact; int / float divides after a correctly-
        # rounded int->double conversion - the same arithmetic DuckDB's
        # HUGEINT / DOUBLE performs in the unrolled oracle
        w = [
            math.floor(
                (w[j] - lr * (int(row[f"g{j}"]) / (n * float(SCALE))))
                * SCALE
            )
            / SCALE
            for j in range(5)
        ]
    return w


def logreg_score(feats: DataFrame, w: list[float]) -> DataFrame:
    """(doc_id, y, p_q6, predicted) under literal weights - a narrow
    projection, the weights ride in the plan (the assign_clusters
    contract)."""
    p = _p(w)
    return feats.select(
        "doc_id", "y", p.alias("p_q6"), (p >= F.lit(0.5)).alias("predicted")
    )
