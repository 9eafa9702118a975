"""Declarative data-quality validation (Deequ-style constraint suite).

The reference engine enforces ingest invariants only implicitly - the
latest-wins ``ROW_NUMBER() ... WHERE RowNumber == 1`` dedup and the
``WHERE EntityName == "repo"`` guards inside every
``USQL/CreateAndInitialize*.usql`` script (e.g.
``CreateAndInitializeRepo.usql:118,249``) silently drop violating rows
but report nothing. A 100 TB ingest needs the complement: a metrics
surface that states, per batch, HOW complete/unique/valid each column
was, so regressions surface as numbers instead of shrunken tables.

Design (after Schelter et al., "Automating large-scale data quality
verification", VLDB 2018 - the Deequ paper):

- a :class:`Check` is a named aggregate metric (a ``Column``) plus an
  optional ``[minimum, maximum]`` acceptance band;
- :func:`validate` evaluates EVERY check in ONE aggregation pass over
  the frame (map-side combinable; the shuffled state is one partial
  aggregate row per partition, never data-proportional) and unpivots
  to one row per check: ``(check_name, metric, passed)``.
- :func:`referential_containment` is the one check shape that cannot
  ride the single-pass aggregate (it needs the dimension side); it
  joins - broadcast when the dimension is small - and yields the same
  row shape, union-able with :func:`validate`'s output.

Totality contract: on an empty frame (or an all-NULL column for
min/max metrics) the metric is NULL and ``passed`` is vacuously true;
oracles mirror this with ``CASE WHEN ... IS NULL THEN true``.

Cross-engine stability: every ratio is one BIGINT/BIGINT double
division quantized via :func:`functions.core.quantize` (floor, not
round - see that docstring); min/max metrics are quantized the same
way so thresholds compare identical doubles on any engine.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ghcrawler_datalake_etl_spark.functions.core import quantize

#: quantization digits for every reported metric
_DIGITS = 6


@dataclass(frozen=True)
class Check:
    """A named aggregate metric with an optional acceptance band.

    ``metric`` must be an AGGREGATE expression over the validated frame
    (it is evaluated inside one ``df.agg(...)``); ``minimum`` /
    ``maximum`` bound the quantized metric inclusively. A ``None``
    bound is unchecked; a NULL metric passes vacuously.
    """

    name: str
    metric: Column
    minimum: float | None = None
    maximum: float | None = None


def _ratio(num: Column, den: Column) -> Column:
    """num/den as a quantized double, NULL when den = 0."""
    return F.when(den > 0, quantize(num.cast("double") / den, _DIGITS))


def completeness(
    col: str, *, minimum: float | None = None, maximum: float | None = None
) -> Check:
    """Fraction of rows with a non-NULL ``col``."""
    return Check(
        f"completeness({col})",
        _ratio(F.count(col), F.count(F.lit(1))),
        minimum,
        maximum,
    )


def uniqueness(
    col: str, *, minimum: float | None = None, maximum: float | None = None
) -> Check:
    """Distinct non-NULL values of ``col`` over non-NULL rows."""
    return Check(
        f"uniqueness({col})",
        _ratio(F.count_distinct(F.col(col)), F.count(col)),
        minimum,
        maximum,
    )


def contained_in(
    col: str,
    values: list[str],
    *,
    minimum: float | None = None,
    maximum: float | None = None,
) -> Check:
    """Fraction of non-NULL rows whose ``col`` is in ``values``."""
    return Check(
        f"contained_in({col})",
        _ratio(
            F.count(F.when(F.col(col).isin(values), 1)), F.count(col)
        ),
        minimum,
        maximum,
    )


def matches_pattern(
    col: str,
    pattern: str,
    *,
    minimum: float | None = None,
    maximum: float | None = None,
) -> Check:
    """Fraction of non-NULL rows whose ``col`` rlike-matches ``pattern``.

    Keep ``pattern`` inside the Java-regex / RE2 common subset (anchors,
    classes, quantifiers) so DuckDB ``regexp_matches`` replays it.
    """
    return Check(
        f"matches_pattern({col})",
        _ratio(F.count(F.when(F.col(col).rlike(pattern), 1)), F.count(col)),
        minimum,
        maximum,
    )


def minimum_of(
    col: str, *, minimum: float | None = None, maximum: float | None = None
) -> Check:
    """min(col) as a quantized double (NULL when all-NULL/empty)."""
    return Check(
        f"minimum({col})",
        quantize(F.min(col).cast("double"), _DIGITS),
        minimum,
        maximum,
    )


def maximum_of(
    col: str, *, minimum: float | None = None, maximum: float | None = None
) -> Check:
    """max(col) as a quantized double (NULL when all-NULL/empty)."""
    return Check(
        f"maximum({col})",
        quantize(F.max(col).cast("double"), _DIGITS),
        minimum,
        maximum,
    )


def _passed(metric: Column, check: Check) -> Column:
    ok = F.lit(True)
    if check.minimum is not None:
        ok = ok & (metric >= F.lit(float(check.minimum)))
    if check.maximum is not None:
        ok = ok & (metric <= F.lit(float(check.maximum)))
    return F.when(metric.isNull(), F.lit(True)).otherwise(ok)


def validate(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate ``checks`` in one aggregation pass.

    Returns ``(check_name string, metric double, passed boolean)`` with
    one row per check, in ``checks`` order. One Spark job; the only
    full-width expression is the aggregate itself, so at 100 TB this is
    a single scan with partial aggregation - adding checks adds columns
    to the partial row, not passes over the data.
    """
    if not checks:
        raise ValueError("validate() needs at least one Check")
    agg = df.agg(
        *[c.metric.cast("double").alias(f"_m{i}") for i, c in enumerate(checks)]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(c.name).alias("check_name"),
                F.col(f"_m{i}").alias("metric"),
                _passed(F.col(f"_m{i}"), c).alias("passed"),
            )
            for i, c in enumerate(checks)
        ]
    )
    return (
        agg.select(F.explode(rows).alias("r"))
        .select("r.check_name", "r.metric", "r.passed")
    )


def drift_report(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    row_ratio_tol: float = 2.0,
    null_frac_jump: float = 0.1,
) -> DataFrame:
    """Day-over-day data-quality DRIFT detection - the monitoring pass
    a daily ingest runs before trusting a new partition: per-day
    profile (row count, distinct keys, value-null fraction) plus
    day-over-day anomaly flags (row count outside
    [prev/tol, prev*tol]; null fraction jumping by more than
    ``null_frac_jump``). The per-batch complement of :func:`validate`
    (absolute invariants): drift compares each day to ITS OWN history,
    so it catches a feed that silently halves or a column that starts
    arriving empty even when every absolute check still passes.

    Returns one row per day: (day, n_rows, n_keys, null_frac,
    row_ratio, row_count_anomaly, null_frac_jump). The first day has
    NULL ratio and false flags (no baseline). NULL timestamps are
    excluded EXPLICITLY (engines disagree on NULL ordering in the
    lag window; a NULL-ts row has no day to profile).

    Every metric is integer-derived (counts + one exact division,
    floor-quantized) - deliberately no mean/sum of doubles, whose
    partition-order-dependent accumulation would make the report
    nondeterministic across runs, let alone engines.

    Scale: one groupBy(day) with full partial aggregation, then a lag
    window over the DAYS-sized profile (dimension-sized by
    construction - single-partition window on ~365 rows/year is the
    right plan, not a smell).
    """
    day = F.to_date(F.col(ts_col))
    prof = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(day.alias("day"))
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct(key_col).alias("n_keys"),
            F.sum(
                F.when(F.col(value_col).isNull(), 1).otherwise(0)
            ).cast("long").alias("_n_null"),
        )
        .withColumn(
            "null_frac",
            quantize(F.col("_n_null").cast("double") / F.col("n_rows"), 6),
        )
    )
    w = Window.orderBy("day")
    prev_rows = F.lag("n_rows").over(w)
    prev_frac = F.lag("null_frac").over(w)
    tol = F.lit(float(row_ratio_tol))
    return (
        prof.withColumn(
            "row_ratio",
            F.when(
                prev_rows.isNotNull(),
                quantize(F.col("n_rows").cast("double") / prev_rows, 6),
            ),
        )
        .withColumn(
            "row_count_anomaly",
            F.when(prev_rows.isNull(), F.lit(False)).otherwise(
                (F.col("n_rows").cast("double") > tol * prev_rows)
                | (tol * F.col("n_rows") < prev_rows.cast("double"))
            ),
        )
        .withColumn(
            "null_frac_jump",
            F.when(prev_frac.isNull(), F.lit(False)).otherwise(
                F.col("null_frac") - prev_frac
                > F.lit(float(null_frac_jump))
            ),
        )
        .select(
            "day", "n_rows", "n_keys", "null_frac", "row_ratio",
            "row_count_anomaly", "null_frac_jump",
        )
    )


def referential_containment(
    fact: DataFrame,
    fact_col: str,
    dim: DataFrame,
    dim_col: str,
    *,
    minimum: float | None = None,
) -> DataFrame:
    """Fraction of non-NULL ``fact_col`` values present in ``dim_col``.

    The one constraint shape that needs the dimension side: a left semi
    join (broadcast under the session threshold; AQE picks the strategy
    at real dimension sizes) counts contained rows, a second count the
    denominator - two bounded aggregates, both map-side combined, and
    the semi join carries only ``fact_col`` through the exchange.
    Output row shape matches :func:`validate` for union.
    """
    keys = fact.select(F.col(fact_col).alias("_k")).where(F.col("_k").isNotNull())
    dim_keys = dim.select(F.col(dim_col).alias("_k")).where(
        F.col("_k").isNotNull()
    )
    contained = keys.join(dim_keys, "_k", "left_semi").agg(
        F.count(F.lit(1)).alias("_n_in")
    )
    total = keys.agg(F.count(F.lit(1)).alias("_n"))
    name = f"referential({fact_col} in {dim_col})"
    check = Check(name, F.lit(None), minimum=minimum)
    metric_row = contained.crossJoin(total).select(
        _ratio(F.col("_n_in"), F.col("_n")).cast("double").alias("_m0")
    )
    return metric_row.select(
        F.lit(name).alias("check_name"),
        F.col("_m0").alias("metric"),
        _passed(F.col("_m0"), check).alias("passed"),
    )
