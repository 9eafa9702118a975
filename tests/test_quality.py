"""Behavioral pins for operators/quality.py (Deequ-style validation).

The sf-corpus driver query passes every check (clean synthetic data),
so these tests drive the arms that data cannot: failing metrics, empty
input, all-NULL columns, and the single-pass plan shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ghcrawler_datalake_etl_spark.operators import quality as DQ


def _dirty(spark):
    return spark.createDataFrame(
        [
            (1, "a", 5.0),
            (2, "a", -1.0),   # negative value
            (2, None, 3.0),   # dup id + NULL tag
            (3, "zz", 2.0),   # tag outside set / pattern
        ],
        "id long, tag string, v double",
    )


def test_failing_checks_report_false(spark):
    rows = DQ.validate(
        _dirty(spark),
        [
            DQ.completeness("tag", minimum=1.0),
            DQ.uniqueness("id", minimum=1.0),
            DQ.minimum_of("v", minimum=0.0),
            DQ.contained_in("tag", ["a", "b"], minimum=1.0),
            DQ.matches_pattern("tag", "^[a-y]$", minimum=1.0),
            DQ.maximum_of("v", maximum=4.0),
        ],
    ).collect()
    by_name = {r["check_name"]: r for r in rows}
    assert by_name["completeness(tag)"]["metric"] == 0.75
    assert not by_name["completeness(tag)"]["passed"]
    # 3 distinct ids over 4 non-null rows
    assert by_name["uniqueness(id)"]["metric"] == 0.75
    assert not by_name["uniqueness(id)"]["passed"]
    assert by_name["minimum(v)"]["metric"] == -1.0
    assert not by_name["minimum(v)"]["passed"]
    # 2 of 3 non-null tags in {a, b}
    assert by_name["contained_in(tag)"]["metric"] == 0.666666
    assert not by_name["contained_in(tag)"]["passed"]
    # 'zz' fails the single-char pattern: 2 of 3
    assert by_name["matches_pattern(tag)"]["metric"] == 0.666666
    assert not by_name["matches_pattern(tag)"]["passed"]
    assert by_name["maximum(v)"]["metric"] == 5.0
    assert not by_name["maximum(v)"]["passed"]


def test_passing_checks_and_order(spark):
    rows = DQ.validate(
        _dirty(spark),
        [
            DQ.completeness("id", minimum=1.0),
            DQ.maximum_of("v", maximum=5.0),
            DQ.minimum_of("v"),  # unbounded: always passes
        ],
    ).collect()
    assert [r["check_name"] for r in rows] == [
        "completeness(id)",
        "maximum(v)",
        "minimum(v)",
    ]
    assert all(r["passed"] for r in rows)


def test_empty_and_all_null_are_vacuously_true(spark):
    empty = _dirty(spark).where(F.lit(False))
    rows = DQ.validate(
        empty,
        [
            DQ.completeness("tag", minimum=1.0),
            DQ.uniqueness("id", minimum=1.0),
            DQ.minimum_of("v", minimum=0.0),
        ],
    ).collect()
    assert [r["metric"] for r in rows] == [None, None, None]
    assert all(r["passed"] for r in rows)

    all_null = spark.createDataFrame([(None,), (None,)], "v double")
    rows = DQ.validate(all_null, [DQ.minimum_of("v", minimum=0.0)]).collect()
    assert rows[0]["metric"] is None and rows[0]["passed"]


def test_referential_containment_failing_and_empty(spark):
    fact = spark.createDataFrame(
        [(10,), (11,), (13,), (None,)], "k long"
    )
    dim = spark.createDataFrame([(10,), (11,)], "d long")
    row = DQ.referential_containment(
        fact, "k", dim, "d", minimum=1.0
    ).collect()[0]
    # 2 of 3 non-NULL fact keys contained; NULL key excluded
    assert row["metric"] == 0.666666
    assert not row["passed"]

    empty_fact = fact.where(F.lit(False))
    row = DQ.referential_containment(
        empty_fact, "k", dim, "d", minimum=1.0
    ).collect()[0]
    assert row["metric"] is None and row["passed"]


def test_validate_is_single_pass_no_join(spark):
    """All non-referential checks ride one aggregation: the physical
    plan must contain no Join and exactly one scan of the frame."""
    plan = DQ.validate(
        _dirty(spark),
        [
            DQ.completeness("tag"),
            DQ.minimum_of("v"),
            DQ.maximum_of("v"),
            DQ.contained_in("tag", ["a"]),
        ],
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Scan ExistingRDD") + plan.count("LocalTableScan") == 1


def test_validate_rejects_empty_suite(spark):
    import pytest

    with pytest.raises(ValueError):
        DQ.validate(_dirty(spark), [])
