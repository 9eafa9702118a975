"""Behavioral pins for operators/layout.py (Z-order clustering)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ghcrawler_datalake_etl_spark.operators.layout import (
    minmax_scale16,
    write_zordered,
    zorder_key,
)


def test_zorder_key_known_values(spark):
    # spread(3)=0b101=5 (bits 0,1 -> even positions 0,2);
    # spread(5)=0b10001=17 (bits 0,2 -> 0,4), odd-shifted -> 34; z=39
    rows = (
        spark.createDataFrame([(3, 5)], "x long, y long")
        .select(zorder_key(["x", "y"]).alias("z"))
        .collect()
    )
    assert rows[0]["z"] == 39
    # axis order matters: (5,3) -> spread(5)=17, spread(3)<<1=10 -> 27
    rows = (
        spark.createDataFrame([(5, 3)], "x long, y long")
        .select(zorder_key(["x", "y"]).alias("z"))
        .collect()
    )
    assert rows[0]["z"] == 27


def test_zorder_key_monotone_in_each_dim_locally(spark):
    # within one row of the grid, increasing x increases z
    df = spark.createDataFrame(
        [(x, 7) for x in range(16)], "x long, y long"
    ).select("x", zorder_key(["x", "y"]).alias("z"))
    got = [r["z"] for r in df.orderBy("x").collect()]
    assert got == sorted(got)


def test_zorder_key_arity_and_nulls(spark):
    with pytest.raises(ValueError):
        zorder_key(["a"])
    with pytest.raises(ValueError):
        zorder_key(["a", "b", "c"])
    rows = (
        spark.createDataFrame([(None, 5)], "x long, y long")
        .select(zorder_key(["x", "y"]).alias("z"))
        .collect()
    )
    assert rows[0]["z"] is None


def test_minmax_scale16_spans_full_budget(spark):
    df = spark.createDataFrame(
        [(0, 0, 100), (50, 0, 100), (100, 0, 100), (7, 7, 7)],
        "v long, lo long, hi long",
    ).select(minmax_scale16("v", "lo", "hi").alias("s"))
    got = [r["s"] for r in df.collect()]
    assert got[0] == 0 and got[2] == 65535
    assert got[1] == (50 * 65535) // 100
    assert got[3] == 0  # degenerate dimension


def test_write_zordered_files_are_bounding_boxes(spark, tmp_path):
    """Every output file must cover a small box in BOTH dimensions -
    the property min/max footer stats prune on."""
    grid = spark.range(32).select(
        F.col("id").alias("x")
    ).crossJoin(spark.range(32).select(F.col("id").alias("y")))
    out = str(tmp_path / "zo")
    write_zordered(grid, ["x", "y"], out, n_files=16)

    back = spark.read.parquet(out).withColumn(
        "f", F.input_file_name()
    )
    boxes = (
        back.groupBy("f")
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        )
        .collect()
    )
    assert len(boxes) >= 8
    avg_sx = sum(b["sx"] for b in boxes) / len(boxes)
    avg_sy = sum(b["sy"] for b in boxes) / len(boxes)
    # a single-dim sort would give sx ~ 2 but sy ~ 31 (or vice versa);
    # z-order bounds BOTH well under half the global span
    assert avg_sx < 16 and avg_sy < 16, (avg_sx, avg_sy)
