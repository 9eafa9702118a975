"""Differential harness mirroring the driver's t2 gate: run every
declared query on Spark AND its DuckDB oracle over the same parquet,
compare row count, column names, and order-insensitive values.

Runs at sf0.001 for speed (the driver uses sf0.01); values are
canonicalized the same way on both sides so any mismatch here predicts a
driver-gate mismatch.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod
from ghcrawler_datalake_etl_spark.tables import TABLES

import os

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


#: the driver canonicalizes by pandas sort_values over every output
#: column, which requires hashable (scalar) cells - a list/map/struct
#: column passes a naive str() comparison locally but kills the driver
#: row with "unhashable type: 'list'". Reject them here first.
_SCALAR_TYPES = (bool, int, float, str, bytes, bytearray)


def assert_driver_sortable(name, cols, rows):
    import datetime
    import decimal

    ok = _SCALAR_TYPES + (
        datetime.date,
        datetime.datetime,
        decimal.Decimal,
    )
    for r in rows[:100]:
        for c, v in zip(cols, r):
            assert v is None or isinstance(v, ok), (
                f"{name}.{c}: non-scalar value type {type(v).__name__} - "
                "the driver's pandas canonicalizer cannot sort it; project "
                "arrays to csv/digest or posexplode to rows"
            )


#: DuckDB type buckets that land in pandas as integers vs floats. The
#: driver compares via pandas, so sum(int) -> HUGEINT -> float64 while
#: Spark emits int64: identical values, different hash. fetchall() hides
#: this (HUGEINT -> Python int), so check declared types statically.
_DUCK_INT = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
             "USMALLINT", "UINTEGER", "UBIGINT"}
_DUCK_FLOAT = {"FLOAT", "DOUBLE"}
_SPARK_INT = {"tinyint", "smallint", "int", "bigint"}
_SPARK_FLOAT = {"float", "double"}


def assert_pandas_type_parity(name, sdf, ddb, sql):
    dtypes = {
        r[0].lower(): r[1].upper()
        for r in ddb.execute(f"DESCRIBE {sql}").fetchall()
    }
    for field in sdf.schema.fields:
        dt = dtypes.get(field.name.lower())
        if dt is None:
            continue
        st = field.dataType.simpleString()
        if st in _SPARK_INT:
            assert dt in _DUCK_INT, (
                f"{name}.{field.name}: Spark {st} vs DuckDB {dt} - pandas "
                "reads HUGEINT/DOUBLE as float64 and the driver hash "
                "diverges; cast the oracle expression AS BIGINT"
            )
        if st in _SPARK_FLOAT:
            assert dt in _DUCK_FLOAT, (
                f"{name}.{field.name}: Spark {st} vs DuckDB {dt} - driver "
                "hash will diverge; align the oracle cast"
            )


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    return str(v)


def rows_canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


ORACLED = sorted(entrymod.oracle_sql())
ROWS_ONLY = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, ddb, name):
    qfn = entrymod.queries()[name]
    sdf = qfn(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    assert_driver_sortable(name, scols, srows)
    assert_pandas_type_parity(name, sdf, ddb, entrymod.oracle_sql()[name])
    res = ddb.execute(entrymod.oracle_sql()[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(c.lower() for c in scols) == sorted(c.lower() for c in dcols), (
        f"{name}: column names differ: {scols} vs {dcols}"
    )
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} vs oracle {len(drows)}"
    )
    sc = rows_canon([c.lower() for c in scols], srows)
    dc = rows_canon([c.lower() for c in dcols], drows)
    if sc != dc:
        diffs = [(a, b) for a, b in zip(sc, dc) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    assert len(df.columns) > 0
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
