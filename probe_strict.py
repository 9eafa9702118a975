"""Strict sf0.01 oracle probe: run named queries (or all) against
DuckDB with FULL-precision float comparison (repr, not the %.6g the
sf0.001 differential uses), mirroring the driver's exact pandas
value-hash gate. Usage:

    python probe_strict.py q1 q2 ...     # specific queries
    python probe_strict.py --window      # the first-50 driver window

Exit 0 = all match at full precision.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

import __spark_entry__ as entrymod
from ghcrawler_datalake_etl_spark.tables import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_PROBE_SF_DIR", "/root/testdata/sf0.01")


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    return str(v)


def rows_canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main() -> int:
    from pyspark.sql import SparkSession

    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if "--window" in sys.argv:
        names = entrymod.driver_order()[:50] if hasattr(
            entrymod, "driver_order") else list(queries)[:50]
    if not names:
        names = sorted(oracles)
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .appName("probe_strict")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    failed = []
    for name in names:
        if name not in oracles:
            print(f"{name}: NO-ORACLE (rows-only), skipping strict check")
            continue
        try:
            sdf = queries[name](spark, SF_DIR)
            scols = [c.lower() for c in sdf.columns]
            srows = [tuple(r) for r in sdf.collect()]
            res = con.execute(oracles[name])
            dcols = [d[0].lower() for d in res.description]
            drows = res.fetchall()
            if sorted(scols) != sorted(dcols):
                raise AssertionError(f"columns {scols} vs {dcols}")
            if len(srows) != len(drows):
                raise AssertionError(
                    f"rows {len(srows)} vs {len(drows)}")
            sc = rows_canon(scols, srows)
            dc = rows_canon(dcols, drows)
            if sc != dc:
                diffs = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
                raise AssertionError(f"values differ, first: {diffs}")
            print(f"{name}: MATCH ({len(srows)} rows)")
        except Exception as exc:  # noqa: BLE001 - report and continue
            print(f"{name}: FAIL - {exc}")
            failed.append(name)
        finally:
            # free operator-internal persisted frames between queries
            # (the bench.py loop discipline - the 50-query window sweep
            # otherwise accumulates every _materialize'd frame)
            from ghcrawler_datalake_etl_spark.operators.dedup import (
                release_materialized,
            )

            release_materialized()
    spark.stop()
    if failed:
        print("FAILED:", failed)
        return 1
    print("ALL MATCH")
    return 0


if __name__ == "__main__":
    sys.exit(main())
