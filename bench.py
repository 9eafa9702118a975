"""Benchmark runner: times the declared query inventory at a scale-factor
directory and prints ONE JSON line the driver records as BENCH_r{N}.json.

Env:
  SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[] core count (default 32)
  SPARK_GRAFT_BENCH_QUERIES  comma-separated subset (default: all)

Each query is forced with a noop-format write (computes every column on
the executors, no driver collect) so timings reflect the full plan, not
a count()-pruned one.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from ghcrawler_datalake_etl_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entry  # noqa: E402


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()
    subset = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    names = subset.split(",") if subset else list(qs)

    # Warmup (not timed): JVM/codegen on the flagship query, plus the
    # Python worker fleet + Arrow channel for the vectorized-UDF queries.
    force(qs["q1_pricing_summary"](spark, sf_dir))
    force(qs["dedup_simhash_values"](spark, sf_dir))

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        force(qs[name](spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    # Full per-query map goes to a sidecar file; the final stdout line
    # stays SHORT (round 1's 72-entry line overflowed the driver's tail
    # capture -> BENCH_r01.json parsed:null, no machine-readable
    # baseline). The summary line carries only the top slowest queries.
    sidecar = {
        "metric": "total_query_time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "n_queries": len(timings),
    }
    sidecar_path = Path(__file__).resolve().parent / "BENCH_FULL.json"
    sidecar_path.write_text(json.dumps(sidecar, indent=1) + "\n")

    top = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:8]
    )
    print(
        json.dumps(
            {
                "metric": "total_query_time",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": top,
                "sf": sf_val,
                "n_queries": len(timings),
                "full_timings": sidecar_path.name,
            }
        )
    )


if __name__ == "__main__":
    main()
