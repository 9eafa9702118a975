"""Test-data table loader.

The driver's synthetic tables (/root/testdata/sf*/; TESTDATA.md) are
plain parquet. One wrinkle: ``events.ts`` is written as parquet
TIMESTAMP(NANOS), which Spark's vectorized reader rejects outright
(PARQUET_TYPE_ILLEGAL). The legacy conf reads it as a nanosecond long,
and we rebuild a proper timestamp with integer division (``div`` -
double division would lose precision above 2^53).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
