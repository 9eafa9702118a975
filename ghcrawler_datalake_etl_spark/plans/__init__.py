from ghcrawler_datalake_etl_spark.plans.catalog import (
    CATALOG,
    EntitySpec,
    Field,
    spec_for,
)

__all__ = ["CATALOG", "EntitySpec", "Field", "spec_for"]
