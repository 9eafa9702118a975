from ghcrawler_datalake_etl_spark.sources.staging import (
    STAGING_ENVELOPE,
    parse_entity,
    read_staging,
    stage_json,
)
from ghcrawler_datalake_etl_spark.sources.sinks import ParquetCatalog, write_tsv

__all__ = [
    "STAGING_ENVELOPE",
    "ParquetCatalog",
    "parse_entity",
    "read_staging",
    "stage_json",
    "write_tsv",
]
