"""PySpark-native analytics engine with the query and data-processing
capabilities of microsoft/ghcrawler-datalake-etl.

The reference (read-only at /root/reference) is a U-SQL ETL codebase:
raw GHCrawler JSON -> flattened staging table -> 31 curated relational
tables, via five composite ETL patterns (see SURVEY.md section 2.9).
This package re-expresses that surface Spark-first:

- ``session``    : SparkSession factory (UTC, AQE, dynamic partition overwrite)
- ``functions``  : scalar helpers (typed path extraction, latest-wins dedup,
                   PII pseudonymization, stable hashing)
- ``operators``  : the five ETL pattern transforms + LLM-pipeline extensions
                   (dedup, similarity search, text analysis, multimodal)
- ``sources``    : staging ingest (JSON -> partitioned parquet) and sinks
- ``plans``      : the declarative 31-table entity-spec catalog
- ``streaming``  : Structured Streaming ingest (Trigger.AvailableNow)
- ``pipeline``   : ProcessDaily-equivalent runner over the spec catalog
- ``export``     : GetRepoData-equivalent join fan-out + TSV export
"""

__version__ = "0.1.0"
