from ghcrawler_datalake_etl_spark.streaming.ingest import (
    stream_stage_available_now,
    windowed_event_counts,
)

__all__ = ["stream_stage_available_now", "windowed_event_counts"]
