from ghcrawler_datalake_etl_spark.streaming.ingest import (
    stream_dedup,
    stream_stage_available_now,
    stream_upsert_snapshot,
    windowed_event_counts,
)
from ghcrawler_datalake_etl_spark.streaming.stateful import (
    sessionize_batch,
    sessionize_stream,
)

__all__ = [
    "stream_dedup",
    "stream_stage_available_now",
    "stream_upsert_snapshot",
    "windowed_event_counts",
    "sessionize_batch",
    "sessionize_stream",
]
