from duckdb_delta_spark.streaming.events import (
    dedup_stream,
    dedup_stream_counts,
    enrich_stream,
    hourly_event_counts_stream,
    run_stream_to_memory,
    session_window_stream,
    sessionize_stream,
    stream_events,
    view_purchase_join_stream,
    view_purchase_left_join_stream,
)

__all__ = [
    "stream_events",
    "hourly_event_counts_stream",
    "sessionize_stream",
    "run_stream_to_memory",
    "dedup_stream",
    "dedup_stream_counts",
    "view_purchase_join_stream",
    "view_purchase_left_join_stream",
    "session_window_stream",
    "enrich_stream",
]
