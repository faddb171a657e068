from oakstore_spark.streaming.ingest import (
    hourly_counts_stream,
    ingest_events_stream,
    sliding_counts_stream,
    read_events_stream,
    stream_append_to_store,
)
from oakstore_spark.streaming.dedup import dedup_admission_stream
from oakstore_spark.streaming.joins import (
    click_purchase_attribution_stream,
    enrich_stream_static,
)
from oakstore_spark.streaming.stateful import (
    running_user_totals,
    running_user_totals_tws,
    session_close_on_timeout,
    session_close_on_timer,
    session_window_stats,
)

__all__ = [
    "read_events_stream",
    "ingest_events_stream",
    "hourly_counts_stream",
    "sliding_counts_stream",
    "session_window_stats",
    "running_user_totals",
    "running_user_totals_tws",
    "click_purchase_attribution_stream",
    "enrich_stream_static",
    "stream_append_to_store",
    "dedup_admission_stream",
    "session_close_on_timeout",
    "session_close_on_timer",
]
