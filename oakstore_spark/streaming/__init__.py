from oakstore_spark.streaming.ingest import (
    hourly_counts_stream,
    ingest_events_stream,
    read_events_stream,
)

__all__ = ["read_events_stream", "ingest_events_stream", "hourly_counts_stream"]
