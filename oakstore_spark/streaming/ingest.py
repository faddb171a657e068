"""Structured Streaming ingest — the EXT replacement for the reference's
batch append-rewrite (SURVEY.md §2: streaming ABSENT; append at
/root/reference/oakstore/store.py:214-236 rewrites the whole item).

Pattern: ``readStream`` over a file source -> watermark on the event
time -> dedup / windowed aggregation -> ``writeStream`` with
``trigger(availableNow=True)`` for batch-incremental runs. Late data is
handled by the watermark: events older than the threshold are dropped
from stateful ops instead of growing state without bound — the property
that keeps state bounded on an unbounded 100 TB/day stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# file-source schema for the events table (ts is timestamp[us] with no
# timezone in the synthetic parquet -> TIMESTAMP_NTZ in Spark; see
# sources/tables.py for the batch equivalent of the normalization)
EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, src_dir: str) -> DataFrame:
    """File-source stream of events, normalized to a UTC ``timestamp``
    event-time column (watermarks require TIMESTAMP, not NTZ)."""
    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(src_dir)
    )
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def ingest_events_stream(
    events: DataFrame,
    dest_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
):
    """Exactly-once-ish ingest: watermarked dedup on event_id, partitioned
    parquet sink. Returns the started query (caller awaits termination).

    ``dropDuplicatesWithinWatermark`` keeps only watermark-bounded state —
    the streaming analogue of the store's append dedup (old wins: a
    replayed event_id within the watermark window is dropped)."""
    deduped = events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    return (
        deduped.withColumn("_oak_date", F.to_date("ts"))
        .writeStream.format("parquet")
        .option("path", dest_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("_oak_date")
        .trigger(availableNow=True)
        .start()
    )


def hourly_counts_stream(
    events: DataFrame,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window aggregation (the streaming form of
    queries/timeseries.q_resample_hourly). Returns the streaming
    DataFrame; attach a sink + trigger to run."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("bucket_ts"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts_stream(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked SLIDING-window aggregation: each event lands in
    window/slide overlapping windows (4 for the defaults). State per
    key is bounded by watermark + window length; append mode emits a
    window once the watermark passes its end. The batch equivalent is
    an explode over the same window set (see tests) — both must agree
    exactly on every closed window."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n_events",
        )
    )


def stream_append_to_store(
    stream: DataFrame,
    store,
    key: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
    dedup_key: str = "event_id",
):
    """Incremental append of a stream INTO a Store item — the streaming
    form of the reference's batch append (``store[k] += df``, which
    rewrites the whole item per call: /root/reference/oakstore/
    store.py:214-236). Here each micro-batch goes through the store's
    own append path, which rewrites only the touched year partitions,
    and ``dropDuplicatesWithinWatermark`` bounds replay dedup state.

    The stream must already carry the store's schema (index column +
    declared columns). First batch creates the item; later batches
    append with the store's old-wins DATE dedup on top of the
    watermark-scoped exactly-once-ish id dedup.
    """
    deduped = stream.withWatermark(
        store._metadata.index_name, watermark
    ).dropDuplicatesWithinWatermark([dedup_key]) if dedup_key else stream

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        data = batch_df.drop(dedup_key) if dedup_key else batch_df
        if data.isEmpty():
            return
        if key.upper() in store.keys():
            store[key] += data
        else:
            store[key] = data

    return (
        deduped.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
