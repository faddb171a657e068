"""Structured Streaming ingest tests: availableNow end-to-end over the
synthetic events parquet, checked against the batch equivalent."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from oakstore_spark.sources import table
from oakstore_spark.streaming import (
    hourly_counts_stream,
    ingest_events_stream,
    read_events_stream,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture
def events_src(tmp_path):
    # file stream sources need a directory, not a single file
    src = tmp_path / "events_src"
    src.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src / "part-0.parquet")
    return str(src)


def test_streaming_ingest_availablenow(spark, tmp_path, events_src):
    stream = read_events_stream(spark, events_src)
    q = ingest_events_stream(
        stream, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out"))
    batch = table(spark, SF_DIR, "events")
    assert out.count() == batch.count()  # no dupes in source, none dropped
    assert "_oak_date" in out.columns  # date-partitioned sink
    # same ids exactly
    assert (
        out.select("event_id").exceptAll(batch.select("event_id")).count() == 0
    )


def test_streaming_hourly_counts_match_batch(spark, tmp_path, events_src):
    stream = read_events_stream(spark, events_src)
    agg = hourly_counts_stream(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("hourly_counts_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from hourly_counts_test")
    batch = (
        table(spark, SF_DIR, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("bucket_ts"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    # append mode only emits windows the watermark has closed; every
    # emitted row must match the batch computation exactly
    emitted = got.join(
        batch.withColumnRenamed("n_events", "batch_n"), ["bucket_ts", "event_type"]
    )
    assert emitted.count() == got.count()
    assert emitted.filter(F.col("n_events") != F.col("batch_n")).count() == 0
    assert got.count() > 0
