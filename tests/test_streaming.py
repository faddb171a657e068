"""Structured Streaming ingest tests: availableNow end-to-end over the
synthetic events parquet, checked against the batch equivalent."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from oakstore_spark.operators.timeseries import sessionize
from oakstore_spark.sources import table
from oakstore_spark.streaming import (
    hourly_counts_stream,
    ingest_events_stream,
    read_events_stream,
    running_user_totals,
    session_window_stats,
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


def test_streaming_session_window_matches_batch(spark, tmp_path, events_src):
    """Built-in session_window (30 min gap): session-window aggregation
    supports only append output, which emits a session once the watermark
    passes its end — so the emitted set is the watermark-closed PREFIX of
    the batch sessions. Every emitted session must match the batch
    gap-sessionize operator exactly on (user, start, n_events)."""
    stream = read_events_stream(spark, events_src)
    agg = session_window_stats(stream, gap="30 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("session_window_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sw"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT user_id, session_start, n_events FROM session_window_test"
    )
    batch = sessionize(table(spark, SF_DIR, "events"), "ts", ["user_id"], gap_seconds=1800)
    batch_sessions = batch.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.count(F.lit(1)).alias("batch_n"),
    )
    joined = got.join(batch_sessions, ["user_id", "session_start"])
    assert got.count() > 0
    assert joined.count() == got.count()  # every emitted session exists in batch
    assert joined.filter(F.col("n_events") != F.col("batch_n")).count() == 0


def test_streaming_running_totals_stateful(spark, tmp_path, events_src):
    """applyInPandasWithState accumulator: after the stream drains, the
    last emitted running total per user equals the batch aggregate —
    state must survive across micro-batches (maxFilesPerTrigger splits
    the source into several)."""
    # split source into multiple files to force multiple micro-batches
    src = table(spark, SF_DIR, "events")
    multi = str(tmp_path / "multi_src")
    src.repartition(4).write.parquet(multi)
    stream = (
        spark.readStream.schema(src.schema).option("maxFilesPerTrigger", 1).parquet(multi)
    )
    totals = running_user_totals(stream)
    q = (
        totals.writeStream.format("memory")
        .queryName("running_totals_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_rt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # the final (largest) emitted total per user is the full aggregate
    got = spark.sql(
        """
        SELECT user_id, max(n_events) AS n_events,
               max(total_value) AS total_value
        FROM running_totals_test GROUP BY user_id
        """
    )
    batch = src.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value")
    )
    joined = got.alias("g").join(batch.alias("b"), "user_id")
    assert joined.count() == batch.count()
    mism = joined.filter(
        (F.col("g.n_events") != F.col("b.n_events"))
        | (F.abs(F.col("g.total_value") - F.col("b.total_value")) > 1e-6)
    )
    assert mism.count() == 0


def test_streaming_sliding_counts_match_batch(spark, tmp_path, events_src):
    from oakstore_spark.streaming import sliding_counts_stream

    stream = read_events_stream(spark, events_src)
    agg = sliding_counts_stream(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("sliding_counts_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sl"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from sliding_counts_test")
    batch = (
        table(spark, SF_DIR, "events")
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("batch_n"))
        .select(F.col("win.start").alias("win_start"), "event_type", "batch_n")
    )
    emitted = got.join(batch, ["win_start", "event_type"])
    assert got.count() > 0
    assert emitted.count() == got.count()
    assert emitted.filter(F.col("n_events") != F.col("batch_n")).count() == 0
    # sliding: some instant must be covered by >1 window (overlap real)
    assert got.select("win_start").distinct().count() > got.select(
        F.date_trunc("hour", "win_start")
    ).distinct().count()


def test_streaming_stream_stream_join_matches_batch(spark, tmp_path, events_src):
    from oakstore_spark.streaming import click_purchase_attribution_stream

    stream = read_events_stream(spark, events_src)
    # watermark far wider than the dataset span: no state eviction, so the
    # stream result must equal the batch interval join exactly
    joined = click_purchase_attribution_stream(
        stream, max_gap="30 minutes", watermark="365 days"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ssj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select purchase_id, click_id, value, gap_seconds from ss_join_test")

    e = table(spark, SF_DIR, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("cu"),
        F.col("ts").alias("cts"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("pu"),
        F.col("ts").alias("pts"),
        "value",
    )
    batch = purchases.join(
        clicks,
        (F.col("cu") == F.col("pu"))
        & (F.col("cts") <= F.col("pts"))
        & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 30 minutes")),
    ).select("purchase_id", "click_id", "value",
             ((F.unix_micros("pts") - F.unix_micros("cts")) / 1e6).alias("gap_seconds"))
    assert got.count() > 0
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_stream_static_enrichment_matches_batch(spark, tmp_path, events_src):
    """Stream-static left join against a per-user dimension: every
    emitted row must match the batch join; no watermark needed (the
    static side carries no state)."""
    from oakstore_spark.streaming import enrich_stream_static

    batch = table(spark, SF_DIR, "events")
    dim = batch.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("user_events"),
        F.sum("value").alias("user_value"),
    )
    stream = read_events_stream(spark, events_src)
    enriched = enrich_stream_static(stream, dim).select(
        "event_id", "user_id", "user_events", "user_value"
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("ss_static_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sst"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from ss_static_test")
    want = batch.join(F.broadcast(dim), "user_id", "left").select(
        "event_id", "user_id", "user_events", "user_value"
    )
    assert got.count() == batch.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_streaming_late_data_dropped(spark, tmp_path):
    """An event older than the watermark arriving in a later micro-batch
    must NOT be counted: its window is already closed. This is the
    bounded-state guarantee that makes the aggregation safe on an
    unbounded stream."""
    import os

    import numpy as np
    import pandas as pd

    from oakstore_spark.streaming import hourly_counts_stream

    src = tmp_path / "late_src"
    src.mkdir()
    base = pd.Timestamp("2024-06-01 00:30:00")

    def write_file(name, ids, hours, mtime):
        pdf = pd.DataFrame(
            {
                "event_id": np.asarray(ids, dtype=np.int64),
                # timestamp[us] no-tz, matching the synthetic testdata layout
                "ts": pd.Series(
                    [base + pd.Timedelta(hours=h) for h in hours]
                ).astype("datetime64[us]"),
                "user_id": np.zeros(len(ids), dtype=np.int64),
                "event_type": ["click"] * len(ids),
                "value": np.ones(len(ids)),
                "props": ["{}"] * len(ids),
            }
        )
        path = src / name
        pdf.to_parquet(path, index=False)
        os.utime(path, (mtime, mtime))

    # 8 bulk files, 10 events each, spread over hours 0..19; the stream
    # reads 4 files per micro-batch -> bulk fills batches 0-1, the late
    # file arrives alone in batch 2. The watermark computed from a batch
    # is applied one batch LATER (batch 0's max event time governs batch
    # 2's filter), so the late row must land >=2 batches after the bulk.
    for i in range(8):
        write_file(
            f"bulk-{i}.parquet",
            range(i * 10, i * 10 + 10),
            [h % 20 for h in range(i * 10, i * 10 + 10)],
            1_700_000_000 + i * 1000,
        )
    write_file("late.parquet", [99_999], [0], 1_700_000_000 + 10_000)

    stream = read_events_stream(spark, str(src))
    agg = hourly_counts_stream(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("late_drop_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_late"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "select * from late_drop_test where bucket_ts = timestamp '2024-06-01 00:00:00'"
    ).toPandas()
    # hour-0 window: bulk contributed exactly 4 events (h % 20 == 0);
    # the late replay of hour 0 must be dropped, not double-counted
    assert len(got) == 1
    bulk_hour0 = sum(1 for h in range(80) if h % 20 == 0)
    assert int(got.n_events.iloc[0]) == bulk_hour0


def test_stream_append_into_store(spark, tmp_path, events_src):
    """foreachBatch incremental append into the Store layout: the
    streaming form of `store[k] += df`. Multiple micro-batches must
    land exactly the batch rows (single user -> unique TS, so the
    store's old-wins DATE dedup keeps everything)."""
    from oakstore_spark import Store
    from oakstore_spark.streaming import stream_append_to_store

    batch = table(spark, SF_DIR, "events")
    uid = batch.filter(F.col("event_type") == "view").groupBy("user_id").count() \
        .orderBy(F.col("count").desc()).first()["user_id"]

    store = Store(str(tmp_path / "store"), cols={"Value": float}, index="TS")
    stream = (
        read_events_stream(spark, events_src)
        .filter((F.col("event_type") == "view") & (F.col("user_id") == uid))
        .select("event_id", F.col("ts").alias("TS"), F.col("value").alias("Value"))
    )
    q = stream_append_to_store(stream, store, "USR", str(tmp_path / "ckpt_sas"))
    q.awaitTermination(120)

    got = store["USR"][:]
    want = (
        batch.filter((F.col("event_type") == "view") & (F.col("user_id") == uid))
        .select("ts", "value").toPandas().sort_values("ts")
    )
    assert len(got) == len(want)
    assert list(got.index) == list(want["ts"])
    assert got["VALUE"].to_numpy() == pytest.approx(want["value"].to_numpy())


def test_timer_based_session_close(spark, tmp_path):
    """transformWithStateInPandas with EVENT-TIME TIMERS: sessions are
    emitted exactly when they close — either a later event arrives past
    the gap (on-arrival split) or the watermark passes last_ts + gap
    (timer fire). A key whose session the watermark never passes stays
    open and is NOT emitted.

    The TWS protocol needs the protobuf package; where it is absent
    (this container) the operator must FAIL FAST at construction with
    an actionable message — that contract is pinned here and the full
    streaming scenario runs wherever protobuf exists."""
    import datetime as dt

    from oakstore_spark.streaming.stateful import session_close_on_timer

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        with pytest.raises(RuntimeError, match="protobuf"):
            session_close_on_timer(
                spark.readStream.schema("user_id long, ts timestamp, value double")
                .parquet(str(tmp_path))
                .withWatermark("ts", "5 seconds"),
                gap_sec=60,
            )
        return

    def ts(h, m, s):
        return dt.datetime(2024, 3, 1, h, m, s)

    src = str(tmp_path / "timer_src")
    schema = "user_id long, ts timestamp, value double"
    # file 1: user 1 session A (2 events), user 2 session A (1 event)
    f1 = [(1, ts(10, 0, 0), 1.0), (1, ts(10, 0, 30), 1.0), (2, ts(10, 0, 10), 1.0)]
    # file 2: user 1 again, 9.5 min later -> past the 60 s gap
    f2 = [(1, ts(10, 10, 0), 1.0)]
    # file 3: watermark pusher (its own session never closes)
    f3 = [(99, ts(11, 0, 0), 1.0)]
    for i, rows in enumerate([f1, f2, f3]):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            f"{src}/f{i}"
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
        .withWatermark("ts", "5 seconds")
    )
    out = session_close_on_timer(stream, gap_sec=60)
    q = (
        out.writeStream.format("memory")
        .queryName("timer_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_timer"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, r.n_events, r.session_start, r.session_end)
        for r in spark.sql("SELECT * FROM timer_sessions").collect()
    }
    expected = {
        (1, 2, ts(10, 0, 0), ts(10, 0, 30)),   # closed on-arrival by f2
        (1, 1, ts(10, 10, 0), ts(10, 10, 0)),  # closed by timer via f3
        (2, 1, ts(10, 0, 10), ts(10, 0, 10)),  # closed by timer
    }
    assert got == expected, got  # user 99's open session must be absent


def test_timeout_based_session_close_legacy_api(spark, tmp_path):
    """applyInPandasWithState + EventTimeTimeout: identical session-
    closing semantics to the TWS timer operator, runnable WITHOUT
    protobuf — sessions close when the watermark passes last_ts + gap
    (timeout fire) or when a later event arrives past the gap
    (on-arrival split); a session the watermark never passes stays
    open and unemitted."""
    import datetime as dt

    from oakstore_spark.streaming.stateful import session_close_on_timeout

    def ts(h, m, s):
        return dt.datetime(2024, 3, 1, h, m, s)

    src = str(tmp_path / "timeout_src")
    schema = "user_id long, ts timestamp, value double"
    f1 = [(1, ts(10, 0, 0), 1.0), (1, ts(10, 0, 30), 1.0), (2, ts(10, 0, 10), 1.0)]
    f2 = [(1, ts(10, 10, 0), 1.0)]
    f3 = [(99, ts(11, 0, 0), 1.0)]
    for i, rows in enumerate([f1, f2, f3]):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(f"{src}/f{i}")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
        .withWatermark("ts", "5 seconds")
    )
    out = session_close_on_timeout(stream, gap_sec=60)
    q = (
        out.writeStream.format("memory")
        .queryName("timeout_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_timeout"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, r.n_events, r.session_start, r.session_end)
        for r in spark.sql("SELECT * FROM timeout_sessions").collect()
    }
    expected = {
        (1, 2, ts(10, 0, 0), ts(10, 0, 30)),   # closed on-arrival by f2
        (1, 1, ts(10, 10, 0), ts(10, 10, 0)),  # closed by timeout via f3
        (2, 1, ts(10, 0, 10), ts(10, 0, 10)),  # closed by timeout
    }
    assert got == expected, got  # user 99's open session must be absent


def test_streaming_dedup_admission(spark, tmp_path):
    """End-to-end streaming near-dup admission: across three
    micro-batches, only FIRST occurrences are admitted — later
    near-dups are rejected whether their original arrived in an earlier
    batch (index hit) or the same batch (keep-first) — and the
    signature index ends up holding exactly the admitted docs."""
    from oakstore_spark.streaming.dedup import dedup_admission_stream

    base_a = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from a sunny windowsill and the birds sing outside in the garden"
    )
    base_b = (
        "completely different content about columnar storage engines and "
        "distributed query planning with adaptive execution at scale"
    )
    uniq = "a third unique document describing streaming watermarks in detail"
    f1 = [(1, base_a), (2, base_b)]
    f2 = [(3, base_a.replace("quick", "swift")), (4, uniq)]        # 3 dups idx
    f3 = [(5, uniq.replace("third", "3rd")), (6, base_b + " x"),    # both dup idx
          (7, "never seen before text about bloom filters and sketches"),
          (8, "never seen before text about bloom filters and sketches")]  # 8 dups 7 in-batch
    src = str(tmp_path / "adm_src")
    for i, rows in enumerate([f1, f2, f3]):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(f"{src}/f{i}")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    q = dedup_admission_stream(
        stream,
        corpus_dir=str(tmp_path / "corpus"),
        index_dir=str(tmp_path / "index"),
        checkpoint_dir=str(tmp_path / "ckpt_adm"),
        threshold=0.8,
    )
    q.awaitTermination(180)

    admitted = {
        r.doc_id
        for r in spark.read.parquet(str(tmp_path / "corpus" / "batch=*")).collect()
    }
    assert admitted == {1, 2, 4, 7}, admitted
    index_ids = {
        r.id
        for r in spark.read.parquet(str(tmp_path / "index" / "batch=*")).collect()
    }
    assert index_ids == admitted

    # scale contract: the reject path must stay distributed — an anti-join
    # against a rejects relation, never a collected set + isin() literal
    # list (which would blow up the driver on a big catch-up batch)
    import inspect

    import oakstore_spark.streaming.dedup as _sd

    src_text = inspect.getsource(_sd.dedup_admission_stream)
    assert ".isin(" not in src_text and ".collect()" not in src_text
    assert "left_anti" in src_text


def test_streaming_cms_merge_equals_batch(spark, tmp_path):
    """Mergeable-sketch contract: the cell-wise sum of per-micro-batch
    partial CMS grids must equal the grid one batch job builds over the
    union of all batches (addition is associative/commutative), and the
    served estimates must never undercount true frequencies."""
    from oakstore_spark.streaming.sketches import (
        cms_estimate,
        cms_merged_grid,
        cms_partial_grid,
        cms_stream,
    )

    # three files -> three micro-batches; skewed key distribution
    all_rows = []
    fid = 0
    src = str(tmp_path / "cms_src")
    for chunk in range(3):
        rows = [(i + chunk * 1000, (i * i + chunk) % 37) for i in range(200)]
        all_rows += rows
        spark.createDataFrame(rows, "event_id long, user_id long").coalesce(
            1
        ).write.parquet(f"{src}/f{fid}")
        fid += 1

    stream = (
        spark.readStream.schema("event_id long, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    q = cms_stream(
        stream,
        key_col="user_id",
        grid_dir=str(tmp_path / "grids"),
        checkpoint_dir=str(tmp_path / "ckpt_cms"),
    )
    q.awaitTermination(180)

    batch_df = spark.createDataFrame(all_rows, "event_id long, user_id long")
    merged = {
        (r["r"], r["bucket"]): r["c"]
        for r in cms_merged_grid(spark, str(tmp_path / "grids")).collect()
    }
    direct = {
        (r["r"], r["bucket"]): r["c"]
        for r in cms_partial_grid(batch_df, "user_id").collect()
    }
    assert merged == direct, "merged partials must equal the one-shot grid"

    probes = batch_df.select("user_id").distinct()
    est = {
        r["user_id"]: r["cms_est"]
        for r in cms_estimate(
            cms_merged_grid(spark, str(tmp_path / "grids")), probes, "user_id"
        ).collect()
    }
    from collections import Counter

    exact = Counter(u for _, u in all_rows)
    for u, n in exact.items():
        assert est[u] >= n, f"undercount for key {u}"


def test_store_replication_converges(spark, tmp_path):
    """Store-to-store replication over the manifest CDC stream: after
    genesis + two appends (including overlap that the source dedups),
    re-running the replication stream from the same checkpoint leaves
    the target item EXACTLY equal to the source item; a further no-op
    rerun changes nothing (idempotent apply)."""
    import numpy as np
    import pandas as pd

    from oakstore_spark import Store
    from oakstore_spark.streaming.replicate import replicate_item_stream

    src = Store(base_path=tmp_path / "src", spark=spark,
                commit_protocol="manifest")
    idx = pd.date_range("2022-01-01", periods=40, freq="D")
    df = pd.DataFrame(
        {"Open": np.arange(40.0), "High": np.arange(40.0),
         "Low": np.arange(40.0), "Close": np.arange(40.0),
         "Volume": np.arange(40)},
        index=idx,
    )
    src["REPL"] = df

    tgt = Store(base_path=tmp_path / "tgt", spark=spark)  # rename protocol
    ckpt = str(tmp_path / "ckpt_repl")

    def sync():
        q = replicate_item_stream(
            spark, str(tmp_path / "src"), "REPL", tgt, ckpt
        )
        q.awaitTermination(120)

    sync()
    assert tgt["REPL"].df().count() == 40

    # two appends: one pure-new, one overlapping (source drops the dupes)
    tail = df.iloc[-5:]
    newer = df.copy().iloc[:10]
    newer.index = newer.index + pd.Timedelta(days=60)
    src["REPL"] += pd.concat([tail, newer])
    sync()

    a = src["REPL"][:].reset_index(drop=False)
    b = tgt["REPL"][:].reset_index(drop=False)
    pd.testing.assert_frame_equal(a, b)
    assert len(b) == 50

    sync()  # no new versions -> no change
    assert tgt["REPL"].df().count() == 50


def test_streaming_media_decode_foreachbatch(spark, tmp_path):
    """Streaming x multimodal composition: a binaryFile FILE STREAM of
    real MJPEG-AVI payloads decoded micro-batch by micro-batch
    (foreachBatch -> video_frame_luma -> parquet sink). Per-frame rows
    in the sink must equal a batch decode of the same files — streaming
    media ingest loses nothing, and late-arriving files are picked up
    by the next availableNow run (incremental, not reprocessing)."""
    import numpy as np

    from oakstore_spark.operators.multimodal import (
        encode_jpeg_baseline_gray,
        encode_mjpeg_avi,
        video_frame_luma,
    )

    src = tmp_path / "media_src"
    src.mkdir()

    def write_avi(mid: int, n_frames: int) -> None:
        frames = []
        for i in range(n_frames):
            img = np.full((16, 16), (mid * 7 + i * 13) % 256, dtype=np.uint8)
            frames.append(encode_jpeg_baseline_gray(img, quality=100))
        (src / f"{mid:04d}.avi").write_bytes(
            encode_mjpeg_avi(frames, 16, 16, 25)
        )

    for mid in range(4):
        write_avi(mid, mid % 3 + 1)

    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_once() -> None:
        stream = (
            spark.readStream.format("binaryFile")
            .option("pathGlobFilter", "*.avi")
            .schema(
                "path string, modificationTime timestamp, "
                "length long, content binary"
            )
            .load(str(src))
        )

        def decode_batch(batch_df, batch_id):
            media = batch_df.select(
                F.regexp_extract(F.col("path"), r"(\d+)\.avi$", 1)
                .cast("long")
                .alias("media_id"),
                "content",
            )
            video_frame_luma(media).write.mode("append").parquet(sink)

        q = (
            stream.writeStream.foreachBatch(decode_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    got = spark.read.parquet(sink)
    assert got.count() == sum(m % 3 + 1 for m in range(4))
    # frame stats match: constant frames -> std 0, mean = planted value
    rows = {(r.media_id, r.frame_idx): r for r in got.collect()}
    for mid in range(4):
        for i in range(mid % 3 + 1):
            r = rows[(mid, i)]
            assert r.std_luma == 0.0
            assert r.mean_luma == float((mid * 7 + i * 13) % 256)

    # late-arriving file: only the NEW file is processed on rerun
    write_avi(7, 2)
    run_once()
    got2 = spark.read.parquet(sink)
    assert got2.count() == got.count() + 2
    assert got2.where(F.col("media_id") == 7).count() == 2


def test_stream_sink_cache_key_normalized(spark):
    """'dir' and 'dir/' must share ONE sink cache entry: a second call
    with a trailing slash used to miss the cache, map to the same
    on-disk tag, and rmtree the first caller's live sink."""
    from oakstore_spark.queries.streaming_batch import _ensure_stream_sink

    sf = "/root/testdata/sf0.001"
    a = _ensure_stream_sink(spark, sf)
    n_before = spark.read.parquet(a).count()
    b = _ensure_stream_sink(spark, sf + "/")
    assert a == b
    # sink is intact (not rebuilt/rmtree'd) and still readable
    assert spark.read.parquet(a).count() == n_before


# --- streaming PSI drift monitor -------------------------------------------


def test_streaming_psi_matches_batch_operator(spark, tmp_path):
    """Differential: the served streaming PSI must be BIT-identical to
    quality.psi_drift over the union of all micro-batches (integer bin
    counts merge associatively; the serving path applies the same
    float tree), including a replay-shaped rerun."""
    from pyspark.sql import functions as F

    from oakstore_spark.operators.quality import psi_drift
    from oakstore_spark.streaming.drift import (
        freeze_psi_baseline,
        psi_drift_stream,
        served_psi,
    )

    baseline = spark.range(1000).select(
        (F.col("id") % 100).cast("double").alias("v")
    )
    # shifted current distribution, split into 3 stream files
    cur = spark.range(900).select(
        ((F.col("id") % 100) * 1.3 + 5).alias("v"),
        (F.col("id") % 3).alias("part"),
    )
    src = str(tmp_path / "stream_in")
    cur.repartition("part").write.partitionBy("part").parquet(src)

    bdir = str(tmp_path / "baseline")
    gdir = str(tmp_path / "bins")
    ckpt = str(tmp_path / "ckpt")
    freeze_psi_baseline(baseline, "v", bdir, n_bins=10)

    stream = (
        spark.readStream.schema("v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = psi_drift_stream(stream, "v", bdir, gdir, ckpt)
    q.awaitTermination(120)

    got = {r.bin: r for r in served_psi(spark, bdir, gdir).collect()}
    want = {
        r.bin: r
        for r in psi_drift(baseline, cur.select("v"), "v", n_bins=10).collect()
    }
    assert set(got) == set(want) == set(range(10))
    for b in range(10):
        assert (got[b].n_base, got[b].n_cur) == (
            want[b].n_base, want[b].n_cur,
        )
        assert got[b].share_base == want[b].share_base
        assert got[b].share_cur == want[b].share_cur
        assert got[b].psi_contrib == want[b].psi_contrib
    # drift direction sanity: shifted current -> positive PSI
    assert sum(r.psi_contrib for r in got.values()) > 0.1

    # replay shape: restarting over the same input must not
    # double-count (batch=<id> overwrite)
    import shutil

    shutil.rmtree(ckpt)
    q2 = psi_drift_stream(
        spark.readStream.schema("v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        "v", bdir, gdir, str(tmp_path / "ckpt2"),
    )
    q2.awaitTermination(120)
    again = {r.bin: r for r in served_psi(spark, bdir, gdir).collect()}
    for b in range(10):
        assert again[b].n_cur == want[b].n_cur


def test_served_psi_before_first_batch(spark, tmp_path):
    """served_psi must serve against zero current counts before the
    first micro-batch partial is written (bins_dir doesn't exist yet),
    not throw."""
    from pyspark.sql import functions as F

    from oakstore_spark.streaming.drift import (
        freeze_psi_baseline,
        served_psi,
    )

    baseline = spark.range(1000).select(
        (F.col("id") % 100).cast("double").alias("v")
    )
    bdir = str(tmp_path / "baseline")
    freeze_psi_baseline(baseline, "v", bdir, n_bins=10)
    rows = served_psi(spark, bdir, str(tmp_path / "never_written")).collect()
    assert len(rows) == 10
    assert all(r.n_cur == 0 for r in rows)


def test_streaming_curation_e2e_differential_and_replay(spark, tmp_path):
    """r15 (r14 verdict ask #3): the full text->vector->dedup->index
    streaming leg equals the batch pipeline run batch-by-batch with
    the same operators (admission set, per-batch embeddings, index
    content), search over the streamed IVF layout returns the exact
    brute-force neighbor, and a RESTART REPLAY (same sinks, fresh
    checkpoint -> batch ids re-deliver) leaves every sink
    byte-identical — the batch=<id> overwrite idempotence contract."""
    from oakstore_spark.operators.dedup import minhash_signatures
    from oakstore_spark.operators.similarity import (
        cosine_topk,
        search_ivf_index,
    )
    from oakstore_spark.operators.text import doc_embed
    from oakstore_spark.streaming.curation import curation_ingest_stream
    from oakstore_spark.streaming.dedup import admission_rejects

    base_a = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from a sunny windowsill and the birds sing outside"
    )
    base_b = (
        "completely different content about columnar storage engines "
        "and distributed query planning with adaptive execution"
    )
    uniq = "a third unique document describing streaming watermarks"
    f1 = [(1, base_a), (2, base_b)]
    f2 = [(3, base_a.replace("quick", "swift")), (4, uniq)]
    f3 = [(5, uniq.replace("third", "3rd")), (6, base_b + " x"),
          (7, "never seen before text about bloom filters and sketches"),
          (8, "never seen before text about bloom filters and sketches")]
    batches = [f1, f2, f3]
    src = str(tmp_path / "cur_src")
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(f"{src}/f{i}")

    def run(ckpt: str):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/f*")
        )
        q = curation_ingest_stream(
            stream,
            corpus_dir=str(tmp_path / "corpus"),
            sig_index_dir=str(tmp_path / "sigs"),
            ivf_dir=str(tmp_path / "ivf"),
            checkpoint_dir=str(tmp_path / ckpt),
            threshold=0.8, dim=8, n_buckets=64, scale=1024,
            n_centroids=2,
        )
        q.awaitTermination(240)

    run("ckpt1")

    # ---- differential vs the batch pipeline, batch by batch
    expected_admitted: dict[int, list[int]] = {}
    admitted_so_far: list[tuple[int, str]] = []
    for i, rows in enumerate(batches):
        bdf = spark.createDataFrame(rows, "doc_id long, text string")
        idx_docs = spark.createDataFrame(
            admitted_so_far or [(None, None)], "doc_id long, text string"
        ).where("doc_id is not null")
        index = minhash_signatures(idx_docs, "doc_id", "text")
        rej = {
            r.doc_id
            for r in admission_rejects(
                bdf, index, "doc_id", "text", 0.8
            ).collect()
        }
        adm = [(d, t) for d, t in rows if d not in rej]
        expected_admitted[i] = sorted(d for d, _ in adm)
        admitted_so_far.extend(adm)

    for i in range(3):
        got = sorted(
            r.doc_id
            for r in spark.read.parquet(
                str(tmp_path / "corpus" / f"batch={i}")
            ).collect()
        )
        assert got == expected_admitted[i], (i, got)

    # ---- per-batch embeddings in the sink == doc_embed on that batch
    sink = spark.read.parquet(str(tmp_path / "ivf" / "vectors"))
    for i in range(3):
        adm_rows = [
            (d, t)
            for d, t in batches[i]
            if d in set(expected_admitted[i])
        ]
        want = {
            r.doc_id: list(r.emb_q)
            for r in doc_embed(
                spark.createDataFrame(
                    adm_rows, "doc_id long, text string"
                ),
                dim=8, n_buckets=64, scale=1024,
            ).collect()
        }
        got = {
            r.doc_id: list(r.emb_q)
            for r in sink.where(F.col("batch") == i).collect()
        }
        assert got == want, i

    # ---- the streamed layout is searchable: exact top-1 parity
    queries = spark.createDataFrame(
        [(100 + r.doc_id, list(r.embedding))
         for r in sink.collect()],
        "query_id long, embedding array<double>",
    )
    got_srch = search_ivf_index(
        spark, str(tmp_path / "ivf"), queries, k=1,
        id_col="doc_id", n_probe=2,
    ).toPandas()
    got_srch = got_srch.rename(columns={"doc_id": "vec_id"})
    exact = cosine_topk(
        sink.select("doc_id", "embedding").withColumnRenamed(
            "doc_id", "vec_id"
        ),
        queries, k=1,
    ).toPandas()
    g = {int(r.query_id): int(r.vec_id) for r in got_srch.itertuples()}
    e = {int(r.query_id): int(r.vec_id) for r in exact.itertuples()}
    assert g == e

    # ---- restart replay: fresh checkpoint, same sinks -> identical
    # CONTENT (batch=<id> overwrite; part-file names carry write UUIDs)
    def snap():
        corpus = sorted(
            (r.batch, r.doc_id, r.text)
            for r in spark.read.parquet(
                str(tmp_path / "corpus")
            ).collect()
        )
        sigs = sorted(
            (r.batch, r.id)
            for r in spark.read.parquet(str(tmp_path / "sigs")).collect()
        )
        vecs = sorted(
            (r.batch, r.doc_id, tuple(r.emb_q))
            for r in spark.read.parquet(
                str(tmp_path / "ivf" / "vectors")
            ).collect()
        )
        return corpus, sigs, vecs

    before = snap()
    run("ckpt2")
    assert snap() == before
