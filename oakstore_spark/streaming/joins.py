"""Stream-stream joins — EXT (the reference has no streaming at all:
SURVEY.md §2, evidence /root/reference/oakstore/store.py:1-267).

The canonical shape: two watermarked event streams joined on an equality
key plus a time-interval condition. Both watermarks and the interval
bound let Spark expire join state: a buffered click can be dropped once
the purchase-side watermark passes click_ts + max_gap, so state stays
bounded on an unbounded stream — the property that makes this runnable
against a 100 TB/day firehose, where an unbounded-state join would OOM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def click_purchase_attribution_stream(
    events: DataFrame,
    max_gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Attribute each purchase to the same user's clicks within
    ``max_gap`` before it (inner stream-stream interval join).

    Output: (purchase_id, click_id, user_id, value, gap_seconds).
    Both sides carry a watermark; the interval condition
    ``click_ts in [purchase_ts - max_gap, purchase_ts]`` is what allows
    Spark to GC click state once the purchase watermark passes.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("purchase_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    joined = purchases.join(
        clicks,
        F.expr(
            f"""
            click_user = purchase_user AND
            click_ts <= purchase_ts AND
            click_ts >= purchase_ts - INTERVAL {max_gap}
            """
        ),
        "inner",
    )
    gap = F.unix_micros("purchase_ts") - F.unix_micros("click_ts")
    return joined.select(
        "purchase_id",
        "click_id",
        F.col("purchase_user").alias("user_id"),
        "value",
        (gap / F.lit(1_000_000.0)).alias("gap_seconds"),
    )


def enrich_stream_static(
    events: DataFrame,
    dim: DataFrame,
    key: str = "user_id",
    broadcast: bool = True,
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch of the stream
    joins against a STATIC dimension (no watermark, no join state — the
    dimension is re-resolved per micro-batch, so an updated dim table is
    picked up on the next trigger).

    ``broadcast=True`` hints the dim side so every micro-batch is a
    map-side hash join: the streaming side never shuffles, which is the
    only sane plan when the stream is the 100 TB/day firehose and the
    dimension is user/product metadata. Set False only for a dimension
    too large to broadcast (then pre-bucket both sides on the key).
    Left join keeps events with no dimension row (cold-start users).
    """
    d = F.broadcast(dim) if broadcast else dim
    return events.join(d, on=key, how="left")
