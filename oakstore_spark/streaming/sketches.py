"""Streaming MERGEABLE sketches: maintain a count-min frequency sketch
over an unbounded stream with bounded state and replay-safe commits.

The property that makes CMS the right streaming frequency structure is
that grids MERGE by cell-wise addition: each micro-batch computes its
own d x w partial grid (a tiny aggregate regardless of batch size) and
persists it under ``batch=<id>`` with overwrite mode — a replayed batch
overwrites its own previous partial instead of double-counting (the
same idempotence pattern as ``streaming/dedup.py``). Serving reads all
partials, sums cells, and takes the per-key row minimum; because
addition is associative and commutative, the served grid is EXACTLY the
grid a single batch job would have built over the union of all batches
(pinned in tests/test_streaming.py).

At scale: partial grids are d*w rows each — the stream's data volume
never accumulates anywhere; a compaction job can fold old ``batch=``
dirs into one at any time without changing served values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CMS_D = 4
CMS_W = 512


def _bucket(row_col, key_col):
    """md5-pinned bucket (engine-portable, same recipe as
    q_cms_heavy_hitters)."""
    key = F.concat(row_col.cast("string"), F.lit(":"), key_col.cast("string"))
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint") % CMS_W


def cms_partial_grid(df: DataFrame, key_col: str) -> DataFrame:
    """The d x w partial grid for one (micro-)batch: every key
    occurrence increments one bucket per hash row."""
    rows = F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias("r")
    return (
        df.select(F.col(key_col).alias("k"), rows)
        .select("r", _bucket(F.col("r"), F.col("k")).alias("bucket"))
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_stream(
    stream: DataFrame,
    key_col: str,
    grid_dir: str,
    checkpoint_dir: str,
):
    """Start (availableNow) the sketch-maintenance stream; returns the
    handle. Each micro-batch writes its partial grid to
    ``grid_dir/batch=<id>`` (overwrite => replay-idempotent)."""

    def write_partial(batch_df: DataFrame, batch_id: int) -> None:
        cms_partial_grid(batch_df, key_col).write.mode("overwrite").parquet(
            f"{grid_dir}/batch={batch_id}"
        )

    return (
        stream.writeStream.foreachBatch(write_partial)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def cms_merged_grid(spark: SparkSession, grid_dir: str) -> DataFrame:
    """Cell-wise sum of all persisted partials — the authoritative grid."""
    return (
        spark.read.parquet(grid_dir)
        .groupBy("r", "bucket")
        .agg(F.sum("c").alias("c"))
    )


def cms_estimate(grid: DataFrame, probes: DataFrame, key_col: str) -> DataFrame:
    """Estimate each probe key's frequency: min over its d cells."""
    rows = F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias("r")
    pc = probes.select(F.col(key_col).alias("k"), rows).select(
        "k", "r", _bucket(F.col("r"), F.col("k")).alias("bucket")
    )
    return (
        pc.join(F.broadcast(grid), ["r", "bucket"])
        .groupBy("k")
        .agg(F.min("c").alias("cms_est"))
        .select(F.col("k").alias(key_col), "cms_est")
    )
