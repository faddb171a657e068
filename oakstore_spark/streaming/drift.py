"""Streaming PSI drift monitor: maintain the current-window bin counts
of a metric stream against a FROZEN baseline, with bounded state and
replay-safe commits — the deployment shape of
``operators/quality.psi_drift`` (which compares two static snapshots).

Mechanics mirror ``streaming/sketches.py``'s mergeable-CMS pattern:

- the baseline is frozen ONCE (``freeze_psi_baseline``): bin edges
  (lo, width) and per-bin counts persist to a directory — PSI is only
  comparable across runs when the edges never move;
- each micro-batch bins its rows on those frozen edges and writes its
  tiny per-bin partial under ``batch=<id>`` with overwrite — a replayed
  batch overwrites its own previous partial instead of double-counting;
- serving (``served_psi``) sums the partials cell-wise and applies the
  EXACT float tree of the batch operator
  (``quality.psi_from_counts``) — bin counts are integers and addition
  is associative, so the served PSI is BIT-IDENTICAL to running
  ``psi_drift`` over the union of all batches (pinned by the
  differential pytest).

At scale the state is n_bins rows per batch — the stream's volume
never accumulates; compaction can fold old ``batch=`` dirs at any
time without changing served values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _bin_expr(value_col: str, lo: float, width: float, n_bins: int):
    return F.greatest(
        F.least(
            F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)),
            F.lit(n_bins - 1),
        ),
        F.lit(0),
    ).cast("long")


def freeze_psi_baseline(
    baseline: DataFrame,
    value_col: str,
    baseline_dir: str,
    n_bins: int = 10,
) -> None:
    """Freeze the baseline: per-bin counts plus the (lo, width, n_bins,
    n_total) metadata every later batch bins against.  One aggregate
    for the bounds, one for the counts — identical binning to
    ``quality.psi_drift``'s baseline side."""
    b = baseline.where(F.col(value_col).isNotNull())
    mm = b.agg(
        F.min(value_col).alias("lo"), F.max(value_col).alias("hi")
    ).collect()[0]
    if mm["lo"] is None:
        raise ValueError("baseline has no non-null values")
    lo = float(mm["lo"])
    width = (float(mm["hi"]) - lo) / n_bins
    if not width:
        width = 1.0
    n_total = b.count()
    (
        b.groupBy(_bin_expr(value_col, lo, width, n_bins).alias("bin"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_base"))
        .withColumn("lo", F.lit(lo))
        .withColumn("width", F.lit(width))
        .withColumn("n_bins", F.lit(n_bins))
        .withColumn("n_total", F.lit(n_total).cast("long"))
        .write.mode("overwrite")
        .parquet(baseline_dir)
    )


def psi_drift_stream(
    stream: DataFrame,
    value_col: str,
    baseline_dir: str,
    bins_dir: str,
    checkpoint_dir: str,
):
    """Start (availableNow) the monitor: each micro-batch bins on the
    frozen edges and writes its per-bin partial to
    ``bins_dir/batch=<id>`` (overwrite => replay-idempotent).  Returns
    the streaming-query handle."""
    spark = stream.sparkSession
    meta = spark.read.parquet(baseline_dir).select(
        "lo", "width", "n_bins"
    ).first()
    lo, width, n_bins = (
        float(meta["lo"]), float(meta["width"]), int(meta["n_bins"])
    )

    def write_partial(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.where(F.col(value_col).isNotNull())
            .groupBy(
                _bin_expr(value_col, lo, width, n_bins).alias("bin")
            )
            .agg(F.count(F.lit(1)).cast("long").alias("n_cur"))
            .write.mode("overwrite")
            .parquet(f"{bins_dir}/batch={batch_id}")
        )

    return (
        stream.writeStream.foreachBatch(write_partial)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def served_psi(
    spark: SparkSession, baseline_dir: str, bins_dir: str
) -> DataFrame:
    """The authoritative PSI relation right now: merged current counts
    vs the frozen baseline through ``quality.psi_from_counts`` — one
    row per bin, ``sum(psi_contrib)`` is the PSI, bit-identical to the
    batch operator over the same rows."""
    from oakstore_spark.operators.quality import psi_from_counts

    base = spark.read.parquet(baseline_dir)
    n_bins = int(base.select("n_bins").first()["n_bins"])
    n_base_total = int(base.select("n_total").first()["n_total"])
    try:
        partials = spark.read.parquet(bins_dir)
    except Exception:
        # Before the first micro-batch partial lands the path does not
        # exist yet — serve PSI against zero current counts instead of
        # throwing (same probe pattern as similarity._read_tombstones).
        partials = spark.createDataFrame([], "bin long, n_cur long")
    cur = partials.groupBy("bin").agg(F.sum("n_cur").alias("n_cur"))
    n_cur_total = int(
        cur.agg(F.coalesce(F.sum("n_cur"), F.lit(0))).collect()[0][0]
    )
    grid = spark.range(n_bins).select(F.col("id").alias("bin"))
    joined = (
        grid.join(base.select("bin", "n_base"), "bin", "left")
        .join(cur, "bin", "left")
        .select(
            "bin",
            F.coalesce("n_base", F.lit(0)).cast("long").alias("n_base"),
            F.coalesce("n_cur", F.lit(0)).cast("long").alias("n_cur"),
        )
    )
    return psi_from_counts(joined, n_base_total, n_cur_total, n_bins)
