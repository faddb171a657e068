"""SparkSession factory with scale-aware defaults.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` (default all cores); the
same configs are what we would set cluster-side for a 1000-executor run
against ~100 TB:

- AQE on (runtime coalescing, skew-join splitting) so static
  ``shuffle.partitions`` only needs to be an upper bound; runtime bloom
  filters (`spark.sql.optimizer.runtime.bloomFilter.enabled`, on by
  default in Spark 4) prune the probe side of selective large joins;
- Arrow on for every pandas boundary (collect + Pandas UDFs);
- UTC session timezone so timestamp semantics match the parquet data and
  the DuckDB oracle, independent of host TZ;
- parquet pushdown/pruning are Spark defaults — we rely on them rather
  than re-implementing the reference's manual row-group filters
  (/root/reference/oakstore/store.py:255-263).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "oakstore_spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    On a real cluster the caller supplies master/deploy config externally
    (spark-submit); everything set here is master-agnostic except the
    local[] fallback.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(int(cpus), 8)
        except ValueError:
            shuffle_partitions = 32
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    return builder.master(f"local[{cpus}]").getOrCreate()
