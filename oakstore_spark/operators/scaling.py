"""Partition-balance helpers for Python-kernel operators.

Parquet scans split at row-group boundaries, so a small table written as
one row group arrives as ONE partition no matter what
``spark.sql.files.maxPartitionBytes`` says — and every Arrow-batched
Python kernel downstream (minhash signing, LSH bucketing, multimodal
decode) runs serially in a single task. Measured at sf0.1: minhash
signing of 5k docs took 7.9 s in one task vs ~0.6 s spread over
local[32].

``widen_partitions`` repartitions ONLY when the input has fewer
partitions than the cluster has slots, so at real scale (100 TB inputs
already split into thousands of row groups) it is a no-op — the extra
shuffle exists exactly when it is cheap and saves exactly when input
parallelism starves the CPUs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_partitions(df: DataFrame, min_ratio: float = 1.0) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism`` iff it currently has
    fewer than ``min_ratio * defaultParallelism`` partitions."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < int(min_ratio * target):
        return df.repartition(target)
    return df
