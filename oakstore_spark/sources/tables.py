"""Parquet table sources for the driver's synthetic star schema.

The reference's only source is a filtered parquet scan
(/root/reference/oakstore/store.py:260-264) plus a test-only yfinance
download (testing/yfinance.py:6-19). Here: plain ``spark.read.parquet``
— Catalyst handles filter pushdown and column pruning; we never
pre-materialize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one synthetic table.

    ``events.ts`` normalization: the synthetic parquet stores
    ``timestamp[us]`` with no timezone, which Spark reads as
    ``TIMESTAMP_NTZ`` — a type rejected by ``unix_micros``, RANGE window
    frames, and ``cast(.. as double)``. The session timezone is pinned
    to UTC (session.py), so casting NTZ -> ``timestamp`` (TIMESTAMP_LTZ)
    is instant-preserving and keeps the DuckDB oracle comparison exact.
    A nanos-as-long branch is kept for robustness against
    TIMESTAMP(NANOS) parquet (``div`` keeps integer precision above
    2^53 ns; sub-microsecond precision truncates, matching DuckDB's
    ``epoch_us`` floor semantics).
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif isinstance(ts_type, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for spark.sql usage)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
