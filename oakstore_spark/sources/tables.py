"""Parquet table sources for the driver's synthetic star schema.

The reference's only source is a filtered parquet scan
(/root/reference/oakstore/store.py:260-264) plus a test-only yfinance
download (testing/yfinance.py:6-19). Here: plain ``spark.read.parquet``
— Catalyst handles filter pushdown and column pruning; we never
pre-materialize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
    """Lazy parquet scan of one synthetic table."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for spark.sql usage)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
