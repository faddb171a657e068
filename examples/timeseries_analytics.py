#!/usr/bin/env python
"""Timeseries analytics over the event fixtures: as-of attribution,
OHLC candles, sessionization, drawdown — the operator layer a reference
user gains by switching.

Run: python examples/timeseries_analytics.py [sf_dir]  (default sf0.001)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from oakstore_spark.operators.timeseries import (  # noqa: E402
    asof_join,
    grouped_cusum,
    sessionize,
)
from oakstore_spark.session import get_spark  # noqa: E402
from oakstore_spark.sources import table  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("timeseries_example")
    e = table(spark, sf_dir, "events")

    # 1. as-of attribution: each purchase joined to the user's most
    #    recent prior view (one shuffle, union+window — no range join)
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    views = e.where(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id")
    )
    attributed = asof_join(purchases, views, ts_col="ts", by=["user_id"],
                           value_cols=["view_id"])
    print("attributed purchases:", attributed.where(F.col("view_id").isNotNull()).count())

    # 2. gap-based sessions (30 min)
    sessions = sessionize(e, "ts", ["user_id"], gap_seconds=1800)
    sessions.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("n_sessions")
    ).orderBy(F.desc("n_sessions")).show(5)

    # 3. per-user CUSUM drift alarm on spend (integer cents)
    cents = e.withColumn("cents", F.round(F.col("value") * 100).cast("bigint"))
    drift = grouped_cusum(cents, "ts", ["user_id"], "cents", allowance=5000)
    drift.groupBy("user_id").agg(F.max("cusum").alias("peak")).orderBy(
        F.desc("peak")
    ).show(5)


if __name__ == "__main__":
    main(*sys.argv[1:2])
