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

    # 4. forecasting rungs (NEW r11): Holt-Winters with a weekly-ish
    # seasonal slot, a rolling-origin accuracy readout, and a
    # distribution-free conformal band around each user's next step
    from oakstore_spark.operators.timeseries import (
        backtest_holt,
        conformal_holt_interval,
        grouped_holt_winters,
        rolling_active_users,
    )

    series = cents.select("user_id", "ts", "event_id", "cents")
    hw = grouped_holt_winters(
        series, "ts", ["user_id"], "cents",
        alpha=0.5, beta=0.25, gamma=0.5, period=7,
        order_tiebreak=["event_id"],
    )
    hw.orderBy(F.desc("rn")).select(
        "user_id", "rn", "level", "trend", "seasonal", "forecast"
    ).show(3)
    backtest_holt(
        series, "ts", ["user_id"], "cents", alpha=0.5, beta=0.25,
        order_tiebreak=["event_id"],
    ).orderBy("wape").show(3)
    conformal_holt_interval(
        series, "ts", ["user_id"], "cents", 0.5, 0.25,
        miscoverage=0.1, order_tiebreak=["event_id"],
    ).orderBy("user_id").show(3)

    # 5. DAU/WAU/MAU + stickiness (the interval-difference trick)
    rolling_active_users(e, "user_id", "ts").orderBy(
        F.desc("day")
    ).show(3)


if __name__ == "__main__":
    main(*sys.argv[1:2])
