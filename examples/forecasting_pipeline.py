#!/usr/bin/env python
"""Forecast-diagnostics pipeline over the event fixtures: which
seasonality lives in the series (periodogram), what AR order to fit
(ACF/PACF), the fit itself (AR(2) closed form), where the level shifted
(changepoint), and which series lead which (CCF) — the measure-first
chain a forecasting user runs BEFORE trusting any model.

Run: python examples/forecasting_pipeline.py [sf_dir]  (default sf0.001)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from oakstore_spark.operators.timeseries import (  # noqa: E402
    acf_pacf,
    ar_forecast,
    ccf,
    changepoint_mean_shift,
    periodogram,
)
from oakstore_spark.session import get_spark  # noqa: E402
from oakstore_spark.sources import table  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("forecasting_example")
    spark.sparkContext.setLogLevel("ERROR")
    e = table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )

    # 1. seasonality detection: spectral power at candidate periods —
    #    the seasonal operators all ASSUME a period; this measures it
    spec = periodogram(
        e, "ts", ["user_id"], "cents", periods=[7, 24],
        order_tiebreak=["event_id"],
    )
    spec.groupBy("period").agg(
        F.round(F.avg("power_ratio"), 4).alias("avg_power_ratio")
    ).orderBy("period").show()

    # 2. order selection: the PACF of an AR(p) process cuts off after
    #    lag p — per-user partials tell us what to fit
    pac = acf_pacf(
        e, "ts", ["user_id"], "cents", max_lag=4,
        order_tiebreak=["event_id"],
    )
    pac.groupBy("lag").agg(
        F.round(F.avg(F.abs(F.col("pacf"))), 4).alias("avg_abs_pacf")
    ).orderBy("lag").show()

    # 3. the fit: closed-form AR(2) per user + one-step forecast
    fc = ar_forecast(
        e, "ts", ["user_id"], "cents", order_tiebreak=["event_id"]
    )
    fc.select("user_id", "n_obs", "a1", "a2", "forecast_next").orderBy(
        "user_id"
    ).show(5)

    # 4. where did the level change? exact-integer CUSUM argmax
    cp = changepoint_mean_shift(
        e, "ts", ["user_id"], "cents", order_tiebreak=["event_id"]
    )
    cp.orderBy(F.desc("stat")).select(
        "user_id", "split_rn", F.round("shift", 2).alias("shift")
    ).show(5)

    # 5. lead/lag: does event intensity (type length proxy) lead or
    #    lag spend? positive peak lag == the second series leads
    two = e.join(
        table(spark, sf_dir, "events").select(
            "event_id", F.length("event_type").cast("bigint").alias("tlen")
        ),
        "event_id",
    )
    xc = ccf(
        two, "ts", ["user_id"], "cents", "tlen", max_lag=2,
        order_tiebreak=["event_id"],
    )
    xc.groupBy("lag").agg(
        F.round(F.avg("ccf"), 4).alias("avg_ccf")
    ).orderBy("lag").show()


if __name__ == "__main__":
    main(*sys.argv[1:])
