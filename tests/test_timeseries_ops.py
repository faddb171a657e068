"""Unit tests for timeseries operators not fully covered by the DuckDB
oracle (forward as-of, OHLCV resample on store data)."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from pyspark.sql import functions as F

from oakstore_spark.operators.timeseries import asof_join, resample_ohlcv, sessionize


@pytest.fixture
def trades(spark):
    pdf = pd.DataFrame(
        {
            "sym": ["A", "A", "A", "B"],
            "ts": pd.to_datetime(["2024-01-01 10:00:00", "2024-01-01 10:00:05",
                                  "2024-01-01 10:01:00", "2024-01-01 10:00:03"]),
            "px": [10.0, 11.0, 12.0, 50.0],
        }
    )
    return spark.createDataFrame(pdf)


@pytest.fixture
def quotes(spark):
    pdf = pd.DataFrame(
        {
            "sym": ["A", "A", "B", "B"],
            "ts": pd.to_datetime(["2024-01-01 09:59:59", "2024-01-01 10:00:05",
                                  "2024-01-01 10:00:04", "2024-01-01 10:02:00"]),
            "bid": [9.5, 10.5, 49.0, 51.0],
        }
    )
    return spark.createDataFrame(pdf)


def test_asof_backward(spark, trades, quotes):
    out = asof_join(trades, quotes, "ts", ["sym"], ["bid"]).toPandas()
    out = out.sort_values(["sym", "ts"]).reset_index(drop=True)
    # A@10:00:00 -> quote 09:59:59; A@10:00:05 -> equal-ts quote (inclusive);
    # A@10:01:00 -> still 10:00:05; B@10:00:03 -> no earlier quote -> null
    assert out.loc[0, "bid"] == 9.5
    assert out.loc[1, "bid"] == 10.5
    assert out.loc[2, "bid"] == 10.5
    assert pd.isna(out.loc[3, "bid"])


def test_asof_forward(spark, trades, quotes):
    out = asof_join(trades, quotes, "ts", ["sym"], ["bid"], direction="forward").toPandas()
    out = out.sort_values(["sym", "ts"]).reset_index(drop=True)
    # A@10:00:00 -> next quote 10:00:05; A@10:01:00 -> none -> null;
    # B@10:00:03 -> 10:00:04
    assert out.loc[0, "bid"] == 10.5
    assert out.loc[1, "bid"] == 10.5
    assert pd.isna(out.loc[2, "bid"])
    assert out.loc[3, "bid"] == 49.0


def test_asof_tolerance(spark, trades, quotes):
    # 3-second tolerance: only matches within 3s survive; the rest null
    out = asof_join(
        trades, quotes, "ts", ["sym"], ["bid"], tolerance_seconds=3
    ).toPandas()
    out = out.sort_values(["sym", "ts"]).reset_index(drop=True)
    # A@10:00:00 -> 09:59:59 is 1s back -> kept; A@10:00:05 -> equal ts ->
    # kept; A@10:01:00 -> 10:00:05 is 55s back -> nulled; B@10:00:03 -> no
    # earlier quote -> null
    assert out.loc[0, "bid"] == 9.5
    assert out.loc[1, "bid"] == 10.5
    assert pd.isna(out.loc[2, "bid"])
    assert pd.isna(out.loc[3, "bid"])
    # carried right-ts column is nulled past tolerance too
    out2 = asof_join(
        trades, quotes, "ts", ["sym"], ["bid"],
        right_ts_as="qts", tolerance_seconds=3,
    ).toPandas().sort_values(["sym", "ts"]).reset_index(drop=True)
    assert pd.isna(out2.loc[2, "qts"]) and pd.notna(out2.loc[1, "qts"])


def test_resample_ohlcv(store, ohlcv_data):
    store["MSFT"] = ohlcv_data
    daily = store["MSFT"].df()
    monthly = resample_ohlcv(daily, "DATE", "month").toPandas().set_index("bucket_ts").sort_index()
    truth = ohlcv_data.sort_index().resample("MS").agg(
        {"Open": "first", "High": "max", "Low": "min", "Close": "last", "Volume": "sum"}
    ).dropna()
    assert len(monthly) == len(truth)
    assert (monthly["OPEN"].to_numpy() == truth["Open"].to_numpy()).all()
    assert (monthly["CLOSE"].to_numpy() == truth["Close"].to_numpy()).all()
    assert (monthly["VOLUME"].to_numpy() == truth["Volume"].to_numpy()).all()


def test_sessionize_basic(spark):
    pdf = pd.DataFrame(
        {
            "u": [1, 1, 1, 1, 2],
            "ts": pd.to_datetime(
                ["2024-01-01 10:00", "2024-01-01 10:10", "2024-01-01 11:30",
                 "2024-01-01 11:40", "2024-01-01 10:00"]
            ),
        }
    )
    out = sessionize(spark.createDataFrame(pdf), "ts", ["u"], gap_seconds=1800)
    got = {(r["u"], r["ts"].isoformat()): r["session_id"] for r in out.collect()}
    assert got[(1, "2024-01-01T10:00:00")] == 1
    assert got[(1, "2024-01-01T10:10:00")] == 1
    assert got[(1, "2024-01-01T11:30:00")] == 2  # 80-min gap
    assert got[(1, "2024-01-01T11:40:00")] == 2
    assert got[(2, "2024-01-01T10:00:00")] == 1


def test_gapfill_dense_and_ffill(spark):
    from oakstore_spark.operators.timeseries import gapfill
    import pandas as pd

    rows = [
        ("a", "2024-01-01 00:00:00", 1, 10.0),
        ("a", "2024-01-01 03:00:00", 2, 30.0),  # 2 missing hours
        ("b", "2024-01-01 01:00:00", 5, 50.0),
    ]
    df = spark.createDataFrame(rows, ["k", "bucket", "n", "v"]).withColumn(
        "bucket", F.col("bucket").cast("timestamp")
    )
    out = gapfill(
        df, "bucket", ["k"], "INTERVAL 1 HOUR", fills={"n": 0}, ffill_cols=["v"]
    ).orderBy("k", "bucket").toPandas()
    a = out[out.k == "a"]
    assert len(a) == 4  # 00,01,02,03 dense
    assert list(a.n) == [1, 0, 0, 2]  # zero-filled
    assert list(a.v) == [10.0, 10.0, 10.0, 30.0]  # forward-filled
    b = out[out.k == "b"]
    assert len(b) == 1 and b.iloc[0].n == 5


def test_continuous_aggregate_materialized_path(spark, tmp_path):
    """Materialize the rollup to parquet, read it back, union the raw
    tail: must equal aggregating all of raw directly."""
    from oakstore_spark.operators.timeseries import (
        continuous_aggregate,
        realtime_aggregate,
        resample,
    )

    idx = pd.date_range("2024-03-01", periods=200, freq="17min")
    pdf = pd.DataFrame({"ts": idx, "k": ["a", "b"] * 100, "v": range(200)})
    raw = spark.createDataFrame(pdf)
    aggs = lambda: [  # noqa: E731 - fresh Column objects per use
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
    ]
    cutoff = "2024-03-02 07:11:00"  # mid-bucket on purpose

    rollup_path = str(tmp_path / "rollup")
    continuous_aggregate(raw, "ts", "hour", ["k"], aggs(), cutoff).write.parquet(
        rollup_path
    )
    served = realtime_aggregate(
        spark.read.parquet(rollup_path), raw, "ts", "hour", ["k"], aggs(), cutoff
    )
    full = resample(raw, "ts", "hour", ["k"], aggs())

    got = served.orderBy("bucket_ts", "k").toPandas()
    want = full.orderBy("bucket_ts", "k").toPandas()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want[got.columns].reset_index(drop=True)
    )
    # the tail scan really is a sliver: rollup covers everything strictly
    # before the cutoff bucket
    n_rollup = spark.read.parquet(rollup_path).count()
    assert n_rollup == served.filter(F.col("bucket_ts") < F.lit("2024-03-02 07:00:00")).count()


def test_refresh_continuous_aggregate_equals_full_recompute(spark):
    """Late rows touch 2 of 4 buckets: refresh must recompute exactly
    those and leave the rest byte-identical to the stale rollup."""
    from datetime import datetime

    from oakstore_spark.operators.timeseries import refresh_continuous_aggregate

    rows = []
    for h in range(4):
        for i in range(10):
            rows.append((h * 100 + i, datetime(2024, 1, 1, h, i), "a", 1.0))
    raw_initial = spark.createDataFrame(rows, "id long, ts timestamp, k string, v double")
    late = spark.createDataFrame(
        [(9001, datetime(2024, 1, 1, 1, 30), "a", 5.0),
         (9002, datetime(2024, 1, 1, 3, 30), "b", 7.0)],
        "id long, ts timestamp, k string, v double",
    )
    full = raw_initial.unionByName(late)
    aggs = [F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")]

    stale = raw_initial.groupBy(
        F.date_trunc("hour", "ts").alias("bucket_ts"), "k"
    ).agg(*aggs)
    refreshed = refresh_continuous_aggregate(
        stale, full, late, "ts", "hour", ["k"], aggs
    ).toPandas().sort_values(["bucket_ts", "k"]).reset_index(drop=True)
    scratch = full.groupBy(
        F.date_trunc("hour", "ts").alias("bucket_ts"), "k"
    ).agg(*aggs).toPandas().sort_values(["bucket_ts", "k"]).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(refreshed, scratch)
    # buckets 1 and 3 recomputed (bucket 3 gains the new 'b' group),
    # buckets 0 and 2 kept untouched: 4 'a' rows + 1 'b' row
    assert len(refreshed) == 5


def test_asof_join_nearest_direction(spark):
    """nearest picks the closer match either side; exact ties go to the
    earlier (backward) row; one-sided cases degrade to that side."""
    from datetime import datetime

    from oakstore_spark.operators.timeseries import asof_join

    left = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 0, 0, 10)),   # back@8 (d2) vs fwd@13 (d3) -> back
         (1, datetime(2024, 1, 1, 0, 0, 12)),   # back@8 (d4) vs fwd@13 (d1) -> fwd
         (1, datetime(2024, 1, 1, 0, 0, 3)),    # tie: back@1 (d2) vs fwd@5? no: back@1 d2, fwd@5 d2 -> tie -> back
         (2, datetime(2024, 1, 1, 0, 0, 1))],   # no backward -> fwd
        "k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 0, 0, 1), 101),
         (1, datetime(2024, 1, 1, 0, 0, 5), 105),
         (1, datetime(2024, 1, 1, 0, 0, 8), 108),
         (1, datetime(2024, 1, 1, 0, 0, 13), 113),
         (2, datetime(2024, 1, 1, 0, 0, 9), 209)],
        "k long, ts timestamp, v long",
    )
    out = asof_join(
        left, right, ts_col="ts", by=["k"], value_cols=["v"], direction="nearest"
    ).toPandas().sort_values("ts").reset_index(drop=True)
    by_ts = {r.ts.second: r.v for r in out.itertuples()}
    assert by_ts[10] == 108   # 2s back beats 3s fwd
    assert by_ts[12] == 113   # 1s fwd beats 4s back
    assert by_ts[3] == 101    # exact tie (2s both) -> backward
    assert by_ts[1] == 209    # key 2: nothing backward -> forward


def test_asof_nearest_differential_vs_pandas(spark):
    """Randomized differential: direction='nearest' must agree with
    pandas merge_asof(direction='nearest') per key (timestamps drawn
    continuous so exact ties — where tie-break conventions could differ
    — don't occur)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(99)
    base = pd.Timestamp("2024-01-01")

    def frame(n, vcol):
        ts = base + pd.to_timedelta(
            np.sort(rng.choice(10_000_000, size=n, replace=False)), unit="us"
        )
        return pd.DataFrame(
            {"k": rng.integers(0, 4, n), "ts": ts, vcol: np.arange(n)}
        )

    left = frame(300, "lid")
    right = frame(200, "val")
    sl = spark.createDataFrame(left)
    sr = spark.createDataFrame(right)
    from oakstore_spark.operators.timeseries import asof_join

    got = (
        asof_join(sl, sr, ts_col="ts", by=["k"], value_cols=["val"],
                  direction="nearest")
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    expect = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts"),
        on="ts",
        by="k",
        direction="nearest",
    ).sort_values("lid").reset_index(drop=True)
    got_map = dict(zip(got.lid, got.val))
    exp_map = dict(zip(expect.lid, expect.val))
    for lid in exp_map:
        e, g = exp_map[lid], got_map[lid]
        assert (pd.isna(e) and pd.isna(g)) or e == g, (lid, e, g)


def test_grouped_ewma_carry_across_arrow_batches(spark):
    """grouped_ewma's mapInPandas kernel carries (key, y, rn) state
    across Arrow batch boundaries. Force 7-row batches so every
    partition splits mid-group, and pin exact parity with pandas'
    groupby().ewm(adjust=False) ground truth."""
    import numpy as np
    import pandas as pd

    from oakstore_spark.operators.timeseries import grouped_ewma

    rng = np.random.default_rng(7)
    n = 400
    pdf = pd.DataFrame(
        {
            "k": rng.integers(0, 5, n),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.permutation(n), unit="s"),
            "v": rng.normal(0, 10, n),
        }
    )
    sdf = spark.createDataFrame(pdf)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
        got = (
            grouped_ewma(sdf, "ts", ["k"], "v", alpha=0.3)
            .toPandas()
            .sort_values(["k", "rn"])
            .reset_index(drop=True)
        )
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    exp = pdf.sort_values(["k", "ts"]).reset_index(drop=True)
    exp["ewma"] = exp.groupby("k")["v"].transform(
        lambda s: s.ewm(alpha=0.3, adjust=False).mean()
    )
    exp["rn"] = exp.groupby("k").cumcount() + 1
    exp = exp.sort_values(["k", "rn"]).reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["rn"].to_numpy() == exp["rn"].to_numpy()).all()
    np.testing.assert_allclose(
        got["ewma"].to_numpy(), exp["ewma"].to_numpy(), rtol=1e-12
    )


def test_grouped_cusum_carry_across_arrow_batches(spark):
    """grouped_cusum's carry kernel must reproduce the textbook
    sequential recursion exactly with 7-row Arrow batches splitting
    every group across batch boundaries (integer arithmetic -> exact)."""
    import numpy as np
    import pandas as pd

    from oakstore_spark.operators.timeseries import grouped_cusum

    rng = np.random.default_rng(11)
    n = 300
    pdf = pd.DataFrame(
        {
            "k": rng.integers(0, 4, n),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.permutation(n), unit="s"),
            "v": rng.integers(-50, 80, n),
        }
    )
    sdf = spark.createDataFrame(pdf)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
        got = (
            grouped_cusum(sdf, "ts", ["k"], "v", allowance=10)
            .toPandas()
            .sort_values(["k", "rn"])
            .reset_index(drop=True)
        )
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    exp_rows = []
    for k, grp in pdf.sort_values(["k", "ts"]).groupby("k"):
        s = 0
        for rn, v in enumerate(grp["v"], start=1):
            s = max(0, s + int(v) - 10)
            exp_rows.append((k, rn, s))
    exp = pd.DataFrame(exp_rows, columns=["k", "rn", "cusum"]).sort_values(
        ["k", "rn"]
    ).reset_index(drop=True)
    assert (got["k"].to_numpy() == exp["k"].to_numpy()).all()
    assert (got["rn"].to_numpy() == exp["rn"].to_numpy()).all()
    assert (got["cusum"].to_numpy() == exp["cusum"].to_numpy()).all()


def test_funnel_analysis_ordering_and_window(spark):
    """Funnel semantics: step i counts only STRICTLY AFTER step i-1
    (a click before the first view doesn't convert), the earliest
    qualifying event wins, the within-window anchors at step 1, and a
    user who skips a middle step never reaches later ones."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from oakstore_spark.operators.timeseries import funnel_analysis

    t = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # u1: clean conversion view@1 -> click@3 -> purchase@5
        (1, t(1), "view"), (1, t(3), "click"), (1, t(5), "purchase"),
        # u2: click BEFORE first view -> not counted; later click ok
        (2, t(2), "click"), (2, t(4), "view"), (2, t(6), "click"),
        # u3: view then purchase WITHOUT click -> stuck at step 1
        (3, t(1), "view"), (3, t(2), "purchase"),
        # u4: duplicate events -> earliest qualifying wins
        (4, t(1), "view"), (4, t(2), "click"), (4, t(3), "click"),
        (4, t(4), "purchase"),
        # u5: click outside the 10-minute window -> step 2 missed
        (5, t(1), "view"), (5, t(30), "click"),
        # u6: never views -> absent from the output entirely
        (6, t(1), "click"), (6, t(2), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {
        r["user_id"]: r.asDict()
        for r in funnel_analysis(
            df,
            steps=[
                ("view", F.col("event_type") == "view"),
                ("click", F.col("event_type") == "click"),
                ("purchase", F.col("event_type") == "purchase"),
            ],
            within="10 minutes",
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4, 5}
    us = lambda m: int(datetime(2024, 1, 1, 0, m).timestamp() * 1_000_000)  # noqa: E731
    assert out[1]["steps_completed"] == 3
    assert (out[1]["view_us"], out[1]["click_us"], out[1]["purchase_us"]) == (
        us(1), us(3), us(5)
    )
    assert out[2]["steps_completed"] == 2 and out[2]["click_us"] == us(6)
    assert out[3]["steps_completed"] == 1 and out[3]["click_us"] is None
    assert out[3]["purchase_us"] is None  # no step skipping
    assert out[4]["click_us"] == us(2)  # earliest qualifying
    assert out[4]["steps_completed"] == 3
    assert out[5]["steps_completed"] == 1  # window cutoff


def test_cohort_retention_matrix(spark):
    """Hand-built cohorts: offset-0 rate is exactly 1.0, a user counts
    once per period regardless of event volume, later-period activity
    lands in the FIRST-seen cohort, and absent (cohort, offset) cells
    emit no row."""
    from datetime import datetime, timedelta

    from oakstore_spark.operators.timeseries import cohort_retention

    wk = 7 * 86_400_000_000
    base = datetime(2024, 1, 4)  # mid-week: grid is pure epoch//week

    def at(weeks, hours=0):
        return base + timedelta(weeks=weeks, hours=hours)

    rows = (
        # cohort A (week of base): users 1,2,3; u1 returns wk+1, wk+2;
        # u2 returns wk+2 (twice — must count once); u3 never returns
        [(1, at(0)), (1, at(1)), (1, at(2)),
         (2, at(0)), (2, at(2)), (2, at(2, 5)),
         (3, at(0))]
        # cohort B (base+1wk): user 4, returns wk+1
        + [(4, at(1)), (4, at(2))]
    )
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        (r["cohort_start_us"], r["period_offset"]): (
            r["n_active"], r["cohort_size"], r["retention_rate"]
        )
        for r in cohort_retention(df, period="week").collect()
    }
    c_a = int(base.timestamp() * 1_000_000) // wk * wk
    c_b = int(at(1).timestamp() * 1_000_000) // wk * wk
    assert out[(c_a, 0)] == (3, 3, 1.0)
    assert out[(c_a, 1)] == (1, 3, 1 / 3)   # only u1
    assert out[(c_a, 2)] == (2, 3, 2 / 3)   # u1 + u2 (deduped)
    assert out[(c_b, 0)] == (1, 1, 1.0)
    assert out[(c_b, 1)] == (1, 1, 1.0)
    assert (c_b, 2) not in out              # sparse matrix
    assert len(out) == 5


def test_cohort_retention_month_boundaries(spark):
    """Calendar-month grain: a Jan-31 first event cohorts into January
    with cohort_start Jan-1; a Feb-1 return is offset 1 (one calendar
    month, despite being 1 day later); Jan-31 -> Mar-1 is offset 2;
    a Dec cohort's January return crosses the year boundary as offset
    1; leap-February (2024) arithmetic stays exact."""
    from datetime import datetime

    from oakstore_spark.operators.timeseries import cohort_retention

    rows = [
        # u1: Jan-31 cohort, returns Feb-1 (offset 1) and Mar-1 (2)
        (1, datetime(2024, 1, 31, 23, 59)),
        (1, datetime(2024, 2, 1, 0, 1)),
        (1, datetime(2024, 3, 1)),
        # u2: Jan-1 cohort (same January cohort as u1), never returns
        (2, datetime(2024, 1, 1)),
        # u3: Dec-2023 cohort, returns Jan-2024 (offset 1 across the
        # year boundary) and Feb-29 leap day (offset 2)
        (3, datetime(2023, 12, 15)),
        (3, datetime(2024, 1, 2)),
        (3, datetime(2024, 2, 29)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        (r["cohort_start_us"], r["period_offset"]): (
            r["n_active"], r["cohort_size"], r["retention_rate"]
        )
        for r in cohort_retention(df, period="month").collect()
    }
    jan = int(datetime(2024, 1, 1).timestamp() * 1_000_000)
    dec = int(datetime(2023, 12, 1).timestamp() * 1_000_000)
    assert out[(jan, 0)] == (2, 2, 1.0)     # u1 + u2
    assert out[(jan, 1)] == (1, 2, 0.5)     # u1's Feb-1, one day later
    assert out[(jan, 2)] == (1, 2, 0.5)     # u1's Mar-1
    assert out[(dec, 0)] == (1, 1, 1.0)     # u3
    assert out[(dec, 1)] == (1, 1, 1.0)     # year-boundary offset
    assert out[(dec, 2)] == (1, 1, 1.0)     # leap-day Feb 29
    assert len(out) == 6

    import pytest as _pytest

    with _pytest.raises(ValueError, match="period"):
        cohort_retention(df, period="quarter")


def test_funnel_summary_counts_rates_medians(spark):
    """Hand-built funnel: per-step reach, conversion from step 1, and
    EXACT medians (odd count -> middle value, even count -> halfway
    interpolation), with non-completers dropped from the median and
    step 1's median NULL."""
    from datetime import datetime, timedelta

    from oakstore_spark.operators.timeseries import (
        funnel_analysis,
        funnel_summary,
    )

    t0 = datetime(2024, 3, 1)

    def ev(u, typ, secs):
        return (u, typ, t0 + timedelta(seconds=secs))

    rows = [
        # u1: view->click in 10s, click->buy in 100s
        ev(1, "view", 0), ev(1, "click", 10), ev(1, "buy", 110),
        # u2: view->click in 20s, no buy
        ev(2, "view", 0), ev(2, "click", 20),
        # u3: view->click in 31s, click->buy in 200s
        ev(3, "view", 0), ev(3, "click", 31), ev(3, "buy", 231),
        # u4: view only
        ev(4, "view", 0),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    per_user = funnel_analysis(
        df,
        [
            ("view", F.col("event_type") == "view"),
            ("click", F.col("event_type") == "click"),
            ("buy", F.col("event_type") == "buy"),
        ],
    )
    out = {
        r["step"]: r.asDict()
        for r in funnel_summary(per_user, ["view", "click", "buy"]).collect()
    }
    assert out["view"]["n_users"] == 4
    assert out["view"]["conversion_rate"] == 1.0
    assert out["view"]["median_secs_from_prev"] is None
    assert out["click"]["n_users"] == 3
    assert out["click"]["conversion_rate"] == 3 / 4
    assert out["click"]["median_secs_from_prev"] == 20.0  # odd count
    assert out["buy"]["n_users"] == 2
    assert out["buy"]["conversion_rate"] == 2 / 4
    assert out["buy"]["median_secs_from_prev"] == 150.0   # (100+200)/2
    assert [out[s]["step_index"] for s in ("view", "click", "buy")] == [1, 2, 3]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-empty"):
        funnel_summary(per_user, [])


def test_attribution_models_and_lookback(spark):
    """Hand-built journeys: last-touch picks the latest in-window
    touch (touch at the conversion instant counts; equal-ts ties go to
    the GREATEST channel), first-touch the earliest in-window (ties to
    the LEAST), the lookback excludes stale touches, and a conversion
    with no qualifying touch attributes NULL."""
    from datetime import datetime, timedelta

    from oakstore_spark.operators.timeseries import attribute_conversions

    t0 = datetime(2024, 5, 1, 12, 0, 0)

    def at(secs):
        return t0 + timedelta(seconds=secs)

    rows = [
        # u1: email then ad, converts 10s after ad
        (1, "email", at(0)), (1, "ad", at(50)), (1, "buy", at(60)),
        # u2: only touch is 2 days old -> outside 1-day lookback
        (2, "ad", at(-200_000)), (2, "buy", at(0)),
        # u3: two touches at the SAME instant as the conversion
        (3, "ad", at(0)), (3, "email", at(0)), (3, "buy", at(0)),
    ]
    df = spark.createDataFrame(rows, "user_id long, channel string, ts timestamp")
    conv = F.col("channel") == "buy"
    touch = F.col("channel") != "buy"

    def run(model, lookback="1 day"):
        return {
            r["user_id"]: r["channel"]
            for r in attribute_conversions(
                df, conv, touch, "channel",
                model=model, lookback=lookback,
            ).collect()
        }

    last = run("last")
    assert last[1] == "ad"
    assert last[2] is None          # stale touch excluded
    assert last[3] == "email"       # equal-ts tie -> greatest channel
    first = run("first")
    assert first[1] == "email"
    assert first[2] is None
    assert first[3] == "ad"         # equal-ts tie -> least channel
    # no lookback: u2's 2-day-old touch now counts
    assert run("last", lookback=None)[2] == "ad"

    import pytest as _pytest

    with _pytest.raises(ValueError, match="model"):
        attribute_conversions(df, conv, touch, "channel", model="linear")


def test_psi_drift_shift_and_bins(spark):
    """Identical snapshots give PSI ~0 (exact add-half symmetry: every
    contribution is 0.0); a shifted snapshot gives a large PSI;
    out-of-baseline-range values clamp into the edge bins; bin edges
    come from the BASELINE only."""
    from oakstore_spark.operators.quality import psi_drift

    base = spark.createDataFrame(
        [(float(i),) for i in range(100)], "v double"
    )
    same = psi_drift(base, base, "v", n_bins=10).collect()
    assert len(same) == 10
    assert all(r["psi_contrib"] == 0.0 for r in same)
    assert all(r["n_base"] == 10 for r in same)

    shifted = spark.createDataFrame(
        [(float(i) + 200,) for i in range(100)], "v double"
    )
    rows = {r["bin"]: r for r in psi_drift(base, shifted, "v").collect()}
    assert rows[9]["n_cur"] == 100        # everything clamps high
    assert all(rows[b]["n_cur"] == 0 for b in range(9))
    assert sum(r["psi_contrib"] for r in rows.values()) > 0.25  # action band

    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_bins"):
        psi_drift(base, base, "v", n_bins=1)
    with _pytest.raises(ValueError, match="non-null"):
        psi_drift(
            spark.createDataFrame([(None,)], "v double"), base, "v"
        )


# --- multi-touch attribution ----------------------------------------------


def _mta_events(spark):
    from datetime import datetime as dt
    rows = [
        # user 1: touches a,b,c then conversion  (k=3)
        (1, dt(2024, 1, 1, 10, 0), "touch", "a", 1),
        (1, dt(2024, 1, 1, 11, 0), "touch", "b", 2),
        (1, dt(2024, 1, 1, 12, 0), "touch", "c", 3),
        (1, dt(2024, 1, 1, 13, 0), "conv", None, 4),
        # user 2: single touch (k=1)
        (2, dt(2024, 1, 1, 9, 0), "touch", "a", 5),
        (2, dt(2024, 1, 1, 10, 0), "conv", None, 6),
        # user 3: two touches (k=2)
        (3, dt(2024, 1, 1, 9, 0), "touch", "b", 7),
        (3, dt(2024, 1, 1, 10, 0), "touch", "c", 8),
        (3, dt(2024, 1, 1, 11, 0), "conv", None, 9),
    ]
    return spark.createDataFrame(
        rows, ["user_id", "ts", "kind", "channel", "event_id"]
    )


def test_multi_touch_position_roles(spark):
    from pyspark.sql import functions as F
    from oakstore_spark.operators.timeseries import multi_touch_attribution

    out = multi_touch_attribution(
        _mta_events(spark),
        conversion_pred=F.col("kind") == "conv",
        touch_pred=F.col("kind") == "touch",
        channel_col="channel",
        conv_id_col="event_id",
        model="position",
    ).collect()
    got = {(r.channel, r.k, r.role): (r.n_touches, r.credit) for r in out}
    assert got[("a", 3, "first")] == (1, 0.4)
    assert got[("b", 3, "middle")] == (1, 1 * 0.2 / 1)
    assert got[("c", 3, "last")] == (1, 0.4)
    assert got[("a", 1, "only")] == (1, 1.0)
    assert got[("b", 2, "first")] == (1, 0.5)
    assert got[("c", 2, "last")] == (1, 0.5)
    assert len(got) == 6


def test_multi_touch_linear_and_lookback(spark):
    from pyspark.sql import functions as F
    from oakstore_spark.operators.timeseries import multi_touch_attribution

    # 1-hour lookback drops user 1's touch 'a' (3h before conv) and
    # 'b' (2h) -> only 'c' in window (k=1, credit 1.0)
    out = multi_touch_attribution(
        _mta_events(spark),
        conversion_pred=F.col("kind") == "conv",
        touch_pred=F.col("kind") == "touch",
        channel_col="channel",
        conv_id_col="event_id",
        model="linear",
        lookback="1 hour",
    ).collect()
    got = {(r.channel, r.k): (r.n_touches, r.credit) for r in out}
    assert got[("c", 1)] == (2, 2.0)  # users 1 and 3 each credit c fully
    assert got[("a", 1)] == (1, 1.0)  # user 2
    assert ("b", 2) not in got and len(got) == 2


def test_multi_touch_same_ts_conversions_distinct(spark):
    from datetime import datetime as dt
    from pyspark.sql import functions as F
    from oakstore_spark.operators.timeseries import multi_touch_attribution

    # two conversions at the SAME (user, ts) must each earn full credit
    rows = [
        (1, dt(2024, 1, 1, 10, 0), "touch", "a", 1),
        (1, dt(2024, 1, 1, 11, 0), "conv", None, 2),
        (1, dt(2024, 1, 1, 11, 0), "conv", None, 3),
    ]
    df = spark.createDataFrame(
        rows, ["user_id", "ts", "kind", "channel", "event_id"]
    )
    out = multi_touch_attribution(
        df,
        conversion_pred=F.col("kind") == "conv",
        touch_pred=F.col("kind") == "touch",
        channel_col="channel",
        conv_id_col="event_id",
        model="linear",
    ).collect()
    assert [(r.channel, r.k, r.n_touches, r.credit) for r in out] == [
        ("a", 1, 2, 2.0)
    ]


# --- Holt double-exponential smoothing ------------------------------------


def _holt_ref(xs, alpha, beta):
    out = []
    l, b = float(xs[0]), 0.0
    out.append((1, l, b))
    for t, x in enumerate(xs[1:], start=2):
        l_new = alpha * float(x) + (1.0 - alpha) * (l + b)
        b = beta * (l_new - l) + (1.0 - beta) * b
        l = l_new
        out.append((t, l, b))
    return out


def test_grouped_holt_hand_recursion(spark):
    from datetime import datetime as dt
    from oakstore_spark.operators.timeseries import grouped_holt

    xs = [10.0, 14.0, 18.0, 10.0, 30.0]
    rows = [(1, dt(2024, 1, 1, h), x) for h, x in enumerate(xs)]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    got = sorted(
        grouped_holt(df, "ts", ["user_id"], "value", 0.5, 0.25).collect(),
        key=lambda r: r.rn,
    )
    for r, (rn, l, b) in zip(got, _holt_ref(xs, 0.5, 0.25)):
        assert r.rn == rn and r.level == l and r.trend == b
        assert r.forecast == l + b


def test_grouped_holt_batch_carry_parity(spark):
    """7-row Arrow batches must give bit-identical results to one
    batch — the (key, l, b, rn) carry re-enters the recursion."""
    from datetime import datetime as dt
    import random

    from oakstore_spark.operators.timeseries import grouped_holt

    rng = random.Random(3)
    rows = []
    for u in range(4):
        for i in range(23):
            rows.append((u, dt(2024, 1, 1, 0, i), rng.uniform(0, 100)))
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"]).coalesce(1)

    def run():
        return {
            (r.user_id, r.rn): (r.level, r.trend)
            for r in grouped_holt(
                df, "ts", ["user_id"], "value", 0.5, 0.25
            ).collect()
        }

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
        small = run()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    big = run()
    assert small == big and len(small) == 4 * 23


def test_event_sequence_matches_hand(spark):
    from datetime import datetime as dt
    from oakstore_spark.operators.timeseries import event_sequence_matches

    # user 1: v c c p v p x(nuisance) v c  -> 'vccpvpvc' matches 'vc*p'
    # at vccp and vp -> 2; trailing vc unclosed
    seq = ["v", "c", "c", "p", "v", "p", "x", "v", "c"]
    rows = [(1, dt(2024, 1, 1, 0, i), s, i) for i, s in enumerate(seq)]
    # user 2: p p (no v prefix) -> 0 matches
    rows += [(2, dt(2024, 1, 1, 0, i), "p", 100 + i) for i in range(2)]
    df = spark.createDataFrame(rows, ["user_id", "ts", "etype", "event_id"])
    out = {
        r.user_id: (r.seq_len, r.n_matches)
        for r in event_sequence_matches(
            df,
            ["user_id"],
            "ts",
            "etype",
            alphabet={"v": "v", "c": "c", "p": "p"},
            pattern="vc*p",
            order_tiebreak=["event_id"],
        ).collect()
    }
    # nuisance 'x' is unmapped -> dropped (cannot interrupt a pattern);
    # user 1 string is 'vccpvpvc' (len 8)
    assert out[1] == (8, 2)
    assert out[2] == (2, 0)


def test_deseasonalize_recovers_planted_profile(spark):
    from datetime import datetime as dt
    from oakstore_spark.operators.timeseries import deseasonalize

    # plant value = 100*hour + noise-free -> seasonal profile exactly
    # recovers 100*h - grand_mean and residuals are all zero
    rows = []
    for day in range(1, 4):
        for h in range(4):
            rows.append((day * 10 + h, dt(2024, 1, day, h), 100 * h))
    df = spark.createDataFrame(rows, ["event_id", "ts", "cents"])
    out = deseasonalize(df, "ts", "cents", period="hour_of_day").collect()
    grand = (0 + 100 + 200 + 300) * 3 / 12.0
    for r in out:
        assert r.period_mean == 100.0 * r.period_idx
        assert r.seasonal == 100.0 * r.period_idx - grand
        assert r.residual == 0.0


def test_deseasonalize_day_of_week_and_bad_period(spark):
    from datetime import datetime as dt
    import pytest
    from oakstore_spark.operators.timeseries import deseasonalize

    rows = [(1, dt(2024, 1, 1), 10), (2, dt(2024, 1, 2), 30)]
    df = spark.createDataFrame(rows, ["event_id", "ts", "cents"])
    out = {r.event_id: r for r in deseasonalize(
        df, "ts", "cents", period="day_of_week").collect()}
    # Jan 1 2024 is a Monday (dayofweek=2), Jan 2 Tuesday (3)
    assert out[1].period_idx == 2 and out[2].period_idx == 3
    assert out[1].residual == 0.0  # singleton periods
    with pytest.raises(ValueError):
        deseasonalize(df, "ts", "cents", period="bogus")


def test_top_event_paths_hand(spark):
    from datetime import datetime as dt
    from oakstore_spark.operators.timeseries import top_event_paths

    # user 1: a b c a b c  -> 3-grams: a>b>c, b>c>a, c>a>b, a>b>c
    # user 2: a b          -> too short, contributes nothing
    seq = ["a", "b", "c", "a", "b", "c"]
    rows = [(1, dt(2024, 1, 1, 0, i), s, i) for i, s in enumerate(seq)]
    rows += [(2, dt(2024, 1, 1, 0, i), s, 10 + i) for i, s in enumerate(["a", "b"])]
    df = spark.createDataFrame(rows, ["user_id", "ts", "etype", "event_id"])
    out = top_event_paths(
        df, ["user_id"], "ts", "etype", n=3, top_k=10,
        order_tiebreak=["event_id"],
    ).collect()
    got = [(r.path, r.n_occurrences) for r in out]
    assert got[0] == ("a>b>c", 2)
    assert set(got[1:]) == {("b>c>a", 1), ("c>a>b", 1)}
    # tie order: equal-count paths sort ascending
    assert got[1][0] < got[2][0]


def test_backtest_holt_hand(spark):
    """Hand-stepped Holt recursion + half-up quantized scoring on two
    tiny keys; the existing grouped_holt outputs must be unchanged by
    the with_backtest_cols plumbing."""
    from oakstore_spark.operators.timeseries import (
        backtest_holt,
        grouped_holt,
    )

    rows = [
        ("a", 1, 100), ("a", 2, 110), ("a", 3, 130), ("a", 4, 120),
        ("b", 1, 50), ("b", 2, 50),
    ]
    df = spark.createDataFrame(rows, ["k", "t", "x"])
    out = {
        r.k: r
        for r in backtest_holt(
            df, "t", ["k"], "x", alpha=0.5, beta=0.25
        ).collect()
    }

    # hand recursion, alpha=.5 beta=.25 (dyadic -> exact)
    def step(l, b, x):
        ln = 0.5 * x + 0.5 * (l + b)
        return ln, 0.25 * (ln - l) + 0.75 * b

    import math

    l, b = 100.0, 0.0
    evals = []
    for x in (110, 130, 120):
        f = math.floor((l + b) + 0.5)
        evals.append((x, f))
        l, b = step(l, b, x)
    n = len(evals)
    sae = sum(abs(x - f) for x, f in evals)
    sx = sum(abs(x) for x, _ in evals)
    sf = sum(abs(f) for _, f in evals)
    serr = sum(x - f for x, f in evals)
    assert out["a"].n_evals == n
    assert out["a"].mae == sae / n
    assert out["a"].wape == sae / sx
    assert out["a"].smape == 2 * sae / (sx + sf)
    assert out["a"].mean_err == serr / n
    # key b: one eval, forecast 50 exactly -> zero error
    assert out["b"].n_evals == 1 and out["b"].mae == 0.0

    # plumbing regression: default grouped_holt schema unchanged
    cols = grouped_holt(df, "t", ["k"], "x", 0.5, 0.25).columns
    assert cols == ["k", "rn", "level", "trend", "forecast"]


def test_decompose_classical_planted_zero_residuals(spark):
    """Planted linear trend + zero-sum profile with balanced position
    counts: trend recovers c*t EXACTLY, seasonal recovers the profile,
    residuals are closed-form 0.0 — odd and even period paths."""
    from oakstore_spark.operators.timeseries import decompose_classical

    # odd m=5, h=2: N=44 -> 40 valid rows, 8 per position
    prof5 = [2, -1, 0, 3, -4]
    rows = [
        ("a", t, 10 * t + prof5[(t - 1) % 5]) for t in range(1, 45)
    ]
    df = spark.createDataFrame(rows, ["k", "t", "x"])
    out = decompose_classical(df, ["k"], ["t"], "x", period=5).collect()
    valid = [r for r in out if r.trend is not None]
    assert len(valid) == 40
    for r in valid:
        t = r.rn
        assert r.trend == 10.0 * t
        assert r.seasonal == float(prof5[(t - 1) % 5])
        assert r.residual == 0.0
    edges = [r for r in out if r.trend is None]
    assert len(edges) == 4 and all(r.residual is None for r in edges)

    # even m=4, h=2 (the 2x4 MA half-weight path): N=36 -> 32 valid
    prof4 = [5, -2, -1, -2]
    rows4 = [
        ("b", t, 7 * t + prof4[(t - 1) % 4]) for t in range(1, 37)
    ]
    df4 = spark.createDataFrame(rows4, ["k", "t", "x"])
    out4 = decompose_classical(df4, ["k"], ["t"], "x", period=4).collect()
    valid4 = [r for r in out4 if r.trend is not None]
    assert len(valid4) == 32
    for r in valid4:
        t = r.rn
        assert r.trend == 7.0 * t
        assert r.seasonal == float(prof4[(t - 1) % 4])
        assert r.residual == 0.0

    import pytest

    with pytest.raises(ValueError):
        decompose_classical(df, ["k"], ["t"], "x", period=1)


def _hw_reference(xs, alpha, beta, gamma, m):
    out = []
    l = float(xs[0]); b = 0.0
    season = [0.0] * m
    out.append((1, l, b, season[0], l + b + season[1 % m]))
    for t in range(2, len(xs) + 1):
        x = float(xs[t - 1])
        pos = (t - 1) % m
        s_old = season[pos]
        l_new = alpha * (x - s_old) + (1 - alpha) * (l + b)
        b = beta * (l_new - l) + (1 - beta) * b
        s_new = gamma * (x - l_new) + (1 - gamma) * s_old
        season[pos] = s_new
        l = l_new
        out.append((t, l, b, season[pos], l + b + season[t % m]))
    return out


def test_grouped_holt_winters_hand_recursion(spark):
    """Bit-exact vs the hand recursion (dyadic constants) on two keys,
    including a planted periodic series whose seasonal slots must
    converge toward the planted profile."""
    from oakstore_spark.operators.timeseries import grouped_holt_winters

    profile = [40, 0, -40]
    xs_a = [1000 + profile[(t - 1) % 3] for t in range(1, 31)]
    xs_b = [500, 500, 500, 500, 500, 500]
    rows = [("a", t, x) for t, x in enumerate(xs_a, 1)] + [
        ("b", t, x) for t, x in enumerate(xs_b, 1)
    ]
    df = spark.createDataFrame(rows, ["k", "t", "x"])
    got = {
        (r.k, r.rn): r
        for r in grouped_holt_winters(
            df, "t", ["k"], "x", alpha=0.5, beta=0.25, gamma=0.5,
            period=3,
        ).collect()
    }
    for key, xs in (("a", xs_a), ("b", xs_b)):
        for t, l, b, s, f in _hw_reference(xs, 0.5, 0.25, 0.5, 3):
            r = got[(key, t)]
            assert (r.level, r.trend, r.seasonal, r.forecast) == (
                l, b, s, f
            ), (key, t)
    # constant series: level locks to the constant, trend/seasonal ~ 0
    rb = got[("b", 6)]
    assert abs(rb.level - 500) < 1e-9 and abs(rb.trend) < 1e-9
    # planted profile: late seasonal slots approach the centered profile
    late = {((t - 1) % 3): got[("a", t)].seasonal for t in (28, 29, 30)}
    for pos, want in enumerate(profile):
        assert abs(late[pos] - want) < 6.0, (pos, late[pos])


def test_grouped_holt_winters_batch_carry(spark):
    """The (l, b, season[m]) state must carry across Arrow batch
    boundaries: a 7-row maxRecordsPerBatch run equals the default."""
    from oakstore_spark.operators.timeseries import grouped_holt_winters

    rows = [("u", t, 100 + (t * 13) % 29) for t in range(1, 40)]
    df = spark.createDataFrame(rows, ["k", "t", "x"]).repartition(1)
    kw = dict(alpha=0.5, beta=0.25, gamma=0.5, period=5)
    base = {
        r.rn: (r.level, r.trend, r.seasonal, r.forecast)
        for r in grouped_holt_winters(df, "t", ["k"], "x", **kw).collect()
    }
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        tiny = {
            r.rn: (r.level, r.trend, r.seasonal, r.forecast)
            for r in grouped_holt_winters(
                df, "t", ["k"], "x", **kw
            ).collect()
        }
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", old
            )
    assert tiny == base


def test_rolling_active_users_vs_brute(spark):
    """The interval-difference trick must equal brute-force rolling
    distinct counts, including gap days with zero activity and
    re-activations inside/outside the window."""
    import datetime as dt

    from oakstore_spark.operators.timeseries import rolling_active_users

    def ts(day):
        return dt.datetime(2024, 1, 1) + dt.timedelta(days=day)

    # u1 active d0..d2, then d20; u2 every 3rd day; u3 only d10
    acts = (
        [("u1", d) for d in (0, 1, 2, 20)]
        + [("u2", d) for d in range(0, 30, 3)]
        + [("u3", 10)]
    )
    df = spark.createDataFrame(
        [(u, ts(d)) for u, d in acts], ["user_id", "ts"]
    )
    got = {
        r.day: r
        for r in rolling_active_users(
            df, "user_id", "ts", windows=(7, 28)
        ).collect()
    }
    base = min(got)
    days = {u: {d for uu, d in acts if uu == u} for u in ("u1", "u2", "u3")}
    assert len(got) == 28  # d0..d27 inclusive grid (max activity = 27)
    for day in got:
        d = day - base
        dau = sum(1 for u in days if d in days[u])
        wau = sum(
            1 for u in days if any(d - 6 <= a <= d for a in days[u])
        )
        mau = sum(
            1 for u in days if any(d - 27 <= a <= d for a in days[u])
        )
        r = got[day]
        assert (r.dau, r.wau, r.mau) == (dau, wau, mau), (d, r)
        if mau:
            assert r.stickiness == dau / mau


def test_seasonal_anomalies_planted_spike(spark):
    """Noisy trend+profile series with ONE huge planted spike: the
    spike flags with the maximal deviation; rows outside both the
    spike's MA window and its period slot stay quiet (the leak into
    those two neighborhoods is inherent to decomposition, not a bug);
    a clean series (MAD=0 degeneration) flags nothing."""
    from oakstore_spark.operators.timeseries import seasonal_anomalies

    prof = [20, -10, 0, 30, -40]
    rows = []
    for t in range(1, 45):
        noise = (t * 7) % 5 - 2  # small deterministic jitter
        x = 10 * t + prof[(t - 1) % 5] + noise
        if t == 22:
            x += 10_000  # the anomaly
        rows.append(("a", t, x))
    df = spark.createDataFrame(rows, ["k", "t", "x"])
    out = {
        r.rn: r
        for r in seasonal_anomalies(
            df, ["k"], ["t"], "x", period=5, k=3.0
        ).collect()
    }
    flagged = {rn for rn, r in out.items() if r.is_anomaly == 1}
    assert 22 in flagged
    # the spike carries the max |residual - med|
    devs = {rn: abs(r.residual - r.med_resid) for rn, r in out.items()}
    assert max(devs, key=devs.get) == 22
    # rows outside the spike's MA window (|t-22| > 2) AND period slot
    # ((t-1)%5 != 1) must stay quiet
    for rn in flagged:
        assert abs(rn - 22) <= 2 or (rn - 1) % 5 == 1, rn

    # clean series: every residual identical (zero) -> MAD 0 -> no row
    # has dev > 0 -> nothing flags
    clean = spark.createDataFrame(
        [("c", t, 10 * t + prof[(t - 1) % 5]) for t in range(1, 45)],
        ["k", "t", "x"],
    )
    cout = seasonal_anomalies(
        clean, ["k"], ["t"], "x", period=5, k=3.0
    ).collect()
    assert all(r.is_anomaly == 0 for r in cout)


def test_conformal_holt_interval_coverage_and_rank(spark):
    """Marginal coverage on a held-out step: for a family of series,
    the realized next error must fall inside the conformal band at
    >= 1 - miscoverage rate (finite-sample guarantee), and the q_err
    equals the hand-selected type-1 rank of the calibration scores."""
    import math

    from oakstore_spark.operators.timeseries import (
        conformal_holt_interval,
        grouped_holt,
    )

    # 50 keys x 41 points of deterministic bounded-noise series: train
    # on the first 40, hold out point 41
    rows_train, rows_full = [], []
    for kid in range(50):
        for t in range(1, 42):
            x = 1000 + 10 * ((t * 7 + kid * 13) % 11) - 50
            (rows_full if True else None)
            rows_full.append((kid, t, x))
            if t <= 40:
                rows_train.append((kid, t, x))
    train = spark.createDataFrame(rows_train, ["k", "t", "x"])
    full = spark.createDataFrame(rows_full, ["k", "t", "x"])

    iv = {
        r.k: r
        for r in conformal_holt_interval(
            train, "t", ["k"], "x", 0.5, 0.25, miscoverage=0.1
        ).collect()
    }
    assert len(iv) == 50
    # hand-check the rank rule on one key: q_err is the
    # ceil(0.9*(n_cal+1))-th smallest |error| (n_cal=39 -> rank 36)
    h = grouped_holt(
        train.where("k = 0"), "t", ["k"], "x", 0.5, 0.25,
        with_backtest_cols=True,
    ).collect()
    errs = sorted(
        abs(int(r.x) - math.floor(r.prev_forecast + 0.5))
        for r in h
        if r.rn >= 2
    )
    assert iv[0].n_cal == 39
    assert iv[0].q_err == errs[min(math.ceil(0.9 * 40), 39) - 1]

    # coverage: the held-out 41st value vs the band
    actual41 = {
        r.k: r.x for r in full.where("t = 41").collect()
    }
    covered = sum(
        1 for k, r in iv.items() if r.lo <= actual41[k] <= r.hi
    )
    assert covered >= 0.9 * 50 - 3  # finite-sample slack


def test_ar_forecast_recovers_planted_ar2(spark):
    """An exact AR(2) recurrence y_t = m + 1*y_{t-1} - 1*y_{t-2}
    (the period-6 oscillator, affinely transformed per key) has zero
    residual, so the lagged OLS recovers (c, a1, a2) = (m, 1, -1)
    EXACTLY (every Cramer determinant is integer-exact in double) and
    the one-step forecast equals the true next value."""
    from datetime import datetime, timedelta

    from oakstore_spark.operators.timeseries import ar_forecast

    period = [1, 2, 1, -1, -2, -1]
    t0 = datetime(2024, 1, 1)
    rows = []
    for key, m, s in (("u1", 10, 3), ("u2", -4, 7)):
        for t in range(24):
            rows.append(
                (key, t0 + timedelta(hours=t), m + s * period[t % 6])
            )
    df = spark.createDataFrame(rows, ["k", "ts", "y"])
    out = {r.k: r for r in ar_forecast(df, "ts", ["k"], "y").collect()}
    for key, m, s in (("u1", 10, 3), ("u2", -4, 7)):
        r = out[key]
        assert r.n_obs == 22
        assert r.c == float(m)
        assert r.a1 == 1.0 and r.a2 == -1.0
        # true next value: position 24 % 6 = 0 -> p = 1
        assert r.forecast_next == float(m + s * 1)


def test_ar_forecast_degenerate_constant_series_null(spark):
    """A constant series makes the design singular: coefficients and
    the forecast must come back NULL, never an ANSI divide-by-zero;
    a too-short series (n_obs < 3) likewise."""
    from datetime import datetime, timedelta

    from oakstore_spark.operators.timeseries import ar_forecast

    t0 = datetime(2024, 1, 1)
    rows = [("c", t0 + timedelta(hours=t), 5) for t in range(10)]
    rows += [("s", t0 + timedelta(hours=t), t * t) for t in range(4)]
    df = spark.createDataFrame(rows, ["k", "ts", "y"])
    out = {r.k: r for r in ar_forecast(df, "ts", ["k"], "y").collect()}
    assert out["c"].a1 is None and out["c"].forecast_next is None
    assert out["s"].n_obs == 2  # < 3 usable rows -> NULL coefficients
    assert out["s"].a1 is None

    import pytest as _pytest

    with _pytest.raises(ValueError):
        ar_forecast(df, "ts", ["k"], "y", p=3)


def test_ar_forecast_short_keys_still_emit_rows(spark):
    """r12 ADVICE: keys with 1 or 2 observations (zero usable lagged
    rows) must still appear in the output with NULL coefficients —
    callers joining forecasts back per key must not silently lose
    them. x_last/x_prev still carry what IS known."""
    from datetime import datetime, timedelta

    from oakstore_spark.operators.timeseries import ar_forecast

    t0 = datetime(2024, 1, 1)
    rows = [("one", t0, 7)]
    rows += [("two", t0 + timedelta(hours=t), 3 + t) for t in range(2)]
    rows += [("ok", t0 + timedelta(hours=t), t % 3) for t in range(9)]
    df = spark.createDataFrame(rows, ["k", "ts", "y"])
    out = {r.k: r for r in ar_forecast(df, "ts", ["k"], "y").collect()}
    assert set(out) == {"one", "two", "ok"}
    assert out["one"].n_obs == 0
    assert out["one"].a1 is None and out["one"].forecast_next is None
    assert out["one"].x_last == 7 and out["one"].x_prev is None
    assert out["two"].n_obs == 0 and out["two"].c is None
    assert out["two"].x_last == 4 and out["two"].x_prev == 3
    assert out["ok"].n_obs == 7 and out["ok"].a1 is not None


def _np_acf_pacf(xs, max_lag):
    """Driver-side reference: biased-estimator ACF + Durbin–Levinson
    PACF in plain floats, mirroring the operator's algebra."""
    n = len(xs)
    m = sum(xs) / n
    var_n = sum((v - m) ** 2 for v in xs)
    rho = []
    for k in range(1, max_lag + 1):
        num = sum(
            (xs[t] - m) * (xs[t - k] - m) for t in range(k, n)
        )
        rho.append(num / var_n if var_n != 0 else None)
    pacf, phi = [], []
    for k in range(1, max_lag + 1):
        if k == 1:
            kk = rho[0]
        else:
            num = sum(phi[j - 1] * rho[k - 1 - j] for j in range(1, k))
            den = 1.0 - sum(phi[j - 1] * rho[j - 1] for j in range(1, k))
            kk = (rho[k - 1] - num) / den if den != 0 else None
        phi = [
            phi[j - 1] - kk * phi[k - 1 - j] for j in range(1, k)
        ] + [kk]
        pacf.append(kk)
    return rho, pacf


def test_acf_pacf_matches_reference_and_ar2_cutoff(spark):
    """The distributed acf_pacf agrees with a driver-side float
    replica to 1e-9 on an irregular series, and on a planted AR(2)
    (period-6 oscillator) the PACF shows the textbook cutoff: large
    through lag 2, near-zero beyond — the order-selection signal
    ar_forecast needs."""
    from datetime import datetime, timedelta

    from oakstore_spark.operators.timeseries import acf_pacf

    t0 = datetime(2024, 1, 1)
    series = [3, 8, 1, 9, 4, 7, 2, 11, 5, 6, 10, 0, 12, 3, 8]
    rows = [
        ("u", t0 + timedelta(hours=t), v) for t, v in enumerate(series)
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "y"])
    out = {
        r.lag: r
        for r in acf_pacf(df, "ts", ["k"], "y", max_lag=4).collect()
    }
    rho, pacf = _np_acf_pacf([float(v) for v in series], 4)
    for k in range(1, 5):
        assert out[k].n_pairs == len(series) - k
        assert abs(out[k].acf - rho[k - 1]) < 1e-9
        assert abs(out[k].pacf - pacf[k - 1]) < 1e-9

    # a NOISY planted AR(2) (a deterministic oscillator would make
    # lag-2 prediction exact — zero residual variance, PACF past p
    # 0/0): x_t = round(0.6x_{t-1} - 0.3x_{t-2}) + e_t with seeded
    # integer noise, n=2000 so the sampling band is ~1/sqrt(n)=0.022
    import random

    rng = random.Random(42)
    xs = [5, 3]
    for _ in range(2, 2000):
        xs.append(
            round(0.6 * xs[-1] - 0.3 * xs[-2]) + rng.randint(-10, 10)
        )
    rows2 = [
        ("a", t0 + timedelta(minutes=t), v) for t, v in enumerate(xs)
    ]
    df2 = spark.createDataFrame(rows2, ["k", "ts", "y"])
    got = {
        r.lag: r.pacf
        for r in acf_pacf(df2, "ts", ["k"], "y", max_lag=4).collect()
    }
    # AR(2) signature: strong partials through lag 2, cutoff past p
    assert got[1] > 0.35 and got[2] < -0.2
    assert abs(got[3]) < 0.1 and abs(got[4]) < 0.1


def test_acf_pacf_degenerate_guards(spark):
    """Constant series (zero variance) NULLs every acf/pacf; a key
    shorter than the lag NULLs that lag but still emits the row;
    max_lag outside 1..8 raises."""
    from datetime import datetime, timedelta

    import pytest as _pytest

    from oakstore_spark.operators.timeseries import acf_pacf

    t0 = datetime(2024, 1, 1)
    rows = [("c", t0 + timedelta(hours=t), 5) for t in range(10)]
    rows += [("s", t0 + timedelta(hours=t), t + 1) for t in range(3)]
    df = spark.createDataFrame(rows, ["k", "ts", "y"])
    out = {
        (r.k, r.lag): r
        for r in acf_pacf(df, "ts", ["k"], "y", max_lag=4).collect()
    }
    assert len(out) == 8  # both keys emit all 4 lag rows
    assert out[("c", 1)].acf is None and out[("c", 4)].pacf is None
    assert out[("s", 3)].n_pairs == 0 and out[("s", 3)].acf is None
    assert out[("s", 1)].acf is not None
    with _pytest.raises(ValueError):
        acf_pacf(df, "ts", ["k"], "y", max_lag=9)
    with _pytest.raises(ValueError):
        acf_pacf(df, "ts", ["k"], "y", max_lag=0)


def test_ccf_planted_lead_and_degenerates(spark):
    """y_t = x_{t+2} (y LEADS x by 2): the cross-correlation must be
    EXACTLY 1.0 at lag +2 (identical aligned pairs; small values keep
    the denominator square inside 2^53 so sqrt(v*v)==v) and below 1
    elsewhere. A constant-y key NULLs every lag; sign convention
    pinned: positive peak lag == y leads."""
    import random
    from datetime import datetime, timedelta

    from oakstore_spark.operators.timeseries import ccf

    rng = random.Random(3)
    xs = [rng.randint(0, 9) for _ in range(62)]
    t0 = datetime(2024, 1, 1)
    rows = [
        ("u", t0 + timedelta(hours=t), xs[t], xs[t + 2])
        for t in range(60)
    ]
    rows += [
        ("c", t0 + timedelta(hours=t), xs[t], 7) for t in range(20)
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "x", "y"])
    out = {
        (r.k, r.lag): r
        for r in ccf(df, "ts", ["k"], "x", "y", max_lag=3).collect()
    }
    assert len(out) == 14  # both keys x 7 lags
    assert out[("u", 2)].ccf == 1.0
    for k in (-3, -2, -1, 0, 1, 3):
        assert out[("u", k)].ccf is None or abs(out[("u", k)].ccf) < 0.9
    for k in range(-3, 4):
        assert out[("c", k)].ccf is None  # constant side -> NULL
    assert out[("u", 2)].n_pairs == 58

    import pytest as _pytest

    with _pytest.raises(ValueError):
        ccf(df, "ts", ["k"], "x", "y", max_lag=0)


def test_changepoint_planted_shift_and_degenerates(spark):
    """A planted level shift (20 rows at 10, then 30 rows at 50) must
    split exactly at rn=20 with the exact segment means; a constant
    series still picks SOME split (stat 0, shift 0.0, smallest-index
    tie); a 1-row key emits a NULL-split row, never vanishes."""
    from datetime import datetime, timedelta

    from oakstore_spark.operators.timeseries import (
        changepoint_mean_shift,
    )

    t0 = datetime(2024, 1, 1)
    rows = [
        ("u", t0 + timedelta(hours=t), 10 if t < 20 else 50)
        for t in range(50)
    ]
    rows += [("c", t0 + timedelta(hours=t), 7) for t in range(10)]
    rows += [("one", t0, 99)]
    df = spark.createDataFrame(rows, ["k", "ts", "y"])
    out = {
        r.k: r
        for r in changepoint_mean_shift(
            df, "ts", ["k"], "y"
        ).collect()
    }
    assert out["u"].split_rn == 20
    assert out["u"].mean_left == 10.0 and out["u"].mean_right == 50.0
    assert out["u"].shift == 40.0 and out["u"].n_obs == 50
    assert out["c"].stat == 0 and out["c"].shift == 0.0
    assert out["c"].split_rn == 1  # smallest-index tie
    assert out["one"].n_obs == 1 and out["one"].split_rn is None


def test_nelson_aalen_hand_case(spark):
    """Textbook: durations (1,e) (2,c) (3,e) (3,e) (5,c) — H jumps
    1/5 at t=1 and 2/3 at t=3; variance adds d/n^2; exp(-H) stays
    within the KM survival's small-sample neighborhood."""
    from oakstore_spark.operators.experiments import nelson_aalen

    rows = [(1, 1), (2, 0), (3, 1), (3, 1), (5, 0)]
    df = spark.createDataFrame(rows, ["dur", "ev"])
    out = {r.t: r for r in nelson_aalen(df, "dur", "ev").collect()}
    assert out[1].n_risk == 5 and out[1].cum_hazard == 1 / 5
    assert out[2].cum_hazard == 1 / 5  # censoring adds no hazard
    assert out[3].n_risk == 3
    assert abs(out[3].cum_hazard - (1 / 5 + 2 / 3)) < 1e-12
    assert abs(out[3].var_hazard - (1 / 25 + 2 / 9)) < 1e-12
    assert out[5].cum_hazard == out[3].cum_hazard


def test_theil_sen_robust_to_spike_and_guards(spark):
    """A clean line y = 3x + 7 recovers slope/intercept EXACTLY even
    with one wild spike (the OLS slope moves, the median slope does
    not — asserted against regr-style moments); duplicate-x pairs are
    skipped; n<2 and over-cap keys read NULL."""
    from oakstore_spark.operators.timeseries import theil_sen_trend

    rows = [("u", float(t), 3.0 * t + 7.0) for t in range(20)]
    rows[10] = ("u", 10.0, 10_000.0)  # one spike
    rows += [("one", 1.0, 5.0)]
    rows += [("dup", 1.0, 1.0), ("dup", 1.0, 9.0), ("dup", 2.0, 4.0)]
    df = spark.createDataFrame(rows, ["k", "x", "y"])
    out = {
        r.k: r
        for r in theil_sen_trend(df, "x", ["k"], "y").collect()
    }
    assert out["u"].slope == 3.0 and out["u"].intercept == 7.0
    assert out["u"].n_obs == 20 and out["u"].n_pairs == 190
    # OLS on the same data is dragged far from 3 by the spike
    n, sx = 20, sum(t for t in range(20))
    ys = [3.0 * t + 7.0 for t in range(20)]
    ys[10] = 10_000.0
    sxy = sum(t * ys[t] for t in range(20))
    sxx = sum(t * t for t in range(20))
    ols = (n * sxy - sx * sum(ys)) / (n * sxx - sx * sx)
    assert abs(ols - 3.0) > 5.0
    assert out["one"].slope is None and out["one"].n_obs == 1
    assert out["dup"].n_pairs == 2  # the equal-x pair is skipped
    cap = {
        r.k: r
        for r in theil_sen_trend(
            df, "x", ["k"], "y", max_points=10
        ).collect()
    }
    assert cap["u"].slope is None  # 20 points > cap -> NULL


def test_kendall_tau_closed_forms(spark):
    """Perfect concordance -> tau_b exactly 1.0, perfect discordance
    -> -1.0; a constant column -> NULL (fully tied); hand-checked
    tie case matches the tau-b formula."""
    from oakstore_spark.operators.timeseries import kendall_tau

    rows = [("up", float(i), float(i * i)) for i in range(10)]
    rows += [("dn", float(i), float(-3 * i)) for i in range(10)]
    rows += [("c", float(i), 7.0) for i in range(10)]
    # tie case: x = 1,1,2; y = 1,2,3 -> S = 2 (two concordant, one
    # x-tie zero), n0 = 3, tx = 1, ty = 0 -> tau = 2/sqrt(2*3)
    rows += [("t", 1.0, 1.0), ("t", 1.0, 2.0), ("t", 2.0, 3.0)]
    df = spark.createDataFrame(rows, ["k", "x", "y"])
    out = {
        r.k: r for r in kendall_tau(df, ["k"], "x", "y").collect()
    }
    assert out["up"].tau_b == 1.0 and out["up"].s_stat == 45
    assert out["dn"].tau_b == -1.0
    assert out["c"].tau_b is None
    import math

    assert abs(out["t"].tau_b - 2 / math.sqrt(6)) < 1e-12


def test_mcnemar_hand_case(spark):
    """Hand 2x2: 6 one-to-zero flips vs 2 zero-to-one flips ->
    chi2 = (|6-2|-1)^2/8 = 1.125 exactly; concordant-only data reads
    NULL (no information in agreements)."""
    from oakstore_spark.operators.experiments import mcnemar_test

    rows = (
        [(1, 1)] * 10 + [(0, 0)] * 10 + [(1, 0)] * 6 + [(0, 1)] * 2
    )
    df = spark.createDataFrame(rows, ["b", "a"])
    r = mcnemar_test(df, "b", "a").collect()[0]
    assert (r.n00, r.n01, r.n10, r.n11) == (10, 2, 6, 10)
    assert r.chi2 == 1.125
    agree = spark.createDataFrame([(1, 1), (0, 0)], ["b", "a"])
    assert mcnemar_test(agree, "b", "a").collect()[0].chi2 is None


def test_mann_kendall_closed_forms(spark):
    """Strictly increasing y over n=10 points -> S exactly
    n(n-1)/2 = 45 with z > 2; a constant series -> S = 0 and the tie
    term kills the variance (NULL z); a pure alternation -> |S| <= 1;
    spikes do not flip a monotone verdict (distribution-free)."""
    from datetime import datetime, timedelta

    from oakstore_spark.operators.timeseries import mann_kendall_trend

    t0 = datetime(2024, 1, 1)
    rows = [("up", t0 + timedelta(hours=t), float(t * t)) for t in range(10)]
    rows += [("c", t0 + timedelta(hours=t), 5.0) for t in range(10)]
    rows += [
        ("alt", t0 + timedelta(hours=t), float(t % 2)) for t in range(10)
    ]
    spiky = [float(t) for t in range(20)]
    spiky[7] = 1e6  # one spike, still 18 of 19 upward steps
    rows += [
        ("sp", t0 + timedelta(hours=t), v) for t, v in enumerate(spiky)
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "y"])
    xs = df.select(
        "k", F.unix_micros("ts").cast("double").alias("x"), "y"
    )
    out = {
        r.k: r
        for r in mann_kendall_trend(xs, "x", ["k"], "y").collect()
    }
    assert out["up"].s_stat == 45 and out["up"].z > 2.0
    assert out["up"].var_s_x18 == 10 * 9 * 25
    assert out["c"].s_stat == 0 and out["c"].z is None
    assert abs(out["alt"].s_stat) <= 5
    assert out["sp"].z > 3.0  # spike cannot flip the verdict


def test_rmst_hand_case_and_horizon(spark):
    """Hand-checked KM area: durations (2,e)(4,e)(6,c) give S=2/3 on
    [2,4) and S=1/3 on [4,6); RMST(6) = 2 + 2*(2/3) + 2*(1/3) = 4;
    truncating at tau=3 gives 2 + 1*(2/3) = 8/3; tau beyond the last
    time adds nothing (the curve is only defined to its last step,
    integrated flat to tau: RMST(10) = 4 + 4*(1/3))."""
    from oakstore_spark.operators.experiments import rmst

    rows = [(2, 1), (4, 1), (6, 0)]
    df = spark.createDataFrame(rows, ["dur", "ev"])
    r6 = rmst(df, "dur", "ev", tau=6.0).collect()[0]
    assert abs(r6.rmst - 4.0) < 1e-12 and r6.n_times == 3
    r3 = rmst(df, "dur", "ev", tau=3.0).collect()[0]
    assert abs(r3.rmst - 8 / 3) < 1e-12
    r10 = rmst(df, "dur", "ev", tau=10.0).collect()[0]
    assert abs(r10.rmst - (4.0 + 4 * (1 / 3))) < 1e-12


def test_hampel_filter_planted_spikes_and_regime_change(spark):
    """Planted spikes in a flat-noise series are flagged and replaced
    by the local median; the SAME spike magnitude after a big level
    shift is STILL caught (local scale — a global z-score would be
    masked by the regime variance); normal points pass through
    unchanged; a constant window flags any deviation (sigma 0)."""
    from datetime import datetime, timedelta

    from oakstore_spark.operators.timeseries import hampel_filter

    t0 = datetime(2024, 1, 1)
    vals = []
    for t in range(120):
        base = 10.0 if t < 60 else 1000.0  # regime change at 60
        v = base + (t % 5 - 2) * 0.5  # small local noise
        if t in (30, 90):
            v = base + 50.0  # planted spikes in both regimes
        vals.append(v)
    rows = [("u", t0 + timedelta(hours=t), v) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["k", "ts", "y"])
    out = hampel_filter(
        df, "ts", ["k"], "y", half_window=6, k=3.0
    ).collect()
    by_t = {i: r for i, r in enumerate(
        sorted(out, key=lambda r: r.ts)
    )}
    assert by_t[30].is_outlier and by_t[90].is_outlier
    assert abs(by_t[30].cleaned - by_t[30].med) < 1e-12
    flagged = [i for i, r in by_t.items() if r.is_outlier]
    # only the two spikes (regime-boundary rows keep local medians on
    # their own side thanks to the median's 50% breakdown)
    assert 30 in flagged and 90 in flagged
    assert all(i in (30, 90) or 54 <= i <= 66 for i in flagged)
    assert not by_t[10].is_outlier and by_t[10].cleaned == vals[10]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        hampel_filter(df, "ts", ["k"], "y", half_window=0)


def test_periodogram_planted_sinusoid(spark):
    """A pure integer-rounded cosine at period 8 over whole cycles
    concentrates ~all variance at period 8 (power_ratio ≈ 1) and
    nearly none at the non-harmonic period 5; a constant key NULLs;
    period validation raises."""
    from datetime import datetime, timedelta

    import pytest as _pytest

    from oakstore_spark.operators.timeseries import periodogram

    t0 = datetime(2024, 1, 1)
    rows = [
        (
            "u",
            t0 + timedelta(hours=t),
            100 + round(50 * math.cos(2 * math.pi * t / 8)),
        )
        for t in range(64)
    ]
    rows += [("c", t0 + timedelta(hours=t), 7) for t in range(20)]
    df = spark.createDataFrame(rows, ["k", "ts", "y"])
    out = {
        (r.k, r.period): r
        for r in periodogram(
            df, "ts", ["k"], "y", periods=[5, 8]
        ).collect()
    }
    assert out[("u", 8)].power_ratio > 0.95
    assert out[("u", 5)].power_ratio < 0.2
    assert out[("u", 8)].n_obs == 64
    assert out[("c", 8)].power_ratio is None  # zero variance
    with _pytest.raises(ValueError):
        periodogram(df, "ts", ["k"], "y", periods=[1])
    with _pytest.raises(ValueError):
        periodogram(df, "ts", ["k"], "y", periods=[])


def test_backtest_forecasts_metrics_and_mase(spark):
    """Hand-checked metric block: a perfect forecast scores 0 on
    every error metric (mase 0.0); a forecast identical to the naive
    baseline scores mase exactly 1.0; sums are exact integers."""
    from oakstore_spark.operators.timeseries import backtest_forecasts

    rows = [
        ("k", 10, 10, 8),
        ("k", 12, 12, 10),
        ("k", 9, 9, 12),
    ]
    df = spark.createDataFrame(rows, ["k", "actual", "forecast", "naive"])
    r = backtest_forecasts(
        df, ["k"], "actual", "forecast", naive_col="naive"
    ).collect()[0]
    assert r.mae == 0.0 and r.mase == 0.0 and r.mean_err == 0.0

    rows2 = [("k", 10, 8, 8), ("k", 12, 10, 10), ("k", 9, 12, 12)]
    df2 = spark.createDataFrame(rows2, ["k", "actual", "forecast", "naive"])
    r2 = backtest_forecasts(
        df2, ["k"], "actual", "forecast", naive_col="naive"
    ).collect()[0]
    assert r2.mase == 1.0  # forecast == naive -> exactly baseline
    assert r2.mae == (2 + 2 + 3) / 3
    # without a naive column the metric set is the backtest_holt one
    r3 = backtest_forecasts(df2, ["k"], "actual", "forecast").collect()[0]
    assert "mase" not in r3.asDict()


def test_pair_sweep_arrow_sql_parity_and_overcap_guard(spark):
    """r14: the pair-sweep family's default Arrow/numpy kernel must be
    BIT-IDENTICAL to the SQL HOF path on the same data (slopes,
    medians, integer S statistics), including ties, equal-x pairs,
    n=1 keys and an over-cap key — and the over-cap key must read
    NULL from BOTH paths (its array is never materialized: the
    _bounded_xy count guard collects an empty array for it)."""
    import random

    from oakstore_spark.operators.timeseries import (
        kendall_tau,
        mann_kendall_trend,
        theil_sen_trend,
    )

    rng = random.Random(14)
    rows = []
    for k, n in [("a", 37), ("b", 1), ("c", 61), ("big", 40)]:
        for i in range(n):
            # integer-ish values force ties; repeat x sometimes
            x = float(i if rng.random() > 0.2 else max(0, i - 1))
            y = float(rng.randrange(0, 9)) + (0.5 * i if k == "a" else 0.0)
            rows.append((k, x, y))
    df = spark.createDataFrame(rows, ["k", "x", "y"])
    cap = 39  # "big" (40 points) is over the cap
    a = theil_sen_trend(df, "x", ["k"], "y", max_points=cap,
                        engine="arrow").orderBy("k").collect()
    s = theil_sen_trend(df, "x", ["k"], "y", max_points=cap,
                        engine="sql").orderBy("k").collect()
    assert a == s
    big = [r for r in a if r.k == "big"][0]
    assert big.n_obs == 40 and big.slope is None and big.n_pairs is None
    a = mann_kendall_trend(df, "x", ["k"], "y", max_points=cap,
                           engine="arrow").orderBy("k").collect()
    s = mann_kendall_trend(df, "x", ["k"], "y", max_points=cap,
                           engine="sql").orderBy("k").collect()
    assert a == s
    assert [r for r in a if r.k == "big"][0].s_stat is None
    a = kendall_tau(df, ["k"], "x", "y", max_points=cap,
                    engine="arrow").orderBy("k").collect()
    s = kendall_tau(df, ["k"], "x", "y", max_points=cap,
                    engine="sql").orderBy("k").collect()
    assert a == s
    assert [r for r in a if r.k == "big"][0].tau_b is None
    with pytest.raises(ValueError):
        theil_sen_trend(df, "x", ["k"], "y", engine="nope")


def test_ar_fit_forecast_planted_ar3_and_python_replay(spark):
    """r14 (r13 verdict ask #2): generic AR(p) via Yule-Walker.
    (1) BIT-EXACT python replay: the same BIGINT moments + the same
    durbin_levinson_full algebra over plain python floats must equal
    the Spark output exactly — the two chains are one generated
    expression. (2) Planted recovery: a long AR(3) series with planted
    (0.5, -0.4, 0.25) fits phi within a loose statistical tolerance,
    and p outside 1..8 raises."""
    from datetime import datetime, timedelta

    from oakstore_spark.operators.timeseries import (
        ar_fit_forecast,
        durbin_levinson_full,
    )

    # planted AR(3), deterministic LCG noise, integer-rounded values
    phi_true = (0.5, -0.4, 0.25)
    seed = 123456789
    xs = [100.0, 102.0, 98.0]
    vals = [round(x) for x in xs]
    for t in range(3, 600):
        seed = (1103515245 * seed + 12345) % (2**31)
        eps = (seed / 2**31 - 0.5) * 8.0
        nxt = (
            100.0 * (1 - sum(phi_true))
            + phi_true[0] * vals[-1]
            + phi_true[1] * vals[-2]
            + phi_true[2] * vals[-3]
            + eps
        )
        vals.append(round(nxt))
    t0 = datetime(2024, 1, 1)
    rows = [
        ("u", t0 + timedelta(minutes=i), int(v))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "y"])
    out = ar_fit_forecast(df, "ts", ["k"], "y", p=3).collect()[0]
    assert abs(out.phi1 - 0.5) < 0.15
    assert abs(out.phi2 + 0.4) < 0.15
    assert abs(out.phi3 - 0.25) < 0.15
    # --- python replay of the identical pinned chain ---
    n = len(vals)
    s = sum(vals)
    q = sum(v * v for v in vals)
    m = float(s) / n
    var_n = float(q) - float(n) * m * m
    rho = []
    for k in range(1, 4):
        ck = sum(vals[t] * vals[t - k] for t in range(k, n))
        ak = sum(vals[t] for t in range(k, n))
        bk = sum(vals[t - k] for t in range(k, n))
        nk = n - k
        num = float(ck) - m * float(ak + bk) + float(nk) * m * m
        rho.append(num / var_n if var_n != 0 else None)
    _, phi = durbin_levinson_full(
        rho,
        add=lambda a, b: a + b,
        sub=lambda a, b: a - b,
        mul=lambda a, b: a * b,
        div=lambda a, b: a / b if b != 0 else None,
        one=1.0,
    )
    c = m * (1.0 - ((phi[0] + phi[1]) + phi[2]))
    fc = c
    for j in range(1, 4):
        fc = fc + phi[j - 1] * float(vals[n - j])
    assert out.mean == m and out.n_obs == n - 3
    assert (out.phi1, out.phi2, out.phi3) == tuple(phi)
    assert out.c == c and out.forecast_next == fc

    import pytest as _pytest

    with _pytest.raises(ValueError):
        ar_fit_forecast(df, "ts", ["k"], "y", p=9)
    with _pytest.raises(ValueError):
        ar_fit_forecast(df, "ts", ["k"], "y", p=0)


def test_ar_insample_forecasts_backtest_wiring(spark):
    """r14: ar_insample_forecasts feeds backtest_forecasts — on a
    strongly anti-persistent series (alternating +/-) the AR model
    crushes the naive random-walk baseline (MASE << 1), and each
    row's forecast equals c + sum(phi_j * lag_j) replayed from the
    fit exactly."""
    from datetime import datetime, timedelta

    from oakstore_spark.operators.timeseries import (
        ar_fit_forecast,
        ar_insample_forecasts,
        backtest_forecasts,
    )

    t0 = datetime(2024, 1, 1)
    rows = [
        ("a", t0 + timedelta(hours=i), 50 + (25 if i % 2 == 0 else -25))
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "y"])
    ins = ar_insample_forecasts(df, "ts", ["k"], "y", p=2)
    got = ins.orderBy("ts").collect()
    assert len(got) == 78  # first p rows have no full lag window
    fit = ar_fit_forecast(df, "ts", ["k"], "y", p=2).collect()[0]
    by_ts = {r.ts: r for r in got}
    vals = {t0 + timedelta(hours=i): 50 + (25 if i % 2 == 0 else -25)
            for i in range(80)}
    for r in got[:5]:
        l1 = vals[r.ts - timedelta(hours=1)]
        l2 = vals[r.ts - timedelta(hours=2)]
        assert r.forecast == fit.c + fit.phi1 * l1 + fit.phi2 * l2
        assert r.naive == float(l1)
    bt = backtest_forecasts(
        ins, ["k"], "actual", "forecast", naive_col="naive"
    ).collect()[0]
    assert bt.mase < 0.2  # AR(2) nails the oscillation, naive cannot


def test_detect_period_fundamental_beats_multiples_and_floor(spark):
    """r14 (r13 verdict ask #10): detection picks the FUNDAMENTAL (a
    p-periodic signal has zero spectral mass at frequency 1/(k*p), so
    multiples lose structurally, not by tie-break); flat/noise keys
    below the power floor read NULL period; auto_seasonal_profile
    excludes them and reproduces the planted seasonal offsets;
    auto_decompose runs each key at its own detected period."""
    from datetime import datetime, timedelta

    from oakstore_spark.operators.timeseries import (
        auto_decompose,
        auto_seasonal_profile,
        detect_period,
    )

    t0 = datetime(2024, 1, 1)
    pats = {"a": (4, [30, 0, -10, 10]), "b": (6, [25, 10, -5, -20, -10, 0])}
    rows = []
    for k, (p, pat) in pats.items():
        for t in range(48):
            rows.append((k, t0 + timedelta(hours=t), 100 + pat[t % p]))
    rows += [("flat", t0 + timedelta(hours=t), 100) for t in range(48)]
    df = spark.createDataFrame(rows, ["k", "ts", "x"])
    det = {
        r.k: r
        for r in detect_period(
            df, "ts", ["k"], "x", [4, 6, 8, 12]
        ).collect()
    }
    assert det["a"].period == 4 and det["b"].period == 6
    assert det["flat"].period is None
    assert det["a"].power_ratio > 0.9
    prof = auto_seasonal_profile(
        df, "ts", ["k"], "x", [4, 6, 8, 12]
    ).collect()
    assert {r.k for r in prof} == {"a", "b"}
    # planted seasonal offsets recovered exactly: pattern - pattern
    # mean (whole cycles, so phase means are exact)
    a = sorted(
        [(r.phase, r.seasonal) for r in prof if r.k == "a"]
    )
    pat = [30, 0, -10, 10]
    mean = sum(pat) / 4.0
    assert a == [(i, pat[i] - mean) for i in range(4)]
    dec = auto_decompose(df, "ts", ["k"], "x", [4, 6, 8, 12])
    got = {
        (r.k, r.period) for r in dec.select("k", "period").distinct().collect()
    }
    assert got == {("a", 4), ("b", 6)}
    # empty detection set: a corpus of flats produces zero rows
    flat_only = df.where(F.col("k") == "flat")
    empty = auto_decompose(flat_only, "ts", ["k"], "x", [4, 6])
    assert empty.count() == 0


def test_cox_ph_planted_hazard_ratio_and_guards(spark):
    """r14: Cox PH (Breslow, fixed Newton rounds). A planted
    exponential-survival corpus with true log-hazard-ratio beta=0.7
    per covariate unit recovers beta within a loose statistical
    tolerance despite ~30% censoring; a constant covariate reads NULL
    (degenerate information); the max_cells guard raises from a
    counted probe."""
    import math
    import random

    import pytest as _pytest

    from oakstore_spark.operators.experiments import cox_ph

    rng = random.Random(99)
    beta_true = 0.7
    rows = []
    for i in range(3000):
        x = i % 3  # covariate 0/1/2
        lam = 0.02 * math.exp(beta_true * x)
        dur = -math.log(1.0 - rng.random()) / lam
        cens = 60.0 * rng.random() + 20.0
        ev = 1 if dur <= cens else 0
        t = int(min(dur, cens)) + 1
        rows.append((t, ev, x))
    df = spark.createDataFrame(rows, ["dur", "ev", "x"])
    out = cox_ph(df, "dur", "ev", "x", n_iter=5).collect()[0]
    assert abs(out.beta - beta_true) < 0.12
    assert abs(out.u_final) < 1e-6  # converged
    assert out.se < 0.06
    assert out.n_subjects == 3000
    const = df.select("dur", "ev", F.lit(1).alias("x"))
    o2 = cox_ph(const, "dur", "ev", "x").collect()[0]
    assert o2.beta is None and o2.se is None
    with _pytest.raises(ValueError, match="max_cells"):
        cox_ph(df, "dur", "ev", "x", max_cells=10)


def test_aalen_johansen_hand_case_and_km_identity(spark):
    """r14: competing-risks cumulative incidence. Hand case (6
    subjects, two causes, one censor) matches the textbook table
    exactly; CIFs + survival partition probability (sum to 1 at times
    with no prior censoring); with a SINGLE cause and no censoring
    cif_1 == 1 - KM survival; cause 0 in the causes list raises."""
    import pytest as _pytest

    from oakstore_spark.operators.experiments import (
        aalen_johansen,
        kaplan_meier,
    )

    df = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 0), (4, 1), (5, 2), (6, 1)],
        ["dur", "cause"],
    )
    out = {r.t: r for r in aalen_johansen(df, "dur", "cause", [1, 2]).collect()}
    assert out[1].survival == 1 - 1 / 6 and out[1].cif_1 == 1 / 6
    assert out[2].cif_2 == (5 / 6) * (1 / 5)
    # after the censor at t=3 the risk set is 3: CIF_1 jumps by S(3)*1/3
    assert abs(out[4].cif_1 - (1 / 6 + out[3].survival / 3)) < 1e-15
    assert out[6].survival == 0.0
    assert abs(out[2].cif_1 + out[2].cif_2 + out[2].survival - 1.0) < 1e-15
    rows2 = [(i % 5 + 1, 1) for i in range(20)]
    df2 = spark.createDataFrame(rows2, ["dur", "cause"])
    aj = {r.t: r for r in aalen_johansen(df2, "dur", "cause", [1]).collect()}
    km = {r.t: r for r in kaplan_meier(df2, "dur", "cause").collect()}
    assert all(
        abs(aj[t].cif_1 - (1.0 - km[t].survival)) < 1e-12 for t in aj
    )
    with _pytest.raises(ValueError):
        aalen_johansen(df, "dur", "cause", [0, 1])
    with _pytest.raises(ValueError):
        aalen_johansen(df, "dur", "cause", [])


def test_cox_ph2_adjusted_recovery_and_degenerate(spark):
    """r14: two-covariate Cox. A planted corpus with independent
    covariates x1 (log-HR 0.6) and x2 (log-HR -0.4) recovers BOTH
    within tolerance; a duplicated covariate (x2 == x1) makes the
    information singular -> NULL; the single-covariate fit on the
    same data agrees with cox_ph when the second covariate is
    constant... (constant x2 is ALSO singular, pinned NULL)."""
    import math
    import random

    from oakstore_spark.operators.experiments import cox_ph2

    rng = random.Random(7)
    rows = []
    for i in range(4000):
        x1 = i % 3
        x2 = (i // 3) % 2
        lam = 0.02 * math.exp(0.6 * x1 - 0.4 * x2)
        dur = -math.log(1.0 - rng.random()) / lam
        cens = 70.0 * rng.random() + 15.0
        ev = 1 if dur <= cens else 0
        rows.append((int(min(dur, cens)) + 1, ev, x1, x2))
    df = spark.createDataFrame(rows, ["dur", "ev", "x1", "x2"])
    out = cox_ph2(df, "dur", "ev", "x1", "x2", n_iter=5).collect()[0]
    assert abs(out.beta1 - 0.6) < 0.12
    assert abs(out.beta2 + 0.4) < 0.12
    assert abs(out.u1_final) < 1e-6 and abs(out.u2_final) < 1e-6
    assert out.se1 < 0.06 and out.se2 < 0.08
    dup = df.select("dur", "ev", "x1", F.col("x1").alias("x2"))
    o2 = cox_ph2(dup, "dur", "ev", "x1", "x2").collect()[0]
    assert o2.beta1 is None  # singular information
    const = df.select("dur", "ev", "x1", F.lit(2).alias("x2"))
    o3 = cox_ph2(const, "dur", "ev", "x1", "x2").collect()[0]
    assert o3.beta1 is None


def test_grouped_km_equals_per_arm_global(spark):
    """r14: grouped_kaplan_meier per arm must equal kaplan_meier run
    on each arm's subset EXACTLY (same chain, keyed windows), and the
    d=n zero pin holds per key independently."""
    from oakstore_spark.operators.experiments import (
        grouped_kaplan_meier,
        kaplan_meier,
    )

    rows = []
    for i in range(60):
        arm = i % 2
        dur = (i % 7) + 1 + arm
        ev = 1 if (i % 3) else 0
        rows.append((arm, dur, ev))
    rows.append((0, 99, 1))  # lone terminal event: factor hits 0
    df = spark.createDataFrame(rows, ["arm", "dur", "ev"])
    grouped = {
        (r.arm, r.t): r
        for r in grouped_kaplan_meier(df, ["arm"], "dur", "ev").collect()
    }
    for arm in (0, 1):
        solo = {
            r.t: r
            for r in kaplan_meier(
                df.where(F.col("arm") == arm), "dur", "ev"
            ).collect()
        }
        assert set(solo) == {t for a, t in grouped if a == arm}
        for t, r in solo.items():
            g = grouped[(arm, t)]
            assert (g.n_risk, g.n_events, g.n_censored) == (
                r.n_risk, r.n_events, r.n_censored
            )
            assert g.survival == r.survival
    assert grouped[(0, 99)].survival == 0.0  # the zero pin, per key


def test_cox_ph_stratified_recovery_and_single_stratum_identity(spark):
    """r15 (r14 verdict ask #4): stratified Cox. (1) Two strata with
    VERY different baseline hazards (10x) but the same true effect
    beta=0.6 recover the shared beta — while the UNstratified fit on
    the same corpus is biased by the baseline/covariate confound we
    plant (high-x subjects concentrated in the high-hazard stratum).
    (2) With one stratum the fit equals cox_ph BIT-FOR-BIT. (3)
    Degenerate (constant covariate) reads NULL; max_cells guard."""
    import math
    import random

    import pytest as _pytest

    from oakstore_spark.operators.experiments import (
        cox_ph,
        cox_ph_stratified,
    )

    rng = random.Random(7)
    beta_true = 0.6
    rows = []
    for i in range(4000):
        g = i % 2
        # confound: stratum 1 (10x baseline hazard) gets 3x more x=2
        x = (i // 2) % 3 if g == 0 else (2 if i % 3 else 0)
        lam = (0.004 if g == 0 else 0.04) * math.exp(beta_true * x)
        dur = -math.log(1.0 - rng.random()) / lam
        cens = 220.0 * rng.random() + 30.0
        ev = 1 if dur <= cens else 0
        t = int(min(dur, cens)) + 1
        rows.append((t, ev, x, g))
    df = spark.createDataFrame(rows, ["dur", "ev", "x", "g"])
    strat = cox_ph_stratified(
        df, "dur", "ev", "x", "g", n_iter=6
    ).collect()[0]
    assert strat.n_strata == 2
    assert abs(strat.beta - beta_true) < 0.12
    assert abs(strat.u_final) < 1e-6
    pooled = cox_ph(df, "dur", "ev", "x", n_iter=6).collect()[0]
    # the pooled fit absorbs the baseline difference into beta:
    # strictly worse than the stratified estimate on this corpus
    assert abs(pooled.beta - beta_true) > abs(strat.beta - beta_true)

    # single stratum: identical floats to cox_ph (same fold orders)
    one = df.select("dur", "ev", "x", F.lit(0).alias("g"))
    s1 = cox_ph_stratified(one, "dur", "ev", "x", "g", n_iter=3).collect()[0]
    p1 = cox_ph(df, "dur", "ev", "x", n_iter=3).collect()[0]
    assert (s1.beta, s1.u_final, s1.info_final, s1.se) == (
        p1.beta, p1.u_final, p1.info_final, p1.se
    )

    const = df.select("dur", "ev", F.lit(1).alias("x"), "g")
    o2 = cox_ph_stratified(const, "dur", "ev", "x", "g").collect()[0]
    assert o2.beta is None and o2.se is None
    with _pytest.raises(ValueError, match="max_cells"):
        cox_ph_stratified(df, "dur", "ev", "x", "g", max_cells=10)


def test_logrank_stratified_pools_and_deconfounds(spark):
    """r15: stratified log-rank. (1) single stratum == plain
    logrank_test bit-for-bit; (2) a stratum-confounded corpus (arms
    imbalanced across strata with 10x baseline difference, NO true
    effect) rejects under the POOLED test but not the stratified one;
    (3) a true shared effect still rejects stratified."""
    import math
    import random

    from oakstore_spark.operators.experiments import (
        logrank_test,
        logrank_test_stratified,
    )

    rng = random.Random(21)

    def corpus(effect_hr: float, confound: bool):
        rows = []
        for i in range(3000):
            g = i % 2
            # confounded: arm 0 lives mostly in the low-hazard
            # stratum, arm 1 in the high-hazard one
            if confound:
                arm = 0 if (rng.random() < (0.8 if g == 0 else 0.2)) else 1
            else:
                arm = i // 1500
            lam = (0.005 if g == 0 else 0.05) * (
                effect_hr if arm == 1 else 1.0
            )
            dur = -math.log(1.0 - rng.random()) / lam
            cens = 300.0 * rng.random() + 30.0
            ev = 1 if dur <= cens else 0
            rows.append((arm, int(min(dur, cens)) + 1, ev, g))
        return spark.createDataFrame(
            rows, "arm long, dur long, ev long, g long"
        )

    # (1) single stratum bit-parity
    d = corpus(1.0, confound=False).withColumn("g", F.lit(0))
    s1 = logrank_test_stratified(d, "arm", "dur", "ev", 0, 1, "g").collect()[0]
    p1 = logrank_test(d, "arm", "dur", "ev", 0, 1).collect()[0]
    assert (s1.o_a, s1.e_a, s1.var_sum, s1.chi2) == (
        p1.o_a, p1.e_a, p1.var_sum, p1.chi2
    )
    assert s1.n_strata == 1

    # (2) pure confound: pooled fires, stratified does not
    dc = corpus(1.0, confound=True)
    pooled = logrank_test(dc, "arm", "dur", "ev", 0, 1).collect()[0]
    strat = logrank_test_stratified(
        dc, "arm", "dur", "ev", 0, 1, "g"
    ).collect()[0]
    assert pooled.chi2 > 10.0       # baseline imbalance masquerades
    # stratification removes the confound (order-of-magnitude drop;
    # residual chi2 is null-distribution noise)
    assert strat.chi2 < 6.0 and strat.chi2 < pooled.chi2 / 5.0
    assert strat.n_strata == 2

    # (3) true shared effect HR=1.8 still detected stratified
    de = corpus(1.8, confound=True)
    se = logrank_test_stratified(
        de, "arm", "dur", "ev", 0, 1, "g"
    ).collect()[0]
    assert se.chi2 > 10.0
