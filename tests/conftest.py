"""Shared fixtures: one SparkSession per test run, synthetic OHLCV data.

Mirrors the reference's test shape (tests/test_store.py:19-32: session
data fixture + fresh temp-dir store per test) but replaces the yfinance
network download with a deterministic generator (FIXTURES.md F1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from oakstore_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("oakstore_spark_tests")
    s.sparkContext.setLogLevel("WARN")
    yield s


@pytest.fixture(scope="session")
def ohlcv_data() -> pd.DataFrame:
    """Deterministic business-daily OHLCV history, ~9k rows (the shape of
    the reference's MSFT period='max' fixture, README.md:25-35)."""
    rng = np.random.default_rng(42)
    dates = pd.bdate_range("1986-03-13", periods=9155)
    n = len(dates)
    close = 20.0 * np.exp(np.cumsum(rng.normal(0.0002, 0.02, n)))
    opn = close * (1 + rng.normal(0, 0.005, n))
    high = np.maximum(opn, close) * (1 + np.abs(rng.normal(0, 0.004, n)))
    low = np.minimum(opn, close) * (1 - np.abs(rng.normal(0, 0.004, n)))
    volume = rng.integers(1_000, 50_000_000, n)
    return pd.DataFrame(
        {"Open": opn, "High": high, "Low": low, "Close": close, "Volume": volume},
        index=pd.DatetimeIndex(dates, name="Date"),
    )


@pytest.fixture
def store(tmp_path, spark):
    from oakstore_spark import Store

    return Store(base_path=tmp_path / "data", spark=spark)
