#!/usr/bin/env python
"""Quickstart: the oakstore-compatible store surface on Spark.

Run: python examples/quickstart_store.py
(uses a temp directory; prints the queried slice)
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from oakstore_spark import Store  # noqa: E402


def main() -> None:
    with tempfile.TemporaryDirectory() as base:
        store = Store(base_path=base, commit_protocol="manifest")  # OHLCV schema, DATE index

        idx = pd.date_range("2023-01-01", periods=365, freq="D")
        rng = np.random.default_rng(0)
        close = 100 + rng.normal(0, 1, len(idx)).cumsum()
        df = pd.DataFrame(
            {
                "Open": close + 0.1,
                "High": close + 0.5,
                "Low": close - 0.5,
                "Close": close,
                "Volume": rng.integers(1_000, 9_999, len(idx)),
            },
            index=idx,
        )

        store["DEMO"] = df                      # create (errors if exists)
        store["DEMO"] += df.iloc[-30:] * 1.01   # append; old rows win dedup

        sl = store["DEMO"][pd.Timestamp("2023-06-01"):pd.Timestamp("2023-06-07")]
        print(sl)                               # inclusive range, 7 rows

        candles = store["DEMO"].resample("month")   # engine-side OHLCV rollup
        print(candles.limit(3).toPandas())

        print("commit history:", store.history("DEMO"))
        print("row count at v1:", store.snapshot("DEMO", 1).count())


if __name__ == "__main__":
    main()
