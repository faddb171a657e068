"""Property-based tests (hypothesis) for the append/dedup invariants
pinned in SURVEY.md §4/§5: append is idempotent, old data wins on date
collisions, dates are unique after any append sequence, and append
equals a set-union on dates."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oakstore_spark import Store


def _frame(dates: list[int], seed: int) -> pd.DataFrame:
    """Deterministic OHLCV frame on day offsets from 2020-01-01."""
    rng = np.random.RandomState(seed)
    idx = pd.DatetimeIndex(
        [pd.Timestamp("2020-01-01") + pd.Timedelta(days=d) for d in sorted(set(dates))]
    )
    n = len(idx)
    return pd.DataFrame(
        {
            "Open": rng.rand(n).round(4),
            "High": rng.rand(n).round(4),
            "Low": rng.rand(n).round(4),
            "Close": rng.rand(n).round(4),
            "Volume": rng.randint(0, 1000, n),
        },
        index=idx,
    )


day_sets = st.lists(st.integers(min_value=0, max_value=800), min_size=1, max_size=25)


@pytest.fixture(scope="module")
def pstore(tmp_path_factory, spark):
    # one store per module; each example uses a fresh key
    return Store(base_path=tmp_path_factory.mktemp("prop") / "data", spark=spark)


_counter = [0]


def _fresh_key() -> str:
    _counter[0] += 1
    return f"PROP{_counter[0]}"


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(base=day_sets, extra=day_sets)
def test_append_union_and_old_wins(pstore, base, extra):
    key = _fresh_key()
    df_a = _frame(base, seed=1)
    df_b = _frame(extra, seed=2)
    pstore[key] = df_a
    pstore[key] += df_b
    out = pstore[key][:]

    # dates are unique and equal the union
    expect_dates = set(df_a.index) | set(df_b.index)
    assert not out.index.duplicated().any()
    assert set(out.index) == expect_dates

    # old wins: every date present in A keeps A's values
    overlap = df_a.index.intersection(df_b.index)
    for d in overlap:
        assert out.loc[d, "OPEN"] == df_a.loc[d, "Open"]
    # dates only in B take B's values
    only_b = df_b.index.difference(df_a.index)
    for d in only_b:
        assert out.loc[d, "OPEN"] == df_b.loc[d, "Open"]


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(base=day_sets)
def test_append_idempotent(pstore, base):
    key = _fresh_key()
    df = _frame(base, seed=3)
    pstore[key] = df
    pstore[key] += df
    pstore[key] += df
    out = pstore[key][:]
    assert len(out) == len(df)
    assert (out["OPEN"].to_numpy() == df["Open"].to_numpy()).all()


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_store_model_random_op_sequences(tmp_path, spark, seed):
    """Model-based check: a random interleaving of append / compact /
    vacuum / add_column over both protocols must keep the store's
    content equal to a driver-side pandas model applying the same
    semantics (index-keyed dedup old-wins; evolved columns default)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    proto = "manifest" if seed % 2 else "rename"
    s = Store(
        base_path=tmp_path / f"model_{seed}",
        cols={"A": float, "B": int},
        index="TS",
        spark=spark,
        commit_protocol=proto,
    )

    def frame(n, start_day):
        idx = pd.date_range("2021-01-01", periods=400, freq="D")[
            start_day : start_day + n
        ]
        return pd.DataFrame(
            {"A": rng.random(len(idx)), "B": rng.integers(0, 100, len(idx))},
            index=idx,
        )

    model = None
    evolved = []
    first = frame(30, int(rng.integers(0, 300)))
    s["K"] = first
    model = first.copy()
    model.columns = ["A", "B"]

    for _step in range(8):
        op = rng.choice(
            ["append", "append", "compact", "zorder", "vacuum", "evolve"]
        )
        if op == "append":
            f = frame(int(rng.integers(1, 40)), int(rng.integers(0, 300)))
            s["K"] += f
            fm = f.copy()
            fm.columns = ["A", "B"]
            for c, dv in evolved:
                fm[c] = dv
            model = pd.concat([model, fm])
            model = model[~model.index.duplicated(keep="first")]
        elif op == "compact":
            s.compact("K")
        elif op == "zorder":
            # value-space reclustering must never change CONTENT
            s.compact("K", cluster_by=["A", "B"], zorder=True)
        elif op == "vacuum":
            s.vacuum("K", retention_sec=0)
        elif op == "evolve" and len(evolved) < 2:
            cname = f"X{len(evolved)}"
            dv = float(len(evolved) + 1)
            s.add_column(cname, float, dv)
            evolved.append((cname, dv))
            model[cname] = dv

        out = s["K"][:]
        expect = model.sort_index()
        assert list(out.index) == list(expect.index), (op, _step)
        for c in out.columns:
            assert np.allclose(out[c].to_numpy(), expect[c].to_numpy()), (
                op, _step, c,
            )
