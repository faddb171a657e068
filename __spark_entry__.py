"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2
with DuckDB oracles (identical output column names on both sides).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from oakstore_spark import queries as _q  # noqa: E402

_q.load_all()

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.QUERIES["q01_pricing_summary"](spark, _SMOKE_SF_DIR)


def _load_check_history(repo_dir: str) -> dict[str, list[int]]:
    """Which rounds gave each query a driver CORRECTNESS row."""
    import glob
    import json

    checked: dict[str, list[int]] = {}
    for p in sorted(glob.glob(str(Path(repo_dir) / "CORRECTNESS_r*.json"))):
        try:
            rnd = int(Path(p).stem.split("_r")[-1])
            for name in json.load(open(p)):
                checked.setdefault(name, []).append(rnd)
        except (ValueError, OSError, json.JSONDecodeError):
            continue
    return checked


def _rotation_order(
    names: list[str], checked: dict[str, list[int]] | None = None
) -> list[str]:
    """Self-rotating registry order: the driver's correctness gate
    checks a bounded window from the FRONT of this dict, so queries are
    ordered by how much driver verification they have — never-checked
    first, then ascending by (times checked, last round checked).
    Every round the window automatically covers whatever accumulated
    the least hard signal; no manual reordering between rounds.
    (``checked`` injectable for the unit test; defaults to the repo's
    CORRECTNESS_r*.json history.)"""
    if checked is None:
        checked = _load_check_history(_REPO)
    reg_pos = {n: i for i, n in enumerate(names)}
    return sorted(
        names,
        key=lambda n: (
            len(checked.get(n, [])),
            max(checked.get(n, [0])),
            reg_pos[n],
        ),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered by
    driver-verification history (least-verified first; see
    _rotation_order)."""
    order = _rotation_order(list(_q.QUERIES))
    return {n: _q.QUERIES[n] for n in order}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted keys get rows-only checks."""
    return dict(_q.ORACLES)
