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


def _row_is_green(row: object, has_oracle: bool = False) -> bool:
    """A driver CORRECTNESS row counts as verification only if it
    succeeded: ``err`` must be null or the by-design ``'no_oracle'``
    (rows-only check), and neither match flag may be False.  An errored
    or hash-mismatched row is NOT verification — those queries must
    sort as never-checked so the rotation window re-runs them.

    A CHECK-TYPE CHANGE also resets verification: when the query NOW
    declares a DuckDB oracle (``has_oracle``), a historical rows-only
    row (``err == 'no_oracle'``) no longer counts — the exact oracle
    has never been driver-verified, so a ROWS→ORACLE retirement sorts
    the query back to never-checked and it lands in the next window.
    (The reverse is fine: an oracle-green row is strictly stronger
    than a rows-only check.)"""
    if not isinstance(row, dict):
        return False
    if row.get("err") == "no_oracle":
        if has_oracle:
            return False
    elif row.get("err") is not None:
        return False
    return (
        row.get("rows_match") is not False
        and row.get("schema_match") is not False
        and row.get("hash_match") is not False
    )


def _load_check_history(
    repo_dir: str, oracle_names: set[str] | None = None
) -> dict[str, list[int]]:
    """Which rounds gave each query a GREEN driver CORRECTNESS row
    (errored/mismatched rows are skipped, as are rows-only rows for
    queries that now declare an oracle — see _row_is_green)."""
    import glob
    import json

    oracle_names = oracle_names or set()
    checked: dict[str, list[int]] = {}
    for p in sorted(glob.glob(str(Path(repo_dir) / "CORRECTNESS_r*.json"))):
        try:
            rnd = int(Path(p).stem.split("_r")[-1])
            for name, row in json.load(open(p)).items():
                if _row_is_green(row, has_oracle=name in oracle_names):
                    checked.setdefault(name, []).append(rnd)
        except (ValueError, OSError, json.JSONDecodeError, AttributeError):
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
    CORRECTNESS_r*.json history against the CURRENT oracle registry.)"""
    if checked is None:
        checked = _load_check_history(_REPO, set(_q.ORACLES))
    reg_pos = {n: i for i, n in enumerate(names)}
    return sorted(
        names,
        key=lambda n: (
            len(checked.get(n) or ()),
            max(checked.get(n) or (0,)),
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
