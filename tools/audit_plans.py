#!/usr/bin/env python
"""Physical-plan scale audit across EVERY registered query.

Scans each ``queries()`` entry's physical plan (at sf0.001 — plan shape,
not data) and flags the anti-patterns that stay correct at test scale
but fall over at 100 TB:

- ``BatchEvalPython``  : row-at-a-time Python UDF in the plan (the slow
                         path — everything Python must be Arrow-batched:
                         ArrowEvalPython / mapInPandas / UDTF);
- ``CartesianProduct`` : unbounded all-pairs join (broadcast-nested-loop
                         against a literally-tiny side is allowed and
                         reported separately);
- scan width           : parquet scans reading >90% of a wide table's
                         columns under a narrow projection suggest
                         broken column pruning (informational).

Exit 1 if any hard red flag (BatchEvalPython / CartesianProduct) shows
up. ``--verbose`` prints per-query join/exchange inventories so plan
drift between rounds is diffable.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from oakstore_spark.session import get_spark  # noqa: E402

HARD_FLAGS = ("BatchEvalPython", "CartesianProduct")
INVENTORY = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "Expand",
    "Window",
    "+- Exchange",
)


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_spark("oakstore_spark_plan_audit")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    names = args.names or sorted(qs)
    failures = 0
    for name in names:
        try:
            plan = plan_of(qs[name](spark, args.sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: plan failed: {e}")
            failures += 1
            continue
        flags = [f for f in HARD_FLAGS if f in plan]
        counts = {p: plan.count(p) // (1 if p.startswith("+-") else 2) for p in INVENTORY}
        inv = " ".join(
            f"{p.replace('+- ', '')}={n}" for p, n in counts.items() if n
        )
        if flags:
            failures += 1
            print(f"RED  {name}: {','.join(flags)} | {inv}")
        elif args.verbose:
            print(f"ok   {name}: {inv}")
    tag = "FAIL" if failures else "OK"
    print(f"{tag}: {len(names)} plans audited, {failures} red-flagged")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
