#!/usr/bin/env python
"""Per-query profiler for the optimization rounds (guide §1).

For each named query: time CONSTRUCTION (the ``qs[name](spark, sf_dir)``
call — eager setup work like temp-file writes, index builds, collects
lands here) separately from EXECUTION (the noop sink), count the Spark
jobs each phase launched, and optionally dump ``explain("formatted")``.

Usage:
    python tools/profile_query.py [--sf-dir DIR] [--explain-dir DIR] \
        [--repeat N] query [query ...]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from oakstore_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    spark = get_spark("oakstore_profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # warm-up identical to bench.py
    qs["q01_pricing_summary"](spark, args.sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    def _noop_batches(it):
        for pdf in it:
            yield pdf

    spark.range(0, 3200, 1, 32).toDF("id").mapInPandas(
        _noop_batches, "id long"
    ).write.format("noop").mode("overwrite").save()

    tracker = spark.sparkContext.statusTracker()

    def njobs() -> int:
        ids = tracker.getJobIdsForGroup(None)
        return len(ids) if ids else 0

    print(f"{'query':34s} {'build':>7s} {'exec':>7s} {'total':>7s} "
          f"{'bjobs':>5s} {'ejobs':>5s}")
    for name in args.queries:
        if name not in qs:
            print(f"{name}: NOT REGISTERED", file=sys.stderr)
            continue
        best = None
        for rep in range(args.repeat):
            spark.sparkContext.setJobGroup(f"prof_{name}_{rep}", name)
            j0 = njobs()
            t0 = time.time()
            df = qs[name](spark, args.sf_dir)
            t1 = time.time()
            j1 = njobs()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            j2 = njobs()
            spark.catalog.clearCache()
            row = (t1 - t0, t2 - t1, t2 - t0, j1 - j0, j2 - j1)
            if best is None or row[2] < best[2]:
                best = row
            if args.explain_dir and rep == 0:
                out = Path(args.explain_dir)
                out.mkdir(parents=True, exist_ok=True)
                (out / f"{name}.txt").write_text(
                    df._sc is not None
                    and df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                            "formatted"
                        )
                    )
                    or ""
                )
        b, e, t, bj, ej = best
        print(f"{name:34s} {b:7.2f} {e:7.2f} {t:7.2f} {bj:5d} {ej:5d}")


if __name__ == "__main__":
    main()
