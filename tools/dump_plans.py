#!/usr/bin/env python
"""Dump explain("formatted") for named queries to a directory.

Usage: python tools/dump_plans.py --out plans/r15 --suffix _before q1 q2 ...
Construction only (no execution) — queries with eager setup still run
that setup.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from oakstore_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="plans/r15")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    spark = get_spark("oakstore_plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    for name in args.queries:
        if name not in qs:
            print(f"SKIP {name}: not registered", file=sys.stderr)
            continue
        try:
            df = qs[name](spark, args.sf_dir)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            (out / f"{name}{args.suffix}.txt").write_text(txt)
            print(f"wrote {name}{args.suffix}.txt")
        except Exception as e:  # noqa: BLE001
            print(f"ERR {name}: {e}", file=sys.stderr)
        finally:
            spark.catalog.clearCache()


if __name__ == "__main__":
    main()
