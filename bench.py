#!/usr/bin/env python
"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full execution, no
driver-side collect skew). One warm-up run of the flagship query first so
JVM/codegen startup is not billed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import __spark_entry__ as entrymod  # noqa: E402
from oakstore_spark.session import get_spark  # noqa: E402


def run_query(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("oakstore_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    # warm-up: JVM + parquet footer caches
    run_query(qs["q01_pricing_summary"](spark, sf_dir))

    timings: dict[str, float] = {}
    for name in sorted(qs):
        t0 = time.time()
        try:
            run_query(qs[name](spark, sf_dir))
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001
            print(f"bench error {name}: {e}", file=sys.stderr)
            timings[name] = -1.0
        finally:
            # operators persist() intermediates (LSH signatures, prefix
            # postings); drop them so queries are timed independently and
            # cache memory doesn't accumulate across the whole suite
            spark.catalog.clearCache()

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(json.dumps({
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
