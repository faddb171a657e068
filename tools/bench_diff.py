#!/usr/bin/env python
"""Per-query bench comparison between two BENCH_DETAIL.json files (paths
or git revs like `ca22791:BENCH_DETAIL.json`): total on the common query
set, regressions above a ratio threshold, biggest wins, and the current
tail — the round-over-round regression check the per-round JSON alone
can't show.

Flagged regressions are automatically RE-TIMED solo (min-of-3, fresh
SparkSession, same noop sink as bench.py) and adjudicated: suite-run
wall times carry 10-50% single-query noise (GC, page cache, neighboring
queries), and in r4 six TPC-H queries false-alarmed at ~2x purely from a
load burst mid-suite. The solo number is the truth; each flagged query
prints as either `noise (solo=...)` or `REGRESSION (solo=...)`. Disable
with --no-retime (e.g. when the data dir for the old run is gone).

Usage:
  python tools/bench_diff.py OLD NEW [--ratio 1.2] [--min-sec 0.5]
  python tools/bench_diff.py ca22791:BENCH_DETAIL.json BENCH_DETAIL.json
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path


def load(spec: str) -> dict:
    if ":" in spec and not Path(spec).exists():
        rev = subprocess.run(
            ["git", "show", spec], capture_output=True, text=True,
            cwd=Path(__file__).resolve().parent.parent,
        )
        if rev.returncode != 0:
            sys.exit(f"git show {spec} failed: {rev.stderr.strip()}")
        return json.loads(rev.stdout)
    return json.loads(Path(spec).read_text())


def solo_retime(names: list[str]) -> dict[str, float]:
    """Min-of-3 solo wall time per query on a fresh SparkSession at
    $SPARK_GRAFT_SF_DIR — the adjudication measurement for suite-run
    noise. Mirrors bench.py: noop sink, warm-up of JVM + Python worker
    pool first, clearCache between runs."""
    import os
    import time

    repo = Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(repo))
    import __spark_entry__ as entrymod
    from oakstore_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("oakstore_bench_retime")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    def run(name: str) -> float:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.time() - t0
        spark.catalog.clearCache()
        return dt

    run("q01_pricing_summary")  # JVM + codegen warm-up

    def _noop_batches(it):
        yield from it

    spark.range(0, 3200, 1, 32).toDF("id").mapInPandas(
        _noop_batches, "id long"
    ).write.format("noop").mode("overwrite").save()  # worker pool warm-up

    out: dict[str, float] = {}
    for name in names:
        if name not in qs:
            continue
        try:
            out[name] = round(min(run(name) for _ in range(3)), 2)
        except Exception as e:  # noqa: BLE001
            print(f"retime error {name}: {e}", file=sys.stderr)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--ratio", type=float, default=1.2,
                    help="flag queries slower than ratio x old")
    ap.add_argument("--min-sec", type=float, default=0.5,
                    help="ignore regressions below this absolute time")
    ap.add_argument("--top", type=int, default=10)
    ap.add_argument("--no-retime", action="store_true",
                    help="skip the solo min-of-3 adjudication of "
                         "flagged regressions")
    args = ap.parse_args()

    old = load(args.old)["queries"]
    new = load(args.new)["queries"]
    common = sorted(
        k for k in new if k in old and new[k] > 0 and old[k] > 0
    )
    t_old = sum(old[k] for k in common)
    t_new = sum(new[k] for k in common)
    pct = f" ({(t_new - t_old) / t_old * 100:+.1f}%)" if t_old else ""
    print(
        f"common {len(common)} queries: {t_old:.1f}s -> {t_new:.1f}s{pct}"
    )
    only_new = sorted(set(new) - set(old))
    if only_new:
        print(f"new-only ({len(only_new)}): "
              + ", ".join(f"{k}={new[k]:.2f}s" for k in only_new))

    regs = sorted(
        ((new[k] / old[k], k) for k in common
         if new[k] > old[k] * args.ratio and new[k] >= args.min_sec),
        reverse=True,
    )
    print(f"\nregressions >{args.ratio}x (and >={args.min_sec}s):"
          + ("" if regs else " none"))
    solo = {}
    anchor = 1.0
    if regs and not args.no_retime:
        flagged = [k for _, k in regs[: args.top]]
        # calibration anchors: the most suite-stable mid-range queries.
        # The OLD run happened on a different day/machine-state; if the
        # anchors (whose code certainly didn't regress — they were
        # stable in THIS suite run) retime uniformly slower, that shift
        # is environment drift and must not be billed to the flagged
        # queries. anchor = median(solo/old) over them.
        anchors = [
            k for k in sorted(
                (k for k in common
                 if 0.4 <= old[k] <= 2.0 and k not in flagged),
                key=lambda k: abs(new[k] / old[k] - 1),
            )[:5]
        ]
        solo = solo_retime(flagged + anchors)
        ratios = sorted(
            solo[k] / old[k] for k in anchors if k in solo and old[k] > 0
        )
        if ratios:
            anchor = max(1.0, ratios[len(ratios) // 2])
        if anchor > 1.1:
            print(f"  [environment drift: anchors retime at "
                  f"{anchor:.2f}x their old numbers — thresholds scaled]")
    n_noise = n_real = 0
    for r, k in regs[: args.top]:
        verdict = ""
        if k in solo:
            # adjudicate against the OLD number scaled by the anchor
            # drift: a solo min-of-3 back under ratio x old x anchor
            # means suite noise / machine drift, not slower code
            if solo[k] <= old[k] * args.ratio * anchor:
                verdict = f"  -> noise (solo={solo[k]:.2f}s)"
                n_noise += 1
            else:
                verdict = f"  -> REGRESSION (solo={solo[k]:.2f}s)"
                n_real += 1
        print(f"  {k}: {old[k]:.2f} -> {new[k]:.2f} ({r:.2f}x){verdict}")
    if solo:
        print(f"  adjudicated: {n_noise} noise, {n_real} real")

    wins = sorted(((old[k] - new[k], k) for k in common), reverse=True)
    print("\nbiggest wins:")
    for d, k in wins[: args.top]:
        if d <= 0:
            break
        print(f"  {k}: {old[k]:.2f} -> {new[k]:.2f} (-{d:.2f}s)")

    print("\ncurrent tail:")
    for v, k in sorted(((v, k) for k, v in new.items()), reverse=True)[: args.top]:
        print(f"  {v:6.2f}  {k}")


if __name__ == "__main__":
    main()
