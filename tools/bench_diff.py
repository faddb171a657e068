#!/usr/bin/env python
"""Per-query bench comparison between two BENCH_DETAIL.json files (paths
or git revs like `ca22791:BENCH_DETAIL.json`): total on the common query
set, regressions above a ratio threshold, biggest wins, and the current
tail — the round-over-round regression check the per-round JSON alone
can't show.

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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--ratio", type=float, default=1.2,
                    help="flag queries slower than ratio x old")
    ap.add_argument("--min-sec", type=float, default=0.5,
                    help="ignore regressions below this absolute time")
    ap.add_argument("--top", type=int, default=10)
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
    for r, k in regs[: args.top]:
        print(f"  {k}: {old[k]:.2f} -> {new[k]:.2f} ({r:.2f}x)")

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
