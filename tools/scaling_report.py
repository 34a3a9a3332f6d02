"""Compare two bench.py JSON outputs and print a per-query scaling
table (``python tools/scaling_report.py small.json big.json [factor]``).

Flags queries whose wall-time ratio exceeds ``factor`` (the data-size
ratio, default 10): at fixed parallelism a scan-bound query should
scale ~linearly, so ratio > factor means super-linear work — a plan
that would not survive the next 100x.

Sub-linear ratios are normal at these sizes: fixed per-query overhead
(session, planning, python workers) dominates small-SF times.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    rows = []
    for k, t_small in small["queries"].items():
        t_big = big["queries"].get(k)
        if t_big is None:
            continue
        ratio = t_big / t_small if t_small else float("inf")
        rows.append((k, t_small, t_big, ratio))
    rows.sort(key=lambda r: -r[3])
    print(f"{'query':34} {'t_small':>8} {'t_big':>8} {'ratio':>6}  flag")
    bad = []
    for k, a, b, r in rows:
        flag = "SUPERLINEAR" if r > factor else ""
        if flag:
            bad.append(k)
        print(f"{k:34} {a:8.3f} {b:8.3f} {r:6.2f}  {flag}")
    ts, tb = small["value"], big["value"]
    print(f"\ntotal: {ts:.1f}s -> {tb:.1f}s ({tb / ts:.2f}x at {factor:.0f}x data)")
    if bad:
        print(f"superlinear: {', '.join(bad)}")
        sys.exit(1)


if __name__ == "__main__":
    main()
