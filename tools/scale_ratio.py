"""Compare two BENCH_DETAIL-format runs (e.g. sf0.1 vs sf1) and report
per-query scaling ratios.

Usage: python tools/scale_ratio.py BASE.json SCALED.json [factor]

``factor`` is the data-size multiple between the runs (default 10).
Prints queries sorted by ratio; linear operators should sit at or below
the factor, and anything far above it is a scale bug candidate.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    base = json.load(open(sys.argv[1]))["queries"]
    scaled = json.load(open(sys.argv[2]))["queries"]
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    rows = []
    for name, t1 in scaled.items():
        t0 = base.get(name)
        if t0 is None or t0 <= 0 or t1 <= 0:
            rows.append((float("inf") if t1 < 0 or (t0 or 0) < 0 else 0, name, t0, t1))
            continue
        rows.append((t1 / t0, name, t0, t1))
    rows.sort(reverse=True)
    n_over = 0
    for ratio, name, t0, t1 in rows:
        flag = ""
        if ratio > factor:
            flag = "  <-- superlinear"
            n_over += 1
        print(f"{ratio:8.2f}x  {name:40s} {t0 if t0 is not None else -1:8.3f}s -> {t1:8.3f}s{flag}")
    print(f"\n{n_over} queries above the {factor:.0f}x linear envelope")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
