"""Assemble SWEEP_SF10_r{N}.json from two BENCH_DETAIL-format batch
runs (sf1 + sf10 on the .bench stress corpora) plus the previous
round's artifact, producing the CUMULATIVE per-query ratio table.

Protocol (SCALE.md §8j + r8 methodology note): batch ratios carry
within-run contention (up to 3-4x on individual queries), so the batch
run only FLAGS candidates — anything whose batch ratio exceeds the
threshold must be re-measured isolated (BENCH_QUERIES=<one>) and the
isolated numbers recorded via --isolated before this script will write
an artifact with an empty over_12x list.

Usage:
  python tools/assemble_sf10.py OUT.json DESC SF1.json SF10.json \
      [--prev SWEEP_SF10_rPREV.json] [--threshold 12] \
      [--isolated name=sf1s:sf10s ...]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path


def main() -> int:
    args = sys.argv[1:]
    isolated: dict[str, tuple[float, float]] = {}
    prev_path = None
    threshold = 12.0
    while "--isolated" in args:
        i = args.index("--isolated")
        name, pair = args[i + 1].split("=")
        a, b = pair.split(":")
        isolated[name] = (float(a), float(b))
        args = args[:i] + args[i + 2 :]
    if "--prev" in args:
        i = args.index("--prev")
        prev_path = args[i + 1]
        args = args[:i] + args[i + 2 :]
    if "--threshold" in args:
        i = args.index("--threshold")
        threshold = float(args[i + 1])
        args = args[:i] + args[i + 2 :]
    out_path, desc, sf1_path, sf10_path = args

    sf1 = json.load(open(sf1_path))["queries"]
    sf10 = json.load(open(sf10_path))["queries"]
    results: dict[str, dict] = {}
    if prev_path:
        results.update(json.load(open(prev_path))["results"])
    for name, t10 in sf10.items():
        t1 = sf1.get(name)
        if t1 is None or t1 <= 0 or t10 <= 0:
            raise SystemExit(f"missing/failed timing for {name}: {t1} -> {t10}")
        row = {
            "sf1_sec": round(t1, 3),
            "sf10_sec": round(t10, 3),
            "ratio": round(t10 / t1, 1),
        }
        if name in isolated:
            a, b = isolated[name]
            row["isolated_sf1_sec"] = a
            row["isolated_sf10_sec"] = b
            row["isolated_ratio"] = round(b / a, 1)
        results[name] = row

    def effective_ratio(r: dict) -> float:
        return r.get("isolated_ratio", r["ratio"])

    over = sorted(
        n for n, r in results.items() if effective_ratio(r) > threshold
    )
    worst = max(effective_ratio(r) for r in results.values())
    artifact = {
        "artifact": desc,
        "sf1_dir": ".bench/sf1",
        "sf10_dir": ".bench/sf10",
        "n_queries": len(results),
        "worst_ratio": round(worst, 1),
        "over_12x": over,
        "results": results,
    }
    Path(out_path).write_text(json.dumps(artifact, indent=1))
    print(
        f"{out_path}: {len(results)} queries, worst {worst:.1f}x, "
        f"over_{threshold:g}x: {over}"
    )
    return 1 if over else 0


if __name__ == "__main__":
    raise SystemExit(main())
