"""Same-window CODE A/B: time two git revisions back-to-back (r9 verdict
item 1 — the drift-attribution anchor for optimization rounds).

Three phases, each a FRESH process/JVM running the repo's own bench.py
(same methodology, same env contract) from a ``git archive`` snapshot:

  1. base   — the old revision
  2. head   — the new revision
  3. rebase — the old revision AGAIN (bounds ambient window drift:
              if rebase != base the window moved; per-query deltas are
              only signal where they exceed the rebase spread)

One process per phase — NOT one shared Spark session — on purpose: the
two revisions' Python modules cannot coexist in one interpreter (local
Spark workers resolve pickled-by-reference kernels against the live
``sys.path``, so swapping code mid-session would time old plans over
new kernels). Cold-JVM-per-phase is also exactly the driver's own
measurement convention, so phase totals are comparable to BENCH_r*.json.

Usage:
  python tools/bench_ab_code.py BASE_REV [HEAD_REV] \
      [--queries q1,q2,...] [--runs 4] [--report median] [--out FILE]

Defaults: HEAD_REV=HEAD, full registry, BENCH_RUNS=4 BENCH_REPORT=median
(the committed-snapshot convention). The artifact (AB_CODE.json unless
--out) carries per-query base/head/rebase plus the drift bound.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _snapshot(rev: str, dest: Path) -> None:
    dest.mkdir(parents=True, exist_ok=True)
    ar = subprocess.run(
        ["git", "-C", str(REPO), "archive", rev],
        check=True,
        stdout=subprocess.PIPE,
    )
    subprocess.run(
        ["tar", "-x", "-C", str(dest)], input=ar.stdout, check=True
    )


def _run_bench(
    tree: Path, queries: str | None, runs: int, report: str
) -> dict:
    env = dict(os.environ)
    env["BENCH_RUNS"] = str(runs)
    env["BENCH_REPORT"] = report
    if queries:
        env["BENCH_QUERIES"] = queries
    else:
        env.pop("BENCH_QUERIES", None)
    subprocess.run(
        [sys.executable, "bench.py"], cwd=str(tree), env=env, check=True
    )
    detail = tree / (
        "BENCH_DETAIL_SUBSET.json" if queries else "BENCH_DETAIL.json"
    )
    return json.loads(detail.read_text())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("base_rev")
    ap.add_argument("head_rev", nargs="?", default="HEAD")
    ap.add_argument("--queries", default=None)
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--report", default="median")
    ap.add_argument("--out", default=str(REPO / "AB_CODE.json"))
    args = ap.parse_args()

    with tempfile.TemporaryDirectory(prefix="ab_code_") as tmp:
        base_dir, head_dir = Path(tmp) / "base", Path(tmp) / "head"
        _snapshot(args.base_rev, base_dir)
        _snapshot(args.head_rev, head_dir)
        base = _run_bench(base_dir, args.queries, args.runs, args.report)
        head = _run_bench(head_dir, args.queries, args.runs, args.report)
        rebase = _run_bench(base_dir, args.queries, args.runs, args.report)

    rows = {}
    for name in sorted(set(base["queries"]) | set(head["queries"])):
        b = base["queries"].get(name)
        h = head["queries"].get(name)
        r = rebase["queries"].get(name)
        rows[name] = {
            "base": b,
            "head": h,
            "rebase": r,
            "head_over_base": round(h / b, 3) if b and h and b > 0 else None,
            "drift": round(r / b, 3) if b and r and b > 0 else None,
        }
    out = {
        "base_rev": subprocess.run(
            ["git", "-C", str(REPO), "rev-parse", args.base_rev],
            check=True, stdout=subprocess.PIPE, text=True,
        ).stdout.strip(),
        "head_rev": subprocess.run(
            ["git", "-C", str(REPO), "rev-parse", args.head_rev],
            check=True, stdout=subprocess.PIPE, text=True,
        ).stdout.strip(),
        "runs": args.runs,
        "report": args.report,
        "queries_subset": args.queries,
        "total_base": base["value"],
        "total_head": head["value"],
        "total_rebase": rebase["value"],
        "head_over_base": round(head["value"] / base["value"], 4),
        "drift_bound": round(rebase["value"] / base["value"], 4),
        "queries": rows,
    }
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(
        json.dumps(
            {
                "total_base": out["total_base"],
                "total_head": out["total_head"],
                "total_rebase": out["total_rebase"],
                "head_over_base": out["head_over_base"],
                "drift_bound": out["drift_bound"],
                "out": args.out,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
