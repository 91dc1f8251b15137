"""A/B config experiment harness (optimization rounds).

Times a subset of registry queries twice in one process — once with the
session defaults, once with an extra-conf overlay — using the same
noop-sink + warmup methodology as bench.py. RUNTIME-settable confs only
(spark.sql.*): the session is shared, so builder-time confs (memory,
codec) need separate processes — use bench.py with env overrides for
those.

Usage:
  python tools/bench_ab.py q1,q2,... 'conf.key=value;conf.key2=value2'
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import __spark_entry__ as entrymod  # noqa: E402
from big_data_pipeline_spark.session import get_spark  # noqa: E402


def time_queries(spark, qs, sf_dir, runs=3):
    out = {}
    for name, fn in qs.items():
        timed = []
        for i in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            if i == 0 and runs > 1:
                continue
            timed.append(dt)
            if dt < 0.25:
                break
        out[name] = round(min(timed), 3)
    return out


def main() -> int:
    names = [s.strip() for s in sys.argv[1].split(",") if s.strip()]
    overlay = dict(
        kv.split("=", 1) for kv in sys.argv[2].split(";") if kv.strip()
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("bench_ab", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = {k: v for k, v in entrymod.queries().items() if k in set(names)}

    a = time_queries(spark, qs, sf_dir)
    saved = {}
    for k, v in overlay.items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    b = time_queries(spark, qs, sf_dir)
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)
    # same-session re-baseline to bound drift
    a2 = time_queries(spark, qs, sf_dir)

    rows = {
        n: {"base": a[n], "overlay": b[n], "rebase": a2[n]} for n in a
    }
    print(json.dumps({
        "overlay": overlay,
        "total_base": round(sum(a.values()), 3),
        "total_overlay": round(sum(b.values()), 3),
        "total_rebase": round(sum(a2.values()), 3),
        "queries": rows,
    }, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
