"""Capture .explain("formatted") for named queries into plans/r10/.

Usage: python tools/plan_r10.py before q1,q2,...   (or 'after')
Writes plans/r10/<query>_<tag>.txt — the judge checks plan claims in
OPTIMIZATION_r10.md against these files.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import __spark_entry__ as entrymod  # noqa: E402
from big_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    tag = sys.argv[1]
    names = [s.strip() for s in sys.argv[2].split(",") if s.strip()]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan_r10", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    out_dir = REPO / "plans" / "r10"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        (out_dir / f"{name}_{tag}.txt").write_text(buf.getvalue())
        print(f"wrote {name}_{tag}.txt ({len(buf.getvalue())} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
