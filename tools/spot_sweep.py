"""Run tools/check_oracle.py over a query subset and write a sweep
artifact (SWEEP_*.json) in the round-5 format: per-query status/rows/
seconds plus failure count. Used for the per-round changed-operator
spot-sweeps at sf0.1 and the gen_sf stress corpus.

Usage: python tools/spot_sweep.py OUT.json "artifact description" \
           SF_DIR query [query ...]
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def main() -> int:
    out_path, desc, sf_dir, *queries = sys.argv[1:]
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools/check_oracle.py"), sf_dir, *queries],
        capture_output=True,
        text=True,
    )
    results: dict[str, dict] = {}
    n_fail = 0
    for line in (proc.stdout + proc.stderr).replace("\r", "\n").splitlines():
        m = re.match(
            r"(ok|FAIL|weak)\s+(\S+?):.*?(?:rows=(\d+))?\s*\(([0-9.]+)s\)",
            line.strip(),
        )
        if not m:
            continue
        status, name, rows, sec = m.groups()
        results[name] = {
            "status": status,
            "rows": int(rows) if rows else None,
            "sec": float(sec),
        }
        if status == "FAIL":
            n_fail += 1
    missing = [q for q in queries if q not in results]
    # registry_size is read from the live registry, never typed by
    # hand: BENCH/SWEEP/README counts drifted in past rounds precisely
    # because artifacts carried constants (VERDICT r6 item 7).
    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entrymod

    artifact = {
        "artifact": desc,
        "sf_dir": sf_dir,
        "registry_size": len(entrymod.queries()),
        "n_queries": len(queries),
        "n_failures": n_fail,
        "missing": missing,
        "results": results,
    }
    Path(out_path).write_text(json.dumps(artifact, indent=1))
    print(f"{out_path}: {len(results)} checked, {n_fail} failures, "
          f"{len(missing)} missing")
    return 1 if (n_fail or missing) else 0


if __name__ == "__main__":
    raise SystemExit(main())
