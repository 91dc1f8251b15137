"""Advisory plan audit: flag queries that exchange a corpus-sized
text-keyed frame more than once.

The r9 sf10 stress found `dsir_importance_score` at 12.8x on 10x data
because the exploded bigram frame crossed the wire twice (groupBy
stats + join-back re-exchange on shingle); the fix — whole-partition
window stats attached in one exchange — took it to 1.9x. This tool
finds that SHAPE registry-wide so the next instance is caught by a
plan read instead of a stress run.

A flag is NOT automatically a defect: a two-sided equi-join on
shingle legitimately exchanges both inputs (candidate-pair
generation), and a sort-merge join re-sorts what an upstream
aggregate already partitioned. Every current flag is either measured
linear-or-better in the cumulative sf10 stress artifact
(`SWEEP_SF10_r*.json`) or listed below with its reason — the audit
exists to make NEW entrants visible, so review any name this prints
that is not in KNOWN_TWO_SIDED before shipping it.

A second check automates the r8 manual plan audit: any pandas-UDF
invocation evaluated by two ArrowEvalPython nodes in one plan
(optimizer pushdown cloning a score expression into score + filter
nodes — double the Arrow transfer and kernel work) is always flagged;
the fix is a dedicated `asNondeterministic()` kernel instance, never
mutating the shared one (asNondeterministic mutates in place).

Usage: python tools/audit_exchanges.py [sf_dir]
Exit code: 1 if an unexplained (not known, not sf10-measured) flag
appears, else 0.
"""

from __future__ import annotations

import contextlib
import glob
import io
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import __spark_entry__ as entrymod  # noqa: E402
from big_data_pipeline_spark.session import get_spark  # noqa: E402

# Text-explosion key families whose frames are corpus-sized (the
# explode fan-out is ~tokens/doc); numeric FK joins are excluded on
# purpose — their exchanges are the ordinary relational shape.
_TEXT_KEYS = frozenset(
    {"shingle", "token", "term", "word", "bigram", "tok", "ngram",
     "gram", "feature"}
)
_PAT = re.compile(r"hashpartitioning\((\w+?)#")

# Repeated-exchange flags that are the two-sided-join shape, not the
# same frame shuffled twice. Keep each entry justified.
KNOWN_TWO_SIDED = {
    # self-join candidate generation: both pair sides exchange once
    "shingle_jaccard_pairs",
    "shingle_containment_pairs",
    "jaccard_prefix_filter_pairs",  # prefix tokens + verify arrays
    # batch side + persisted corpus side of the incremental ingest
    "incremental_neardup_batch",
    # exploded positions x per-shingle counts sort-merge (both sides
    # corpus-sized by design; shuffle-hash OOMed at sf10 — SCALE.md 8k)
    "dup_span_fraction",
    # token stream x per-token model/stat tables (model side is
    # token-vocabulary-sized, not corpus-sized, but keys match)
    "nb_lang_confusion",
    "chi2_token_lang",
    "cms_token_counts",
    "token_rarity_score",
    "source_token_kl_divergence",
}


_ARROW_PAT = re.compile(
    r"\(\d+\) ArrowEvalPython\s*\nArguments: \[(\w+)\(([^\]]*?)\)#\d+\]"
)


def count_duplicate_arrow_evals(plan: str) -> dict[str, int]:
    """(kernel, normalized-argument) signatures evaluated by >=2
    ArrowEvalPython nodes in one plan — the optimizer-duplication
    shape (score-then-filter pushdown cloning a pandas UDF into two
    Arrow nodes) that r8 fixed by fencing a nondeterministic kernel
    instance. Two nodes running the SAME kernel on DIFFERENT columns
    (e.g. a recall report scoring two candidate sets) are legitimate
    and do not match: argument expression IDs are stripped but column
    names are kept, so only a true re-evaluation of one invocation
    counts."""
    sigs: dict[str, int] = {}
    for m in _ARROW_PAT.finditer(plan):
        kernel, args = m.groups()
        norm_args = re.sub(r"#\d+", "", args)
        sig = f"{kernel}({norm_args})"
        sigs[sig] = sigs.get(sig, 0) + 1
    return {s: c for s, c in sigs.items() if c >= 2}


def count_text_key_exchanges(plan: str) -> dict[str, int]:
    """Occurrences of hashpartitioning on each text-explosion key
    family (expression-ID suffixes stripped), >=2 meaning the frame
    family crosses the wire more than once."""
    counts: dict[str, int] = {}
    for m in _PAT.finditer(plan):
        key = m.group(1).rstrip("0123456789_")
        if key in _TEXT_KEYS:
            counts[key] = counts.get(key, 0) + 1
    return {k: c for k, c in counts.items() if c >= 2}


def status_for(name: str, measured: set[str]) -> str:
    if name in KNOWN_TWO_SIDED:
        return "known-two-sided"
    if name in measured:
        return "sf10-measured"
    return "UNEXPLAINED"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    measured: set[str] = set()
    for art in sorted(glob.glob(str(REPO / "SWEEP_SF10_r*.json"))):
        data = json.loads(Path(art).read_text())
        measured.update(
            n for n, r in data.get("results", {}).items()
            if r.get("isolated_ratio", r.get("ratio", 99)) <= 12
        )
    spark = get_spark()
    unexplained = []
    for name, fn in entrymod.queries().items():
        try:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                fn(spark, sf_dir).explain("formatted")
            plan = buf.getvalue()
        except Exception as ex:  # streaming drains etc. still plan fine
            print(f"ERR  {name}: {type(ex).__name__}")
            continue
        dup_evals = count_duplicate_arrow_evals(plan)
        if dup_evals:
            # always a defect: fence with a dedicated nondeterministic
            # kernel instance (see functions/similarity seq_cosine_fenced)
            print(f"flag {name}: duplicate Arrow eval {dup_evals} [UNEXPLAINED]")
            unexplained.append(name)
        hot = count_text_key_exchanges(plan)
        if not hot:
            continue
        status = status_for(name, measured)
        print(f"flag {name}: {hot} [{status}]")
        if status == "UNEXPLAINED":
            unexplained.append(name)
    print(f"{len(unexplained)} unexplained")
    return 1 if unexplained else 0


if __name__ == "__main__":
    raise SystemExit(main())
