"""Scale an existing test corpus by deterministic replication.

The driver generates /root/testdata/sf{0.001,0.01,0.1} (read-only);
scale-stress runs (VERDICT.md round-2 #4) need an sf1-class corpus.
This tool replicates a base corpus K times with foreign-key-consistent
key shifts — every replica's orders still join its own customers,
lineitems still join parts/suppliers — so join/agg cardinalities scale
linearly like a real bigger corpus, deterministically (no RNG).

Per-table treatment (shift unit = max(key)+1 of the base corpus):
- region/nation: fixed dimensions, copied once.
- customer/supplier/part/orders/lineitem: surrogate + foreign keys
  shifted per replica.
- events: event_id/user_id shifted (K x users, same time range — the
  realistic direction for stream-state scaling: more keys, denser
  windows).
- documents: doc_id shifted; every token gets a '~{i}' replica suffix
  so replicas share NO shingles — the corpus gains K x more near-dup
  clusters of the SAME size (the realistic big-corpus direction),
  instead of K x bigger clusters whose pair counts grow ~K^2;
  n_chars recomputed to stay consistent.
- customer: c_name gets a 2-char replica suffix so cross-replica names
  never collide on delete-one-char blocking keys.
- embeddings: vec_id shifted, vectors copied (duplicate vectors only
  change scores, not kernel cost).

Usage: python tools/gen_sf.py SRC_DIR DST_DIR K
e.g.   python tools/gen_sf.py /root/testdata/sf0.1 /root/repo/.bench/sf1 10
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

_SHIFTS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "documents"},  # vec_id tracks doc_id
}

_KEY_OF = {
    "customer": ("customer", "c_custkey"),
    "supplier": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "orders": ("orders", "o_orderkey"),
    "events": ("events", "event_id"),
    "events_user": ("events", "user_id"),
    "documents": ("documents", "doc_id"),
}

FIXED = ("region", "nation")
TABLES = (*FIXED, *(t for t in _SHIFTS))


def _shift_units(src: Path) -> dict[str, int]:
    units = {}
    for name, (table, col) in _KEY_OF.items():
        t = pq.read_table(src / f"{table}.parquet", columns=[col])
        units[name] = int(pc.max(t.column(col)).as_py()) + 1
    return units


def _replica(table: str, t: pa.Table, i: int, units: dict[str, int]) -> pa.Table:
    if i > 0:
        for col, unit in _SHIFTS[table].items():
            idx = t.schema.get_field_index(col)
            shifted = pc.add(t.column(col), i * units[unit])
            t = t.set_column(idx, t.schema.field(idx), shifted.cast(t.schema.field(idx).type))
        if table == "documents":
            # Suffix EVERY whitespace-delimited token with a replica tag:
            # cross-replica docs then share zero tokens (so zero 3-word
            # shingles — Jaccard 0), while two docs inside one replica get
            # the identical transform, preserving their mutual overlap
            # exactly. A plain trailing " r{i}" (the first cut) left the
            # replicas of one base doc mutual NEAR-duplicates, so near-dup
            # cluster sizes grew with K and pair-enumeration output grew
            # ~K^2 — a corpus artifact, not a plan property. A real 10x
            # corpus has 10x more clusters of the same size, i.e. this.
            idx = t.schema.get_field_index("text")
            text = pc.replace_substring_regex(
                t.column("text").cast(pa.string()), r"(\S+)", rf"\1~{i}"
            )
            t = t.set_column(idx, t.schema.field(idx), text)
        if table == "customer":
            # Same reasoning for the entity-blocking surface: a 2-char
            # replica suffix means cross-replica names differ in >=2
            # positions (never share a delete-one-char blocking key),
            # while within-replica near-dup name pairs keep their exact
            # single-char difference.
            idx = t.schema.get_field_index("c_name")
            name = pc.binary_join_element_wise(
                t.column("c_name").cast(pa.string()), f"~{i}{i}", ""
            )
            t = t.set_column(idx, t.schema.field(idx), name)
        if table == "part":
            # Same lesson for the part catalog (round-4 stress run:
            # verbatim-copied p_name made every replica a lev-0 match
            # of its original inside the same (type, brand, size)
            # block, so record_linkage_score's TRUE match set — and
            # with it the candidate join — grew ~K^2, 23x runtime at
            # K=10). A >=3-char suffix pushes cross-replica names past
            # the lev<=2 gate: matches stay within-replica and scale
            # linearly, like a real bigger catalog of distinct
            # listings.
            idx = t.schema.get_field_index("p_name")
            name = pc.binary_join_element_wise(
                t.column("p_name").cast(pa.string()), f"~{i}{i}{i}", ""
            )
            t = t.set_column(idx, t.schema.field(idx), name)
    if table == "documents":
        nidx = t.schema.get_field_index("n_chars")
        n = pc.utf8_length(t.column("text").cast(pa.string()))
        t = t.set_column(nidx, t.schema.field(nidx), n.cast(t.schema.field(nidx).type))
    return t


def _write_split(out: pa.Table, path: Path, n_files: int) -> None:
    """Write one table as a DIRECTORY of ``n_files`` part files.

    A single parquet file splits only at row-group boundaries, so a
    15 M-row stress table used to hand local[32] just ~15 input splits
    — map-side scans ran on half the cores with a straggler tail, and
    3 pure map queries measured >12x on 10x data purely from the
    substrate (VERDICT r7 item 2). Spark reads the directory natively;
    the DuckDB oracle side globs it (tools/check_oracle.py).
    """
    # Clear any previous layout first: a stale single-file parquet at
    # this path would make mkdir raise, and stale part-*.parquet files
    # from a LARGER previous run would be silently globbed alongside
    # the new ones — duplicating rows in both Spark and the DuckDB
    # oracle with no warning (ADVICE r8 item 1).
    if path.is_file():
        path.unlink()
    elif path.is_dir():
        shutil.rmtree(path)
    path.mkdir(parents=True)
    step = (out.num_rows + n_files - 1) // n_files
    for j in range(n_files):
        chunk = out.slice(j * step, step)
        if chunk.num_rows == 0:
            break
        pq.write_table(chunk, path / f"part-{j:05d}.parquet")


def scale_corpus(src: Path, dst: Path, k: int, n_files: int = 32) -> None:
    dst.mkdir(parents=True, exist_ok=True)
    units = _shift_units(src)
    for table in FIXED:
        # tiny fixed dims stay single-file (5/25 rows)
        pq.write_table(pq.read_table(src / f"{table}.parquet"), dst / f"{table}.parquet")
    for table in _SHIFTS:
        base = pq.read_table(src / f"{table}.parquet")
        parts = [_replica(table, base, i, units) for i in range(k)]
        out = pa.concat_tables(parts, promote_options="none")
        _write_split(out, dst / f"{table}.parquet", n_files)
        step = (out.num_rows + n_files - 1) // n_files
        written = -(-out.num_rows // step) if out.num_rows else 0
        print(f"{table}: {base.num_rows} -> {out.num_rows} rows "
              f"({written} files)", file=sys.stderr)


if __name__ == "__main__":
    src, dst, k = Path(sys.argv[1]), Path(sys.argv[2]), int(sys.argv[3])
    scale_corpus(src, dst, k)
