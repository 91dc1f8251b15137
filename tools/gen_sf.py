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
- documents: doc_id shifted; replicas >0 get a ' r{i}' suffix so the
  corpus gains NEAR-duplicates (high-Jaccard shingle overlap), which
  keeps MinHash/SimHash candidate structure realistic instead of
  exploding exact-dup groups; n_chars recomputed to stay consistent.
- embeddings: vec_id shifted, vectors copied (duplicate vectors only
  change scores, not kernel cost).

Usage: python tools/gen_sf.py SRC_DIR DST_DIR K
e.g.   python tools/gen_sf.py /root/testdata/sf0.1 /root/repo/.bench/sf1 10
"""

from __future__ import annotations

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
            idx = t.schema.get_field_index("text")
            text = pc.binary_join_element_wise(
                t.column("text").cast(pa.string()), f" r{i}", ""
            )
            t = t.set_column(idx, t.schema.field(idx), text)
    if table == "documents":
        nidx = t.schema.get_field_index("n_chars")
        n = pc.utf8_length(t.column("text").cast(pa.string()))
        t = t.set_column(nidx, t.schema.field(nidx), n.cast(t.schema.field(nidx).type))
    return t


def scale_corpus(src: Path, dst: Path, k: int) -> None:
    dst.mkdir(parents=True, exist_ok=True)
    units = _shift_units(src)
    for table in FIXED:
        pq.write_table(pq.read_table(src / f"{table}.parquet"), dst / f"{table}.parquet")
    for table in _SHIFTS:
        base = pq.read_table(src / f"{table}.parquet")
        parts = [_replica(table, base, i, units) for i in range(k)]
        out = pa.concat_tables(parts, promote_options="none")
        pq.write_table(out, dst / f"{table}.parquet")
        print(f"{table}: {base.num_rows} -> {out.num_rows} rows", file=sys.stderr)


if __name__ == "__main__":
    src, dst, k = Path(sys.argv[1]), Path(sys.argv[2]), int(sys.argv[3])
    scale_corpus(src, dst, k)
