"""tools/gen_sf.py: the stress-corpus generator's invariants.

Pure pyarrow/DuckDB — no Spark session, so these stay cheap. The
replication semantics (FK-consistent shifts, token suffixing) carry the
scale-audit's validity: if replicas leaked shared shingles or broke
joins, every sf1/sf10 ratio in SWEEP_SF10_* would measure a corpus
artifact instead of the operator.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from gen_sf import scale_corpus  # noqa: E402

SRC = Path("/root/testdata/sf0.001")


def _build(tmp_path, k=3, n_files=4) -> Path:
    dst = tmp_path / "scaled"
    scale_corpus(SRC, dst, k, n_files=n_files)
    return dst


def test_multifile_layout_and_row_parity(tmp_path):
    """Every scaled table is a DIRECTORY of ~n_files part files whose
    concatenation holds exactly k x base rows (VERDICT r7 item 2: a
    single file capped map parallelism at the row-group count)."""
    dst = _build(tmp_path)
    for table in ("lineitem", "documents", "events"):
        tdir = dst / f"{table}.parquet"
        assert tdir.is_dir()
        parts = sorted(tdir.glob("part-*.parquet"))
        assert 2 <= len(parts) <= 4
        n = sum(pq.read_metadata(p).num_rows for p in parts)
        base = pq.read_table(SRC / f"{table}.parquet").num_rows
        assert n == 3 * base


def test_fk_consistency_survives_replication(tmp_path):
    """Replica k's orders join replica k's customers — no dangling keys,
    no cross-replica joins."""
    dst = _build(tmp_path)
    con = duckdb.connect()
    dangling = con.sql(
        f"""
        SELECT COUNT(*) FROM read_parquet('{dst}/orders.parquet/*.parquet') o
        LEFT JOIN read_parquet('{dst}/customer.parquet/*.parquet') c
          ON o.o_custkey = c.c_custkey
        WHERE c.c_custkey IS NULL
        """
    ).fetchone()[0]
    assert dangling == 0
    per_replica = con.sql(
        f"""
        SELECT COUNT(DISTINCT o_orderkey // (SELECT MAX(o_orderkey) + 1
          FROM read_parquet('{SRC}/orders.parquet')))
        FROM read_parquet('{dst}/orders.parquet/*.parquet')
        """
    ).fetchone()[0]
    assert per_replica == 3


def test_rerun_into_same_dst_clears_stale_parts(tmp_path):
    """ADVICE r8 item 1: re-running scale_corpus into an existing dst
    with a layout that produces FEWER part files must not leave stale
    part-*.parquet behind (globs would double-count rows), and a dst
    holding the old single-file layout must not make mkdir raise."""
    dst = tmp_path / "scaled"
    scale_corpus(SRC, dst, 3, n_files=4)
    first_parts = set((dst / "lineitem.parquet").glob("part-*.parquet"))
    assert len(first_parts) > 2
    # shrink: k=2, n_files=2 -> fewer parts; stale ones must be gone
    scale_corpus(SRC, dst, 2, n_files=2)
    parts = sorted((dst / "lineitem.parquet").glob("part-*.parquet"))
    assert len(parts) <= 2
    n = sum(pq.read_metadata(p).num_rows for p in parts)
    base = pq.read_table(SRC / "lineitem.parquet").num_rows
    assert n == 2 * base
    # old single-FILE layout at the table path must be replaced too
    target = dst / "events.parquet"
    import shutil

    shutil.rmtree(target)
    pq.write_table(pq.read_table(SRC / "events.parquet"), target)
    assert target.is_file()
    scale_corpus(SRC, dst, 2, n_files=2)
    assert target.is_dir()


def test_replicas_share_no_shingles(tmp_path):
    """The token-suffix transform must keep cross-replica docs at
    Jaccard 0: a 10x corpus gains 10x more near-dup clusters of the
    SAME size, not clusters 10x bigger (whose pair output would grow
    ~k^2 as a fixture artifact)."""
    dst = _build(tmp_path)
    con = duckdb.connect()
    base_docs = pq.read_table(SRC / "documents.parquet").num_rows
    shared = con.sql(
        f"""
        WITH toks AS (
          SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t
          FROM read_parquet('{dst}/documents.parquet/*.parquet')
        )
        SELECT COUNT(*) FROM (
          SELECT t FROM toks
          GROUP BY t
          HAVING COUNT(DISTINCT doc_id // {base_docs}) > 1
        )
        """
    ).fetchone()[0]
    assert shared == 0
