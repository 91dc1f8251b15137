"""Scale toolbox: salting equivalence + bucketed co-located joins."""

from __future__ import annotations

import io as _io
import contextlib

from pyspark.sql import functions as F

from big_data_pipeline_spark.io import read_table, write_bucketed
from big_data_pipeline_spark.operators.skew import salted_aggregate, salted_join


def test_salted_aggregate_equals_plain(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    got = (
        salted_aggregate(
            li,
            ["l_returnflag"],
            {"n": ("count", "*"), "s_min": ("min", "l_quantity")},
            n_salts=7,
        )
        .toPandas()
        .set_index("l_returnflag")
        .sort_index()
    )
    want = (
        li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.min("l_quantity").alias("s_min"))
        .toPandas()
        .set_index("l_returnflag")
        .sort_index()
    )
    assert got.equals(want)


def test_salted_join_equals_plain(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id")
    dim = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    got = salted_join(ev, dim, on=["user_id"], n_salts=5)
    want = ev.join(dim, "user_id")
    assert got.count() == want.count()
    assert got.exceptAll(want.select(*got.columns)).count() == 0


def _plan_of(df) -> str:
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "b_orders", "o_orderkey", 8, sort_cols="o_orderkey")
    write_bucketed(lineitem, "b_lineitem", "l_orderkey", 8, sort_cols="l_orderkey")
    # disable broadcast so the bucketed sort-merge path is chosen (at
    # test scale every table fits the broadcast threshold)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = _plan_of(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # co-located storage: the join needs NO shuffle on either side
        assert "Exchange" not in plan
        assert plan.count("Bucketed: true") == 2
        # row parity with the unbucketed join
        want = lineitem.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        ).count()
        assert joined.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_dynamic_partition_pruning_fires(spark, sf_dir, tmp_path):
    """DPP evidence: joining a partitioned fact against a filtered dim
    must inject a runtime partition filter into the fact scan
    (dynamicpruning expression) so only matching partitions are read —
    the mechanism that keeps dim-filtered fact scans sub-linear on a
    date/key-partitioned 100 TB lake."""
    import contextlib
    import io as _io

    from pyspark.sql import functions as F

    from big_data_pipeline_spark.io import read_table, write_parquet

    fact_path = str(tmp_path / "orders_by_priority")
    orders = read_table(spark, sf_dir, "orders")
    write_parquet(orders, fact_path, partition_by="o_orderpriority")

    dim = spark.createDataFrame(
        [("1-URGENT", "hot"), ("5-LOW", "cold")], "o_orderpriority string, tier string"
    ).filter(F.col("tier") == "hot")

    fact = spark.read.parquet(fact_path)
    joined = fact.join(dim, "o_orderpriority").groupBy("tier").count()

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    assert "dynamicpruning" in plan.lower()
    rows = joined.collect()
    assert rows and rows[0]["count"] > 0


def test_assemble_sf10_merges_prev_and_flags_over_threshold(tmp_path):
    """tools/assemble_sf10.py: cumulative merge with the previous
    round's artifact, isolated re-measure overrides the batch ratio,
    and the exit code flags any query still over threshold."""
    import json
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    sf1 = tmp_path / "sf1.json"
    sf10 = tmp_path / "sf10.json"
    prev = tmp_path / "prev.json"
    out = tmp_path / "out.json"
    sf1.write_text(json.dumps({"queries": {"qa": 1.0, "qb": 2.0}}))
    # qa batch-flags at 15x but the isolated re-measure clears it
    sf10.write_text(json.dumps({"queries": {"qa": 15.0, "qb": 8.0}}))
    prev.write_text(
        json.dumps(
            {"results": {"old": {"sf1_sec": 1.0, "sf10_sec": 5.0, "ratio": 5.0}}}
        )
    )
    r = subprocess.run(
        [
            sys.executable,
            str(repo / "tools/assemble_sf10.py"),
            str(out),
            "test artifact",
            str(sf1),
            str(sf10),
            "--prev",
            str(prev),
            "--isolated",
            "qa=1.0:6.0",
        ],
        capture_output=True,
        text=True,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    art = json.loads(out.read_text())
    assert art["n_queries"] == 3  # cumulative: old + qa + qb
    assert art["over_12x"] == []
    assert art["results"]["qa"]["isolated_ratio"] == 6.0
    assert art["results"]["qa"]["ratio"] == 15.0  # batch number kept
    # without the isolated override the same inputs must FAIL loudly
    r2 = subprocess.run(
        [
            sys.executable,
            str(repo / "tools/assemble_sf10.py"),
            str(tmp_path / "out2.json"),
            "test artifact",
            str(sf1),
            str(sf10),
        ],
        capture_output=True,
        text=True,
    )
    assert r2.returncode == 1
    assert "qa" in json.loads((tmp_path / "out2.json").read_text())["over_12x"]
