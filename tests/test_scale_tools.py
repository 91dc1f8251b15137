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
