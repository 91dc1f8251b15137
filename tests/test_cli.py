"""CLI entry point (EP2): list / query / pipeline subcommands."""

from __future__ import annotations

from big_data_pipeline_spark.__main__ import main


def test_cli_list(capsys, spark):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "q1_pricing_summary\tsql-checked" in out
    # knn_lsh_topk graduated to sql-checked in r6 (full-replay twin);
    # IVF stays rows-only (data-dependent k-means centroids)
    assert "knn_lsh_topk\tsql-checked" in out
    assert "knn_ivf_topk\trows-only" in out


def test_cli_query_runs(capsys, spark):
    assert main(["query", "topk_orders"]) == 0
    assert "o_orderkey" in capsys.readouterr().out


def test_cli_unknown_query(capsys, spark):
    assert main(["query", "nope"]) == 2


def test_cli_pipeline(capsys, spark, tmp_path):
    assert (
        main(["pipeline", "--base-dir", str(tmp_path), "--periods", "30"]) == 0
    )
    out = capsys.readouterr().out
    assert "predicted_close" in out


def test_cli_sql_verb(capsys):
    from big_data_pipeline_spark.__main__ import main

    rc = main(
        [
            "sql",
            "SELECT COUNT(*) AS n FROM lineitem JOIN orders "
            "ON l_orderkey = o_orderkey",
            "--sf-dir",
            "/root/testdata/sf0.001",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0 and "n" in out


def test_register_views_lists_tables(spark):
    from big_data_pipeline_spark.io import register_views

    names = register_views(spark, "/root/testdata/sf0.001")
    assert "lineitem" in names and "documents" in names
    assert spark.sql("SELECT COUNT(*) FROM nation").first()[0] == 25
