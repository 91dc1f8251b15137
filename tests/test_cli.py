"""CLI entry point (EP2): list / query / pipeline subcommands."""

from __future__ import annotations

from big_data_pipeline_spark.__main__ import main


def test_cli_list(capsys, spark):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "q1_pricing_summary\tsql-checked" in out
    assert "knn_lsh_topk\trows-only" in out


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
