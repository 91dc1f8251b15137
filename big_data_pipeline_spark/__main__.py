"""CLI entry point (SURVEY.md §3 EP2 — the reference's manual
``python -m scripts.stock_ingestor`` path, unified):

    python -m big_data_pipeline_spark pipeline --base-dir /tmp/lake
    python -m big_data_pipeline_spark pipeline --base-dir D --stage transform
    python -m big_data_pipeline_spark query q1_pricing_summary [--sf-dir D]
    python -m big_data_pipeline_spark sql "SELECT count(*) FROM lineitem"
    python -m big_data_pipeline_spark list

One SparkSession per invocation; an external scheduler (or cron) can
call ``pipeline`` repeatedly — every stage write is idempotent, and
``--stage`` exposes each DAG node as its own verb so an Airflow-style
scheduler owns the dependency chain while this process owns exactly one
task instance (G2; reference ``dags/stock_pipeline_dag.py:29-50``).
``--retries/--retry-delay-sec`` apply the reference's retry policy
(``:17-18``) in-process.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="big_data_pipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    p_pipe = sub.add_parser("pipeline", help="run ingest>>transform>>combine>>predict")
    p_pipe.add_argument("--base-dir", required=True)
    p_pipe.add_argument("--symbols", default="AAPL,MSFT,GOOG")
    p_pipe.add_argument("--periods", type=int, default=210)
    p_pipe.add_argument(
        "--stage",
        choices=["ingest", "transform", "combine", "predict"],
        help="run ONE stage (external-scheduler mode); default: whole DAG",
    )
    p_pipe.add_argument("--retries", type=int, default=1)
    p_pipe.add_argument("--retry-delay-sec", type=float, default=300.0)

    p_query = sub.add_parser("query", help="run a registered query")
    p_query.add_argument("name")
    p_query.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p_query.add_argument("--limit", type=int, default=20)
    p_query.add_argument(
        "--explain",
        action="store_true",
        help="print the formatted physical plan instead of rows",
    )

    sub.add_parser("list", help="list registered queries")

    p_sql = sub.add_parser("sql", help="run ad-hoc SQL over the corpus tables")
    p_sql.add_argument("statement")
    p_sql.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p_sql.add_argument("--limit", type=int, default=20)

    args = p.parse_args(argv)

    import __spark_entry__ as entrymod

    if args.cmd == "list":
        oracle = entrymod.oracle_sql()
        for name in entrymod.queries():
            tag = "sql-checked" if name in oracle else "rows-only"
            print(f"{name}\t{tag}")
        return 0

    from big_data_pipeline_spark.session import get_spark

    spark = get_spark("cli")
    if args.cmd == "pipeline":
        from big_data_pipeline_spark import pipeline as pmod
        from big_data_pipeline_spark.scheduler import (
            RetryPolicy,
            run_pipeline_with_retries,
            run_stage_with_retries,
        )

        cfg = pmod.PipelineConfig(
            base_dir=args.base_dir,
            symbols=tuple(args.symbols.split(",")),
            periods=args.periods,
        )
        policy = RetryPolicy(
            retries=args.retries, retry_delay_sec=args.retry_delay_sec
        )
        if args.stage:
            fn = getattr(pmod, args.stage)
            run = run_stage_with_retries(
                args.stage, lambda: fn(spark, cfg), policy
            )
            print(
                f"{run.name}: attempts={run.attempts} "
                f"ok={run.succeeded} ({run.elapsed_sec:.1f}s)"
                + (f" err={run.error}" if run.error else "")
            )
            return 0 if run.succeeded else 1
        report = run_pipeline_with_retries(spark, cfg, policy)
        for run in report.runs:
            print(
                f"{run.name}: attempts={run.attempts} ok={run.succeeded} "
                f"({run.elapsed_sec:.1f}s)"
            )
        if not report.succeeded:
            return 1
        preds = spark.read.parquet(cfg.layer("predictions"))
        for row in preds.collect():
            print(row.asDict())
        return 0

    if args.cmd == "sql":
        from big_data_pipeline_spark.io import register_views

        names = register_views(spark, args.sf_dir)
        if not names:
            print(f"no corpus tables found in {args.sf_dir}", file=sys.stderr)
            return 2
        spark.sql(args.statement).show(args.limit, truncate=False)
        return 0

    queries = entrymod.queries()
    if args.name not in queries:
        print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
        return 2
    df = queries[args.name](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
        return 0
    df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
