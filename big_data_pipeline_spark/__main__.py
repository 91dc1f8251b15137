"""CLI entry point (SURVEY.md §3 EP2 — the reference's manual
``python -m scripts.stock_ingestor`` path, unified):

    python -m big_data_pipeline_spark pipeline --base-dir /tmp/lake
    python -m big_data_pipeline_spark query q1_pricing_summary [--sf-dir D]
    python -m big_data_pipeline_spark list

One SparkSession per invocation; an external scheduler (or cron) can
call ``pipeline`` repeatedly — every stage write is idempotent.
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

    p_query = sub.add_parser("query", help="run a registered query")
    p_query.add_argument("name")
    p_query.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p_query.add_argument("--limit", type=int, default=20)

    sub.add_parser("list", help="list registered queries")

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
        from big_data_pipeline_spark.pipeline import PipelineConfig, run_pipeline

        cfg = PipelineConfig(
            base_dir=args.base_dir,
            symbols=tuple(args.symbols.split(",")),
            periods=args.periods,
        )
        preds = run_pipeline(spark, cfg)
        for row in preds.collect():
            print(row.asDict())
        return 0

    queries = entrymod.queries()
    if args.name not in queries:
        print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
        return 2
    queries[args.name](spark, args.sf_dir).show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
