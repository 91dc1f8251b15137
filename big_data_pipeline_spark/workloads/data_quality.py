"""Data-quality suite over orders as an oracle-checked query."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from big_data_pipeline_spark.io import read_table
from big_data_pipeline_spark.quality import (
    expect_accepted_values,
    expect_between,
    expect_not_null,
    expect_unique,
    run_expectations,
)

_STATUSES = ["O", "F", "P"]


def dq_orders_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass expectation suite on orders (see quality/expectations.py:
    all checks fuse into a single aggregation job)."""
    orders = read_table(spark, sf_dir, "orders")
    return run_expectations(
        orders,
        [
            expect_not_null("o_custkey"),
            expect_unique("o_orderkey"),
            expect_between("o_totalprice", 0.0, 1e7),
            expect_accepted_values("o_orderstatus", _STATUSES),
        ],
    )


_DQ_SQL = """
WITH agg AS (
  SELECT COUNT(*) AS n_rows,
         COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS v_null,
         COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS v_uniq,
         COUNT(CASE WHEN NOT (o_totalprice BETWEEN 0.0 AND 1e7) THEN 1 END) AS v_range,
         COUNT(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                      OR o_orderstatus IS NULL THEN 1 END) AS v_vals
  FROM orders
)
SELECT r.check, r.violations, agg.n_rows, r.violations = 0 AS passed
FROM agg, (
  SELECT 'not_null_o_custkey' AS check, v_null AS violations FROM agg
  UNION ALL SELECT 'unique_o_orderkey', v_uniq FROM agg
  UNION ALL SELECT 'between_o_totalprice', v_range FROM agg
  UNION ALL SELECT 'accepted_o_orderstatus', v_vals FROM agg
) r
"""


QUERIES = {"dq_orders_report": dq_orders_report}
ORACLE = {"dq_orders_report": _DQ_SQL}
