"""Declarative data-quality checks (the great_expectations intent).

The reference's docker-compose pip-installs ``great_expectations``
but no code ever imports it (reference ``docker-compose.yml:32`` — an
unrealized intent, see SURVEY.md §0). This module realizes that intent
Spark-natively: a check is a named aggregate expression, a suite runs
as ONE job over the table (all checks fused into a single pass —
Catalyst computes every conditional count in the same partial/final
aggregation), and the result is a tidy report DataFrame a pipeline can
gate on.

Scale notes: one full-scan pass per suite regardless of check count;
no per-check jobs, no driver-side row inspection. Uniqueness is the
one check that needs a shuffle (count distinct); it shares the same
single aggregation via Spark's multiple-distinct rewrite.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One named check: ``violations`` counts offending rows."""

    name: str
    violations: Column


def expect_not_null(col: str) -> Expectation:
    return Expectation(
        f"not_null_{col}",
        F.count_if(F.col(col).isNull()),
    )


def expect_unique(col: str) -> Expectation:
    # violations = rows beyond the first per value (0 when unique)
    return Expectation(
        f"unique_{col}",
        F.count(col) - F.count_distinct(F.col(col)),
    )


def expect_between(col: str, lo: float, hi: float) -> Expectation:
    return Expectation(
        f"between_{col}",
        F.count_if(~F.col(col).between(lo, hi)),
    )


def expect_accepted_values(col: str, values: list[str]) -> Expectation:
    return Expectation(
        f"accepted_{col}",
        F.count_if(~F.col(col).isin(values) | F.col(col).isNull()),
    )


def run_expectations(df: DataFrame, checks: list[Expectation]) -> DataFrame:
    """(check, violations, n_rows, passed) — one aggregation job total."""
    agg = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[c.violations.alias(c.name) for c in checks],
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(c.name).alias("check"),
                F.col(c.name).cast("long").alias("violations"),
            )
            for c in checks
        ]
    )
    return agg.select(F.col("n_rows"), F.explode(pairs).alias("r")).select(
        F.col("r.check").alias("check"),
        F.col("r.violations").alias("violations"),
        "n_rows",
        (F.col("r.violations") == 0).alias("passed"),
    )
