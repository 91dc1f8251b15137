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


def schema_drift_report(
    spark, old_path: str, new_path: str
) -> "DataFrame":
    """Schema + volume drift between two table snapshots (e.g. two
    ``io.write_versioned`` versions): added / removed / type-changed
    columns and the row-count delta. Schema comparison is metadata-only
    (parquet footers); the row counts are the only data-touching
    aggregates. The report is the pre-publish gate a pipeline runs
    before promoting a snapshot — pair with ``io.write_audit_publish``
    to block on unexpected drift.
    """
    from pyspark.sql import Row

    old_df = spark.read.parquet(old_path)
    new_df = spark.read.parquet(new_path)
    old_t = {f.name: f.dataType.simpleString() for f in old_df.schema.fields}
    new_t = {f.name: f.dataType.simpleString() for f in new_df.schema.fields}
    rows = []
    for c in sorted(set(old_t) | set(new_t)):
        if c not in old_t:
            rows.append(Row(column=c, kind="added", old_type=None, new_type=new_t[c]))
        elif c not in new_t:
            rows.append(Row(column=c, kind="removed", old_type=old_t[c], new_type=None))
        elif old_t[c] != new_t[c]:
            rows.append(
                Row(column=c, kind="type_changed", old_type=old_t[c], new_type=new_t[c])
            )
    n_old, n_new = old_df.count(), new_df.count()
    rows.append(
        Row(
            column="__rows__",
            kind="row_delta",
            old_type=str(n_old),
            new_type=str(n_new),
        )
    )
    return spark.createDataFrame(
        rows, "column string, kind string, old_type string, new_type string"
    )
