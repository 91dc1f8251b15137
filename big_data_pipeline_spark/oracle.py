"""Oracle-parity expression helpers.

The driver cross-checks every query against DuckDB with an
order-insensitive value hash (see ``__spark_entry__.py``). Floating-point
SUM/AVG are order-sensitive, and Spark's partial aggregation order is
nondeterministic — so any query whose output contains a raw double sum
can hash-mismatch even when "correct".

Fix: route every checked sum through exact DECIMAL arithmetic. Per-row
double arithmetic (products, 1-x) is IEEE-754 and bit-identical across
engines; the row value is then cast to DECIMAL(38,6) (identical
round-to-nearest in both engines for random doubles), summed exactly,
and only the final result is cast back to double. Averages divide the
exact decimal sum by the count in double — a single deterministic
division. SURVEY.md §7.4 ("DuckDB↔Spark float/hash parity") is the
design note behind this module.

Column helpers build Spark Columns (call inside a query function, with
an active session); ``*_sql`` helpers emit the equivalent ANSI fragment
for the DuckDB oracle, so query and oracle share one definition.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


# DuckDB's direct DECIMAL→DOUBLE cast is NOT correctly rounded once the
# decimal's digits exceed double precision (observed: 1-ulp error on a
# 20-digit DECIMAL(38,0) at sf0.1 — the int128 is converted piecewise).
# Spark's cast (BigDecimal.doubleValue) IS correctly rounded. Routing
# the oracle's cast through VARCHAR (exact digits → strtod, correctly
# rounded) makes both engines bit-identical at ANY magnitude.


def _dec_to_double_sql(inner: str) -> str:
    return f"CAST(CAST({inner} AS VARCHAR) AS DOUBLE)"


def exact_sum(expr_sql: str, alias: str) -> Column:
    """Order-insensitive SUM of a double expression, returned as double."""
    return F.sum(F.expr(expr_sql).cast(DEC)).cast("double").alias(alias)


def exact_sum_sql(expr_sql: str, alias: str) -> str:
    inner = f"SUM(CAST({expr_sql} AS DECIMAL(38,6)))"
    return f"{_dec_to_double_sql(inner)} AS {alias}"


def exact_avg(expr_sql: str, alias: str) -> Column:
    """Order-insensitive AVG: exact decimal sum / count, one double divide."""
    return (
        F.sum(F.expr(expr_sql).cast(DEC)).cast("double") / F.count(F.lit(1))
    ).alias(alias)


def exact_avg_sql(expr_sql: str, alias: str) -> str:
    inner = f"SUM(CAST({expr_sql} AS DECIMAL(38,6)))"
    return f"{_dec_to_double_sql(inner)} / COUNT(*) AS {alias}"
