"""Time-series join workload: as-of join and band (range) join.

These are the classic time-series operators Spark lacks natively;
the engine composes them from shuffle-bounded primitives
(operators/asof.py, operators/ranges.py). DuckDB *does* have native
ASOF JOIN and IEJoin, which makes the oracles short and genuinely
independent implementations — a strong cross-check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_pipeline_spark.io import read_table
from big_data_pipeline_spark.operators import asof_join, range_join_binned

# --- as-of join: last purchase value at or before each event ----------------


def asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("last_purchase_value")
    )
    left = events.select("event_id", "user_id", "ts", "event_type")
    return asof_join(
        left,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["last_purchase_value"],
    )


_ASOF_SQL = """
SELECT e.event_id, e.user_id, e.ts, e.event_type, p.value AS last_purchase_value
FROM events e
ASOF LEFT JOIN (
  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
) p ON e.user_id = p.user_id AND e.ts >= p.ts
"""


# --- band join: purchases within 5 minutes after each error -----------------


def range_error_purchase_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), F.col("ts").alias("error_ts")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("purchase_ts")
    )
    joined = range_join_binned(
        errors,
        purchases,
        left_ts="error_ts",
        right_ts="purchase_ts",
        lower_sec=0,
        upper_sec=300,
    )
    return joined.groupBy("error_id").agg(
        F.count(F.lit(1)).alias("n_purchases_5min")
    )


_RANGE_SQL = """
SELECT e.event_id AS error_id, COUNT(*) AS n_purchases_5min
FROM events e
JOIN events p
  ON p.event_type = 'purchase'
 AND epoch_us(p.ts) >= epoch_us(e.ts)
 AND epoch_us(p.ts) < epoch_us(e.ts) + 300 * 1000000
WHERE e.event_type = 'error'
GROUP BY e.event_id
"""


_GAP_USERS = 20


def gap_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly spine + forward fill: the canonical time-series
    regularization (missing hours materialized, last observation
    carried forward). Spine = distinct keys x sequence(min_hour,
    max_hour) — generated, not scanned; the global bounds are a 1-row
    broadcast. Fill is last(ignorenulls) over an unbounded-preceding
    frame: one shuffle on the key, one sorted pass per partition.
    DuckDB twin uses generate_series + last_value IGNORE NULLS."""
    events = read_table(spark, sf_dir, "events").filter(
        F.col("user_id") < _GAP_USERS
    )
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = (
        events.select("user_id")
        .distinct()
        .join(F.broadcast(bounds))
        .select(
            "user_id",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour_ts"),
        )
    )
    hourly = events.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return spine.join(hourly, ["user_id", "hour_ts"], "left").select(
        "user_id",
        "hour_ts",
        "n",
        F.last("n", ignorenulls=True).over(w).alias("n_ffill"),
    )


_GAP_FILL_SQL = f"""
WITH ev AS (SELECT * FROM events WHERE user_id < {_GAP_USERS}),
spine AS (
  SELECT user_id, unnest(generate_series(
      (SELECT date_trunc('hour', min(ts)) FROM ev),
      (SELECT date_trunc('hour', max(ts)) FROM ev),
      INTERVAL 1 HOUR)) AS hour_ts
  FROM (SELECT DISTINCT user_id FROM ev)
),
hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS hour_ts, COUNT(*) AS n
  FROM ev GROUP BY 1, 2
)
SELECT s.user_id, s.hour_ts, h.n,
       last_value(h.n IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.hour_ts
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_ffill
FROM spine s
LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hour_ts = h.hour_ts
"""


# --- seasonal_residual_outliers: seasonal-profile anomaly detection ---------
# Additive seasonal decomposition with a fixed daily period: the
# (event_type, hour-of-day) mean is the seasonal profile; events whose
# residual |value − seasonal_mean| exceeds 2 profile-sigmas are
# anomalies AGAINST THEIR TIME-OF-DAY NORM — the detector that catches
# a quiet-hour spike a global z-score (zscore_outlier_orders) dilutes
# away. Two-pass shape: one map-side-combinable moment aggregation per
# (type, hour) — 24×|types| rows — broadcast back, residual computed
# row-side from a SHARED formula text. The value sums route through
# DECIMAL(38,6) (order-insensitive) and both engines evaluate the same
# expression string, so flags and residual doubles hash-match.

_SEAS = "(value - s / n)"
_SEAS_SIG = "sqrt((ss - s * s / n) / n)"
_SEAS_K = 2.0


def seasonal_residual_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_pipeline_spark.oracle import DEC

    events = read_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value", F.hour("ts").alias("hod")
    )
    prof = events.groupBy("event_type", "hod").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("s"),
        F.sum((F.col("value") * F.col("value")).cast(DEC))
        .cast("double")
        .alias("ss"),
    )
    return (
        events.join(F.broadcast(prof), ["event_type", "hod"])
        .withColumn("seasonal_mean", F.expr("s / n"))
        .withColumn("residual", F.expr(_SEAS))
        .filter(F.expr(f"ABS({_SEAS}) > {_SEAS_K} * {_SEAS_SIG}"))
        .select(
            "event_id", "event_type", "hod", "value", "seasonal_mean", "residual"
        )
    )


def _seasonal_sql() -> str:
    from big_data_pipeline_spark.oracle import _dec_to_double_sql

    s = _dec_to_double_sql("SUM(CAST(value AS DECIMAL(38,6)))")
    ss = _dec_to_double_sql("SUM(CAST(value * value AS DECIMAL(38,6)))")
    return f"""
WITH e AS (
  SELECT event_id, event_type, value, hour(ts) AS hod FROM events
),
prof AS (
  SELECT event_type, hod,
         CAST(COUNT(*) AS DOUBLE) AS n,
         {s} AS s,
         {ss} AS ss
  FROM e GROUP BY event_type, hod
)
SELECT event_id, e.event_type, e.hod, value,
       s / n AS seasonal_mean,
       {_SEAS} AS residual
FROM e JOIN prof p ON e.event_type = p.event_type AND e.hod = p.hod
WHERE ABS({_SEAS}) > {_SEAS_K} * {_SEAS_SIG}
"""


# --- cusum_changepoint_per_user: offline changepoint detection --------------
# The classic CUSUM statistic (Page 1954): for each user's time-ordered
# value series, the candidate changepoint is the position maximizing
# |S_i - (i/n) * S_n| — how far the running sum strays from the straight
# line a stationary series would follow. Telemetry/drift monitoring over
# a 100 TB event log runs exactly this shape.
#
# Determinism: running and total sums accumulate as DECIMAL(38,6)
# (order-insensitive), convert once to double, and both engines evaluate
# the IDENTICAL deviation text; the argmax tie-breaks on (ts, event_id)
# so equal deviations pick the same row. Scale: two window passes over
# hash(user_id) — high-cardinality partitions, no global window, no
# join; the final argmax is a WindowGroupLimit-style rank filter.

_CUSUM_DEV = "abs(cum - i * total / n)"


def cusum_changepoint_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_all = Window.partitionBy("user_id")
    scored = events.select(
        "user_id",
        "ts",
        "event_id",
        F.row_number().over(w_ord).alias("i"),
        F.sum(F.col("value").cast("decimal(38,6)"))
        .over(w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("cum"),
        F.sum(F.col("value").cast("decimal(38,6)"))
        .over(w_all)
        .cast("double")
        .alias("total"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    ).withColumn("dev", F.expr(_CUSUM_DEV))
    w_pick = Window.partitionBy("user_id").orderBy(
        F.desc("dev"), "ts", "event_id"
    )
    return (
        scored.withColumn("rn", F.row_number().over(w_pick))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("ts").alias("change_ts"),
            F.col("event_id").alias("change_event_id"),
            F.col("n").alias("n_events"),
            F.col("dev").alias("max_cusum_dev"),
        )
    )


_CUSUM_SQL = f"""
WITH scored AS (
  SELECT user_id, ts, event_id,
         ROW_NUMBER() OVER w_ord AS i,
         CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS VARCHAR) AS DOUBLE) AS cum,
         CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
           PARTITION BY user_id
         ) AS VARCHAR) AS DOUBLE) AS total,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM events
  WINDOW w_ord AS (PARTITION BY user_id ORDER BY ts, event_id)
),
dev AS (
  SELECT *, {_CUSUM_DEV} AS dev FROM scored
),
picked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY user_id ORDER BY dev DESC, ts, event_id) AS rn
  FROM dev
)
SELECT user_id, ts AS change_ts, event_id AS change_event_id,
       n AS n_events, dev AS max_cusum_dev
FROM picked WHERE rn = 1
"""


QUERIES = {
    "gap_fill_forward": gap_fill_forward,
    "asof_last_purchase": asof_last_purchase,
    "range_error_purchase_counts": range_error_purchase_counts,
    "seasonal_residual_outliers": seasonal_residual_outliers,
    "cusum_changepoint_per_user": cusum_changepoint_per_user,
}

ORACLE = {
    "gap_fill_forward": _GAP_FILL_SQL,
    "asof_last_purchase": _ASOF_SQL,
    "range_error_purchase_counts": _RANGE_SQL,
    "seasonal_residual_outliers": _seasonal_sql(),
    "cusum_changepoint_per_user": _CUSUM_SQL,
}
