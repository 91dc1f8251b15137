"""Behavioral analytics over the events stream: funnels and cohorts.

The two workhorse product-analytics shapes a clickstream warehouse
runs daily, both oracle-checked cell-exact:

- ``funnel_conversion``: strictly-ordered step funnel
  (view → click → purchase). Each step is "first qualifying event at
  or after the user's previous step time" — the standard unordered-
  window funnel definition. Three grouped min-aggregates chained by
  broadcast-sized joins on user_id; the events fact is scanned once
  per step with the step's type filter pushed to the parquet scan.
- ``cohort_retention``: users cohorted by first-active day, counted by
  day offset. Two grouped passes (first-day, distinct active days) and
  one join, keyed on the bounded user_id space — the fact-sized
  shuffle is the distinct, which AQE coalesces.

Scale notes (100 TB): both queries reduce events to per-user rows
before any join, so join inputs are |users|, not |events|. Funnel
steps broadcast the prior step's (user, ts) frame when it fits;
cohort's distinct-(user, day) is the only full shuffle and is exactly
the minimal state the metric needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_pipeline_spark.io import read_table

_FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    s1, s2, s3 = _FUNNEL_STEPS
    step1 = (
        events.filter(F.col("event_type") == s1)
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    step2 = (
        events.filter(F.col("event_type") == s2)
        .join(F.broadcast(step1), "user_id")
        .filter(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    step3 = (
        events.filter(F.col("event_type") == s3)
        .join(F.broadcast(step2), "user_id")
        .filter(F.col("ts") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        step1.agg(F.count(F.lit(1)).alias("n_step1"))
        .crossJoin(step2.agg(F.count(F.lit(1)).alias("n_step2")))
        .crossJoin(step3.agg(F.count(F.lit(1)).alias("n_step3")))
    )


_FUNNEL_SQL = """
WITH step1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
step2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN step1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts >= t1
  GROUP BY e.user_id
),
step3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN step2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= t2
  GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM step1) AS n_step1,
       (SELECT COUNT(*) FROM step2) AS n_step2,
       (SELECT COUNT(*) FROM step3) AS n_step3
"""


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    first_day = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    active = events.select(
        "user_id", F.to_date("ts").alias("active_day")
    ).distinct()
    return (
        active.join(F.broadcast(first_day), "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("active_day", "cohort_day").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


_COHORT_SQL = """
WITH first_day AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
  FROM events GROUP BY user_id
),
active AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_day FROM events
)
SELECT cohort_day,
       date_diff('day', cohort_day, active_day) AS day_offset,
       COUNT(*) AS n_users
FROM active JOIN first_day USING (user_id)
GROUP BY cohort_day, day_offset
"""


QUERIES = {
    "funnel_conversion": funnel_conversion,
    "cohort_retention": cohort_retention,
}

ORACLE = {
    "funnel_conversion": _FUNNEL_SQL,
    "cohort_retention": _COHORT_SQL,
}
