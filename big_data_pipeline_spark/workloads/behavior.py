"""Behavioral analytics over the events stream: funnels and cohorts.

The two workhorse product-analytics shapes a clickstream warehouse
runs daily, both oracle-checked cell-exact:

- ``funnel_conversion``: strictly-ordered step funnel
  (view → click → purchase). Each step is "first qualifying event at
  or after the user's previous step time". One events scan, one hash
  shuffle on user_id: the step times are three stacked unordered
  window aggregates behind a single exchange, then a per-user reduce
  and a global non-null count.
- ``cohort_retention``: users cohorted by first-active day, counted by
  day offset. Two grouped passes (first-day, distinct active days) and
  one join, keyed on the bounded user_id space — the fact-sized
  shuffle is the distinct, which AQE coalesces.

Scale notes (100 TB): the funnel's only shuffle moves the
type-filtered events once; cohort reduces events to per-user /
per-(user, day) rows before its join, so join inputs are |users|, not
|events|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_pipeline_spark.io import read_table

_FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE events scan, ONE shuffle: the three step times are stacked
    # unordered window aggregates over the same user partitioning (each
    # step's condition references the previous step's column, so Spark
    # plans three Window operators behind a single exchange), then one
    # per-user reduce and a global count of non-null steps.
    s1, s2, s3 = _FUNNEL_STEPS
    w = Window.partitionBy("user_id")
    per_event = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(*_FUNNEL_STEPS))
        .select("user_id", "event_type", "ts")
        .withColumn(
            "t1", F.min(F.when(F.col("event_type") == s1, F.col("ts"))).over(w)
        )
        .withColumn(
            "t2",
            F.min(
                F.when(
                    (F.col("event_type") == s2) & (F.col("ts") >= F.col("t1")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t3",
            F.min(
                F.when(
                    (F.col("event_type") == s3) & (F.col("ts") >= F.col("t2")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = per_event.groupBy("user_id").agg(
        F.first("t1").alias("t1"),
        F.first("t2").alias("t2"),
        F.first("t3").alias("t3"),
    )
    return per_user.agg(
        F.count("t1").alias("n_step1"),
        F.count("t2").alias("n_step2"),
        F.count("t3").alias("n_step3"),
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


def sequence_pattern_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence detection without the syntax:
    serialize each user's time-ordered event types into one string
    (order pinned by (ts, event_id)), then count regex occurrences of
    the behavioral pattern — here non-overlapping view→click→purchase
    runs with anything in between within the run's user. Counting over
    the serialized sequence is the classic poor-man's CEP; the per-user
    string is bounded by the user's event count, and the heavy lifting
    (ordering) is one window shuffle.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seqs = (
        read_table(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .groupBy("user_id")
        .agg(
            F.concat_ws(
                ",", F.array_sort(F.collect_list(F.struct("rn", "event_type")))
                .getField("event_type")
            ).alias("seq")
        )
    )
    pat = "view,(?:[a-z]+,)*?click,(?:[a-z]+,)*?purchase"
    return (
        seqs.select(
            "user_id",
            F.regexp_count(F.col("seq"), F.lit(pat))
            .cast("long")  # DuckDB len() is BIGINT
            .alias("n_conversions"),
        )
        .filter(F.col("n_conversions") > 0)
    )


_SEQ_SQL = """
WITH seqs AS (
  SELECT user_id,
         string_agg(event_type, ',' ORDER BY ts, event_id) AS seq
  FROM events GROUP BY user_id
)
SELECT user_id,
       len(regexp_extract_all(seq,
           'view,(?:[a-z]+,)*?click,(?:[a-z]+,)*?purchase'))
         AS n_conversions
FROM seqs
WHERE len(regexp_extract_all(seq,
      'view,(?:[a-z]+,)*?click,(?:[a-z]+,)*?purchase')) > 0
"""


QUERIES = {
    "funnel_conversion": funnel_conversion,
    "cohort_retention": cohort_retention,
    "sequence_pattern_counts": sequence_pattern_counts,
}

ORACLE = {
    "funnel_conversion": _FUNNEL_SQL,
    "cohort_retention": _COHORT_SQL,
    "sequence_pattern_counts": _SEQ_SQL,
}
