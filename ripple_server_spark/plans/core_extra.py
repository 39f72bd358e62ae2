"""Additional relational coverage: set ops beyond union, cube grouping,
lag/lead windows, batch sessionization (gaps-and-islands).

These round out SURVEY.md §2 Table B categories whose primary declared
query covers one representative shape (set ops -> union; grouping sets
-> rollup; windows -> rank/running forms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ripple_server_spark.catalog import load_table
from ripple_server_spark.operators.relational import bucket_of
from ripple_server_spark.plans.registry import query


@query(
    "q_set_intersect_except",
    oracle="""
    SELECT 'both' AS cls, count(*) AS n FROM (
        SELECT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'purchase'
    )
    UNION ALL
    SELECT 'click_only' AS cls, count(*) AS n FROM (
        SELECT user_id FROM events WHERE event_type = 'click'
        EXCEPT
        SELECT user_id FROM events WHERE event_type = 'purchase'
    )
    """,
    tags=("setops",),
)
def q_set_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT (distinct semantics): audience overlap between
    two topics. Plans as left-semi/left-anti over distinct sets — one
    shuffle each on user_id."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    both = clicks.intersect(buys).agg(F.count("*").alias("n")).select(
        F.lit("both").alias("cls"), "n"
    )
    # DataFrame.subtract == EXCEPT DISTINCT (as intersect == DISTINCT)
    only = clicks.subtract(buys).agg(F.count("*").alias("n")).select(
        F.lit("click_only").alias("cls"), "n"
    )
    return both.unionByName(only)


@query(
    "q_cube_type_bucket",
    oracle="""
    SELECT event_type, CAST(user_id % 8 AS BIGINT) AS bucket,
           count(*) AS n, round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY CUBE(event_type, CAST(user_id % 8 AS BIGINT))
    """,
    tags=("agg", "rollup"),
)
def q_cube_type_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (type, bucket): all 4 grouping sets in one pass (the
    expand operator multiplies rows by #sets before the single shuffle —
    at scale prefer independent aggs when only some sets are needed)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type", bucket_of(F.col("user_id")).cast("bigint").alias("bucket"), "value"
        )
        .cube("event_type", "bucket")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


@query(
    "q_window_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           lag(event_id)  OVER (PARTITION BY user_id ORDER BY event_id) AS prev_event_id,
           lead(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS next_event_id,
           round(value - lag(value) OVER (PARTITION BY user_id ORDER BY event_id), 2)
               AS value_delta
    FROM events
    """,
    tags=("window",),
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over the per-user event log: neighbor sequence ids and
    value deltas (the cursor-stepping analog of the consumer loop)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.lag("event_id").over(w).alias("prev_event_id"),
        F.lead("event_id").over(w).alias("next_event_id"),
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("value_delta"),
    )


@query(
    "q_sessionize_users",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL '30 minutes'
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ),
    sess AS (
        SELECT user_id, ts, event_id,
               CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id, count(*) AS n_events,
           epoch_us(min(ts)) AS session_start_us,
           epoch_us(max(ts)) AS session_end_us
    FROM sess
    GROUP BY user_id, session_id
    """,
    tags=("window", "streaming"),
)
def q_sessionize_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands, 30 min gap): the batch
    analog of session_window streaming aggregation (streaming/api.py
    sessionized). Two windows + one aggregate, all partitioned by
    user_id — a single shuffle."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # microsecond-exact gap comparison (second-granularity casts would
    # disagree with the oracle's interval comparison at the boundary)
    lag_us = F.lag(F.unix_micros("ts")).over(w)
    is_new = (
        lag_us.isNull() | (F.unix_micros("ts") - lag_us > 30 * 60 * 1_000_000)
    ).cast("int")
    return (
        ev.select("user_id", "ts", "event_id", is_new.alias("is_new"))
        .withColumn("session_id", F.sum("is_new").over(run))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.unix_micros(F.min("ts")).alias("session_start_us"),
            F.unix_micros(F.max("ts")).alias("session_end_us"),
        )
    )
