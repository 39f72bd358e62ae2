"""Coverage: full-outer join reconciliation and per-bucket sequence-gap
detection.

q_seq_gap_detection is pub/sub domain logic: the reference's delivery
is at-least-once with racy offset commits (`internal/broker/consumer/
server/core.go:61-62`), so a consumer auditing a bucket's ``seq`` space
for holes is the natural log-integrity check. The reference cannot
express it (opaque byte ranges only); here it's a lag() window per
bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ripple_server_spark.catalog import load_table
from ripple_server_spark.plans.registry import query


@query(
    "q_join_full_outer",
    oracle="""
    WITH c AS (
      SELECT CAST(ts AS DATE) AS day, count(*) AS n_clicks
      FROM events WHERE event_type = 'click' GROUP BY day
    ),
    p AS (
      SELECT CAST(ts AS DATE) AS day, count(*) AS n_purchases
      FROM events WHERE event_type = 'purchase' GROUP BY day
    )
    SELECT coalesce(c.day, p.day) AS day,
           coalesce(n_clicks, 0) AS n_clicks,
           coalesce(n_purchases, 0) AS n_purchases
    FROM c FULL OUTER JOIN p ON c.day = p.day
    """,
    tags=("join", "outer", "agg"),
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join reconciliation of two daily series — keeps days
    present on either side. Both inputs are pre-aggregated to day grain
    BEFORE the join (days, not events, flow through it), and both aggs
    hash-partition on the join key, so the outer join reuses that
    partitioning: one shuffle of each side's day table."""
    ev = load_table(spark, sf_dir, "events")
    day = F.to_date("ts").alias("day")
    c = ev.filter(F.col("event_type") == "click").groupBy(day).agg(
        F.count("*").alias("n_clicks")
    )
    p = ev.filter(F.col("event_type") == "purchase").groupBy(day).agg(
        F.count("*").alias("n_purchases")
    )
    return (
        c.join(p, "day", "full_outer")
        .select(
            "day",
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
            F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
        )
    )


@query(
    "q_seq_gap_detection",
    oracle="""
    WITH seqs AS (
      SELECT event_id % 8 AS bucket, event_id // 8 AS seq
      FROM events WHERE event_type <> 'error'
    ),
    holes AS (
      SELECT bucket, seq,
             lag(seq) OVER (PARTITION BY bucket ORDER BY seq) AS prev_seq
      FROM seqs
    )
    SELECT bucket, prev_seq + 1 AS gap_start, seq - 1 AS gap_end,
           seq - prev_seq - 1 AS n_missing
    FROM holes WHERE seq - prev_seq > 1
    """,
    tags=("pubsub", "window", "quality"),
)
def q_seq_gap_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-seq ranges per bucket (log-integrity audit): every hole
    in a bucket's seq space, reported as [gap_start, gap_end] ranges.
    The audited stream drops 'error' events so the holes are real (the
    lost-message scenario the reference's racy offset commit can cause).
    Scale shape: one window shuffle on bucket — which at 100 TB is the
    topic's own at-rest partitioning, so the exchange disappears when
    the log is read bucket-partitioned."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") != "error")
        .select(
            (F.col("event_id") % 8).alias("bucket"),
            (F.col("event_id") / 8).cast("bigint").alias("seq"),
        )
    )
    prev = F.lag("seq").over(Window.partitionBy("bucket").orderBy("seq"))
    holes = ev.withColumn("prev_seq", prev)
    return holes.filter(F.col("seq") - F.col("prev_seq") > 1).select(
        "bucket",
        (F.col("prev_seq") + 1).alias("gap_start"),
        (F.col("seq") - 1).alias("gap_end"),
        (F.col("seq") - F.col("prev_seq") - 1).alias("n_missing"),
    )
