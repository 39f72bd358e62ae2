"""Aggregation operators: multi-agg, distinct, approx, rollup/cube.

The reference's only aggregate is queue depth, ``Queue.Size()``
(internal/broker/queue/queue.go:39-41); everything else is new surface.

Scale notes: every groupBy below benefits from Spark's partial (map-
side) aggregation — the shuffle carries one row per (partition, key),
not per event. ``approx_count_distinct`` (HyperLogLog++) replaces exact
distinct counts at 100 TB: fixed-size sketch per key, one shuffle, no
second distinct pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ripple_server_spark.config import N_BUCKETS
from ripple_server_spark.operators.relational import bucket_of


def bucket_depth(events: DataFrame, n_buckets: int = N_BUCKETS) -> DataFrame:
    """Per-bucket queue depth — the Queue.Size() analog, per bucket."""
    return (
        events.groupBy(bucket_of(F.col("user_id"), n_buckets).alias("bucket"))
        .agg(F.count("*").alias("depth"))
    )


def multi_agg(events: DataFrame) -> DataFrame:
    """count/sum/avg/min/max/countDistinct per event_type.

    Doubles are rounded at the edge (2–4 dp) so results are stable
    across summation orders — Spark and the oracle sum partitions in
    different orders; unrounded last-bit noise is not a real difference.
    """
    return events.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


def rollup_type_day(events: DataFrame) -> DataFrame:
    """ROLLUP (event_type, day): hierarchical totals in one pass."""
    day = F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
    return (
        events.select("event_type", day, "value")
        .rollup("event_type", "day")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )
