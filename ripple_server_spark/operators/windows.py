"""Window-function operators.

Two of these reproduce reference semantics directly:

- :func:`min_seq_leader` — leader election picks the *lowest sequence
  number* in each replica group (internal/lighthouse/election/
  election.go:61-72 sorts znode names, elects index 0);
- :func:`running_value` — the consumer offset cursor is a running
  position over the per-bucket log (internal/broker/consumer/server/
  core.go:52-62).

Scale: a Window.partitionBy(k).orderBy(s) is one hash shuffle on k plus
a per-partition sort; skewed partition keys (one giant user) are the
risk at 100 TB — for rank-1 patterns prefer the groupBy/max_by forms
(partial-aggregatable, no sort) which we use where semantics allow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ripple_server_spark.config import N_BUCKETS
from ripple_server_spark.operators.relational import bucket_of


def min_seq_leader(events: DataFrame, n_buckets: int = N_BUCKETS) -> DataFrame:
    """Election analog: per bucket, the row with the lowest seq wins.

    Implemented as min_by-style aggregation (not a window) so the map
    side reduces each partition to one candidate row per bucket before
    the shuffle — O(buckets) shuffle rows regardless of input size.
    """
    return (
        events.groupBy(bucket_of(F.col("user_id"), n_buckets).alias("bucket"))
        .agg(
            F.min("event_id").alias("leader_seq"),
            F.min_by("user_id", "event_id").alias("leader_user"),
        )
    )


def latest_event_per_user(events: DataFrame) -> DataFrame:
    """Rank-1-per-key: each user's most recent event.

    max_by on the (event_id) tiebreak — event_id is monotone with ts in
    the fixtures, and unique, so "latest" is the max event_id row. This
    is the partial-aggregate form: one shuffle, no sort, skew-immune.
    """
    return events.groupBy("user_id").agg(
        F.max("event_id").alias("last_event_id"),
        F.max_by("event_type", "event_id").alias("last_event_type"),
        F.round(F.max_by("value", "event_id"), 2).alias("last_value"),
    )


def running_value(events: DataFrame) -> DataFrame:
    """Offset-cursor analog: running sum of value per user in log order.

    A true window (needs the full ordered prefix); rows-unbounded-
    preceding frame. Deterministic: ordered by unique event_id, so the
    fold order — and therefore the float sum — is identical everywhere.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("running_value"),
    )


def topk_hot_users(events: DataFrame, k: int = 10) -> DataFrame:
    """Top-k users by event count (hot-key detection — exactly what
    you'd run to find skewed buckets before repartitioning).

    groupBy + TakeOrderedAndProject: no global sort; ties broken by
    user_id for determinism.
    """
    return (
        events.groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(k)
    )


def global_rank(
    df: DataFrame, order_cols: list[str], n_parts: int | None = None
) -> DataFrame:
    """Total-order global rank WITHOUT the single-partition trap.

    ``row_number().over(Window.orderBy(...))`` funnels the whole table
    through ONE task — the classic scale killer. Instead: range-
    partition on the order key (samples the distribution, so partitions
    are balanced), rank within each partition, then add each
    partition's cumulative row offset (a tiny n_parts-row broadcast).
    Two passes over the data, every stage parallel, exact global rank.

    ``n_parts`` defaults to the session's ``defaultParallelism`` so the
    per-task sort stays ~1/cores of the table on ANY cluster size — a
    fixed constant would pin task size to the dev box. The rank value
    is independent of the stripe count (offsets are exact), so changing
    ``n_parts`` never changes results, only task granularity.
    """
    from pyspark.sql import Window

    if n_parts is None:
        n_parts = df.sparkSession.sparkContext.defaultParallelism

    # persisted: the counts branch and the rank branch must see the SAME
    # physical partitioning — without this the range shuffle runs twice
    # and only deterministic sampling keeps the pids consistent
    parted = (
        df.repartitionByRange(n_parts, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = parted.groupBy("_pid").count()
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("count").over(w_off), F.lit(0)).alias("_off")
    )
    w_local = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        parted.join(F.broadcast(offsets), on="_pid")
        .withColumn("rank", (F.row_number().over(w_local) + F.col("_off")))
        .drop("_pid", "_off")
    )
