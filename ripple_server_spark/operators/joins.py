"""Join strategies: broadcast enrich, fact-fact, semi/anti.

The reference has no joins (opaque payloads; SURVEY.md §2 Table B). This
module fixes the *strategy* per shape so plans stay optimal at 100 TB:

- dimension enrich → explicit ``F.broadcast`` (never shuffle a fact
  table to join a KB–MB side);
- fact-fact → shuffle hash/sort-merge on the key, AQE picks and
  handles skew;
- existence checks → left-semi/left-anti (no payload duplication, the
  build side carries keys only).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def broadcast_enrich(
    fact: DataFrame, dim: DataFrame, on: Sequence[str] | str, how: str = "inner"
) -> DataFrame:
    """Join a fact table against a small dimension, dimension broadcast.

    At 100 TB the fact side never moves: each task streams its partition
    against an in-memory hash map of the dim. Catalyst would usually
    pick this from size stats; we make it explicit so the plan cannot
    regress when stats are missing (fresh tables, no ANALYZE).
    """
    return fact.join(F.broadcast(dim), on=on, how=how)


def fact_join(left: DataFrame, right: DataFrame, on: Sequence[str] | str) -> DataFrame:
    """Fact-fact equi-join: both sides shuffle-partitioned by the key.

    With AQE on, Spark converts to broadcast at runtime if one side
    turns out small, and splits skewed partitions. At 100 TB, pre-
    bucketing both tables by the join key removes this shuffle entirely
    (see sources/topics.py bucket layout).
    """
    return left.join(right, on=on)


def semi(left: DataFrame, right: DataFrame, on: Sequence[str] | str) -> DataFrame:
    """Keys-that-exist filter (reference analog: only *registered*
    consumers may read — internal/broker/consumer/server/core.go:77-85)."""
    return left.join(right, on=on, how="left_semi")


def anti(left: DataFrame, right: DataFrame, on: Sequence[str] | str) -> DataFrame:
    """Keys-that-don't-exist filter (unregistered / orphan detection)."""
    return left.join(right, on=on, how="left_anti")
