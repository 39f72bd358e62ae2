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


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 16,
    salt_col: str = "_salt",
) -> DataFrame:
    """Skew-resistant equi-join: spread each hot left key over
    ``n_salts`` shuffle partitions by salting, replicating the right
    side once per salt value.

    The classic manual fix when AQE skew-split can't help (e.g. a
    single key whose rows exceed one executor even after splitting):
    left gets a salt, right is exploded ×n_salts, and the join key
    becomes (key, salt) — each hot-key shard lands on a different
    reducer. Cost: right side shuffles n_salts copies, so use for
    moderate-sized right sides only (broadcast beats this when right
    fits in memory; AQE beats it for mild skew).

    The salt is a DETERMINISTIC function of the row's own values
    (xxhash64 over all columns), never monotonically_increasing_id or
    rand: a nondeterministic expression feeding a shuffle means a task
    retry can re-salt a row differently from the copy a finished
    reducer already consumed — silently duplicating or dropping rows
    (the SPARK-23207 repartition failure class). Row-content hashing
    keeps retries stable; identical duplicate rows sharing a salt is
    fine (the goal is spreading a hot KEY, whose rows differ in their
    non-key attributes).

    Result equals ``left.join(right, on)`` exactly (pytest-checked).
    """
    salted_left = left.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    )
    salted_right = right.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0).cast("long"), F.lit(n_salts - 1)))
    )
    return salted_left.join(salted_right, on=[on, salt_col]).drop(salt_col)


def asof_join(
    probe: DataFrame,
    ref: DataFrame,
    key: str,
    time_col: str,
    ref_id_col: str,
) -> DataFrame:
    """As-of join: attach to each probe row the latest ``ref`` row of the
    same ``key`` with ``ref.time <= probe.time`` (left semantics — probes
    with no preceding ref keep NULLs).

    Strategy is the union-window pattern, NOT probe⋈ref + filter: tagging
    both inputs, sorting once per key, and carrying the last-seen ref
    forward costs ONE shuffle of |probe|+|ref| rows and never builds the
    O(|probe|·|matches|) intermediate a range join would. At 100 TB this
    is the only shape that survives: the window state per key is a single
    struct, and AQE/skew handling apply to the one shuffle.

    Ties: refs at the same timestamp as a probe count as "preceding"
    (is_ref sorts first); among equal-time refs the max ``ref_id_col``
    wins (deterministic).

    Returns the probe rows plus ``asof_<ref_id_col>`` and ``asof_ts``.
    """
    probe_cols = probe.columns
    # carry the ref id in its OWN dtype: a hard cast to long would turn
    # string/uuid ids into all-NULLs and silently never latch
    ref_id_type = dict(ref.dtypes)[ref_id_col]
    p = probe.withColumn("is_ref", F.lit(0)).withColumn(
        "_ref_id", F.lit(None).cast(ref_id_type)
    )
    r = ref.select(
        F.col(key),
        F.col(time_col),
        F.lit(1).alias("is_ref"),
        F.col(ref_id_col).cast(ref_id_type).alias("_ref_id"),
    )
    for c in probe_cols:
        if c not in (key, time_col):
            r = r.withColumn(c, F.lit(None).cast(dict(probe.dtypes)[c]))
    u = p.unionByName(r.select(*p.columns))
    from pyspark.sql import Window

    w = (
        Window.partitionBy(key)
        .orderBy(
            F.col(time_col).asc(),
            F.col("is_ref").desc(),
            F.col("_ref_id").asc_nulls_last(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn(
        f"asof_{ref_id_col}", F.last("_ref_id", ignorenulls=True).over(w)
    ).withColumn(
        "asof_ts",
        F.last(F.when(F.col("is_ref") == 1, F.col(time_col)), ignorenulls=True).over(w),
    )
    return carried.filter(F.col("is_ref") == 0).select(
        *probe_cols, f"asof_{ref_id_col}", "asof_ts"
    )
