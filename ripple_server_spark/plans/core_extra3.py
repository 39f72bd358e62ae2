"""Coverage batch 3: as-of join, range join, pivot, histogram,
grouping sets.

The as-of join is the headline custom operator here: the reference's
consumer reads "latest state at or before my cursor" (offset cursor,
``internal/broker/consumer/server/core.go:46-63``); the time-based
generalization — latest ref row per key at-or-before each probe row —
is the canonical event-stream enrichment op Spark lacks natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ripple_server_spark.catalog import load_table
from ripple_server_spark.operators.joins import asof_join
from ripple_server_spark.plans.registry import query


@query(
    "q_asof_join",
    oracle="""
    WITH probe AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), ref AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), u AS (
      SELECT event_id, user_id, ts, 0 AS is_ref, CAST(NULL AS BIGINT) AS rid
      FROM probe
      UNION ALL
      SELECT event_id, user_id, ts, 1 AS is_ref, event_id AS rid FROM ref
    ), c AS (
      SELECT event_id, user_id, ts, is_ref,
             last_value(rid IGNORE NULLS) OVER w AS asof_event_id,
             last_value(CASE WHEN is_ref = 1 THEN ts END IGNORE NULLS)
               OVER w AS asof_ts
      FROM u
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY ts ASC, is_ref DESC, rid ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           asof_event_id, epoch_us(asof_ts) AS asof_ts_us
    FROM c WHERE is_ref = 0
    """,
    bench=True,
    tags=("join", "asof", "window"),
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click, the user's latest purchase at-or-before it
    (event-time as-of join). Union-window strategy: one shuffle of
    |probe|+|ref| rows, no O(n·m) range-join intermediate — the only
    shape that survives 100 TB (see operators/joins.py:asof_join)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    probe = ev.filter(F.col("event_type") == "click").drop("event_type")
    ref = ev.filter(F.col("event_type") == "purchase").drop("event_type")
    out = asof_join(probe, ref, key="user_id", time_col="ts", ref_id_col="event_id")
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "asof_event_id",
        F.unix_micros("asof_ts").alias("asof_ts_us"),
    )


@query(
    "q_range_join_bands",
    oracle="""
    WITH bands(band, lo, hi) AS (
      VALUES ('budget', 0.0, 900.0),
             ('mid', 900.0, 1500.0),
             ('premium', 1500.0, 1e12)
    )
    SELECT band, count(*) AS n, round(avg(p_retailprice), 2) AS avg_price
    FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
    GROUP BY band
    """,
    tags=("join", "range"),
)
def q_range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inequality (range/banding) join: classify parts into price bands.
    The band table is tiny → broadcast nested-loop join, which is the
    RIGHT plan: each fact row tests 3 predicates in codegen, no shuffle
    of the fact side at any scale."""
    part = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("budget", 0.0, 900.0), ("mid", 900.0, 1500.0), ("premium", 1500.0, 1e12)],
        "band string, lo double, hi double",
    )
    return (
        part.join(
            F.broadcast(bands),
            (part.p_retailprice >= bands.lo) & (part.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("p_retailprice"), 2).alias("avg_price"),
        )
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "q_pivot_type_day",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           count(*) FILTER (event_type = 'click')    AS click,
           count(*) FILTER (event_type = 'error')    AS error,
           count(*) FILTER (event_type = 'purchase') AS purchase,
           count(*) FILTER (event_type = 'signup')   AS signup,
           count(*) FILTER (event_type = 'view')     AS view
    FROM events GROUP BY day
    """,
    tags=("pivot", "agg"),
)
def q_pivot_type_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot events to a per-day matrix of type counts, written as
    conditional aggregation (count(when(type=x))) rather than
    DataFrame .pivot(): with a known value list this is the same result
    in ONE shuffle — .pivot() plans a (day,type) pre-aggregate plus a
    pivotfirst pass (two exchanges). Fully partial-aggregatable; output
    is |days| × 5 at any input scale."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("day", F.to_date("ts"))
        .groupBy("day")
        .agg(
            *[
                F.count(F.when(F.col("event_type") == t, 1)).alias(t)
                for t in _EVENT_TYPES
            ]
        )
    )


@query(
    "q_histogram_value",
    oracle="""
    SELECT CAST(floor(value / 50.0) AS BIGINT) AS bin, count(*) AS n
    FROM events GROUP BY bin
    """,
    tags=("agg", "histogram"),
)
def q_histogram_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of the value measure: pure map-side
    bucketing + partial agg; output cardinality = #bins regardless of
    input scale."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(F.floor(F.col("value") / 50.0).cast("bigint").alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("n"))
    )


@query(
    "q_grouping_sets",
    oracle="""
    SELECT event_type, CAST(user_id % 3 AS BIGINT) AS bucket,
           count(*) AS n, round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY GROUPING SETS ((event_type), (bucket))
    """,
    tags=("agg", "grouping-sets"),
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form of rollup/cube): per-type
    totals and per-bucket totals in ONE pass over the scan (Catalyst
    Expand + single shuffle) instead of two separate aggregations."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("_gs_events")
    return spark.sql(
        """
        SELECT event_type, CAST(pmod(user_id, 3) AS BIGINT) AS bucket,
               count(*) AS n, round(sum(value), 2) AS sum_value
        FROM _gs_events
        GROUP BY GROUPING SETS ((event_type), (bucket))
        """
    )


# --------------------------------------------------------------------------
# UDF-surface completeness: UDAF (grouped-agg pandas) + UDTF (lateral)
# --------------------------------------------------------------------------

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import DoubleType, LongType


@pandas_udf(DoubleType())
def _gmean(v: pd.Series) -> float:
    # whole group arrives as one Arrow batch series
    return float(np.exp(np.log(v.to_numpy()).mean()))


@pandas_udf(LongType())
def _gcount(v: pd.Series) -> int:
    # pandas UDAFs cannot mix with built-in aggregates in one agg —
    # the row count rides along as a second pandas aggregate
    return int(len(v))


@query(
    "q_udaf_gmean",
    oracle="""
    SELECT event_type,
           round(exp(avg(ln(value))), 4) AS gmean_value,
           count(*) AS n
    FROM events WHERE value > 0 GROUP BY event_type
    """,
    tags=("udf", "udaf", "arrow"),
)
def q_udaf_gmean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-defined aggregate (grouped-agg pandas UDF): geometric mean
    of value per type. The UDAF surface: whole group -> one Arrow
    series -> scalar. Note the scale caveat in the plan: grouped-agg
    UDFs shuffle full rows (no partial aggregation) — built-in
    exp(avg(ln x)) is the 100 TB form; this query exists to pin the
    UDAF API against the same oracle."""
    # gmean's domain is strictly-positive values (value == 0 exists at
    # sf0.1 — ln(0) is the classic gmean footgun, filtered identically
    # in the oracle).
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    return ev.groupBy("event_type").agg(
        F.round(_gmean("value"), 4).alias("gmean_value"),
        _gcount("value").alias("n"),
    )


class _TokenizeUDTF:
    """Python UDTF: one text in, one row per token out (lateral).
    Decorated lazily in the builder — @udtf parses the DDL return type,
    which needs an active session."""

    def eval(self, text: str):
        if text is None:
            return
        for i, t in enumerate(text.split(" ")):
            yield i, t


@query(
    "q_udtf_tokenize",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    i AS (SELECT doc_id, unnest(range(1, len(w) + 1)) AS i, w FROM t)
    SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, w[i] AS token FROM i
    """,
    tags=("udf", "udtf"),
)
def q_udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-defined TABLE function via LATERAL join — the 1->N UDF
    surface. Row-at-a-time Python is the compatibility path only; the
    equivalent fast path is explode(split(...)) (pure codegen), which
    the oracle also checks — this query pins the UDTF API itself."""
    spark.udtf.register(
        "ripple_tokenize", udtf(_TokenizeUDTF, returnType="pos int, token string")
    )
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM _udtf_docs d, LATERAL ripple_tokenize(d.text) t
        """
    )


@query(
    "q_salted_agg",
    oracle="""
    SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
    FROM events GROUP BY event_type
    """,
    tags=("agg", "skew", "salt"),
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation — the manual skew fix for a hot
    group key: phase 1 aggregates (key, salt) so a hot key's rows land
    on 16 reducers, phase 2 merges the 16 partials per key. Result is
    identical to the direct groupBy (the oracle); use when one key
    dominates and even AQE's partial-agg path leaves a single reducer
    saturated. (count/sum re-aggregate losslessly; avg must be carried
    as sum+count.)"""
    ev = load_table(spark, sf_dir, "events")
    phase1 = (
        ev.withColumn("_salt", F.pmod(F.col("event_id"), F.lit(16)))
        .groupBy("event_type", "_salt")
        .agg(F.count("*").alias("pn"), F.sum("value").alias("ps"))
    )
    return phase1.groupBy("event_type").agg(
        F.sum("pn").alias("n"), F.round(F.sum("ps"), 2).alias("sum_value")
    )


@query(
    "q_global_rank",
    oracle="""
    SELECT event_id,
           CAST(row_number() OVER (ORDER BY ts, event_id) AS BIGINT) AS rank
    FROM events
    """,
    tags=("window", "sort", "rank"),
)
def q_global_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global rank over (ts, event_id) — computed scale-correctly:
    range-partition, local row_number, plus broadcast cumulative
    partition offsets (operators/windows.py:global_rank). Never funnels
    the table through one task, unlike a bare Window.orderBy. The tiny
    offsets window (n_parts rows) is the only single-partition work."""
    from ripple_server_spark.operators.windows import global_rank

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    return global_rank(ev, ["ts", "event_id"]).select(
        "event_id", F.col("rank").cast("bigint").alias("rank")
    )


@query(
    "q_cohort_retention",
    oracle="""
    WITH first_day AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort
      FROM events GROUP BY user_id
    ),
    activity AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
    SELECT f.cohort,
           CAST(day - cohort AS BIGINT) AS day_offset,
           count(DISTINCT a.user_id) AS active_users
    FROM first_day f JOIN activity a ON a.user_id = f.user_id
    WHERE day - cohort <= 7
    GROUP BY f.cohort, day_offset
    """,
    tags=("analytics", "retention", "agg"),
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day, active
    user counts at day offsets 0..7. Two shuffles (first-day agg +
    final rollup) over a distinct-day projection; the cohort table is
    |users| rows — broadcastable against the activity stream at any
    event volume."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    first_day = ev.groupBy("user_id").agg(F.min("day").alias("cohort"))
    activity = ev.distinct()
    return (
        activity.join(F.broadcast(first_day), on="user_id")
        .withColumn("day_offset", F.datediff("day", "cohort").cast("bigint"))
        .filter(F.col("day_offset") <= 7)
        .groupBy("cohort", "day_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@query(
    "q_funnel_conversion",
    oracle="""
    WITH s AS (SELECT user_id, min(ts) AS t_signup FROM events
               WHERE event_type = 'signup' GROUP BY user_id),
    c AS (SELECT e.user_id, min(ts) AS t_click
          FROM events e JOIN s ON s.user_id = e.user_id
          WHERE event_type = 'click' AND ts > t_signup GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(ts) AS t_purchase
          FROM events e JOIN c ON c.user_id = e.user_id
          WHERE event_type = 'purchase' AND ts > t_click GROUP BY e.user_id)
    SELECT (SELECT count(*) FROM s) AS n_signup,
           (SELECT count(*) FROM c) AS n_then_click,
           (SELECT count(*) FROM p) AS n_then_purchase
    """,
    tags=("analytics", "funnel", "window"),
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup -> click -> purchase: users
    counted at each stage only if the stages happened in order. ONE
    shuffle on user_id — per-user stage times come from collected
    click/purchase timestamp arrays (array_min over a filter), no joins
    or windows. Trade-off: per-user arrays are fine while a user's
    funnel events fit a task (they do, by orders of magnitude); for
    pathologically hot users switch to the two-shuffle join form the
    oracle uses — same result, streaming-aggregate memory."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    # collect_list skips the NULLs the whens produce, and array_min is
    # order-independent, so the bare ts arrays need no sorting and no
    # struct boxing.
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t_signup"),
        F.collect_list(
            F.when(F.col("event_type") == "click", F.col("ts"))
        ).alias("clicks"),
        F.collect_list(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("purchases"),
    )
    t_click = F.array_min(
        F.filter(F.col("clicks"), lambda t: t > F.col("t_signup"))
    )
    staged = per_user.select(
        "user_id",
        "t_signup",
        t_click.alias("t_click"),
        F.array_min(
            F.filter(F.col("purchases"), lambda t: t > t_click)
        ).alias("t_purchase"),
    )
    return staged.agg(
        F.count("t_signup").alias("n_signup"),
        F.count(F.when(F.col("t_signup").isNotNull(), F.col("t_click"))).alias(
            "n_then_click"
        ),
        F.count(
            F.when(
                F.col("t_signup").isNotNull() & F.col("t_click").isNotNull(),
                F.col("t_purchase"),
            )
        ).alias("n_then_purchase"),
    )
