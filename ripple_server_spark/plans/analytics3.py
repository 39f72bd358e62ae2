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
            # integer `div`, never `/`: Spark's `/` is DOUBLE division,
            # which silently corrupts ids past 2^53 (a snowflake-scale
            # event_id came back off by one) — seq math must stay in
            # exact int64 like DuckDB's `//`.
            F.expr("event_id div 8").alias("seq"),
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


@query(
    "q_stats_moments",
    oracle="""
    SELECT event_type,
           round(stddev_samp(value), 6) AS sd,
           round(var_samp(value), 6) AS var,
           -- zero-variance guard on the shape moments: on a CONSTANT
           -- series whose value is not binary-representable (e.g.
           -- 327.53), DuckDB's sum-of-powers accumulation leaves a
           -- ~1e-23 cancellation residue in m2 and skew/kurt explode
           -- into garbage, while Spark's Welford updates give m2 = 0
           -- exactly and return NULL. Both engines now emit NULL
           -- whenever the variance rounds to 0 at the result edge.
           CASE WHEN round(var_samp(value), 6) > 0
                THEN round(skewness(value) * (count(*) - 2)
                           / sqrt(count(*) * (count(*) - 1.0)), 6) END AS skew,
           CASE WHEN round(var_samp(value), 6) > 0
                THEN round(kurtosis_pop(value), 6) END AS kurt,
           -- corr carries the same residue problem in its sd terms:
           -- gate on BOTH sides' variance rounding positive. user_id
           -- is CENTERED on its per-group min before the double cast:
           -- corr is translation-invariant in exact math, but at
           -- snowflake-scale ids (~2^53) the co-moment accumulations
           -- cancel catastrophically and the engines diverge in the
           -- 4th decimal; centered offsets are small exact doubles.
           CASE WHEN round(var_samp(value), 6) > 0
                 AND round(var_samp(CAST(user_id - u0 AS DOUBLE)), 6) > 0
                THEN round(corr(value, CAST(user_id - u0 AS DOUBLE)), 6)
           END AS corr_uid,
           round(regr_slope(value, epoch(ts)), 9) AS trend
    FROM events
    JOIN (SELECT event_type, min(user_id) AS u0
          FROM events GROUP BY event_type) USING (event_type)
    GROUP BY event_type
    """,
    tags=("agg", "stats"),
)
def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher statistical moments + correlation + linear trend per event
    type — the feature-engineering aggregate set. All statistics are
    partial-aggregable (sum-of-powers decomposition), so one shuffle
    over the events carries all 6; nothing materializes per-row. The
    corr input is pre-centered on a per-type min(user_id) anchor —
    a type-count-sized aggregate broadcast back onto the scan —
    because correlation is translation-invariant in exact arithmetic
    but NOT in floats: at snowflake-scale ids (~2^53) the co-moment
    accumulations cancel catastrophically and Spark/DuckDB diverge in
    the 4th decimal, while centered offsets are small exact doubles.

    Cross-engine gotcha pinned by the oracle: Spark's skewness()/
    kurtosis() are the POPULATION forms, DuckDB's the bias-corrected
    SAMPLE forms — the oracle uses kurtosis_pop() and de-corrects
    skewness by (n-2)/sqrt(n(n-1)) so both engines compute g1/g2."""
    ev = load_table(spark, sf_dir, "events")
    u0 = ev.groupBy("event_type").agg(F.min("user_id").alias("u0"))
    ev = ev.join(F.broadcast(u0), "event_type")
    # skew/kurt gated on round(var, 6) > 0 in BOTH engines: see the
    # oracle comment — DuckDB's sum-of-powers m2 keeps a cancellation
    # residue on constant non-representable values where Spark's
    # Welford m2 is exactly 0, so the raw moments disagree there.
    var_pos = F.round(F.var_samp("value"), 6) > 0
    uc = (F.col("user_id") - F.col("u0")).cast("double")
    return ev.groupBy("event_type").agg(
        F.round(F.stddev_samp("value"), 6).alias("sd"),
        F.round(F.var_samp("value"), 6).alias("var"),
        F.when(var_pos, F.round(F.skewness("value"), 6)).alias("skew"),
        F.when(var_pos, F.round(F.kurtosis("value"), 6)).alias("kurt"),
        # corr/regr_slope decomposed into their co-moment ratios with
        # try_divide: under ANSI, Spark's builtins throw DIVIDE_BY_ZERO
        # on a zero-variance side (constant value column, or all of a
        # type's events at one timestamp), where DuckDB yields NULL.
        # Identical to the builtins wherever variance is nonzero
        # (same partial-aggregated co-moments, one extra division).
        F.when(
            var_pos & (F.round(F.var_samp(uc), 6) > 0),
            F.round(
                F.try_divide(
                    F.covar_samp("value", uc),
                    F.stddev_samp("value") * F.stddev_samp(uc),
                ),
                6,
            ),
        ).alias("corr_uid"),
        F.round(
            F.try_divide(
                F.covar_pop(
                    "value", F.unix_micros(F.col("ts").cast("timestamp")) / 1e6
                ),
                F.var_pop(F.unix_micros(F.col("ts").cast("timestamp")) / 1e6),
            ),
            9,
        ).alias("trend"),
    )


@query(
    "q_topn_per_group",
    oracle="""
    SELECT user_id, event_id, rnk, round(value, 2) AS value
    FROM (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id ASC) AS rnk
      FROM events WHERE event_type = 'purchase'
    ) WHERE rnk <= 3
    """,
    tags=("window", "sort-limit", "topn"),
)
def q_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 purchases per user. The rank<=3 predicate is recognized by
    Catalyst as a window-group-limit: each shuffle partition keeps only
    3 rows per user DURING the sort (WindowGroupLimit physical node),
    so the window never materializes full per-user row sets — the shape
    that survives users with millions of events."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("user_id", "event_id", "rnk", F.round("value", 2).alias("value"))
    )


@query(
    "q_moving_avg_time",
    oracle="""
    SELECT event_id, user_id,
           floor(CAST(sum(CAST(value AS DECIMAL(16,2))) OVER w AS DOUBLE)
                 / count(value) OVER w * 1000000 + 0.5) / 1000000 AS ma_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch(ts)
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "range-frame", "timeseries"),
)
def q_moving_avg_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour moving average per user — a RANGE (time-value)
    window frame, not ROWS: the frame is defined by timestamp distance,
    so co-timestamped events share a frame regardless of row order
    (deterministic without a tie-break, unlike ROWS frames). One
    shuffle on user_id; frame evaluation is a sliding two-pointer scan
    within each sorted partition.

    The mean is decimal-exact-sum / count, not avg(double): engines
    evaluate sliding frames in different orders (Spark rebuilds from
    frame start, DuckDB uses segment trees), so a double avg over a
    dense frame (~150 co-hour rows in a burst) differs in ulps and a
    2-dp fixture mean lands on exact 6-dp midpoints where Spark
    (HALF_UP) and DuckDB (nearbyint) round apart. The DECIMAL(16,2)
    window sum is order-independent and exact, the double division is
    then identical IEEE on both engines, and floor(x·10⁶ + 0.5) is the
    shared arithmetic half-up (the q_ts_resample_linear pattern)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1000000.0))
        .rangeBetween(-3600, 0)
    )
    ma = F.sum(F.col("value").cast("decimal(16,2)")).over(w).cast(
        "double"
    ) / F.count("value").over(w)
    return ev.select(
        "event_id",
        "user_id",
        (F.floor(ma * 1000000 + F.lit(0.5)) / 1000000).alias("ma_1h"),
    )


@query(
    "q_join_null_safe",
    oracle="""
    WITH a AS (
      SELECT nullif(event_type, 'error') AS k, count(*) AS n_a
      FROM events WHERE event_id % 2 = 0 GROUP BY k
    ),
    b AS (
      SELECT nullif(event_type, 'error') AS k, count(*) AS n_b
      FROM events WHERE event_id % 2 = 1 GROUP BY k
    )
    SELECT a.k, n_a, n_b
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
    tags=("join", "null-safe"),
)
def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): the NULL
    stratum ('error' nulled out) must MATCH across sides, where a plain
    = would silently drop it. Still plans as a hash join — null-safe
    equality is a valid hash key (null hashes to a bucket) — not a
    nested loop."""
    ev = load_table(spark, sf_dir, "events")
    k = F.nullif(F.col("event_type"), F.lit("error")).alias("k")
    a = ev.filter(F.col("event_id") % 2 == 0).groupBy(k).agg(
        F.count("*").alias("n_a")
    )
    b = ev.filter(F.col("event_id") % 2 == 1).groupBy(k).agg(
        F.count("*").alias("n_b")
    )
    return a.join(b, a["k"].eqNullSafe(b["k"])).select(a["k"], "n_a", "n_b")


@query(
    "q_kmv_distinct_sketch",
    oracle="""
    WITH hashed AS (
      SELECT DISTINCT event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT AS h
      FROM events
    ),
    ranked AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS r,
             count(*) OVER (PARTITION BY event_type) AS n_exact
      FROM hashed
    )
    SELECT event_type,
           n_exact,
           CAST(round(CASE WHEN n_exact <= 32 THEN n_exact
                ELSE (32 - 1) * 281474976710656.0 / max(h)
           END) AS BIGINT) AS kmv_estimate
    FROM ranked WHERE r <= 32
    GROUP BY event_type, n_exact
    """,
    tags=("agg", "sketch", "approx"),
)
def q_kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values, k=32) distinct-user sketch per event type
    — the mergeable distinct sketch behind Theta/HLL-family systems:
    estimate = (k-1) / (k-th smallest hash as a fraction of hash
    space). Built from md5 so the estimate is DETERMINISTIC and the
    oracle reproduces it bit-for-bit — a sketch with an exact oracle,
    unlike approx_count_distinct's rows-only check. Scale shape: the
    k smallest hashes per group survive partial aggregation (rank<=k
    window after a distinct — WindowGroupLimit keeps 32/group), so the
    shuffle carries O(groups x k), never the user universe. n_exact
    rides along to audit the estimate (sf-small groups are exact by
    construction)."""
    ev = load_table(spark, sf_dir, "events")
    hashed = ev.select(
        "event_type",
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10)
        .cast("bigint")
        .alias("h"),
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    ranked = hashed.select(
        "event_type",
        "h",
        F.row_number().over(w).alias("r"),
        F.count("*").over(Window.partitionBy("event_type")).alias("n_exact"),
    ).filter(F.col("r") <= 32)
    est = F.when(F.col("n_exact") <= 32, F.col("n_exact").cast("double")).otherwise(
        (32 - 1) * 281474976710656.0 / F.max("h").over(Window.partitionBy("event_type"))
    )
    return (
        ranked.withColumn("kmv_estimate", F.round(est).cast("bigint"))
        .select("event_type", "n_exact", "kmv_estimate")
        .distinct()
    )
