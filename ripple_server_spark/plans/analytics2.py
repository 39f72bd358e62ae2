"""Analytics coverage batch: distribution windows, gaps-and-islands,
transition matrices, deterministic sampling, profiling, OHLC bars,
edit-distance near-dup.

These are the event-log analytics a consumer of the reference's topics
would run downstream (the reference itself can only hand back opaque
byte ranges — `internal/broker/consumer/server/core.go:52` — so the
analytic layer is entirely ours), plus two training-data-pipeline
staples (hash sampling, profiling) mandated by the BASELINE.json north
star. All pure JVM DataFrame ops — no Python in any hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ripple_server_spark.catalog import load_table
from ripple_server_spark.functions.text import shingles_pandas
from ripple_server_spark.plans.registry import query


@query(
    "q_window_distribution",
    oracle="""
    SELECT event_id,
           ntile(4)      OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist()    OVER w, 6) AS cd
    FROM events WHERE event_type = 'purchase'
    WINDOW w AS (ORDER BY value ASC, event_id ASC)
    """,
    tags=("window", "distribution"),
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-distribution window functions (ntile/percent_rank/
    cume_dist) over purchases, computed WITHOUT a single-partition
    global window: the striped two-pass exact rank (coarse value
    stripes -> tiny stripe-count aggregate -> broadcast cumulative
    offsets -> rank within stripe) gives each row its global position
    rn, and since the (value, event_id) order is tie-free,
    percent_rank = (rn-1)/(n-1), cume_dist = rn/n, and ntile(4) is
    the standard first-(n mod 4)-buckets-get-ceil(n/4) arithmetic on
    rn — all derived from rn plus one broadcast 1-row count. The r03
    version ran a bare Window.orderBy over every purchase row in one
    task; no such window remains in this plan."""
    from ripple_server_spark.plans.analytics4 import _rank_in_group

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    ranked = _rank_in_group(ev.withColumn("_g", F.lit(0)), "_g", "value", "event_id")
    n_agg = ev.agg(F.count("*").alias("_n"))
    ntile4 = F.expr(
        "CASE WHEN rn <= (_n % 4) * ((_n div 4) + 1)"
        "     THEN 1 + (rn - 1) div ((_n div 4) + 1)"
        "     ELSE (_n % 4) + 1 + (rn - 1 - (_n % 4) * ((_n div 4) + 1)) div (_n div 4)"
        " END"
    )
    pr = F.when(F.col("_n") == 1, F.lit(0.0)).otherwise(
        (F.col("rn") - 1).cast("double") / (F.col("_n") - 1)
    )
    return ranked.crossJoin(F.broadcast(n_agg)).select(
        "event_id",
        ntile4.cast("bigint").alias("quartile"),
        F.round(pr, 6).alias("pr"),
        F.round(F.col("rn").cast("double") / F.col("_n"), 6).alias("cd"),
    )


@query(
    "q_user_active_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    numbered AS (
      SELECT user_id, d,
             row_number() OVER (PARTITION BY user_id ORDER BY d) AS rn
      FROM days
    ),
    islands AS (
      SELECT user_id, d - CAST(rn AS INT) AS grp, count(*) AS streak_len
      FROM numbered GROUP BY user_id, d - CAST(rn AS INT)
    )
    SELECT user_id, max(streak_len) AS longest_streak,
           count(*) AS n_streaks,
           CAST(sum(streak_len) AS BIGINT) AS active_days
    FROM islands GROUP BY user_id
    """,
    tags=("window", "analytics", "gaps-islands"),
)
def q_user_active_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: longest consecutive-day activity streak per
    user. The island key is date - row_number (constant within a
    consecutive run). Both the dedup and the window partition on
    user_id, so the whole query is ONE shuffle — the window reuses the
    distinct's hash partitioning."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    rn = F.row_number().over(Window.partitionBy("user_id").orderBy("d"))
    islands = (
        days.withColumn("grp", F.date_sub(F.col("d"), rn))
        .groupBy("user_id", "grp")
        .agg(F.count("*").alias("streak_len"))
    )
    return islands.groupBy("user_id").agg(
        F.max("streak_len").alias("longest_streak"),
        F.count("*").alias("n_streaks"),
        F.sum("streak_len").alias("active_days"),
    )


@query(
    "q_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    trans AS (
      SELECT prev_type, event_type AS curr_type, count(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, curr_type, n,
           round(n::DOUBLE / sum(n) OVER (PARTITION BY prev_type), 6) AS p
    FROM trans
    """,
    tags=("window", "analytics", "markov"),
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types per user
    stream (the what-happens-after-X query). lag() within user needs
    one shuffle; the 25-cell transition table then normalizes row-wise
    with a trivially small window."""
    ev = load_table(spark, sf_dir, "events")
    prev = F.lag("event_type").over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
    )
    trans = (
        ev.select("user_id", "event_type", prev.alias("prev_type"))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("curr_type"))
        .agg(F.count("*").alias("n"))
    )
    share = F.col("n") / F.sum("n").over(Window.partitionBy("prev_type"))
    return trans.withColumn("p", F.round(share, 6))


@query(
    "q_stratified_sample_hash",
    oracle="""
    SELECT event_type, count(*) AS n_total,
           count(*) FILTER (
             ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 4))::BIGINT % 16 = 0
           ) AS n_sampled
    FROM events GROUP BY event_type
    """,
    tags=("sampling", "scalar", "agg"),
)
def q_stratified_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~1/16 sample per stratum via a key hash — the
    reproducible-pipeline alternative to rand()-based sample(): the
    same row set is selected on every run, any engine, any partitioning
    (seeded rand() is NOT stable across engines/partitionings). One
    conditional aggregation — the sample never materializes separately."""
    ev = load_table(spark, sf_dir, "events")
    bucket = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 4), 16, 10)
        .cast("bigint") % 16
    )
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_total"),
        F.count(F.when(bucket == 0, 1)).alias("n_sampled"),
    )


@query(
    "q_profile_columns",
    oracle="""
    SELECT 'user_id' AS col_name, count(*) - count(user_id) AS n_nulls,
           count(DISTINCT user_id) AS n_distinct FROM events
    UNION ALL
    SELECT 'event_type', count(*) - count(event_type),
           count(DISTINCT event_type) FROM events
    UNION ALL
    SELECT 'value', count(*) - count(value),
           count(DISTINCT value) FROM events
    """,
    tags=("profiling", "agg"),
)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (null + distinct counts) — the pre-training
    data-quality gate. ONE aggregate over one scan computes all three
    columns' stats (Spark expands multi-distinct into a single Expand +
    aggregate, not three scans), then a stack() unpivots to the
    row-per-column report shape."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.agg(
        F.count("*").alias("n"),
        F.count("user_id").alias("nn_user"),
        F.countDistinct("user_id").alias("nd_user"),
        F.count("event_type").alias("nn_type"),
        F.countDistinct("event_type").alias("nd_type"),
        F.count("value").alias("nn_value"),
        F.countDistinct("value").alias("nd_value"),
    )
    return agg.select(
        F.expr(
            "stack(3, "
            "'user_id', n - nn_user, nd_user, "
            "'event_type', n - nn_type, nd_type, "
            "'value', n - nn_value, nd_value) AS (col_name, n_nulls, n_distinct)"
        )
    )


@query(
    "q_ohlc_hourly",
    oracle="""
    SELECT event_type, date_trunc('hour', ts) AS hour,
           round(arg_min(value, event_id), 2) AS open,
           round(max(value), 2) AS high,
           round(min(value), 2) AS low,
           round(arg_max(value, event_id), 2) AS close,
           count(*) AS n
    FROM events GROUP BY event_type, date_trunc('hour', ts)
    """,
    tags=("agg", "timeseries", "ohlc"),
)
def q_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type. open/close via min_by/max_by on
    the monotone event_id — single-pass aggregation (no window, no
    self-join), the shape that stays one shuffle at any scale."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.round(F.min_by("value", "event_id"), 2).alias("open"),
        F.round(F.max("value"), 2).alias("high"),
        F.round(F.min("value"), 2).alias("low"),
        F.round(F.max_by("value", "event_id"), 2).alias("close"),
        F.count("*").alias("n"),
    )


@query(
    "q_dedup_edit_distance",
    oracle="""
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           levenshtein(substr(a.text, 1, 64), substr(b.text, 1, 64)) AS dist
    FROM documents a
    JOIN documents b
      ON substr(a.text, 1, 16) = substr(b.text, 1, 16)
     AND a.doc_id < b.doc_id
    WHERE levenshtein(substr(a.text, 1, 64), substr(b.text, 1, 64)) <= 24
    """,
    tags=("dedup", "text", "editdist"),
)
def q_dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup with prefix blocking: only pairs sharing
    a 16-char prefix are compared (equi-join on the block key — a hash
    join, never a cross product), and Levenshtein runs on a 64-char cap
    so the O(len^2) kernel is constant-bounded per pair. At 100 TB the
    block key keeps candidates ~linear; widen recall by adding a
    suffix-block union if needed."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 16).alias("blk"),
        F.substring("text", 1, 64).alias("head"),
    )
    a, b = docs.alias("a"), docs.alias("b")
    dist = F.levenshtein(F.col("a.head"), F.col("b.head"))
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            dist.alias("dist"),
        )
        .filter(F.col("dist") <= 24)
    )


@query(
    "q_train_val_test_split",
    oracle="""
    WITH tagged AS (
      SELECT event_type,
             CASE
               WHEN ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 4))::BIGINT % 10 < 8
                 THEN 'train'
               WHEN ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 4))::BIGINT % 10 = 8
                 THEN 'val'
               ELSE 'test'
             END AS split
      FROM events
    )
    SELECT split, event_type, count(*) AS n
    FROM tagged GROUP BY split, event_type
    """,
    tags=("sampling", "pipeline"),
)
def q_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by key hash,
    with per-class counts to audit stratification balance. Hash-based
    (not rand(seed)) so the SAME rows land in the same split on every
    engine, every rerun, every repartitioning — the property that makes
    a 100 TB split reproducible and leakage-auditable. Zero shuffles
    until the audit aggregate."""
    ev = load_table(spark, sf_dir, "events")
    bucket = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 4), 16, 10)
        .cast("bigint") % 10
    )
    split = (
        F.when(bucket < 8, "train").when(bucket == 8, "val").otherwise("test")
    )
    return ev.select(split.alias("split"), "event_type").groupBy(
        "split", "event_type"
    ).agg(F.count("*").alias("n"))


@query(
    "q_decontaminate",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    idx AS (SELECT doc_id, unnest(range(1, greatest(len(w) - 3, 1))) AS i, w FROM t),
    grams AS (
      SELECT DISTINCT doc_id,
             w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
               AS gram
      FROM idx
    ),
    bench AS (SELECT gram FROM grams WHERE doc_id < 10),
    contaminated AS (
      SELECT DISTINCT g.doc_id
      FROM grams g JOIN bench b ON g.gram = b.gram
      WHERE g.doc_id >= 10
    )
    SELECT source,
           count(*) AS n_docs,
           count(*) FILTER (doc_id IN (SELECT doc_id FROM contaminated))
             AS n_contaminated
    FROM documents WHERE doc_id >= 10
    GROUP BY source
    """,
    tags=("text", "dedup", "pipeline", "decontamination"),
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any
    5-gram with the benchmark set (here: doc_id < 10 stands in for the
    eval suite). The overlap test is a semi join on exact n-grams —
    at 100 TB the benchmark gram set is tiny and BROADCAST, so the
    corpus-side gram stream never shuffles; contaminated ids come back
    as a second broadcast semi join into the audit aggregate. This is
    the standard LLM-pretraining hygiene pass."""
    docs = load_table(spark, sf_dir, "documents")
    # Arrow gram kernel (per-doc-unique 5-grams): no distinct shuffle,
    # and ~10x faster than the transform-lambda form whose element
    # accesses re-split the text (lambdas block codegen subexpression
    # elimination). Persisted for its two consumers (bench + corpus).
    grams = docs.select(
        "doc_id", F.explode(shingles_pandas(F.col("text"), 5)).alias("gram")
    ).persist()
    bench = grams.filter(F.col("doc_id") < 10).select("gram")
    contaminated = (
        grams.filter(F.col("doc_id") >= 10)
        .join(F.broadcast(bench), "gram", "left_semi")
        .select("doc_id")
        .distinct()
    )
    corpus = docs.filter(F.col("doc_id") >= 10)
    flagged = corpus.join(
        F.broadcast(contaminated.withColumnRenamed("doc_id", "c_id")),
        corpus.doc_id == F.col("c_id"),
        "left",
    )
    return flagged.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.count("c_id").alias("n_contaminated"),
    )
