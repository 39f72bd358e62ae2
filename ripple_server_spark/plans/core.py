"""Core relational queries (SURVEY.md §2 Table B: scan/filter/project/
sort-limit/set-ops/scalar/agg/window/join) with DuckDB oracles.

Each query cites the reference behavior it reproduces (if any) and its
100 TB execution shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ripple_server_spark.catalog import load_table
from ripple_server_spark.functions.scalar import json_int, route_id, ts_micros
from ripple_server_spark.operators import aggregates, joins, relational, windows
from ripple_server_spark.operators.relational import bucket_of
from ripple_server_spark.plans.registry import query


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# --------------------------------------------------------------------------
# Scan / project / filter / ranged read / top-k / set ops
# --------------------------------------------------------------------------


@query(
    "q_scan_events",
    oracle="""
    SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value, props
    FROM events
    """,
    bench=True,
    tags=("scan",),
)
def q_scan_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-log scan (reference: queue scan, internal/broker/queue/
    queue.go:59-61). Vectorized parquet read; ts exposed as epoch µs."""
    ev = _events(spark, sf_dir)
    return ev.select(
        "event_id", ts_micros(F.col("ts")).alias("ts_us"), "user_id", "event_type", "value", "props"
    )


@query(
    "q_project_typed_columns",
    oracle="""
    SELECT event_id,
           round(value * 2, 2)                           AS value2,
           upper(event_type)                             AS etype,
           concat(event_type, '-', CAST(user_id AS VARCHAR)) AS tag
    FROM events
    """,
    tags=("project",),
)
def q_project_typed_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + scalar expressions; column pruning reaches the scan
    (ReadSchema carries only 4 of 6 columns)."""
    ev = _events(spark, sf_dir)
    return ev.select(
        "event_id",
        F.round(F.col("value") * 2, 2).alias("value2"),
        F.upper("event_type").alias("etype"),
        F.concat(F.col("event_type"), F.lit("-"), F.col("user_id").cast("string")).alias("tag"),
    )


@query(
    "q_filter_topic_bucket",
    oracle="""
    SELECT event_id, user_id, value
    FROM events
    WHERE event_type = 'purchase' AND user_id % 8 = 3
    """,
    tags=("filter",),
)
def q_filter_topic_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topic+bucket routing as a predicate (reference routes by bucket
    name, internal/topic/topic.go:23-25). Both predicates are pushed to
    the parquet scan; on a bucket-partitioned event table the modulo
    becomes partition pruning."""
    ev = _events(spark, sf_dir)
    return ev.filter(
        (F.col("event_type") == "purchase") & (bucket_of(F.col("user_id")) == 3)
    ).select("event_id", "user_id", "value")


@query(
    "q_filter_compound",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE (event_type IN ('click', 'view') OR value > 150.0)
      AND user_id BETWEEN 10 AND 400
      AND event_type LIKE '%i%'
    """,
    tags=("filter",),
)
def q_filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/IN/LIKE/BETWEEN compound predicate — single codegen'd
    filter stage over the scan."""
    ev = _events(spark, sf_dir)
    return ev.filter(
        (F.col("event_type").isin("click", "view") | (F.col("value") > 150.0))
        & F.col("user_id").between(10, 400)
        & F.col("event_type").like("%i%")
    ).select("event_id", "user_id", "event_type", "value")


@query(
    "q_consume_offset_range",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE event_id >= 100
    ORDER BY event_id
    LIMIT 50
    """,
    tags=("pubsub", "sort-limit"),
)
def q_consume_offset_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Consume/AskQuery batch read: 50 messages from offset 100
    (reference: SubArray(offset, offset+Count), internal/broker/
    consumer/server/core.go:52; clamping pkg/utils/collection/
    concurrent_list.go:63-73). Planned as a pushed-down range predicate
    + TakeOrderedAndProject (per-partition heaps, no global sort)."""
    ev = _events(spark, sf_dir)
    return relational.ranged_read(ev, "event_id", offset=100, count=50).select(
        "event_id", "user_id", "event_type", "value"
    )


@query(
    "q_topk_hot_users",
    oracle="""
    SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY user_id
    ORDER BY n_events DESC, user_id
    LIMIT 10
    """,
    bench=True,
    tags=("sort-limit", "agg"),
)
def q_topk_hot_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key detection (what you run before choosing a salt factor)."""
    return windows.topk_hot_users(_events(spark, sf_dir), k=10)


@query(
    "q_union_topics",
    oracle="""
    SELECT event_id, user_id, 'click' AS topic FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT event_id, user_id, 'view'  AS topic FROM events WHERE event_type = 'view'
    """,
    tags=("setops",),
)
def q_union_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-topic subscription = UNION ALL of per-topic streams (the
    reference's fan-in has no operator; a client just opens two
    consumers). No shuffle — partition concatenation."""
    ev = _events(spark, sf_dir)
    a = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.lit("click").alias("topic")
    )
    b = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", F.lit("view").alias("topic")
    )
    return relational.union_topics(a, b)


# --------------------------------------------------------------------------
# Scalar functions
# --------------------------------------------------------------------------


@query(
    "q_scalar_md5_route",
    oracle="""
    SELECT event_type AS topic,
           CAST(user_id % 8 AS BIGINT) AS bucket,
           md5(concat(event_type, '/', CAST(user_id % 8 AS VARCHAR))) AS route_id,
           count(*) AS n
    FROM events
    GROUP BY 1, 2, 3
    """,
    tags=("scalar",),
)
def q_scalar_md5_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-parity with the reference's bucket identity: md5("topic/
    bucket") (internal/topic/topic.go:17-21)."""
    ev = _events(spark, sf_dir)
    bucket = bucket_of(F.col("user_id"))
    return (
        ev.select(
            F.col("event_type").alias("topic"),
            bucket.alias("bucket"),
            route_id(F.col("event_type"), bucket).alias("route_id"),
        )
        .groupBy("topic", "bucket", "route_id")
        .agg(F.count("*").alias("n"))
    )


@query(
    "q_date_trunc_day",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           count(*) AS n,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1
    """,
    tags=("scalar", "agg"),
)
def q_date_trunc_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily rollup via date_trunc (event-time bucketing the reference
    lacks entirely — it has no notion of time, SURVEY.md §2 Table B)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


@query(
    "q_json_props_extract",
    oracle="""
    SELECT event_id,
           CASE WHEN regexp_matches(json_extract_string(props, '$.k'),
                                    '^-?\\d+$')
                THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
           END AS k
    FROM events
    """,
    tags=("json",),
)
def q_json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction from the JSON payload column — the queryable
    replacement for the reference's opaque GOB `Payload.Data` bytes
    (internal/broker/queue/queue.go:16-19). Int-literal-guarded
    TRY_CAST on both engines (see functions/scalar.json_int): a
    non-integer payload value yields NULL instead of aborting the scan
    (payloads are caller-controlled bytes), and the guard pins the
    cross-engine semantics where lenient casts diverge."""
    ev = _events(spark, sf_dir)
    return ev.select("event_id", json_int(F.col("props"), "$.k").alias("k"))


# --------------------------------------------------------------------------
# Aggregation
# --------------------------------------------------------------------------


@query(
    "q_bucket_depth_counts",
    oracle="""
    SELECT CAST(user_id % 8 AS BIGINT) AS bucket, count(*) AS depth
    FROM events
    GROUP BY 1
    """,
    tags=("agg", "pubsub"),
)
def q_bucket_depth_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bucket queue depth — Queue.Size() per bucket (internal/
    broker/queue/queue.go:39-41). Partial-aggregated: shuffle carries 8
    rows per map task, never the events."""
    return aggregates.bucket_depth(_events(spark, sf_dir))


@query(
    "q_agg_multi",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(sum(value), 2) AS sum_value,
           round(avg(value), 4) AS avg_value,
           round(min(value), 2) AS min_value,
           round(max(value), 2) AS max_value,
           count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
    bench=True,
    tags=("agg",),
)
def q_agg_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-aggregate per type incl. exact distinct (expand+two-phase).
    At 100 TB swap countDistinct for approx_count_distinct (see
    q_approx_distinct_users) unless exactness is contractual."""
    return aggregates.multi_agg(_events(spark, sf_dir))


@query(
    "q_approx_distinct_users",
    # Estimator values are sketch-specific, so the driver-checkable
    # contract is the ERROR-BOUND ASSERTION (same pattern as
    # q_ann_ivf_topk's recall audit): Spark computes the HLL++ estimate
    # AND the exact distinct side-by-side and emits the exact count
    # plus an est_ok bit requiring <= 3% relative error (3 sigma at
    # rsd 0.01). The oracle states the expected outcome in SQL; any
    # estimator degradation flips a value and fails the hash.
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS est_ok
    FROM events GROUP BY event_type
    """,
    tags=("agg", "approx"),
)
def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct users per type with an in-plan accuracy
    audit — the 100 TB cardinality path (fixed-size sketches, single
    shuffle). The audit's exact countDistinct doubles the work here to
    PROVE the estimator; production runs estimate-only."""
    ev = _events(spark, sf_dir)
    g = ev.groupBy("event_type").agg(
        F.expr("approx_count_distinct(user_id, 0.01)").alias("est"),
        F.countDistinct("user_id").alias("n_exact"),
    )
    return g.select(
        "event_type",
        F.col("n_exact").cast("bigint").alias("n_exact"),
        (
            F.abs(F.col("est") - F.col("n_exact"))
            <= 0.03 * F.col("n_exact")
        ).alias("est_ok"),
    )


@query(
    "q_rollup_type_day",
    oracle="""
    SELECT event_type,
           CAST(date_trunc('day', ts) AS DATE) AS day,
           count(*) AS n,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY ROLLUP(event_type, day)
    """,
    tags=("agg", "rollup"),
)
def q_rollup_type_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals (type, day) -> (type) -> () in one pass."""
    return aggregates.rollup_type_day(_events(spark, sf_dir))


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------


@query(
    "q_min_seq_leader",
    oracle="""
    SELECT CAST(user_id % 8 AS BIGINT) AS bucket,
           min(event_id) AS leader_seq,
           arg_min(user_id, event_id) AS leader_user
    FROM events
    GROUP BY 1
    """,
    tags=("window", "pubsub"),
)
def q_min_seq_leader(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leader election semantics: lowest sequence number per replica
    group wins (internal/lighthouse/election/election.go:61-72).
    Implemented as min/min_by aggregation, not a window — partial-
    aggregatable and skew-immune."""
    return windows.min_seq_leader(_events(spark, sf_dir))


@query(
    "q_latest_event_per_user",
    oracle="""
    SELECT user_id,
           max(event_id) AS last_event_id,
           arg_max(event_type, event_id) AS last_event_type,
           round(arg_max(value, event_id), 2) AS last_value
    FROM events
    GROUP BY user_id
    """,
    tags=("window",),
)
def q_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-1-per-key via max_by on the unique monotone event_id."""
    return windows.latest_event_per_user(_events(spark, sf_dir))


@query(
    "q_running_value",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER (
               PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
    FROM events
    """,
    bench=True,
    tags=("window",),
)
def q_running_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user sum in log order — the offset-cursor analog
    (internal/broker/consumer/server/core.go:52-62). True window: one
    shuffle on user_id + per-partition sort."""
    return windows.running_value(_events(spark, sf_dir))


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------


@query(
    "q_enrich_broadcast_join",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal, n_name, r_name
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    """,
    tags=("join",),
)
def q_enrich_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension enrich with explicit broadcast: the fact side never
    shuffles; nation/region ship as in-memory hash maps to every task."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    out = joins.broadcast_enrich(
        customer, nation, on=customer["c_nationkey"] == nation["n_nationkey"]
    )
    out = joins.broadcast_enrich(out, region, on=out["n_regionkey"] == region["r_regionkey"])
    return out.select("c_custkey", "c_name", "c_acctbal", "n_name", "r_name")


@query(
    "q_join_semi_anti",
    oracle="""
    SELECT 'with_orders' AS cls, count(*) AS n
    FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    UNION ALL
    SELECT 'without_orders' AS cls, count(*) AS n
    FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tags=("join",),
)
def q_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence filters as left-semi/left-anti joins (reference analog:
    only registered consumers may read, internal/broker/consumer/server/
    core.go:77-85). Build side carries keys only — no payload motion."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    cond = customer["c_custkey"] == orders["o_custkey"]
    with_orders = joins.semi(customer, orders, cond).agg(F.count("*").alias("n")).select(
        F.lit("with_orders").alias("cls"), "n"
    )
    without = joins.anti(customer, orders, cond).agg(F.count("*").alias("n")).select(
        F.lit("without_orders").alias("cls"), "n"
    )
    return with_orders.unionByName(without)


@query(
    "q_fact_join",
    oracle="""
    SELECT o_orderpriority,
           count(DISTINCT o_orderkey) AS n_orders,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    bench=True,
    tags=("join", "agg"),
)
def q_fact_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact equi-join + aggregate, with the eager-aggregation
    rewrite Catalyst doesn't apply itself: lineitem collapses to one
    revenue row per order key BELOW the join (partial agg runs map-side
    before its shuffle), so the join moves |orders| rows instead of
    |lineitem|, n_orders becomes a plain count (no distinct Expand),
    and the measured plan is ~1.8x faster than join-then-countDistinct.
    At 100 TB: bucket both tables by orderkey at write time and the
    remaining shuffle disappears too."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    per_order = lineitem.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    )
    j = joins.fact_join(
        orders.select("o_orderkey", "o_orderpriority"), per_order, on="o_orderkey"
    )
    return j.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("rev"), 2).alias("revenue"),
    )


@query(
    "q_tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)      AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4)      AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4)      AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    bench=True,
    tags=("agg", "flagship"),
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1 pricing summary. Scan -> codegen'd arithmetic
    -> partial agg -> 6-group final agg; the shuffle carries ~6 rows per
    task regardless of scale."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q_tpch_q3_topk",
    oracle="""
    SELECT o_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(o_orderdate AS DATE) AS odate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    bench=True,
    tags=("join", "sort-limit"),
)
def q_tpch_q3_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> two joins -> top-k.
    customer (filtered) broadcasts; orderBy(limit) is a heap merge."""
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    j = (
        orders.join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .join(li, li["l_orderkey"] == orders["o_orderkey"])
    )
    return (
        j.groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("o_orderkey", "revenue", F.to_date("o_orderdate").alias("odate"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "q_tpch_q5_region",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
    bench=True,
    tags=("join", "agg"),
)
def q_tpch_q5_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join. Dims (nation/region/supplier at
    these SFs) broadcast; the two facts shuffle once on the order key.
    Catalyst pushes r_name/o_orderdate filters below the joins."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    j = (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(li, li["l_orderkey"] == orders["o_orderkey"])
        .join(
            F.broadcast(supplier),
            (li["l_suppkey"] == supplier["s_suppkey"])
            & (customer["c_nationkey"] == supplier["s_nationkey"]),
        )
        .join(F.broadcast(nation), supplier["s_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
    )
    return j.groupBy("n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )
