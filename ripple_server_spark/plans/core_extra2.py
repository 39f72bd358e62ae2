"""Further coverage: selective scan-agg (TPC-H Q6 shape), scalar
subquery, exact percentiles, and a grouped-map Pandas operator with a
SQL oracle (the applyInPandas surface).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ripple_server_spark.catalog import load_table
from ripple_server_spark.plans.registry import query


@query(
    "q_tpch_q6",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    bench=True,
    tags=("agg", "filter"),
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: forecasting-revenue-change — the purest
    pushdown test (4 pushed predicates, 3-column ReadSchema, single
    partial-agg scalar result; zero shuffle rows beyond 1/task)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count("*").alias("n"),
        )
    )


@query(
    "q_above_avg_value",
    oracle="""
    SELECT event_type, count(*) AS n
    FROM events
    WHERE value > (SELECT avg(value) FROM events)
    GROUP BY event_type
    """,
    tags=("subquery", "agg"),
)
def q_above_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery filter: events above the global mean value.
    The subquery aggregates to one row and broadcasts into the filter
    (two passes over the scan, no shuffle of the fact)."""
    ev = load_table(spark, sf_dir, "events")
    avg_df = ev.agg(F.avg("value").alias("gavg"))
    return (
        ev.join(F.broadcast(avg_df))
        .filter(F.col("value") > F.col("gavg"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )


@query(
    "q_percentile_value",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.95), 4) AS p95
    FROM events
    GROUP BY event_type
    """,
    tags=("agg", "percentile"),
)
def q_percentile_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per type (Spark `percentile` ==
    DuckDB `quantile_cont`, both linear interpolation). Sort-based
    aggregate; at 100 TB switch to approx_percentile (t-digest sketch,
    partial-aggregatable) when 1e-3 relative error is acceptable."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
    )


@query(
    "q_approx_percentile_value",
    # Sketch values are estimator-specific, so the driver-checkable
    # contract is the ERROR-BOUND ASSERTION (q_ann_ivf_topk pattern):
    # approx and exact percentiles computed side-by-side; the output
    # carries the exact values plus a sketch_ok bit requiring the
    # approx to land within max(8.0 absolute, 3% relative) — sized to
    # the sparse-tail gap at the smallest fixture (nearest-rank vs
    # interpolated can differ by the local value gap).
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS p50_exact,
           round(quantile_cont(value, 0.95), 4) AS p95_exact,
           TRUE AS sketch_ok
    FROM events GROUP BY event_type
    """,
    tags=("agg", "percentile", "approx"),
)
def q_approx_percentile_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB percentile path with an in-plan accuracy audit:
    approx_percentile sketches merge map-side (no global sort); the
    audit's exact percentile doubles the work here to PROVE the
    sketch; production runs sketch-only."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.expr("approx_percentile(value, 0.5, 10000)").alias("a50"),
        F.expr("approx_percentile(value, 0.95, 10000)").alias("a95"),
        F.expr("percentile(value, 0.5)").alias("e50"),
        F.expr("percentile(value, 0.95)").alias("e95"),
    )
    tol = lambda e: F.greatest(F.lit(8.0), 0.03 * e)  # noqa: E731
    return g.select(
        "event_type",
        F.round("e50", 4).alias("p50_exact"),
        F.round("e95", 4).alias("p95_exact"),
        (
            (F.abs(F.col("a50") - F.col("e50")) <= tol(F.col("e50")))
            & (F.abs(F.col("a95") - F.col("e95")) <= tol(F.col("e95")))
        ).alias("sketch_ok"),
    )


ZSCORE_SCHEMA = "user_id long, event_id long, zscore double"


def _zscore(pdf: pd.DataFrame) -> pd.DataFrame:
    mu = pdf["value"].mean()
    sd = pdf["value"].std(ddof=1)  # sample stddev == stddev_samp
    z = (pdf["value"] - mu) / sd if (sd and sd == sd and sd > 0) else pdf["value"] * float("nan")
    return pd.DataFrame(
        {"user_id": pdf["user_id"], "event_id": pdf["event_id"], "zscore": z}
    )


@query(
    "q_user_zscore_pandas",
    oracle="""
    SELECT user_id, event_id,
           round((value - avg(value) OVER (PARTITION BY user_id))
                 / stddev_samp(value) OVER (PARTITION BY user_id), 4) AS zscore
    FROM events
    """,
    tags=("udf", "arrow", "window"),
)
def q_user_zscore_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map Pandas operator (applyInPandas): per-user z-score
    normalization — the canonical "custom per-group kernel" surface.
    One shuffle on user_id; each group is a single Arrow batch in
    Python. Oracle = the equivalent window-function SQL.

    The explicit numbered repartition sizes the shuffle by GROUP
    count, not bytes: this stage's cost is per-group Python overhead,
    invisible to AQE's byte-based coalescing, which would otherwise
    fold the small shuffle into one task and run every group through
    a single pandas worker serially (measured ~2.5x slower)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("user_id", "event_id", "value")
        .repartition(spark.sparkContext.defaultParallelism, "user_id")
        .groupBy("user_id")
        .applyInPandas(_zscore, schema=ZSCORE_SCHEMA)
        # Degenerate groups (1 row -> sd NaN; constant -> sd 0) become
        # NULL, matching SQL stddev_samp's NULL (the driver comparator
        # treats NaN and NULL as distinct); rounding happens here so
        # the mode is HALF_UP like the oracle's round(), not pandas
        # half-even.
        .withColumn(
            "zscore",
            F.when(F.isnan("zscore"), F.lit(None)).otherwise(F.round("zscore", 4)),
        )
    )
