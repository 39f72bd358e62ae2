"""SparkSession construction with scale-oriented defaults.

Single place where engine-level Spark configuration lives (the analog of
the reference's server bootstrap, ``cmd/root.go:27-43`` — but here the
"server" is a SparkSession). All settings are also applied best-effort at
runtime by :func:`ensure_runtime_conf` so the engine works on sessions it
did not create (the correctness driver passes us its own session).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ripple_server_spark.config import default_cpus

# Session-level (runtime-settable) confs. Rationale:
# - adaptive execution: runtime shuffle-partition coalescing + skew-join
#   splitting; at 100 TB, static shuffle.partitions is always wrong for
#   some stage, AQE re-plans from actual map output sizes.
# - arrow: pandas_udf/applyInPandas transfer in Arrow batches, not
#   pickled rows.
# - UTC: parquet timestamps are naive; pin the session so event-time
#   functions agree with the DuckDB oracle byte-for-byte.
# - nanosAsLong: the events table stores TIMESTAMP(NANOS) which Spark's
#   parquet reader rejects; read as long and convert (catalog.py).
# - inferTimestampNTZ off: parquet timestamps with isAdjustedToUTC=false
#   (the regenerated events table is timestamp[us] naive) would read as
#   TIMESTAMP_NTZ, which unix_micros/window/watermark paths reject; with
#   the session pinned to UTC, reading them as TIMESTAMP gives identical
#   values and keeps one timestamp type across the engine.
RUNTIME_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # 64 MiB broadcast threshold: dimension tables (region/nation/
    # customer/part at test SFs; any <= a few hundred MB at 100 TB with
    # executor memory to spare) should never shuffle-join.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
}


def get_spark(
    app_name: str = "ripple-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``shuffle_partitions`` defaults to the local core count; on a real
    cluster leave it high (or unset) and let AQE coalesce — the initial
    number only bounds parallelism of the first shuffle.
    """
    cpus = default_cpus()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        # Whole-stage codegen emits one class per query stage; across a
        # long session the default 240 MB JIT code cache fills, the JVM
        # stops compiling, and EVERYTHING silently degrades to
        # interpreted (~10-30x). A bigger, flushing code cache keeps
        # codegen'd stages compiled. (Also where a real deployment sets
        # executor GC options.)
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
    )
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def ensure_runtime_conf(spark: SparkSession) -> None:
    """Apply engine confs to an externally created session (best effort).

    All keys in RUNTIME_CONF are session-scoped SQL confs, so this works
    on a running session; anything unsettable is skipped rather than
    failing the query.
    """
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
