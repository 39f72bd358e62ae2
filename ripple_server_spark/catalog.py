"""Table catalog: named access to the synthetic parquet tables.

The reference's only "catalog" is ZooKeeper paths mapping topic/bucket
names to broker endpoints (internal/lighthouse/io/io.go). Here a table
name maps to a parquet path, and the engine fixes up physical-type
quirks at load so every downstream operator sees clean Spark types.

Scale notes: ``spark.read.parquet`` gives vectorized columnar scans,
predicate pushdown, and partition-directory pruning for free — the
catalog deliberately returns *lazy* DataFrames so Catalyst can push
query filters/projections into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ripple_server_spark.session import ensure_runtime_conf

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Per-application caches (r12, guide §1.4 fixed overheads): the
# SCHEMA of each fixture table and the applied-conf marker. A
# spark.read.parquet with schema inference costs ~110 ms of driver
# latency (footer read + resolution) and every builder pays it per
# load_table call — ~130 ms x 1-6 tables per query, several seconds
# across a bench suite. The cache holds METADATA only (a StructType),
# never rows or plans: each call still returns a fresh lazy DataFrame
# whose action re-scans the parquet, so no result is ever reused.
# Keyed by applicationId so a new Spark application (fresh session,
# possibly different confs or rewritten fixtures) re-infers.
_schema_cache: dict = {}
_conf_applied: set = set()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table as a DataFrame with normalized types.

    ``events.ts`` is physically INT64 TIMESTAMP(NANOS) which Spark's
    reader only accepts as a long (``spark.sql.legacy.parquet.
    nanosAsLong``); we convert to a microsecond TimestampType with exact
    integer division (``div`` — double math would lose precision at
    ~1.7e18 ns) matching DuckDB's own ns->us truncation.
    """
    app = spark.sparkContext.applicationId
    if app not in _conf_applied:
        # once per application: RUNTIME_CONF keys are engine defaults a
        # fresh session needs before its first parquet read (nanosAsLong
        # changes how the reader types events.ts). Deliberate overrides
        # (scripts/audit.py audit 3 sets coalescePartitions=false
        # directly on the session) are no longer silently re-reverted on
        # every subsequent load_table call.
        ensure_runtime_conf(spark)
        _conf_applied.add(app)
    key = (app, sf_dir, name)
    schema = _schema_cache.get(key)
    if schema is None:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        _schema_cache[key] = df.schema
    else:
        df = spark.read.schema(schema).parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for spark.sql callers)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def register_topic_view(
    spark: SparkSession,
    root: str,
    topic: str,
    view: str | None = None,
    **options: str,
) -> DataFrame:
    """SQL access to a ripple_topic log: register a TEMP VIEW over
    ``spark.read.format("ripple_topic")`` with the reader options baked
    in, and return the DataFrame behind it.

    This is the supported SQL-DDL path. ``CREATE TABLE ... USING
    ripple_topic OPTIONS (...)`` resolves the schema with the options
    but Spark never delivers OPTIONS back to a *Python* data source
    reader at scan time, so scans from such a table fail with the
    option-required error (sources/datasource._required_opt). A view
    closes that hole: the options live in the view's plan, SQL callers
    query it like any table, and every scan goes through the normal
    batch reader (bucket pruning, seq row-group filters intact).

    Extra reader options pass through verbatim (e.g. ``offset="10"``
    for a per-bucket floor). The view is session-scoped, like every
    temp view — re-register after a new session, exactly as with
    ``register_views``. The helper registers the ``ripple_topic``
    data source itself (idempotently), so it works in a fresh session
    without a prior ``spark.dataSource.register`` call — it exists to
    CLOSE a UX hole, so it must not have a registration prerequisite
    of its own (review r09).
    """
    from ripple_server_spark.sources.datasource import RippleTopicDataSource

    spark.dataSource.register(RippleTopicDataSource)
    reader = (
        spark.read.format("ripple_topic")
        .option("root", root)
        .option("topic", topic)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.load()
    df.createOrReplaceTempView(view or topic)
    return df
