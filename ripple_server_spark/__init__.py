"""ripple_server_spark — a PySpark-native event-log/analytics engine.

A ground-up Spark reimplementation of the *capabilities* of the
``ripple-mq/ripple-server`` reference (a Kafka-style in-memory message
queue: topics/buckets, leader-replicated brokers, offset-tracked
consumers — see SURVEY.md):

- topics become durable, partitioned parquet event tables
  (``sources/topics.py``), replacing in-memory queues + app-level
  replication (reference ``internal/broker/queue/queue.go``,
  ``internal/broker/producer/server/core.go``) with storage-level
  durability;
- produce/consume become a Structured Streaming sink/source plus a
  batch offset-tracked ranged read (``streaming/``), preserving
  per-bucket FIFO, fan-out pub/sub, and at-least-once semantics
  (reference ``internal/broker/consumer/server/core.go``);
- the analytic query surface (filter/agg/window/join/top-k/dedup/
  similarity/text) is declared through the DataFrame API so Catalyst
  owns optimization (``operators/``, ``functions/``, ``plans/``).

Everything here is built only on the public Apache Spark API and is
designed for a 1000-executor / 100 TB deployment while being testable
on ``local[*]``: queries are declarative (predicate pushdown + column
pruning reach the parquet scan), joins broadcast small dimensions,
aggregations are partial-aggregate friendly, and the quadratic
extension ops (near-dup, ANN) go through LSH-style candidate
generation instead of cross joins.
"""

# Lazy re-exports (PEP 562): the eager form imported session + catalog +
# topics + rollup + dedup (transitively pyspark.sql, pandas, numpy) the
# moment ANY submodule was touched — ~0.5 s added to every process that
# imports one module from the package, and the Python STREAMING source
# runner plus every executor worker that unpickles a reader/kernel is
# such a process (guide §1.4 fixed overheads: this was ~20% of a
# streaming query's bring-up). `from ripple_server_spark import
# TopicStore` still works; it just resolves on first attribute access.
_EXPORTS = {
    "get_spark": ("ripple_server_spark.session", "get_spark"),
    "TABLES": ("ripple_server_spark.catalog", "TABLES"),
    "load_table": ("ripple_server_spark.catalog", "load_table"),
    "register_views": ("ripple_server_spark.catalog", "register_views"),
    "TopicStore": ("ripple_server_spark.sources.topics", "TopicStore"),
    "HourlyRollup": ("ripple_server_spark.sources.rollup", "HourlyRollup"),
    "IncrementalSetSimJoin": (
        "ripple_server_spark.operators.dedup",
        "IncrementalSetSimJoin",
    ),
}


def __getattr__(name: str):
    try:
        mod_name, attr = _EXPORTS[name]
    except KeyError:
        raise AttributeError(
            f"module {__name__!r} has no attribute {name!r}"
        ) from None
    import importlib

    value = getattr(importlib.import_module(mod_name), attr)
    globals()[name] = value  # cache: next access skips __getattr__
    return value


__all__ = [
    "get_spark",
    "TABLES",
    "load_table",
    "register_views",
    "TopicStore",
    "HourlyRollup",
    "IncrementalSetSimJoin",
]
__version__ = "0.1.0"
