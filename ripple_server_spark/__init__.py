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

from ripple_server_spark.session import get_spark
from ripple_server_spark.catalog import TABLES, load_table, register_views
from ripple_server_spark.sources.topics import TopicStore
from ripple_server_spark.sources.rollup import HourlyRollup
from ripple_server_spark.operators.dedup import IncrementalSetSimJoin

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
