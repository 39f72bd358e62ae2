"""File-format connectors beyond parquet: JSON lines and CSV.

The reference has no persistence at all (memory-only queues,
SURVEY.md §1.3); these connectors exist because a real event engine
ingests from and exports to interchange formats. Parquet stays the
canonical storage (columnar, pushdown, stats); JSON/CSV are edges.

Scale notes: both readers take an explicit schema — schema inference
is a full extra pass over 100 TB and non-deterministic under sampling.
Timestamps round-trip through explicit ISO-µs formatting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
# TIMESTAMP_NTZ columns (the events table is parquet TIMESTAMP(NANOS),
# read as NTZ) are formatted via the separate timestampNTZFormat option;
# without it Spark falls back to a millisecond default and silently
# truncates µs on write.
TS_NTZ_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def _ts_opts(rw):
    return rw.option("timestampFormat", TS_FMT).option("timestampNTZFormat", TS_NTZ_FMT)


def write_json(df: DataFrame, path: str) -> None:
    _ts_opts(df.write.mode("overwrite")).json(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return _ts_opts(spark.read.schema(schema)).json(path)


def write_csv(df: DataFrame, path: str) -> None:
    _ts_opts(df.write.mode("overwrite").option("header", "true")).csv(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return _ts_opts(spark.read.schema(schema).option("header", "true")).csv(path)


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink — the other columnar at-rest format Spark ships a
    vectorized reader for; same pushdown/pruning properties as parquet
    (useful when downstream systems are ORC-native)."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
