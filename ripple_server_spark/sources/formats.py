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
# TIMESTAMP_NTZ columns never arise from the fixture parquet (the
# session pins inferTimestampNTZ off, so naive parquet micros read as
# TIMESTAMP) — they appear only via explicit TimestampNTZType schemas or
# NTZ-producing expressions. The timestampNTZFormat option is defense-
# in-depth for such frames: without it Spark falls back to a millisecond
# default and silently truncates µs on write. Writes use the fixed-width
# 6-digit pattern; reads accept an optional fraction so externally
# produced NTZ data with 0/3 fractional digits doesn't null out under
# PERMISSIVE mode.
TS_NTZ_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
TS_NTZ_FMT_READ = "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]"
# Same tolerance on the plain-TIMESTAMP read path: an explicit
# timestampFormat disables Spark's fallback parsers, so the strict
# 6-digit write pattern would silently NULL externally produced values
# with 0/3 fractional digits ('...:00Z', '...:00.123Z') under
# PERMISSIVE mode. Writes stay fixed-width.
TS_FMT_READ = "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]XXX"


def _ts_write_opts(w):
    return w.option("timestampFormat", TS_FMT).option("timestampNTZFormat", TS_NTZ_FMT)


def _ts_read_opts(r):
    return r.option("timestampFormat", TS_FMT_READ).option(
        "timestampNTZFormat", TS_NTZ_FMT_READ
    )


def write_json(df: DataFrame, path: str) -> None:
    _ts_write_opts(df.write.mode("overwrite")).json(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return _ts_read_opts(spark.read.schema(schema)).json(path)


def write_csv(df: DataFrame, path: str) -> None:
    _ts_write_opts(df.write.mode("overwrite").option("header", "true")).csv(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return _ts_read_opts(spark.read.schema(schema).option("header", "true")).csv(path)


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink — the other columnar at-rest format Spark ships a
    vectorized reader for; same pushdown/pruning properties as parquet
    (useful when downstream systems are ORC-native)."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
