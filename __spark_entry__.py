"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (TPC-H Q1 pricing summary) at
  sf0.001 — smoke check.
- ``queries()``: every declared operator from SURVEY.md §2 (core
  relational + pub/sub semantics + dedup/similarity/text/multimodal
  extensions), one ``(spark, sf_dir) -> DataFrame`` callable each.
- ``oracle_sql()``: the DuckDB-equivalent SQL per query — EVERY
  registered query has one. Estimator-specific queries (HLL distinct,
  t-digest percentiles, IVF recall, the resize kernel) carry an
  in-plan accuracy/agreement audit whose expected outcome the oracle
  states, so even sketch outputs are value-hash-checked.

Implementation lives in the ``ripple_server_spark`` package.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ripple_server_spark.plans import all_oracles, all_queries
from ripple_server_spark.plans.registry import SPECS


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return SPECS["q_tpch_q1"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query key (same column aliases)."""
    return all_oracles()
