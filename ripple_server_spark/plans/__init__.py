"""Declared query plans: the driver-visible surface of the engine.

Every operator capability from SURVEY.md §2 is declared here as a named
query with (a) a DataFrame builder and (b) an ANSI-SQL DuckDB oracle,
so correctness is machine-checked query-by-query.
"""

from ripple_server_spark.plans.registry import SPECS, QuerySpec, all_queries, all_oracles

# Importing the plan modules populates SPECS via the @query decorator.
from ripple_server_spark.plans import core as _core  # noqa: E402,F401
from ripple_server_spark.plans import core_extra as _core_extra  # noqa: E402,F401
from ripple_server_spark.plans import core_extra2 as _core_extra2  # noqa: E402,F401
from ripple_server_spark.plans import core_extra3 as _core_extra3  # noqa: E402,F401
from ripple_server_spark.plans import tpch_more as _tpch_more  # noqa: E402,F401
from ripple_server_spark.plans import tpch_more2 as _tpch_more2  # noqa: E402,F401
from ripple_server_spark.plans import graph as _graph  # noqa: E402,F401
from ripple_server_spark.plans import analytics2 as _analytics2  # noqa: E402,F401
from ripple_server_spark.plans import analytics3 as _analytics3  # noqa: E402,F401
from ripple_server_spark.plans import textrank as _textrank  # noqa: E402,F401
from ripple_server_spark.plans import pubsub as _pubsub  # noqa: E402,F401
from ripple_server_spark.plans import extensions as _extensions  # noqa: E402,F401
from ripple_server_spark.plans import pipeline2 as _pipeline2  # noqa: E402,F401
from ripple_server_spark.plans import pipeline3 as _pipeline3  # noqa: E402,F401
from ripple_server_spark.plans import pipeline4 as _pipeline4  # noqa: E402,F401
from ripple_server_spark.plans import pipeline5 as _pipeline5  # noqa: E402,F401
from ripple_server_spark.plans import analytics4 as _analytics4  # noqa: E402,F401
from ripple_server_spark.plans import pipeline6 as _pipeline6  # noqa: E402,F401
from ripple_server_spark.plans import quality2 as _quality2  # noqa: E402,F401

__all__ = ["SPECS", "QuerySpec", "all_queries", "all_oracles"]
