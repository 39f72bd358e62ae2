"""Query registry: name -> (Spark builder, DuckDB oracle SQL).

Cross-engine result contract (so the driver's row-count + schema +
value-hash comparison is exact, not approximate):

- every computed column is aliased identically in both engines;
- integer outputs are always BIGINT (DuckDB ``len()``/``count`` return
  BIGINT; Spark ``size()`` returns INT — builders normalize via
  :func:`norm_types`);
- float outputs are DOUBLE, rounded at the result edge (2–4 dp) because
  parallel summation order differs between engines;
- timestamps are exposed as epoch microseconds (BIGINT) or DATE;
- any top-k / rank uses an explicit unique tie-break column.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

Builder = Callable[[SparkSession, str], DataFrame]

SPECS: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # None => non-SQL-expressible, rows-only check
    bench: bool = False  # part of the headline bench set
    tags: tuple[str, ...] = field(default_factory=tuple)


def norm_types(df: DataFrame) -> DataFrame:
    """Cast narrow ints -> BIGINT and float -> DOUBLE on result edges."""
    cols = []
    for f_ in df.schema.fields:
        if isinstance(f_.dataType, (T.IntegerType, T.ShortType, T.ByteType)):
            cols.append(F.col(f_.name).cast("bigint").alias(f_.name))
        elif isinstance(f_.dataType, T.FloatType):
            cols.append(F.col(f_.name).cast("double").alias(f_.name))
        else:
            cols.append(F.col(f_.name))
    return df.select(*cols)


def query(
    name: str,
    oracle: str | None,
    bench: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[Builder], Builder]:
    """Register a declared query. The builder's result is type-normalized
    so its schema matches the DuckDB oracle's."""

    def deco(fn: Builder) -> Builder:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            return norm_types(fn(spark, sf_dir))

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        SPECS[name] = QuerySpec(name=name, builder=wrapped, oracle=oracle, bench=bench, tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, Builder]:
    return {name: spec.builder for name, spec in SPECS.items()}


def all_oracles() -> dict[str, str]:
    return {name: spec.oracle for name, spec in SPECS.items() if spec.oracle is not None}


def bench_queries() -> dict[str, Builder]:
    return {name: spec.builder for name, spec in SPECS.items() if spec.bench}
