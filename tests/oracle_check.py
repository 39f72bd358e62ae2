"""Local mirror of the driver's correctness gate.

Runs every declared query on Spark and its oracle on DuckDB over the
same parquet directory, then compares row count, column names/order-
insensitively, and values. Comparison is STRICTER than the driver's
(exact equality after canonical sorting, small float tolerance only as
a diagnostic) so that passing here predicts passing there.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb

from ripple_server_spark.catalog import TABLES


@dataclass
class Diff:
    name: str
    kind: str  # rowcount | columns | values | error
    detail: str


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round FIRST, then collapse ±0: exact 0.0, 1e-10 and -1e-10
        # must all canonicalize identically ('0'), not '0'/'0.0'/'-0.0'.
        r = round(v, 9)
        if r == 0:
            return "0"
        return repr(r)
    if isinstance(v, (bytes, bytearray)):
        # Spark collects binary as bytearray, DuckDB returns bytes —
        # same payload must compare equal.
        return repr(bytes(v))
    if hasattr(v, "asDict"):
        # pyspark Row (struct cell) vs DuckDB dict — MUST come before
        # the tuple branch (Row subclasses tuple)
        return _canon_cell(v.asDict())
    if isinstance(v, (list, tuple)):
        # arrays: canonicalize elementwise so nested floats get the
        # same rounding/zero/NaN treatment as scalars
        return "[" + ", ".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ", ".join(
            f"{k!r}: {_canon_cell(v[k])}" for k in sorted(v)
        ) + "}"
    return repr(v)


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


# Spark simpleString -> DuckDB DESCRIBE column_type names it may map to.
# The driver's value-hash is dtype-sensitive (HUGEINT 0 hashes differently
# from BIGINT 0 via pandas Decimal), so the local gate must reject *type*
# drift, not just value drift.  Complex (array/struct/map) types are
# compared by value only.
_TYPE_OK = {
    "bigint": {"BIGINT"},
    "int": {"INTEGER"},
    "double": {"DOUBLE"},
    "float": {"FLOAT", "REAL"},
    "string": {"VARCHAR"},
    "date": {"DATE"},
    "boolean": {"BOOLEAN"},
    "binary": {"BLOB"},
    "timestamp": {"TIMESTAMP", "TIMESTAMP WITH TIME ZONE"},
    "timestamp_ntz": {"TIMESTAMP"},
}


def dtype_diffs(sdf, con, sql: str) -> list[str]:
    """Column-type incompatibilities between a Spark result and its
    DuckDB oracle, via ``DESCRIBE`` (bind-only, no execution)."""
    o_types = {
        r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()
    }
    out = []
    for f_ in sdf.schema.fields:
        allowed = _TYPE_OK.get(f_.dataType.simpleString())
        otyp = o_types.get(f_.name)
        if allowed is not None and otyp is not None and otyp not in allowed:
            out.append(f"{f_.name}: spark={f_.dataType.simpleString()} duckdb={otyp}")
    return out


def compare_query(spark, con, name: str, builder, sql: str, sf_dir: str) -> Diff | None:
    sdf = builder(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    o = con.execute(sql)
    o_cols = [d[0] for d in o.description]
    o_rows = o.fetchall()
    if sorted(s_cols) != sorted(o_cols):
        return Diff(name, "columns", f"spark={sorted(s_cols)} oracle={sorted(o_cols)}")
    bad_types = dtype_diffs(sdf, con, sql)
    if bad_types:
        return Diff(name, "dtypes", "; ".join(bad_types))
    if len(s_rows) != len(o_rows):
        return Diff(name, "rowcount", f"spark={len(s_rows)} oracle={len(o_rows)}")
    _, sc = _canon_rows(s_cols, s_rows)
    _, oc = _canon_rows(o_cols, o_rows)
    if sc != oc:
        bad = [(a, b) for a, b in zip(sc, oc) if a != b][:3]
        return Diff(name, "values", f"first diffs: {bad}")
    return None
