"""Scalar functions: routing ids, time bucketing, JSON extraction.

The reference's single scalar function is the md5 topic/bucket identity
(internal/topic/topic.go:17-21: ``md5(topic + "/" + bucket)``); we
reproduce it exactly. JSON extraction replaces the reference's opaque
GOB payloads (``Payload.Data []byte``) with a typed, queryable column.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def route_id(topic: Column, bucket: Column) -> Column:
    """md5(topic/bucket) — byte-parity with the reference's bucket id
    (internal/topic/topic.go:17-21). Pure codegen expression."""
    return F.md5(F.concat_ws("/", topic, bucket.cast("string")))


def json_int(col: Column, path: str) -> Column:
    """Extract an integer field from a JSON string column.

    ``get_json_object`` is a codegen'd JVM path (Jackson streaming) —
    no Python round-trip; at scale prefer parsing once with
    ``from_json`` into a struct column if many fields are read.

    Non-integer values at the path (float, non-numeric string, object)
    yield NULL, never an error: payload JSON is caller-controlled, and
    one dirty payload among 10¹¹ rows killing the whole scan under ANSI
    mode is the wrong failure mode. The integer-literal regex guard is
    explicit because engines disagree on lenient casts (DuckDB
    TRY_CAST('1.5' AS BIGINT) ROUNDS to 2; Spark's returns NULL) — the
    guard pins the portable semantics: an int field is extracted, a
    float/other field is a type mismatch → NULL. ``try_cast`` behind
    the guard still NULLs int64 overflow identically on both engines.
    Oracles mirror this shape verbatim (regexp_matches + TRY_CAST)."""
    s = F.get_json_object(col, path)
    return F.when(s.rlike(r"^-?\d+$"), s.try_cast("bigint"))


def ts_micros(col: Column) -> Column:
    """Canonical cross-engine timestamp representation (int64 epoch µs).

    Query results expose timestamps this way so value comparison is
    exact across engines/timezones (DuckDB: epoch_us)."""
    return F.unix_micros(col)


# 48-bit md5-prefix hash as a SQL fragment: fill {expr} with any SQL
# string expression. Fits a BIGINT exactly (no sign issues), and DuckDB
# regenerates it verbatim via ('0x' || substr(md5(expr), 1, 12))::BIGINT,
# so bit_xor over it is the repo's order-independent content
# fingerprint for verifying SAMPLES (not just their sizes) across
# engines. Single source of truth — format, don't re-type.
H48_SQL = "cast(conv(substring(md5({expr}), 1, 12), 16, 10) as bigint)"


def xor_fingerprint48(expr: str) -> str:
    """bit_xor aggregate over :data:`H48_SQL` of ``expr`` — the
    order-independent multiset fingerprint used by the replication,
    sampling, and redaction oracles."""
    return f"bit_xor({H48_SQL.format(expr=expr)})"
