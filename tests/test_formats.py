"""JSON/CSV connector round-trips must preserve every value exactly
(timestamps at µs, doubles bit-for-bit)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ripple_server_spark.catalog import load_table
from ripple_server_spark.sources import formats


def _canon(df):
    return sorted(
        tuple(r) for r in df.select("event_id", "ts", "user_id", "event_type", "value").collect()
    )


def test_json_roundtrip_exact(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").limit(500)
    p = str(tmp_path / "ev_json")
    formats.write_json(ev, p)
    back = formats.read_json(spark, p, ev.schema)
    assert _canon(back) == _canon(ev)


def test_csv_roundtrip_exact(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").limit(500).drop("props")  # props JSON has commas
    p = str(tmp_path / "ev_csv")
    formats.write_csv(ev, p)
    back = formats.read_csv(spark, p, ev.schema)
    assert _canon(back) == _canon(ev)


def test_json_props_column_survives(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").limit(100)
    p = str(tmp_path / "ev_json2")
    formats.write_json(ev, p)
    back = formats.read_json(spark, p, ev.schema)
    a = {r["event_id"]: r["props"] for r in ev.select("event_id", "props").collect()}
    b = {r["event_id"]: r["props"] for r in back.select("event_id", "props").collect()}
    assert a == b
    # and the JSON payload is still queryable after the round-trip
    k = back.select(F.get_json_object("props", "$.k").cast("bigint").alias("k")).collect()
    assert all(r["k"] is not None for r in k)


def test_ntz_read_accepts_variable_fraction_digits(spark, tmp_path):
    """Externally produced NTZ JSON with 0 or 3 fractional digits must
    parse (not silently null under PERMISSIVE) while engine-written
    6-digit values stay exact."""
    import datetime

    from pyspark.sql import types as T

    p = tmp_path / "ext_ntz"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"id": 1, "ts": "2024-03-01T10:00:00"}\n'
        '{"id": 2, "ts": "2024-03-01T10:00:00.123"}\n'
        '{"id": 3, "ts": "2024-03-01T10:00:00.123456"}\n'
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
        ]
    )
    got = {r["id"]: r["ts"] for r in formats.read_json(spark, str(p), schema).collect()}
    assert got == {
        1: datetime.datetime(2024, 3, 1, 10, 0, 0),
        2: datetime.datetime(2024, 3, 1, 10, 0, 0, 123000),
        3: datetime.datetime(2024, 3, 1, 10, 0, 0, 123456),
    }


def test_orc_roundtrip_and_pushdown(spark, sf_dir, tmp_path):
    """ORC roundtrip preserves rows exactly; predicates push into the
    ORC scan like parquet."""
    from ripple_server_spark.sources.formats import read_orc, write_orc

    ev = load_table(spark, sf_dir, "events").limit(500)
    path = str(tmp_path / "ev_orc")
    write_orc(ev, path)
    back = read_orc(spark, path)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in ev.collect()}
    q = back.filter(F.col("user_id") == 7).select("event_id", "user_id")
    plan = spark._jvm.PythonSQLUtils.explainString(q._jdf.queryExecution(), "formatted")
    assert "PushedFilters:" in plan and "user_id" in plan.split("PushedFilters:")[1].splitlines()[0]


def test_timestamp_read_accepts_variable_fraction_digits(spark, tmp_path):
    """Same tolerance for plain TIMESTAMP (with zone offset): external
    '...:00Z' / '...:00.123Z' values must parse, not null out — the
    explicit write format disables Spark's fallback parsers on read."""
    import datetime

    from pyspark.sql import types as T

    p = tmp_path / "ext_ts"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"id": 1, "ts": "2024-03-01T10:00:00Z"}\n'
        '{"id": 2, "ts": "2024-03-01T10:00:00.123Z"}\n'
        '{"id": 3, "ts": "2024-03-01T10:00:00.123456+00:00"}\n'
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    got = {r["id"]: r["ts"] for r in formats.read_json(spark, str(p), schema).collect()}
    assert got == {
        1: datetime.datetime(2024, 3, 1, 10, 0, 0),
        2: datetime.datetime(2024, 3, 1, 10, 0, 0, 123000),
        3: datetime.datetime(2024, 3, 1, 10, 0, 0, 123456),
    }
