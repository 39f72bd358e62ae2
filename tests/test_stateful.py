"""applyInPandasWithState cursor-tracker tests: state persists across
micro-batches and detects FIFO gaps."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ripple_server_spark.catalog import load_table
from ripple_server_spark.sources.topics import TopicStore
from ripple_server_spark.streaming import api
from ripple_server_spark.streaming.stateful import delivery_cursor


@pytest.fixture()
def store(spark, sf_dir, tmp_path):
    st = TopicStore(spark, str(tmp_path / "topics"))
    st.create_topic("st1", n_buckets=4)
    st.produce(load_table(spark, sf_dir, "events").limit(200), "st1")
    return st


def test_cursor_tracks_full_log_without_gaps(spark, store, tmp_path):
    # maxFilesPerTrigger=1 forces multiple micro-batches -> state must
    # carry across them.
    src = api.stream_topic(store, "st1", max_files_per_trigger=1)
    q = (
        delivery_cursor(src)
        .writeStream.format("memory")
        .queryName("m_cursor")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # last update per bucket = final cursor
    final = spark.sql(
        """
        SELECT bucket, delivered, max_seq, gaps FROM (
          SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY delivered DESC) rn
          FROM m_cursor
        ) WHERE rn = 1
        """
    ).collect()
    depths = {
        r["bucket"]: r["n"]
        for r in store.read_topic("st1").groupBy("bucket").agg(F.count("*").alias("n")).collect()
    }
    assert {r["bucket"] for r in final} == set(depths)
    for r in final:
        assert r["delivered"] == depths[r["bucket"]]
        assert r["max_seq"] == depths[r["bucket"]] - 1  # contiguous log
        assert r["gaps"] == 0


def test_cursor_detects_gaps(spark, store, tmp_path):
    # stream a filtered view that drops some sequences -> gaps > 0
    src = api.stream_topic(store, "st1").filter(F.col("seq") % 3 != 1)
    q = (
        delivery_cursor(src)
        .writeStream.format("memory")
        .queryName("m_gap")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT max(gaps) g FROM m_gap").collect()
    assert rows[0]["g"] > 0


def test_ttl_dedup_first_occurrence_only(spark, store, tmp_path):
    """transformWithState TTL dedup: replaying the same log twice must
    emit each event_id exactly once.

    transformWithStateInPandas speaks protobuf to the JVM state server;
    the container has no google.protobuf, so this skips here and runs
    in any normal Spark deployment (pip install protobuf)."""
    pytest.importorskip("google.protobuf")
    from ripple_server_spark.streaming import api
    from ripple_server_spark.streaming.stateful import dedup_stream_ttl

    src = api.stream_topic(store, "st1")
    doubled = src.unionByName(src)  # two deliveries of every row
    q = (
        dedup_stream_ttl(doubled)
        .writeStream.format("memory")
        .queryName("m_ttl_dedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ttl"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.sql("SELECT * FROM m_ttl_dedup")
    log = store.read_topic("st1")
    assert out.count() == log.count()
    assert out.select("event_id").distinct().count() == out.count()
