"""Topic-store semantics tests — the delivery guarantees SURVEY.md §2
says are worth preserving: per-bucket FIFO total order, at-least-once
non-destructive reads, independent per-consumer offsets (fan-out), and
contiguous gap-free sequences.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ripple_server_spark.catalog import load_table
from ripple_server_spark.sources.topics import TopicStore

N_BUCKETS = 4


@pytest.fixture(scope="module")
def store(spark, sf_dir, tmp_path_factory):
    st = TopicStore(spark, str(tmp_path_factory.mktemp("topics")))
    st.create_topic("t1", n_buckets=N_BUCKETS)
    ev = load_table(spark, sf_dir, "events").limit(400)
    st.produce(ev, "t1")
    return st


def test_produce_assigns_contiguous_seq_per_bucket(store):
    log = store.read_topic("t1")
    per_bucket = (
        log.groupBy("bucket")
        .agg(F.min("seq").alias("mn"), F.max("seq").alias("mx"), F.count("*").alias("n"))
        .collect()
    )
    assert len(per_bucket) == N_BUCKETS
    for r in per_bucket:
        assert r["mn"] == 0
        assert r["mx"] == r["n"] - 1  # gap-free: max == count-1


def test_second_produce_extends_sequences(store, spark, sf_dir):
    # deterministic id-range slice — limit() before a filter would let the
    # engine pick an arbitrary 600 rows and could leave this batch empty
    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("event_id") >= 400) & (F.col("event_id") < 600)
    )
    store.produce(ev, "t1")
    log = store.read_topic("t1")
    per_bucket = (
        log.groupBy("bucket")
        .agg(F.max("seq").alias("mx"), F.count("*").alias("n"))
        .collect()
    )
    assert sum(r["n"] for r in per_bucket) == 600  # append landed: 400 + 200
    for r in per_bucket:
        assert r["mx"] == r["n"] - 1  # still contiguous after append


def test_produce_routes_null_keys_to_bucket_zero(spark, sf_dir, tmp_path):
    """NULL routing keys must land in a REAL bucket (0 — the
    deterministic analog of Kafka's null-key routing), with seq joining
    bucket 0's normal contiguous chain. pmod(NULL) is NULL: unrouted it
    would write a __HIVE_DEFAULT_PARTITION__ dir into the manifest
    (breaking every ripple_topic reader) and restart seq at 0 on every
    produce."""
    st = TopicStore(spark, str(tmp_path / "null_keys"))
    st.create_topic("nk", n_buckets=4)
    ev = load_table(spark, sf_dir, "events")
    nulled = ev.filter(F.col("event_id") < 100).withColumn(
        "user_id",
        F.when(F.col("event_id") % 5 == 0, F.lit(None)).otherwise(F.col("user_id")),
    )
    st.produce(nulled, "nk")
    st.produce(nulled.withColumn("event_id", F.col("event_id") + 1000), "nk")
    log = st.read_topic("nk")
    assert log.count() == 200
    assert log.filter(F.col("bucket").isNull()).count() == 0
    per = (
        log.groupBy("bucket")
        .agg(F.min("seq").alias("mn"), F.max("seq").alias("mx"), F.count("*").alias("n"))
        .collect()
    )
    for r in per:  # contiguity holds with NULL keys folded into bucket 0
        assert r["mn"] == 0 and r["mx"] == r["n"] - 1
    # the manifest references only real bucket dirs
    _v, m = st.latest_manifest("nk")
    assert all(rel.startswith("bucket=") and "__HIVE" not in rel for rel in m["files"])


def test_fifo_order_follows_ts_within_bucket(store):
    rows = (
        store.read_topic("t1")
        .filter(F.col("bucket") == 1)
        .orderBy("seq")
        .select("ts", "event_id")
        .collect()
    )
    ordered = sorted(rows, key=lambda r: (r["ts"], r["event_id"]))
    assert rows == ordered


def test_consume_is_ordered_and_nondestructive(store):
    store.register_consumer("cA", "t1")
    batch1, next1 = store.consume("cA", "t1", bucket=2, count=10)
    seqs1 = [r["seq"] for r in batch1.orderBy("seq").collect()]
    assert seqs1 == list(range(0, len(seqs1)))
    # no commit -> re-read delivers the same batch (at-least-once)
    batch1b, _ = store.consume("cA", "t1", bucket=2, count=10)
    assert [r["seq"] for r in batch1b.orderBy("seq").collect()] == seqs1


def test_commit_advances_offset(store):
    store.register_consumer("cB", "t1")
    b1, next_off = store.consume("cB", "t1", bucket=0, count=5)
    store.commit("cB", "t1", 0, next_off)
    b2, _ = store.consume("cB", "t1", bucket=0, count=5)
    s1 = {r["seq"] for r in b1.collect()}
    s2 = {r["seq"] for r in b2.collect()}
    assert not (s1 & s2)
    assert min(s2) == max(s1) + 1


def test_fanout_consumers_have_independent_offsets(store):
    store.register_consumer("cX", "t1")
    store.register_consumer("cY", "t1")
    bx, nx = store.consume("cX", "t1", bucket=3, count=7)
    store.commit("cX", "t1", 3, nx)
    # cY is unaffected by cX's commit: still reads from 0
    by, _ = store.consume("cY", "t1", bucket=3, count=7)
    assert [r["seq"] for r in by.orderBy("seq").collect()] == [
        r["seq"] for r in bx.orderBy("seq").collect()
    ]


def test_consume_clamps_at_end_of_log(store):
    """SubArray clamps end to len (concurrent_list.go:63-73): asking for
    more than remains returns what exists."""
    store.register_consumer("cZ", "t1")
    depth = store.read_topic("t1").filter(F.col("bucket") == 1).count()
    batch, next_off = store.consume("cZ", "t1", bucket=1, count=10_000)
    assert batch.count() == depth
    assert next_off == depth


def test_compact_shrinks_files_and_preserves_log(spark, sf_dir, tmp_path):
    """Compaction: same rows, same seqs, fewer files; offsets stay
    valid (consume after compact returns the same batch)."""
    import glob

    from ripple_server_spark.catalog import load_table

    store = TopicStore(spark, str(tmp_path / "t"))
    store.create_topic("c1", n_buckets=4)
    ev = load_table(spark, sf_dir, "events")
    for lo, hi in ((0, 100), (100, 200), (200, 300)):
        store.produce(
            ev.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi)), "c1"
        )
    store.register_consumer("cc", "c1")
    batch_before, nxt = store.consume("cc", "c1", bucket=0, count=10)
    rows_before = [tuple(r) for r in batch_before.select("seq", "event_id").collect()]
    log_before = {
        (r["bucket"], r["seq"], r["event_id"])
        for r in store.read_topic("c1").select("bucket", "seq", "event_id").collect()
    }
    n_files_before = len(glob.glob(str(tmp_path / "t/topics/c1/data/bucket=*/*.parquet")))

    # pin a pre-compaction snapshot: it must stay readable mid-compact
    v_before, _m = store.latest_manifest("c1")

    store.compact("c1")

    # old files persist until vacuum — the pinned snapshot still reads
    snap = {
        (r["bucket"], r["seq"], r["event_id"])
        for r in store.read_topic("c1", version=v_before)
        .select("bucket", "seq", "event_id")
        .collect()
    }
    assert snap == log_before

    store.vacuum("c1")
    n_files_after = len(glob.glob(str(tmp_path / "t/topics/c1/data/bucket=*/*.parquet")))
    assert n_files_after < n_files_before
    assert n_files_after <= 4  # one per bucket
    log_after = {
        (r["bucket"], r["seq"], r["event_id"])
        for r in store.read_topic("c1").select("bucket", "seq", "event_id").collect()
    }
    assert log_after == log_before
    batch_after, nxt2 = store.consume("cc", "c1", bucket=0, count=10)
    assert [tuple(r) for r in batch_after.select("seq", "event_id").collect()] == rows_before
    assert nxt2 == nxt
    # appends after compaction continue the seq chain
    store.produce(ev.filter((F.col("event_id") >= 300) & (F.col("event_id") < 350)), "c1")
    per_bucket = (
        store.read_topic("c1")
        .groupBy("bucket")
        .agg(F.min("seq").alias("mn"), F.max("seq").alias("mx"), F.count("*").alias("n"))
        .collect()
    )
    for r in per_bucket:
        assert r["mn"] == 0 and r["mx"] == r["n"] - 1


def test_produce_batch_id_idempotence(spark, sf_dir, tmp_path):
    """A replayed produce with the same batch_id must be a no-op: same
    row count, same maxima, no duplicate seqs (the exactly-once
    producer contract the reference's fire-and-forget acks lack)."""
    st = TopicStore(spark, str(tmp_path / "idem"))
    st.create_topic("t", n_buckets=4)
    ev = load_table(spark, sf_dir, "events").limit(200)

    n1 = st.produce(ev, "t", batch_id="b-1")
    assert n1 == 200
    assert st.produce(ev, "t", batch_id="b-1") == 0  # replay -> no-op
    assert st.read_topic("t").count() == 200
    n2 = st.produce(ev, "t", batch_id="b-2")  # new id appends
    assert n2 == 200
    df = st.read_topic("t")
    assert df.count() == 400
    # per-bucket seqs stay contiguous and distinct after the replay mix
    from pyspark.sql import functions as F2
    chk = df.groupBy("bucket").agg(
        F2.min("seq").alias("lo"), F2.max("seq").alias("hi"),
        F2.countDistinct("seq").alias("n")
    ).collect()
    for r in chk:
        assert r["lo"] == 0 and r["n"] == r["hi"] + 1


def test_schema_evolution_on_produce(spark, tmp_path):
    """A later produce may ADD columns; snapshot reads must surface the
    union schema with nulls for pre-evolution rows (previously the read
    silently dropped evolved columns)."""
    from ripple_server_spark.catalog import load_table
    from tests.conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id", "ts")
    store = TopicStore(spark, str(tmp_path))
    store.create_topic("evo", n_buckets=2)
    store.produce(ev.filter(F.col("event_id") < 100), "evo", key_col="user_id")
    store.produce(
        ev.filter((F.col("event_id") >= 100) & (F.col("event_id") < 200))
        .withColumn("tag", F.lit("v2")),
        "evo",
        key_col="user_id",
    )
    df = store.read_topic("evo")
    assert "tag" in df.columns
    assert df.count() == 200
    assert df.filter(F.col("tag").isNull()).count() == 100  # old rows
    assert df.filter(F.col("tag") == "v2").count() == 100
    # consume path carries the evolved column too
    batch, _ = store.consume("c-evo", "evo", bucket=0, count=10_000)
    assert "tag" in batch.columns


def test_schema_evolution_flag_and_compact_reset(spark, tmp_path):
    """The manifest tracks evolution: un-evolved topics read without
    mergeSchema; an evolving produce sets the flag; compaction rewrites
    to one uniform schema and clears it (evolved column survives)."""
    from ripple_server_spark.catalog import load_table
    from tests.conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id", "ts")
    store = TopicStore(spark, str(tmp_path))
    store.create_topic("evo2", n_buckets=2)
    store.produce(ev.filter(F.col("event_id") < 100), "evo2", key_col="user_id")
    assert not store.latest_manifest("evo2")[1].get("schema_evolved")
    store.produce(
        ev.filter((F.col("event_id") >= 100) & (F.col("event_id") < 200))
        .withColumn("tag", F.lit("v2")),
        "evo2",
        key_col="user_id",
    )
    assert store.latest_manifest("evo2")[1]["schema_evolved"] is True
    store.compact("evo2")
    m = store.latest_manifest("evo2")[1]
    assert m["schema_evolved"] is False
    df = store.read_topic("evo2")
    assert "tag" in df.columns and df.count() == 200
    assert df.filter(F.col("tag") == "v2").count() == 100


def test_edge_cases_empty_produce_past_hwm_noop_truncate(spark, sf_dir, tmp_path):
    """Operational edge cases a broker must not trip on: producing an
    EMPTY batch neither errors nor burns a manifest version or seq;
    consuming from an offset past the high watermark returns an empty
    batch with the offset unchanged; truncating below the current
    floor is a no-op that deletes nothing."""
    st = TopicStore(spark, str(tmp_path / "edge_topics"))
    st.create_topic("e1", n_buckets=2)
    ev = load_table(spark, sf_dir, "events")
    st.produce(ev.limit(40), "e1")
    v_before = st.latest_manifest("e1")[0]
    n_before = st.read_topic("e1").count()

    # empty produce: no rows, no version burn, seq continuity intact
    st.produce(ev.limit(0), "e1")
    assert st.read_topic("e1").count() == n_before
    assert st.latest_manifest("e1")[0] == v_before
    st.produce(ev.filter((F.col("event_id") >= 40) & (F.col("event_id") < 60)), "e1")
    per = (
        st.read_topic("e1")
        .groupBy("bucket")
        .agg(F.min("seq").alias("mn"), F.max("seq").alias("mx"), F.count("*").alias("n"))
        .collect()
    )
    for r in per:
        assert r["mn"] == 0 and r["mx"] == r["n"] - 1  # still gap-free

    # consume with a committed offset past the HWM: empty batch, the
    # offset does not move (no clamp-down, no error)
    st.register_consumer("cE", "e1")
    depth = st.read_topic("e1").filter(F.col("bucket") == 0).count()
    st.commit("cE", "e1", bucket=0, offset=depth + 100)
    batch, next_off = st.consume("cE", "e1", bucket=0, count=5)
    assert batch.count() == 0
    assert next_off == depth + 100

    # truncate below the floor: removes nothing, log intact
    n = st.read_topic("e1").count()
    assert st.truncate("e1", before_seq=0) == 0
    assert st.read_topic("e1").count() == n


def test_empty_topic_is_servable(spark, tmp_path):
    """A consumer may subscribe before any producer publishes: reading
    and consuming a created-but-never-produced topic must serve an
    empty frame (structural schema), not a schema-inference error."""
    st = TopicStore(spark, str(tmp_path / "empty_topics"))
    st.create_topic("nil", n_buckets=2)
    st.register_consumer("c0", "nil")
    df = st.read_topic("nil")
    assert df.count() == 0
    assert {"seq", "bucket"} <= set(df.columns)
    batch, off = st.consume("c0", "nil", bucket=0, count=10)
    assert batch.count() == 0 and off == 0


def test_read_increment_is_exactly_the_appended_rows(spark, sf_dir, tmp_path):
    """Incremental read between two manifest versions = exactly the
    rows the later produces appended: seq-range based, so compaction
    in between must not perturb it."""
    st = TopicStore(spark, str(tmp_path / "incr"))
    st.create_topic("i", n_buckets=2)
    ev = load_table(spark, sf_dir, "events")
    st.produce(ev.limit(60), "i")
    v_after_a, _ = st.latest_manifest("i")
    st.produce(ev.filter((F.col("event_id") >= 60) & (F.col("event_id") < 100)), "i")
    st.compact("i")  # rewrites files; must not affect the seq-based diff
    st.produce(ev.filter((F.col("event_id") >= 100) & (F.col("event_id") < 130)), "i")

    inc = st.read_increment("i", since_version=v_after_a)
    got = sorted(r["event_id"] for r in inc.select("event_id").collect())
    assert got == list(range(60, 130))

    # pinned upper bound: increment up to a mid version excludes later appends
    hist = st.history("i")
    v_mid = [h["version"] for h in hist if h["operation"] == "compact"][0]
    inc_mid = st.read_increment("i", since_version=v_after_a, version=v_mid)
    got_mid = sorted(r["event_id"] for r in inc_mid.select("event_id").collect())
    assert got_mid == list(range(60, 100))

    # since the very first (empty) manifest: everything
    assert st.read_increment("i", since_version=1).count() == 130


def test_restore_rolls_back_and_reuses_seqs(spark, sf_dir, tmp_path):
    """RESTORE commits the target version's state forward: reads see
    the old snapshot, history classifies the commit as ``restore``,
    and the next produce continues from the restored maxima (no seq
    gap from the rolled-back batches)."""
    st = TopicStore(spark, str(tmp_path / "rest"))
    st.create_topic("r", n_buckets=2)
    ev = load_table(spark, sf_dir, "events")
    st.produce(ev.limit(40), "r")
    v_target, _ = st.latest_manifest("r")
    maxima_target = dict(st._bucket_maxima("r"))
    st.produce(ev.filter((F.col("event_id") >= 40) & (F.col("event_id") < 90)), "r")
    assert st.read_topic("r").count() == 90

    st.restore("r", v_target)
    assert st.read_topic("r").count() == 40
    assert st._bucket_maxima("r") == maxima_target
    hist = st.history("r")
    assert hist[-1]["operation"] == "restore"
    assert hist[-1]["restored_to"] == v_target
    # forward commit: every prior version is still readable
    assert [h["version"] for h in hist] == list(range(1, len(hist) + 1))

    # seqs burned by the rolled-back batch are live again: contiguity holds
    st.produce(ev.filter((F.col("event_id") >= 200) & (F.col("event_id") < 230)), "r")
    per_bucket = (
        st.read_topic("r")
        .groupBy("bucket")
        .agg(F.max("seq").alias("mx"), F.count("*").alias("n"))
        .collect()
    )
    for row in per_bucket:
        assert row["mx"] == row["n"] - 1

    # a later produce after the restore classifies as produce, not restore
    assert st.history("r")[-1]["operation"] == "produce"


def test_restore_past_vacuum_horizon_fails(spark, sf_dir, tmp_path):
    """Restore must refuse when the target version's data files were
    vacuumed (Delta RESTORE-past-VACUUM failure mode) — never commit a
    manifest pointing at deleted files."""
    import json
    import os

    st = TopicStore(spark, str(tmp_path / "rv"))
    st.create_topic("v", n_buckets=2)
    ev = load_table(spark, sf_dir, "events")
    st.produce(ev.limit(30), "v")
    v_target, _ = st.latest_manifest("v")
    st.compact("v")  # rewrites: v_target's files are now unreferenced

    # branch 1: target manifest retained but its data files deleted
    # (simulates a vacuum that ran between the two versions)
    with open(st._manifest_path("v", v_target)) as f:
        target_files = set(json.load(f)["files"])
    live = set(st._live_files("v"))
    for rel in target_files - live:
        os.remove(os.path.join(st.data_dir("v"), rel))
    with pytest.raises(FileNotFoundError):
        st.restore("v", v_target)

    # branch 2: the target MANIFEST itself pruned by vacuum
    st.vacuum("v", grace_s=0.0)
    assert not os.path.exists(st._manifest_path("v", v_target))
    with pytest.raises(FileNotFoundError):
        st.restore("v", v_target)
    # the failed restores committed nothing
    assert st.history("v")[-1]["operation"] != "restore"


def test_read_increment_refuses_across_a_restore(spark, sf_dir, tmp_path):
    """A restore rewinds the seq high-water marks, so later produces
    legitimately reuse seqs the base version had seen — a seq-based
    increment would silently drop them. read_increment must detect the
    intervening rollback and refuse (CDF continuity break), including
    when only the endpoints' manifests survive."""
    st = TopicStore(spark, str(tmp_path / "incres"))
    st.create_topic("x", n_buckets=2)
    ev = load_table(spark, sf_dir, "events")
    st.produce(ev.limit(40), "x")
    v_base, _ = st.latest_manifest("x")
    st.restore("x", 1)  # rewind to empty
    st.produce(ev.limit(30), "x")  # reuses seqs 0..N
    with pytest.raises(ValueError, match="restored"):
        st.read_increment("x", since_version=v_base)
    # increments entirely on one side of the rollback still work
    v_after, _ = st.latest_manifest("x")
    st.produce(ev.filter((F.col("event_id") >= 40) & (F.col("event_id") < 55)), "x")
    assert st.read_increment("x", since_version=v_after).count() == 15


def test_cross_instance_consume_sees_new_produces(spark, sf_dir, tmp_path):
    """Producer and consumer on DIFFERENT TopicStore instances: the
    consumer's cached maxima must refresh when another instance commits
    (previously the unstamped cache froze delivered-row sizing at the
    first-seen high-water mark — a permanent livelock)."""
    root = str(tmp_path / "xi")
    producer = TopicStore(spark, root)
    producer.create_topic("x", n_buckets=2)
    ev = load_table(spark, sf_dir, "events")
    producer.produce(ev.limit(40), "x")

    consumer = TopicStore(spark, root)  # separate instance, same root
    consumer.register_consumer("c", "x")
    b0, nxt = consumer.consume("c", "x", bucket=0, count=10_000)
    n0 = b0.count()
    consumer.commit("c", "x", 0, nxt)
    # drained — and the consumer's cache is now warm
    empty, _ = consumer.consume("c", "x", bucket=0, count=10)
    assert empty.count() == 0
    # the OTHER instance appends; this instance must see it
    producer.produce(ev.filter((F.col("event_id") >= 40) & (F.col("event_id") < 80)), "x")
    b1, nxt2 = consumer.consume("c", "x", bucket=0, count=10_000)
    n1 = b1.count()
    assert n1 > 0
    assert nxt2 == n0 + n1  # contiguous: no gap, no rewind


def test_truncate_preserves_floor_of_fully_aged_bucket(spark, sf_dir, tmp_path):
    """A bucket fully aged out by truncate A keeps its committed floor
    through a later truncate B that sees no files for it — otherwise a
    fresh consumer at offset 0 spins through phantom seq ranges instead
    of clamping to the retained floor."""
    st = TopicStore(spark, str(tmp_path / "fl"))
    st.create_topic("f", n_buckets=2)
    ev = load_table(spark, sf_dir, "events")
    st.produce(ev.limit(60), "f")
    st.compact("f")
    hi = max(st._bucket_maxima("f").values())
    # truncate A: age out EVERYTHING -> every bucket gets floor = max+1
    assert st.truncate("f", before_seq=hi + 1) >= 1
    floors_a = dict(st._bucket_floors("f"))
    assert all(v > 0 for v in floors_a.values())
    # truncate B on the now-empty topic: must be a no-op commit-wise
    v_before = st._latest_version("f")
    assert st.truncate("f", before_seq=hi + 1) == 0
    assert st._latest_version("f") == v_before  # no version burned
    assert dict(st._bucket_floors("f")) == floors_a  # floors survive
    # produce after retention: seq continues above the floor and a
    # fresh consumer clamps to the floor, not offset 0
    st.produce(ev.filter((F.col("event_id") >= 60) & (F.col("event_id") < 90)), "f")
    st.register_consumer("nc", "f")
    for b in (0, 1):
        batch, _ = st.consume("nc", "f", bucket=b, count=10_000)
        seqs = [r["seq"] for r in batch.orderBy("seq").collect()]
        if seqs:
            assert seqs[0] >= floors_a.get(b, 0)


def test_expand_buckets_grows_routing_without_rebalance(spark, sf_dir, tmp_path):
    """Kafka add-partitions parity: expansion is one manifest commit;
    old data stays in place, new buckets fill with dense seqs from 0,
    per-bucket consumer cursors survive, and the native sink routes by
    the new count."""
    from pyspark.sql import functions as F

    from ripple_server_spark.catalog import load_table
    from ripple_server_spark.sources.datasource import RippleTopicDataSource
    from ripple_server_spark.sources.topics import TopicStore

    st = TopicStore(spark, str(tmp_path / "expand_topics"))
    st.create_topic("ex", n_buckets=2)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    st.produce(ev.filter(F.col("event_id") < 200), "ex")
    before_files = set(st.latest_manifest("ex")[1]["files"])
    pre = {
        r["bucket"]: r["mx"]
        for r in st.read_topic("ex")
        .groupBy("bucket")
        .agg(F.max("seq").alias("mx"))
        .collect()
    }
    assert set(pre) == {0, 1}

    # a consumer mid-stream before the expansion
    st.register_consumer("c-ex", "ex")
    _batch, nxt = st.consume("c-ex", "ex", bucket=0, count=10)
    st.commit("c-ex", "ex", 0, nxt)

    st.expand_buckets("ex", 4)
    assert st.topic_meta("ex")["n_buckets"] == 4
    with pytest.raises(ValueError, match="grow-only"):
        st.expand_buckets("ex", 2)
    # no rebalance: every pre-expansion file is still live, untouched
    assert before_files <= set(st.latest_manifest("ex")[1]["files"])

    # future produce routes by the new count (both produce and the sink)
    st.produce(
        ev.filter((F.col("event_id") >= 200) & (F.col("event_id") < 400)), "ex"
    )
    spark.dataSource.register(RippleTopicDataSource)
    (
        ev.filter((F.col("event_id") >= 400) & (F.col("event_id") < 500))
        .write.format("ripple_topic")
        .mode("append")
        .option("root", st.root)
        .option("topic", "ex")
        .save()
    )
    post = (
        st.read_topic("ex")
        .groupBy("bucket")
        .agg(F.count("*").alias("n"), F.max("seq").alias("mx"),
             F.countDistinct("seq").alias("nd"))
        .collect()
    )
    assert {r["bucket"] for r in post} == {0, 1, 2, 3}
    for r in post:  # dense seqs everywhere, incl. the new buckets
        assert r["mx"] == r["n"] - 1 and r["nd"] == r["n"]
    # old-bucket seqs continued above their pre-expansion maxima
    by_bucket = {r["bucket"]: r for r in post}
    assert by_bucket[0]["mx"] > pre[0] and by_bucket[1]["mx"] > pre[1]

    # consumer cursor survives: resumes exactly where it committed
    batch2, _n2 = st.consume("c-ex", "ex", bucket=0, count=5)
    assert batch2.agg(F.min("seq")).first()[0] == nxt


def test_assign_buckets_range_assignor(spark, sf_dir, tmp_path):
    """assign_buckets (Kafka range-assignor extension): N members split
    a topic's buckets into contiguous, disjoint, exhaustive runs (sizes
    differ by <= 1); the assignment is a pure function (every member
    computes the same split); and members are ordinary consumers whose
    commits stay independent — 2 members x 4 buckets drain the topic
    with disjoint coverage and no row seen twice across the group."""
    st = TopicStore(spark, str(tmp_path / "grp_topics"))
    st.create_topic("g1", n_buckets=4)
    ev = load_table(spark, sf_dir, "events").limit(200)
    st.produce(ev, "g1")

    asg = st.assign_buckets("g1", "workers", 2)
    assert asg == {"workers-0": [0, 1], "workers-1": [2, 3]}
    # pure function: recomputing (any member, any process) agrees
    assert st.assign_buckets("g1", "workers", 2) == asg
    # uneven split: sizes differ by at most one, coverage exhaustive
    asg3 = st.assign_buckets("g1", "w3", 3)
    sizes = sorted(len(v) for v in asg3.values())
    assert sizes == [1, 1, 2]
    assert sorted(b for v in asg3.values() for b in v) == [0, 1, 2, 3]
    with pytest.raises(ValueError, match="n_members"):
        st.assign_buckets("g1", "w0", 0)

    # group drain: disjoint coverage, exactly-once across the group
    seen: dict[tuple[int, int], str] = {}
    for member, buckets in asg.items():
        for b in buckets:
            batch, nxt = st.consume(member, "g1", bucket=b, count=10_000)
            for r in batch.select("bucket", "seq").collect():
                key = (r["bucket"], r["seq"])
                assert key not in seen, f"{key} seen by {seen[key]} and {member}"
                seen[key] = member
            st.commit(member, "g1", b, nxt)
    assert len(seen) == 200
    # commits are independent per member: each member only has offsets
    # for ITS buckets; a member restart replays nothing already committed
    for member, buckets in asg.items():
        offs = st.committed_offsets(member, "g1")
        assert set(offs) == set(buckets)
        for b in buckets:
            batch, _ = st.consume(member, "g1", bucket=b, count=10_000)
            assert batch.count() == 0


def test_engine_micros_session_isolated_from_user_writes(spark, sf_dir, tmp_path):
    """ADVICE r09 (medium): engine topic writes run on a dedicated
    cloned session with outputTimestampType pinned ONCE, so a user
    parquet write racing an engine produce/compact on another driver
    thread keeps the user's configured type — the pre-r10 set/restore
    window on the shared session conf re-typed such writes."""
    import glob
    import threading

    import pyarrow.parquet as pq

    from ripple_server_spark.sources.topics import _engine_session

    st = TopicStore(spark, str(tmp_path / "iso_topics"))
    st.create_topic("iso", n_buckets=4)
    ev = load_table(spark, sf_dir, "events").limit(300).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )

    eng = _engine_session(spark)
    assert eng is not spark
    assert (
        eng.conf.get("spark.sql.parquet.outputTimestampType")
        == "TIMESTAMP_MICROS"
    )
    assert _engine_session(spark) is eng  # cached per user session

    user_dir = str(tmp_path / "user_out")
    stop = threading.Event()
    errs: list[Exception] = []

    def user_writer():
        i = 0
        try:
            while not stop.is_set() or i == 0:
                ev.limit(50).write.mode("overwrite").parquet(
                    f"{user_dir}/w{i % 3}"
                )
                i += 1
        except Exception as e:  # noqa: BLE001 - recorded for the assert
            errs.append(e)

    t = threading.Thread(target=user_writer)
    t.start()
    try:
        for k in range(3):
            st.produce(ev.filter(F.col("event_id") % 3 == k), "iso")
        st.compact("iso")
    finally:
        stop.set()
        t.join()
    assert not errs, errs

    # every ENGINE file carries micros ts (row-group-stats capable)...
    eng_files = glob.glob(
        str(tmp_path / "iso_topics/topics/iso/data/bucket=*/*.parquet")
    )
    assert eng_files
    for f in eng_files:
        typ = str(pq.ParquetFile(f).schema_arrow.field("ts").type)
        assert typ.startswith("timestamp[us"), (f, typ)
    # ...every USER file keeps the session default (INT96 -> arrow ns)
    user_files = glob.glob(f"{user_dir}/*/*.parquet")
    assert user_files
    for f in user_files:
        typ = str(pq.ParquetFile(f).schema_arrow.field("ts").type)
        assert typ.startswith("timestamp[ns"), (f, typ)
    # user session conf untouched; plan-handoff views cleaned up
    # (scoped to OUR prefix: other tests in the session may hold their
    # own global temp views legitimately)
    assert spark.conf.get("spark.sql.parquet.outputTimestampType") == "INT96"
    leftover = [
        v.name
        for v in spark.catalog.listTables("global_temp")
        if v.name.startswith("ripple_micros_")
    ]
    assert leftover == []


def test_time_positioning_on_ts_less_topic_raises_named_error(spark, tmp_path):
    """ADVICE r09: a topic whose recorded schema has no ``ts`` column
    (e.g. populated by a foreign writer through the manifest protocol)
    must fail time positioning with a named contract error, not an
    opaque AnalysisException surfaced once per maintenance cycle."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    st = TopicStore(spark, str(tmp_path / "notss"))
    st.create_topic("nt", n_buckets=2)
    # foreign writer: stage a keyed, ts-less file and commit it via the
    # manifest protocol (files + maxima + schema are the contract)
    bdir = os.path.join(st.data_dir("nt"), "bucket=0")
    os.makedirs(bdir, exist_ok=True)
    pq.write_table(
        pa.table({"seq": [0, 1, 2], "k": [7, 7, 7], "payload": [1, 2, 3]}),
        os.path.join(bdir, "foreign-0.parquet"),
    )

    def apply(m: dict) -> dict:
        m["files"] = ["bucket=0/foreign-0.parquet"]
        m["maxima"] = {"0": 2}
        m["schema"] = ["seq:bigint", "k:bigint", "payload:bigint"]
        return m

    st._commit("nt", st._latest_version("nt"), apply)

    with pytest.raises(ValueError, match="no 'ts' column"):
        st.offsets_for_times("nt", 1_700_000_000_000)
    with pytest.raises(ValueError, match="no 'ts' column"):
        st.truncate_before_timestamp("nt", 1_700_000_000_000)
    # seq-based reads are unaffected by the missing ts
    assert st.read_topic("nt").count() == 3


def test_group_generation_fencing(spark, sf_dir, tmp_path):
    """VERDICT r09 item 3 (Kafka zombie fencing): rebalancing 2 -> 3
    members bumps the group epoch in the topic manifest; a member of
    the old generation can no longer commit — neither with its stale
    epoch nor to a bucket outside its new range."""
    from ripple_server_spark.sources.topics import StaleGenerationError

    st = TopicStore(spark, str(tmp_path / "gen_topics"))
    st.create_topic("g", n_buckets=4)
    ev = load_table(spark, sf_dir, "events").limit(200)
    st.produce(ev, "g")

    asg2 = st.assign_buckets("g", "w", 2)
    gen2 = st.group_state("g", "w")["generation"]
    assert gen2 == 1
    # idempotent join: same n_members never bumps the epoch
    assert st.assign_buckets("g", "w", 2) == asg2
    assert st.group_state("g", "w")["generation"] == gen2

    # member w-0 drains bucket 0 and commits with the current epoch
    batch, nxt = st.consume("w-0", "g", bucket=0, count=10)
    st.commit("w-0", "g", 0, nxt, group_id="w", generation=gen2)

    # REBALANCE to 3 members: epoch bumps, coverage stays disjoint
    asg3 = st.assign_buckets("g", "w", 3)
    gen3 = st.group_state("g", "w")["generation"]
    assert gen3 == gen2 + 1
    assert sorted(b for v in asg3.values() for b in v) == [0, 1, 2, 3]

    # zombie: w-1 still believes generation gen2 and owns bucket 2-3;
    # under gen3 its range shrank — the stale-epoch commit is fenced
    with pytest.raises(StaleGenerationError, match="rebalanced"):
        st.commit("w-1", "g", 3, 5, group_id="w", generation=gen2)
    # even with the CURRENT epoch, a bucket outside the member's new
    # range is fenced (w-1 owns [2] under gen3; bucket 3 moved to w-2)
    with pytest.raises(StaleGenerationError, match="does not own bucket 3"):
        st.commit("w-1", "g", 3, 5, group_id="w", generation=gen3)
    # the same commit under the new assignment by the RIGHT member works
    st.commit("w-2", "g", 3, 5, group_id="w", generation=gen3)
    assert st.committed_offsets("w-2", "g")[3] == 5

    # group-scoped commit without a generation is a usage error;
    # an unknown group is fenced loudly
    with pytest.raises(ValueError, match="requires generation"):
        st.commit("w-0", "g", 0, 1, group_id="w")
    with pytest.raises(StaleGenerationError, match="no recorded assignment"):
        st.commit("x-0", "g", 0, 1, group_id="x", generation=1)
    # ungated independent consumers (the reference's fan-out model)
    # remain unaffected by any group's epochs
    st.register_consumer("solo", "g")
    st.commit("solo", "g", 0, 7)
    assert st.committed_offsets("solo", "g")[0] == 7


def test_describe_group_reports_generation_assignment_lag(spark, sf_dir, tmp_path):
    st = TopicStore(spark, str(tmp_path / "dg_topics"))
    st.create_topic("dg", n_buckets=4)
    ev = load_table(spark, sf_dir, "events").limit(200)
    st.produce(ev, "dg")
    st.assign_buckets("dg", "w", 2)
    gen = st.group_state("dg", "w")["generation"]

    # w-0 drains bucket 0 fully and commits
    batch, nxt = st.consume("w-0", "dg", bucket=0, count=10_000)
    st.commit("w-0", "dg", 0, nxt, group_id="w", generation=gen)

    d = st.describe_group("dg", "w")
    assert d["generation"] == gen and d["n_members"] == 2
    assert d["members"]["w-0"]["buckets"] == [0, 1]
    assert d["members"]["w-1"]["buckets"] == [2, 3]
    maxima = st._bucket_maxima("dg")
    assert d["members"]["w-0"]["lag"][0] == 0  # fully committed
    assert d["members"]["w-0"]["lag"][1] == maxima[1] + 1  # untouched
    per_bucket_rows = {b: mx + 1 for b, mx in maxima.items()}
    assert d["total_lag"] == sum(per_bucket_rows.values()) - per_bucket_rows[0]
    with pytest.raises(KeyError, match="no recorded assignment"):
        st.describe_group("dg", "ghost")
    # lag clamps at the retained floor: truncate below the committed
    # range, a fresh group's lag counts only deliverable rows
    st.assign_buckets("dg", "w2", 1)
    cutoff = min(maxima.values()) // 2
    st.truncate("dg", before_seq=cutoff)
    floors = st._bucket_floors("dg")
    d2 = st.describe_group("dg", "w2")
    exp = sum(maxima[b] + 1 - floors.get(b, 0) for b in maxima)
    assert d2["total_lag"] == exp


def test_rekey_topic_rebuilds_clean_mapping_after_expand(spark, sf_dir, tmp_path):
    """The documented repair for cross-expansion key semantics: after
    expand_buckets splits a key's rows across buckets, rekey_topic
    rewrites into a fresh topic where every key lives in exactly one
    bucket again and compact_by_key is globally correct."""
    st = TopicStore(spark, str(tmp_path / "rk_topics"))
    st.create_topic("rk", n_buckets=2)
    ev = load_table(spark, sf_dir, "events").limit(120).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    st.produce(ev.filter(F.col("event_id") < 60), "rk")
    st.expand_buckets("rk", 4)
    st.produce(ev.filter(F.col("event_id") >= 60), "rk")
    # some key now spans two buckets (residue changed for n=2 -> n=4)
    spans = (
        st.read_topic("rk")
        .groupBy("user_id")
        .agg(F.countDistinct("bucket").alias("nb"))
        .filter(F.col("nb") > 1)
        .count()
    )
    assert spans > 0, "fixture produced no cross-bucket key; weaken test"

    n = st.rekey_topic("rk", "rk2")
    assert n == 120
    rk2 = st.read_topic("rk2")
    assert rk2.count() == 120
    # clean mapping: every key in exactly one bucket, correct residue
    bad = (
        rk2.groupBy("user_id")
        .agg(F.countDistinct("bucket").alias("nb"))
        .filter(F.col("nb") > 1)
        .count()
    )
    assert bad == 0
    # config is carried over and the copy is idempotent under batch_id
    st.create_topic("rk3", n_buckets=4)  # pre-created dst also works
    assert st.rekey_topic("rk", "rk3", batch_id="copy-1") == 120
    assert st.rekey_topic("rk", "rk3", batch_id="copy-1") == 0  # replay
    with pytest.raises(ValueError, match="distinct destination"):
        st.rekey_topic("rk", "rk")


def test_produce_kernel_stage_equivalence(spark, tmp_path):
    """r12 optimization pin: produce's pyarrow staging kernel
    (_produce_stage_kernel) must reproduce the old window+partitionBy
    plan exactly — seq order (ts, event_id) ascending NULLS FIRST per
    bucket, TIMESTAMP_MICROS physical columns WITH min/max statistics
    (the _micros_ts_writes contract the old Spark writer honored), and
    recomputing any seq/bucket columns the batch already carries with
    seq at its original schema position (the withColumn-overwrite
    contract a consume->produce round trip relies on)."""
    import glob
    import os

    import pyarrow.parquet as pq

    st = TopicStore(spark, str(tmp_path / "kern"))
    st.create_topic("k", n_buckets=2)
    base_ts = F.lit("2026-01-01 00:00:00").cast("timestamp")
    df = spark.createDataFrame(
        # event_id 5/6: NULL ts -> must take the LOWEST seqs of their
        # bucket (NULLS FIRST, the old window's ascending default);
        # event_id 0..4: ts descending by id -> seq must INVERT id order
        [(0, 0, 4), (1, 0, 3), (2, 0, 2), (3, 0, 1), (4, 0, 0), (5, 0, None), (6, 1, None), (7, 1, 0)],
        "event_id bigint, user_id bigint, off int",
    ).select(
        "event_id",
        F.when(
            F.col("off").isNotNull(),
            base_ts + F.make_interval(secs=F.col("off")),
        ).alias("ts"),
        "user_id",
    )
    assert st.produce(df, "k") == 8
    got = {
        (r["bucket"], r["seq"]): r["event_id"]
        for r in st.read_topic("k").collect()
    }
    # bucket 0: NULL-ts row first, then ts ascending (= event_id 4..0)
    assert [got[(0, s)] for s in range(6)] == [5, 4, 3, 2, 1, 0]
    # bucket 1: NULL ts (6) before ts=0 (7)
    assert [got[(1, s)] for s in range(2)] == [6, 7]

    # physical layout: timestamp[us] with statistics on every column
    f = sorted(
        glob.glob(os.path.join(st.data_dir("k"), "bucket=0", "*.parquet"))
    )[0]
    sch = pq.read_schema(f)
    assert str(sch.field("ts").type).startswith("timestamp[us")
    rg = pq.read_metadata(f).row_group(0)
    for i in range(rg.num_columns):
        col = rg.column(i)
        assert col.statistics is not None, col.path_in_schema

    # a batch already carrying seq/bucket: both recomputed, seq at its
    # original position, values from THIS produce (not the stale ones)
    st.create_topic("k2", n_buckets=2)
    carried = df.withColumn("seq", F.lit(999).cast("bigint")).withColumn(
        "bucket", F.lit(77)
    )
    assert st.produce(carried, "k2") == 8
    rt = st.read_topic("k2")
    names = [fld.name for fld in rt.schema.fields]
    # seq keeps its pre-bucket position; bucket is the partition column
    assert names.index("seq") < len(names) - 1
    assert rt.filter(F.col("seq") == 999).count() == 0
    assert sorted(r["bucket"] for r in rt.select("bucket").distinct().collect()) == [0, 1]
    per_bucket = rt.groupBy("bucket").agg(
        F.min("seq").alias("mn"), F.max("seq").alias("mx"), F.count("*").alias("n")
    ).collect()
    for r in per_bucket:
        assert r["mn"] == 0 and r["mx"] == r["n"] - 1


def test_produce_stage_kernel_streams_bounded_row_groups(tmp_path):
    """r13 memory bound (VERDICT r12 item 3): the staging kernel
    streams sorted batches through an open ParquetWriter instead of
    buffering a task's whole input — a skewed produce (every row one
    bucket) flushes a row group whenever the buffer passes flush_bytes,
    so worker memory is bounded by the flush target plus one Arrow
    batch. Driven directly with a tiny flush target: the one-bucket
    file must hold MULTIPLE row groups, each with statistics, and seq
    must stay contiguous in (ts, event_id) order across flushes."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ripple_server_spark.sources.topics import _produce_stage_kernel

    data_dir = str(tmp_path / "data")
    os.makedirs(data_dir)
    n = 10_000
    # all rows bucket 3 (total skew); ts descending so the caller-side
    # sort contract matters — the kernel itself trusts input order, so
    # feed it pre-sorted ascending batches like the JVM sort would
    ts = pa.array(
        [1_700_000_000_000_000 + i for i in range(n)],
        pa.timestamp("us", tz="UTC"),
    )
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": ts,
            "user_id": pa.array([3] * n, pa.int64()),
            "bucket": pa.array([3] * n, pa.int32()),
        }
    )
    batches = tbl.to_batches(max_chunksize=1000)
    kernel = _produce_stage_kernel(
        data_dir,
        base={3: 99},  # seqs must start at 100
        file_cols=["event_id", "ts", "user_id", "seq"],
        flush_bytes=64 << 10,  # tiny: force many flushes
    )
    out = list(kernel(iter(batches)))
    assert len(out) == 1 and out[0].num_rows == 1
    row = out[0].to_pylist()[0]
    assert row["bucket"] == 3 and row["n"] == n
    path = os.path.join(data_dir, row["rel"])
    md = pq.read_metadata(path)
    assert md.num_row_groups > 1, "skewed batch did not stream/flush"
    for g in range(md.num_row_groups):
        rg = md.row_group(g)
        for i in range(rg.num_columns):
            assert rg.column(i).statistics is not None
    got = pq.read_table(path)
    assert got.column("seq").to_pylist() == list(range(100, 100 + n))
    assert got.column("event_id").to_pylist() == list(range(n))
    assert str(got.schema.field("ts").type).startswith("timestamp[us")


def test_seq_race_rebase_keeps_kernel_file_layout(spark, sf_dir, tmp_path):
    """ADVICE r12: a raced produce's REWRITTEN files must carry the
    same physical guarantees as first-staging files (micros timestamps
    with min/max statistics, prd- kernel naming) — the rebase now runs
    the same sort + streaming-kernel pipeline instead of the old Hadoop
    committer rewrite."""
    import glob
    import os

    import pyarrow.parquet as pq

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    s1 = TopicStore(spark, str(tmp_path))
    s1.create_topic("rb", n_buckets=2)
    s1.produce(ev.filter(F.col("event_id") < 50), "rb")  # warms s1's cache
    s2 = TopicStore(spark, str(tmp_path))
    s2.produce(
        ev.filter((F.col("event_id") >= 50) & (F.col("event_id") < 100)), "rb"
    )
    # stale base -> _SeqRace -> kernel rebase
    s1.produce(
        ev.filter((F.col("event_id") >= 100) & (F.col("event_id") < 150)), "rb"
    )
    live = set(s1.latest_manifest("rb")[1]["files"])
    assert all("/prd-" in f or f.startswith("bucket=") for f in live)
    data = s1.data_dir("rb")
    for rel in live:
        assert "prd-" in rel, f"non-kernel staged file in manifest: {rel}"
        md = pq.read_metadata(os.path.join(data, rel))
        sch = pq.read_schema(os.path.join(data, rel))
        assert str(sch.field("ts").type).startswith("timestamp[us")
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            for i in range(rg.num_columns):
                assert rg.column(i).statistics is not None
    # and the rows are exactly the three batches, contiguous per bucket
    df = s1.read_topic("rb")
    assert df.count() == 150
    per_bucket = df.groupBy("bucket").agg(
        F.count("*").alias("n"),
        F.countDistinct("seq").alias("nd"),
        F.min("seq").alias("lo"),
        F.max("seq").alias("hi"),
    ).collect()
    for r in per_bucket:
        assert r["nd"] == r["n"] and (r["lo"], r["hi"]) == (0, r["n"] - 1)


def test_touch_staged_refreshes_mtime_for_vacuum_grace(spark, sf_dir, tmp_path):
    """ADVICE r12 (vacuum race): staged-but-uncommitted files are
    re-timestamped at the commit point, so a vacuum whose grace window
    opened after the staging write cannot reclaim them. Simulated by
    aging a staged file's mtime and calling the helper the produce
    commit path uses."""
    import os
    import time as _time

    st = TopicStore(spark, str(tmp_path))
    st.create_topic("tg", n_buckets=2)
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    st.produce(ev.filter(F.col("event_id") < 50), "tg")
    rels = st.latest_manifest("tg")[1]["files"]
    old = _time.time() - 3600
    data = st.data_dir("tg")
    for rel in rels:
        os.utime(os.path.join(data, rel), (old, old))
    st._touch_staged("tg", rels)
    for rel in rels:
        assert os.path.getmtime(os.path.join(data, rel)) > old + 3000
    # a vacuum with an hour's grace now spares them even if they were
    # staged (by wall clock) long before the commit landed
    assert st.vacuum("tg", grace_s=1800) == 0
    assert st.read_topic("tg").count() == 50


def test_executor_direct_writes_route_through_fsio_seam(tmp_path):
    """r13 (VERDICT r12 item 7): the staging kernel's data writes go
    through the fsio.DATA_FS seam, so a non-POSIX deployment swaps ONE
    object (via an importable bootstrap that executor workers import).
    Proven in-process by driving the kernel directly with a recording
    filesystem — the same invocation path the executor worker takes."""
    import os as _os

    import pyarrow as pa

    from ripple_server_spark.sources import fsio
    from ripple_server_spark.sources.topics import _produce_stage_kernel

    calls = []

    class RecordingFS(fsio.PosixDataFS):
        def makedirs(self, path):
            calls.append("makedirs")
            super().makedirs(path)

        def parquet_writer(self, path, schema):
            calls.append("parquet_writer")
            return super().parquet_writer(path, schema)

    data_dir = str(tmp_path / "data")
    _os.makedirs(data_dir)
    tbl = pa.table(
        {
            "event_id": pa.array(range(10), pa.int64()),
            "ts": pa.array(
                [1_700_000_000_000_000 + i for i in range(10)],
                pa.timestamp("us", tz="UTC"),
            ),
            "user_id": pa.array([1] * 10, pa.int64()),
            "bucket": pa.array([1] * 10, pa.int32()),
        }
    )
    kernel = _produce_stage_kernel(
        data_dir, base={}, file_cols=["event_id", "ts", "user_id", "seq"]
    )
    orig = fsio.DATA_FS
    fsio.DATA_FS = RecordingFS()
    try:
        out = list(kernel(iter(tbl.to_batches())))
    finally:
        fsio.DATA_FS = orig
    assert out and out[0].to_pylist()[0]["n"] == 10
    assert "makedirs" in calls and "parquet_writer" in calls, (
        "staging kernel bypassed the fsio seam"
    )
    rel = out[0].to_pylist()[0]["rel"]
    assert _os.path.exists(_os.path.join(data_dir, rel))
