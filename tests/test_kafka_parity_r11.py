"""Round-11 Kafka-parity surface (VERDICT r10 items 2, 4-7 + ADVICE):
the min.cleanable.dirty.ratio cleaner gate, delete.retention.ms
tombstone windows, the sticky assignor, producer-epoch fencing, the
expand_buckets group-epoch bump, and commit_many's write-then-revalidate
fencing atomicity."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from ripple_server_spark.sources.maintenance import TopicMaintenance
from ripple_server_spark.sources.topics import (
    StaleGenerationError,
    StaleProducerEpochError,
    TopicStore,
)


def _wave(spark, w, n=20, keys=5):
    """n upsert rows, keys cycling, ts inside 2026 (fixture-era)."""
    return spark.range(n).select(
        (F.col("id") + w * 1000).alias("event_id"),
        (
            F.lit("2026-01-01 00:00:00").cast("timestamp")
            + F.make_interval(secs=F.col("id") + w * 500)
        ).alias("ts"),
        (F.col("id") % keys).alias("user_id"),
        F.lit(w).alias("wave"),
        F.concat(F.lit(f"v{w}-"), F.col("id").cast("string")).alias("value"),
    )


# -- min.cleanable.dirty.ratio (VERDICT r10 item 2) -------------------------


def test_dirty_ratio_lifecycle(spark, tmp_path):
    st = TopicStore(spark, str(tmp_path / "dr"))
    st.create_topic("t", n_buckets=2)
    # empty topic: nothing to clean
    assert st.key_compaction_dirty_ratio("t") == 0.0
    st.produce(_wave(spark, 0), "t")
    # never cleaned: everything is dirty
    assert st.key_compaction_dirty_ratio("t") == 1.0
    st.produce(_wave(spark, 1), "t")
    assert st.compact_by_key("t", key_col="user_id") > 0
    # cleaner checkpoint covers the whole live set
    assert st.key_compaction_dirty_ratio("t") == 0.0
    # appends dirty the log again, proportionally (not all-or-nothing)
    st.produce(_wave(spark, 2), "t")
    r = st.key_compaction_dirty_ratio("t")
    assert 0.0 < r < 1.0


def test_cleaner_gate_skips_clean_topic_with_zero_spark_jobs(
    spark, tmp_path, monkeypatch
):
    """N maintenance cycles on a clean compacted topic must launch ZERO
    Spark jobs: the gate decides from manifest + file stats alone."""
    st = TopicStore(spark, str(tmp_path / "gate"))
    st.create_topic("t", n_buckets=2)
    for w in range(2):
        st.produce(_wave(spark, w), "t")
    maint = TopicMaintenance(
        st,
        "t",
        cleanup_policy="compact",
        key_col="user_id",
        key_compaction_interval_s=0.0,  # isolate the ratio gate
        vacuum_grace_s=3600.0,  # keep vacuum off the job count too
    )
    s1 = maint.run_once()
    assert s1.error is None and s1.key_dropped > 0

    calls = {"n": 0}
    orig = st.compact_by_key

    def counting(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(st, "compact_by_key", counting)
    tracker = spark.sparkContext.statusTracker()
    jobs_before = tracker.getJobIdsForGroup(None)
    for _ in range(3):
        s = maint.run_once()
        assert s.error is None and s.key_dropped == 0
    # the gate never even called the cleaner, let alone ran a job
    assert calls["n"] == 0
    assert tracker.getJobIdsForGroup(None) == jobs_before

    # a dirty topic still compacts through the same gate
    st.produce(_wave(spark, 2), "t")
    st.produce(_wave(spark, 3), "t")
    assert st.key_compaction_dirty_ratio("t") >= 0.5
    s = maint.run_once()
    assert s.error is None and s.key_dropped > 0
    assert calls["n"] == 1

    # min_dirty_ratio=0.0 restores the unconditional pre-r11 cleaner
    eager = TopicMaintenance(
        st,
        "t",
        cleanup_policy="compact",
        key_col="user_id",
        key_compaction_interval_s=0.0,
        min_dirty_ratio=0.0,
        vacuum_grace_s=3600.0,
    )
    assert eager.run_once().error is None
    assert calls["n"] == 2  # ran despite ratio 0.0


def test_no_drop_pass_advances_cleaner_checkpoint_once(spark, tmp_path):
    """A dirty log whose new files hold no superseded keys: the first
    pass scans, drops nothing, and commits a metadata-only checkpoint;
    the gate then keeps every later cycle off the data."""
    st = TopicStore(spark, str(tmp_path / "nodrop"))
    st.create_topic("t", n_buckets=2)
    # distinct keys per wave -> nothing ever supersedes anything
    st.produce(_wave(spark, 0, n=10, keys=10), "t")
    assert st.compact_by_key("t", key_col="event_id") == 0
    v = st._latest_version("t")
    assert st.key_compaction_dirty_ratio("t") == 0.0
    # repeat pass: checkpoint already covers the set, burns no version
    assert st.compact_by_key("t", key_col="event_id") == 0
    assert st._latest_version("t") == v


def test_dirty_ratio_config_reaches_maintenance(spark, tmp_path):
    from ripple_server_spark.sources.maintenance import maintenance_from_config

    st = TopicStore(spark, str(tmp_path / "cfg"))
    st.create_topic(
        "t",
        n_buckets=2,
        config={
            "cleanup.policy": "compact",
            "min.cleanable.dirty.ratio": "0.25",
            "delete.retention.ms": "86400000",
            "tombstone.column": "value",
        },
    )
    m = maintenance_from_config(st, "t")
    assert m.min_dirty_ratio == 0.25
    assert m.tombstone_retention_ms == 86_400_000
    assert m.tombstone_col == "value"


# -- delete.retention.ms (VERDICT r10 item 4) --------------------------------


def test_tombstone_retention_two_pass_lifecycle(spark, tmp_path):
    st = TopicStore(spark, str(tmp_path / "tomb"))
    st.create_topic("t", n_buckets=2)
    st.produce(_wave(spark, 0), "t")  # 5 keys, 4 versions each
    # tombstone keys 0 and 1 with ts = NOW (inside any sane window)
    now_s = int(time.time())
    tomb = spark.range(2).select(
        (F.col("id") + 9000).alias("event_id"),
        F.timestamp_seconds(F.lit(now_s)).alias("ts"),
        F.col("id").alias("user_id"),
        F.lit(99).alias("wave"),
        F.lit(None).cast("string").alias("value"),
    )
    st.produce(tomb, "t")

    day_ms = 86_400_000
    # pass 1 (window open): history collapses, tombstone rows REMAIN
    dropped = st.compact_by_key(
        "t", key_col="user_id", tombstone_col="value",
        tombstone_retention_ms=day_ms,
    )
    assert dropped > 0
    live = st.read_topic("t")
    markers = live.filter(F.col("value").isNull())
    assert markers.count() == 2  # both deletes still observable
    assert sorted(r["user_id"] for r in markers.collect()) == [0, 1]
    # each tombstoned key is down to exactly its marker
    assert live.filter(F.col("user_id") < 2).count() == 2
    # tombstone-retaining output is NOT checkpointed clean — the
    # post-window second pass must not be gated off
    assert st.key_compaction_dirty_ratio("t") == 1.0

    # window still open: a repeat pass changes nothing and keeps dirty
    assert (
        st.compact_by_key(
            "t", key_col="user_id", tombstone_col="value",
            tombstone_retention_ms=day_ms,
        )
        == 0
    )
    assert st.read_topic("t").filter(F.col("value").isNull()).count() == 2

    # pass 2 (window expired): the markers themselves are removed
    assert (
        st.compact_by_key(
            "t", key_col="user_id", tombstone_col="value",
            tombstone_retention_ms=1,
        )
        == 2
    )
    live = st.read_topic("t")
    assert live.filter(F.col("value").isNull()).count() == 0
    assert live.filter(F.col("user_id") < 2).count() == 0
    assert st.key_compaction_dirty_ratio("t") == 0.0  # now checkpointed

    # retention 0 = immediate delete (pre-r11 semantics, unchanged):
    # keys 2,3 each lose their surviving old row AND the marker
    st.produce(tomb.withColumn("user_id", F.col("user_id") + 2), "t")
    assert (
        st.compact_by_key("t", key_col="user_id", tombstone_col="value")
        == 4
    )

    # a nonzero window needs event time to measure against
    st.create_topic("nots", n_buckets=1)
    notst = spark.range(3).select(
        F.col("id").alias("event_id"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("ts"),
        F.col("id").alias("user_id"),
        F.col("id").cast("string").alias("value"),
    )
    st.produce(notst, "nots")
    # drop ts from the read path by compacting on a missing column name
    with pytest.raises(ValueError, match="order_by compaction"):
        st.compact_by_key("nots", key_col="user_id", order_by="nope")


# -- sticky assignor (VERDICT r10 item 5) ------------------------------------


def test_sticky_assignor_minimal_movement_and_fencing(spark, tmp_path):
    st = TopicStore(spark, str(tmp_path / "sticky"))
    st.create_topic("t", n_buckets=8)
    st.produce(_wave(spark, 0, n=40, keys=8), "t")

    a2 = st.assign_buckets("t", "g", 2, strategy="sticky")
    gen = st.group_state("t", "g")["generation"]
    assert st.group_state("t", "g")["strategy"] == "sticky"
    assert sorted(b for bs in a2.values() for b in bs) == list(range(8))
    # idempotent re-join: same assignment, same epoch, no bump
    assert st.assign_buckets("t", "g", 2, strategy="sticky") == a2
    assert st.group_state("t", "g")["generation"] == gen

    # 2 -> 3: coverage stays exhaustive+disjoint, movement is minimal
    a3 = st.assign_buckets("t", "g", 3, strategy="sticky")
    assert st.group_state("t", "g")["generation"] == gen + 1
    flat = sorted(b for bs in a3.values() for b in bs)
    assert flat == list(range(8))
    moved = sum(
        1 for m, bs in a3.items() for b in bs if b not in a2.get(m, [])
    )
    assert moved == len(a3["g-2"])  # only the new member's buckets moved
    assert moved <= 3  # ceil(8/3)

    # 3 -> 2: only the departed member's buckets move back
    a2b = st.assign_buckets("t", "g", 2, strategy="sticky")
    moved_back = sum(
        1 for m, bs in a2b.items() for b in bs if b not in a3.get(m, [])
    )
    assert moved_back == len(a3["g-2"])
    assert sorted(b for bs in a2b.values() for b in bs) == list(range(8))

    # fencing reads the STORED sticky assignment, not a range split
    gen_now = st.group_state("t", "g")["generation"]
    own0 = a2b["g-0"][0]
    other = a2b["g-1"][0]
    st.commit("g-0", "t", own0, 1, group_id="g", generation=gen_now)
    with pytest.raises(StaleGenerationError, match="does not own"):
        st.commit("g-0", "t", other, 1, group_id="g", generation=gen_now)
    d = st.describe_group("t", "g")
    assert d["members"]["g-0"]["buckets"] == a2b["g-0"]

    # strategy switch on a live group is a rebalance (epoch bumps)
    st.assign_buckets("t", "g", 2, strategy="range")
    assert st.group_state("t", "g")["generation"] == gen_now + 1
    assert st.group_state("t", "g")["strategy"] == "range"
    with pytest.raises(ValueError, match="strategy"):
        st.assign_buckets("t", "g", 2, strategy="round_robin")


def test_sticky_assignment_refreshes_after_expand_without_double_bump(
    spark, tmp_path
):
    st = TopicStore(spark, str(tmp_path / "stex"))
    st.create_topic("t", n_buckets=4)
    st.produce(_wave(spark, 0, n=20, keys=4), "t")
    a = st.assign_buckets("t", "g", 2, strategy="sticky")
    gen = st.group_state("t", "g")["generation"]

    st.expand_buckets("t", 6)
    # expansion itself bumped the epoch (Kafka partition-count bump)
    assert st.group_state("t", "g")["generation"] == gen + 1
    # re-join at the same member count: assignment now covers the new
    # buckets, old buckets stay put, and the epoch does NOT bump again
    a2 = st.assign_buckets("t", "g", 2, strategy="sticky")
    assert st.group_state("t", "g")["generation"] == gen + 1
    assert sorted(b for bs in a2.values() for b in bs) == list(range(6))
    kept = sum(1 for m, bs in a2.items() for b in bs if b in a.get(m, []))
    assert kept == 4  # every pre-expansion bucket kept its owner


def test_expand_buckets_bumps_range_group_and_fences_zombies(spark, tmp_path):
    """ADVICE r10: a fenced commit from the pre-expansion epoch must get
    the accurate 'rebalanced' rejection, and group_state must report the
    bumped generation immediately after expand_buckets."""
    st = TopicStore(spark, str(tmp_path / "exg"))
    st.create_topic("t", n_buckets=4)
    st.produce(_wave(spark, 0, n=20, keys=4), "t")
    st.assign_buckets("t", "g", 2)
    gen = st.group_state("t", "g")["generation"]
    st.commit("g-0", "t", 0, 1, group_id="g", generation=gen)

    st.expand_buckets("t", 8)
    assert st.group_state("t", "g")["generation"] == gen + 1
    with pytest.raises(StaleGenerationError, match="rebalanced"):
        st.commit("g-0", "t", 0, 2, group_id="g", generation=gen)
    # re-join adopts the new epoch without another bump, then commits
    st.assign_buckets("t", "g", 2)
    gen2 = st.group_state("t", "g")["generation"]
    assert gen2 == gen + 1
    st.commit("g-0", "t", 0, 2, group_id="g", generation=gen2)


# -- producer-epoch fencing (VERDICT r10 item 6) -----------------------------


def test_producer_epoch_fences_produce(spark, tmp_path):
    st = TopicStore(spark, str(tmp_path / "pep"))
    st.create_topic("t", n_buckets=2)
    assert st.producer_epoch("t") == 0
    assert st.produce(_wave(spark, 0), "t", producer_epoch=0) == 20

    e1 = st.fence_producers("t")
    assert e1 == 1 and st.producer_epoch("t") == 1
    before = st.read_topic("t").count()
    v = st._latest_version("t")
    with pytest.raises(StaleProducerEpochError, match="fenced"):
        st.produce(_wave(spark, 1), "t", producer_epoch=0)
    # atomic: no manifest landed, no rows visible
    assert st._latest_version("t") == v
    assert st.read_topic("t").count() == before
    # the new epoch writes; unfenced producers stay unaffected (opt-in)
    assert st.produce(_wave(spark, 1), "t", producer_epoch=e1) == 20
    assert st.produce(_wave(spark, 2), "t") == 20


def test_producer_fence_landing_mid_produce_is_atomic(
    spark, tmp_path, monkeypatch
):
    """A fence_producers that commits AFTER the zombie's entry check but
    BEFORE its manifest commit must still fence it — the epoch re-check
    runs inside the commit's apply."""
    st = TopicStore(spark, str(tmp_path / "pepmid"))
    st.create_topic("t", n_buckets=2)
    st.produce(_wave(spark, 0), "t", producer_epoch=0)
    before = st.read_topic("t").count()

    # Hook the manifest-commit seam: by the first _commit call the
    # produce has already staged its files (the mapInArrow kernel wrote
    # them during the collect), so fencing here lands between stage and
    # commit — the window the test has always exercised.
    orig = st._commit
    fired = {"done": False}

    def fence_then_commit(topic, base_version, apply):
        if not fired["done"]:
            fired["done"] = True
            st.fence_producers(topic)  # lands between stage and commit
        return orig(topic, base_version, apply)

    monkeypatch.setattr(st, "_commit", fence_then_commit)
    with pytest.raises(StaleProducerEpochError):
        st.produce(_wave(spark, 1), "t", producer_epoch=0)
    monkeypatch.undo()
    assert st.read_topic("t").count() == before  # staged rows invisible
    # the orphaned staged files are vacuum-reclaimable, not live
    st.vacuum("t", grace_s=0.0)
    assert st.read_topic("t").count() == before


def test_producer_epoch_fences_native_sink(spark, tmp_path):
    from ripple_server_spark.sources.datasource import RippleTopicDataSource

    spark.dataSource.register(RippleTopicDataSource)
    root = str(tmp_path / "sink")
    st = TopicStore(spark, root)
    st.create_topic("t", n_buckets=2)
    df = _wave(spark, 0)
    (
        df.write.format("ripple_topic")
        .mode("append")
        .option("root", root)
        .option("topic", "t")
        .option("producer_epoch", "0")
        .save()
    )
    assert st.read_topic("t").count() == 20
    st.fence_producers("t")
    with pytest.raises(Exception, match="producer epoch"):
        (
            df.write.format("ripple_topic")
            .mode("append")
            .option("root", root)
            .option("topic", "t")
            .option("producer_epoch", "0")
            .save()
        )
    # fenced tasks staged nothing visible
    assert st.read_topic("t").count() == 20
    (
        df.write.format("ripple_topic")
        .mode("append")
        .option("root", root)
        .option("topic", "t")
        .option("producer_epoch", "1")
        .save()
    )
    assert st.read_topic("t").count() == 40


# -- commit_many / fencing atomicity (ADVICE r10) ----------------------------


def test_commit_many_is_one_atomic_multi_bucket_publish(spark, tmp_path):
    st = TopicStore(spark, str(tmp_path / "cm"))
    st.create_topic("t", n_buckets=4)
    st.produce(_wave(spark, 0, n=40, keys=8), "t")
    st.assign_buckets("t", "g", 1)
    gen = st.group_state("t", "g")["generation"]
    st.commit_many(
        "g-0", "t", {0: 3, 1: 4, 2: 5}, group_id="g", generation=gen
    )
    offs = st.committed_offsets("g-0", "t")
    assert offs == {0: 3, 1: 4, 2: 5}
    # entries are generation-stamped for forensics
    doc = st._read_offsets_doc("g-0", "t")
    assert doc["generations"] == {"0": gen, "1": gen, "2": gen}


def test_commit_revalidates_after_write_and_rolls_back(
    spark, tmp_path, monkeypatch
):
    """The ADVICE r10 race, reproduced: a rebalance lands BETWEEN the
    pre-fence and the offset write. The post-write revalidation must
    roll the whole cursor set back and raise — no stale entry
    survives."""
    st = TopicStore(spark, str(tmp_path / "reval"))
    st.create_topic("t", n_buckets=4)
    st.produce(_wave(spark, 0, n=40, keys=8), "t")
    st.assign_buckets("t", "g", 2)
    gen = st.group_state("t", "g")["generation"]
    st.commit("g-0", "t", 0, 1, group_id="g", generation=gen)
    baseline = st._read_offsets_doc("g-0", "t")

    orig = st._write_json
    raced = {"done": False}

    def rebalance_mid_write(path, obj):
        out = orig(path, obj)
        if not raced["done"] and path.endswith("g-0--t.json"):
            raced["done"] = True
            # the rebalance wins the race right after our bytes land
            st.assign_buckets("t", "g", 3)
        return out

    monkeypatch.setattr(st, "_write_json", rebalance_mid_write)
    with pytest.raises(StaleGenerationError):
        st.commit_many(
            "g-0", "t", {0: 9, 1: 9}, group_id="g", generation=gen
        )
    monkeypatch.undo()
    # rolled back to the pre-race document, offsets AND stamps
    assert st._read_offsets_doc("g-0", "t") == baseline
    assert st.committed_offsets("g-0", "t") == {0: 1}


def test_legacy_flat_offsets_files_still_read(spark, tmp_path):
    st = TopicStore(spark, str(tmp_path / "legacy"))
    st.create_topic("t", n_buckets=2)
    st._write_json(st._offsets_path("old", "t"), {"0": 7, "1": 9})
    assert st.committed_offsets("old", "t") == {0: 7, 1: 9}
    # a new-format write upgrades the document without losing entries
    st.commit("old", "t", 1, 11)
    assert st.committed_offsets("old", "t") == {0: 7, 1: 11}


# -- compact_by_key(order_by=) (VERDICT r10 item 7) ---------------------------


def test_order_by_compaction_collapses_cross_bucket_pairs(spark, tmp_path):
    """The documented expand_buckets caveat, then its repair: per-bucket
    compaction retains a stale pre-expansion row; order_by='ts'
    compaction collapses it to the global event-time latest without
    rekey_topic's full rewrite."""
    st = TopicStore(spark, str(tmp_path / "ob"))
    st.create_topic("t", n_buckets=2)
    # key 5: routes to bucket 1 under n=2
    w0 = spark.range(1).select(
        F.lit(1).alias("event_id"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("ts"),
        F.lit(5).alias("user_id"),
        F.lit("old").alias("value"),
    )
    st.produce(w0, "t")
    st.expand_buckets("t", 3)
    # key 5 now routes to bucket 2: a newer version lands elsewhere
    w1 = spark.range(1).select(
        F.lit(2).alias("event_id"),
        F.lit("2026-01-02 00:00:00").cast("timestamp").alias("ts"),
        F.lit(5).alias("user_id"),
        F.lit("new").alias("value"),
    )
    st.produce(w1, "t")

    # the caveat: per-(bucket, key) compaction keeps BOTH versions
    assert st.compact_by_key("t", key_col="user_id") == 0
    assert st.read_topic("t").count() == 2

    # the repair: event-time compaction keeps only the global latest,
    # in its own bucket, with its own seq
    assert st.compact_by_key("t", key_col="user_id", order_by="ts") == 1
    live = st.read_topic("t").collect()
    assert len(live) == 1
    assert live[0]["value"] == "new"
    # maxima (HWM) never move even though a bucket emptied
    assert st._bucket_maxima("t") == {0: -1, 1: 0, 2: 0} or st._bucket_maxima(
        "t"
    ).get(1) == 0


def test_order_by_compaction_matches_default_when_no_expansion(spark, tmp_path):
    """Without an expansion boundary, order_by compaction and seq
    compaction agree when event time follows seq order (produce sorts
    by (ts, event_id))."""
    st = TopicStore(spark, str(tmp_path / "ob2"))
    st.create_topic("t", n_buckets=2)
    for w in range(3):
        st.produce(_wave(spark, w), "t")
    st2 = TopicStore(spark, str(tmp_path / "ob2b"))
    st2.create_topic("t", n_buckets=2)
    for w in range(3):
        st2.produce(_wave(spark, w), "t")
    st.compact_by_key("t", key_col="user_id")
    st2.compact_by_key("t", key_col="user_id", order_by="ts")
    a = sorted(
        (r["user_id"], r["wave"], r["value"])
        for r in st.read_topic("t").collect()
    )
    b = sorted(
        (r["user_id"], r["wave"], r["value"])
        for r in st2.read_topic("t").collect()
    )
    assert a == b


# -- DDL + offset tooling (r11 parity extensions) ----------------------------


def test_delete_topic_removes_data_offsets_and_fails_unknown(spark, tmp_path):
    st = TopicStore(spark, str(tmp_path / "del"))
    st.create_topic("t", n_buckets=2)
    st.produce(_wave(spark, 0), "t")
    st.register_consumer("c1", "t")
    st.commit("c1", "t", 0, 3)
    st.create_topic("keep", n_buckets=2)
    st.produce(_wave(spark, 0), "keep")
    st.register_consumer("c1", "keep")

    assert st.delete_topic("t") == 1  # c1's offsets for t removed
    assert "t" not in st.list_topics()
    with pytest.raises(FileNotFoundError):
        st.topic_meta("t")
    with pytest.raises(FileNotFoundError):
        st.delete_topic("t")
    # unrelated topic + its offsets untouched
    assert st.read_topic("keep").count() == 20
    assert st.committed_offsets("c1", "keep") == {}
    # the name is reusable from a clean slate (Kafka delete+recreate)
    st.create_topic("t", n_buckets=4)
    assert st.produce(_wave(spark, 1), "t") == 20
    assert st.committed_offsets("c1", "t") == {}


def test_list_groups_and_reset_offsets(spark, tmp_path):
    st = TopicStore(spark, str(tmp_path / "reset"))
    st.create_topic("t", n_buckets=2)
    st.produce(_wave(spark, 0), "t")  # 20 rows over 2 buckets
    assert st.list_groups("t") == []
    st.assign_buckets("t", "g", 2)
    st.assign_buckets("t", "h", 1, strategy="sticky")
    assert st.list_groups("t") == ["g", "h"]

    maxima = st._bucket_maxima("t")
    # to-latest: the next consume sees only new rows
    offs = st.reset_offsets("c", "t", to="latest")
    assert offs == {b: maxima[b] + 1 for b in range(2)}
    batch, nxt = st.consume("c", "t", bucket=0, count=1000)
    assert batch.count() == 0 and nxt == offs[0]
    st.produce(_wave(spark, 1), "t")
    batch, _ = st.consume("c", "t", bucket=0, count=1000)
    assert batch.count() == st._bucket_maxima("t")[0] - maxima[0]

    # to-earliest: replay from the retained floor (here 0)
    offs = st.reset_offsets("c", "t", to="earliest")
    assert offs == {0: 0, 1: 0}
    batch, _ = st.consume("c", "t", bucket=0, count=10_000)
    assert batch.count() == st._bucket_maxima("t")[0] + 1
    with pytest.raises(ValueError, match="earliest"):
        st.reset_offsets("c", "t", to="yesterday")

    # after retention, earliest clamps at the floor, not 0
    st.truncate("t", before_seq=5)
    floors = st._bucket_floors("t")
    offs = st.reset_offsets("c", "t", to="earliest")
    assert offs == {b: floors.get(b, 0) for b in range(2)}


def test_sticky_split_properties_randomized():
    """Property check over random membership walks: every split covers
    all buckets disjointly, sizes differ by at most one, and movement
    is MINIMAL — a surviving member keeps min(|prev|, target) of its
    previous buckets (it only ever sheds excess)."""
    from hypothesis import given, settings
    from hypothesis import strategies as hyp

    from ripple_server_spark.sources.topics import TopicStore

    @settings(max_examples=60, deadline=None)
    @given(
        n_buckets=hyp.integers(min_value=1, max_value=48),
        walk=hyp.lists(
            hyp.integers(min_value=1, max_value=9), min_size=1, max_size=6
        ),
    )
    def check(n_buckets, walk):
        prev: dict[str, list[int]] = {}
        for n_members in walk:
            out = TopicStore._sticky_split(n_buckets, "g", n_members, prev)
            flat = sorted(b for bs in out.values() for b in bs)
            assert flat == list(range(n_buckets))  # exhaustive + disjoint
            sizes = [len(bs) for bs in out.values()]
            assert max(sizes) - min(sizes) <= 1  # balanced
            base, extra = divmod(n_buckets, n_members)
            for k, (m, bs) in enumerate(sorted(out.items())):
                target = base + (1 if k < extra else 0)
                kept = len(set(bs) & set(prev.get(m, [])))
                assert kept == min(len(prev.get(m, [])), target)  # minimal movement
            # determinism: same inputs -> same split
            assert TopicStore._sticky_split(n_buckets, "g", n_members, prev) == out
            prev = out

    check()


def test_compaction_order_by_flows_from_topic_config(spark, tmp_path):
    from ripple_server_spark.sources.maintenance import maintenance_from_config

    st = TopicStore(spark, str(tmp_path / "obcfg"))
    st.create_topic(
        "t",
        n_buckets=2,
        config={"cleanup.policy": "compact", "compaction.order.by": "ts"},
    )
    m = maintenance_from_config(
        st, "t", key_compaction_interval_s=0.0, vacuum_grace_s=3600.0
    )
    assert m.compaction_order_by == "ts"
    # the configured cleaner collapses the expand_buckets cross-bucket
    # pair that per-(bucket, key) compaction cannot
    w0 = spark.range(1).select(
        F.lit(1).alias("event_id"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("ts"),
        F.lit(5).alias("user_id"),
        F.lit("old").alias("value"),
    )
    st.produce(w0, "t")
    st.expand_buckets("t", 3)
    st.produce(
        w0.select(
            F.lit(2).alias("event_id"),
            F.lit("2026-01-02 00:00:00").cast("timestamp").alias("ts"),
            F.lit(5).alias("user_id"),
            F.lit("new").alias("value"),
        ),
        "t",
    )
    s = m.run_once()
    assert s.error is None and s.key_dropped == 1
    live = st.read_topic("t").collect()
    assert len(live) == 1 and live[0]["value"] == "new"


def test_exactly_once_read_process_write_recipe(spark, tmp_path):
    """The Kafka-transactions shape (consume -> transform -> produce +
    offset commit, exactly-once end to end) composed from this store's
    primitives: an idempotent produce keyed by the SOURCE cursor range
    + an offset commit AFTER the produce. Every crash point replays
    safely — before the produce (nothing happened), between produce
    and commit (the replayed produce no-ops on its batch_id, then the
    commit lands), after the commit (the cursor has moved; nothing
    replays). The destination never sees a duplicate or a gap."""
    st = TopicStore(spark, str(tmp_path / "rpw"))
    st.create_topic("src", n_buckets=2)
    st.create_topic("dst", n_buckets=2)
    st.produce(_wave(spark, 0), "src")
    st.register_consumer("etl", "src")

    def process_once(crash_before_commit: bool) -> int:
        """One read-process-write unit over bucket 0."""
        offset = st.committed_offsets("etl", "src").get(0, 0)
        batch, nxt = st.consume("etl", "src", bucket=0, count=1000)
        if nxt == offset:
            return 0
        out = batch.withColumn("wave", F.col("wave") + 100)
        # batch_id derived from the source cursor RANGE: a replay of
        # the same range is the same transaction
        n = st.produce(out, "dst", batch_id=f"etl:src:0:{offset}:{nxt}")
        if crash_before_commit:
            raise RuntimeError("simulated crash after produce, before commit")
        st.commit("etl", "src", 0, nxt)
        return n

    # normal run delivers the bucket once
    n1 = process_once(crash_before_commit=False)
    assert n1 > 0
    assert st.read_topic("dst").count() == n1

    # new source rows; the unit crashes between produce and commit
    st.produce(_wave(spark, 1), "src")
    with pytest.raises(RuntimeError, match="simulated crash"):
        process_once(crash_before_commit=True)
    produced_mid = st.read_topic("dst").count()
    assert produced_mid > n1  # the produce DID land before the crash

    # the replay re-runs the same range: produce no-ops (same batch_id),
    # the commit finally lands, and nothing is duplicated
    n2 = process_once(crash_before_commit=False)
    assert n2 == 0  # idempotent replay
    assert st.read_topic("dst").count() == produced_mid

    # a further run with no new data is a clean no-op
    assert process_once(crash_before_commit=False) == 0
    # end state: dst holds exactly one transformed copy of bucket 0
    src_b0 = st.read_topic("src").filter(F.col("bucket") == 0).count()
    assert st.read_topic("dst").count() == src_b0


# -- review r11 regressions ---------------------------------------------------


def test_topic_name_validation_guards_layout(spark, tmp_path):
    """'--' is the offsets-file separator and topic dirs are paths:
    names that would break either are rejected at every create path."""
    st = TopicStore(spark, str(tmp_path / "names"))
    for bad in ("a--b", "", "..", "a/b", "a b", "x" * 250, "-b"):
        with pytest.raises(ValueError, match="invalid topic name"):
            st.create_topic(bad)
    # the DESTRUCTIVE path re-validates at entry (ADVICE r11):
    # delete_topic("..") used to resolve to the topics root and rmtree
    # the entire store; it must reject before resolving any path
    for bad in ("..", ".", "a/b", "-b"):
        with pytest.raises(ValueError, match="invalid topic name"):
            st.delete_topic(bad)
    # consumer ids MAY contain '--': the suffix match still splits
    # unambiguously because the topic side cannot
    st.create_topic("b", n_buckets=2)
    st.register_consumer("c--x", "b")
    st.commit("c--x", "b", 0, 5)
    st.create_topic("keep.b", n_buckets=2)
    st.register_consumer("c--x", "keep.b")
    st.commit("c--x", "keep.b", 0, 7)
    st.delete_topic("b")
    assert st.committed_offsets("c--x", "keep.b") == {0: 7}


def test_lone_tombstone_cannot_starve_the_cleaner_gate(spark, tmp_path):
    """Review r11: a no-drop pass that RETAINS a within-window marker
    (e.g. a delete of an already-compacted-away key) must clear the
    cleaner checkpoint, or the dirty-ratio gate would never send the
    post-window second pass back to remove the marker."""
    st = TopicStore(spark, str(tmp_path / "starve"))
    st.create_topic("t", n_buckets=2)
    st.produce(_wave(spark, 0), "t")
    st.compact_by_key("t", key_col="user_id", tombstone_col="value")
    assert st.key_compaction_dirty_ratio("t") == 0.0  # clean head

    # a tombstone for a key with NO surviving prior row, event time now
    lone = spark.range(1).select(
        F.lit(9999).cast("bigint").alias("event_id"),
        F.timestamp_seconds(F.lit(int(time.time()))).alias("ts"),
        F.lit(999).cast("bigint").alias("user_id"),
        F.lit(0).alias("wave"),
        F.lit(None).cast("string").alias("value"),
    )
    st.produce(lone, "t")

    day_ms = 86_400_000
    assert (
        st.compact_by_key(
            "t", key_col="user_id", tombstone_col="value",
            tombstone_retention_ms=day_ms,
        )
        == 0
    )  # nothing superseded; marker retained
    # the checkpoint is CLEARED, not left covering the clean bulk —
    # the gate keeps routing the cleaner back each interval
    assert st.key_compaction_dirty_ratio("t") == 1.0

    # window expired: the pass removes the marker and re-checkpoints
    assert (
        st.compact_by_key(
            "t", key_col="user_id", tombstone_col="value",
            tombstone_retention_ms=1,
        )
        == 1
    )
    assert st.key_compaction_dirty_ratio("t") == 0.0
    assert st.read_topic("t").filter(F.col("user_id") == 999).count() == 0


def test_assign_buckets_adoption_rejects_concurrent_reconfig(
    spark, tmp_path, monkeypatch
):
    """Review r11: the _AlreadyCurrent adoption path must raise a
    group-coordination error, not KeyError, when the group was
    reconfigured between the failed commit and the adoption re-read."""
    import copy

    st = TopicStore(spark, str(tmp_path / "adopt"))
    st.create_topic("t", n_buckets=4)
    st.produce(_wave(spark, 0), "t")
    st.assign_buckets("t", "g", 2, strategy="sticky")

    real_v, real_m = st.latest_manifest("t")
    # 1st canned read: incomplete assignment -> forces the commit path;
    # apply then sees the REAL (complete, identical) entry and raises
    # _AlreadyCurrent; 2nd canned read: the group switched to range
    # concurrently -> adoption must reject, not KeyError
    first = copy.deepcopy(real_m)
    first["groups"]["g"]["assignment"] = {"g-0": [0], "g-1": [1]}
    second = copy.deepcopy(real_m)
    second["groups"]["g"] = {
        "generation": real_m["groups"]["g"]["generation"] + 1,
        "n_members": 2,
        "strategy": "range",
    }
    canned = [(real_v, first), (real_v + 1, second)]
    orig = st.latest_manifest

    def fake_latest(topic):
        if topic == "t" and canned:
            return canned.pop(0)
        return orig(topic)

    monkeypatch.setattr(st, "latest_manifest", fake_latest)
    with pytest.raises(StaleGenerationError, match="reconfigured concurrently"):
        st.assign_buckets("t", "g", 2, strategy="sticky")
