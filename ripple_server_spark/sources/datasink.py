"""Native write path for the ``ripple_topic`` DataSource (A5 produce).

Gives ``df.write.format("ripple_topic")`` and
``df.writeStream.format("ripple_topic")`` first-class parity with the
read side — the same API tier Kafka's Spark connector has — without
importing engine helpers:

    df.write.format("ripple_topic").mode("append")
      .option("root", root).option("topic", "t1").save()

    (df.writeStream.format("ripple_topic")
       .option("root", root).option("topic", "t1")
       .option("checkpointLocation", ckpt).start())

Reference semantics: the produce path (internal/broker/producer/
server/core.go:21-34 + queue.Push queue.go:49-51) — append assigning
each bucket a contiguous, gap-free per-bucket ``seq``.

Execution model — EVERY write task is an independent producer client:

- each task buffers its Arrow batches, routes rows to buckets
  (``pmod(key, n_buckets)``, NULL -> 0, same as ``TopicStore.produce``),
  sorts by (bucket, ts, event_id), and appends through the SAME
  optimistic manifest protocol produce uses (O_EXCL commit of version
  v+1, seq-race detection + rebase) — all executor-side, rows never
  pass through the driver;
- seqs stay contiguous per bucket: a task claims ``[maxima+1, +n)``
  atomically with its manifest commit; on a lost race the task shifts
  its seqs by the per-bucket delta (pure Arrow add-constant), restages,
  and retries — exactly produce's ``_SeqRace`` rebase, scoped to one
  task's rows;
- FIFO within a bucket = task commit order, each task's rows internally
  ordered by (ts, event_id) — the arrival-order contract of the
  reference's per-bucket queue under concurrent producers.

Delivery semantics (documented, test-pinned):

- **task-atomic, idempotent task retry**: a task's rows commit in one
  manifest version or not at all; retried/speculative attempts no-op on
  the per-partition applied id (checked at entry AND inside the commit,
  like produce's ``_AlreadyApplied``).
- **batch writes**: with ``option("batch_id", ...)`` a re-run of the
  whole job is idempotent per partition (Kafka-sink parity plus ids);
  without it, a failed job leaves the committed prefix of tasks visible
  — exactly the Kafka sink's at-least-once contract. The whole-batch
  transactional form remains :meth:`TopicStore.produce` (one commit for
  the entire batch).
- **streaming writes**: the per-task applied id is
  ``dsw/<producer_id>#b<batchId>/p<partition>`` (batch id from the
  ``streaming.sql.batchId`` task property, producer id from the
  ``producer_id`` option or derived from ``checkpointLocation``), so a
  replayed micro-batch — crash between sink write and checkpoint
  commit — is a per-task no-op: EXACTLY-ONCE whenever the replayed
  batch re-partitions deterministically (true for ``ripple_topic``
  sources, which replay pinned manifest snapshots), at-least-once under
  a nondeterministic upstream (Spark's general sink bound). The
  idempotency window is BOUNDED: applied ids are retained for the
  newest 4096 commits (manifests are full snapshots, so retention is a
  size/exactness tradeoff) — a replay arriving after more than 4096
  interleaved commits re-appends; size tasks-per-trigger well below
  that, or use the foreachBatch form (one id per batch). The
  whole-batch-atomic multi-sink form remains
  :func:`streaming.api.write_stream_to_topic` (foreachBatch).

Scale notes: commit throughput is bounded by the manifest log — the
same single-leader-log bound the reference's one-broker produce path
has; rows/bytes scale with executors (each task writes its own parquet
directly into the bucket dirs; files are invisible until its manifest
commit), only the O(KB) manifest commits serialize. Bulk backfills
should prefer ``TopicStore.produce`` (one commit per batch); the sink
is the per-micro-batch/streaming tier where tasks-per-commit is small.
"""

from __future__ import annotations

import json
import os
import re
import uuid
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSourceArrowWriter,
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from ripple_server_spark.config import APPLIED_IDS_KEEP, N_BUCKETS

# Optimistic-retry caps. Each lost round means ANOTHER producer's
# commit landed (the scheme is livelock-free), so a task writing
# alongside T siblings can legitimately lose up to T-1 rounds — the
# cap must comfortably exceed any plausible tasks-per-job, not be a
# small constant (a 32-task write under a 20-round cap can fail
# spuriously under adversarial scheduling). Retries are cheap: a read
# + JSON parse, plus an Arrow re-stage only when a claimed bucket
# actually moved.
_RETRIES = 200
_APPLIED_IDS_KEEP = APPLIED_IDS_KEEP  # shared with TopicStore.produce


class TaskCommit(WriterCommitMessage):
    """Rows + manifest version committed by one write task (version is
    None when the task no-op'd on its applied id)."""

    def __init__(self, rows: int, version: int | None):
        self.rows = rows
        self.version = version


class _AlreadyApplied(Exception):
    """This task's applied id is already in the manifest — a retried or
    speculative attempt whose twin won: landing again would double-
    append. Staged files become vacuum-reclaimed orphans."""


class _SeqRace(Exception):
    """A concurrent task advanced a bucket we also append to: our staged
    seqs were computed from a stale base — restage shifted and retry."""


# -- Spark-free manifest protocol (executor-side) --------------------------
# Mirrors TopicStore._commit / _latest_version / latest_manifest
# (sources/topics.py:123-166) without the SparkSession-holding class:
# write tasks run in executor Python workers where no session exists.


def _manifest_path(root: str, topic: str, version: int) -> str:
    return os.path.join(root, "topics", topic, "_log", f"{version:020d}.json")


def _latest_version(root: str, topic: str) -> int:
    log = os.path.join(root, "topics", topic, "_log")
    try:
        names = [n for n in os.listdir(log) if n.endswith(".json")]
    except FileNotFoundError:
        names = []
    if not names:
        raise FileNotFoundError(
            f"topic {topic!r} has no manifest — create_topic() first, or "
            "pass option('create_topic', 'true')"
        )
    return max(int(n[:-5]) for n in names)


def _load_manifest(root: str, topic: str, version: int) -> dict:
    """Parse one committed manifest. A JSONDecodeError is retried
    briefly: impossible on the os.link commit path (bytes precede the
    name), but the linkless-filesystem fallback claims the name before
    copying content in, leaving a microscopic torn-read window."""
    import time

    path = _manifest_path(root, topic, version)
    for attempt in range(5):
        try:
            with open(path) as f:
                return json.load(f)
        except json.JSONDecodeError:
            if attempt == 4:
                raise
            time.sleep(0.02 * (attempt + 1))
    raise AssertionError("unreachable")


def _claim_version_slot(path: str, manifest: dict) -> bool:
    """Atomically publish ``manifest`` at ``path`` iff the slot is free.

    Content is written to a sibling tmp file first, then the slot is
    claimed with ``os.link`` — link creation is atomic and fails if the
    name exists, AND the bytes are complete before the name appears, so
    a concurrent reader can never see a torn/empty manifest (the
    O_EXCL-then-write form left a window where the name existed with
    zero bytes — harmless under one driver-side producer, a hot race
    once every executor TASK is a producer).

    On filesystems without hard-link support (some FUSE/object-store
    mounts), falls back to the O_CREAT|O_EXCL claim — equally atomic on
    the NAME, but content lands after it appears, so readers keep a
    torn-read retry (:func:`_load_manifest`) as the belt for that path.
    """
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    try:
        os.link(tmp, path)
        return True
    except FileExistsError:
        return False
    except OSError:
        # no hard links here: claim the slot with O_EXCL and copy the
        # staged bytes in (review r08 — the link-only form regressed
        # every commit on linkless mounts)
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "w") as f, open(tmp) as src:
            f.write(src.read())
        return True
    finally:
        os.unlink(tmp)


def _commit_manifest(root: str, topic: str, base_version: int, apply) -> dict:
    """Optimistic commit of version+1 (TopicStore._commit's loop, with
    the torn-read-safe slot claim). ``apply`` must be a self-contained
    rebase; it may raise :class:`_AlreadyApplied` / :class:`_SeqRace`
    to abort upward."""
    v = base_version
    for _ in range(_RETRIES):
        try:
            base = _load_manifest(root, topic, v)
        except FileNotFoundError:
            v = _latest_version(root, topic)
            base = _load_manifest(root, topic, v)
        new = apply(dict(base))
        new["version"] = v + 1
        if _claim_version_slot(_manifest_path(root, topic, v + 1), new):
            return new
        v = _latest_version(root, topic)
    raise RuntimeError(f"manifest commit contention on topic {topic!r}")


_TOPIC_NAME_RE = re.compile(r"^[A-Za-z0-9._-]{1,249}$")


def validate_topic_name(topic: str) -> None:
    """Reject topic names that would break the storage layout (shared
    by TopicStore.create_topic and the sink's auto-create). Kafka's
    character set and length cap ([A-Za-z0-9._-], <= 249), no bare
    ``.``/``..`` (path traversal through topic_dir), and no ``--`` —
    that token is the consumer-offsets filename separator
    (``<consumer>--<topic>.json``), and a topic name containing it
    would make delete_topic's suffix match ambiguous against another
    topic's offsets (review r11)."""
    if topic in (".", ".."):
        raise ValueError(f"invalid topic name {topic!r}")
    if not _TOPIC_NAME_RE.fullmatch(topic):
        raise ValueError(
            f"invalid topic name {topic!r}: use 1-249 chars from "
            "[A-Za-z0-9._-]"
        )
    if "--" in topic:
        raise ValueError(
            f"invalid topic name {topic!r}: '--' is reserved as the "
            "offsets-file separator"
        )
    if topic.startswith("-"):
        # a consumer id ending in '-' before the '--' separator would
        # make '<c->--<-b>.json' end with '--b.json' and alias topic
        # 'b' in delete_topic's offsets sweep (ADVICE r11)
        raise ValueError(
            f"invalid topic name {topic!r}: a leading '-' makes the "
            "offsets-file suffix ambiguous"
        )


def _ensure_topic(root: str, topic: str, n_buckets: int) -> None:
    """Race-safe auto-create (opt-in): O_EXCL on manifest version 1 —
    concurrent tasks all attempt it, exactly one wins, the rest proceed
    onto the committed log (TopicStore.create_topic's contract)."""
    validate_topic_name(topic)
    log = os.path.join(root, "topics", topic, "_log")
    os.makedirs(os.path.join(root, "topics", topic, "data"), exist_ok=True)
    os.makedirs(log, exist_ok=True)
    if any(n.endswith(".json") for n in os.listdir(log)):
        return
    m = {
        "version": 1,
        "topic": topic,
        "n_buckets": n_buckets,
        "files": [],
        "applied_batches": [],
        "maxima": {},
        "floors": {},
    }
    _claim_version_slot(_manifest_path(root, topic, 1), m)


# -- task append kernel -----------------------------------------------------


def _merge_schema(m: dict, fields: list[str]) -> None:
    """Manifest-tracked schema evolution, byte-identical policy to
    produce (topics.py): first writer establishes, new columns append
    and set the evolved flag."""
    prev = m.get("schema")
    if prev is None:
        m["schema"] = fields
    elif set(prev) != set(fields):
        # Any set difference marks evolution — including a strict-SUBSET
        # write (add list empty): the topic then holds parquet files with
        # heterogeneous footers and readers must mergeSchema, exactly as
        # produce (topics.py) flags it. Flagging only on appends would let
        # read_topic adopt a narrow file's schema and re-materialize the
        # dropped columns as NULL.
        m["schema"] = list(prev) + [f for f in fields if f not in prev]
        m["schema_evolved"] = True


def _task_append(
    root: str,
    topic: str,
    key_col: str,
    applied_id: str,
    batches: Iterator,
    fields: list[str],
    producer_epoch: int | None = None,
) -> TaskCommit:
    """Append one task's Arrow batches as a producer transaction.

    Runs entirely executor-side: route -> sort -> stage parquet directly
    into the bucket dirs (invisible until the manifest commit) -> claim
    contiguous seqs with an optimistic manifest commit; on a seq race,
    restage with shifted seqs and retry. Raced/leftover staged files are
    crash-orphan-equivalent (vacuum reclaims them).

    ``producer_epoch`` (``option("producer_epoch", N)``) opts this
    transaction into topic-level producer fencing: the epoch is checked
    at entry AND inside the commit's apply, so a
    ``TopicStore.fence_producers`` landing mid-write fences the task
    atomically — staged files become vacuum orphans, no partial rows
    visible (VERDICT r10 item 6; mirrors produce()).
    """

    def _check_epoch(man: dict) -> None:
        if producer_epoch is None:
            return
        cur = int(man.get("producer_epoch", 0))
        if int(producer_epoch) != cur:
            # canonical error type lives with the store API (lazy to
            # keep this executor-side module import-light); surfaces
            # to the driver inside Spark's task-failure wrapper with
            # the message intact
            from ripple_server_spark.sources.topics import (
                StaleProducerEpochError,
            )

            raise StaleProducerEpochError(
                f"sink write to topic {topic!r} carries producer epoch "
                f"{int(producer_epoch)}, but the topic is at epoch {cur}"
                " — the producer was fenced (fence_producers)"
            )
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ripple_server_spark.sources import fsio

    batches = [b for b in batches if b.num_rows]
    if not batches:
        return TaskCommit(0, None)
    tbl = pa.Table.from_batches(batches)
    drop = [c for c in ("bucket", "seq") if c in tbl.column_names]
    if drop:
        # recomputed below — produce's withColumn-overwrite contract
        tbl = tbl.drop_columns(drop)
    for req in (key_col, "ts", "event_id"):
        if req not in tbl.column_names:
            raise ValueError(
                f"ripple_topic sink requires column {req!r} (routing key "
                "+ the (ts, event_id) FIFO order key — produce parity)"
            )

    v = _latest_version(root, topic)
    meta = _load_manifest(root, topic, v)
    _check_epoch(meta)  # fail fast before staging anything
    if applied_id in meta.get("applied_batches", []):
        return TaskCommit(0, None)  # retried task: already landed
    n_buckets = int(meta["n_buckets"])

    # bucket = pmod(key, n) with NULL -> 0 (operators/relational.bucket_of
    # + produce's coalesce), as int32 partition values
    key = pc.fill_null(pc.cast(tbl[key_col], pa.int64()), 0)
    k = key.to_numpy(zero_copy_only=False)
    b = (k % n_buckets).astype(np.int32)  # numpy % is non-negative for n>0
    tbl = tbl.append_column("__b", pa.array(b))
    # NULLS FIRST to match produce's (ts, event_id) FIFO order key
    # exactly (the old Spark window's ascending default, kept by the
    # produce staging kernel): pyarrow's sort default is nulls-at-END,
    # which gave NULL-ts rows the HIGHEST seqs via the sink but the
    # lowest via produce() on the same topic (ADVICE r12 drift fix;
    # test-pinned in test_datasink).
    tbl = tbl.sort_by(
        [("__b", "ascending"), ("ts", "ascending"), ("event_id", "ascending")],
        null_placement="at_start",
    )
    parts = {
        int(x): tbl.filter(pc.equal(tbl["__b"], int(x))).drop_columns("__b")
        for x in np.unique(b)
    }
    data_dir = os.path.join(root, "topics", topic, "data")

    for _ in range(_RETRIES):
        v = _latest_version(root, topic)
        m = _load_manifest(root, topic, v)
        if applied_id in m.get("applied_batches", []):
            return TaskCommit(0, None)
        base = {bb: int(m.get("maxima", {}).get(str(bb), -1)) for bb in parts}
        tag = uuid.uuid4().hex[:12]
        rel_files: list[str] = []
        for bb, sub in parts.items():
            seq = pa.array(np.arange(sub.num_rows, dtype=np.int64) + base[bb] + 1)
            out = sub.append_column("seq", seq)
            bdir = f"bucket={bb}"
            fsio.DATA_FS.makedirs(os.path.join(data_dir, bdir))
            rel = f"{bdir}/dsw-{tag}.parquet"
            # TIMESTAMP(MICROS) matches produce's Spark writer (the
            # write-scoped _micros_ts_writes conf window, topics.py) —
            # one physical ts type across a topic's round-9+ files, and
            # unlike the INT96 both writers used before round 9, micros
            # columns carry min/max statistics so time seeks/retention
            # prune row groups (readers handle mixed-era topics)
            fsio.DATA_FS.write_table(out, os.path.join(data_dir, rel))
            rel_files.append(rel)
        counts = {bb: parts[bb].num_rows for bb in parts}

        def apply(man: dict) -> dict:
            # all three re-checks INSIDE the commit, like produce: a
            # racing twin attempt, concurrent task, or mid-write
            # producer fence must be caught at the atomic point, not
            # just at entry
            _check_epoch(man)
            if applied_id in man.get("applied_batches", []):
                raise _AlreadyApplied()
            cur = {bb: int(man.get("maxima", {}).get(str(bb), -1)) for bb in parts}
            if any(cur[bb] != base[bb] for bb in parts):
                raise _SeqRace()
            man["files"] = list(man["files"]) + rel_files
            mx = dict(man.get("maxima", {}))
            for bb, c in counts.items():
                mx[str(bb)] = base[bb] + c
            man["maxima"] = mx
            _merge_schema(man, fields)
            # retention sizes the idempotency WINDOW: a retried task
            # is recognized only while its id is among the newest
            # _APPLIED_IDS_KEEP commits. 4096 covers thousands of
            # interleaved task commits between a failure and its
            # replay; jobs with MORE concurrent tasks than that should
            # batch through TopicStore.produce (one id per batch).
            man["applied_batches"] = (
                list(man.get("applied_batches", [])) + [applied_id]
            )[-_APPLIED_IDS_KEEP:]
            return man

        try:
            committed = _commit_manifest(root, topic, v, apply)
            return TaskCommit(tbl.num_rows, int(committed["version"]))
        except _AlreadyApplied:
            return TaskCommit(0, None)  # staged files -> vacuum orphans
        except _SeqRace:
            continue  # restage against the new maxima (files orphaned)
    raise RuntimeError(
        f"seq-claim contention on topic {topic!r} after {_RETRIES} attempts"
    )


# -- writer classes ---------------------------------------------------------


def _writer_common(options: dict, schema: StructType, overwrite: bool):
    if overwrite:
        raise ValueError(
            "ripple_topic is an append-only log (reference produce is "
            "Push-only, queue.go:49-51): use mode('append')"
        )
    root = options["root"]
    if "topic" not in options:
        raise ValueError(
            "ripple_topic writes need option('topic', <name>) — "
            "subscribePattern is a READ subscription form"
        )
    topics = [t.strip() for t in options["topic"].split(",") if t.strip()]
    if len(topics) != 1:
        raise ValueError("ripple_topic writes go to exactly one topic")
    key_col = options.get("key_col", "user_id")
    # the recorded MESSAGE schema must match what the files hold:
    # input columns minus bucket (a partition dir, not a file column)
    # plus the seq the writer assigns — byte-identical to what
    # TopicStore.produce records, so a sink-established topic's
    # empty-frame DDL carries seq (consume() filters on it) and the
    # first produce() after a sink write does NOT flag a spurious
    # schema evolution (review r08 finding)
    fields = [
        f"{f.name}:{f.dataType.simpleString()}"
        for f in schema.fields
        if f.name not in ("bucket", "seq")
    ] + ["seq:bigint"]
    create = str(options.get("create_topic", "false")).lower() == "true"
    n_buckets = int(options.get("n_buckets", N_BUCKETS))
    epoch = options.get("producer_epoch")
    producer_epoch = int(epoch) if epoch is not None else None
    return root, topics[0], key_col, fields, create, n_buckets, producer_epoch


class RippleTopicBatchWriter(DataSourceArrowWriter):
    """``df.write.format("ripple_topic").mode("append")`` — see module
    docstring for the per-task producer model and delivery semantics."""

    def __init__(self, options: dict, schema: StructType, overwrite: bool):
        (
            self.root,
            self.topic,
            self.key_col,
            self.fields,
            self.create,
            self.n_buckets,
            self.producer_epoch,
        ) = _writer_common(options, schema, overwrite)
        # one token per job (generated once driver-side, pickled into
        # every task); option('batch_id') pins it so a re-run of the
        # same job is per-partition idempotent
        self.batch_token = options.get("batch_id") or f"job-{uuid.uuid4().hex[:16]}"

    def write(self, iterator) -> TaskCommit:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        if self.create:
            _ensure_topic(self.root, self.topic, self.n_buckets)
        return _task_append(
            self.root,
            self.topic,
            self.key_col,
            f"dsw/{self.batch_token}/p{pid}",
            iterator,
            self.fields,
            producer_epoch=self.producer_epoch,
        )

    def commit(self, messages) -> None:
        pass  # tasks committed through the manifest; nothing to finalize

    def abort(self, messages) -> None:
        # Kafka-sink contract: tasks that committed stay committed (no
        # distributed rollback of an append-only log); the retry of the
        # job no-ops those partitions when batch_id is pinned.
        pass


class RippleTopicStreamWriter(DataSourceStreamArrowWriter):
    """``writeStream.format("ripple_topic")`` — exactly-once per
    (producer, micro-batch, partition): see module docstring."""

    def __init__(self, options: dict, schema: StructType, overwrite: bool):
        (
            self.root,
            self.topic,
            self.key_col,
            self.fields,
            self.create,
            self.n_buckets,
            self.producer_epoch,
        ) = _writer_common(options, schema, overwrite)
        producer = options.get("producer_id")
        if producer is None:
            # same normalization as write_stream_to_topic's ckpt_id:
            # 'ckpt' and 'ckpt/' must yield the same idempotency ids
            ckpt = options.get("checkpointlocation") or options.get(
                "checkpointLocation"
            )
            if ckpt is None:
                raise ValueError(
                    "ripple_topic stream sink needs option('producer_id') "
                    "or a checkpointLocation to derive replay-stable "
                    "idempotency ids from"
                )
            producer = os.path.abspath(ckpt)
        self.producer_id = producer

    def write(self, iterator) -> TaskCommit:
        from pyspark import TaskContext

        tc = TaskContext.get()
        batch_id = tc.getLocalProperty("streaming.sql.batchId")
        if batch_id is None:
            raise RuntimeError(
                "streaming.sql.batchId task property missing — cannot "
                "build a replay-stable idempotency id"
            )
        if self.create:
            _ensure_topic(self.root, self.topic, self.n_buckets)
        return _task_append(
            self.root,
            self.topic,
            self.key_col,
            f"dsw/{self.producer_id}#b{batch_id}/p{tc.partitionId()}",
            iterator,
            self.fields,
            producer_epoch=self.producer_epoch,
        )

    def commit(self, messages, batchId: int) -> None:
        pass  # tasks committed through the manifest (see module doc)

    def abort(self, messages, batchId: int) -> None:
        # replay of this batchId no-ops the partitions that committed
        # (per-task applied ids) and lands the rest — net effect is
        # exactly-once under deterministic re-partitioning
        pass
