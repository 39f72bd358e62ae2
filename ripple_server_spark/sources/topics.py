"""Topic store: durable, bucket-partitioned event logs with consumer
offsets — the Spark-native reimplementation of the reference's entire
broker data path.

Reference semantics reproduced (SURVEY.md §2 Table A, §3):

- **CreateBucket** (server/exposed/create.go:15-46): a topic is a
  parquet directory partitioned by ``bucket``; creating it registers
  metadata. No replica placement — durability is the storage layer's.
- **Produce** (internal/broker/producer/server/core.go:21-34,
  queue.Push queue.go:49-51): transactional append assigning each
  bucket a contiguous, gap-free ``seq`` (per-bucket FIFO total order —
  the queue's list index).
- **Consume** (internal/broker/consumer/server/core.go:27-64): ranged,
  non-destructive batch read of ``count`` messages from the consumer's
  committed offset; offsets are per (consumer, topic, bucket) exactly
  like ZK ``/consumers/<id>`` nodes (core.go:77-85), so every consumer
  independently sees the full stream (fan-out pub/sub).
- **Offset commit** (core.go:62): explicit ``commit()`` after
  processing -> at-least-once. The reference's bug (locally advances by
  ``len(messages)`` but persists ``offset+Count``, core.go:61-62) is
  deliberately NOT reproduced: we commit exactly what was delivered.

Scale design: at 100 TB a topic is the same layout with more buckets —
``bucket=`` directory partitioning means a consumer of one bucket prunes
all others at the scan; ``seq >= offset`` prunes row groups by min/max
stats, so tail reads touch only tail files. Sequence assignment shuffles
only the *new* batch (window over batch rows) and reads only the
per-bucket maxima of existing data (column-pruned parquet footer scan).
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from ripple_server_spark.config import N_BUCKETS
from ripple_server_spark.operators.relational import bucket_of


class TopicStore:
    """Filesystem-backed topic registry (the ZooKeeper analog).

    Layout::

        root/
          topics/<topic>/_meta.json          # n_buckets, created flag
          topics/<topic>/data/bucket=<n>/    # parquet event log
          offsets/<consumer_id>--<topic>.json  # committed per-bucket offsets
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        # In-memory per-bucket max-seq, maintained by produce() exactly
        # like the reference broker's in-memory queue length — offset
        # math never re-scans the log while a store instance is live.
        # (Single-writer-per-topic model, same as the reference.)
        self._maxima: dict[str, dict[int, int]] = {}
        # Retained floor (earliest live seq) per bucket; 0 until a
        # truncate() raises it. Cold path over an existing log scans
        # min(seq) once (footer-stat territory, like the maxima).
        self._floors: dict[str, dict[int, int]] = {}
        os.makedirs(os.path.join(root, "topics"), exist_ok=True)
        os.makedirs(os.path.join(root, "offsets"), exist_ok=True)

    # -- paths -------------------------------------------------------------
    def topic_dir(self, topic: str) -> str:
        return os.path.join(self.root, "topics", topic)

    def data_dir(self, topic: str) -> str:
        return os.path.join(self.topic_dir(topic), "data")

    def _meta_path(self, topic: str) -> str:
        return os.path.join(self.topic_dir(topic), "_meta.json")

    def _offsets_path(self, consumer_id: str, topic: str) -> str:
        return os.path.join(self.root, "offsets", f"{consumer_id}--{topic}.json")

    # -- DDL (CreateBucket analog) ----------------------------------------
    def create_topic(self, topic: str, n_buckets: int = N_BUCKETS) -> None:
        os.makedirs(self.data_dir(topic), exist_ok=True)
        self._write_json(self._meta_path(topic), {"topic": topic, "n_buckets": n_buckets})

    def topic_meta(self, topic: str) -> dict:
        with open(self._meta_path(topic)) as f:
            return json.load(f)

    def list_topics(self) -> list[str]:
        return sorted(os.listdir(os.path.join(self.root, "topics")))

    # -- produce (A5) ------------------------------------------------------
    def produce(
        self,
        df: DataFrame,
        topic: str,
        key_col: str = "user_id",
        batch_id: str | None = None,
    ) -> int:
        """Append a batch, assigning bucket + contiguous per-bucket seq.

        FIFO order within a bucket follows (ts, event_id) of the batch —
        the arrival order analog. Returns number of rows appended.

        ``batch_id`` makes the append IDEMPOTENT: a replayed produce
        with an already-applied id is a no-op (returns 0). This is the
        engine's exactly-once producer story — the reference fires,
        forgets, and hopes acks arrive (`internal/broker/ack/ack.go`,
        client-ack disabled at ack.go:36); here replay safety is a
        recorded batch id, the same mechanism foreachBatch sinks use.
        Applied ids live in topic meta (bounded: last 1000).
        """
        meta = self.topic_meta(topic)
        if batch_id is not None:
            if batch_id in meta.get("applied_batches", []):
                return 0
        n_buckets = meta["n_buckets"]
        data = self.data_dir(topic)

        existing = self._bucket_maxima(topic)
        routed = df.withColumn("bucket", bucket_of(F.col(key_col), n_buckets))
        w = Window.partitionBy("bucket").orderBy("ts", "event_id")
        # Base-seq lookup via a broadcast join of the tiny maxima map
        # (never a Python UDF on the data path).
        base_df = self.spark.createDataFrame(
            [(b, m) for b, m in existing.items()] or [(-1, -1)], ["bucket", "max_seq"]
        )
        routed = (
            routed.join(F.broadcast(base_df), on="bucket", how="left")
            .withColumn("max_seq", F.coalesce(F.col("max_seq"), F.lit(-1)))
            .withColumn("seq", F.col("max_seq") + F.row_number().over(w))
            .drop("max_seq")
        )
        # Total + per-bucket counts observed DURING the write (metrics
        # piggyback on the one action) — no persist, no second pass over
        # the batch, and the maxima cache updates for free.
        obs = Observation()
        metrics = [F.count(F.lit(1)).alias("n")] + [
            F.count(F.when(F.col("bucket") == b, 1)).alias(f"c{b}")
            for b in range(n_buckets)
        ]
        routed.observe(obs, *metrics).write.mode("append").partitionBy(
            "bucket"
        ).parquet(data)
        got = obs.get
        self._maxima[topic] = {
            b: existing.get(b, -1) + int(got[f"c{b}"]) for b in range(n_buckets)
        }
        if batch_id is not None:
            applied = meta.get("applied_batches", [])
            meta["applied_batches"] = (applied + [batch_id])[-1000:]
            self._write_json(self._meta_path(topic), meta)
        return int(got["n"])

    def _bucket_maxima(self, topic: str) -> dict[int, int]:
        """Current max seq per bucket. Served from the in-memory cache
        when this store instance has produced before; the cold path
        (fresh instance over an existing log) is one column-pruned scan
        of `seq` — at scale, footer-stat territory / a metadata table."""
        cached = self._maxima.get(topic)
        if cached is not None:
            return cached
        data = self.data_dir(topic)
        if not any(e.startswith("bucket=") for e in os.listdir(data)):
            return {}
        rows = (
            self.spark.read.parquet(data)
            .groupBy("bucket")
            .agg(F.max("seq").alias("m"))
            .collect()
        )
        maxima = {r["bucket"]: r["m"] for r in rows}
        self._maxima[topic] = maxima
        return maxima

    def _bucket_floors(self, topic: str) -> dict[int, int]:
        cached = self._floors.get(topic)
        if cached is not None:
            return cached
        data = self.data_dir(topic)
        if not any(e.startswith("bucket=") for e in os.listdir(data)):
            return {}
        rows = (
            self.spark.read.parquet(data)
            .groupBy("bucket")
            .agg(F.min("seq").alias("m"))
            .collect()
        )
        floors = {r["bucket"]: r["m"] for r in rows}
        self._floors[topic] = floors
        return floors

    def read_topic(self, topic: str) -> DataFrame:
        return self.spark.read.parquet(self.data_dir(topic))

    # -- maintenance -------------------------------------------------------
    def compact(self, topic: str) -> None:
        """Rewrite the topic log so each bucket holds one seq-sorted
        file. Micro-batch appends accumulate small files (one per
        produce per bucket); at scale that degrades scans (file-open
        overhead) and row-group seq-stat pruning. Compaction is the
        standard log-store maintenance op (Kafka log segments / Delta
        OPTIMIZE analog): repartition on bucket (each bucket → exactly
        one task), sort by seq inside (range consumes then prune whole
        row groups), write beside the live dir, atomic swap. Readers
        see old-or-new, never a mix; seq/content are untouched so
        consumer offsets stay valid.
        """
        data = self.data_dir(topic)
        n_buckets = self.topic_meta(topic)["n_buckets"]
        tmp = data + ".compacting"
        old = data + ".old"
        (
            self.read_topic(topic)
            .repartition(n_buckets, F.col("bucket"))
            .sortWithinPartitions("seq")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(tmp)
        )
        os.rename(data, old)
        os.rename(tmp, data)
        import shutil

        shutil.rmtree(old)

    def truncate(self, topic: str, before_seq: int) -> int:
        """Retention: drop log FILES wholly below ``before_seq`` in every
        bucket (the Kafka segment-retention analog — the reference's
        queue just grows until OOM, `pkg/utils/collection/
        concurrent_list.go`; a durable log needs an age-out).

        File-granularity by design: a file is deleted only when its max
        seq < before_seq (parquet footer stats — no data is read or
        rewritten), so the retained floor is <= before_seq and reads
        stay consistent: a consumer whose offset predates retention
        simply resumes at the retained floor, the same contract as
        Kafka's earliest-offset reset. Compact first for tight floors
        (one file per bucket => exact truncation). Returns files
        removed."""
        import pyarrow.parquet as pq

        data = self.data_dir(topic)
        removed = 0
        for bdir in sorted(os.listdir(data)):
            if not bdir.startswith("bucket="):
                continue
            bpath = os.path.join(data, bdir)
            for fn in sorted(os.listdir(bpath)):
                if not fn.endswith(".parquet"):
                    continue
                fpath = os.path.join(bpath, fn)
                md = pq.read_metadata(fpath)
                idx = md.schema.to_arrow_schema().get_field_index("seq")
                mx = max(
                    md.row_group(i).column(idx).statistics.max
                    for i in range(md.num_row_groups)
                )
                if mx < before_seq:
                    os.remove(fpath)
                    removed += 1
        self._floors.pop(topic, None)
        return removed

    # -- consume (A6-A8) ---------------------------------------------------
    def register_consumer(self, consumer_id: str, topic: str) -> None:
        """First-contact registration: offsets start at 0 for every
        bucket (reference: ZK /consumers/<id> = "0", core.go:77-85)."""
        path = self._offsets_path(consumer_id, topic)
        if not os.path.exists(path):
            self._write_json(path, {})

    def committed_offsets(self, consumer_id: str, topic: str) -> dict[int, int]:
        path = self._offsets_path(consumer_id, topic)
        if not os.path.exists(path):
            return {}
        with open(path) as f:
            return {int(k): v for k, v in json.load(f).items()}

    def consume(
        self, consumer_id: str, topic: str, bucket: int, count: int
    ) -> tuple[DataFrame, int]:
        """AskQuery{Count}: next ``count`` messages of one bucket from
        the committed offset, in seq order. Non-destructive; the read
        does not move the offset — call :meth:`commit` after processing
        (at-least-once).

        Returns (batch_df, next_offset). Partition pruning (bucket=) +
        rowgroup skipping (seq >= offset) make this a tail read.
        """
        offset = self.committed_offsets(consumer_id, topic).get(bucket, 0)
        # Retention clamp: offsets below the retained floor resume at
        # the floor (Kafka earliest-offset reset; see truncate()).
        offset = max(offset, self._bucket_floors(topic).get(bucket, 0))
        # seq is contiguous per bucket above the floor (produce
        # invariant), so delivered = min(count, max_seq - offset + 1)
        # from the maxima cache — sizing launches no job on the warm path.
        mx = self._bucket_maxima(topic).get(bucket, -1)
        delivered = max(0, min(count, mx - offset + 1))
        # The batch is exactly seq ∈ [offset, offset+delivered) — the
        # reference's SubArray(offset, offset+Count) (queue.go:59-61) as
        # a closed range filter. Both bounds push to parquet row-group
        # stats; no sort-limit plan (sort only orders the ≤count rows).
        batch = (
            self.read_topic(topic)
            .filter(
                (F.col("bucket") == bucket)
                & (F.col("seq") >= offset)
                & (F.col("seq") < offset + delivered)
            )
            .orderBy("seq")
        )
        return batch, offset + delivered

    def commit(self, consumer_id: str, topic: str, bucket: int, offset: int) -> None:
        """Atomically persist a consumer offset (tmp-file + rename — the
        single-writer-per-consumer model the reference also assumes)."""
        offsets = self.committed_offsets(consumer_id, topic)
        offsets[bucket] = offset
        self._write_json(
            self._offsets_path(consumer_id, topic),
            {str(k): v for k, v in offsets.items()},
        )

    # -- util --------------------------------------------------------------
    @staticmethod
    def _write_json(path: str, obj: dict) -> None:
        d = os.path.dirname(path)
        fd, tmp = tempfile.mkstemp(dir=d)
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f)
        os.replace(tmp, path)
