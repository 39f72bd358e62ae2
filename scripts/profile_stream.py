#!/usr/bin/env python
"""Per-trigger cost breakdown of the `ripple_topic` streaming drain
(guide §1.4 fixed overheads): replays bench.py's pubsub_stream_drain
methodology (fresh checkpoint, batch_size=2500, noop sink) and prints
each micro-batch's durationMs map from the StreamingQuery progress
events — latestOffset / queryPlanning / addBatch / walCommit /
commitOffsets — so the per-microbatch overhead is attributed instead
of guessed.

Usage: python scripts/profile_stream.py [sf_dir] [tier ...]
  tier defaults: partitioned simple
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ripple_server_spark.catalog import load_table  # noqa: E402
from ripple_server_spark.session import get_spark  # noqa: E402
from ripple_server_spark.sources.datasource import RippleTopicDataSource  # noqa: E402
from ripple_server_spark.sources.topics import TopicStore  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    tiers = args[1:] or ["partitioned", "simple"]

    spark = get_spark(app_name="ripple-stream-profile")
    spark.dataSource.register(RippleTopicDataSource)
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    tmp = tempfile.mkdtemp(prefix="ripple_stream_profile_")
    try:
        store = TopicStore(spark, tmp)
        store.create_topic("sp", n_buckets=8)
        n = store.produce(load_table(spark, sf_dir, "events"), "sp")
        print(f"produced {n} rows")
        for tier in tiers:
            for rep in ("warm", "t1", "t2"):
                jobs_before = set(tracker.getJobIdsForGroup(None) or [])
                t0 = time.time()
                sq = (
                    spark.readStream.format("ripple_topic")
                    .option("root", tmp)
                    .option("topic", "sp")
                    .option("batch_size", 2500)
                    .option("reader_tier", tier)
                    .load()
                    .writeStream.format("noop")
                    .option(
                        "checkpointLocation",
                        os.path.join(tmp, f"_ckpt_{tier}_{rep}"),
                    )
                    .start()
                )
                sq.processAllAvailable()
                dt = time.time() - t0
                prog = [
                    json.loads(p if isinstance(p, str) else p.json)
                    for p in sq.recentProgress
                ]
                sq.stop()
                jobs_after = set(tracker.getJobIdsForGroup(None) or [])
                print(
                    f"\n== tier={tier} rep={rep}: {dt:.3f}s, "
                    f"{len(prog)} progress events, "
                    f"jobs={len(jobs_after - jobs_before)}"
                )
                for p in prog:
                    d = p.get("durationMs", {})
                    rows = p.get("numInputRows", 0)
                    print(
                        f"  batch={p.get('batchId')} rows={rows} "
                        + " ".join(f"{k}={v}" for k, v in sorted(d.items()))
                    )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
