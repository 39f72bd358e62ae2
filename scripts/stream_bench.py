#!/usr/bin/env python
"""Streaming-source throughput sweep: rows/s through the
`ripple_topic` Structured-Streaming source as a function of reader
tier and per-bucket admission cap (``batch_size``, the
maxOffsetsPerTrigger analog).

Tier semantics differ by design (sources/datasource.py):

- ``partitioned`` (default since round 7): a fresh-checkpoint drain is
  ONE executor-parallel catch-up batch — the cap sets the per-task
  chunk width, not the batch count — so the sweep measures task
  granularity: tiny chunks pay per-task Python-worker overhead, huge
  chunks under-parallelize. Steady-state tailing (capped triggers) has
  the same per-batch machinery cost as the simple tier but
  executor-side reads.
- ``simple``: the cap splits the drain into ceil(rows/cap) driver-side
  micro-batches, so the sweep measures the per-micro-batch fixed cost
  (offset-log commit + driver prefetch + Arrow hand-off) amortization
  curve; large caps approach (driver-funneled) batch throughput.

The SCALE.md streaming table records both curves so the tier/cap
choice is measured, not folklore.

Usage:
  python scripts/stream_bench.py [sf_dir] [batch_size ...]
  # defaults: /root/testdata/sf0.1, caps 500 2500 10000 50000

Each drain replays the FULL produced topic from a fresh checkpoint
through the noop sink (same methodology as bench.py's
pubsub_stream_drain rows, which pin cap=2500).
"""

from __future__ import annotations

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
    caps = [int(a) for a in args[1:]] or [500, 2500, 10_000, 50_000]

    spark = get_spark(app_name="ripple-stream-bench")
    spark.dataSource.register(RippleTopicDataSource)
    tmp = tempfile.mkdtemp(prefix="ripple_stream_bench_")
    try:
        store = TopicStore(spark, tmp)
        store.create_topic("sb", n_buckets=8)
        n = store.produce(load_table(spark, sf_dir, "events"), "sb")

        def drain(tier: str, cap: int, tag: str) -> tuple[float, int]:
            t0 = time.time()
            q = (
                spark.readStream.format("ripple_topic")
                .option("root", tmp)
                .option("topic", "sb")
                .option("batch_size", cap)
                .option("reader_tier", tier)
                .load()
                .writeStream.format("noop")
                .option("checkpointLocation", os.path.join(tmp, f"ck_{tag}"))
                .start()
            )
            q.processAllAvailable()
            dt = time.time() - t0
            batches = sum(
                1 for p in q.recentProgress if p["numInputRows"] > 0
            )
            q.stop()
            return dt, batches

        drain("partitioned", caps[0], "warm")  # worker spin-up, untimed
        drain("simple", caps[0], "warm_s")
        print(f"rows={n} buckets=8 sf_dir={sf_dir}")
        print("| tier | batch_size/bucket | micro-batches | drain s | rows/s |")
        print("|---|---|---|---|---|")
        for tier in ("partitioned", "simple"):
            for cap in caps:
                best, nb = None, 0
                for r in range(2):  # best-of-2, fresh checkpoint each
                    dt, batches = drain(tier, cap, f"{tier}_{cap}_{r}")
                    if best is None or dt < best:
                        best, nb = dt, batches
                print(f"| {tier} | {cap} | {nb} | {best:.2f} | {n / best:,.0f} |")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
