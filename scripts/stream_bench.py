#!/usr/bin/env python
"""Streaming-source throughput sweep: rows/s through the
`ripple_topic` Structured-Streaming source as a function of the
per-bucket admission cap (``batch_size``, the maxOffsetsPerTrigger
analog).

The cap trades end-to-end latency against per-micro-batch overhead
(offset-log commit + driver-side prefetch + Arrow hand-off are paid
once per batch): small caps approximate per-record streaming, large
caps approach the batch reader's throughput. This sweep measures that
amortization curve so the cap is a measured choice, not folklore —
the SCALE.md streaming table records the curve.

Usage:
  python scripts/stream_bench.py [sf_dir] [batch_size ...]
  # defaults: /root/testdata/sf0.1, caps 500 2500 10000 50000

Each drain replays the FULL produced topic from a fresh checkpoint
through the noop sink (same methodology as bench.py's
pubsub_stream_drain row, which pins cap=2500).
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

        def drain(cap: int, tag: str) -> tuple[float, int]:
            t0 = time.time()
            q = (
                spark.readStream.format("ripple_topic")
                .option("root", tmp)
                .option("topic", "sb")
                .option("batch_size", cap)
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

        drain(caps[0], "warm")  # session/python-worker spin-up, untimed
        print(f"rows={n} buckets=8 sf_dir={sf_dir}")
        print("| batch_size/bucket | micro-batches | drain s | rows/s |")
        print("|---|---|---|---|")
        for cap in caps:
            best, nb = None, 0
            for r in range(2):  # best-of-2, fresh checkpoint each
                dt, batches = drain(cap, f"{cap}_{r}")
                if best is None or dt < best:
                    best, nb = dt, batches
            print(f"| {cap} | {nb} | {best:.2f} | {n / best:,.0f} |")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
