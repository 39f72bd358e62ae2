#!/usr/bin/env python
"""Headline benchmark: runs the bench-flagged queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized through the noop sink (executes the
whole plan on executors, no driver-side result transfer), so timings
measure scan+compute+shuffle, not collect bandwidth.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ripple_server_spark.config import default_cpus, default_sf_dir  # noqa: E402
from ripple_server_spark.plans.registry import bench_queries  # noqa: E402
from ripple_server_spark.session import get_spark  # noqa: E402


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = default_sf_dir()
    spark = get_spark(app_name="ripple-spark-bench")

    # The registry owns the bench-set definition; sorted for a stable
    # per-query timing order run to run.
    builders = dict(sorted(bench_queries().items()))

    # Untimed warmup at the smallest SF: compiles the same codegen'd
    # stage shapes and spins up the Arrow python workers, so timed runs
    # measure steady-state throughput, not JIT warmup.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for builder in builders.values():
            try:
                materialize(builder(spark, warm_dir))
            except Exception:
                pass

    # Three timed rounds per query. Round 1 ("driver") pays codegen
    # compilation + AQE replanning at the new data scale; rounds 2-3
    # ("idle1"/"idle2") are back-to-back steady-state repeats — the
    # idle-run adjudication protocol (VERDICT r09 item 8) published
    # per-query in the JSON so drift triage is mechanical instead of
    # living in BASELINE.md prose. Reported headline value = min (the
    # steady-state throughput, same semantics as the old best-of-2).
    timings: dict[str, float] = {}
    runs: dict[str, dict[str, float]] = {}
    run_tags = ("driver", "idle1", "idle2")
    for tag in run_tags:
        for name, builder in builders.items():
            # Drop persisted intermediates before EVERY query: queries
            # sharing pipeline fragments (e.g. the minhash shingle/band
            # tables) would otherwise time warm-cache reruns of each
            # other, making per-query numbers incomparable.
            spark.catalog.clearCache()
            t0 = time.time()
            materialize(builder(spark, sf_dir))
            dt = round(time.time() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)
            runs.setdefault(name, {})[tag] = dt

    # Domain benchmark: the reference is a message queue, so measure the
    # produce path (bucket routing + contiguous seq assignment +
    # partitioned durable append) and the consume path (offset-pushdown
    # ranged batch read) over the full events table.
    import shutil
    import tempfile

    from pyspark.sql import functions as F  # noqa: PLC0415

    from ripple_server_spark.catalog import load_table  # noqa: PLC0415
    from ripple_server_spark.sources.topics import TopicStore  # noqa: PLC0415

    tmp = tempfile.mkdtemp(prefix="ripple_bench_")
    try:
        store = TopicStore(spark, tmp)
        ev = load_table(spark, sf_dir, "events")
        # Same methodology as the queries above: one untimed warmup run
        # (JIT/codegen/committer spin-up), then best-of-2 timed runs —
        # each into a fresh topic so every timed produce starts empty.
        n = 0
        n_buckets = 8  # single constant: topic layout AND consume sweep
        for i, tag in enumerate(("warm",) + run_tags):
            topic = f"bench_{tag}"
            store.create_topic(topic, n_buckets=n_buckets)
            t0 = time.time()
            n = store.produce(ev, topic)
            dt = round(time.time() - t0, 3)
            if i > 0:
                prev = timings.get("pubsub_produce", dt)
                timings["pubsub_produce"] = min(prev, dt)
                runs.setdefault("pubsub_produce", {})[tag] = dt
            store.register_consumer("bench_c", topic)
            t0 = time.time()
            for b in range(n_buckets):
                store.consume("bench_c", topic, bucket=b, count=5000)[0].count()
            dt = round(time.time() - t0, 3)
            if i > 0:
                prev = timings.get("pubsub_consume_8x5k", dt)
                timings["pubsub_consume_8x5k"] = min(prev, dt)
                runs.setdefault("pubsub_consume_8x5k", {})[tag] = dt
        timings["pubsub_rows"] = float(n)

        # Streaming surface: drain the produced topic (the full events
        # table; 100k rows at sf0.1) through the `ripple_topic`
        # Structured-Streaming source at a fixed per-bucket admission
        # cap (batch_size=2500/bucket, the maxOffsetsPerTrigger analog
        # -> 5 micro-batches of <=8x2500 rows at sf0.1) into the noop
        # sink. This times the ACTUAL streaming
        # path — driver-side manifest-pinned prefetch, per-batch
        # offset-log commit, Arrow hand-off — which the batch
        # produce/consume rows above never touch. Same methodology:
        # one untimed warmup drain (source registration + python
        # worker spin-up), then best-of-2, each from a fresh
        # checkpoint so every timed drain replays the full log.
        from ripple_server_spark.sources.datasource import (  # noqa: PLC0415
            RippleTopicDataSource,
        )

        spark.dataSource.register(RippleTopicDataSource)
        drain_topic = f"bench_{run_tags[-1]}"
        for i, tag in enumerate(("warm",) + run_tags):
            t0 = time.time()
            sq = (
                spark.readStream.format("ripple_topic")
                .option("root", tmp)
                .option("topic", drain_topic)
                .option("batch_size", 2500)
                .load()
                .writeStream.format("noop")
                .option("checkpointLocation", os.path.join(tmp, f"_ckpt_{tag}"))
                .start()
            )
            sq.processAllAvailable()
            dt = round(time.time() - t0, 3)
            sq.stop()
            if i > 0:
                prev = timings.get("pubsub_stream_drain", dt)
                timings["pubsub_stream_drain"] = min(prev, dt)
                runs.setdefault("pubsub_stream_drain", {})[tag] = dt
        # rows/s companion (derived, excluded from the total like
        # pubsub_rows — it is a rate, not a duration)
        timings["pubsub_stream_rows_per_s"] = round(
            n / timings["pubsub_stream_drain"], 1
        )
        # Control-plane tier (reader_tier=simple, driver-side prefetch):
        # kept regression-gated separately — the row above times the
        # DEFAULT executor-parallel tier since round 7.
        for i, tag in enumerate(("warm",) + run_tags):
            t0 = time.time()
            sq = (
                spark.readStream.format("ripple_topic")
                .option("root", tmp)
                .option("topic", drain_topic)
                .option("batch_size", 2500)
                .option("reader_tier", "simple")
                .load()
                .writeStream.format("noop")
                .option("checkpointLocation", os.path.join(tmp, f"_ckpt_s_{tag}"))
                .start()
            )
            sq.processAllAvailable()
            dt = round(time.time() - t0, 3)
            sq.stop()
            if i > 0:
                prev = timings.get("pubsub_stream_drain_simple", dt)
                timings["pubsub_stream_drain_simple"] = min(prev, dt)
                runs.setdefault("pubsub_stream_drain_simple", {})[tag] = dt
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    sf = None
    tail = os.path.basename(sf_dir.rstrip("/"))
    if tail.startswith("sf"):
        try:
            sf = float(tail[2:])
        except ValueError:
            sf = None

    total = round(
        sum(
            v
            for k, v in timings.items()
            if k not in ("pubsub_rows", "pubsub_stream_rows_per_s")
        ),
        3,
    )
    metric = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # Scaling audit (VERDICT r12 item 2): record the core count the
        # session ACTUALLY ran with, so the driver's low-core comparison
        # is verifiable from the artifact itself instead of trusted.
        "cpus": default_cpus(),
        "default_parallelism": spark.sparkContext.defaultParallelism,
    }
    # Full document (metric + per-run adjudication) persisted to a
    # repo-committed artifact. The driver records only a fixed-size TAIL
    # of stdout; round 10's single line with the inline adjudication
    # dict outgrew that window and truncated the headline+7 query rows
    # out of BENCH_r10.json (VERDICT r10 item 1). The round number is
    # 1 + the highest recorded BENCH_r*.json — the driver writes the
    # current round's file only AFTER this script runs.
    import re  # noqa: PLC0415

    here = os.path.dirname(os.path.abspath(__file__))
    recorded = [
        int(m.group(1))
        for f in os.listdir(here)
        if (m := re.fullmatch(r"BENCH_r(\d+)\.json", f))
    ]
    local = os.path.join(here, f"BENCH_LOCAL_r{max(recorded, default=0) + 1:02d}.json")
    try:
        with open(local, "w") as fh:
            json.dump({**metric, "adjudication": runs}, fh, indent=1)
            fh.write("\n")
    except OSError:
        pass  # artifact is best-effort; the printed lines still carry the data
    # Adjudication on its OWN line, printed FIRST: the driver's tail
    # capture keeps the END of stdout, so the short headline metric
    # line below always survives intact even if this one is clipped.
    # (Key name deliberately avoids the "metric" token load_bench
    # greps for.)
    print(json.dumps({"per_run_sec": runs}))
    print(json.dumps(metric))


if __name__ == "__main__":
    main()
