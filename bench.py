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

from ripple_server_spark.config import default_sf_dir  # noqa: E402
from ripple_server_spark.plans.registry import SPECS  # noqa: E402
from ripple_server_spark.session import get_spark  # noqa: E402


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = default_sf_dir()
    spark = get_spark(app_name="ripple-spark-bench")

    bench_specs = {n: s for n, s in sorted(SPECS.items()) if s.bench}

    # Untimed warmup at the smallest SF: compiles the same codegen'd
    # stage shapes and spins up the Arrow python workers, so timed runs
    # measure steady-state throughput, not JIT warmup.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for spec in bench_specs.values():
            try:
                materialize(spec.builder(spark, warm_dir))
            except Exception:
                pass

    # Best-of-2 per query: the first execution of a plan at a new data
    # scale pays codegen compilation + AQE replanning (1-10 s of fixed
    # overhead unrelated to throughput); the second run measures steady
    # state. Reported value = min.
    timings: dict[str, float] = {}
    for _round in range(2):
        # Drop persisted intermediates from the previous round: plan-
        # matched cache hits would otherwise time warm-cache reruns.
        spark.catalog.clearCache()
        for name, spec in bench_specs.items():
            t0 = time.time()
            materialize(spec.builder(spark, sf_dir))
            dt = round(time.time() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)

    sf = None
    tail = os.path.basename(sf_dir.rstrip("/"))
    if tail.startswith("sf"):
        try:
            sf = float(tail[2:])
        except ValueError:
            sf = None

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
