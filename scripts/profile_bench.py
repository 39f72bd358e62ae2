#!/usr/bin/env python
"""Optimization-round profiling harness (guide §1): for each bench
query, materialize through the noop sink and record wall time plus the
number of Spark jobs/stages/tasks the materialization launched (via the
status tracker), and dump `.explain("formatted")` to plans/<tag>/.

Usage: python scripts/profile_bench.py <tag> [query ...]
  tag      subdirectory of plans/ for the explain dumps (e.g. r12_before)
  query    optional subset; default = all bench queries
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ripple_server_spark.config import default_sf_dir  # noqa: E402
from ripple_server_spark.plans.registry import bench_queries  # noqa: E402
from ripple_server_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r12_profile"
    only = set(sys.argv[2:])
    sf_dir = default_sf_dir()
    spark = get_spark(app_name="ripple-spark-profile")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    builders = dict(sorted(bench_queries().items()))
    if only:
        builders = {k: v for k, v in builders.items() if k in only}

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    results = []
    for name, builder in builders.items():
        spark.catalog.clearCache()
        sc.setJobDescription(f"profile:{name}")
        # warm (untimed) run at the same SF so timings are steady-state
        df = builder(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        # plan dump from a fresh build
        df = builder(spark, sf_dir)
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as fh:
            fh.write(spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        # timed run with job accounting (builder included: compound
        # queries do real work — produce/refresh — inside the builder)
        spark.catalog.clearCache()
        jobs_before = set(tracker.getJobIdsForGroup(None) or [])
        t0 = time.time()
        df2 = builder(spark, sf_dir)
        t_build = time.time() - t0
        df2.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        jobs_after = set(tracker.getJobIdsForGroup(None) or [])
        n_jobs = len(jobs_after - jobs_before)
        results.append((name, dt, t_build, n_jobs))
        print(f"{name:32s} {dt:7.3f}s (build {t_build:6.3f}s) jobs={n_jobs}")

    print("\n== sorted by time ==")
    for name, dt, t_build, n_jobs in sorted(results, key=lambda r: -r[1]):
        print(f"{name:32s} {dt:7.3f}s (build {t_build:6.3f}s) jobs={n_jobs}")


if __name__ == "__main__":
    main()
