#!/usr/bin/env python
"""Run every TPC-H-shaped query (tag 'tpch', all 22 shapes) at
$SPARK_GRAFT_SF_DIR (default sf0.1) and print one JSON line with
per-query seconds (best-of-2 after an untimed warmup, noop sink — same
methodology as bench.py)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ripple_server_spark.config import default_sf_dir  # noqa: E402
from ripple_server_spark.plans.registry import SPECS  # noqa: E402
from ripple_server_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = default_sf_dir()
    spark = get_spark(app_name="tpch-bench")
    specs = {
        n: s
        for n, s in sorted(SPECS.items())
        if n.startswith("q_tpch_") or "tpch" in s.tags
    }

    def run(s):
        s.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()

    for s in specs.values():
        run(s)  # warmup
    timings: dict[str, float] = {}
    for _ in range(2):
        for name, s in specs.items():
            spark.catalog.clearCache()
            t0 = time.time()
            run(s)
            dt = round(time.time() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)

    print(
        json.dumps(
            {
                "metric": "tpch_shapes_total_runtime",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "n_queries": len(timings),
                "queries": timings,
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
