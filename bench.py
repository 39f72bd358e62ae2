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
    # Warm the JVM/codegen paths once with a trivial action.
    spark.range(1).collect()

    bench_specs = {n: s for n, s in sorted(SPECS.items()) if s.bench}
    timings: dict[str, float] = {}
    for name, spec in bench_specs.items():
        t0 = time.time()
        materialize(spec.builder(spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)

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
