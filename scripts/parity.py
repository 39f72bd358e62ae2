#!/usr/bin/env python
"""Run the full oracle-parity sweep at an arbitrary scale factor.

Usage: python scripts/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ripple_server_spark.plans.registry import SPECS  # noqa: E402
from ripple_server_spark.session import get_spark  # noqa: E402
from tests.oracle_check import compare_query, duckdb_conn  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    unknown = only - set(SPECS)
    if unknown:
        # a typo'd name silently matching nothing would make a gate run
        # that checked zero queries read as a full pass
        print(f"ERROR: unknown query names: {sorted(unknown)}")
        return 2
    spark = get_spark(app_name="parity")
    con = duckdb_conn(sf_dir)
    failures = 0
    n_run = 0
    for name, spec in sorted(SPECS.items()):
        if only and name not in only:
            continue
        n_run += 1
        t0 = time.time()
        if spec.oracle is None:
            try:
                n = spec.builder(spark, sf_dir).count()
            except Exception as e:  # noqa: BLE001
                failures += 1
                print(f"FAIL {name} (rows-only) error: {e}")
                continue
            if n == 0:
                # rows-only specs have no oracle; an empty result would
                # otherwise verify nothing while reporting green
                failures += 1
                print(f"FAIL {name} (rows-only) returned 0 rows")
            else:
                print(f"PASS {name} (rows-only, {n} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            diff = compare_query(spark, con, name, spec.builder, spec.oracle, sf_dir)
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"FAIL {name} error: {type(e).__name__}: {str(e)[:300]}")
            continue
        if diff is None:
            print(f"PASS {name} ({time.time()-t0:.1f}s)")
        else:
            failures += 1
            print(f"FAIL {name} {diff.kind}: {diff.detail[:300]}")
    print(f"\n{'OK' if failures == 0 else 'FAILURES'}: {n_run} queries run, {failures} failed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
