#!/usr/bin/env python
"""Robustness audits beyond the per-SF parity sweep. Run before any
round handoff:

1. non-vacuous: every oracle returns rows at the gate SF (sf0.01) —
   empty==empty hash matches verify nothing;
2. multi-SF parity: exact oracle parity at sf0.001, sf0.01, sf0.1 —
   catches rounding boundaries / function domains that only appear at
   particular scales;
3. partitioning independence: full parity under 200 shuffle partitions
   with AQE coalescing disabled — catches results that depend on float
   summation order.

Usage: python scripts/audit.py [--fast]   (--fast skips audit 3)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ripple_server_spark.plans.registry import SPECS  # noqa: E402
from ripple_server_spark.session import get_spark  # noqa: E402
from tests.oracle_check import compare_query, duckdb_conn  # noqa: E402

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
GATE = "/root/testdata/sf0.01"


def main() -> int:
    fast = "--fast" in sys.argv
    failures = 0

    con = duckdb_conn(GATE)
    empty = []
    for n, s_ in sorted(SPECS.items()):
        if not s_.oracle:
            continue
        try:
            # count-only: no need to materialize full result sets
            nrows = con.execute(f"SELECT count(*) FROM ({s_.oracle})").fetchone()[0]
        except Exception as e:  # noqa: BLE001 - one bad oracle must not abort audits 2/3
            empty.append((n, f"error: {e!s:.80}"))
            continue
        if nrows == 0:
            empty.append((n, "0 rows"))
    con.close()
    if empty:
        print(f"VACUOUS at {GATE}: {empty}")
        failures += len(empty)
    else:
        print("audit 1 OK: no vacuously-empty oracles at gate SF")

    spark = get_spark(app_name="audit")
    for sf in SFS:
        con = duckdb_conn(sf)
        bad = []
        for name, spec in sorted(SPECS.items()):
            if spec.oracle is None:
                continue
            try:
                d = compare_query(spark, con, name, spec.builder, spec.oracle, sf)
                if d is not None:
                    bad.append((name, d.kind))
            except Exception as e:  # noqa: BLE001
                bad.append((name, f"error: {e!s:.80}"))
        con.close()
        print(f"audit 2 {sf}: {len(bad)} failures {bad if bad else ''}")
        failures += len(bad)

    if not fast:
        spark.conf.set("spark.sql.shuffle.partitions", "200")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        # every builder calls catalog.load_table -> ensure_runtime_conf,
        # which re-applies RUNTIME_CONF; override the dict too or the
        # no-coalesce setting is silently reverted before any query runs
        from ripple_server_spark import session as session_mod  # noqa: PLC0415

        session_mod.RUNTIME_CONF = {
            **session_mod.RUNTIME_CONF,
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
        }
        con = duckdb_conn(GATE)
        bad = []
        for name, spec in sorted(SPECS.items()):
            if spec.oracle is None:
                continue
            try:
                d = compare_query(spark, con, name, spec.builder, spec.oracle, GATE)
                if d is not None:
                    bad.append((name, d.kind))
            except Exception as e:  # noqa: BLE001
                bad.append((name, f"error: {e!s:.80}"))
        con.close()
        print(f"audit 3 (200 parts, no coalesce): {len(bad)} failures {bad if bad else ''}")
        failures += len(bad)

    print("AUDIT", "FAILED" if failures else "OK")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
