"""Guard against vacuously-correct queries: a query whose oracle
returns ZERO rows at the driver's correctness SF (sf0.01) passes the
hash comparison trivially (empty == empty) and verifies nothing. Every
oracled query must produce real rows there.

DuckDB-only (no Spark session) — runs in seconds.
"""

from __future__ import annotations

import os

import pytest

from ripple_server_spark.plans.registry import SPECS
from tests.oracle_check import duckdb_conn

SF_GATE = "/root/testdata/sf0.01"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_GATE), reason="sf0.01 fixtures not present"
)


def test_every_oracle_nonempty_at_gate_sf():
    con = duckdb_conn(SF_GATE)
    try:
        empty = [
            name
            for name, spec in sorted(SPECS.items())
            if spec.oracle is not None
            and len(con.execute(spec.oracle).fetchall()) == 0
        ]
    finally:
        con.close()
    assert not empty, f"vacuously-empty queries at sf0.01: {empty}"
