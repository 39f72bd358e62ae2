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


def test_driver_budget_covers_every_unverified_query():
    """The driver checks at most 50 queries per round, in queries()
    dict order. The registry sorts never-verified + recheck names
    first, so the invariant that keeps every queued name inside the
    budget is |unverified ∪ recheck| <= 50 — a silently-oversized
    queue would push names out of the round's CORRECTNESS evidence
    without any local failure."""
    from ripple_server_spark.plans.registry import (
        _ORACLE_CHANGED_RECHECK,
        _driver_verified_names,
        _ordered_names,
    )

    stale = _ORACLE_CHANGED_RECHECK - set(SPECS)
    assert not stale, f"recheck names not in the registry: {stale}"
    unverified = set(SPECS) - (_driver_verified_names() - _ORACLE_CHANGED_RECHECK)
    assert len(unverified) <= 50, (
        f"{len(unverified)} unverified/recheck queries exceed the "
        f"driver's 50-query budget; trim _ORACLE_CHANGED_RECHECK or "
        f"defer new queries"
    )
    order = _ordered_names()
    assert set(order[: len(unverified)]) == unverified
