"""Strict local mirror of the driver's DuckDB-oracle correctness gate.

Every declared query with an oracle must match exactly at sf0.001
(driver runs sf0.01; run `python scripts/parity.py /root/testdata/sf0.01`
for the full-size check).
"""

from __future__ import annotations

import pytest

from ripple_server_spark.plans.registry import SPECS
from tests.conftest import SF_SMOKE
from tests.oracle_check import compare_query, duckdb_conn

ORACLED = sorted(name for name, s in SPECS.items() if s.oracle is not None)


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF_SMOKE)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, con, name):
    spec = SPECS[name]
    diff = compare_query(spark, con, name, spec.builder, spec.oracle, SF_SMOKE)
    assert diff is None, f"{diff.kind}: {diff.detail}"


def test_rows_only_queries_run(spark):
    for name, spec in SPECS.items():
        if spec.oracle is None:
            df = spec.builder(spark, SF_SMOKE)
            assert df.count() >= 0, name
