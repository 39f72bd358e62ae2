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


def test_km_survival_terminal_step_parity_on_crafted_data(spark, tmp_path):
    """End-to-end ln(0) guard (ADVICE r03): on data where EVERYONE
    still at risk churns at the max duration, the DuckDB oracle must
    not raise 'cannot take logarithm of zero' and BOTH engines must
    agree the terminal survival is exactly 0. Runs the registered
    builder and oracle through the same comparator the driver
    mirrors, on a crafted events.parquet."""
    import datetime as dt

    from ripple_server_spark.plans.registry import SPECS
    from tests.oracle_check import compare_query

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # users 1,2: lifetime 5 days, final event 'error'  -> terminal step
    # users 3,4: lifetime 2 days, one churns, one is censored
    for uid, days, last_type in ((1, 5, "error"), (2, 5, "error"),
                                 (3, 2, "error"), (4, 2, "view")):
        for d in range(days + 1):
            typ = last_type if d == days else "view"
            rows.append((eid, base + dt.timedelta(days=d), uid, typ, 1.0, "{}"))
            eid += 1
    sf_dir = str(tmp_path / "km_edge")
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")

    import duckdb

    con = duckdb.connect()  # only events exists in the crafted dir
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{sf_dir}/events.parquet/*.parquet')"
    )
    spec = SPECS["q_km_survival"]
    diff = compare_query(spark, con, "q_km_survival", spec.builder, spec.oracle, sf_dir)
    assert diff is None, diff
    surv = {
        r["duration_days"]: r["survival"]
        for r in spec.builder(spark, sf_dir).collect()
    }
    assert surv[5] == 0.0  # terminal step: everyone at risk churned
    assert 0.0 < surv[2] < 1.0
