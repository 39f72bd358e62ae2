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


def _crafted_con(sf_dir: str, tables: tuple[str, ...]):
    import duckdb

    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
            f"'{sf_dir}/{t}.parquet/*.parquet')"
        )
    return con


def test_split_leakage_parity_when_a_source_has_no_eval_docs(spark, tmp_path):
    """The n_leaked left-join coalesce and the eval-side filter must
    agree between engines when a source's docs land entirely in the
    train split (no eval rows at all) and when an eval doc leaks."""
    from ripple_server_spark.plans.registry import SPECS
    from tests.oracle_check import compare_query

    # choose doc_ids by their actual split bucket so the scenario is
    # guaranteed, not probabilistic
    import hashlib

    def bucket(doc_id: int) -> int:
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16) % 10

    train_ids = [i for i in range(200) if bucket(i) < 8]
    eval_ids = [i for i in range(200) if bucket(i) >= 8]
    rows = []
    # srcA: train-only docs
    for i in train_ids[:5]:
        rows.append((i, f"unique text {i}", "en", "srcA", 20))
    # srcB: one eval doc duplicating a train doc (leak), one clean
    rows.append((train_ids[5], "dup text", "en", "srcB", 10))
    rows.append((eval_ids[0], "dup text", "en", "srcB", 10))
    rows.append((eval_ids[1], "clean text", "en", "srcB", 12))
    sf_dir = str(tmp_path / "leak_edge")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    con = _crafted_con(sf_dir, ("documents",))
    spec = SPECS["q_split_leakage"]
    diff = compare_query(spark, con, "q_split_leakage", spec.builder, spec.oracle, sf_dir)
    assert diff is None, diff
    got = {r["source"]: r for r in spec.builder(spark, sf_dir).collect()}
    assert got["srcA"]["n_eval"] == 0 and got["srcA"]["n_leaked"] == 0
    assert got["srcB"]["n_leaked"] == 1


def test_recurrence_queries_parity_on_degenerate_series(spark, tmp_path):
    """Single-event users (base-case-only token bucket) and a type with
    exactly two hours of data (minimal Holt trend) must agree between
    the pandas kernels and the recursive-CTE oracles."""
    import datetime as dt

    from ripple_server_spark.plans.registry import SPECS
    from tests.oracle_check import compare_query

    base = dt.datetime(2024, 3, 1)
    rows = [
        # user 1: one event ever (recursion base case only)
        (0, base, 1, "solo", 1.0, "{}"),
        # user 2: burst of 4 in one second (bucket denies past capacity)
        *[(10 + i, base, 2, "burst", 1.0, "{}") for i in range(4)],
        # 'burst' type also spans exactly two hours for minimal Holt
        (20, base + dt.timedelta(hours=1), 2, "burst", 1.0, "{}"),
    ]
    sf_dir = str(tmp_path / "degen_series")
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")

    con = _crafted_con(sf_dir, ("events",))
    for name in ("q_rate_limit_replay", "q_holt_trend"):
        spec = SPECS[name]
        diff = compare_query(spark, con, name, spec.builder, spec.oracle, sf_dir)
        assert diff is None, (name, diff)
    rl = {
        r["user_id"]: (r["n_allowed"], r["n_deferred"])
        for r in SPECS["q_rate_limit_replay"].builder(spark, sf_dir).collect()
    }
    assert rl[1] == (1, 0)          # base case: first event always admitted
    # burst of 4 at t0: 2 admitted (capacity), 2 deferred; the event an
    # hour later earns exactly one refilled token and is admitted
    assert rl[2] == (3, 2)


def test_striped_rewrites_parity_on_degenerate_inputs(spark, tmp_path):
    """The round-4 striped rewrites on the smallest legal inputs: a
    single purchase row (percent_rank's n=1 division guard), one
    click->purchase conversion (1-row median), and a two-user stream
    (single-stripe rank, 1-row survival spectrum). Each runs builder
    AND oracle through the driver-mirror comparator."""
    import datetime as dt

    from ripple_server_spark.plans.registry import SPECS
    from tests.oracle_check import compare_query

    base = dt.datetime(2024, 5, 1)
    rows = [
        # user 1: click then purchase (one conversion); ends censored
        (0, base, 1, "click", 5.0, "{}"),
        (1, base + dt.timedelta(minutes=30), 1, "purchase", 42.0, "{}"),
        # user 2: single error event (churn at duration 0)
        (2, base + dt.timedelta(days=1), 2, "error", 1.0, "{}"),
    ]
    sf_dir = str(tmp_path / "degen_striped")
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")

    con = _crafted_con(sf_dir, ("events",))
    for name in (
        "q_window_distribution",   # exactly one purchase: n=1 guard
        "q_gini_concentration",
        "q_lorenz_deciles",
        "q_km_survival",
        "q_time_to_convert",       # exactly one conversion row
    ):
        spec = SPECS[name]
        diff = compare_query(spark, con, name, spec.builder, spec.oracle, sf_dir)
        assert diff is None, (name, diff)
    wd = SPECS["q_window_distribution"].builder(spark, sf_dir).collect()
    assert len(wd) == 1 and wd[0]["pr"] == 0.0 and wd[0]["cd"] == 1.0


def test_text_quality_queries_on_pii_and_short_docs(spark, tmp_path):
    """Regression for two live crashes found in review: (a) a document
    that actually contains an email/URL used to throw REGEX_GROUP_INDEX
    in q_text_pii_flags (regexp_extract_all defaulted to group 1 on
    zero-group patterns); (b) a 1-token document used to throw
    INVALID_ARRAY_INDEX in q_text_repetition (sequence(1, 0) steps DOWN
    to [1, 0]). Both must now agree with the oracle on crafted docs
    that exercise exactly those rows."""
    from ripple_server_spark.plans.registry import SPECS
    from tests.oracle_check import compare_query

    rows = [
        (1, "contact bob@x.com or see https://example.com/page now", "en", "srcA", 52),
        (2, "word", "en", "srcA", 4),  # single token: no 2-grams
        (3, "", "en", "srcA", 0),      # empty text: split -> ['']
        (4, "spam spam spam spam", "en", "srcB", 19),
    ]
    sf_dir = str(tmp_path / "pii_edge")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    con = _crafted_con(sf_dir, ("documents",))
    for name in ("q_text_pii_flags", "q_text_repetition"):
        spec = SPECS[name]
        diff = compare_query(spark, con, name, spec.builder, spec.oracle, sf_dir)
        assert diff is None, (name, diff)
    pii = {r["doc_id"]: r for r in SPECS["q_text_pii_flags"].builder(spark, sf_dir).collect()}
    assert pii[1]["n_emails"] == 1 and pii[1]["n_urls"] == 1 and pii[1]["flagged"]
    assert not pii[2]["flagged"]
    rep = {r["doc_id"]: r for r in SPECS["q_text_repetition"].builder(spark, sf_dir).collect()}
    assert set(rep) == {1, 4}  # 1-token and empty docs emit no row
    assert rep[4]["top_gram_frac"] == 1.0


def test_zscore_parity_on_degenerate_user_groups(spark, tmp_path):
    """A single-event user (stddev_samp NULL) and a constant-value user
    (stddev 0) must produce NULL zscores in both engines — the pandas
    kernel used to emit NaN, which the comparator treats as a distinct
    value from NULL. Latent on the shipped fixtures (every user has
    >= 49 events), so pinned here on crafted events."""
    import datetime as dt

    from ripple_server_spark.plans.registry import SPECS
    from tests.oracle_check import compare_query

    base = dt.datetime(2024, 6, 1)
    rows = [
        (0, base, 1, "click", 5.0, "{}"),                              # 1-event user
        (1, base, 2, "click", 7.0, "{}"),                              # constant user
        (2, base + dt.timedelta(hours=1), 2, "view", 7.0, "{}"),
        (3, base, 3, "click", 1.0, "{}"),                              # normal user
        (4, base + dt.timedelta(hours=1), 3, "view", 3.0, "{}"),
        (5, base + dt.timedelta(hours=2), 3, "error", 8.0, "{}"),
    ]
    sf_dir = str(tmp_path / "zscore_edge")
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")

    con = _crafted_con(sf_dir, ("events",))
    spec = SPECS["q_user_zscore_pandas"]
    diff = compare_query(spark, con, "q_user_zscore_pandas", spec.builder, spec.oracle, sf_dir)
    assert diff is None, diff
    got = {r["event_id"]: r["zscore"] for r in spec.builder(spark, sf_dir).collect()}
    assert got[0] is None and got[1] is None and got[2] is None
    assert got[3] is not None
