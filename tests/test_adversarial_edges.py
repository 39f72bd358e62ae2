"""Regression pins for the adversarial-fixture parity sweep findings
(scripts/adversarial_parity.py, round 4).

Each test reconstructs the MINIMAL crafted regime that made a builder
and its DuckDB oracle diverge, and runs both through the exact
driver-mirror comparator. The full 5-scenario × registry sweep stays a
script (too slow for the unit suite); these pin the individual bug
classes it caught so they cannot regress silently.
"""

from __future__ import annotations

import datetime as dt

import numpy as np

from ripple_server_spark.plans.registry import SPECS
from tests.oracle_check import compare_query

BASE = dt.datetime(2024, 1, 1)
EV_DDL = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def _con(sf_dir: str, tables: tuple[str, ...]):
    import duckdb

    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
            f"'{sf_dir}/{t}.parquet/*.parquet')"
        )
    return con


def _write_events(spark, sf_dir: str, rows) -> None:
    spark.createDataFrame(rows, EV_DDL).write.mode("overwrite").parquet(
        f"{sf_dir}/events.parquet"
    )


def test_two_sample_tests_with_one_empty_half(spark, tmp_path):
    """A type whose events all fall in ONE split half has n0*n1 = 0:
    the z / ECDF denominators are zero, where DuckDB's double division
    yields NULL but a bare Spark `/` under ANSI threw DIVIDE_BY_ZERO
    (sweep: ties/degenerate/extremes/single_row scenarios). Both
    engines must now emit the row with a NULL statistic."""
    rows = []
    eid = 0
    # 'click': all events BEFORE the 2024-01-16 split -> n1 = 0
    for i in range(6):
        rows.append((eid, BASE + dt.timedelta(hours=i), i % 3, "click", 10.0 + i, "{}"))
        eid += 1
    # 'view': both halves populated -> real statistic
    for i in range(8):
        ts = BASE + dt.timedelta(days=20 if i % 2 else 2, hours=i)
        rows.append((eid, ts, i % 3, "view", 5.0 * i, "{}"))
        eid += 1
    sf_dir = str(tmp_path / "half_edge")
    _write_events(spark, sf_dir, rows)
    con = _con(sf_dir, ("events",))
    for name in ("q_ks_test", "q_mann_whitney_u"):
        spec = SPECS[name]
        diff = compare_query(spark, con, name, spec.builder, spec.oracle, sf_dir)
        assert diff is None, f"{name}: {diff}"
    got = {r["event_type"]: r for r in SPECS["q_mann_whitney_u"].builder(spark, sf_dir).collect()}
    assert got["click"]["z_approx"] is None  # undefined, not a crash
    assert got["view"]["z_approx"] is not None


def test_moment_queries_on_constant_series(spark, tmp_path):
    """Constant series break the moment denominators two ways (sweep:
    ties/extremes): (a) zero variance made Spark's corr/regr_slope and
    the burst/ACF z divisions throw under ANSI where DuckDB yields
    NULL; (b) on a constant value that is NOT binary-representable
    (327.53), DuckDB's sum-of-powers m2 keeps a ~1e-23 cancellation
    residue and skew/kurt explode into garbage while Spark's Welford
    m2 is exactly 0 — both engines now gate the shape moments on
    round(var, 6) > 0."""
    rows = []
    eid = 0
    for h in range(6):  # 2 counts/hour for every type: sd(counts) = 0
        for t, val in (("click", 327.53), ("view", 42.0)):
            for _ in range(2):
                rows.append((eid, BASE + dt.timedelta(hours=h), eid % 3, t, val, "{}"))
                eid += 1
    sf_dir = str(tmp_path / "const_edge")
    _write_events(spark, sf_dir, rows)
    con = _con(sf_dir, ("events",))
    for name in ("q_stats_moments", "q_burst_detection", "q_hourly_autocorrelation"):
        spec = SPECS[name]
        diff = compare_query(spark, con, name, spec.builder, spec.oracle, sf_dir)
        assert diff is None, f"{name}: {diff}"
    got = {r["event_type"]: r for r in SPECS["q_stats_moments"].builder(spark, sf_dir).collect()}
    assert got["click"]["skew"] is None and got["click"]["kurt"] is None
    assert got["click"]["var"] == 0.0


def test_resample_rounding_survives_extreme_magnitudes(spark, tmp_path):
    """The 4-dp half-up idiom floor(x*1e4 + 0.5) saturates Spark's
    floor-to-LONG at |x| > ~9.2e14 (DuckDB's floor stays a double), so
    an interpolated 1e15 came back as int64max/1e4 (sweep: extremes).
    Both engines now skip the round above |x| >= 1e12, where 4 dp is
    below double ulp anyway."""
    rows = [
        (0, BASE, 1, "click", 1.0e15, "{}"),
        # hour 1 empty -> interpolated
        (1, BASE + dt.timedelta(hours=2), 1, "click", 1.0e15, "{}"),
    ]
    sf_dir = str(tmp_path / "resample_edge")
    _write_events(spark, sf_dir, rows)
    con = _con(sf_dir, ("events",))
    spec = SPECS["q_ts_resample_linear"]
    diff = compare_query(spark, con, "q_ts_resample_linear", spec.builder, spec.oracle, sf_dir)
    assert diff is None, diff
    vals = [r["value"] for r in spec.builder(spark, sf_dir).collect()]
    assert all(v == 1.0e15 for v in vals)  # no int64 saturation artifact


def test_cusum_decimal_score_is_engine_exact(spark, tmp_path):
    """CUSUM_k = P_k - k*mu amplifies a 1-ulp cross-engine difference
    in mu by up to N steps; on skewed data that flipped the 3-dp
    output across a rounding midpoint (sweep: skew). The score is now
    N*P_k - k*S in exact decimal arithmetic — this pins the decimal
    plumbing (widths, casts, window sums) on a long series of
    binary-INEXACT values (x.1) where the old float path drifts."""
    rows = []
    for h in range(72):  # 3 days of hours, mean shifts at h=48
        v = 10.1 if h < 48 else 30.1
        rows.append((h, BASE + dt.timedelta(hours=h), h % 5, "click", v, "{}"))
    sf_dir = str(tmp_path / "cusum_edge")
    _write_events(spark, sf_dir, rows)
    con = _con(sf_dir, ("events",))
    spec = SPECS["q_cusum_changepoint"]
    diff = compare_query(spark, con, "q_cusum_changepoint", spec.builder, spec.oracle, sf_dir)
    assert diff is None, diff
    row = spec.builder(spark, sf_dir).collect()[0]
    # the level shift at hour 48 is the |CUSUM| argmax by construction
    assert row["changepoint_hour"] == BASE + dt.timedelta(hours=47) or (
        row["changepoint_hour"] == BASE + dt.timedelta(hours=48)
    )
    assert row["max_abs_cusum"] > 0


def test_ann_audit_holds_on_tiny_and_tied_corpora(spark, tmp_path):
    """The ANN recall audits hard-coded 3 expected rows per query and
    id-joined recall, which broke on (a) corpora with < k+1 vectors
    (NULL aggregates vs the oracle's count*3) and (b) all-identical
    vectors, where any tied pick is a true neighbor but id-joins
    undercount (sweep: single_row/empty/ties). The contract is now
    corpus-aware (min(k, corpus-1)) with recall-with-ties."""
    rng = np.random.default_rng(7)

    def write_emb(dirname, vecs):
        sf_dir = str(tmp_path / dirname)
        spark.createDataFrame(
            [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
            "vec_id bigint, embedding array<float>, label int",
        ).write.mode("overwrite").parquet(f"{sf_dir}/embeddings.parquet")
        return sf_dir

    # (a) 2-vector corpus: expected returns = min(3, 1) = 1 per query
    tiny = write_emb("emb_tiny", [rng.normal(0, 0.1, 64) for _ in range(2)])
    # (b) 25 identical vectors: every sim ties at 1.0
    one = rng.normal(0, 0.1, 64)
    tied = write_emb("emb_tied", [one] * 25)
    for sf_dir in (tiny, tied):
        con = _con(sf_dir, ("embeddings",))
        for name in ("q_ann_ivf_topk", "q_ann_pq_topk"):
            spec = SPECS[name]
            diff = compare_query(spark, con, name, spec.builder, spec.oracle, sf_dir)
            assert diff is None, f"{name} on {sf_dir}: {diff}"
        row = SPECS["q_ann_ivf_topk"].builder(spark, sf_dir).collect()[0]
        assert row["recall_ok"] is True
    # tie-exact kernel pre-prune: the Arrow/pandas brute-force kernel
    # must agree with the SQL oracle's id-ordered ties on the tied corpus
    spec = SPECS["q_similarity_topk_pandas"]
    con = _con(tied, ("embeddings",))
    diff = compare_query(spark, con, "q_similarity_topk_pandas", spec.builder, spec.oracle, tied)
    assert diff is None, diff


def test_topic_empty_batch_still_commits_schema(spark, tmp_path):
    """An empty produce appends nothing, but its schema is still a
    declaration (sweep: empty/single_row broke the topic queries with
    UNRESOLVED_COLUMN): establishing or evolving the message schema on
    an empty batch is a metadata-only manifest commit (Delta-style),
    and read_topic materializes manifest-recorded columns that exist in
    no data file as typed nulls. Known-schema empty batches remain
    no-ops (no version burn — pinned by test_topics)."""
    from pyspark.sql import functions as F

    from ripple_server_spark.catalog import load_table
    from ripple_server_spark.sources.topics import TopicStore
    from tests.conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id", "ts")
    st = TopicStore(spark, str(tmp_path / "schema_topics"))
    st.create_topic("t", n_buckets=2)

    # empty first batch ESTABLISHES the schema via a metadata commit
    st.produce(ev.limit(0), "t")
    snap = st.read_topic("t")
    assert {"event_id", "user_id", "ts", "bucket"} <= set(snap.columns)
    assert snap.count() == 0

    # data lands; an EMPTY evolved batch still records the new column
    st.produce(ev.limit(10), "t")
    st.produce(ev.limit(0).withColumn("tag", F.lit("v2")), "t")
    snap = st.read_topic("t")
    assert "tag" in snap.columns
    assert snap.count() == 10
    assert snap.filter(F.col("tag").isNull()).count() == 10  # typed nulls

    # replaying the same empty schema-known batch burns no version
    v_before = st.latest_manifest("t")[0]
    st.produce(ev.limit(0).withColumn("tag", F.lit("v2")), "t")
    assert st.latest_manifest("t")[0] == v_before


def test_json_extraction_nulls_non_integer_payloads(spark, tmp_path):
    """A float at the extracted JSON path crashed the Spark scan under
    ANSI (CAST_INVALID_INPUT), and the naive TRY_CAST fix diverges:
    DuckDB TRY_CAST('1.5' AS BIGINT) ROUNDS to 2 where Spark returns
    NULL (sweep: domains). Both engines now run the same int-literal
    regex guard over TRY_CAST — int fields extract, float/array/object/
    non-numeric-string/overflow all yield NULL, and one dirty payload
    can never abort the scan."""
    pool = [
        ("{}", None),
        ('{"k": null}', None),
        ('{"k": 0}', 0),
        ('{"k": "7"}', 7),
        ('{"k": 1.5}', None),  # the crasher / rounder
        ('{"k": -12}', -12),
        ('{"k": [1, 2]}', None),
        ('{"k": {"a": 1}}', None),
        ('{"k": "x"}', None),
        ('{"k": 99999999999999999999999}', None),  # > int64
    ]
    rows = [
        (i, BASE + dt.timedelta(minutes=i), i % 3, "click", 1.0, props)
        for i, (props, _) in enumerate(pool)
    ]
    sf_dir = str(tmp_path / "json_edge")
    _write_events(spark, sf_dir, rows)
    con = _con(sf_dir, ("events",))
    spec = SPECS["q_json_props_extract"]
    diff = compare_query(
        spark, con, "q_json_props_extract", spec.builder, spec.oracle, sf_dir
    )
    assert diff is None, diff
    got = {r["event_id"]: r["k"] for r in spec.builder(spark, sf_dir).collect()}
    assert got == {i: want for i, (_, want) in enumerate(pool)}


def test_moving_avg_dense_frame_midpoint_rounds_engine_exact(spark, tmp_path):
    """A dense range frame (burst hour) averages many 2-dp values and
    the mean lands on exact 6-dp midpoints, where Spark's round()
    (HALF_UP on the decimal string) and DuckDB's (nearbyint, half-even)
    disagree (sweep: bimodal). The mean is now an order-independent
    DECIMAL(16,2) window sum divided in double with the shared
    floor(x*1e6 + 0.5) half-up. This pins the decimal plumbing on an
    exact rational midpoint: 32 co-frame rows summing to 0.01 give
    mean 0.01/32 = 0.0003125 — a true 6-dp midpoint, which must round
    UP to 0.000313 on BOTH engines."""
    rows = [(0, BASE, 1, "click", 0.01, "{}")] + [
        (i, BASE + dt.timedelta(seconds=10 * i), 1, "click", 0.0, "{}")
        for i in range(1, 32)
    ]
    sf_dir = str(tmp_path / "ma_edge")
    _write_events(spark, sf_dir, rows)
    con = _con(sf_dir, ("events",))
    spec = SPECS["q_moving_avg_time"]
    diff = compare_query(
        spark, con, "q_moving_avg_time", spec.builder, spec.oracle, sf_dir
    )
    assert diff is None, diff
    last = {r["event_id"]: r["ma_1h"] for r in spec.builder(spark, sf_dir).collect()}
    assert last[31] == 0.000313  # half-up at the exact midpoint


def test_seq_math_is_exact_past_double_precision(spark, tmp_path):
    """Spark's `/` is DOUBLE division: event_id / 8 silently corrupts
    ids past 2^53 (off-by-one seq values, phantom/shifted gap reports)
    where DuckDB's integer `//` stays exact (sweep: snowflake). The
    builder now uses integer `div`. Ids here straddle the double-exact
    bound with a real 3-slot hole; both engines must report the same
    exact gap."""
    base = (1 << 53) + 1
    rows = []
    eid = base
    for i in range(12):
        if i == 6:
            eid += 8 * 3  # a 3-seq hole in bucket space
        rows.append((eid, BASE + dt.timedelta(minutes=i), 1, "click", 1.0, "{}"))
        eid += 8  # same bucket, consecutive seq
    sf_dir = str(tmp_path / "seq_edge")
    _write_events(spark, sf_dir, rows)
    con = _con(sf_dir, ("events",))
    spec = SPECS["q_seq_gap_detection"]
    diff = compare_query(
        spark, con, "q_seq_gap_detection", spec.builder, spec.oracle, sf_dir
    )
    assert diff is None, diff
    got = spec.builder(spark, sf_dir).collect()
    assert len(got) == 1 and got[0]["n_missing"] == 3
    # the reported hole is exact int64 arithmetic, not a rounded double:
    # the last pre-hole event is i=5 (seq = base//8 + 5), so the gap
    # starts one past it
    assert got[0]["gap_start"] == base // 8 + 6


def test_correlation_is_stable_at_snowflake_id_magnitudes(spark, tmp_path):
    """corr(value, user_id) at ~2^53-magnitude ids cancels
    catastrophically in the co-moment sums and the engines diverged in
    the 4th decimal (sweep: snowflake). user_id is now centered on a
    per-type min anchor before the double cast; the centered offsets
    are small exact doubles, so a perfectly linear value~user_id
    relation must come back corr = 1.0 exactly-after-rounding on BOTH
    engines."""
    base = (1 << 53) + 7
    rows = [
        (i, BASE + dt.timedelta(minutes=i), base + i, "click", 1.0 + 0.25 * i, "{}")
        for i in range(40)
    ]
    sf_dir = str(tmp_path / "corr_edge")
    _write_events(spark, sf_dir, rows)
    con = _con(sf_dir, ("events",))
    spec = SPECS["q_stats_moments"]
    diff = compare_query(
        spark, con, "q_stats_moments", spec.builder, spec.oracle, sf_dir
    )
    assert diff is None, diff
    row = spec.builder(spark, sf_dir).collect()[0]
    assert row["corr_uid"] == 1.0


def test_content_fingerprint_is_engine_portable_on_unicode_case(spark, tmp_path):
    """Full Unicode lower() is engine-divergent: DuckDB (utf8proc)
    folds 'İ' to 'i' and final 'Σ' to 'σ' where the JVM produces 'i̇'
    and 'ς' — so md5(lower(trim(text))) fingerprints disagreed across
    engines on legal Unicode text (sweep: domains). Fingerprints now
    use the ASCII-only translate() fold (functions/text.content_fold),
    byte-identical everywhere; ASCII case variants still collapse to
    one exact-dup cluster, Unicode case variants deliberately stay
    distinct (conservative exact dedup)."""
    docs = [
        (0, "İstanbul ΣΙΣΥΦΟΣ Mixed CASE", "tr", "src1"),
        (1, "istanbul σισυφος mixed case", "tr", "src1"),  # unicode-case variant
        (2, "Hello WORLD again", "en", "src2"),
        (3, "hello world AGAIN", "en", "src2"),  # ASCII-case duplicate of 2
    ]
    sf_dir = str(tmp_path / "fold_edge")
    spark.createDataFrame(
        [(d, t, l, s, len(t)) for d, t, l, s in docs],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    con = _con(sf_dir, ("documents",))
    spec = SPECS["q_doc_fingerprint"]
    diff = compare_query(
        spark, con, "q_doc_fingerprint", spec.builder, spec.oracle, sf_dir
    )
    assert diff is None, diff
    fp = {r["doc_id"]: r["content_fp"] for r in spec.builder(spark, sf_dir).collect()}
    assert fp[2] == fp[3]  # ASCII case variants collapse
    assert fp[0] != fp[1]  # unicode case variants stay distinct (by contract)


def test_similarity_rank_key_is_engine_exact_at_midpoints(spark, tmp_path):
    """VERDICT r08 item 2: the similarity rank keys must be the shared
    arithmetic half-up key floor(sim*1e6 + 0.5) on BOTH engines, not
    round(sim, 6) — Spark rounds HALF_UP on the decimal string and
    DuckDB nearbyint-style, so a sim landing on an EXACT float 6-dp
    midpoint (0.0003125*1e6 == 312.5 exactly) keys differently and
    flips which neighbor wins rank 1.

    Crafted flip: neighbor 10 at the midpoint (key 313 half-up, 312
    half-even) vs neighbor 20 just above (key 313 both ways). Under the
    shared half-up key both engines tie them at 313 and the id
    tie-break picks 10; a round()-keyed engine would rank 20 first.
    Pins both central contracts (_nearest_above, _global_topk) against
    a DuckDB ranking over the identical doubles."""
    import math

    import duckdb

    from ripple_server_spark.operators.dedup import _nearest_above
    from ripple_server_spark.operators.similarity import _global_topk

    mid, above = 0.0003125, 0.000313
    assert (mid * 1e6) % 1.0 == 0.5  # a true float midpoint
    assert math.floor(mid * 1e6 + 0.5) == math.floor(above * 1e6 + 0.5) == 313

    rows = [
        (1, 10, mid),
        (1, 20, above),
        (2, 30, above),  # control pair: no midpoint, higher sim wins
        (2, 40, mid - 1e-6),
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE pairs (a BIGINT, b BIGINT, sim DOUBLE)")
    con.executemany("INSERT INTO pairs VALUES (?, ?, ?)", rows)
    oracle = con.execute(
        """
        SELECT a, b FROM (
            SELECT a, b, row_number() OVER (
                PARTITION BY a
                ORDER BY floor(sim * 1e6 + 0.5) DESC, b) AS rn
            FROM pairs
        ) WHERE rn = 1 ORDER BY a
        """
    ).fetchall()
    assert oracle == [(1, 10), (2, 30)], oracle  # the half-up contract

    pairs_nn = spark.createDataFrame(
        rows, "vec_a bigint, vec_b bigint, sim double"
    )
    nn = {
        r["vec_a"]: r["nearest_id"]
        for r in _nearest_above(pairs_nn, min_sim=0.0).collect()
    }
    assert nn == dict(oracle), nn

    pairs_tk = spark.createDataFrame(
        rows, "q_id bigint, neighbor_id bigint, sim double"
    )
    tk = {
        r["q_id"]: r["neighbor_id"] for r in _global_topk(pairs_tk, k=1).collect()
    }
    assert tk == dict(oracle), tk


def test_similarity_queries_agree_on_all_tied_corpus(spark, tmp_path):
    """The three rotation-named similarity queries (VERDICT r08 item 2:
    q_similarity_topk, q_similarity_topk_pandas, q_ann_lsh_topk) must
    match their oracles on an all-identical-vector corpus — every sim
    ties at exactly 1.0, so ANY rank-key or tie-break drift between the
    Spark builder and the DuckDB oracle surfaces as a value mismatch."""
    rng = np.random.default_rng(11)
    one = rng.normal(0, 0.1, 64)
    sf_dir = str(tmp_path / "emb_all_tied")
    spark.createDataFrame(
        [(i, [float(x) for x in one], 0) for i in range(30)],
        "vec_id bigint, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(f"{sf_dir}/embeddings.parquet")
    con = _con(sf_dir, ("embeddings",))
    for name in ("q_similarity_topk", "q_similarity_topk_pandas", "q_ann_lsh_topk"):
        spec = SPECS[name]
        diff = compare_query(spark, con, name, spec.builder, spec.oracle, sf_dir)
        assert diff is None, f"{name}: {diff}"
