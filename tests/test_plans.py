"""Physical-plan shape assertions: correctness tests prove results;
these prove the plans stay scale-worthy — filters reach the parquet
scan, projections prune columns, small dims broadcast, top-k never
global-sorts, per-key rank-1 never windows.
"""

from __future__ import annotations

import pytest

from ripple_server_spark.plans.registry import SPECS
from tests.conftest import SF_SMOKE


def plan(df, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def build(spark, name):
    return SPECS[name].builder(spark, SF_SMOKE)


def test_filter_is_pushed_to_parquet_scan(spark):
    p = plan(build(spark, "q_filter_topic_bucket"))
    assert "PushedFilters:" in p
    assert "IsNotNull(event_type)" in p or "EqualTo(event_type,purchase)" in p


def test_projection_prunes_scan_columns(spark):
    p = plan(build(spark, "q_filter_topic_bucket"))
    # query touches event_id/user_id/value/event_type only; props must
    # not be read from the 6-column events table
    read_schema = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert read_schema and "props" not in read_schema[0]


def test_dimension_joins_broadcast(spark):
    p = plan(build(spark, "q_enrich_broadcast_join"))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_semi_anti_join_shapes(spark):
    p = plan(build(spark, "q_join_semi_anti"))
    assert "LeftSemi" in p
    assert "LeftAnti" in p


def test_topk_avoids_global_sort(spark):
    p = plan(build(spark, "q_consume_offset_range"))
    assert "TakeOrderedAndProject" in p
    p2 = plan(build(spark, "q_topk_hot_users"))
    assert "TakeOrderedAndProject" in p2


def test_ranged_read_pushes_offset_predicate(spark):
    p = plan(build(spark, "q_consume_offset_range"))
    assert "GreaterThanOrEqual(event_id,100)" in p


def test_latest_per_user_uses_aggregate_not_window(spark):
    """Rank-1-per-key as max_by: partial-aggregatable, no sort, no
    Window operator (skew-immune at 100 TB)."""
    p = plan(build(spark, "q_latest_event_per_user"))
    assert "Window" not in p
    assert "HashAggregate" in p or "SortAggregate" in p


def test_tpch_q1_partial_aggregates(spark):
    p = plan(build(spark, "q_tpch_q1"))
    # partial + final aggregation pair around a single shuffle
    assert p.count("HashAggregate") >= 2
    assert "Exchange" in p


def test_scan_query_has_no_shuffle(spark):
    p = plan(build(spark, "q_scan_events"))
    assert "Exchange" not in p


def test_union_has_no_shuffle(spark):
    p = plan(build(spark, "q_union_topics"))
    assert "Exchange" not in p


@pytest.mark.parametrize(
    "name", ["q_tpch_q1", "q_agg_multi", "q_fact_join", "q_filter_compound"]
)
def test_hot_relational_paths_stay_in_codegen(spark, name):
    """No Python eval (BatchEvalPython/ArrowEvalPython) in relational
    query plans — UDFs are reserved for vector/media kernels."""
    p = plan(build(spark, name))
    assert "EvalPython" not in p


def test_asof_join_single_exchange_no_join_node(spark):
    """The union-window as-of join must not plan any join operator and
    must shuffle exactly once (the window partitioning)."""
    p = plan(build(spark, "q_asof_join"), "simple")
    assert "Join" not in p  # no SortMergeJoin/BroadcastHashJoin/NestedLoop
    assert p.count("Exchange hashpartitioning") == 1


def test_range_join_broadcasts_band_table(spark):
    p = plan(build(spark, "q_range_join_bands"))
    assert "BroadcastNestedLoopJoin" in p
    assert "SortMergeJoin" not in p


def test_pivot_single_aggregation_pass(spark):
    """Explicit pivot values ⇒ no extra distinct job / second shuffle:
    one partial+final aggregate pair over one exchange."""
    p = plan(build(spark, "q_pivot_type_day"), "simple")
    assert p.count("Exchange hashpartitioning") == 1


def test_grouping_sets_uses_expand_not_union(spark):
    p = plan(build(spark, "q_grouping_sets"), "simple")
    assert "Expand" in p
    assert p.count("Exchange hashpartitioning") == 1


def test_minhash_bands_single_wide_aggregate(spark):
    """Band hashes come from ONE groupBy(doc_id) (wide min columns) —
    no per-seed explode, no second aggregation for banding."""
    from ripple_server_spark.catalog import load_table
    from ripple_server_spark.operators.dedup import (
        minhash_band_hashes,
        shingle_sets,
    )

    # persisted shingle fragments from earlier oracle runs would be
    # plan-matched into this query and change the physical plan
    spark.catalog.clearCache()
    df = minhash_band_hashes(shingle_sets(load_table(spark, SF_SMOKE, "documents")))
    p = plan(df, "simple")
    assert p.count("HashAggregate") == 2  # partial + final of the one groupBy
    assert p.count("Exchange hashpartitioning") == 1
    assert "Generate explode" in p  # the band fan-out only


def test_topn_per_group_uses_window_group_limit(spark):
    p = plan(build(spark, "q_topn_per_group"))
    assert "WindowGroupLimit" in p


def test_tpch_q10_takeordered_and_broadcast_nation(spark):
    p = plan(build(spark, "q_tpch_q10_returns"))
    assert "TakeOrderedAndProject" in p
    # the top-k must fully replace the sort: no Sort node anywhere in the
    # plan (joins are broadcast, so nothing else legitimately sorts)
    assert "Sort " not in p


def test_tpch_q4_exists_is_semi_join(spark):
    p = plan(build(spark, "q_tpch_q4_priority"))
    assert "LeftSemi" in p


def test_ann_lsh_broadcasts_query_side(spark):
    """The multi-probe ANN join must build the exploded QUERY side
    (queries x 9 probes — always tiny) and stream the corpus: BuildLeft,
    and the broadcast mode keyed on the probe column. Broadcasting the
    corpus would work at test scale and break at any real one."""
    p = plan(build(spark, "q_ann_lsh_topk"))
    assert "BroadcastHashJoin" in p
    assert "BuildLeft" in p and "BuildRight" not in p
    assert "CartesianProduct" not in p


def test_edit_distance_blocking_is_hash_join(spark):
    """Prefix blocking must plan as an equi hash/SMJ join, never a
    cartesian/nested-loop product."""
    p = plan(build(spark, "q_dedup_edit_distance"))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_substring_dedup_gram_keyed_no_cartesian(spark):
    """Variable-length substring dedup generates candidates from the
    duplicated-gram index: the candidate join keys on the gram hash
    (gh), never doc pairs; coverage collapses inside the per-doc
    aggregate (ObjectHashAggregate over collect_set) rather than a
    separate DISTINCT exchange; and no cartesian anywhere."""
    p = plan(build(spark, "q_substring_dedup"))
    assert "CartesianProduct" not in p
    assert "gh" in p  # the gram-hash join key is in the plan
    # one dedup exchange only: the collect_set aggregate owns coverage
    # dedup, so no standalone HashAggregate-distinct over (doc_id, p)
    assert "ObjectHashAggregate" in p


def test_tpch_q13_outer_join_keeps_condition_inside(spark):
    """The priority filter must live in the join (outer semantics), not
    be pushed below as a WHERE on orders output rows -> plan shows the
    join condition with the <> predicate."""
    p = plan(build(spark, "q_tpch_q13_custdist"))
    assert "LeftOuter" in p


def test_full_outer_join_pre_aggregated_inputs(spark):
    """Both sides must aggregate BELOW the full outer join (days flow
    through the join, not events)."""
    p = plan(build(spark, "q_join_full_outer"))
    full_outer_pos = p.find("FullOuter")
    assert full_outer_pos != -1
    assert "HashAggregate" in p


def test_bm25_topk_takeordered_and_broadcast_stats(spark):
    p = plan(build(spark, "q_text_bm25_topk"))
    assert "TakeOrderedAndProject" in p
    # corpus stats (N, avgdl, per-term df) come from ONE aggregate and
    # attach as a broadcast — the scalar row via a 1-row nested-loop
    # broadcast, never a shuffled join of the corpus side
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_journey_similarity_no_cartesian(spark):
    p = plan(build(spark, "q_journey_similarity"))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_dense_grid_cross_join_is_dimension_sized(spark):
    """The cross join must sit above two aggregated (distinct) inputs,
    not the raw fact table."""
    p = plan(build(spark, "q_dense_grid_zerofill"))
    assert "HashAggregate" in p


def test_ngram_jaccard_has_no_allpairs_block_join(spark):
    """Candidate generation must come from the shared-shingle inverted
    index: every equi-join that touches doc pairs keys on `shingle`;
    no join keys on the blocking column alone (which would be an
    all-pairs join within the block)."""
    p = plan(build(spark, "q_dedup_ngram_jaccard"))
    assert "CartesianProduct" not in p
    for ln in p.splitlines():
        if "SortMergeJoin" in ln or "ShuffledHashJoin" in ln:
            keys = ln.split("Join")[1]
            if "source" in keys:
                assert "shingle" in keys, f"block-only join key: {ln}"


def test_pipeline_projection_ops_have_no_shuffle_or_python(spark):
    """Chunking and quantization are pure projections: no Exchange, no
    Python eval — one pass over the corpus at any scale."""
    for name in ("q_text_chunking", "q_embedding_quantize"):
        p = plan(build(spark, name))
        assert "Exchange" not in p, f"{name} shuffles"
        assert "EvalPython" not in p, f"{name} leaves codegen"


def test_span_dedup_no_global_sort(spark):
    """Span reassembly must sort within each doc's collected spans only
    (array_sort), never globally, and the per-doc/per-source rollups
    are ordinary partial aggregates."""
    p = plan(build(spark, "q_span_dedup"))
    assert "Sort [" not in p.replace("SortAggregate", "")
    assert "Window" not in p


def test_unigram_logprob_vocab_join_is_mapside(spark):
    """The vocab scoring join and the 1-row total join must broadcast —
    the corpus token stream shuffles only at the per-doc aggregate."""
    p = plan(build(spark, "q_unigram_logprob"))
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p
    assert "SortMergeJoin" not in p


def test_quota_cap_window_partitions_by_source(spark):
    """The quota window must be partitioned (per source), never a
    global single-partition window."""
    p = plan(build(spark, "q_source_quota_cap"))
    assert "Window" in p
    # the exchange feeding the window must hash-partition on source
    assert "hashpartitioning(source#" in p
    # a global window would show an Exchange SinglePartition feeding it
    assert "SinglePartition" not in p


def test_corpus_pipeline_e2e_shape(spark):
    """End-to-end assembly: dedup keep-join stays a semi join, the
    quota window is source-partitioned, no global sort."""
    p = plan(build(spark, "q_corpus_pipeline_e2e"))
    assert "LeftSemi" in p
    assert "SinglePartition" not in p


def test_weighted_sample_uses_window_group_limit(spark):
    """The per-source top-k rank filter must be pushed map-side
    (WindowGroupLimit) — no per-source full sort materialization."""
    p = plan(build(spark, "q_weighted_sample"))
    assert "WindowGroupLimit" in p
    assert "SinglePartition" not in p


def test_cms_topk_is_take_ordered(spark):
    """The heavy-hitter cut must be TakeOrderedAndProject over the
    key-level estimates, never a single-partition window; the sketch
    fan-out happens AFTER the per-key partial aggregate (events join
    only the groupBy, no d-way event multiplication)."""
    p = plan(build(spark, "q_heavy_hitters_cms"))
    assert "TakeOrderedAndProject" in p
    assert "Window" not in p


def test_striped_rank_never_single_partitions_base_data(spark):
    """q_robust_stats / q_equiheight_histogram rank via the striped
    two-pass: every window over base-table rows must be partitioned by
    the stripe; at most the stripe-COUNT table (<=256 rows/group) may
    pass through a SinglePartition cumulative window."""
    for name in ("q_robust_stats", "q_equiheight_histogram"):
        p = plan(build(spark, name))
        assert "windowspecdefinition(_stripe" in p or "windowspecdefinition(event_type" in p, name
        # row_number over raw rows always carries the stripe column
        assert "row_number" in p, name
        for line in p.splitlines():
            if "Window [row_number()" in line:
                assert "_stripe" in line, f"{name}: unstriped data window: {line}"


def test_containment_candidates_are_inverted_index(spark):
    """Containment shares the ngram-Jaccard candidate generator: the
    pair join must key on (shingle, source) — no all-pairs block join,
    no cartesian — and the final cut is TakeOrderedAndProject."""
    p = plan(build(spark, "q_dedup_containment"))
    assert "CartesianProduct" not in p
    assert "TakeOrderedAndProject" in p


def test_bigram_pairing_is_shuffle_free_zip(spark):
    """Bigram extraction must be an array zip in the scan stage: no
    Window over token positions, no self-join of the token stream on
    (doc_id, pos); the 1-row vocab total must broadcast."""
    for name in ("q_bigram_logprob", "q_text_collocations"):
        p = plan(build(spark, name))
        assert "Window" not in p, name
        assert "BroadcastNestedLoop" in p or "BroadcastHashJoin" in p, name


def test_cdc_latest_wins_uses_window_group_limit(spark):
    """The latest-wins rank-1 filter must be pushed map-side
    (WindowGroupLimit): Spark keeps only each key's top row per
    partition before the shuffle."""
    p = plan(build(spark, "q_cdc_apply"))
    assert "WindowGroupLimit" in p


def test_pagerank_rank_table_joins_broadcast(spark):
    """Each PageRank iteration joins the node-sized rank table against
    edges — rank side must broadcast (no SortMergeJoin of ranks against
    the event log; the log is touched once for edge extraction)."""
    p = plan(build(spark, "q_pagerank_types"))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_basket_pair_join_keys_on_order(spark):
    """Market-basket pair generation must join on the basket key
    (equi-join on l_orderkey) — no cartesian/broadcast-nested-loop pair
    blowup — and the lift cut is TakeOrderedAndProject."""
    p = plan(build(spark, "q_market_basket_lift"))
    assert "CartesianProduct" not in p
    assert "TakeOrderedAndProject" in p


def test_psi_and_ttest_are_single_pass_aggregates(spark):
    """Drift/test statistics must come from conditional aggregation
    passes — no Window over event rows."""
    for name in ("q_psi_drift", "q_welch_ttest", "q_benford_audit"):
        p = plan(build(spark, name))
        assert "Window" not in p, name


def test_correlation_self_join_is_on_hourly_series(spark):
    """The correlation pair join must run on the aggregated hourly
    series (HashAggregate below the join), never raw events — and no
    cartesian."""
    p = plan(build(spark, "q_type_correlation"))
    assert "CartesianProduct" not in p
    assert "HashAggregate" in p


def _nodes(p: str) -> list[dict]:
    """Parse a formatted plan into (operator, input-line, args-line)
    triples from the per-node detail section."""
    import re

    lines = p.splitlines()
    out = []
    for i, ln in enumerate(lines):
        m = re.match(r"\((\d+)\) (\w+)", ln.strip())
        if not m:
            continue
        node = {"op": m.group(2), "input": "", "args": ""}
        for j in range(i + 1, min(i + 5, len(lines))):
            s = lines[j].strip()
            if s.startswith("Input"):
                node["input"] = s
            elif s.startswith("Arguments"):
                node["args"] = s
        out.append(node)
    return out


# Row-level fixture columns that must never pass through an unstriped
# window or a broadcast (corpus-sized payloads).
_ROW_LEVEL = ("text#", "props#", "embedding#")


def test_striped_analytics_never_single_partition_data(spark):
    """The round-4 de-weakened queries: every window over row-level /
    key-level data must be partitioned by the value stripe; windows
    without a stripe may only run over tiny aggregate tables (stripe
    counts, histograms, decile rows). Guards the striped two-pass
    rewrites of the former global-window plans."""
    for name in (
        "q_vocab_growth",
        "q_token_budget_select",
        "q_window_distribution",
        "q_gini_concentration",
        "q_lorenz_deciles",
        "q_km_survival",
        "q_time_to_convert",
    ):
        import re

        p = plan(build(spark, name))
        assert "windowspecdefinition(_stripe" in p or "_stripe#" in p, name
        for node in _nodes(p):
            if node["op"] != "Window":
                continue
            # A windowspec whose FIRST argument carries an ordering
            # direction has an EMPTY partition spec (global window);
            # partitioned windows list partition columns first.
            first_args = re.findall(r"windowspecdefinition\(([^,]+),", node["args"])
            unpartitioned = any(" ASC" in a or " DESC" in a for a in first_args)
            if unpartitioned:
                for col in _ROW_LEVEL + ("event_id#", "user_id#", "doc_id#", "ts#"):
                    assert col not in node["input"], (
                        f"{name}: global window over row-level data: {node}"
                    )


def test_striped_analytics_broadcasts_stay_small(spark):
    """No corpus payload column may feed a BroadcastExchange in the
    de-weakened plans; q_vocab_growth additionally must not broadcast
    any doc-id-keyed map (the r03 corpus-sized doc->slice broadcast)."""
    for name in (
        "q_vocab_growth",
        "q_token_budget_select",
        "q_window_distribution",
        "q_gini_concentration",
        "q_lorenz_deciles",
        "q_km_survival",
        "q_time_to_convert",
    ):
        p = plan(build(spark, name))
        for node in _nodes(p):
            if node["op"] == "BroadcastExchange":
                for col in _ROW_LEVEL:
                    assert col not in node["input"], f"{name}: broadcast of {col}"
                if name == "q_vocab_growth":
                    assert "doc_id#" not in node["input"], (
                        f"{name}: doc-level broadcast: {node}"
                    )


def test_zipf_rank_cut_is_take_ordered(spark):
    """The Zipf top-1000 cut must be TakeOrderedAndProject over the
    vocab aggregate; the rank window may only run on the 1000-row
    survivor set (its input is the limit output, not raw vocab)."""
    p = plan(build(spark, "q_zipf_slope"))
    assert "TakeOrderedAndProject" in p


def test_governance_joins_stay_keyed(spark):
    """Split leakage / ngram coverage must test membership with a
    LEFT SEMI hash join on the fingerprint/gram key; the containment
    matrix must come from the inverted-index equi-join — never a
    cartesian."""
    for name in ("q_split_leakage", "q_ngram_coverage"):
        p = plan(build(spark, name))
        assert "LeftSemi" in p, name
        assert "CartesianProduct" not in p, name
    p = plan(build(spark, "q_source_containment"))
    assert "CartesianProduct" not in p
    assert "HashAggregate" in p


def test_bot_score_topk_is_take_ordered(spark):
    p = plan(build(spark, "q_bot_score"))
    assert "TakeOrderedAndProject" in p


def test_recurrence_kernels_group_on_aggregates(spark):
    """Holt smoothing runs its pandas recurrence over the per-(type,
    hour) AGGREGATE (HashAggregate below the FlatMapGroupsInPandas),
    never raw events; the rate-limit replay groups raw rows by key in
    one exchange."""
    p = plan(build(spark, "q_holt_trend"))
    assert "FlatMapGroupsInPandas" in p
    assert "HashAggregate" in p
    p2 = plan(build(spark, "q_rate_limit_replay"), "simple")
    assert "FlatMapGroupsInPandas" in p2
    assert p2.count("Exchange hashpartitioning") == 1


def test_registry_wide_no_cartesian_product(spark):
    """Sweeping invariant over EVERY registered query: no plan may
    contain a CartesianProduct — intentional small-side cross joins
    plan as BroadcastNestedLoopJoin over aggregate/1-row inputs, so a
    CartesianProduct can only mean an unkeyed pair blowup slipped in.
    Nor may any plan carry a [X > unboundedPreceding, unboundedFollowing]
    window frame: Spark evaluates that shape (UnboundedFollowingWindow-
    FunctionFrame) by re-aggregating the frame remainder for EVERY
    output row — O(rows²) per partition, hours of CPU once a partition
    reaches ~10⁶ rows (a decades-long hourly grid did exactly that).
    Whole-partition frames (unboundedPreceding → unboundedFollowing)
    are exempt: Spark computes those once per partition. The equivalent
    DESC-ordered running frame is O(rows); q_ts_resample_linear is the
    pattern. Also doubles as a builds-clean smoke for every registered builder."""
    import re

    frame_re = re.compile(
        r"specifiedwindowframe\(\w+Frame, ([^,]+), unboundedfollowing\$\(\)\)"
    )
    bad = []
    rowwise = []
    quadratic = []
    for name, spec in sorted(SPECS.items()):
        p = plan(spec.builder(spark, SF_SMOKE), "simple")
        if "CartesianProduct" in p:
            bad.append(name)
        if "BatchEvalPython" in p:
            rowwise.append(name)
        if any(
            lo != "unboundedpreceding$()" for lo in frame_re.findall(p)
        ):
            quadratic.append(name)
    assert not bad, f"cartesian products in: {bad}"
    assert not quadratic, f"O(n^2) unbounded-following frames in: {quadratic}"
    # Row-at-a-time Python is banned everywhere except the one query
    # whose PURPOSE is the Python-UDTF surface (table functions have no
    # Arrow form); everything else must be Arrow-vectorized or JVM.
    assert rowwise == ["q_udtf_tokenize"], f"row-wise python in: {rowwise}"


def test_url_dedup_canonicalization_stays_in_codegen(spark):
    """canonical_url is a chained JVM regexp_replace expression: the
    canonicalization must appear inside the scan projection (no
    BatchEvalPython / ArrowEvalPython stage), and the dedup aggregates
    partially (map-side combine before the canonical-key exchange)."""
    p = plan(build(spark, "q_url_dedup"))
    assert "regexp_replace" in p
    assert "EvalPython" not in p  # no Python UDF in the hot path
    assert "partial" in p.lower() or "HashAggregate" in p
    assert "CartesianProduct" not in p


def test_image_dhash_candidates_are_band_equijoins(spark):
    """dHash near-dup candidates must come from (band, value)
    equi-joins (the pigeonhole LSH), never a cartesian or nested-loop
    pair enumeration; verification is bit_count over four ints."""
    p = plan(build(spark, "q_image_dedup_dhash"))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "bit_count" in p


def test_video_dhash_candidates_are_frame_band_equijoins(spark):
    """Video dHash near-dup candidates must come from
    (frame_idx, band, value) equi-joins (frame-wise pigeonhole LSH),
    never a cartesian or nested-loop pair enumeration; verification is
    bit_count over eight ints per pair. The plan must also show the
    per-frame verify keyed on (doc, frame_idx, band) — the shape that
    scales with the catalog, not pixel data."""
    p = plan(build(spark, "q_video_dedup_dhash"))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "bit_count" in p
    assert "frame_idx" in p


def test_audio_dedup_candidates_are_window_energy_equijoins(spark):
    """Audio fingerprint near-dup candidates must come from
    (window, integer-energy) equi-joins, never a cartesian or
    nested-loop pair enumeration."""
    p = plan(build(spark, "q_audio_dedup_fingerprint"))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "energy_sq" in p
