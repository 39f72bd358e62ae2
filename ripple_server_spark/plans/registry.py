"""Query registry: name -> (Spark builder, DuckDB oracle SQL).

Cross-engine result contract (so the driver's row-count + schema +
value-hash comparison is exact, not approximate):

- every computed column is aliased identically in both engines;
- integer outputs are always BIGINT (DuckDB ``len()``/``count`` return
  BIGINT; Spark ``size()`` returns INT — builders normalize via
  :func:`norm_types`);
- float outputs are DOUBLE, rounded at the result edge (2–4 dp) because
  parallel summation order differs between engines;
- timestamps are exposed as epoch microseconds (BIGINT) or DATE;
- any top-k / rank uses an explicit unique tie-break column.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

Builder = Callable[[SparkSession, str], DataFrame]

SPECS: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # None => non-SQL-expressible, rows-only check
    bench: bool = False  # part of the headline bench set
    tags: tuple[str, ...] = field(default_factory=tuple)


def norm_types(df: DataFrame) -> DataFrame:
    """Cast narrow ints -> BIGINT and float -> DOUBLE on result edges."""
    cols = []
    for f_ in df.schema.fields:
        if isinstance(f_.dataType, (T.IntegerType, T.ShortType, T.ByteType)):
            cols.append(F.col(f_.name).cast("bigint").alias(f_.name))
        elif isinstance(f_.dataType, T.FloatType):
            cols.append(F.col(f_.name).cast("double").alias(f_.name))
        else:
            cols.append(F.col(f_.name))
    return df.select(*cols)


def query(
    name: str,
    oracle: str | None,
    bench: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[Builder], Builder]:
    """Register a declared query. The builder's result is type-normalized
    so its schema matches the DuckDB oracle's."""

    def deco(fn: Builder) -> Builder:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            return norm_types(fn(spark, sf_dir))

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        SPECS[name] = QuerySpec(name=name, builder=wrapped, oracle=oracle, bench=bench, tags=tags)
        return fn

    return deco


def _green_rounds() -> dict[str, int]:
    """Latest round with a GREEN driver row per query, from the
    CORRECTNESS_r*.json the driver writes each round.

    The driver verifies queries in dict order and may cap how many it
    checks per round (round 1 stopped at 50 of 111).  Ordering the dict
    never-verified-first makes each round's budget cover new queries, so
    the whole registry converges to driver-verified across rounds.

    A ``no_oracle`` row only counts as green while the spec STILL has
    no oracle: a query that has since gained a SQL oracle
    (q_ann_ivf_topk grew a recall-audit oracle after its r02 rows-only
    check) re-sorts to the front so the driver exercises the stronger
    contract.
    """
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    hash_seen: dict[str, int] = {}
    rows_only_seen: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if row.get("hash_match"):
                hash_seen[name] = max(hash_seen.get(name, 0), rnd)
            elif row.get("err") == "no_oracle":
                rows_only_seen[name] = max(rows_only_seen.get(name, 0), rnd)
    out = dict(hash_seen)
    for n, rnd in rows_only_seen.items():
        if n in SPECS and SPECS[n].oracle is None:
            out[n] = max(out.get(n, 0), rnd)
    return out


def _driver_verified_names() -> set[str]:
    """Query names green in ANY prior round (ignores staleness)."""
    return set(_green_rounds())


_PRIORITY_PREFIXES = (
    # LLM-pipeline extension surface first: these are the headline
    # components and had no driver-side correctness row after round 1.
    "q_dedup_",
    "q_similarity_",
    "q_ann_",
    "q_text_",
    "q_multimodal_",
    "q_payload_",
    # Round-3 families. Note tuple position still ranks them after the
    # round-1 prefixes above; the property that matters (and the one
    # this list guarantees) is that every NEW operator family sorts
    # INSIDE the driver's 50-query budget among the never-verified
    # names, so the queries that wait a round are variants of
    # already-verified families (bigram LM, attribution window, KL),
    # never an unverified family.
    "q_cdc_",
    "q_pagerank_",
    "q_heavy_hitters_",
    "q_weighted_",
)


# Queries whose green driver row went STALE: the contract (oracle SQL
# and/or builder semantics) changed after the row was earned, or the
# row predates the current fixture generation. Each entry maps the
# query to the round DURING WHICH it was queued — the name re-sorts
# with the never-verified names until a CORRECTNESS round NEWER than
# that queues-round is green for it, then expires automatically (no
# manual removal; a forgotten removal used to re-burn the whole next
# round's budget on already-green names).
#
# Activation is budget-aware: never-verified names always go first;
# queued names activate oldest-since first only while the combined
# count fits the driver's 50-query budget. Names queued for a FUTURE
# pass (higher since) defer automatically until earlier passes clear.
_DRIVER_BUDGET = 50

_RECHECK_SINCE: dict[str, int] = {
    # (Rounds 5-6 ran three refresh passes — 26 round-4-modified
    # builders + all 42 round-1-era rows + the netpbm-kernel trio — at
    # since=4/5; every entry expired on green r05/r06 rows and was
    # trimmed per VERDICT r06 item 5. The queue below is live-only.)
    #
    # --- queued during round 6 (since=6): the frame-sampling kernel
    # gained a real numpy YUV4MPEG2 backend on its fake=False branch
    # (codecs.py parse_y4m); the fake=True branch the query runs is
    # byte-identical (pinned by determinism + parity tests), but the
    # kernel closure changed, so re-earn the row.
    "q_multimodal_frames": 6,
    # round 6: stripe-width computation factored into a pure helper
    # (pipeline6.stripe_width) so the parallelism-scaling contract is
    # behavior-tested instead of source-grepped (ADVICE r05) —
    # value-identical, but the builder changed.
    "q_vocab_growth": 6,
    # --- round-7 evidence rotation (since=6, VERDICT r06 item 2): the
    # oldest standing rows — 20 last-green r02 and 35 last-green r03 —
    # re-earn current-round evidence while the budget is wide open.
    # Code is UNCHANGED for all of these (pure rotation); since=6 gives
    # exactly one recheck in r07, then a green r07 row (>6) expires the
    # entry. Overflow past the 50-query budget defers automatically.
    # r02 cohort:
    "q_decontaminate": 6,
    "q_event_transitions": 6,
    "q_join_full_outer": 6,
    "q_ohlc_hourly": 6,
    "q_payload_roundtrip": 6,
    "q_profile_columns": 6,
    "q_stratified_sample_hash": 6,
    "q_text_chunking": 6,
    "q_text_sentiment": 6,
    "q_tpch_q12_priority_class": 6,
    "q_tpch_q15_top_supplier": 6,
    "q_tpch_q16_supplier_cnt": 6,
    "q_tpch_q20_excess": 6,
    "q_tpch_q21_waiting": 6,
    "q_tpch_q22_no_orders": 6,
    "q_tpch_q2_mincost": 6,
    "q_tpch_q7_volume": 6,
    "q_tpch_q8_share": 6,
    "q_tpch_q9_profit": 6,
    "q_train_val_test_split": 6,
    # r03 cohort:
    "q_array_embedding_norm": 6,
    "q_bloom_decontaminate": 6,
    "q_consumer_lag": 6,
    "q_corpus_pipeline_e2e": 6,
    "q_dense_grid_zerofill": 6,
    "q_doc_fingerprint": 6,
    "q_embedding_centroids": 6,
    "q_embedding_decontaminate": 6,
    "q_embedding_quantize": 6,
    "q_fact_join_bucketed": 6,
    "q_fuzzy_decontaminate": 6,
    "q_graph_triangles": 6,
    "q_heavy_hitters_cms": 6,
    "q_interarrival_histogram": 6,
    "q_join_null_safe": 6,
    "q_journey_similarity": 6,
    "q_kmv_distinct_sketch": 6,
    "q_mix_weights": 6,
    "q_offsets_fanout": 6,
    "q_robust_stats": 6,
    "q_seeded_shuffle": 6,
    "q_seq_packing": 6,
    "q_setsim_prefix_join": 6,
    "q_sliding_counts": 6,
    "q_source_quota_cap": 6,
    "q_span_dedup": 6,
    "q_text_collocations": 6,
    "q_text_entropy": 6,
    "q_text_rare_token_ratio": 6,
    "q_topic_schema_evolution": 6,
    "q_tumbling_hourly": 6,
    "q_unigram_logprob": 6,
    "q_user_active_streaks": 6,
    "q_weighted_median": 6,
    "q_weighted_sample": 6,
    # --- queued during round 8 (since=7):
    # provenance hygiene (VERDICT r07 item 2): these four gained
    # bench=True in r07 without a correctness recheck — the flag does
    # not alter builder/oracle bytes (judge ruling: green rows stand),
    # but re-earn current evidence while the budget is idle.
    "q_session_window_agg": 7,
    "q_rollup_incremental": 7,
    "q_dedup_incremental_ingest": 7,
    "q_topic_increment_read": 7,
    # --- round-8 evidence rotation (since=7): the oldest standing
    # rows are the 45 last-green-r04 queries; the never-verified +
    # queued set this round is 20 of the 50-query budget, so rotate
    # the first 30 of the r04 cohort (alphabetical) through the idle
    # slots. Code is UNCHANGED for all of these (pure rotation); a
    # green r08 row (>7) expires each entry; overflow defers.
    "q_approx_distinct_users": 7,
    "q_approx_percentile_value": 7,
    "q_asof_join_tolerance": 7,
    "q_benford_audit": 7,
    "q_bigram_logprob": 7,
    "q_bot_score": 7,
    "q_burst_detection": 7,
    "q_chi2_independence": 7,
    "q_cusum_changepoint": 7,
    "q_dup_cluster_size_hist": 7,
    "q_dup_rate_by_slice": 7,
    "q_embedding_dim_stats": 7,
    "q_equiheight_histogram": 7,
    "q_funnel_attribution": 7,
    "q_gini_concentration": 7,
    "q_holt_trend": 7,
    "q_hourly_autocorrelation": 7,
    "q_journey_paths": 7,
    "q_km_survival": 7,
    "q_ks_test": 7,
    "q_label_balance": 7,
    "q_langid_agreement": 7,
    "q_lorenz_deciles": 7,
    "q_mann_whitney_u": 7,
    "q_market_basket_lift": 7,
    "q_ngram_coverage": 7,
    "q_order_sla": 7,
    "q_pii_redact": 7,
    "q_psi_drift": 7,
    "q_rate_limit_replay": 7,
    # round 8: the centroid-cosine keep-rank key moved from round(x,6)
    # (Spark HALF_UP vs DuckDB half-even on exact midpoints) to the
    # shared arithmetic half-up floor(x*1e6+0.5) on BOTH engines
    # (ADVICE r07) — builder and oracle bytes changed, re-earn the row.
    "q_dedup_semantic": 7,
    # --- queued during round 9 (since=8):
    # rank-key change (VERDICT r08 item 2): the remaining similarity
    # rank keys moved from round(sim, 6) to the shared arithmetic
    # half-up floor(sim*1e6+0.5) on BOTH engines — the three named
    # queries plus every consumer of the central contracts
    # (_global_topk, _batch_topk_pairs, _nearest_above) whose builder
    # or oracle bytes changed. Re-earn each row.
    "q_similarity_topk": 8,
    "q_similarity_topk_pandas": 8,
    "q_ann_lsh_topk": 8,
    "q_ann_ivf_topk": 8,
    "q_ann_pq_topk": 8,
    "q_dedup_embedding": 8,
    "q_timeseries_profile_topk": 8,
    # round-9 evidence drain (VERDICT r08 item 4): the 15 remaining
    # last-green-r04 rows not already queued (q_psi_drift and
    # q_rate_limit_replay are pending above at since=7). Code is
    # UNCHANGED (pure rotation); a green r09 row expires each entry.
    "q_rfm_segments": 8,
    "q_seasonality_profile": 8,
    "q_session_stats": 8,
    "q_source_containment": 8,
    "q_source_kl_divergence": 8,
    "q_source_vocab_overlap": 8,
    "q_split_leakage": 8,
    "q_stats_moments": 8,
    "q_time_to_convert": 8,
    "q_trend_slope": 8,
    "q_truncation_stats": 8,
    "q_ts_resample_linear": 8,
    "q_type_correlation": 8,
    "q_user_type_entropy": 8,
    "q_welch_ttest": 8,
    # round-9 idle-slot rotation (since=8): with 5 never-verified
    # queries + 25 queued above, ~20 of the 50-query budget is idle —
    # rotate the oldest standing rows (green r05, the oldest cohort
    # after this round's r04 drain). Code UNCHANGED (pure rotation);
    # overflow past the budget defers automatically.
    "q_agg_multi": 8,
    "q_bucket_depth_counts": 8,
    "q_cdc_apply": 8,
    "q_consume_offset_range": 8,
    "q_cube_type_bucket": 8,
    "q_date_trunc_day": 8,
    "q_enrich_broadcast_join": 8,
    "q_fact_join": 8,
    "q_fanout_replicas": 8,
    "q_filter_compound": 8,
    "q_filter_topic_bucket": 8,
    "q_funnel_conversion": 8,
    "q_global_rank": 8,
    "q_join_semi_anti": 8,
    "q_json_props_extract": 8,
    "q_latest_event_per_user": 8,
    "q_min_seq_leader": 8,
    "q_moving_avg_time": 8,
    "q_pagerank_types": 8,
    "q_percentile_value": 8,
    # --- round-10 evidence rotation (since=9, VERDICT r09 item 5):
    # the remaining r05 tail — the oldest standing green rows —
    # re-earns current evidence. Code UNCHANGED (pure rotation); a
    # green r10+ row expires each entry automatically.
    # (q_percentile_value, the 27th tail row, is queued above at 8.)
    "q_project_typed_columns": 9,
    "q_quality_filter_funnel": 9,
    "q_rollup_type_day": 9,
    "q_running_value": 9,
    "q_scalar_md5_route": 9,
    "q_scan_events": 9,
    "q_seq_gap_detection": 9,
    "q_set_intersect_except": 9,
    "q_text_pii_flags": 9,
    "q_text_quality": 9,
    "q_text_repetition": 9,
    "q_text_tfidf": 9,
    "q_token_budget_select": 9,
    "q_topic_time_travel": 9,
    "q_topk_hot_users": 9,
    "q_topn_per_group": 9,
    "q_tpch_q1": 9,
    "q_tpch_q11_important": 9,
    "q_tpch_q3_topk": 9,
    "q_tpch_q5_region": 9,
    "q_tpch_q6": 9,
    "q_union_topics": 9,
    "q_upsample_by_weight": 9,
    "q_user_zscore_pandas": 9,
    "q_window_distribution": 9,
    "q_zipf_slope": 9,
    # --- round-11 evidence rotation (since=10, VERDICT r10 item 3):
    # the 26-row r06 tail — now the oldest standing green rows —
    # re-earns current evidence. Code UNCHANGED (pure rotation); a
    # green r11+ row expires each entry automatically. Budget: 50/round
    # with no never-verified rows, so 26 fits with room for new queries.
    "q_above_avg_value": 10,
    "q_asof_join": 10,
    "q_cohort_retention": 10,
    "q_grouping_sets": 10,
    "q_histogram_value": 10,
    "q_late_data_accounting": 10,
    "q_multimodal_embed": 10,
    "q_multimodal_meta": 10,
    "q_multimodal_resize": 10,
    "q_pivot_type_day": 10,
    "q_range_join_bands": 10,
    "q_salted_agg": 10,
    "q_sessionize_users": 10,
    "q_text_bpe_tokens": 10,
    "q_text_lang_scores": 10,
    "q_text_token_counts": 10,
    "q_tpch_q10_returns": 10,
    "q_tpch_q13_custdist": 10,
    "q_tpch_q14_promo": 10,
    "q_tpch_q17_small_qty": 10,
    "q_tpch_q18_large_orders": 10,
    "q_tpch_q19_disjunct": 10,
    "q_tpch_q4_priority": 10,
    "q_udaf_gmean": 10,
    "q_udtf_tokenize": 10,
    "q_window_lag_lead": 10,
}


def _active_recheck(greens: dict[str, int] | None = None) -> set[str]:
    """The queued names that should re-sort unverified THIS round.

    A queued name is pending while its latest green round is <= its
    queued-since round (a NEWER green row expires it). Pending names
    activate oldest-since first (dict order within a pass), but only
    while never-verified names + active rechecks fit the driver's
    per-round budget — overflow names stay sorted as verified and
    activate in a later round.
    """
    if greens is None:
        greens = _green_rounds()
    never = [n for n in SPECS if n not in greens]
    pending = [
        n
        for n, since in _RECHECK_SINCE.items()
        if n in SPECS and n in greens and greens[n] <= since
    ]
    pending.sort(key=lambda n: _RECHECK_SINCE[n])  # stable: dict order within a pass
    room = max(0, _DRIVER_BUDGET - len(never))
    return set(pending[:room])


def _ordered_names() -> list[str]:
    # one CORRECTNESS_r*.json parse serves both consumers — the glob
    # + JSON pass grows with rounds and all_queries()/all_oracles()
    # each order the registry at driver startup
    greens = _green_rounds()
    verified = set(greens) - _active_recheck(greens)

    def rank(name: str) -> tuple[bool, int]:
        for i, pfx in enumerate(_PRIORITY_PREFIXES):
            if name.startswith(pfx):
                return (name in verified, i)
        return (name in verified, len(_PRIORITY_PREFIXES))

    # Stable partition: unverified first, extension families ahead of the
    # rest; insertion order preserved within each group.
    return sorted(SPECS, key=rank)


def all_queries() -> dict[str, Builder]:
    return {name: SPECS[name].builder for name in _ordered_names()}


def all_oracles() -> dict[str, str]:
    return {
        name: SPECS[name].oracle
        for name in _ordered_names()
        if SPECS[name].oracle is not None
    }


def bench_queries() -> dict[str, Builder]:
    return {name: spec.builder for name, spec in SPECS.items() if spec.bench}
