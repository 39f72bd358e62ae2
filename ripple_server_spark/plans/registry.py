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
    # --- round-5 refresh pass 1 (since=4): builders MODIFIED during
    # round 4 after their last green driver row (VERDICT r04 item 1
    # names all 26) — locally parity-proven on current code and
    # fixtures, re-queued so the hard CORRECTNESS signal covers the
    # live code. (The three r04 recheck names q_ann_lsh_topk,
    # q_ann_pq_topk, q_stats_moments are r04-green -> expired.)
    "q_token_budget_select": 4,
    "q_window_distribution": 4,
    "q_text_tfidf": 4,
    "q_pagerank_types": 4,
    "q_topic_time_travel": 4,
    "q_cdc_apply": 4,
    "q_upsample_by_weight": 4,
    "q_zipf_slope": 4,
    "q_user_zscore_pandas": 4,
    "q_agg_multi": 4,
    "q_date_trunc_day": 4,
    "q_json_props_extract": 4,
    "q_moving_avg_time": 4,
    "q_seq_gap_detection": 4,
    "q_dedup_containment": 4,
    "q_fanout_replicas": 4,
    "q_funnel_conversion": 4,
    "q_percentile_value": 4,
    "q_quality_filter_funnel": 4,
    "q_similarity_lsh_bucket": 4,
    "q_text_pii_flags": 4,
    "q_text_quality": 4,
    "q_text_repetition": 4,
    "q_timeseries_profile_topk": 4,
    "q_topn_per_group": 4,
    "q_tpch_q11_important": 4,
    # (q_vocab_growth's round-5 since=4 entry — stripe count re-derived
    # from defaultParallelism — went green r05 and expired; it re-queues
    # below at since=6 for the round-6 stripe_width refactor.)
    # --- round-5 refresh pass 2 (since=4, 23 slots): oldest round-1-era
    # rows — their green evidence predates the driver's fixture
    # regeneration between r01 and r02 (VERDICT r04 item 2); rotate the
    # relational core onto current fixtures first. q_global_rank is
    # pulled forward because round 5 also re-derived its stripe count
    # from defaultParallelism.
    "q_scan_events": 4,
    "q_project_typed_columns": 4,
    "q_filter_topic_bucket": 4,
    "q_filter_compound": 4,
    "q_consume_offset_range": 4,
    "q_topk_hot_users": 4,
    "q_union_topics": 4,
    "q_scalar_md5_route": 4,
    "q_bucket_depth_counts": 4,
    "q_rollup_type_day": 4,
    "q_min_seq_leader": 4,
    "q_latest_event_per_user": 4,
    "q_running_value": 4,
    "q_enrich_broadcast_join": 4,
    "q_join_semi_anti": 4,
    "q_fact_join": 4,
    "q_tpch_q1": 4,
    "q_tpch_q3_topk": 4,
    "q_tpch_q5_region": 4,
    "q_set_intersect_except": 4,
    "q_cube_type_bucket": 4,
    "q_tpch_q6": 4,
    "q_global_rank": 4,
    # --- round-6 refresh pass 3 (since=5): the remaining 19 round-1-era
    # rows. Deferred automatically while the since=4 pass occupies the
    # budget; they activate the moment CORRECTNESS_r05 lands (expiring
    # the pass above) with zero manual edits.
    "q_sessionize_users": 5,
    "q_window_lag_lead": 5,
    "q_above_avg_value": 5,
    "q_asof_join": 5,
    "q_range_join_bands": 5,
    "q_pivot_type_day": 5,
    "q_histogram_value": 5,
    "q_grouping_sets": 5,
    "q_udaf_gmean": 5,
    "q_udtf_tokenize": 5,
    "q_salted_agg": 5,
    "q_cohort_retention": 5,
    "q_tpch_q4_priority": 5,
    "q_tpch_q10_returns": 5,
    "q_tpch_q13_custdist": 5,
    "q_tpch_q14_promo": 5,
    "q_tpch_q17_small_qty": 5,
    "q_tpch_q18_large_orders": 5,
    "q_tpch_q19_disjunct": 5,
    # round 5: the decode/resize/embed kernels gained a real numpy
    # netpbm backend on their fake=False branch (codecs.py). The
    # fake=True branch these queries run is byte-identical (pinned by
    # determinism tests + sf0.01 parity), but the kernel closures
    # changed, so re-earn the rows. (q_multimodal_frames' kernel is
    # untouched — not queued.)
    "q_multimodal_meta": 5,
    "q_multimodal_resize": 5,
    "q_multimodal_embed": 5,
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
