#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans for a representative
query set, so the scale claims (pushdown, broadcast, shuffle count,
codegen spans) are inspectable without a Spark session. Run after plan
changes; the chosen set covers each claim family once."""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from ripple_server_spark.plans.registry import SPECS  # noqa: E402
from ripple_server_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"

# query -> what to look for in its plan (rendered as the section intro)
SHOWCASE = {
    "q_filter_topic_bucket": (
        "Predicate pushdown + column pruning: PushedFilters reaches the "
        "parquet scan; ReadSchema excludes untouched columns (props)."
    ),
    "q_enrich_broadcast_join": (
        "Dimension join broadcasts (BroadcastHashJoin, no SortMergeJoin/"
        "shuffle on the fact side)."
    ),
    "q_tpch_q1": (
        "Partial aggregation: HashAggregate pair around a single "
        "Exchange; whole-stage codegen spans the scan-to-partial-agg "
        "pipeline."
    ),
    "q_fact_join_bucketed": (
        "Co-bucketed fact-fact join: ZERO Exchange on either join side — "
        "the at-rest bucketed layout replaces the shuffle."
    ),
    "q_topk_hot_users": (
        "Top-k never global-sorts: TakeOrderedAndProject, no Sort+Limit "
        "over the full aggregate."
    ),
    "q_latest_event_per_user": (
        "Rank-1-per-key as max_by aggregate: no Window operator, "
        "partial-aggregatable, skew-immune."
    ),
    "q_consume_offset_range": (
        "Ranged consume pushes the offset predicate to row-group stats "
        "(GreaterThanOrEqual in PushedFilters) and prunes bucket dirs."
    ),
    "q_url_dedup": (
        "URL canonicalization as a pure codegen regexp chain inside the "
        "scan projection (no Python eval stage); dedup is a partial-"
        "aggregated groupBy on the canonical key."
    ),
    "q_unigram_logprob": (
        "Corpus scoring joins stay broadcast (vocab + 1-row total): the "
        "token stream shuffles only at the per-doc aggregate."
    ),
    "q_video_dedup_dhash": (
        "Video near-dup: one Arrow kernel pass emits 8 16-bit band rows "
        "per clip (pixel data never shuffles); candidates come from "
        "(frame_idx, band, value) hash equi-joins — no CartesianProduct/"
        "NLJ anywhere — and the verify is bit_count(xor) + two partial "
        "aggregates on candidate pairs only."
    ),
    "q_audio_dedup_fingerprint": (
        "Audio near-dup: the WAV decode + integer energy signature is "
        "one map-side Arrow pass (8 rows/clip); candidate generation is "
        "a (win, energy) hash equi-join on essentially collision-free "
        "64-bit keys, verification 8 integer comparisons per pair."
    ),
    "q_span_dedup": (
        "Span dedup: Arrow segmentation kernel (ArrowEvalPython), "
        "broadcast drop join, within-group array_sort reassembly — no "
        "global sort, no Window."
    ),
    "q_source_quota_cap": (
        "Quota window partitions by source — no Exchange SinglePartition "
        "anywhere in the plan."
    ),
    "q_equiheight_histogram": (
        "Exact global ranks without a global sort: the data-sized "
        "row_number window is partitioned by the value stripe; only the "
        "<=256-row stripe-count table crosses a SinglePartition "
        "cumulative window."
    ),
    "q_cdc_apply": (
        "Latest-wins merge: the rank-1 cut compiles to WindowGroupLimit "
        "so each task prunes to its keys' top rows before the shuffle."
    ),
    "q_vocab_growth": (
        "Striped two-pass rank over doc_id (round-4 rewrite): every "
        "row_number window is partitioned by `_stripe`; the only "
        "BroadcastExchanges carry stripe offsets and the 10-row decile "
        "table — no corpus-sized broadcast, no global sort."
    ),
    "q_token_budget_select": (
        "Two-pass global budget selection (round-4 rewrite): priority "
        "histogram + cumulative offsets over HISTOGRAM rows pick the "
        "boundary stratum; the boundary's running sum is partitioned by "
        "the doc_id stripe. No single-partition window over documents."
    ),
    "q_heavy_hitters_cms": (
        "CMS built from the per-key partial aggregate (fan-out "
        "multiplies keys, not events); heavy-hitter cut is "
        "TakeOrderedAndProject."
    ),
}


# Per-query session-conf overrides while rendering: at sf0.001 tiny
# sides auto-broadcast, which would hide the property the section
# demonstrates (the bucketed zipper join only appears as SortMergeJoin
# when broadcast is off — exactly the 100 TB regime, where neither fact
# fits the broadcast cap).
CONF_OVERRIDES = {
    "q_fact_join_bucketed": {"spark.sql.autoBroadcastJoinThreshold": "-1"},
}


def main() -> None:
    spark = get_spark(app_name="ripple-spark-plans")
    jvm = spark._jvm
    out = [
        "# PLANS — formatted physical plans (generated)",
        "",
        "Generated by `scripts/gen_plans_doc.py` at sf0.001 — do not edit",
        "by hand. Each section states the scale property the plan is",
        "evidence for; `tests/test_plans.py` asserts the same properties",
        "mechanically.",
        "",
    ]
    for name, claim in SHOWCASE.items():
        overrides = CONF_OVERRIDES.get(name, {})
        saved = {k: spark.conf.get(k) for k in overrides}
        # Build FIRST, then override: builders call ensure_runtime_conf,
        # which would undo the override; physical planning is lazy and
        # only happens at explainString, so the override applies there.
        df = SPECS[name].builder(spark, SF)
        for k, v in overrides.items():
            spark.conf.set(k, v)
        try:
            plan = jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        finally:
            for k, v in saved.items():
                spark.conf.set(k, v)
        if overrides:
            claim += (
                " (rendered with "
                + ", ".join(f"{k}={v}" for k, v in overrides.items())
                + " — the 100 TB regime, where neither side broadcasts)"
            )
        out += [f"## `{name}`", "", claim, "", "```", plan.rstrip(), "```", ""]
    with open("PLANS.md", "w") as fh:
        fh.write("\n".join(out))
    print(f"PLANS.md: {len(SHOWCASE)} plans")
    spark.stop()


if __name__ == "__main__":
    main()
