"""In-flight data-quality gates via Spark's Observation API.

A 100 TB pipeline run cannot afford audit passes: re-counting nulls or
row totals after the fact re-reads the corpus. ``Observation`` attaches
named aggregate metrics to a DataFrame that Spark accumulates DURING
the action that materializes it — zero extra jobs, zero extra scans.
This module packages the pattern as declarative quality gates: run the
write, then assert the observed metrics, failing the pipeline run
(not the query) when a gate breaks.

No reference analog (the reference is a message queue; its closest
notion is the ack/timeout audit in ``internal/broker/ack/ack.go``) —
this is pipeline tooling for the LLM-data surface, the engine-side
equivalent of the per-stage yield report q_quality_filter_funnel
computes as a query.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


@dataclass(frozen=True)
class GateViolation:
    metric: str
    value: object
    rule: str


class QualityGate:
    """Attach observed metrics to a DataFrame and assert rules on them
    after the materializing action.

    Usage::

        gate = QualityGate()
        df = gate.attach(
            df,
            n_rows=F.count(F.lit(1)),
            null_ids=F.sum(F.col("doc_id").isNull().cast("long")),
        )
        df.write...   # any single action
        gate.require("n_rows", lambda v: v > 0, "corpus must be non-empty")
        gate.require("null_ids", lambda v: v == 0, "doc_id must be non-null")
        gate.raise_if_violated()

    Metrics are computed by the SAME job that runs the action (Spark
    accumulates them at the observe node); ``get`` blocks until the
    action finishes. One ``attach`` per QualityGate — Observations are
    single-use by Spark contract.
    """

    def __init__(self, name: str = "quality_gate") -> None:
        self._obs = Observation(name)
        self._rules: list[tuple[str, Callable[[object], bool], str]] = []
        self._attached = False

    def attach(self, df: DataFrame, **metrics) -> DataFrame:
        if self._attached:
            raise ValueError("QualityGate already attached (single-use)")
        if not metrics:
            raise ValueError("at least one metric required")
        self._attached = True
        named = [expr.alias(name) for name, expr in metrics.items()]
        return df.observe(self._obs, *named)

    def require(
        self, metric: str, pred: Callable[[object], bool], rule: str
    ) -> "QualityGate":
        self._rules.append((metric, pred, rule))
        return self

    def metrics(self) -> dict:
        """Observed values (blocks until the materializing action ran)."""
        return dict(self._obs.get)

    def violations(self) -> list[GateViolation]:
        got = self.metrics()
        return [
            GateViolation(metric=m, value=got.get(m), rule=rule)
            for m, pred, rule in self._rules
            if not pred(got.get(m))
        ]

    def raise_if_violated(self) -> None:
        bad = self.violations()
        if bad:
            lines = "; ".join(f"{v.metric}={v.value} ({v.rule})" for v in bad)
            raise AssertionError(f"quality gate failed: {lines}")


def corpus_gate(df: DataFrame) -> tuple[DataFrame, QualityGate]:
    """The standard corpus-write gate: non-empty, no null doc ids, no
    empty documents. Returns (observed df, gate) — materialize the df,
    then ``gate.raise_if_violated()``."""
    gate = QualityGate("corpus_gate")
    out = gate.attach(
        df,
        n_rows=F.count(F.lit(1)),
        null_ids=F.sum(F.col("doc_id").isNull().cast("long")),
        empty_docs=F.sum((F.length("text") == 0).cast("long")),
    )
    gate.require("n_rows", lambda v: (v or 0) > 0, "corpus must be non-empty")
    gate.require("null_ids", lambda v: (v or 0) == 0, "doc_id must be non-null")
    gate.require("empty_docs", lambda v: (v or 0) == 0, "no empty documents")
    return out, gate
