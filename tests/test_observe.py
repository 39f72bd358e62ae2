"""Observation-based quality gates: metrics accumulate during the
materializing action (no extra pass), and rules gate the run."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ripple_server_spark.catalog import load_table
from ripple_server_spark.operators.observe import QualityGate, corpus_gate
from tests.conftest import SF_SMOKE


def _materialize(df):
    df.write.format("noop").mode("overwrite").save()


def test_gate_passes_on_clean_corpus(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    out, gate = corpus_gate(docs)
    _materialize(out)
    gate.raise_if_violated()
    m = gate.metrics()
    assert m["n_rows"] > 0 and m["null_ids"] == 0 and m["empty_docs"] == 0


def test_gate_catches_violation(spark):
    docs = load_table(spark, SF_SMOKE, "documents").withColumn(
        "text", F.when(F.col("doc_id") % 7 == 0, F.lit("")).otherwise(F.col("text"))
    )
    out, gate = corpus_gate(docs)
    _materialize(out)
    bad = gate.violations()
    assert [v.metric for v in bad] == ["empty_docs"]
    with pytest.raises(AssertionError, match="empty documents"):
        gate.raise_if_violated()


def test_gate_adds_no_extra_job(spark):
    """The metrics come from the SAME job as the write: job count with
    the gate equals job count without it."""
    sc = spark.sparkContext
    docs = load_table(spark, SF_SMOKE, "documents")

    before = sc.statusTracker().getJobIdsForGroup(None)
    _materialize(docs.select("doc_id", "text"))
    plain_jobs = len(sc.statusTracker().getJobIdsForGroup(None)) - len(before)

    out, gate = corpus_gate(docs.select("doc_id", "text"))
    before = sc.statusTracker().getJobIdsForGroup(None)
    _materialize(out)
    gated_jobs = len(sc.statusTracker().getJobIdsForGroup(None)) - len(before)
    gate.raise_if_violated()
    assert gated_jobs == plain_jobs


def test_gate_is_single_use(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    gate = QualityGate()
    gate.attach(docs, n=F.count(F.lit(1)))
    with pytest.raises(ValueError, match="single-use"):
        gate.attach(docs, n=F.count(F.lit(1)))
