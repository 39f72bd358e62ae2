"""The bench-anchor gate (scripts/bench_gate.py) must be mechanical:
trip on a synthetic 2x+ entry, pass on the recorded BENCH rounds, and
void itself when the fixture fingerprint changes (VERDICT r05 item 4).
No Spark needed — the gate is pure file diffing."""

from __future__ import annotations

import glob
import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "scripts"))

import bench_gate  # noqa: E402


@pytest.fixture(scope="module")
def anchors():
    return bench_gate.parse_anchors(open(bench_gate.BASELINE).read())


def test_anchor_table_parses_completely(anchors):
    """Every §C row must parse — including rows whose value cell
    carries re-base prose (q_ann_ivf_topk) and the renamed pubsub
    consume row — or the gate silently stops covering that query."""
    assert len(anchors) >= 25
    assert anchors["q_scan_events"] == 0.243
    assert anchors["q_ann_ivf_topk"] == 1.169  # prose after the number
    assert anchors["pubsub_consume_8x5k"] == 1.443  # alias mapping
    assert anchors["pubsub_produce"] == 1.206
    assert "headline" not in anchors  # the total row is not a query


def test_anchor_parse_scoped_to_section_c(anchors):
    """Rows outside the §C anchor table must not shadow anchors: the
    drift-adjudication table lists the same query names with an r04
    column that would otherwise overwrite five anchors (ADVICE r06).
    These five values are exactly the §C rows, not the r04 outliers."""
    assert anchors["q_asof_join"] == 0.599  # not the 0.450 r04 outlier
    assert anchors["q_bloom_decontaminate"] == 2.630  # not 1.817
    assert anchors["q_dedup_clusters"] == 3.891  # not 3.329
    assert anchors["q_tpch_q3_topk"] == 0.902  # not 0.639
    assert anchors["q_running_value"] == 0.407  # not 0.345


def test_gate_trips_on_synthetic_2x_and_passes_below(anchors):
    bad, warns = bench_gate.gate({"q_scan_events": anchors["q_scan_events"] * 2.1}, anchors)
    assert len(bad) == 1 and "2.10x" in bad[0]
    ok, _ = bench_gate.gate({"q_scan_events": anchors["q_scan_events"] * 1.9}, anchors)
    assert ok == []
    # un-anchored queries warn (new queries must add a §C row)
    _, warns = bench_gate.gate({"q_brand_new": 1.0}, anchors)
    assert len(warns) == 1 and "NO anchor" in warns[0]
    # pubsub_rows is an output count, not a timing
    none, nwarn = bench_gate.gate({"pubsub_rows": 1e9}, anchors)
    assert none == [] and nwarn == []


def test_gate_passes_on_every_recorded_bench(anchors):
    """All shipped BENCH_r*.json rounds are within 2x of their anchors
    (the standing §C claim, now asserted mechanically)."""
    paths = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
    assert paths, "no recorded bench rounds found"
    for p in paths:
        timings = bench_gate.load_bench(p)
        violations, _ = bench_gate.gate(timings, anchors)
        assert violations == [], (p, violations)


def test_load_bench_recovers_truncated_r10_tail(anchors):
    """BENCH_r10.json's tail lost the headline metric line (the inline
    adjudication tripled the line past the driver's 2000-char tail
    window) — load_bench must recover the adjudication entries that DID
    survive, as their min (headline semantics). VERDICT r10 item 1."""
    p = os.path.join(ROOT, "BENCH_r10.json")
    timings = bench_gate.load_bench(p)
    assert len(timings) >= 25
    # spot-check a min against the raw tail values (2.637/2.496/2.658)
    assert timings["pubsub_stream_drain"] == 2.496
    assert timings["q_dedup_minhash_lsh"] == 2.751


def test_load_bench_prefers_local_artifact(tmp_path):
    """A driver wrapper with NO parseable tail falls back to the
    committed BENCH_LOCAL_r<N>.json sibling written by bench.py."""
    import json

    wrapper = tmp_path / "BENCH_r99.json"
    wrapper.write_text(json.dumps({"n": 99, "rc": 0, "tail": "clipped"}))
    local = tmp_path / "BENCH_LOCAL_r99.json"
    local.write_text(json.dumps({"queries": {"q_scan_events": 0.2}}))
    assert bench_gate.load_bench(str(wrapper)) == {"q_scan_events": 0.2}
    # without the sibling and with nothing recoverable -> explicit error
    local.unlink()
    with pytest.raises(ValueError):
        bench_gate.load_bench(str(wrapper))


def test_fingerprint_check_validates_and_trips():
    fps = bench_gate.parse_fingerprints(open(bench_gate.BASELINE).read())
    assert len(fps) == 10 and "lineitem.parquet" in fps
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if not os.path.isdir(sf_dir):
        pytest.skip("sf0.1 fixtures not present")
    assert bench_gate.check_fingerprints(sf_dir, fps) == []
    tampered = dict(fps)
    nbytes, _ = tampered["lineitem.parquet"]
    tampered["lineitem.parquet"] = (nbytes, "0" * 32)
    bad = bench_gate.check_fingerprints(sf_dir, tampered)
    assert len(bad) == 1 and "lineitem" in bad[0]
