#!/usr/bin/env python
"""Mechanical bench-anchor gate (VERDICT r05 item 4).

Diffs a bench result against the standing per-query anchors in
BASELINE.md §C and FAILS on any query above the regression threshold
(2x its anchor — the bar §C has always stated in prose; this makes it
a command instead of a reading exercise).

Usage:
    python scripts/bench_gate.py [BENCH.json ...] [--threshold 2.0]

With no file arguments it gates every BENCH_r*.json in the repo root
plus, if present, the raw `python bench.py` output files passed in.
Both formats are accepted: the driver's wrapper ({"n", "rc", "tail":
"...one-line metric json..."}), and bench.py's bare one-line JSON.

Exit codes:
    0  every anchored query within threshold
    1  at least one query above threshold (regression to explain/fix)
    3  fixture fingerprint mismatch — anchors are VOID (the driver
       regenerated fixtures; re-base §C instead of reading ratios)

The fingerprint check is folded in because a ratio against an anchor
measured on different bytes is meaningless — §C's own validity rule.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE = os.path.join(ROOT, "BASELINE.md")

# bench.py emits pubsub_consume_8x5k; §C's row is titled pubsub_consume
_NAME_ALIASES = {"pubsub_consume": "pubsub_consume_8x5k"}
# informational outputs, not timings (counts and rates; gating a
# rows/s RATE against a seconds threshold would invert the comparison)
_NON_TIMINGS = {"pubsub_rows", "pubsub_stream_rows_per_s"}


def parse_anchors(text: str) -> dict[str, float]:
    """§C anchor table -> {query: anchor_sec}. A row's key is the first
    token of its first cell; the anchor is the first float in its
    second cell (prose after the number — re-base notes — is legal).

    Parsing is SCOPED to the §C anchor table proper: from the "## C."
    heading to the next heading. Other tables in BASELINE.md (the drift
    adjudication table lists the same query names with per-round
    columns) would otherwise match the row pattern and silently
    overwrite anchors with whatever their second column holds (ADVICE
    r06: q_asof_join 0.599 -> the r04 outlier 0.450)."""
    m = re.search(r"^## C\..*$", text, re.M)
    if m:
        section = text[m.end():]
        nxt = re.search(r"^#{2,3} ", section, re.M)
        text = section[: nxt.start()] if nxt else section
    anchors: dict[str, float] = {}
    for m in re.finditer(r"^\|\s*([A-Za-z]\w+)[^|]*\|\s*\**([0-9]+\.[0-9]+)", text, re.M):
        name, val = m.group(1), float(m.group(2))
        anchors[_NAME_ALIASES.get(name, name)] = val
    return anchors


def parse_fingerprints(text: str) -> dict[str, tuple[int, str]]:
    """The fixture-fingerprint table -> {file: (bytes, md5)}."""
    fps: dict[str, tuple[int, str]] = {}
    for m in re.finditer(r"^\|\s*(\S+\.parquet)\s*\|\s*(\d+)\s*\|\s*([0-9a-f]{32})\s*\|", text, re.M):
        fps[m.group(1)] = (int(m.group(2)), m.group(3))
    return fps


def check_fingerprints(sf_dir: str, fps: dict[str, tuple[int, str]]) -> list[str]:
    """Returns a list of mismatch descriptions (empty = anchors valid)."""
    bad: list[str] = []
    for fname, (nbytes, md5) in sorted(fps.items()):
        path = os.path.join(sf_dir, fname)
        if not os.path.isfile(path):
            bad.append(f"{fname}: missing from {sf_dir}")
            continue
        size = os.path.getsize(path)
        if size != nbytes:
            bad.append(f"{fname}: {size} bytes != fingerprint {nbytes}")
            continue
        with open(path, "rb") as fh:
            got = hashlib.md5(fh.read()).hexdigest()
        if got != md5:
            bad.append(f"{fname}: md5 {got} != fingerprint {md5}")
    return bad


def load_bench(path: str) -> dict[str, float]:
    """Read per-query timings from any bench-output format, in
    same-run-evidence-first order: bench.py's bare one-line JSON; the
    driver wrapper whose "tail" holds a complete metric line; a
    partial parse of a truncated tail — per-query
    {"driver","idle1","idle2"} adjudication entries recovered as their
    min (the headline semantics; this keeps BENCH_r10.json gateable at
    28/35 rows); and only then the repo-committed BENCH_LOCAL_r<N>.json
    sibling (written by bench.py since r11). The local artifact is
    deliberately LAST: bench.py names it max(recorded round)+1, so a
    manual bench run after the driver records round N pre-creates a
    round-N+1 file holding round-N-era timings — anything recovered
    from the wrapper's own tail is from the run the driver actually
    captured, while the sibling only might be (review r11)."""
    with open(path) as fh:
        doc = json.load(fh)
    if "queries" in doc:
        return doc["queries"]
    tail = doc.get("tail", "")
    m = re.search(r'\{"metric".*\}', tail)
    if m:
        return json.loads(m.group(0))["queries"]
    partial = {
        name: min(float(a), float(b), float(c))
        for name, a, b, c in re.findall(
            r'"(\w+)": \{"driver": ([0-9.]+), "idle1": ([0-9.]+), "idle2": ([0-9.]+)\}',
            tail,
        )
    }
    if partial:
        return partial
    local = re.sub(r"BENCH_r(\d+)\.json$", r"BENCH_LOCAL_r\1.json", path)
    if local != path and os.path.isfile(local):
        with open(local) as fh:
            return json.load(fh)["queries"]
    raise ValueError(f"{path}: no bench metric line found")


def gate(
    timings: dict[str, float],
    anchors: dict[str, float],
    threshold: float = 2.0,
) -> tuple[list[str], list[str]]:
    """-> (violations, warnings). A violation is a query above
    threshold x anchor; a warning is a timed query with no anchor row
    (new queries must add one at their first recorded round)."""
    violations: list[str] = []
    warnings: list[str] = []
    for name, sec in sorted(timings.items()):
        if name in _NON_TIMINGS:
            continue
        anchor = anchors.get(name)
        if anchor is None:
            warnings.append(f"{name}: {sec:.3f}s has NO anchor row — add one to §C")
            continue
        ratio = sec / anchor
        if ratio > threshold:
            violations.append(
                f"{name}: {sec:.3f}s is {ratio:.2f}x its {anchor:.3f}s anchor "
                f"(threshold {threshold}x)"
            )
    return violations, warnings


def main(argv: list[str]) -> int:
    threshold = 2.0
    files: list[str] = []
    it = iter(argv)
    for a in it:
        if a == "--threshold":
            threshold = float(next(it))
        else:
            files.append(a)
    if not files:
        files = sorted(
            os.path.join(ROOT, f)
            for f in os.listdir(ROOT)
            if re.fullmatch(r"BENCH_r\d+\.json", f)
        )
        if not files:
            print("bench_gate: no BENCH_r*.json found and no files given")
            return 2

    text = open(BASELINE).read()
    anchors = parse_anchors(text)
    fps = parse_fingerprints(text)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    fp_bad = check_fingerprints(sf_dir, fps)
    if fp_bad:
        print(f"bench_gate: FIXTURE FINGERPRINT MISMATCH — anchors are void, re-base §C")
        for b in fp_bad:
            print(f"  {b}")
        return 3

    rc = 0
    for path in files:
        timings = load_bench(path)
        violations, warnings = gate(timings, anchors, threshold)
        tag = os.path.basename(path)
        for w in warnings:
            print(f"[{tag}] WARN {w}")
        for v in violations:
            print(f"[{tag}] FAIL {v}")
        if violations:
            rc = 1
        else:
            n = sum(1 for k in timings if k not in _NON_TIMINGS and k in anchors)
            print(f"[{tag}] OK: {n} anchored queries all within {threshold}x")
    return rc


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
