"""Docs-drift gates: generated docs and manual counts must match the
live registry (pure-Python, no Spark session)."""

from __future__ import annotations

import re
from pathlib import Path

from ripple_server_spark.plans.registry import SPECS

REPO = Path(__file__).resolve().parents[1]


def test_queries_md_is_current():
    """QUERIES.md contains exactly one section per registered query
    (regenerate with scripts/gen_query_docs.py after adding queries)."""
    text = (REPO / "QUERIES.md").read_text()
    documented = set(re.findall(r"^### `(q_\w+)`", text, re.M))
    assert documented == set(SPECS), (
        f"missing: {sorted(set(SPECS) - documented)}; "
        f"stale: {sorted(documented - set(SPECS))}"
    )


def test_survey_registry_table_is_current():
    """SURVEY.md's registry table lists every query and states the
    right count."""
    text = (REPO / "SURVEY.md").read_text()
    m = re.search(r"Current registry \((\d+) queries\)", text)
    assert m and int(m.group(1)) == len(SPECS)
    listed = set(re.findall(r"^\| `(q_\w+)` \|", text, re.M))
    assert listed == set(SPECS), (
        f"missing: {sorted(set(SPECS) - listed)}; "
        f"stale: {sorted(listed - set(SPECS))}"
    )


def test_readme_count_is_current():
    text = (REPO / "README.md").read_text()
    m = re.search(r"declared query registry: (\d+) named queries", text)
    assert m and int(m.group(1)) == len(SPECS)
