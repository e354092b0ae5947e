"""REHEARSAL.json — the committed full-registry driver-scale sweep
(`tools/rehearse_window.py --all` at sf0.01) — must be FRESH: its query
set equal to the live registry, every oracle-bearing row hash-verified
OK, every rows-only row non-failing, zero fails (VERDICT r13 item 2:
the 345/345 claim was a prose row in COVERAGE.md; this test makes a
stale or missing artifact fail the suite, so each round must re-run the
sweep after its last registry change).
"""

from __future__ import annotations

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(REPO, "REHEARSAL.json")


@pytest.fixture(scope="module")
def artifact():
    assert os.path.exists(ARTIFACT), (
        "REHEARSAL.json missing — run `python tools/rehearse_window.py --all`"
    )
    with open(ARTIFACT) as f:
        return json.load(f)


def test_rehearsal_covers_exactly_the_registry(artifact):
    from redpanda_ais_demo_spark.plans import get_queries
    from redpanda_ais_demo_spark.plans.registry import get_oracles

    recorded = set(artifact["queries"])
    live = set(get_queries())
    assert recorded == live, (
        f"REHEARSAL.json is stale — re-run `python tools/rehearse_window.py"
        f" --all` (missing: {sorted(live - recorded)[:5]}, "
        f"extra: {sorted(recorded - live)[:5]})"
    )
    oracled = {n for n, r in artifact["queries"].items() if r["verdict"] == "OK"}
    assert oracled == set(get_oracles()), (
        "oracle-bearing set drifted — re-run the sweep "
        f"(diff: {sorted(oracled ^ set(get_oracles()))[:5]})"
    )


def test_rehearsal_all_green(artifact):
    assert artifact["fails"] == [], f"sweep had failures: {artifact['fails']}"
    bad = {
        n: r
        for n, r in artifact["queries"].items()
        if r["verdict"] not in ("OK", "rows-only")
    }
    assert not bad, f"non-green rows: {list(bad)[:5]}"


def test_rehearsal_ran_at_driver_scale(artifact):
    assert artifact["sf_dir"].endswith("sf0.01"), artifact["sf_dir"]
