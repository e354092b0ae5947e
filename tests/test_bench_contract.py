"""bench.py's stdout contract: the driver captures a bounded tail of stdout
and parses the last JSON line. Rounds 6-7 printed the full per-query record
(queries/spread/samples) on that line and overflowed the capture — both
BENCH files landed ``parsed: null``. The compact summary line must stay well
under the capture window; the full record goes to BENCH_LOCAL.json.
"""

from __future__ import annotations

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_summary_line_under_driver_tail_cap():
    bench = _load_bench()
    # worst-plausible widths: hundreds of seconds with 3-decimal rounding,
    # every stdout-subset query at a 6-char 2dp value
    worst = {n: 999.99 for n in bench.CORE_QUERIES + bench.STDOUT_HEAVIES}
    line = json.dumps(
        bench.summary_line(9999.999, 9999.999, 9999.999, 0.1, worst),
        separators=(",", ":"),
    )
    assert len(line) < bench.STDOUT_LINE_BUDGET, (
        f"summary line {len(line)} chars — driver tail may truncate"
    )
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total_runtime"
    assert parsed["unit"] == "sec"
    assert set(parsed) == {
        "metric", "value", "unit", "core_set_sec", "additions_sec",
        "extended_sec", "sf", "queries",
    }
    # the full frozen subset fits without the runtime truncation guard
    # having to fire
    assert set(parsed["queries"]) == set(worst)


def test_summary_line_without_timings_stays_compact():
    """The timings-free form (old contract) keeps the <200-char shape."""
    bench = _load_bench()
    line = json.dumps(bench.summary_line(9999.999, 9999.999, 9999.999, 0.1))
    assert len(line) < 200
    assert "queries" not in json.loads(line)


def test_summary_line_truncation_guard_keeps_line_parseable():
    """A pathological width (absurd values) must shed heavy entries from
    the end rather than overflow the driver tail."""
    bench = _load_bench()
    absurd = {
        n: 1e12 for n in bench.CORE_QUERIES + bench.STDOUT_HEAVIES
    }
    line = json.dumps(
        bench.summary_line(1e12, 1e12, 1e12, 0.1, absurd),
        separators=(",", ":"),
    )
    assert len(line) <= bench.STDOUT_LINE_BUDGET
    parsed = json.loads(line)  # still one valid JSON line
    assert parsed["metric"] == "headline_queries_total_runtime"


def test_stdout_subset_is_registered_and_duplicate_free():
    import sys

    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from redpanda_ais_demo_spark.plans import get_queries

    bench = _load_bench()
    subset = bench.CORE_QUERIES + bench.STDOUT_HEAVIES
    assert len(subset) == len(set(subset)), "duplicate in stdout subset"
    assert set(subset) <= set(get_queries()), (
        sorted(set(subset) - set(get_queries()))
    )


def test_full_record_fields_live_in_bench_local_not_stdout():
    """The raw per-query detail (spread/samples) must not creep back onto
    the stdout line, and the queries map stays the frozen subset."""
    bench = _load_bench()
    line = bench.summary_line(1.0, 0.5, 0.2, 0.1, {"q1_pricing_summary": 1.0})
    for heavy_key in ("spread", "samples"):
        assert heavy_key not in line
    assert set(line["queries"]) == {"q1_pricing_summary"}


def test_merge_partial_overlays_prior_record(tmp_path):
    """SPARK_GRAFT_BENCH_ONLY reruns a subset; the written BENCH_LOCAL.json
    must stay a full-registry record with the fresh rows overlaid."""
    bench = _load_bench()
    prior = tmp_path / "BENCH_LOCAL.json"
    prior.write_text(json.dumps({
        "queries": {"a": 1.0, "b": 2.0},
        "spread": {"a": 1.1, "b": 1.2},
        "samples": {"a": [1.0], "b": [2.0]},
    }))
    t, s, raw = bench.merge_partial(
        str(prior), {"b": 0.5, "c": 3.0}, {"b": 1.0, "c": 1.3}, {"b": [0.5], "c": [3.0]}
    )
    assert t == {"a": 1.0, "b": 0.5, "c": 3.0}
    assert s == {"a": 1.1, "b": 1.0, "c": 1.3}
    assert raw == {"a": [1.0], "b": [0.5], "c": [3.0]}
    # missing prior degrades to the partial set alone, no crash
    t2, _, _ = bench.merge_partial(str(tmp_path / "nope.json"), {"x": 1.0}, {}, {})
    assert t2 == {"x": 1.0}
    # renamed/deregistered prior rows are dropped: 'a' is no longer a
    # registered query, so it must not haunt the merged totals
    t3, _, _ = bench.merge_partial(
        str(prior), {"b": 0.5}, {"b": 1.0}, {"b": [0.5]}, valid_names={"b", "c"}
    )
    assert t3 == {"b": 0.5}
    # a prior recorded at a different sf is discarded wholesale
    prior.write_text(json.dumps({"sf": 1.0, "queries": {"a": 9.0}}))
    t4, _, _ = bench.merge_partial(
        str(prior), {"b": 0.5}, {}, {}, valid_names={"a", "b"}, sf=0.1
    )
    assert t4 == {"b": 0.5}
    # same sf merges normally
    t5, _, _ = bench.merge_partial(
        str(prior), {"b": 0.5}, {}, {}, valid_names={"a", "b"}, sf=1.0
    )
    assert t5 == {"a": 9.0, "b": 0.5}


def test_bench_covers_every_registered_query():
    """No registered query may lack round-over-round bench timing: the
    curated lists plus the dynamic extended set must tile the registry
    exactly (94 queries were invisible to the bench through r9)."""
    import sys

    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from redpanda_ais_demo_spark.plans import get_queries

    bench = _load_bench()
    reg = set(get_queries())
    manual = bench.BENCH_QUERIES
    assert len(manual) == len(set(manual)), "duplicate in curated bench lists"
    extended = bench.extended_queries()
    assert set(manual) | set(extended) == reg
    assert set(manual) & set(extended) == set()
    assert set(manual) <= reg, sorted(set(manual) - reg)
