"""Governance operators: t-closeness EMD hand-check, PIT-join edge
semantics (probe at a version boundary, probe before first version,
same-timestamp versions), and fingerprint order/partitioning
invariance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redpanda_ais_demo_spark.operators.joins import pit_join
from redpanda_ais_demo_spark.operators.validate import (
    column_fingerprints,
    t_closeness_audit,
)


def test_t_closeness_hand_computed_emd(spark):
    # one quasi column, sensitive values {0,1}: class A all-0 (worst),
    # class B mirrors the global 50/50 (EMD 0)
    rows = [("A", 0)] * 4 + [("B", 0)] * 2 + [("B", 1)] * 6
    df = spark.createDataFrame(rows, "q string, sv long")
    out = t_closeness_audit(df, ["q"], "sv", t_micro=100_000).collect()[0]
    # global: 0 -> 6/12, 1 -> 6/12; m=2 so EMD = |cumP_0 - 0.5|
    # class A: cumP_0 = 1.0 -> EMD 0.5; class B: cumP_0 = 0.25 -> 0.25
    assert out.n_classes == 2
    assert out.max_emd_micro == 500_000
    assert out.n_classes_at_risk == 2  # both exceed t = 0.1
    assert out.n_rows_at_risk == 12
    with pytest.raises(ValueError, match="quasi_cols"):
        t_closeness_audit(df, [], "sv")
    with pytest.raises(ValueError, match="t_micro"):
        t_closeness_audit(df, ["q"], "sv", t_micro=0)


def test_pit_join_boundary_semantics(spark):
    dim = spark.createDataFrame(
        [(1, 100, "bronze", 1), (1, 200, "gold", 2), (2, 150, "silver", 1)],
        "k long, valid_from long, tier string, version long",
    )
    probe = spark.createDataFrame(
        [
            (10, 1, 99),   # before first version -> NULL
            (11, 1, 100),  # exactly at a version start -> that version
            (12, 1, 199),  # mid-interval -> bronze
            (13, 1, 200),  # at the upgrade instant -> gold (half-open)
            (14, 1, 999),  # far future -> current version
            (15, 2, 150),  # other key
            (16, 3, 500),  # key with no dim history -> NULL
        ],
        "pid long, k long, ts long",
    )
    out = {
        r.pid: r.tier
        for r in pit_join(
            probe, dim, "k", "ts", "valid_from", "tier",
            ["pid", "k"], dim_tiebreak_col="version",
        ).collect()
    }
    assert out == {
        10: None, 11: "bronze", 12: "bronze", 13: "gold",
        14: "gold", 15: "silver", 16: None,
    }


def test_pit_join_same_timestamp_versions_highest_tiebreak_wins(spark):
    dim = spark.createDataFrame(
        [(1, 100, "a", 1), (1, 100, "b", 2)],
        "k long, valid_from long, attr string, version long",
    )
    probe = spark.createDataFrame([(9, 1, 100)], "pid long, k long, ts long")
    out = pit_join(
        probe, dim, "k", "ts", "valid_from", "attr", ["pid"],
        dim_tiebreak_col="version",
    ).collect()
    assert out[0].attr == "b"
    with pytest.raises(ValueError, match="probe_cols"):
        pit_join(probe, dim, "k", "ts", "valid_from", "attr", [])


def test_pit_join_null_attribute_version_supersedes_prior(spark):
    # A dim version whose attribute is legitimately NULL must still
    # supersede the previous version: probes at/after it see NULL, not
    # the stale prior value (the attribute is carried inside a struct,
    # so last(ignorenulls) skips only missing STATE, never a NULL value).
    dim = spark.createDataFrame(
        [(1, 100, "bronze", 1), (1, 200, None, 2), (1, 300, "gold", 3)],
        "k long, valid_from long, tier string, version long",
    )
    probe = spark.createDataFrame(
        [(10, 1, 150), (11, 1, 200), (12, 1, 299), (13, 1, 300)],
        "pid long, k long, ts long",
    )
    out = {
        r.pid: r.tier
        for r in pit_join(
            probe, dim, "k", "ts", "valid_from", "tier",
            ["pid"], dim_tiebreak_col="version",
        ).collect()
    }
    assert out == {10: "bronze", 11: None, 12: None, 13: "gold"}


def test_column_fingerprints_order_and_partitioning_invariant(spark):
    rows = [(i, f"s{i % 7}" if i % 5 else None) for i in range(200)]
    a = spark.createDataFrame(rows, "x long, s string").repartition(13)
    b = spark.createDataFrame(list(reversed(rows)), "x long, s string").repartition(2)
    exprs = {"x": F.col("x"), "s": F.col("s")}
    fa = {r.column: (r.n_rows, r.n_nulls, r.fp_sum) for r in column_fingerprints(a, exprs).collect()}
    fb = {r.column: (r.n_rows, r.n_nulls, r.fp_sum) for r in column_fingerprints(b, exprs).collect()}
    assert fa == fb
    assert fa["s"][1] == 40  # every 5th s is NULL
    # a single changed row must shift the fingerprint
    c = spark.createDataFrame(
        [(0, "CHANGED")] + rows[1:], "x long, s string"
    )
    fc = {r.column: r.fp_sum for r in column_fingerprints(c, exprs).collect()}
    assert fc["s"] != fa["s"][2]
    assert fc["x"] == fa["x"][2]
    with pytest.raises(ValueError, match="exprs"):
        column_fingerprints(a, {})


def test_column_fingerprints_single_scan_plan(spark):
    df = spark.createDataFrame([(1, "a")], "x long, s string")
    out = column_fingerprints(df, {"x": F.col("x"), "s": F.col("s")})
    plan = out._jdf.queryExecution().executedPlan().toString().lower()
    assert plan.count("scan") == 1  # every column audited in ONE pass


def test_merge_join_equals_recompute_with_duplicate_keys(spark):
    from redpanda_ais_demo_spark.operators.ivm import merge_join

    a = spark.createDataFrame(
        [(1, "a1"), (1, "a2"), (2, "a3"), (3, "a4"), (4, "a5")], "k long, av string"
    )
    b = spark.createDataFrame(
        [(1, "b1"), (2, "b2"), (2, "b3"), (4, "b4"), (5, "b5")], "k long, bv string"
    )
    da = a.filter(a.k % 2 == 0)
    ao = a.filter(a.k % 2 != 0)
    db = b.filter(b.k % 3 == 0)
    bo = b.filter(b.k % 3 != 0)
    view = ao.join(bo, ["k"])
    got = sorted(
        (r.k, r.av, r.bv)
        for r in merge_join(view, ao, da, bo, db, ["k"]).collect()
    )
    want = sorted((r.k, r.av, r.bv) for r in a.join(b, ["k"]).collect())
    assert got == want

    import pytest

    with pytest.raises(ValueError, match="on must"):
        merge_join(view, ao, da, bo, db, [])
    with pytest.raises(ValueError, match="missing join columns"):
        merge_join(view, ao.drop("k"), da, bo, db, ["k"])


def test_dp_laplace_counts_reproducible_and_scaled(spark):
    import math

    from redpanda_ais_demo_spark.operators.validate import dp_laplace_counts

    rows = [(f"g{i % 8}",) for i in range(800)]
    df = spark.createDataFrame(rows, "g string")
    a = {r["g"]: r for r in dp_laplace_counts(df, "g", "s1", epsilon=1.0).collect()}
    b = {r["g"]: r for r in dp_laplace_counts(df, "g", "s1", epsilon=1.0).collect()}
    assert a.keys() == b.keys() and len(a) == 8
    # keyed PRG: same salt -> identical release; fresh salt -> new noise
    assert all(a[g]["noisy_count"] == b[g]["noisy_count"] for g in a)
    c = {r["g"]: r for r in dp_laplace_counts(df, "g", "s2", epsilon=1.0).collect()}
    assert any(a[g]["noisy_count"] != c[g]["noisy_count"] for g in a)
    # noise centered on the true count (100 per group) at Laplace(1) scale:
    # every |noise| is finite and the bulk sits within a few b
    for g, r in a.items():
        noise = r["noisy_count"] - 100.0
        assert math.isfinite(noise) and abs(noise) < 40  # P(|L(1)|>40) ~ e^-40
        assert r["epsilon"] == 1.0 and r["sensitivity"] == 1
    # smaller epsilon -> strictly larger noise magnitudes (same u draws)
    wide = {r["g"]: r for r in dp_laplace_counts(df, "g", "s1", epsilon=0.1).collect()}
    for g in a:
        n1 = abs(a[g]["noisy_count"] - 100.0)
        n10 = abs(wide[g]["noisy_count"] - 100.0)
        if n1 > 1e-9:
            assert n10 > n1
    import pytest as _pytest

    with _pytest.raises(ValueError):
        dp_laplace_counts(df, "g", "s1", epsilon=0.0)
