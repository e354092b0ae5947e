"""Structural properties of the round-11 session-2 operators: each new
fold/game operator must agree with an established sibling on the
boundary where their definitions coincide, so a regression in either
breaks a cross-check, not just a fixture hash."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


demand_series = st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=12)


def test_holt_winters_gamma_zero_reduces_to_holt(spark):
    """With gamma = 0 the seasonal ring never updates (stays all-zero),
    so level/trend/forecast must equal holt_linear's EXACTLY — the
    array-state fold collapses to the scalar fold."""
    from redpanda_ais_demo_spark.operators.timeseries import (
        holt_linear,
        holt_winters_additive,
    )

    xs = [120, 80, 200, 150, 90, 310, 170, 60, 240]
    df = spark.createDataFrame(
        [("a", t, x) for t, x in enumerate(xs)], "g string, t long, x long"
    )
    hw = holt_winters_additive(
        df, "g", "t", "x", period=4, alpha=0.5, beta=0.25, gamma=0.0, horizon=3
    ).collect()[0]
    h = holt_linear(df, "g", "t", "x", alpha=0.5, beta=0.25, horizon=3).collect()[0]
    assert hw["level"] == h["level"] and hw["trend"] == h["trend"]
    assert hw["season"] == 0.0
    assert hw["forecast_h3"] == h["forecast_h3"]


def test_croston_dense_series_keeps_unit_interval(spark):
    """All-nonzero demand means every inter-demand interval is exactly
    1, so the interval EWMA is pinned at 1.0 and the forecast equals
    the size level — Croston degrades gracefully to plain ES."""
    from redpanda_ais_demo_spark.operators.timeseries import croston_forecast

    xs = [5, 9, 2, 14, 7, 11]
    df = spark.createDataFrame(
        [("a", t, x) for t, x in enumerate(xs)], "g string, t long, d long"
    )
    out = croston_forecast(df, "g", "t", "d", alpha=0.25).collect()[0]
    assert out["interval_level"] == 1.0
    assert out["forecast_per_period"] == out["size_level"]
    # and the size level is the plain ES fold of the sizes
    z = float(xs[0])
    for x in xs[1:]:
        z = 0.25 * x + 0.75 * z
    assert out["size_level"] == round(z, 6)


def test_track_simplify_eps_extremes(spark):
    """A huge eps keeps exactly the endpoints; eps below the minimum
    step keeps every point — the walk's two boundary behaviours."""
    from redpanda_ais_demo_spark.operators.spatial import simplify_track_radial

    pts = [(1, t, t, 10 * t, 0) for t in range(6)]  # steps of 10
    df = spark.createDataFrame(pts, "k long, t long, tb long, qlat long, qlon long")
    huge = simplify_track_radial(df, "k", "t", "tb", "qlat", "qlon", eps_micro=10**9)
    assert [r.qlat for r in huge.orderBy("t").collect()] == [0, 50]
    tiny = simplify_track_radial(df, "k", "t", "tb", "qlat", "qlon", eps_micro=1)
    assert tiny.count() == 6


def test_kmeans_k1_is_truncated_mean(spark):
    """k = 1 Lloyd is just the quantized truncated mean: every point
    lands in cluster 0 and the centroid matches the hand fold."""
    from redpanda_ais_demo_spark.operators.clustering import kmeans_lloyd

    rows = [(i, [float(v) / 10]) for i, v in enumerate([1, 3, 5, 7])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_lloyd(df, k=1, rounds=2).collect()
    assert {r.cluster for r in out} == {0}
    q = [round(v / 10 * 1e6) for v in (1, 3, 5, 7)]
    cent = sum(q) // 4  # positive: trunc == floor
    dists = {r.vec_id: r.dist_sq for r in out}
    assert dists[0] == (q[0] - cent) ** 2


def test_bradley_terry_symmetric_game_is_uniform(spark):
    """A perfectly balanced round-robin (every pair splits 1-1) must
    rate every item identically at exactly the normalized init."""
    from redpanda_ais_demo_spark.operators.recommend import bradley_terry

    items = ["a", "b", "c"]
    rows = []
    for i in items:
        for j in items:
            if i < j:
                rows += [(i, j), (j, i)]
    df = spark.createDataFrame(rows, "w string, l string")
    out = bradley_terry(df, "w", "l", rounds=4).collect()
    ratings = {r["item"]: r["rating"] for r in out}
    assert len(set(ratings.values())) == 1
    assert all(r["wins"] == 2 and r["games"] == 4 for r in out)


def test_chunk_dedup_rewrite_is_idempotent(spark):
    """Running the rewrite on its own output changes nothing: every
    surviving chunk is already globally unique-or-canonical. (Chunk
    boundaries re-align because surviving chunks concatenate in
    multiples of the chunk size — guaranteed when chunk_size divides
    every doc length, as built here.)"""
    from redpanda_ais_demo_spark.operators.dedup import chunk_dedup_rewrite

    rows = [
        (1, "a b c d"),
        (2, "a b x y"),
        (3, "x y c d p q"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    once = (
        chunk_dedup_rewrite(df, chunk_size=2)
        .select("doc_id", "text_clean")
        .withColumnRenamed("text_clean", "text")
    )
    twice = chunk_dedup_rewrite(once, chunk_size=2)
    out = {r.doc_id: r for r in twice.collect()}
    assert all(r.n_dropped == 0 for r in out.values())


@given(demand_series)
@settings(max_examples=15, deadline=None)
def test_croston_python_replay_property(xs):
    """The operator's documented recurrence, replayed in pure Python,
    is total: forecast defined iff any demand, interval >= 1."""
    started, q, z, p = 0, 0, 0.0, 0.0
    for d in xs:
        q1 = q + 1
        if d > 0 and started == 0:
            started, z, p, q = 1, float(d), float(q1), 0
        elif d > 0:
            z = 0.25 * d + 0.75 * z
            p = 0.25 * q1 + 0.75 * p
            q = 0
        else:
            q = q1
    if any(d > 0 for d in xs):
        assert started == 1 and p >= 1.0 and z > 0
    else:
        assert started == 0
