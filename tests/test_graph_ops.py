

def test_hits_integer_recurrence_parity(spark):
    from redpanda_ais_demo_spark.operators.graph import SCALE, hits

    edges = [
        (1, 10), (1, 11), (2, 10), (3, 10), (3, 12), (4, 13),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r.node: (r.hub, r.authority) for r in hits(df, iters=3).collect()}

    # replay the exact integer recurrence in plain Python
    nodes = sorted({u for e in edges for u in e})
    h = {v: SCALE // len(nodes) for v in nodes}
    a = {}
    for _ in range(3):
        raw = {v: 0 for v in nodes}
        for s, d in edges:
            raw[d] += h[s]
        tot = sum(raw.values())
        a = {v: (raw[v] * SCALE) // tot if tot > 0 else 0 for v in nodes}
        raw = {v: 0 for v in nodes}
        for s, d in edges:
            raw[s] += a[d]
        tot = sum(raw.values())
        h = {v: (raw[v] * SCALE) // tot if tot > 0 else 0 for v in nodes}
    for v in nodes:
        assert out[v] == (h[v], a[v]), (v, out[v], (h[v], a[v]))

    # structural sanity: 10 (3 in-links from strong hubs) dominates
    # authorities; 3 (2 out-links incl. the top authority) is the top hub;
    # pure hubs have authority 0, pure authorities hub 0
    assert max(out, key=lambda v: out[v][1]) == 10
    assert max(out, key=lambda v: out[v][0]) in (1, 3)
    assert out[1][1] == 0 and out[10][0] == 0

    import pytest

    with pytest.raises(ValueError):
        hits(df, iters=0)


def test_hits_empty_edges_raises(spark):
    import pytest

    from redpanda_ais_demo_spark.operators.graph import hits

    empty = spark.createDataFrame([], "src long, dst long")
    with pytest.raises(ValueError, match="edges is empty"):
        hits(empty, iters=1)


def test_personalized_pagerank_localizes_mass_to_seed_component(spark):
    from redpanda_ais_demo_spark.operators.graph import SCALE, personalized_pagerank

    # two components: a triangle {1,2,3} (symmetrized) and an isolated
    # edge pair {10,11}; teleport to node 1 only
    und = [(1, 2), (2, 3), (1, 3), (10, 11)]
    edges = und + [(b, a) for a, b in und]
    df = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    out = {r.node: r.rank for r in personalized_pagerank(df, seeds, iters=4).collect()}

    # replay the exact integer recurrence in plain Python
    nodes = sorted({u for e in edges for u in e})
    deg = {v: sum(1 for s, _ in edges if s == v) for v in nodes}
    r = {v: (SCALE if v == 1 else 0) for v in nodes}
    base = (15 * SCALE) // 100
    for _ in range(4):
        s = {v: 0 for v in nodes}
        for a, b in edges:
            s[b] += r[a] // deg[a]
        r = {v: (base if v == 1 else 0) + (85 * s[v]) // 100 for v in nodes}
    assert out == r

    # the component not reachable from the seed holds exactly zero
    assert out[10] == 0 and out[11] == 0
    # the seed dominates, its neighbors split the remainder symmetrically
    assert out[1] > out[2] == out[3] > 0


def test_personalized_pagerank_empty_seeds_raise(spark):
    import pytest

    from redpanda_ais_demo_spark.operators.graph import personalized_pagerank

    df = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    empty = spark.createDataFrame([], "node long")
    with pytest.raises(ValueError, match="non-empty seed set"):
        personalized_pagerank(df, empty)
