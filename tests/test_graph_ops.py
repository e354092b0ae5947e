

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
