import pytest


def test_kmeans_lloyd_separated_clusters_and_exact_dist(spark):
    from redpanda_ais_demo_spark.operators.clustering import kmeans_lloyd

    # two tight blobs around (0.5, 0.5) and (-0.5, -0.5); seeds are the
    # two smallest ids (one from each blob by construction)
    rows = [
        (0, [0.50, 0.50]), (1, [-0.50, -0.50]),
        (2, [0.51, 0.49]), (3, [-0.49, -0.51]),
        (4, [0.52, 0.48]), (5, [-0.48, -0.52]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in kmeans_lloyd(df, k=2, rounds=2).collect()}
    assert {out[i].cluster for i in (0, 2, 4)} == {0}
    assert {out[i].cluster for i in (1, 3, 5)} == {1}

    # exact integer squared distance: replay centroid math in Python
    def quant(v):
        import math
        return [int(math.floor(abs(x * 1e6) + 0.5)) * (1 if x >= 0 else -1) for x in v]

    def trunc_div(s, n):
        return (abs(s) // n) * (1 if s >= 0 else -1)

    blob0 = [quant(v) for i, v in rows if i % 2 == 0]
    cent0 = [trunc_div(sum(c[d] for c in blob0), len(blob0)) for d in range(2)]
    q0 = quant(rows[0][1])
    expect = sum((a - b) ** 2 for a, b in zip(q0, cent0))
    assert out[0].dist_sq == expect

    with pytest.raises(ValueError):
        kmeans_lloyd(df, k=0)
    with pytest.raises(ValueError):
        kmeans_lloyd(df, k=300)
    with pytest.raises(ValueError):
        kmeans_lloyd(df, k=2, rounds=0)
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="non-empty"):
        kmeans_lloyd(empty, k=2)


def test_kmeans_lloyd_empty_cluster_keeps_centroid(spark):
    from redpanda_ais_demo_spark.operators.clustering import kmeans_lloyd

    # k=3 but only two real blobs: seed 2 sits between them and loses
    # all its points after the first update; its cluster must survive
    # frozen (not crash), and every point lands in cluster 0 or 1
    rows = [
        (0, [1.0, 1.0]), (1, [-1.0, -1.0]), (2, [0.9, 0.9]),
        (3, [1.1, 1.1]), (4, [-0.9, -0.9]), (5, [-1.1, -1.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_lloyd(df, k=3, rounds=3).collect()
    assert len(out) == 6
    assert all(r.dist_sq >= 0 for r in out)
