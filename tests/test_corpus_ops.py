

def test_js_divergence_known_distributions(spark):
    import math

    from redpanda_ais_demo_spark.operators.corpus import js_divergence

    # target: a,a,b ; rest: b,c,c,c — overlapping but distinct
    rows = [(1, "a"), (1, "a"), (1, "b"), (0, "b"), (0, "c"), (0, "c"), (0, "c")]
    df = spark.createDataFrame(rows, "y long, token string")
    r = js_divergence(df, "token", "y").collect()[0]

    p = {"a": 2 / 3, "b": 1 / 3, "c": 0.0}
    q = {"a": 0.0, "b": 1 / 4, "c": 3 / 4}
    jsd = 0.0
    for t in "abc":
        m = (p[t] + q[t]) / 2
        if p[t] > 0:
            jsd += p[t] * math.log(p[t] / m) / 2
        if q[t] > 0:
            jsd += q[t] * math.log(q[t] / m) / 2
    assert r.vocab == 3 and r.n_tokens_target == 3 and r.n_tokens_rest == 4
    assert abs(r.jsd_nats - round(jsd, 6)) < 1e-5
    assert abs(r.jsd_bits - round(jsd / math.log(2), 6)) < 1e-5

    # disjoint vocabularies -> exactly ln 2 nats (1 bit)
    disj = spark.createDataFrame(
        [(1, "a"), (1, "b"), (0, "c"), (0, "d")], "y long, token string"
    )
    rd = js_divergence(disj, "token", "y").collect()[0]
    assert abs(rd.jsd_nats - round(math.log(2), 6)) < 1e-6
    assert rd.jsd_bits == 1.0

    # identical distributions -> 0
    same = spark.createDataFrame(
        [(1, "a"), (1, "b"), (0, "a"), (0, "b")], "y long, token string"
    )
    assert js_divergence(same, "token", "y").collect()[0].jsd_nats == 0.0

    # one-sided corpus -> NULL (undefined), no crash
    solo = spark.createDataFrame([(1, "a")], "y long, token string")
    assert js_divergence(solo, "token", "y").collect()[0].jsd_nats is None


def test_neyman_sample_allocation(spark):
    import pytest

    from redpanda_ais_demo_spark.operators.corpus import neyman_sample

    # stratum A: high variance, stratum B: zero variance, C: tiny
    rows = (
        [("A", i, (i * 997) % 1000) for i in range(200)]
        + [("B", 1000 + i, 500) for i in range(200)]
        + [("C", 2000 + i, i * 100) for i in range(3)]
    )
    df = spark.createDataFrame(rows, "s string, k long, v long")
    out = neyman_sample(df, "s", "v", "k", 100, "t").collect()
    per = {}
    for r in out:
        per.setdefault(r.stratum, []).append(r)
    # zero-variance stratum gets nothing; high-variance dominates
    assert "B" not in per
    assert len(per["A"]) > 80
    # caps at N_h and reports targets consistently
    for s, rs in per.items():
        assert len(rs) == rs[0].n_target <= 200
    # deterministic
    again = neyman_sample(df, "s", "v", "k", 100, "t").collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # salt changes the selection but not the allocation
    other = neyman_sample(df, "s", "v", "k", 100, "u").collect()
    assert len(other) == len(out)
    assert sorted(map(tuple, out)) != sorted(map(tuple, other))

    with pytest.raises(ValueError):
        neyman_sample(df, "s", "v", "k", 0, "t")
