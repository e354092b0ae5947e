

def test_l_diversity_audit_homogeneous_class(spark):
    import pytest

    from redpanda_ais_demo_spark.operators.validate import l_diversity_audit

    rows = [
        # class (x, 1): 3 rows, all sensitive 'a' -> l = 1, at risk
        ("x", 1, "a"), ("x", 1, "a"), ("x", 1, "a"),
        # class (x, 2): 2 rows, 2 distinct -> l = 2, at risk for l=3
        ("x", 2, "a"), ("x", 2, "b"),
        # class (y, 1): 4 rows, 3 distinct -> l = 3, safe
        ("y", 1, "a"), ("y", 1, "b"), ("y", 1, "c"), ("y", 1, "a"),
        # NULL sensitive counts as a value: l = 2, at risk
        ("z", 1, None), ("z", 1, "a"),
    ]
    df = spark.createDataFrame(rows, "q1 string, q2 int, s string")
    r = l_diversity_audit(df, ["q1", "q2"], "s", l=3).collect()[0]
    assert r.l_threshold == 3 and r.n_rows == 11 and r.n_classes == 4
    assert r.min_l == 1
    assert r.n_classes_at_risk == 3 and r.n_rows_at_risk == 7
    assert abs(r.at_risk_rate - round(7 / 11, 6)) < 1e-9

    with pytest.raises(ValueError):
        l_diversity_audit(df, [], "s", l=3)
    with pytest.raises(ValueError):
        l_diversity_audit(df, ["q1"], "s", l=1)


def test_fd_profile_known_dependencies(spark):
    import pytest

    from redpanda_ais_demo_spark.operators.validate import fd_profile

    # id -> cat holds exactly; cat -> id badly violated; cat -> grp holds;
    # grp -> cat violated on one row (g3 = 1/6)
    rows = [
        (1, "a", "x"), (2, "a", "x"), (3, "a", "x"),
        (4, "b", "y"), (5, "b", "y"), (6, "c", "y"),
    ]
    df = spark.createDataFrame(rows, "id long, cat string, grp string")
    out = {(r.lhs, r.rhs): r for r in fd_profile(df, ["id", "cat", "grp"]).collect()}
    assert len(out) == 6
    assert out[("id", "cat")].holds and out[("id", "cat")].g3_error == 0.0
    assert not out[("cat", "id")].holds
    assert abs(out[("cat", "id")].g3_error - 0.5) < 1e-9  # keep 1 of each class
    assert out[("cat", "grp")].holds
    g = out[("grp", "cat")]
    assert not g.holds and abs(g.g3_error - round(1 / 6, 6)) < 1e-9
    assert g.n == 6 and g.n_lhs_distinct == 2 and g.n_pair_distinct == 3

    with pytest.raises(ValueError):
        fd_profile(df, ["id"])
