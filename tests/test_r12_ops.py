"""Round-12 operators: effect sizes, paired/nonparametric tests,
seasonal decomposition, regularized/robust fits, ROUGE overlap."""

from __future__ import annotations

import pytest


def test_cramers_v_perfect_and_independent(spark):
    from redpanda_ais_demo_spark.operators.stats import cramers_v

    # perfect association: V = 1
    rows = [("a", "x")] * 10 + [("b", "y")] * 10
    df = spark.createDataFrame(rows, "a string, b string")
    r = cramers_v(df, "a", "b").first()
    assert r.n_rows == 20 and r.dof == 1
    assert abs(r.chi2 - 20.0) < 1e-6
    assert abs(r.v - 1.0) < 1e-6

    # exact independence: every cell at its expected count -> V = 0
    rows2 = [(a, b) for a in "ab" for b in "xy" for _ in range(5)]
    r2 = cramers_v(spark.createDataFrame(rows2, "a string, b string"), "a", "b").first()
    assert r2.chi2 == 0.0 and r2.v == 0.0

    # degenerate: one level -> V NULL
    r3 = cramers_v(
        spark.createDataFrame([("a", "x"), ("a", "y")], "a string, b string"),
        "a", "b",
    ).first()
    assert r3.v is None


def test_cohens_d_hand_computed(spark):
    from redpanda_ais_demo_spark.operators.stats import cohens_d

    rows = [("A", 0), ("A", 2), ("B", 2), ("B", 4)]
    df = spark.createDataFrame(rows, "g string, v long")
    r = cohens_d(df, "g", "v", "A", "B").first()
    # SS = 2 each arm, pooled var = (2+2)/2 = 2, d = 2/sqrt(2)
    assert abs(r.d - 2 / 2**0.5) < 1e-6
    assert r.n_control == 2 and r.n_treatment == 2
    # Hedges J = 1 - 3/(4*2-1) = 4/7
    assert abs(r.g - r.d * (1 - 3 / 7)) < 1e-6
    # zero variance -> NULL d
    z = cohens_d(
        spark.createDataFrame([("A", 1), ("A", 1), ("B", 1), ("B", 1)], "g string, v long"),
        "g", "v", "A", "B",
    ).first()
    assert z.d is None


def test_mcnemar_hand_computed(spark):
    from redpanda_ais_demo_spark.operators.stats import mcnemar_test

    rows = (
        [(0, 0)] * 3 + [(1, 1)] * 4 + [(0, 1)] * 5 + [(1, 0)] * 1
    )
    df = spark.createDataFrame(rows, "pre long, post long")
    r = mcnemar_test(df, "pre", "post").first()
    assert (r.n00, r.n01, r.n10, r.n11) == (3, 5, 1, 4)
    assert abs(r.z_score - 4 / 6**0.5) < 1e-6
    assert abs(r.chi2_cc - 9 / 6) < 1e-6
    # no discordant pairs -> NULLs
    r2 = mcnemar_test(
        spark.createDataFrame([(0, 0), (1, 1)], "pre long, post long"),
        "pre", "post",
    ).first()
    assert r2.z_score is None


def test_wilcoxon_signed_rank_hand_computed(spark):
    from redpanda_ais_demo_spark.operators.stats import wilcoxon_signed_rank

    # diffs +1 +2 +3 -4 (one zero dropped): W+ = 1+2+3 = 6,
    # mu = 5, var = 7.5
    rows = [(0, 1), (0, 2), (0, 3), (4, 0), (7, 7)]
    df = spark.createDataFrame(rows, "pre long, post long")
    r = wilcoxon_signed_rank(df, "pre", "post").first()
    assert r.n_pairs == 4
    assert r.w_plus == 6.0
    assert abs(r.z_score - 1 / 7.5**0.5) < 1e-6

    # ties get midranks: diffs +1 +1 -1 -> ranks 2,2,2; W+ = 4
    r2 = wilcoxon_signed_rank(
        spark.createDataFrame([(0, 1), (0, 1), (1, 0)], "pre long, post long"),
        "pre", "post",
    ).first()
    assert r2.w_plus == 4.0


def test_runs_test_hand_computed(spark):
    from redpanda_ais_demo_spark.operators.stats import runs_test_dense

    # sequence + + - - +  -> runs 3, n1=3, n2=2
    rows = [(1, 1), (2, 1), (3, -1), (4, -1), (5, 1)]
    df = spark.createDataFrame(rows, "i long, s long")
    r = runs_test_dense(df, "i", "s").first()
    assert (r.n_pos, r.n_neg, r.runs) == (3, 2, 3)
    mu = 2 * 3 * 2 / 5 + 1
    var = 12 * (12 - 5) / (25 * 4)
    assert abs(r.z_score - (3 - mu) / var**0.5) < 1e-6

    # a gap in the index must raise, not silently bridge
    with pytest.raises(ValueError, match="dense"):
        runs_test_dense(
            spark.createDataFrame([(1, 1), (3, 1)], "i long, s long"), "i", "s"
        )


def test_friedman_hand_computed(spark):
    from redpanda_ais_demo_spark.operators.stats import friedman_test

    # 3 blocks, identical orderings -> Q = 6 (max separation for k=3,n=3)
    rows = [
        (b, t, v)
        for b in range(3)
        for t, v in (("t1", 10), ("t2", 20), ("t3", 30))
    ]
    df = spark.createDataFrame(rows, "b long, t string, v long")
    r = friedman_test(df, "b", "t", "v").first()
    assert r.n_blocks == 3 and r.k_treatments == 3
    assert abs(r.q_stat - 6.0) < 1e-6
    assert abs(r.q_corrected - 6.0) < 1e-6
    assert r.n_incomplete_blocks == 0

    # incomplete block excluded and counted
    rows2 = rows + [(9, "t1", 5)]
    r2 = friedman_test(
        spark.createDataFrame(rows2, "b long, t string, v long"), "b", "t", "v"
    ).first()
    assert r2.n_blocks == 3 and r2.n_incomplete_blocks == 1
    assert abs(r2.q_stat - 6.0) < 1e-6
