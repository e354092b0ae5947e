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


def test_seasonal_decompose_recovers_planted_shape(spark):
    from redpanda_ais_demo_spark.operators.timeseries import (
        seasonal_decompose_additive,
    )

    # y = 1000*day + weekly bump of +7000 cents on phase 0, 28 days
    rows = []
    for d in range(28):
        v = 100000 + 1000 * d + (7000 if d % 7 == 0 else 0)
        rows.append((d, v))
    df = spark.createDataFrame(rows, "d long, c long")
    out = {r.idx: r for r in seasonal_decompose_additive(df, "d", "c", 7).collect()}
    # edges (first/last 3 days) drop
    assert set(out) == set(range(3, 25))
    # value = trend + seasonal + residual reconstructs exactly at 6dp
    for r in out.values():
        assert abs((r.trend + r.seasonal + r.residual) - r.value) < 1e-6
    # phase 0 carries the bump: its seasonal is the largest by far
    seas = {r.phase: r.seasonal for r in out.values()}
    assert seas[0] == max(seas.values()) and seas[0] > 50.0
    # even period rejected
    with pytest.raises(ValueError, match="odd"):
        seasonal_decompose_additive(df, "d", "c", 4)


def test_lasso_path_shrinks_then_zeros(spark):
    from redpanda_ais_demo_spark.operators.glm import lasso_path_1d

    # y = 3x exactly: OLS slope 3; big lambda kills it
    df = spark.createDataFrame(
        [(i, 3 * i) for i in range(1, 41)], "x long, y long"
    )
    out = {r["lambda"]: r for r in
           lasso_path_1d(df, "x", "y", lambdas=(0, 1, 10**12)).collect()}
    assert abs(out[0].b1 - 3.0) < 1e-6 and out[0].is_zero is False
    assert 0 < out[1].b1 < 3.0  # shrunk but alive
    assert out[10**12].b1 == 0.0 and out[10**12].is_zero is True
    # when b1 = 0 the intercept is the plain mean of y
    assert abs(out[10**12].b0 - sum(3 * i for i in range(1, 41)) / 40) < 1e-6
    with pytest.raises(ValueError, match="lambdas"):
        lasso_path_1d(df, "x", "y", lambdas=())


def test_huber_resists_outlier_better_than_ols(spark):
    from redpanda_ais_demo_spark.operators.glm import huber_irls, lasso_path_1d

    # y = 10x + one gross outlier at x=50
    rows = [(i, 10 * i) for i in range(1, 41)] + [(50, 100000)]
    df = spark.createDataFrame(rows, "x long, y long")
    hub = huber_irls(df, "x", "y", delta=50, iters=8).first()
    ols = lasso_path_1d(df, "x", "y", lambdas=(0,)).first()
    # OLS dragged far above 10 by the outlier; Huber stays close
    assert ols.b1 > 20.0
    assert abs(hub.b1 - 10.0) < 1.0, hub
    assert hub.n == 41 and hub.n_downweighted >= 1
    with pytest.raises(ValueError, match="delta"):
        huber_irls(df, "x", "y", delta=0)


def test_rouge_n_pairs_hand_computed(spark):
    from redpanda_ais_demo_spark.operators.similarity import rouge_n_pairs

    docs = spark.createDataFrame(
        [
            (1, "a b c a b"),      # bigrams: ab, bc, ca, ab
            (2, "a b x y"),        # bigrams: ab, bx, xy
            (3, "q r s t"),        # no overlap with 1
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "id_a long, id_b long")
    out = {(r.key_a, r.key_b): r for r in
           rouge_n_pairs(docs, pairs, n=2).collect()}
    r12 = out[(1, 2)]
    # clipped overlap: min(2,1) for 'a b' = 1; totals 4 and 3
    assert (r12.overlap, r12.total_a, r12.total_b) == (1, 4, 3)
    assert abs(r12.p - 0.25) < 1e-6 and abs(r12.r - 1 / 3) < 1e-6
    assert abs(r12.f1 - 2 / 7) < 1e-6
    # disjoint pair present with zeros, not dropped
    r13 = out[(1, 3)]
    assert r13.overlap == 0 and r13.f1 == 0.0
    # unigram mode counts repetition (clipped): doc1 has a:2 b:2 c:1
    u = {(r.key_a, r.key_b): r for r in
         rouge_n_pairs(docs, pairs, n=1).collect()}[(1, 2)]
    assert (u.overlap, u.total_a, u.total_b) == (2, 5, 4)


def test_kendall_tau_b_hand_computed(spark):
    from redpanda_ais_demo_spark.operators.stats import kendall_tau_b

    perf = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "x long, y long")
    r = kendall_tau_b(perf, "x", "y").first()
    assert (r.n_concordant, r.n_discordant) == (3, 0)
    assert abs(r.tau_b - 1.0) < 1e-6

    anti = spark.createDataFrame([(1, 3), (2, 2), (3, 1)], "x long, y long")
    assert abs(kendall_tau_b(anti, "x", "y").first().tau_b + 1.0) < 1e-6

    # balanced 2x2 grid: C = D = 1 -> tau 0 (ties in x and y corrected)
    grid = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (2, 2)], "x long, y long"
    )
    r2 = kendall_tau_b(grid, "x", "y").first()
    assert (r2.n_concordant, r2.n_discordant) == (1, 1)
    assert r2.tau_b == 0.0


def test_cochran_q_reduces_to_uncorrected_mcnemar(spark):
    from redpanda_ais_demo_spark.operators.stats import cochran_q

    # k=2: Q = (b-c)^2/(b+c) = 16/6 for b=5, c=1
    rows = []
    bid = 0
    for pre, post, cnt in ((0, 1, 5), (1, 0, 1), (1, 1, 3), (0, 0, 2)):
        for _ in range(cnt):
            rows += [(bid, "t1", pre), (bid, "t2", post)]
            bid += 1
    df = spark.createDataFrame(rows, "b long, t string, y long")
    r = cochran_q(df, "b", "t", "y").first()
    assert r.n_blocks == 11 and r.k_treatments == 2
    assert abs(r.q_stat - 16 / 6) < 1e-6
    assert r.n_incomplete_blocks == 0


def test_mann_kendall_hand_computed(spark):
    from redpanda_ais_demo_spark.operators.stats import mann_kendall_dense

    # strictly increasing 5-day series: S = 10, var = 5*4*15/18
    df = spark.createDataFrame(
        [(i, 100 * i) for i in range(1, 6)], "i long, v long"
    )
    r = mann_kendall_dense(df, "i", "v").first()
    assert r.s_stat == 10
    var = 5 * 4 * 15 / 18
    assert abs(r.z_score - 9 / var**0.5) < 1e-6
    # constant series: all ties -> var 0 -> NULL z
    c = spark.createDataFrame([(i, 7) for i in range(5)], "i long, v long")
    assert mann_kendall_dense(c, "i", "v").first().z_score is None


def test_pca2_rank_one_line(spark):
    from redpanda_ais_demo_spark.operators.stats import pca2_closed_form

    # points exactly on y = 2x: lambda2 = 0, loading = (1,2)/sqrt(5)
    df = spark.createDataFrame([(1, 2), (2, 4), (3, 6)], "x long, y long")
    r = pca2_closed_form(df, "x", "y").first()
    assert abs(r.lambda2) < 1e-6
    assert abs(r.explained_ratio - 1.0) < 1e-6
    assert abs(r.loading_x - 1 / 5**0.5) < 1e-6
    assert abs(r.loading_y - 2 / 5**0.5) < 1e-6
    # anti-correlated line y = -x: sign fix keeps loading_x >= 0
    d2 = spark.createDataFrame([(1, -1), (2, -2), (3, -3)], "x long, y long")
    r2 = pca2_closed_form(d2, "x", "y").first()
    assert r2.loading_x > 0 and r2.loading_y < 0


def test_gumbel_moment_fit_hand_computed(spark):
    import math

    from redpanda_ais_demo_spark.operators.stats import gumbel_block_maxima

    rows = [(1, 100), (2, 200), (3, 300)]
    df = spark.createDataFrame(rows, "b long, v long")
    out = {r.return_period: r for r in
           gumbel_block_maxima(df, "b", "v", (10, 100)).collect()}
    r = out[10]
    assert r.n_blocks == 3 and abs(r.mean_max - 2.0) < 1e-6
    assert abs(r.sd_max - 1.0) < 1e-6
    beta = 6**0.5 / math.pi
    assert abs(r.beta - beta) < 1e-5
    mu = 2.0 - 0.5772156649015329 * beta
    assert abs(r.mu - mu) < 1e-5
    lvl = mu - beta * math.log(-math.log(1 - 1 / 10))
    assert abs(r.return_level - lvl) < 1e-4
    assert out[100].return_level > out[10].return_level > r.mean_max
    with pytest.raises(ValueError, match="return_periods"):
        gumbel_block_maxima(df, "b", "v", (1,))


def test_cronbach_alpha_boundaries(spark):
    from redpanda_ais_demo_spark.operators.stats import cronbach_alpha

    # perfectly parallel items (x_ij identical across j): for k items,
    # total var = k^2 * item var -> alpha = k/(k-1) * (1 - 1/k) = 1
    rows = [(s, j, 10 * (s + 1)) for s in range(6) for j in ("a", "b", "c")]
    df = spark.createDataFrame(rows, "s long, j string, x long")
    r = cronbach_alpha(df, "s", "j", "x").first()
    assert r.n_subjects == 6 and r.k_items == 3
    assert abs(r.alpha - 1.0) < 1e-6

    # anti-parallel items with constant row totals: total var 0 -> NULL
    rows2 = [(s, j, v) for s in range(6) for j, v in (("a", 10 + s), ("b", 20 - s))]
    r2 = cronbach_alpha(
        spark.createDataFrame(rows2, "s long, j string, x long"), "s", "j", "x"
    ).first()
    assert r2.alpha is None


def test_hhi_boundaries(spark):
    from redpanda_ais_demo_spark.operators.stats import hhi_concentration

    # monopoly: HHI = 1, effective n = 1
    mono = spark.createDataFrame([("a", 100), ("a", 50)], "e string, v long")
    r = hhi_concentration(mono, "e", "v").first()
    assert r.n_entities == 1 and r.hhi == 1.0 and r.effective_n == 1.0

    # 4 equal entities: HHI = 0.25, normalized 0, effective n = 4
    eq = spark.createDataFrame(
        [(e, 100) for e in "abcd"], "e string, v long"
    )
    r2 = hhi_concentration(eq, "e", "v").first()
    assert abs(r2.hhi - 0.25) < 1e-6
    assert r2.hhi_normalized == 0.0
    assert abs(r2.effective_n - 4.0) < 1e-6


def test_chapman_hand_computed(spark):
    import pyspark.sql.functions as F

    from redpanda_ais_demo_spark.operators.stats import (
        chapman_capture_recapture,
    )

    # n1=4 (keys 1-4 in first), n2=3 (keys 3-6 minus 4... define:
    # first = {1,2,3,4}, second = {3,4,5}: m=2, Chapman = 5*4/3 - 1
    rows = [(k, 1, 0) for k in (1, 2)] + [(k, 1, 1) for k in (3, 4)] + [(5, 0, 1)]
    df = spark.createDataFrame(rows, "k long, a long, b long")
    r = chapman_capture_recapture(
        df, "k", F.col("a") == 1, F.col("b") == 1
    ).first()
    assert (r.n_first, r.n_second, r.n_overlap, r.n_observed) == (4, 3, 2, 5)
    assert abs(r.n_hat - (5 * 4 / 3 - 1)) < 1e-6
    var = 5 * 4 * 2 * 1 / (9 * 4)
    assert abs(r.se - var**0.5) < 1e-6


def test_ratio_delta_ci_degenerate_and_exact_ratio(spark):
    from redpanda_ais_demo_spark.operators.stats import ratio_metric_delta_ci

    # constant per-user ratio y = 3x: R exactly 3, variance exactly 0
    rows = [("A", i, 3 * i) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    r = ratio_metric_delta_ci(df, "g", "y", "x").first()
    assert abs(r.ratio - 3.0) < 1e-6
    assert r.se == 0.0 and r.ci_lo == r.ci_hi == r.ratio

    # varying ratios: CI straddles the pooled ratio, se > 0
    rows2 = [("A", 1, 10), ("A", 1, 2), ("A", 2, 3), ("A", 4, 9)]
    r2 = ratio_metric_delta_ci(
        spark.createDataFrame(rows2, "g string, x long, y long"), "g", "y", "x"
    ).first()
    assert r2.se > 0 and r2.ci_lo < r2.ratio < r2.ci_hi
