"""Round-11 operators: DSIR importance weights (hand-built corpora),
ECE reliability readout (hand-computed bins), and the interval-overlap
join (brute-force parity, half-open boundaries, canonical-cell dedup).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_dsir_weights_prefer_target_like_docs(spark):
    from redpanda_ais_demo_spark.operators.corpus import dsir_hashed_ngram_weights

    rows = (
        # target corpus: talks about alpha
        [(i, "tgt", "alpha beam alpha core") for i in range(4)]
        # source pool: beta docs, plus one alpha-like candidate
        + [(10 + i, "src", "beta gamma beta delta") for i in range(4)]
        + [(99, "src", "alpha beam alpha probe")]
    )
    docs = spark.createDataFrame(rows, "doc_id long, grp string, text string")
    out = {
        r.doc_id: r
        for r in dsir_hashed_ngram_weights(
            docs, F.col("grp") == "tgt", n_buckets=512
        ).collect()
    }
    assert set(out) == {0, 1, 2, 3, 10, 11, 12, 13, 99}
    # 4 tokens -> 4 unigrams + 3 bigrams
    assert all(r.n_grams == 7 for r in out.values())
    # the alpha-like source doc must outscore every beta doc
    beta_scores = [out[10 + i].logw_micro for i in range(4)]
    assert out[99].logw_micro > max(beta_scores)
    # target docs score highest of all (they ARE the target profile)
    assert out[0].logw_micro > out[99].logw_micro
    # deterministic: same inputs, same exact integers
    again = {
        r.doc_id: r.logw_micro
        for r in dsir_hashed_ngram_weights(
            docs, F.col("grp") == "tgt", n_buckets=512
        ).collect()
    }
    assert again == {k: v.logw_micro for k, v in out.items()}
    with pytest.raises(ValueError, match="n_buckets"):
        dsir_hashed_ngram_weights(docs, F.col("grp") == "tgt", n_buckets=1)


def test_ece_binned_hand_computed(spark):
    from redpanda_ais_demo_spark.operators.stats import ece_binned

    # two bins: p=0.1 (4 rows, 1 positive -> conf .1, acc .25, gap .15)
    #           p=0.95 (2 rows, 2 positive -> conf .95, acc 1, gap .05)
    rows = [(100_000, 1), (100_000, 0), (100_000, 0), (100_000, 0),
            (950_000, 1), (950_000, 1)]
    df = spark.createDataFrame(rows, "p long, y long")
    out = {r.bin: r for r in ece_binned(df, F.col("p"), F.col("y"), 10).collect()}
    assert set(out) == {1, 9}
    assert out[1].n == 4 and out[1].conf == 0.1 and out[1].acc == 0.25
    assert out[1].gap == 0.15
    assert out[9].n == 2 and out[9].conf == 0.95 and out[9].acc == 1.0
    assert out[9].gap == pytest.approx(0.05)
    # ece = (4*.15 + 2*.05) / 6 = 0.7/6
    assert out[1].ece == out[9].ece == round(0.7 / 6, 6)
    # p = 1.0 exactly lands in the LAST bin, not a phantom bin 10
    edge = ece_binned(
        spark.createDataFrame([(1_000_000, 1)], "p long, y long"),
        F.col("p"), F.col("y"), 10,
    ).collect()
    assert len(edge) == 1 and edge[0].bin == 9
    with pytest.raises(ValueError, match="n_bins"):
        ece_binned(df, F.col("p"), F.col("y"), 1)


@pytest.mark.parametrize("cell", [1, 3, 7, 100])
def test_interval_overlap_join_matches_bruteforce(spark, cell):
    from redpanda_ais_demo_spark.operators.joins import interval_overlap_join

    # deterministic pseudo-random intervals, including touching pairs,
    # nested pairs, duplicates, multi-cell spans, and inverted rows
    rows_a = [(i, (i * 37) % 50, (i * 37) % 50 + (i * 13) % 17 - 2) for i in range(40)]
    rows_b = [(j, (j * 29) % 50, (j * 29) % 50 + (j * 11) % 23 - 2) for j in range(40)]
    a = spark.createDataFrame(rows_a, "ida long, lo_a long, hi_a long")
    b = spark.createDataFrame(rows_b, "idb long, lo_b long, hi_b long")
    got = {
        (r.ida, r.idb)
        for r in interval_overlap_join(a, b, "lo_a", "hi_a", "lo_b", "hi_b", cell).collect()
    }
    want = {
        (ia, ib)
        for ia, la, ha in rows_a
        for ib, lb, hb in rows_b
        if la < ha and lb < hb and la < hb and lb < ha
    }
    assert got == want
    # each pair exactly once (canonical-cell dedup, no distinct pass)
    dup = interval_overlap_join(a, b, "lo_a", "hi_a", "lo_b", "hi_b", cell).count()
    assert dup == len(want)


def test_interval_overlap_half_open_boundary(spark):
    from redpanda_ais_demo_spark.operators.joins import interval_overlap_join

    a = spark.createDataFrame([(1, 0, 10)], "ida long, lo_a long, hi_a long")
    b = spark.createDataFrame(
        [(1, 10, 20), (2, 9, 10), (3, 0, 10)], "idb long, lo_b long, hi_b long"
    )
    got = {
        r.idb
        for r in interval_overlap_join(a, b, "lo_a", "hi_a", "lo_b", "hi_b", 5).collect()
    }
    # [0,10) vs [10,20): touching, NOT overlapping (half-open)
    assert got == {2, 3}
    with pytest.raises(ValueError, match="cell_size"):
        interval_overlap_join(a, b, "lo_a", "hi_a", "lo_b", "hi_b", 0)


def test_fs_linkage_rare_agreement_outscores_common(spark):
    from redpanda_ais_demo_spark.operators.dedup import fs_linkage_scores

    # block "x": keys 1,2 agree on a RARE brand; keys 3,4 agree on the
    # COMMON brand; keys 5,6 disagree on brand. All share type.
    rows = [
        (1, "x", "rare", "t"), (2, "x", "rare", "t"),
        (3, "x", "common", "t"), (4, "x", "common", "t"),
        (5, "x", "common", "t"), (6, "x", "other", "t"),
        # filler giving "common" high frequency in other blocks
        *[(10 + i, f"b{i}", "common", "t") for i in range(10)],
    ]
    df = spark.createDataFrame(rows, "k long, blk string, brand string, typ string")
    out = {
        (r.key_a, r.key_b): r.score_micro
        for r in fs_linkage_scores(
            df, "k", "blk", ["brand", "typ"], m_prior=0.9,
            threshold_micro=-10**15,
        ).collect()
    }
    # rare-brand agreement is stronger evidence than common-brand
    assert out[(1, 2)] > out[(3, 4)]
    # any agreement beats disagreement
    assert out[(3, 4)] > out[(5, 6)]
    # blocking: no cross-block pairs
    assert all(ka in (1, 2, 3, 4, 5, 6) and kb in (1, 2, 3, 4, 5, 6) for ka, kb in out)
    import pytest as _p

    with _p.raises(ValueError, match="field_cols"):
        fs_linkage_scores(df, "k", "blk", [], 0.9)
    with _p.raises(ValueError, match="m_prior"):
        fs_linkage_scores(df, "k", "blk", ["brand"], 1.0)


def test_amoc_changepoint_finds_planted_shift(spark):
    from redpanda_ais_demo_spark.operators.timeseries import amoc_changepoint

    # mean 10.00 for buckets 0..9, mean 30.00 for buckets 10..19 —
    # the argmax split must be the last pre-shift bucket (t=9)
    rows = [
        (b * 100 + i, 10.0 if b < 10 else 30.0)
        for b in range(20)
        for i in range(5)
    ]
    df = spark.createDataFrame(rows, "t long, v double").select(
        F.timestamp_seconds(F.col("t")).alias("ts"), F.col("v")
    )
    out = amoc_changepoint(df, "ts", "v", bucket_sec=100).collect()
    assert len(out) == 1
    r = out[0]
    assert r.cp_ts == 900
    assert r.n_pre == 50 and r.n_post == 50
    assert r.mean_pre == 10.0 and r.mean_post == 30.0
    import pytest as _p

    with _p.raises(ValueError, match="bucket_sec"):
        amoc_changepoint(df, "ts", "v", bucket_sec=0)


def test_benford_audit_hand_distribution(spark):
    import math

    from redpanda_ais_demo_spark.operators.validate import (
        benford_first_digit_audit,
    )

    # 100 amounts with first digit 1, 100 with first digit 9 (gross
    # Benford violation), plus sub-threshold rows that must be excluded
    rows = (
        [(100 + i,) for i in range(100)]
        + [(900 + i,) for i in range(100)]
        + [(5,), (99,)]
    )
    df = spark.createDataFrame(rows, "cents long")
    out = {r.digit: r for r in benford_first_digit_audit(df, F.col("cents")).collect()}
    assert set(out) == {1, 9}
    assert out[1].n == 100 and out[9].n == 100
    p1 = math.log10(2.0)
    assert out[1].expected_n == round(200 * p1, 6)
    # chi2 identical on every row, equals the micro-quantized sum
    assert out[1].chi2 == out[9].chi2 > 0
    import pytest as _p

    with _p.raises(ValueError, match="min_cents"):
        benford_first_digit_audit(df, F.col("cents"), min_cents=0)


def test_lexicon_sentiment_hand_scores(spark):
    from redpanda_ais_demo_spark.operators.corpus import lexicon_sentiment_scores

    docs = spark.createDataFrame(
        [
            (1, "this is great and i love it"),       # 3 + 3 = +6
            (2, "terrible slow crash"),               # -4 -1 -3 = -8
            (3, "nothing matches here"),              # 0 hits -> neutral
            (4, "good bad"),                          # 2 - 2 = 0 -> neutral
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in lexicon_sentiment_scores(docs).collect()}
    assert len(out) == 4
    assert (out[1].score, out[1].n_hits, out[1].label) == (6, 2, "positive")
    assert (out[2].score, out[2].n_hits, out[2].label) == (-8, 3, "negative")
    assert (out[3].score, out[3].n_hits, out[3].label) == (0, 0, "neutral")
    assert (out[4].score, out[4].n_hits, out[4].label) == (0, 2, "neutral")
    # injectable lexicon
    custom = {r.doc_id: r.score for r in lexicon_sentiment_scores(
        docs, lexicon={"nothing": -5}
    ).collect()}
    assert custom == {1: 0, 2: 0, 3: -5, 4: 0}
    import pytest as _p

    with _p.raises(ValueError, match="lexicon"):
        lexicon_sentiment_scores(docs, lexicon={})


def test_qgram_fuzzy_pairs_lossless_vs_bruteforce(spark):
    # includes SHORT strings where the qgram bound reaches zero
    # ("ab" vs "cd" at distance 2 share no bigram) and cross-"block"
    # matches a last-token blocker would miss ("hot rod" vs "hot rim")
    from redpanda_ais_demo_spark.operators.similarity import fuzzy_string_pairs

    vocab = ["cold bolt", "old bolt", "old ring", "red ring", "hot rod",
             "hot rim", "ab", "cd", "abc", "zzz", "widget", "gadget",
             "completely different"]
    df = spark.createDataFrame([(v,) for v in vocab for _ in range(3)], "s string")
    got = {
        (r.name_a, r.name_b, r.dist)
        for r in fuzzy_string_pairs(df, "s", max_dist=2, q=2).collect()
    }

    def lev(a, b):
        m = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
        for i in range(len(a) + 1):
            m[i][0] = i
        for j in range(len(b) + 1):
            m[0][j] = j
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                m[i][j] = min(
                    m[i - 1][j] + 1,
                    m[i][j - 1] + 1,
                    m[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
                )
        return m[len(a)][len(b)]

    want = {
        (a, b, lev(a, b))
        for i, a in enumerate(sorted(vocab))
        for b in sorted(vocab)[i + 1:]
        if lev(a, b) <= 2
    }
    assert got == want
    assert ("ab", "cd", 2) in got            # short-branch recall
    assert ("hot rim", "hot rod", 2) in got  # cross-block recall
    import pytest as _p

    with _p.raises(ValueError, match="max_dist"):
        fuzzy_string_pairs(df, "s", max_dist=0)
    with _p.raises(ValueError, match="q must"):
        fuzzy_string_pairs(df, "s", q=1)


def test_permutation_test_detects_planted_effect(spark):
    from redpanda_ais_demo_spark.operators.stats import (
        permutation_test_mean_diff,
    )

    # planted effect: treated mean 1000, control mean 100 — a gap no
    # balanced hash re-assignment of these values can reproduce, so the
    # add-one p-value must sit at its floor 1/(B+1)
    rows = [(i, 1000 + (i % 7), 1) for i in range(40)] + [
        (100 + i, 100 + (i % 7), 0) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "k long, x long, t long")
    r = permutation_test_mean_diff(df, "k", "x", "t", salt="t", n_perms=32).first()
    assert r.n == 80 and r.n_treated == 40
    assert abs(r.diff_obs - 900.0) < 1.0
    assert r.n_exceed == 0
    assert r.p_value == round(1 / 33, 6)

    # null: identical distributions in both arms — most re-assignments
    # exceed the (tiny) observed gap, so the p-value lands high
    null_rows = [(i, i % 11, i % 2) for i in range(200)]
    dn = spark.createDataFrame(null_rows, "k long, x long, t long")
    rn = permutation_test_mean_diff(dn, "k", "x", "t", salt="t", n_perms=32).first()
    assert rn.p_value > 0.3

    # determinism: same salt, same exact outputs
    r2 = permutation_test_mean_diff(df, "k", "x", "t", salt="t", n_perms=32).first()
    assert (r.n_exceed, r.p_value, r.diff_obs) == (
        r2.n_exceed,
        r2.p_value,
        r2.diff_obs,
    )

    # degenerate observed assignment (all treated): diff_obs NULL, no
    # ANSI divide-by-zero, p at the all-excluded ceiling
    alltr = spark.createDataFrame([(i, i, 1) for i in range(8)], "k long, x long, t long")
    ra = permutation_test_mean_diff(alltr, "k", "x", "t", salt="t", n_perms=8).first()
    assert ra.diff_obs is None and ra.n_exceed == 0

    with pytest.raises(ValueError):
        permutation_test_mean_diff(df, "k", "x", "t", salt="t", n_perms=0)


def test_gini_stump_finds_planted_cut(spark):
    from redpanda_ais_demo_spark.operators.stats import gini_stump

    # perfectly separable at x = 100 (bins of 10): label flips there
    rows = [(float(x), 0) for x in range(0, 100)] + [
        (float(x), 1) for x in range(100, 200)
    ]
    df = spark.createDataFrame(rows, "x double, y long")
    r = gini_stump(df, "x", "y", bin_width=10).first()
    assert r.threshold == 100
    assert (r.n_left, r.k_left, r.n_right, r.k_right) == (100, 0, 100, 100)
    # parent gini = 0.5, children pure -> gain exactly 0.5
    assert r.gini_gain == 0.5

    # uninformative label: every candidate ties at gain 0; the tie
    # breaks toward the smallest threshold
    flat = spark.createDataFrame(
        [(float(x), x % 2) for x in range(100)], "x double, y long"
    )
    rf = gini_stump(flat, "x", "y", bin_width=10).first()
    assert rf.gini_gain == 0.0
    assert rf.threshold == 10

    with pytest.raises(ValueError):
        gini_stump(df, "x", "y", bin_width=0)


def test_ndcg_at_k_hand_computed(spark):
    import math

    from redpanda_ais_demo_spark.operators.retrieval import (
        ndcg_at_k,
        ndcg_discounts_nano,
    )

    d, p = ndcg_discounts_nano(3)
    assert d[0] == 10**9  # 1/log2(2) = 1
    assert p == [0, d[0], d[0] + d[1], d[0] + d[1] + d[2]]

    # query 1: rels (2, 0, 1) at ranks 1..3; ideal pool n2=1, n1=1 ->
    # ideal packs the 2 then the 1: idcg = 3*d1 + d2
    ranked = spark.createDataFrame(
        [(1, 1, 2), (1, 2, 0), (1, 3, 1), (2, 1, 0), (2, 2, 0), (2, 3, 0)],
        "q long, rank long, rel long",
    )
    counts = spark.createDataFrame(
        [(1, 1, 1), (2, 0, 0)], "q long, n2 long, n1 long"
    )
    out = {
        r.q: r
        for r in ndcg_at_k(
            ranked, counts, query_col="q", rank_col="rank", k=3
        ).collect()
    }
    dcg1 = 3 * d[0] + 1 * d[2]
    idcg1 = 3 * d[0] + d[1]
    assert out[1].dcg_nano == dcg1 and out[1].idcg_nano == idcg1
    expect = round(float(dcg1) / float(idcg1), 6)
    assert math.isclose(out[1].ndcg, expect, abs_tol=1e-9)
    # query 2 has an empty ideal pool: NULL ndcg, zero dcg
    assert out[2].idcg_nano == 0 and out[2].ndcg is None

    # perfect ranking scores exactly 1.0
    perfect = spark.createDataFrame(
        [(9, 1, 2), (9, 2, 1)], "q long, rank long, rel long"
    )
    pc = spark.createDataFrame([(9, 1, 1)], "q long, n2 long, n1 long")
    rp = ndcg_at_k(perfect, pc, query_col="q", k=3).first()
    assert rp.ndcg == 1.0

    with pytest.raises(ValueError):
        ndcg_at_k(ranked, counts, query_col="q", k=0)


def test_markov_absorption_hand_chain(spark):
    from datetime import datetime, timedelta

    from redpanda_ais_demo_spark.operators.timeseries import markov_absorption

    # deterministic two-state chain: from 'a' the next event is always
    # 'buy' (direct absorb); from 'b' it is always 'a'. Sessions are
    # tight (no 30-min gaps), so no '__end' mass anywhere:
    # p(a) = 1 exactly, p(b) -> p(a) = 1
    t0 = datetime(2026, 1, 1)
    rows = []
    for u in range(20):
        rows += [
            (u, t0 + timedelta(seconds=1), 1, "b"),
            (u, t0 + timedelta(seconds=2), 2, "a"),
            (u, t0 + timedelta(seconds=3), 3, "buy"),
        ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long, event_type string")
    out = {r.state: r for r in markov_absorption(
        df, "user_id", "ts", "event_type", "event_id", "buy"
    ).collect()}
    assert set(out) == {"a", "b"}
    assert out["a"].p_convert == 1.0 and out["b"].p_convert == 1.0
    assert out["a"].n_out == 20 and out["b"].n_out == 20

    # half the 'a' sessions end instead of converting -> p(a) = 0.5;
    # 'b' always leads to 'a' -> p(b) = 0.5 too (value iteration carries it)
    rows2 = []
    for u in range(10):
        rows2 += [
            (u, t0 + timedelta(seconds=1), 1, "b"),
            (u, t0 + timedelta(seconds=2), 2, "a"),
            (u, t0 + timedelta(seconds=3), 3, "buy"),
        ]
    for u in range(10, 20):
        rows2 += [
            (u, t0 + timedelta(seconds=1), 1, "b"),
            (u, t0 + timedelta(seconds=2), 2, "a"),
        ]
    df2 = spark.createDataFrame(rows2, "user_id long, ts timestamp, event_id long, event_type string")
    out2 = {r.state: r for r in markov_absorption(
        df2, "user_id", "ts", "event_type", "event_id", "buy"
    ).collect()}
    assert out2["a"].p_convert == 0.5
    assert out2["b"].p_convert == 0.5

    # bounded-domain contract: a data-scale state column fails fast
    big = spark.createDataFrame(
        [(1, t0 + timedelta(seconds=i), i, f"s{i}") for i in range(40)],
        "user_id long, ts timestamp, event_id long, event_type string",
    )
    with pytest.raises(ValueError):
        markov_absorption(
            big, "user_id", "ts", "event_type", "event_id", "buy",
            max_states=5,
        )

    with pytest.raises(ValueError):
        markov_absorption(
            df, "user_id", "ts", "event_type", "event_id", "buy", iters=0
        )


def test_cox_ph_binary_closed_form_and_symmetry(spark):
    import math

    from redpanda_ais_demo_spark.operators.stats import cox_ph_binary

    # single event time: everyone at risk at t=1, d0=10 of 50 controls
    # and d1=20 of 50 treated churn there -> the partial-likelihood MLE
    # is beta* = ln(d1*n0 / (d0*n1)) = ln 2 exactly
    rows = (
        [(1, 1, 0)] * 10 + [(1, 0, 0)] * 40 + [(1, 1, 1)] * 20 + [(1, 0, 1)] * 30
    )
    df = spark.createDataFrame(rows, "t long, ev long, x long")
    r = cox_ph_binary(df, "t", "ev", "x", iters=6).first()
    assert abs(r.beta_micro / 1e6 - math.log(2.0)) < 1e-3
    assert abs(r.hazard_ratio - 2.0) < 1e-2
    assert r.n == 100 and r.n_events == 30
    assert r.se is not None and r.z > 0

    # flipping the covariate negates the fit (up to the micro
    # quantization of e^beta, which is not sign-symmetric)
    flipped = df.selectExpr("t", "ev", "1 - x AS x")
    rf = cox_ph_binary(flipped, "t", "ev", "x", iters=6).first()
    assert abs(rf.beta_micro + r.beta_micro) <= 2
    assert rf.z is not None and abs(rf.z + r.z) < 1e-4

    # no events anywhere: information is zero -> frozen null fit
    cens = spark.createDataFrame([(1, 0, 0), (2, 0, 1)], "t long, ev long, x long")
    rc = cox_ph_binary(cens, "t", "ev", "x", iters=6).first()
    assert rc.beta_micro == 0 and rc.se is None and rc.z is None
    assert rc.hazard_ratio == 1.0

    with pytest.raises(ValueError):
        cox_ph_binary(df, "t", "ev", "x", iters=0)


def test_pinball_loss_grades_quantile_bands(spark):
    # the declared query's fold on a hand fixture via the registry fn
    from redpanda_ais_demo_spark.plans.registry import REGISTRY, _load_all

    _load_all()
    # direct loss math: tau-weighted asymmetry. Build through the
    # operator composition by hand instead of parquet: train y in
    # {0..9} per group -> q10=0 (ceil(.1*10)=1st), q50=4, q90=8;
    # test y=10 always over it: loss(tau) = tau*(10-q)
    from pyspark.sql import functions as F
    from redpanda_ais_demo_spark.operators.ordered import (
        quantiles_disc_grouped,
    )

    train = spark.createDataFrame(
        [("g", v) for v in range(10)], "grp string, y long"
    )
    qs = {
        r.p: r.value
        for r in quantiles_disc_grouped(train, "grp", "y", [0.1, 0.5, 0.9]).collect()
    }
    assert qs == {0.1: 0, 0.5: 4, 0.9: 8}
    # pinball identities for an over-forecast observation y=10
    for tau, q in qs.items():
        loss = tau * max(10 - q, 0) + (1 - tau) * max(q - 10, 0)
        assert loss == tau * (10 - q)


def test_poststrat_registry_query_consistency(spark):
    # hand fixture through the same registry fold: on data where the
    # treatment effect is CONSTANT across strata, the post-stratified
    # ATE equals the per-stratum gap exactly, even when arm imbalance
    # biases the unadjusted diff
    from pyspark.sql import functions as F

    # stratum 0: control-heavy, outcomes low; stratum 1: treated-heavy,
    # outcomes high; within each stratum effect = +10 exactly
    rows = (
        [(0, 0, 100)] * 30 + [(1, 0, 110)] * 10
        + [(0, 1, 200)] * 10 + [(1, 1, 210)] * 30
    )
    df = spark.createDataFrame(rows, "t long, s long, y long")
    strata = df.groupBy("s").agg(
        F.count(F.lit(1)).alias("ns"),
        F.sum("t").alias("nst"),
        F.sum(F.when(F.col("t") == 1, F.col("y")).otherwise(0)).alias("sst"),
        F.sum(F.when(F.col("t") == 0, F.col("y")).otherwise(0)).alias("ssc"),
    )
    used = strata.filter((F.col("nst") > 0) & (F.col("nst") < F.col("ns")))
    gaps = used.selectExpr(
        "ns",
        "CAST(sst AS DOUBLE)/CAST(nst AS DOUBLE)"
        " - CAST(ssc AS DOUBLE)/CAST(ns - nst AS DOUBLE) AS gap",
    ).collect()
    assert all(abs(r.gap - 10.0) < 1e-9 for r in gaps)
    post = sum(r.ns * 10.0 for r in gaps) / sum(r.ns for r in gaps)
    assert post == 10.0
    # the unadjusted diff is biased far above 10 by the confounded mix
    tot = df.agg(
        F.sum(F.when(F.col("t") == 1, F.col("y")).otherwise(0)).alias("st"),
        F.sum("t").alias("nt"),
        F.sum(F.when(F.col("t") == 0, F.col("y")).otherwise(0)).alias("sc"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    unadj = tot.st / tot.nt - tot.sc / (tot.n - tot.nt)
    assert unadj > 40  # confounding inflates the naive readout


def test_youden_threshold_perfect_separation(spark, tmp_path):
    # build a tiny parquet fixture so the registry callable itself runs:
    # en docs are exactly those with n_chars >= 300 -> J = 1 at 300
    import os

    sf = str(tmp_path)
    docs = spark.createDataFrame(
        [(i, "t", ("en" if 300 + i else "x"), "s", 300 + i) for i in range(50)]
        + [(100 + i, "t", "de", "s", 100 + i % 150) for i in range(50)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    from redpanda_ais_demo_spark.plans.registry import REGISTRY, _load_all

    _load_all()
    r = REGISTRY["youden_threshold_en_by_length"].fn(spark, sf).first()
    assert r.youden_j == 1.0
    assert r.tpr == 1.0 and r.fpr == 0.0
    # negatives end at 149 and en starts at 300; every cut in between
    # separates perfectly, and the tie breaks toward the SMALLEST
    # threshold (the bin after the last negative: (1+1)*100 = 200)
    assert r.threshold == 200


def test_iv_wald_recovers_planted_late(spark, tmp_path):
    # planted encouragement design through the registry fold itself:
    # all encouraged users sign up, none of the others do (uptake diff
    # = 1), and signing up adds exactly 500 cents -> LATE = ITT = 500
    import os
    from datetime import datetime, timedelta

    from redpanda_ais_demo_spark.operators.corpus import split_bucket_col
    from pyspark.sql import functions as F

    # find user ids on each side of the exp-r8 split first
    ids = spark.createDataFrame([(i,) for i in range(400)], "user_id long")
    sides = {
        r.user_id: r.z
        for r in ids.select(
            "user_id",
            (split_bucket_col(F.col("user_id"), "exp-r8") >= 5000)
            .cast("long")
            .alias("z"),
        ).collect()
    }
    t0 = datetime(2026, 1, 1)
    rows = []
    eid = 0
    for uid, z in sides.items():
        if z == 1:  # encouraged -> signs up -> buys 1000 + 500
            rows.append((uid, eid, "signup", 0.0, t0)); eid += 1
            rows.append((uid, eid, "purchase", 15.0, t0 + timedelta(1))); eid += 1
        else:  # not encouraged -> no signup -> buys 1000
            rows.append((uid, eid, "purchase", 10.0, t0 + timedelta(1))); eid += 1
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, value double, ts timestamp"
    )
    sf = str(tmp_path)
    ev.write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))
    from redpanda_ais_demo_spark.plans.registry import REGISTRY, _load_all

    _load_all()
    r = REGISTRY["iv_wald_signup_on_purchase"].fn(spark, sf).first()
    assert r.uptake_diff == 1.0
    assert r.itt == 500.0 and r.wald_late == 500.0
    assert r.first_stage_z > 10  # perfectly strong instrument


def test_ransac_finds_consensus_line_under_outliers(spark):
    from redpanda_ais_demo_spark.operators.stats import ransac_line

    # 180 points exactly on y = 7x + 3; 20 gross outliers far above.
    # OLS would bend toward the outliers; the consensus refit on exact
    # inliers (eps=0) recovers the line EXACTLY
    rows = [(i, i % 50, 7 * (i % 50) + 3) for i in range(180)] + [
        (1000 + i, i % 50, 100000 + i) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "k long, x long, y long")
    r = ransac_line(df, "k", "x", "y", eps=0, n_candidates=16).first()
    assert r.n == 200
    assert r.n_inliers == 180
    assert r.slope == 7.0 and r.intercept == 3.0

    # determinism: identical winner and fit run-over-run
    r2 = ransac_line(df, "k", "x", "y", eps=0, n_candidates=16).first()
    assert (r.best_candidate, r.n_inliers, r.slope) == (
        r2.best_candidate,
        r2.n_inliers,
        r2.slope,
    )

    with pytest.raises(ValueError):
        ransac_line(df, "k", "x", "y", eps=-1)
    with pytest.raises(ValueError):
        ransac_line(df, "k", "x", "y", eps=0, n_candidates=0)
    # all-vertical seed pairs: constant x
    flat = spark.createDataFrame([(i, 5, i) for i in range(40)], "k long, x long, y long")
    with pytest.raises(ValueError):
        ransac_line(flat, "k", "x", "y", eps=0)


def test_km_rmst_hand_curve(spark):
    from redpanda_ais_demo_spark.operators.stats import km_rmst

    # 10 subjects, all churn at day 5 exactly: S = 1 on [0,5), 0 after
    # -> RMST(14) = 5.0 exactly
    rows = [(5, 1, "g")] * 10
    df = spark.createDataFrame(rows, "t long, ev int, grp string")
    r = km_rmst(df, "t", "ev", "grp", tau=14).first()
    assert r.rmst == 5.0 and r.tau == 14

    # half churn at 4, half censored at 12: S = 1 on [0,4),
    # 0.5 on [4,12), then (censoring) still 0.5 to tau
    # RMST(14) = 4 + 0.5*10 = 9
    rows2 = [(4, 1, "g")] * 5 + [(12, 0, "g")] * 5
    df2 = spark.createDataFrame(rows2, "t long, ev int, grp string")
    r2 = km_rmst(df2, "t", "ev", "grp", tau=14).first()
    assert r2.rmst == 9.0

    # no events at all: S = 1 everywhere -> RMST = tau
    cens = spark.createDataFrame([(3, 0, "g")] * 4, "t long, ev int, grp string")
    rc = km_rmst(cens, "t", "ev", "grp", tau=14).first()
    assert rc.rmst == 14.0

    # horizon clamps: events beyond tau don't reduce the area
    late = spark.createDataFrame([(20, 1, "g")] * 4, "t long, ev int, grp string")
    rl = km_rmst(late, "t", "ev", "grp", tau=14).first()
    assert rl.rmst == 14.0

    import pytest as _pt

    with _pt.raises(ValueError):
        km_rmst(df, "t", "ev", "grp", tau=0)


def test_negbin_and_evalue_hand_values(spark, tmp_path):
    import os

    from redpanda_ais_demo_spark.plans.registry import REGISTRY, _load_all

    _load_all()
    sf = str(tmp_path)
    # counts 0 and 10 alternating over 40 parts: mean 5, pop var 25
    # -> overdispersed, r = 25/(25-5) = 1.25, p = 5/25 = 0.2
    part = spark.createDataFrame(
        [(i, f"p{i}", "m", "b", "t", 1, "c", 1.0, "x") for i in range(40)],
        "p_partkey long, p_name string, p_mfgr string, p_brand string,"
        " p_type string, p_size int, p_container string,"
        " p_retailprice double, p_comment string",
    )
    li_rows = []
    k = 0
    for i in range(40):
        if i % 2 == 1:
            for _ in range(10):
                li_rows.append((k, i)); k += 1
    li = spark.createDataFrame(li_rows, "l_orderkey long, l_partkey long")
    part.write.mode("overwrite").parquet(os.path.join(sf, "part.parquet"))
    li.write.mode("overwrite").parquet(os.path.join(sf, "lineitem.parquet"))
    r = REGISTRY["negbin_fit_demand"].fn(spark, sf).first()
    assert r.mean == 5.0 and r.variance == 25.0
    assert r.overdispersed and r.nb_r == 1.25 and r.nb_p == 0.2

    # E-value textbook: RR = 2 -> E = 2 + sqrt(2) = 3.414214
    import math

    rr = 2.0
    assert round(rr + math.sqrt(rr * (rr - 1.0)), 6) == 3.414214


def test_levene_and_durbin_watson_hand_cases(spark, tmp_path):
    import os
    from datetime import datetime, timedelta

    from redpanda_ais_demo_spark.plans.registry import REGISTRY, _load_all

    _load_all()
    t0 = datetime(2026, 1, 1)
    # Levene: group a tight around 100, group b spread wide -> big F;
    # build events with two types whose value spreads differ
    rows = []
    eid = 0
    for i in range(60):
        rows.append((i, eid, "a", 1.0 + (0.01 if i % 2 else -0.01), t0)); eid += 1
        rows.append((i, eid, "b", 1.0 + (2.0 if i % 2 else -0.9), t0)); eid += 1
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, value double, ts timestamp"
    )
    sf1 = str(tmp_path / "a")
    ev.write.mode("overwrite").parquet(os.path.join(sf1, "events.parquet"))
    r = REGISTRY["levene_value_by_type"].fn(spark, sf1).first()
    assert r.n_groups == 2 and r.f_stat > 50  # wildly unequal spreads

    # equal spreads: F collapses toward 0 (identical deviation sets)
    rows2 = []
    eid = 0
    for i in range(60):
        v = 1.0 + (0.5 if i % 2 else -0.5)
        rows2.append((i, eid, "a", v, t0)); eid += 1
        rows2.append((i, eid, "b", v, t0)); eid += 1
    sf2 = str(tmp_path / "b")
    spark.createDataFrame(
        rows2, "user_id long, event_id long, event_type string, value double, ts timestamp"
    ).write.mode("overwrite").parquet(os.path.join(sf2, "events.parquet"))
    r2 = REGISTRY["levene_value_by_type"].fn(spark, sf2).first()
    assert r2.f_stat == 0.0

    # Durbin-Watson: alternating residuals (sawtooth around a flat
    # trend) -> strong NEGATIVE serial correlation -> DW near 4
    rows3 = []
    eid = 0
    for day in range(30):
        v = 100.0 + (10.0 if day % 2 else -10.0)
        rows3.append((1, eid, "x", v, t0 + timedelta(days=day))); eid += 1
    sf3 = str(tmp_path / "c")
    spark.createDataFrame(
        rows3, "user_id long, event_id long, event_type string, value double, ts timestamp"
    ).write.mode("overwrite").parquet(os.path.join(sf3, "events.parquet"))
    rd = REGISTRY["durbin_watson_daily_value"].fn(spark, sf3).first()
    assert rd.n_days == 30
    assert rd.dw > 3.5 and rd.rho_approx < -0.75

    # smooth ramp (residuals ~0 after the linear fit): den ~ 0 handled
    # or dw small — accept either NULL or a finite value, no crash
    rows4 = []
    eid = 0
    for day in range(30):
        rows4.append((1, eid, "x", 100.0 + day, t0 + timedelta(days=day))); eid += 1
    sf4 = str(tmp_path / "d")
    spark.createDataFrame(
        rows4, "user_id long, event_id long, event_type string, value double, ts timestamp"
    ).write.mode("overwrite").parquet(os.path.join(sf4, "events.parquet"))
    r4 = REGISTRY["durbin_watson_daily_value"].fn(spark, sf4).first()
    assert r4.n_days == 30  # perfectly linear -> zero residuals -> NULL dw
    assert r4.dw is None


def test_holm_adjust_hand_textbook(spark):
    import math

    from redpanda_ais_demo_spark.operators.stats import holm_adjust

    # z-values whose two-sided p's are ordered; k = 4. Holm adjusted:
    # p_(i) * (k - i + 1), running max, clipped at 1
    zs = [("a", 4.0), ("b", 2.5), ("c", 1.0), ("d", None)]
    df = spark.createDataFrame(zs, "sl string, z double")
    out = {r.sl: r for r in holm_adjust(df, "sl", "z").collect()}
    # NULL z: everything stays NULL, never rejects; k counts only 3
    assert out["d"].p_value is None and out["d"].p_holm is None
    assert out["d"].reject is None
    # rank order a < b < c by p; k - i + 1 = 3, 2, 1
    pa, pb, pc = (out[x].p_value for x in "abc")
    assert pa < pb < pc
    # p_value is display-rounded; the adjustment runs on unrounded p
    assert abs(out["a"].p_holm - 3 * pa) < 1e-5
    # monotone: b's adjusted >= a's
    assert out["b"].p_holm >= out["a"].p_holm
    # c multiplies by 1 but the running max keeps monotonicity
    assert out["c"].p_holm >= out["b"].p_holm
    # strong effect rejects, weak does not at alpha=.05
    assert out["a"].reject is True and out["c"].reject is False

    # Holm is never less powerful than Bonferroni: adjusted <= k*p
    for x in "abc":
        assert out[x].p_holm <= min(1.0, 3 * out[x].p_value) + 1e-5


def test_mahalanobis_and_ljung_box_hand_cases(spark, tmp_path):
    import os
    from datetime import datetime, timedelta

    from redpanda_ais_demo_spark.plans.registry import REGISTRY, _load_all

    _load_all()
    t0 = datetime(2026, 1, 1)
    # Mahalanobis: 40 users on the activity~spend axis, one user with
    # normal marginals but OFF-AXIS (low activity, high spend) must
    # score highest even though neither marginal is extreme
    rows = []
    eid = 0
    for u in range(40):
        k = 2 + (u % 10)  # activity 2..11
        for i in range(k - 1):
            rows.append((u, eid, "view", 1.0, t0)); eid += 1
        rows.append((u, eid, "purchase", float(k) * 10.0, t0)); eid += 1
    # off-axis user 99: activity 3 (normal-low), spend like activity-11
    rows.append((99, eid, "view", 1.0, t0)); eid += 1
    rows.append((99, eid, "view", 1.0, t0)); eid += 1
    rows.append((99, eid, "purchase", 110.0, t0)); eid += 1
    sfm = str(tmp_path / "m")
    spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, value double, ts timestamp"
    ).write.mode("overwrite").parquet(os.path.join(sfm, "events.parquet"))
    out = REGISTRY["mahalanobis_user_outliers"].fn(spark, sfm).collect()
    assert out[0].user_id == 99  # the correlation-breaker tops the list
    assert out[0].d2 > out[1].d2

    # Ljung-Box: weekly-period residual structure (period 7 sawtooth on
    # top of a flat level) -> Q explodes past the chi2(7) bar
    rows2 = []
    eid = 0
    for day in range(64):
        v = 100.0 + (25.0 if day % 7 == 0 else -4.0)
        rows2.append((1, eid, "x", v, t0 + timedelta(days=day))); eid += 1
    sfl = str(tmp_path / "l")
    spark.createDataFrame(
        rows2, "user_id long, event_id long, event_type string, value double, ts timestamp"
    ).write.mode("overwrite").parquet(os.path.join(sfl, "events.parquet"))
    r = REGISTRY["ljung_box_daily_value"].fn(spark, sfl).first()
    assert r.n_days == 64 and r.n_lags == 7
    assert r.serially_correlated and r.lb_q > 14.1


def test_median_ci_order_statistics(spark, tmp_path):
    import math
    import os
    from datetime import datetime

    from redpanda_ais_demo_spark.plans.registry import REGISTRY, _load_all

    _load_all()
    t0 = datetime(2026, 1, 1)
    # 100 users with purchase value = user_id dollars -> values 100*uid
    # cents; n=100: lo rank = floor((100 - 19.6)/2) = 40, hi = 61,
    # median rank = 50
    rows = [
        (u, u, "purchase", float(u), t0) for u in range(1, 101)
    ]
    sf = str(tmp_path / "mci")
    spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, value double, ts timestamp"
    ).write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))
    r = REGISTRY["median_ci_user_value"].fn(spark, sf).first()
    assert r.n == 100
    lo_r = math.floor((100 - 1.96 * 10.0) / 2.0)
    hi_r = 100 + 1 - lo_r
    assert r.median == 50 * 100  # rank ceil(50) -> value 50 dollars
    assert r.ci_lo == lo_r * 100 and r.ci_hi == hi_r * 100
    assert r.ci_lo < r.median < r.ci_hi
