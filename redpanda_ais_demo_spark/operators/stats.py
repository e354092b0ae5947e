"""Exact distributed statistics: Pearson correlation and Shannon entropy
as mergeable-sum aggregations — the EDA/feature-screening layer of a
training-data pipeline (which signals co-move, how concentrated is a
categorical column) computed the only way that scales: partial
aggregates, never a per-group model fit or a driver collect.

Determinism engineering (registry rules): every input quantizes to
exact integers (cents / small ints / counts), the five correlation sums
stay in BIGINT, and the products-of-sums that would overflow BIGINT are
formed in DECIMAL(38,0) on the Spark side and HUGEINT on the DuckDB
side — both exact at these magnitudes — before ONE well-defined
integer→double conversion each. Entropy terms quantize to micro-nat
BIGINTs before summing (the PSI pattern), because a float Σ p·ln p is
partial-aggregation-order dependent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def pearson_corr(
    df: DataFrame,
    group_col: str,
    x: Column,
    y: Column,
) -> DataFrame:
    """Per-group Pearson correlation of two integer-quantized expressions:
    ``r = (n·Σxy − Σx·Σy) / sqrt((n·Σxx − Σx²)·(n·Σyy − Σy²))``.

    ``x`` and ``y`` must already be exact integer columns (cast/round
    upstream) so all five sums are exact BIGINTs. Groups with <2 rows or
    zero variance in either variable yield NULL r (undefined).

    Plan: ONE partial-aggregable groupBy over one scan — the 100 TB
    shape; output is one row per group.
    """
    e = df.select(
        F.col(group_col).alias("g"), x.cast("long").alias("x"), y.cast("long").alias("y")
    )
    agg = e.groupBy("g").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    d = lambda c: F.col(c).cast(_DEC)  # noqa: E731
    num = d("n") * d("sxy") - d("sx") * d("sy")
    denx = d("n") * d("sxx") - d("sx") * d("sx")
    deny = d("n") * d("syy") - d("sy") * d("sy")
    ok = (F.col("n") >= 2) & (denx != 0) & (deny != 0)
    r = num.cast("double") / F.sqrt(denx.cast("double") * deny.cast("double"))
    return agg.select(
        F.col("g").alias(group_col),
        F.col("n").cast("long").alias("n_rows"),
        F.when(ok, F.round(r, 6)).alias("r"),
    )


def shannon_entropy(
    df: DataFrame,
    group_col: str,
    token_col: str,
) -> DataFrame:
    """Per-group Shannon entropy (nats) of a categorical column — the
    diversity/concentration screen (near-0 = degenerate source, high =
    diverse vocabulary): ``H = −Σ_v (c_v/N)·ln(c_v/N)``.

    Exactness: each term is computed from exact BIGINT counts, quantized
    to micro-nats (round(term·1e6) as BIGINT) and summed exactly — a
    double Σ would depend on partial-aggregation order. Two cascaded
    partial-aggregable groupBys ((group, value) counts → group sum);
    the shuffle carries one row per distinct value, never raw rows.
    """
    counts = (
        df.select(F.col(group_col).alias("g"), F.col(token_col).alias("v"))
        .groupBy("g", "v")
        .agg(F.count("*").alias("c"))
    )
    tot = counts.groupBy("g").agg(F.sum("c").alias("n"))
    term = -(F.col("c") / F.col("n")) * F.log(F.col("c") / F.col("n"))
    micro = F.round(term * 1e6).cast("long")
    return (
        counts.join(F.broadcast(tot), "g")
        .select("g", micro.alias("micro"))
        .groupBy("g")
        .agg((F.sum("micro") / 1e6).alias("entropy_nats"))
        .select(F.col("g").alias(group_col), "entropy_nats")
    )


def chi_squared_independence(
    df: DataFrame,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Chi-squared test of independence between two categorical columns
    — the drift/association screen over a contingency table: ``X² =
    Σ_cells (O − E)² / E`` with ``E = row_total·col_total / N``.

    Exactness: observed and marginal counts are exact BIGINTs; each
    cell's E and term are computed in double FROM those identical
    integers (one fixed expression order — IEEE-deterministic
    cross-engine) and quantized to micro-units before the exact BIGINT
    sum. Returns one row: (chi2, dof, n_rows). dof =
    (distinct_a − 1)·(distinct_b − 1).

    Plan: one groupBy on the cell, marginals as two window sums over the
    CELL table (rows = distinct (a,b) pairs, never raw data), final
    single-row aggregate. Only zero-count cells of the full cross
    product are absent — they contribute E>0 terms, handled by summing
    (N − Σ_present E)·1e6 micro-units analytically: Σ_absent (0−E)²/E =
    Σ_absent E = N − Σ_present E, since Σ_all E = N exactly.
    """
    cells = (
        df.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("o"))
    )
    wa = Window.partitionBy("a")
    wb = Window.partitionBy("b")
    # grand total as a broadcast 1-row aggregate, not an unpartitioned
    # window — no single-partition pass over the cell table
    tot = cells.agg(F.sum("o").alias("n"))
    m = (
        cells.withColumn("rt", F.sum("o").over(wa))
        .withColumn("ct", F.sum("o").over(wb))
        .crossJoin(F.broadcast(tot))
    )
    e = (F.col("rt") * F.col("ct")) / F.col("n")
    term = (F.col("o") - e) * (F.col("o") - e) / e
    micro = F.round(term * 1e6).cast("long")
    emicro = F.round(e * 1e6).cast("long")
    agg = m.select(
        micro.alias("micro"), emicro.alias("em"), "a", "b", "n"
    ).agg(
        F.sum("micro").alias("present_micro"),
        F.sum("em").alias("present_e_micro"),
        F.count_distinct("a").alias("ka"),
        F.count_distinct("b").alias("kb"),
        F.max("n").alias("n"),
    )
    absent_micro = F.col("n") * F.lit(1_000_000) - F.col("present_e_micro")
    return agg.select(
        ((F.col("present_micro") + absent_micro) / 1e6).alias("chi2"),
        ((F.col("ka") - 1) * (F.col("kb") - 1)).cast("long").alias("dof"),
        F.col("n").cast("long").alias("n_rows"),
    )


def naive_bayes_classify(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
) -> DataFrame:
    """Multinomial Naive Bayes, trained AND applied as pure aggregation
    — the "model fitting is just a groupBy" pattern that makes simple
    classifiers free at 100 TB (no ML runtime, no iteration): token
    likelihoods with add-one smoothing from per-(token, class) counts,
    class priors from doc counts, prediction = argmax of
    ``log P(c) + Σ_t tf_t · log P(t|c)``. Resubstitution scoring (train
    and predict on the same corpus) — the operator demo; split first
    for honest accuracy.

    Determinism: every log-prob quantizes to micro-nat BIGINTs computed
    from exact integer ratios, per-doc scores are exact BIGINT sums,
    and the argmax tie-breaks on class name — bit-identical
    cross-engine.

    Scale plan: scoring joins the per-doc TERM-FREQUENCY table (distinct
    tokens per doc, not raw occurrences) against the (token, class)
    likelihood table on the token key — one shuffle each side; class
    stats, priors and smoothing defaults are tiny broadcasts; the
    number-of-classes blowup rides the tf table, never raw text.

    Output: (id_col, predicted, actual, score_micro, correct).
    """
    spark = docs.sparkSession
    base = docs.select(
        F.col(id_col).alias("id"), F.col(label_col).alias("actual"), F.col(text_col).alias("t")
    )
    toks = base.select(
        "id", "actual", F.explode(F.split(F.col("t"), " ")).alias("token")
    )
    tf = toks.groupBy("id", "token").agg(F.count("*").alias("tf"))
    labels = base.select("id", "actual")
    cnt_tc = toks.groupBy("token", "actual").agg(F.count("*").alias("cnt"))
    tok_c = toks.groupBy("actual").agg(F.count("*").alias("tok_c"))
    n_c = base.groupBy("actual").agg(F.count("*").alias("n_docs"))
    n_total = base.count()  # 1-row driver scalar (the pagerank pattern)
    vocab = toks.select("token").distinct().count()

    classes = n_c.select(F.col("actual").alias("cls"), "n_docs")
    prior = classes.select(
        "cls",
        F.round(F.log(F.col("n_docs") / F.lit(n_total)) * 1e6).cast("long").alias("prior_micro"),
    )
    logp = (
        cnt_tc.join(tok_c, "actual")
        .select(
            "token",
            F.col("actual").alias("cls"),
            F.round(F.log((F.col("cnt") + 1) / (F.col("tok_c") + F.lit(vocab))) * 1e6)
            .cast("long")
            .alias("lp"),
        )
    )
    default = tok_c.select(
        F.col("actual").alias("cls"),
        F.round(F.log(F.lit(1.0) / (F.col("tok_c") + F.lit(vocab))) * 1e6)
        .cast("long")
        .alias("dlp"),
    )
    cand = tf.crossJoin(F.broadcast(classes.select("cls")))
    scored = (
        cand.join(logp, ["token", "cls"], "left")
        .join(F.broadcast(default), "cls")
        .groupBy("id", "cls")
        .agg(F.sum(F.col("tf") * F.coalesce(F.col("lp"), F.col("dlp"))).alias("s"))
        .join(F.broadcast(prior), "cls")
        .select("id", "cls", (F.col("s") + F.col("prior_micro")).alias("score_micro"))
    )
    from pyspark.sql import Window as _W

    w = _W.partitionBy("id").orderBy(F.col("score_micro").desc(), F.col("cls").asc())
    best = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("id", F.col("cls").alias("predicted"), "score_micro")
    )
    return best.join(labels, "id").select(
        F.col("id").alias(id_col),
        "predicted",
        "actual",
        F.col("score_micro").cast("long").alias("score_micro"),
        (F.col("predicted") == F.col("actual")).alias("correct"),
    )


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_col: str | None = None,
    bounded_times: bool = False,
) -> DataFrame:
    """Kaplan-Meier survival estimator — churn/retention curves over
    censored durations: ``S(t) = Π_{t_i <= t} (1 − d_i / n_i)`` where
    ``d_i`` = events (deaths/churns) at time t_i and ``n_i`` = subjects
    still at risk. ``event_col`` is 1 for an observed event, 0 for
    right-censored (still alive at last observation — censored subjects
    leave the risk set but contribute no factor).

    Determinism: the running product is exp of a running SUM of
    per-step ln(1 − d/n) terms, each computed from exact BIGINT counts
    and quantized to micro-units BEFORE the cumulative sum — the sum is
    exact, and the single exp/round at the end is IEEE-identical
    cross-engine. (A direct float product would depend on nothing here
    — the window product is sequential either way — but the micro form
    keeps the same discipline as every other composed float in this
    repo.)

    Plan: one groupBy to per-time (d_i, leave_i) counts, then windows
    over the TIME table (rows = distinct durations, never subjects) per
    group — n_i is total-at-risk minus a running sum of prior leavers.
    Output: (group?, t, n_risk, n_events, survival) — survival rounded
    6 dp, monotone non-increasing per group.
    """
    gcols = [group_col] if group_col else []
    base = df.select(
        *gcols,
        F.col(duration_col).cast("long").alias("t"),
        F.col(event_col).cast("int").alias("ev"),
    )
    times = base.groupBy(*gcols, "t").agg(
        F.sum("ev").alias("d"),
        F.count("*").alias("leave"),  # events + censored both exit the risk set
    )
    totals = base.groupBy(*gcols).agg(F.count("*").alias("n_total"))
    # d == n_risk extinguishes the curve: ln(0) diverges (and the engines
    # disagree on it — Spark log(0) is NULL, DuckDB -inf), so track the
    # extinction step as a flag and pin survival to exactly 0.0 from there
    term = F.when(
        (F.col("d") > 0) & (F.col("d") < F.col("n_risk")),
        F.round(F.log(F.lit(1.0) - F.col("d") / F.col("n_risk")) * 1e6).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    extinct = F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0)
    if gcols or bounded_times:
        # grouped: the window partitions per group (parallel).
        # bounded_times declares the distinct-duration table constant-
        # bounded (day/week granularity — hundreds of rows at any
        # corpus size): the tiny single-partition window beats the
        # distributed machinery's fixed cost there.
        if gcols:
            times = times.join(F.broadcast(totals), gcols)
            w = Window.partitionBy(*gcols).orderBy("t")
        else:
            times = times.crossJoin(F.broadcast(totals))
            w = Window.orderBy("t")
        prior_left = F.coalesce(
            F.sum("leave").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
        stepped = times.withColumn("n_risk", F.col("n_total") - prior_left)
        wrun = w.rowsBetween(Window.unboundedPreceding, 0)
        cum = F.sum(term).over(wrun)
        any_extinct = F.max(extinct).over(wrun)
        out = stepped.withColumn(
            "survival",
            F.when(any_extinct == 1, F.lit(0.0)).otherwise(
                F.round(F.exp(cum / F.lit(1e6)), 6)
            ),
        )
    else:
        # ungrouped: the time table can be data-sized for fine-grained
        # durations — two distributed prefix passes (operators/ordered.py)
        # instead of single-partition windows; running max of a 0/1 flag
        # == running sum >= 1
        from .ordered import rank_cumsum

        times = times.crossJoin(F.broadcast(totals))
        s1 = rank_cumsum(
            times, [F.col("t").asc()], rank_col=None, cumsums={"__cl": F.col("leave")}
        )
        stepped = s1.withColumn(
            "n_risk", F.col("n_total") - (F.col("__cl") - F.col("leave"))
        )
        staged = stepped.withColumn("__term", term).withColumn("__ext", extinct)
        s2 = rank_cumsum(
            staged,
            [F.col("t").asc()],
            rank_col=None,
            cumsums={"__cum": F.col("__term"), "__cex": F.col("__ext")},
        )
        out = s2.withColumn(
            "survival",
            F.when(F.col("__cex") >= 1, F.lit(0.0)).otherwise(
                F.round(F.exp(F.col("__cum") / F.lit(1e6)), 6)
            ),
        )
    return out.select(
        *gcols,
        F.col("t"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("n_events"),
        "survival",
    )


def ab_test_conversion(
    subjects: DataFrame,
    variant_col: str,
    converted_col: str,
    control: str,
    treatment: str,
) -> DataFrame:
    """Two-proportion experiment analysis — the readout step of an A/B
    test: conversion rate per variant, absolute/relative lift, and the
    pooled two-proportion z-statistic
    ``z = (p_t − p_c) / sqrt(p̂(1−p̂)(1/n_c + 1/n_t))``.

    Composes with the deterministic splitter (``corpus.split_assign``):
    assignment is a pure hash of the subject key, so the whole
    experiment pipeline — assign, observe, analyze — replays
    bit-identically on any cluster.

    Exactness: counts are exact BIGINTs; rates, lift and z are a fixed
    chain of double ops over those integers, each rounded to 6 dp —
    identical cross-engine. One partial-aggregable groupBy over the
    subject table; output is a single row.
    """
    agg = (
        subjects.filter(F.col(variant_col).isin(control, treatment))
        .groupBy(variant_col)
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col(converted_col).cast("long")).alias("c"),
        )
    )
    p = agg.groupBy().pivot(variant_col, [control, treatment]).sum("n", "c")
    nc, cc = F.col(f"{control}_sum(n)"), F.col(f"{control}_sum(c)")
    nt, ct = F.col(f"{treatment}_sum(n)"), F.col(f"{treatment}_sum(c)")
    p_c = cc / nc
    p_t = ct / nt
    pooled = (cc + ct) / (nc + nt)
    # degenerate experiments (all or none converted, or an empty arm)
    # have zero pooled variance — z is undefined, not infinite
    z = F.when(
        (nc > 0) & (nt > 0) & (cc + ct > 0) & (cc + ct < nc + nt),
        (p_t - p_c) / F.sqrt(pooled * (1 - pooled) * (1 / nc + 1 / nt)),
    )
    return p.select(
        nc.cast("long").alias("n_control"),
        cc.cast("long").alias("conv_control"),
        nt.cast("long").alias("n_treatment"),
        ct.cast("long").alias("conv_treatment"),
        F.round(p_c, 6).alias("rate_control"),
        F.round(p_t, 6).alias("rate_treatment"),
        F.round(p_t - p_c, 6).alias("lift_abs"),
        F.round(z, 6).alias("z_score"),
    )


def equi_width_histogram(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float,
    hi: float,
    n_buckets: int = 20,
) -> DataFrame:
    """Per-group equi-width histogram — the distribution panel behind
    every metrics dashboard: bucket = floor((x − lo) / width) clamped to
    [0, n_buckets), one exact count per (group, bucket). NULLs drop
    (distribution of observed values; pair with a completeness check),
    out-of-range values clamp into the edge buckets so totals reconcile
    with row counts.

    ONE partial-aggregable groupBy; the shuffle carries at most
    groups × n_buckets rows. Bucket bounds ride along so the result is
    self-describing.
    """
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    if not lo < hi:
        raise ValueError(f"need lo < hi, got lo={lo}, hi={hi}")
    width = (hi - lo) / n_buckets
    b = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))
    bucket = F.least(F.lit(n_buckets - 1), F.greatest(F.lit(0), b)).cast("long")
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(F.col(group_col).alias("g"), bucket.alias("bucket"))
        .groupBy("g", "bucket")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("g").alias(group_col),
            "bucket",
            F.round(F.lit(lo) + F.col("bucket") * F.lit(width), 6).alias("bucket_lo"),
            F.round(F.lit(lo) + (F.col("bucket") + 1) * F.lit(width), 6).alias("bucket_hi"),
            F.col("n").cast("long").alias("n"),
        )
    )


def trimmed_mean(
    df: DataFrame,
    group_col: str,
    value_cents: Column,
    order_col: str,
    trim_pct: int = 10,
) -> DataFrame:
    """Per-group robust mean: drop the lowest and highest ``trim_pct``
    percent of rows by value (the classic trimmed mean — the outlier-
    resistant center the plain mean isn't), alongside the untrimmed mean
    for contrast. Returns (group, n, n_kept, sum_cents, mean_value,
    trimmed_mean_value).

    Determinism (registry rules): values enter as exact integer cents;
    the trim boundary is integer arithmetic (trim = n*pct//100 rows off
    each tail, ranked by (cents, order_col) so ties cut identically on
    both engines); each output mean is ONE float division of two exact
    integers. No float sums anywhere.

    Shape: one hash shuffle on the group key for the ranking window;
    the groupBy that follows reuses that partitioning (same key), with
    the kept-row restriction folded into conditional aggregates so the
    whole thing is a single pass — no self-join against per-group
    counts.
    """
    if not 0 <= trim_pct < 50:
        raise ValueError("trim_pct must be in [0, 50)")
    w = Window.partitionBy(group_col).orderBy("cents", order_col)
    wn = Window.partitionBy(group_col)
    ranked = (
        df.select(group_col, value_cents.cast("long").alias("cents"), order_col)
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(wn))
    )
    trim = (F.col("n") * trim_pct) / 100
    kept = (F.col("rn") > F.floor(trim)) & (F.col("rn") <= F.col("n") - F.floor(trim))
    return (
        ranked.withColumn("kept", kept.cast("long"))
        .groupBy(group_col)
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("kept").cast("long").alias("n_kept"),
            F.sum(F.col("cents") * F.col("kept")).cast("long").alias("sum_cents"),
            F.sum("cents").cast("long").alias("sum_cents_all"),
        )
        .select(
            group_col,
            "n",
            "n_kept",
            "sum_cents",
            F.round(
                F.col("sum_cents_all").cast("double") / (F.col("n") * 100).cast("long"), 6
            ).alias("mean_value"),
            F.round(
                F.col("sum_cents").cast("double") / (F.col("n_kept") * 100).cast("long"), 6
            ).alias("trimmed_mean_value"),
        )
    )


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bounded_scores: bool = False,
) -> DataFrame:
    """Exact ROC AUC of an integer score against a binary label — the
    Mann-Whitney U formulation with mid-rank tie handling (the value
    sklearn's roc_auc_score computes), done as pure integer arithmetic:

        2·midrank(s) = 2·(# rows with score < s) + (# rows with score = s) + 1
        AUC = (Σ_pos 2·midrank − P·(P+1)) / (2·P·N)

    Numerator and denominator stay BIGINT until ONE final division of
    identical integers — the IEEE result is bit-identical on any engine,
    so the oracle hash-matches without rounding tricks.

    Scale plan: the corpus-sized pass is a single partial-aggregable
    groupBy(score) → (n, n_pos); the cumulative-rank window then runs
    over DISTINCT SCORES ONLY (cardinality of the score domain, not the
    corpus). ``bounded_scores=True`` declares the score domain
    constant-bounded (a quantized quality score: thousands of distinct
    values at any corpus size) and keeps the cheap single-partition
    window over that tiny table; the default routes the prefix count
    through the distributed machinery for continuous/unbounded score
    domains. NULL scores/labels are excluded up front (score them or
    quarantine upstream).

    Output: one row (n_pos, n_neg, auc). Degenerate inputs (no
    positives or no negatives) yield auc = NULL rather than a division
    error — the caller can alert on it.
    """
    y = F.col(label_col).cast("long")
    counts = (
        df.filter(F.col(score_col).isNotNull() & F.col(label_col).isNotNull())
        .select(F.col(score_col).alias("s"), y.alias("y"))
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("n_pos"))
    )
    if bounded_scores:
        w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
        ranked = counts.withColumn(
            "cum_less", F.coalesce(F.sum("n").over(w), F.lit(0))
        )
    else:
        # distributed exclusive prefix count (operators/ordered.py): the
        # distinct-score table can be data-sized for continuous scores,
        # so no single-partition window — inclusive sum minus own n
        from .ordered import rank_cumsum

        ranked = rank_cumsum(
            counts, [F.col("s").asc()], rank_col=None, cumsums={"__ci": F.col("n")}
        ).withColumn("cum_less", F.col("__ci") - F.col("n"))
    agg = ranked.agg(
        F.sum("n_pos").alias("p"),
        (F.sum("n") - F.sum("n_pos")).alias("q"),
        F.sum(F.col("n_pos") * (2 * F.col("cum_less") + F.col("n") + 1)).alias("two_mid"),
    )
    numer = F.col("two_mid") - F.col("p") * (F.col("p") + 1)
    denom = 2 * F.col("p") * F.col("q")
    return agg.select(
        F.col("p").cast("long").alias("n_pos"),
        F.col("q").cast("long").alias("n_neg"),
        F.when(denom > 0, numer.cast("double") / denom.cast("double")).alias("auc"),
    )


def mutual_information(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Exact mutual information I(X; Y) between two categorical columns
    — the feature-relevance metric of filter-style feature selection
    (how much knowing the source tells you about the language, etc.),
    complementing the chi-squared independence TEST with an effect-size
    in nats.

        I = Σ_cells (c_xy / N) · ln(N·c_xy / (c_x·c_y))

    Determinism: each cell's log-ratio argument is ONE division of exact
    BIGINT products (identical doubles cross-engine), its ln quantizes
    to integer micro-nats (the repo's Naive-Bayes idiom), and the
    weighted sum Σ c_xy·ln_micro stays BIGINT until one final division
    by N·1e6. Absent cells contribute 0 (c_xy = 0), exactly as in the
    analytic definition — no smoothing.

    Scale plan: ONE partial-aggregable groupBy((x, y)) is the only
    corpus-sized pass; marginals derive from the CELL table via window
    sums (|X|·|Y| rows); NULLs in either column are excluded (treat
    missing as a category upstream if that is the question). Output:
    one row (n, n_cells, mi_nats >= 0 up to quantization).
    """
    cells = (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .groupBy(F.col(x_col).alias("x"), F.col(y_col).alias("y"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wx = Window.partitionBy("x")
    wy = Window.partitionBy("y")
    # grand total via broadcast 1-row aggregate (no unpartitioned window)
    tot = cells.agg(F.sum("c").alias("n"))
    t = (
        cells.withColumn("cx", F.sum("c").over(wx))
        .withColumn("cy", F.sum("c").over(wy))
        .crossJoin(F.broadcast(tot))
    )
    ratio = (F.col("c") * F.col("n")).cast("double") / (F.col("cx") * F.col("cy")).cast("double")
    ln_micro = F.round(F.log(ratio) * 1e6).cast("long")
    return t.agg(
        F.max("n").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        (
            F.sum(F.col("c") * ln_micro).cast("double")
            / (F.max("n") * F.lit(1_000_000)).cast("double")
        ).alias("mi_nats"),
    )


def winsorized_mean(
    df: DataFrame,
    group_col: str,
    value_cents: Column,
    order_col: str,
    pct: int = 10,
) -> DataFrame:
    """Per-group winsorized mean — trimmed_mean's clamping sibling: the
    lowest/highest ``pct`` percent of rows by value are not DROPPED but
    CLAMPED to the nearest surviving order statistic (Tukey's
    winsorization — keeps n constant, which matters when the mean feeds
    a ratio with a fixed denominator). Returns (group, n, lo_cents,
    hi_cents, mean_value, winsorized_mean_value).

    Determinism: integer cents, integer clamp boundary (k = n·pct//100
    rows per tail, ranked by (cents, order_col)); the clamp values are
    the order statistics at ranks k+1 and n−k pulled via conditional
    MAX over the ranked window; each mean is ONE division of exact
    integers.

    Shape: the same single hash shuffle on the group key as
    trimmed_mean — ranking window, boundary broadcast via a second
    window over the SAME partitioning (no extra Exchange), one
    partial-aggregable groupBy.
    """
    if not 0 <= pct < 50:
        raise ValueError("pct must be in [0, 50)")
    w = Window.partitionBy(group_col).orderBy("cents", order_col)
    wn = Window.partitionBy(group_col)
    ranked = (
        df.select(group_col, value_cents.cast("long").alias("cents"), order_col)
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(wn))
    )
    k = F.floor((F.col("n") * pct) / 100)
    bounded = (
        ranked.withColumn("k", k)
        .withColumn("lo", F.max(F.when(F.col("rn") == F.col("k") + 1, F.col("cents"))).over(wn))
        .withColumn("hi", F.max(F.when(F.col("rn") == F.col("n") - F.col("k"), F.col("cents"))).over(wn))
    )
    clamped = (
        F.when(F.col("rn") <= F.col("k"), F.col("lo"))
        .when(F.col("rn") > F.col("n") - F.col("k"), F.col("hi"))
        .otherwise(F.col("cents"))
    )
    return (
        bounded.withColumn("cl", clamped)
        .groupBy(group_col)
        .agg(
            F.count("*").cast("long").alias("n"),
            F.max("lo").cast("long").alias("lo_cents"),
            F.max("hi").cast("long").alias("hi_cents"),
            F.sum("cents").cast("long").alias("sum_cents_all"),
            F.sum("cl").cast("long").alias("sum_cents_w"),
        )
        .select(
            group_col,
            "n",
            "lo_cents",
            "hi_cents",
            (F.col("sum_cents_all").cast("double") / F.col("n").cast("double") / 100).alias("mean_value"),
            (F.col("sum_cents_w").cast("double") / F.col("n").cast("double") / 100).alias("winsorized_mean_value"),
        )
    )


def gains_lift(
    df: DataFrame,
    score_col: str,
    label_col: str,
    tiebreak_col: str,
    n_deciles: int = 10,
) -> DataFrame:
    """Gains/lift table — the campaign-targeting readout of a binary
    scorer ("mail the top decile, capture X% of responders"): rows rank
    by score DESCENDING into ``n_deciles`` equal-count bins (ntile);
    per bin: exact counts, response rate, lift vs the base rate, and
    the cumulative capture share of all positives.

    Determinism: ntile over (score DESC, tiebreak ASC) cuts ties
    identically on both engines; counts are exact BIGINTs; every rate
    is one division of integers (6 dp). The ranking is the one global-
    sort-shaped stage — at 100 TB replace ntile with quantile
    boundaries from approx_percentile and a broadcast bin lookup (the
    documented scale path; the exact ntile is the oracle-checkable
    small-scale form and the two agree wherever boundaries are exact).

    Output: one row per decile 1..n_deciles.
    """
    if n_deciles < 2:
        raise ValueError(f"n_deciles must be >= 2, got {n_deciles}")
    # ANSI ntile without the single-partition window: distributed rank
    # + total-count bucket formula (operators/ordered.py) — identical
    # tiling, parallel sort at any corpus size
    from .ordered import ntile_distributed

    base = df.select(
        F.col(score_col).alias("s"),
        F.col(label_col).cast("long").alias("y"),
        F.col(tiebreak_col).alias("tb"),
    ).filter(F.col("s").isNotNull() & F.col("y").isNotNull())
    t = ntile_distributed(
        base, [F.col("s").desc(), F.col("tb").asc()], n_deciles, out_col="decile"
    )
    per = t.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("n_pos")
    )
    tot = per.agg(
        F.sum("n").alias("n_total"), F.sum("n_pos").alias("pos_total")
    )
    wcum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    g = per.crossJoin(F.broadcast(tot)).withColumn(
        "cum_pos", F.sum("n_pos").over(wcum)
    )
    rate = F.col("n_pos").cast("double") / F.col("n").cast("double")
    base = F.col("pos_total").cast("double") / F.col("n_total").cast("double")
    return g.select(
        F.col("decile").cast("long").alias("decile"),
        F.col("n").cast("long").alias("n"),
        F.col("n_pos").cast("long").alias("n_pos"),
        F.round(rate, 6).alias("response_rate"),
        F.when(F.col("pos_total") > 0, F.round(rate / base, 6)).alias("lift"),
        F.when(
            F.col("pos_total") > 0,
            F.round(
                F.col("cum_pos").cast("double") / F.col("pos_total").cast("double"), 6
            ),
        ).alias("cum_capture"),
    )


def roc_auc_by_group(
    df: DataFrame,
    group_col: str,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Sliced ROC AUC — ``roc_auc`` per group, the model-eval slice
    analysis every responsible eval runs after the headline number
    ("the scorer is 0.8 overall but 0.5 on src13"): same exact
    Mann-Whitney mid-rank formulation, all integer until one division
    per group.

    Scale plan: the corpus pass is ONE partial-aggregable
    groupBy(group, score); the rank window partitions BY GROUP over
    distinct scores (parallel across slices, never a global sort);
    the final fold is one groupBy(group). Degenerate slices (single
    class) yield NULL auc.

    Output: (group, n_pos, n_neg, auc).
    """
    y = F.col(label_col).cast("long")
    counts = (
        df.filter(F.col(score_col).isNotNull() & F.col(label_col).isNotNull())
        .select(F.col(group_col).alias("g"), F.col(score_col).alias("s"), y.alias("y"))
        .groupBy("g", "s")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("n_pos"))
    )
    w = Window.partitionBy("g").orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = counts.withColumn("cum_less", F.coalesce(F.sum("n").over(w), F.lit(0)))
    agg = ranked.groupBy("g").agg(
        F.sum("n_pos").alias("p"),
        (F.sum("n") - F.sum("n_pos")).alias("q"),
        F.sum(F.col("n_pos") * (2 * F.col("cum_less") + F.col("n") + 1)).alias("two_mid"),
    )
    numer = F.col("two_mid") - F.col("p") * (F.col("p") + 1)
    denom = 2 * F.col("p") * F.col("q")
    return agg.select(
        F.col("g").alias(group_col),
        F.col("p").cast("long").alias("n_pos"),
        F.col("q").cast("long").alias("n_neg"),
        F.when(denom > 0, numer.cast("double") / denom.cast("double")).alias("auc"),
    )


def fano_factor(
    df: DataFrame,
    group_col: str,
    count_col: str,
) -> DataFrame:
    """Index of dispersion (Fano factor) of per-bucket counts — the
    burstiness screen of an arrival process: F = Var(c)/Mean(c) with
    population variance. F ≈ 1 is Poisson (memoryless arrivals);
    F >> 1 is bursty/clumped; F < 1 is regular/underdispersed.

    Exactness: ``F = (n·Σc² − S²) / (n·S)`` — numerator and
    denominator stay DECIMAL(38,0)/HUGEINT (n·Σc² brushes BIGINT range
    at large n), ONE division, 6 dp. One partial-aggregable groupBy;
    output one row per group. Empty/zero-sum groups yield NULL.
    """
    t = df.select(
        F.col(group_col).alias("g"), F.col(count_col).cast("long").alias("c")
    )
    agg = t.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("scc"),
    )
    d = lambda c: F.col(c).cast(_DEC)  # noqa: E731
    num = d("n") * d("scc") - d("s") * d("s")
    den = d("n") * d("s")
    return agg.select(
        F.col("g").alias(group_col),
        F.col("n").cast("long").alias("n_buckets"),
        F.round(F.col("s").cast("double") / F.col("n").cast("double"), 6).alias("mean_count"),
        F.when(
            F.col("s") > 0,
            F.round(num.cast("double") / den.cast("double"), 6),
        ).alias("fano"),
    )


def _det3(a, b, c, d, e, f, g, h, i):
    """3x3 determinant with a FIXED expansion order (first-row cofactors)
    — the oracle spells the same polynomial so the exact integers agree."""
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def ols_two_features(
    df: DataFrame,
    group_col: str,
    y_col: str,
    u_col: str,
    v_col: str,
) -> DataFrame:
    """Per-group two-feature OLS with intercept, solved in CLOSED FORM —
    "model fitting is just a groupBy": β = (X'X)⁻¹X'y for X = [1, u, v]
    via Cramer's rule on the normal equations, so the whole fit is ONE
    partial-aggregable pass accumulating nine integer sums and a few
    fixed-order polynomial evaluations. No ML runtime, no iteration,
    no driver-side solve — the coefficients fall out of the aggregate.

    Inputs must be exact integers (cents / small-int features). The
    determinant polynomials are degree-3 products of the sums, formed
    in DECIMAL(38,0) (HUGEINT oracle-side) with a pinned cofactor
    expansion; each β is ONE exact-integer division rounded 6 dp.
    Magnitude ceiling: |sums|³ must stay under 1e38 — holds for
    cent-scale targets with small-integer features up to ~1e9 rows per
    group; wider regimes should center/rescale features first (the
    documented contract). Singular groups (collinear features,
    det = 0) yield NULL coefficients rather than a crash.

    Output: (group, n, b0, b1, b2) for y ≈ b0 + b1·u + b2·v.
    """
    t = df.select(
        F.col(group_col).alias("g"),
        F.col(y_col).cast("long").alias("y"),
        F.col(u_col).cast("long").alias("u"),
        F.col(v_col).cast("long").alias("v"),
    )
    agg = t.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("u").alias("su"),
        F.sum("v").alias("sv"),
        F.sum("y").alias("sy"),
        F.sum(F.col("u") * F.col("u")).alias("suu"),
        F.sum(F.col("u") * F.col("v")).alias("suv"),
        F.sum(F.col("v") * F.col("v")).alias("svv"),
        F.sum(F.col("u") * F.col("y")).alias("suy"),
        F.sum(F.col("v") * F.col("y")).alias("svy"),
    )
    d = lambda c: F.col(c).cast(_DEC)  # noqa: E731
    det = _det3(d("n"), d("su"), d("sv"),
                d("su"), d("suu"), d("suv"),
                d("sv"), d("suv"), d("svv"))
    det0 = _det3(d("sy"), d("su"), d("sv"),
                 d("suy"), d("suu"), d("suv"),
                 d("svy"), d("suv"), d("svv"))
    det1 = _det3(d("n"), d("sy"), d("sv"),
                 d("su"), d("suy"), d("suv"),
                 d("sv"), d("svy"), d("svv"))
    det2 = _det3(d("n"), d("su"), d("sy"),
                 d("su"), d("suu"), d("suy"),
                 d("sv"), d("suv"), d("svy"))
    ok = det != 0
    beta = lambda dd: F.when(ok, F.round(dd.cast("double") / det.cast("double"), 6))  # noqa: E731
    return agg.select(
        F.col("g").alias(group_col),
        F.col("n").cast("long").alias("n"),
        beta(det0).alias("b0"),
        beta(det1).alias("b1"),
        beta(det2).alias("b2"),
    )


def welch_ttest(
    subjects: DataFrame,
    variant_col: str,
    value_col: str,
    control: str,
    treatment: str,
) -> DataFrame:
    """Welch's unequal-variance t-test on a continuous metric — the
    means-based sibling of ``ab_test_conversion`` (that one reads
    conversion RATES; this one reads revenue/latency/engagement per
    subject): t = (m_t − m_c)/sqrt(s²_c/n_c + s²_t/n_t) with the
    Welch–Satterthwaite degrees of freedom.

    Values must be exact integer units (cents). Each arm accumulates
    (n, Σx, Σx²) in one partial-aggregable pass — Σx² sums in
    DECIMAL(38,0) so cent-scale metrics survive ~1e9 subjects; sample
    variance is the exact-integer identity (n·Σx² − (Σx)²)/(n·(n−1))
    converted to double ONCE. Degenerate inputs (an arm with n < 2, or
    zero variance in both arms) yield NULL t/dof rather than a division
    error. Output: one row with per-arm stats, diff, t, dof.
    """
    agg = (
        subjects.filter(F.col(variant_col).isin(control, treatment))
        .groupBy(variant_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col).cast("long")).alias("s"),
            F.sum(
                (F.col(value_col).cast("long") * F.col(value_col).cast("long")).cast(
                    _DEC
                )
            ).alias("sxx"),
        )
    )
    p = agg.groupBy().pivot(variant_col, [control, treatment]).sum("n", "s", "sxx")
    nc, sc, xc = (
        F.col(f"{control}_sum(n)"),
        F.col(f"{control}_sum(s)"),
        F.col(f"{control}_sum(sxx)"),
    )
    nt, st, xt = (
        F.col(f"{treatment}_sum(n)"),
        F.col(f"{treatment}_sum(s)"),
        F.col(f"{treatment}_sum(sxx)"),
    )
    d = lambda c: c.cast(_DEC)  # noqa: E731
    # ANSI mode evaluates both branches' subexpressions eagerly in
    # codegen, so the n(n-1)=0 denominator must be guarded IN the
    # expression, not just by a downstream F.when
    var_c = F.when(
        nc >= 2,
        (d(nc) * xc - d(sc) * d(sc)).cast("double")
        / (nc * (nc - 1)).cast("double"),
    )
    var_t = F.when(
        nt >= 2,
        (d(nt) * xt - d(st) * d(st)).cast("double")
        / (nt * (nt - 1)).cast("double"),
    )
    m_c = sc.cast("double") / nc.cast("double")
    m_t = st.cast("double") / nt.cast("double")
    a = var_c / nc.cast("double")
    b = var_t / nt.cast("double")
    ok = (nc >= 2) & (nt >= 2)
    se2 = a + b
    t_stat = F.when(ok & (se2 > 0), (m_t - m_c) / F.sqrt(se2))
    dof = F.when(
        ok & (a + b > 0) & ((a * a / (nc - 1).cast("double") + b * b / (nt - 1).cast("double")) > 0),
        (se2 * se2)
        / (a * a / (nc - 1).cast("double") + b * b / (nt - 1).cast("double")),
    )
    return p.select(
        nc.cast("long").alias("n_control"),
        nt.cast("long").alias("n_treatment"),
        F.round(m_c, 6).alias("mean_control"),
        F.round(m_t, 6).alias("mean_treatment"),
        F.round(var_c, 6).alias("var_control"),
        F.round(var_t, 6).alias("var_treatment"),
        F.round(m_t - m_c, 6).alias("diff"),
        F.round(t_stat, 6).alias("t_stat"),
        F.round(dof, 6).alias("dof"),
    )


def cuped_adjust(
    subjects: DataFrame,
    variant_col: str,
    y_col: str,
    x_col: str,
    control: str,
    treatment: str,
) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013) — the experiment
    readout upgrade every mature platform runs: shrink metric variance
    with a pre-experiment covariate X (the same user's spend BEFORE
    the test), ``y' = y − θ(x − x̄)`` with ``θ = cov(X,Y)/var(X)``
    pooled across arms. Randomization makes the adjustment unbiased;
    variance drops by ρ² (the fraction the covariate explains).

    Exactness: the five pooled sums and the four per-arm sums are
    BIGINT/DECIMAL(38,0); θ and ρ² are single divisions of exact
    integers. Adjusted MEANS come from the algebraic identity
    ``mean(y'_arm) = ȳ_arm − θ(x̄_arm − x̄)`` — per-arm integer sums
    plus θ, never a float sum over per-row adjusted values (which
    would be partial-aggregation-order dependent).

    Output: one row — per-arm n / raw means / adjusted means, raw and
    adjusted diff, theta, rho2. Degenerate X (zero variance) yields
    θ = NULL and adjusted == raw.
    """
    t = subjects.filter(F.col(variant_col).isin(control, treatment)).select(
        F.col(variant_col).alias("v"),
        F.col(y_col).cast("long").alias("y"),
        F.col(x_col).cast("long").alias("x"),
    )
    d = lambda c: F.col(c).cast(_DEC)  # noqa: E731
    pooled = t.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(_DEC)).alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast(_DEC)).alias("sxy"),
        F.sum((F.col("y") * F.col("y")).cast(_DEC)).alias("syy"),
    )
    arms = (
        t.groupBy("v")
        .agg(F.count(F.lit(1)).alias("an"), F.sum("x").alias("asx"), F.sum("y").alias("asy"))
        .groupBy()
        .pivot("v", [control, treatment])
        .sum("an", "asx", "asy")
    )
    j = arms.crossJoin(F.broadcast(pooled))
    cov_num = d("n") * F.col("sxy") - d("sx") * d("sy")
    varx_num = d("n") * F.col("sxx") - d("sx") * d("sx")
    vary_num = d("n") * F.col("syy") - d("sy") * d("sy")
    ok = varx_num != 0
    theta = F.when(ok, cov_num.cast("double") / varx_num.cast("double"))
    rho2 = F.when(
        ok & (vary_num != 0),
        (cov_num.cast("double") * cov_num.cast("double"))
        / (varx_num.cast("double") * vary_num.cast("double")),
    )
    xbar = F.col("sx").cast("double") / F.col("n").cast("double")
    nc, xc, yc = (
        F.col(f"{control}_sum(an)"),
        F.col(f"{control}_sum(asx)"),
        F.col(f"{control}_sum(asy)"),
    )
    nt, xt, yt = (
        F.col(f"{treatment}_sum(an)"),
        F.col(f"{treatment}_sum(asx)"),
        F.col(f"{treatment}_sum(asy)"),
    )
    m = lambda s, n: s.cast("double") / n.cast("double")  # noqa: E731
    adj = lambda s, xs, n: F.when(  # noqa: E731
        ok, m(s, n) - theta * (m(xs, n) - xbar)
    ).otherwise(m(s, n))
    return j.select(
        nc.cast("long").alias("n_control"),
        nt.cast("long").alias("n_treatment"),
        F.round(m(yc, nc), 6).alias("mean_raw_control"),
        F.round(m(yt, nt), 6).alias("mean_raw_treatment"),
        F.round(adj(yc, xc, nc), 6).alias("mean_adj_control"),
        F.round(adj(yt, xt, nt), 6).alias("mean_adj_treatment"),
        F.round(m(yt, nt) - m(yc, nc), 6).alias("diff_raw"),
        F.round(adj(yt, xt, nt) - adj(yc, xc, nc), 6).alias("diff_adj"),
        F.round(theta, 6).alias("theta"),
        F.round(rho2, 6).alias("rho2"),
    )


def ipf_rake_2d(
    cells: DataFrame,
    row_targets: DataFrame,
    col_targets: DataFrame,
    rounds: int = 6,
) -> DataFrame:
    """Iterative proportional fitting (raking, Deming & Stephan 1940):
    rescale a 2-D contingency table's cell weights so its row and
    column margins match given targets — the survey-calibration /
    panel-reweighting primitive (post-stratify last period's panel to
    this period's demographic margins).

    Inputs: ``cells`` (r, c, w_micro BIGINT micro-unit weights),
    ``row_targets`` (r, t BIGINT), ``col_targets`` (c, t BIGINT).
    Runs a FIXED ``rounds`` of row-scale + column-scale passes (raking
    converges geometrically; a fixed unroll keeps the result exactly
    reproducible and SQL-oracle-able). Determinism: weights live in
    BIGINT micro-units and re-quantize after every scaling, so every
    margin sum is an exact integer aggregate and each cell update is
    the same double multiply+round on both engines — no float-sum
    order dependence anywhere.

    Plan per half-round: one partial-aggregable margin groupBy (1 row
    per margin value) broadcast back onto the cells — cells shuffle
    once per half-round on the margin key, margins are tiny. Cells
    with a zero current margin keep weight 0 (target mass on an empty
    margin is unreachable — standard raking behavior).

    Output: (r, c, w_micro) after ``rounds`` full rounds.
    """
    if rounds < 1:
        raise ValueError("rounds must be positive")
    w = cells.select("r", "c", F.col("w_micro").cast("long").alias("w_micro"))
    rt = F.broadcast(row_targets.select(F.col("r"), F.col("t").alias("__rt")))
    ct = F.broadcast(col_targets.select(F.col("c"), F.col("t").alias("__ct")))
    for _ in range(rounds):
        rm = w.groupBy("r").agg(F.sum("w_micro").alias("__rm"))
        w = (
            w.join(F.broadcast(rm), "r")
            .join(rt, "r")
            .withColumn(
                "w_micro",
                F.when(F.col("__rm") > 0,
                       F.round(F.col("w_micro") * (F.col("__rt") / F.col("__rm")))
                       .cast("long"))
                .otherwise(F.lit(0).cast("long")),
            )
            .drop("__rm", "__rt")
        )
        cm = w.groupBy("c").agg(F.sum("w_micro").alias("__cm"))
        w = (
            w.join(F.broadcast(cm), "c")
            .join(ct, "c")
            .withColumn(
                "w_micro",
                F.when(F.col("__cm") > 0,
                       F.round(F.col("w_micro") * (F.col("__ct") / F.col("__cm")))
                       .cast("long"))
                .otherwise(F.lit(0).cast("long")),
            )
            .drop("__cm", "__ct")
        ).localCheckpoint(eager=False)
    return w
