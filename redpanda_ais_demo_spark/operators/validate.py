"""Declarative data-quality validation (the Deequ pattern, Schelter et
al. VLDB 2018): a check suite compiles to ONE aggregation pass over the
table — completeness, uniqueness, range conformance, pattern conformance
— then each metric compares against its threshold.

Scale design: every constraint is an aggregate expression; the whole
suite shares a single scan + single (partial-aggregable) aggregation no
matter how many constraints run — the property that makes nightly
validation of a 100 TB table affordable. Exact count ratios (int/int
divisions rounded to 6 dp) keep verdicts engine-identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def completeness(col: str) -> Column:
    """Fraction of rows with a non-null value."""
    return F.avg(F.col(col).isNotNull().cast("int"))


def uniqueness(col: str) -> Column:
    """Distinct values / rows (1.0 = the column is a key)."""
    return F.count_distinct(F.col(col)) / F.count("*")


def in_range(col: str, lo: float, hi: float) -> Column:
    """Fraction of non-null values inside [lo, hi]."""
    return F.avg(F.col(col).between(lo, hi).cast("int"))


def matches(col: str, pattern: str) -> Column:
    """Fraction of non-null values matching a regex."""
    return F.avg(F.col(col).rlike(pattern).cast("int"))


def check_constraints(
    df: DataFrame,
    checks: list[tuple[str, Column, float]],
) -> DataFrame:
    """Run a check suite: ``checks`` is (name, metric aggregate, minimum
    acceptable value). Returns one row per check — (check_name,
    metric, threshold, passed) — computed in ONE aggregation over one scan;
    the stack-unpivot runs over the single result row."""
    if not checks:
        raise ValueError("checks must be non-empty")
    for name, _, thr in checks:
        if not isinstance(thr, (int, float)) or isinstance(thr, bool):
            raise ValueError(f"threshold for {name!r} must be numeric, got {thr!r}")
    aggd = df.agg(
        *[F.round(metric, 6).alias(f"m{i}") for i, (_, metric, _) in enumerate(checks)]
    )
    # check names are embedded in the stack() SQL as string literals —
    # escape embedded quotes so a name like "o'brien" can't break (or
    # inject into) the generated expression
    stack_args = ", ".join(
        "'{}', m{}, CAST({} AS DOUBLE)".format(name.replace("\\", "\\\\").replace("'", "\\'"), i, float(thr))
        for i, (name, _, thr) in enumerate(checks)
    )
    rows = aggd.selectExpr(
        f"stack({len(checks)}, {stack_args}) AS (check_name, metric, threshold)"
    )
    return rows.withColumn("passed", F.col("metric") >= F.col("threshold"))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Change detection between two snapshots of a keyed table — the
    data-engineering diff behind incremental syncs, audit trails, and
    CDC backfills: one row per key whose state differs, labeled
    ``added`` (key only in new), ``removed`` (only in old) or
    ``changed`` (present in both, any compare column differs,
    null-safely). Unchanged keys are dropped — at 100 TB the diff is
    usually tiny relative to the snapshots, so nothing downstream ever
    sees the unchanged mass.

    Scale design: ONE full-outer hash join on the key (both snapshots
    shuffle once — unavoidable for an arbitrary-key diff; co-locate via
    bucketed layout to eliminate even that, see joins.write_bucketed);
    the change classification is a narrow projection.
    """
    o = old.select(
        *[F.col(c).alias(f"k_{c}") for c in key_cols],
        *[F.col(c).alias(f"o_{c}") for c in compare_cols],
        F.lit(True).alias("in_old"),
    )
    n = new.select(
        *[F.col(c).alias(f"k_{c}") for c in key_cols],
        *[F.col(c).alias(f"n_{c}") for c in compare_cols],
        F.lit(True).alias("in_new"),
    )
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if not compare_cols:
        # F.when(None, ...) below would raise an opaque TypeError; make
        # the contract explicit — an empty compare set means the caller
        # wants a key-presence diff, which degenerates to added/removed
        # only (no column can differ), so differs = False.
        raise ValueError(
            "compare_cols must be non-empty — for a key-presence-only diff "
            "pass a key column as the compare column"
        )
    j = o.join(n, [f"k_{c}" for c in key_cols], "full_outer")
    differs = None
    for c in compare_cols:
        d = ~F.col(f"o_{c}").eqNullSafe(F.col(f"n_{c}"))
        differs = d if differs is None else (differs | d)
    change = (
        F.when(F.col("in_old").isNull(), "added")
        .when(F.col("in_new").isNull(), "removed")
        .when(differs, "changed")
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(
            *[F.col(f"k_{c}").alias(c) for c in key_cols], "change"
        )
    )


def cdc_apply(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC change feed to a snapshot — the MERGE half of the CDC
    pair (snapshot_diff derives a feed; this consumes one): ``changes``
    carries (keys, payload, seq, op ∈ 'I'|'U'|'D'); the result is the
    post-image snapshot. Semantics match Delta/Iceberg MERGE with
    last-writer-wins: only each key's HIGHEST-``seq`` change applies —
    'D' removes the key, 'I'/'U' upsert the payload — and unmentioned
    base keys pass through untouched.

    Plan: the feed first collapses to one row per key (per-key window
    top-1 — a feed-sized shuffle, never base-sized), then ONE full-outer
    join against base on the key. At 100 TB the base never rewrites
    wholesale in practice — partition-prune to touched partitions via a
    dynamic-overwrite writer (see backfill_overwrite) — but the operator
    itself is the partition-local merge those writers run.

    Ties on (key, seq) break by op precedence D > U > I (a delete and an
    upsert with the same seq resolve to the delete — deterministic, and
    the conservative read of an ill-formed feed).
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    payload_cols = [c for c in base.columns if c not in key_cols]
    missing = [c for c in payload_cols + key_cols if c not in changes.columns]
    if missing:
        raise ValueError(f"changes is missing base columns: {missing}")
    ops = changes.select(
        *key_cols, *payload_cols, F.col(seq_col).alias("__seq"), F.col(op_col).alias("__op")
    )
    bad = ~F.col("__op").isin("I", "U", "D")
    ops = ops.withColumn(
        "__op", F.when(bad, F.raise_error(F.concat(F.lit("cdc_apply: bad op "), "__op"))).otherwise(F.col("__op"))
    )
    # op precedence on seq ties: D > U > I
    op_rank = F.when(F.col("__op") == "D", 0).when(F.col("__op") == "U", 1).otherwise(2)
    w = Window.partitionBy(*key_cols).orderBy(F.col("__seq").desc(), op_rank.asc())
    latest = (
        ops.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__seq")
    )
    b = base.select(
        *key_cols,
        *[F.col(c).alias(f"b_{c}") for c in payload_cols],
        F.lit(True).alias("__in_base"),
    )
    j = b.join(latest, key_cols, "full_outer")
    keep = F.col("__op").isNull() | (F.col("__op") != "D")
    merged = [
        F.when(F.col("__op").isin("I", "U"), F.col(c)).otherwise(F.col(f"b_{c}")).alias(c)
        for c in payload_cols
    ]
    return j.filter(keep).select(*key_cols, *merged)


def fk_orphan_rate(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    relation: str,
) -> DataFrame:
    """Referential-integrity audit for one FK relation: how many child
    rows point at a missing parent key. The join-health check a pipeline
    runs before trusting any star join — a nonzero orphan rate means the
    fact table silently shrinks under an inner join.

    SQL FK semantics: a NULL FK is not a violation — NULLs are counted
    separately (``n_null_fk``) and excluded from the rate's denominator.

    Plan: project parent to DISTINCT keys (key-sized, broadcastable for
    dimension tables), ONE left join + ONE aggregate over the child —
    no cross join, no second child pass. ``orphan_rate`` is one division
    of exact BIGINTs (NULL when no non-null FK rows exist).
    """
    p = (
        parent.select(F.col(parent_key).alias("__pk"))
        .distinct()
        .withColumn("__hit", F.lit(True))
    )
    j = child.select(F.col(child_key).alias("__pk")).join(p, "__pk", "left")
    # coalesce: SUM over an empty child is NULL, but "no rows" means 0
    n_nonnull = F.coalesce(F.sum(F.col("__pk").isNotNull().cast("long")), F.lit(0))
    n_orphans = F.coalesce(
        F.sum((F.col("__pk").isNotNull() & F.col("__hit").isNull()).cast("long")), F.lit(0)
    )
    return j.agg(
        F.lit(relation).alias("relation"),
        n_nonnull.alias("n_child"),
        F.coalesce(F.sum(F.col("__pk").isNull().cast("long")), F.lit(0)).alias("n_null_fk"),
        n_orphans.alias("n_orphans"),
        F.when(
            n_nonnull > 0, n_orphans.cast("double") / n_nonnull.cast("double")
        ).alias("orphan_rate"),
    )


def benford_audit(
    df: DataFrame,
    amount_cents: Column,
) -> DataFrame:
    """First-digit Benford's-law audit of an amount column — the
    fraud/fabrication screen auditors run over financial magnitudes:
    naturally-occurring multi-scale amounts follow P(d) = log10(1+1/d);
    fabricated or constrained data drifts (uniform digits, clustered
    at thresholds). Emits one row per leading digit 1-9 with observed
    vs expected shares and the standardized residual
    ``z = (p_obs − p_exp) / sqrt(p_exp·(1 − p_exp) / N)``.

    ``amount_cents`` must be an exact positive integer expression
    (cents); rows <= 0 are excluded (Benford applies to magnitudes).
    The leading digit is taken from the DECIMAL STRING — no float log10
    whose floor misrounds at powers of ten.

    Exactness: counts are exact BIGINTs from ONE partial-aggregable
    groupBy (9-row shuffle); expected shares and z are a fixed chain of
    double ops over those integers, rounded 6 dp — IEEE-identical
    cross-engine. Digits with zero observations still appear (expected
    share present, z < 0) via a 9-row literal frame left-joined to the
    counts, so a missing digit — the loudest red flag — is visible.
    """
    spark = df.sparkSession
    digits = spark.range(1, 10).select(F.col("id").cast("long").alias("digit"))
    obs = (
        df.select(amount_cents.cast("long").alias("c"))
        .filter(F.col("c") > 0)
        .select(F.substring(F.col("c").cast("string"), 1, 1).cast("long").alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    total = obs.agg(F.sum("n").alias("n_total"))
    t = (
        digits.join(obs, "digit", "left")
        .withColumn("n", F.coalesce("n", F.lit(0)).cast("long"))
        .crossJoin(F.broadcast(total))
    )
    p_exp = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
    p_obs = F.col("n").cast("double") / F.col("n_total").cast("double")
    z = (p_obs - p_exp) / F.sqrt(p_exp * (1 - p_exp) / F.col("n_total").cast("double"))
    return t.select(
        "digit",
        "n",
        F.col("n_total").cast("long").alias("n_total"),
        F.round(p_obs, 6).alias("observed_p"),
        F.round(p_exp, 6).alias("expected_p"),
        F.round(z, 6).alias("z_score"),
    )


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier tuple — the governance
    screen a training-data release needs: every row must be
    indistinguishable from at least k−1 others on the quasi-identifiers
    (Sweeney's k-anonymity), else the "anonymized" table re-identifies.
    NULLs count as a value (an all-NULL tuple is its own equivalence
    class — the conservative reading).

    One partial-aggregable groupBy to equivalence-class sizes (the
    shuffle carries one row per DISTINCT tuple, never raw rows), one
    single-row fold. Exact BIGINTs; ``at_risk_rate`` is one division.
    Output: (k_threshold, n_rows, n_classes, min_class_size,
    n_classes_at_risk, n_rows_at_risk, at_risk_rate).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    classes = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("c"))
    risk = F.col("c") < k
    agg = classes.agg(
        F.lit(k).cast("long").alias("k_threshold"),
        F.sum("c").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("c").cast("long").alias("min_class_size"),
        F.sum(risk.cast("long")).cast("long").alias("n_classes_at_risk"),
        F.sum(F.when(risk, F.col("c")).otherwise(F.lit(0))).cast("long").alias("n_rows_at_risk"),
    )
    return agg.withColumn(
        "at_risk_rate",
        F.round(
            F.col("n_rows_at_risk").cast("double") / F.col("n_rows").cast("double"), 6
        ),
    )


def l_diversity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 3,
) -> DataFrame:
    """Distinct l-diversity audit — the screen k-anonymity misses
    (Machanavajjhala et al. 2007): an equivalence class can hold k rows
    and still leak if they all share ONE sensitive value (homogeneity
    attack). Each quasi-identifier class must contain at least ``l``
    distinct sensitive values. NULL is a sensitive value like any other
    (conservative: an all-NULL class has l = 1, not l = 0).

    Two partial-aggregable shuffles on shrinking keys: quasi+sensitive
    tuples → per-class (rows, distinct-sensitive) — the DISTINCT is
    exact because the first groupBy already collapsed duplicates — then
    one single-row fold. Output mirrors ``k_anonymity_audit``:
    (l_threshold, n_rows, n_classes, min_l, n_classes_at_risk,
    n_rows_at_risk, at_risk_rate).
    """
    if l < 2:
        raise ValueError(f"l must be >= 2, got {l}")
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    cells = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).alias("c")
    )
    classes = cells.groupBy(*quasi_cols).agg(
        F.sum("c").alias("rows"), F.count(F.lit(1)).alias("lv")
    )
    risk = F.col("lv") < l
    agg = classes.agg(
        F.lit(l).cast("long").alias("l_threshold"),
        F.sum("rows").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("lv").cast("long").alias("min_l"),
        F.sum(risk.cast("long")).cast("long").alias("n_classes_at_risk"),
        F.sum(F.when(risk, F.col("rows")).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_rows_at_risk"),
    )
    return agg.withColumn(
        "at_risk_rate",
        F.round(
            F.col("n_rows_at_risk").cast("double") / F.col("n_rows").cast("double"), 6
        ),
    )


def reconcile_totals(
    header: DataFrame,
    detail: DataFrame,
    header_key: str,
    detail_key: str,
    header_cents,
    detail_cents,
    tolerance_cents: int = 0,
) -> DataFrame:
    """Header/detail reconciliation audit — the accounting-style check
    behind every invoice/ledger pipeline: does each header total equal
    the sum of its detail lines (within ``tolerance_cents``)? Reports
    the discrepancy profile, not just a boolean: headers with no
    detail rows reconcile against 0 (they surface as mismatches unless
    the header is 0 too — pair with the FK orphan audit for the
    reverse direction).

    Exactness: both sides quantize to integer cents per ROW before any
    sum; the diff is exact BIGINT. One partial-aggregable detail
    rollup, one hash join on the key, one single-row fold. Output:
    (n_headers, n_matched, n_mismatch, n_no_detail, max_abs_diff_cents,
    total_abs_diff_cents, mismatch_rate).
    """
    if tolerance_cents < 0:
        raise ValueError("tolerance_cents must be >= 0")
    h = header.select(
        F.col(header_key).alias("k"), header_cents.cast("long").alias("expected")
    )
    d = detail.groupBy(F.col(detail_key).alias("k")).agg(
        F.sum(detail_cents.cast("long")).alias("actual")
    )
    j = h.join(d, "k", "left").select(
        "k",
        "expected",
        F.coalesce("actual", F.lit(0)).alias("actual"),
        F.col("actual").isNull().alias("no_detail"),
    )
    diff = F.abs(F.col("actual") - F.col("expected"))
    bad = diff > tolerance_cents
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_headers"),
        F.sum((~bad).cast("long")).cast("long").alias("n_matched"),
        F.sum(bad.cast("long")).cast("long").alias("n_mismatch"),
        F.sum(F.col("no_detail").cast("long")).cast("long").alias("n_no_detail"),
        F.max(diff).cast("long").alias("max_abs_diff_cents"),
        F.sum(diff).cast("long").alias("total_abs_diff_cents"),
        F.round(
            F.sum(bad.cast("long")).cast("double") / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("mismatch_rate"),
    )


def fd_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Functional-dependency discovery over a candidate column set —
    the schema-profiling step before normalization, key inference, or
    anomaly rules: for every ordered pair A→B, does A determine B, and
    if not, how badly is the dependency violated? Reports both the
    distinct-count check (holds iff |π_A| = |π_{A,B}|) and the g3
    error (Kivinen-Mannila: the minimum fraction of rows to delete for
    the FD to hold — Σ_a (n_a − max_b n_ab)/n), the standard
    approximate-FD strength.

    ONE shared pass over ``df`` for ALL pairs (r15; the r14 shape ran
    |cols|·(|cols|−1) independent per-pair pipelines — 12 source scans
    for 4 columns — and the batch-6 A/B proved pinning the projection
    loses, so the fix is scan sharing, guide §6/§2.4): a hand-built
    Expand (explode of one struct per UNORDERED pair, non-member
    columns nulled, native types kept) feeds a single partial-aggregable
    groupBy that produces every pair's (A, B) contingency table at once;
    each contingency row then serves BOTH directions (A→B keys on A,
    B→A keys on B) through a map-side ×2 inline explode — the per-pair
    algebra (n, distinct counts, max-per-key) is unchanged and exact.

    Direction keys ride as strings: within one (pair, direction) the
    active column is a single column, and Spark's Ryu double→string /
    identity string casts are injective on values a typed groupBy has
    already normalized, so distinct-count algebra is unchanged; NULL
    stays NULL (a value, as before).

    Per-pair results are BIGINT-exact; g3 is one division. Output:
    (lhs, rhs, n, n_lhs_distinct, n_pair_distinct, holds, g3_error) —
    one row per ordered pair, row order unspecified (as before: the
    correctness gate is order-insensitive).
    """
    if len(cols) < 2:
        raise ValueError("need at least two candidate columns")
    n_cols = len(cols)
    upairs = [(i, j) for i in range(n_cols) for j in range(i + 1, n_cols)]

    def slot(k: int, active: tuple[int, int]):
        if k in active:
            return F.col(cols[k]).alias(f"c{k}")
        return F.lit(None).cast(df.schema[cols[k]].dataType).alias(f"c{k}")

    expand = F.explode(
        F.array(
            *[
                F.struct(F.lit(p).alias("pid"), *[slot(k, ij) for k in range(n_cols)])
                for p, ij in enumerate(upairs)
            ]
        )
    ).alias("e")
    ct = (
        df.select(expand)
        .groupBy(
            F.col("e.pid").alias("pid"),
            *[F.col(f"e.c{k}").alias(f"c{k}") for k in range(n_cols)],
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )

    def lhs_val(direction: int):
        # the active lhs column per pair id, as string (see docstring)
        e = None
        for p, (i, j) in enumerate(upairs):
            v = F.col(f"c{i if direction == 0 else j}").cast("string")
            e = F.when(F.col("pid") == p, v) if e is None else e.when(F.col("pid") == p, v)
        return e

    both_dirs = ct.select(
        F.explode(
            F.array(
                F.struct(
                    (F.col("pid") * 2).alias("opid"),
                    lhs_val(0).alias("a"),
                    F.col("cnt"),
                ),
                F.struct(
                    (F.col("pid") * 2 + 1).alias("opid"),
                    lhs_val(1).alias("a"),
                    F.col("cnt"),
                ),
            )
        ).alias("d")
    ).select("d.opid", "d.a", "d.cnt")
    per_a = both_dirs.groupBy("opid", "a").agg(
        F.sum("cnt").alias("ca"),
        F.max("cnt").alias("ma"),
        F.count(F.lit(1)).alias("cb"),
    )
    prof = per_a.groupBy("opid").agg(
        F.sum("ca").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_lhs_distinct"),
        F.sum("cb").cast("long").alias("n_pair_distinct"),
        (F.count(F.lit(1)) == F.sum("cb")).alias("holds"),
        F.round(
            (F.sum("ca") - F.sum("ma")).cast("double") / F.sum("ca").cast("double"),
            6,
        ).alias("g3_error"),
    )

    def name_of(which: int):
        e = None
        for p, (i, j) in enumerate(upairs):
            for d, k in ((0, (i, j)), (1, (j, i))):
                v = F.lit(cols[k[which]])
                cond = F.col("opid") == p * 2 + d
                e = F.when(cond, v) if e is None else e.when(cond, v)
        return e

    return prof.select(
        name_of(0).alias("lhs"),
        name_of(1).alias("rhs"),
        "n",
        "n_lhs_distinct",
        "n_pair_distinct",
        "holds",
        "g3_error",
    )


def t_closeness_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t_micro: int = 200_000,
) -> DataFrame:
    """t-closeness audit for an ORDERED sensitive attribute (Li,
    Li & Venkatasubramanian 2007) — the screen l-diversity misses: a
    class can hold l distinct salaries and still leak if they are all
    in the top bracket (similarity attack). Per equivalence class, the
    Earth Mover's Distance between the class's sensitive distribution
    and the table-wide one under the ordered-distance ground metric:

        EMD(P, Q) = (1/(m-1)) * sum_j |cumP_j - cumQ_j|

    over the m globally-distinct sensitive values in order. A release
    passes when max EMD <= t.

    Exactness: cumP_j = c_j / s (class cum count / class size) and
    cumQ_j = g_j / n are rationals, so each term scales to the exact
    integer |c_j * n - g_j * s| (DECIMAL-summed per class); the single
    division by s*n*(m-1) happens once per class, then quantizes to
    micro-units so the max/threshold compare is integer.

    Plan: one partial-aggregable groupBy to (quasi, sensitive) cells,
    a bounded window over distinct sensitive values for the global
    cumulative, a per-class window ordered by sensitive value (frame
    size <= m, parallel across classes), one fold. The shuffle carries
    distinct cells, never raw rows.

    Output: (t_threshold_micro, n_classes, max_emd_micro,
    n_classes_at_risk, n_rows_at_risk, at_risk_rate).
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if not (0 < t_micro <= 1_000_000):
        raise ValueError("t_micro must be in (0, 1000000]")
    s = F.col(sensitive_col)
    cells = df.groupBy(*quasi_cols, s.alias("__sv")).agg(
        F.count(F.lit(1)).alias("c")
    )
    # global ordered distribution over the bounded distinct-value set
    glob = cells.groupBy("__sv").agg(F.sum("c").alias("g"))
    wg = Window.orderBy("__sv").rowsBetween(Window.unboundedPreceding, 0)
    gcum = glob.select(
        "__sv", F.sum("g").over(wg).alias("gcum")
    )
    tot = glob.agg(
        F.sum("g").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("m"),
    )
    sizes = cells.groupBy(*quasi_cols).agg(F.sum("c").alias("size"))
    # every class evaluates EVERY global value j (a class missing value
    # j still contributes |cumP_j*n - gcum_j*s|): right-join cells onto
    # the global value list per class via the sizes x values frame
    grid = sizes.crossJoin(F.broadcast(gcum))
    joined = grid.join(cells, [*quasi_cols, "__sv"], "left").fillna(
        {"c": 0}
    )
    wc = (
        Window.partitionBy(*quasi_cols)
        .orderBy("__sv")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    terms = joined.withColumn("ccum", F.sum("c").over(wc)).crossJoin(
        F.broadcast(tot)
    )
    num = F.abs(
        F.col("ccum").cast("decimal(38,0)") * F.col("n")
        - F.col("gcum").cast("decimal(38,0)") * F.col("size")
    )
    per_class = terms.groupBy(*quasi_cols).agg(
        F.max("size").alias("size"),
        F.max("n").alias("n"),
        F.max("m").alias("m"),
        F.sum(num).alias("num"),
    )
    emd_micro = F.when(
        F.col("m") > 1,
        F.round(
            F.col("num").cast("double")
            / (
                F.col("size").cast("double")
                * F.col("n").cast("double")
                * (F.col("m") - 1).cast("double")
            )
            * 1_000_000.0
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    classes = per_class.withColumn("emd_micro", emd_micro)
    risk = F.col("emd_micro") > t_micro
    return classes.agg(
        F.lit(t_micro).cast("long").alias("t_threshold_micro"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.max("emd_micro").cast("long").alias("max_emd_micro"),
        F.sum(risk.cast("long")).cast("long").alias("n_classes_at_risk"),
        F.sum(F.when(risk, F.col("size")).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_rows_at_risk"),
        F.round(
            F.sum(F.when(risk, F.col("size")).otherwise(F.lit(0))).cast("double")
            / F.sum("size").cast("double"),
            6,
        ).alias("at_risk_rate"),
    )


def column_fingerprints(
    df: DataFrame,
    exprs: dict[str, Column],
) -> DataFrame:
    """Order-invariant per-column content checksums — the cheap answer
    to "is this copy of the table bit-identical to that one" across
    engines, replicas, or migration steps, without sorting anything:
    per row and column, a 32-bit integer hash of ``'col:value'``
    (md5-derived, the repo's portable hash family; NULL hashes as the
    distinct sentinel ``col:\\x01NULL``), summed per column in
    DECIMAL(38,0). Sums are commutative, so ANY partitioning, engine,
    or row order yields the same fingerprint; a single changed row
    shifts the sum with probability ~1-2^-32 per column.

    ``exprs`` maps output column names to ENGINE-PORTABLE string
    expressions (quantize doubles to cents, format dates explicitly —
    raw float/timestamp casts format differently across engines).

    ONE scan: every column's three aggregates ride a single partial-
    aggregable fold (never one pass per column), then the 1-row result
    unpivots to (column, n_rows, n_nulls, fp_sum as DECIMAL string) —
    one row per audited column.
    """
    if not exprs:
        raise ValueError("exprs must be non-empty")
    for name in exprs:
        if "'" in name or "\\" in name:
            raise ValueError(f"column name {name!r} must not contain quotes")
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for i, (name, e) in enumerate(exprs.items()):
        v = e.cast("string")
        h = F.conv(
            F.md5(
                F.concat(
                    F.lit(name + ":"),
                    F.coalesce(v, F.lit("\x01NULL")),
                )
            ).substr(1, 8),
            16,
            10,
        ).cast("long")
        aggs.append(
            F.sum(v.isNull().cast("long")).cast("long").alias(f"__nn_{i}")
        )
        aggs.append(
            F.sum(h.cast("decimal(38,0)")).cast("string").alias(f"__fp_{i}")
        )
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', __nn_{i}, __fp_{i}" for i, name in enumerate(exprs)
    )
    return one.selectExpr(
        f"stack({len(exprs)}, {stack_args}) AS (column, n_nulls, fp_sum)",
        "__n AS n_rows",
    ).select("column", "n_rows", "n_nulls", "fp_sum")


def dp_laplace_counts(
    df: DataFrame,
    group_col: str,
    salt: str,
    epsilon: float = 1.0,
    sensitivity: int = 1,
) -> DataFrame:
    """ε-differentially-private count release (Laplace mechanism,
    Dwork et al. 2006) — the MECHANISM member of the privacy family
    next to the k-anonymity / l-diversity / t-closeness AUDITS: per
    group, true count + Laplace(sensitivity/ε) noise, the shape every
    DP aggregate release takes.

    Noise is drawn from a keyed PRG, the way production DP systems do
    (the secret is the seed, not the algorithm): u = md5(salt:group)
    mapped to a 52-bit uniform, inverse-CDF'd to Laplace via
    −b·sign(u−½)·ln(1−2|u−½|). DP therefore holds exactly to the
    extent ``salt`` is SECRET and FRESH per release — reusing a salt
    re-releases the same noise and composes ε; a leaked salt voids the
    guarantee. Determinism-given-salt is what makes the release
    oracle-checkable (and replayable for audits).

    Plan: one partial-aggregable groupBy + a narrow projection — noise
    is a per-GROUP expression over the k-row count table, never a
    per-row pass. The ln/sign chain is fixed-order, mirrored verbatim
    by the oracle; output rounded 6 dp (no integer-boundary rounding,
    whose last-ulp could differ cross-engine).
    """
    if epsilon <= 0:
        raise ValueError(f"epsilon must be positive, got {epsilon}")
    if sensitivity < 1:
        raise ValueError(f"sensitivity must be >= 1, got {sensitivity}")
    counts = df.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).alias("n")
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), F.col("g").cast("string"))), 1, 13
        ),
        16,
        10,
    ).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(1 << 52))
    x = u - F.lit(0.5)
    b = float(sensitivity) / float(epsilon)
    noise = (
        F.lit(-b)
        * F.signum(x)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(x))
    )
    return counts.select(
        F.col("g").alias(group_col),
        F.round(F.col("n").cast("double") + noise, 6).alias("noisy_count"),
        F.lit(float(epsilon)).alias("epsilon"),
        F.lit(int(sensitivity)).cast("long").alias("sensitivity"),
    )


def benford_first_digit_audit(
    df: DataFrame,
    amount_cents,
    min_cents: int = 100,
) -> DataFrame:
    """Benford's-law first-digit audit — the classic forensic screen
    for fabricated or systematically manipulated amounts (Nigrini's
    accounting forensics): natural multi-scale amounts put ~30.1% of
    first significant digits at 1 and only ~4.6% at 9; fabricated data
    rarely does. Reports, per digit 1..9, the observed count, the
    Benford-expected count, and the deviation, plus the chi-squared
    statistic (8 df) repeated per row for single-pass consumption.

    Determinism: the first digit comes from the CENTS INTEGER's string
    form (never floor(log10(x)) — float log at exact powers of ten
    differs across libms); counts are exact BIGINTs; the expected
    probabilities are the same literal doubles in both engines; chi2 is
    one fixed-order double chain over exact integers (round 6). Rows
    below ``min_cents`` are excluded (sub-unit amounts have no stable
    first digit in display units — and Benford applies to magnitudes
    spanning scales).

    Scale: one map-side projection + a 9-row partial-aggregable
    groupBy; totals broadcast from a 1-row aggregate.
    """
    import math

    if min_cents < 1:
        raise ValueError("min_cents must be >= 1")
    c = amount_cents.cast("long")
    per = (
        df.select(c.alias("c"))
        .filter(F.col("c") >= min_cents)
        .select(
            F.substring(F.col("c").cast("string"), 1, 1).cast("int").alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = per.agg(F.sum("n").cast("long").alias("nn"))
    t = per.crossJoin(F.broadcast(tot))
    # literal Benford probabilities — identical doubles in the oracle
    p = F.create_map(
        *[
            x
            for d in range(1, 10)
            for x in (F.lit(d), F.lit(math.log10(1.0 + 1.0 / d)))
        ]
    )[F.col("digit")]
    expected = F.col("nn").cast("double") * p
    dev = F.col("n").cast("double") - expected
    # each digit's chi term quantizes to micro BEFORE the 9-row sum, so
    # the statistic is an exact integer sum — no FP-order drift between
    # Spark's partial aggregation and the oracle's sequential sum
    scored = t.select(
        F.col("digit").cast("long").alias("digit"),
        F.col("n").cast("long").alias("n"),
        F.round(expected, 6).alias("expected_n"),
        F.round(dev, 6).alias("deviation"),
        F.round(dev * dev / expected * 1e6).cast("long").alias("__chi_micro"),
    )
    chi = scored.agg(
        (F.sum("__chi_micro").cast("double") / 1e6).alias("chi2")
    )
    return scored.crossJoin(F.broadcast(chi)).drop("__chi_micro")
