"""Distributed frequency sketches: count-min over arbitrary item columns.

Completes the sketch family next to HLL cardinality
(``plans/ais_queries.py:a1_total_ships_approx``) and the MinHash/SimHash
similarity sketches (``operators/dedup.py``): CMS answers point frequency
queries ("how often does this token appear corpus-wide?") in fixed
``depth × width`` space, with one-sided error — estimates never
undercount, and overcount by more than ``2N/width`` with probability at
most ``2^-depth`` per lookup.

Scale shape: the sketch build is a single explode + partial-agg count —
the shuffle carries at most ``depth × width`` counter rows regardless of
corpus size, so the sketch table itself broadcasts everywhere it is
consumed. That is the whole point at 100 TB: exact per-token counts are
a vocabulary-sized shuffle; the CMS is a constant-sized one.

Engine-internal hashing (xxhash64) — no SQL oracle; the estimate-vs-exact
error bounds are pytest-verified (tests/test_sketches.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _bucket_structs(item: F.Column, depth: int, width: int) -> F.Column:
    """Array of (row, col) sketch coordinates for an item — one per hash
    row, col = xxhash64(row-seed, item) mod width."""
    return F.array(
        *[
            F.struct(
                F.lit(d).alias("row"),
                F.pmod(F.xxhash64(F.lit(d), item), F.lit(width)).alias("col"),
            )
            for d in range(depth)
        ]
    )


def cms_build(
    items: DataFrame, item_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Count-min sketch of the ``item_col`` frequency distribution:
    (row, col, count) with at most depth × width rows. Each input row
    increments one counter per hash row; the explode is map-side and the
    groupBy's partial aggregation collapses to ≤ depth × width states
    per task before anything shuffles.
    """
    coords = items.select(
        F.explode(_bucket_structs(F.col(item_col), depth, width)).alias("rc")
    )
    return (
        coords.groupBy(F.col("rc.row").alias("row"), F.col("rc.col").alias("col"))
        .agg(F.count("*").alias("count"))
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-frequency estimates for ``queries[item_col]``: min over the
    item's ``depth`` counters (a missing counter means no collision ever
    touched that cell — the estimate is 0).

    The sketch side is ≤ depth × width rows → broadcast; each query row
    explodes to ``depth`` probes and folds back with a min — queries
    never shuffle.
    """
    probes = queries.select(
        F.col(item_col),
        F.explode(_bucket_structs(F.col(item_col), depth, width)).alias("rc"),
    ).select(item_col, F.col("rc.row").alias("row"), F.col("rc.col").alias("col"))
    return (
        probes.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("count"), F.lit(0))).alias("est_count"))
    )


# --- Mergeable sketch rollups (HLL distinct / KLL quantiles) ---------------
#
# The pre-aggregation pattern that makes "distinct users last N days" and
# "p95 latency last N days" answerable without ever rescanning raw data:
# materialize one small binary sketch per (bucket, group), then any query
# window is a cheap MERGE of the covered buckets. Sketch union is exact
# over the sketch state (merging per-bucket HLL registers yields the very
# same registers as sketching the union directly), so rollup-then-merge
# loses nothing vs direct sketching — pinned by
# tests/test_sketches.py::test_hll_rollup_merge_equals_direct.


def hll_rollup(
    df: DataFrame, bucket_cols: list[str], key_col: str, lgk: int = 12
) -> DataFrame:
    """One HLL sketch of ``key_col`` per bucket — the daily/hourly
    distinct-count rollup table. Size: ~2^lgk bytes per bucket row,
    independent of cardinality."""
    return df.groupBy(*bucket_cols).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lgk)).alias("hll")
    )


def hll_rollup_estimate(rollup: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge rollup sketches up to ``group_cols`` granularity and
    estimate distinct counts — the query-time side: reads only the tiny
    rollup table, never the raw events."""
    return rollup.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("hll"))).alias("approx_distinct")
    )


def kll_rollup(
    df: DataFrame, bucket_cols: list[str], value_col: str, k: int = 200
) -> DataFrame:
    """One KLL quantile sketch of ``value_col`` (as double) per bucket —
    the rank/percentile companion to ``hll_rollup``."""
    return df.groupBy(*bucket_cols).agg(
        F.kll_sketch_agg_double(F.col(value_col).cast("double"), F.lit(k)).alias("kll")
    )


def kll_rollup_quantiles(
    rollup: DataFrame, group_cols: list[str], quantiles: list[float]
) -> DataFrame:
    """Merge bucket sketches and read quantiles: one output column per
    requested quantile (``q50``-style names). Unlike HLL (hll_union_agg),
    KLL ships only a binary pairwise merge — fold it over the group's
    collected sketch list (bucket counts per group are small by
    construction: that's what a rollup is)."""
    merged = rollup.groupBy(*group_cols).agg(
        F.collect_list("kll").alias("__sketches")
    ).select(
        *group_cols,
        F.aggregate(
            F.col("__sketches"),
            F.lit(None).cast("binary"),
            lambda acc, x: F.when(acc.isNull(), x).otherwise(
                F.kll_sketch_merge_double(acc, x)
            ),
        ).alias("kll"),
    )
    return merged.select(
        *group_cols,
        *[
            F.kll_sketch_get_quantile_double(F.col("kll"), F.lit(q)).alias(
                f"q{int(round(q * 100)):02d}"
            )
            for q in quantiles
        ],
    )


def heavy_hitters(
    docs: DataFrame,
    min_freq_pct: float = 1.0,
    k: int = 128,
    text_col: str = "text",
) -> DataFrame:
    """Corpus heavy hitters (tokens with frequency ≥ ``min_freq_pct`` %
    of all tokens) in bounded memory — the Misra-Gries two-pass shape:

    1. *Prune pass* (mapInPandas, one narrow scan): each partition
       counts its own tokens and keeps only those above ``n_p/k`` —
       bounded candidate state per partition. The MG merge bound
       applies: an item dropped everywhere loses at most ``Σ n_p/k =
       n/k`` total count, so with ``k > 100/min_freq_pct`` every true
       heavy hitter provably survives into the candidate set, on ANY
       partitioning.
    2. *Verify pass*: candidates (small) broadcast; exact recount via
       left-semi + partial agg; threshold on the exact counts.

    The final answer is therefore exact and partitioning-independent —
    unlike raw merged-MG estimates — while the shuffle carries only
    candidate tokens instead of the whole vocabulary. The single
    Python stage is the bounded-state prune; counting stays JVM-side.
    """
    if k * min_freq_pct <= 100.0:
        raise ValueError(
            f"k={k} cannot guarantee {min_freq_pct}% hitters: need k > {100.0 / min_freq_pct}"
        )
    from ..dist import ensure_shipped

    ensure_shipped(docs.sparkSession)

    def prune(batches):
        import pandas as pd

        counts = {}
        n_part = 0
        for pdf in batches:
            for text in pdf[text_col]:
                for t in text.split(" "):
                    counts[t] = counts.get(t, 0) + 1
                    n_part += 1
        cut = n_part / k
        yield pd.DataFrame({"term": [t for t, c in counts.items() if c > cut]})

    candidates = docs.select(text_col).mapInPandas(prune, "term string").distinct()
    toks = docs.select(F.explode(F.split(F.col(text_col), " ")).alias("term"))
    total = toks.count()
    exact = (
        toks.join(F.broadcast(candidates), "term", "left_semi")
        .groupBy("term")
        .agg(F.count("*").alias("n_occurrences"))
        .filter(F.col("n_occurrences") * 100 >= F.lit(float(min_freq_pct)) * total)
    )
    return exact.withColumn("corpus_tokens", F.lit(total))


def hll_sliding_distinct(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    window_days: int = 7,
    lgk: int = 12,
) -> DataFrame:
    """Sliding-window distinct-count via HLL sketch ROLLUP — the pattern
    that makes "7-day active users, daily" affordable at 100 TB: the raw
    stream collapses ONCE into one ~2^lgk-byte sketch per day (a
    partial-aggregable groupBy), and every sliding window is a UNION of
    ≤window_days sketches — never a re-scan of raw events, and the daily
    sketch table is reusable for 30-day / monthly rollups of the same
    data (the property exact count-distinct fundamentally lacks:
    distincts don't merge, sketches do).

    The window union runs hll_union_agg as a window aggregate over the
    DAY table (≤ one row per day — the WindowExec single-partition
    warning is about this tiny table, not raw data; partition by
    year/tenant at real scale if the day table itself grows).

    Output: (day, exact_day, approx_window) — the per-day exact count
    rides along for in-query error visibility. Estimate-bearing
    (rows-only oracle; the relative-error bound is pytest-pinned
    against exact sliding distincts).
    """
    daily = (
        df.select(F.date_format(F.col(ts_col), "yyyy-MM-dd").alias("day"), F.col(key_col).alias("k"))
        .groupBy("day")
        .agg(
            F.hll_sketch_agg(F.col("k"), F.lit(lgk)).alias("hll"),
            F.count_distinct("k").alias("exact_day"),
        )
    )
    w = Window.orderBy("day").rowsBetween(-(window_days - 1), 0)
    return daily.select(
        "day",
        F.col("exact_day").cast("long").alias("exact_day"),
        F.hll_sketch_estimate(F.hll_union_agg("hll").over(w))
        .cast("long")
        .alias("approx_window"),
    )


def kmv_sketch(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int = 256,
) -> DataFrame:
    """K-minimum-values distinct sketch per group (Bar-Yossef et al.
    2002): the k smallest PORTABLE hash values of the group's ids —
    md5-prefix (60-bit) rather than the engine-internal xxhash64 the
    CMS/HLL members use, which makes every downstream estimate exactly
    replayable in ANSI SQL (this module's only fully oracle-checkable
    sketch). Unlike HLL, the retained values form a uniform SAMPLE of
    the hashed universe, so KMV sketches compose under set operations —
    intersection/Jaccard estimates that HLL can only reach through
    error-amplifying inclusion-exclusion.

    One distinct-collapse then a per-group top-k window over hash
    order; output (group, h, rank) — at most k rows per group. Hash
    collisions merge ids exactly as the estimator assumes (and the
    oracle replays them identically).
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    sk = df.select(F.col(group_col).alias("grp"), h.alias("h")).distinct()
    w = Window.partitionBy("grp").orderBy("h")
    return (
        sk.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("grp", "h", "rank")
    )


_KMV_SCALE = float(1 << 60)  # hash space size for 15 md5 hex chars


def kmv_overlap(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int = 256,
) -> DataFrame:
    """Pairwise audience overlap from KMV sketches: for every group
    pair (a < b), merge the two k-sets, keep the union's k smallest
    hashes, and read off |A∪B| ≈ (K−1)·2⁶⁰/τ (the KMV estimator; exact
    when the union fits inside k), Jaccard ≈ the fraction of those K
    hashes present in BOTH sketches, and |A∩B| = Jaccard·|A∪B| —
    Beyer et al. 2007. The exact sibling (audience_overlap_*) shuffles
    every (group, id) pair; this touches each id once to build
    G·k-row sketches and then works entirely on sketch rows — the only
    shape that survives 100 TB ids, and the error is a measured
    1/√k (pytest-pinned).

    Estimates are one fixed double chain over exact BIGINT hash
    statistics, so the whole operator — sketch, merge, estimate — is
    oracle-replayable. Output per pair: grp_a, grp_b, k_union (merged
    set size ≤ k), n_both (hashes in both sketches among them),
    union_est, jaccard_est, inter_est (6 dp).
    """
    sk = kmv_sketch(df, group_col, id_col, k)
    groups = sk.select("grp").distinct()
    pairs = (
        groups.alias("ga")
        .crossJoin(groups.alias("gb"))
        .filter(F.col("ga.grp") < F.col("gb.grp"))
        .select(F.col("ga.grp").alias("a"), F.col("gb.grp").alias("b"))
    )
    side_a = pairs.join(sk.alias("s"), F.col("s.grp") == F.col("a")).select(
        "a", "b", F.col("s.h").alias("h"),
        F.lit(1).alias("in_a"), F.lit(0).alias("in_b"),
    )
    side_b = pairs.join(sk.alias("s"), F.col("s.grp") == F.col("b")).select(
        "a", "b", F.col("s.h").alias("h"),
        F.lit(0).alias("in_a"), F.lit(1).alias("in_b"),
    )
    merged = (
        side_a.unionByName(side_b)
        .groupBy("a", "b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("a", "b").orderBy("h")
    kept = merged.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") <= k
    )
    agg = kept.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("k_union"),
        F.max("h").alias("tau"),
        F.sum((F.col("in_a") * F.col("in_b")).cast("long"))
        .cast("long")
        .alias("n_both"),
    )
    union_est = F.when(
        F.col("k_union") < k, F.col("k_union").cast("double")
    ).otherwise(
        (F.col("k_union") - 1).cast("double")
        * F.lit(_KMV_SCALE)
        / F.col("tau").cast("double")
    )
    jac = F.col("n_both").cast("double") / F.col("k_union").cast("double")
    return agg.select(
        F.col("a").alias("grp_a"),
        F.col("b").alias("grp_b"),
        "k_union",
        "n_both",
        F.round(union_est, 6).alias("union_est"),
        F.round(jac, 6).alias("jaccard_est"),
        F.round(jac * union_est, 6).alias("inter_est"),
    )
