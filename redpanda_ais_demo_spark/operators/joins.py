"""Join utilities for skewed data (SURVEY.md §4 scale doctrine).

AQE's skew-join splitting (on in session.py) handles most skew at
runtime by splitting oversized shuffle partitions. Explicit salting
remains the tool when (a) the skewed side feeds a *broadcast-ineligible*
join and one key dominates an entire executor, or (b) the skew is known
ahead of time and you want a deterministic plan rather than a runtime
rescue. The transformation is semantics-preserving for equi-joins: the
dimension row for each key is replicated once per salt, the fact's rows
scatter uniformly across the salts, and (key, salt) equality reassembles
exactly the original matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

_SALT = "__salt"

# Salting replicates each dim row once per salt, so join types that emit
# UNMATCHED dim rows (right/full outer) would surface those rows n_salts
# times — a semantics change, not an optimization. Fact-side-preserving
# types are exactly equivalent.
_EQUIVALENCE_PRESERVING_HOW = frozenset(
    {"inner", "left", "leftouter", "left_outer", "semi", "leftsemi", "left_semi", "anti", "leftanti", "left_anti"}
)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the fact's hot keys scattered over ``n_salts``
    sub-keys and the (small) dim side replicated to meet them.

    The fact side's salt must be uniform per row but is otherwise
    arbitrary — it hashes the row's own key plus a per-row nonce so a
    single hot key spreads across all salts. Output columns match
    ``fact.join(dim, fact[fact_key] == dim[dim_key], how)`` minus the
    bookkeeping columns, for the fact-preserving ``how`` types only —
    right/full outer joins are rejected (replicated dim rows that match
    no fact row would each surface once per salt).
    """
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in _EQUIVALENCE_PRESERVING_HOW}:
        raise ValueError(
            f"salted_join(how={how!r}) would change semantics: unmatched dim rows "
            f"are replicated {n_salts}x under right/full outer joins. "
            "Use inner/left/left_semi/left_anti, or salt the other side."
        )
    salted_fact = fact.withColumn(
        _SALT,
        F.pmod(F.xxhash64(F.col(fact_key), F.monotonically_increasing_id()), F.lit(n_salts)).cast(
            "int"
        ),
    )
    salted_dim = dim.withColumn(_SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    cond = (salted_fact[fact_key] == salted_dim[dim_key]) & (
        salted_fact[_SALT] == salted_dim[_SALT]
    )
    return salted_fact.join(salted_dim, cond, how).drop(_SALT)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a hash-bucketed (optionally per-bucket-sorted)
    parquet table registered in the session catalog at an explicit
    ``path`` (external table — no warehouse-dir dependency).

    Bucketing is the storage-level answer to the shuffle problem: every
    row lands in bucket ``hash(bucket_cols) % num_buckets`` at WRITE
    time, so any later equi-join or aggregation on the bucket key
    between tables bucketed the same way needs NO Exchange — Catalyst
    recognizes the child distributions as already compatible. At 100 TB
    the big fact-fact join (orders x lineitem, events x entities) is the
    single largest shuffle in the pipeline; paying the hash once at
    ingest amortizes it over every downstream query. ``sort_cols``
    additionally pre-sorts inside each bucket file, which removes the
    Sort below a SortMergeJoin too.
    """
    w = df.write.format("parquet").mode(mode).option("path", path)
    w = w.bucketBy(num_buckets, bucket_cols[0], *bucket_cols[1:])
    if sort_cols:
        w = w.sortBy(sort_cols[0], *sort_cols[1:])
    w.saveAsTable(table_name)


def colocated_join(spark, left_table: str, right_table: str, on, how: str = "inner") -> DataFrame:
    """Join two catalog tables previously written by ``write_bucketed``
    with identical bucket spec on the join key. The resulting physical
    plan contains no Exchange on either side (pin:
    tests/test_plan_shapes.py::test_bucketed_join_has_no_exchange)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def interval_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    cell_size: float,
) -> DataFrame:
    """Point-in-interval join as an equi-join on a coarse grid — the
    scale path for LARGE interval tables, where the broadcast-nested-
    loop form (``range_join_value_bands``) stops being an option.

    Each interval ``[lo, hi)`` explodes into the grid cells it covers
    (``floor(lo/cell) .. floor(hi/cell)`` — pick ``cell_size`` near the
    typical interval span so that's ~2 cells); each point maps to one
    cell. The join is then a plain hash equi-join on the cell id —
    shuffle both sides by cell, O(points + intervals + matches), versus
    the O(points x intervals) comparison of a nested loop. Exact
    half-open containment (``lo <= p < hi``) filters after the cell
    match, so results are identical to the naive inequality join.

    Skew note: a hot cell (many intervals/points in one value range)
    behaves like any hot join key — AQE skew-join splitting or
    ``salted_join`` applies unchanged, which is exactly why reducing the
    interval join to an equi-join is the 100 TB-safe formulation.
    """
    lo, hi, p = F.col(lo_col), F.col(hi_col), F.col(point_col)
    # inverted intervals (hi < lo) match nothing by definition — drop them
    # BEFORE the explode, where sequence(start, stop) with start > stop
    # would otherwise generate a useless descending cell list
    intervals = intervals.filter(lo <= hi)
    cells = intervals.withColumn(
        "__cell",
        F.explode(
            F.sequence(
                F.floor(lo / F.lit(cell_size)).cast("long"),
                F.floor(hi / F.lit(cell_size)).cast("long"),
            )
        ),
    )
    keyed_points = points.withColumn("__cell", F.floor(p / F.lit(cell_size)).cast("long"))
    # inner only: the exact-containment filter after the cell match would
    # defeat any outer variant's unmatched rows anyway
    return (
        keyed_points.join(cells, "__cell", "inner")
        .filter((lo <= p) & (p < hi))
        .drop("__cell")
    )


def pit_join(
    probe: DataFrame,
    dim: DataFrame,
    key_col: str,
    probe_ts_col: str,
    valid_from_col: str,
    attr_col: str,
    probe_cols: list[str],
    dim_tiebreak_col: str | None = None,
) -> DataFrame:
    """Point-in-time (PIT) join of a fact/probe stream against an SCD2
    versioned dimension — the feature-store correctness join ("what was
    this key's attribute AT event time", never the leaky current
    value). Probe row at time t gets the dim version with the largest
    ``valid_from <= t`` (half-open [valid_from, valid_to) semantics: a
    probe exactly AT a version start sees the NEW version); probes
    before the first version get NULL.

    Scale shape — the reason this exists as an operator: the naive
    formulation is an inequality join (probe x versions, then
    min-per-probe), whose candidate count is probes x avg-versions and
    whose range predicate defeats hash joins. This instead UNIONS the
    version-start rows into the probe stream and carries the attribute
    forward with one per-key ``last(ignorenulls)`` window — cost is one
    shuffle of probes+versions on the key, zero join blow-up, identical
    semantics (the as-of family's union trick, applied to the SCD2
    contract). Ties at one timestamp order dim-before-probe, and among
    dim rows by ``dim_tiebreak_col`` ASC so the highest tiebreak wins.

    Output: ``probe_cols`` + ``attr_col`` (NULL before first version).
    """
    if not probe_cols:
        raise ValueError("probe_cols must be non-empty")
    # The carried value is a STRUCT wrapping the attribute, not the bare
    # attribute: last(ignorenulls) skips NULLs, and a dim version whose
    # attribute is legitimately NULL must still supersede the previous
    # version (otherwise probes at/after it inherit a stale value — a
    # silent point-in-time leak). The struct is non-null for every dim
    # row regardless of the attribute inside it, so the carry respects
    # NULL-attributed versions exactly.
    d = dim.select(
        F.col(key_col).alias("__k"),
        F.col(valid_from_col).cast("long").alias("__ts"),
        F.lit(1).alias("__isdim"),
        F.struct(F.col(attr_col).alias("a")).alias("__attr"),
        (
            F.col(dim_tiebreak_col).cast("long")
            if dim_tiebreak_col
            else F.lit(0)
        ).alias("__tb"),
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c) for c in probe_cols],
    )
    p = probe.select(
        F.col(key_col).alias("__k"),
        F.col(probe_ts_col).cast("long").alias("__ts"),
        F.lit(0).alias("__isdim"),
        F.lit(None)
        .cast(StructType([StructField("a", dim.schema[attr_col].dataType)]))
        .alias("__attr"),
        F.lit(0).alias("__tb"),
        *probe_cols,
    )
    u = d.unionByName(p)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__isdim").desc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.withColumn(
        "__state", F.last("__attr", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("__isdim") == 0).select(
        *probe_cols, F.col("__state")["a"].alias(attr_col)
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    cell_size: int,
) -> DataFrame:
    """Interval×interval OVERLAP join (half-open semantics: rows pair
    iff ``l.lo < r.hi AND r.lo < l.hi``) — the concurrency join behind
    "which sessions/visits/outages coincided", and the third member of
    the temporal-join family next to the as-of join and the
    point-in-interval range join.

    Scale shape: the naive formulation is a pure inequality join
    (cartesian under the hood). Both sides instead explode onto a
    ``cell_size`` grid (an interval occupies cells
    floor(lo/c)..floor(hi/c)), pair candidates meet with ONE hash
    equi-join on the cell, and each true pair is counted exactly once
    at the CANONICAL cell — the cell containing ``greatest(l.lo,
    r.lo)``, the overlap's start, which both intervals provably occupy
    — so no distinct/dedup pass is needed after the exact filter.
    Candidate count is Σ per-cell occupancy², the grid-file contract
    shared with ``close_pairs``; pick ``cell_size`` near the typical
    interval length, and AQE's skew-join split handles hot cells.

    Inverted (hi <= lo, empty under half-open semantics) intervals are
    dropped before the explode. Output: left columns + right columns
    (callers alias collisions away beforehand).
    """
    if cell_size <= 0:
        raise ValueError("cell_size must be positive")
    llo, lhi = F.col(left_lo), F.col(left_hi)
    rlo, rhi = F.col(right_lo), F.col(right_hi)
    cells = lambda lo, hi: F.explode(  # noqa: E731
        F.sequence(
            F.floor(lo / F.lit(cell_size)).cast("long"),
            F.floor(hi / F.lit(cell_size)).cast("long"),
        )
    )
    lc = left.filter(llo < lhi).withColumn("__cell", cells(llo, lhi))
    rc = right.filter(rlo < rhi).withColumn("__cell", cells(rlo, rhi))
    canonical = F.floor(
        F.greatest(llo, rlo) / F.lit(cell_size)
    ).cast("long")
    return (
        lc.join(rc, "__cell")
        .filter((llo < rhi) & (rlo < lhi) & (F.col("__cell") == canonical))
        .drop("__cell")
    )
