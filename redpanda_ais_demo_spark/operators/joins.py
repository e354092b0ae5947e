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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
