"""Incremental view maintenance for aggregate materialized views: fold a
delta batch into a pre-aggregated MV WITHOUT rescanning the base data —
the mechanism behind every "refresh the nightly rollup from today's
partition" job, and the batch analogue of the reference's
append-only MV + recompute-per-render dashboard (its backing store
recomputes aggregates from raw events; at 100 TB the rollup must be
maintained, not recomputed).

Mergeable measures only (sum / count / min / max — the algebraic class;
avg derives as sum/count downstream): per group the merged state is
elementwise combine of MV state and delta partial state. A full outer
join on the group key — the delta side is usually tiny relative to the
MV, so Spark broadcasts it (AQE decides); groups touched only by the
delta appear, untouched MV groups pass through unchanged.

Correctness contract (pinned by oracle + pytest): for any split of the
base data into (prefix, delta), ``merge_agg(agg(prefix), delta) ==
agg(prefix ∪ delta)`` — associativity of the partial aggregates, the
same property Spark's own map-side combine relies on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MERGES = {
    "sum": lambda a, b: F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0)),
    "count": lambda a, b: F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0)),
    "min": lambda a, b: F.least(a, b),  # least/greatest skip NULLs
    "max": lambda a, b: F.greatest(a, b),
}


def agg_state(df: DataFrame, keys: list[str], measures: dict[str, tuple[str, str]]) -> DataFrame:
    """Aggregate ``df`` to MV state: ``measures`` maps output column ->
    (op, input_col) with op in sum/count/min/max (count ignores its
    input col and counts rows)."""
    aggs = []
    for out, (op, col) in measures.items():
        if op not in _MERGES:
            raise ValueError(f"unsupported measure op {op!r} (mergeable ops: {sorted(_MERGES)})")
        aggs.append(
            F.count("*").alias(out) if op == "count" else getattr(F, op)(F.col(col)).alias(out)
        )
    return df.groupBy(*keys).agg(*aggs)


def merge_agg(
    mv: DataFrame,
    delta: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """Fold raw ``delta`` rows into aggregate ``mv`` state. Returns the
    refreshed MV (same schema). The delta aggregates first (map-side
    partial — the shuffle carries one row per touched group), then one
    outer join against the MV on the group key merges states."""
    if not keys:
        raise ValueError("keys must be non-empty")
    d = agg_state(delta, keys, measures)
    m = mv
    for out in measures:
        m = m.withColumnRenamed(out, f"__mv_{out}")
        d = d.withColumnRenamed(out, f"__d_{out}")
    j = m.join(d, keys, "full_outer")
    merged = [
        _MERGES[op](F.col(f"__mv_{out}"), F.col(f"__d_{out}")).alias(out)
        for out, (op, _) in measures.items()
    ]
    return j.select(*keys, *merged)
