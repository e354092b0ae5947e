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


class RewriteError(ValueError):
    """Query not answerable from the MV state — fall back to the base scan."""


def mv_answer(
    mv: DataFrame,
    mv_keys: list[str],
    mv_measures: dict[str, tuple[str, str]],
    want_keys: list[str],
    want_measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """Aggregate-MV query rewrite — the serving half of the IVM pair
    (merge_agg maintains the state; this ANSWERS queries from it): an
    aggregate over the base table re-targets to the vastly smaller MV
    when the rewrite is legal, i.e.

    - every requested group key is one of the MV's keys (roll-up only —
      the MV can coarsen, never refine), and
    - every requested measure derives from mergeable MV state:
      sum→sum(sum), count→sum(count), min→min(min), max→max(max),
      avg→sum(sum)/sum(count) (ONE division of exact partials).

    ``want_measures`` maps output → (op, mv_state_col); for avg the
    state col is "sum_col/count_col". Illegal rewrites raise
    RewriteError so a planner can fall back to the base scan — the
    Calcite/Materialize MV-matching rule, reduced to the algebraic
    aggregate class Spark's own partial aggregation already relies on.

    At 100 TB this is the difference between scanning the corpus and
    scanning one row per (key-combination): the MV is key-cardinality-
    sized, and the re-aggregation is a partial-aggregable groupBy over
    it.
    """
    for k in want_keys:
        if k not in mv_keys:
            raise RewriteError(f"group key {k!r} not in MV keys {mv_keys} (cannot refine)")
    aggs = []
    for out, (op, col) in want_measures.items():
        if op == "avg":
            try:
                sum_col, cnt_col = col.split("/")
            except ValueError:
                raise RewriteError(f"avg state for {out!r} must be 'sum_col/count_col', got {col!r}")
            for c in (sum_col, cnt_col):
                if c not in mv_measures:
                    raise RewriteError(f"avg for {out!r} needs MV state {c!r}")
            if mv_measures[sum_col][0] != "sum" or mv_measures[cnt_col][0] != "count":
                raise RewriteError(f"avg for {out!r} needs (sum, count) state, got "
                                   f"{mv_measures[sum_col][0]}/{mv_measures[cnt_col][0]}")
            aggs.append(
                (F.sum(sum_col).cast("double") / F.sum(cnt_col).cast("double")).alias(out)
            )
            continue
        if col not in mv_measures:
            raise RewriteError(f"measure {out!r} wants MV state {col!r} which the MV lacks")
        state_op = mv_measures[col][0]
        if op == "sum" and state_op in ("sum", "count"):
            aggs.append(F.sum(col).alias(out))
        elif op == "count" and state_op == "count":
            aggs.append(F.sum(col).alias(out))
        elif op in ("min", "max") and state_op == op:
            aggs.append(getattr(F, op)(col).alias(out))
        else:
            raise RewriteError(
                f"{op} over {state_op} state is not a legal merge for {out!r}"
            )
    if not aggs:
        raise RewriteError("no measures requested")
    return mv.groupBy(*want_keys).agg(*aggs)


def merge_join(
    view: DataFrame,
    a_old: DataFrame,
    delta_a: DataFrame,
    b_old: DataFrame,
    delta_b: DataFrame,
    on: list[str],
) -> DataFrame:
    """Incremental maintenance of an inner equi-join view under
    append-only deltas — the join half of the IVM pair (``merge_agg``
    maintains aggregates): with V = A_old ⋈ B_old already materialized,
    the refreshed view is the delta-join identity

        V' = V  ∪  (ΔA ⋈ B_old)  ∪  (A_old ⋈ ΔB)  ∪  (ΔA ⋈ ΔB)

    — three joins whose LEFT sides are delta-sized, never a recompute
    of A ⋈ B. At 100 TB with daily deltas this is the difference
    between touching a day and touching seven years; the deltas are
    usually broadcastable, so the three terms are map-side probes of
    the stored (ideally bucketed — joins.write_bucketed) base tables.

    Contract: append-only (no updates/deletes — those need signed
    multiplicities, the classic DBSP/differential generalization);
    ``on`` columns must be same-named in every input; non-key columns
    of A and B must not collide (same as the original join).
    """
    if not on:
        raise ValueError("on must be non-empty")
    for name, df_ in (("a_old", a_old), ("delta_a", delta_a),
                      ("b_old", b_old), ("delta_b", delta_b)):
        missing = [k for k in on if k not in df_.columns]
        if missing:
            raise ValueError(f"{name} is missing join columns {missing}")
    parts = [
        view,
        delta_a.join(b_old, on),
        a_old.join(delta_b, on),
        delta_a.join(delta_b, on),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
