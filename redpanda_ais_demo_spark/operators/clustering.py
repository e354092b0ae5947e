"""Exact-arithmetic k-means (Lloyd) over embedding columns.

The ANN family (``operators/similarity.py``, ``operators/ann_index.py``)
already trains float k-means centroids for IVF coarse quantization —
rows-only determinism, recall-tested. This module is the complementary
CLUSTERING operator: hash-free deterministic Lloyd iterations whose
every number is exact integer arithmetic, so the full assignment table
is bit-identical cross-engine and the registered query carries a full
DuckDB value-hash oracle — the same determinism discipline as the
integer PageRank family (``operators/graph.py``).

How exactness is achieved:
- Coordinates quantize once to integer micro-units
  (``round(x * 1e6)`` as BIGINT — float32→double widening is exact and
  both engines round half-away-from-zero on identical doubles).
- Squared-L2 argmin needs only ``|c|² − 2·v·c`` — every term an
  integer dot product bounded by dim · (6e5)² ≈ 2.3e13 < 2^53, so even
  an engine that accumulates in DOUBLE (DuckDB's list_dot_product)
  is exact, and summation order cannot matter.
- Ties break to the lowest cluster id (struct-ordered min).
- Centroid update is TRUNCATING division of exact coordinate sums —
  DuckDB's integer ``//`` truncates toward zero (−7 // 2 = −3, unlike
  Python's flooring ``//``), and Spark's ``div`` does the same, so the
  driver-side mean uses an explicit sign-split truncation to match.
- Empty clusters keep their previous centroid.

Scale design (100 TB): the MLlib shape. Centroids are a k·dim-integer
driver table (contract-capped k ≤ 256) broadcast into the assignment
expression as LITERALS, so assignment is pure map-side whole-stage
codegen — no join, no shuffle. The update is one posexplode +
partial-aggregable groupBy(cluster, dim) whose shuffle carries k·dim
rows. One scan + one tiny shuffle per round; the per-round driver
collect is k·dim integers, invariant in the data size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT = 1_000_000


def _score_sql(cents: list[tuple[int, list[int], int]]) -> str:
    """argmin struct over centroid literals, as ONE generated SQL
    expression (op-by-op Column building would pay thousands of py4j
    round-trips per round — the wide-expression gotcha)."""
    entries = []
    for j, c, cn in cents:
        arr = ",".join(f"{v}L" for v in c)
        dot = (
            f"aggregate(zip_with(__q, array({arr}), (a, b) -> a * b), "
            f"0L, (acc, x) -> acc + x)"
        )
        entries.append(f"struct({cn}L - 2 * {dot} AS score, {j} AS cluster)")
    return f"array_min(array({','.join(entries)}))"


def kmeans_lloyd(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    rounds: int = 3,
    quant: int = QUANT,
) -> DataFrame:
    """Deterministic k-means: seed centroids from the ``k`` smallest
    ids' vectors (no RNG — reproducible on any engine/partitioning),
    run ``rounds`` Lloyd iterations (assign → recompute means), and
    return the final assignment under the final centroids:
    ``(id, cluster, dist_sq)`` with ``dist_sq`` the exact integer
    squared L2 distance in quantized units.

    See the module docstring for the exactness and scale contracts.
    ``k`` is capped at 256 — centroids live in a driver-side table of
    k·dim integers by design (the literal-broadcast assignment path);
    beyond that use the IVF trainer, which never collects vectors.
    """
    if not 1 <= k <= 256:
        raise ValueError(f"k must be in [1, 256], got {k}")
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    q = df.select(
        F.col(id_col).alias("__id"),
        F.transform(
            F.col(vec_col), lambda x: F.round(x.cast("double") * quant).cast("long")
        ).alias("__q"),
    ).localCheckpoint(eager=False)

    # seed: k smallest ids — a bounded k-row driver table by contract
    seed_rows = q.orderBy("__id").limit(k).collect()
    if not seed_rows:
        raise ValueError("kmeans_lloyd needs a non-empty input")
    cents = [
        (j, list(r["__q"]), sum(v * v for v in r["__q"]))
        for j, r in enumerate(seed_rows)
    ]
    dim = len(cents[0][1])

    for _ in range(rounds):
        assign = q.select(
            "__id", "__q", F.expr(_score_sql(cents)).alias("__b")
        ).select("__id", "__q", F.col("__b.cluster").alias("__cl"))
        sums = (
            assign.select("__cl", F.posexplode("__q").alias("__d", "__x"))
            .groupBy("__cl", "__d")
            .agg(F.sum("__x").alias("__s"), F.count(F.lit(1)).alias("__n"))
            .collect()
        )  # k·dim rows — invariant in data size
        by_cl: dict[int, list[tuple[int, int, int]]] = {}
        for r in sums:
            by_cl.setdefault(r["__cl"], []).append((r["__d"], r["__s"], r["__n"]))
        new_cents = []
        for j, old_c, old_cn in cents:
            if j in by_cl:
                # truncating division — DuckDB's integer // and Spark's
                # div truncate toward zero; Python's // floors
                coords = [
                    (abs(s) // n) * (1 if s >= 0 else -1)
                    for _, s, n in sorted(by_cl[j])
                ]
                new_cents.append((j, coords, sum(v * v for v in coords)))
            else:  # empty cluster keeps its previous centroid
                new_cents.append((j, old_c, old_cn))
        cents = new_cents
        assert all(len(c) == dim for _, c, _ in cents)

    vn = "aggregate(zip_with(__q, __q, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"
    return q.select(
        "__id",
        F.expr(_score_sql(cents)).alias("__b"),
        F.expr(vn).alias("__vn"),
    ).select(
        F.col("__id").alias(id_col),
        F.col("__b.cluster").cast("long").alias("cluster"),
        (F.col("__vn") + F.col("__b.score")).cast("long").alias("dist_sq"),
    )
