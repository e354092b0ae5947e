"""Similarity search over embedding columns (array<float>).

Two paths, per the scale doctrine:
- ``brute_force_topk`` — exact all-pairs cosine. Correctness baseline and
  the right plan when one side is small enough to broadcast (the classic
  "query batch vs corpus" shape): the corpus streams through a map-side
  nested loop, no shuffle of the big side.
- ``lsh_topk`` — random-hyperplane LSH bucketing: each vector lands in
  L hash-table buckets; only same-bucket pairs are scored. Candidate
  generation is linear in corpus size — the 100 TB path (IVF-style
  coarse quantization would slot in the same join shape).

Dot products run JVM-side via higher-order functions (functions/vector.py)
— sequential, bit-deterministic, oracle-comparable.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vector as V


def _scored_pairs(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cosine for each (a, b) pair sharing no key: caller supplies the join."""
    return a.join(b, F.col("a.vid") != F.col("b.vid"))


def brute_force_topk(embeddings: DataFrame, k: int = 5, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors per vector.

    Output: (vec_id, neighbor_id, cos_sim rounded to 6dp, rank). Rounding +
    id tiebreak make ranks deterministic and oracle-stable.
    """
    base = embeddings.select(F.col(id_col).alias("vid"), V.to_double(F.col(vec_col)).alias("v"))
    a = base.select(F.col("vid").alias("vec_id"), F.col("v").alias("va"))
    b = base.select(F.col("vid").alias("neighbor_id"), F.col("v").alias("vb"))
    pairs = a.join(F.broadcast(b), F.col("vec_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "vec_id",
        "neighbor_id",
        F.round(V.cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes for sign-LSH."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def _bucket_col(vec_col, planes: np.ndarray):
    """Sign-bit bucket id of a vector against a set of hyperplanes.

    Pure column expression: dot(vec, plane) > 0 -> bit. No UDF; the plane
    constants fold into the plan (broadcast-as-literal, fine for <=32
    planes x 1k dims).
    """
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(V.dot(vec_col, arr) > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket + F.shiftleft(bit, j)
    return bucket


def lsh_topk(
    embeddings: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k cosine neighbors via multi-table hyperplane LSH.

    Each vector hashes into ``n_tables`` buckets (one per independent plane
    set); candidates = same (table, bucket); exact cosine re-scores
    candidates. Same output schema as ``brute_force_topk``.
    """
    first = embeddings.select(F.col(vec_col).alias("v")).first()
    dim = len(first["v"])
    base = embeddings.select(F.col(id_col).alias("vid"), V.to_double(F.col(vec_col)).alias("v"))
    tables = []
    for t in range(n_tables):
        planes = hyperplanes(dim, n_planes, seed=seed + 1000 * t)
        tables.append(
            base.select(
                "vid",
                "v",
                F.lit(t).alias("table"),
                _bucket_col(F.col("v"), planes).alias("bucket"),
            )
        )
    bucketed = tables[0]
    for t in tables[1:]:
        bucketed = bucketed.unionByName(t)
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vid") != F.col("b.vid")),
        )
        .select(
            F.col("a.vid").alias("vec_id"),
            F.col("b.vid").alias("neighbor_id"),
            F.col("a.v").alias("va"),
            F.col("b.v").alias("vb"),
        )
        .dropDuplicates(["vec_id", "neighbor_id"])
    )
    scored = cands.select(
        "vec_id",
        "neighbor_id",
        F.round(V.cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
