"""Vector math over ``array<float>`` embedding columns.

Implemented with higher-order functions (zip_with / aggregate) so the dot
products run inside the JVM with codegen — no Python, no UDF — and sum
elements **in list order**, which makes results bit-deterministic and
reproducible against an oracle that does the same (DuckDB list_dot_product).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double(vec: Column) -> Column:
    """Cast array<float> -> array<double> so both engines do double math."""
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product of two double arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def max_abs(a: Column) -> Column:
    """Largest absolute component (int8 quantization scale). Pure
    comparisons — exact on both engines, no FP-order sensitivity."""
    return F.array_max(F.transform(a, F.abs))


def sign_projection_matrix(in_dim: int, out_dim: int) -> list[list[int]]:
    """Deterministic ±1 (Achlioptas sign) random-projection matrix,
    derived from a splitmix64-style integer hash of (row, col) — no RNG
    state, so the same literals embed in both the Spark expression and
    the SQL oracle, on any platform."""

    def bit(r: int, c: int) -> int:
        x = (r * 0x9E3779B97F4A7C15 + c * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 31
        x = (x * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 29
        return 1 if (x & 1) else -1

    return [[bit(r, c) for c in range(in_dim)] for r in range(out_dim)]


def project(vec: Column, matrix: list[list[int]]) -> Column:
    """y = R·x for a literal matrix: one sequential dot per output
    component, all inside codegen. The matrix rides the expression tree
    (a few KB of literals), so nothing broadcasts and nothing shuffles —
    the 100 TB shape for dimension reduction."""
    rows = [F.array(*[F.lit(float(v)) for v in row]) for row in matrix]
    return F.array(*[dot(vec, row) for row in rows])


def int8_quantize(a: Column, scale: Column) -> Column:
    """Symmetric int8 quantization: q_i = round(x_i / scale * 127) as
    longs. One narrow transform per vector — no shuffle; the expression
    order (divide, then scale by 127, then round) is fixed so an oracle
    computing the same chain is bit-identical. Caller guards scale > 0.
    """
    return F.transform(a, lambda x: F.round(x / scale * 127, 0).cast("long"))
