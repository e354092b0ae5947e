"""Skyline (Pareto-frontier) operator — the classic dominance query from
the DB literature (Börzsönyi et al., ICDE 2001): the rows no other row
beats on every dimension at once. The 2-D case (minimize x, maximize y)
admits a sort-based plan; the distributed form below is the standard
local-skyline-then-merge reduction.

Scale design (100 TB): a global sort-window over the raw table would be
a single-partition pass. Instead phase 1 computes a LOCAL skyline per
x-bucket (hash-partitioned windows — any row dominated inside its own
bucket is dominated globally, so pruning is safe), which collapses each
bucket to its frontier (tiny); phase 2 runs the exact global window
over the surviving candidates only. The global pass is therefore over
~|buckets x frontier-per-bucket| rows, not the table.

Determinism: x enters as exact integer units (cents), so the strictly-
cheaper RANGE frame and all comparisons are integer-exact cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    x_units: "F.Column",
    y_col: str,
    id_col: str,
    bucket_width: int = 1000,
) -> DataFrame:
    """Pareto frontier minimizing ``x_units`` (exact integer units) and
    maximizing ``y_col``. Returns every input row on the frontier
    (rows tied on both dimensions all stay — dominance requires one
    strict inequality), as (id, x, y).

    A row survives iff (a) it has the max y among rows with exactly its
    x, and (b) its y strictly exceeds the best y of any strictly
    smaller x. (a) is a per-x window; (b) is a RANGE frame ending at
    1 PRECEDING over integer x. Both phases apply the same predicate —
    phase 1 inside hash-partitioned x-buckets (safe pruning), phase 2
    globally over the candidates.
    """
    base = df.select(
        F.col(id_col).alias("id"),
        x_units.cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    )

    def frontier(data: DataFrame, *partition) -> DataFrame:
        at_x = Window.partitionBy(*partition, "x")
        cheaper = (
            Window.partitionBy(*partition)
            .orderBy("x")
            .rangeBetween(Window.unboundedPreceding, -1)
        )
        return (
            data.withColumn("y_at_x", F.max("y").over(at_x))
            .withColumn("y_cheaper", F.max("y").over(cheaper))
            .filter(
                (F.col("y") == F.col("y_at_x"))
                & (F.col("y_cheaper").isNull() | (F.col("y") > F.col("y_cheaper")))
            )
            .drop("y_at_x", "y_cheaper")
        )

    local = frontier(
        base.withColumn("bucket", F.expr(f"x div {int(bucket_width)}")), "bucket"
    ).drop("bucket")
    return frontier(local)
