"""Round-13 operator tests: contract enforcement and new classes.

The kendall_tau_b guard mirrors the ntile_bounded_domain /
removal_effect_attribution precedent: a bounded-domain contract that
was previously docstring-only must FAIL IN-PLAN when violated, before
the quadratic subtree materializes.
"""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F  # noqa: F401


def test_kendall_tau_b_enforces_max_cells(spark):
    # a continuous column (every (x, y) pair distinct) must raise past
    # max_cells instead of silently running a |cells|^2 pair join
    from redpanda_ais_demo_spark.operators.stats import kendall_tau_b

    df = spark.range(500).select(
        F.col("id").alias("x"), (F.col("id") * 7919).alias("y")
    )
    with pytest.raises(Exception, match="max_cells"):
        kendall_tau_b(df, "x", "y", max_cells=100).first()
    # the same frame passes with the cap raised, and the guard does not
    # perturb the statistic: strictly increasing -> tau_b = 1
    r = kendall_tau_b(df, "x", "y", max_cells=1000).first()
    assert r.n == 500
    assert abs(r.tau_b - 1.0) < 1e-6
    # hand-check the default still passes the declared query's shape
    grid = spark.createDataFrame(
        [(h, b) for h in range(24) for b in range(20)], "x long, y long"
    )
    assert kendall_tau_b(grid, "x", "y").first().n == 480


def test_mann_kendall_enforces_max_buckets(spark):
    from redpanda_ais_demo_spark.operators.stats import mann_kendall_dense

    df = spark.range(300).select(
        F.col("id").alias("i"), (F.col("id") * 3).alias("v")
    )
    with pytest.raises(Exception, match="max_buckets"):
        mann_kendall_dense(df, "i", "v", max_buckets=100).first()
    # guard does not perturb the statistic: strictly increasing series
    r = mann_kendall_dense(df, "i", "v", max_buckets=500).first()
    assert r.n == 300
    assert r.s_stat == 300 * 299 // 2
