"""Distributed total-order analytics (operators/ordered.py): exact
parity with the single-partition global window it replaces, plus plan
shape — the data-sized sort must be RangePartitioned, never a
SinglePartition exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from redpanda_ais_demo_spark.operators.ordered import ntile_distributed, rank_cumsum


def _frame(spark, n=503):
    # duplicated keys + deterministic values; shuffled insert order
    rows = [((i * 7919) % 101, (i * 31) % 13 + 1, i) for i in range(n)]
    return spark.createDataFrame(rows, "k long, v long, id long").repartition(16)


def _order():
    return [F.col("k").desc(), F.col("id").asc()]


def test_rank_cumsum_matches_global_window(spark):
    df = _frame(spark)
    got = rank_cumsum(
        df, _order(), rank_col="rank", cumsums={"cum_v": F.col("v")}, num_partitions=8
    )
    w = Window.orderBy(*_order())
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    want = df.withColumn("rank", F.row_number().over(w).cast("long")).withColumn(
        "cum_v", F.sum("v").over(wc)
    )
    key = lambda r: (r.id,)
    g = sorted(got.collect(), key=key)
    e = sorted(want.collect(), key=key)
    assert [(r.rank, r.cum_v) for r in g] == [(r.rank, r.cum_v) for r in e]
    # exclusive prefix = inclusive - own value
    excl = {r.id: r.cum_v - r.v for r in g}
    w_ex = w.rowsBetween(Window.unboundedPreceding, -1)
    want_ex = {
        r.id: r.ex
        for r in df.withColumn(
            "ex", F.coalesce(F.sum("v").over(w_ex), F.lit(0))
        ).collect()
    }
    assert excl == want_ex


@pytest.mark.parametrize("n,k", [(503, 10), (40, 7), (5, 8), (12, 12), (1, 3)])
def test_ntile_distributed_matches_spark_ntile(spark, n, k):
    df = _frame(spark, n)
    got = {
        r.id: r.tile
        for r in ntile_distributed(df, _order(), k, num_partitions=6).collect()
    }
    want = {
        r.id: r.tile
        for r in df.withColumn("tile", F.ntile(k).over(Window.orderBy(*_order()))).collect()
    }
    assert got == want


def test_rank_cumsum_plan_has_no_data_sized_single_partition_window(spark):
    df = _frame(spark)
    got = rank_cumsum(df, _order(), rank_col="rank", cumsums={"cum_v": F.col("v")})
    plan = got._jdf.queryExecution().executedPlan().toString()
    # the data-sized sort is range-partitioned (parallel)
    assert "rangepartitioning" in plan.lower()
    # the only single-partition exchange feeds the per-partition offset
    # aggregate (<= num_partitions rows), never the data: every
    # SinglePartition occurrence must sit on the aggregated branch
    import re

    assert plan.lower().count("singlepartition") <= 1


def test_rank_cumsum_validates_args(spark):
    df = _frame(spark, 10)
    with pytest.raises(ValueError, match="order_exprs"):
        rank_cumsum(df, [], rank_col="rank")
    with pytest.raises(ValueError, match="nothing to compute"):
        rank_cumsum(df, _order(), rank_col=None, cumsums=None)
    with pytest.raises(ValueError, match="num_partitions"):
        rank_cumsum(df, _order(), num_partitions=0)
    with pytest.raises(ValueError, match="n_tiles"):
        ntile_distributed(df, _order(), 0)
