"""Streaming KLL quantile tracker: e2e over a file stream, accuracy
vs exact quantiles, crash-replay determinism, state retention, and the
two-sketch merge unit."""

from __future__ import annotations

import os

from redpanda_ais_demo_spark.streaming import quantiles
from redpanda_ais_demo_spark.streaming.trending import (
    _latest_state_below,
    _list_state_ids,
)

SCHEMA = "value double"


def _vals(a, b):
    return [(float(i),) for i in range(a, b)]


def test_quantile_tracker_e2e_accuracy_and_replay(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    snaps = str(tmp_path / "snaps")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(_vals(0, 4000), SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = quantiles.start_quantile_tracker(stream, "value", state, snaps, ckpt)
    q.processAllAvailable()
    spark.createDataFrame(_vals(4000, 10000), SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q.processAllAvailable()
    q.stop()

    snaps_df = spark.read.parquet(
        *[
            os.path.join(snaps, d)
            for d in os.listdir(snaps)
            if d.startswith("__batch_id=")
        ]
    )
    got = {r.batch_id: (r.q50, r.q95, r.q99) for r in snaps_df.collect()}
    last = got[max(got)]
    # cumulative stream = 0..9999 uniform; KLL rank error ~1.7% at k=200
    for est, true in zip(last, (5000, 9500, 9900)):
        assert abs(est - true) / 10000 < 0.02, (est, true)
    # state bounded by retention
    assert len(_list_state_ids(spark, state)) <= 2

    # crash-after-write replay: same predecessor state + same rows.
    # KLL compaction is randomized, so a replay is epsilon-identical
    # (within rank error), NOT byte-identical like the HLL tracker —
    # assert the documented tolerance, not equality
    last_id = max(got)
    prior = _latest_state_below(spark, state, last_id)
    import pyspark.sql.functions as F

    batch2 = spark.createDataFrame(_vals(4000, 10000), SCHEMA)
    replay = quantiles.merge_kll(prior, quantiles.batch_kll(batch2, "value"))
    vals = replay.select(
        F.kll_sketch_get_quantile_double(F.col("kll"), F.lit(0.5)).alias("q50"),
        F.kll_sketch_get_quantile_double(F.col("kll"), F.lit(0.95)).alias("q95"),
        F.kll_sketch_get_quantile_double(F.col("kll"), F.lit(0.99)).alias("q99"),
    ).collect()[0]
    for rep, live in zip((vals.q50, vals.q95, vals.q99), last):
        assert abs(rep - live) / 10000 < 0.04


def test_quantile_tracker_validates_args(spark, tmp_path):
    import pytest

    src = tmp_path / "x"
    src.mkdir()
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    with pytest.raises(ValueError, match="retain"):
        quantiles.start_quantile_tracker(stream, "value", "s", "n", "c", retain=0)
    with pytest.raises(ValueError, match="quantiles"):
        quantiles.start_quantile_tracker(
            stream, "value", "s", "n", "c", quantiles=(1.5,)
        )


def test_quantile_col_names_collision_safe(spark, tmp_path):
    import pytest

    from redpanda_ais_demo_spark.streaming.quantiles import _quantile_col_name

    # integer percents keep their historical names; fractional percents
    # get an underscore suffix instead of rounding into a sibling
    assert _quantile_col_name(0.5) == "q50"
    assert _quantile_col_name(0.95) == "q95"
    assert _quantile_col_name(0.995) == "q99_5"
    assert _quantile_col_name(1.0) == "q100"
    assert _quantile_col_name(0.001) == "q0_1"
    names = [_quantile_col_name(q) for q in (0.995, 1.0, 0.001, 0.004)]
    assert len(set(names)) == len(names)
    # a genuine duplicate in the requested tuple still fails fast
    src = tmp_path / "y"
    src.mkdir()
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    with pytest.raises(ValueError, match="duplicate quantile"):
        quantiles.start_quantile_tracker(
            stream, "value", "s", "n", "c", quantiles=(0.5, 0.5)
        )
