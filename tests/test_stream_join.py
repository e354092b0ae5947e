"""Stream-stream interval join: batch parity for the inner variant and
watermark-gated NULL emission for the left-outer variant."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from redpanda_ais_demo_spark.streaming.join import interval_join_streams

FIX_SCHEMA = "zone string, fix_ts timestamp, ship long"
OBS_SCHEMA = "zone string, obs_ts timestamp, temp_c double"


def _write_batch(spark, path, schema, rows, name):
    # append files flat into the source dir — the file-stream source does
    # not discover nested batch subdirectories
    del name
    ts_col = schema.split(", ")[1].split(" ")[0]  # second field is the timestamp
    str_schema = schema.replace(f"{ts_col} timestamp", f"{ts_col} string")
    df = spark.createDataFrame(rows, str_schema).withColumn(
        ts_col, F.to_timestamp(ts_col)
    )
    df.coalesce(1).write.mode("append").parquet(path)


def _fixes(spark):
    return [
        ("z1", "2024-01-01 10:00:00", 1),
        ("z1", "2024-01-01 10:20:00", 2),
        ("z2", "2024-01-01 10:05:00", 3),
        ("z3", "2024-01-01 10:00:00", 4),  # no obs in z3 -> outer NULL row
    ]


def _obs(spark):
    return [
        ("z1", "2024-01-01 09:55:00", 11.0),  # 5 min before fix 1 -> matches
        ("z1", "2024-01-01 10:18:00", 12.0),  # matches fix 2 (and not fix 1: +18m)
        ("z2", "2024-01-01 10:30:00", 13.0),  # 25 min after fix 3 -> outside +10m band
    ]


def test_inner_interval_join_matches_batch(spark, tmp_path):
    src_l = str(tmp_path / "fixes")
    src_r = str(tmp_path / "obs")
    _write_batch(spark, src_l, FIX_SCHEMA, _fixes(spark), "b0")
    _write_batch(spark, src_r, OBS_SCHEMA, _obs(spark), "b0")

    def join(l, r):
        return interval_join_streams(
            l, r, "zone", "fix_ts", "obs_ts",
            before_s=600, after_s=600, watermark_s=600,
        )

    batch = join(
        spark.read.parquet(src_l),
        spark.read.parquet(src_r),
    )
    expect = {(r.zone, r.ship, r.r_temp_c) for r in batch.collect()}
    # sanity on the crafted fixture
    assert expect == {("z1", 1, 11.0), ("z1", 2, 12.0)}

    q = (
        join(
            spark.readStream.schema(FIX_SCHEMA).parquet(src_l),
            spark.readStream.schema(OBS_SCHEMA).parquet(src_r),
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_inner")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.zone, r.ship, r.r_temp_c)
            for r in spark.sql("select * from ssj_inner").collect()
        }
    finally:
        q.stop()
    assert got == expect


def test_left_outer_emits_nulls_after_watermark(spark, tmp_path):
    src_l = str(tmp_path / "fixes")
    src_r = str(tmp_path / "obs")
    _write_batch(spark, src_l, FIX_SCHEMA, _fixes(spark), "b0")
    _write_batch(spark, src_r, OBS_SCHEMA, _obs(spark), "b0")

    q = (
        interval_join_streams(
            spark.readStream.schema(FIX_SCHEMA).parquet(src_l),
            spark.readStream.schema(OBS_SCHEMA).parquet(src_r),
            "zone", "fix_ts", "obs_ts",
            before_s=600, after_s=600, watermark_s=600, how="leftOuter",
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_outer")
        .start()
    )
    try:
        q.processAllAvailable()
        first = {(r.zone, r.ship) for r in spark.sql("select * from ssj_outer").collect()}
        # matches emit; the unmatched rows CANNOT emit yet — the watermark
        # hasn't proven absence (no later data has arrived).
        assert ("z1", 1) in first and ("z1", 2) in first

        # a far-future batch on BOTH sides advances both watermarks past
        # every first-batch band -> unmatched left rows flush with NULLs
        _write_batch(
            spark, src_l, FIX_SCHEMA, [("z9", "2024-01-01 12:00:00", 9)], "b1"
        )
        _write_batch(
            spark, src_r, OBS_SCHEMA, [("z9", "2024-01-01 12:00:00", 0.0)], "b1"
        )
        q.processAllAvailable()
        # one more cycle so the new watermark is applied to state eviction
        _write_batch(
            spark, src_l, FIX_SCHEMA, [("z9", "2024-01-01 13:00:00", 10)], "b2"
        )
        _write_batch(
            spark, src_r, OBS_SCHEMA, [("z9", "2024-01-01 13:00:00", 0.0)], "b2"
        )
        deadline = time.time() + 60
        nulls = set()
        while time.time() < deadline:
            q.processAllAvailable()
            rows = spark.sql("select * from ssj_outer where r_temp_c is null").collect()
            nulls = {(r.zone, r.ship) for r in rows}
            if {("z2", 3), ("z3", 4)} <= nulls:
                break
            time.sleep(0.5)
        assert {("z2", 3), ("z3", 4)} <= nulls
    finally:
        q.stop()


def test_invalid_args_refused(spark):
    import pytest

    df = spark.createDataFrame([], FIX_SCHEMA)
    with pytest.raises(ValueError, match="how"):
        interval_join_streams(df, df, "zone", "fix_ts", "fix_ts", 1, 1, 1, how="fullOuter")
    with pytest.raises(ValueError, match="before_s"):
        interval_join_streams(df, df, "zone", "fix_ts", "fix_ts", -1, 1, 1)


def test_streaming_close_encounters_self_join(spark, tmp_path):
    """The spatial close-pairs analytic as a LIVE query: a position
    stream interval-joined with itself on grid cell, refined by exact
    haversine — streaming parity with the batch operator's semantics on
    the same fixture."""
    from redpanda_ais_demo_spark.functions.geo import haversine_km
    from redpanda_ais_demo_spark.operators.spatial import close_pairs

    src = str(tmp_path / "fixes")
    schema = "zone string, fix_ts timestamp, ship long"
    rows = [
        # same 1-degree cell, 15 km apart, 5 min apart -> pair (1, 2)
        ("c1", "2024-01-01 10:00:00", 1),
        ("c1", "2024-01-01 10:05:00", 2),
        # same cell but 2 h apart -> excluded by time
        ("c1", "2024-01-01 12:30:00", 3),
        # different far-away cell -> no partner
        ("c9", "2024-01-01 10:00:00", 4),
    ]
    cell_lat = {"c1": 10.0, "c9": -40.0}
    cell_lon = {"c1": 20.0, "c9": 100.0}
    _write_batch(spark, src, schema, rows, "b0")

    def with_pos(df):
        lat = F.coalesce(
            *[F.when(F.col("zone") == z, F.lit(v)) for z, v in cell_lat.items()]
        ) + F.col("ship") * 0.1
        lon = F.coalesce(
            *[F.when(F.col("zone") == z, F.lit(v)) for z, v in cell_lon.items()]
        )
        return df.withColumn("lat", lat).withColumn("lon", lon).withColumn(
            "cell", F.concat(F.floor(F.col("lat")), F.lit(":"), F.floor(F.col("lon")))
        )

    stream = with_pos(spark.readStream.schema(schema).parquet(src))
    left = stream.select("cell", "fix_ts", "ship", "lat", "lon")
    right = stream.select(
        "cell",
        F.col("fix_ts").alias("obs_ts"),
        F.col("ship").alias("ship_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
    )
    joined = (
        interval_join_streams(
            left, right, "cell", "fix_ts", "obs_ts",
            before_s=3600, after_s=3600, watermark_s=3600,
        )
        .filter(F.col("ship") < F.col("r_ship_b"))
        .filter(
            haversine_km(
                F.col("lat"), F.col("lon"), F.col("r_lat_b"), F.col("r_lon_b")
            )
            <= 50.0
        )
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("enc_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.ship, r.r_ship_b)
            for r in spark.sql("select * from enc_stream").collect()
        }
    finally:
        q.stop()
    assert got == {(1, 2)}

    # batch-operator parity on the identical fixture
    batch = with_pos(
        spark.read.parquet(src)
    ).select(
        "ship",
        F.col("zone"),
        F.unix_micros("fix_ts").alias("us"),
        "lat",
        "lon",
    )
    pairs = close_pairs(
        batch, "ship", "ship", "us", "lat", "lon",
        dist_km=50.0, window_s=3600, max_abs_lat=60.0,
    )
    assert {(r.id_a, r.id_b) for r in pairs.collect()} == {(1, 2)}
