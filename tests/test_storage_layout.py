"""Storage-layout scale techniques the 100 TB design depends on, proven
at the plan level: partitioned writes → partition pruning in the scan,
and bucketed tables → shuffle-free co-located joins.

At real scale these are the difference between scanning 100 TB and
scanning one partition, and between re-shuffling a fact table per join
and joining in place; neither shows up in the fixture queries (the
driver tables are unpartitioned parquet), so they're pinned here.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from redpanda_ais_demo_spark.sources import load_table

from .conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_partitioned_write_prunes_at_scan(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("events_by_type"))
    events = load_table(spark, SF_SMOKE, "events")
    events.write.partitionBy("event_type").mode("overwrite").parquet(out)

    filtered = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = _plan(filtered)
    # the filter must become a PartitionFilters entry (directory pruning),
    # NOT a post-scan Filter over all partitions
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters", 1)[1][:200]
    # and the pruned read returns exactly the partition's rows
    expected = events.filter(F.col("event_type") == "click").count()
    assert filtered.count() == expected > 0


def test_bucketed_join_needs_no_exchange(spark, tmp_path_factory):
    warehouse_note = spark.conf.get("spark.sql.warehouse.dir", "")
    assert warehouse_note is not None  # in-memory catalog + local warehouse dir
    orders = load_table(spark, SF_SMOKE, "orders")
    lineitem = load_table(spark, SF_SMOKE, "lineitem")
    n_buckets = 8
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    try:
        (orders.write.bucketBy(n_buckets, "o_orderkey").sortBy("o_orderkey")
         .mode("overwrite").saveAsTable("orders_b"))
        (lineitem.write.bucketBy(n_buckets, "l_orderkey").sortBy("l_orderkey")
         .mode("overwrite").saveAsTable("lineitem_b"))
        joined = (
            spark.table("lineitem_b")
            .join(
                spark.table("orders_b"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        # disable broadcast so the join must pick a shuffle strategy — the
        # bucketed layout must satisfy it with ZERO exchanges before the join
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = _plan(joined)
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        assert "SortMergeJoin" in plan, "expected sort-merge over bucketed tables"
        # exactly ONE exchange — the post-join aggregation's. An unbucketed
        # join would add one per join input (3 total); bucketing must
        # eliminate both join-side shuffles.
        n_exchanges = plan.count("+- Exchange")
        assert n_exchanges == 1, f"expected only the aggregation exchange, got {n_exchanges}:\n{plan}"
        # result parity vs the plain (shuffling) join
        expected = {
            (r.o_orderstatus, r.n)
            for r in lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        got = {(r.o_orderstatus, r.n) for r in joined.collect()}
        assert got == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_dynamic_partition_overwrite_backfills_only_touched_days(spark, tmp_path):
    """Re-running one day's job must replace exactly that day's
    partition: other partitions' files (and data) survive byte-for-byte;
    static mode would have wiped them. Readers prune to the partition
    directory."""
    import os

    from pyspark.sql import functions as F

    from redpanda_ais_demo_spark.operators.layout import write_partitioned

    path = str(tmp_path / "by_day")
    full = spark.createDataFrame(
        [(d, i, float(i)) for d in ("2024-01-01", "2024-01-02", "2024-01-03") for i in range(10)],
        "day string, k long, v double",
    )
    write_partitioned(full, path, ["day"])
    files_before = {
        f for f in os.listdir(os.path.join(path, "day=2024-01-01")) if f.endswith(".parquet")
    }
    # backfill day 2 only, with corrected values
    fix = spark.createDataFrame(
        [("2024-01-02", i, float(i) + 100.0) for i in range(10)], "day string, k long, v double"
    )
    write_partitioned(fix, path, ["day"])
    out = spark.read.parquet(path)
    assert out.count() == 30  # days 1 and 3 survived
    assert out.filter(F.col("day") == "2024-01-02").agg(F.min("v")).collect()[0][0] == 100.0
    assert out.filter(F.col("day") == "2024-01-01").agg(F.max("v")).collect()[0][0] == 9.0
    files_after = {
        f for f in os.listdir(os.path.join(path, "day=2024-01-01")) if f.endswith(".parquet")
    }
    assert files_before == files_after  # untouched partition: same files
    # partition pruning reaches the scan
    plan = out.filter(F.col("day") == "2024-01-03")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_schema_evolution_across_partitions(spark, tmp_path):
    """A column added by a later day's job must be readable across the
    whole table with mergeSchema (old partitions surface NULLs), and the
    old reader path (no mergeSchema) must keep working on the original
    columns — the append-only schema-evolution contract of a parquet
    lake."""
    from pyspark.sql import functions as F

    from redpanda_ais_demo_spark.operators.layout import write_partitioned

    path = str(tmp_path / "evolving")
    v1 = spark.createDataFrame(
        [("2024-01-01", i, float(i)) for i in range(5)], "day string, k long, v double"
    )
    write_partitioned(v1, path, ["day"])
    v2 = v1.withColumn("quality", F.lit(0.5)).withColumn("day", F.lit("2024-01-02"))
    write_partitioned(v2, path, ["day"])
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"day", "k", "v", "quality"}
    old = merged.filter(F.col("day") == "2024-01-01")
    assert old.filter(F.col("quality").isNull()).count() == 5  # old rows: NULL
    new = merged.filter(F.col("day") == "2024-01-02")
    assert new.filter(F.col("quality") == 0.5).count() == 5


def test_expire_partitions_drops_only_old_and_refuses_bad_root(spark, tmp_path):
    """Expiry removes exactly the below-cutoff partition directories,
    surviving partitions' files are byte-identical, and a root without
    partition dirs is refused (data-loss rail)."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from redpanda_ais_demo_spark.operators.layout import expire_partitions, write_partitioned

    df = spark.createDataFrame(
        [(i, f"2024-01-{d:02d}") for d in (1, 2, 3, 4) for i in range(d * 10, d * 10 + 5)],
        "id long, d string",
    )
    root = str(tmp_path / "t")
    write_partitioned(df, root, ["d"])

    def files_of(day):
        p = os.path.join(root, f"d={day}")
        return {
            f: os.path.getsize(os.path.join(p, f))
            for f in os.listdir(p)
            if f.endswith(".parquet")
        }

    keep_before = files_of("2024-01-03")
    dropped = expire_partitions(spark, root, "d", keep_from="2024-01-03")
    assert dropped == ["2024-01-01", "2024-01-02"]
    assert not os.path.exists(os.path.join(root, "d=2024-01-01"))
    assert files_of("2024-01-03") == keep_before  # survivors untouched
    left = spark.read.parquet(root)
    # partition discovery type-infers d as a date; compare formatted
    got_days = sorted(
        r.d for r in left.select(F.date_format("d", "yyyy-MM-dd").alias("d")).distinct().collect()
    )
    assert got_days == ["2024-01-03", "2024-01-04"]
    assert left.count() == 10

    # idempotent: nothing else to drop
    assert expire_partitions(spark, root, "d", keep_from="2024-01-03") == []

    with pytest.raises(ValueError, match="refusing"):
        expire_partitions(spark, str(tmp_path), "d", keep_from="x")


def _xy2d_ref(n, x, y):
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_reference_exhaustive_and_is_locality_preserving(spark):
    """The unrolled SQL transform must equal the classic xy2d bit loop on
    the FULL 4-bit grid, and exhibit the property Z-order lacks:
    consecutive addresses are always unit grid steps."""
    from redpanda_ais_demo_spark.operators.layout import hilbert_from_buckets

    bits, n = 4, 16
    cells = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "bx int, by int"
    )
    got = {
        (r["bx"], r["by"]): r["__h"]
        for r in hilbert_from_buckets(cells, "bx", "by", bits=bits).collect()
    }
    assert all(got[(x, y)] == _xy2d_ref(n, x, y) for x in range(n) for y in range(n))
    # bijective onto [0, n^2) and unit-step adjacency
    pos = {d: xy for xy, d in got.items()}
    assert sorted(pos) == list(range(n * n))
    assert all(
        abs(pos[i][0] - pos[i + 1][0]) + abs(pos[i][1] - pos[i + 1][1]) == 1
        for i in range(n * n - 1)
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        hilbert_from_buckets(cells, "bx", "by", bits=0)


def test_hilbert_layout_prunes_no_worse_than_zorder(spark, tmp_path):
    """The locality claim, measured: on uniform 2-D data written 64-ways
    by each key, the number of files whose min/max box intersects a 2-D
    range predicate (= files a stats-pruning reader must open) is no
    larger under the Hilbert layout than under Z-order, and both prune
    hard vs reading everything."""
    import glob

    import pyarrow.parquet as pq

    from redpanda_ais_demo_spark.operators.layout import (
        write_hilbert_ordered,
        write_zordered,
    )

    n = 40_000
    df = spark.createDataFrame(
        [((i * 7919) % 100_000, (i * 104_729) % 100_000) for i in range(n)],
        "x long, y long",
    )
    zdir, hdir = str(tmp_path / "z"), str(tmp_path / "h")
    write_zordered(df, zdir, ["x", "y"], bits=8, n_files=64)
    write_hilbert_ordered(df, hdir, "x", "y", bits=8, n_files=64)

    def file_boxes(d):
        boxes = []
        for f in glob.glob(d + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            lo = [None, None]
            hi = [None, None]
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    name = col.path_in_schema
                    idx = 0 if name == "x" else 1 if name == "y" else None
                    if idx is None or col.statistics is None:
                        continue
                    s = col.statistics
                    lo[idx] = s.min if lo[idx] is None else min(lo[idx], s.min)
                    hi[idx] = s.max if hi[idx] is None else max(hi[idx], s.max)
            if lo[0] is not None and lo[1] is not None:
                boxes.append((lo[0], hi[0], lo[1], hi[1]))
        return boxes

    zb, hb = file_boxes(zdir), file_boxes(hdir)
    assert len(zb) == len(hb) == 64

    def candidates(boxes, q):
        qx0, qx1, qy0, qy1 = q
        return sum(
            1 for (x0, x1, y0, y1) in boxes
            if not (x1 < qx0 or x0 > qx1 or y1 < qy0 or y0 > qy1)
        )

    # nine 10%x10% boxes spread over the domain
    queries = [
        (cx, cx + 10_000, cy, cy + 10_000)
        for cx in (5_000, 45_000, 85_000)
        for cy in (5_000, 45_000, 85_000)
    ]
    z_total = sum(candidates(zb, q) for q in queries)
    h_total = sum(candidates(hb, q) for q in queries)
    # Hilbert's compact per-file regions: never worse than Z, and both
    # layouts actually prune (far fewer than 9*64 file opens)
    assert h_total <= z_total, (h_total, z_total)
    assert h_total < 9 * 64 * 0.5
