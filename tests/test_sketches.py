"""Count-min sketch error bounds and Z-order layout properties."""

from __future__ import annotations

import glob
import os

import pytest

from pyspark.sql import functions as F

from redpanda_ais_demo_spark.functions import text as TXT
from redpanda_ais_demo_spark.operators import layout, sketches
from redpanda_ais_demo_spark.sources import load_table

from .conftest import SF_SMOKE


def test_cms_never_undercounts_and_bounds_overcount(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    toks = docs.select(F.explode(TXT.tokens(F.col("text"))).alias("term"))
    n_total = toks.count()
    depth, width = 4, 1024
    sketch = sketches.cms_build(toks, "term", depth, width)
    exact = toks.groupBy("term").agg(F.count("*").alias("true_n"))
    est = sketches.cms_estimate(sketch, exact.select("term"), "term", depth, width)
    rows = exact.join(est, "term").collect()
    assert rows, "corpus should have tokens"
    assert all(r.est_count >= r.true_n for r in rows), "CMS must never undercount"
    # standard bound: overcount <= 2N/width for the vast majority of items
    bound = 2 * n_total / width
    over = [r.est_count - r.true_n for r in rows]
    assert max(over) <= 4 * bound  # generous: tiny vocab -> heavy collisions
    assert sum(1 for o in over if o <= bound) / len(over) >= 0.9


def test_cms_sketch_is_fixed_size(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    toks = docs.select(F.explode(TXT.tokens(F.col("text"))).alias("term"))
    depth, width = 4, 64
    sketch = sketches.cms_build(toks, "term", depth, width).collect()
    assert len(sketch) <= depth * width
    # total mass per hash row equals the stream length
    n_total = toks.count()
    by_row = {}
    for r in sketch:
        by_row[r.row] = by_row.get(r.row, 0) + r["count"]
    assert all(v == n_total for v in by_row.values())


def test_interleave_matches_python_reference(spark):
    # bit-level reference check of the generated interleave expression
    rows = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (255, 255)], "bx int, by int"
    ).withColumn("z", F.expr(layout.interleave_sql(["bx", "by"], 8)))

    def ref(x, y):
        z = 0
        for r in range(8):
            z |= ((x >> r) & 1) << (2 * r)
            z |= ((y >> r) & 1) << (2 * r + 1)
        return z

    for r in rows.collect():
        assert r.z == ref(r.bx, r.by), (r.bx, r.by)


def test_zorder_improves_locality_over_single_column_sort(spark):
    events = load_table(spark, SF_SMOKE, "events")
    keyed = layout.zorder_keys(
        events.select("event_id", "value", "user_id"),
        ["value", "user_id"],
        bits=8,
    )
    import pandas as pd

    pdf = keyed.toPandas()
    pdf["bx"] = pdf["value"].rank(method="first").sub(1).floordiv(len(pdf) / 256).clip(0, 255)
    pdf["by"] = pdf["user_id"].rank(method="first").sub(1).floordiv(len(pdf) / 256).clip(0, 255)

    def mean_step(df):
        return (df.bx.diff().abs() + df.by.diff().abs()).mean()

    z_step = mean_step(pdf.sort_values("__z"))
    one_col_step = mean_step(pdf.sort_values("value"))
    # z-order keeps BOTH dimensions local; a one-column sort scrambles the other
    assert z_step < one_col_step


def test_write_zordered_range_partitions_files(spark, tmp_path):
    events = load_table(spark, SF_SMOKE, "events").select("event_id", "value", "user_id")
    path = str(tmp_path / "zorder")
    layout.write_zordered(events, path, ["value", "user_id"], bits=8, n_files=4)
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    assert 1 < len(files) <= 4
    # every input row survives the layout rewrite
    assert spark.read.parquet(path).count() == events.count()
    # each file owns a tight value range on the leading dimension:
    # per-file min/max spans must overlap far less than the full range
    import pyarrow.parquet as pq

    spans = []
    for f in files:
        t = pq.read_table(f, columns=["value"])
        col = t.column("value").to_pylist()
        spans.append((min(col), max(col)))
    full = max(mx for _, mx in spans) - min(mn for mn, _ in spans)
    avg_span = sum(mx - mn for mn, mx in spans) / len(spans)
    assert avg_span < full  # files are clustered, not uniform slices of everything


def test_compact_parquet_merges_file_confetti(spark, tmp_path):
    src = str(tmp_path / "confetti")
    events = load_table(spark, SF_SMOKE, "events").select("event_id", "value")
    events.repartition(40).write.parquet(src)  # simulate micro-batch confetti
    assert len(glob.glob(os.path.join(src, "*.parquet"))) == 40
    dst = str(tmp_path / "compacted")
    n = layout.compact_parquet(spark, src, dst, target_mb=128)
    out_files = glob.glob(os.path.join(dst, "*.parquet"))
    assert len(out_files) == n == 1  # tiny input → one right-sized file
    assert spark.read.parquet(dst).count() == events.count()


def _per_file_bbox_area(path):
    """Mean fractional (value × user_id) bounding-box area per file —
    the 2-D analogue of min/max-stat tightness: a z-clustered file owns
    a small region of the plane, a round-robin file spans ~all of it."""
    import pyarrow.parquet as pq

    boxes = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        t = pq.read_table(f, columns=["value", "user_id"])
        v = t.column("value").to_pylist()
        u = t.column("user_id").to_pylist()
        boxes.append((min(v), max(v), min(u), max(u)))
    fv = max(b[1] for b in boxes) - min(b[0] for b in boxes)
    fu = max(b[3] for b in boxes) - min(b[2] for b in boxes)
    fracs = [((b[1] - b[0]) / fv) * ((b[3] - b[2]) / fu) for b in boxes]
    return len(boxes), sum(fracs) / len(fracs)


def test_compact_parquet_preserves_zorder_clustering(spark, tmp_path):
    # Compacting a z-ordered table must not silently discard the layout:
    # zorder_cols mode re-clusters during the rewrite, so per-file
    # min/max stats on the clustered columns stay tight (row-group
    # pruning survives the maintenance job).
    events = load_table(spark, SF_SMOKE, "events").select("event_id", "value", "user_id")
    src = str(tmp_path / "z_confetti")
    # a z-ordered table that then accrued confetti: write z-ordered into
    # many small files (the post-stream state a compactor actually sees)
    layout.write_zordered(events, src, ["value", "user_id"], bits=8, n_files=16)
    dst_z = str(tmp_path / "compact_z")
    layout.compact_parquet(
        spark, src, dst_z, target_mb=0.005, zorder_cols=["value", "user_id"]
    )
    n_z, area_z = _per_file_bbox_area(dst_z)
    assert n_z > 1, "need multiple output files to observe clustering"
    assert spark.read.parquet(dst_z).count() == events.count()
    assert area_z < 0.5  # each file owns a small 2-D region → stats prune

    # contrast: the default (round-robin) rewrite of the same input
    # destroys clustering — every file spans ~the whole plane
    dst_rr = str(tmp_path / "compact_rr")
    layout.compact_parquet(spark, src, dst_rr, target_mb=0.005)
    _, area_rr = _per_file_bbox_area(dst_rr)
    assert area_rr > 0.7
    assert area_z < 0.6 * area_rr

    # linear mode: sort_cols keeps single-column spans tight
    import pyarrow.parquet as pq

    dst_s = str(tmp_path / "compact_sorted")
    layout.compact_parquet(spark, src, dst_s, target_mb=0.005, sort_cols=["value"])
    spans = []
    for f in sorted(glob.glob(os.path.join(dst_s, "*.parquet"))):
        v = pq.read_table(f, columns=["value"]).column("value").to_pylist()
        spans.append((min(v), max(v)))
    full = max(mx for _, mx in spans) - min(mn for mn, _ in spans)
    assert sum(mx - mn for mn, mx in spans) / len(spans) < 0.4 * full

    with pytest.raises(ValueError, match="not both"):
        layout.compact_parquet(spark, src, dst_s, sort_cols=["value"], zorder_cols=["value"])


def test_bucket_binary_search_equals_filter_count(spark):
    """bucket_by_edges' branchless binary search must be bit-identical to
    the naive 'count of edges <= value' filter — including on columns with
    heavy duplicates, where several bin edges collapse to the same value
    and the rank search must still return the full count of <= edges."""
    from pyspark.sql import Row

    rows = [Row(id=i, v=float(min(i % 37, 20))) for i in range(2000)]  # dup-heavy
    df = spark.createDataFrame(rows)
    keyed, (b,) = layout.bucket_by_edges(df, ["v"], bits=6, exact=True)
    got = {r.id: r[b] for r in keyed.select("id", b).collect()}

    edges = layout.quantile_edges(df, ["v"], bits=6, exact=True).collect()[0]["__e_v"]
    assert len(edges) == (1 << 6) - 1
    for r in rows:
        expect = sum(1 for e in edges if e <= r.v)
        assert got[r.id] == expect, (r.id, r.v, got[r.id], expect)


def test_hll_rollup_merge_equals_direct(spark):
    """Sketch union is exact over sketch state: estimating after merging
    per-day sketches must give the IDENTICAL estimate as sketching the
    whole table directly — rollup-then-merge loses nothing."""
    from pyspark.sql import functions as F

    from redpanda_ais_demo_spark.operators import sketches
    from redpanda_ais_demo_spark.sources import load_table

    ev = load_table(spark, SF_SMOKE, "events").withColumn("day", F.to_date(F.col("ts")))
    rollup = sketches.hll_rollup(ev, ["day", "event_type"], "user_id")
    merged = {
        r.event_type: r.approx_distinct
        for r in sketches.hll_rollup_estimate(rollup, ["event_type"]).collect()
    }
    direct = {
        r.event_type: r.approx_distinct
        for r in ev.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias("approx_distinct"))
        .collect()
    }
    assert merged == direct
    # and the estimate is a real cardinality estimate: within 5% of exact
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    for et, est in merged.items():
        assert abs(est - exact[et]) / exact[et] < 0.05


def test_kll_rollup_quantiles_near_exact_ranks(spark):
    """Quantiles read from merged per-day KLL sketches must sit within
    KLL's rank-error band of the exact quantiles."""
    from pyspark.sql import functions as F

    from redpanda_ais_demo_spark.operators import sketches
    from redpanda_ais_demo_spark.sources import load_table

    ev = load_table(spark, SF_SMOKE, "events").withColumn("day", F.to_date(F.col("ts")))
    rollup = sketches.kll_rollup(ev, ["day", "event_type"], "value")
    got = {
        r.event_type: (r.q50, r.q95)
        for r in sketches.kll_rollup_quantiles(rollup, ["event_type"], [0.5, 0.95]).collect()
    }
    vals = {}
    for r in ev.select("event_type", "value").collect():
        vals.setdefault(r.event_type, []).append(r.value)
    for et, (q50, q95) in got.items():
        xs = sorted(vals[et])
        # rank of the sketch answer must be within ±2.5% of the target rank
        # (k=200 guarantees ~1.65% normalized rank error at 99% confidence)
        import bisect

        for q, ans in ((0.5, q50), (0.95, q95)):
            rank = bisect.bisect_left(xs, ans) / len(xs)
            assert abs(rank - q) < 0.025, (et, q, ans, rank)


def test_heavy_hitters_exact_and_partitioning_independent(spark):
    """The two-pass MG shape must return EXACTLY the >= threshold tokens
    (same as a full exact count) on any partitioning, and reject k too
    small for the requested threshold."""
    import pytest
    from pyspark.sql import functions as F

    from redpanda_ais_demo_spark.operators import sketches
    from redpanda_ais_demo_spark.sources import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    toks = docs.select(F.explode(F.split(F.col("text"), " ")).alias("term"))
    total = toks.count()
    expect = {
        (r.term, r.n)
        for r in toks.groupBy("term").agg(F.count("*").alias("n")).collect()
        if r.n * 100 >= total
    }
    assert expect, "fixture should have >=1% tokens"
    for parts in (1, 7):
        got = {
            (r.term, r.n_occurrences)
            for r in sketches.heavy_hitters(docs.repartition(parts), 1.0, k=128).collect()
        }
        assert got == expect
    with pytest.raises(ValueError):
        sketches.heavy_hitters(docs, min_freq_pct=0.5, k=128)  # k too small for 0.5%


def test_hll_sliding_distinct_tracks_exact_within_bound(spark):
    """The sliding estimate stays within HLL's relative-error envelope
    of the exact sliding distinct, and the union is genuinely windowed
    (day 1's window = day 1 alone)."""
    from pyspark.sql import functions as F

    from redpanda_ais_demo_spark.operators.sketches import hll_sliding_distinct
    from redpanda_ais_demo_spark.sources import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    got = {r.day: r for r in hll_sliding_distinct(ev, "user_id", "ts", 7).collect()}

    # recompute exact sliding windows driver-side (tiny)
    days = sorted(got)
    day_users = {
        r.day: set(r.us)
        for r in ev.select(F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id")
        .groupBy("day")
        .agg(F.collect_set("user_id").alias("us"))
        .collect()
    }
    for i, d in enumerate(days):
        win = days[max(0, i - 6) : i + 1]
        exact_n = len(set().union(*(day_users[x] for x in win)))
        est = got[d].approx_window
        assert abs(est - exact_n) <= max(3, 0.05 * exact_n), (d, est, exact_n)
    assert got[days[0]].approx_window <= got[days[0]].exact_day * 1.05 + 3


def test_kmv_overlap_accuracy_and_exact_regime(spark):
    from redpanda_ais_demo_spark.operators.sketches import (
        kmv_overlap,
        kmv_sketch,
    )

    # exact regime: both audiences fit inside k -> estimates are EXACT
    # a = {0..99}, b = {50..149}: union 150, inter 50, jaccard 1/3
    rows = [("a", i) for i in range(100)] + [("b", i) for i in range(50, 150)]
    df = spark.createDataFrame(rows, "grp string, uid long")
    r = kmv_overlap(df, "grp", "uid", k=256).first()
    assert (r.grp_a, r.grp_b) == ("a", "b")
    assert r.k_union == 150 and r.n_both == 50
    assert r.union_est == 150.0 and r.inter_est == 50.0
    assert r.jaccard_est == round(50 / 150, 6)

    # sketch regime: 4000-id audiences with 50% overlap, k=256 ->
    # KMV error ~ 1/sqrt(k) ~ 6%; allow 4 sigma
    big = [("a", i) for i in range(4000)] + [("b", i) for i in range(2000, 6000)]
    bdf = spark.createDataFrame(big, "grp string, uid long")
    rb = kmv_overlap(bdf, "grp", "uid", k=256).first()
    assert abs(rb.union_est - 6000) / 6000 < 0.25
    assert abs(rb.inter_est - 2000) / 2000 < 0.5
    assert abs(rb.jaccard_est - 1 / 3) < 0.12

    # sketch is k rows max, deterministic across runs
    sk = kmv_sketch(bdf, "grp", "uid", k=256)
    assert sk.groupBy("grp").count().agg({"count": "max"}).first()[0] == 256
    assert sk.orderBy("grp", "rank").collect() == kmv_sketch(
        bdf, "grp", "uid", k=256
    ).orderBy("grp", "rank").collect()

    import pytest as _pt

    with _pt.raises(ValueError):
        kmv_sketch(df, "grp", "uid", k=1)
