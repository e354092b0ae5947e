"""Count-min sketch error bounds and Z-order layout properties."""

from __future__ import annotations

import glob
import os

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
