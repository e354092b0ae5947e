#!/usr/bin/env python
"""Adversarial-density stress for the two bucketed self-joins whose
cost is Σ bucket² — `operators/spatial.py:close_pairs` (grid-file
cell join) and `operators/timeseries.py:paa_correlation_pairs`
(sign-sketch band join).

The benign scaling curve (SCALING.md main table) proves near-linear
growth when bucket occupancy stays scale-free — the shape real data
has. This tool measures the shape real data occasionally DOESN'T have:

1. **Hot cell** — every 50th sf0.1 event moved into one 1°×1-hour
   spatio-temporal cell (K=2000 co-located fixes → ~K²/2 ≈ 2M exact
   haversine refines through one hash bucket). Proves the grid join
   degrades with Σ bucket², not |input|² — the other 98k events still
   prune normally — and measures the hot bucket's real cost.

2. **Correlated buckets** — 4000 synthetic users, each with an 8-day
   spend profile REJECTION-SAMPLED (deterministic splitmix64 stream)
   to land in ONE 4-bit sign-sketch signature while remaining mostly
   sub-threshold-correlated: ~8M candidate pairs, near-empty output —
   the worst case for an LSH band (candidates without results). The
   benign twin draws the same profiles WITHOUT the signature
   constraint (natural 16-way spread). The mitigation run repeats the
   adversarial fixture at n_bits=12: the 8 extra hyperplanes split the
   colliding cone ~2⁸ ways, restoring the pruning — the knob a 100 TB
   deployment turns when a band grows hot (same spirit as AQE skew
   splitting for plain joins).

Appends a marker-delimited section to SCALING.md (the main generator
preserves it) and prints one compact JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from redpanda_ais_demo_spark.dist import ensure_shipped  # noqa: E402
from redpanda_ais_demo_spark.functions.vector import (  # noqa: E402
    sign_projection_matrix,
)
from redpanda_ais_demo_spark.session import get_spark  # noqa: E402

MARKER_BEGIN = "<!-- skew-stress:begin -->"
MARKER_END = "<!-- skew-stress:end -->"
N_ROUNDS = 3
HOT_EVERY = 50  # 100k sf0.1 events -> K=2000 in the hot cell
N_USERS = 4000
N_DAYS = 8


def _mix(i: int) -> int:
    """splitmix64 — the repo's deterministic no-RNG-state stream."""
    x = (i * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def build_hot_cell(src: str, dst: str) -> None:
    """sf0.1 events with every HOT_EVERY-th event moved into one
    1-degree / 1-hour cell: value∈[100, 100.1) pins lat≈-14.5 and a
    ~0.7° lon run; ts spreads across one hour of 2024-01-15."""
    if os.path.exists(dst):
        return
    t = pq.read_table(src)
    eid = t.column("event_id").to_numpy()
    value = t.column("value").to_numpy().copy()
    ts = t.column("ts").to_numpy().copy()  # datetime64[us]
    hot = (eid % HOT_EVERY) == 0
    idx = np.nonzero(hot)[0]
    value[idx] = 100.0 + (eid[idx] % 1000) * 1e-4
    base = np.datetime64("2024-01-15T12:00:00", "us")
    ts[idx] = base + ((eid[idx] * 7919) % 3600) * np.timedelta64(1_000_000, "us")
    out = t.set_column(t.schema.get_field_index("value"), "value", pa.array(value))
    out = out.set_column(
        out.schema.get_field_index("ts"),
        "ts",
        pa.array(ts, type=t.schema.field("ts").type),
    )
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    pq.write_table(out, dst, row_group_size=4096, version="2.6")


def _profiles(constrained: bool) -> np.ndarray:
    """(N_USERS, N_DAYS) integer-cent profiles. ``constrained`` forces
    every profile's centered 4-bit sign sketch into signature 0 by
    rejection over the deterministic splitmix64 stream; the benign twin
    takes each user's FIRST draw from the same stream."""
    H = np.array(sign_projection_matrix(N_DAYS, 4))
    prof = np.empty((N_USERS, N_DAYS), dtype=np.int64)
    draw = 0
    for u in range(N_USERS):
        while True:
            raw = np.array(
                [_mix(draw * N_DAYS + d + 1) % 100_000 for d in range(N_DAYS)],
                dtype=np.int64,
            )
            draw += 1
            c = raw - raw.mean()
            bits = (H @ c >= 0).astype(int)
            if not constrained or not bits.any():
                prof[u] = raw + 100_000  # keep spends positive
                break
    return prof


def build_paa(dst: str, constrained: bool) -> None:
    """4000 users × 8 daily events whose per-day cents equal the
    engineered profile (one event per PAA bucket — span exactly 8 days,
    so bucketization is the identity)."""
    if os.path.exists(dst):
        return
    prof = _profiles(constrained)
    n = N_USERS * N_DAYS
    users = np.repeat(np.arange(N_USERS, dtype=np.int64) + 1, N_DAYS)
    days = np.tile(np.arange(N_DAYS, dtype=np.int64), N_USERS)
    base = np.datetime64("2024-03-01T00:00:00", "us")
    ts = base + days * np.timedelta64(86_400_000_000, "us")
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64) + 1),
            "ts": pa.array(ts, type=pa.timestamp("us")),
            "user_id": pa.array(users),
            "event_type": pa.array(["purchase"] * n),
            "value": pa.array(prof.reshape(-1) / 100.0),
            "props": pa.array(["{}"] * n),
        }
    )
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    pq.write_table(tbl, dst, row_group_size=2048, version="2.6")


def _time(fn, rounds: int = N_ROUNDS) -> float:
    fn()  # untimed warm-up (codegen, footers)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    stress_dir = os.path.join(REPO, ".scale_data", "skew")
    hot_path = os.path.join(stress_dir, "hot_events.parquet")
    paa_adv = os.path.join(stress_dir, "paa_adversarial.parquet")
    paa_ben = os.path.join(stress_dir, "paa_benign.parquet")
    build_hot_cell("/root/testdata/sf0.1/events.parquet", hot_path)
    build_paa(paa_adv, constrained=True)
    build_paa(paa_ben, constrained=False)

    spark = get_spark(app_name="skew-stress")
    ensure_shipped(spark)
    from pyspark.sql import functions as F

    from redpanda_ais_demo_spark.operators.spatial import close_pairs
    from redpanda_ais_demo_spark.operators.timeseries import paa_correlation_pairs
    from redpanda_ais_demo_spark.sources.tables import load_table

    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def run_close(path_dir: str, fname: str) -> None:
        events = load_table(spark, path_dir, fname.removesuffix(".parquet"))
        fixes = events.select(
            "event_id",
            "user_id",
            F.unix_micros(F.col("ts")).alias("us"),
            (F.col("value") / 10 - 24.5).alias("lat"),
            ((F.col("value") * 7) % 360 - 180).alias("lon"),
        )
        close_pairs(
            fixes, id_col="event_id", key_col="user_id", ts_us_col="us",
            lat_col="lat", lon_col="lon", dist_km=50.0, window_s=3600,
            cell_deg=1.0, max_abs_lat=60.0,
        ).write.format("noop").mode("overwrite").save()

    def run_paa(path_dir: str, fname: str, n_bits: int) -> None:
        events = load_table(spark, path_dir, fname.removesuffix(".parquet"))
        paa_correlation_pairs(
            events, "user_id", "ts", "value",
            n_buckets=N_DAYS, n_bits=n_bits, threshold=0.8,
        ).write.format("noop").mode("overwrite").save()

    # the loaders expect <dir>/<table>.parquet
    import shutil

    benign_events_dir = os.path.join(stress_dir, "benign_events")
    os.makedirs(benign_events_dir, exist_ok=True)
    benign_events = os.path.join(benign_events_dir, "events.parquet")
    if not os.path.exists(benign_events):
        shutil.copyfile("/root/testdata/sf0.1/events.parquet", benign_events)
    hot_dir = os.path.join(stress_dir, "hot")
    os.makedirs(hot_dir, exist_ok=True)
    if not os.path.exists(os.path.join(hot_dir, "events.parquet")):
        shutil.copyfile(hot_path, os.path.join(hot_dir, "events.parquet"))
    adv_dir = os.path.join(stress_dir, "adv")
    ben_dir = os.path.join(stress_dir, "ben")
    for d, src in ((adv_dir, paa_adv), (ben_dir, paa_ben)):
        os.makedirs(d, exist_ok=True)
        if not os.path.exists(os.path.join(d, "events.parquet")):
            shutil.copyfile(src, os.path.join(d, "events.parquet"))

    # --- r11: the two new bucketed joins -------------------------------
    # fs_linkage_scores: Σ block² on the blocking key. Benign = 640
    # name-blocks of 30; hot = ONE 3000-row name block (~4.5M pairs
    # through one hash bucket); mitigated = the caller's knob — a finer
    # COMPOSITE blocking key (name+brand), the linkage-world equivalent
    # of more band bits.
    from pyspark.sql import functions as FF

    from redpanda_ais_demo_spark.operators.dedup import fs_linkage_scores
    from redpanda_ais_demo_spark.operators.joins import interval_overlap_join

    def fs_frame(hot: bool):
        n = 19_200
        base = spark.range(n).select(
            FF.col("id").alias("k"),
            (
                FF.when(FF.col("id") < 3000, FF.lit("HOTNAME")).otherwise(
                    FF.concat(FF.lit("name"), (FF.col("id") % 640).cast("string"))
                )
                if hot
                else FF.concat(FF.lit("name"), (FF.col("id") % 640).cast("string"))
            ).alias("name"),
            FF.concat(FF.lit("B"), (FF.col("id") % 25).cast("string")).alias("brand"),
            FF.concat(FF.lit("T"), (FF.col("id") % 10).cast("string")).alias("typ"),
            (FF.col("id") % 50).alias("size"),
        )
        return base

    def run_fs(hot: bool, composite: bool) -> None:
        df = fs_frame(hot)
        if composite:
            df = df.withColumn(
                "blk", FF.concat_ws("|", FF.col("name"), FF.col("brand"))
            )
        else:
            df = df.withColumn("blk", FF.col("name"))
        fs_linkage_scores(
            df, "k", "blk", ["brand", "typ", "size"], m_prior=0.9
        ).write.format("noop").mode("overwrite").save()

    # interval_overlap_join: Σ cell-occupancy² candidates. Adversarial =
    # 3000 DISJOINT 10s intervals packed into one 86400s cell (4.5M
    # candidates, zero overlaps — candidates without results, the grid
    # worst case); mitigated = cell_size matched to the interval length
    # (the operator's documented knob); benign = same 86400 cell size
    # but intervals spread one per cell.
    def iv_frame(packed: bool):
        # packed: ALL 20k tiny intervals inside [0, 86400) -> one cell at
        # cell_size=86400 (~200M candidate pairs, ~zero true overlaps);
        # benign: one interval per cell at the same cell size
        lo = (
            (FF.col("id") * 7919) % 86_000
            if packed
            else FF.col("id") * 86_400
        )
        return spark.range(20_000).select(
            FF.col("id").alias("ida"),
            lo.cast("long").alias("lo_a"),
            (lo + 10).cast("long").alias("hi_a"),
        )

    def run_iv(packed: bool, cell: int) -> None:
        a = iv_frame(packed)
        b = (
            a.select(
                FF.col("ida").alias("idb"),
                FF.col("lo_a").alias("lo_b"),
                FF.col("hi_a").alias("hi_b"),
            )
        )
        interval_overlap_join(
            a, b, "lo_a", "hi_a", "lo_b", "hi_b", cell
        ).write.format("noop").mode("overwrite").save()

    # --- r13: substring dedup hot gram ---------------------------------
    # substring_dedup_rewrite's only skew surface is the anchor-hash
    # groupBy/join: a boilerplate gram shared by EVERY doc sends all its
    # occurrences through one hash key. The claim to measure: cost grows
    # by the ADDED ANCHORS (linear — firsts is 1 row per gram and the
    # mark join emits one row per occurrence), never occurrences².
    # Adversarial = every sf0.1 doc prepended with the same 100-char
    # header (~41 hot grams × 5000 occurrences each).
    from redpanda_ais_demo_spark.operators.dedup import substring_dedup_rewrite

    boiler_dir = os.path.join(stress_dir, "boiler_docs")
    os.makedirs(boiler_dir, exist_ok=True)
    boiler_docs = os.path.join(boiler_dir, "documents.parquet")
    if not os.path.exists(boiler_docs):
        t = pq.read_table("/root/testdata/sf0.1/documents.parquet")
        import hashlib

        header = (
            hashlib.sha256(b"boiler").hexdigest()
            + hashlib.sha256(b"boiler2").hexdigest()
        )[:100]
        texts = pa.array([header + s for s in t.column("text").to_pylist()])
        t = t.set_column(t.schema.get_field_index("text"), "text", texts)
        pq.write_table(t, boiler_docs, row_group_size=2048, version="2.6")
    benign_docs_dir = os.path.join(stress_dir, "benign_docs")
    os.makedirs(benign_docs_dir, exist_ok=True)
    if not os.path.exists(os.path.join(benign_docs_dir, "documents.parquet")):
        shutil.copyfile(
            "/root/testdata/sf0.1/documents.parquet",
            os.path.join(benign_docs_dir, "documents.parquet"),
        )

    def run_ssd(path_dir: str) -> None:
        docs = load_table(spark, path_dir, "documents")
        substring_dedup_rewrite(docs, width=60).write.format("noop").mode(
            "overwrite"
        ).save()

    res = {
        "close_benign_s": _time(lambda: run_close(benign_events_dir, "events.parquet")),
        "close_hotcell_s": _time(lambda: run_close(hot_dir, "events.parquet")),
        "paa_benign4_s": _time(lambda: run_paa(ben_dir, "events.parquet", 4)),
        "paa_adversarial4_s": _time(lambda: run_paa(adv_dir, "events.parquet", 4)),
        "paa_adversarial12_s": _time(lambda: run_paa(adv_dir, "events.parquet", 12)),
        "fs_benign_s": _time(lambda: run_fs(False, False)),
        "fs_hotblock_s": _time(lambda: run_fs(True, False)),
        "fs_composite_s": _time(lambda: run_fs(True, True)),
        "iv_benign_s": _time(lambda: run_iv(False, 86_400)),
        "iv_packed_s": _time(lambda: run_iv(True, 86_400)),
        "iv_rightcell_s": _time(lambda: run_iv(True, 30)),
        "ssd_benign_s": _time(lambda: run_ssd(benign_docs_dir)),
        "ssd_boiler_s": _time(lambda: run_ssd(boiler_dir)),
    }

    k_hot = 100_000 // HOT_EVERY
    section = "\n".join([
        MARKER_BEGIN,
        "",
        "## Adversarial density (hot cells / correlated buckets)",
        "",
        "Generated by `tools/skew_stress.py` (min of "
        f"{N_ROUNDS} rounds after warm-up). Both operators below are "
        "bucketed self-joins whose cost is Σ bucket² — benign only "
        "while buckets stay small. These rows measure engineered "
        "worst-case occupancy at sf0.1 scale:",
        "",
        "| case | benign (s) | adversarial (s) | mitigated (s) |",
        "|---|---|---|---|",
        f"| close_pairs: {k_hot} fixes in ONE 1°×1h cell (~{k_hot * k_hot // 2 // 1_000_000}M refines) "
        f"| {res['close_benign_s']} | {res['close_hotcell_s']} | — (AQE skew split / finer cells) |",
        f"| paa_correlation_pairs: {N_USERS} users in ONE 4-bit band (~{N_USERS * N_USERS // 2 // 1_000_000}M candidates) "
        f"| {res['paa_benign4_s']} | {res['paa_adversarial4_s']} | {res['paa_adversarial12_s']} (n_bits=12) |",
        f"| fs_linkage_scores: 3000 records in ONE name block (~4.5M scored pairs) "
        f"| {res['fs_benign_s']} | {res['fs_hotblock_s']} | {res['fs_composite_s']} (composite name+brand block) |",
        f"| interval_overlap_join: 20k near-disjoint 10s intervals in ONE 86400s cell (~200M candidates) "
        f"| {res['iv_benign_s']} | {res['iv_packed_s']} | {res['iv_rightcell_s']} (cell_size matched to interval length) |",
        f"| substring_dedup_rewrite: the same 100-char header on ALL 5000 docs (~41 grams × 5000 occurrences each) "
        f"| {res['ssd_benign_s']} | {res['ssd_boiler_s']} | — (linear by construction: 1 firsts-row per gram) |",
        "",
        "Reading: the hot-cell run degrades by the hot bucket's "
        "refine count, NOT |input|² — the other ~98k fixes prune "
        "normally, which is the grid-join claim. The PAA adversarial "
        "band (signature-colliding, mostly sub-threshold profiles — "
        "candidates without results, the LSH worst case) shows the "
        "n_bits knob restoring the pruning: 8 extra hyperplanes split "
        "the colliding cone ~2⁸ ways. The r11 joins follow the same "
        "doctrine: the Fellegi-Sunter hot block mitigates with a FINER "
        "COMPOSITE blocking key (name+brand — the linkage-world band "
        "bits), and the interval-overlap packed cell (disjoint "
        "intervals sharing one oversized cell — candidates without "
        "results) mitigates by matching cell_size to the typical "
        "interval length, the operator's documented knob. The "
        "substring-dedup hot gram (r13) is the NON-quadratic control "
        "case: corpus-wide boilerplate concentrates occurrences onto "
        "single anchor-hash keys, but keep-first joins each occurrence "
        "against exactly ONE firsts-row, so the adversarial run pays "
        "only the added anchors plus single-reducer residency — "
        "degradation stays near the anchor-count ratio, never "
        "occurrences². At 100 TB "
        "the same knobs apply: smaller cells / more band bits / finer "
        "blocks for known-hot keyspaces, AQE skew-join splitting for "
        "the residual stragglers.",
        "",
        MARKER_END,
    ])
    scaling_path = os.path.join(REPO, "SCALING.md")
    text = open(scaling_path).read() if os.path.exists(scaling_path) else ""
    if MARKER_BEGIN in text:
        pre = text.split(MARKER_BEGIN)[0]
        post = text.split(MARKER_END, 1)[1] if MARKER_END in text else ""
        text = pre + section + post
    else:
        text = text.rstrip() + "\n\n" + section + "\n"
    with open(scaling_path, "w") as f:
        f.write(text)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
