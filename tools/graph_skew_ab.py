#!/usr/bin/env python
"""Hub-skew stress for the keyed edge-list pin (operators/graph.py:
_pin_on, r14) — the adversarial question the keyed pin raises: a
pinned RDD's partitioning cannot be re-split by AQE's skew-join
optimizer (there is no exchange left to re-plan), so does a hub key
that concentrates a large share of the edge list in ONE partition make
the keyed pin a regression vs the plain pin it replaced?

Fixture: a bipartite graph where one hub node carries 30% of ALL edges
(300k of 1M) and the rest spread uniformly over 100k nodes — far past
any real power-law head. Broadcast is disabled to force the shuffle
join the 100 TB regime uses (locally the label vector would broadcast
and hide the question); AQE stays ON so the plain variant keeps its
skew-split capability. Same-JVM interleaved min-of-N with the pin
monkeypatch-toggled (the only comparator this repo trusts,
COVERAGE.md §2.59).

Expected (and measured, COVERAGE.md §2.64): no regression — the hub's
weight lands in the JOIN OUTPUT, which still flows through a
re-balanceable exchange into the per-round (node, label) partial agg;
the pinned input partition holds 30% of edge ROWS but the probe build
against it is the small per-partition label map.

Usage: python tools/graph_skew_ab.py [n_rounds]   (default 4)
Prints one JSON line {keyed_samples, plain_samples, keyed_sec, plain_sec}.
"""

from __future__ import annotations

import json
import sys
import time

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from redpanda_ais_demo_spark.operators import graph as G  # noqa: E402

HUB_EDGES = 300_000
UNI_EDGES = 700_000
N_NODES = 100_000
ITERS = 5


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    hub = spark.range(HUB_EDGES).select(
        F.lit(0).alias("src"), (F.col("id") % N_NODES + 1).alias("dst")
    )
    uni = spark.range(UNI_EDGES).select(
        (F.xxhash64("id") % N_NODES + 1).alias("src"),
        (F.xxhash64("id", F.lit(1)) % N_NODES + 1).alias("dst"),
    )
    path = "/tmp/graph_skew_edges"
    hub.unionAll(uni).filter(F.col("src") != F.col("dst")).write.mode(
        "overwrite"
    ).parquet(path)
    e = spark.read.parquet(path)

    orig = G._pin_on

    def plain(df, *keys):
        return df.localCheckpoint(eager=False)

    def drop() -> None:
        it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
        while it.hasNext():
            it.next()._2().unpersist(False)

    def run(keyed: bool) -> float:
        G._pin_on = orig if keyed else plain
        try:
            t0 = time.perf_counter()
            G.label_propagation(e, iters=ITERS).write.format("noop").mode(
                "overwrite"
            ).save()
            return round(time.perf_counter() - t0, 3)
        finally:
            G._pin_on = orig
            drop()

    for keyed in (True, False):  # warm-up, untimed
        run(keyed)
    samples = {True: [], False: []}
    for _ in range(n):
        for keyed in (True, False):
            samples[keyed].append(run(keyed))
    spark.stop()
    print(
        json.dumps(
            {
                "keyed_samples": samples[True],
                "plain_samples": samples[False],
                "keyed_sec": min(samples[True]),
                "plain_sec": min(samples[False]),
                "hub_share": HUB_EDGES / (HUB_EDGES + UNI_EDGES),
            }
        )
    )


if __name__ == "__main__":
    main()
