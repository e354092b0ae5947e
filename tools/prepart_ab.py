#!/usr/bin/env python
"""Same-JVM interleaved A/B of the keyed edge-list pin in the iterative
graph family (operators/graph.py:_pin_on) — r14.

new : the pinned edge list is repartitioned on its per-round join key
      before the localCheckpoint, so shuffle joins against it satisfy
      their distribution requirement from the pin (zero per-round edge
      exchanges at scale; locally the vector side broadcasts and the
      join shape is unchanged).
old : plain localCheckpoint (the r13 shape) — the keyed repartition is
      skipped, saving one edge-list shuffle at operator build time.

Locally the broadcast join hides the scale win, so this measures the
COST of the extra build-time shuffle — the honest price of the
scale-right default, like the substring-dedup pin A/B. Method per
COVERAGE.md §2.59: ONE JVM, warm-up both variants untimed, then N
interleaved timed rounds, min per variant.

Usage: python tools/prepart_ab.py [n_rounds]   (default 5)
Prints one JSON line {query: {new_sec, old_sec, new_samples, old_samples}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import bench  # noqa: E402
from redpanda_ais_demo_spark.dist import ensure_shipped  # noqa: E402
from redpanda_ais_demo_spark.operators import graph as G  # noqa: E402
from redpanda_ais_demo_spark.plans import get_queries  # noqa: E402
from redpanda_ais_demo_spark.session import get_spark  # noqa: E402

QUERIES = [
    "modularity_lpa_communities",
    "pagerank_customer_supplier",
    "hits_customer_supplier",
    "sssp_copurchase_from_min_part",
    "khop_supplier_reach",
    "lpa_communities_customer_supplier",
]

_ORIG_PIN = G._pin_on


def _plain_pin(df, *keys):  # the r13 shape
    return df.localCheckpoint(eager=False)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(app_name="prepart-ab")
    ensure_shipped(spark)
    qs = get_queries()
    d = bench.prepare_split_fixture(
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )

    def drop_persistent() -> None:
        it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
        while it.hasNext():
            it.next()._2().unpersist(False)

    def run(q: str, new: bool) -> float:
        G._pin_on = _ORIG_PIN if new else _plain_pin
        try:
            t0 = time.perf_counter()
            qs[q](spark, d).write.format("noop").mode("overwrite").save()
            return round(time.perf_counter() - t0, 3)
        finally:
            G._pin_on = _ORIG_PIN
            drop_persistent()

    out: dict[str, dict] = {}
    for q in QUERIES:
        for new in (True, False):  # warm-up, untimed
            run(q, new)
        samples = {True: [], False: []}
        for _ in range(n):
            for new in (True, False):
                samples[new].append(run(q, new))
        out[q] = {
            "new_sec": min(samples[True]),
            "old_sec": min(samples[False]),
            "new_samples": samples[True],
            "old_samples": samples[False],
        }
        print(f"# {q}: new {out[q]['new_sec']}s old {out[q]['old_sec']}s", file=sys.stderr)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
