#!/usr/bin/env python
"""Job-count + wall-time probe for registry queries.

The iterative operators' per-round driver scalar (convergence check)
can silently cost TWO Spark jobs per round: on a lazily-checkpointed
frame, ``isEmpty``'s take(1) computes a partition subset and the
localCheckpoint machinery then fills the remaining partitions in a
separate job. ``count()`` computes every partition once, so scalar and
checkpoint materialization share one job (the CC label-sum doctrine,
operators/dedup.py:connected_components). This probe makes the claim
measurable: it runs each named query end-to-end into the noop sink
under a dedicated job group and reports how many Spark jobs the group
launched, plus wall time (min over rounds).

Usage:
    python tools/jobcount_ab.py q1,q2[,q3...] [rounds]

Env: SPARK_GRAFT_SF_DIR picks the fixture dir (default
/root/testdata/sf0.1 rewritten to the bench's multi-row-group layout
via bench.prepare_split_fixture so scan parallelism matches the bench).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from bench import prepare_split_fixture  # noqa: E402
from redpanda_ais_demo_spark.plans import get_queries  # noqa: E402
from redpanda_ais_demo_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = [q.strip() for q in sys.argv[1].split(",") if q.strip()]
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_dir = prepare_split_fixture(sf_dir)
    spark = get_spark(app_name="jobcount_ab")
    from redpanda_ais_demo_spark.dist import ensure_shipped

    ensure_shipped(spark)
    queries = get_queries()
    missing = [n for n in names if n not in queries]
    if missing:
        raise SystemExit(f"not registered: {missing}")
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm-up
    spark.range(1000).mapInPandas(lambda it: it, "id long").selectExpr(
        "sum(id)"
    ).collect()
    for name in names:
        fn = queries[name]
        best, jobs_at_best = None, None
        for r in range(rounds):
            group = f"probe-{name}-{r}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            n_jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            if best is None or dt < best:
                best, jobs_at_best = dt, n_jobs
            print(f"  {name} round {r}: {dt:.3f}s  jobs={n_jobs}", flush=True)
        print(f"{name}: min {best:.3f}s  jobs={jobs_at_best}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
