"""Round-14 operator tests.

The substring-dedup ``pin`` knob (VERDICT r13 "What's wrong" #1) only
changes WHERE the corpus-sized anchor frame lives (localCheckpoint
blocks vs recompute-per-consumer) — never what comes out: both paths
must be row-identical, and the no-pin plan must contain zero checkpoint
pins.
"""

from __future__ import annotations

import pyspark.sql.functions as F  # noqa: F401

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "zz the quick brown fox jumps over the lazy dog yy tail text"),
    (3, "completely unrelated content with no repeats whatsoever here"),
    (4, "the quick brown fox jumps over the lazy dog again and again"),
]


def test_substring_dedup_pin_knob_is_result_invariant(spark):
    from redpanda_ais_demo_spark.operators.dedup import (
        substring_dedup_rewrite,
        substring_dup_spans,
    )

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    for fn, cols in (
        (substring_dup_spans, ("doc_id", "span_start", "span_len")),
        (substring_dedup_rewrite, ("doc_id", "clean_text", "n_spans_cut", "chars_cut")),
    ):
        pinned = sorted(tuple(r) for r in fn(docs, width=20, pin=True).collect())
        unpinned = sorted(tuple(r) for r in fn(docs, width=20, pin=False).collect())
        assert pinned == unpinned
        assert pinned  # the fixture does produce spans/cuts
    # something was actually cut (docs 2 and 4 repeat doc 1's sentence)
    got = {r.doc_id: r for r in substring_dedup_rewrite(docs, width=20).collect()}
    assert got[1].n_spans_cut == 0  # first occurrence survives
    assert got[4].chars_cut > 0


def test_pin_on_partitioning_survives_checkpoint_into_joins(spark):
    """The iterative-graph family pins its edge list pre-partitioned on
    the per-round join key (graph._pin_on): the checkpoint RDD must keep
    that hash partitioning so the join's edge-side exchange disappears.
    Broadcast disabled + AQE off to force the shuffle join the 100 TB
    case would use (locally the small vector side broadcasts and the
    partitioning is moot)."""
    from redpanda_ais_demo_spark.operators.graph import _pin_on

    with_conf = [
        ("spark.sql.autoBroadcastJoinThreshold", "-1"),
        ("spark.sql.adaptive.enabled", "false"),
    ]
    old = {k: spark.conf.get(k) for k, _ in with_conf}
    try:
        for k, v in with_conf:
            spark.conf.set(k, v)
        e = spark.range(2000).select(
            (F.col("id") % 97).alias("a"), (F.col("id") % 13).alias("b")
        )
        vec = spark.range(97).select(
            F.col("id").alias("a"), F.col("id").alias("score")
        )

        def edge_side_exchanges(pinned):
            plan = (
                pinned.join(vec, "a")
                .groupBy("b")
                .count()
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            return plan.count("Exchange hashpartitioning(a#")

        plain = e.localCheckpoint(eager=False)
        pre = _pin_on(e, "a")
        # plain pin: BOTH join inputs re-shuffle on a; keyed pin: only
        # the small vector side does
        assert edge_side_exchanges(plain) == 2
        assert edge_side_exchanges(pre) == 1
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_substring_dedup_no_pin_plan_has_no_checkpoint(spark, tmp_path):
    # a parquet source, so the ONLY way an RDD scan can appear in the
    # plan is the localCheckpoint pin — createDataFrame fixtures would
    # scan an ExistingRDD themselves and mask the thing under test
    from redpanda_ais_demo_spark.operators.dedup import substring_dup_spans

    p = str(tmp_path / "docs")
    spark.createDataFrame(DOCS, "doc_id long, text string").write.parquet(p)
    docs = spark.read.parquet(p)
    for pin, expect_rdd in ((False, False), (True, True)):
        plan = (
            substring_dup_spans(docs, width=20, pin=pin)
            ._jdf.queryExecution()
            .toString()
        )
        has_rdd = "Scan ExistingRDD" in plan or "LogicalRDD" in plan
        assert has_rdd == expect_rdd, f"pin={pin}: unexpected plan\n{plan[:800]}"
