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
