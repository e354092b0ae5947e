#!/usr/bin/env python
"""Same-JVM interleaved A/B of substring dedup's anchor-frame pin
(operators/dedup.py:substring_dup_spans ``pin`` knob) — VERDICT r13
"What's wrong" #1: the corpus-sized localCheckpoint was the one
unmeasured storage-vs-recompute trade in the tree.

pin=True  : localCheckpoint the (doc_id, pos, xxhash64) anchor frame so
            its two consumers (keep-first aggregate + mark join) share
            one materialization — holds ~24 B per corpus character in
            executor block storage.
pin=False : both consumers recompute the narrow map-side explode from
            the parquet scan — one extra pass over the document text,
            zero pinned bytes.

Method: the only comparator this repo trusts for perf claims — ONE JVM,
warm-up both variants untimed, then N interleaved timed rounds, min per
variant (see COVERAGE.md §2.59 for why cross-JVM readings lie). Pinned
storage is sampled from getRDDStorageInfo right after the pinned
variant's action, before the cleanup unpersist.

Writes/refreshes the `substring-pin` marker section in SCALING.md and
prints one JSON line.
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
from redpanda_ais_demo_spark.operators import dedup  # noqa: E402
from redpanda_ais_demo_spark.session import get_spark  # noqa: E402
from redpanda_ais_demo_spark.sources import load_table  # noqa: E402

SCALES = [
    ("/root/testdata/sf0.1", "sf0.1"),
    (os.path.join(REPO, ".scale_data", "sf1"), "sf1"),
]
N_ROUNDS = 5


def _storage_bytes(spark) -> tuple[int, int]:
    mem = disk = 0
    for info in spark.sparkContext._jsc.sc().getRDDStorageInfo():
        mem += info.memSize()
        disk += info.diskSize()
    return mem, disk


def _drop_persistent(spark) -> None:
    it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
    while it.hasNext():
        it.next()._2().unpersist(False)


def main() -> None:
    if not os.path.exists(SCALES[-1][0]):
        from tools import scale_fixture

        scale_fixture.build()
    spark = get_spark(app_name="substring-pin-ab")
    ensure_shipped(spark)

    def run(d: str, pin: bool) -> float:
        t0 = time.perf_counter()
        dedup.substring_dedup_rewrite(
            load_table(spark, d, "documents"), width=60, pin=pin
        ).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    result: dict[str, dict] = {}
    for raw_dir, label in SCALES:
        d = bench.prepare_split_fixture(raw_dir)
        for pin in (True, False):  # warm-up, untimed
            run(d, pin)
            _drop_persistent(spark)
        samples = {True: [], False: []}
        storage = (0, 0)
        for _ in range(N_ROUNDS):
            for pin in (True, False):
                samples[pin].append(run(d, pin))
                if pin:
                    m, dk = _storage_bytes(spark)
                    storage = (max(storage[0], m), max(storage[1], dk))
                _drop_persistent(spark)
        corpus_chars = (
            load_table(spark, d, "documents")
            .selectExpr("sum(length(text))")
            .collect()[0][0]
        )
        result[label] = {
            "pin_sec": min(samples[True]),
            "nopin_sec": min(samples[False]),
            "pin_samples": samples[True],
            "nopin_samples": samples[False],
            "pinned_mem_bytes": storage[0],
            "pinned_disk_bytes": storage[1],
            "corpus_chars": corpus_chars,
        }
    spark.stop()

    r1 = result["sf1"]
    lines = [
        "",
        "## Substring-dedup anchor pin A/B (`tools/pin_ab.py`, r14)",
        "",
        "Same-JVM interleaved, min of 5 after warm-up; pinned bytes sampled",
        "from getRDDStorageInfo after the pinned action. The pin holds the",
        "(doc_id, pos, hash) anchor frame (~24 B/char) for the keep-first",
        "aggregate + mark join; no-pin recomputes the narrow explode once",
        "per consumer.",
        "",
        "| fixture | corpus chars | pin (s) | no-pin (s) | pinned mem | pinned disk |",
        "|---|---|---|---|---|---|",
    ]
    for label in ("sf0.1", "sf1"):
        r = result[label]
        lines.append(
            f"| {label} | {r['corpus_chars']:,} | {r['pin_sec']} | "
            f"{r['nopin_sec']} | {r['pinned_mem_bytes']:,} B | "
            f"{r['pinned_disk_bytes']:,} B |"
        )
    per_char = r1["pinned_mem_bytes"] / max(r1["corpus_chars"], 1)
    speedup = (r1["nopin_sec"] - r1["pin_sec"]) / r1["nopin_sec"] * 100
    lines += [
        "",
        f"Measured pin cost: {per_char:.1f} B per corpus character — at",
        "100 TB of text that is "
        f"~{per_char * 100e12 / 1e15:.1f} PB of executor block storage",
        "(MEMORY_AND_DISK deserialized rows; the same order as the suffix",
        f"array this operator replaces). The pin buys ~{speedup:.0f}% locally at sf1",
        f"({r1['pin_sec']}s vs {r1['nopin_sec']}s min-of-{N_ROUNDS}, same JVM)",
        "for that petabyte-order pin, so the default in operators/dedup.py",
        "is ``pin=False`` — the scan is recomputed once per consumer and",
        "nothing is held.",
        "",
        "```json",
        json.dumps(result, indent=1),
        "```",
        "",
    ]
    path = os.path.join(REPO, "SCALING.md")
    text = open(path).read()
    b, e = "<!-- substring-pin:begin -->", "<!-- substring-pin:end -->"
    section = b + "\n" + "\n".join(lines) + "\n" + e
    if b in text and e in text:
        text = text.split(b)[0] + section + text.split(e, 1)[1]
    else:
        text = text.rstrip() + "\n\n" + section + "\n"
    with open(path, "w") as f:
        f.write(text)
    print(json.dumps({k: {kk: v[kk] for kk in ("pin_sec", "nopin_sec", "pinned_mem_bytes", "pinned_disk_bytes")} for k, v in result.items()}))


if __name__ == "__main__":
    main()
