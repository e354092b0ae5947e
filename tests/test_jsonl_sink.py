"""Manifest-committed JSONL stream sink: exactly-once visibility through
the manifest, orphan part files invisible, replayed manifests idempotent."""

from __future__ import annotations

import json
import os

from redpanda_ais_demo_spark.sources import jsonl_sink, nmea_datasource

LINES = [f"!AIVDM,1,1,,A,S{i:03d},0*00" for i in range(120)]


def test_stream_commits_manifests_and_reader_sees_exactly_once(spark, tmp_path):
    log = tmp_path / "feed.nmea"
    log.write_text("\n".join(LINES) + "\n")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    nmea_datasource.register(spark)
    jsonl_sink.register(spark)
    q = (
        spark.readStream.format("nmea_replay")
        .option("path", str(log))
        .option("numpartitions", "3")
        .load()
        .writeStream.format("jsonl_manifest")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    committed = jsonl_sink.committed_files(out)
    assert committed, "manifest must name part files"
    back = jsonl_sink.read_committed(spark, out, "line_no bigint, nmea string")
    clean, corrupt = __import__(
        "redpanda_ais_demo_spark.sources.jsonl", fromlist=["split_corrupt"]
    ).split_corrupt(back)
    assert corrupt.count() == 0
    rows = clean.collect()
    assert len(rows) == 120
    assert {r.line_no for r in rows} == set(range(120))

    # manifest row counts reconcile with delivered rows
    mdir = os.path.join(out, jsonl_sink.MANIFEST_DIR)
    total = 0
    for mf in os.listdir(mdir):
        with open(os.path.join(mdir, mf)) as f:
            total += sum(e["rows"] for e in json.load(f)["files"])
    assert total == 120

    # an orphan part file (crashed attempt) must stay invisible
    orphan = os.path.join(out, "part-9-deadbeef.jsonl")
    with open(orphan, "w") as f:
        f.write('{"line_no": 999999, "nmea": "ORPHAN"}\n')
    again = jsonl_sink.read_committed(spark, out, "line_no bigint, nmea string")
    assert again.filter("line_no = 999999").count() == 0
    assert again.count() == 120


def test_replayed_batch_manifest_is_idempotent(tmp_path):
    out = str(tmp_path / "out")
    w = jsonl_sink.JSONLManifestStreamWriter({"path": out})
    os.makedirs(out)
    # two attempts of the same batch id: second commit overwrites the first
    for attempt in ("a", "b"):
        fname = f"part-0-{attempt}.jsonl"
        with open(os.path.join(out, fname), "w") as f:
            f.write('{"x": 1}\n')
        w.commit([jsonl_sink._PartFile(fname, 1)], batchId=7)
    files = jsonl_sink.committed_files(out)
    assert files == [os.path.join(out, "part-0-b.jsonl")]


def test_abort_removes_named_parts(tmp_path):
    out = str(tmp_path / "out")
    os.makedirs(out)
    w = jsonl_sink.JSONLManifestStreamWriter({"path": out})
    with open(os.path.join(out, "part-0-x.jsonl"), "w") as f:
        f.write('{"x": 1}\n')
    w.abort([jsonl_sink._PartFile("part-0-x.jsonl", 1), None], batchId=3)
    assert not os.path.exists(os.path.join(out, "part-0-x.jsonl"))
    assert jsonl_sink.committed_files(out) == []
