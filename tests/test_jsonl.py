"""JSONL source/sink: round-trip fidelity, corrupt-line quarantine,
shard sizing."""

from __future__ import annotations

import glob
import gzip as gzip_mod
import os

from redpanda_ais_demo_spark.sources import jsonl, load_table

from .conftest import SF_SMOKE


def test_jsonl_round_trip_preserves_documents(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents")
    path = str(tmp_path / "docs_jsonl")
    jsonl.write_jsonl(docs, path, target_files=4)
    files = glob.glob(os.path.join(path, "part-*.json"))
    assert len(files) == 4
    back = jsonl.read_jsonl(
        spark, path, "doc_id long, text string, lang string, source string, n_chars long"
    )
    clean, corrupt = jsonl.split_corrupt(back)
    assert corrupt.count() == 0
    a = {tuple(r) for r in docs.select("doc_id", "text", "lang", "source", "n_chars").collect()}
    b = {tuple(r) for r in clean.select("doc_id", "text", "lang", "source", "n_chars").collect()}
    assert a == b


def test_jsonl_quarantines_malformed_lines(spark, tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    (raw / "part-0.jsonl").write_text(
        '{"doc_id": 1, "text": "ok"}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "also ok"}\n'
        '{"doc_id": "NOT A NUMBER", "text": "bad type"}\n'
    )
    df = jsonl.read_jsonl(spark, str(raw), "doc_id long, text string")
    clean, corrupt = jsonl.split_corrupt(df)
    assert {r.doc_id for r in clean.collect()} == {1, 2}
    bad = [r[jsonl.CORRUPT_COL] for r in corrupt.collect()]
    assert len(bad) == 2
    assert any("not json" in b for b in bad)


def test_jsonl_gzip_shards(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    path = str(tmp_path / "gz")
    jsonl.write_jsonl(docs, path, target_files=2, gzip=True)
    files = glob.glob(os.path.join(path, "part-*.json.gz"))
    assert len(files) == 2
    with gzip_mod.open(files[0], "rt") as f:
        first = f.readline()
    assert first.startswith("{")
    back = jsonl.read_jsonl(spark, path, "doc_id long, text string, lang string, source string, n_chars long")
    clean, _ = jsonl.split_corrupt(back)
    assert clean.count() == 50
