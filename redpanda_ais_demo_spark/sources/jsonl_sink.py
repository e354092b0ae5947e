"""Manifest-committed JSONL stream sink on the Spark 4 Python
DataSourceStreamWriter API — the exactly-once upgrade of a plain
"write files into a directory" sink (ST3).

Protocol (the classic two-phase object-store commit):

1. ``write`` (executors): each task streams its rows into an uncommitted
   part file ``part-{batch}-{task}-{uuid}.jsonl`` and returns a commit
   message naming it. Files are written once, never appended.
2. ``commit`` (driver, all tasks succeeded): write manifest
   ``_manifests/{batch}.json`` listing exactly the part files of this
   batch — the atomic commit point (one rename-able small file).
3. ``abort``: delete the named part files; no manifest, so nothing
   becomes visible.
4. Readers (``read_committed``) take the union of files named by
   manifests. Orphan part files from crashed/aborted/replayed attempts
   are invisible — a REPLAYED batch id overwrites its own manifest, so
   recovery after a commit-then-crash is idempotent, and recovery after
   a crash-before-commit leaves only ignorable orphans. Exactly-once
   without distributed transactions.

This is the same manifest discipline parquet's ``_spark_metadata`` file
sink implements, done explicitly so (a) the payload is JSONL — the
interchange format corpora ship in — and (b) the mechanism is visible
and testable rather than buried in the sink.
"""

from __future__ import annotations

import json
import os
import re
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    WriterCommitMessage,
)

MANIFEST_DIR = "_manifests"


class _PartFile(WriterCommitMessage):
    def __init__(self, path: str, rows: int):
        self.path = path
        self.rows = rows


class JSONLManifestStreamWriter(DataSourceStreamWriter):
    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        os.makedirs(self.path, exist_ok=True)
        fname = f"part-{ctx.partitionId()}-{uuid.uuid4().hex}.jsonl"
        full = os.path.join(self.path, fname)
        n = 0
        with open(full, "w") as f:
            for row in iterator:
                # recursive: nested struct Rows must become JSON objects,
                # not their string repr (default=str would silently
                # corrupt them into unparseable strings)
                f.write(json.dumps(row.asDict(recursive=True), separators=(",", ":"), default=str))
                f.write("\n")
                n += 1
        return _PartFile(fname, n)

    def commit(self, messages, batchId: int) -> None:
        files = [{"file": m.path, "rows": m.rows} for m in messages if m is not None]
        mdir = os.path.join(self.path, MANIFEST_DIR)
        os.makedirs(mdir, exist_ok=True)
        tmp = os.path.join(mdir, f".{batchId}.json.tmp")
        with open(tmp, "w") as f:
            json.dump({"batch": batchId, "files": files}, f)
        # rename is the atomic commit point; a replayed batch id
        # overwrites its own manifest -> idempotent recovery
        os.replace(tmp, os.path.join(mdir, f"{batchId}.json"))

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.path))
                except FileNotFoundError:
                    pass


class JSONLManifestSink(DataSource):
    """df.writeStream.format("jsonl_manifest").option("path", ...)"""

    @classmethod
    def name(cls) -> str:
        return "jsonl_manifest"

    def streamWriter(self, schema, overwrite: bool) -> JSONLManifestStreamWriter:
        return JSONLManifestStreamWriter(self.options)


def committed_files(path: str) -> list[str]:
    """Part files named by a manifest, in (batch, manifest order).

    Only ``{batch}.json`` names are manifests: a crash between writing
    ``.{batch}.json.tmp`` and the atomic rename leaves a tmp file that
    must stay invisible (it was never committed), so names are matched
    strictly before any sort-key parsing.
    """
    mdir = os.path.join(path, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    names = [mf for mf in os.listdir(mdir) if re.fullmatch(r"\d+\.json", mf)]
    out = []
    for mf in sorted(names, key=lambda s: int(s.split(".")[0])):
        with open(os.path.join(mdir, mf)) as f:
            manifest = json.load(f)
        out.extend(os.path.join(path, e["file"]) for e in manifest["files"])
    return out


def read_committed(spark, path: str, schema):
    """Exactly the committed rows — orphan part files are invisible."""
    from .jsonl import read_jsonl

    files = committed_files(path)
    if not files:
        raise FileNotFoundError(f"no committed manifests under {path}")
    return read_jsonl(spark, files, schema)


def register(spark) -> None:
    # pickle-by-value: the writer class must unpickle in Python workers
    # that don't search addPyFile files (see nmea_datasource.register)
    import sys

    from pyspark import cloudpickle

    from ..dist import ensure_shipped

    ensure_shipped(spark)
    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(JSONLManifestSink)
