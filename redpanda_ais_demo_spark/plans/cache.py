"""Query-result cache for declared queries — the console/dashboard
serving layer: the reference's dashboard re-runs its aggregates against
the backing store on every render (its console queries recompute per
call); at 100 TB a repeated dashboard query must hit a result cache, not
the corpus.

Design: results persist as parquet under ``cache_dir`` keyed by query
name; a sidecar manifest records a FINGERPRINT of everything the answer
depends on — the query name, the sf_dir, and every source parquet's
(name, size, mtime). A hit requires an exact fingerprint match, so any
table update, table addition/removal, or pointing at a different scale
factor invalidates automatically. Writes are atomic (temp dir + rename)
so a crashed writer can never serve a half-written result; a reader that
loses the rename race simply recomputes (cache is an optimization, never
a correctness dependency).

The cached read is a plain parquet scan of the (result-sized) artifact —
no recompute, no base-table scan; `inputFiles()` on the returned frame
proves which path served it (pinned in tests/test_result_cache.py).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

from . import get_queries


def _fingerprint(name: str, sf_dir: str) -> str:
    parts = [name, os.path.abspath(sf_dir)]
    for fname in sorted(os.listdir(sf_dir)):
        if fname.endswith(".parquet"):
            st = os.stat(os.path.join(sf_dir, fname))
            parts.append(f"{fname}:{st.st_size}:{st.st_mtime_ns}")
    return hashlib.md5("|".join(parts).encode()).hexdigest()


def cached_result(
    spark: SparkSession,
    name: str,
    sf_dir: str,
    cache_dir: str,
) -> DataFrame:
    """Serve declared query ``name`` over ``sf_dir`` from the result
    cache, computing and persisting on miss. Returns a DataFrame whose
    plan reads ONLY the cache artifact on a hit."""
    entry = os.path.join(cache_dir, name)
    manifest_path = os.path.join(entry, "manifest.json")
    data_path = os.path.join(entry, "data")
    fp = _fingerprint(name, sf_dir)
    if os.path.exists(manifest_path):
        try:
            with open(manifest_path) as f:
                manifest = json.load(f)
        except (OSError, ValueError):
            manifest = None
        if manifest and manifest.get("fingerprint") == fp:
            return spark.read.parquet(data_path)
    df = get_queries()[name](spark, sf_dir)
    os.makedirs(cache_dir, exist_ok=True)
    tmp = os.path.join(cache_dir, f".tmp-{name}-{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(os.path.join(tmp, "data"))
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump({"fingerprint": fp, "name": name, "sf_dir": os.path.abspath(sf_dir)}, f)
    # atomic swap: replace any stale entry in one rename each way
    old = None
    if os.path.exists(entry):
        old = entry + f".old-{uuid.uuid4().hex}"
        try:
            os.rename(entry, old)
        except OSError:
            # a concurrent writer moved the entry between the exists()
            # check and the rename — fall through; the tmp->entry swap
            # below decides the race and the loser serves its own frame
            old = None
    try:
        os.rename(tmp, entry)
    except OSError:
        # lost a race to a concurrent writer — serve our computed frame;
        # the winner's artifact is equivalent (same fingerprint)
        shutil.rmtree(tmp, ignore_errors=True)
        if old:
            os.rename(old, entry)
        return df
    if old:
        shutil.rmtree(old, ignore_errors=True)
    return spark.read.parquet(data_path)


def invalidate(cache_dir: str, name: str | None = None) -> None:
    """Drop one cached entry (or the whole cache) explicitly."""
    if name is None:
        shutil.rmtree(cache_dir, ignore_errors=True)
        return
    shutil.rmtree(os.path.join(cache_dir, name), ignore_errors=True)
