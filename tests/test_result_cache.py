"""Result cache: hit serves ONLY the cache artifact, fingerprint
invalidates on source change, values identical either way."""

from __future__ import annotations

import os

from redpanda_ais_demo_spark.plans.cache import cached_result, invalidate

from .conftest import SF_SMOKE

QUERY = "a1_total_ships"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_cache_hit_reads_only_artifact(spark, tmp_path):
    cache = str(tmp_path / "cache")
    first = cached_result(spark, QUERY, SF_SMOKE, cache)
    direct = _rows(first)

    second = cached_result(spark, QUERY, SF_SMOKE, cache)
    files = second.inputFiles()
    assert files and all(cache in f for f in files), files
    assert _rows(second) == direct

    # cached values match a fresh direct run
    from redpanda_ais_demo_spark.plans import get_queries

    assert _rows(get_queries()[QUERY](spark, SF_SMOKE)) == direct


def test_cache_invalidates_on_source_change(spark, tmp_path):
    import shutil

    cache = str(tmp_path / "cache")
    # private copy of the sf dir so touching it can't affect other tests
    src = str(tmp_path / "sf")
    shutil.copytree(SF_SMOKE, src)
    cached_result(spark, QUERY, src, cache)
    manifest = os.path.join(cache, QUERY, "manifest.json")
    fp1 = open(manifest).read()

    # same sources -> same fingerprint, manifest untouched
    cached_result(spark, QUERY, src, cache)
    assert open(manifest).read() == fp1

    # touch one source table -> fingerprint differs -> recompute + rewrite
    os.utime(os.path.join(src, "events.parquet"))
    out = cached_result(spark, QUERY, src, cache)
    assert open(manifest).read() != fp1
    assert out.count() >= 0  # new artifact readable

    # explicit invalidation drops the entry
    invalidate(cache, QUERY)
    assert not os.path.exists(os.path.join(cache, QUERY))


def test_cache_swap_race_losing_entry_rename_falls_back(spark, tmp_path, monkeypatch):
    """ADVICE r8: if a concurrent writer moves the stale entry between
    the exists() check and the entry->old rename, the OSError is
    absorbed and the call still returns a correct frame."""
    import shutil as _shutil

    from redpanda_ais_demo_spark.plans import cache as cache_mod

    cache = str(tmp_path / "cache")
    src = str(tmp_path / "sf")
    _shutil.copytree(SF_SMOKE, src)
    baseline = _rows(cached_result(spark, QUERY, src, cache))

    # force a recompute (stale fingerprint) so the swap path runs
    os.utime(os.path.join(src, "events.parquet"))
    entry = os.path.join(cache, QUERY)
    real_rename = os.rename
    calls = {"n": 0}

    def racing_rename(a, b):
        # the first rename is entry->old: simulate the concurrent
        # winner having moved `entry` away a microsecond earlier
        if calls["n"] == 0 and a == entry:
            calls["n"] += 1
            raise OSError("entry vanished under us")
        return real_rename(a, b)

    monkeypatch.setattr(cache_mod.os, "rename", racing_rename)
    out = cached_result(spark, QUERY, src, cache)
    assert _rows(out) == baseline
    # subsequent call (no race) serves the cache normally
    monkeypatch.setattr(cache_mod.os, "rename", real_rename)
    assert _rows(cached_result(spark, QUERY, src, cache)) == baseline
