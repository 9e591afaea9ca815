"""Tracked-persist hygiene: builders persist frames the returned plan
depends on; the registry must evict the previous builder's blocks when
the next builder runs, so a sequential sweep never accumulates cache."""

from __future__ import annotations

from lithops_dataframe_spark import cache
from lithops_dataframe_spark.plans import QUERIES


def test_track_and_release(spark):
    cache.release_all()
    df = cache.persist_tracked(spark.range(100))
    df.count()  # fill the cache
    assert df.storageLevel.useMemory
    cache.release_all()
    assert not df.storageLevel.useMemory
    assert cache._LIVE == []


def test_release_survives_double_call(spark):
    df = cache.persist_tracked(spark.range(10))
    cache.release_all()
    cache.release_all()  # idempotent
    assert not df.storageLevel.useMemory


def test_registry_builder_evicts_previous(spark, sf_dir):
    """Running one persisting builder then another leaves no tracked
    frames from the first: the wrapper calls release_all() on entry."""
    cache.release_all()
    QUERIES["dedup_simhash_pairs"](spark, sf_dir).collect()
    tracked_after_first = list(cache._LIVE)
    assert tracked_after_first, "simhash builder should track its persist"
    QUERIES["q06_forecast_revenue"](spark, sf_dir).collect()
    for df in tracked_after_first:
        assert not df.storageLevel.useMemory


def test_scope_releases_only_inner_frames(spark):
    """cache.scope() evicts frames tracked inside the block and leaves a
    co-resident caller's earlier persists alone (ADVICE r9: the drift
    step's release_all() evicted correctness-critical frames
    session-wide)."""
    cache.release_all()
    outer = cache.persist_tracked(spark.range(50))
    outer.count()
    with cache.scope():
        inner = cache.persist_tracked(spark.range(20))
        inner.count()
        assert inner.storageLevel.useMemory
    assert not inner.storageLevel.useMemory
    assert outer.storageLevel.useMemory
    assert cache._LIVE == [outer]
    cache.release_all()


def test_scope_releases_on_exception(spark):
    cache.release_all()
    try:
        with cache.scope():
            inner = cache.persist_tracked(spark.range(20))
            inner.count()
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert not inner.storageLevel.useMemory
    assert cache._LIVE == []
