"""Scoped cache registry (operators/_cache.py, r7 ADVICE item 3): a
scope releases exactly the persists registered on its thread while
active; global registrations and concurrent threads are untouched."""

import threading

from sparkall_spark.operators._cache import (
    cache_scope,
    persist_tracked,
    release_caches,
)


def _cached(df) -> bool:
    return df.storageLevel.useMemory or df.storageLevel.useDisk


def test_scope_releases_only_its_own(spark):
    outside = persist_tracked(spark.range(10))
    outside.count()
    with cache_scope():
        inside = persist_tracked(spark.range(20))
        inside.count()
        assert _cached(inside) and _cached(outside)
    assert not _cached(inside)
    assert _cached(outside)  # the global drain was NOT triggered
    release_caches()
    assert not _cached(outside)


def test_scopes_nest_innermost_wins(spark):
    with cache_scope():
        outer = persist_tracked(spark.range(5))
        outer.count()
        with cache_scope():
            inner = persist_tracked(spark.range(6))
            inner.count()
        assert not _cached(inner)
        assert _cached(outer)
    assert not _cached(outer)


def test_scope_is_thread_local(spark):
    """A concurrent thread WITHOUT a scope registers globally — the
    main thread's scope exit must not unpersist it (the streaming-sink
    safety property the r7 advice asked for)."""
    other_frame = []

    def other_actor():
        df = persist_tracked(spark.range(30))
        df.count()
        other_frame.append(df)

    with cache_scope():
        mine = persist_tracked(spark.range(40))
        mine.count()
        t = threading.Thread(target=other_actor)
        t.start()
        t.join()
    assert not _cached(mine)
    assert _cached(other_frame[0])  # survived the scope exit
    release_caches()
    assert not _cached(other_frame[0])
