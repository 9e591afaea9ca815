"""Tracked persists for query builders.

Several plans persist an intermediate frame that the RETURNED DataFrame
still depends on (LSH signatures, Bloom filter frames, phash frames,
graph edges), so the builder cannot unpersist before the caller
materializes the result — but never unpersisting leaks cached blocks
into executor memory across a many-query sweep (the driver correctness
pass runs 50 builders in one session; the local battery runs 170+).

The contract here: every such persist registers through :func:`track`,
and the registry invokes :func:`release_all` at the START of each
builder, evicting the previous query's blocks. Accumulation is therefore
bounded to one query's working set regardless of which harness is
driving (external driver, bench, pytest) — none of them need to know
about the hook. ``unpersist(blocking=False)`` keeps the eviction off the
query's critical path.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Register an already-persisted frame for deferred eviction."""
    _LIVE.append(df)
    return df


def persist_tracked(df: DataFrame, level=None) -> DataFrame:
    """``df.persist(level)`` (default MEMORY_AND_DISK) + :func:`track`."""
    from pyspark import StorageLevel

    return track(df.persist(level or StorageLevel.MEMORY_AND_DISK))


def release_all() -> None:
    """Evict every tracked frame; safe to call with a dead session."""
    _release_down_to(0)


def _release_down_to(mark: int) -> None:
    while len(_LIVE) > mark:
        df = _LIVE.pop()
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass  # session already stopped — blocks are gone anyway


@contextmanager
def scope():
    """Release ONLY the frames tracked inside the block, on exit.

    For library code that runs inside someone else's session (e.g. a
    per-micro-batch streaming step): ``release_all()`` there would evict
    frames a concurrent caller persisted for correctness (a
    range-partitioned frame persisted so two subtrees see one partitioner
    draw) before they are materialized (ADVICE r9). Anything the scoped
    persists feed must be materialized before the block exits."""
    mark = len(_LIVE)
    try:
        yield
    finally:
        _release_down_to(mark)
