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

Thread model: ``_LIVE`` is lock-guarded, and :func:`scope` tracks the
frames ITS OWN THREAD registers (thread-local collector) rather than a
length mark — two concurrent foreachBatch streams each running a scoped
step can never release each other's persists (code-review r10: a
length-mark scope popped frames a concurrent thread appended while the
scope was open — the exact cross-caller eviction the scope exists to
prevent).
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []
_LOCK = threading.Lock()
_SCOPES = threading.local()  # per-thread stack of active scope collectors


def track(df: DataFrame) -> DataFrame:
    """Register an already-persisted frame for deferred eviction."""
    with _LOCK:
        _LIVE.append(df)
    for collector in getattr(_SCOPES, "stack", []):
        collector.append(df)
    return df


def persist_tracked(df: DataFrame, level=None) -> DataFrame:
    """``df.persist(level)`` (default MEMORY_AND_DISK) + :func:`track`."""
    from pyspark import StorageLevel

    return track(df.persist(level or StorageLevel.MEMORY_AND_DISK))


def _release(frames: list[DataFrame]) -> None:
    for df in frames:
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass  # session already stopped — blocks are gone anyway


def release_all() -> None:
    """Evict every tracked frame; safe to call with a dead session."""
    with _LOCK:
        frames, _LIVE[:] = list(_LIVE), []
    _release(frames)


@contextmanager
def scope():
    """Release ONLY the frames THIS THREAD tracks inside the block.

    For library code that runs inside someone else's session (e.g. a
    per-micro-batch streaming step): ``release_all()`` there would evict
    frames a concurrent caller persisted for correctness (a
    range-partitioned frame persisted so two subtrees see one partitioner
    draw) before they are materialized (ADVICE r9). Frames another
    thread registers while the scope is open are untouched. Anything the
    scoped persists feed must be materialized before the block exits."""
    collector: list[DataFrame] = []
    stack = getattr(_SCOPES, "stack", None)
    if stack is None:
        stack = _SCOPES.stack = []
    stack.append(collector)
    try:
        yield
    finally:
        stack.pop()
        with _LOCK:
            _LIVE[:] = [df for df in _LIVE if all(df is not c for c in collector)]
        _release(collector)
