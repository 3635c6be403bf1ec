"""Shared registry for operator-persisted intermediates.

Iterative/multi-pass operators (dedup, connected components) persist
intermediates that outlive the operator call — the caller consumes the
result lazily, so the operator cannot unpersist eagerly.  They register
every persist here instead; a long-lived session (or the driver-entry
harness) calls :func:`release_caches` between units of work so cached
RDDs do not accumulate across queries.

Two release granularities:

- :func:`release_caches` — the session-global drain.  Right for a
  serial harness (one unit of work at a time on the session).
- :func:`cache_scope` (r8, ADVICE item 3) — a context manager that
  captures every registration made ON THE SAME THREAD while it is
  active and unpersists exactly those at exit.  Right for concurrent
  actors sharing one SparkSession (a streaming micro-batch releasing
  its own per-batch persists must not drop a concurrent batch
  operator's still-in-use intermediates).  Attribution is
  THREAD-LOCAL: an operator that registers persists from its own
  worker threads (none do today) would fall through to the global
  list — keep operator registration on the calling thread.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []
_TL = threading.local()


def _sink() -> list[DataFrame]:
    stack = getattr(_TL, "stack", None)
    return stack[-1] if stack else _PERSISTED


def persist_tracked(df: DataFrame) -> DataFrame:
    """``df.persist()`` + register for a later release (the innermost
    active :func:`cache_scope` on this thread, else the global list)."""
    df = df.persist()
    _sink().append(df)
    return df


def register(df: DataFrame) -> DataFrame:
    """Register an already-persisted frame for release."""
    _sink().append(df)
    return df


def _drain(frames: list[DataFrame]) -> None:
    while frames:
        try:
            frames.pop().unpersist(blocking=True)
        except Exception:
            pass


@contextmanager
def cache_scope():
    """Capture this thread's registrations and unpersist them at exit.

    Blocking unpersist for the same reason as :func:`release_caches`;
    scopes nest (the innermost active scope owns new registrations)."""
    scope: list[DataFrame] = []
    stack = getattr(_TL, "stack", None)
    if stack is None:
        stack = _TL.stack = []
    stack.append(scope)
    try:
        yield scope
    finally:
        stack.pop()
        _drain(scope)


def release_caches() -> None:
    """Unpersist every GLOBALLY tracked intermediate registered so far
    (frames captured by an active :func:`cache_scope` are that scope's
    to release, not this function's).

    Blocking on purpose: the default async unpersist leaves the old
    blocks in storage memory until a background sweep gets to them, so
    a query sequence that caches per step accumulates stale blocks,
    squeezes execution memory, and shows up as multi-second GC
    evacuation pauses mid-query (measured 7.6s single pauses in a
    50-entry session).  The synchronous drop is block-removal only —
    milliseconds at metadata scale."""
    _drain(_PERSISTED)
