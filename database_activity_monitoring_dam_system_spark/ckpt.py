"""Explicit lifecycle for gate-local ``localCheckpoint`` blocks.

``DataFrame.localCheckpoint`` stores its partitions in executor
storage; the blocks are reclaimed only when the JVM garbage-collects
the RDD reference and the ContextCleaner gets around to it — a
nondeterministic lifetime. Within one query that is fine; across a
long-lived session that runs hundreds of queries (the bench, a serving
driver, a streaming fold) the not-yet-reclaimed blocks of finished
queries tax the block manager and the old-gen heap of every later
query (guide §5: bound the lifetime; unpersist when done).

This module makes the lifetime explicit without changing any plan:

* Operators create *gate-local* checkpoints — frames whose only
  consumers live inside the query they were built for — through
  :func:`checkpoint` instead of calling ``localCheckpoint`` directly.
* A harness that knows when the consuming action has finished frees
  them: either wrap build+action in a :func:`scope` block, or (the
  bench pattern, where construction and the timed action are separate
  call sites) set ``SPARK_DAM_CKPT_SCOPE=1`` and call :func:`release`
  after each query's action completes.

Registration is OFF unless a scope is active or the env flag is set:
a library caller that never releases must not accumulate py4j
references that would *block* the ContextCleaner's normal GC-driven
reclaim — the default behaviour is exactly today's.

Safety: a localCheckpoint severs lineage, so a released frame cannot
be recomputed — re-evaluating it after :func:`release` fails loudly
(missing block) rather than silently recomputing. Release therefore
runs strictly AFTER the consuming action, and frames that outlive the
query — serving caches, ``_shared`` materialized views, streaming
state carried across micro-batches — must never be registered (see
:func:`suppressed`, used by the ``_shared`` builder).
"""

from __future__ import annotations

import os
import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame

_STATE = threading.local()


def _pending() -> list:
    if not hasattr(_STATE, "pending"):
        _STATE.pending = []
    return _STATE.pending


def _depth() -> int:
    return getattr(_STATE, "depth", 0)


def _suppress() -> int:
    return getattr(_STATE, "suppress", 0)


def _active() -> bool:
    if _suppress() > 0:
        return False
    return _depth() > 0 or os.environ.get("SPARK_DAM_CKPT_SCOPE") == "1"


def register(df: DataFrame) -> DataFrame:
    """Register an already-checkpointed frame with the active scope
    (chain form: ``.localCheckpoint(...).transform(ckpt.register)``).
    No-op passthrough when no scope is active."""
    if _active():
        try:
            # the checkpoint Dataset's logical plan IS the LogicalRDD
            # wrapping the checkpointed RDD — the handle unpersist
            # needs. Any failure here falls back to GC reclaim.
            _pending().append(df._jdf.queryExecution().logical().rdd())
        except Exception:
            pass
    return df


def checkpoint(df: DataFrame, eager: bool = False) -> DataFrame:
    """``df.localCheckpoint(eager=eager)`` whose storage blocks the
    active scope (if any) will free deterministically. Identical to a
    plain localCheckpoint when no scope is active."""
    return register(df.localCheckpoint(eager=eager))


def release(blocking: bool = False) -> int:
    """Unpersist every checkpoint registered on this thread since the
    last release. Call only after the consuming action completed — a
    released checkpoint cannot be recomputed."""
    pending = _pending()
    n = 0
    while pending:
        jrdd = pending.pop()
        try:
            jrdd.unpersist(blocking)
            n += 1
        except Exception:
            pass
    return n


def unpersist(df: DataFrame, blocking: bool = False) -> bool:
    """Free the storage blocks of a checkpointed frame directly —
    for the write-path pattern where the checkpoint is created and
    fully consumed (written out) inside one function, so the release
    point is known without a scope. ``df`` must be the frame a
    ``localCheckpoint``/:func:`checkpoint` call returned; returns
    False (and leaves reclaim to GC) if the handle is unreachable."""
    try:
        df._jdf.queryExecution().logical().rdd().unpersist(blocking)
        return True
    except Exception:
        return False


@contextmanager
def scope(blocking: bool = False):
    """Activate registration for the block; on exit, release every
    checkpoint created inside it. The consuming action must run
    INSIDE the block (the streaming foreachBatch pattern: fold, write,
    promote, then the scope frees the batch's checkpoints)."""
    _STATE.depth = _depth() + 1
    try:
        yield
    finally:
        _STATE.depth = _depth() - 1
        release(blocking)


@contextmanager
def suppressed():
    """Temporarily disable registration — for builds whose checkpoints
    outlive the current query (``_shared`` materialized views, serving
    caches): their blocks must survive until the cached frame itself
    is dropped, so they stay on the default GC-reclaim lifetime."""
    _STATE.suppress = _suppress() + 1
    try:
        yield
    finally:
        _STATE.suppress = _suppress() - 1
