"""Write-consistency policy — parity with the reference's fsync modes.

Reference: ``/root/reference/hadro/config.py:5-24`` defines ``AGGRESSIVE``
(fsync after every write, durable, ~10x slower) and ``RELAXED`` (OS-managed
flushes, default). On Spark the analog is commit granularity:

- ``AGGRESSIVE`` — every ``append()`` call is its own atomic Parquet commit
  (a new segment file becomes visible immediately; durable on return).
- ``RELAXED`` — appends are buffered in the driver and written as one
  batched commit on ``flush()`` / ``close()`` (fewer, larger segment files —
  the right default at scale: many tiny files are the Spark anti-pattern
  that per-write fsync is in Bitcask).
"""

from __future__ import annotations

import os
import tempfile
from enum import Enum

#: Env override for the engine scratch root (stream fixtures, checkpoint
#: dirs, staging copies).  See :func:`scratch_dir`.
SCRATCH_ENV = "SPARK_GRAFT_SCRATCH_DIR"

_scratch_cache: str | None = None


def scratch_dir() -> str:
    """Root directory for re-derivable engine scratch state.

    Covers streaming checkpoint dirs (offset/commit logs + state-store
    deltas — many tiny fsync'd files per micro-batch), stream-fixture
    rewrites, and per-invocation staging copies.  All of it is rebuilt
    on demand from the parquet inputs, so durability across reboots is
    not required — which makes a RAM-backed filesystem the right home:
    the cost of this state is per-file create/rename/fsync latency, not
    bandwidth (measured on the local ext4 /tmp: the HDFS state store's
    per-batch commit latency dominates the bounded streaming rows'
    wall time; guide §6 — put shuffle-class scratch on the fastest
    local device).  On a production cluster the analog is the node's
    NVMe scratch volume.

    Resolution order: ``$SPARK_GRAFT_SCRATCH_DIR`` if set, else
    ``/dev/shm`` when it is a writable directory, else the system temp
    dir.  The chosen root is created (with a namespacing subdir for the
    tmpfs case) and cached for the process lifetime.
    """
    global _scratch_cache
    if _scratch_cache is not None:
        return _scratch_cache
    root = os.environ.get(SCRATCH_ENV)
    if not root:
        shm = "/dev/shm"
        if os.path.isdir(shm) and os.access(shm, os.W_OK):
            root = os.path.join(shm, "hadrodb_spark_scratch")
        else:
            root = tempfile.gettempdir()
    os.makedirs(root, exist_ok=True)
    _scratch_cache = root
    return root


class WriteConsistency(str, Enum):
    AGGRESSIVE = "AGGRESSIVE"
    RELAXED = "RELAXED"


#: Default mirrors the reference default (``hadro/config.py:24``).
WRITE_CONSISTENCY: WriteConsistency = WriteConsistency.RELAXED
