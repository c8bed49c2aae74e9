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

from enum import Enum


class WriteConsistency(str, Enum):
    AGGRESSIVE = "AGGRESSIVE"
    RELAXED = "RELAXED"


#: Default mirrors the reference default (``hadro/config.py:24``).
WRITE_CONSISTENCY: WriteConsistency = WriteConsistency.RELAXED
