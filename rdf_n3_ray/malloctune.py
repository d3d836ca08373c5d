"""glibc malloc tuning for allocation-latency-hostile hosts.

This sandbox's hypervisor exhibits episodes where FIRST-TOUCH page
faults run two orders of magnitude slow (measured: the same 200 MB
numpy allocation oscillating 0.1 s <-> 20 s while pure-CPU work reads
normal).  glibc's default M_TRIM_THRESHOLD returns freed pages to the
OS and M_MMAP_THRESHOLD serves large allocations from fresh mmaps, so
every big numpy temporary re-faults its pages — batch kernels that
should take milliseconds stall for seconds.

`tune_malloc()` raises both thresholds so large allocations come from
the (already-faulted, reused) main heap: after one warm-up fault the
process stops paying first-touch latency.  Costs only held RSS; on a
128 GiB box running data pipelines that trade is always right.  It
also exports MALLOC_*_ env vars so processes started AFTER the call
(Ray's raylet and its workers in local mode) inherit the tuning.
"""
from __future__ import annotations

import os

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3
_THRESHOLD = 1 << 30


def tune_malloc(prefault_mb: int = 0) -> bool:
    """Apply malloc tuning to THIS process and the environment of its
    future children.  Returns True when mallopt took effect (glibc);
    silently no-ops elsewhere.  `prefault_mb` optionally pays the
    one-time heap fault up front (untimed) instead of inside the first
    workload allocation."""
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(_THRESHOLD))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(_THRESHOLD))
    ok = False
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok = bool(libc.mallopt(_M_MMAP_THRESHOLD, _THRESHOLD)) and \
            bool(libc.mallopt(_M_TRIM_THRESHOLD, _THRESHOLD))
    except Exception:
        return False
    if ok and prefault_mb > 0:
        import numpy as np

        buf = np.ones(prefault_mb * 131072)  # 8-byte elems -> MB
        del buf
    return ok
