"""Allocator tuning for hot worker processes.

This sandbox's VM has very slow memory first-touch (~45 MB/s page
zeroing), and glibc serves every >128 KiB allocation with a fresh mmap
— so each large numpy temporary re-faults all its pages.  Raising
M_MMAP_THRESHOLD / M_TRIM_THRESHOLD makes the main arena retain and
reuse pages, turning repeated batch-sized allocations from ~200 ms
into ~15 ms.  Harmless elsewhere; called once per worker/actor.
"""

from __future__ import annotations

import ctypes

_done = False


def tune_allocator() -> None:
    global _done
    if _done:
        return
    _done = True
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD = -1
        M_MMAP_THRESHOLD = -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(M_TRIM_THRESHOLD, 1 << 30)
    except Exception:
        pass
