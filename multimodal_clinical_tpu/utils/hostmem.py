"""Host allocator tuning for lazy-memory VMs.

This image's VM serves first-touch page faults at ~0.5 ms/page (lazily
loaded guest memory).  glibc mmap()s every allocation above the dynamic
threshold and munmap()s it on free, so each data batch's large numpy
arrays (frame stacks, spectrograms) fault in fresh pages every single
iteration — measured 8.5 s for one 66 MB ``np.stack`` vs 25 ms from a
warm arena, throttling the host data path to ~14 samples/s.

``warm_heap()`` turns off glibc's mmap path (M_MMAP_MAX=0) and heap
trimming (M_TRIM_THRESHOLD=-1) so large buffers are served from the
brk arena, which stays warm across free/alloc cycles.  Call once at
process start (bench.py, main.py, Loader do).  No-op on failure.
"""

from __future__ import annotations

_done = False


def warm_heap() -> bool:
    global _done
    if _done:
        return True
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_MAX = -1, -4
        ok = bool(libc.mallopt(M_MMAP_MAX, 0))
        ok = bool(libc.mallopt(M_TRIM_THRESHOLD, -1)) and ok
        _done = ok
        return ok
    except Exception:
        return False
