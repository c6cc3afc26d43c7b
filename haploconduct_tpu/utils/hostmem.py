"""Host allocator tuning for the pipeline's large-array churn.

The host phases stream multi-million-row NumPy arrays (candidate columns,
scoring-task streams, consensus scatter buffers). glibc malloc serves every
allocation above M_MMAP_THRESHOLD (128KB default) with a fresh mmap and
munmaps it on free, so each temporary pays a full page-fault sweep — on
lazily-faulted VM memory (Firecracker/UFFD-style hosts, where this pipeline
runs next to a tunneled TPU) that is ~4us/page, turning a 24MB temporary
into ~100ms of kernel time. Measured on this host: `a + 1` over 3M int64
costs 168ms with fresh mmaps and 3.5ms once the buffer comes from the
reusable heap (48x).

tune_allocator() raises M_MMAP_THRESHOLD and M_TRIM_THRESHOLD so large
buffers are carved from the brk heap, stay mapped after free, and are
reused across the pipeline's iterations. The trade-off is that peak heap
is retained for the process lifetime — the right call for a batch
assembler. Opt out with HC_NO_MALLOC_TUNE=1.

(The reference sidesteps this cost class by being one long-lived C++
process with std::vector reuse; a rebuilt Python/NumPy pipeline has to
make the allocator cooperate instead.)
"""

from __future__ import annotations

import os

_done = False

# glibc mallopt parameter codes (malloc.h)
_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3


def tune_allocator(threshold: int = 1 << 30) -> bool:
    """Idempotent; returns True when the glibc knobs were set."""
    global _done
    if _done:
        return True
    if os.environ.get("HC_NO_MALLOC_TUNE") == "1":
        return False
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok = bool(libc.mallopt(_M_TRIM_THRESHOLD, threshold)) and bool(
            libc.mallopt(_M_MMAP_THRESHOLD, threshold)
        )
        _done = ok
        return ok
    except Exception:
        return False
