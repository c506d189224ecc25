"""Shared gather/scatter kernels + process heap warmup.

``multi_range``/``gather_runs`` implement the concat-of-slices pattern
(output = pool[s_i : s_i+l_i] for each run i) with a single cumsum instead
of the repeat+arange+add triple — 2 large temporaries instead of 4. In this
sandbox (and on thin-provisioned cloud VMs generally) first-touch page
faults dominate large-temp numpy code, so temp count is the constant that
matters.

``warm_heap`` pre-faults a block of pages once per process. Spark reuses
python workers, so each worker pays this once; combined with the malloc
tunables in session.py the pages are never returned to the OS.
"""

from __future__ import annotations

import os

import numpy as np

_WARMED = 0


def warm_heap(nbytes: int | None = None) -> None:
    """Pre-fault ``nbytes`` of heap. No-op unless MVT_SPARK_WARM_BYTES is set
    (or nbytes passed): with the malloc tunables from session.py the heap is
    retained anyway, so first-touch cost is paid exactly once per page either
    way — eager warmup only helps steady-state benchmarks."""
    global _WARMED
    nbytes = nbytes or int(os.environ.get("MVT_SPARK_WARM_BYTES", "0"))
    if nbytes <= 0 or _WARMED >= nbytes:
        return
    block = np.zeros(nbytes, dtype=np.uint8)
    block[::4096] = 1
    del block
    _WARMED = nbytes


def multi_range(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Concatenation of [s, s+1, ..., s+l-1] for each (s, l) pair, one cumsum.

    WARNING: returns a pooled scratch buffer that is only valid until the
    next multi_range call in this process — use it immediately as a fancy
    index (which copies) and do not hold a reference across calls.
    """
    lens = np.ascontiguousarray(lens, dtype=np.int64)
    nz = lens > 0
    if not nz.all():
        starts, lens = starts[nz], lens[nz]
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    from .pool import pbuf

    d = pbuf("gather.mr", total, np.int64)
    d.fill(1)
    heads = np.cumsum(lens) - lens
    d[0] = starts[0]
    if len(starts) > 1:
        d[heads[1:]] = starts[1:] - (starts[:-1] + lens[:-1] - 1)
    np.cumsum(d, out=d)
    ro = d.view()
    ro.setflags(write=False)  # misuse (holding across calls) fails loudly
    return ro


def gather_runs(pool: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """pool bytes gathered as the concatenation of per-run slices."""
    return pool[multi_range(starts, lens)]
