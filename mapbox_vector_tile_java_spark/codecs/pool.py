"""Per-process scratch-buffer pool for hot codec kernels.

This sandbox (like thin-provisioned cloud VMs) services first-touch page
faults at ~150 MB/s while reused heap pages run at 6-10 GB/s (measured, a
40x cliff). Numpy expression chains allocate fresh odd-sized temporaries
every call, so steady-state kernels stay fault-bound. The fix: named,
grow-only scratch buffers reused across calls, with ``out=`` ufunc forms.

Spark reuses python workers (spark.python.worker.reuse), so each executor
worker pays the pre-fault exactly once per buffer size class and then runs
at full memory bandwidth for every subsequent Arrow batch.

Reference analog: the encoder pre-sizes its command buffers from exact
output-size formulas instead of growing them per feature
(JtsAdapter.java:315-330) — same discipline, process-lifetime scope.
"""

from __future__ import annotations

import threading

import numpy as np

_TLS = threading.local()


def _pool() -> dict[str, np.ndarray]:
    p = getattr(_TLS, "pool", None)
    if p is None:
        p = _TLS.pool = {}
    return p


def pbuf(name: str, n: int, dtype=np.uint8) -> np.ndarray:
    """A reusable scratch array of ``n`` elements of ``dtype``.

    Contents are arbitrary (caller must fill). Grow-only, power-of-two
    capacity; pages are pre-faulted on (re)allocation so the one-time cost
    never lands inside a timed kernel region. Thread-local: the driver-side
    planner runs codec trials on several columns concurrently (executor
    python workers are single-threaded, so there the pool is per-process
    as before).
    """
    dt = np.dtype(dtype)
    need = int(n) * dt.itemsize
    pool = _pool()
    a = pool.get(name)
    if a is None or a.nbytes < need:
        cap = 1 << max(20, (need - 1).bit_length())
        a = np.empty(cap, dtype=np.uint8)
        a[:: 4096] = 0  # pre-fault every page
        pool[name] = a
    return a[:need].view(dt)


def pool_clear() -> None:
    _pool().clear()
