"""Allocator tuning for hot numpy kernels under many concurrent workers.

On this sandbox's kernel (and many virtualized hosts) first-touch page
faults are expensive and serialize across processes: an allocation-heavy
numpy workload running 24-way measures ~6x slower per task than solo, while
in-place (no-allocation) numpy scales linearly. Since every numpy temporary
is a fresh >128 KiB mmap under default glibc, codec kernels hit this hard.

Measured fix: ``GLIBC_TUNABLES=glibc.malloc.hugetlb=1`` (glibc >= 2.35)
makes malloc madvise(THP) its mmaps/heap, cutting fault counts ~512x:
24-way probe mean 3.45s -> 0.86s (solo 0.6s).

Two application points:
- ``ensure_env()``: sets the env var in this process so every child
  (ray workers when WE call ray.init, subprocesses) inherits it.
  Called at orc_ray import.
- ``remote_args()``: merge into ``map_batches(... **remote_args())`` so
  driver-owned Ray sessions (where ray.init happened before orc_ray was
  imported) spawn the stage's workers with the tunable via runtime_env.
"""

from __future__ import annotations

import os

_TUNABLE = "glibc.malloc.hugetlb=1"
_need_runtime_env = False


def ensure_env() -> None:
    """Export the tunable; note whether Ray workers can still inherit it
    (they do iff ray.init happens after this export)."""
    global _need_runtime_env
    if os.environ.get("ORC_RAY_NO_MALLOC_TUNING"):
        return
    cur = os.environ.get("GLIBC_TUNABLES", "")
    if "hugetlb" not in cur:
        os.environ["GLIBC_TUNABLES"] = f"{cur}:{_TUNABLE}" if cur else _TUNABLE
        try:
            import ray

            _need_runtime_env = ray.is_initialized()
        except Exception:
            _need_runtime_env = False


def env_vars() -> dict[str, str]:
    if os.environ.get("ORC_RAY_NO_MALLOC_TUNING"):
        return {}
    return {"GLIBC_TUNABLES": os.environ.get("GLIBC_TUNABLES", _TUNABLE)}


def remote_args() -> dict:
    """Extra ray-remote kwargs for heavy map_batches stages (map_batches
    forwards unknown kwargs to the underlying actors/tasks)."""
    ev = env_vars()
    if not ev or not _need_runtime_env:
        return {}
    return {"runtime_env": {"env_vars": ev}}


def prewarm(mib: int | None = None) -> None:
    """Optionally fault heap pages up front (off by default; the hugetlb
    tunable makes this mostly unnecessary)."""
    if mib is None:
        mib = int(os.environ.get("ORC_RAY_PREWARM_MIB", "0"))
    if mib <= 0:
        return
    try:
        import numpy as np

        block = np.empty(mib * 1024 * 1024 // 8, dtype=np.int64)
        block[::512] = 1
        del block
    except Exception:
        pass
