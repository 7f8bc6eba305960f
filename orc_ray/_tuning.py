"""Allocator tuning for hot numpy kernels under many concurrent workers.

History: round 1's kernels allocated many large int64 temporaries per
encode; on this sandbox's kernel their first-touch page faults serialized
across workers and ``GLIBC_TUNABLES=glibc.malloc.hugetlb=1`` (THP-backed
malloc) recovered ~4x at 24-way concurrency.

Round 2 re-measured after the kernels were rewritten (int32 paths, big-run
mask segmentation, grouped packing — far fewer and smaller temporaries):

    30-way multiprocessing, 2M-token partition encode, per-task seconds
      default glibc:  solo 0.253  30-way 0.284   (~1.1x — near-linear)
      hugetlb=1:      solo 0.298  30-way 1.158   (3.9x degradation)

With the new allocation profile the THP tunable is the bottleneck (huge-
page faults/compaction serialize), while default glibc reaches steady
state and scales almost linearly. So the default is now NO tunables, and
``remote_args()`` actively neutralizes a hugetlb tunable inherited from
older environments. Set ``ORC_RAY_MALLOC_TUNING=hugetlb`` to restore the
old behavior for experiments.
"""

from __future__ import annotations

import os

_OLD_TUNABLE = "glibc.malloc.hugetlb=1"


def _mode() -> str:
    return os.environ.get("ORC_RAY_MALLOC_TUNING", "none")


def ensure_env() -> None:
    """Called at orc_ray import. Default mode: strip the round-1 hugetlb
    tunable if it is the only thing in GLIBC_TUNABLES (i.e. we set it),
    so child processes (ray workers we spawn, subprocesses) run with the
    default allocator."""
    cur = os.environ.get("GLIBC_TUNABLES", "")
    if _mode() == "hugetlb":
        if "hugetlb" not in cur:
            os.environ["GLIBC_TUNABLES"] = (f"{cur}:{_OLD_TUNABLE}" if cur
                                            else _OLD_TUNABLE)
        return
    if cur == _OLD_TUNABLE:
        del os.environ["GLIBC_TUNABLES"]


def env_vars() -> dict[str, str]:
    if _mode() == "hugetlb":
        return {"GLIBC_TUNABLES": os.environ.get("GLIBC_TUNABLES",
                                                 _OLD_TUNABLE)}
    # neutralize an inherited hugetlb tunable in ray workers — but keep any
    # unrelated user-set entries in the colon-separated list (mirroring
    # ensure_env()'s exact-match deletion)
    cur = os.environ.get("GLIBC_TUNABLES", "")
    if "hugetlb" in cur:
        kept = [e for e in cur.split(":") if e and "hugetlb" not in e]
        return {"GLIBC_TUNABLES": ":".join(kept)}
    return {}


def remote_args() -> dict:
    """Extra ray-remote kwargs for heavy map_batches stages."""
    ev = env_vars()
    if not ev:
        return {}
    return {"runtime_env": {"env_vars": ev}}


def prewarm(mib: int | None = None) -> None:
    """Optionally fault heap pages up front (off by default)."""
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
