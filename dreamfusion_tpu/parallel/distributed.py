"""Multi-host (multi-process) runtime: init, rank guards, frame gathers.

The reference's DDP path is dormant — `nerf/utils.py:248-250` wraps the
model in DistributedDataParallel but `main.py` never spawns ranks — yet
its eval loop carries a real `dist.all_gather` of predicted frames
(`nerf/utils.py:1144-1155`) and its logging/ckpt writes are rank-0-guarded
(`utils.py:560-564`, `local_rank == 0`).  Here multi-host is explicit and
TPU-shaped: `initialize()` wires `jax.distributed` (coordinator address +
process id from CLI flags or the DFTPU_* env), after which every chip of
every process joins ONE global mesh — the same `jax.sharding.Mesh` /
SPMD-partitioner path the single-process code already uses, with the
cross-host hops riding DCN collectives XLA inserts.  `gather_frames`
mirrors the reference's eval all_gather; `is_primary()` is the rank guard.

Single-process runs never touch `jax.distributed`: every helper degrades
to a no-op, so the module costs nothing when unused.

Verified end-to-end by tests/test_distributed.py: two CPU processes ×
2 virtual devices each form a 4-device global mesh, run a psum-carrying
jitted program, and round-trip `gather_frames`.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

_initialized = False


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> int:
    """Join the process group.  MUST run before the first jax computation
    (jax.distributed's contract).  Arguments fall back to the env:
    DFTPU_COORDINATOR (host:port), DFTPU_NUM_PROCESSES, DFTPU_PROCESS_ID —
    on real TPU pods all three are omitted and jax's cluster
    auto-detection fills them in.  Returns this process's index."""
    global _initialized
    import jax

    if _initialized:
        return jax.process_index()
    coordinator = coordinator or os.environ.get("DFTPU_COORDINATOR")
    if num_processes is None and "DFTPU_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["DFTPU_NUM_PROCESSES"])
    if process_id is None and "DFTPU_PROCESS_ID" in os.environ:
        process_id = int(os.environ["DFTPU_PROCESS_ID"])
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True
    return jax.process_index()


def maybe_initialize_from_env() -> bool:
    """Auto-init when the launcher exported DFTPU_COORDINATOR (the
    multi-process entry path of dreamfusion_tpu.main)."""
    if os.environ.get("DFTPU_COORDINATOR"):
        initialize()
        return True
    return False


def process_index() -> int:
    import jax
    return jax.process_index()


def process_count() -> int:
    import jax
    return jax.process_count()


def is_primary() -> bool:
    """Rank-0 guard for host-side writes (logs, tensorboard, images,
    videos, checkpoint metadata) — reference mirror utils.py:560-564."""
    return process_index() == 0


def gather_frames(frames: np.ndarray) -> np.ndarray:
    """All-gather per-process eval/test frames so every process (and in
    particular the primary, which writes the video) holds the full set —
    the reference's `dist.all_gather(preds)` (nerf/utils.py:1144-1155).
    `frames`: [n_local, ...] host array; returns [n_procs * n_local, ...]
    stacked in rank order.  Identity when single-process."""
    if process_count() == 1:
        return np.asarray(frames)
    from jax.experimental import multihost_utils
    out = multihost_utils.process_allgather(np.asarray(frames))
    return np.asarray(out).reshape((-1,) + tuple(np.shape(frames)[1:]))


def sync(name: str = "dftpu") -> None:
    """Cross-process barrier (no-op single-process)."""
    if process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)
