"""Device mesh + sharding rules.

Replaces the reference's dormant DDP path (nerf/utils.py:248-250 wraps in
DistributedDataParallel but main.py never spawns ranks; SURVEY.md §2.4).
Here multi-chip is first-class: a `jax.sharding.Mesh` over ICI, the view
batch sharded on the `data` axis, parameters replicated, and gradient
psums inserted by XLA (the SPMD partitioner is the NCCL-allreduce
equivalent — no hand-written collectives needed for DP).

`shard_batch` applies sharding constraints inside the jitted step so the
pose-synthesis → render → guidance pipeline stays partitioned end-to-end
instead of being resharded at function boundaries.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axes: Tuple[str, ...] = (DATA_AXIS,),
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),)
    dev_array = np.asarray(devices[: int(np.prod(shape))]).reshape(shape)
    return Mesh(dev_array, axes)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(mesh: Optional[Mesh], tree):
    """Constrain every array's leading axis to the data axis (inside jit)."""
    if mesh is None:
        return tree

    def c(x):
        if x.ndim == 0:
            return x
        spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    return jax.tree.map(c, tree)


def replicate_tree(mesh: Optional[Mesh], tree):
    if mesh is None:
        return tree
    return jax.device_put(tree, replicated(mesh))


def fsdp_shard_tree(mesh: Optional[Mesh], tree, min_size: int = 1 << 16,
                    axis: str = DATA_AXIS):
    """FSDP-style weight sharding for frozen guidance towers (SURVEY §2.4:
    'UNet weights replicated … or FSDP-style sharded if IF-XL is large').

    Each large leaf is sharded along its largest mesh-divisible dimension;
    small/indivisible leaves replicate.  The XLA SPMD partitioner inserts
    the all-gathers at use sites — the ZeRO-3 pattern with zero manual
    collectives.  Cuts per-device HBM for the ~1-2 GB frozen towers by
    ~n_devices at the cost of gather traffic each step (ICI-bound)."""
    if mesh is None:
        return tree
    n = mesh.shape[axis]

    def put(x):
        x = jnp.asarray(x)
        if x.size < min_size or x.ndim == 0:
            return jax.device_put(x, replicated(mesh))
        dims = sorted(range(x.ndim), key=lambda d: -x.shape[d])
        for d in dims:
            if x.shape[d] % n == 0:
                spec = [None] * x.ndim
                spec[d] = axis
                return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, replicated(mesh))

    return jax.tree.map(put, tree)
