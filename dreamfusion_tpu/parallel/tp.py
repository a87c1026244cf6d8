"""Tensor parallelism (Megatron-style) for the frozen guidance towers.

The reference has no model parallelism of any kind (SURVEY.md §2.4: DDP
only, and even that is dormant).  On TPU the guidance UNet dominates the
step budget (CLAUDE.md gotcha 11), so beyond data parallelism over views
we shard the transformer blocks of the UNet over a `model` mesh axis the
idiomatic XLA way: parameters carry `PartitionSpec`s and activations get
`with_sharding_constraint` hints at the head dimension; the SPMD
partitioner inserts the (ICI-resident) collectives.

Sharding scheme (the classic Megatron split, one psum per block):

  * attention `to_q/to_k/to_v` kernels  [C, heads*hd] → P(None, model)
    (column parallel — each device computes a slice of the heads)
  * attention `to_out` kernel           [heads*hd, C] → P(model, None)
    (row parallel — partial products psum'd by SPMD)
  * GEGLU `proj` kernel                 [C, 2F]       → P(None, model)
  * `ff_out` kernel                     [F, C]        → P(model, None)
  * everything else (convs, norms, time embeds) replicated — or ZeRO-3
    sharded over the data axis by `mesh.fsdp_shard_tree` (composable:
    the two functions touch disjoint leaves).

Activation hint: `shard_heads` constrains [B, N, heads, hd] tensors to
P(None, None, model, None) so the partitioner actually *computes* the
heads shard-local instead of all-gathering the sharded weights.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MODEL_AXIS = "model"

# column-parallel (shard last kernel dim) / row-parallel (shard first)
_COL_NAMES = ("to_q", "to_k", "to_v")
_ROW_NAMES = ("to_out", "ff_out")
_GEGLU_NAMES = ("ff_geglu",)

# process-wide TP context consulted by ops/attention at trace time
_TP: Optional[Tuple[Mesh, str]] = None


def set_tp(mesh: Optional[Mesh], axis: str = MODEL_AXIS) -> None:
    """Enable (or, with mesh=None, disable) head-sharding hints."""
    global _TP
    if mesh is None or axis not in mesh.axis_names or mesh.shape[axis] <= 1:
        _TP = None
    else:
        _TP = (mesh, axis)


def current_tp() -> Optional[Tuple[Mesh, str]]:
    return _TP


@contextmanager
def tp_context(mesh: Optional[Mesh], axis: str = MODEL_AXIS):
    prev = _TP
    set_tp(mesh, axis)
    try:
        yield
    finally:
        globals()["_TP"] = prev


def shard_heads(x: jax.Array) -> jax.Array:
    """Constrain [B, N, heads, hd] to heads-sharded over the model axis.
    No-op when TP is off or heads don't divide."""
    tp = _TP
    if tp is None or x.ndim != 4:
        return x
    mesh, axis = tp
    if x.shape[2] % mesh.shape[axis]:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(None, None, axis, None)))


def shard_rays(x: jax.Array, mesh: Optional[Mesh]) -> jax.Array:
    """Sequence-parallel analog for rendering: shard the flattened ray dim
    over every mesh axis (data-major).  The field tables are replicated,
    so per-ray march/field/composite runs shard-local; SPMD psums the
    table grads.  [R, ...] with R % mesh.size == 0 required (R = B*H*W)."""
    if mesh is None:
        return x
    axes = tuple(a for a in mesh.axis_names if mesh.shape[a] > 1)
    if not axes or x.shape[0] % mesh.size:
        return x
    spec = P(axes, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def _tp_spec_for(path: Tuple[str, ...], x) -> Optional[P]:
    """PartitionSpec for one guidance param leaf, or None (not TP-managed)."""
    if len(path) < 2 or path[-1] != "kernel" or x.ndim != 2:
        return None
    owner = path[-2]
    if owner in _COL_NAMES or owner in _GEGLU_NAMES:
        return P(None, MODEL_AXIS)
    if owner in _ROW_NAMES:
        return P(MODEL_AXIS, None)
    return None


def tp_shard_guidance(mesh: Optional[Mesh], tree, axis: str = MODEL_AXIS):
    """Apply the Megatron layout to every transformer block in a guidance
    param tree.  Leaves that are not TP-managed are left as-is (caller may
    ZeRO-shard or replicate them).  Safe no-op without a model axis."""
    if mesh is None or axis not in mesh.axis_names or mesh.shape[axis] <= 1:
        return tree
    n = mesh.shape[axis]

    def put(path, x):
        names = tuple(getattr(p, "key", getattr(p, "name", str(p)))
                      for p in path)
        spec = _tp_spec_for(names, x)
        if spec is None:
            return x
        # replace the generic MODEL_AXIS marker with the caller's axis
        spec = P(*[axis if s == MODEL_AXIS else s for s in spec])
        dim = 0 if spec[0] == axis else 1
        if x.shape[dim] % n:
            return x
        return jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, tree)
