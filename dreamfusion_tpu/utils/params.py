"""Parameter utilities: fast host-side init, dtype casting, counting."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

# slab-group transient cap for on-device init (see fast_random_params);
# module-level so tests can shrink it to exercise the multi-group path
_SLAB_GROUP_ELEMS = 128 * 1024 * 1024


def fast_random_params(init_fn, *init_args, seed: int = 0,
                       scale: float = 0.02, dtype=np.float32):
    """Shape-faithful random params WITHOUT compiling the init program.

    `jax.eval_shape` traces init_fn abstractly (no device compute); then the
    pytree is filled with small gaussian values.  For frozen guidance towers
    (SDS never trains them) this is exactly as good as the real flax init
    when no pretrained weights exist — and avoids minutes of XLA-compiling a
    billion-parameter init graph through a remote-compile tunnel.

    On an accelerator backend the fill runs ON DEVICE as one jitted
    program: host-side numpy fill would have to upload the ~4 GB result
    through the tunnel at the measured ~25 MB/s (≈160 s per tower).
    The program generates ONE flat normal slab and static-slices it into
    the leaves — the earlier per-leaf fold_in+normal version compiled to
    a 10-28 MB executable per tower, and first-execution of a program
    through the tunnel costs ~0.5 s per serialized MB
    (scripts/probe_fence_tax.py / probe_buffer_tax.py), so executable
    size IS startup wall-clock.  Pass dtype=jnp.bfloat16 to emit the
    frozen-tower dtype directly and skip the separate cast program.
    On CPU the numpy path is faster and keeps tests deterministic with
    historic values."""
    shapes = jax.eval_shape(init_fn, *init_args)
    if jax.default_backend() != "cpu":
        leaves, treedef = jax.tree_util.tree_flatten(shapes)
        sizes = [int(np.prod(s.shape))
                 if np.issubdtype(s.dtype, np.floating) else 0
                 for s in leaves]
        gdtype = jnp.dtype(dtype)
        # group consecutive leaves into ≤GROUP_ELEMS slabs: ONE flat slab
        # for the whole tower peaked at params + slab = 2× tower bytes,
        # which RESOURCE_EXHAUSTED'd the 4.2B-param IF tower on a 16 GB
        # chip (slab 8.4 GB + leaves 8.4 GB); per-group slabs cap the
        # transient at ~256 MB while keeping one tiny program
        groups, cur, cur_n = [], [], 0
        for i, n in enumerate(sizes):
            if cur and cur_n + n > _SLAB_GROUP_ELEMS:
                groups.append(cur)
                cur, cur_n = [], 0
            cur.append(i)
            cur_n += n
        if cur:
            groups.append(cur)

        @jax.jit
        def gen(key):
            out = [None] * len(leaves)
            prev = None   # serializes groups: without a data dependency
            # XLA may schedule every group's slab before any slicing,
            # recreating the full-tower transient this chunking removes
            for gi, idxs in enumerate(groups):
                total_g = sum(sizes[i] for i in idxs)
                if total_g:
                    k = jax.random.fold_in(key, gi)
                    if prev is not None:
                        k = jax.lax.optimization_barrier((k, prev))[0]
                    slab = jax.random.normal(k, (total_g,), gdtype) * \
                        jnp.asarray(scale, gdtype)
                off = 0
                for i in idxs:
                    s = leaves[i]
                    if sizes[i]:
                        out[i] = jax.lax.slice(
                            slab, (off,), (off + sizes[i],)).reshape(s.shape)
                        off += sizes[i]
                        prev = out[i]
                    else:
                        out[i] = jnp.zeros(s.shape, s.dtype)
            return out
        return jax.tree_util.tree_unflatten(
            treedef, gen(jax.random.PRNGKey(seed)))

    rng = np.random.default_rng(seed)

    def fill(s):
        if np.issubdtype(s.dtype, np.floating):
            return (rng.standard_normal(s.shape) * scale).astype(dtype)
        return np.zeros(s.shape, s.dtype)

    return jax.tree.map(fill, shapes)


def cast_f32_fused(tree, dtype):
    """Cast every f32 leaf of `tree` to `dtype`.  If the leaves already
    live on an accelerator the cast runs as ONE jitted program (per-leaf
    eager astype = ~1 tunnel dispatch per leaf, ~700 for an SD tower);
    host numpy trees are cast in place host-side (cheaper to ship
    2 bytes/param than 4 on the eventual upload)."""
    def _cast(t):
        return jax.tree.map(
            lambda x: x.astype(dtype)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)

    leaves = jax.tree_util.tree_leaves(tree)
    if not any(hasattr(l, "dtype") and l.dtype == jnp.float32
               for l in leaves):
        # nothing to cast (towers already generated in bf16): skip the
        # jitted identity program — even a no-op with ~1100 arg/result
        # buffers costs seconds of first-execution handle setup through
        # the tunnel (scripts/probe_buffer_tax.py)
        return tree
    # ANY device leaf selects the fused path: a mixed tree (first leaf
    # host numpy, later towers already on device) must not fall back to the
    # per-leaf eager storm this helper exists to avoid (ADVICE r3)
    if any(isinstance(l, jax.Array) for l in leaves) and \
            jax.default_backend() != "cpu":
        return jax.jit(_cast)(tree)
    return _cast(tree)


def cast_floating(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x, tree)


def count_params(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def save_params_npz(path: str, tree):
    """Flatten a params pytree to an .npz keyed by '/'-joined paths."""
    flat = {}
    for kp, leaf in jax.tree_util.tree_leaves_with_path(tree):
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                       for k in kp)
        flat[key] = np.asarray(leaf)
    np.savez(path, **flat)


def load_params_npz(path: str, template):
    """Inverse of save_params_npz: fill `template`'s structure from the
    npz; missing keys keep the template's values, shape mismatches raise."""
    data = np.load(path)

    def lookup(kp, leaf):
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                       for k in kp)
        if key not in data.files:
            return leaf
        arr = data[key]
        if arr.shape != tuple(leaf.shape):
            raise ValueError(f"{key}: npz shape {arr.shape} != template "
                             f"{tuple(leaf.shape)}")
        return jnp.asarray(arr)

    return jax.tree_util.tree_map_with_path(lookup, template)


def maybe_load_params(root: str, name: str, template):
    """Load `<root>/<name>.npz` into template if present, else return the
    template unchanged (zero-egress-friendly weight plumbing)."""
    import os
    path = os.path.join(root, f"{name}.npz") if os.path.isdir(root) else root
    if os.path.exists(path):
        return load_params_npz(path, template)
    return template
