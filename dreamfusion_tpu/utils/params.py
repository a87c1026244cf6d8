"""Parameter utilities: fast host-side init, dtype casting, counting."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def fast_random_params(init_fn, *init_args, seed: int = 0,
                       scale: float = 0.02, dtype=np.float32):
    """Shape-faithful random params WITHOUT compiling the init program.

    `jax.eval_shape` traces init_fn abstractly (no device compute), then the
    pytree is filled host-side with small gaussian values.  For frozen
    guidance towers (SDS never trains them) this is exactly as good as the
    real flax init when no pretrained weights exist — and avoids minutes of
    XLA-compiling a billion-parameter init graph through a remote-compile
    tunnel."""
    shapes = jax.eval_shape(init_fn, *init_args)
    rng = np.random.default_rng(seed)

    def fill(s):
        if np.issubdtype(s.dtype, np.floating):
            return (rng.standard_normal(s.shape) * scale).astype(dtype)
        return np.zeros(s.shape, s.dtype)

    return jax.tree.map(fill, shapes)


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
