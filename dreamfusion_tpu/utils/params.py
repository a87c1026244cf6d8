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
