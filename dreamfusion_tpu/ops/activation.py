"""Density activations (reference activation.py:5-21)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x):
    """exp with the backward-pass input clamped at 15 to avoid fp blowup
    (reference activation.py:5-18)."""
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.minimum(x, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


def biased_softplus(x, bias: float = 0.0):
    """Reference activation.py:20-21."""
    return jax.nn.softplus(x - bias)


def density_activation(name: str):
    if name == "exp":
        return trunc_exp
    if name == "softplus":
        return lambda x: biased_softplus(x, bias=-1.0)
    raise ValueError(f"unknown density activation {name!r}")
