"""Diffusion noise schedules + DDIM stepping in pure jnp.

Replaces the reference's use of `diffusers.DDIMScheduler`
(/root/reference/guidance/sd_utils.py:65-72, zero123_utils.py:75-87) with a
~60-line static-shape implementation: precomputed alpha_cumprod tables,
`add_noise` for SDS, and a DDIM update for the standalone txt2img /
novel-view sampling CLIs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class NoiseSchedule:
    """Variance schedule with precomputed cumulative products."""
    betas: np.ndarray            # [T]
    alphas_cumprod: np.ndarray   # [T]

    @property
    def num_train_timesteps(self) -> int:
        return len(self.betas)

    @staticmethod
    def scaled_linear(beta_start: float = 0.00085, beta_end: float = 0.012,
                      T: int = 1000) -> "NoiseSchedule":
        """SD's "scaled_linear": linear in sqrt(beta). The zero123 ldm config
        (linear 8.5e-4→1.2e-2 in ldm terms) is the same schedule
        (SURVEY.md Appendix A)."""
        betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5, T,
                            dtype=np.float64) ** 2
        return NoiseSchedule(betas.astype(np.float32),
                             np.cumprod(1.0 - betas).astype(np.float32))

    @staticmethod
    def linear(beta_start: float = 0.0001, beta_end: float = 0.02,
               T: int = 1000) -> "NoiseSchedule":
        betas = np.linspace(beta_start, beta_end, T, dtype=np.float64)
        return NoiseSchedule(betas.astype(np.float32),
                             np.cumprod(1.0 - betas).astype(np.float32))

    @staticmethod
    def squaredcos_cap_v2(T: int = 1000) -> "NoiseSchedule":
        """Cosine schedule (DeepFloyd-IF)."""
        def f(t):
            return np.cos((t / T + 0.008) / 1.008 * np.pi / 2) ** 2
        t = np.arange(T, dtype=np.float64)
        betas = np.clip(1 - f(t + 1) / f(t), 0, 0.999)
        return NoiseSchedule(betas.astype(np.float32),
                             np.cumprod(1.0 - betas).astype(np.float32))

    # ---- jnp views ------------------------------------------------------
    def alphas_cumprod_jnp(self) -> jax.Array:
        return jnp.asarray(self.alphas_cumprod)

    def add_noise(self, x0: jax.Array, noise: jax.Array,
                  t: jax.Array) -> jax.Array:
        """q(x_t | x_0) sample; t: int [B] broadcast over trailing dims."""
        ac = jnp.asarray(self.alphas_cumprod)[t]
        shape = (-1,) + (1,) * (x0.ndim - 1)
        sqrt_ac = jnp.sqrt(ac).reshape(shape)
        sqrt_1mac = jnp.sqrt(1.0 - ac).reshape(shape)
        return sqrt_ac * x0 + sqrt_1mac * noise

    def predict_start_from_noise(self, x_t: jax.Array, t: jax.Array,
                                 noise: jax.Array) -> jax.Array:
        ac = jnp.asarray(self.alphas_cumprod)[t]
        shape = (-1,) + (1,) * (x_t.ndim - 1)
        return (x_t - jnp.sqrt(1.0 - ac).reshape(shape) * noise) / jnp.sqrt(
            ac).reshape(shape)

    def ddim_step(self, x_t: jax.Array, eps: jax.Array, t: jax.Array,
                  t_prev: jax.Array, eta: float = 0.0,
                  key: jax.Array | None = None) -> jax.Array:
        """One deterministic (eta=0) DDIM update t → t_prev."""
        ac = jnp.asarray(self.alphas_cumprod)
        a_t = ac[t]
        a_prev = jnp.where(t_prev >= 0, ac[jnp.maximum(t_prev, 0)], 1.0)
        shape = (-1,) + (1,) * (x_t.ndim - 1)
        a_t = a_t.reshape(shape)
        a_prev = a_prev.reshape(shape)
        x0 = (x_t - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
        sigma = eta * jnp.sqrt((1 - a_prev) / (1 - a_t)) * jnp.sqrt(
            1 - a_t / a_prev)
        dir_xt = jnp.sqrt(jnp.maximum(1 - a_prev - sigma ** 2, 0.0)) * eps
        out = jnp.sqrt(a_prev) * x0 + dir_xt
        if eta > 0:
            assert key is not None
            out = out + sigma * jax.random.normal(key, x_t.shape)
        return out


def make_schedule(name: str, T: int = 1000) -> NoiseSchedule:
    if name in ("scaled_linear", "sd", "zero123"):
        return NoiseSchedule.scaled_linear(T=T)
    if name == "linear":
        return NoiseSchedule.linear(T=T)
    if name in ("squaredcos_cap_v2", "if"):
        return NoiseSchedule.squaredcos_cap_v2(T=T)
    raise ValueError(f"unknown schedule {name!r}")
