"""Training schedules as pure functions of the step index.

The reference *mutates its config* during training (progressive view ranges,
nerf/utils.py:459-472; encoder max_level, :471-472) and draws Python
`random.random()` per step (:516-535).  Here every schedule is a pure
function of (step, key) returning traced values, so the whole per-step
stochastic schedule lives inside the one jitted train step.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..models.nerf import SHADING_LAMBERTIAN, SHADING_NORMAL, SHADING_TEXTURELESS, SHADING_ALBEDO


def iter_ratio(step: jax.Array, start: int, end: int) -> jax.Array:
    return (step - start) / jnp.maximum(end - start, 1)


def progressive_view_ranges(cfg: Config, r_exp: jax.Array):
    """Linearly expand pose-sampling ranges from the default view
    (nerf/utils.py:459-468). Returns traced (radius, theta, phi, fovy)
    range pairs."""
    r = jnp.minimum(1.0, cfg.progressive_view_init_ratio + 2.0 * r_exp)

    def lerp_range(default, full):
        return (default * (1 - r) + full[0] * r,
                default * (1 - r) + full[1] * r)

    return (
        lerp_range(cfg.default_radius, cfg.radius_range),
        lerp_range(cfg.default_polar, cfg.theta_range),
        lerp_range(cfg.default_azimuth, cfg.phi_range),
        lerp_range(cfg.default_fovy, cfg.fovy_range),
    )


def encoder_max_level(cfg: Config, r_exp: jax.Array) -> Optional[jax.Array]:
    """min(1, 0.25 + 2*ratio) (nerf/utils.py:471-472)."""
    if not cfg.progressive_level:
        return None
    return jnp.minimum(1.0, 0.25 + 2.0 * r_exp)


def lambda_entropy_at(cfg: Config, step: jax.Array) -> jax.Array:
    return cfg.lambda_entropy * jnp.minimum(1.0, 2.0 * step / cfg.iters)


def lambda_normal_at(cfg: Config, step: jax.Array) -> jax.Array:
    return cfg.lambda_normal * jnp.minimum(1.0, step / cfg.iters)


def lambda_depth_at(cfg: Config, step: jax.Array) -> jax.Array:
    return cfg.lambda_depth * jnp.minimum(1.0, step / cfg.iters)


def lambda_tv_at(cfg: Config, step: jax.Array) -> jax.Array:
    return cfg.lambda_tv * jnp.minimum(1.0, step / (0.5 * cfg.iters))


class StepChoices(NamedTuple):
    """Per-step stochastic rendering choices (nerf/utils.py:503-535)."""
    ambient_ratio: jax.Array    # scalar
    shading: jax.Array          # traced int shading id
    bg_color: jax.Array         # [3] random single color
    use_bg_net: jax.Array       # bool: render with bg MLP instead
    light_noise: jax.Array      # [3] light-direction jitter


def sample_step_choices(cfg: Config, key: jax.Array,
                        r_exp: jax.Array) -> StepChoices:
    k_amb, k_shade, k_bg, k_bgc, k_light = jax.random.split(key, 5)
    in_albedo_phase = r_exp <= cfg.albedo_iter_ratio

    ambient = cfg.min_ambient_ratio + (1.0 - cfg.min_ambient_ratio) * \
        jax.random.uniform(k_amb, ())
    ambient = jnp.where(in_albedo_phase, 1.0, ambient)

    textureless = jax.random.uniform(k_shade, ()) >= (1.0 - cfg.textureless_ratio)
    shading = jnp.where(textureless, SHADING_TEXTURELESS, SHADING_LAMBERTIAN)
    shading = jnp.where(in_albedo_phase, SHADING_ALBEDO, shading)

    use_bg_net = (jax.random.uniform(k_bg, ()) > 0.5) & (cfg.bg_radius > 0)
    bg_color = jax.random.uniform(k_bgc, (3,))
    light_noise = jax.random.normal(k_light, (3,))
    return StepChoices(ambient, shading, bg_color, use_bg_net, light_noise)
