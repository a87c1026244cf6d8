"""NeRF field networks (grid + vanilla backbones).

TPU-native re-implementation of /root/reference/nerf/network_grid.py and
/root/reference/nerf/network.py as Flax modules:

  * grid backbone: multires hash encoding (ops/hashgrid.py) → 3×64 ReLU MLP
    → (σ, albedo); normals by central finite differences (6 extra encoder+MLP
    passes, network_grid.py:81-96).
  * vanilla backbone: frequency encoding (multires 12) → 5×64 ResBlock MLP;
    normals by autodiff of σ wrt x — `jax.grad` replaces the reference's
    double-backward `torch.autograd.grad` (network.py:149-162).
  * density blob bias at the origin added pre-activation with stopped
    gradient (renderer.py:338-349 is decorated @no_grad).
  * background MLP on normalized ray dirs with frequency encoding
    (network_grid.py:144-153).

Params are fp32; activations run in the configured compute dtype (bf16 by
default) except σ/normal paths which stay fp32 (the reference likewise pins
them fp32 via autocast(enabled=False)).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.math import safe_normalize
from ..ops.activation import density_activation
from ..ops.freq import freq_encode, freq_encode_dim
from ..ops.hashgrid import HashGridSpec, hash_encode, init_hashgrid
from ..ops.triplane import (TriplaneSpec, init_triplane, triplane_encode,
                            triplane_encode_with_xgrad)

SHADING_ALBEDO = 0
SHADING_LAMBERTIAN = 1
SHADING_TEXTURELESS = 2
SHADING_NORMAL = 3

SHADING_IDS = {
    "albedo": SHADING_ALBEDO,
    "lambertian": SHADING_LAMBERTIAN,
    "textureless": SHADING_TEXTURELESS,
    "normal": SHADING_NORMAL,
}


class BasicMLP(nn.Module):
    """Linear→ReLU stack with a plain final layer (network_grid.py:13-32)."""
    dim_out: int
    dim_hidden: int
    num_layers: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for l in range(self.num_layers):
            last = l == self.num_layers - 1
            x = nn.Dense(self.dim_out if last else self.dim_hidden,
                         dtype=self.dtype, name=f"dense_{l}")(x)
            if not last:
                x = nn.relu(x)
        return x


class ResBlock(nn.Module):
    """Linear → LayerNorm → (+skip) → SiLU (network.py:14-42)."""
    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim_out, dtype=self.dtype, name="dense")(x)
        h = nn.LayerNorm(dtype=self.dtype, name="norm")(h)
        if x.shape[-1] != self.dim_out:
            x = nn.Dense(self.dim_out, use_bias=False, dtype=self.dtype,
                         name="skip")(x)
        return nn.silu(h + x)


class ResMLP(nn.Module):
    """BasicBlock → ResBlock* → Linear (network.py:61-85)."""
    dim_out: int
    dim_hidden: int
    num_layers: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.dim_hidden, dtype=self.dtype, name="dense_0")(x))
        for l in range(1, self.num_layers - 1):
            x = ResBlock(self.dim_hidden, dtype=self.dtype, name=f"res_{l}")(x)
        return nn.Dense(self.dim_out, dtype=self.dtype,
                        name=f"dense_{self.num_layers - 1}")(x)


class NeRFField(nn.Module):
    backbone: str = "grid"                 # grid | vanilla | triplane
    bound: float = 1.0
    hidden_dim: int = 64
    num_layers: int = 3
    hidden_dim_bg: int = 32
    num_layers_bg: int = 2
    bg_radius: float = 1.4
    density_act: str = "exp"
    blob_density: float = 5.0
    blob_radius: float = 0.2
    grid_levels: int = 16
    grid_features_per_level: int = 2
    grid_log2_hashmap_size: int = 19
    grid_desired_resolution: int = 2048
    grid_interpolation: str = "smoothstep"
    grid_hash: str = "affine"           # affine (packed fast path) | hash
    freq_multires: int = 12                # vanilla main encoding
    freq_multires_bg: int = 6              # bg encoding (network_grid.py:62)
    vanilla_num_layers: int = 5
    triplane_resolution: int = 256
    triplane_channels: int = 16
    triplane_scales: int = 2
    # normals: 'autograd' (jax.grad of σ — one extra VJP),
    # 'finite_difference' (6 probe evals; reference network_grid.py:81-96),
    # or 'analytic' (triplane only: closed-form encoder jacobian +
    # forward-mode MLP jvp — single backward plane scatter, but measured
    # slower overall than autograd on this chip, see common_with_normal).
    # autograd is the TPU-native default: the hash/triplane gathers are
    # row-latency-bound, so 6 extra probe passes cost far more than one VJP.
    normal_mode: str = "autograd"
    compute_dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        if self.backbone == "grid":
            self.grid_spec = HashGridSpec(
                num_levels=self.grid_levels,
                level_dim=self.grid_features_per_level,
                log2_hashmap_size=self.grid_log2_hashmap_size,
                desired_resolution=int(self.grid_desired_resolution * self.bound),
                interpolation=self.grid_interpolation,
                gridtype="affine" if self.grid_hash == "affine" else "hash",
            )
            self.grid_table = self.param(
                "grid_table",
                lambda key: init_hashgrid(key, self.grid_spec),
            )
            in_dim = self.grid_spec.output_dim
            self.sigma_net = BasicMLP(4, self.hidden_dim, self.num_layers,
                                      dtype=self.compute_dtype, name="sigma_net")
        elif self.backbone == "triplane":
            self.triplane_spec = TriplaneSpec(
                resolution=self.triplane_resolution,
                channels=self.triplane_channels,
                num_scales=self.triplane_scales)
            self.triplanes = self.param(
                "triplanes",
                lambda key: init_triplane(key, self.triplane_spec))
            in_dim = self.triplane_spec.output_dim
            self.sigma_net = BasicMLP(4, self.hidden_dim, self.num_layers,
                                      dtype=self.compute_dtype, name="sigma_net")
        elif self.backbone == "vanilla":
            in_dim = freq_encode_dim(3, self.freq_multires)
            self.sigma_net = ResMLP(4, self.hidden_dim, self.vanilla_num_layers,
                                    dtype=self.compute_dtype, name="sigma_net")
        else:
            raise ValueError(f"unknown backbone {self.backbone!r}")

        if self.bg_radius > 0:
            self.bg_net = BasicMLP(3, self.hidden_dim_bg, self.num_layers_bg,
                                   dtype=self.compute_dtype, name="bg_net")

        self._density_act = density_activation(self.density_act)

    # -- encoding ---------------------------------------------------------
    def encode(self, x: jax.Array, max_level: Optional[jax.Array]) -> jax.Array:
        if self.backbone == "grid":
            u = (x + self.bound) / (2 * self.bound)     # [0, 1] (grid.py:160)
            return hash_encode(u, self.grid_table, self.grid_spec,
                               max_level=max_level,
                               out_dtype=self.compute_dtype)
        if self.backbone == "triplane":
            u = (x + self.bound) / (2 * self.bound)
            return triplane_encode(u, self.triplanes, self.triplane_spec,
                                   max_level=max_level,
                                   out_dtype=self.compute_dtype)
        return freq_encode(x, self.freq_multires, max_level=max_level).astype(
            self.compute_dtype
        )

    def density_blob(self, x: jax.Array) -> jax.Array:
        """Gaussian (exp act) / linear (softplus act) density bias at the
        origin (renderer.py:338-349); gradient stopped to match @no_grad."""
        d = jnp.sum(x * x, axis=-1)
        if self.density_act == "exp":
            g = self.blob_density * jnp.exp(-d / (2 * self.blob_radius ** 2))
        else:
            g = self.blob_density * (1 - jnp.sqrt(d) / self.blob_radius)
        return jax.lax.stop_gradient(g)

    def common(self, x: jax.Array,
               max_level: Optional[jax.Array] = None) -> Tuple[jax.Array, jax.Array]:
        """x [N,3] in [-bound, bound] → (sigma [N], albedo [N,3])."""
        h = self.sigma_net(self.encode(x, max_level)).astype(jnp.float32)
        sigma = self._density_act(h[..., 0] + self.density_blob(x))
        albedo = jax.nn.sigmoid(h[..., 1:])
        return sigma, albedo

    def density(self, x: jax.Array, max_level: Optional[jax.Array] = None):
        sigma, albedo = self.common(x, max_level)
        return {"sigma": sigma, "albedo": albedo}

    def common_with_normal(self, x: jax.Array,
                           max_level: Optional[jax.Array] = None):
        """(σ, albedo, normal) from ONE encoder gather (triplane only).

        Autograd normals re-differentiate the encoder gather; each
        differentiation context transposes to its own plane scatter-add —
        the lambertian train step compiled to 4 separate 1.18M-row scatters
        (~25 ms/step extra, scripts/profile_step_scan.py T5 vs T6).  Here
        the encoder's spatial jacobian is closed-form
        (ops/triplane.triplane_encode_with_xgrad), normals chain it with an
        MLP-only VJP, and the training backward emits ONE scatter.
        Numerically identical to `_autograd_normal` (tests/test_triplane.py).
        """
        assert self.backbone == "triplane"
        u = (x + self.bound) / (2 * self.bound)
        feat, (jx, jy, jz) = triplane_encode_with_xgrad(
            u, self.triplanes, self.triplane_spec, max_level=max_level,
            out_dtype=self.compute_dtype)

        def head(f):
            return self.sigma_net(f).astype(jnp.float32)

        # Directional σ-derivatives by FORWARD-mode jvp along the three
        # jacobian directions: tangents forward-propagate through the
        # Dense/ReLU stack (large-K dots only). The reverse-mode form —
        # jax.vjp(head)(e₀) in the forward pass — reproducibly SIGILLed
        # this libtpu's compiler at training sizes (scripts/probe_sigill.py
        # P1d/P1e vs P1g), so do NOT "simplify" this back to a vjp.
        # The density blob stays out (stop-gradient'd, as _autograd_normal).
        tangents = []
        for j in (jx, jy, jz):
            h, t = jax.jvp(head, (feat,), (j.astype(feat.dtype),))
            tangents.append(t[..., 0])                       # [N]
        sigma_pre = h[..., 0] + self.density_blob(x)
        sigma = self._density_act(sigma_pre)
        albedo = jax.nn.sigmoid(h[..., 1:])
        # trunc_exp's clamped custom gradient honored via the activation vjp
        _, act_vjp = jax.vjp(self._density_act, sigma_pre)
        (dsig,) = act_vjp(jnp.ones_like(sigma_pre))          # [N]
        g = jnp.stack(tangents, axis=-1)                     # [N, 3]
        g = g * dsig[:, None] / (2 * self.bound)
        normal = jnp.nan_to_num(safe_normalize(-g))
        return sigma, albedo, normal

    # -- normals ----------------------------------------------------------
    def normal(self, x: jax.Array,
               max_level: Optional[jax.Array] = None,
               eps: float = 1e-2) -> jax.Array:
        if self.normal_mode == "finite_difference" and \
                self.backbone != "vanilla":
            n = self._finite_difference_normal(x, max_level, eps)
        elif self.backbone == "triplane" and self.normal_mode == "analytic":
            _, _, n = self.common_with_normal(x, max_level)
            return n
        else:
            n = self._autograd_normal(x, max_level)
        n = safe_normalize(n)
        return jnp.nan_to_num(n)

    def _finite_difference_normal(self, x, max_level, eps):
        """Central differences of σ; 6 probe passes batched into one network
        evaluation (the reference runs 6 sequential passes,
        network_grid.py:81-96 — batching keeps the MXU fed)."""
        offsets = jnp.concatenate([jnp.eye(3) * eps, -jnp.eye(3) * eps], axis=0)  # [6,3]
        probes = jnp.clip(x[None, :, :] + offsets[:, None, :],
                          -self.bound, self.bound)              # [6, N, 3]
        flat = probes.reshape(-1, 3)
        sigma, _ = self.common(flat, max_level)
        sigma = sigma.reshape(6, -1)
        grad = (sigma[0:3] - sigma[3:6]) * (0.5 / eps)           # [3, N]
        return -grad.T

    def _autograd_normal(self, x, max_level):
        """-∇σ via jax.grad (reference network.py:149-162 uses
        torch.autograd.grad with create_graph)."""
        def sigma_sum(pts):
            s, _ = self.common(pts, max_level)
            return jnp.sum(s)
        return -jax.grad(sigma_sum)(x)

    # -- full forward ------------------------------------------------------
    def __call__(self, x: jax.Array, d: jax.Array,
                 light_d: Optional[jax.Array] = None,
                 ratio: jax.Array | float = 1.0,
                 shading: jax.Array | int = SHADING_ALBEDO,
                 max_level: Optional[jax.Array] = None):
        """x [N,3], d [N,3] → (sigma [N], color [N,3], normal [N,3] or None).

        `shading` may be a *traced* int (so the per-step stochastic shading
        schedule stays inside jit); all shading modes are computed from one
        normal query and selected with `where` — only `albedo` skips the
        normal probes, chosen statically when shading is a Python int.
        """
        static_albedo = isinstance(shading, int) and shading == SHADING_ALBEDO
        if static_albedo:
            sigma, albedo = self.common(x, max_level)
            return sigma, albedo, None

        if self.normal_mode == "finite_difference" and \
                self.backbone != "vanilla":
            sigma, albedo = self.common(x, max_level)
            normal = self.normal(x, max_level)
        elif self.backbone == "triplane" and self.normal_mode == "analytic":
            # analytic encoder jacobian + forward-mode jvp: ONE backward
            # plane scatter instead of four, but measured SLOWER overall
            # (97 vs 80 ms no-guidance step — the dense jacobian
            # materialization outweighs the saved scatters), so autograd
            # stays the default. Kept as an option + for the
            # jacobian-consistency tests.
            sigma, albedo, normal = self.common_with_normal(x, max_level)
        else:
            # one fused pass: value_and_grad shares the encoder+MLP forward
            # between (σ, albedo) and the autograd normal −∇σ, instead of
            # relying on XLA to CSE two separate forwards
            def f(pts):
                s, a = self.common(pts, max_level)
                return jnp.sum(s), (s, a)

            (_, (sigma, albedo)), g = jax.value_and_grad(
                f, has_aux=True)(x)
            normal = jnp.nan_to_num(safe_normalize(-g))
        lam = ratio + (1 - ratio) * jnp.maximum(
            jnp.sum(normal * light_d, axis=-1), 0.0
        )                                                        # [N]
        color_lamb = albedo * lam[..., None]
        color_tex = jnp.broadcast_to(lam[..., None], albedo.shape)
        color_norm = (normal + 1.0) / 2.0
        shading = jnp.asarray(shading)
        color = jnp.where(
            shading == SHADING_ALBEDO, albedo,
            jnp.where(shading == SHADING_TEXTURELESS, color_tex,
                      jnp.where(shading == SHADING_NORMAL, color_norm, color_lamb)),
        )
        return sigma, color, normal

    def background(self, d: jax.Array, max_level: Optional[jax.Array] = None):
        """Background color from ray direction (network_grid.py:144-153)."""
        enc = freq_encode(d, self.freq_multires_bg).astype(self.compute_dtype)
        h = self.bg_net(enc).astype(jnp.float32)
        return jax.nn.sigmoid(h)
