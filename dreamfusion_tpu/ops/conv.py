"""Matmul-based 2-D convolution (MXU-native).

`lax.conv_general_dilated` lowers catastrophically on some TPU PJRT
backends (measured 0.2 TFLOP/s vs 300+ TFLOP/s for the same contraction
expressed as shifted matmuls on this system — see bench notes).  Since
every conv in the diffusion UNet/VAE is small-kernel (1×1/3×3, stride 1-2)
or a patch embedding (stride == kernel), all of them map exactly onto MXU
matmuls:

  * 1×1 conv           → a single einsum over channels;
  * k×k conv           → sum over kh·kw shifted slices, each an einsum
                          (k² = 9 MXU calls, zero data duplication);
  * patchify (s == k)  → space-to-depth reshape + one matmul.

`MMConv` is a drop-in replacement for `flax.linen.Conv` with the same
parameter names/shapes ('kernel' [kh,kw,I,O], 'bias' [O]) so checkpoints
and the torch converters are unaffected.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Padding = Union[str, int, Sequence[Tuple[int, int]]]

# spatial size above which k×k convs dispatch to XLA's conv emitter
# instead of shifted einsums (measured crossover, scripts/profile_conv2.py:
# ≥256² the emitter wins, ≤128² the einsums win on this backend)
_LAX_CONV_MIN_PIXELS = 256 * 256


def _norm_padding(padding: Padding, kh: int, kw: int,
                  H: int, W: int, sh: int, sw: int
                  ) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    if isinstance(padding, str):
        if padding.upper() == "VALID":
            return (0, 0), (0, 0)
        if padding.upper() == "SAME":
            # stride-aware SAME (lax/flax semantics): total pad per dim is
            # max((ceil(H/s)-1)*s + k - H, 0), low half rounded down —
            # NOT the stride-1 (k-1)//2 split (wrong for e.g. patch embeds)
            def same(n, k, s):
                out = -(-n // s)
                total = max((out - 1) * s + k - n, 0)
                return total // 2, total - total // 2
            return same(H, kh, sh), same(W, kw, sw)
        raise ValueError(padding)
    if isinstance(padding, int):
        return (padding, padding), (padding, padding)
    (pt, pb), (pl, pr) = padding
    return (pt, pb), (pl, pr)


def mm_conv(x: jax.Array, kernel: jax.Array,
            strides: Tuple[int, int] = (1, 1),
            padding: Padding = "SAME") -> jax.Array:
    """NHWC conv via shifted einsums.  kernel: [kh, kw, I, O]."""
    B, H, W, C = x.shape
    kh, kw, CI, O = kernel.shape
    assert CI == C, (kernel.shape, x.shape)
    sh, sw = strides
    (pt, pb), (pl, pr) = _norm_padding(padding, kh, kw, H, W, sh, sw)

    if kh == 1 and kw == 1 and sh == 1 and sw == 1:
        return jnp.einsum("bhwc,co->bhwo", x, kernel[0, 0],
                          preferred_element_type=jnp.float32)

    if (sh, sw) == (kh, kw) and (pt, pb, pl, pr) == (0, 0, 0, 0) \
            and H % kh == 0 and W % kw == 0:
        # patchify: space-to-depth + single matmul
        xr = x.reshape(B, H // kh, kh, W // kw, kw, C)
        xr = xr.transpose(0, 1, 3, 2, 4, 5).reshape(
            B, H // kh, W // kw, kh * kw * C)
        wr = kernel.reshape(kh * kw * C, O)
        return jnp.einsum("bhwc,co->bhwo", xr, wr,
                          preferred_element_type=jnp.float32)

    if H * W >= _LAX_CONV_MIN_PIXELS:
        # Large spatial maps: the 9-einsum accumulation materializes k²
        # f32 partial outputs (HBM-bound: 3.3 ms vs 0.9 ms at 512²×128,
        # scripts/profile_conv2.py); XLA's conv emitter wins there.  Below
        # the threshold the einsum path is faster (64²×320: 0.13 vs
        # 0.15 ms; 128²×512 fwd+bwd: 1.53 vs 1.85 ms).
        # The emitter's *transpose* (grad) convs are a different story —
        # measured in scripts/profile_vae_bwd.py — so the backward runs
        # through the einsum path's adjoint when _EMITTER_BWD is False.
        if _EMITTER_BWD:
            return _emitter_conv(x, kernel, (sh, sw),
                                 ((pt, pb), (pl, pr)))

        @jax.custom_vjp
        def f(x, kernel):
            return _emitter_conv(x, kernel, (sh, sw), ((pt, pb), (pl, pr)))

        def f_fwd(x, kernel):
            return f(x, kernel), (x, kernel)

        def f_bwd(res, g):
            # the conv is bilinear: transpose each linear factor directly
            # (jax.linear_transpose evaluates only the adjoint — no wasted
            # primal recompute like jax.vjp would do).  The strided-slice
            # adjoints lower to dense pad+add, and the einsum adjoints to
            # plain matmuls; the unused dk is DCE'd for frozen guidance.
            xr, kr = res
            dx = jax.linear_transpose(
                lambda xx: _einsum_conv(xx, kr, (sh, sw),
                                        ((pt, pb), (pl, pr))), xr)(g)[0]
            dk = jax.linear_transpose(
                lambda kk: _einsum_conv(xr, kk, (sh, sw),
                                        ((pt, pb), (pl, pr))), kr)(g)[0]
            return dx, dk

        f.defvjp(f_fwd, f_bwd)
        return f(x, kernel)

    return _einsum_conv(x, kernel, (sh, sw), ((pt, pb), (pl, pr)))


# backward path of the >= _LAX_CONV_MIN_PIXELS branch: True (default)
# uses XLA's conv-transpose emitters, False routes the grad through the
# einsum adjoint (dense shifted matmuls) — A/B in scripts/profile_vae_matrix.py
_EMITTER_BWD = True


def _emitter_conv(x, kernel, strides, pads):
    # f32 output to match the einsum branches' contract.  NOT via
    # preferred_element_type: that makes the primal output f32 while the
    # transpose (grad) conv then mixes an f32 cotangent with bf16 inputs
    # and lax rejects the dtype mismatch.  The MXU accumulates bf16
    # convs in f32 internally, so casting the result is equivalent.
    out = jax.lax.conv_general_dilated(
        x, kernel, strides, pads,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out.astype(jnp.float32)


def _einsum_conv(x, kernel, strides, pads):
    B, H, W, C = x.shape
    kh, kw, _, O = kernel.shape
    sh, sw = strides
    (pt, pb), (pl, pr) = pads
    xp = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    Ho = (H + pt + pb - kh) // sh + 1
    Wo = (W + pl + pr - kw) // sw + 1
    acc = None
    for i in range(kh):
        for j in range(kw):
            sl = jax.lax.slice(
                xp, (0, i, j, 0),
                (B, i + (Ho - 1) * sh + 1, j + (Wo - 1) * sw + 1, C),
                (1, sh, sw, 1))
            term = jnp.einsum("bhwc,co->bhwo", sl, kernel[i, j],
                              preferred_element_type=jnp.float32)
            acc = term if acc is None else acc + term
    return acc


class MMConv(nn.Module):
    """flax.linen.Conv drop-in (NHWC, 2-D) backed by mm_conv."""
    features: int
    kernel_size: Union[int, Tuple[int, int]] = (3, 3)
    strides: Union[int, Tuple[int, int]] = 1
    padding: Padding = "SAME"
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        ks = self.kernel_size if isinstance(self.kernel_size, tuple) \
            else (self.kernel_size, self.kernel_size)
        st = self.strides if isinstance(self.strides, tuple) \
            else (self.strides, self.strides)
        C = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (ks[0], ks[1], C, self.features))
        dt = self.dtype or x.dtype
        y = mm_conv(x.astype(dt), kernel.astype(dt), st, self.padding)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            y = y + bias.astype(jnp.float32)
        return y.astype(dt)
