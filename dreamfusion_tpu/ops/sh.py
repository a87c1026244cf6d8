"""Real spherical-harmonics basis evaluation, degree 1..8.

TPU-native equivalent of the `shencoder` CUDA extension
(/root/reference/shencoder/src/shencoder.cu:28-357).  Instead of that
kernel's hardcoded per-degree polynomial tables, we evaluate the same basis
(instant-ngp convention: Condon-Shortley phase, K(l,m) = sqrt((2l+1)/(4pi)
(l-m)!/(l+m)!) normalization, ordering m = -l..l) from the associated
Legendre recurrences, with the sin^m(theta) factor folded into the Cartesian
chebyshev-like terms A_m = Re[(x+iy)^m], B_m = Im[(x+iy)^m].  The whole
computation is a short unrolled chain of fused element-wise VPU ops —
there is nothing for a hand kernel to win here.

Gradients come for free from JAX autodiff (the reference needed a second
hand-written backward kernel, shencoder.cu:359-437).
"""

from __future__ import annotations

import math
from typing import List

import jax
import jax.numpy as jnp


def sh_encode_dim(degree: int) -> int:
    return degree * degree


def _K(l: int, m: int) -> float:
    """SH normalization constant."""
    return math.sqrt(
        (2 * l + 1) / (4 * math.pi) * math.factorial(l - m) / math.factorial(l + m)
    )


def sh_encode(dirs: jax.Array, degree: int = 4) -> jax.Array:
    """dirs: [..., 3] unit vectors → [..., degree**2] SH basis values.

    Matches the reference kernel for inputs in [-1, 1]^3 (the reference
    expects unit directions; callers normalize first).
    """
    if not 1 <= degree <= 8:
        raise ValueError("degree must be in [1, 8]")
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    L = degree - 1  # max band

    # A_m = sin^m(theta) cos(m phi), B_m = sin^m(theta) sin(m phi)
    A: List[jax.Array] = [jnp.ones_like(x)]
    B: List[jax.Array] = [jnp.zeros_like(x)]
    for m in range(1, L + 1):
        A.append(A[-1] * x - B[-1] * y)
        B.append(B[-1] * x + A[-2] * y)  # A[-2] is A_{m-1} after append above

    # P[m][l] = P_l^m(z) / sin^m(theta)  (Condon-Shortley phase included)
    P = [[None] * (L + 1) for _ in range(L + 1)]
    P[0][0] = jnp.ones_like(z)
    if L >= 1:
        P[0][1] = z
    for l in range(2, L + 1):
        P[0][l] = ((2 * l - 1) * z * P[0][l - 1] - (l - 1) * P[0][l - 2]) / l
    for m in range(1, L + 1):
        # P_m^m / sin^m = (-1)^m (2m-1)!!
        dfact = 1.0
        for k in range(1, 2 * m, 2):
            dfact *= k
        P[m][m] = ((-1.0) ** m) * dfact * jnp.ones_like(z)
        if m + 1 <= L:
            P[m][m + 1] = (2 * m + 1) * z * P[m][m]
        for l in range(m + 2, L + 1):
            P[m][l] = ((2 * l - 1) * z * P[m][l - 1] - (l + m - 1) * P[m][l - 2]) / (l - m)

    sq2 = math.sqrt(2.0)
    out = []
    for l in range(L + 1):
        for m in range(-l, l + 1):
            am = abs(m)
            if m == 0:
                out.append(_K(l, 0) * P[0][l])
            elif m > 0:
                out.append(sq2 * _K(l, m) * P[m][l] * A[m])
            else:
                out.append(sq2 * _K(l, am) * P[am][l] * B[am])
    return jnp.stack(out, axis=-1)
