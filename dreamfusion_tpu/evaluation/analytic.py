"""Analytic ground-truth scenes: closed-form multi-view renders.

Jit-compatible ray-traced views of simple procedural scenes.  Two users:

  * the convergence quality bars (tests/test_convergence.py,
    tests/test_sds_convergence.py) fit fields against these views;
  * `--guidance oracle` runs (guidance/oracle.py): the oracle SDS prior
    pulls rendered views toward these targets through the REAL SDS
    machinery, producing a converged, measurable end-to-end artifact in
    this zero-egress environment (no pretrained diffusion weights exist
    here — the reference's quality story assumes downloadable SD weights,
    guidance/sd_utils.py:29-60).

Rays may come from any camera (get_rays output); directions need not be
unit-norm.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

SCENES = ("sphere", "two_sphere")


def scene_views(ro: jnp.ndarray, rd: jnp.ndarray, scene: str = "sphere",
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Closed-form render of `scene` along rays [N, 3] → (rgb [N, 3] in
    [0,1] with WHITE background, hit mask [N] bool).  See
    scene_views_full for depth/normal as well.

    scene='sphere': centered sphere of radius 0.5, albedo =
    0.5+0.5*surface normal (smooth, realizable by a density field).
    scene='two_sphere': two mutually-occluding off-center spheres with a
    band-limited procedural texture — occlusion boundaries move across
    views and texture punishes a blurry field (the hard quality bar)."""
    img, hit, _, _ = scene_views_full(ro, rd, scene)
    return img, hit


def scene_views_full(ro: jnp.ndarray, rd: jnp.ndarray,
                     scene: str = "sphere"
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                jnp.ndarray]:
    """scene_views plus the ray-march geometry: returns (rgb [N,3], hit
    [N] bool, depth [N] — ray-t along the unit direction, 0 where no hit —
    and unit surface normal [N,3], 0 where no hit).  Depth/normal feed the
    image-conditioned oracle's analytic reference RGBD
    (training/image_data.analytic_ref_images)."""
    if scene not in SCENES:
        raise ValueError(f"unknown analytic scene {scene!r}; one of {SCENES}")
    rdn = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)

    if scene == "sphere":
        spheres = [((0.0, 0.0, 0.0), 0.5)]
    else:
        spheres = [((0.26, 0.0, 0.08), 0.36), ((-0.3, 0.0, -0.14), 0.24)]

    best_t = jnp.full(ro.shape[:1], jnp.inf)
    hit = jnp.zeros(ro.shape[:1], bool)
    normal = jnp.zeros_like(ro)
    p_hit = jnp.zeros_like(ro)
    for center, rad in spheres:
        ctr = jnp.asarray(center)
        oc = ro - ctr
        b = jnp.sum(oc * rdn, axis=-1)
        c = jnp.sum(oc * oc, axis=-1) - rad ** 2
        disc = b * b - c
        t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
        h = (disc > 0) & (t > 0)
        closer = h & (t < best_t)
        best_t = jnp.where(closer, t, best_t)
        p = ro + rdn * t[:, None]
        n = (p - ctr) / rad
        normal = jnp.where(closer[:, None], n, normal)
        p_hit = jnp.where(closer[:, None], p, p_hit)
        hit = hit | h

    if scene == "sphere":
        color = 0.5 + 0.5 * normal
    else:
        tex = (jnp.sin(9.0 * p_hit[:, 0]) * jnp.sin(7.0 * p_hit[:, 1])
               * jnp.sin(8.0 * p_hit[:, 2]))
        color = jnp.clip(0.35 + 0.3 * normal + 0.3 * tex[:, None], 0.0, 1.0)
    img = jnp.where(hit[:, None], color, 1.0)
    depth = jnp.where(hit, best_t, 0.0)
    return img, hit, depth, jnp.where(hit[:, None], normal, 0.0)
