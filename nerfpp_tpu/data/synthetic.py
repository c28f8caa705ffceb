"""Procedural synthetic scenes with analytic ground truth.

The environment ships no Blender-synthetic datasets (zero egress), so tests and
benchmarks train against a procedural scene: a handful of colored primitives
with constant interior density, rendered to ground-truth images by integrating
the *true* density/color field along rays with dense sampling — the same
compositing math the model is trained with, so a correct pipeline must converge.

This plays the role of the reference's lego/drums data (main.cpp:22) for
self-contained verification; the blender loader (data/blender.py) handles real
transforms_*.json datasets when present.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from nerfpp_tpu.core import rays as ray_math
from nerfpp_tpu.core.integrate import weights_from_alpha
from nerfpp_tpu.data.dataset import SceneData, View

# (center xyz, half-extent/radius, rgb, density, kind) kind: 0 sphere, 1 box
_PRIMS = np.array([
    # center           size           color           sigma  kind
    [0.0, 0.0, 0.0,    0.42,          0.9, 0.25, 0.2,  28.0,  0],
    [0.55, 0.0, 0.25,  0.22,          0.2, 0.5, 0.9,   35.0,  0],
    [-0.5, 0.45, -0.2, 0.25,          0.95, 0.8, 0.15, 30.0,  1],
    [0.1, -0.55, 0.4,  0.18,          0.3, 0.9, 0.35,  40.0,  1],
    [-0.25, -0.3, -0.5, 0.2,          0.7, 0.3, 0.85,  33.0,  0],
], np.float32)

# "thin" variant: anisotropic half-extents (sx, sy, sz) — rods down to 0.02
# half-width, a plate 0.015 thick, plus two bulk prims — the geometry class
# where tile-shared CDFs / sample budgets / subsampled probes are known to
# fail first (a thin rod contributes almost nothing to a tile's MEAN weight
# yet must still be sampled). Used by scripts/quality_two_scenes.py to check
# the flagship recipe's conclusions transfer beyond the default blob scene.
# (center xyz, half-extents xyz, rgb, sigma, kind)
_PRIMS_THIN = np.array([
    [0.0, 0.0, 0.0,     0.35, 0.35, 0.35,  0.85, 0.3, 0.2,  28.0, 0],
    [0.0, 0.0, 0.55,    0.02, 0.02, 0.55,  0.95, 0.9, 0.2,  60.0, 1],
    [0.45, -0.3, 0.0,   0.02, 0.6, 0.02,   0.2, 0.9, 0.5,   60.0, 1],
    [-0.5, 0.3, 0.1,    0.5, 0.015, 0.4,   0.3, 0.5, 0.95,  55.0, 1],
    [0.35, 0.45, -0.35, 0.18, 0.18, 0.18,  0.9, 0.6, 0.15,  35.0, 0],
    [-0.3, -0.5, -0.3,  0.025, 0.025, 0.45, 0.8, 0.25, 0.9, 60.0, 1],
], np.float32)


# normalize the legacy [P, 9] scalar-size layout to the anisotropic
# [P, 11] one: center(3), half-extents(3), color(3), sigma, kind
_PRIMS_ANISO = np.concatenate(
    [_PRIMS[:, 0:3], np.repeat(_PRIMS[:, 3:4], 3, axis=1), _PRIMS[:, 4:9]],
    axis=1).astype(np.float32)

_VARIANTS = {"default": _PRIMS_ANISO, "thin": _PRIMS_THIN}


def _field_from_prims(prims: jnp.ndarray, pts: jnp.ndarray,
                      textured: bool = False):
    """(sigma [...], rgb [..., 3]) from a [P, 11] anisotropic prim table.

    ``textured`` modulates each prim's color with a position-frequency
    stripe pattern (high-frequency appearance content — exercises encoder
    capacity the flat-color prims don't).
    """
    centers = prims[:, 0:3]
    sizes = prims[:, 3:6]
    colors = prims[:, 6:9]
    sigmas = prims[:, 9]
    kinds = prims[:, 10]

    rel = pts[..., None, :] - centers          # [..., P, 3]
    # soft interior indicator: distance metric per kind (anisotropic:
    # normalize per-axis — spheres become ellipsoids, boxes cuboids)
    d_sphere = jnp.linalg.norm(rel / sizes, axis=-1)
    d_box = jnp.max(jnp.abs(rel) / sizes, axis=-1)
    d = jnp.where(kinds > 0.5, d_box, d_sphere)        # [..., P]
    inside = jax.nn.sigmoid((1.0 - d) * 40.0)          # smooth boundary
    sigma = jnp.sum(sigmas * inside, axis=-1)
    if textured:
        stripe = 0.75 + 0.25 * jnp.sin(
            14.0 * pts[..., 0] + 11.0 * pts[..., 1] + 9.0 * pts[..., 2])
        colors = colors * stripe[..., None, None]
    w = inside + 1e-8
    rgb = jnp.sum(w[..., None] * colors, axis=-2) \
        / jnp.sum(w, axis=-1)[..., None]
    return sigma, jnp.clip(rgb, 0.0, 1.0)


def scene_field(pts: jnp.ndarray, variant: str = "default",
                textured: bool = False):
    """Ground-truth field. pts [..., 3] -> (sigma [...], rgb [..., 3])."""
    return _field_from_prims(jnp.asarray(_VARIANTS[variant]), pts, textured)


def render_gt_rays(rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                   near: float, far: float, n_samples: int = 256,
                   white_bkgr: bool = True, variant: str = "default",
                   textured: bool = False) -> jnp.ndarray:
    """Analytically composite the ground-truth field along rays. [..., 3] rgb."""
    t = jnp.linspace(near, far, n_samples, dtype=jnp.float32)
    pts = rays_o[..., None, :] + rays_d[..., None, :] * t[:, None]
    sigma, rgb = scene_field(pts, variant, textured)
    dists = jnp.diff(t, append=t[-1] + (far - near) / n_samples)
    dists = dists * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    alpha = 1.0 - jnp.exp(-sigma * dists)
    weights = weights_from_alpha(alpha)
    out = jnp.sum(weights[..., None] * rgb, axis=-2)
    if white_bkgr:
        out = out + (1.0 - jnp.sum(weights, axis=-1, keepdims=True))
    return out


def make_synthetic_scene(n_train: int = 24, n_val: int = 2, n_test: int = 4,
                         image_hw: int = 64, n_samples: int = 256,
                         radius: float = 3.0, seed: int = 0,
                         white_bkgr: bool = True, variant: str = "default",
                         textured: bool = False) -> SceneData:
    """Build a SceneData with rendered ground-truth images on a view sphere.

    ``variant="thin"`` swaps in the thin-structures prim set (rods/plates
    down to 0.015 half-width) and ``textured=True`` adds high-frequency
    stripe appearance — the second scene used to check that sampling-
    strategy conclusions measured on the default scene transfer.
    """
    rng = np.random.RandomState(seed)
    h = w = image_hw
    focal = 1.1 * image_hw
    k = ray_math.calibration_matrix(focal, w, h)

    n_total = n_train + n_val + n_test
    thetas = np.linspace(-180, 180, n_total, endpoint=False) + rng.uniform(0, 5, n_total)
    phis = -30.0 + 20.0 * np.sin(np.linspace(0, 4 * np.pi, n_total))
    # Interleave the splits around the azimuth circle so val/test views are
    # interpolations of the training distribution, not extrapolations past the
    # last trained azimuth (which made held-out PSNR measure the wrong thing).
    held_out = set(rng.choice(n_total, n_val + n_test, replace=False).tolist())
    train_ids = [i for i in range(n_total) if i not in held_out]
    order = np.asarray(train_ids + sorted(held_out), np.int64)
    thetas = thetas[order]
    phis = phis[order]

    near, far = 0.5 * radius, 1.5 * radius
    views, images = [], []

    @jax.jit
    def render_view(c2w):
        rays_o, rays_d, _ = ray_math.get_rays(h, w, jnp.asarray(k), c2w)
        # chunk pixels: the GT field broadcast is [pix, samples, prims, 3] —
        # unchunked this is ~10 GB at 800px and OOMs the chip
        flat_o = rays_o.reshape(-1, 3)
        flat_d = rays_d.reshape(-1, 3)
        chunk = 16384
        n = flat_o.shape[0]
        pad = -n % chunk
        flat_o = jnp.pad(flat_o, ((0, pad), (0, 0)))
        flat_d = jnp.pad(flat_d, ((0, pad), (0, 0)))
        out = jax.lax.map(
            lambda args: render_gt_rays(args[0], args[1], near, far,
                                        n_samples, white_bkgr,
                                        variant, textured),
            (flat_o.reshape(-1, chunk, 3), flat_d.reshape(-1, chunk, 3)))
        return out.reshape(-1, 3)[:n].reshape(h, w, 3)

    for i in range(n_total):
        pose = ray_math.pose_spherical(float(thetas[i]), float(phis[i]), radius)
        img = np.asarray(render_view(jnp.asarray(pose)))
        views.append(View(id=i, h=h, w=w, focal=focal, near=near, far=far,
                          k=k.copy(), pose=pose))
        images.append(np.clip(img, 0.0, 1.0))

    bbox = np.array([-1.2, -1.2, -1.2, 1.2, 1.2, 1.2], np.float32)
    return SceneData(views=views, splits_idx=[n_train, n_val, n_test],
                     bounding_box=bbox, white_bkgr=white_bkgr,
                     images=np.stack(images))
