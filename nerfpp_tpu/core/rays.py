"""Ray generation and geometry utilities.

TPU-native re-design of the reference ray math (see /root/reference/src/RayUtils.h):
``get_directions``/``get_rays`` (RayUtils.h:5-46), ``ndc_rays`` (RayUtils.h:49-83),
``intersect_aabb`` (RayUtils.h:87-126) and the pose helpers from load_blender.h:12-57.

Everything here is a pure, jit-friendly function over fixed-shape arrays; the camera
convention is OpenGL (x right, y up, z backwards): pixel (x, y) maps to the camera-frame
direction ((x-cx)/fx, -(y-cy)/fy, -1).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def get_directions(h: int, w: int, k: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame ray directions for every pixel of an h x w image.

    Mirrors RayUtils.h:5-21. ``k`` is the 3x3 intrinsics matrix.

    Returns: [h, w, 3] directions (not normalized; z = -1 plane).
    """
    y = jnp.arange(h, dtype=jnp.float32)[:, None]  # [h, 1]
    x = jnp.arange(w, dtype=jnp.float32)[None, :]  # [1, w]
    fx, fy = k[0, 0], k[1, 1]
    cx, cy = k[0, 2], k[1, 2]
    dir_x = (x - cx) / fx * jnp.ones((h, w), jnp.float32)
    dir_y = -(y - cy) / fy * jnp.ones((h, w), jnp.float32)
    dir_z = -jnp.ones((h, w), jnp.float32)
    return jnp.stack([dir_x, dir_y, dir_z], axis=-1)


def pixel_directions(px_x: jnp.ndarray, px_y: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame directions for arbitrary (possibly fractional) pixel coords.

    Same math as get_directions but for a flat batch of sampled pixels — the
    TPU-native version of the per-batch ray construction in NeRFDataset.cpp:109-144.
    """
    fx, fy = k[0, 0], k[1, 1]
    cx, cy = k[0, 2], k[1, 2]
    dir_x = (px_x.astype(jnp.float32) - cx) / fx
    dir_y = -(px_y.astype(jnp.float32) - cy) / fy
    dir_z = -jnp.ones_like(dir_x)
    return jnp.stack([dir_x, dir_y, dir_z], axis=-1)


def cone_angle_of(k: jnp.ndarray) -> jnp.ndarray:
    """Scalar per-camera cone-angle derivative: 1.1 * mean(1/fx, 1/fy).

    The radius of the pixel footprint cone grows linearly with distance z as
    cone_angle * z (RayUtils.h:35-43; the 1.1 factor is an anti-aliasing margin).
    """
    fx, fy = k[0, 0], k[1, 1]
    return 1.1 * (1.0 / fx + 1.0 / fy) / 2.0


def rotate_dirs(dirs: jnp.ndarray, c2w: jnp.ndarray) -> jnp.ndarray:
    """Rotate camera-frame dirs [..., 3] into world frame by c2w[:3, :3]."""
    return jnp.einsum("...j,ij->...i", dirs, c2w[:3, :3],
                      precision=jax.lax.Precision.HIGHEST)


def get_rays(h: int, w: int, k: jnp.ndarray, c2w: jnp.ndarray):
    """Full-image rays: origins [h, w, 3], directions [h, w, 3], scalar cone_angle.

    Mirrors RayUtils.h:23-46.
    """
    dirs = get_directions(h, w, k)
    rays_d = rotate_dirs(dirs, c2w)
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d, cone_angle_of(k)


def get_ray_batch(px_x: jnp.ndarray, px_y: jnp.ndarray, k: jnp.ndarray, c2w: jnp.ndarray):
    """Rays through a flat batch of pixel coords. Returns (rays_o, rays_d, cone_angle)."""
    dirs = pixel_directions(px_x, px_y, k)
    rays_d = rotate_dirs(dirs, c2w)
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d, cone_angle_of(k)


def ndc_rays(h: int, w: int, focal: float, near: float,
             rays_o: jnp.ndarray, rays_d: jnp.ndarray, cone_angle=None):
    """Project rays into normalized device coordinates for forward-facing scenes.

    Mirrors RayUtils.h:49-83 including the cone-angle rescale by the direction-norm
    ratio. ``cone_angle`` may be None (thin-ray mode).
    """
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (w / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (h / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / (w / (2.0 * focal)) * (rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2])
    d1 = -1.0 / (h / (2.0 * focal)) * (rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2])
    d2 = -2.0 * near / rays_o[..., 2]

    new_o = jnp.stack([o0, o1, o2], axis=-1)
    new_d = jnp.stack([d0, d1, d2], axis=-1)

    if cone_angle is not None:
        scale = jnp.sqrt(d0 ** 2 + d1 ** 2 + d2 ** 2) / jnp.linalg.norm(rays_d, axis=-1)
        cone_angle = cone_angle * scale[..., None]
    return new_o, new_d, cone_angle


def intersect_aabb(rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                   bounding_box: jnp.ndarray, near_plane: float = 0.0):
    """Per-ray (near, far) from slab intersection with an axis-aligned box.

    Mirrors RayUtils.h:87-126: division guarded by +1e-6, near clamped to the near
    plane, and far forced > near by 1e-6. ``bounding_box`` is [6] = (min_xyz, max_xyz).

    Returns: (nears, fars), each shaped like rays_o[..., 0].
    """
    aabb = bounding_box.reshape(2, 3)
    dir_fraction = 1.0 / (rays_d + 1e-6)
    t_lo = (aabb[0] - rays_o) * dir_fraction  # [..., 3]
    t_hi = (aabb[1] - rays_o) * dir_fraction
    t_min = jnp.minimum(t_lo, t_hi)
    t_max = jnp.maximum(t_lo, t_hi)
    nears = jnp.max(t_min, axis=-1)
    fars = jnp.min(t_max, axis=-1)
    nears = jnp.maximum(nears, near_plane)
    fars = jnp.maximum(fars, nears + 1e-6)
    return nears, fars


def c2w_to_w2c(pose: jnp.ndarray) -> jnp.ndarray:
    """Invert a rigid camera pose (c2w <-> w2c). Mirrors NeRFRenderer.h:71-85."""
    r = pose[:3, :3]
    t = pose[:3, 3]
    r_inv = jnp.linalg.inv(r)
    t_inv = -r_inv @ t
    out = jnp.eye(4, dtype=pose.dtype)
    out = out.at[:3, :3].set(r_inv)
    out = out.at[:3, 3].set(t_inv)
    return out


# ---------------------------------------------------------------------------
# Pose helpers for spiral/spherical render paths (load_blender.h:12-57). These
# are host-side (NumPy) since they run once to build a render path.
# ---------------------------------------------------------------------------

def _trans_t(t: float) -> np.ndarray:
    m = np.eye(4, dtype=np.float32)
    m[2, 3] = t
    return m


def _rot_phi(phi: float) -> np.ndarray:
    c, s = np.cos(phi), np.sin(phi)
    return np.array([[1, 0, 0, 0], [0, c, -s, 0], [0, s, c, 0], [0, 0, 0, 1]], np.float32)


def _rot_theta(th: float) -> np.ndarray:
    c, s = np.cos(th), np.sin(th)
    return np.array([[c, 0, -s, 0], [0, 1, 0, 0], [s, 0, c, 0], [0, 0, 0, 1]], np.float32)


def pose_spherical(theta_deg: float, phi_deg: float, radius: float,
                   x: float = 0.0, y: float = 0.0, z: float = 0.0) -> np.ndarray:
    """Camera-to-world pose on a sphere looking at the origin (load_blender.h:43-57)."""
    c2w = _trans_t(radius)
    c2w = _rot_phi(phi_deg / 180.0 * np.pi) @ c2w
    c2w = _rot_theta(theta_deg / 180.0 * np.pi) @ c2w
    flip = np.array([[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], np.float32)
    c2w = flip @ c2w
    c2w[0, 3] += x
    c2w[1, 3] += y
    c2w[2, 3] += z
    return c2w


def calibration_matrix(focal: float, w: float, h: float) -> np.ndarray:
    """3x3 intrinsics with principal point at the image center (load_blender.h:60-66)."""
    return np.array([[focal, 0, 0.5 * w], [0, focal, 0.5 * h], [0, 0, 1]], np.float32)


def same_fov_calibration_matrix(k: np.ndarray, new_w: float, new_h: float) -> np.ndarray:
    """Rescale intrinsics to a new resolution preserving FOV (load_blender.h:69-80)."""
    focal = float(k[0, 0])
    w = float(k[0, 2]) * 2
    h = float(k[1, 2]) * 2
    camera_angle = 2.0 * np.arctan(max(w, h) / 2.0 / focal)
    new_focal = 0.5 * max(new_w, new_h) / np.tan(0.5 * camera_angle)
    return calibration_matrix(new_focal, new_w, new_h)
