"""Blender-synthetic dataset loader (transforms_{train,val,test}.json).

Re-designs ``load_blender_data`` (load_blender.h:127-217): per-frame 4x4 c2w
pose, focal from camera_angle_x, optional half-res, testskip drops the test
split; near/far heuristic from the camera-position spread (0.15d, 0.6d,
load_blender.h:83-96) and the scene AABB from the 4 corner rays of every train
view at near/far (load_blender.h:99-124). Images are referenced by path and
decoded lazily by the sampler (the reference stores paths too).
"""
from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from nerfpp_tpu.core import rays as ray_math
from nerfpp_tpu.data.dataset import SceneData, View


def get_bounds_for_obj(scene: SceneData) -> tuple:
    """(near, far) = (0.15 d, 0.6 d), d = diagonal of the train-camera-position
    bounding box (load_blender.h:83-96)."""
    mn = np.full(3, 1e8, np.float32)
    mx = np.full(3, -1e8, np.float32)
    for i in scene.split_indices("train"):
        o = scene.views[i].pose[:3, 3]
        mn = np.minimum(mn, o)
        mx = np.maximum(mx, o)
    d = float(np.linalg.norm(mx - mn))
    return 0.15 * d, 0.6 * d


def get_bbox3d_for_obj(scene: SceneData) -> np.ndarray:
    """Scene AABB spanned by the 4 corner rays of each train view at near and
    far (load_blender.h:99-124)."""
    mn = np.full(3, 1e8, np.float32)
    mx = np.full(3, -1e8, np.float32)
    for i in scene.split_indices("train"):
        v = scene.views[i]
        import jax.numpy as jnp
        rays_o, rays_d, _ = ray_math.get_rays(v.h, v.w, jnp.asarray(v.k),
                                              jnp.asarray(v.pose))
        rays_o = np.asarray(rays_o)
        rays_d = np.asarray(rays_d)
        for (x, y) in [(0, 0), (v.w - 1, 0), (0, v.h - 1), (v.w - 1, v.h - 1)]:
            p_near = rays_o[y, x] + v.near * rays_d[y, x]
            p_far = rays_o[y, x] + v.far * rays_d[y, x]
            mn = np.minimum(mn, np.minimum(p_near, p_far))
            mx = np.maximum(mx, np.maximum(p_near, p_far))
    return np.concatenate([mn, mx]).astype(np.float32)


def export_blender_scene(scene: SceneData, basedir) -> Path:
    """Write a SceneData as a Blender-synthetic transforms tree.

    Inverse of :func:`load_blender_data` — produces the exact on-disk layout
    the reference consumes (load_blender.h:127-217): per-split
    ``transforms_{split}.json`` with ``camera_angle_x`` + 4x4
    ``transform_matrix`` frames, images as 8-bit PNGs under ``./{split}/``.
    Lets any in-memory scene (e.g. data/synthetic.py) exercise the full
    loader path end to end; note PNG quantization and the loader's own
    near/far heuristic (get_bounds_for_obj) apply on re-load.
    """
    import cv2
    basedir = Path(basedir)
    for split in scene.splits:
        idx = list(scene.split_indices(split))
        if not idx:
            continue
        v0 = scene.views[idx[0]]
        # the format carries ONE camera_angle_x per split — per-view
        # intrinsics cannot round-trip, so refuse rather than silently
        # exporting a wrong focal for every other view
        for i in idx:
            v = scene.views[i]
            if (v.h, v.w) != (v0.h, v0.w) or not np.isclose(
                    float(v.k[0, 0]), float(v0.k[0, 0])):
                raise ValueError(
                    f"export_blender_scene: split '{split}' mixes "
                    f"intrinsics (view {v.id} vs {v0.id}); the "
                    "transforms_*.json format shares one camera_angle_x")
        (basedir / split).mkdir(parents=True, exist_ok=True)
        frames = []
        for j, i in enumerate(idx):
            v = scene.views[i]
            rel = f"./{split}/r_{j}"
            img = np.clip(np.asarray(scene.images[v.id]), 0.0, 1.0)
            # preserve alpha (BGRA for cv2) — the loader composites RGBA
            # onto white under white_bkgr, so dropping it would change pixels
            if img.ndim == 3 and img.shape[-1] == 4:
                img = img[..., [2, 1, 0, 3]]
            else:
                img = img[..., ::-1]
            cv2.imwrite(str(basedir / f"{rel}.png"),
                        np.round(img * 255.0).astype(np.uint8))
            frames.append({
                "file_path": rel,
                "transform_matrix":
                    np.asarray(v.pose, np.float64).reshape(4, 4).tolist(),
            })
        camera_angle_x = 2.0 * float(np.arctan(0.5 * v0.w / v0.k[0, 0]))
        (basedir / f"transforms_{split}.json").write_text(json.dumps(
            {"camera_angle_x": camera_angle_x, "frames": frames}, indent=1))
    return basedir


def load_blender_data(basedir, near: float = 0.0, far: float = 0.0,
                      half_res: bool = False, testskip: bool = True,
                      white_bkgr: bool = False) -> SceneData:
    """Parse transforms_{train,val,test}.json into a SceneData.

    Image sizes are read by decoding the FIRST image of each split only (all
    frames in a Blender export share them — decoding every frame just for
    dimensions cost O(dataset) before training). With half_res, H/W/focal are
    halved and the sampler resizes at decode time. ``white_bkgr`` is recorded
    on the scene so RGBA frames composite onto white downstream (the Blender
    synthetic convention; reference NeRFDatasetParams.h:106 carried into
    compositing at NeRFRenderer.h:276-277).
    """
    import cv2
    basedir = Path(basedir)
    scene = SceneData(white_bkgr=white_bkgr)
    for i_split, split in enumerate(scene.splits):
        if testskip and split == "test":
            continue
        path = basedir / f"transforms_{split}.json"
        if not path.exists():
            continue
        data = json.loads(path.read_text())
        camera_angle_x = float(data["camera_angle_x"])
        split_hw = None
        for frame in data["frames"]:
            img_path = basedir / (frame["file_path"] + ".png")
            # fail fast on a partial export: a missing frame must surface at
            # load time, not hours later when the trainer first decodes it
            if not img_path.exists():
                raise FileNotFoundError(img_path)
            if split_hw is None:
                img = cv2.imread(str(img_path), cv2.IMREAD_UNCHANGED)
                if img is None:
                    raise FileNotFoundError(img_path)
                split_hw = img.shape[:2]
            h, w = split_hw
            focal = 0.5 * w / np.tan(0.5 * camera_angle_x)
            if half_res:
                h, w, focal = h // 2, w // 2, focal / 2
            pose = np.asarray(frame["transform_matrix"], np.float32).reshape(4, 4)
            scene.views.append(View(
                id=len(scene.views), h=h, w=w, focal=float(focal),
                near=0.0, far=0.0,
                k=ray_math.calibration_matrix(focal, w, h),
                pose=pose, image_path=str(img_path)))
            scene.splits_idx[i_split] += 1

    if near == 0.0 or far == 0.0:
        near, far = get_bounds_for_obj(scene)
    for v in scene.views:
        v.near, v.far = near, far
    scene.bounding_box = get_bbox3d_for_obj(scene)
    return scene
