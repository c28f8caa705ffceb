"""Isolate the blender-pipeline 4 dB gap (VERDICT r4 weak #3).

BENCH_r04: direct-scene 2100-step control 32.04 dB vs 28.00 dB through the
export->load_blender pipeline. Attribution claimed: the loader's OWN
near/far heuristic (0.15d/0.6d of the camera spread) + corner-ray bbox
(load_blender.h:83-124 semantics), not pipeline loss (PNG quantization,
pose round-trip). This control trains the DIRECT SceneData (no export, no
quantization) but with the loader-derived bounds substituted — if it lands
at ~28 dB the attribution is confirmed and the bbox is the whole gap.

Then the candidate fix: the same run with TrainParams.bbox_refit_step
(occupancy-grid-driven bbox re-fit + table re-init at warmup end).

Usage: nohup python -u scripts/blender_gap_control.py > /tmp/bgap.log
"""
from __future__ import annotations

import copy
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from nerfpp_tpu.config import TrainParams, hashnerf_blocked_preset
from nerfpp_tpu.data.blender import get_bbox3d_for_obj, get_bounds_for_obj
from nerfpp_tpu.data.dataset import RayBatchSampler, load_images
from nerfpp_tpu.data.synthetic import make_synthetic_scene
from nerfpp_tpu.executor import NeRFExecutor


def load_bench_scene():
    import os
    cache = os.path.join(os.path.expanduser("~"), ".cache", "nerfpp_tpu",
                         "bench_scene_800_v1.npz")
    d = np.load(cache, allow_pickle=False)
    scene = make_synthetic_scene(n_train=16, n_val=1, n_test=1,
                                 image_hw=8, n_samples=2, white_bkgr=False)
    scene.images = d["images"]
    for v, hw, kk, pose in zip(scene.views, d["hw"], d["k"], d["poses"]):
        v.h, v.w = int(hw[0]), int(hw[1])
        v.k, v.pose = kk, pose
    return scene


def train_2100(scene, tag, bbox_refit_step=0):
    p = hashnerf_blocked_preset(n_importance=0, use_occupancy_grid=True,
                                occ_update_every=32)
    tp = TrainParams(n_samples=64, n_rand=4096, n_iters=2101, chunk=4096,
                     i_print=0, i_weights=0, i_testset=0, i_img=0,
                     base_dir=f"/tmp/bgap_{tag}", steps_per_call=25,
                     bbox_refit_step=bbox_refit_step)
    ex = NeRFExecutor(p)
    ex.white_bkgr = scene.white_bkgr
    ex.initialize(scene.bounding_box, tp.lrate_decay, seed=0)
    t0 = time.perf_counter()
    ex.train(scene, tp)
    dt = time.perf_counter() - t0
    vid = list(scene.split_indices("test"))[0]
    v = scene.views[vid]
    ex.params.render_dense_frac = 0.0
    out = ex.render_view(v.pose, v.h, v.w, v.k, tp)
    rgb = np.clip(np.asarray(out["nerf"].rgb), 0, 1)
    gt = load_images(scene, [vid], white_bkgr=scene.white_bkgr)[0]
    psnr = -10 * np.log10(max(float(np.mean((rgb - gt) ** 2)), 1e-10))
    bb = np.asarray(ex.bounding_box).reshape(2, 3)
    print(f"{tag:24s} PSNR@2100 = {psnr:6.2f} dB  ({dt:.0f}s)  "
          f"bbox={bb[0].round(2).tolist()}..{bb[1].round(2).tolist()} "
          f"near/far={scene.views[0].near:.2f}/{scene.views[0].far:.2f}",
          flush=True)
    return psnr


def main():
    which = sys.argv[1:] or ["direct", "loader_bounds", "refit"]
    scene = load_bench_scene()
    print(f"direct bbox {scene.bounding_box.tolist()}, "
          f"near/far {scene.views[0].near}/{scene.views[0].far}", flush=True)

    if "direct" in which:
        train_2100(scene, "direct")

    # loader-derived bounds substituted onto the SAME images/poses
    lscene = copy.deepcopy(scene)
    near, far = get_bounds_for_obj(lscene)
    for v in lscene.views:
        v.near, v.far = near, far
    lscene.bounding_box = get_bbox3d_for_obj(lscene)
    print(f"loader bounds: near/far {near:.2f}/{far:.2f}, "
          f"bbox {np.asarray(lscene.bounding_box).round(2).tolist()}",
          flush=True)
    if "loader_bounds" in which:
        train_2100(lscene, "direct+loader_bounds")
    if "refit" in which:
        train_2100(lscene, "loader_bounds+refit", bbox_refit_step=500)


if __name__ == "__main__":
    main()
