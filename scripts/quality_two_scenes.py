"""Second-scene check of the flagship sampling-strategy conclusions.

Every round-2/3 sampling decision (occupancy beats hierarchical, tile
budget 0.5/16, phased refresh) was measured on ONE procedural scene —
exactly the kind of conclusion that can flip on thin structures and
high-frequency texture. This study re-runs the key A/Bs on the "thin"
scene variant (rods/plates down to 0.015 half-width + stripe texture,
data/synthetic.py _PRIMS_THIN) at 400px:

  A  flagship: occupancy 64 + tile budget 0.5/16 + phased refresh
  B  A without the tile budget
  C  A with full (unphased) refresh
  D  hierarchical 32+96, no occupancy (the round-1 default recipe)

Held-out PSNR at 2100 steps, 2 seeds each. The claim under test is the
ORDERING (A >= B,C >= D within noise), not absolute dB.

Usage: PYTHONPATH=.:scripts python scripts/quality_two_scenes.py
Measured results: PERFORMANCE.md "Second-scene check" section.
"""
import os
import time

import zipfile

import numpy as np

import jax
import jax.numpy as jnp

from nerfpp_tpu.config import TrainParams, hashnerf_blocked_preset
from nerfpp_tpu.data.synthetic import make_synthetic_scene
from nerfpp_tpu.executor import NeRFExecutor


def load_thin_scene():
    # WHITE background (the blender-lego convention): on a BLACK background
    # thin structures drive EVERY recipe — occupancy, hierarchical, budget
    # on/off, all seeds — into the same "opaque black fog" local optimum
    # (measured: all configs = the exact all-black PSNR 17.13; the fog
    # matches 85% of pixels for free and thin bright rays can't outvote
    # their black neighbors through shared fog cells). White background
    # makes fog cost on every background pixel, which carves it. The
    # reference hits the same trap class (its WhiteBkgr comment says
    # "always use for dvoxels", main.cpp:252).
    cache = "/tmp/nerfpp_thin_scene_400_v2.npz"
    scene = make_synthetic_scene(n_train=16, n_val=1, n_test=1,
                                 image_hw=8, n_samples=2, white_bkgr=True,
                                 variant="thin", textured=True)
    try:
        d = np.load(cache, allow_pickle=False)
        assert d["images"].shape[0] == len(scene.views)
        scene.images = d["images"]
        for v, hw, kk, pose in zip(scene.views, d["hw"], d["k"], d["poses"]):
            v.h, v.w = int(hw[0]), int(hw[1])
            v.k, v.pose = kk, pose
        return scene
    except (FileNotFoundError, OSError, KeyError, AssertionError,
            zipfile.BadZipFile):
        scene = make_synthetic_scene(n_train=16, n_val=1, n_test=1,
                                     image_hw=400, white_bkgr=True,
                                     n_samples=128, variant="thin",
                                     textured=True)
        np.savez(cache, images=scene.images,
                 hw=np.asarray([[v.h, v.w] for v in scene.views]),
                 k=np.stack([v.k for v in scene.views]),
                 poses=np.stack([v.pose for v in scene.views]))
        return scene


def main():
    scene = load_thin_scene()
    test_v = scene.views[list(scene.split_indices("test"))[0]]
    gt = scene.images[test_v.id]

    def run(tag, seed, **kw):
        hier = kw.pop("hier", False)
        if hier:
            p = hashnerf_blocked_preset(n_importance=96, **kw)
            tp = TrainParams(n_samples=32, n_rand=4096, n_iters=2100,
                             chunk=4096, i_print=0, i_weights=0, i_testset=0,
                             i_img=0, base_dir=f"/tmp/q2s_{tag}_{seed}",
                             steps_per_call=100)
        else:
            p = hashnerf_blocked_preset(n_importance=0,
                                        use_occupancy_grid=True,
                                        occ_update_every=32, **kw)
            tp = TrainParams(n_samples=64, n_rand=4096, n_iters=2100,
                             chunk=4096, i_print=0, i_weights=0, i_testset=0,
                             i_img=0, base_dir=f"/tmp/q2s_{tag}_{seed}",
                             steps_per_call=100)
        ex = NeRFExecutor(p)
        ex.white_bkgr = scene.white_bkgr
        ex.initialize(scene.bounding_box, tp.lrate_decay, seed=seed)
        t0 = time.perf_counter()
        ex.train(scene, tp)
        wall = time.perf_counter() - t0
        out = ex.render_view(test_v.pose, test_v.h, test_v.w, test_v.k, tp)
        rgb = np.asarray(out["rgb8"]).astype(np.float32) / 255.0
        psnr = float(-10 * np.log10(max(float(np.mean((rgb - gt) ** 2)),
                                        1e-10)))
        print(f"{tag} seed{seed}: PSNR {psnr:.2f} dB | wall {wall:.0f}s",
              flush=True)

    for seed in (0, 1):
        run("A_flagship", seed)
        run("B_no_budget", seed, occ_tile_budget_frac=0.0)
        run("C_full_refresh", seed, occ_phased_refresh=False)
        run("D_hier_32_96", seed, hier=True)


if __name__ == "__main__":
    main()
