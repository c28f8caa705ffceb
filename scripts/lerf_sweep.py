"""LeRF diagnosis stage 2: the bench's LeRF scene config collapses even on
the RGB branch (12.33 dB heldout, accLE=0 — scripts/lerf_diagnose2.py).
Sweep sampling configs on the exact bench scene to find one that trains
reliably, RGB-only for speed; the winner becomes the bench's LeRF config.
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax.numpy as jnp

from nerfpp_tpu.config import TrainParams, hashnerf_preset
from nerfpp_tpu.data.synthetic import make_synthetic_scene
from nerfpp_tpu.executor import NeRFExecutor


def run(name, preset_kwargs, tp_kwargs, seed=0):
    scene = make_synthetic_scene(n_train=8, n_val=1, n_test=1, image_hw=128,
                                 white_bkgr=False, n_samples=64)
    p = hashnerf_preset(log2_hashmap_size=14, n_levels=8,
                        finest_resolution=128, **preset_kwargs)
    tp = TrainParams(n_rand=2048, n_iters=1001, chunk=2048, i_print=0,
                     i_weights=0, i_testset=0, i_img=0,
                     base_dir=f"/tmp/nerfpp_sweep_{name}",
                     steps_per_call=50, **tp_kwargs)
    ex = NeRFExecutor(p)
    ex.white_bkgr = scene.white_bkgr
    ex.initialize(scene.bounding_box, tp.lrate_decay, seed=seed)
    t0 = time.perf_counter()
    ex.train(scene, tp)
    dt = time.perf_counter() - t0
    vid = list(scene.split_indices("test"))[0]
    v = scene.views[vid]
    out = ex.render_view(v.pose, v.h, v.w, v.k, tp)
    rgb = np.clip(np.asarray(out["nerf"].rgb), 0, 1)
    gt = scene.images[vid]
    psnr = -10 * np.log10(max(float(np.mean((rgb - gt) ** 2)), 1e-10))
    acc = float(np.asarray(out["nerf"].acc).mean())
    print(f"{name:28s} seed{seed} PSNR={psnr:6.2f} dB  mean-acc={acc:.3f}  "
          f"({dt:.0f}s)", flush=True)
    return psnr


CONFIGS = {
    # the r4 bench config (expected ~12 dB)
    "bench_r4_u32": (dict(n_importance=0), dict(n_samples=32)),
    # hierarchical 32+16, per-ray semantics
    "hier_32+16": (dict(n_importance=16, hier_ray_tile=0,
                        hier_tile_budget_frac=0.0), dict(n_samples=32)),
    # hierarchical 64+32
    "hier_64+32": (dict(n_importance=32, hier_ray_tile=0,
                        hier_tile_budget_frac=0.0), dict(n_samples=64)),
    # the thin-scene recipe: occupancy 64 + importance 16, budget off
    "occ32+imp16": (dict(n_importance=16, use_occupancy_grid=True,
                         occ_n_bins=32, hier_ray_tile=0,
                         hier_tile_budget_frac=0.0), dict(n_samples=32)),
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(CONFIGS)
    for n in names:
        pk, tk = CONFIGS[n]
        for seed in (0, 1):
            run(n, pk, tk, seed=seed)
