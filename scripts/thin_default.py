"""Thin-scene robustness under the DEFAULT blocked preset (round 5):
the collapse auto-recovery (config.auto_fine_*) must detect the all-white
basin and engage the occ+importance hybrid by itself — no recipe knobs.

Usage: PYTHONPATH=.:/root/.axon_site python scripts/thin_default.py [seeds...]
"""
import os
import sys
import time
import zipfile

import numpy as np
import jax

from nerfpp_tpu.config import TrainParams, hashnerf_blocked_preset
from nerfpp_tpu.data.synthetic import make_synthetic_scene
from nerfpp_tpu.executor import NeRFExecutor


def load_thin():
    cache_dir = os.path.join(os.path.expanduser("~"), ".cache", "nerfpp_tpu")
    os.makedirs(cache_dir, exist_ok=True)
    cache = os.path.join(cache_dir, "bench_scene_thin400_v1.npz")
    try:
        d = np.load(cache, allow_pickle=False)
        thin = make_synthetic_scene(n_train=16, n_val=1, n_test=1,
                                    image_hw=8, n_samples=2,
                                    white_bkgr=True, variant="thin",
                                    textured=True)
        assert d["images"].shape[0] == len(thin.views)
        thin.images = d["images"]
        for v, hw, kk, pose in zip(thin.views, d["hw"], d["k"], d["poses"]):
            v.h, v.w = int(hw[0]), int(hw[1])
            v.k, v.pose = kk, pose
    except (FileNotFoundError, OSError, KeyError, ValueError, AssertionError,
            zipfile.BadZipFile):
        thin = make_synthetic_scene(n_train=16, n_val=1, n_test=1,
                                    image_hw=400, white_bkgr=True,
                                    n_samples=128, variant="thin",
                                    textured=True)
        np.savez(cache, images=thin.images,
                 hw=np.asarray([[v.h, v.w] for v in thin.views]),
                 k=np.stack([v.k for v in thin.views]),
                 poses=np.stack([v.pose for v in thin.views]))
    return thin


def main():
    seeds = [int(s) for s in sys.argv[1:]] or [0, 1]
    print("device:", jax.devices()[0])
    thin = load_thin()
    vt = thin.views[list(thin.split_indices("test"))[0]]
    gtt = thin.images[vt.id]
    for seed in seeds:
        t0 = time.perf_counter()
        p = hashnerf_blocked_preset(n_importance=0, use_occupancy_grid=True,
                                    occ_update_every=32)
        tp = TrainParams(n_samples=64, n_rand=4096, n_iters=2100, chunk=4096,
                         i_print=0, i_weights=0, i_testset=0, i_img=0,
                         base_dir="/tmp/thin_default", steps_per_call=100)
        ex = NeRFExecutor(p)
        ex.white_bkgr = thin.white_bkgr
        ex.initialize(thin.bounding_box, tp.lrate_decay, seed=seed)
        ex.train(thin, tp)
        ex.params.render_dense_frac = 0.0
        out = ex.render_view(vt.pose, vt.h, vt.w, vt.k, tp)
        rgb = np.clip(np.asarray(out["nerf"].rgb), 0, 1)
        db = float(-10 * np.log10(max(float(np.mean((rgb - gtt) ** 2)),
                                      1e-10)))
        eng = "engaged" if ex.params.n_importance > 0 else "not engaged"
        print(f"seed {seed}: {db:.2f} dB @2100 ({eng}; "
              f"{time.perf_counter()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
