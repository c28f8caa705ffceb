"""Follow-ups to thin_hybrid.py (round 4).

1. Does the round-4 default flip (hier_ray_tile=128 + fine budget 0.25/16,
   config.hashnerf_preset) keep the hierarchical path's thin-scene
   robustness (measured 24.8/25.1 dB at per-ray semantics in round 3)?
2. What does the hybrid (occ coarse 64 + importance fine 32) cost on the
   flagship 800px blob-scene workload: steady-state rays/s at a trained
   state + held-out PSNR at 2100 steps.

Usage: PYTHONPATH=.:scripts:/root/.axon_site python scripts/thin_hybrid2.py
Results: PERFORMANCE.md "Second-scene check" + hybrid ledger.
"""
import time

import numpy as np

import jax
from nerfpp_tpu.config import TrainParams, hashnerf_blocked_preset
from nerfpp_tpu.data.dataset import RayBatchSampler
from nerfpp_tpu.data.synthetic import make_synthetic_scene
from nerfpp_tpu.executor import NeRFExecutor
from quality_two_scenes import load_thin_scene


def run_thin(scene, tag, seed, n_iters=2100, **kw):
    p = hashnerf_blocked_preset(**kw)
    tp = TrainParams(n_samples=64, n_rand=4096, n_iters=n_iters,
                     chunk=4096, i_print=0, i_weights=0, i_testset=0,
                     i_img=0, base_dir=f"/tmp/thh2_{tag}_{seed}",
                     steps_per_call=100)
    ex = NeRFExecutor(p)
    ex.white_bkgr = scene.white_bkgr
    ex.initialize(scene.bounding_box, tp.lrate_decay, seed=seed)
    t0 = time.perf_counter()
    ex.train(scene, tp)
    wall = time.perf_counter() - t0
    v = scene.views[list(scene.split_indices("test"))[0]]
    out = ex.render_view(v.pose, v.h, v.w, v.k, tp)
    rgb = np.asarray(out["rgb8"]).astype(np.float32) / 255.0
    gt = scene.images[v.id]
    psnr = float(-10 * np.log10(max(float(np.mean((rgb - gt) ** 2)), 1e-10)))
    print(f"{tag} seed{seed}: PSNR {psnr:.2f} dB | wall {wall:.0f}s",
          flush=True)


def main():
    thin = load_thin_scene()
    # 1. hierarchical 32+96 under the NEW preset defaults (tiled cdf+budget)
    for seed in (1, 0):
        run_thin(thin, "hier_newdefaults", seed, n_importance=96,
                 use_occupancy_grid=False)
    # exact per-ray semantics control (round-3 behavior)
    run_thin(thin, "hier_perray", 1, n_importance=96,
             use_occupancy_grid=False, hier_ray_tile=0,
             hier_tile_budget_frac=0.0)

    # 2. hybrid cost on the flagship blob workload (800px scene)
    scene = make_synthetic_scene(n_train=16, n_val=1, n_test=1, image_hw=400,
                                 white_bkgr=False, n_samples=64)
    for tag, kw in (("flagship_n0", dict(n_importance=0)),
                    ("hybrid_n32", dict(n_importance=32)),
                    ("hybrid_n16", dict(n_importance=16))):
        p = hashnerf_blocked_preset(use_occupancy_grid=True,
                                    occ_update_every=32, **kw)
        tp = TrainParams(n_samples=64, n_rand=4096, n_iters=2101, chunk=4096,
                         i_print=0, i_weights=0, i_testset=0, i_img=0,
                         base_dir=f"/tmp/thh2_blob_{tag}", steps_per_call=50)
        ex = NeRFExecutor(p)
        ex.white_bkgr = scene.white_bkgr
        ex.initialize(scene.bounding_box, tp.lrate_decay, seed=0)
        sampler = RayBatchSampler.from_scene(scene, tp.n_rand,
                                             tile_h=8, tile_w=16)
        step_fn = ex._build_train_step(tp)
        many_fn = ex._build_train_many(step_fn)
        key = jax.random.PRNGKey(1)
        st = ex.state
        for _ in range(2100 // 50):
            st, m = many_fn(st, sampler, key, k=50)
        np.asarray(m["loss"])
        # steady-state rate at the trained state
        st2, m = many_fn(st, sampler, key, k=25)
        np.asarray(m["loss"])
        t0 = time.perf_counter()
        for _ in range(2):
            st2, m = many_fn(st2, sampler, key, k=25)
        np.asarray(m["loss"])
        rps = tp.n_rand / ((time.perf_counter() - t0) / 50)
        ex.state = st
        ex.params.render_dense_frac = 0.0
        v = scene.views[list(scene.split_indices("test"))[0]]
        out = ex.render_view(v.pose, v.h, v.w, v.k, tp)
        rgb = np.clip(np.asarray(out["nerf"].rgb), 0, 1)
        gt = scene.images[v.id]
        psnr = float(-10 * np.log10(max(float(np.mean((rgb - gt) ** 2)),
                                        1e-10)))
        print(f"blob {tag}: {rps:,.0f} rays/s | {psnr:.2f} dB @2100",
              flush=True)


if __name__ == "__main__":
    main()
