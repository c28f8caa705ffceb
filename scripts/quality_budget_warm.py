"""Post-warmup budget aggressiveness sweep.

The original tile-budget quality grid (quality_tile_budget.py) was measured
BEFORE occ_tile_budget_warmup existed: aggressive fractions lost dB to the
same discovery-starvation loop the thin-scene study exposed (a structure in
a sparse-class tile is never sampled densely early, so it is never learned,
so its tile is never promoted). With the 1024-step full-sampling warmup now
default, the budget only throttles MAINTENANCE — re-sweep the aggressive
corner of the grid to see how much steady throughput quality now tolerates.

Usage: PYTHONPATH=.:scripts:/root/.axon_site python scripts/quality_budget_warm.py
Results: PERFORMANCE.md "Two-class tile sample budget".
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from nerfpp_tpu.config import TrainParams, hashnerf_blocked_preset
from nerfpp_tpu.data.dataset import RayBatchSampler
from nerfpp_tpu.executor import NeRFExecutor
from quality_tile_budget import load_scene


def main():
    scene = load_scene()
    test_v = scene.views[list(scene.split_indices("test"))[0]]
    gt = scene.images[test_v.id]

    def run(tag, seed, frac, sparse, warm=1024):
        # preset defaults: phased refresh + both warmups (current flagship)
        p = hashnerf_blocked_preset(n_importance=0, use_occupancy_grid=True,
                                    occ_update_every=32,
                                    occ_tile_budget_frac=frac,
                                    occ_sparse_samples=sparse,
                                    occ_tile_budget_warmup=warm)
        tp = TrainParams(n_samples=64, n_rand=4096, n_iters=2100,
                         chunk=4096, i_print=0, i_weights=0, i_testset=0,
                         i_img=0, base_dir=f"/tmp/qbw_{tag}_{seed}",
                         steps_per_call=100)
        ex = NeRFExecutor(p)
        ex.white_bkgr = scene.white_bkgr
        ex.initialize(scene.bounding_box, tp.lrate_decay, seed=seed)
        t0 = time.perf_counter()
        ex.train(scene, tp)
        wall = time.perf_counter() - t0
        # steady rate at the trained state, past every warmup/anneal phase
        sampler = RayBatchSampler.from_scene(scene, tp.n_rand,
                                             tile_h=8, tile_w=16)
        many = ex._build_train_many(ex._build_train_step(tp))
        st = {**ex.state, "step": jnp.asarray(3000, jnp.int32)}
        st, m = many(st, sampler, jax.random.PRNGKey(9), k=25)
        jax.tree.map(np.asarray, m)
        t0 = time.perf_counter()
        st, m = many(st, sampler, jax.random.PRNGKey(9), k=25)
        jax.tree.map(np.asarray, m)
        rps = tp.n_rand * 25 / (time.perf_counter() - t0)
        out = ex.render_view(test_v.pose, test_v.h, test_v.w, test_v.k, tp)
        rgb = np.asarray(out["rgb8"]).astype(np.float32) / 255.0
        psnr = float(-10 * np.log10(max(float(np.mean((rgb - gt) ** 2)),
                                        1e-10)))
        print(f"{tag} seed{seed}: PSNR {psnr:.2f} dB | steady {rps:,.0f} "
              f"rays/s | wall {wall:.0f}s", flush=True)

    for seed in (0, 1):
        run("A_default_0.5_16", seed, 0.5, 16)
        run("B_0.375_16", seed, 0.375, 16)
        run("C_0.5_8", seed, 0.5, 8)
    run("D_0.25_16", 0, 0.25, 16)
    run("E_0.375_8", 0, 0.375, 8)
    # shorter warmup: the first 1024 steps run ~2x slower than budgeted —
    # worth ~17 s of the 8100-step schedule if 512 holds quality
    run("F_default_warm512", 0, 0.5, 16, warm=512)


if __name__ == "__main__":
    main()
