"""Flagship trained-state step time vs ray-batch size (round 5).

The encode-parts decomposition (probe_encode_parts.py) shows the flagship
step at NRand 4096 is NOT kernel-bound: the encode pipeline accounts for
~4 ms of the ~15 ms step, the rest is per-step fixed cost (occupancy
prior + sampling machinery, Adam on the 16.8M-param table, integrate,
loss). Bigger batches amortize that fixed cost over more rays — and
NRand 16384 is what the reference itself ships (main.cpp:230-234).

Usage: PYTHONPATH=.:scripts:/root/.axon_site python scripts/batch_sweep.py
"""
import time

import numpy as np
import jax

from nerfpp_tpu.config import TrainParams, hashnerf_blocked_preset
from nerfpp_tpu.data.dataset import RayBatchSampler
from nerfpp_tpu.executor import NeRFExecutor
from profile_render import trained_executor
from quality_tile_budget import load_scene


def main():
    scene = load_scene()
    ex0, _ = trained_executor(scene)
    state0 = ex0.state
    key = jax.random.PRNGKey(1)
    for n_rand, chunk in ((4096, 4096), (8192, 8192), (16384, 8192),
                          (16384, 16384), (32768, 16384)):
        p = hashnerf_blocked_preset(n_importance=0, use_occupancy_grid=True,
                                    occ_update_every=32)
        tp = TrainParams(n_samples=64, n_rand=n_rand, n_iters=8100,
                         chunk=chunk, i_print=0, i_weights=0, i_testset=0,
                         base_dir="/tmp/bsweep", steps_per_call=25)
        ex = NeRFExecutor(p)
        ex.white_bkgr = scene.white_bkgr
        ex.initialize(scene.bounding_box, tp.lrate_decay, seed=0)
        st = dict(ex.state)
        for kk in ("params", "opt_state", "occupancy", "step"):
            if kk in state0:
                st[kk] = state0[kk]
        sampler = RayBatchSampler.from_scene(scene, n_rand,
                                             tile_h=8, tile_w=16)
        try:
            many = ex._build_train_many(ex._build_train_step(tp))
            st, m = many(st, sampler, key, k=25)
            jax.tree.map(np.asarray, m)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                st, m = many(st, sampler, key, k=25)
                jax.tree.map(np.asarray, m)
                best = min(best, (time.perf_counter() - t0) / 25)
            print(f"n_rand {n_rand:6d} chunk {chunk:6d}: "
                  f"{best*1e3:7.2f} ms/step -> {n_rand/best:10,.0f} rays/s",
                  flush=True)
        except Exception as e:
            print(f"n_rand {n_rand:6d} chunk {chunk:6d}: FAILED "
                  f"({type(e).__name__}: {str(e)[:120]})", flush=True)


if __name__ == "__main__":
    main()
