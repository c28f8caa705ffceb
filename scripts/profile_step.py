"""Train-step time decomposition at the flagship recipe by ablation:
each variant rebuilds the jitted step with one component altered and
measures the amortized (steps_per_call=25) trained-state step time.

Usage: PYTHONPATH=.:scripts python scripts/profile_step.py
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from nerfpp_tpu.config import TrainParams, hashnerf_blocked_preset
from nerfpp_tpu.data.dataset import RayBatchSampler
from nerfpp_tpu.executor import NeRFExecutor
from nerfpp_tpu.utils import checkpoint as ckpt_utils
from profile_render import CKPT, trained_executor
from quality_tile_budget import load_scene


def main():
    scene = load_scene()
    ex0, _ = trained_executor(scene)   # restores or trains the shared ckpt
    state0 = ex0.state

    def measure(tag, post=None, **over):
        pk = dict(n_importance=0, use_occupancy_grid=True,
                  occ_update_every=32)
        tk = dict(n_samples=64, n_rand=4096, n_iters=8100, chunk=4096,
                  i_print=0, i_weights=0, i_testset=0,
                  base_dir="/tmp/psb", steps_per_call=25)
        ex_over = {}
        for k, v in over.items():
            if k in tk:
                tk[k] = v
            elif k in pk:
                pk[k] = v
            else:
                ex_over[k] = v
        p = hashnerf_blocked_preset(**pk)
        tp = TrainParams(**tk)
        ex = NeRFExecutor(p)
        for k, v in ex_over.items():
            setattr(ex.params, k, v)
        ex.white_bkgr = scene.white_bkgr
        ex.initialize(scene.bounding_box, tp.lrate_decay, seed=0)
        if post is not None:
            post(ex)
        # adopt the trained params/occupancy so placement coherence matches
        st = dict(ex.state)
        for k in ("params", "opt_state", "occupancy", "step"):
            if k in state0:
                st[k] = state0[k]
        sampler = RayBatchSampler.from_scene(scene, tp.n_rand,
                                             tile_h=8, tile_w=16)
        step_fn = ex._build_train_step(tp)
        many = ex._build_train_many(step_fn)
        key = jax.random.PRNGKey(1)
        k_ = tp.steps_per_call
        st, m = many(st, sampler, key, k=k_)
        jax.tree.map(np.asarray, m)
        best = float("inf")
        tot = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            st, m = many(st, sampler, key, k=k_)
            jax.tree.map(np.asarray, m)
            dt = (time.perf_counter() - t0) / k_
            best = min(best, dt)
            tot += dt
        print(f"{tag}: min {best*1e3:.2f} / mean {tot/3*1e3:.2f} ms/step -> "
              f"{tp.n_rand/(tot/3):,.0f} rays/s (mean)", flush=True)
        return best

    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "parts":
        # non-encode decomposition: each row swaps ONE non-encode component
        # for a near-free stand-in; the delta vs baseline is that component's
        # amortized cost. (Encode cost scales with points — the n_samples
        # rows bound it from the workload side.)
        import optax
        measure("baseline (flagship)")

        def _sgd(ex):
            ex.tx = optax.sgd(1e-2)   # no moments: Adam HBM traffic removed
        measure("sgd optimizer", post=_sgd)
        measure("dense 32 samples", n_samples=32)
        measure("dense 48 samples", n_samples=48)
        measure("per-ray occ CDF", occ_ray_tile=0)
        measure("uniform frac 0", occ_uniform_frac=0.0)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "phased":
        # k=64 windows contain exactly 2 refreshes (every=32): the MEAN is
        # the honest amortized rate (min-of-k=25 windows dodges refreshes)
        measure("baseline (full refresh)", steps_per_call=64)
        measure("phased refresh", occ_phased_refresh=True, steps_per_call=64)
        return
    base = measure("baseline (flagship)")
    measure("no occ refresh", occ_update_every=1 << 30)
    measure("occ refresh every 64", occ_update_every=64)
    measure("budget off", occ_tile_budget_frac=0.0)
    measure("budget 0.375/16", occ_tile_budget_frac=0.375)
    measure("budget 0.25/16", occ_tile_budget_frac=0.25)
    measure("sparse 8", occ_sparse_samples=8)
    measure("k=50", steps_per_call=50)
    measure("no TV/noises: thin_ray", thin_ray=True)


if __name__ == "__main__":
    main()
