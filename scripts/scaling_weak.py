"""Weak-scaling probe for the data-parallel train step (VERDICT r3 #7).

Fixed per-device ray batch, mesh sizes {1, 2, 4, 8} on the virtual CPU
backend. This host has ONE core, so the virtual devices serialize and a
classic efficiency number t(1)/t(N) would only measure that serialization.
What CAN be isolated here is the SPMD machinery's cost: with perfectly
serialized compute the ideal weak-scaled step time is N * t(1), so

    overhead(N) = t(N) / (N * t(1)) - 1

is the per-step cost the partitioner adds (gradient psum, sharding
constraints, replication bookkeeping) as executed on the host backend. The
real-ICI all-reduce cost is bounded analytically from the gradient byte
count instead (BASELINE.md).

Usage: python scripts/scaling_weak.py   (re-execs itself onto the CPU
backend with 8 virtual devices, axon tunnel path sanitized)
Results: BASELINE.md + PERFORMANCE.md multi-chip section.
"""
import os
import sys
import time

if os.environ.get("_NERFPP_SCALING_CHILD") != "1":
    import subprocess

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
           if p and ".axon_site" not in p])
    env["_NERFPP_SCALING_CHILD"] = "1"
    raise SystemExit(subprocess.run(
        [sys.executable, os.path.abspath(__file__)], env=env).returncode)

sys.path[:] = [p for p in sys.path if ".axon_site" not in p]

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nerfpp_tpu.config import TrainParams, hashnerf_preset  # noqa: E402
from nerfpp_tpu.data.dataset import RayBatchSampler  # noqa: E402
from nerfpp_tpu.executor import NeRFExecutor  # noqa: E402
from nerfpp_tpu.parallel import mesh as mesh_utils  # noqa: E402

PER_DEV_RAYS = 512
STEPS = 8


def time_mesh(n_dev: int) -> float:
    # mid-size stack (full flagship tables would take minutes/step on the
    # 1-core host; the SPMD overhead being measured is per-step machinery,
    # not table FLOPs — the analytic ICI bound covers the full-size bytes)
    p = hashnerf_preset(n_importance=0, n_levels=8, log2_hashmap_size=15,
                        finest_resolution=256, use_occupancy_grid=True,
                        occ_grid_resolution=32, occ_update_every=1 << 30,
                        occ_n_bins=16)
    n_rand = PER_DEV_RAYS * n_dev
    tp = TrainParams(n_samples=32, n_rand=n_rand, n_iters=100, chunk=n_rand)
    bbox = np.array([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5], np.float32)
    ex = NeRFExecutor(p)
    ex.initialize(bbox, tp.lrate_decay, seed=0)

    h = w = 64
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, h, w, 3), jnp.float32)
    poses = jnp.tile(jnp.eye(4)[None], (2, 1, 1)).at[:, 2, 3].set(2.5)
    ks = jnp.tile(jnp.asarray([[80.0, 0, 32], [0, 80.0, 32], [0, 0, 1]],
                              jnp.float32)[None], (2, 1, 1))
    sampler = RayBatchSampler(images=images, poses=poses, intrinsics=ks,
                              h=h, w=w, batch_size=n_rand)

    mesh = mesh_utils.make_mesh(n_dev)
    step = ex._build_train_step(tp, mesh=mesh)
    state = mesh_utils.put_replicated(ex.state, mesh)
    key = jax.random.PRNGKey(0)
    state, m = step(state, sampler, key)          # compile
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for i in range(STEPS):
        state, m = step(state, sampler, jax.random.fold_in(key, i))
    jax.block_until_ready(m)
    return (time.perf_counter() - t0) / STEPS


def main():
    assert jax.device_count() >= 8, jax.devices()
    t = {}
    for n in (1, 2, 4, 8):
        t[n] = time_mesh(n)
        ideal = n * t[1]
        print(f"devices={n}: {t[n]*1e3:8.1f} ms/step "
              f"(serialized ideal {ideal*1e3:8.1f} ms, "
              f"SPMD overhead {t[n]/ideal - 1:+.1%})", flush=True)

    # analytic ICI bound for the real v5e-8 all-reduce at flagship size:
    # ring all-reduce moves 2*(N-1)/N * bytes per chip per step
    n_params = 16 * (1 << 19) * 2 + 20_000     # hash tables + MLPs approx
    byts = n_params * 4
    ici_bw = 45e9                              # v5e per-link, one direction
    n = 8
    t_ar = 2 * (n - 1) / n * byts / ici_bw
    print(f"\nanalytic v5e-8 ring all-reduce of {byts/1e6:.0f} MB grads: "
          f"{t_ar*1e3:.2f} ms/step "
          f"({t_ar/0.0179:+.1%} of the 17.9 ms flagship step)", flush=True)


if __name__ == "__main__":
    main()
