"""Sweep the fwd/bwd WINDOW_BATCH factor on the real TPU.

The batch factor trades MXU/pattern-matrix reuse (larger w) against
sentinel-slot waste when typical per-group unique window counts sit below
w (the unrolled init always executes w slots). The backward additionally
pays 2 VMEM row-range accumulates per slot, so its optimum is expected
below the forward's.

Usage: PYTHONPATH=/root/.axon_site:.:scripts python scripts/sweep_window_batch.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from nerfpp_tpu.encoders.hashgrid import HashGridEncoder
from nerfpp_tpu.pallas import hash_encode_blocked as HEB
from nerfpp_tpu.pallas.hash_encode import pack_table_bf16
from bench_blocked_kernel import tile_coherent_points, BBOX, sync

REPS = 32
RUNS = 3


def measure(fn, *args):
    out = fn(*args)
    sync(out)
    best = float("inf")
    for _ in range(RUNS):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    n_tiles, n_samples = (int(sys.argv[1]), int(sys.argv[2])) \
        if len(sys.argv) > 2 else (32, 128)
    print("device:", jax.devices()[0])
    enc = HashGridEncoder(BBOX, n_levels=16, log2_hashmap_size=19,
                          base_resolution=16, finest_resolution=1024,
                          scheme="blocked")
    table = enc.init(jax.random.PRNGKey(0))["table"]
    pts = tile_coherent_points(n_tiles, n_samples, jax.random.PRNGKey(1))
    flat = pts.reshape(-1, 3)
    n = flat.shape[0]
    print(f"{n} points ({n_tiles} tiles x {n_samples} samples)")
    g = jax.random.normal(jax.random.PRNGKey(2), (n, enc.output_dims))

    box_min = tuple(float(v) for v in enc.bounding_box[:3])
    box_max = tuple(float(v) for v in enc.bounding_box[3:])
    scales = jnp.asarray(enc.level_scales, jnp.float32)
    boffs = jnp.asarray(enc.block_offsets, jnp.int32).reshape(-1)
    l, s = enc.n_levels, enc.block_slots
    tabp = pack_table_bf16(table).reshape(l * s, 128)
    prep = HEB._prepare(flat, enc)
    pts_b, wids, maxcnt, n_pad = prep
    ng = n_pad // 128
    g_pad = jnp.zeros((n_pad, 2 * l), jnp.float32).at[:n].set(g)
    g_b = g_pad.reshape(ng, 128, l, 2).transpose(2, 3, 0, 1)

    # floor: empty scan
    def loop(body):
        @jax.jit
        def run(*args):
            def step(c, _):
                return c + body(c, *args), None
            return jax.lax.scan(step, 0.0, None, length=REPS)[0]
        return run

    floor = measure(loop(lambda c: c * 1.0000001 + 1e-9))
    print(f"dispatch floor: {floor*1e3:.2f} ms")

    ref = None
    for wk in (1, 2, 4, 8, 16):
        def fwd_body(c, tp, pb, _wk=wk):
            out = HEB._fwd_call(tp, pb + c * 1e-7, wids, maxcnt, scales,
                                boffs, n_levels=l, s_rows=s,
                                box_min=box_min, box_max=box_max, wk=_wk)
            return 1e-9 * jnp.sum(out)

        def bwd_body(c, gb, pb, _wk=wk):
            out = HEB._bwd_call(pb, gb + c * 1e-7, wids, maxcnt, scales,
                                boffs, n_levels=l, s_rows=s,
                                box_min=box_min, box_max=box_max, wk=_wk)
            return 1e-9 * jnp.sum(out)

        # correctness anchor: wk must not change results
        out = HEB._fwd_call(tabp, pts_b, wids, maxcnt, scales, boffs,
                            n_levels=l, s_rows=s, box_min=box_min,
                            box_max=box_max, wk=wk)
        if ref is None:
            ref = np.asarray(out)
        else:
            err = float(np.abs(np.asarray(out) - ref).max())
            assert err < 1e-6, f"wk={wk} fwd mismatch {err}"

        tf = (measure(loop(fwd_body), tabp, pts_b) - floor) / REPS
        tb = (measure(loop(bwd_body), g_b, pts_b) - floor) / REPS
        print(f"wk={wk:2d}: fwd {tf*1e3:7.3f} ms ({n/tf/1e6:5.1f} M pts/s)"
              f"  bwd {tb*1e3:7.3f} ms ({n/tb/1e6:5.1f} M pts/s)", flush=True)


if __name__ == "__main__":
    main()
