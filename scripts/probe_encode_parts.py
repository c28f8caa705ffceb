"""Decompose the blocked-encode pipeline into its parts on the real TPU:
prepass (_windows_call), fwd pallas kernel, bwd pallas kernel, and the XLA
glue (pack_table_bf16, transposes). Each part is timed inside ONE in-jit
scan of REPS iterations; the tunnel's fixed per-dispatch floor (~25-35 ms,
measured with an empty scan) is subtracted, and the whole thing is
min-of-RUNS dispatches — REPS=8 single-shot numbers are floor-noise.

Usage: PYTHONPATH=/root/.axon_site:.:scripts python scripts/probe_encode_parts.py [n_tiles n_samples]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from nerfpp_tpu.encoders.hashgrid import HashGridEncoder
from nerfpp_tpu.pallas import hash_encode_blocked as HEB
from nerfpp_tpu.pallas.hash_encode import pack_table_bf16
from bench_blocked_kernel import tile_coherent_points, BBOX, sync

REPS = 64
RUNS = 3


def measure(fn, *args):
    """Min-of-RUNS total wall time of one jitted call of fn(*args)."""
    out = fn(*args)
    sync(out)
    best = float("inf")
    for _ in range(RUNS):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def loop(body):
    @jax.jit
    def run(*args):
        def step(c, _):
            return c + body(c, *args), None
        return jax.lax.scan(step, 0.0, None, length=REPS)[0]
    return run


def main():
    n_tiles = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_samples = int(sys.argv[2]) if len(sys.argv) > 2 else 128
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

    # dispatch floor: an empty scan of the same length
    floor = measure(loop(lambda c: c * 1.0000001 + 1e-9))
    print(f"dispatch floor (empty x{REPS} scan): {floor*1e3:.2f} ms")

    results = {}

    def timeit(tag, fn, *args):
        tot = measure(fn, *args)
        dt = (tot - floor) / REPS
        results[tag] = dt
        print(f"{tag}: {dt*1e3:.3f} ms", flush=True)
        return dt

    # -- full prepare (prepass + pad/transpose glue)
    prep = HEB._prepare(flat, enc)
    timeit("prepare", loop(lambda c, f: 1e-9 * jnp.sum(
        HEB._prepare(f + c * 1e-7, enc)[1])), flat)

    # -- prepass kernel alone (input pre-transposed)
    pts_b = prep[0]
    timeit("prepass", loop(lambda c, pb: 1e-9 * jnp.sum(HEB._windows_call(
        pb + c * 1e-7, scales, boffs, n_levels=enc.n_levels,
        box_min=box_min, box_max=box_max)[0])), pts_b)

    # -- fwd kernel alone (fixed prep, pre-packed table)
    l, s = enc.n_levels, enc.block_slots
    tabp = pack_table_bf16(table).reshape(l * s, 128)
    pts_b, wids, maxcnt, n_pad = prep

    def fwd_body(c, tp, pb):
        # carry must feed the call or XLA hoists it out of the scan
        out = HEB._fwd_call(tp, pb + c * 1e-7, wids, maxcnt, scales, boffs,
                            n_levels=l, s_rows=s,
                            box_min=box_min, box_max=box_max)
        return 1e-9 * jnp.sum(out)
    timeit("fwd", loop(fwd_body), tabp, pts_b)

    # -- pack_table
    timeit("pack", loop(
        lambda c, t: 1e-9 * jnp.sum(pack_table_bf16(t + c).astype(jnp.float32))),
        table)

    # -- fwd output transpose glue
    out = HEB._fwd_call(tabp, pts_b, wids, maxcnt, scales, boffs,
                        n_levels=l, s_rows=s, box_min=box_min, box_max=box_max)
    timeit("out-tr", loop(
        lambda c, o: 1e-9 * jnp.sum(
            (o + c).transpose(2, 3, 0, 1).reshape(n_pad, 2 * l)[:n])), out)

    # -- bwd kernel alone
    ng = n_pad // 128
    g_pad = jnp.zeros((n_pad, 2 * l), jnp.float32).at[:n].set(g)
    g_b = g_pad.reshape(ng, 128, l, 2).transpose(2, 3, 0, 1)

    def bwd_body(c, gb, pb):
        out = HEB._bwd_call(pb, gb + c * 1e-7, wids, maxcnt, scales, boffs,
                            n_levels=l, s_rows=s,
                            box_min=box_min, box_max=box_max)
        return 1e-9 * jnp.sum(out)
    timeit("bwd", loop(bwd_body), g_b, pts_b)

    # -- bwd grad-input transpose glue
    timeit("g-tr", loop(
        lambda c, gg: 1e-9 * jnp.sum(
            jnp.zeros((n_pad, 2 * l), jnp.float32).at[:n].set(gg + c)
            .reshape(ng, 128, l, 2).transpose(2, 3, 0, 1))), g)

    print(f"\nsummary @{n} pts (floor-corrected, min-of-{RUNS}):")
    print("  " + " | ".join(f"{k} {v*1e3:.2f}" for k, v in results.items()))
    tot = sum(results.values()) - results["prepass"]  # prepass inside prepare
    print(f"  total fwd+bwd pipeline {tot*1e3:.2f} ms -> {n/tot/1e6:.1f} M pts/s")


if __name__ == "__main__":
    main()
