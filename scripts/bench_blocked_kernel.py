"""Microbench: blocked hash-encode fwd/bwd kernels on the real TPU.

Points are tile-coherent: groups of 128 = 128 nearby rays at one sample
depth (the layout the training path produces with tile sampling +
sample-major flattening). Usage: python scripts/bench_blocked_kernel.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from nerfpp_tpu.encoders.hashgrid import HashGridEncoder
from nerfpp_tpu.pallas.hash_encode_blocked import (hash_encode_blocked,
                                                   hash_encode_blocked_bwd)

BBOX = np.array([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5], np.float32)


def tile_coherent_points(n_tiles, n_samples, key, tile_angle=0.007):
    """[n_samples, n_tiles*128, 3] sample-major points: per tile, 128 rays
    from one camera through a small angular patch, sampled at shared depths.

    tile_angle: half-width of the patch in radians. A 16x8-pixel tile on an
    800px image with camera_angle_x ~0.69 is ~0.014 rad wide -> 0.007."""
    ks = jax.random.split(key, 3)
    origins = jnp.array([[0.0, 0.0, 2.5]])
    center = jax.random.normal(ks[0], (n_tiles, 1, 3)) * 0.3
    center = center.at[..., 2].add(-1.0)
    offs = jax.random.uniform(ks[1], (n_tiles, 128, 3),
                              minval=-tile_angle, maxval=tile_angle)
    dirs = center + offs
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    z = jnp.linspace(1.0, 4.0, n_samples)
    pts = origins[None] + dirs[None] * z[:, None, None, None]  # [S, T, 128, 3]
    pts = pts.reshape(n_samples, n_tiles * 128, 3)
    return jnp.clip(pts, jnp.asarray(BBOX[:3]), jnp.asarray(BBOX[3:]))


def sync(x):
    jax.tree.map(np.asarray, x)


def main():
    print("device:", jax.devices()[0])
    enc = HashGridEncoder(BBOX, n_levels=16, log2_hashmap_size=19,
                          base_resolution=16, finest_resolution=1024,
                          scheme="blocked")
    table = enc.init(jax.random.PRNGKey(0))["table"]

    n_tiles, n_samples = 32, 128           # 4096 rays x 128 samples = 524k pts
    pts = tile_coherent_points(n_tiles, n_samples, jax.random.PRNGKey(1))
    flat = pts.reshape(-1, 3)
    n = flat.shape[0]
    g = jax.random.normal(jax.random.PRNGKey(2), (n, enc.output_dims))

    @jax.jit
    def fwd(table, flat):
        return hash_encode_blocked(table, flat, enc)

    @jax.jit
    def bwd(g, flat):
        return hash_encode_blocked_bwd(g, flat, enc)

    # in-jit loop to amortize dispatch overhead through the tunnel
    @jax.jit
    def fwd_loop(table, flat, reps=8):
        def body(c, _):
            return c + 1e-6 * jnp.sum(fwd(table, flat + c * 1e-7)), None
        return jax.lax.scan(body, 0.0, None, length=reps)[0]

    @jax.jit
    def bwd_loop(g, flat, reps=8):
        def body(c, _):
            return c + 1e-9 * jnp.sum(bwd(g, flat + c * 1e-7)), None
        return jax.lax.scan(body, 0.0, None, length=reps)[0]

    sync(fwd(table, flat))
    t0 = time.perf_counter()
    sync(fwd_loop(table, flat))
    sync(fwd_loop(table, flat))
    t0 = time.perf_counter()
    sync(fwd_loop(table, flat))
    dt = (time.perf_counter() - t0) / 8
    print(f"fwd: {dt*1e3:.2f} ms for {n} pts -> {n/dt/1e6:.1f} M pts/s")

    sync(bwd(g, flat))
    sync(bwd_loop(g, flat))
    t0 = time.perf_counter()
    sync(bwd_loop(g, flat))
    dt = (time.perf_counter() - t0) / 8
    print(f"bwd: {dt*1e3:.2f} ms for {n} pts -> {n/dt/1e6:.1f} M pts/s")

    # full fwd+bwd through the encoder custom_vjp (shared prepass residuals)
    enc_p = HashGridEncoder(BBOX, n_levels=16, log2_hashmap_size=19,
                            base_resolution=16, finest_resolution=1024,
                            scheme="blocked", use_pallas=True)

    @jax.jit
    def vjp_loop(table, flat, reps=8):
        def body(c, _):
            def loss(t):
                feats, _ = enc_p({"table": t}, flat + c * 1e-7)
                return jnp.sum(feats * g)
            return c + 1e-9 * jnp.sum(jax.grad(loss)(table)), None
        return jax.lax.scan(body, 0.0, None, length=reps)[0]

    sync(vjp_loop(table, flat))
    t0 = time.perf_counter()
    sync(vjp_loop(table, flat))
    dt = (time.perf_counter() - t0) / 8
    print(f"fwd+bwd (shared prepass): {dt*1e3:.2f} ms for {n} pts "
          f"-> {n/dt/1e6:.1f} M pts/s")


if __name__ == "__main__":
    main()
