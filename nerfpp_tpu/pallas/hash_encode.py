"""Fused multiresolution hash-encode kernel for TPU (Pallas/Mosaic).

The TPU-native equivalent of the reference's fused CUDA encoder
(CuHashEmbedder.cu:9-102): hashing, 8-corner gather, and trilinear blending in
one kernel with no HBM intermediates. The design is driven by measured v5e
behavior (see PERFORMANCE.md):

- XLA element gathers run on the scalar core (~0.12 G/s) — unusable.
- Mosaic's only vector gather is ``tpu.dynamic_gather`` *within one (8, 128)
  VREG* (take_along_axis over <=8 sublanes or <=128 lanes).
- Therefore: all level tables live in VMEM, tiled as [8, 128]-entry blocks
  (1024 entries/tile), and a query VREG of 128 points is resolved per tile by
  a two-stage gather — lane-gather with the low 7 index bits, then
  sublane-gather with the next 3 bits — plus a select on the tile id. Cost is
  O(T/1024) VREG ops per 128 queries, so the kernel requires
  T <= 2^13 entries/level (whole 16-level x 2-feature f32 table = 1 MB VMEM).

Large-T (2^19) tables remain on the XLA path
(encoders/hashgrid.py::gather_trilerp_reference); the binned-gather kernel for
large T is the round-2 roadmap item.

The backward pass reuses the XLA scatter-add VJP of the reference
implementation (correctness path); the fused kernel is primarily the
*rendering* and inference fast path where no gradient is needed.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# corner order: bit2 -> x+1, bit1 -> y+1, bit0 -> z+1 (matches
# encoders/hashgrid._CORNER_OFFSETS)
_CORNERS = [((d >> 2) & 1, (d >> 1) & 1, d & 1) for d in range(8)]

MAX_VMEM_TABLE_BYTES = 4 * 1024 * 1024


def supports(n_levels: int, level_size: int, n_features: int) -> bool:
    """Whether the fused kernel can hold the whole table in VMEM."""
    return (n_features == 2 and level_size % 1024 == 0
            and n_levels * level_size * n_features * 4 <= MAX_VMEM_TABLE_BYTES)


def _make_kernel(n_levels: int, level_size: int, point_block: int,
                 box_min, box_max, level_scales, primes, scheme: str,
                 resolutions):
    """Build the kernel body. All geometry/hash constants are Python floats
    baked into the program (they are fixed at encoder construction)."""
    n_tiles = level_size // 1024
    n_rows = point_block // 128
    inv_extent = [1.0 / (box_max[a] - box_min[a]) for a in range(3)]

    def kernel(pts_ref, tab0_ref, tab1_ref, out_ref):
        # pts_ref: [8, point_block] (rows 0..2 = x, y, z; padded to 8 sublanes)
        # tabF_ref: [n_levels * n_tiles, 8, 128] feature-F table tiles
        # out_ref: [2 * n_levels, point_block] (feature-major rows, see wrapper)
        for r in range(n_rows):
            sl = slice(r * 128, (r + 1) * 128)
            x = pts_ref[0:1, sl]
            y = pts_ref[1:2, sl]
            z = pts_ref[2:3, sl]
            for l in range(n_levels):
                if scheme == "random":
                    sx = (x - box_min[0]) * (inv_extent[0] * level_scales[l])
                    sy = (y - box_min[1]) * (inv_extent[1] * level_scales[l])
                    sz = (z - box_min[2]) * (inv_extent[2] * level_scales[l])
                else:  # fixed: cell = (p - min) / grid_size, grid = extent/res
                    sx = (x - box_min[0]) * (inv_extent[0] * resolutions[l])
                    sy = (y - box_min[1]) * (inv_extent[1] * resolutions[l])
                    sz = (z - box_min[2]) * (inv_extent[2] * resolutions[l])
                bx = jnp.floor(sx)
                by = jnp.floor(sy)
                bz = jnp.floor(sz)
                fx = sx - bx
                fy = sy - by
                fz = sz - bz
                # Mosaic lacks f32->u32 casts; go through int32 (coords are
                # non-negative after the bbox clamp, so the reinterpret is safe)
                ux = bx.astype(jnp.int32).astype(jnp.uint32)
                uy = by.astype(jnp.int32).astype(jnp.uint32)
                uz = bz.astype(jnp.int32).astype(jnp.uint32)
                pa = jnp.uint32(primes[l][0])
                pb = jnp.uint32(primes[l][1])
                pc = jnp.uint32(primes[l][2])

                acc0 = jnp.zeros((1, 128), jnp.float32)
                acc1 = jnp.zeros((1, 128), jnp.float32)
                for (dx, dy, dz) in _CORNERS:
                    h = (((ux + jnp.uint32(dx)) * pa)
                         ^ ((uy + jnp.uint32(dy)) * pb)
                         ^ ((uz + jnp.uint32(dz)) * pc))
                    idx = (h & jnp.uint32(level_size - 1)).astype(jnp.int32)
                    w = ((fx if dx else 1.0 - fx)
                         * (fy if dy else 1.0 - fy)
                         * (fz if dz else 1.0 - fz))          # [1, 128]

                    lane = idx & 127                           # low 7 bits
                    sub = (idx >> 7) & 7                       # next 3 bits
                    tile_id = idx >> 10                        # remaining bits
                    lane_r = jnp.broadcast_to(lane, (8, 128))
                    sub_r = jnp.broadcast_to(sub, (8, 128))

                    v0 = jnp.zeros((1, 128), jnp.float32)
                    v1 = jnp.zeros((1, 128), jnp.float32)
                    for t in range(n_tiles):
                        tile0 = tab0_ref[l * n_tiles + t]      # [8, 128]
                        tile1 = tab1_ref[l * n_tiles + t]
                        g0 = jnp.take_along_axis(tile0, lane_r, axis=1)
                        g0 = jnp.take_along_axis(g0, sub_r, axis=0)[0:1, :]
                        g1 = jnp.take_along_axis(tile1, lane_r, axis=1)
                        g1 = jnp.take_along_axis(g1, sub_r, axis=0)[0:1, :]
                        hit = tile_id == t
                        v0 = jnp.where(hit, g0, v0)
                        v1 = jnp.where(hit, g1, v1)
                    acc0 = acc0 + w * v0
                    acc1 = acc1 + w * v1
                out_ref[2 * l:2 * l + 1, sl] = acc0
                out_ref[2 * l + 1:2 * l + 2, sl] = acc1

    return kernel


def _make_kernel_v2(n_levels: int, level_size: int,
                    box_min, box_max, level_scales, primes, scheme: str,
                    resolutions, packed: bool):
    """Block-broadcast variant: 1024 *distinct* queries per VREG.

    v1 replicates 128 queries over 8 sublanes (7/8 lanes wasted) to enable the
    two-stage gather over 1024-entry tiles. v2 instead broadcasts one
    *128-entry block* of the table to all sublanes so a single lane-gather
    answers 1024 distinct queries at once: O(T/128) blocks x ~3 VREG ops per
    (level, corner) per 1024 points — ~2x v1's useful lane utilization. With
    ``packed`` the two bf16 features ride one uint32 lane (pack: f0 high,
    f1 low), halving gather traffic at bf16 feature precision (the CUDA
    reference stores fp16, CuHashEmbedder.cu:4-6).
    """
    n_blocks = level_size // 128
    inv_extent = [1.0 / (box_max[a] - box_min[a]) for a in range(3)]

    def kernel(pts_ref, tab_ref, out_ref):
        # pts_ref: [1, 3, 8, 128] (x/y/z planes of 1024 points, q = i*128+j)
        # tab_ref: packed: [L * n_blocks, 128] uint32
        #          unpacked: [L * n_blocks, 2, 128] f32 (f, lane)
        # out_ref: [1, 2 * n_levels, 8, 128]
        x = pts_ref[0, 0]
        y = pts_ref[0, 1]
        z = pts_ref[0, 2]
        for l in range(n_levels):
            scale = (level_scales[l] if scheme == "random" else resolutions[l])
            sx = (x - box_min[0]) * (inv_extent[0] * scale)
            sy = (y - box_min[1]) * (inv_extent[1] * scale)
            sz = (z - box_min[2]) * (inv_extent[2] * scale)
            bx = jnp.floor(sx)
            by = jnp.floor(sy)
            bz = jnp.floor(sz)
            fx = sx - bx
            fy = sy - by
            fz = sz - bz
            ux = bx.astype(jnp.int32).astype(jnp.uint32)
            uy = by.astype(jnp.int32).astype(jnp.uint32)
            uz = bz.astype(jnp.int32).astype(jnp.uint32)
            pa = jnp.uint32(primes[l][0])
            pb = jnp.uint32(primes[l][1])
            pc = jnp.uint32(primes[l][2])

            acc0 = jnp.zeros((8, 128), jnp.float32)
            acc1 = jnp.zeros((8, 128), jnp.float32)
            for (dx, dy, dz) in _CORNERS:
                h = (((ux + jnp.uint32(dx)) * pa)
                     ^ ((uy + jnp.uint32(dy)) * pb)
                     ^ ((uz + jnp.uint32(dz)) * pc))
                idx = (h & jnp.uint32(level_size - 1)).astype(jnp.int32)
                w = ((fx if dx else 1.0 - fx)
                     * (fy if dy else 1.0 - fy)
                     * (fz if dz else 1.0 - fz))              # [8, 128]
                lane = idx & 127
                blk = idx >> 7                                 # [8, 128]

                if packed:
                    v = jnp.zeros((8, 128), jnp.uint32)
                    for b in range(n_blocks):
                        row = tab_ref[l * n_blocks + b:l * n_blocks + b + 1, :]
                        bc = jnp.broadcast_to(row, (8, 128))
                        g = jnp.take_along_axis(bc, lane, axis=1)
                        v = jnp.where(blk == b, g, v)
                    # unpack: f0 = high 16 bits, f1 = low 16 bits (bf16)
                    v0 = pltpu.bitcast(v & jnp.uint32(0xFFFF0000), jnp.float32)
                    v1 = pltpu.bitcast(v << 16, jnp.float32)
                else:
                    v0 = jnp.zeros((8, 128), jnp.float32)
                    v1 = jnp.zeros((8, 128), jnp.float32)
                    for b in range(n_blocks):
                        r0 = tab_ref[l * n_blocks + b, 0:1, :]
                        r1 = tab_ref[l * n_blocks + b, 1:2, :]
                        g0 = jnp.take_along_axis(
                            jnp.broadcast_to(r0, (8, 128)), lane, axis=1)
                        g1 = jnp.take_along_axis(
                            jnp.broadcast_to(r1, (8, 128)), lane, axis=1)
                        hit = blk == b
                        v0 = jnp.where(hit, g0, v0)
                        v1 = jnp.where(hit, g1, v1)
                acc0 = acc0 + w * v0
                acc1 = acc1 + w * v1
            out_ref[0, 2 * l] = acc0
            out_ref[0, 2 * l + 1] = acc1

    return kernel


def pack_table_bf16(table: jnp.ndarray) -> jnp.ndarray:
    """[R, 2] f32 -> [R] uint32 with bf16(f0) in the high and bf16(f1) in the
    low 16 bits."""
    b0 = jax.lax.bitcast_convert_type(
        table[:, 0].astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    b1 = jax.lax.bitcast_convert_type(
        table[:, 1].astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    return (b0 << 16) | b1


@functools.partial(jax.jit, static_argnames=(
    "n_levels", "level_size", "scheme", "box_min", "box_max",
    "level_scales", "primes", "resolutions", "point_block", "version",
    "packed"))
def hash_encode_fused(table: jnp.ndarray, points: jnp.ndarray, *,
                      n_levels: int, level_size: int, scheme: str,
                      box_min: tuple, box_max: tuple,
                      level_scales: tuple, primes: tuple, resolutions: tuple,
                      point_block: int = 512, version: str = "v2",
                      packed: bool = False) -> jnp.ndarray:
    """Fused encode. table: [n_levels * level_size, 2] f32 (the standard
    HashGridEncoder parameter); points: [N, 3] f32 (pre-clamped to the bbox).
    Returns [N, n_levels * 2] features (level-major, feature-minor — identical
    to the XLA path; with packed=True, features carry bf16 precision)."""
    if version == "v2":
        return _hash_encode_v2(table, points, n_levels, level_size, scheme,
                               box_min, box_max, level_scales, primes,
                               resolutions, packed)
    n = points.shape[0]
    n_pad = -(-n // point_block) * point_block
    pts_t = jnp.zeros((8, n_pad), jnp.float32)
    pts_t = pts_t.at[:3, :n].set(points.T)

    n_tiles = level_size // 1024
    # [L*T, 2] -> per feature [L * n_tiles, 8, 128]
    tabs = table.reshape(n_levels * n_tiles, 8, 128, 2)
    tab0 = tabs[..., 0]
    tab1 = tabs[..., 1]

    kernel = _make_kernel(n_levels, level_size, point_block,
                          box_min, box_max, level_scales, primes, scheme,
                          resolutions)
    grid = (n_pad // point_block,)
    # interpret mode makes the kernel runnable (slowly) on CPU for tests;
    # on TPU it compiles through Mosaic.
    interpret = jax.devices()[0].platform != "tpu"
    out_t = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((2 * n_levels, n_pad), jnp.float32),
        in_specs=[
            pl.BlockSpec((8, point_block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_levels * n_tiles, 8, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_levels * n_tiles, 8, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2 * n_levels, point_block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(pts_t, tab0, tab1)

    # [2L, N] feature-major (f fastest within level) -> [N, L*2]
    out = out_t[:, :n].T
    return out


def _hash_encode_v2(table, points, n_levels, level_size, scheme,
                    box_min, box_max, level_scales, primes, resolutions,
                    packed):
    n = points.shape[0]
    pb = 1024
    n_pad = -(-n // pb) * pb
    g = n_pad // pb
    pts = jnp.zeros((n_pad, 3), jnp.float32).at[:n].set(points)
    # [G, 3, 8, 128]: plane a holds coordinate a of points q = i*128 + j
    pts_b = pts.reshape(g, 8, 128, 3).transpose(0, 3, 1, 2)

    n_blocks = level_size // 128
    if packed:
        tab = pack_table_bf16(table).reshape(n_levels * n_blocks, 128)
        tab_spec = pl.BlockSpec((n_levels * n_blocks, 128), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
    else:
        # [L*nb, 2, 128]: (block row, feature, lane)
        tab = table.reshape(n_levels * n_blocks, 128, 2).transpose(0, 2, 1)
        tab_spec = pl.BlockSpec((n_levels * n_blocks, 2, 128),
                                lambda i: (0, 0, 0), memory_space=pltpu.VMEM)

    kernel = _make_kernel_v2(n_levels, level_size, box_min, box_max,
                             level_scales, primes, scheme, resolutions, packed)
    interpret = jax.devices()[0].platform != "tpu"
    out_b = pl.pallas_call(
        kernel,
        grid=(g,),
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((g, 2 * n_levels, 8, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, 3, 8, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            tab_spec,
        ],
        out_specs=pl.BlockSpec((1, 2 * n_levels, 8, 128),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )(pts_b, tab)

    # [G, 2L, 8, 128] -> [N, 2L]
    out = out_b.transpose(0, 2, 3, 1).reshape(n_pad, 2 * n_levels)[:n]
    return out


def gather_trilerp(table: jnp.ndarray, idx: jnp.ndarray,
                   frac: jnp.ndarray) -> jnp.ndarray:
    """Drop-in for encoders.hashgrid.gather_trilerp_reference backed by the
    fused kernel is NOT provided at this interface: the kernel fuses hashing
    too, so HashGridEncoder calls hash_encode_fused directly (see
    encoders/hashgrid.HashGridEncoder.__call__). This symbol exists so older
    call sites fail loudly."""
    raise NotImplementedError(
        "use HashGridEncoder(use_pallas=True) -> hash_encode_fused")
