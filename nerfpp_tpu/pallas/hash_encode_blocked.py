"""Large-table fused hash-grid encode for TPU: the "blocked" scheme kernel.

TPU-native equivalent of the reference's fused CUDA encoder at production
table sizes (CuHashEmbedder.cu:9-102 with T=2^19, main.cpp:189). The v2
kernel (hash_encode.py) holds the whole table in VMEM and sweeps every
128-entry block per query VREG — O(T) work that dies beyond T=2^13. This
kernel makes large T cheap with three structural moves:

1. **Block-halo table layout** (encoders/hashgrid.py scheme="blocked"):
   4^3-cell blocks with a one-vertex halo put all 8 trilerp corners of any
   cell in ONE 128-lane table row, and Morton-ordered slots with a per-level
   region phase keep spatially-adjacent blocks in adjacent rows.
2. **Windowed gather**: spatially coherent point groups (ray tiles, raster
   render order) touch a small contiguous row range per level. An XLA
   prepass computes each group's aligned row window [base, base + 8*cnt);
   the kernel fori-loops over the cnt 8-row windows and resolves 128
   replicated queries per corner with the two-stage VREG gather
   (lane-gather then sublane-gather) — O(spread), not O(T).
3. **Level-staged pipeline**: the grid is (level, group-block); the level's
   [S, 128] packed table slab is one BlockSpec input that Pallas stages
   HBM->VMEM once per level (revisited across group-blocks), so arbitrary-T
   tables live in HBM with only 2 * slab bytes of VMEM.

Features are bf16-packed pairs in one uint32 lane (f0 high, f1 low), like
the CUDA reference's fp16 storage (CuHashEmbedder.cu:4-6); the master
parameter stays f32.

The backward kernel shares the window structure and scatters gradients into
a per-level VMEM slab accumulated across group-blocks, using the rank-1
trilerp factorization: the 8 corner contributions of a point are
(wx outer wy outer wz) placed at its base lane, so the scatter is one
row-one-hot matmul on the MXU plus 8 static lane shifts, not 8 atomic adds
(cf. CuHashEmbedder.cu:106-201's atomicAdd backward).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerfpp_tpu.encoders import hashgrid as HG

LANES = 128
GROUPS_PER_BLOCK = 8          # groups (128 pts each) per grid step
MAX_SMEM_BASES_BYTES = 128 * 1024   # per-level window table; probed safe


def _next_mult(x: int, m: int) -> int:
    return -(-x // m) * m


def max_points_per_call() -> int:
    """Group count per level is SMEM-bound (one int32 per group)."""
    return (MAX_SMEM_BASES_BYTES // 4) * 128


def build_boxes(pts: jnp.ndarray, enc):
    """XLA prepass: per (level, 128-point group) occupied-window bounding box.

    pts: [NG, 128, 3] padded points (clamped to the bbox). The windows of a
    group at level l are the aligned 2x2x2-block cubes ("octants") its blocks
    occupy; their coordinates in oct space span an axis-aligned box that the
    kernel enumerates exactly — immune to Morton-range blowups at curve
    seams. Returns two [L * NG_pad] int32 arrays:
      mins: ox0 | oy0 << 10 | oz0 << 20
      cnts: ex  | ey  << 10 | ez  << 20   (box side lengths, >= 1)
    """
    ng = pts.shape[0]
    cell, _ = enc.blocked_cell_frac(pts.reshape(-1, 3))     # [N, L, 3]
    oct_ = enc.blocked_oct(cell).reshape(ng, 128, enc.n_levels, 3) >> 1
    lo = jnp.min(oct_, axis=1)                              # [NG, L, 3]
    hi = jnp.max(oct_, axis=1)
    ext = hi - lo + 1
    def pack(v):
        p = (v[..., 0] | (v[..., 1] << 10) | (v[..., 2] << 20)).T  # [L, NG]
        ng_pad = _next_mult(ng, 1024)  # SMEM int32 arrays tile at 1024
        return jnp.pad(p, ((0, 0), (0, ng_pad - ng))).reshape(-1).astype(
            jnp.int32)
    return pack(lo), pack(ext)


def _tree_sum(vals):
    while len(vals) > 1:
        vals = [a + b for a, b in zip(vals[::2], vals[1::2])] + (
            [vals[-1]] if len(vals) % 2 else [])
    return vals[0]


def _spread_bits(v):
    """Interleave-spread the low 10 bits of v (x -> bit 3i). Works on VREGs
    and on traced scalars (the kernel uses it on both)."""
    v = v & 0x3FF
    v = (v | (v << 16)) & 0x30000FF
    v = (v | (v << 8)) & 0x300F00F
    v = (v | (v << 4)) & 0x30C30C3
    v = (v | (v << 2)) & 0x9249249
    return v


def _make_fwd_kernel(n_levels: int, s_rows: int, groups: int,
                     box_min, box_max):
    inv = [1.0 / (box_max[a] - box_min[a]) for a in range(3)]
    offs = [int(o) for o in HG._BLOCKED_CORNER_LANE_OFFSETS]

    def kernel(scales_ref, boffs_ref, mins_ref, exts_ref, pts_ref, tab_ref,
               out_ref):
        l = pl.program_id(0)
        gb = pl.program_id(1)
        scale = scales_ref[l]
        # per-group geometry (python lists indexed by group — all VREGs)
        oc_g, rr_g, lanes_g, w_g, box_g = [], [], [], [], []
        max_total = 1
        for gi in range(groups):
            cell, frac, ob = [], [], []
            for a in range(3):
                x = jnp.broadcast_to(pts_ref[0, a, gi:gi + 1, :], (8, LANES))
                s = (x - box_min[a]) * (inv[a] * scale)
                c = s.astype(jnp.int32)          # floor: s >= 0 after clamp
                cell.append(c)
                frac.append(s - c.astype(jnp.float32))
                ob.append((c >> 2) + boffs_ref[3 * l + a])
            # the point's window cube coords + its (sublane, lane) in the row
            oc_g.append([b >> 1 for b in ob])
            rr_g.append((ob[0] & 1) | ((ob[1] & 1) << 1) | ((ob[2] & 1) << 2))
            base_lane = ((cell[0] & 3) * 25 + (cell[1] & 3) * 5
                         + (cell[2] & 3))
            lanes_g.append([base_lane + o for o in offs])
            # trilerp corner weights, z fastest (matches _CORNER_OFFSETS)
            wx = [1.0 - frac[0], frac[0]]
            wy = [1.0 - frac[1], frac[1]]
            wz = [1.0 - frac[2], frac[2]]
            wxy = [wx[i] * wy[j] for i in range(2) for j in range(2)]
            w_g.append([wxy[d >> 1] * wz[d & 1] for d in range(8)])

            mins = mins_ref[gb * groups + gi]
            exts = exts_ref[gb * groups + gi]
            mx, my, mz = mins & 1023, (mins >> 10) & 1023, mins >> 20
            ex, ey, ez = exts & 1023, (exts >> 10) & 1023, exts >> 20
            box_g.append((mx, my, mz, ex, ey, ez))
            max_total = jnp.maximum(max_total, ex * ey * ez)

        def window(gi, ox, oy, oz):
            """One window of group gi; windows outside the group's box
            self-mask (octant-equality hit test fails)."""
            m = (_spread_bits(ox) | (_spread_bits(oy) << 1)
                 | (_spread_bits(oz) << 2))
            ws = (m << 3) & (s_rows - 1)
            win = tab_ref[pl.ds(ws, 8), :]
            oc, rr, lanes, w = oc_g[gi], rr_g[gi], lanes_g[gi], w_g[gi]
            hitf = ((oc[0] == ox) & (oc[1] == oy)
                    & (oc[2] == oz)).astype(jnp.float32)
            p0, p1 = [], []
            for c in range(8):
                gat = jnp.take_along_axis(win, lanes[c], axis=1)
                gat = jnp.take_along_axis(gat, rr, axis=0)
                v0 = pltpu.bitcast(gat & jnp.uint32(0xFFFF0000), jnp.float32)
                v1 = pltpu.bitcast(gat << 16, jnp.float32)
                p0.append(w[c] * v0)
                p1.append(w[c] * v1)
            return hitf * _tree_sum(p0), hitf * _tree_sum(p1)

        # Window 0 (the box corner) always exists for every group: unrolled,
        # written straight to the output block. A fori_loop entry costs
        # ~400 ns (pipeline flush) vs ~24 ns per window body, so there is
        # exactly ONE loop per (level, group-block), covering all groups to
        # the max box size; groups whose box is exhausted waste a masked
        # gather but no control flow.
        for gi in range(groups):
            mx, my, mz = box_g[gi][:3]
            a0, a1 = window(gi, mx, my, mz)
            out_ref[0, 0, gi:gi + 1, :] = a0[0:1, :]
            out_ref[0, 1, gi:gi + 1, :] = a1[0:1, :]

        def body(j, carry):
            for gi in range(groups):
                mx, my, mz, ex, ey, ez = box_g[gi]
                oz = j % ez
                t = j // ez
                oy = t % ey
                ox = t // ey
                # beyond-box j for this group decodes to out-of-box coords
                # (ox >= ex) -> hitf == 0
                b0, b1 = window(gi, mx + ox, my + oy, mz + oz)
                out_ref[0, 0, gi:gi + 1, :] += b0[0:1, :]
                out_ref[0, 1, gi:gi + 1, :] += b1[0:1, :]
            return carry

        jax.lax.fori_loop(1, max_total, body, 0)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("n_levels", "s_rows", "box_min", "box_max"))
def _fwd_call(tab_packed, pts_b, mins, exts, scales, boffs, *,
              n_levels, s_rows, box_min, box_max):
    ng = pts_b.shape[0] * GROUPS_PER_BLOCK
    ng_base = mins.shape[0] // n_levels      # 1024-padded group count
    n_gb = pts_b.shape[0]
    kernel = _make_fwd_kernel(n_levels, s_rows, GROUPS_PER_BLOCK,
                              box_min, box_max)
    interpret = jax.devices()[0].platform != "tpu"
    out = pl.pallas_call(
        kernel,
        grid=(n_levels, n_gb),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((n_levels,), lambda l, g: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((3 * n_levels,), lambda l, g: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((ng_base,), lambda l, g: (l,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((ng_base,), lambda l, g: (l,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, GROUPS_PER_BLOCK, LANES),
                         lambda l, g: (g, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s_rows, LANES), lambda l, g: (l, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, GROUPS_PER_BLOCK, LANES),
                               lambda l, g: (l, 0, g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_levels, 2, ng, LANES), jnp.float32),
    )(scales, boffs, mins, exts, pts_b, tab_packed)
    return out


def hash_encode_blocked(table: jnp.ndarray, points: jnp.ndarray, enc
                        ) -> jnp.ndarray:
    """Forward encode. table: [L * 2^T, 2] f32 master parameter;
    points: [N, 3] f32 pre-clamped. Returns [N, 2L] (level-major,
    feature-minor — same layout as the XLA path)."""
    from nerfpp_tpu.pallas.hash_encode import pack_table_bf16
    n = points.shape[0]
    l, s = enc.n_levels, enc.block_slots
    pts_per_block = GROUPS_PER_BLOCK * LANES
    n_pad = _next_mult(max(n, 1), pts_per_block)
    if n_pad // 128 > MAX_SMEM_BASES_BYTES // 4:
        raise ValueError(
            f"{n} points exceeds max_points_per_call()="
            f"{max_points_per_call()}; chunk the encode upstream")
    # pad with box_min: valid coordinates, results discarded
    pad_val = jnp.asarray(enc.bounding_box[:3])
    pts = jnp.full((n_pad, 3), 0.0, jnp.float32).at[:].set(pad_val)
    pts = pts.at[:n].set(points)
    ng = n_pad // 128
    pts_g = pts.reshape(ng, 128, 3)
    mins, exts = build_boxes(pts_g, enc)                   # [L * NG_pad] x2
    # [NG, 128, 3] -> [n_gb, 3, G, 128]
    pts_b = (pts_g.reshape(ng // GROUPS_PER_BLOCK, GROUPS_PER_BLOCK, 128, 3)
             .transpose(0, 3, 1, 2))
    tab_packed = pack_table_bf16(table).reshape(l * s, LANES)
    scales = jnp.asarray(enc.level_scales, jnp.float32)
    boffs = jnp.asarray(enc.block_offsets, jnp.int32).reshape(-1)
    out = _fwd_call(tab_packed, pts_b, mins, exts, scales, boffs,
                    n_levels=l, s_rows=s,
                    box_min=tuple(float(v) for v in enc.bounding_box[:3]),
                    box_max=tuple(float(v) for v in enc.bounding_box[3:]))
    # [L, 2, NG, 128] -> [N, 2L] (level-major, feature-minor)
    feats = out.transpose(2, 3, 0, 1).reshape(n_pad, 2 * l)[:n]
    return feats
