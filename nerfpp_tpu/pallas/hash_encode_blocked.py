"""Large-table fused hash-grid encode for TPU: the "blocked" scheme kernels.

TPU-native equivalent of the reference's fused CUDA encoder at production
table sizes (CuHashEmbedder.cu:9-102 with T=2^19, main.cpp:189). The v2
kernel (hash_encode.py) holds the whole table in VMEM and sweeps every
128-entry block per query VREG — O(T) work that dies beyond T=2^13. This
kernel makes large T cheap with three structural moves:

1. **Block-halo table layout** (encoders/hashgrid.py scheme="blocked"):
   4^3-cell blocks with a one-vertex halo put all 8 trilerp corners of any
   cell in ONE 128-lane table row, and Morton-ordered slots with a per-level
   region phase keep spatially-adjacent blocks in adjacent rows.
2. **Exact window lists**: a window is the aligned 8-row table range of one
   2x2x2-block octant. An XLA prepass sorts each 128-point group's per-level
   window morton codes and compacts them to the unique set (a 128-lane
   bitonic sort — vectorized, cheap). The kernel fori-loops over that list
   and resolves all 128 queries per window with the two-stage VREG gather.
   Work is O(#occupied windows) — at most 128 per (group, level) by
   construction, ~1-4 for coherent groups — never O(bounding-box volume),
   so pathologically incoherent inputs degrade gracefully instead of
   blowing up (a ray-major flattened batch of random pixels is ~50x slower
   than a coherent one, not 10^4x).
3. **Level-staged pipeline**: the grid is (level, group-block); the level's
   [S, 128] packed table slab is one BlockSpec input that Pallas stages
   HBM->VMEM once per level (revisited across group-blocks), so arbitrary-T
   tables live in HBM with only 2 * slab bytes of VMEM.

Features are bf16-packed pairs in one uint32 lane (f0 high, f1 low), like
the CUDA reference's fp16 storage (CuHashEmbedder.cu:4-6); the master
parameter stays f32.

The backward kernel shares the window-list structure and scatters gradients
into a per-level VMEM slab accumulated across group-blocks, using the
rank-1 trilerp factorization: a point's 8 corner contributions within its
single block row are the tensor (wx outer wy outer wz) placed at lane
u*25 + v*5 + w, so each window's scatter is ONE [8, 128q] x [128q, 128lane]
MXU matmul per feature — no atomics (cf. CuHashEmbedder.cu:106-201's
atomicAdd backward), no transposes.
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
GROUPS_PER_BLOCK = 16         # groups (128 pts each) per fwd/bwd grid step
# Window-list slots resolved per MXU matmul: w windows stack to a
# [16*w, 128] x [128, 128] op, so the group's pattern matrix is loaded into
# the MXU once per w windows (vs once per [16, 128] sliver) and coherent
# group-blocks (maxcnt <= w) never enter the window fori_loop at all — the
# unrolled init covers them. The trade: the init always EXECUTES w window
# slots per group, so larger w buys matmul efficiency with sentinel waste
# when typical unique counts sit below it. Tuned separately (TPU sweep,
# PERFORMANCE.md round-5): the backward pays 2 extra VMEM row-range
# accumulates per slot, so its optimum is smaller than the forward's.
WINDOW_BATCH_FWD = 8
WINDOW_BATCH_BWD = 8
# The window-list prepass kernel runs at its own (smaller) block size: its
# bitonic sort is measurably fastest on single-VREG [8, 128] operands, while
# the fwd/bwd kernels amortize their fori_loop flush best at 16 groups.
# _prepare() reorders the prepass output to the fwd/bwd layout in XLA.
PREPASS_GROUPS = 8
MAX_SMEM_COUNTS_BYTES = 128 * 1024   # per-level window-count table; probed safe
# sentinel for padded window-list slots: larger than any morton3 value (2^30-1)
_SENTINEL = np.int32(0x7FFFFFFF)


def _next_mult(x: int, m: int) -> int:
    return -(-x // m) * m


def max_points_per_call() -> int:
    """Group-block count per level is SMEM-bound (one int32 per block)."""
    return (MAX_SMEM_COUNTS_BYTES // 4) * GROUPS_PER_BLOCK * 128


def build_window_lists(pts: jnp.ndarray, enc):
    """XLA prepass: per (level, 128-point group) sorted unique window ids.

    pts: [NG, 128, 3] padded points (clamped to the bbox). A group's windows
    at level l are the aligned 2x2x2-block octants its points' blocks occupy,
    identified by their morton code. Returns:
      wids:   [L * NG * 128] int32 — per (level, group) the sorted unique
              window mortons, tail-padded with _SENTINEL (never a valid id).
      maxcnt: [L * NGB_pad] int32 — per (level, group-block) the max unique
              count over the block's 8 groups (the kernel's loop bound).
    """
    ng = pts.shape[0]
    n_gb = ng // GROUPS_PER_BLOCK
    l = enc.n_levels
    cell, _ = enc.blocked_cell_frac(pts.reshape(-1, 3))     # [N, L, 3]
    oct_ = enc.blocked_oct(cell) >> 1                       # [N, L, 3]
    m = HG.morton3(oct_[..., 0], oct_[..., 1], oct_[..., 2])
    m = m.reshape(ng, 128, l).transpose(2, 0, 1)            # [L, NG, 128]
    s = jnp.sort(m, axis=-1)
    flags = jnp.concatenate(
        [jnp.ones(s.shape[:-1] + (1,), bool), s[..., 1:] != s[..., :-1]], -1)
    cnt = jnp.sum(flags, axis=-1).astype(jnp.int32)         # [L, NG]
    ids = jnp.where(flags, s, _SENTINEL)
    ids = jnp.sort(ids, axis=-1)                            # unique ids first
    cntb = cnt.reshape(l, n_gb, GROUPS_PER_BLOCK).max(-1)   # [L, n_gb]
    ngb_pad = _next_mult(n_gb, 1024)  # SMEM int32 arrays tile at 1024
    maxcnt = jnp.pad(cntb, ((0, 0), (0, ngb_pad - n_gb))).reshape(-1)
    return ids.reshape(-1).astype(jnp.int32), maxcnt


def _lane_roll(v, shift):
    """Cyclic lane rotation: out[l] = v[(l - shift) % 128] (concat of lane
    slices — Mosaic lowers this to native in-VREG shifts)."""
    s = shift % 128
    if s == 0:
        return v
    return jnp.concatenate([v[:, -s:], v[:, :-s]], axis=1)


def _bitonic_sort_lanes(v, lane):
    """Ascending bitonic sort of the 128 lanes of ``v`` ([8, 128] int32),
    each sublane sorted independently (8 groups packed per VREG). 28
    compare-exchange stages of roll + select + min/max — ~6x faster than
    XLA's variadic sort at this shape."""
    for k in [2, 4, 8, 16, 32, 64, 128]:
        asc = (lane & k) == 0
        d = k // 2
        while d >= 1:
            lower = (lane & d) == 0
            p = jnp.where(lower, _lane_roll(v, -d), _lane_roll(v, d))
            take_min = lower == asc
            v = jnp.where(take_min, jnp.minimum(v, p), jnp.maximum(v, p))
            d //= 2
    return v


def _make_windows_kernel(n_levels: int, groups: int, box_min, box_max):
    """Fused window-list prepass: per (group-block) compute every level's
    per-group morton codes, bitonic-sort them in-register, first-occurrence
    dedup (roll-by-1 compare), sentinel-replace + re-sort to compact the
    unique ids to the front, and emit per-group unique counts. The 8 groups
    of the block ride the 8 sublanes of one VREG, so each sort processes
    all of them at once."""
    inv = [1.0 / (box_max[a] - box_min[a]) for a in range(3)]

    def kernel(scales_ref, boffs_ref, pts_ref, wids_ref, cnt_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (groups, LANES), 1)
        for l in range(n_levels):
            scale = scales_ref[l]
            m = jnp.zeros((groups, LANES), jnp.int32)
            for a in range(3):
                x = pts_ref[0, a]                       # [G, 128]
                c = ((x - box_min[a]) * (inv[a] * scale)).astype(jnp.int32)
                ob = (c >> 2) + boffs_ref[3 * l + a]
                m = m | (_spread_bits(ob >> 1) << a)
            s = _bitonic_sort_lanes(m, lane)
            first = (s != _lane_roll(s, 1)) | (lane == 0)
            cnt = jnp.sum(first.astype(jnp.int32), axis=1, keepdims=True)
            ids = jnp.where(first, s, _SENTINEL)
            wids_ref[0, l] = _bitonic_sort_lanes(ids, lane)
            cnt_ref[0, l] = jnp.broadcast_to(cnt, (groups, LANES))

    return kernel


@functools.partial(jax.jit, static_argnames=("n_levels", "box_min", "box_max"))
def _windows_call(pts_b, scales, boffs, *, n_levels, box_min, box_max):
    n_gb = pts_b.shape[0]
    g = pts_b.shape[2]
    kernel = _make_windows_kernel(n_levels, g, box_min, box_max)
    interpret = jax.devices()[0].platform != "tpu"
    wids, cnts = pl.pallas_call(
        kernel,
        grid=(n_gb,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((n_levels,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((3 * n_levels,), lambda i: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, g, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, n_levels, g, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_levels, g, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_gb, n_levels, g, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_gb, n_levels, g, LANES), jnp.int32),
        ],
    )(scales, boffs, pts_b)
    return wids, cnts


def _spread_bits(v):
    """Interleave-spread the low 10 bits of v (x -> bit 3i). Works on VREGs
    and on traced scalars (the kernel uses it on both)."""
    v = v & 0x3FF
    v = (v | (v << 16)) & 0x30000FF
    v = (v | (v << 8)) & 0x300F00F
    v = (v | (v << 4)) & 0x30C30C3
    v = (v | (v << 2)) & 0x9249249
    return v


def _block_geometry(pts_ref, boffs_ref, scale, l, box_min, inv):
    """Shared fwd/bwd geometry computed ONCE per (level, group-block) on the
    whole [G, 128] point block (vs per-group [8, 128] recompute — a ~3x cut
    of the kernel's fixed per-group cost). Returns per-axis frac/local-vertex
    stacks and the block-wide window morton + row parity, all [G, 128]."""
    fracs, locs, ob = [], [], []
    for a in range(3):
        x = pts_ref[0, a]                # [G, 128]
        s = (x - box_min[a]) * (inv[a] * scale)
        c = s.astype(jnp.int32)          # floor: s >= 0 after clamp
        fracs.append(s - c.astype(jnp.float32))
        locs.append(c & 3)
        ob.append((c >> 2) + boffs_ref[3 * l + a])
    m_q = (_spread_bits(ob[0] >> 1) | (_spread_bits(ob[1] >> 1) << 1)
           | (_spread_bits(ob[2] >> 1) << 2))
    rr = (ob[0] & 1) | ((ob[1] & 1) << 1) | ((ob[2] & 1) << 2)
    return fracs, locs, m_q, rr


def _row8(x, gi):
    """Row gi of a [G, 128] block value broadcast to the [8, 128] query VREG."""
    return jnp.broadcast_to(x[gi:gi + 1, :], (8, LANES))


def _pattern_matrix(fracs, locs, gi, iota_sub):
    """Per-(group, level) trilerp weight-pattern matrix P [128 lanes, 128 q]:
    P[lane, q] = the trilerp weight of the block-row vertex at ``lane``
    (= u*25 + v*5 + w in the 5x5x5 halo layout) for query q — nonzero only
    at q's 8 corner lanes. Both kernels ride it: the forward resolves a
    window as (win_rows @ P), the backward scatters as (grad_rows @ P^T).

    Built from the per-axis 1-D weight stacks EX/EY/EZ (sublane u = weight
    of vertex offset u: (1-f) at the local vertex, f one up; rows 5-7 are
    identically zero so lanes >= 125 self-mask). The product is factored as
    EX[u] * (EY ⊗ EZ): one [25, 128] inner matrix EZY (row v*5+w), then five
    u-slabs — fewer sublane copies than expanding three full [128, 128]
    factors. f32 throughout with ONE final bf16 rounding per slab (the
    oracle tests bound the error to a single weight rounding)."""
    stacks = []
    for a in range(3):
        loc = _row8(locs[a], gi)
        f = _row8(fracs[a], gi)
        e = (jnp.where(loc == iota_sub, 1.0 - f, 0.0)
             + jnp.where(loc == (iota_sub - 1), f, 0.0))
        stacks.append(e)
    ex, ey, ez = stacks
    # lane decode: u = lane//25, v = (lane%25)//5, w = lane%5
    ezy = jnp.concatenate(
        [jnp.broadcast_to(ey[v:v + 1], (5, LANES)) for v in range(5)],
        axis=0) * jnp.concatenate([ez[0:5]] * 5, axis=0)     # [25, 128]
    parts = [(jnp.broadcast_to(ex[u:u + 1], (25, LANES)) * ezy
              ).astype(jnp.bfloat16) for u in range(5)]
    # lanes 125-127 decode to u = 5 whose EX row is identically zero
    # (loc <= 3), self-masking them
    parts.append((jnp.broadcast_to(ex[5:6], (3, LANES)) * ezy[:3]
                  ).astype(jnp.bfloat16))
    return jnp.concatenate(parts, axis=0)                    # [128, 128] bf16


def _make_fwd_kernel(n_levels: int, s_rows: int, groups: int,
                     box_min, box_max, wk=None):
    inv = [1.0 / (box_max[a] - box_min[a]) for a in range(3)]

    wk = WINDOW_BATCH_FWD if wk is None else wk

    def kernel(scales_ref, boffs_ref, wids_ref, maxcnt_ref, pts_ref, tab_ref,
               out_ref):
        l = pl.program_id(0)
        gb = pl.program_id(1)
        scale = scales_ref[l]
        iota_sub = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
        # block-wide geometry once, per-group pattern matrices (VREG lists)
        fracs, locs, m_q_b, rr_b = _block_geometry(
            pts_ref, boffs_ref, scale, l, box_min, inv)
        mq_g = [_row8(m_q_b, gi) for gi in range(groups)]
        rr_g = [_row8(rr_b, gi) for gi in range(groups)]
        p_g = [_pattern_matrix(fracs, locs, gi, iota_sub)
               for gi in range(groups)]

        def window_batch(gi, j0):
            """WINDOW_BATCH consecutive window-list slots of group gi resolve
            against all 128 queries with ONE [16*wk, 128lane] x
            [128lane, 128q] MXU matmul (at wk=8 a full 128x128x128 op —
            the pattern matrix stays loaded for all 8 windows instead of
            reloading per [16, 128] sliver). Sentinel-padded and foreign ids
            self-mask (morton-equality hit test fails); the row-parity
            select happens once per group after the loop."""
            ms, parts = [], []
            for k in range(wk):
                m = wids_ref[gi * 128 + j0 + k]
                ms.append(m)
                ws = (m << 3) & (s_rows - 1)
                win = tab_ref[pl.ds(ws, 8), :]
                parts.append(
                    pltpu.bitcast(win & jnp.uint32(0xFFFF0000), jnp.float32))
                parts.append(pltpu.bitcast(win << 16, jnp.float32))
            lhs = jnp.concatenate(parts, axis=0).astype(jnp.bfloat16)
            mw = jax.lax.dot_general(
                lhs, p_g[gi], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # [16*wk, 128q]
            a0 = a1 = None
            for k in range(wk):
                hitf = (mq_g[gi] == ms[k]).astype(jnp.float32)
                b0 = hitf * mw[16 * k:16 * k + 8]
                b1 = hitf * mw[16 * k + 8:16 * k + 16]
                a0 = b0 if a0 is None else a0 + b0
                a1 = b1 if a1 is None else a1 + b1
            return a0, a1

        # The first wk window slots (the coherent-group common case: every
        # unique id) are unrolled as the register-accumulator init — a
        # fori_loop entry costs ~400 ns (pipeline flush), so group-blocks
        # with maxcnt <= wk never enter the loop at all; the single loop
        # covers all groups to the block's max count in wk-window strides.
        acc = tuple(window_batch(gi, 0) for gi in range(groups))

        def body(j, carry):
            new = []
            for gi in range(groups):
                b0, b1 = window_batch(gi, j * wk)
                new.append((carry[gi][0] + b0, carry[gi][1] + b1))
            return tuple(new)

        nb = (maxcnt_ref[gb] + (wk - 1)) // wk
        acc = jax.lax.fori_loop(1, nb, body, acc)
        for gi in range(groups):
            a0 = jnp.take_along_axis(acc[gi][0], rr_g[gi], axis=0)
            a1 = jnp.take_along_axis(acc[gi][1], rr_g[gi], axis=0)
            out_ref[0, 0, gi:gi + 1, :] = a0[0:1, :]
            out_ref[0, 1, gi:gi + 1, :] = a1[0:1, :]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_levels", "s_rows", "box_min", "box_max", "wk"))
def _fwd_call(tab_packed, pts_b, wids, maxcnt, scales, boffs, *,
              n_levels, s_rows, box_min, box_max, wk=None):
    ng = pts_b.shape[0] * GROUPS_PER_BLOCK
    ngb_pad = maxcnt.shape[0] // n_levels    # 1024-padded group-block count
    n_gb = pts_b.shape[0]
    kernel = _make_fwd_kernel(n_levels, s_rows, GROUPS_PER_BLOCK,
                              box_min, box_max, wk)
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
            pl.BlockSpec((GROUPS_PER_BLOCK * 128,),
                         lambda l, g, _nl=n_levels: (g * _nl + l,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((ngb_pad,), lambda l, g: (l,),
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
    )(scales, boffs, wids, maxcnt, pts_b, tab_packed)
    return out


def _prepare(points: jnp.ndarray, enc):
    """Shared fwd/bwd prepass: pad to whole group-blocks, build window lists.

    Returns (pts_b [n_gb, 3, G, 128], wids, maxcnt, n_pad)."""
    n = points.shape[0]
    pts_per_block = GROUPS_PER_BLOCK * LANES
    n_pad = _next_mult(max(n, 1), pts_per_block)
    if n_pad > max_points_per_call():
        raise ValueError(
            f"{n} points exceeds max_points_per_call()="
            f"{max_points_per_call()}; chunk the encode upstream")
    # pad with box_min: valid coordinates, results discarded
    pad_val = jnp.asarray(enc.bounding_box[:3])
    pts = jnp.full((n_pad, 3), 0.0, jnp.float32).at[:].set(pad_val)
    pts = pts.at[:n].set(points)
    ng = n_pad // 128
    n_gb = ng // GROUPS_PER_BLOCK
    l = enc.n_levels
    # [NG, 128, 3] -> [n_gb, 3, G, 128] (fwd/bwd layout)
    pts_b = (pts.reshape(n_gb, GROUPS_PER_BLOCK, 128, 3).transpose(0, 3, 1, 2))
    scales = jnp.asarray(enc.level_scales, jnp.float32)
    boffs = jnp.asarray(enc.block_offsets, jnp.int32).reshape(-1)
    # prepass at its own block size; sub = PREPASS_GROUPS-chunks per fwd block
    sub = GROUPS_PER_BLOCK // PREPASS_GROUPS
    pts_p = pts.reshape(ng // PREPASS_GROUPS, PREPASS_GROUPS, 128,
                        3).transpose(0, 3, 1, 2)
    wids, cnts = _windows_call(
        pts_p, scales, boffs, n_levels=l,
        box_min=tuple(float(v) for v in enc.bounding_box[:3]),
        box_max=tuple(float(v) for v in enc.bounding_box[3:]))
    # [n_gb*sub, L, Gp, 128] -> fwd layout [n_gb, L, G, 128] flat
    wids = (wids.reshape(n_gb, sub, l, PREPASS_GROUPS, LANES)
            .transpose(0, 2, 1, 3, 4).reshape(-1))
    cntb = cnts[:, :, :, 0].max(-1)                         # [n_gb*sub, L]
    cntb = cntb.reshape(n_gb, sub, l).max(1).T              # [L, n_gb]
    ngb_pad = _next_mult(n_gb, 1024)  # SMEM int32 arrays tile at 1024
    maxcnt = jnp.pad(cntb, ((0, 0), (0, ngb_pad - n_gb))).reshape(-1)
    return pts_b, wids, maxcnt, n_pad


def encode_prepared(table: jnp.ndarray, prep, n: int, enc) -> jnp.ndarray:
    """Forward encode from a shared _prepare() result (fwd/bwd reuse it as
    custom_vjp residuals — one window-list build per training step)."""
    from nerfpp_tpu.pallas.hash_encode import pack_table_bf16
    pts_b, wids, maxcnt, n_pad = prep
    l, s = enc.n_levels, enc.block_slots
    tab_packed = pack_table_bf16(table).reshape(l * s, LANES)
    scales = jnp.asarray(enc.level_scales, jnp.float32)
    boffs = jnp.asarray(enc.block_offsets, jnp.int32).reshape(-1)
    out = _fwd_call(tab_packed, pts_b, wids, maxcnt, scales, boffs,
                    n_levels=l, s_rows=s,
                    box_min=tuple(float(v) for v in enc.bounding_box[:3]),
                    box_max=tuple(float(v) for v in enc.bounding_box[3:]))
    # [L, 2, NG, 128] -> [N, 2L] (level-major, feature-minor)
    feats = out.transpose(2, 3, 0, 1).reshape(n_pad, 2 * l)[:n]
    return feats


def hash_encode_blocked(table: jnp.ndarray, points: jnp.ndarray, enc
                        ) -> jnp.ndarray:
    """Forward encode. table: [L * 2^T, 2] f32 master parameter;
    points: [N, 3] f32 pre-clamped. Returns [N, 2L] (level-major,
    feature-minor — same layout as the XLA path)."""
    return encode_prepared(table, _prepare(points, enc), points.shape[0], enc)


# --------------------------------------------------------------- backward

def _make_bwd_kernel(n_levels: int, s_rows: int, groups: int,
                     box_min, box_max, wk=None):
    """Gradient scatter kernel. The key identity: a point's 8 corner
    contributions within its single block row are the rank-1 tensor
    (wx outer wy outer wz) placed at lane u*25 + v*5 + w with
    (u, v, w) = local_vertex + corner_offset. Build per-point 1-D weight
    stacks EX/EY/EZ (row u = weight of vertex offset u), expand to the
    [128-lane, 128-point] pattern matrix P once per (group, level), and
    every window's scatter is ONE [8, 128q] x [128q, 128lane] MXU matmul
    per feature: rows select the window's 8 block rows via the hit x
    row-parity one-hot, columns land the weighted gradient on the right
    lanes. No atomics (cf. CuHashEmbedder.cu:188-201), no transposes.
    """
    inv = [1.0 / (box_max[a] - box_min[a]) for a in range(3)]

    wk = WINDOW_BATCH_BWD if wk is None else wk

    def kernel(scales_ref, boffs_ref, wids_ref, maxcnt_ref, pts_ref, g_ref,
               out_ref):
        l = pl.program_id(0)
        gb = pl.program_id(1)

        @pl.when(gb == 0)
        def _init():
            out_ref[...] = jnp.zeros_like(out_ref)

        scale = scales_ref[l]
        iota_sub = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
        fracs, locs, m_q_b, rr_b = _block_geometry(
            pts_ref, boffs_ref, scale, l, box_min, inv)
        zero_bf = jnp.zeros((8, LANES), jnp.bfloat16)
        mq_g, p_g, g_g = [], [], []
        for gi in range(groups):
            mq_g.append(_row8(m_q_b, gi))
            p_g.append(_pattern_matrix(fracs, locs, gi, iota_sub))
            # row-parity-masked gradient rows, built ONCE per group (the
            # window loop's per-slot work is then a single hit-select per
            # feature instead of cmp+and+mul+cast per slot)
            par = _row8(rr_b, gi) == iota_sub
            g_g.append((
                jnp.where(par, jnp.broadcast_to(
                    g_ref[0, 0, gi:gi + 1, :], (8, LANES)), 0.0
                          ).astype(jnp.bfloat16),
                jnp.where(par, jnp.broadcast_to(
                    g_ref[0, 1, gi:gi + 1, :], (8, LANES)), 0.0
                          ).astype(jnp.bfloat16)))

        def scatter_batch(gi, j0):
            """WINDOW_BATCH window slots of group gi: all their masked
            gradient rows ride ONE [16*wk, 128q] x [128q, 128lane] matmul
            (rows 16k..16k+7 select window k's f0 rows, +8 f1's); only the
            wk VMEM row-range accumulates stay per-window. Sentinel slots
            contribute zero rows (hit test fails). The grad slab is window-
            interleaved ([2*ws, 2*ws+16) = f0 rows then f1 rows) so both
            features land in ONE contiguous 16-row accumulate."""
            ms, parts = [], []
            for k in range(wk):
                m = wids_ref[gi * 128 + j0 + k]
                ms.append(m)
                hit = mq_g[gi] == m
                parts.append(jnp.where(hit, g_g[gi][0], zero_bf))
                parts.append(jnp.where(hit, g_g[gi][1], zero_bf))
            lhs = jnp.concatenate(parts, axis=0)           # [16*wk, 128q]
            dw = jax.lax.dot_general(
                lhs, p_g[gi], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # [16*wk, 128]
            for k in range(wk):
                ws2 = (ms[k] << 4) & (2 * s_rows - 1)
                out_ref[0, pl.ds(ws2, 16), :] += dw[16 * k:16 * k + 16]

        # same ONE-loop-per-(level, group-block) shape as the forward: the
        # first wk slots unrolled, sentinel/foreign ids self-masked
        for gi in range(groups):
            scatter_batch(gi, 0)

        def body(j, carry):
            for gi in range(groups):
                scatter_batch(gi, j * wk)
            return carry

        nb = (maxcnt_ref[gb] + (wk - 1)) // wk
        jax.lax.fori_loop(1, nb, body, 0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_levels", "s_rows", "box_min", "box_max", "wk"))
def _bwd_call(pts_b, g_b, wids, maxcnt, scales, boffs, *,
              n_levels, s_rows, box_min, box_max, wk=None):
    ngb_pad = maxcnt.shape[0] // n_levels    # 1024-padded group-block count
    n_gb = pts_b.shape[0]
    kernel = _make_bwd_kernel(n_levels, s_rows, GROUPS_PER_BLOCK,
                              box_min, box_max, wk)
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
            pl.BlockSpec((GROUPS_PER_BLOCK * 128,),
                         lambda l, g, _nl=n_levels: (g * _nl + l,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((ngb_pad,), lambda l, g: (l,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, GROUPS_PER_BLOCK, LANES),
                         lambda l, g: (g, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, GROUPS_PER_BLOCK, LANES),
                         lambda l, g: (l, 0, g, 0), memory_space=pltpu.VMEM),
        ],
        # the level's window-interleaved [2*S, 128] gradient slab is
        # revisited (accumulated) across all group-blocks: the grid iterates
        # g fastest, so the block stays resident in VMEM for the whole level
        # sweep. Rows [2*ws, 2*ws+16) hold window ws's f0 then f1 rows.
        out_specs=pl.BlockSpec((1, 2 * s_rows, LANES),
                               lambda l, g: (l, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_levels, 2 * s_rows, LANES),
                                       jnp.float32),
    )(scales, boffs, wids, maxcnt, pts_b, g_b)
    return out


def grad_prepared(g: jnp.ndarray, prep, n: int, enc) -> jnp.ndarray:
    """Table gradient from a shared _prepare() result (see encode_prepared).

    g: [N, 2L] upstream cotangent. Returns [L * 2^T, 2] f32. Padded points
    get zero cotangent, so they contribute nothing even though their (valid,
    clamped) coordinates hit real rows.
    """
    l, s = enc.n_levels, enc.block_slots
    pts_b, wids, maxcnt, n_pad = prep
    ng = n_pad // 128
    g_pad = jnp.zeros((n_pad, 2 * l), jnp.float32).at[:n].set(
        g.astype(jnp.float32))
    g_b = g_pad.reshape(ng, 128, l, 2).transpose(2, 3, 0, 1)  # [L, 2, NG, 128]
    scales = jnp.asarray(enc.level_scales, jnp.float32)
    boffs = jnp.asarray(enc.block_offsets, jnp.int32).reshape(-1)
    out = _bwd_call(pts_b, g_b, wids, maxcnt, scales, boffs,
                    n_levels=l, s_rows=s,
                    box_min=tuple(float(v) for v in enc.bounding_box[:3]),
                    box_max=tuple(float(v) for v in enc.bounding_box[3:]))
    # window-interleaved [L, 2*S, 128] (16-row chunks: 8 f0 rows then 8 f1
    # rows per window) -> flat entry space [L * S * 128, 2]. Two transposes:
    # the first un-interleaves touching only MAJOR axes (the minor dim stays
    # the 128-lane axis), the second is the [L, 2, S, 128] -> [N, 2] pattern.
    # Fusing them into one 5-D transpose (minor dim 2) makes XLA relayout
    # the gradient — and, through Adam, the table/mu/nu state — into
    # lane-padded [N, 2] T(8,128) buffers: 64x expansion, +12 GB, step OOM.
    u = (out.reshape(l, s // 8, 2, 8, LANES).transpose(0, 2, 1, 3, 4)
         .reshape(l, 2, s, LANES))
    return u.transpose(0, 2, 3, 1).reshape(l * s * LANES, 2)


def hash_encode_blocked_bwd(g: jnp.ndarray, points: jnp.ndarray, enc
                            ) -> jnp.ndarray:
    """Standalone gradient entry (micro-bench/tests); training shares the
    prepass with the forward via custom_vjp residuals instead."""
    return grad_prepared(g, _prepare(points, enc), points.shape[0], enc)
