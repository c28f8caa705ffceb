"""Multiresolution hash-grid encoding (instant-NGP style) in pure JAX.

TPU-native re-design of both reference variants:

- ``scheme="fixed"``: the CPU/LibTorch ``HashEmbedder`` (NeRF.cpp:208-318) —
  per-level resolution floor(base * b^l) with b = exp((ln finest - ln base)/(L-1)),
  voxel corners hashed with the fixed instant-NGP prime triplet
  xor(x*1, y*2654435761, z*805459861) & (2^T - 1).
- ``scheme="random"``: the CUDA ``CuHashEmbedder`` (CuHashEmbedder.cu:9-102,
  .cpp:10-79) — exp-spaced level scale exp2(lerp(log2 base, log2 finest, l/(L-1)))
  applied to bbox-normalized coordinates, per-level *random* prime triplets drawn
  from [2^28, 2^30), hash (x*pa ^ y*pb ^ z*pc) % local_size with
  local_size = (2^T >> 4) << 4.

Both variants share one flat feature table [n_levels * level_size, F] (one
parameter, uniform-init ±1e-4) and 8-corner trilinear interpolation. The whole
encoder is a pure function of (params, points): no stashed query state, no
stateful autograd hack (cf. CuHashEmbedder.cpp:96-98) — the backward pass is
XLA's scatter-add through the gather, or the Pallas kernel in
nerfpp_tpu/pallas/hash_encode.py on TPU.

The table is fp32 by default; the CUDA reference stores fp16 with a 128x loss
scale (CuHashEmbedder.cu:293) — on TPU the analogous memory saving is bf16,
which needs no loss scale (wider exponent). Enable with ``table_dtype``.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

# Fixed primes of the CPU variant (NeRF.cpp:232); index 0..6 for up to 7-D coords.
FIXED_PRIMES = (1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437, 2165219737)

# 8 voxel-corner offsets in the reference's bit order (z fastest): index d has
# bits (x, y, z) = (d>>2 & 1, d>>1 & 1, d & 1), matching BOX_OFFSETS / the CUDA
# kernel's pos_000..pos_111 ordering.
_CORNER_OFFSETS = np.array(
    [[(d >> 2) & 1, (d >> 1) & 1, d & 1] for d in range(8)], np.int64)

# Blocked scheme: 4^3-cell blocks with a one-vertex halo = 5^3 = 125 vertices,
# one 128-lane table row per block. Within-block vertex lane for local vertex
# (vx, vy, vz) is vx*25 + vy*5 + vz; corner (dx, dy, dz) adds dx*25 + dy*5 + dz.
BLOCK_CELLS = 4
BLOCK_VERTS = 5
BLOCK_LANES = 128
_BLOCKED_CORNER_LANE_OFFSETS = np.array(
    [dx * 25 + dy * 5 + dz for (dx, dy, dz) in _CORNER_OFFSETS], np.int32)


def morton3(x, y, z):
    """Interleave the low 10 bits of three non-negative ints (jnp or np):
    bit 3i of the result is bit i of x, 3i+1 of y, 3i+2 of z."""
    def spread(v):
        v = v & 0x3FF
        v = (v | (v << 16)) & 0x30000FF
        v = (v | (v << 8)) & 0x300F00F
        v = (v | (v << 4)) & 0x30C30C3
        v = (v | (v << 2)) & 0x9249249
        return v
    return spread(x) | (spread(y) << 1) | (spread(z) << 2)


def _is_prime(n: int) -> bool:
    if n < 2:
        return False
    i = 2
    while i * i <= n:
        if n % i == 0:
            return False
        i += 1
    return True


def draw_random_primes(seed: int, n_levels: int) -> np.ndarray:
    """Per-level random prime triplets from [2^28, 2^30) (CuHashEmbedder.cpp:37-52)."""
    rng = np.random.RandomState(seed)
    primes = []
    while len(primes) < 3 * n_levels:
        val = int(rng.randint(1 << 28, 1 << 30))
        if _is_prime(val):
            primes.append(val)
    return np.asarray(primes, np.uint32).reshape(n_levels, 3)


class HashGridEncoder:
    """Stateless multiresolution hash encoder; parameters live in a pytree.

    Args:
      bounding_box: [6] = (min_xyz, max_xyz) scene AABB (static numpy).
      n_levels / n_features_per_level / log2_hashmap_size / base_resolution /
      finest_resolution: instant-NGP hyperparameters (defaults mirror
      NeRFExecutorParams, NeRFExecutor.h:50-54).
      scheme: "fixed" (CPU-variant hashing, deterministic) or "random"
      (CUDA-variant hashing with random primes).
    """

    def __init__(self, bounding_box, n_levels: int = 16,
                 n_features_per_level: int = 2, log2_hashmap_size: int = 19,
                 base_resolution: int = 16, finest_resolution: int = 512,
                 scheme: str = "fixed", primes_seed: int = 0,
                 table_dtype=jnp.float32, use_pallas: bool = False,
                 pallas_packed: bool = True):
        if scheme not in ("fixed", "random", "blocked"):
            raise ValueError(f"unknown hash scheme {scheme!r}")
        self.bounding_box = np.asarray(bounding_box, np.float32).reshape(6)
        self.n_levels = n_levels
        self.n_features_per_level = n_features_per_level
        self.log2_hashmap_size = log2_hashmap_size
        self.base_resolution = base_resolution
        self.finest_resolution = finest_resolution
        self.scheme = scheme
        self.table_dtype = table_dtype
        self.use_pallas = use_pallas
        self.pallas_packed = pallas_packed
        self.output_dims = n_levels * n_features_per_level

        if scheme == "fixed":
            # Per-level integer resolutions floor(base * b^l) (NeRF.cpp:251, 309).
            b = np.exp((np.log(finest_resolution) - np.log(base_resolution))
                       / max(n_levels - 1, 1))
            self.resolutions = np.floor(
                base_resolution * b ** np.arange(n_levels)).astype(np.int64)
            self.level_size = 1 << log2_hashmap_size
            self.primes = None
            self.level_scales = None
        elif scheme == "random":
            # Exp-spaced scale, hit exactly at both ends (CuHashEmbedder.cu:40).
            l = np.arange(n_levels, dtype=np.float64)
            log2b, log2f = np.log2(base_resolution), np.log2(finest_resolution)
            self.level_scales = np.exp2(
                (log2f - log2b) * l / max(n_levels - 1, 1) + log2b).astype(np.float32)
            self.level_size = ((1 << log2_hashmap_size) >> 4) << 4
            self.primes = draw_random_primes(primes_seed, n_levels)
            self.resolutions = None
        else:
            # "blocked": the TPU-native large-table scheme. Same exp-spaced
            # level scales as the CUDA variant, but capacity is organized as
            # 4^3-cell blocks with a one-vertex halo: 5^3 = 125 vertices live
            # in one 128-lane table row, so all 8 trilerp corners of any cell
            # are served by ONE row. Block rows are addressed by the Morton
            # code of per-level-offset block coordinates, modulo the slot
            # count:  slot = morton3(block + offset_l) & (S - 1).
            # Morton order makes an aligned 2x2x2-block cube exactly one
            # aligned 8-row table window — the unit the windowed Pallas
            # kernel enumerates (nerfpp_tpu/pallas/hash_encode_blocked.py).
            # The random per-level block offsets decorrelate the wrap-around
            # collision pattern across levels (the counterpart of the
            # reference's per-level random primes, CuHashEmbedder.cpp:37-52).
            # When a level's block grid fits (morton < S) the map is
            # injective — collision-free, unlike the reference's hash which
            # collides even under capacity. Parameter count is exactly
            # n_levels * 2^T * F — capacity parity with the reference's
            # T=2^19 config (main.cpp:189).
            if log2_hashmap_size < 7:
                raise ValueError("blocked scheme requires log2_hashmap_size >= 7")
            l = np.arange(n_levels, dtype=np.float64)
            log2b, log2f = np.log2(base_resolution), np.log2(finest_resolution)
            self.level_scales = np.exp2(
                (log2f - log2b) * l / max(n_levels - 1, 1) + log2b).astype(np.float32)
            if float(self.level_scales[-1]) / BLOCK_CELLS + 2 > 1024:
                raise ValueError("blocked scheme supports finest_resolution "
                                 "up to 4x Morton range (~4096)")
            self.level_size = 1 << log2_hashmap_size
            self.block_slots = self.level_size // BLOCK_LANES      # S, pow2
            rng = np.random.RandomState(primes_seed + 7)
            self.block_offsets = rng.randint(
                0, 1 << 10, size=(n_levels, 3)).astype(np.int32)
            self.primes = None
            self.resolutions = None

        self.table_rows = self.n_levels * self.level_size
        self._pallas_fn = self._build_pallas_fn() if use_pallas else None

    def init(self, key: jax.Array) -> dict:
        """Feature table uniform(-1e-4, 1e-4) (NeRF.cpp:265-272 / CuHashEmbedder.cpp:24)."""
        table = jax.random.uniform(
            key, (self.table_rows, self.n_features_per_level),
            dtype=jnp.float32, minval=-1e-4, maxval=1e-4)
        return {"table": table.astype(self.table_dtype)}

    # -- hashing -----------------------------------------------------------

    def _corner_indices_fixed(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: [N, 3] (clamped). Returns (flat_idx [N, L, 8], frac [N, L, 3])."""
        box_min = jnp.asarray(self.bounding_box[:3])
        box_max = jnp.asarray(self.bounding_box[3:])
        res = jnp.asarray(self.resolutions, jnp.float32)               # [L]
        grid_size = (box_max - box_min)[None, :] / res[:, None]        # [L, 3]
        rel = (x[:, None, :] - box_min) / grid_size[None]              # [N, L, 3]
        bottom = jnp.floor(rel)
        frac = rel - bottom
        # uint32 wrap-around arithmetic: identical low bits to the reference's
        # int64 product under the & (2^T - 1) mask (coords are non-negative).
        bottom = bottom.astype(jnp.uint32)
        corners = bottom[:, :, None, :] + jnp.asarray(_CORNER_OFFSETS, np.uint32)
        primes = jnp.asarray(np.asarray(FIXED_PRIMES[:3], np.uint32))
        h = (corners[..., 0] * primes[0]) ^ (corners[..., 1] * primes[1]) \
            ^ (corners[..., 2] * primes[2])
        idx = (h & jnp.uint32(self.level_size - 1)).astype(jnp.int32)  # [N, L, 8]
        level_offset = (jnp.arange(self.n_levels, dtype=jnp.int32)
                        * self.level_size)[None, :, None]
        return idx + level_offset, frac

    def _corner_indices_random(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        box_min = jnp.asarray(self.bounding_box[:3])
        box_max = jnp.asarray(self.bounding_box[3:])
        scales = jnp.asarray(self.level_scales)                        # [L]
        rel = (x[:, None, :] - box_min) / (box_max - box_min) * scales[:, None]
        bottom = jnp.floor(rel)
        frac = rel - bottom
        corners = (bottom.astype(jnp.uint32)[:, :, None, :]
                   + jnp.asarray(_CORNER_OFFSETS, np.uint32))          # [N, L, 8, 3]
        primes = jnp.asarray(self.primes, jnp.uint32)                  # [L, 3]
        h = ((corners[..., 0] * primes[None, :, None, 0])
             ^ (corners[..., 1] * primes[None, :, None, 1])
             ^ (corners[..., 2] * primes[None, :, None, 2]))
        idx = (h % jnp.uint32(self.level_size)).astype(jnp.int32)
        level_offset = (jnp.arange(self.n_levels, dtype=jnp.int32)
                        * self.level_size)[None, :, None]
        return idx + level_offset, frac

    def blocked_cell_frac(self, x: jnp.ndarray):
        """x: [N, 3] (clamped) -> (cell [N, L, 3] int32, frac [N, L, 3] f32)."""
        box_min = jnp.asarray(self.bounding_box[:3])
        box_max = jnp.asarray(self.bounding_box[3:])
        scales = jnp.asarray(self.level_scales)                    # [L]
        rel = (x[:, None, :] - box_min) / (box_max - box_min) * scales[:, None]
        cell = jnp.floor(rel)
        frac = rel - cell
        return cell.astype(jnp.int32), frac

    def blocked_oct(self, cell: jnp.ndarray) -> jnp.ndarray:
        """cell: [..., L, 3] int32 -> offset block coords [..., L, 3]
        ("oct space": >>1 gives the aligned 2x2x2-block window cube)."""
        offs = jnp.asarray(self.block_offsets)                     # [L, 3]
        return (cell >> 2) + offs

    def blocked_slot(self, cell: jnp.ndarray) -> jnp.ndarray:
        """cell: [..., L, 3] int32 -> block-row slot id [..., L] int32 in
        [0, block_slots). slot = morton3(block + offset) & (S - 1)."""
        ob = self.blocked_oct(cell)
        m = morton3(ob[..., 0], ob[..., 1], ob[..., 2])
        return m & (self.block_slots - 1)

    def _corner_indices_blocked(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Blocked-scheme corner indices into the flat [L * 2^T] entry space:
        idx = level*T + slot*128 + base_lane + corner_lane_offset. All 8
        corners of a cell share one block row (the halo guarantee)."""
        cell, frac = self.blocked_cell_frac(x)                     # [N, L, 3]
        slot = self.blocked_slot(cell)                             # [N, L]
        local = cell % BLOCK_CELLS
        base_lane = (local[..., 0] * 25 + local[..., 1] * 5 + local[..., 2])
        lane = base_lane[..., None] + jnp.asarray(
            _BLOCKED_CORNER_LANE_OFFSETS)                          # [N, L, 8]
        level_offset = (jnp.arange(self.n_levels, dtype=jnp.int32)
                        * self.level_size)[None, :, None]
        idx = slot[..., None] * BLOCK_LANES + lane + level_offset
        return idx, frac

    def corner_indices(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.scheme == "fixed":
            return self._corner_indices_fixed(x)
        if self.scheme == "blocked":
            return self._corner_indices_blocked(x)
        return self._corner_indices_random(x)

    # -- forward -----------------------------------------------------------

    def __call__(self, params: dict, x: jnp.ndarray):
        """x: [N, 3] points -> (features [N, L*F], keep_mask [N]).

        Out-of-bbox points are clamped and masked (CuHashEmbedder.cpp:92-102);
        the renderer zeroes their density via keep_mask.
        """
        box_min = jnp.asarray(self.bounding_box[:3])
        box_max = jnp.asarray(self.bounding_box[3:])
        inside = (x >= box_min) & (x <= box_max)
        keep_mask = jnp.all(inside, axis=-1)
        xc = jnp.clip(x, box_min, box_max)

        if self.use_pallas:
            return self._pallas_fn(params["table"], xc), keep_mask

        idx, frac = self.corner_indices(xc)                 # [N, L, 8], [N, L, 3]
        feats = gather_trilerp_reference(params["table"], idx, frac)
        return feats.reshape(x.shape[0], self.output_dims), keep_mask

    def _build_pallas_fn(self):
        """Fused-kernel encode with a custom VJP.

        scheme="blocked": the windowed large-table kernel pair
        (pallas/hash_encode_blocked.py) — fwd gather and bwd MXU scatter both
        fused, arbitrary T (tables stay in HBM, staged per level).
        Other schemes: the VMEM-resident kernel (pallas/hash_encode.py,
        T <= 2^13 per level) with the MXU factorized-one-hot backward."""
        if self.scheme == "blocked":
            return self._build_pallas_blocked_fn()
        from nerfpp_tpu.pallas import hash_encode as HE
        if not HE.supports(self.n_levels, self.level_size,
                           self.n_features_per_level):
            raise ValueError(
                f"fused kernel requires F=2 and n_levels*T*F*4 <= "
                f"{HE.MAX_VMEM_TABLE_BYTES} bytes; got L={self.n_levels} "
                f"T={self.level_size}")
        if self.scheme == "random":
            primes = tuple(tuple(int(v) for v in row) for row in self.primes)
            scales = tuple(float(s) for s in self.level_scales)
            resolutions = (0.0,) * self.n_levels
        else:
            primes = (tuple(int(v) for v in FIXED_PRIMES[:3]),) * self.n_levels
            scales = (0.0,) * self.n_levels
            resolutions = tuple(float(r) for r in self.resolutions)
        kwargs = dict(
            n_levels=self.n_levels, level_size=self.level_size,
            scheme=self.scheme,
            box_min=tuple(float(v) for v in self.bounding_box[:3]),
            box_max=tuple(float(v) for v in self.bounding_box[3:]),
            level_scales=scales, primes=primes, resolutions=resolutions,
            version="v2", packed=(self.table_dtype == jnp.bfloat16
                                  or self.pallas_packed))

        enc = self

        @jax.custom_vjp
        def encode(table, x):
            return HE.hash_encode_fused(table, x, **kwargs)

        def encode_fwd(table, x):
            return encode(table, x), (table, x)

        def encode_bwd(res, g):
            # grad_table[e, f] = sum over (point, level, corner) hitting e of
            # w_corner * g[n, l, f] — the CUDA backward's atomicAdd
            # (CuHashEmbedder.cu:188-201), realized per level as an MXU
            # factorized one-hot scatter (ops/scatter_matmul.py).
            from nerfpp_tpu.ops.scatter_matmul import (scatter_add,
                                                       scatter_add_matmul_batched)
            table, x = res
            n = x.shape[0]
            f = enc.n_features_per_level
            idx, frac = enc.corner_indices(x)             # [N, L, 8], [N, L, 3]
            w = trilerp_weights(frac)                     # [N, L, 8]
            gl = g.reshape(n, enc.n_levels, f)
            level_off = (jnp.arange(enc.n_levels, dtype=jnp.int32)
                         * enc.level_size)[None, :, None]
            try:
                idxs = (idx - level_off).transpose(1, 0, 2).reshape(
                    enc.n_levels, n * 8)
                vals = (w[..., None] * gl[:, :, None, :]).transpose(
                    1, 0, 2, 3).reshape(enc.n_levels, n * 8, f)
                gt = scatter_add_matmul_batched(idxs, vals, enc.level_size)
            except ValueError:
                grads = []
                for l in range(enc.n_levels):
                    idx_l = (idx[:, l, :] - l * enc.level_size).reshape(-1)
                    vals = (w[:, l, :, None] * gl[:, l, None, :]).reshape(-1, f)
                    grads.append(scatter_add(idx_l, vals, enc.level_size))
                gt = jnp.concatenate(grads, axis=0)
            return gt.astype(table.dtype), None  # no position gradient

        encode.defvjp(encode_fwd, encode_bwd)
        return encode

    def _build_pallas_blocked_fn(self):
        """Blocked-scheme kernel pair: windowed fused forward + windowed MXU
        rank-1 scatter backward (pallas/hash_encode_blocked.py). The TPU
        equivalent of the reference's fused CUDA fwd/bwd at production table
        sizes (CuHashEmbedder.cu:9-201, T=2^19 at main.cpp:189)."""
        from nerfpp_tpu.pallas import hash_encode_blocked as HEB
        if self.n_features_per_level != 2:
            raise ValueError("blocked kernel requires F=2")
        enc = self

        @jax.custom_vjp
        def encode(table, x):
            return HEB.hash_encode_blocked(table, x, enc)

        def encode_fwd(table, x):
            # ONE window-list prepass per step: the (pts_b, wids, maxcnt)
            # residuals feed both the forward and the backward kernel
            prep = HEB._prepare(x, enc)
            feats = HEB.encode_prepared(table, prep, x.shape[0], enc)
            return feats, (prep, x.shape[0])

        def encode_bwd(res, g):
            prep, n = res
            gt = HEB.grad_prepared(g, prep, n, enc)
            return gt.astype(enc.table_dtype), None  # no position gradient

        encode.defvjp(encode_fwd, encode_bwd)
        return encode


def trilerp_weights(frac: jnp.ndarray) -> jnp.ndarray:
    """frac: [..., 3] -> [..., 8] trilinear corner weights in _CORNER_OFFSETS order."""
    a, b, c = frac[..., 0:1], frac[..., 1:2], frac[..., 2:3]
    wx = jnp.concatenate([1.0 - a, a], axis=-1)             # [..., 2]
    wy = jnp.concatenate([1.0 - b, b], axis=-1)
    wz = jnp.concatenate([1.0 - c, c], axis=-1)
    # weight[d] = wx[x_bit] * wy[y_bit] * wz[z_bit], d ordered with z fastest
    w = (wx[..., :, None, None] * wy[..., None, :, None] * wz[..., None, None, :])
    return w.reshape(*frac.shape[:-1], 8)


def gather_trilerp_reference(table: jnp.ndarray, idx: jnp.ndarray,
                             frac: jnp.ndarray) -> jnp.ndarray:
    """Pure-XLA gather + trilinear blend. table [R, F], idx [N, L, 8],
    frac [N, L, 3] -> [N, L, F]. Backward is XLA scatter-add.

    TPU layout note: a naive ``table[idx]`` materializes [N, L, 8, F] with
    trailing dims (8, F) — padded by the (8, 128) tile to a >30x memory blowup
    at production sizes. Instead the table is viewed per-feature as flat [R]
    vectors and gathered with [N, L*8] indices: for the production config
    L*8 = 128 is exactly the TPU lane width, so gather results, trilinear
    weights, and the corner reduction all live in perfectly tiled [N, 128]
    buffers that XLA fuses.
    """
    n, L, _ = idx.shape
    f = table.shape[-1]
    flat_idx = idx.reshape(n, L * 8)                         # [N, L*8]
    w = trilerp_weights(frac).reshape(n, L * 8)              # [N, L*8]
    outs = []
    for c in range(f):
        vals = jnp.take(table[:, c], flat_idx, axis=0)       # [N, L*8]
        outs.append(jnp.sum((vals.astype(jnp.float32) * w)
                            .reshape(n, L, 8), axis=-1))     # [N, L]
    return jnp.stack(outs, axis=-1)                          # [N, L, F]


def total_variation_loss(encoder: HashGridEncoder, params: dict, level: int,
                         key: jax.Array) -> jnp.ndarray:
    """Random-cube total-variation regularizer for one hash level.

    Mirrors TotalVariationLoss (NeRF.h:255-300): sample a random cube of static
    per-level size floor(clip(res/10, base-1, finest-1)), hash its lattice points
    with the fixed scheme, and penalize squared feature differences along each
    axis, normalized by cube size. Only defined for scheme="fixed" (as in the
    reference, where the CUDA variant's TV helper is never called from Train).
    """
    if encoder.scheme != "fixed":
        raise ValueError("total_variation_loss follows the fixed-prime scheme")
    res = int(encoder.resolutions[level])
    min_cube = encoder.base_resolution - 1
    max_cube = encoder.finest_resolution - 1
    cube = int(np.floor(np.clip(res / 10.0, min_cube, max_cube)))

    min_vertex = jax.random.randint(key, (3,), 0, max(res - cube, 1))
    ar = jnp.arange(cube + 1)
    gx = min_vertex[0] + ar
    gy = min_vertex[1] + ar
    gz = min_vertex[2] + ar
    grid = jnp.stack(jnp.meshgrid(gx, gy, gz, indexing="ij"), axis=-1)  # [c,c,c,3]
    primes = jnp.asarray(np.asarray(FIXED_PRIMES[:3], np.uint32))
    g = grid.astype(jnp.uint32)
    h = (g[..., 0] * primes[0]) ^ (g[..., 1] * primes[1]) ^ (g[..., 2] * primes[2])
    idx = ((h & jnp.uint32(encoder.level_size - 1)).astype(jnp.int32)
           + level * encoder.level_size)
    emb = params["table"][idx].astype(jnp.float32)           # [c, c, c, F]

    tv_x = jnp.sum((emb[1:] - emb[:-1]) ** 2)
    tv_y = jnp.sum((emb[:, 1:] - emb[:, :-1]) ** 2)
    tv_z = jnp.sum((emb[:, :, 1:] - emb[:, :, :-1]) ** 2)
    return (tv_x + tv_y + tv_z) / cube
