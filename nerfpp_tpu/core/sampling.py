"""Sampling along rays: z-value generation, stratified perturbation, hierarchical
inverse-CDF importance sampling, cone scattering and reflective boundaries.

Re-designs, with explicit PRNG keys instead of ambient RNG state:
- z-value generation + stratified perturb  (reference NeRFRenderer.h:393-417)
- sample_pdf                               (reference Sampler.h:6-43)
- tangent_scatter cone sampling            (reference NeRFRenderer.h:307-362)
- reflect_boundary                         (reference NeRFRenderer.h:285-304)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _safe_inv(x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    return jnp.where(jnp.abs(x) < eps, jnp.ones_like(x) / eps, 1.0 / x)


def _onehot_pick_matmul(onehot: jnp.ndarray, src: jnp.ndarray) -> jnp.ndarray:
    """sum_j onehot[..., k, j] * src[..., j] on the MXU at ~f32 accuracy.

    onehot: [..., K, M] bool (exactly one hot per k); src: [..., M] f32.
    The naive where+sum is O(K*M) *elementwise* work per row — it dominated
    full-image rendering (tens of GOPs/frame on the VPU at 640k rays). As a
    batched matmul it is the same FLOPs on the 100x-faster MXU. bf16 operands
    would round depths/CDF values, so src is split into three bf16 summands
    (hi + mid + lo captures ~24 mantissa bits) and the one-hot (exact in
    bf16) is contracted against each with f32 accumulation.
    """
    oh = onehot.astype(jnp.bfloat16)
    hi = src.astype(jnp.bfloat16)
    r1 = src - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    parts = jnp.stack([hi, mid, lo], axis=-1)                # [..., M, 3]
    batch = tuple(range(src.ndim - 1))
    out = jax.lax.dot_general(
        oh, parts, (((oh.ndim - 1,), (src.ndim - 1,)), (batch, batch)),
        preferred_element_type=jnp.float32)                  # [..., K, 3]
    return out[..., 0] + out[..., 1] + out[..., 2]


def sample_z_vals(near: jnp.ndarray, far: jnp.ndarray, n_samples: int,
                  lin_disp: bool = False, perturb: float = 0.0,
                  key: jax.Array | None = None) -> jnp.ndarray:
    """Per-ray sample depths.

    near/far: [n_rays, 1]. Returns z_vals [n_rays, n_samples], linear in depth or
    (safe-inverse) linear in disparity, optionally stratified-jittered within each
    bin (intervals below 1e-8 are left unjittered, as in NeRFRenderer.h:413-416).
    """
    t_vals = jnp.linspace(0.0, 1.0, n_samples, dtype=jnp.float32)
    # a + (b - a) * t, NOT a*(1-t) + b*t: the two-product lerp is not monotone
    # under f32 rounding when (b - a) is at the ulp scale (grazing rays where
    # the AABB near/far nearly coincide), and downstream (merge_sorted, dists)
    # relies on sorted z. x*t with x >= 0 rounds monotonically in t.
    if not lin_disp:
        z_vals = near + (far - near) * t_vals
    else:
        inv_n = _safe_inv(near)
        z_vals = _safe_inv(inv_n + (_safe_inv(far) - inv_n) * t_vals)

    if perturb > 0.0:
        if key is None:
            raise ValueError("perturb > 0 requires a PRNG key")
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
        intervals = upper - lower
        t_rand = jax.random.uniform(key, z_vals.shape, dtype=jnp.float32)
        z_vals = lower + jnp.where(intervals > 1e-8, intervals * t_rand, 0.0)
    return z_vals


def sample_pdf(bins: jnp.ndarray, weights: jnp.ndarray, n_samples: int,
               det: bool = False, key: jax.Array | None = None) -> jnp.ndarray:
    """Hierarchical importance sampling by inverting the weights CDF.

    bins: [n_rays, m] bin edges (z midpoints), weights: [n_rays, m-1].
    Returns [n_rays, n_samples] new sample positions. Mirrors Sampler.h:6-43:
    +1e-8 weight floor, CDF with zero prefix, right-bisect ``searchsorted``,
    degenerate bins (cdf span < 1e-5) fall back to the lower edge.

    The output is SORTED per ray, by construction: stochastic u are drawn as
    order statistics (normalized exponential gaps — the same marginal
    distribution as sorting n iid uniforms, at O(n) cost), and a final cummax
    removes the sub-1e-5 wiggles the degenerate-bin clamp can introduce. This
    lets the renderer merge coarse and fine depths with the cheap rank merge
    (``merge_sorted``) instead of a full ``jnp.sort``. The reference draws
    unsorted u and pays a sort on the merged depths instead
    (Sampler.h:25-27, NeRFRenderer.h:431).
    """
    weights = weights + 1e-8
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [n_rays, m]

    u_shape = cdf.shape[:-1] + (n_samples,)
    if det:
        u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, n_samples, dtype=jnp.float32), u_shape)
    else:
        if key is None:
            raise ValueError("stochastic sample_pdf requires a PRNG key")
        # sorted uniforms via exponential spacings: u_(i) = S_i / S_{n+1},
        # S_i = sum of i iid Exp(1) gaps — identical joint law to sorted iid
        # uniforms, with no sort network.
        gaps = -jnp.log(jax.random.uniform(
            key, cdf.shape[:-1] + (n_samples + 1,), dtype=jnp.float32,
            minval=jnp.finfo(jnp.float32).tiny, maxval=1.0))
        s = jnp.cumsum(gaps, axis=-1)
        u = s[..., :-1] / s[..., -1:]

    # TPU note: vmapped searchsorted and take_along_axis lower to scalar
    # loops/gathers. With m ~ O(100) bins, a dense compare-and-reduce
    # ([rays, samples, m] elementwise, fully VPU-vectorized) is far faster:
    # inds = #\{j : u >= cdf_j\} == searchsorted(cdf, u, side="right").
    ge = (u[..., :, None] >= cdf[..., None, :])         # [R, S, m]
    inds = jnp.sum(ge, axis=-1).astype(jnp.int32)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    def pick(src, j, clamp_hi):
        jc = jnp.minimum(j, clamp_hi)
        onehot = jc[..., :, None] == jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, src.shape[-1]), 2)
        return _onehot_pick_matmul(
            jnp.broadcast_to(onehot, jc.shape + (src.shape[-1],)), src)

    cdf_below = pick(cdf, below, cdf.shape[-1] - 1)
    cdf_above = pick(cdf, above, cdf.shape[-1] - 1)
    bins_below = pick(bins, below, bins.shape[-1] - 1)
    bins_above = pick(bins, above, bins.shape[-1] - 1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    z = bins_below + t * (bins_above - bins_below)
    # enforce per-ray monotonicity exactly (the degenerate-bin clamp can
    # locally reorder by < 1e-5 of a bin width; callers rely on sortedness)
    return jax.lax.cummax(z, axis=z.ndim - 1)


def merge_sorted(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Merge two per-row sorted arrays: [R, n1], [R, n2] -> [R, n1+n2] sorted.

    Ranks come from dense compare-reduces (pure VPU) and values are placed
    with a one-hot contraction — no XLA sort network. Ties rank ``a`` elements
    first, so output equals a stable merge.

    WARNING: both inputs MUST be row-sorted; the output is silently wrong
    otherwise. ``sample_pdf`` output is sorted by construction (sorted-u order
    statistics + cummax), so the renderer's coarse/fine z merge uses this.
    """
    n1, n2 = a.shape[-1], b.shape[-1]
    n = n1 + n2
    # rank of a_i = i + #{ b_j < a_i };  rank of b_j = j + #{ a_i <= b_j }
    rank_a = (jax.lax.broadcasted_iota(jnp.int32, a.shape, a.ndim - 1)
              + jnp.sum(b[..., None, :] < a[..., :, None], axis=-1,
                        dtype=jnp.int32))
    rank_b = (jax.lax.broadcasted_iota(jnp.int32, b.shape, b.ndim - 1)
              + jnp.sum(a[..., None, :] <= b[..., :, None], axis=-1,
                        dtype=jnp.int32))
    vals = jnp.concatenate([a, b], axis=-1)
    ranks = jnp.concatenate([rank_a, rank_b], axis=-1)       # [R, n], unique
    slots = jax.lax.broadcasted_iota(jnp.int32, vals.shape[:-1] + (n, n),
                                     vals.ndim)
    # onehot[.., i, k]: source i lands in slot k; contract sources on the MXU
    onehot = ranks[..., :, None] == slots                    # [R, n, n]
    merged = _onehot_pick_matmul(
        jnp.swapaxes(onehot, -1, -2), vals)                  # [R, n]
    # the 3-way bf16 split leaves ~1e-7 relative noise; restore exact
    # monotonicity for downstream dists/rank-merge consumers
    return jax.lax.cummax(merged, axis=merged.ndim - 1)


def reflect_boundary(pts: jnp.ndarray, min_bound: jnp.ndarray,
                     max_bound: jnp.ndarray) -> jnp.ndarray:
    """Fold points back into the box by mirror reflection at the faces.

    Used by stochastic preconditioning so perturbed points stay in the scene bbox
    (NeRFRenderer.h:285-304).
    """
    normalized = (pts - min_bound) / (max_bound - min_bound)
    x = jnp.mod(normalized, 2.0)
    x = jnp.where(x > 1.0, 2.0 - x, x)
    return x * (max_bound - min_bound) + min_bound


def tangent_scatter(pts: jnp.ndarray, z_vals: jnp.ndarray, cone_angle,
                    rays_d: jnp.ndarray, key: jax.Array,
                    bounding_box: jnp.ndarray | None = None) -> jnp.ndarray:
    """Jitter each sample inside its pixel-footprint cone (anti-aliasing).

    pts: [n_rays, n_samples, 3]; z_vals: [n_rays, n_samples]; cone_angle: scalar
    (or per-ray [n_rays, 1]); rays_d: [n_rays, 3]. The offset is uniform over the
    disk of radius cone_angle*z perpendicular to the ray, via an orthonormal
    tangent basis built from the smallest-|d| axis (NeRFRenderer.h:307-362).
    Pass cone_angle=None for thin rays (no-op).
    """
    if cone_angle is None:
        return pts

    def safe_normalize(v, eps=1e-8):
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)

    n_rays, n_samples = z_vals.shape
    cone_radii = jnp.asarray(cone_angle) * z_vals  # [n_rays, n_samples]
    d = safe_normalize(rays_d)

    abs_d = jnp.abs(d)
    mask_x = (abs_d[..., 0] < abs_d[..., 1]) & (abs_d[..., 0] < abs_d[..., 2])
    mask_y = (abs_d[..., 1] < abs_d[..., 0]) & (abs_d[..., 1] < abs_d[..., 2])
    ex = jnp.array([1.0, 0.0, 0.0], jnp.float32)
    ey = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    ez = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    up = jnp.where(mask_x[..., None], ex, jnp.where(mask_y[..., None], ey, ez))

    tangent = safe_normalize(jnp.cross(d, up))
    bitangent = safe_normalize(jnp.cross(d, tangent))

    kr, kt = jax.random.split(key)
    r = jnp.sqrt(jnp.clip(jax.random.uniform(kr, (n_rays, n_samples, 1)), 1e-8, 1.0 - 1e-8))
    theta = jax.random.uniform(kt, (n_rays, n_samples, 1)) * 2.0 * jnp.pi
    offset = tangent[:, None, :] * (r * jnp.cos(theta)) + bitangent[:, None, :] * (r * jnp.sin(theta))

    pts = pts + offset * cone_radii[..., None]
    if bounding_box is not None:
        min_bound = bounding_box[:3]
        max_bound = bounding_box[3:]
        pts = jnp.clip(pts, min_bound, max_bound)
    return pts
