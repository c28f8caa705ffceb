"""Volume renderer: hierarchical sampling + compositing as one jittable function.

TPU-native re-design of the reference ``NeRFRenderer`` template
(NeRFRenderer.h:88-605). Differences from the reference, by design:

- No 7-type template / virtual dispatch: the renderer is a small config record
  plus closures (network_fn, integrate_fn) over parameter pytrees. The LeRF
  renderer (nerfpp_tpu/render/lerf.py) reuses the same hierarchical machinery
  with a different integrator, where the reference duplicates ~300 lines
  (LeRFRenderer.cpp:85-331).
- No dynamic chunk loop: training renders one fixed-size ray batch; full-image
  rendering pads the pixel set to a multiple of the chunk and `lax.map`s a
  jitted chunk renderer (shape-static => compiled once).
- The importance pass keeps the reference semantics: SamplePDF on *detached*
  coarse weights[1:-1] over z midpoints, sort-merge of coarse+fine z
  (static K = n_samples + n_importance), stochastic-preconditioning Gaussian
  input noise with reflective bbox handling, cone TangentScatter, and the SAME
  field evaluated for both passes (no separate fine MLP), NeRFRenderer.h:425-450.
- Fixes the reference's coarse-only quirk where n_importance == 0 leaves
  result.Outputs empty (NeRFRenderer.h:423 vs 448): here the coarse outputs are
  always returned (`coarse`), and `outputs` is fine if present else coarse.
- Explicit PRNG keys thread all randomness; annealed noise magnitudes
  (raw_noise_std, stochastic preconditioning alpha) are *traced scalars*, so
  the whole training schedule runs under one compiled executable.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from nerfpp_tpu.core import rays as ray_math
from nerfpp_tpu.core import sampling as S
from nerfpp_tpu.core.integrate import raw2outputs


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static rendering options (hashable; safe as a jit static argument).

    Mirrors NeRFRenderParams (NeRFRenderer.h:28-44) minus the tensors and the
    annealed scalars, which are passed as (possibly traced) values at call time.
    """
    n_samples: int = 64
    n_importance: int = 192
    chunk: int = 1024 * 32
    return_raw: bool = False
    lin_disp: bool = False
    perturb: float = 0.0
    white_bkgr: bool = False
    ndc: bool = False
    use_viewdirs: bool = True
    thin_ray: bool = False
    return_weights: bool = True
    # static switches for the annealed noise paths (value itself is traced)
    use_raw_noise: bool = False
    use_sp_noise: bool = False
    # density activation: "relu" (reference parity) | "trunc_exp" | "softplus"
    density_activation: str = "relu"
    # full-image rendering in 8x16 pixel tiles (pads H, W to tile multiples,
    # pure transposes — no gathers). Keeps 128-pixel runs spatially compact
    # for the blocked hash kernel; identical results for any renderer.
    tile_order: bool = False
    # occupancy-guided coarse sampling (core/occupancy.py): number of depth
    # bins for the per-ray grid prior (0 = off -> reference-uniform z), and
    # the uniform blend that keeps empty space lightly supervised
    n_occ_bins: int = 0
    occ_uniform_frac: float = 0.1
    # share one occupancy CDF per this many consecutive rays (0 = per-ray):
    # with tile-coherent batches this keeps encode groups depth-aligned
    # (occupancy.tiled_ray_z) and divides the inverse-CDF cost by the tile
    occ_ray_tile: int = 0
    # tile-share the HIERARCHICAL path's depths per this many consecutive
    # rays (0 = per-ray, reference semantics): coarse z from the tile's
    # [min near, max far] and ONE importance CDF from the tile-mean coarse
    # weights — per-ray importance depths decohere the blocked kernel's
    # encode groups (the reference-parity 64+192 path measured 4x slower
    # than the flagship for exactly this reason). Integration still happens
    # at the sampled depths, so this only changes sample PLACEMENT.
    hier_ray_tile: int = 0


class RenderResult(NamedTuple):
    """Composited results of one render call (mirrors NeRFRenderResult plus the
    always-populated coarse outputs)."""
    outputs: NamedTuple             # fine if n_importance > 0 else coarse
    coarse: NamedTuple
    raw: Optional[jnp.ndarray]      # [n_rays, K, C] if return_raw
    z_vals: jnp.ndarray             # [n_rays, K] final sample depths


def make_nerf_network_fn(embed_fn, embed_dirs_fn, field_fn,
                         sigma_channel: int = 3, sample_major: bool = False):
    """Build the standard NeRF network closure.

    Mirrors RunNetwork (NeRFRenderer.h:163-194): flatten, embed, broadcast dirs
    across samples, concat, field forward, sigma := 0 where keep_mask is False.

    ``sample_major``: flatten [R, S, 3] as [S*R, 3] (all rays at sample 0,
    then sample 1, ...) instead of ray-major [R*S, 3]. With tile-coherent ray
    batches this keeps each 128-point run spatially compact — 128 nearby rays
    at one depth, not one ray's whole depth sweep — which is what makes the
    blocked hash-encode kernel's window lists short. Pointwise ops (encoders,
    fields) are order-invariant, so results are identical.
    """

    def network_fn(params, pts, viewdirs):
        n_rays, n_samples, _ = pts.shape
        if sample_major:
            flat = pts.transpose(1, 0, 2).reshape(-1, 3)
        else:
            flat = pts.reshape(-1, 3)
        embedded, keep_mask = embed_fn(params, flat)

        if viewdirs is not None:
            dirs = jnp.broadcast_to(viewdirs[:, None, :], pts.shape)
            if sample_major:
                dirs = dirs.transpose(1, 0, 2)
            embedded_dirs, _ = embed_dirs_fn(params, dirs.reshape(-1, 3))
            embedded = jnp.concatenate([embedded, embedded_dirs], axis=-1)

        raw = field_fn(params, embedded)
        if keep_mask is not None:
            sc = sigma_channel if sigma_channel >= 0 else raw.shape[-1] + sigma_channel
            raw = raw.at[..., sc].set(jnp.where(keep_mask, raw[..., sc], 0.0))
        if sample_major:
            return raw.reshape(n_samples, n_rays,
                               raw.shape[-1]).transpose(1, 0, 2)
        return raw.reshape(n_rays, n_samples, raw.shape[-1])

    return network_fn


def make_nerf_integrate_fn(cfg: "RenderConfig"):
    """Standard rgb+sigma integrator (RawToOutputs, NeRFRenderer.h:198-282)."""

    def integrate_fn(raw, z_vals, rays_d, raw_noise_std, key):
        return raw2outputs(raw, z_vals, rays_d, raw_noise_std, cfg.white_bkgr,
                           key if cfg.use_raw_noise else None,
                           cfg.density_activation)

    return integrate_fn


def _occ_bins_or_z(occupancy, rays_o, rays_d, near, far, bounding_box,
                   cfg: "RenderConfig", key):
    """Occupancy prior for one ray batch: tile-shared z-values when the
    batch divides into occ_ray_tile groups, else per-ray (edges, weights)."""
    from nerfpp_tpu.core.occupancy import ray_bin_weights, tiled_ray_z
    tile = cfg.occ_ray_tile
    if tile > 0 and rays_o.shape[0] % tile == 0:
        return tiled_ray_z(
            occupancy, rays_o, rays_d, near[..., 0], far[..., 0],
            bounding_box, cfg.n_occ_bins, cfg.n_samples,
            cfg.occ_uniform_frac, tile, det=(cfg.perturb == 0.0),
            key=jax.random.fold_in(key, 0x0CC))
    return ray_bin_weights(occupancy, rays_o, rays_d, near, far,
                           bounding_box, cfg.n_occ_bins, cfg.occ_uniform_frac)


def render_rays(params: dict,
                network_fn: Callable, integrate_fn: Callable,
                rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                near: jnp.ndarray, far: jnp.ndarray,
                viewdirs: Optional[jnp.ndarray],
                cone_angle, key: jax.Array, cfg: RenderConfig,
                raw_noise_std=0.0,
                stochastic_preconditioning_alpha=0.0,
                bounding_box: Optional[jnp.ndarray] = None,
                occ_bins=None) -> RenderResult:
    """Hierarchical volume rendering of one fixed-size ray batch.

    rays_o/rays_d: [n_rays, 3]; near/far: [n_rays, 1]. Mirrors RenderRays
    (NeRFRenderer.h:366-459) with explicit PRNG keys. ``raw_noise_std`` and
    ``stochastic_preconditioning_alpha`` may be traced scalars (annealing
    schedules run inside one compiled step); their *enablement* is static via
    cfg.use_raw_noise / cfg.use_sp_noise.
    """
    k_strat, k_cone1, k_pdf, k_sp, k_cone2, k_noise1, k_noise2 = \
        jax.random.split(key, 7)

    hier_tile = cfg.hier_ray_tile
    tiled_hier = (occ_bins is None and hier_tile > 0
                  and rays_o.shape[0] % hier_tile == 0)
    if occ_bins is not None and not isinstance(occ_bins, tuple):
        # pre-computed occupancy-guided depths (tile-shared CDF path)
        z_vals = occ_bins
    elif occ_bins is not None:
        # occupancy-guided coarse depths: inverse-CDF over the grid prior
        # (uniform grid => exactly the uniform z-values of the branch below)
        edges, w = occ_bins
        z_vals = S.sample_pdf(edges, w, cfg.n_samples,
                              det=(cfg.perturb == 0.0), key=k_strat)
    elif tiled_hier:
        # tile-shared coarse depths over the tile's [min near, max far]:
        # every ray in an encode group samples the SAME depths; samples a
        # ray contributes outside its own AABB segment are zeroed by the
        # keep_mask as usual (same contract as occupancy.tiled_ray_z)
        nt = rays_o.shape[0] // hier_tile
        near_t = near.reshape(nt, hier_tile).min(axis=1, keepdims=True)
        far_t = far.reshape(nt, hier_tile).max(axis=1, keepdims=True)
        z_vals = jnp.repeat(
            S.sample_z_vals(near_t, far_t, cfg.n_samples, cfg.lin_disp,
                            cfg.perturb, k_strat), hier_tile, axis=0)
    else:
        z_vals = S.sample_z_vals(near, far, cfg.n_samples, cfg.lin_disp,
                                 cfg.perturb, k_strat)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    if not cfg.thin_ray:
        pts = S.tangent_scatter(pts, z_vals, cone_angle, rays_d, k_cone1,
                                bounding_box)

    raw = network_fn(params, pts, viewdirs)
    coarse = integrate_fn(raw, z_vals, rays_d, raw_noise_std, k_noise1)

    outputs = coarse
    if cfg.n_importance > 0:
        z_mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        cw = coarse.weights[..., 1:-1]
        if tiled_hier:
            # ONE importance CDF per tile from the tile-mean coarse weights
            # (bins are tile-shared above, so the mean is exact): the fine
            # pass's encode groups stay depth-aligned, and the inverse-CDF
            # cost drops by the tile factor
            nt = rays_o.shape[0] // hier_tile
            z_mids_t = z_mids.reshape(nt, hier_tile, -1)[:, 0, :]
            w_t = cw.reshape(nt, hier_tile, -1).mean(axis=1)
            z_samples = jnp.repeat(
                S.sample_pdf(z_mids_t, w_t, cfg.n_importance,
                             det=(cfg.perturb == 0.0), key=k_pdf),
                hier_tile, axis=0)
        else:
            z_samples = S.sample_pdf(z_mids, cw, cfg.n_importance,
                                     det=(cfg.perturb == 0.0), key=k_pdf)
        z_samples = jax.lax.stop_gradient(z_samples)
        # sample_pdf output is sorted by construction (order-statistic u +
        # cummax) and sample_z_vals is monotone under f32 rounding, so the
        # cheap VPU rank merge replaces the full jnp.sort the reference pays
        # (NeRFRenderer.h:431). Sortedness of both inputs is tested in
        # test_core_math.py (incl. the grazing-ray ulp case).
        z_vals = S.merge_sorted(z_vals, z_samples)
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]

        if cfg.use_sp_noise and bounding_box is not None:
            noise = jax.random.normal(k_sp, pts.shape) \
                * stochastic_preconditioning_alpha
            pts = S.reflect_boundary(pts + noise, bounding_box[:3],
                                     bounding_box[3:])
        if not cfg.thin_ray:
            pts = S.tangent_scatter(pts, z_vals, cone_angle, rays_d, k_cone2,
                                    bounding_box)

        raw = network_fn(params, pts, viewdirs)
        outputs = integrate_fn(raw, z_vals, rays_d, raw_noise_std, k_noise2)

    return RenderResult(outputs=outputs, coarse=coarse,
                        raw=raw if cfg.return_raw else None, z_vals=z_vals)


def render_ray_batch(params: dict, network_fn, integrate_fn,
                     rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                     cone_angle, key: jax.Array, cfg: RenderConfig,
                     bounding_box: jnp.ndarray,
                     raw_noise_std=0.0,
                     stochastic_preconditioning_alpha=0.0,
                     focal: Optional[float] = None,
                     hw: Optional[tuple] = None,
                     occupancy=None) -> RenderResult:
    """Prepare a flat ray batch and render it (training-path entry).

    Mirrors the ray-preparation part of Render (NeRFRenderer.h:530-588):
    viewdirs from (pre-NDC) directions, optional NDC projection, per-ray
    (near, far) from AABB intersection ignoring dataset near/far
    (NeRFRenderer.h:574-578).
    """
    viewdirs = None
    if cfg.use_viewdirs:
        viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    if cfg.ndc:
        assert focal is not None and hw is not None
        h, w = hw
        rays_o, rays_d, cone_angle = ray_math.ndc_rays(
            h, w, focal, 1.0, rays_o, rays_d,
            None if cfg.thin_ray else cone_angle)

    near, far = ray_math.intersect_aabb(rays_o, rays_d, bounding_box)
    occ_bins = None
    if occupancy is not None and cfg.n_occ_bins > 0:
        if cfg.ndc:
            raise ValueError("occupancy-guided sampling is incompatible with "
                             "NDC rays (the grid lives in world space)")
        occ_bins = _occ_bins_or_z(occupancy, rays_o, rays_d, near[:, None],
                                  far[:, None], bounding_box, cfg, key)
    return render_rays(
        params, network_fn, integrate_fn, rays_o, rays_d,
        near[:, None], far[:, None], viewdirs,
        None if cfg.thin_ray else cone_angle, key, cfg,
        raw_noise_std, stochastic_preconditioning_alpha, bounding_box,
        occ_bins=occ_bins)


def k_dense_of(dense_frac: float, n_tiles: int) -> int:
    """Dense-class tile count for a two-class budget: round(frac * tiles),
    clamped so both classes are non-empty. THE single definition — the
    executor's auto-frac bucketing (executor._auto_dense_frac) relies on
    round-tripping through exactly this rounding."""
    return min(max(int(round(dense_frac * n_tiles)), 1), n_tiles - 1)


def render_ray_batch_budgeted(params: dict, network_fn, integrate_fn,
                              rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                              cone_angle, key: jax.Array, cfg: RenderConfig,
                              bounding_box: jnp.ndarray,
                              raw_noise_std=0.0,
                              stochastic_preconditioning_alpha=0.0,
                              occupancy=None, dense_frac: float = 0.5,
                              sparse_samples: int = 16):
    """Two-class per-tile sample budget: rank the batch's ray tiles by
    occupancy mass, give the top ``dense_frac`` tiles the full cfg.n_samples
    and the rest (empty space) only ``sparse_samples`` — a shape-static form
    of instant-NGP's empty-space skipping: sample COUNTS stay fixed per
    class, the class split is a tile permutation. Every ray is rendered
    exactly once, so per-pixel loss sums are unchanged in expectation.

    Requires the tile-shared occupancy path (cfg.occ_ray_tile > 0, grid
    present, no NDC). Returns (res_dense, res_sparse, idx_dense, idx_sparse)
    with idx_* the flat ray indices of each class (for target gathering).
    """
    from nerfpp_tpu.core.occupancy import tiled_prior
    if occupancy is None or cfg.n_occ_bins <= 0 or cfg.occ_ray_tile <= 0:
        raise ValueError("budgeted rendering needs the tile-shared "
                         "occupancy sampling path")
    if cfg.ndc:
        raise ValueError("occupancy-guided sampling is incompatible with "
                         "NDC rays (the grid lives in world space)")
    tile = cfg.occ_ray_tile
    r = rays_o.shape[0]
    if r % tile:
        raise ValueError(f"batch of {r} rays must divide by tile {tile}")
    n_tiles = r // tile
    k_dense = k_dense_of(dense_frac, n_tiles)

    viewdirs = None
    if cfg.use_viewdirs:
        viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    near, far = ray_math.intersect_aabb(rays_o, rays_d, bounding_box)
    edges_t, w_t, mass = tiled_prior(
        occupancy, rays_o, rays_d, near[:, None], far[:, None],
        bounding_box, cfg.n_occ_bins, cfg.occ_uniform_frac, tile)
    order = jnp.argsort(-mass)                       # dense tiles first

    def class_render(tiles, n_samples, kk):
        ridx = (tiles[:, None] * tile
                + jnp.arange(tile, dtype=tiles.dtype)).reshape(-1)
        z_t = S.sample_pdf(edges_t[tiles], w_t[tiles], n_samples,
                           det=(cfg.perturb == 0.0),
                           key=jax.random.fold_in(kk, 0x0CC))
        z = jnp.repeat(z_t, tile, axis=0)
        ccfg = dataclasses.replace(cfg, n_samples=n_samples)
        res = render_rays(
            params, network_fn, integrate_fn,
            rays_o[ridx], rays_d[ridx], near[ridx][:, None],
            far[ridx][:, None],
            viewdirs[ridx] if viewdirs is not None else None,
            None if cfg.thin_ray else cone_angle, kk, ccfg,
            raw_noise_std, stochastic_preconditioning_alpha, bounding_box,
            occ_bins=z)
        return res, ridx

    kd, ks = jax.random.split(key)
    res_d, idx_d = class_render(order[:k_dense], cfg.n_samples, kd)
    res_s, idx_s = class_render(order[k_dense:], sparse_samples, ks)
    return res_d, res_s, idx_d, idx_s


def render_ray_batch_hier_budgeted(params: dict, network_fn, integrate_fn,
                                   rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                                   cone_angle, key: jax.Array,
                                   cfg: RenderConfig,
                                   bounding_box: jnp.ndarray,
                                   raw_noise_std=0.0,
                                   stochastic_preconditioning_alpha=0.0,
                                   dense_frac: float = 0.5,
                                   sparse_importance: int = 32):
    """Two-class tile budget for the HIERARCHICAL fine pass.

    The coarse pass runs on every ray at cfg.n_samples with tile-shared
    depths (cfg.hier_ray_tile, as in render_rays' tiled path); tiles are
    then ranked by tile-mean coarse weight mass — foreground tiles place
    most of their coarse weight on surfaces, empty tiles almost none — and
    the fine pass renders the top ``dense_frac`` tiles at the full
    cfg.n_importance, the rest at ``sparse_importance``. Same shape-static
    two-render structure as render_ray_batch_budgeted, but the ranking
    signal is the coarse pass itself, so no occupancy grid is needed: this
    is empty-space skipping for the reference-parity 64+N hierarchical
    workload (main.cpp:230-234 semantics; sample PLACEMENT only changes for
    the sparse/background class).

    Returns (res_dense, res_sparse, idx_dense, idx_sparse).
    """
    tile = cfg.hier_ray_tile
    if tile <= 0:
        raise ValueError("hier budget needs cfg.hier_ray_tile > 0")
    if cfg.n_importance <= 0:
        raise ValueError("hier budget needs n_importance > 0")
    if cfg.ndc:
        raise ValueError("hier budget does not support NDC rays (tile "
                         "near/far sharing happens in world space)")
    r = rays_o.shape[0]
    if r % tile:
        raise ValueError(f"batch of {r} rays must divide by tile {tile}")
    nt = r // tile
    k_dense = k_dense_of(dense_frac, nt)
    k_strat, k_cone1, k_noise1, kd, ks = jax.random.split(key, 5)

    viewdirs = None
    if cfg.use_viewdirs:
        viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    near, far = ray_math.intersect_aabb(rays_o, rays_d, bounding_box)

    # coarse pass on every ray, tile-shared depths (render_rays tiled_hier)
    near_t = near.reshape(nt, tile).min(axis=1, keepdims=True)
    far_t = far.reshape(nt, tile).max(axis=1, keepdims=True)
    z_t = S.sample_z_vals(near_t, far_t, cfg.n_samples, cfg.lin_disp,
                          cfg.perturb, k_strat)                   # [nt, S]
    z_vals = jnp.repeat(z_t, tile, axis=0)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    if not cfg.thin_ray:
        pts = S.tangent_scatter(pts, z_vals, cone_angle, rays_d, k_cone1,
                                bounding_box)
    raw_c = network_fn(params, pts, viewdirs)
    coarse = integrate_fn(raw_c, z_vals, rays_d, raw_noise_std, k_noise1)

    z_mids_t = 0.5 * (z_t[:, 1:] + z_t[:, :-1])
    cw = coarse.weights[..., 1:-1]
    w_t = cw.reshape(nt, tile, -1).mean(axis=1)                   # [nt, S-2]
    mass = jax.lax.stop_gradient(jnp.sum(w_t, axis=-1))
    order = jnp.argsort(-mass)

    def fine_class(tiles, n_imp, kk):
        ridx = (tiles[:, None] * tile
                + jnp.arange(tile, dtype=tiles.dtype)).reshape(-1)
        k_pdf_c, k_sp_c, k_cone_c, k_noise_c = jax.random.split(kk, 4)
        z_samples_t = S.sample_pdf(z_mids_t[tiles], w_t[tiles], n_imp,
                                   det=(cfg.perturb == 0.0), key=k_pdf_c)
        z_samples = jax.lax.stop_gradient(
            jnp.repeat(z_samples_t, tile, axis=0))
        z_all = S.merge_sorted(jnp.repeat(z_t[tiles], tile, axis=0),
                               z_samples)
        ro, rd = rays_o[ridx], rays_d[ridx]
        pts_f = ro[:, None, :] + rd[:, None, :] * z_all[..., None]
        if cfg.use_sp_noise and bounding_box is not None:
            noise = jax.random.normal(k_sp_c, pts_f.shape) \
                * stochastic_preconditioning_alpha
            pts_f = S.reflect_boundary(pts_f + noise, bounding_box[:3],
                                       bounding_box[3:])
        if not cfg.thin_ray:
            pts_f = S.tangent_scatter(pts_f, z_all, cone_angle, rd, k_cone_c,
                                      bounding_box)
        raw_f = network_fn(params, pts_f,
                           viewdirs[ridx] if viewdirs is not None else None)
        out = integrate_fn(raw_f, z_all, rd, raw_noise_std, k_noise_c)
        coarse_c = jax.tree.map(
            lambda x: x[ridx] if x is not None else None, coarse,
            is_leaf=lambda x: x is None)
        return RenderResult(outputs=out, coarse=coarse_c,
                            raw=raw_f if cfg.return_raw else None,
                            z_vals=z_all), ridx

    res_d, idx_d = fine_class(order[:k_dense], cfg.n_importance, kd)
    res_s, idx_s = fine_class(order[k_dense:], sparse_importance, ks)
    return res_d, res_s, idx_d, idx_s


def _cheap_tile_probe(occupancy, rays_o, rays_d, near, far, bounding_box,
                      tile: int = 128, sub_r: int = 16, sub_b: int = 16):
    """Two-stage probe stage 1: RANK ray tiles with a cheap subsampled probe
    (sub_r rays x sub_b bins per 128-ray tile, ~40x less grid traffic than
    the full prior). The budget path builds the full-resolution prior only
    for the dense class; sparse (background) tiles place their few samples
    from this cheap prior — misranking costs those tiles sparse-sample
    quality, which is what they'd get anyway.

    Returns (edges_c [T*sub_r, sub_b+1], d_c [T*sub_r, sub_b], mass [T],
    near_t [T], far_t [T])."""
    from nerfpp_tpu.core.occupancy import ray_bin_densities
    n = rays_o.shape[0]
    n_tiles = n // tile
    stride = tile // sub_r
    near_t = near.reshape(n_tiles, tile).min(axis=1)     # [T]
    far_t = far.reshape(n_tiles, tile).max(axis=1)
    sidx = (jnp.arange(n_tiles)[:, None] * tile
            + jnp.arange(0, tile, stride)[None, :]).reshape(-1)
    edges_c, d_c = ray_bin_densities(
        occupancy, rays_o[sidx], rays_d[sidx],
        jnp.repeat(near_t, sub_r)[:, None],
        jnp.repeat(far_t, sub_r)[:, None],
        bounding_box, sub_b)
    mass = d_c.reshape(n_tiles, sub_r, sub_b).sum(axis=(1, 2))
    return edges_c, d_c, mass, near_t, far_t


def probe_tile_mass(occupancy, h: int, w: int, k: jnp.ndarray,
                    c2w: jnp.ndarray, bounding_box: jnp.ndarray):
    """Cheap occupancy mass per 8x16-pixel tile of the (tile-padded) image —
    the exact ranking signal render_image's budget path uses, exposed so the
    executor can pick ``dense_frac`` automatically: one tiny dispatch + a
    [n_tiles] host sync before compiling the budgeted renderer."""
    th, tw = 8, 16
    hp, wp = -(-h // th) * th, -(-w // tw) * tw
    rays_o, rays_d, _ = ray_math.get_rays(hp, wp, k, c2w)

    def flat(x):
        c = x.shape[-1]
        return (x.reshape(hp // th, th, wp // tw, tw, c)
                .transpose(0, 2, 1, 3, 4).reshape(-1, c))

    rays_o, rays_d = flat(rays_o), flat(rays_d)
    near, far = ray_math.intersect_aabb(rays_o, rays_d, bounding_box)
    return _cheap_tile_probe(occupancy, rays_o, rays_d, near, far,
                             bounding_box)[2]


def render_image(params: dict, network_fn, integrate_fn,
                 h: int, w: int, k: jnp.ndarray, c2w: jnp.ndarray,
                 key: jax.Array, cfg: RenderConfig,
                 bounding_box: jnp.ndarray,
                 c2w_staticcam: Optional[jnp.ndarray] = None,
                 occupancy=None, dense_frac: float = 0.0,
                 sparse_samples: int = 8, prior_bins: int = 0):
    """Full-image render via fixed-size chunks under ``lax.map``.

    The TPU-native replacement for BatchifyRays' dynamic chunk loop
    (NeRFRenderer.h:465-525): pixels are padded to a multiple of cfg.chunk so
    every chunk has identical shape and the scan body compiles exactly once.

    ``dense_frac`` > 0 (with the tile-ordered occupancy path active) enables
    the two-class tile sample budget: the top dense_frac of the image's
    128-pixel tiles by occupancy mass render at cfg.n_samples, the rest
    (background/empty space) at ``sparse_samples`` — object-centric frames
    are mostly empty tiles, so this multiplies render throughput.

    Returns (RenderOutputs with [h, w, ...] maps, (near_min, far_max)).
    """
    # tile order: render the image padded to 8x16-tile multiples with pixels
    # enumerated tile-by-tile (pure reshapes/transposes both ways); border
    # padding renders extra rays whose results are sliced away
    th, tw = 8, 16
    hp = -(-h // th) * th if cfg.tile_order else h
    wp = -(-w // tw) * tw if cfg.tile_order else w

    def flatten_pixels(x):
        if not cfg.tile_order:
            return x.reshape(-1, x.shape[-1])
        c = x.shape[-1]
        return (x.reshape(hp // th, th, wp // tw, tw, c)
                .transpose(0, 2, 1, 3, 4).reshape(-1, c))

    rays_o, rays_d, cone_angle = ray_math.get_rays(hp, wp, k, c2w)

    viewdirs = None
    if cfg.use_viewdirs:
        vd_src = rays_d
        if c2w_staticcam is not None:
            rays_o, rays_d, cone_angle = ray_math.get_rays(hp, wp, k,
                                                           c2w_staticcam)
        viewdirs = vd_src / jnp.linalg.norm(vd_src, axis=-1, keepdims=True)
        viewdirs = flatten_pixels(viewdirs)

    if cfg.ndc:
        if occupancy is not None and cfg.n_occ_bins > 0:
            # same guard render_ray_batch raises: the density grid lives in
            # world space, so sampling it with NDC coordinates is meaningless
            raise ValueError("occupancy-guided sampling is incompatible with "
                             "NDC rays (the grid lives in world space)")
        # NDC projection must use the TRUE image dims: ndc_rays scales by
        # w/h, and tile padding only appends extra pixels whose per-pixel
        # directions (from intrinsics) are unaffected by the pad.
        rays_o, rays_d, cone_angle = ray_math.ndc_rays(
            h, w, float(k[0, 0]), 1.0, rays_o, rays_d,
            None if cfg.thin_ray else cone_angle)

    rays_o = flatten_pixels(rays_o)
    rays_d = flatten_pixels(rays_d)
    # NDC rescales the cone angle per ray ([hp, wp, 1]); flatten it alongside
    # the rays so each chunk slices its own angles (a scalar stays closed-over)
    per_ray_cone = (not cfg.thin_ray and hasattr(cone_angle, "ndim")
                    and cone_angle.ndim == 3)
    if per_ray_cone:
        cone_angle = flatten_pixels(cone_angle)
    near, far = ray_math.intersect_aabb(rays_o, rays_d, bounding_box)

    n = hp * wp
    has_viewdirs = viewdirs is not None

    def render_flat(ro, rd, nr, fr, vd, kk, ccfg, z_all=None, ca=None):
        """Chunked lax.map render of a flat ray set; z_all [n', S] are
        precomputed sample depths (budget path) or None (per-chunk occ);
        ca [n', 1] are per-ray cone angles (NDC rescale) or None (scalar)."""
        m = ro.shape[0]
        ch = min(ccfg.chunk, m)
        n_ch = -(-m // ch)
        pad_m = n_ch * ch - m

        def pad0(x):
            return jnp.pad(x, [(0, pad_m)] + [(0, 0)] * (x.ndim - 1))

        args = (pad0(ro).reshape(n_ch, ch, 3),
                pad0(rd).reshape(n_ch, ch, 3),
                pad0(nr).reshape(n_ch, ch, 1),
                pad0(fr).reshape(n_ch, ch, 1),
                (pad0(vd) if has_viewdirs else
                 jnp.zeros((m + pad_m, 3))).reshape(n_ch, ch, 3),
                jax.random.split(kk, n_ch),
                (pad0(z_all).reshape(n_ch, ch, -1)
                 if z_all is not None else jnp.zeros((n_ch,))),
                (pad0(ca).reshape(n_ch, ch, 1)
                 if ca is not None else jnp.zeros((n_ch,))))

        def render_chunk(a):
            ro_c, rd_c, nr_c, fr_c, vd_c, kk_c, z_c, ca_c = a
            if z_all is not None:
                occ_bins = z_c
            elif occupancy is not None and ccfg.n_occ_bins > 0:
                occ_bins = _occ_bins_or_z(occupancy, ro_c, rd_c, nr_c, fr_c,
                                          bounding_box, ccfg, kk_c)
            else:
                occ_bins = None
            cone = ca_c if ca is not None else cone_angle
            res = render_rays(params, network_fn, integrate_fn,
                              ro_c, rd_c, nr_c, fr_c,
                              vd_c if has_viewdirs else None,
                              None if ccfg.thin_ray else cone, kk_c,
                              ccfg, bounding_box=bounding_box,
                              occ_bins=occ_bins)
            return res.outputs

        out = jax.lax.map(render_chunk, args)
        return jax.tree.map(
            lambda x: (x.reshape(n_ch * ch, *x.shape[2:])[:m]
                       if x is not None else None), out,
            is_leaf=lambda x: x is None)

    use_budget = (dense_frac > 0.0 and occupancy is not None
                  and cfg.n_occ_bins > 0 and cfg.tile_order
                  and n % 128 == 0 and n // 128 >= 2)
    if use_budget:
        from nerfpp_tpu.core.occupancy import tiled_prior
        tile = 128                        # one 8x16 pixel tile per 128 rays
        n_tiles = n // tile
        k_dense = k_dense_of(dense_frac, n_tiles)
        edges_c, d_c, mass, near_t, far_t = _cheap_tile_probe(
            occupancy, rays_o, rays_d, near, far, bounding_box)
        sub_r, sub_b = d_c.shape[0] // n_tiles, d_c.shape[1]
        order = jnp.argsort(-mass)
        kd, ks = jax.random.split(key)

        def render_class(tiles, n_s, kk, edges_t, w_t):
            ridx = (tiles[:, None] * tile
                    + jnp.arange(tile, dtype=tiles.dtype)).reshape(-1)
            z_t = S.sample_pdf(edges_t, w_t, n_s, det=True,
                               key=jax.random.fold_in(kk, 0x0CC))
            z = jnp.repeat(z_t, tile, axis=0)
            ccfg = dataclasses.replace(cfg, n_samples=n_s)
            out = render_flat(rays_o[ridx], rays_d[ridx],
                              near[ridx][:, None], far[ridx][:, None],
                              viewdirs[ridx] if has_viewdirs else None,
                              kk, ccfg, z_all=z)
            return out, ridx

        # dense class: full-resolution prior on its own rays only. The prior
        # depth range is NARROWED to the span where the cheap probe saw mass
        # (+1 probe bin ~ 1/16 range margin each side): at render time empty
        # depth needs no uniform-floor supervision, so the prior's bins
        # concentrate where the surfaces are — grid traffic drops with
        # prior_bins while placement granularity inside the span improves.
        dtiles = order[:k_dense]
        dray = (dtiles[:, None] * tile
                + jnp.arange(tile, dtype=dtiles.dtype)).reshape(-1)
        pb = abs(prior_bins) if prior_bins != 0 else cfg.n_occ_bins
        narrow = prior_bins >= 0   # prior_bins < 0: |bins| without narrowing
        # a probe bin counts as occupied above 2% of the tile's peak density
        # (trunc_exp densities are never exactly zero, so an absolute zero
        # test would never narrow anything)
        bm = d_c.reshape(n_tiles, sub_r, sub_b).max(axis=1)        # [T, B]
        occ_bin = bm > 0.02 * jnp.max(bm, axis=1, keepdims=True)
        any_occ = occ_bin.any(axis=1)
        bi = jnp.arange(sub_b)
        lo = jnp.min(jnp.where(occ_bin, bi, sub_b), axis=1) - 1   # [T]
        hi = jnp.max(jnp.where(occ_bin, bi, -1), axis=1) + 2
        lo = jnp.clip(lo, 0, sub_b)
        hi = jnp.clip(hi, 0, sub_b)
        edges_tile = edges_c.reshape(n_tiles, sub_r, -1)[:, 0, :]  # [T, B+1]
        narrow_ok = any_occ if narrow else jnp.zeros_like(any_occ)
        near_n = jnp.where(narrow_ok,
                           jnp.take_along_axis(edges_tile, lo[:, None],
                                               axis=1)[:, 0], near_t)
        far_n = jnp.where(narrow_ok,
                          jnp.take_along_axis(edges_tile, hi[:, None],
                                              axis=1)[:, 0], far_t)
        edges_d, w_d, _ = tiled_prior(
            occupancy, rays_o[dray], rays_d[dray],
            jnp.repeat(near_n[dtiles], tile)[:, None],
            jnp.repeat(far_n[dtiles], tile)[:, None], bounding_box, pb,
            cfg.occ_uniform_frac, tile)
        out_d, idx_d = render_class(dtiles, cfg.n_samples, kd, edges_d, w_d)
        # sparse class: prior from the cheap probe
        stiles = order[k_dense:]
        d_t = d_c.reshape(n_tiles, sub_r, sub_b).mean(axis=1)[stiles]
        pdf_s = d_t / jnp.maximum(d_t.sum(-1, keepdims=True), 1e-8)
        w_s = ((1.0 - cfg.occ_uniform_frac) * pdf_s
               + cfg.occ_uniform_frac / sub_b)
        edges_s = edges_c.reshape(n_tiles, sub_r, -1)[:, 0, :][stiles]
        out_s, idx_s = render_class(stiles, sparse_samples, ks,
                                    edges_s, w_s)
        # scatter both classes back to image order (per-sample fields like
        # weights have class-dependent S; they are dropped below anyway)
        per_sample_axes = {"weights", "lang_embedding"}

        def combine(f, a, b):
            if a is None or f in per_sample_axes:
                return None
            buf = jnp.zeros((n, *a.shape[1:]), a.dtype)
            return buf.at[idx_d].set(a).at[idx_s].set(b)

        outputs = out_d._replace(**{
            f: combine(f, getattr(out_d, f), getattr(out_s, f))
            for f in out_d._fields})
    else:
        outputs = render_flat(rays_o, rays_d, near[:, None], far[:, None],
                              viewdirs, key, cfg,
                              ca=cone_angle if per_ray_cone else None)

    def unshape(flat):
        rest = flat.shape[1:]
        if not cfg.tile_order:
            return flat.reshape(h, w, *rest)
        img = (flat.reshape(hp // th, wp // tw, th, tw, *rest)
               .transpose(0, 2, 1, 3, *range(4, 4 + len(rest)))
               .reshape(hp, wp, *rest))
        return img[:h, :w]

    # Per-sample fields (weights, per-sample lang embeddings) would be huge
    # image-wide; drop them. None fields (e.g. unset relevancy) pass through.
    per_sample = {"weights", "lang_embedding"}
    replacements = {}
    for f in outputs._fields:
        v = getattr(outputs, f)
        if f in per_sample:
            replacements[f] = jnp.zeros((0,), jnp.float32)
        elif v is not None:
            replacements[f] = unshape(v)
    out = outputs._replace(**replacements)
    return out, (jnp.min(near), jnp.max(far))
