"""Volume integration: density -> alpha -> transmittance-weighted compositing.

Re-designs the reference's raw-output transform (NeRFRenderer.h:198-282) and the
truncated-gradient exponential (CustomOps.{h,cpp}) as pure JAX with a custom VJP.
The transmittance product is computed in log space exactly as the reference does
(``compute_weights_in_log_space``, NeRFRenderer.h:260-270): a cheap cumsum that XLA
fuses, numerically safe via a 1e-10 clamp on (1 - alpha).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x):
    """exp(x) whose gradient uses exp(clamp(x, -100, 5)) — keeps density gradients
    bounded (CustomOps.cpp:5-15)."""
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -100.0, 5.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


class RenderOutputs(NamedTuple):
    """Per-ray compositing results (mirrors NeRFRendererOutputs, NeRFRenderer.h:12-18)."""
    rgb: jnp.ndarray      # [n_rays, 3]
    disp: jnp.ndarray     # [n_rays]
    acc: jnp.ndarray      # [n_rays]
    weights: jnp.ndarray  # [n_rays, n_samples]
    depth: jnp.ndarray    # [n_rays]


def dists_from_z(z_vals: jnp.ndarray, rays_d: jnp.ndarray) -> jnp.ndarray:
    """Inter-sample distances with a 1e10 tail, scaled by ||rays_d||
    (NeRFRenderer.h:239-241)."""
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate([dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1)
    return dists * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)


def alpha_from_density(density: jnp.ndarray, dists: jnp.ndarray,
                       activation: str = "relu") -> jnp.ndarray:
    """alpha = 1 - trunc_exp(-act(sigma) * dists).

    activation="relu" is the reference semantics (NeRFRenderer.h:234). It has a
    dead zone: once every density output is negative, gradients stop entirely
    (a real failure mode with the reference's 0.1-gain bias-free init and
    lr 1e-2 Adam). activation="trunc_exp" is the instant-NGP density (exp with
    truncated gradient) — strictly positive, gradients always flow; preferred
    for the TPU flagship configs.
    """
    if activation == "relu":
        act = jax.nn.relu(density)
    elif activation == "trunc_exp":
        act = trunc_exp(density)
    elif activation == "softplus":
        act = jax.nn.softplus(density)
    else:
        raise ValueError(f"unknown density activation {activation!r}")
    return 1.0 - trunc_exp(-act * dists)


def weights_from_alpha(alpha: jnp.ndarray) -> jnp.ndarray:
    """Compositing weights via log-space transmittance (NeRFRenderer.h:260-270).

    weights_i = alpha_i * exp(sum_{j<i} log(clamp(1 - alpha_j, 1e-10))).
    """
    log_1m = jnp.log(jnp.maximum(1.0 - alpha, 1e-10))
    log_trans = jnp.concatenate(
        [jnp.zeros_like(log_1m[..., :1]), jnp.cumsum(log_1m, axis=-1)[..., :-1]], axis=-1)
    return alpha * trunc_exp(log_trans)


def raw2outputs(raw: jnp.ndarray, z_vals: jnp.ndarray, rays_d: jnp.ndarray,
                raw_noise_std=0.0, white_bkgr: bool = False,
                key: jax.Array | None = None,
                density_activation: str = "relu") -> RenderOutputs:
    """Model outputs [n_rays, n_samples, 4(+extras)] -> composited ray values.

    Channel layout follows the reference: raw[..., :3] = rgb logits (sigmoid
    applied here), raw[..., 3] = density before activation (optional Gaussian
    noise regularizer added pre-activation; ``raw_noise_std`` may be a traced
    scalar — the noise path is enabled statically by passing a key). Depth is
    the weight-normalized expected z (NeRFRenderer.h:272); white background
    composites (1 - acc).
    """
    dists = dists_from_z(z_vals, rays_d)
    rgb = jax.nn.sigmoid(raw[..., :3])

    density = raw[..., 3]
    if key is not None:
        density = density + jax.random.normal(key, density.shape) * raw_noise_std

    alpha = alpha_from_density(density, dists, density_activation)
    weights = weights_from_alpha(alpha)

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    acc = jnp.sum(weights, axis=-1)
    depth = jnp.sum(weights * z_vals, axis=-1) / jnp.maximum(acc, 1e-10)
    disp = 1.0 / jnp.maximum(1e-10, depth)

    if white_bkgr:
        rgb_map = rgb_map + (1.0 - acc[..., None])

    return RenderOutputs(rgb=rgb_map, disp=disp, acc=acc, weights=weights, depth=depth)


def psnr_from_mse(mse: jnp.ndarray) -> jnp.ndarray:
    """PSNR = -10 log10(mse) (NeRFExecutor.h:893)."""
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def huber_loss(pred: jnp.ndarray, target: jnp.ndarray, delta: float = 1.0) -> jnp.ndarray:
    """Elementwise Huber loss with the torch convention (quadratic inside delta,
    delta*(|e| - delta/2) outside) — the reference trains with
    torch::huber_loss(..., delta=1.0) for RGB (NeRFExecutor.h:883) and delta=1.25
    for language embeddings (NeRFExecutor.h:969)."""
    err = pred - target
    abs_err = jnp.abs(err)
    quad = 0.5 * err ** 2
    lin = delta * (abs_err - 0.5 * delta)
    return jnp.where(abs_err <= delta, quad, lin)
