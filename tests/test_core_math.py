"""Oracle tests for the core ray/sampling/integration math (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfpp_tpu.core import rays as R
from nerfpp_tpu.core import sampling as S
from nerfpp_tpu.core import integrate as I


def test_get_directions_center_pixel():
    k = jnp.asarray(R.calibration_matrix(100.0, 8, 8))
    dirs = R.get_directions(8, 8, k)
    assert dirs.shape == (8, 8, 3)
    # center-ish pixel points almost straight down -z
    d = np.asarray(dirs[4, 4])
    np.testing.assert_allclose(d, [0.0, 0.0, -1.0], atol=0.01)
    # +x pixel direction has positive x; +y pixel (down in image) has negative y
    assert dirs[4, 7, 0] > 0 and dirs[7, 4, 1] < 0


def test_get_rays_identity_pose():
    k = jnp.asarray(R.calibration_matrix(50.0, 4, 4))
    c2w = jnp.eye(4)
    rays_o, rays_d, cone = R.get_rays(4, 4, k, c2w)
    assert rays_o.shape == (4, 4, 3) and rays_d.shape == (4, 4, 3)
    np.testing.assert_allclose(np.asarray(rays_o), 0.0)
    np.testing.assert_allclose(float(cone), 1.1 / 50.0, rtol=1e-6)
    # with identity pose, world dirs == camera dirs
    np.testing.assert_allclose(np.asarray(rays_d),
                               np.asarray(R.get_directions(4, 4, k)), atol=1e-6)


def test_get_ray_batch_matches_full_image():
    k = jnp.asarray(R.calibration_matrix(60.0, 6, 5))
    c2w = jnp.asarray(R.pose_spherical(30.0, -30.0, 4.0))
    rays_o, rays_d, _ = R.get_rays(5, 6, k, c2w)
    xs = jnp.array([0, 3, 5])
    ys = jnp.array([1, 2, 4])
    bo, bd, _ = R.get_ray_batch(xs, ys, k, c2w)
    np.testing.assert_allclose(np.asarray(bd), np.asarray(rays_d[ys, xs]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(bo), np.asarray(rays_o[ys, xs]), atol=1e-5)


def test_intersect_aabb():
    bbox = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    o = jnp.array([[0.0, 0.0, 3.0], [0.0, 0.0, 3.0], [5.0, 5.0, 5.0]])
    d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, 1.0], [1.0, 1.0, 1.0]])
    near, far = R.intersect_aabb(o, d, bbox)
    # first ray enters box at z=1 (t=2) and exits z=-1 (t=4)
    np.testing.assert_allclose(float(near[0]), 2.0, atol=1e-3)
    np.testing.assert_allclose(float(far[0]), 4.0, atol=1e-3)
    # second ray points away: clamped, far > near
    assert float(far[1]) > float(near[1])
    # third ray misses/behind: still far > near (degenerate interval)
    assert float(far[2]) > float(near[2])


def test_c2w_roundtrip():
    pose = jnp.asarray(R.pose_spherical(45.0, -20.0, 3.0))
    inv = R.c2w_to_w2c(pose)
    np.testing.assert_allclose(np.asarray(inv @ pose), np.eye(4), atol=1e-5)


def test_ndc_rays_z_range():
    # forward-facing rays: after NDC projection o2 in [-1, 1]-ish range
    h, w, focal = 10, 10, 12.0
    o = jnp.array([[0.1, 0.2, -1.0]])
    d = jnp.array([[0.01, 0.02, -1.0]])
    no, nd, _ = R.ndc_rays(h, w, focal, 1.0, o, d, None)
    assert no.shape == (1, 3) and nd.shape == (1, 3)
    # origin moved onto the near plane => o2 = 1 + 2*near/z = 1 - 2 = -1
    np.testing.assert_allclose(float(no[0, 2]), -1.0, atol=1e-5)


def test_sample_z_vals_linear_and_disparity():
    near = jnp.full((4, 1), 2.0)
    far = jnp.full((4, 1), 6.0)
    z = S.sample_z_vals(near, far, 5)
    np.testing.assert_allclose(np.asarray(z[0]), [2.0, 3.0, 4.0, 5.0, 6.0], atol=1e-5)
    zd = S.sample_z_vals(near, far, 3, lin_disp=True)
    np.testing.assert_allclose(np.asarray(zd[0]), [2.0, 3.0, 6.0], atol=1e-4)


def test_sample_z_vals_perturb_within_bins():
    near = jnp.zeros((8, 1))
    far = jnp.full((8, 1), 1.0)
    z0 = S.sample_z_vals(near, far, 16)
    z = S.sample_z_vals(near, far, 16, perturb=1.0, key=jax.random.PRNGKey(0))
    assert z.shape == (8, 16)
    # stratified: stays within [lower, upper] bins => sorted per ray
    assert bool(jnp.all(z[:, 1:] >= z[:, :-1]))
    assert not np.allclose(np.asarray(z), np.asarray(z0))


def test_sample_pdf_det_concentrates_mass():
    # all weight in one bin -> deterministic samples land inside that bin
    bins = jnp.linspace(0.0, 1.0, 6)[None, :].repeat(2, 0)  # [2, 6]
    weights = jnp.array([[0.0, 0.0, 10.0, 0.0, 0.0],
                         [10.0, 0.0, 0.0, 0.0, 0.0]])
    samples = S.sample_pdf(bins, weights, 100, det=True)
    assert samples.shape == (2, 100)
    s0 = np.asarray(samples[0])
    # middle bin is [0.4, 0.6]
    assert (s0 >= 0.4 - 1e-3).mean() > 0.95 and (s0 <= 0.6 + 1e-3).mean() > 0.95
    s1 = np.asarray(samples[1])
    assert (s1 <= 0.2 + 1e-3).mean() > 0.95


def test_sample_pdf_stochastic_statistics():
    bins = jnp.linspace(0.0, 1.0, 5)[None, :].repeat(1, 0)
    weights = jnp.array([[1.0, 1.0, 1.0, 1.0]])
    samples = S.sample_pdf(bins, weights, 4096, det=False, key=jax.random.PRNGKey(1))
    m = float(jnp.mean(samples))
    assert abs(m - 0.5) < 0.02  # uniform pdf -> mean 0.5


def test_sample_pdf_sorted_by_construction():
    # stress: degenerate (zero-weight) bins, stochastic and det u, many keys —
    # the output must be exactly non-decreasing per ray so the renderer's
    # rank merge (merge_sorted) is valid without a post-sort.
    rng = np.random.RandomState(3)
    bins = np.sort(rng.rand(64, 33), axis=-1).astype(np.float32)
    weights = rng.rand(64, 32).astype(np.float32)
    weights[weights < 0.7] = 0.0  # many empty bins -> flat cdf regions
    for det in (True, False):
        for seed in range(5):
            z = S.sample_pdf(jnp.asarray(bins), jnp.asarray(weights), 48,
                             det=det, key=jax.random.PRNGKey(seed))
            z = np.asarray(z)
            assert (np.diff(z, axis=-1) >= 0).all(), (det, seed)
    # sorted-u stochastic samples keep the right marginal distribution:
    # uniform weights -> samples uniform on [bins0, bins-1]
    u_bins = jnp.linspace(0.0, 1.0, 9)[None]
    zs = S.sample_pdf(jnp.broadcast_to(u_bins, (256, 9)),
                      jnp.ones((256, 8)), 64, det=False,
                      key=jax.random.PRNGKey(9))
    flat = np.sort(np.asarray(zs).ravel())
    ks = np.max(np.abs(flat - np.linspace(0, 1, flat.size)))
    assert ks < 0.02


def test_sample_z_vals_monotone_for_grazing_rays():
    # rays that barely graze the AABB give far - near at the f32 ulp scale;
    # the naive lerp near*(1-t)+far*t is NOT monotone under rounding there
    # (found as a live training divergence once jnp.sort was removed).
    near = jnp.float32(3.4783795)
    far = near + jnp.float32(8e-7)
    z = S.sample_z_vals(jnp.full((4, 1), near), jnp.full((4, 1), far), 16)
    assert bool(jnp.all(jnp.diff(z, axis=-1) >= 0))
    zd = S.sample_z_vals(jnp.full((4, 1), near), jnp.full((4, 1), far), 16,
                         lin_disp=True)
    assert bool(jnp.all(jnp.diff(zd, axis=-1) >= 0))


def test_merge_sorted_equals_sort_on_renderer_inputs():
    # exactly the renderer's merge: stratified coarse z + sample_pdf fine z
    key = jax.random.PRNGKey(4)
    near = jnp.full((32, 1), 2.0)
    far = jnp.full((32, 1), 6.0)
    z = S.sample_z_vals(near, far, 16, perturb=1.0, key=key)
    mids = 0.5 * (z[..., 1:] + z[..., :-1])
    w = jax.random.uniform(jax.random.PRNGKey(5), (32, 15)) ** 4
    zf = S.sample_pdf(mids, w[..., 1:-1], 24, det=False,
                      key=jax.random.PRNGKey(6))
    merged = S.merge_sorted(z, zf)
    expect = jnp.sort(jnp.concatenate([z, zf], axis=-1), axis=-1)
    np.testing.assert_allclose(np.asarray(merged), np.asarray(expect),
                               rtol=0, atol=0)


def test_sample_pdf_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    bins = np.sort(rng.rand(3, 9), axis=-1).astype(np.float32)
    weights = rng.rand(3, 8).astype(np.float32)
    n = 7
    got = np.asarray(S.sample_pdf(jnp.asarray(bins), jnp.asarray(weights), n, det=True))

    # NumPy oracle with the same semantics
    w = weights + 1e-8
    pdf = w / w.sum(-1, keepdims=True)
    cdf = np.concatenate([np.zeros((3, 1), np.float32), np.cumsum(pdf, -1)], -1)
    u = np.broadcast_to(np.linspace(0, 1, n, dtype=np.float32), (3, n))
    expect = np.zeros((3, n), np.float32)
    for i in range(3):
        inds = np.searchsorted(cdf[i], u[i], side="right")
        below = np.maximum(0, inds - 1)
        above = np.minimum(cdf.shape[-1] - 1, inds)
        cdf_b, cdf_a = cdf[i][below], cdf[i][above]
        bins_b = bins[i][np.minimum(below, bins.shape[-1] - 1)]
        bins_a = bins[i][np.minimum(above, bins.shape[-1] - 1)]
        denom = np.where(cdf_a - cdf_b < 1e-5, 1.0, cdf_a - cdf_b)
        t = (u[i] - cdf_b) / denom
        expect[i] = bins_b + t * (bins_a - bins_b)
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_trunc_exp_value_and_grad():
    x = jnp.array([-200.0, -1.0, 0.0, 2.0, 10.0])
    # atol covers denormal flush-to-zero at exp(-200)
    np.testing.assert_allclose(np.asarray(I.trunc_exp(x)), np.exp(np.asarray(x)),
                               rtol=1e-5, atol=1e-40)
    g = jax.grad(lambda v: jnp.sum(I.trunc_exp(v)))(x)
    expect = np.exp(np.clip(np.asarray(x), -100.0, 5.0))
    np.testing.assert_allclose(np.asarray(g), expect, rtol=1e-5, atol=1e-40)


def test_raw2outputs_transmittance_identities():
    key = jax.random.PRNGKey(0)
    raw = jax.random.normal(key, (16, 32, 4))
    z = jnp.broadcast_to(jnp.linspace(1.0, 3.0, 32), (16, 32))
    d = jnp.concatenate([jnp.zeros((16, 2)), -jnp.ones((16, 1))], axis=-1)
    out = I.raw2outputs(raw, z, d)
    w = np.asarray(out.weights)
    assert w.shape == (16, 32)
    assert (w >= 0).all()
    # sum of weights (acc) <= 1 + eps
    assert (np.asarray(out.acc) <= 1.0 + 1e-4).all()
    # against direct cumprod formulation
    alpha = np.asarray(I.alpha_from_density(raw[..., 3], I.dists_from_z(z, d)))
    trans = np.cumprod(np.concatenate([np.ones((16, 1)), 1 - alpha + 1e-12], -1), -1)[:, :-1]
    np.testing.assert_allclose(w, alpha * trans, atol=1e-4)


def test_raw2outputs_white_background():
    # zero density -> fully transparent -> white pixel
    raw = jnp.zeros((4, 8, 4)) - 1e9  # sigmoid->0 rgb, relu->0 sigma
    raw = raw.at[..., 3].set(-1e9)
    z = jnp.broadcast_to(jnp.linspace(0.1, 1.0, 8), (4, 8))
    d = jnp.concatenate([jnp.zeros((4, 2)), -jnp.ones((4, 1))], axis=-1)
    out = I.raw2outputs(raw, z, d, white_bkgr=True)
    np.testing.assert_allclose(np.asarray(out.rgb), 1.0, atol=1e-5)
    out2 = I.raw2outputs(raw, z, d, white_bkgr=False)
    np.testing.assert_allclose(np.asarray(out2.rgb), 0.0, atol=1e-5)


def test_raw2outputs_opaque_wall_depth():
    # very high density at sample 10 -> depth == z[10]
    raw = jnp.full((2, 32, 4), -1e9)
    raw = raw.at[:, :, 3].set(-1e9)
    raw = raw.at[:, 10, 3].set(1e4)
    z = jnp.broadcast_to(jnp.linspace(1.0, 4.0, 32), (2, 32))
    d = jnp.concatenate([jnp.zeros((2, 2)), -jnp.ones((2, 1))], axis=-1)
    out = I.raw2outputs(raw, z, d)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(z[:, 10]), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.acc), 1.0, atol=1e-4)


def test_reflect_boundary():
    mn = jnp.array([0.0, 0.0, 0.0])
    mx = jnp.array([1.0, 1.0, 1.0])
    pts = jnp.array([[1.2, -0.3, 0.5], [2.5, 0.1, 1.0]])
    out = np.asarray(S.reflect_boundary(pts, mn, mx))
    assert (out >= 0.0 - 1e-6).all() and (out <= 1.0 + 1e-6).all()
    np.testing.assert_allclose(out[0], [0.8, 0.3, 0.5], atol=1e-6)
    np.testing.assert_allclose(out[1], [0.5, 0.1, 1.0], atol=1e-6)


def test_tangent_scatter_perpendicular_offsets():
    key = jax.random.PRNGKey(2)
    n_rays, n_samples = 32, 8
    rays_d = jax.random.normal(key, (n_rays, 3))
    z = jnp.broadcast_to(jnp.linspace(1.0, 2.0, n_samples), (n_rays, n_samples))
    pts = rays_d[:, None, :] * z[..., None]
    cone = 0.01
    out = S.tangent_scatter(pts, z, cone, rays_d, jax.random.PRNGKey(3))
    offs = np.asarray(out - pts)  # [n_rays, n_samples, 3]
    d = np.asarray(rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True))
    dots = np.einsum("rsk,rk->rs", offs, d)
    np.testing.assert_allclose(dots, 0.0, atol=1e-5)  # perpendicular to ray
    radii = np.linalg.norm(offs, axis=-1)
    assert (radii <= cone * np.asarray(z) + 1e-6).all()  # inside the cone
    # thin ray: no-op
    out_thin = S.tangent_scatter(pts, z, None, rays_d, jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(out_thin), np.asarray(pts))


def test_huber_and_psnr():
    p = jnp.array([0.0, 2.0])
    t = jnp.array([0.5, 0.0])
    h = np.asarray(I.huber_loss(p, t, delta=1.0))
    np.testing.assert_allclose(h, [0.125, 1.5], atol=1e-6)
    assert abs(float(I.psnr_from_mse(jnp.asarray(0.01))) - 20.0) < 1e-3
