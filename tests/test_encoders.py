"""Encoder tests: frequency PE, SH vs scipy oracle, hash grid vs NumPy oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import sph_harm_y

from nerfpp_tpu.encoders.frequency import FrequencyEncoder
from nerfpp_tpu.encoders.sh import SHEncoder, sh_encode
from nerfpp_tpu.encoders import hashgrid as HG


# ---------------------------------------------------------------- frequency

def test_frequency_encoder_dims_and_values():
    enc = FrequencyEncoder(num_freqs=10, max_freq_log2=9.0)
    assert enc.output_dims == 3 + 10 * 2 * 3 == 63
    x = jnp.array([[0.3, -0.2, 0.7]])
    out, mask = enc(x)
    assert mask is None and out.shape == (1, 63)
    o = np.asarray(out[0])
    np.testing.assert_allclose(o[:3], [0.3, -0.2, 0.7], atol=1e-6)
    # band 0 has freq 2^0 = 1: next 3 are sin(x), then cos(x)
    np.testing.assert_allclose(o[3:6], np.sin([0.3, -0.2, 0.7]), atol=1e-6)
    np.testing.assert_allclose(o[6:9], np.cos([0.3, -0.2, 0.7]), atol=1e-6)
    # last band freq = 2^9
    np.testing.assert_allclose(o[-3:], np.cos(512.0 * np.array([0.3, -0.2, 0.7])),
                               atol=1e-5)


def test_frequency_encoder_band_spacing():
    enc = FrequencyEncoder(num_freqs=4, max_freq_log2=3.0)
    np.testing.assert_allclose(enc.freq_bands, [1.0, 2.0, 4.0, 8.0])
    lin = FrequencyEncoder(num_freqs=3, max_freq_log2=3.0, log_sampling=False)
    np.testing.assert_allclose(lin.freq_bands, [1.0, 4.5, 8.0])


# ----------------------------------------------------------------------- SH

def _real_sh_scipy(l, m, dirs):
    """Real spherical harmonic Y_lm via scipy, with the sign convention used by
    the graphics SH tables (Condon-Shortley phase folded in)."""
    x, y, z = dirs[:, 0], dirs[:, 1], dirs[:, 2]
    theta = np.arccos(np.clip(z, -1, 1))
    phi = np.arctan2(y, x)
    if m == 0:
        return np.real(sph_harm_y(l, 0, theta, phi))
    if m > 0:
        return np.sqrt(2.0) * (-1.0) ** m * np.real(sph_harm_y(l, m, theta, phi))
    return np.sqrt(2.0) * (-1.0) ** m * np.imag(sph_harm_y(l, -m, theta, phi))


@pytest.mark.parametrize("degree", [1, 2, 3, 4, 5, 6, 7, 8])
def test_sh_matches_scipy(degree):
    rng = np.random.RandomState(0)
    v = rng.randn(64, 3)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    got = np.asarray(sh_encode(jnp.asarray(v, jnp.float32), degree))
    assert got.shape == (64, degree * degree)
    for l in range(degree):
        for j, m in enumerate(range(-l, l + 1)):
            expect = _real_sh_scipy(l, m, v)
            idx = l * l + j
            # the reference table's basis: components match scipy up to the
            # (-1)^m parity convention on odd m; compare up to global sign per (l,m)
            err_pos = np.abs(got[:, idx] - expect).max()
            err_neg = np.abs(got[:, idx] + expect).max()
            assert min(err_pos, err_neg) < 5e-4, (l, m, err_pos, err_neg)


def test_sh_encoder_interface():
    enc = SHEncoder(degree=8)
    assert enc.output_dims == 64
    out, mask = enc(jnp.array([[0.0, 0.0, 1.0]]))
    assert out.shape == (1, 64) and mask is None
    np.testing.assert_allclose(float(out[0, 0]), 0.28209479, rtol=1e-5)


# ---------------------------------------------------------------- hash grid

def _np_hash_fixed(corners, log2T):
    primes = np.array(HG.FIXED_PRIMES[:3], np.int64)
    h = (corners[..., 0] * primes[0]) ^ (corners[..., 1] * primes[1]) \
        ^ (corners[..., 2] * primes[2])
    return h & ((1 << log2T) - 1)


def test_hashgrid_fixed_matches_numpy_oracle():
    bbox = np.array([-1, -1, -1, 1, 1, 1], np.float32)
    enc = HG.HashGridEncoder(bbox, n_levels=4, n_features_per_level=2,
                             log2_hashmap_size=8, base_resolution=4,
                             finest_resolution=32, scheme="fixed")
    params = enc.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    x = rng.uniform(-1, 1, (32, 3)).astype(np.float32)
    out, mask = enc(params, jnp.asarray(x))
    assert out.shape == (32, 8)
    assert bool(jnp.all(mask))

    # NumPy oracle per level
    table = np.asarray(params["table"])
    b = np.exp((np.log(32) - np.log(4)) / 3)
    for lvl in range(4):
        res = np.floor(4 * b ** lvl)
        grid_size = 2.0 / res
        rel = (x + 1.0) / grid_size
        bottom = np.floor(rel).astype(np.int64)
        frac = rel - bottom
        corners = bottom[:, None, :] + HG._CORNER_OFFSETS[None]
        idx = _np_hash_fixed(corners, 8) + lvl * 256
        feats = table[idx]  # [N, 8, 2]
        w = np.stack([
            (1 - frac[:, 0]) * (1 - frac[:, 1]) * (1 - frac[:, 2]),
            (1 - frac[:, 0]) * (1 - frac[:, 1]) * frac[:, 2],
            (1 - frac[:, 0]) * frac[:, 1] * (1 - frac[:, 2]),
            (1 - frac[:, 0]) * frac[:, 1] * frac[:, 2],
            frac[:, 0] * (1 - frac[:, 1]) * (1 - frac[:, 2]),
            frac[:, 0] * (1 - frac[:, 1]) * frac[:, 2],
            frac[:, 0] * frac[:, 1] * (1 - frac[:, 2]),
            frac[:, 0] * frac[:, 1] * frac[:, 2],
        ], axis=1)  # [N, 8]
        expect = (feats * w[..., None]).sum(1)
        np.testing.assert_allclose(np.asarray(out[:, lvl * 2:(lvl + 1) * 2]),
                                   expect, atol=1e-5)


def test_hashgrid_keep_mask_and_clamp():
    bbox = np.array([0, 0, 0, 1, 1, 1], np.float32)
    enc = HG.HashGridEncoder(bbox, n_levels=2, log2_hashmap_size=6,
                             base_resolution=4, finest_resolution=8)
    params = enc.init(jax.random.PRNGKey(0))
    x = jnp.array([[0.5, 0.5, 0.5], [1.5, 0.5, 0.5], [-0.1, 0.2, 0.3]])
    out, mask = enc(params, x)
    np.testing.assert_array_equal(np.asarray(mask), [True, False, False])
    # clamped out-of-box point equals the boundary point's encoding
    out_b, _ = enc(params, jnp.array([[1.0, 0.5, 0.5]]))
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(out_b[0]), atol=1e-6)


def test_hashgrid_random_scheme_levels():
    bbox = np.array([-2, -2, -2, 2, 2, 2], np.float32)
    enc = HG.HashGridEncoder(bbox, n_levels=4, log2_hashmap_size=10,
                             base_resolution=4, finest_resolution=64,
                             scheme="random", primes_seed=7)
    # exp-spaced scales hit both endpoints exactly
    np.testing.assert_allclose(enc.level_scales[0], 4.0, rtol=1e-5)
    np.testing.assert_allclose(enc.level_scales[-1], 64.0, rtol=1e-5)
    assert enc.level_size == 1 << 10  # (2^10 >> 4) << 4 == 2^10
    assert enc.primes.shape == (4, 3)
    assert all(HG._is_prime(int(p)) for p in enc.primes.reshape(-1))
    assert (enc.primes >= (1 << 28)).all() and (enc.primes < (1 << 30)).all()

    params = enc.init(jax.random.PRNGKey(3))
    x = jax.random.uniform(jax.random.PRNGKey(4), (64, 3), minval=-2, maxval=2)
    out, mask = enc(params, x)
    assert out.shape == (64, 8) and bool(jnp.all(mask))
    assert np.isfinite(np.asarray(out)).all()


def test_hashgrid_gradients_scatter_to_table():
    bbox = np.array([0, 0, 0, 1, 1, 1], np.float32)
    enc = HG.HashGridEncoder(bbox, n_levels=2, log2_hashmap_size=6,
                             base_resolution=4, finest_resolution=8)
    params = enc.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3))

    def loss(p):
        out, _ = enc(p, x)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(params)["table"]
    assert g.shape == params["table"].shape
    assert float(jnp.sum(jnp.abs(g))) > 0
    # only touched rows have nonzero grad: at most 16 pts * 2 levels * 8 corners
    assert int(jnp.sum(jnp.any(g != 0, axis=-1))) <= 16 * 2 * 8


def test_hashgrid_interpolation_continuity():
    """Trilinear interp must be continuous across voxel faces."""
    bbox = np.array([0, 0, 0, 1, 1, 1], np.float32)
    enc = HG.HashGridEncoder(bbox, n_levels=2, log2_hashmap_size=8,
                             base_resolution=4, finest_resolution=8)
    params = enc.init(jax.random.PRNGKey(0))
    eps = 1e-5
    # face at x = 0.25 for the res=4 level
    a, _ = enc(params, jnp.array([[0.25 - eps, 0.4, 0.6]]))
    b, _ = enc(params, jnp.array([[0.25 + eps, 0.4, 0.6]]))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_total_variation_loss_runs():
    bbox = np.array([0, 0, 0, 1, 1, 1], np.float32)
    enc = HG.HashGridEncoder(bbox, n_levels=4, log2_hashmap_size=8,
                             base_resolution=4, finest_resolution=32)
    params = enc.init(jax.random.PRNGKey(0))
    for lvl in range(4):
        tv = HG.total_variation_loss(enc, params, lvl, jax.random.PRNGKey(lvl))
        assert float(tv) >= 0.0
    # constant table -> zero TV
    flat = {"table": jnp.ones_like(params["table"])}
    tv = HG.total_variation_loss(enc, flat, 1, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(tv), 0.0, atol=1e-10)
