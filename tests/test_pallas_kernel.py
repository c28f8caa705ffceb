"""Fused hash-encode kernel parity tests (interpret mode on CPU; the same
kernel compiles through Mosaic on TPU — hardware parity is checked by the
bench harness, PERFORMANCE.md records measured numbers)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerfpp_tpu.encoders.hashgrid import HashGridEncoder
from nerfpp_tpu.ops.scatter_matmul import scatter_add, scatter_add_matmul

BBOX = np.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0], np.float32)


def _encoders(scheme, **kw):
    args = dict(n_levels=4, log2_hashmap_size=10, base_resolution=4,
                finest_resolution=32, scheme=scheme, primes_seed=5)
    args.update(kw)
    ref = HashGridEncoder(BBOX, **args)
    pal = HashGridEncoder(BBOX, use_pallas=True, **args)
    return ref, pal


@pytest.mark.parametrize("scheme", ["random", "fixed"])
def test_fused_kernel_matches_xla_path(scheme):
    ref, pal = _encoders(scheme)
    params = ref.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (256, 3),
                           minval=-0.95, maxval=0.95)
    out_ref, m1 = ref(params, x)
    out_pal, m2 = pal(params, x)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


def test_fused_kernel_gradient_matches():
    ref, pal = _encoders("random")
    params = ref.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (256, 3),
                           minval=-0.95, maxval=0.95)
    g = jax.random.normal(jax.random.PRNGKey(2), (256, 8))

    def loss(enc):
        return lambda p: jnp.sum(enc(p, x)[0] * g)

    g_ref = jax.grad(loss(ref))(params)["table"]
    g_pal = jax.grad(loss(pal))(params)["table"]
    # backward uses bf16 matmul-scatter: tolerance accordingly
    scale = float(jnp.max(jnp.abs(g_ref))) + 1e-12
    np.testing.assert_allclose(np.asarray(g_pal) / scale,
                               np.asarray(g_ref) / scale, atol=5e-3)


def test_kernel_rejects_oversized_tables():
    with pytest.raises(ValueError):
        HashGridEncoder(BBOX, n_levels=16, log2_hashmap_size=19,
                        use_pallas=True)


def test_scatter_add_matmul_matches_native():
    key = jax.random.PRNGKey(0)
    size = 1 << 12
    idx = jax.random.randint(key, (5000,), 0, size)
    vals = jax.random.normal(jax.random.PRNGKey(1), (5000, 2))
    got = scatter_add_matmul(idx, vals, size)
    expect = jnp.zeros((size, 2)).at[idx].add(vals)
    scale = float(jnp.max(jnp.abs(expect))) + 1e-12
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(expect) / scale, atol=5e-3)


def test_scatter_add_dispatch():
    idx = jnp.array([0, 1, 1, 5])
    vals = jnp.ones((4, 2))
    out = scatter_add(idx, vals, 8)
    np.testing.assert_allclose(np.asarray(out[1]), [2.0, 2.0], atol=1e-2)
    # non-power-of-two falls back to the XLA path
    out2 = scatter_add(idx, vals, 9)
    np.testing.assert_allclose(np.asarray(out2[1]), [2.0, 2.0], atol=1e-6)
