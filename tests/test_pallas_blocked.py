"""Blocked-scheme hash encoding: layout invariants + fused-kernel parity.

The "blocked" scheme (encoders/hashgrid.py) is the TPU-native large-table
organization: 4^3-cell halo blocks in 128-lane rows, Morton slot order. The
fused kernel (pallas/hash_encode_blocked.py) must match the XLA oracle
(gather_trilerp_reference over corner_indices) exactly up to bf16 feature
rounding. Reference semantics anchor: CuHashEmbedder.cu:9-102 at T=2^19
(main.cpp:189) — same capacity, same trilerp, different (documented) hash.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerfpp_tpu.encoders.hashgrid import (BLOCK_LANES, HashGridEncoder,
                                          gather_trilerp_reference, morton3)
from nerfpp_tpu.pallas.hash_encode_blocked import (build_window_lists,
                                                   hash_encode_blocked)

BBOX = np.array([-1.5, -1.0, -1.2, 1.5, 1.0, 1.3], np.float32)


def _enc(**kw):
    args = dict(n_levels=4, log2_hashmap_size=12, base_resolution=16,
                finest_resolution=128, scheme="blocked")
    args.update(kw)
    return HashGridEncoder(BBOX, **args)


def _rand_pts(n, seed=1):
    return jax.random.uniform(jax.random.PRNGKey(seed), (n, 3),
                              minval=jnp.asarray(BBOX[:3]),
                              maxval=jnp.asarray(BBOX[3:]))


def test_param_count_parity():
    # capacity parity with the reference: n_levels * 2^T * F parameters
    enc = _enc(n_levels=3, log2_hashmap_size=14)
    p = enc.init(jax.random.PRNGKey(0))
    assert p["table"].shape == (3 * (1 << 14), 2)


def test_halo_guarantee_and_lane_layout():
    # all 8 corners of any cell live in ONE table row (the halo property the
    # kernel's single-row gather relies on), at lanes base + {0,1,5,6,25,...}
    enc = _enc()
    idx, _ = enc.corner_indices(_rand_pts(500))
    rows = np.asarray(idx) // BLOCK_LANES
    assert (rows == rows[..., :1]).all()
    lanes = np.asarray(idx) % BLOCK_LANES
    assert lanes.max() < 125  # 5^3 vertices
    rel = lanes - lanes[..., :1]
    np.testing.assert_array_equal(
        np.sort(np.unique(rel)), [0, 1, 5, 6, 25, 26, 30, 31])


def test_morton_window_alignment():
    # an aligned 2x2x2-block cube = one aligned 8-slot window: slots of the
    # cube differ from (morton(oct) << 3) only in the low 3 bits
    enc = _enc()
    cell, _ = enc.blocked_cell_frac(_rand_pts(500))
    slot = np.asarray(enc.blocked_slot(cell))
    ob = np.asarray(enc.blocked_oct(cell))
    oct_m = morton3(ob[..., 0] >> 1, ob[..., 1] >> 1, ob[..., 2] >> 1)
    ws = (oct_m << 3) & (enc.block_slots - 1)
    assert ((slot >> 3) << 3 == ws).all()


def test_injective_when_under_capacity():
    # a level whose block grid fits in S must be collision-free
    enc = _enc(n_levels=1, base_resolution=16, finest_resolution=16,
               log2_hashmap_size=13)  # 5 blocks/axis after offset, S=64...
    cells = np.stack(np.meshgrid(*[np.arange(16)] * 3, indexing="ij"),
                     -1).reshape(-1, 1, 3)
    slots = np.asarray(enc.blocked_slot(jnp.asarray(cells)))[:, 0]
    blocks = cells[:, 0, :] // 4
    # same block -> same slot; different block -> different slot
    key = blocks[:, 0] * 100 + blocks[:, 1] * 10 + blocks[:, 2]
    for k in np.unique(key):
        assert len(np.unique(slots[key == k])) == 1
    assert len(np.unique(slots)) == len(np.unique(key))


def test_window_lists_exact_and_bounded():
    # per (level, group) the list must contain exactly the occupied window
    # mortons (sorted, unique, sentinel-padded) — never more than 128
    enc = _enc()
    from nerfpp_tpu.pallas.hash_encode_blocked import GROUPS_PER_BLOCK
    ng = GROUPS_PER_BLOCK  # one group-block
    pts = _rand_pts(ng * 128).reshape(ng, 128, 3)
    wids, maxcnt = jax.tree.map(np.asarray,
                                build_window_lists(jnp.asarray(pts), enc))
    l = enc.n_levels
    wids = wids.reshape(l, ng, 128)
    cell, _ = enc.blocked_cell_frac(pts.reshape(-1, 3))
    oct_ = np.asarray(enc.blocked_oct(cell)).reshape(ng, 128, l, 3) >> 1
    from nerfpp_tpu.encoders.hashgrid import morton3 as m3
    sentinel = np.int32(0x7FFFFFFF)
    for li in range(l):
        for g in range(ng):
            o = oct_[g, :, li]
            expect = np.unique(m3(o[:, 0], o[:, 1], o[:, 2]))
            got = wids[li, g]
            np.testing.assert_array_equal(got[:len(expect)], expect)
            assert (got[len(expect):] == sentinel).all()
    # maxcnt row 0 = max unique count over the 8 groups at each level
    ngb_pad = maxcnt.shape[0] // l
    maxcnt = maxcnt.reshape(l, ngb_pad)[:, 0]
    for li in range(l):
        expect_max = max(
            len(np.unique(m3(oct_[g, :, li, 0], oct_[g, :, li, 1],
                             oct_[g, :, li, 2]))) for g in range(ng))
        assert maxcnt[li] == expect_max


def test_fused_prepass_matches_oracle():
    # the in-kernel bitonic window-list build (_windows_call via _prepare)
    # must reproduce the XLA build_window_lists oracle exactly
    from nerfpp_tpu.pallas import hash_encode_blocked as HEB
    enc = _enc()
    pts = _rand_pts(2048, seed=11)
    ng = 2048 // 128
    wids_o, maxcnt_o = jax.tree.map(
        np.asarray, build_window_lists(pts.reshape(ng, 128, 3), enc))
    _, wids_f, maxcnt_f, _ = HEB._prepare(pts, enc)
    gpb = HEB.GROUPS_PER_BLOCK
    l, n_gb = enc.n_levels, ng // gpb
    wo = (wids_o.reshape(l, n_gb, gpb, 128).transpose(1, 0, 2, 3).reshape(-1))
    np.testing.assert_array_equal(np.asarray(wids_f), wo)
    np.testing.assert_array_equal(np.asarray(maxcnt_f), maxcnt_o)


def test_kernel_matches_oracle_incoherent_points():
    # fully random (maximally incoherent) points must still be CORRECT —
    # the window-list design bounds the work at 128 windows/group, it never
    # truncates coverage
    enc = _enc()
    params = enc.init(jax.random.PRNGKey(0))
    pts = _rand_pts(1024, seed=9)
    idx, frac = enc.corner_indices(pts)
    tab_bf16 = params["table"].astype(jnp.bfloat16).astype(jnp.float32)
    ref = gather_trilerp_reference(tab_bf16, idx, frac).reshape(1024, -1)
    got = hash_encode_blocked(params["table"], pts, enc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-7)


@pytest.mark.parametrize("n", [1, 100, 2048])
def test_kernel_matches_oracle(n):
    enc = _enc()
    params = enc.init(jax.random.PRNGKey(0))
    pts = _rand_pts(n)
    idx, frac = enc.corner_indices(pts)
    tab_bf16 = params["table"].astype(jnp.bfloat16).astype(jnp.float32)
    ref = gather_trilerp_reference(tab_bf16, idx, frac).reshape(n, -1)
    got = hash_encode_blocked(params["table"], pts, enc)
    # the kernel's trilerp weights ride the MXU in bf16 (the same pattern
    # matrix the backward uses): per-feature error bound is
    # 8 corners x 2^-9 relative weight error x |v|max(1e-4 init) ~ 2e-7
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-7)


@pytest.mark.parametrize("n", [100, 1500])
def test_backward_matches_oracle(n):
    # the windowed MXU scatter backward must match the autodiff gradient of
    # the XLA oracle (bf16 rounding of the rank-1 weight pattern only)
    from nerfpp_tpu.pallas.hash_encode_blocked import hash_encode_blocked_bwd
    enc = _enc()
    pts = _rand_pts(n, seed=3)
    g = jax.random.normal(jax.random.PRNGKey(4), (n, enc.output_dims))

    def oracle_sum(table):
        idx, frac = enc.corner_indices(pts)
        f = gather_trilerp_reference(table, idx, frac).reshape(n, -1)
        return jnp.sum(f * g)

    table0 = enc.init(jax.random.PRNGKey(0))["table"]
    ref = jax.grad(oracle_sum)(table0)
    got = hash_encode_blocked_bwd(g, pts, enc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-2, rtol=2e-2)


def test_encoder_custom_vjp_end_to_end():
    # HashGridEncoder(use_pallas=True, scheme="blocked") routes fwd+bwd
    # through the kernel pair and matches the XLA path's gradient
    enc_k = _enc(use_pallas=True)
    enc_x = _enc()
    params = enc_k.init(jax.random.PRNGKey(0))
    pts = _rand_pts(300, seed=5)

    def loss(p, e):
        feats, keep = e(p, pts)
        return jnp.sum(jnp.sin(3.0 * feats)), keep

    (lk, keep_k), gk = jax.value_and_grad(loss, has_aux=True)(params, enc_k)
    (lx, keep_x), gx = jax.value_and_grad(loss, has_aux=True)(params, enc_x)
    # kernel features are bf16-rounded (packed table) -> absolute tolerance
    np.testing.assert_allclose(float(lk), float(lx), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(keep_k), np.asarray(keep_x))
    np.testing.assert_allclose(np.asarray(gk["table"]),
                               np.asarray(gx["table"]), atol=1e-2, rtol=2e-2)


def test_kernel_clamped_out_of_bbox_points():
    enc = _enc()
    params = enc.init(jax.random.PRNGKey(0))
    pts = jnp.asarray([[2.0, 0.0, 0.0], [-5.0, -5.0, -5.0],
                       [1.5, 1.0, 1.3]], jnp.float32)
    clamped = jnp.clip(pts, jnp.asarray(BBOX[:3]), jnp.asarray(BBOX[3:]))
    idx, frac = enc.corner_indices(clamped)
    tab_bf16 = params["table"].astype(jnp.bfloat16).astype(jnp.float32)
    ref = gather_trilerp_reference(tab_bf16, idx, frac).reshape(3, -1)
    got = hash_encode_blocked(params["table"], clamped, enc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-7)
