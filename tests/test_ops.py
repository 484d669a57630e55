"""Unit tests for core ops: norms, rotary, quantize."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitdance_tpu.ops import (
    rms_norm,
    layer_norm,
    group_norm,
    swish,
    rope_table_1d,
    apply_rope_half,
    rope_table_2d,
    apply_rope_paired,
    patch_center_coords_2d,
    sincos_1d_table,
    pos_embed_2d,
    sign_quantize,
    sign_quantize_ste,
    bits_to_indices,
    indices_to_bits,
    indices_to_codes,
    latents_to_indices,
    flip_bits_uniform_prob,
)


def test_rms_norm_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 5, 16)).astype(np.float32)
    w = rng.normal(size=(16,)).astype(np.float32)
    got = rms_norm(jnp.asarray(x), jnp.asarray(w))
    want = x / np.sqrt(np.mean(x**2, axis=-1, keepdims=True) + 1e-6) * w
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_layer_norm_matches_numpy():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, 7, 32)).astype(np.float32)
    w = rng.normal(size=(32,)).astype(np.float32)
    b = rng.normal(size=(32,)).astype(np.float32)
    got = layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    want = (x - mu) / np.sqrt(var + 1e-6) * w + b
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_group_norm_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 8, 8, 64)).astype(np.float32)  # NHWC
    w = rng.normal(size=(64,)).astype(np.float32)
    b = rng.normal(size=(64,)).astype(np.float32)
    got = group_norm(jnp.asarray(x), 32, jnp.asarray(w), jnp.asarray(b))
    gn = torch.nn.GroupNorm(32, 64, eps=1e-6)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(w))
        gn.bias.copy_(torch.from_numpy(b))
        want = gn(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_swish():
    x = jnp.linspace(-3, 3, 7)
    np.testing.assert_allclose(swish(x), x * jax.nn.sigmoid(x), rtol=1e-6)


def test_rope_half_rotation_preserves_norm():
    cos, sin = rope_table_1d(64, 128, 1e6)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 128, 4, 64))
    y = apply_rope_half(x, cos[None], sin[None])
    np.testing.assert_allclose(
        jnp.linalg.norm(x, axis=-1), jnp.linalg.norm(y, axis=-1), rtol=1e-4
    )
    # position 0 is identity
    np.testing.assert_allclose(y[:, 0], x[:, 0], atol=1e-6)


def test_rope_half_matches_hf_convention():
    """Cross-check against HF transformers' rotate_half formulation."""
    torch = pytest.importorskip("torch")
    head_dim, L, theta = 32, 16, 10000.0
    cos, sin = rope_table_1d(head_dim, L, theta)
    x = np.random.default_rng(3).normal(size=(1, L, 2, head_dim)).astype(np.float32)
    got = apply_rope_half(jnp.asarray(x), cos[None], sin[None])

    # HF: cos/sin duplicated to full dim; out = x*cos + rotate_half(x)*sin
    inv_freq = 1.0 / theta ** (np.arange(0, head_dim, 2) / head_dim)
    ang = np.outer(np.arange(L), inv_freq)
    cos_full = np.concatenate([np.cos(ang), np.cos(ang)], axis=-1)[None, :, None, :]
    sin_full = np.concatenate([np.sin(ang), np.sin(ang)], axis=-1)[None, :, None, :]
    x1, x2 = x[..., : head_dim // 2], x[..., head_dim // 2 :]
    rot = np.concatenate([-x2, x1], axis=-1)
    want = x * cos_full + rot * sin_full
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_rope_2d_paired_shapes_and_cls_identity():
    coords = patch_center_coords_2d(256, 16)  # 16x16 grid
    assert coords.shape == (256, 2)
    table = rope_table_2d(coords, 64, cls_token_num=4)
    assert table.shape == (260, 32, 2)
    # cls tokens have t=0 -> angle 0 -> identity rotation
    np.testing.assert_allclose(table[:4, :, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(table[:4, :, 1], 0.0, atol=1e-6)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 260, 4, 64))
    y = apply_rope_paired(x, table)
    np.testing.assert_allclose(y[:, :4], x[:, :4], atol=1e-5)
    np.testing.assert_allclose(
        jnp.linalg.norm(x, axis=-1), jnp.linalg.norm(y, axis=-1), rtol=1e-4
    )


def test_sincos_pos_embed_2d_raster_order():
    table = sincos_1d_table(8, 16)
    assert table.shape == (16, 8)
    pe = pos_embed_2d(table, 4, 4, ps=2)
    assert pe.shape == (16, 16)
    # ps-raster: first 4 entries cover the top-left 2x2 tile:
    # (r0,c0), (r0,c1), (r1,c0), (r1,c1); layout is [col_emb, row_emb]
    flat = pos_embed_2d(table, 4, 4, ps=1)  # plain row-major
    np.testing.assert_allclose(pe[0], flat[0])   # (0,0)
    np.testing.assert_allclose(pe[1], flat[1])   # (0,1)
    np.testing.assert_allclose(pe[2], flat[4])   # (1,0)
    np.testing.assert_allclose(pe[3], flat[5])   # (1,1)
    # second group covers columns 2..3 of rows 0..1
    np.testing.assert_allclose(pe[4], flat[2])   # (0,2)


def test_numpy_twins_match_jax():
    """Host-side data pipelines use the _np twins (zero device dispatch);
    they must stay bit-compatible with the in-graph jax versions."""
    from bitdance_tpu.ops.rotary import pos_embed_2d_np, sincos_1d_table_np

    t_jax = np.asarray(sincos_1d_table(8, 16, pe_interpolation=2.0))
    t_np = sincos_1d_table_np(8, 16, pe_interpolation=2.0)
    np.testing.assert_allclose(t_jax, t_np, atol=1e-6)
    pe_jax = np.asarray(pos_embed_2d(jnp.asarray(t_np), 4, 6, ps=2))
    pe_np = pos_embed_2d_np(t_np, 4, 6, ps=2)
    np.testing.assert_allclose(pe_jax, pe_np, atol=1e-6)


def test_sign_quantize():
    x = jnp.asarray([-0.5, 0.0, 0.5, 2.0])
    np.testing.assert_array_equal(sign_quantize(x), [-1.0, -1.0, 1.0, 1.0])


def test_sign_ste_gradient_passthrough():
    g = jax.grad(lambda x: jnp.sum(sign_quantize_ste(x) * 3.0))(jnp.asarray([0.2, -0.7]))
    np.testing.assert_allclose(g, [3.0, 3.0])


def test_bits_indices_roundtrip():
    idx = jnp.arange(16)
    bits = indices_to_bits(idx, 4)
    np.testing.assert_array_equal(bits_to_indices(bits), idx)
    codes = indices_to_codes(idx, 4)
    assert set(np.unique(codes)) <= {-1.0, 1.0}


def test_latents_to_indices_grouped():
    lat = jnp.asarray([[1.0, -1.0, 1.0, 1.0, -1.0, -1.0, 1.0, -1.0]])
    idx = latents_to_indices(lat, 2)
    # group 0 bits: [1,0,1,1] -> 1+4+8=13 ; group 1: [0,0,1,0] -> 4
    np.testing.assert_array_equal(idx, [[13, 4]])


def test_flip_bits_rate():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((100_000,))
    flipped = flip_bits_uniform_prob(key, x, 0.2)
    rate = float(jnp.mean(flipped < 0))
    assert abs(rate - 0.1) < 0.01  # marginal flip prob = p_max/2
