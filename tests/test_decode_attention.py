"""Pallas decode-attention kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitdance_tpu.ops.attention import attention_xla
from bitdance_tpu.ops.decode_attention import decode_attention_pallas


def _rand(key, b, s, lmax, hq, hkv, d):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, s, hq, d))
    k = jax.random.normal(kk, (b, hkv, lmax, d))  # head-major cache
    v = jax.random.normal(kv, (b, hkv, lmax, d))
    return q, k, v


@pytest.mark.parametrize("b,s,lmax,hq,hkv,d", [
    (2, 64, 640, 4, 2, 64),
    (1, 16, 1024, 8, 8, 128),
    (2, 1, 512, 4, 1, 64),     # single-token decode
])
def test_decode_matches_reference(b, s, lmax, hq, hkv, d):
    q, kc, vc = _rand(jax.random.PRNGKey(0), b, s, lmax, hq, hkv, d)
    kv_len = jnp.asarray([lmax // 2, lmax - 3][:b], jnp.int32)
    kv_start = jnp.asarray([5, 0][:b], jnp.int32)

    got = decode_attention_pallas(q, kc, vc, kv_len, kv_start,
                                  block_k=128, interpret=True)
    pos = jnp.arange(lmax)
    mask = (pos[None, :] >= kv_start[:, None]) & (pos[None, :] < kv_len[:, None])
    want = attention_xla(q, jnp.transpose(kc, (0, 2, 1, 3)),
                         jnp.transpose(vc, (0, 2, 1, 3)),
                         mask[:, None, None, :])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_decode_empty_window_is_zero():
    q, kc, vc = _rand(jax.random.PRNGKey(1), 1, 8, 256, 2, 2, 32)
    out = decode_attention_pallas(q, kc, vc, jnp.asarray([0], jnp.int32),
                                  block_k=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_decode_nonmultiple_cache_len():
    q, kc, vc = _rand(jax.random.PRNGKey(2), 1, 4, 300, 2, 1, 64)
    kv_len = jnp.asarray([300], jnp.int32)
    got = decode_attention_pallas(q, kc, vc, kv_len, block_k=128,
                                  interpret=True)
    want = attention_xla(q, jnp.transpose(kc, (0, 2, 1, 3)),
                         jnp.transpose(vc, (0, 2, 1, 3)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# Fused-KV ring buffer paths (bf16-mode and int8-mode)
# ---------------------------------------------------------------------------

def _fused_setup(key, b, s, lmax, hq, hkv, d):
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (b, s, hq, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, lmax, hkv, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, lmax, hkv, d), jnp.float32)
    return q, k, v


def test_fusedkv_matches_reference():
    from bitdance_tpu.ops.decode_attention import (
        decode_attention_fusedkv, pack_kv_rows)

    q, k, v = _fused_setup(jax.random.PRNGKey(0), 2, 4, 384, 4, 2, 64)
    kv_len = jnp.asarray([200, 384], jnp.int32)
    kv_start = jnp.asarray([0, 30], jnp.int32)
    got = decode_attention_fusedkv(q, pack_kv_rows(k, v), kv_len, kv_start,
                                   interpret=True)
    pos = jnp.arange(384)
    mask = (pos[None, :] >= kv_start[:, None]) & (pos[None, :] < kv_len[:, None])
    want = attention_xla(q, k, v, mask[:, None, None, :])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_fusedkv_int8_close_to_reference():
    from bitdance_tpu.ops.decode_attention import (
        decode_attention_fusedkv, quantize_kv_rows)

    q, k, v = _fused_setup(jax.random.PRNGKey(1), 2, 4, 256, 4, 4, 64)
    kvq, sc = quantize_kv_rows(k, v)
    kv_len = jnp.asarray([100, 256], jnp.int32)
    got = decode_attention_fusedkv(q, kvq, kv_len, kv_scales=sc,
                                   interpret=True)
    mask = (jnp.arange(256)[None, :] < kv_len[:, None])[:, None, None, :]
    want = attention_xla(q, k, v, mask)
    # int8 cache: ~1e-2 absolute error on unit-variance activations
    assert float(jnp.max(jnp.abs(got - want))) < 0.06


def test_quantize_kv_roundtrip():
    from bitdance_tpu.ops.decode_attention import (
        dequantize_fused_kv, quantize_kv_rows)

    _, k, v = _fused_setup(jax.random.PRNGKey(2), 2, 1, 64, 2, 2, 64)
    kvq, sc = quantize_kv_rows(k, v)
    assert kvq.dtype == jnp.int8 and sc.shape == (2, 2, 2, 64)
    kd, vd = dequantize_fused_kv(kvq, sc)
    np.testing.assert_allclose(np.asarray(jnp.transpose(kd, (0, 2, 1, 3))),
                               np.asarray(k), atol=0.02)
    np.testing.assert_allclose(np.asarray(jnp.transpose(vd, (0, 2, 1, 3))),
                               np.asarray(v), atol=0.02)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("cache_len", [0, 37, 250])
def test_bucketed_window_attention(causal, cache_len):
    from bitdance_tpu.ops.decode_attention import (
        bucketed_window_attention, default_buckets, pack_kv_rows)

    q, k, v = _fused_setup(jax.random.PRNGKey(3), 2, 4, 264, 4, 4, 64)
    buckets = default_buckets(264)
    got = bucketed_window_attention(q, pack_kv_rows(k, v),
                                    jnp.int32(cache_len), buckets,
                                    causal=causal)
    pos = jnp.arange(264)
    if causal:
        q_abs = cache_len + jnp.arange(4)
        mask = (pos[None, :] <= q_abs[:, None])[None, None]
    else:
        mask = (pos < cache_len + 4)[None, None, None, :]
    want = attention_xla(q, k, v, jnp.broadcast_to(mask, (2, 1, 4, 264)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_bucketed_int8_close():
    from bitdance_tpu.ops.decode_attention import (
        bucketed_window_attention, default_buckets, quantize_kv_rows)

    q, k, v = _fused_setup(jax.random.PRNGKey(4), 2, 2, 128, 4, 4, 64)
    kvq, sc = quantize_kv_rows(k, v)
    got = bucketed_window_attention(q, kvq, jnp.int32(128),
                                    default_buckets(128), kv_scales=sc)
    want = attention_xla(q, k, v)
    assert float(jnp.max(jnp.abs(got - want))) < 0.06


def test_default_buckets_tiny_and_regular():
    from bitdance_tpu.ops.decode_attention import default_buckets

    for total in (8, 12, 24, 264, 320, 4160):
        bks = default_buckets(total)
        assert bks[-1] == total
        assert all(x < y for x, y in zip(bks, bks[1:]))


def test_imagenet_sample_int8_cache_consistent():
    """int8 KV cache sampling stays close to the bf16-cache sample path."""
    from bitdance_tpu.models.imagenet_ar import (
        ImageNetARConfig, init_ar_params, make_head, sample)

    cfg = ImageNetARConfig(dim=128, n_layer=2, n_head=2, diff_layers=1,
                           diff_dim=128, diff_adanln_layers=1, latent_dim=8,
                           resolution=32, cls_token_num=4, parallel_num=4)
    params = init_ar_params(jax.random.PRNGKey(0), cfg)
    head = make_head(cfg)
    d_t = jnp.zeros((2, cfg.parallel_num, cfg.token_dim))
    d_c = jnp.zeros((2, cfg.parallel_num, cfg.dim))
    hp = head.init(jax.random.PRNGKey(1), d_t, d_c, jax.random.PRNGKey(2))
    full = {"ar": params, "head": hp}
    cls = jnp.asarray([1, 2], jnp.int32)

    t_bf = sample(params, head, hp, cfg, cls, jax.random.PRNGKey(3),
                  num_sampling_steps=4, cfg_scale=1.5)
    t_i8 = sample(params, head, hp, cfg, cls, jax.random.PRNGKey(3),
                  num_sampling_steps=4, cfg_scale=1.5, kv_int8=True)
    assert t_bf.shape == t_i8.shape == (2, cfg.num_tokens, cfg.token_dim)
    # signs of random-init logits are noisy; require high agreement, not
    # bit-exactness
    agree = float(jnp.mean((t_bf == t_i8).astype(jnp.float32)))
    assert agree > 0.9, agree
