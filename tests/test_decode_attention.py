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
