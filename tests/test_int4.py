"""Packed int4 (W4A8) matmul path (ops/int4.py) and its Qwen3 integration."""

import jax
import jax.numpy as jnp
import numpy as np

from bitdance_tpu.models import qwen3 as q3
from bitdance_tpu.ops.int4 import (
    Q4Tensor,
    _w4a8_matmul_tpu,
    dequantize_int4,
    int4_matmul,
    quantize_linear_int4,
    unpack_int4,
)
from bitdance_tpu.ops.int8 import QTensor, mm


def test_quantize_int4_roundtrip_error_bound():
    w = jax.random.normal(jax.random.PRNGKey(0), (256, 128)) * 0.05
    qt = quantize_linear_int4(w)
    assert qt.q.shape == (128, 128) and qt.q.dtype == jnp.int8
    assert qt.s.shape == (1, 128)
    back = dequantize_int4(qt, jnp.float32)
    step = np.asarray(qt.s)[0]
    err = np.abs(np.asarray(back) - np.asarray(w, dtype=np.float32))
    assert (err <= 0.5 * step[None, :] + 1e-7).all()


def test_unpack_matches_prepack_values():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(64, 32)), jnp.float32)
    qt = quantize_linear_int4(w)
    q_want = np.clip(np.round(np.asarray(w) / np.asarray(qt.s)), -7, 7)
    lo, hi = unpack_int4(qt.q)
    q_got = np.concatenate([np.asarray(lo), np.asarray(hi)], axis=0)
    np.testing.assert_array_equal(q_got, q_want.astype(np.int8))


def test_int4_matmul_close_to_exact():
    kx, kw = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, (64, 512), jnp.float32)
    w = jax.random.normal(kw, (512, 256), jnp.float32) * 0.02
    exact = x @ w
    approx = int4_matmul(x, quantize_linear_int4(w))
    rel = np.linalg.norm(np.asarray(approx - exact)) / np.linalg.norm(
        np.asarray(exact))
    # per-column 4-bit RTN on gaussian weights has a ~0.134 statistical
    # floor (step = max|w|/7 ~ 3.3 sigma / 7); assert we sit at it, not above
    assert rel < 0.16, rel


def test_w4a8_pallas_kernel_matches_xla(monkeypatch):
    """The Pallas tile kernel (interpret mode) == the XLA unpack path on
    identical quantized operands."""
    from bitdance_tpu.ops import int4 as i4

    kx, kw = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(kx, (32, 256), jnp.float32)
    w = quantize_linear_int4(
        jax.random.normal(kw, (256, 384), jnp.float32) * 0.02)
    want = int4_matmul(x, w, force_xla=True)

    xq, sx = i4._quantize_rows(x)
    got = _w4a8_matmul_tpu(xq, sx, w.q, w.s, interpret=True)
    got = got.astype(x.dtype)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_mm_dispatches_q4tensor_and_batched_shapes():
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 3, 64), jnp.bfloat16)
    w = quantize_linear_int4(jax.random.normal(jax.random.PRNGKey(4),
                                               (64, 32)))
    out = mm(x, w)
    assert out.shape == (2, 3, 32) and out.dtype == jnp.bfloat16


def test_q4tensor_rides_scan():
    stacked = jax.random.normal(jax.random.PRNGKey(5), (3, 32, 16)) * 0.1
    qt = quantize_linear_int4(stacked)
    assert qt.q.shape == (3, 16, 16)
    x0 = jnp.ones((4, 32))

    def body(x, w):
        assert isinstance(w, Q4Tensor)
        return x, int4_matmul(x, w)

    _, ys = jax.lax.scan(body, x0, qt)
    ref = jnp.einsum("bi,lio->lbo", x0, jax.vmap(
        lambda t: dequantize_int4(t, jnp.float32))(qt))
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ref),
                               atol=5e-2, rtol=5e-2)


def test_int4_qwen3_decode_close_to_bf16():
    cfg = q3.Qwen3Config.tiny()
    params = q3.init_qwen3_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    qparams = q3.quantize_qwen3_params_int4(params)
    assert isinstance(qparams["layers"]["q_proj"], Q4Tensor)
    assert isinstance(qparams["embed_tokens"], QTensor)
    assert "lm_head" not in qparams

    b, s, max_len = 2, 4, 32
    embeds = jax.random.normal(jax.random.PRNGKey(5), (b, s, cfg.hidden_size))
    pos = jnp.broadcast_to(jnp.arange(s)[None], (b, s)).astype(jnp.int32)
    kv_start = jnp.zeros((b,), jnp.int32)

    def run(p):
        cache = q3.init_kv_cache(cfg, b, max_len, jnp.float32)
        h, cache = q3.qwen3_forward_cached(
            p, cfg, embeds, pos, cache, jnp.int32(0), kv_start, True)
        h2, _ = q3.qwen3_forward_cached(
            p, cfg, embeds, pos + s, cache, jnp.int32(s), kv_start, False)
        return h2

    want = run({k: v for k, v in params.items() if k != "lm_head"})
    got = run(qparams)
    rel = np.linalg.norm(np.asarray(got - want)) / np.linalg.norm(
        np.asarray(want))
    assert rel < 0.15, rel


def test_init_qwen3_params_int4_shapes():
    cfg = q3.Qwen3Config.tiny()
    p = q3.init_qwen3_params_int4(jax.random.PRNGKey(0), cfg)
    L, D, I = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    assert p["layers"]["gate_proj"].q.shape == (L, D // 2, I)
    assert p["layers"]["down_proj"].q.shape == (L, I // 2, D)
    assert isinstance(p["embed_tokens"], QTensor)
