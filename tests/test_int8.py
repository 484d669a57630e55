"""Int8 quantized matmul path (ops/int8.py) and its Qwen3 integration."""

import jax
import jax.numpy as jnp
import numpy as np

from bitdance_tpu.ops.int8 import (
    QTensor,
    dequantize,
    int8_matmul,
    mm,
    quantize_linear,
)
from bitdance_tpu.models import qwen3 as q3


def test_quantize_roundtrip_error_bound():
    w = jax.random.normal(jax.random.PRNGKey(0), (256, 128)) * 0.05
    qt = quantize_linear(w)
    assert qt.q.dtype == jnp.int8 and qt.s.shape == (1, 128)
    back = dequantize(qt, jnp.float32)
    # per-column symmetric: max error is half a quantization step per column
    step = np.asarray(qt.s)[0]
    err = np.abs(np.asarray(back) - np.asarray(w, dtype=np.float32))
    assert (err <= 0.5 * step[None, :] + 1e-7).all()


def test_int8_matmul_close_to_exact():
    kx, kw = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, (64, 512), jnp.float32)
    w = jax.random.normal(kw, (512, 256), jnp.float32) * 0.02
    exact = x @ w
    approx = int8_matmul(x, quantize_linear(w))
    rel = np.linalg.norm(np.asarray(approx - exact)) / np.linalg.norm(
        np.asarray(exact))
    assert rel < 0.02, rel


def test_int8_matmul_batched_shapes_and_dtype():
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 64), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(3), (64, 32))
    out = mm(x, quantize_linear(w))
    assert out.shape == (2, 3, 32) and out.dtype == jnp.bfloat16
    # plain-array dispatch unchanged
    assert mm(x, w.astype(jnp.bfloat16)).shape == (2, 3, 32)


def test_qtensor_rides_scan():
    stacked = jax.random.normal(jax.random.PRNGKey(4), (3, 32, 16)) * 0.1
    qt = quantize_linear(stacked)
    x0 = jnp.ones((4, 32))

    def body(x, w):
        assert isinstance(w, QTensor)
        return x, int8_matmul(x, w)

    _, ys = jax.lax.scan(body, x0, qt)
    ref = jnp.einsum("bi,lio->lbo", x0, jax.vmap(
        lambda t: dequantize(t, jnp.float32))(qt))
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ref), atol=2e-2)


def test_quantized_qwen3_decode_close_to_bf16():
    cfg = q3.Qwen3Config.tiny()
    params = q3.init_qwen3_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    qparams = q3.quantize_qwen3_params(params)
    assert isinstance(qparams["layers"]["q_proj"], QTensor)
    assert isinstance(qparams["lm_head"], QTensor)

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
        return q3.lm_logits(p, cfg, h2)

    ref = np.asarray(run(params))
    got = np.asarray(run(qparams))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.05, rel
    # ranking mostly preserved — random-init logits have tiny margins, so
    # exact-argmax agreement is noisy; require a clear majority only
    agree = (ref.argmax(-1) == got.argmax(-1)).mean()
    assert agree > 0.7, agree


def test_quantized_uncached_forward():
    cfg = q3.Qwen3Config.tiny()
    params = q3.init_qwen3_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    qparams = q3.quantize_qwen3_params(params)
    b, s = 1, 8
    embeds = jax.random.normal(jax.random.PRNGKey(6), (b, s, cfg.hidden_size))
    pos = jnp.arange(s)[None].astype(jnp.int32)
    blocks = jnp.arange(s)[None].astype(jnp.int32)
    docs = jnp.zeros((b, s), jnp.int32)
    ref = np.asarray(q3.qwen3_forward(params, cfg, embeds, pos, blocks, docs))
    got = np.asarray(q3.qwen3_forward(qparams, cfg, embeds, pos, blocks, docs))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.05, rel


def test_quantized_imagenet_backbone_decode():
    """quantize_ar_params: the cached decode forward with W8A8 layer
    matmuls stays close to the full-precision forward."""
    from bitdance_tpu.models import imagenet_ar as iar

    cfg = iar.config_s(parallel_num=1, resolution=64)
    params = iar.init_ar_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    qparams = iar.quantize_ar_params(params)
    assert isinstance(qparams["layers"]["wqkv"], QTensor)
    assert qparams["layers"]["wqkv"].q.shape[0] == cfg.n_layer

    b = 4
    x = jax.random.normal(jax.random.PRNGKey(1), (b, 2, cfg.dim)) * 0.1
    freqs = iar.freqs_cis_table(cfg)[:2]
    cache = iar._init_cache(cfg, b, dtype=jnp.float32)
    ref, _ = iar._forward_cached(params, cfg, x, freqs, cache,
                                 jnp.int32(0), True)
    got, _ = iar._forward_cached(qparams, cfg, x, freqs, cache,
                                 jnp.int32(0), True)
    rel = (np.linalg.norm(np.asarray(got - ref))
           / np.linalg.norm(np.asarray(ref)))
    assert rel < 0.05, rel


def test_quantized_embed_gather_and_tied_logits():
    """quantize_embed=True: int8 table gathers dequantized rows close to the
    bf16 gather, and the tied-lm_head fallback still produces logits."""
    cfg = q3.Qwen3Config.tiny()
    params = q3.init_qwen3_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    params.pop("lm_head", None)
    qparams = q3.quantize_qwen3_params(params, quantize_embed=True)
    assert isinstance(qparams["embed_tokens"], QTensor)

    ids = jnp.asarray([[1, 5, 7], [2, 0, 3]], jnp.int32)
    ref = np.asarray(q3.embed_tokens(params, ids))
    got = np.asarray(q3.embed_tokens(qparams, ids)).astype(np.float32)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel

    h = jax.random.normal(jax.random.PRNGKey(3), (2, 3, cfg.hidden_size))
    logits = q3.lm_logits(qparams, cfg, h)
    assert logits.shape == (2, 3, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()
