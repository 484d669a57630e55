"""Qwen3 backbone tests: HF parity, KV-cache decode equivalence, block decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitdance_tpu.models.qwen3 import (
    Qwen3Config,
    embed_tokens,
    init_kv_cache,
    init_qwen3_params,
    lm_logits,
    qwen3_forward,
    qwen3_forward_cached,
)
from bitdance_tpu.ops.attention import causal_ids


def _tiny():
    return Qwen3Config.tiny(vocab_size=128)


def _causal_batch_ids(b, L):
    blk, doc = causal_ids(L)
    return jnp.tile(blk[None], (b, 1)), jnp.tile(doc[None], (b, 1))


def test_forward_shapes():
    cfg = _tiny()
    params = init_qwen3_params(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
    x = embed_tokens(params, ids)
    pos = jnp.tile(jnp.arange(16)[None], (2, 1))
    blk, doc = _causal_batch_ids(2, 16)
    h = qwen3_forward(params, cfg, x, pos, blk, doc)
    assert h.shape == (2, 16, cfg.hidden_size)
    logits = lm_logits(params, cfg, h)
    assert logits.shape == (2, 16, cfg.vocab_size)


def test_parity_with_hf_transformers():
    """Numerical parity vs HF Qwen3ForCausalLM on a random tiny model."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen3Config as HFConfig
    from transformers import Qwen3ForCausalLM

    hf_cfg = HFConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=256,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    hf_model = Qwen3ForCausalLM(hf_cfg).eval()

    from bitdance_tpu.io.torch_import import convert_qwen3_state

    params = convert_qwen3_state(hf_model.state_dict(), 2, dtype=jnp.float32)
    cfg = Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, rope_theta=10000.0,
    )

    ids_np = np.random.default_rng(0).integers(0, 128, size=(2, 24))
    with torch.no_grad():
        hf_logits = hf_model(torch.from_numpy(ids_np)).logits.numpy()

    ids = jnp.asarray(ids_np)
    x = embed_tokens(params, ids)
    pos = jnp.tile(jnp.arange(24)[None], (2, 1))
    blk, doc = _causal_batch_ids(2, 24)
    h = qwen3_forward(params, cfg, x, pos, blk, doc)
    logits = lm_logits(params, cfg, h)
    np.testing.assert_allclose(np.asarray(logits), hf_logits, rtol=2e-3, atol=2e-3)


def test_cached_prefill_matches_full_forward():
    """Causal prefill through the cache path == uncached full forward."""
    cfg = _tiny()
    params = init_qwen3_params(jax.random.PRNGKey(0), cfg)
    L = 20
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, L), 0, cfg.vocab_size)
    x = embed_tokens(params, ids)
    pos = jnp.tile(jnp.arange(L)[None], (2, 1))
    blk, doc = _causal_batch_ids(2, L)
    want = qwen3_forward(params, cfg, x, pos, blk, doc)

    cache = init_kv_cache(cfg, 2, 64)
    got, cache = qwen3_forward_cached(
        params, cfg, x, pos,
        cache, jnp.int32(0), jnp.zeros((2,), jnp.int32), causal_block=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_incremental_decode_matches_full():
    """Prefill + two block-decode steps == full forward with matching mask."""
    cfg = _tiny()
    params = init_qwen3_params(jax.random.PRNGKey(0), cfg)
    P, S = 12, 4  # prompt, block width
    total = P + 2 * S
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, total), 0, cfg.vocab_size)
    x = embed_tokens(params, ids)
    pos = jnp.arange(total)[None]

    # full forward: prompt causal, then two bidirectional blocks
    blk = jnp.concatenate([
        jnp.arange(P), jnp.full((S,), P), jnp.full((S,), P + 1)
    ]).astype(jnp.int32)[None]
    doc = jnp.zeros((1, total), jnp.int32)
    want = qwen3_forward(params, cfg, x, pos, blk, doc)

    cache = init_kv_cache(cfg, 1, 64)
    kv_start = jnp.zeros((1,), jnp.int32)
    h1, cache = qwen3_forward_cached(
        params, cfg, x[:, :P], pos[:, :P], cache, jnp.int32(0), kv_start, True)
    h2, cache = qwen3_forward_cached(
        params, cfg, x[:, P:P+S], pos[:, P:P+S], cache, jnp.int32(P), kv_start, False)
    h3, cache = qwen3_forward_cached(
        params, cfg, x[:, P+S:], pos[:, P+S:], cache, jnp.int32(P+S), kv_start, False)
    got = jnp.concatenate([h1, h2, h3], axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_left_padded_batch_matches_unpadded():
    """Left-padded rows (kv_start > 0) produce identical results to unpadded."""
    cfg = _tiny()
    params = init_qwen3_params(jax.random.PRNGKey(0), cfg)
    L, pad = 10, 6
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, L), 0, cfg.vocab_size)
    x = embed_tokens(params, ids)
    pos = jnp.arange(L)[None]

    cache = init_kv_cache(cfg, 1, 32)
    want, _ = qwen3_forward_cached(
        params, cfg, x, pos, cache, jnp.int32(0), jnp.zeros((1,), jnp.int32), True)

    # left-pad with garbage tokens; kv_start masks them out
    x_pad = jnp.concatenate([jnp.ones((1, pad, cfg.hidden_size)), x], axis=1)
    pos_pad = jnp.concatenate([jnp.zeros((1, pad), jnp.int32), pos], axis=1)
    cache2 = init_kv_cache(cfg, 1, 32)
    got, _ = qwen3_forward_cached(
        params, cfg, x_pad, pos_pad, cache2, jnp.int32(0),
        jnp.full((1,), pad, jnp.int32), True)
    np.testing.assert_allclose(
        np.asarray(got[:, pad:]), np.asarray(want), rtol=1e-4, atol=1e-4
    )


def test_int8_kv_cache_close_to_bf16():
    """Fused int8 ring buffer: prefill + block decode stays close to the
    f32-cache path (per-(head, position) scales, ~1e-2 relative)."""
    cfg = _tiny()
    params = init_qwen3_params(jax.random.PRNGKey(0), cfg)
    P, S = 12, 4
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, P + S), 0,
                             cfg.vocab_size)
    x = embed_tokens(params, ids)
    pos = jnp.tile(jnp.arange(P + S)[None], (2, 1))
    kv_start = jnp.zeros((2,), jnp.int32)

    outs = {}
    for name, int8 in (("f32", False), ("int8", True)):
        cache = init_kv_cache(cfg, 2, 32, int8=int8)
        h1, cache = qwen3_forward_cached(
            params, cfg, x[:, :P], pos[:, :P], cache, jnp.int32(0),
            kv_start, True)
        h2, cache = qwen3_forward_cached(
            params, cfg, x[:, P:], pos[:, P:], cache, jnp.int32(P),
            kv_start, False)
        outs[name] = jnp.concatenate([h1, h2], axis=1)
        if int8:
            assert cache["kv"].dtype == jnp.int8
            assert cache["sc"].shape == (cfg.num_hidden_layers, 2,
                                         cfg.num_key_value_heads, 2, 32)
    ref = np.asarray(outs["f32"])
    got = np.asarray(outs["int8"])
    denom = np.maximum(np.abs(ref), 1.0)
    assert np.max(np.abs(got - ref) / denom) < 0.05
