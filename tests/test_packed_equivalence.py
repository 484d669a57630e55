"""Packed-vs-cached generation equivalence harness.

Mirrors the reference's only first-party correctness test
(modeling/llm/qwen3_packed_wrapper.py:164-338): greedy generation via the
per-step KV cache must match re-packing the whole sequence each step and
taking the last position's logits from one packed forward. Also covers the
EMA remap loader.
"""

import jax
import jax.numpy as jnp
import numpy as np

from bitdance_tpu.models import qwen3 as q3
from bitdance_tpu.ops.attention import causal_ids


def test_packed_single_pass_matches_kv_cache_generation():
    cfg = q3.Qwen3Config.tiny(vocab_size=97)
    params = q3.init_qwen3_params(jax.random.PRNGKey(0), cfg)
    prompts = [
        jnp.asarray([5, 9, 23, 41], jnp.int32),
        jnp.asarray([7, 7, 61], jnp.int32),
    ]
    gen_steps = 4

    def greedy_cached(prompt):
        """Standard cached decoding (test_kv_cache, wrapper:201-229)."""
        cache = q3.init_kv_cache(cfg, 1, 32)
        ids = prompt[None]
        x = q3.embed_tokens(params, ids)
        pos = jnp.arange(ids.shape[1])[None]
        h, cache = q3.qwen3_forward_cached(
            params, cfg, x, pos, cache, jnp.int32(0),
            jnp.zeros((1,), jnp.int32), causal_block=True)
        toks = []
        cur = int(jnp.argmax(q3.lm_logits(params, cfg, h[:, -1]), -1)[0])
        n = ids.shape[1]
        for _ in range(gen_steps):
            toks.append(cur)
            x = q3.embed_tokens(params, jnp.asarray([[cur]], jnp.int32))
            h, cache = q3.qwen3_forward_cached(
                params, cfg, x, jnp.asarray([[n]], jnp.int32), cache,
                jnp.int32(n), jnp.zeros((1,), jnp.int32), causal_block=True)
            cur = int(jnp.argmax(q3.lm_logits(params, cfg, h[:, -1]), -1)[0])
            n += 1
        return toks

    def greedy_packed(prompt):
        """Re-pack the full sequence each step; one packed forward
        (test_packed_single_pass, wrapper:232-284)."""
        seq = list(np.asarray(prompt))
        toks = []
        for _ in range(gen_steps + 1):
            ids = jnp.asarray(seq, jnp.int32)[None]
            x = q3.embed_tokens(params, ids)
            L = ids.shape[1]
            pos = jnp.arange(L)[None]
            blk, doc = causal_ids(L)
            h = q3.qwen3_forward(params, cfg, x, pos, blk[None], doc[None])
            nxt = int(jnp.argmax(q3.lm_logits(params, cfg, h[:, -1]), -1)[0])
            toks.append(nxt)
            seq.append(nxt)
        return toks[:gen_steps]

    for prompt in prompts:
        a = greedy_cached(prompt)
        b = greedy_packed(prompt)
        assert a == b, f"cached {a} != packed {b}"


def test_two_prompts_packed_together_match_individual():
    """Packing both prompts into ONE sequence with doc isolation gives the
    same last-position logits as individual forwards."""
    cfg = q3.Qwen3Config.tiny(vocab_size=97)
    params = q3.init_qwen3_params(jax.random.PRNGKey(0), cfg)
    p1 = [5, 9, 23, 41]
    p2 = [7, 7, 61]

    def single(prompt):
        ids = jnp.asarray(prompt, jnp.int32)[None]
        x = q3.embed_tokens(params, ids)
        L = ids.shape[1]
        blk, doc = causal_ids(L)
        h = q3.qwen3_forward(params, cfg, x, jnp.arange(L)[None],
                             blk[None], doc[None])
        return q3.lm_logits(params, cfg, h[0, -1])

    ids = jnp.asarray(p1 + p2, jnp.int32)[None]
    x = q3.embed_tokens(params, ids)
    pos = jnp.asarray(list(range(len(p1))) + list(range(len(p2))))[None]
    blk = jnp.arange(len(p1) + len(p2), dtype=jnp.int32)[None]
    doc = jnp.asarray([0] * len(p1) + [1] * len(p2), jnp.int32)[None]
    h = q3.qwen3_forward(params, cfg, x, pos, blk, doc)
    l1 = q3.lm_logits(params, cfg, h[0, len(p1) - 1])
    l2 = q3.lm_logits(params, cfg, h[0, -1])

    np.testing.assert_allclose(np.asarray(l1), np.asarray(single(p1)),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(single(p2)),
                               rtol=1e-4, atol=1e-4)


def test_ema_remap():
    from bitdance_tpu.io.torch_import import remap_ema_state

    state = {
        "encoder.conv.weight": np.zeros((2,)),
        "model_ema.encoderconvweight": np.ones((2,)),
        "decoder.conv.weight": np.full((2,), 3.0),
    }
    out = remap_ema_state(state)
    np.testing.assert_array_equal(out["encoder.conv.weight"], 1.0)  # EMA won
    np.testing.assert_array_equal(out["decoder.conv.weight"], 3.0)  # no twin
    assert not any(k.startswith("model_ema") for k in out)
