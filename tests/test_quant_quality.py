"""Quant-quality harness plumbing: same-weights tree conversion.

benchmarks/bench_quant_quality.py derives int8/int4 pipelines from ONE
bf16 tree; these tests pin (a) structural compatibility with the native
quantized init paths (so qwen3_forward's structural quant detection
routes identically), and (b) that the quantized forward stays close to
the bf16 forward at int8 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.bench_quant_quality import quantize_llm_tree
from bitdance_tpu.models import qwen3 as q3
from bitdance_tpu.ops.attention import causal_ids


def _cfg():
    return q3.Qwen3Config(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32)


def test_tree_structure_matches_native_int8_init():
    cfg = _cfg()
    bf16 = q3.init_qwen3_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    bf16.pop("lm_head", None)
    converted = quantize_llm_tree(bf16, "int8")
    native = q3.init_qwen3_params_int8(jax.random.PRNGKey(0), cfg)
    assert (jax.tree_util.tree_structure(converted)
            == jax.tree_util.tree_structure(native))


def test_int8_forward_close_to_bf16():
    cfg = _cfg()
    bf16 = q3.init_qwen3_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    bf16.pop("lm_head", None)
    q8 = quantize_llm_tree(bf16, "int8")

    ids = (jnp.arange(16, dtype=jnp.int32)[None] * 7) % cfg.vocab_size
    pos = jnp.arange(16)[None]
    blk, doc = causal_ids(16)

    def fwd(p):
        x = q3.embed_tokens(p, ids)
        return q3.qwen3_forward(p, cfg, x, pos, blk[None], doc[None])

    h_ref = np.asarray(fwd(bf16), np.float32)
    h_q = np.asarray(fwd(q8), np.float32)
    assert np.isfinite(h_q).all()
    # int8 W8A8 with dynamic activation scales: ~1e-2 relative is the
    # expected regime (ops/int8.py docstring)
    denom = np.maximum(np.abs(h_ref).mean(), 1e-3)
    rel = np.abs(h_q - h_ref).mean() / denom
    assert rel < 0.08, f"int8 forward drifted {rel:.4f} from bf16"
    assert rel > 0, "quantization had no effect (suspicious)"
