"""Tensor-parallel inference sharding tests (8-virtual-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from bitdance_tpu.models import qwen3 as q3
from bitdance_tpu.ops.attention import causal_ids
from bitdance_tpu.parallel.mesh import create_mesh
from bitdance_tpu.parallel.tp import qwen3_tp_shardings, shard_qwen3_params


def test_tp_sharded_forward_matches_replicated():
    cfg = q3.Qwen3Config(vocab_size=128, hidden_size=64, intermediate_size=128,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, head_dim=16)
    params = q3.init_qwen3_params(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0, 128)
    x = q3.embed_tokens(params, ids)
    pos = jnp.tile(jnp.arange(12)[None], (2, 1))
    blk, doc = causal_ids(12)
    blk, doc = jnp.tile(blk[None], (2, 1)), jnp.tile(doc[None], (2, 1))

    want = q3.qwen3_forward(params, cfg, x, pos, blk, doc)

    mesh = create_mesh(replica=1, fsdp=2, tp=4)
    sharded = shard_qwen3_params(params, mesh)
    got = jax.jit(
        lambda p, *a: q3.qwen3_forward(p, cfg, *a)
    )(sharded, x, pos, blk, doc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)

    # attention projections actually sharded over tp
    sh = sharded["layers"]["q_proj"].sharding.spec
    assert "tp" in str(sh)


def test_tp_rules_fall_back_on_indivisible():
    cfg = q3.Qwen3Config(vocab_size=126, hidden_size=64, intermediate_size=130,
                         num_hidden_layers=1, num_attention_heads=4,
                         num_key_value_heads=2, head_dim=16)
    params = q3.init_qwen3_params(jax.random.PRNGKey(0), cfg)
    mesh = create_mesh(replica=1, fsdp=1, tp=8)
    shardings = qwen3_tp_shardings(params, mesh)
    # q_proj last dim = 64 divisible by 8 -> tp; intermediate 130 not -> None
    assert shardings["layers"]["q_proj"].spec == P(None, "fsdp", "tp") or \
           shardings["layers"]["q_proj"].spec == P(None, None, "tp")
    assert "tp" not in str(shardings["layers"]["gate_proj"].spec)
    # vocab 126 not divisible by 8 -> replicated embed
    assert "tp" not in str(shardings["embed_tokens"].spec)


def test_tp_t2i_serving_matches_single_device():
    """TP serving for the flagship pipeline (T2IPipeline(mesh=...)): the
    full prompt->image path with the LLM sharded over a tp axis produces
    the same images as the replicated single-device run. The reference
    serves strictly single-GPU (t2i_pipeline.py:44-155); TP is the
    TPU-native scale-out. Tokens are sign-quantized so TP's different
    all-reduce summation order may flip exact-zero boundaries — assert
    near-total agreement plus identical shapes/dtypes."""
    from test_t2i_pipeline import StubTokenizer, _tiny_bundle

    from bitdance_tpu.pipelines.t2i import T2IPipeline

    b = _tiny_bundle()
    want_pipe = T2IPipeline(b, tokenizer=StubTokenizer(),
                            force_one_program=True)
    want = want_pipe.generate("a tp parity test prompt", height=8, width=8,
                              num_sampling_steps=6, guidance_scale=3.0,
                              num_images=2, seed=7)

    mesh = create_mesh(replica=1, fsdp=2, tp=4)
    tp_pipe = T2IPipeline(b, tokenizer=StubTokenizer(),
                          force_one_program=True, mesh=mesh)
    sh = tp_pipe.bundle.llm_params["layers"]["q_proj"].sharding.spec
    assert "tp" in str(sh)
    got = tp_pipe.generate("a tp parity test prompt", height=8, width=8,
                           num_sampling_steps=6, guidance_scale=3.0,
                           num_images=2, seed=7)

    assert got.shape == want.shape and got.dtype == want.dtype
    agree = float(np.mean(got == want))
    assert agree > 0.99, f"TP images diverge from replicated: {agree:.4f}"


def test_head_tp_stacked_serving_token_exact():
    """Megatron head-TP (r5): generate() with the STACKED sampler sharded
    over tp (head-major reorder + column/row-parallel, parallel/tp.py)
    must be token-exact vs the identical single-device stacked run, with
    the head weights actually sharded."""
    import dataclasses

    from bitdance_tpu.models.diff_head import DiffHead
    from bitdance_tpu.pipelines.t2i import T2IPipeline
    from tests.test_t2i_pipeline import StubTokenizer, _tiny_bundle

    b = _tiny_bundle()
    # n_head=4 (attn_head_dim 32 on the 128-wide head) so tp=4 divides
    # the heads; head params are head-count independent
    head4 = b.head.clone(attn_head_dim=32)
    stacked = head4.apply(b.head_params, method=DiffHead._stack_for_sampler)
    b4 = dataclasses.replace(b, head=head4, head_params=None,
                             head_stacked=stacked)
    gen = dict(height=8, width=8, num_sampling_steps=4, guidance_scale=2.0,
               num_images=1, seed=11, return_tokens=True)
    _, tok_ref = T2IPipeline(b4, tokenizer=StubTokenizer(),
                             force_one_program=True).generate(
        "a head tp test prompt", **gen)

    mesh = create_mesh(replica=1, fsdp=2, tp=4)
    pipe = T2IPipeline(b4, tokenizer=StubTokenizer(),
                       force_one_program=True, mesh=mesh)
    hs = pipe.bundle.head_stacked
    assert "hm_marker" in hs
    for k in ("wqkv", "w1", "wo", "w2"):
        assert "tp" in str(hs[k].sharding.spec), (k, hs[k].sharding.spec)
    _, tok_tp = pipe.generate("a head tp test prompt", **gen)
    assert float((tok_ref == tok_tp).mean()) == 1.0
