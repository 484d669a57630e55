"""End-to-end T2I pipeline tests on tiny random-init models."""

import jax
import jax.numpy as jnp
import numpy as np

from bitdance_tpu.models import qwen3 as q3
from bitdance_tpu.models.connector import MLPConnector
from bitdance_tpu.models.diff_head import DiffHead
from bitdance_tpu.models.tokenizer import VQModel
from bitdance_tpu.pipelines.t2i import (
    T2IModelBundle,
    T2IPipeline,
    build_pos_table,
    decode_image,
    generate_tokens,
)
from bitdance_tpu.ops.rotary import pos_embed_2d


class StubTokenizer:
    """Char-level stub with the special tokens the pipeline needs."""

    def __init__(self):
        self.special = {}
        base = 200
        for i, tok in enumerate(
            ["<|vision_start|>"]
            + [f"<|res_{j}|>" for j in range(1, 65)]
            + [f"<|query_{j}|>" for j in range(1, 64)]
        ):
            self.special[tok] = base + i

    def encode(self, text):
        return [min(ord(c), 199) for c in text][:48]

    def convert_tokens_to_ids(self, tok):
        return self.special[tok]


def _tiny_bundle(parallel_num=4, z=8, hidden=64):
    llm_cfg = q3.Qwen3Config(
        vocab_size=512, hidden_size=hidden, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16,
    )
    llm_params = q3.init_qwen3_params(jax.random.PRNGKey(0), llm_cfg)

    dd = dict(z_channels=z, in_channels=3, out_ch=3, ch=32, ch_mult=[1, 2],
              num_res_blocks=1)
    ae = VQModel(ddconfig=dd)
    ae_params = ae.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 8, 3)))

    head = DiffHead(ch_target=z, ch_cond=hidden, ch_latent=128,
                    depth_latent=2, depth_adanln=2, parallel_num=parallel_num,
                    use_swiglu=True, P_mean=-0.8, P_std=0.8)
    head_params = head.init(
        jax.random.PRNGKey(2),
        jnp.zeros((2, parallel_num, z)), jnp.zeros((2, parallel_num, hidden)),
        jax.random.PRNGKey(3),
    )

    projector = MLPConnector(out_dim=hidden)
    projector_params = projector.init(jax.random.PRNGKey(4), jnp.zeros((1, z)))

    return T2IModelBundle(
        llm_cfg=llm_cfg, llm_params=llm_params,
        ae=ae, ae_params=ae_params,
        head=head, head_params=head_params,
        projector=projector, projector_params=projector_params,
        parallel_num=parallel_num, hidden_size=hidden, vae_patch_size=2,
        pe_max_len=128,
    )


def test_generate_tokens_shapes_and_values():
    b = _tiny_bundle()
    h = w = 4  # 16 image tokens, 4 steps of 4
    P = 16
    n = 1
    prompt = jnp.concatenate([
        jnp.zeros((1, 6), jnp.int32), jnp.arange(10, dtype=jnp.int32)[None] + 1
    ], axis=1)
    prompt_ids = jnp.concatenate([prompt, prompt], axis=0)
    pads = jnp.asarray([6, 6], jnp.int32)
    start_ids = jnp.asarray([100, 101, 102, 103, 104, 105], jnp.int32)
    pe = pos_embed_2d(build_pos_table(b), h, w, ps=b.ps)

    toks = generate_tokens(
        b, prompt_ids, pads, start_ids, pe, jax.random.PRNGKey(0),
        latent_h=h, latent_w=w, num_images=n,
        guidance_scale=4.0, num_sampling_steps=8,
    )
    assert toks.shape == (1, 16, 8)
    assert set(np.unique(np.asarray(toks))) <= {-1.0, 1.0}

    img = decode_image(b, toks, h, w)
    assert img.shape == (1, 8, 8, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_generate_deterministic_under_seed():
    b = _tiny_bundle()
    h = w = 4
    prompt_ids = jnp.tile(jnp.arange(12, dtype=jnp.int32)[None], (2, 1))
    pads = jnp.zeros((2,), jnp.int32)
    start_ids = jnp.asarray([100, 101, 102, 103, 104, 105], jnp.int32)
    pe = pos_embed_2d(build_pos_table(b), h, w, ps=b.ps)

    fn = jax.jit(lambda k: generate_tokens(
        b, prompt_ids, pads, start_ids, pe, k,
        latent_h=h, latent_w=w, num_images=1,
        guidance_scale=2.0, num_sampling_steps=4,
    ))
    t1 = fn(jax.random.PRNGKey(7))
    t2 = fn(jax.random.PRNGKey(7))
    t3 = fn(jax.random.PRNGKey(8))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    assert not np.array_equal(np.asarray(t1), np.asarray(t3))


def test_pipeline_user_api():
    b = _tiny_bundle()
    pipe = T2IPipeline(b, tokenizer=StubTokenizer())
    imgs = pipe.generate("a tiny red square", height=8, width=8,
                         num_sampling_steps=4, guidance_scale=3.0,
                         num_images=2, seed=11)
    assert imgs.shape == (2, 8, 8, 3)
    assert imgs.dtype == np.uint8


def test_prompt_padding_invariance():
    """Different left-pad amounts must not change the generated tokens."""
    b = _tiny_bundle()
    h = w = 4
    start_ids = jnp.asarray([100, 101, 102, 103, 104, 105], jnp.int32)
    pe = pos_embed_2d(build_pos_table(b), h, w, ps=b.ps)
    core = jnp.arange(8, dtype=jnp.int32)[None] + 3

    def run(P, pad):
        prompt = jnp.concatenate(
            [jnp.zeros((1, pad), jnp.int32), core], axis=1)
        ids = jnp.concatenate([prompt, prompt], axis=0)
        return generate_tokens(
            b, ids, jnp.asarray([pad, pad], jnp.int32), start_ids, pe,
            jax.random.PRNGKey(0), latent_h=h, latent_w=w, num_images=1,
            guidance_scale=2.0, num_sampling_steps=4,
        )

    t_small = run(8 + 2, 2)
    t_big = run(8 + 9, 9)
    np.testing.assert_array_equal(np.asarray(t_small), np.asarray(t_big))


def test_pipeline_user_api_int4_llm():
    """The full-depth capacity config's LLM representation (Q4Tensor layer
    weights + int8 embed, bench_t2i --quant-llm-int4) flows through the
    whole generation pipeline: prefill, decode, KV cache, head, VAE."""
    import dataclasses

    b = _tiny_bundle()
    qb = dataclasses.replace(
        b, llm_params=q3.quantize_qwen3_params_int4(b.llm_params))
    pipe = T2IPipeline(qb, tokenizer=StubTokenizer())
    imgs = pipe.generate("a tiny blue square", height=8, width=8,
                         num_sampling_steps=4, guidance_scale=3.0,
                         num_images=2, seed=11)
    assert imgs.shape == (2, 8, 8, 3)
    assert imgs.dtype == np.uint8
