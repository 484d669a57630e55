"""Alternative heads, token sampling, batched encode, interleaved inference."""

import jax
import jax.numpy as jnp
import numpy as np

from bitdance_tpu.models.alt_heads import (
    GaussianRegressionVisionHead,
    RegressionVisionHead,
    StandardVisionHead,
    codes_from_latents,
    latents_from_codes,
)
from bitdance_tpu.ops.token_sampling import (
    sample_tokens,
    top_k_filter,
    top_p_filter,
)


def test_top_k_filter():
    logits = jnp.asarray([[1.0, 5.0, 3.0, 2.0]])
    f = top_k_filter(logits, 2)
    assert float(f[0, 1]) == 5.0 and float(f[0, 2]) == 3.0
    assert float(f[0, 0]) < -1e20 and float(f[0, 3]) < -1e20


def test_top_p_filter_keeps_head_of_distribution():
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
    f = top_p_filter(logits, 0.8)
    # cum: 0.5, 0.8, 0.95 -> keep first two plus the one crossing (0.3 kept,
    # 0.15 is first beyond shifted threshold)
    assert np.isfinite(float(f[0, 0])) and float(f[0, 0]) > -1e20
    assert float(f[0, 1]) > -1e20
    assert float(f[0, 3]) < -1e20


def test_sample_tokens_greedy_and_random():
    logits = jnp.asarray([[0.0, 10.0, 0.0]])
    tok = sample_tokens(jax.random.PRNGKey(0), logits, do_sample=False)
    assert int(tok[0]) == 1
    tok = sample_tokens(jax.random.PRNGKey(0), logits, temperature=0.1,
                        top_k=1)
    assert int(tok[0]) == 1


def test_standard_head_roundtrip():
    head = StandardVisionHead(vocab_size_vision=16, hidden_size=32)
    h = jax.random.normal(jax.random.PRNGKey(0), (5, 32))
    params = head.init(jax.random.PRNGKey(1), h, jnp.zeros((5,), jnp.int32))
    logits = head.apply(params, h, method=StandardVisionHead.logits)
    assert logits.shape == (5, 16)
    labels = jnp.asarray([0, 3, 7, 15, 8])
    loss = head.apply(params, h, labels, method=StandardVisionHead.loss)
    assert loss.shape == (5,)
    emb = head.apply(params, labels, method=StandardVisionHead.embed)
    assert emb.shape == (5, 32)

    lat = jnp.sign(jax.random.normal(jax.random.PRNGKey(2), (5, 4)))
    codes = codes_from_latents(lat, 1)
    back = latents_from_codes(codes[..., 0], 4)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(lat))


def test_regression_heads():
    h = jax.random.normal(jax.random.PRNGKey(0), (4, 32))
    lat = jnp.sign(jax.random.normal(jax.random.PRNGKey(1), (4, 8)))

    reg = RegressionVisionHead(latent_dim=8, model_dim=16)
    rp = reg.init(jax.random.PRNGKey(2), h)
    loss = reg.apply(rp, h, lat, method=RegressionVisionHead.loss)
    assert loss.shape == (4, 8)

    gauss = GaussianRegressionVisionHead(latent_dim=8, model_dim=16)
    gp = gauss.init(jax.random.PRNGKey(3), h, jax.random.PRNGKey(4))
    s1 = gauss.apply(gp, h, jax.random.PRNGKey(5))
    s2 = gauss.apply(gp, h, jax.random.PRNGKey(6))
    assert s1.shape == (4, 8)
    assert not np.allclose(np.asarray(s1), np.asarray(s2))  # stochastic


def test_batched_encoder_group_and_maxpad():
    from bitdance_tpu.models.tokenizer import VQModel
    from bitdance_tpu.models.vt_encode import BatchedEncoder

    dd = dict(z_channels=8, in_channels=3, out_ch=3, ch=32, ch_mult=[1, 2],
              num_res_blocks=1)
    model = VQModel(ddconfig=dd)
    params = jax.jit(lambda k, x: model.init(k, x, method=VQModel.encode_raw))(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    enc = BatchedEncoder(model, params, ps=2)

    rng = np.random.default_rng(0)
    imgs = [rng.normal(size=(8, 8, 3)).astype(np.float32),
            rng.normal(size=(16, 8, 3)).astype(np.float32),
            rng.normal(size=(8, 8, 3)).astype(np.float32)]
    packed = enc.vt_forward(imgs, max_bs=2)
    # latent sizes: 4*4 + 8*4 + 4*4 (patch 2)
    assert packed.shape == (16 + 32 + 16, 8)
    assert set(np.unique(np.asarray(packed))) <= {-1.0, 1.0}

    # order preserved: re-encode first image alone and compare
    single = enc.vt_forward([imgs[0]])
    np.testing.assert_array_equal(np.asarray(packed[:16]), np.asarray(single))

    packed2 = enc.vt_forward_maxpad(imgs, max_bs=2, stride=2)
    assert packed2.shape[0] == 16 + 32 + 16


def test_interleaved_generation_tiny():
    from bitdance_tpu.pipelines.interleaved import InterleavedGenerator, PlanItem
    from tests.test_t2i_pipeline import StubTokenizer, _tiny_bundle

    class Tok(StubTokenizer):
        def __init__(self):
            super().__init__()
            for t in ("<|im_start|>", "<|im_end|>", "<|vision_end|>"):
                self.special[t] = 190 + len(self.special) % 8

        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    b = _tiny_bundle(parallel_num=4, z=8, hidden=64)
    gen = InterleavedGenerator(b, Tok(), max_seq_len=256)
    rng = np.random.default_rng(0)
    plan = [
        PlanItem(type="text", source="user", text="describe then draw"),
        PlanItem(type="image", source="user",
                 image=rng.normal(size=(8, 8, 3)).astype(np.float32)),
        PlanItem(type="text", source="model"),
        PlanItem(type="image", source="model", image_size=(8, 8)),
    ]
    out = gen.generate(plan, cfg_scale=2.0, sample_steps=2,
                       max_length_text=3, seed=0)
    assert len(out["generated_text"]) == 1
    assert len(out["generated_image"]) == 1
    img = out["generated_image"][0]
    assert img.shape == (8, 8, 3)
    assert np.isfinite(img).all()
