"""Binary tokenizer tests."""

import jax
import jax.numpy as jnp
import numpy as np

from bitdance_tpu.models.tokenizer import (
    VQModel,
    depth_to_space,
    latents_to_tokens,
    tokens_to_latents,
)
from bitdance_tpu.models.gfq import gfq_quantize, make_codebook

TINY_DD = dict(
    z_channels=8, in_channels=3, out_ch=3, ch=32, ch_mult=[1, 2], num_res_blocks=1
)


def test_depth_to_space_dcr_layout():
    # channel k constant k; DCR: ch = b1*(s*cc) + b2*cc + cc_idx
    s, cc = 2, 3
    x = jnp.broadcast_to(
        jnp.arange(s * s * cc, dtype=jnp.float32)[None, None, None, :], (1, 2, 2, s * s * cc)
    )
    y = depth_to_space(x, s)
    assert y.shape == (1, 4, 4, cc)
    # output[b, h*s+b1, w*s+b2, c] = input channel b1*s*cc + b2*cc + c
    for b1 in range(s):
        for b2 in range(s):
            for c in range(cc):
                assert float(y[0, b1, b2, c]) == b1 * s * cc + b2 * cc + c


def test_vqmodel_encode_decode_shapes():
    model = VQModel(ddconfig=TINY_DD)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x, noise_rng=jax.random.PRNGKey(2))
    quant = model.apply(params, x, method=VQModel.encode)
    assert quant.shape == (2, 16, 16, 8)  # one downsample level
    assert set(np.unique(np.asarray(quant))) <= {-1.0, 1.0}
    recon = model.apply(params, quant, method=VQModel.decode)
    assert recon.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(recon)).all()


def test_vqmodel_gan_decoder_uses_noise():
    model = VQModel(ddconfig=TINY_DD, gan_decoder=True)
    q = jnp.sign(jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 8)))
    params = model.init(jax.random.PRNGKey(1), q, method=VQModel.decode,
                        noise_rng=jax.random.PRNGKey(2))
    r1 = model.apply(params, q, method=VQModel.decode, noise_rng=jax.random.PRNGKey(3))
    r2 = model.apply(params, q, method=VQModel.decode, noise_rng=jax.random.PRNGKey(4))
    assert not np.allclose(np.asarray(r1), np.asarray(r2))


def test_latents_tokens_roundtrip_ps_raster():
    q = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    for ps in (1, 2, 4):
        toks = latents_to_tokens(q, ps=ps)
        assert toks.shape == (2, 64, 4)
        back = tokens_to_latents(toks, 8, 8, ps=ps)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(q))
    # ps raster: token 1 is the (0,1) spatial position within the first tile
    toks = latents_to_tokens(q, ps=2)
    np.testing.assert_array_equal(np.asarray(toks[:, 1]), np.asarray(q[:, 0, 1]))
    np.testing.assert_array_equal(np.asarray(toks[:, 2]), np.asarray(q[:, 1, 0]))
    np.testing.assert_array_equal(np.asarray(toks[:, 4]), np.asarray(q[:, 0, 2]))


def test_gfq_roundtrip_and_losses():
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 16))
    out = gfq_quantize(z, num_codebooks=4, training=True)
    assert out.quantized.shape == z.shape
    assert out.indices.shape == (2, 4, 4, 4)
    # quantized values (post-STE) match sign of z
    np.testing.assert_array_equal(np.asarray(jnp.sign(out.quantized)),
                                  np.asarray(jnp.sign(jnp.where(z > 0, 1.0, -1.0))))
    assert np.isfinite(float(out.entropy_loss))
    assert float(out.commit_loss) > 0

    # indices decode back to the same codes
    codebook = make_codebook(4)
    decoded = codebook[np.asarray(out.indices)].reshape(2, 4, 4, 16)
    np.testing.assert_array_equal(decoded, np.asarray(jnp.where(z > 0, 1.0, -1.0)))


def test_gfq_ste_gradient():
    def loss(z):
        out = gfq_quantize(z, num_codebooks=2, training=True)
        return jnp.sum(out.quantized * 2.0)

    g = jax.grad(loss)(jax.random.normal(jax.random.PRNGKey(1), (1, 2, 2, 8)))
    np.testing.assert_allclose(np.asarray(g), 2.0)  # straight-through


def test_gfq_entropy_prefers_diverse_codes():
    # all-same codes -> low batch entropy -> higher loss than diverse codes
    z_same = jnp.ones((1, 8, 8, 8))
    z_div = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 8))
    l_same = gfq_quantize(z_same, 2, training=True).codebook_entropy
    l_div = gfq_quantize(z_div, 2, training=True).codebook_entropy
    assert float(l_div) > float(l_same)


def test_fused_encode_tail_matches_flax():
    """Fused GN+swish+1x1conv+sign kernel == the unfused encoder tail."""
    from bitdance_tpu.models.tokenizer import VQModel
    from bitdance_tpu.ops.fused_encode import fused_encode_tail
    from bitdance_tpu.ops.quantize import sign_quantize

    dd = dict(z_channels=8, in_channels=3, out_ch=3, ch=32, ch_mult=[1, 2],
              num_res_blocks=1)
    model = VQModel(ddconfig=dd)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 16, 3)),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)

    want_raw = model.apply(params, x, method=VQModel.encode_raw)
    want = np.asarray(sign_quantize(want_raw))

    trunk = model.apply(params, x,
                        method=lambda m, xx: m.encoder.trunk(xx))
    p = params["params"]["encoder"]
    got = np.asarray(fused_encode_tail(
        trunk, p["norm_out"]["weight"], p["norm_out"]["bias"],
        p["conv_out"]["kernel"][0, 0], p["conv_out"]["bias"],
        interpret=True))
    # signs agree except where the pre-sign value is borderline zero
    solid = np.abs(np.asarray(want_raw)) > 1e-4
    np.testing.assert_array_equal(got[solid], want[solid])

    # and the pre-sign values agree when quantize=False
    got_raw = np.asarray(fused_encode_tail(
        trunk, p["norm_out"]["weight"], p["norm_out"]["bias"],
        p["conv_out"]["kernel"][0, 0], p["conv_out"]["bias"],
        quantize=False, interpret=True))
    np.testing.assert_allclose(got_raw, np.asarray(want_raw),
                               rtol=1e-4, atol=1e-4)


def test_decoder_conv_int8_parity():
    """conv_int8=True reuses the exact same param tree and stays within
    int8 quantization error of the bf16/f32 decode."""
    import numpy as np

    dd = dict(z_channels=16, in_channels=3, out_ch=3, ch=32,
              ch_mult=[1, 2], num_res_blocks=1)
    ae = VQModel(ddconfig=dd)
    ae_q = VQModel(ddconfig=dd, conv_int8=True)
    z = jnp.sign(jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16)))
    params = jax.jit(
        lambda k, z: ae.init(k, z, method=VQModel.decode)
    )(jax.random.PRNGKey(1), z)
    params_q = jax.jit(
        lambda k, z: ae_q.init(k, z, method=VQModel.decode)
    )(jax.random.PRNGKey(1), z)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params_q)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params_q)):
        assert a.shape == b.shape and a.dtype == b.dtype

    want = ae.apply(params, z, method=VQModel.decode)
    got = ae_q.apply(params, z, method=VQModel.decode)
    rel = (np.linalg.norm(np.asarray(got - want))
           / np.linalg.norm(np.asarray(want)))
    assert rel < 0.08, rel          # dynamic per-image/per-channel int8
    assert got.shape == want.shape
