"""UniWeTok tokenizer tests."""

import jax
import jax.numpy as jnp
import numpy as np

from bitdance_tpu.models.tokenizer_uni import UniVQModel, _mid_freqs

TINY_DD = dict(
    z_channels=8, in_channels=3, out_ch=3, ch=32, ch_mult=[1, 2],
    num_res_blocks=1, attn_blocks=1, n_heads=4,
)


def test_uni_encode_bounded_and_signed():
    model = UniVQModel(ddconfig=TINY_DD)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 3)) * 2 - 1
    params = model.init(jax.random.PRNGKey(1), x,
                        noise_rng=jax.random.PRNGKey(2))
    raw = model.apply(params, x, method=UniVQModel.encode_raw)
    assert np.all(np.abs(np.asarray(raw)) <= 1.0)  # SigLu bound
    quant = model.apply(params, x, method=UniVQModel.encode)
    assert quant.shape == (1, 16, 16, 8)
    assert set(np.unique(np.asarray(quant))) <= {-1.0, 1.0}


def test_uni_decode_shape_and_noise():
    model = UniVQModel(ddconfig=TINY_DD)
    q = jnp.sign(jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 8)))
    params = model.init(jax.random.PRNGKey(1), q, method=UniVQModel.decode,
                        noise_rng=jax.random.PRNGKey(2))
    r1 = model.apply(params, q, method=UniVQModel.decode,
                     noise_rng=jax.random.PRNGKey(3))
    r2 = model.apply(params, q, method=UniVQModel.decode,
                     noise_rng=jax.random.PRNGKey(4))
    assert r1.shape == (1, 16, 16, 3)
    assert not np.allclose(np.asarray(r1), np.asarray(r2))


def test_mid_freqs_conventions():
    # encoder coords: i*7/(H-1)+0.5; decoder (i+0.5)*7.5/(H-0.5).
    # (At H==8 the two coincide exactly, so probe H==6.)
    f_enc = _mid_freqs(6, 6, 16, 4, decoder=False)
    f_dec = _mid_freqs(6, 6, 16, 4, decoder=True)
    assert f_enc.shape == (4 + 36, 8, 2)
    # register rows are identity rotations
    np.testing.assert_allclose(np.asarray(f_enc[:4, :, 0]), 1.0, atol=1e-6)
    assert not np.allclose(np.asarray(f_enc[4:]), np.asarray(f_dec[4:]))


def test_uni_has_register_tokens():
    model = UniVQModel(ddconfig=TINY_DD)
    x = jnp.zeros((1, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x,
                        noise_rng=jax.random.PRNGKey(1))
    enc = params["params"]["encoder"]
    assert enc["mid_attn"]["register_token"].shape == (4, 64)  # ch*ch_mult[-1]
    assert "block_0" in enc["mid_attn"]
