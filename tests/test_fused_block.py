"""Fused diffusion-block kernel parity (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from bitdance_tpu.ops.fused_block import fused_mlp_block
from bitdance_tpu.ops.norms import layer_norm


def _reference(x, scale, shift, gate, ln_w, ln_b, w1, b1, w2, b2):
    h = layer_norm(x, ln_w, ln_b) * (1 + scale) + shift
    h12 = h @ w1 + b1
    h1, h2 = jnp.split(h12, 2, axis=-1)
    return x + ((jax.nn.silu(h1) * h2) @ w2 + b2) * gate


def test_fused_block_matches_reference():
    rng = jax.random.PRNGKey(0)
    rows, c, hidden = 100, 128, 192
    ks = jax.random.split(rng, 10)
    x = jax.random.normal(ks[0], (rows, c))
    scale = jax.random.normal(ks[1], (rows, c)) * 0.1
    shift = jax.random.normal(ks[2], (rows, c)) * 0.1
    gate = jax.random.normal(ks[3], (rows, c)) * 0.1
    ln_w = jax.random.normal(ks[4], (c,)) * 0.1 + 1
    ln_b = jax.random.normal(ks[5], (c,)) * 0.1
    w1 = jax.random.normal(ks[6], (c, hidden * 2)) * 0.05
    b1 = jax.random.normal(ks[7], (hidden * 2,)) * 0.05
    w2 = jax.random.normal(ks[8], (hidden, c)) * 0.05
    b2 = jax.random.normal(ks[9], (c,)) * 0.05

    want = _reference(x, scale, shift, gate, ln_w, ln_b, w1, b1, w2, b2)
    got = fused_mlp_block(x, scale, shift, gate, ln_w, ln_b, w1, b1, w2, b2,
                          block_rows=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_block_row_padding():
    rows, c, hidden = 5, 128, 192  # rows < 8 forces padding
    ks = jax.random.split(jax.random.PRNGKey(1), 10)
    args = [jax.random.normal(k, s) * 0.1 for k, s in zip(ks, [
        (rows, c), (rows, c), (rows, c), (rows, c), (c,), (c,),
        (c, hidden * 2), (hidden * 2,), (hidden, c), (c,)])]
    want = _reference(*args)
    got = fused_mlp_block(*args, interpret=True)
    assert got.shape == (rows, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_attn_block_matches_reference():
    from bitdance_tpu.ops.fused_block import fused_attn_block

    g, w, c, n_head = 3, 16, 128, 2
    ks = jax.random.split(jax.random.PRNGKey(7), 10)
    x = jax.random.normal(ks[0], (g, w, c))
    scale = jax.random.normal(ks[1], (g, w, c)) * 0.1
    shift = jax.random.normal(ks[2], (g, w, c)) * 0.1
    gate = jax.random.normal(ks[3], (g, w, c)) * 0.1
    ln_w = 1 + jax.random.normal(ks[4], (c,)) * 0.1
    ln_b = jax.random.normal(ks[5], (c,)) * 0.1
    wqkv = jax.random.normal(ks[6], (c, 3 * c)) * 0.05
    bqkv = jax.random.normal(ks[7], (3 * c,)) * 0.05
    wo = jax.random.normal(ks[8], (c, c)) * 0.05
    bo = jax.random.normal(ks[9], (c,)) * 0.05

    # reference composition (WindowAttention math)
    hd = c // n_head
    h = layer_norm(x, ln_w, ln_b) * (1 + scale) + shift
    qkv = h @ wqkv + bqkv
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(g, w, n_head, hd)
    k = k.reshape(g, w, n_head, hd)
    v = v.reshape(g, w, n_head, hd)
    s = jnp.einsum("gqhd,gkhd->ghqk", q * hd ** -0.5, k)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("ghqk,gkhd->gqhd", p, v).reshape(g, w, c)
    want = x + (o @ wo + bo) * gate

    got = fused_attn_block(x, scale, shift, gate, ln_w, ln_b, wqkv, bqkv,
                           wo, bo, n_head=n_head, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-4)
