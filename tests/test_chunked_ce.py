"""Chunked-vocab CE parity (values and gradients)."""

import jax
import jax.numpy as jnp
import numpy as np

from bitdance_tpu.ops.chunked_ce import (
    chunked_cross_entropy,
    cross_entropy_reference,
)


def test_chunked_ce_matches_direct():
    n, d, v = 16, 32, 1000  # non-multiple of chunk
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    h = jax.random.normal(ks[0], (n, d))
    w = jax.random.normal(ks[1], (d, v)) * 0.1
    labels = jax.random.randint(ks[2], (n,), 0, v)
    got = chunked_cross_entropy(h, w, labels, vocab_chunk=256)
    want = cross_entropy_reference(h, w, labels)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_chunked_ce_gradients_match():
    n, d, v = 8, 16, 512
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    h = jax.random.normal(ks[0], (n, d))
    w = jax.random.normal(ks[1], (d, v)) * 0.1
    labels = jax.random.randint(ks[2], (n,), 0, v)

    g1 = jax.grad(lambda h, w: jnp.mean(
        chunked_cross_entropy(h, w, labels, vocab_chunk=128)), argnums=(0, 1))(h, w)
    g2 = jax.grad(lambda h, w: jnp.mean(
        cross_entropy_reference(h, w, labels)), argnums=(0, 1))(h, w)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               rtol=1e-4, atol=1e-5)


def test_chunked_ce_single_chunk():
    n, d, v = 4, 8, 64
    h = jax.random.normal(jax.random.PRNGKey(2), (n, d))
    w = jax.random.normal(jax.random.PRNGKey(3), (d, v)) * 0.1
    labels = jnp.asarray([0, 1, 62, 63])
    got = chunked_cross_entropy(h, w, labels, vocab_chunk=4096)
    want = cross_entropy_reference(h, w, labels)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)
