"""Binary (lookup-free) quantization primitives.

A visual token is the elementwise sign of the encoder output
(modeling/vision_encoder/autoencoder.py:385-390). Training-time variants add
a straight-through estimator and bit<->index packing for grouped codebooks
(imagenet_gen/src/gfq.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sign_quantize(h: jax.Array) -> jax.Array:
    """+1 where h > 0 else -1 (strictly-positive convention of the reference)."""
    one = jnp.asarray(1.0, h.dtype)
    return jnp.where(h > 0, one, -one)


def sign_quantize_ste(h: jax.Array) -> jax.Array:
    """Sign quantize with straight-through gradients (gfq.py:270-271)."""
    q = sign_quantize(h)
    return h + jax.lax.stop_gradient(q - h)


def bits_to_indices(bits: jax.Array) -> jax.Array:
    """Pack a {0,1} (or bool) array's last axis into integer codes.

    Little-endian weighting 2**i like gfq.py:173-187. Last axis must be <= 31
    bits for int32 (use int64-free TPU-friendly codes).
    """
    nbits = bits.shape[-1]
    assert nbits <= 31, "int32 packing supports <= 31 bits"
    weights = (2 ** jnp.arange(nbits, dtype=jnp.int32))
    return jnp.sum(bits.astype(jnp.int32) * weights, axis=-1)


def indices_to_bits(idx: jax.Array, nbits: int) -> jax.Array:
    """Unpack integer codes into {0,1} int32 bits (little-endian, gfq.py:152-160)."""
    weights = 2 ** jnp.arange(nbits, dtype=jnp.int32)
    return ((idx[..., None] & weights) != 0).astype(jnp.int32)


def indices_to_codes(idx: jax.Array, nbits: int, dtype=jnp.float32) -> jax.Array:
    """Integer codes -> ±1 latents (gfq.py:189-200)."""
    return (indices_to_bits(idx, nbits).astype(dtype) * 2.0 - 1.0).astype(dtype)


def latents_to_indices(latents: jax.Array, num_codebooks: int) -> jax.Array:
    """±1 latents [..., C] -> grouped codes [..., num_codebooks].

    Splits the channel dim into num_codebooks groups and packs each group's
    sign bits (gfq.py:224-239).
    """
    c = latents.shape[-1]
    assert c % num_codebooks == 0
    d = c // num_codebooks
    grouped = latents.reshape(*latents.shape[:-1], num_codebooks, d)
    return bits_to_indices(grouped > 0)


def flip_bits_uniform_prob(key: jax.Array, x: jax.Array, p_max: float) -> jax.Array:
    """Bit-flip augmentation: flip each element w.p. p_max * U (utils.py:127-140).

    r1 < p_max * r2 with independent uniforms gives a marginal flip
    probability of p_max / 2 with per-sample variability.
    """
    k1, k2 = jax.random.split(key)
    r1 = jax.random.uniform(k1, x.shape)
    r2 = jax.random.uniform(k2, x.shape)
    flip = r1 < p_max * r2
    mult = jnp.where(flip, -1.0, 1.0).astype(x.dtype)
    return x * mult
