"""Group-wise Lookup-Free Quantization with entropy regularization.

Re-implements the training-time quantizer of imagenet_gen/src/gfq.py:117-296:
channels split into `num_codebooks` groups, each sign-quantized; auxiliary
losses encourage codebook utilization (per-sample entropy minimization +
batch entropy maximization, gfq.py:73-114) plus a commitment MSE; gradients
flow via the straight-through estimator.

Functional (no parameters) — operates on NHWC latents.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bitdance_tpu.ops.quantize import (
    bits_to_indices,
    indices_to_bits,
    sign_quantize,
)


class GFQOutput(NamedTuple):
    quantized: jax.Array      # ±1 (with STE) [B, h, w, C]
    entropy_loss: jax.Array   # scalar
    commit_loss: jax.Array    # scalar
    indices: jax.Array        # [B, h, w, num_codebooks] int32
    per_sample_entropy: jax.Array
    codebook_entropy: jax.Array


def make_codebook(codebook_dim: int) -> jax.Array:
    """All ±1 codes of a codebook group: [2**dim, dim] fp32 (gfq.py:142-145)."""
    all_codes = jnp.arange(2 ** codebook_dim)
    bits = indices_to_bits(all_codes, codebook_dim)
    return bits.astype(jnp.float32) * 2.0 - 1.0


def entropy_terms(logits: jax.Array, temperature: float = 0.01, eps: float = 1e-5):
    """(sample_entropy, avg_entropy) of softmax(logits/T) (gfq.py:73-114)."""
    probs = jax.nn.softmax(logits / temperature, axis=-1)
    log_probs = jax.nn.log_softmax(logits / temperature + eps, axis=-1)
    avg_probs = jnp.mean(probs.reshape(-1, probs.shape[-1]), axis=0)
    avg_entropy = -jnp.sum(avg_probs * jnp.log(avg_probs + eps))
    sample_entropy = jnp.mean(-jnp.sum(probs * log_probs, axis=-1))
    return sample_entropy, avg_entropy


def gfq_quantize(
    z: jax.Array,
    num_codebooks: int,
    *,
    training: bool = True,
    sample_minimization_weight: float = 1.0,
    batch_maximization_weight: float = 1.0,
    inv_temperature_unused: float = 100.0,
) -> GFQOutput:
    """Quantize encoder output z [B, h, w, C] (gfq.py:202-296)."""
    c = z.shape[-1]
    assert c % num_codebooks == 0
    d = c // num_codebooks
    zf = z.astype(jnp.float32)
    grouped = zf.reshape(*zf.shape[:-1], num_codebooks, d)

    quantized = sign_quantize(grouped)
    indices = bits_to_indices(quantized > 0)

    if training:
        codebook = make_codebook(d)  # [2^d, d]
        # 2 * <x, code> — same ordering as euclidean distance (gfq.py:243)
        logits = 2.0 * jnp.einsum("...d,jd->...j", grouped, codebook)
        per_sample_entropy, codebook_entropy = entropy_terms(logits)
        entropy_loss = (
            sample_minimization_weight * per_sample_entropy
            - batch_maximization_weight * codebook_entropy
        )
        commit_loss = jnp.mean(jnp.square(grouped - jax.lax.stop_gradient(quantized)))
        # straight-through estimator (gfq.py:270-271)
        quantized = grouped + jax.lax.stop_gradient(quantized - grouped)
    else:
        zero = jnp.zeros((), jnp.float32)
        per_sample_entropy = codebook_entropy = entropy_loss = commit_loss = zero

    quantized = quantized.reshape(zf.shape).astype(z.dtype)
    return GFQOutput(
        quantized=quantized,
        entropy_loss=entropy_loss,
        commit_loss=commit_loss,
        indices=indices,
        per_sample_entropy=per_sample_entropy,
        codebook_entropy=codebook_entropy,
    )
