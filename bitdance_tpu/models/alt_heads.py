"""Alternative vision prediction heads.

The reference builds four head families selected by
config.head.vision_pred.type (mllm.py:109-155, 232-242); the shipped models
use 'diffusion_parallel_x' (bitdance_tpu/models/diff_head.py). The other
three, for parity:

  standard            — linear -> CE over the 2^bits visual vocab, with an
                        nn.Embedding codebook for feeding samples back
  regression          — MLP -> MSE on the ±1 latents
  gaussian_regression — MLP -> (mu, logvar) -> reparameterized sample -> MSE
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from bitdance_tpu.ops.quantize import indices_to_codes, latents_to_indices


class StandardVisionHead(nn.Module):
    """Linear CE head over the visual codebook (mllm.py:115-124).

    Practical only for small codebooks (2^bits vocab); the 14B's 2^32 vocab
    is exactly why the reference moved to the diffusion head.
    """

    vocab_size_vision: int
    hidden_size: int
    dtype: Any = jnp.float32

    def setup(self):
        self.embed_tokens_vision = nn.Embed(self.vocab_size_vision,
                                            self.hidden_size,
                                            dtype=self.dtype)
        self.vision_head = nn.Dense(self.vocab_size_vision, dtype=self.dtype)

    def __call__(self, hidden, token_ids):
        """Touches every parameter (use for init)."""
        return self.logits(hidden), self.embed(token_ids)

    def logits(self, hidden):
        return self.vision_head(hidden)

    def embed(self, token_ids):
        return self.embed_tokens_vision(token_ids)

    def loss(self, hidden, labels):
        """Per-token CE (mllm.py:233-235). labels: int codes."""
        logp = jax.nn.log_softmax(self.logits(hidden).astype(jnp.float32), -1)
        return -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]


class RegressionVisionHead(nn.Module):
    """MLP -> MSE latents head (mllm.py:125-130, 236-238)."""

    latent_dim: int
    model_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden):
        x = nn.Dense(self.model_dim, dtype=self.dtype)(hidden)
        x = nn.silu(x)
        return nn.Dense(self.latent_dim, dtype=self.dtype)(x)

    def loss(self, hidden, latents):
        pred = self(hidden)
        return jnp.square(pred.astype(jnp.float32)
                          - latents.astype(jnp.float32))


class GaussianRegressionVisionHead(nn.Module):
    """MLP -> (mu, logvar) -> sample -> MSE (mllm.py:131-136, 239-242;
    gaussian_sample modeling/utils.py:142-147)."""

    latent_dim: int
    model_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hidden, rng):
        x = nn.Dense(self.model_dim, dtype=self.dtype)(hidden)
        x = nn.silu(x)
        raw = nn.Dense(self.latent_dim * 2, dtype=self.dtype)(x)
        mu, log_var = jnp.split(raw, 2, axis=-1)
        sigma = jnp.exp(0.5 * log_var.astype(jnp.float32))
        eps = jax.random.normal(rng, mu.shape, jnp.float32)
        return mu.astype(jnp.float32) + eps * sigma

    def loss(self, hidden, latents, rng):
        sample = self(hidden, rng)
        return jnp.square(sample - latents.astype(jnp.float32))


def codes_from_latents(latents: jax.Array, num_codebooks: int = 1) -> jax.Array:
    """±1 latents -> integer codes for the standard head's CE labels."""
    return latents_to_indices(latents, num_codebooks)


def latents_from_codes(codes: jax.Array, nbits: int) -> jax.Array:
    return indices_to_codes(codes, nbits)
