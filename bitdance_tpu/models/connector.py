"""Multimodal glue modules: vision-embedding projectors.

MLPConnector mirrors modeling/utils.py:9-20 (fc1 -> gelu_tanh -> fc2), used
to map ±1 latents to LLM hidden states (t2i_pipeline.py:72-74, loaded from
projector.safetensors). SwiGLUConnector mirrors the ImageNet stack's
proj_in (imagenet_gen/src/model.py:60-70).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


class MLPConnector(nn.Module):
    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=True)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)


class SwiGLUConnector(nn.Module):
    """w1 -> silu-gate -> w2 with hidden = 1.5*dim (imagenet model.py:60-70)."""

    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = int(self.out_dim * 1.5)
        h12 = nn.Dense(hidden * 2, dtype=self.dtype, name="w1")(x)
        h1, h2 = jnp.split(h12, 2, axis=-1)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="w2")(nn.silu(h1) * h2)
