"""Normalization primitives.

All reductions run in float32 regardless of input dtype (TPU bf16 inputs keep
full-precision statistics), then cast back. XLA fuses these into neighbouring
ops; no Pallas needed for the norm math itself.

Reference behaviours matched:
  - RMSNorm: imagenet_gen/src/layers.py:214-215 (torch nn.RMSNorm eps=1e-6)
  - GroupNorm: modeling/vision_encoder/autoencoder.py:28-29 (eps=1e-6, 32 groups)
  - LayerNorm: modeling/vision_head/flow_head_parallel_x.py:150 (eps=1e-6)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """RMSNorm over the last axis. weight: [dim]."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32)).astype(dtype)


def layer_norm(
    x: jax.Array,
    weight: jax.Array | None = None,
    bias: jax.Array | None = None,
    eps: float = 1e-6,
) -> jax.Array:
    """LayerNorm over the last axis; weight/bias optional (elementwise_affine)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


def group_norm(
    x: jax.Array,
    num_groups: int,
    weight: jax.Array | None = None,
    bias: jax.Array | None = None,
    eps: float = 1e-6,
) -> jax.Array:
    """GroupNorm for NHWC tensors [B, H, W, C].

    Statistics are computed per (batch, group) over (H, W, C/G) in fp32,
    matching torch.nn.GroupNorm semantics on NCHW after layout change.
    """
    b, h, w, c = x.shape
    assert c % num_groups == 0, f"channels {c} not divisible by groups {num_groups}"
    dtype = x.dtype
    xf = x.astype(jnp.float32).reshape(b, h, w, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2, 4), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(b, h, w, c)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


def swish(x: jax.Array) -> jax.Array:
    """x * sigmoid(x) (autoencoder.py:10-11)."""
    return x * jax.nn.sigmoid(x)
