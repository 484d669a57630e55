"""Fused tokenizer-encode tail: GroupNorm(32) + swish + 1x1 conv + sign.

The encoder's quantization tail (autoencoder.py:117-131 + the sign in
encode, autoencoder.py:385-390) is four HBM round trips of the widest
feature map ([B, h, w, 1024] at ch=256) under XLA: GN stats, normalize,
swish, conv, sign. This kernel runs the whole tail per image in one
pallas_call with the feature map resident in VMEM.

Group statistics use MXU matmuls against an iota-built group-indicator
matrix instead of reshaping the channel (lane) dimension into groups —
lane-dim reshapes are the expensive/unsupported pattern on Mosaic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fused_encode_tail_kernel(
    x_ref, gnw_ref, gnb_ref, w_ref, b_ref, o_ref,
    *, num_groups: int, eps: float, quantize: bool,
):
    hw = x_ref.shape[1] * x_ref.shape[2]
    c = x_ref.shape[3]
    cg = c // num_groups
    xf = x_ref[...].astype(jnp.float32).reshape(hw, c)

    # per-channel sums -> per-group stats via a [C, G] indicator matmul
    colsum = jnp.sum(xf, axis=0, keepdims=True)            # [1, C]
    sqsum = jnp.sum(xf * xf, axis=0, keepdims=True)        # [1, C]
    c_idx = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0)
    g_idx = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    ind = (c_idx // cg == g_idx).astype(jnp.float32)       # [C, G]

    dot = lambda a, w: jax.lax.dot_general(
        a, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    n = hw * cg
    mean_g = dot(colsum, ind) / n                          # [1, G]
    var_g = dot(sqsum, ind) / n - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    # broadcast group stats back to channels: [1, G] @ [G, C]
    mean_c = dot(mean_g, ind.T)
    inv_c = dot(inv_g, ind.T)

    y = (xf - mean_c) * inv_c
    y = y * gnw_ref[0][None].astype(jnp.float32) \
        + gnb_ref[0][None].astype(jnp.float32)
    y = y * jax.nn.sigmoid(y)                              # swish

    out = jax.lax.dot_general(
        y.astype(w_ref.dtype), w_ref[...],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) + b_ref[0][None].astype(jnp.float32)                 # [hw, z]
    if quantize:
        out = jnp.where(out > 0, 1.0, -1.0)
    o_ref[...] = out.reshape(o_ref.shape).astype(o_ref.dtype)


def fused_encode_tail(
    x: jax.Array,        # [B, h, w, C] encoder trunk output
    gn_weight: jax.Array,  # [C]
    gn_bias: jax.Array,    # [C]
    conv_w: jax.Array,     # [C, z] (1x1 conv kernel squeezed)
    conv_b: jax.Array,     # [z]
    num_groups: int = 32,
    eps: float = 1e-6,
    quantize: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """GroupNorm + swish + 1x1 conv (+ sign) in one kernel, per image."""
    b, h, w, c = x.shape
    z = conv_w.shape[-1]
    kernel = functools.partial(_fused_encode_tail_kernel,
                               num_groups=num_groups, eps=eps,
                               quantize=quantize)
    img = lambda ch: pl.BlockSpec((1, h, w, ch), lambda i: (i, 0, 0, 0))
    vec = lambda n: pl.BlockSpec((1, n), lambda i: (0, 0))
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[img(c), vec(c), vec(c),
                  pl.BlockSpec((c, z), lambda i: (0, 0)), vec(z)],
        out_specs=img(z),
        out_shape=jax.ShapeDtypeStruct((b, h, w, z), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, gn_weight[None], gn_bias[None], conv_w, conv_b[None])


def fused_encode_tail_available(h: int, w: int, c: int) -> bool:
    """Feature map + fp32 working copies must fit VMEM (per image)."""
    return h * w * c * 4 * 3 < 64 * 1024 * 1024
