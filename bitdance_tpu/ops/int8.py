"""Int8 weight quantization for HBM-bound inference matmuls.

The reference serves everything in bf16 (t2i_pipeline.py:51 autocast); on
TPU the decode phase of the 14B LLM is bound by weight HBM traffic, and the
MXU natively runs s8 x s8 -> s32 at twice the bf16 rate. This module is an
AQT-style weight-only/W8A8 path:

  - weights are stored as int8 with symmetric per-output-column f32 scales
    (same scheme as the fused head kernel, ops/fused_head.py:41-47), halving
    the bytes every decode step must stream;
  - activations are quantized dynamically per row at the matmul, so the dot
    itself is s8 x s8 -> s32 on the MXU (XLA lowers this natively);
  - `QTensor` is a NamedTuple (hence a pytree), so quantized layer stacks
    ride `lax.scan` / shardings exactly like their bf16 counterparts, and
    `mm()` dispatches on leaf type — one model code path serves both.

Quantization is inference-only; training paths keep bf16/f32 weights.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QTensor(NamedTuple):
    """Symmetric per-output-column int8 weight.

    q: int8 [..., in, out]; s: f32 [..., 1, out] so that w ~= q * s.
    Leading axes (e.g. the stacked-layer axis) are shared by both fields,
    which keeps `lax.scan` slicing and PartitionSpecs unchanged.
    """

    q: jax.Array
    s: jax.Array


def quantize_linear(w: jax.Array) -> QTensor:
    """Quantize a dense weight [..., in, out] to int8 per-output-column."""
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=-2, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return QTensor(q=q, s=scale)


def dequantize(w: QTensor, dtype=jnp.bfloat16) -> jax.Array:
    return (w.q.astype(jnp.float32) * w.s).astype(dtype)


def int8_matmul(x: jax.Array, w: QTensor) -> jax.Array:
    """x [..., in] @ (q*s) [in, out] via native s8 x s8 -> s32 MXU dot.

    Activations get dynamic symmetric per-row scales. Error is bounded by
    the product of the two rounding steps (~1e-2 relative for well-scaled
    activations); use only where bf16 output tolerance allows (sampling /
    decode paths, not loss computation).
    """
    assert w.q.ndim == 2, "per-call matmul expects unstacked [in, out]"
    shape = x.shape
    x2 = x.reshape(-1, shape[-1]).astype(jnp.float32)
    sx = jnp.max(jnp.abs(x2), axis=1, keepdims=True) / 127.0
    sx = jnp.maximum(sx, 1e-12)
    xq = jnp.clip(jnp.round(x2 / sx), -127, 127).astype(jnp.int8)
    out = jax.lax.dot_general(
        xq, w.q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = out.astype(jnp.float32) * (sx * w.s)
    return out.reshape(shape[:-1] + (w.q.shape[-1],)).astype(x.dtype)


def mm(x: jax.Array, w) -> jax.Array:
    """Weight application that dispatches on leaf type: QTensor -> int8
    MXU path, Q4Tensor -> packed-int4 W4A8 path, plain array -> ordinary
    matmul. Lets one forward function serve bf16 and quantized pytrees."""
    if isinstance(w, QTensor):
        return int8_matmul(x, w)
    from bitdance_tpu.ops.int4 import Q4Tensor, int4_matmul

    if isinstance(w, Q4Tensor):
        return int4_matmul(x, w)
    return x @ w
