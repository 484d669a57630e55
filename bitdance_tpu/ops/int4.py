"""Packed int4 weight quantization for single-chip serving of big models.

The reference serves BitDance-14B in bf16 across A100s (t2i_pipeline.py:51);
on a 16GB TPU chip the FULL 40-layer Qwen3-14B does not fit even at int8
(13.2GB for the layer stack alone, before the embed table / diffusion head /
KV cache). Packing two int4 values per byte brings the layer stack to 6.6GB,
which makes the complete model single-chip servable. At serving batch the
decode matmuls are MXU-compute-bound (M=256 rows), so int4 is a CAPACITY
lever, not a speed one — the dots still run s8 x s8 on the MXU at the int8
rate after an in-VMEM nibble unpack.

Layout (shared with ops/fused_head.py::quantize_cols_int4): byte [k, n]
holds row k in the low nibble and row k + K/2 in the high nibble, so the
matmul unpacks into two contiguous half-K dots instead of a lane shuffle.

Two execution paths behind one `Q4Tensor` leaf type:
  - Pallas kernel (TPU, small-M decode shapes): weights stream HBM->VMEM
    per output tile, the nibble unpack runs on the VPU inside the kernel,
    and the unpacked planes never round-trip HBM.
  - XLA fallback (CPU tests / large-M prefill): explicit unpack + two s8
    dots. Prefill is compute-bound with weight reads amortized over M, so
    the materialized unpack is in the noise there.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class Q4Tensor(NamedTuple):
    """Symmetric per-output-column int4 weight, packed two per byte.

    q: int8 [..., in//2, out] (nibble-packed); s: f32 [..., 1, out] with
    w[k, n] ~= unpack(q)[k, n] * s[0, n]. Leading axes (the stacked-layer
    axis) ride `lax.scan` and PartitionSpecs exactly like bf16 weights.
    """

    q: jax.Array
    s: jax.Array


def quantize_linear_int4(w: jax.Array) -> Q4Tensor:
    """Quantize a dense weight [..., in, out] to packed int4 per-column."""
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=-2, keepdims=True) / 7.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -7, 7).astype(jnp.int8)
    kh = q.shape[-2] // 2
    assert 2 * kh == q.shape[-2], f"odd contraction dim {q.shape}"
    lo, hi = q[..., :kh, :], q[..., kh:, :]
    packed = jnp.bitwise_or(jnp.bitwise_and(lo, jnp.int8(0xF)),
                            jnp.left_shift(hi, 4))
    return Q4Tensor(q=packed.astype(jnp.int8), s=scale)


def unpack_int4(packed: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(lo, hi) sign-extended int8 nibble planes of a packed buffer."""
    w32 = packed.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(w32, 28), 28).astype(jnp.int8)
    hi = jnp.right_shift(w32, 4).astype(jnp.int8)
    return lo, hi


def dequantize_int4(w: Q4Tensor, dtype=jnp.bfloat16) -> jax.Array:
    lo, hi = unpack_int4(w.q)
    q = jnp.concatenate([lo, hi], axis=-2)
    return (q.astype(jnp.float32) * w.s).astype(dtype)


def _quantize_rows(x2: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Dynamic symmetric per-row int8 activation quantization (f32 in)."""
    sx = jnp.maximum(jnp.max(jnp.abs(x2), axis=1, keepdims=True) / 127.0,
                     1e-12)
    xq = jnp.clip(jnp.round(x2 / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def _w4a8_kernel(xq_ref, sx_ref, wp_ref, sw_ref, o_ref):
    lo, hi = unpack_int4(wp_ref[...])
    kh = wp_ref.shape[0]
    acc = (jax.lax.dot_general(
               xq_ref[:, :kh], lo, (((1,), (0,)), ((), ())),
               preferred_element_type=jnp.int32)
           + jax.lax.dot_general(
               xq_ref[:, kh:], hi, (((1,), (0,)), ((), ())),
               preferred_element_type=jnp.int32))
    # sx arrives lane-broadcast to 128 (Mosaic dislikes 1-lane blocks)
    o_ref[...] = acc.astype(jnp.float32) * (sx_ref[:, 0:1] * sw_ref[...])


def _pick_n_tile(n: int, kh: int, m: int) -> int | None:
    """Largest output-column tile with double-buffered weight tiles + the
    resident activations + the f32 out tile inside ~96MB of VMEM."""
    for tn in (2048, 1024, 512, 256, 128):
        if n % tn:
            continue
        vmem = (2 * kh * tn            # double-buffered weight tiles
                + m * 2 * kh            # resident int8 activations
                + m * tn * 4            # f32 out tile
                + m * 128 * 4 + 4 * tn)  # scales
        if vmem < 96 * 1024 * 1024:
            return tn
    return None


@functools.partial(jax.jit, static_argnames=("interpret",))
def _w4a8_matmul_tpu(xq, sx, wq, sw, *, interpret=False):
    """[M, K] int8 acts x packed [K/2, N] -> f32 [M, N] via Pallas."""
    m, k = xq.shape
    kh, n = wq.shape
    tn = _pick_n_tile(n, kh, m)
    assert tn is not None, (m, k, n)
    sx = jnp.broadcast_to(sx, (m, 128))
    grid = (n // tn,)
    return pl.pallas_call(
        _w4a8_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, k), lambda j: (0, 0)),
            pl.BlockSpec((m, 128), lambda j: (0, 0)),
            pl.BlockSpec((kh, tn), lambda j: (0, j)),
            pl.BlockSpec((1, tn), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((m, tn), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xq, sx, wq, sw)


# decode shapes use the kernel; prefill/large-M shapes fall back to the XLA
# unpack (weight reads there are amortized over M, so the materialized
# nibble planes are not the bottleneck)
_KERNEL_MAX_ROWS = 1024


def int4_matmul(x: jax.Array, w: Q4Tensor, *,
                force_xla: bool | None = None) -> jax.Array:
    """x [..., in] @ unpack(q)*s [in, out] with s8 x s8 MXU dots (W4A8)."""
    assert w.q.ndim == 2, "per-call matmul expects unstacked [in//2, out]"
    shape = x.shape
    x2 = x.reshape(-1, shape[-1]).astype(jnp.float32)
    xq, sx = _quantize_rows(x2)
    m = x2.shape[0]
    kh, n = w.q.shape
    use_xla = (force_xla if force_xla is not None
               else (jax.default_backend() != "tpu"
                     or m > _KERNEL_MAX_ROWS or m % 32 != 0
                     or shape[-1] % 256 != 0
                     or _pick_n_tile(n, kh, m) is None))
    if use_xla:
        lo, hi = unpack_int4(w.q)
        out = (jax.lax.dot_general(
                   xq[:, :kh], lo, (((1,), (0,)), ((), ())),
                   preferred_element_type=jnp.int32)
               + jax.lax.dot_general(
                   xq[:, kh:], hi, (((1,), (0,)), ((), ())),
                   preferred_element_type=jnp.int32))
        out = out.astype(jnp.float32) * (sx * w.s)
    else:
        out = _w4a8_matmul_tpu(xq, sx, w.q, w.s)
    return out.reshape(shape[:-1] + (n,)).astype(x.dtype)
