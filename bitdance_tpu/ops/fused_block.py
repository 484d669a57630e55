"""Fused diffusion-head block kernel.

The Euler–Maruyama sampler calls the head net 50-100x sequentially per AR
step; each MlpResBlock (diff_head.py MlpEncoder) lowers to ~15 small XLA ops
whose fixed launch costs dominate at the head's tiny row counts. This kernel
fuses one whole block —

    h   = LayerNorm(x) * (1 + scale) + shift
    h12 = h @ w1 + b1 ; h = silu(h1) * h2
    out = x + (h @ w2 + b2) * gate

— into a single Pallas call: both matmuls hit the MXU back-to-back with the
norm/modulation/GLU epilogues on the VPU, weights resident in VMEM across
row tiles (constant index_map), fp32 accumulation throughout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fused_mlp_block_kernel(
    x_ref, scale_ref, shift_ref, gate_ref,
    lnw_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    o_ref,
    *, eps: float,
):
    x = x_ref[:, :].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    ln = (x - mean) * jax.lax.rsqrt(var + eps)
    ln = ln * lnw_ref[0, :].astype(jnp.float32) + lnb_ref[0, :].astype(jnp.float32)
    h = ln * (1.0 + scale_ref[:, :].astype(jnp.float32)) \
        + shift_ref[:, :].astype(jnp.float32)

    h12 = jax.lax.dot_general(
        h.astype(w1_ref.dtype), w1_ref[:, :],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) + b1_ref[0, :].astype(jnp.float32)
    hidden = h12.shape[-1] // 2
    h1 = h12[:, :hidden]
    h2 = h12[:, hidden:]
    glu = (jax.nn.silu(h1) * h2)

    out = jax.lax.dot_general(
        glu.astype(w2_ref.dtype), w2_ref[:, :],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) + b2_ref[0, :].astype(jnp.float32)
    o_ref[:, :] = (x + out * gate_ref[:, :].astype(jnp.float32)).astype(o_ref.dtype)


def fused_mlp_block(
    x: jax.Array,       # [rows, C]
    scale: jax.Array,   # [rows, C] (broadcast by caller if shared)
    shift: jax.Array,
    gate: jax.Array,
    ln_w: jax.Array,    # [C]
    ln_b: jax.Array,
    w1: jax.Array,      # [C, 2H]
    b1: jax.Array,      # [2H]
    w2: jax.Array,      # [H, C]
    b2: jax.Array,      # [C]
    eps: float = 1e-6,
    block_rows: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """One fused adaLN-SwiGLU residual block (diff_head.py:128-141)."""
    rows, c = x.shape
    rows_p = max(((rows + 7) // 8) * 8, 8)
    if rows_p != rows:
        pad = ((0, rows_p - rows), (0, 0))
        x = jnp.pad(x, pad)
        scale = jnp.pad(scale, pad)
        shift = jnp.pad(shift, pad)
        gate = jnp.pad(gate, pad)
    br = min(block_rows, rows_p)
    # pad rows to a multiple of the row block
    extra = (-rows_p) % br
    if extra:
        pad = ((0, extra), (0, 0))
        x = jnp.pad(x, pad)
        scale = jnp.pad(scale, pad)
        shift = jnp.pad(shift, pad)
        gate = jnp.pad(gate, pad)
    n_r = x.shape[0] // br

    kernel = functools.partial(_fused_mlp_block_kernel, eps=eps)
    row_spec = pl.BlockSpec((br, c), lambda i: (i, 0))
    const2 = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0))
    out = pl.pallas_call(
        kernel,
        grid=(n_r,),
        in_specs=[
            row_spec, row_spec, row_spec, row_spec,
            const2((1, c)), const2((1, c)),
            pl.BlockSpec(w1.shape, lambda i: (0, 0)),
            const2((1, b1.shape[0])),
            pl.BlockSpec(w2.shape, lambda i: (0, 0)),
            const2((1, c)),
        ],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(x, scale, shift, gate, ln_w[None], ln_b[None], w1, b1[None], w2, b2[None])
    return out[:rows]


def _fused_attn_block_kernel(
    x_ref, scale_ref, shift_ref, gate_ref,
    lnw_ref, lnb_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
    o_ref,
    *, eps: float, n_head: int,
):
    """One window-attention block: LN + adaLN mod + MHA(window) + gated
    residual, for a single [window, C] group per grid cell."""
    x = x_ref[0].astype(jnp.float32)  # [W, C]
    w, c = x.shape
    hd = c // n_head
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    ln = (x - mean) * jax.lax.rsqrt(var + eps)
    ln = ln * lnw_ref[0, :].astype(jnp.float32) + lnb_ref[0, :].astype(jnp.float32)
    h = ln * (1.0 + scale_ref[0].astype(jnp.float32)) \
        + shift_ref[0].astype(jnp.float32)

    qkv = jax.lax.dot_general(
        h.astype(wqkv_ref.dtype), wqkv_ref[:, :],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) + bqkv_ref[0, :].astype(jnp.float32)  # [W, 3C]
    scale_attn = hd ** -0.5

    heads_out = []
    for head in range(n_head):  # static unroll; n_head is small (8-16)
        q = qkv[:, head * hd:(head + 1) * hd] * scale_attn
        k = qkv[:, c + head * hd: c + (head + 1) * hd]
        v = qkv[:, 2 * c + head * hd: 2 * c + (head + 1) * hd]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        heads_out.append(jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    out = jnp.concatenate(heads_out, axis=-1)

    proj = jax.lax.dot_general(
        out.astype(wo_ref.dtype), wo_ref[:, :],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) + bo_ref[0, :].astype(jnp.float32)
    o_ref[0] = (x + proj * gate_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


def fused_attn_block(
    x: jax.Array,       # [G, W, C] groups of window tokens
    scale: jax.Array,   # [G, W, C]
    shift: jax.Array,
    gate: jax.Array,
    ln_w: jax.Array, ln_b: jax.Array,
    wqkv: jax.Array,    # [C, 3C]
    bqkv: jax.Array,    # [3C]
    wo: jax.Array,      # [C, C]
    bo: jax.Array,      # [C]
    n_head: int,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jax.Array:
    """Fused adaLN window-attention residual block (flow_head_parallel_x.py
    TransBlock attention half)."""
    g, w, c = x.shape
    kernel = functools.partial(_fused_attn_block_kernel, eps=eps,
                               n_head=n_head)
    grp = pl.BlockSpec((1, w, c), lambda i: (i, 0, 0))
    const2 = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0))
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            grp, grp, grp, grp,
            const2((1, c)), const2((1, c)),
            pl.BlockSpec(wqkv.shape, lambda i: (0, 0)),
            const2((1, bqkv.shape[0])),
            pl.BlockSpec(wo.shape, lambda i: (0, 0)),
            const2((1, c)),
        ],
        out_specs=grp,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(x, scale, shift, gate, ln_w[None], ln_b[None], wqkv, bqkv[None],
      wo, bo[None])


def fused_attn_available(c: int, weight_itemsize: int = 2) -> bool:
    weight_bytes = (c * 3 * c + c * c) * weight_itemsize
    return weight_bytes < 10 * 1024 * 1024


def fused_block_available(rows: int, c: int, hidden2: int,
                          weight_itemsize: int = 2) -> bool:
    """VMEM feasibility: weights + activations must fit (~12MB budget)."""
    weight_bytes = (c * hidden2 + (hidden2 // 2) * c) * weight_itemsize
    act_bytes = min(rows, 512) * (4 * c + hidden2) * 4
    return weight_bytes + act_bytes < 12 * 1024 * 1024
