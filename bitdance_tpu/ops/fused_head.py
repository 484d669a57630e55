"""Whole-net fused diffusion-head kernel.

The EM sampler calls the head net 50-100x sequentially per AR step
(sampling_x.py:44-97), and profiling shows the head is 60-75% of the T2I /
ImageNet sampling step with per-BLOCK fusion already at the op-launch floor
(~0.34 ms/net-call). This kernel runs the ENTIRE DiffNet forward
(flow_head_parallel_x.py:254-340) — timestep embedding + its MLP, cond add,
input projection, every adaLN block (window attention + SwiGLU), and the
final layer — as ONE `pallas_call`:

  - grid = (num_blocks,): the sequential TPU grid doubles as the layer loop;
    per-block weights are BlockSpec'd on the grid index so Pallas's pipeline
    machinery double-buffers the next block's HBM->VMEM DMA behind the
    current block's compute (the "weights streamed from HBM" design — total
    weights exceed VMEM, per-block slices don't).
  - activations (h, y, mods) live in VMEM scratch, which persists across the
    sequential grid steps; prologue (t-embed, input proj) runs under
    `pl.when(l == 0)`, the adaLN switch recomputes mods only when the grid
    crosses an ada group boundary, and the epilogue (final layer, bounded
    output) runs under `pl.when(l == L-1)`.
  - fp32 accumulation everywhere; weights stay in their storage dtype (bf16)
    on the MXU.

Supports both head families: attention=True (TransEncoder, 6 mods/block,
window attention over the parallel dim) and attention=False (MlpEncoder,
3 mods/block). SwiGLU MLPs only (both production heads use SwiGLU).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_cols(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-output-column int8 weight-only quantization.
    Returns (int8 weights, f32 scales[1, out])."""
    scale = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0,
                    keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def quantize_cols_int4(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-output-column int4 weight-only quantization, PACKED
    two values per int8 byte along the contraction dim: byte [k, n] holds
    row k in the low nibble and row k + K/2 in the high nibble (block
    packing, so the matmul unpacks into two contiguous half-K dots instead
    of a lane-interleaved shuffle). Returns (packed int8 [K//2, N],
    f32 scales [1, N])."""
    wf = w.astype(jnp.float32)
    scale = jnp.maximum(
        jnp.max(jnp.abs(wf), axis=0, keepdims=True) / 7.0, 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -7, 7).astype(jnp.int8)
    kh = q.shape[0] // 2
    assert 2 * kh == q.shape[0], q.shape
    packed = jnp.bitwise_or(jnp.bitwise_and(q[:kh], jnp.int8(0xF)),
                            jnp.left_shift(q[kh:], 4))
    return packed.astype(jnp.int8), scale


def _unpack_int4(packed: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Inverse of quantize_cols_int4's packing: int8 bytes [K//2, N] ->
    (lo, hi) int8 nibble planes, each [K//2, N], sign-extended. Shift-based
    so it lowers to plain arith ops on the VPU."""
    w32 = packed.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(w32, 28), 28).astype(jnp.int8)
    hi = jnp.right_shift(w32, 4).astype(jnp.int8)
    return lo, hi


def stack_diffnet_params(net_params: dict, num_blocks: int,
                         attention: bool, dtype=jnp.bfloat16,
                         quant: bool | str = False) -> dict:
    """DiffNet flax tree -> stacked [L, ...] arrays for the fused kernel.

    Call ONCE outside the sampler loop (e.g. at the top of DiffHead.sample):
    stacking inside the scan would re-materialize all weights per net call.

    quant=True stores the big per-block matrices (wqkv, wo, w1, w2) as int8
    with per-column scales — the sampler is HBM-bound on these weights, so
    halving their bytes nearly halves the whole head; dequantization rides
    the VPU inside the kernel. quant="int4" packs them two-per-byte
    (quantize_cols_int4) for another 2x off the weight DMA; the samplers
    detect the packing structurally (stored K == logical K/2) and unpack
    in-kernel. The modcat projection stays int8 either way (it is read once
    per AR step, not once per net call).
    """
    p = net_params
    blk = [p[f"block_{i}"] for i in range(num_blocks)]
    qfn = quantize_cols_int4 if quant == "int4" else quantize_cols

    def stack(getter):
        return jnp.stack([getter(b).astype(dtype) for b in blk])

    def stack_q(getter):
        qs = [qfn(getter(b)) for b in blk]
        return (jnp.stack([q for q, _ in qs]),
                jnp.stack([s for _, s in qs]))

    out = {
        "in_w": p["input_proj"]["kernel"].astype(dtype),
        "in_b": p["input_proj"]["bias"].astype(jnp.float32),
        "t_w0": p["time_embed"]["mlp_0"]["kernel"].astype(dtype),
        "t_b0": p["time_embed"]["mlp_0"]["bias"].astype(jnp.float32),
        "t_w2": p["time_embed"]["mlp_2"]["kernel"].astype(dtype),
        "t_b2": p["time_embed"]["mlp_2"]["bias"].astype(jnp.float32),
        "b1": stack(lambda b: b["w1"]["bias"][None]),
        "b2": stack(lambda b: b["w2"]["bias"][None]),
        "f_ada_w": p["final_layer"]["ada_ln_modulation"]["kernel"].astype(dtype),
        "f_ada_b": p["final_layer"]["ada_ln_modulation"]["bias"].astype(jnp.float32),
        "f_out_w": p["final_layer"]["linear"]["kernel"].astype(dtype),
        "f_out_b": p["final_layer"]["linear"]["bias"].astype(jnp.float32),
        # storage dtype (105MB as f32 at 14B width); the cond matmul runs
        # once per AR step and accumulates in f32 regardless
        "cond_w": p["cond_embed"]["kernel"].astype(dtype),
        "cond_b": p["cond_embed"]["bias"].astype(jnp.float32),
    }
    if quant:
        out["w1"], out["w1_s"] = stack_q(lambda b: b["w1"]["kernel"])
        out["w2"], out["w2_s"] = stack_q(lambda b: b["w2"]["kernel"])
    else:
        out["w1"] = stack(lambda b: b["w1"]["kernel"])
        out["w2"] = stack(lambda b: b["w2"]["kernel"])
    n_ada = len([k for k in p if k.startswith("ada_ln_")])
    out["ada_w"] = jnp.stack(
        [p[f"ada_ln_{i}"]["kernel"].astype(dtype) for i in range(n_ada)])
    out["ada_b"] = jnp.stack(
        [p[f"ada_ln_{i}"]["bias"][None].astype(jnp.float32)
         for i in range(n_ada)])
    # one concatenated projection [C, A*mC + 2C] -> ALL per-step mods
    # (ada groups + final layer) in a single MXU-friendly matmul
    modcat = jnp.concatenate(
        [w for w in out["ada_w"]] + [out["f_ada_w"]], axis=1)
    out["modcat_b"] = jnp.concatenate(
        [b[0] for b in out["ada_b"]] + [out["f_ada_b"]], axis=0)
    if quant:
        # 734MB bf16 at 14B width — the largest non-block head matrix
        out["modcat_w"], out["modcat_w_s"] = quantize_cols(modcat)
    else:
        out["modcat_w"] = modcat
    if attention:
        out["n1"] = stack(lambda b: jnp.stack(
            [b["norm1"]["weight"], b["norm1"]["bias"]]))       # [L, 2, C]
        out["n2"] = stack(lambda b: jnp.stack(
            [b["norm2"]["weight"], b["norm2"]["bias"]]))
        if quant:
            out["wqkv"], out["wqkv_s"] = stack_q(
                lambda b: b["attn"]["wqkv"]["kernel"])
            out["wo"], out["wo_s"] = stack_q(
                lambda b: b["attn"]["wo"]["kernel"])
        else:
            out["wqkv"] = stack(lambda b: b["attn"]["wqkv"]["kernel"])
            out["wo"] = stack(lambda b: b["attn"]["wo"]["kernel"])
        out["bqkv"] = stack(lambda b: b["attn"]["wqkv"]["bias"][None])
        out["bo"] = stack(lambda b: b["attn"]["wo"]["bias"][None])
    else:
        out["n2"] = stack(lambda b: jnp.stack(
            [b["norm"]["weight"], b["norm"]["bias"]]))
    return out


def _ln(x, eps=1e-6):
    """LayerNorm statistics in one read: E[x^2]-E[x]^2 instead of the
    two-pass centered variance — the resident EM kernels are VPU-bound on
    the LN chain (~15% of the imagenet head step), and the one-pass form
    drops a full [R, C] f32 traversal. |x|~O(1) keeps the cancellation
    benign in f32."""
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    meansq = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    var = jnp.maximum(meansq - jnp.square(mean), 0.0)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def _dot(a, w):
    return jax.lax.dot_general(a.astype(w.dtype), w[...],
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mmq(a, w, scale):
    """Matmul with optional W8A8 path.

    scale=None: plain bf16 MXU dot. scale given (w int8, per-column f32
    scales): quantize activations per row on the VPU and run the dot as
    s8 x s8 -> s32 — the MXU's int8 rate is ~1.5x bf16 at these shapes
    (measured 90 vs 62 TOP/s at [128, 5120] x [5120, 15360]) on top of the
    halved weight DMA, vs dequantize-to-bf16 which only got the DMA half.
    """
    if scale is None:
        return _dot(a, w)
    # quantize in f32: Mosaic has no bf16 roundeven lowering
    a = a.astype(jnp.float32)
    sa = jnp.maximum(jnp.max(jnp.abs(a), axis=1, keepdims=True) / 127.0,
                     1e-12)
    aq = jnp.clip(jnp.round(a / sa), -127, 127).astype(jnp.int8)
    if 2 * w.shape[0] == a.shape[1]:
        # int4-packed along K (quantize_cols_int4): unpack the nibble
        # planes and contract each against its half of the activations
        lo, hi = _unpack_int4(w)
        kh = w.shape[0]
        y = (jax.lax.dot_general(aq[:, :kh], lo, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
             + jax.lax.dot_general(aq[:, kh:], hi, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32))
        return y.astype(jnp.float32) * (sa * scale)
    y = jax.lax.dot_general(aq, w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (sa * scale)


def _attn_from_qkv(qkv, *, n_head: int, groups: int, c_dim: int):
    """Window attention over packed qkv [R, 3C] -> f32 [R, C].

    Per-(group, head) unrolled dots: inside Pallas the MXU only takes 2-D
    operands, and the [w, w] score tiles are tiny enough that the unroll
    beats any reshape gymnastics. Softmax statistics in f32."""
    rows = qkv.shape[0]
    hd = c_dim // n_head
    w = rows // groups
    outs = []
    for g in range(groups):
        sl = slice(g * w, (g + 1) * w)
        heads = []
        for hh in range(n_head):
            q = qkv[sl, hh * hd:(hh + 1) * hd] * (hd ** -0.5)
            k = qkv[sl, c_dim + hh * hd: c_dim + (hh + 1) * hd]
            v = qkv[sl, 2 * c_dim + hh * hd: 2 * c_dim + (hh + 1) * hd]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            heads.append(jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        outs.append(jnp.concatenate(heads, axis=-1))
    return jnp.concatenate(outs, axis=0)


def _block_body(h, mods, attn_w, n2, w1, b1, w2, b2, *,
                n_head: int, groups: int, eps: float,
                w1_s=None, w2_s=None, elem=jnp.float32):
    """One adaLN block (attention half optional + SwiGLU MLP half).

    `h` [R, C]; `mods` [R, n_mods*C]; weight args are ARRAYS (optionally
    int8 with per-column scales). `elem` is the elementwise compute dtype:
    bf16 (matching a bf16 weight stack, i.e. the reference's autocast
    semantics) halves the VPU/VMEM bytes of the modulation chain, which is
    what the fused sampler is bound on; LN statistics and attention
    softmax stay fp32 regardless."""
    c_dim = h.shape[-1]
    h = h.astype(elem)
    mods = mods.astype(elem)

    def moded(x, which, nrm):
        scale = mods[:, which * c_dim:(which + 1) * c_dim]
        shift = mods[:, (which + 1) * c_dim:(which + 2) * c_dim]
        ln = _ln(x, eps).astype(elem) * nrm[0][None].astype(elem) \
            + nrm[1][None].astype(elem)
        return ln * (1.0 + scale) + shift

    if attn_w is not None:
        n1, wqkv, bqkv, wo, bo, wqkv_s, wo_s = attn_w
        ha = moded(h, 0, n1)
        qkv = (_mmq(ha, wqkv, wqkv_s) + bqkv[None]).astype(elem)  # [R, 3C]
        attn_out = _attn_from_qkv(
            qkv, n_head=n_head, groups=groups, c_dim=c_dim).astype(elem)
        proj = (_mmq(attn_out, wo, wo_s) + bo[None]).astype(elem)
        gate1 = mods[:, 2 * c_dim:3 * c_dim]
        h = h + proj * gate1
        mlp_base = 3
    else:
        mlp_base = 0

    hm = moded(h, mlp_base, n2)
    h12 = (_mmq(hm, w1, w1_s) + b1[None]).astype(elem)
    hidden = h12.shape[-1] // 2
    # silu in f32: Mosaic's logistic lowering broadcasts an f32 scalar into
    # the vector dtype and fails verification on bf16 operands
    glu = (jax.nn.silu(h12[:, :hidden].astype(jnp.float32)).astype(elem)
           * h12[:, hidden:])
    mlp_out = (_mmq(glu, w2, w2_s) + b2[None]).astype(elem)
    gate2 = mods[:, (mlp_base + 2) * c_dim:(mlp_base + 3) * c_dim]
    return h + mlp_out * gate2


def _fused_net_kernel(
    # inputs (order mirrors the call below)
    x_ref, t_ref, c_emb_ref,
    in_w_ref, in_b_ref, t_w0_ref, t_b0_ref, t_w2_ref, t_b2_ref,
    ada_w_ref, ada_b_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, n2_ref,
    f_ada_w_ref, f_ada_b_ref, f_out_w_ref, f_out_b_ref,
    *maybe_attn_refs,
    num_blocks: int, switch_freq: int, n_head: int, groups: int,
    bounded: bool, attention: bool, t_freq_size: int, eps: float = 1e-6,
):
    if attention:
        (n1_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, o_ref,
         h_vm, y_vm, mods_vm) = maybe_attn_refs
    else:
        o_ref, h_vm, y_vm, mods_vm = maybe_attn_refs

    l = pl.program_id(0)

    # ---- prologue: t-embed MLP, y, input projection (block 0 only) --------
    @pl.when(l == 0)
    def _prologue():
        rows = x_ref.shape[0] * x_ref.shape[1]
        t = t_ref[...].astype(jnp.float32)       # [rows, half], pre-broadcast
        half = t_freq_size // 2
        idx = jax.lax.broadcasted_iota(
            jnp.int32, (rows, half), 1).astype(jnp.float32)
        freqs = jnp.exp(-math.log(10000.0) * idx / half)
        args = (t * 1000.0) * freqs
        t_freq = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        te = _dot(t_freq, t_w0_ref) + t_b0_ref[0][None]
        te = _dot(jax.nn.silu(te), t_w2_ref) + t_b2_ref[0][None]
        c = c_emb_ref[...].astype(jnp.float32).reshape(rows, -1)
        y_vm[...] = jax.nn.silu(te + c)
        xin = x_ref[...].astype(jnp.float32).reshape(rows, -1)
        h_vm[...] = _dot(xin, in_w_ref) + in_b_ref[0][None]

    # ---- adaLN switch: recompute mods at group boundaries ------------------
    @pl.when(l % switch_freq == 0)
    def _mods():
        mods_vm[...] = _dot(y_vm[...], ada_w_ref[0]) + ada_b_ref[0, 0][None]

    c_dim = h_vm.shape[-1]
    h = _block_body(
        h_vm[...], mods_vm[...],
        (n1_ref[0], wqkv_ref[0], bqkv_ref[0, 0], wo_ref[0], bo_ref[0, 0],
         None, None)
        if attention else None,
        n2_ref[0], w1_ref[0], b1_ref[0, 0], w2_ref[0], b2_ref[0, 0],
        n_head=n_head, groups=groups, eps=eps, elem=n2_ref.dtype)
    h_vm[...] = h.astype(jnp.float32)

    # ---- epilogue: final layer (last block only) ---------------------------
    @pl.when(l == num_blocks - 1)
    def _epilogue():
        y = y_vm[...]
        mod = _dot(y, f_ada_w_ref) + f_ada_b_ref[0][None]
        scale = mod[:, :c_dim]
        shift = mod[:, c_dim:]
        z = _ln(h, eps) * (1.0 + scale) + shift
        out = _dot(z, f_out_w_ref) + f_out_b_ref[0][None]
        if bounded:
            out = 2.0 * jax.nn.sigmoid(out) - 1.0
        o_ref[...] = out.reshape(o_ref.shape).astype(o_ref.dtype)


def fused_diffnet_forward(
    stacked: dict,
    x: jax.Array,          # [G, W, ch_in] (attention groups) or [R, ch_in]
    t: jax.Array,          # [G, W] or [R] matching x's leading dims
    c_emb: jax.Array,      # same leading dims as x, trailing C
    *,
    num_blocks: int,
    num_ada: int,
    n_head: int = 0,
    attention: bool = True,
    bounded: bool = True,
    t_freq_size: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """One-kernel DiffNet forward. Returns x-prediction, same shape as x."""
    squeeze = x.ndim == 2
    if squeeze:                      # MLP head: rows are independent
        x, c_emb = x[None], c_emb[None]
    g, w, ch = x.shape
    c_dim = c_emb.shape[-1]
    rows = g * w
    # pre-broadcast t across the frequency lanes (kernel-friendly layout:
    # a [G, W] -> [R, 1] reshape would move the lane dim inside the kernel)
    t2d = jnp.broadcast_to(
        t.reshape(rows).astype(jnp.float32)[:, None], (rows, t_freq_size // 2))
    switch_freq = max(1, num_blocks // num_ada)

    const = lambda arr: pl.BlockSpec(arr.shape, lambda l: (0,) * arr.ndim)
    per_block = lambda arr: pl.BlockSpec((1,) + arr.shape[1:],
                                         lambda l: (l,) + (0,) * (arr.ndim - 1))
    per_ada = lambda arr: pl.BlockSpec(
        (1,) + arr.shape[1:],
        lambda l: (l // switch_freq,) + (0,) * (arr.ndim - 1))

    args = [x, t2d, c_emb,
            stacked["in_w"], stacked["in_b"][None],
            stacked["t_w0"], stacked["t_b0"][None],
            stacked["t_w2"], stacked["t_b2"][None],
            stacked["ada_w"], stacked["ada_b"],
            stacked["w1"], stacked["b1"], stacked["w2"], stacked["b2"],
            stacked["n2"],
            stacked["f_ada_w"], stacked["f_ada_b"][None],
            stacked["f_out_w"], stacked["f_out_b"][None]]
    specs = [const(x), const(t2d), const(c_emb),
             const(args[3]), const(args[4]), const(args[5]), const(args[6]),
             const(args[7]), const(args[8]),
             per_ada(stacked["ada_w"]), per_ada(stacked["ada_b"]),
             per_block(stacked["w1"]), per_block(stacked["b1"]),
             per_block(stacked["w2"]), per_block(stacked["b2"]),
             per_block(stacked["n2"]),
             const(args[16]), const(args[17]), const(args[18]),
             const(args[19])]
    if attention:
        args += [stacked["n1"], stacked["wqkv"], stacked["bqkv"],
                 stacked["wo"], stacked["bo"]]
        specs += [per_block(stacked["n1"]), per_block(stacked["wqkv"]),
                  per_block(stacked["bqkv"]), per_block(stacked["wo"]),
                  per_block(stacked["bo"])]

    kernel = functools.partial(
        _fused_net_kernel, num_blocks=num_blocks, switch_freq=switch_freq,
        n_head=n_head, groups=g, bounded=bounded, attention=attention,
        t_freq_size=t_freq_size)

    n_mods = 6 if attention else 3
    out = pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=specs,
        out_specs=pl.BlockSpec(x.shape, lambda l: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows, c_dim), jnp.float32),          # h
            pltpu.VMEM((rows, c_dim), jnp.float32),          # y
            pltpu.VMEM((rows, n_mods * c_dim), jnp.float32),  # mods
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # the body's live intermediates (qkv, h12, mods reads) exceed the
            # 16MB default scoped-vmem budget at C>=1024
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    return out[0] if squeeze else out


def fused_net_available(c_dim: int, rows: int, attention: bool,
                        weight_itemsize: int = 2) -> bool:
    """VMEM feasibility: double-buffered per-block + per-ada weights, const
    inputs, and fp32 scratch must fit in ~100MB of VMEM."""
    h = int(c_dim * 1.5)
    per_block = c_dim * 2 * h + h * c_dim                    # w1 + w2
    if attention:
        per_block += c_dim * 3 * c_dim + c_dim * c_dim       # wqkv + wo
    n_mods = 6 if attention else 3
    per_ada = c_dim * n_mods * c_dim
    const = (256 + c_dim) * c_dim + c_dim * 3 * c_dim        # t-mlp + final
    scratch = rows * c_dim * (2 + n_mods) * 4
    total = (2 * (per_block + per_ada)) * weight_itemsize \
        + const * weight_itemsize + scratch
    return total < 100 * 1024 * 1024


# ---------------------------------------------------------------------------
# Whole-sampler kernel: ALL Euler–Maruyama steps in one pallas_call
# ---------------------------------------------------------------------------

def _fused_em_kernel(
    # inputs
    x0_ref, noise_ref, allmods_ref,
    t_sm, dt_sm, cfg_sm,
    in_w_ref, in_b_ref, f_out_w_ref, f_out_b_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, n2_ref,
    *rest,
    num_blocks: int, num_steps: int, switch_freq: int, n_head: int,
    groups: int, bounded: bool, attention: bool, last_step_size: float,
    quant: bool, final_chunk: bool = True, eps: float = 1e-6,
):
    rest = list(rest)
    w1_s = w2_s = wqkv_s = wo_s = None
    if quant:
        w1_s, w2_s = rest.pop(0), rest.pop(0)
    if attention:
        n1_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref = rest[:5]
        rest = rest[5:]
        if quant:
            wqkv_s, wo_s = rest.pop(0), rest.pop(0)
    o_ref, x_vm, h_vm = rest

    s = pl.program_id(0)
    l = pl.program_id(1)
    half = x0_ref.shape[0]
    c_dim = h_vm.shape[-1]
    n_mods = 6 if attention else 3

    @pl.when((s == 0) & (l == 0))
    def _init():
        x_vm[...] = x0_ref[...].astype(jnp.float32)

    # ---- prologue per sampler step: input projection of [x; x] -------------
    @pl.when(l == 0)
    def _proj_in():
        x = x_vm[...]
        combined = jnp.concatenate([x, x], axis=0)           # CFG rows
        h_vm[...] = _dot(combined, in_w_ref) + in_b_ref[0][None]

    # allmods row layout: [ada_0 mods | ada_1 mods | ... | final mods]
    g = l // switch_freq
    mods = allmods_ref[0, :, pl.dslice(g * n_mods * c_dim, n_mods * c_dim)]
    h = _block_body(
        h_vm[...], mods,
        (n1_ref[0], wqkv_ref[0], bqkv_ref[0, 0], wo_ref[0], bo_ref[0, 0],
         wqkv_s[0] if quant else None, wo_s[0] if quant else None)
        if attention else None,
        n2_ref[0], w1_ref[0], b1_ref[0, 0], w2_ref[0], b2_ref[0, 0],
        n_head=n_head, groups=groups, eps=eps,
        w1_s=w1_s[0] if quant else None, w2_s=w2_s[0] if quant else None,
        elem=n2_ref.dtype)
    h_vm[...] = h.astype(jnp.float32)

    # ---- epilogue per sampler step: final layer + EM update ----------------
    @pl.when(l == num_blocks - 1)
    def _em_step():
        fmod = allmods_ref[0, :, -(2 * c_dim):].astype(jnp.float32)
        scale = fmod[:, :c_dim]
        shift = fmod[:, c_dim:]
        z = _ln(h, eps) * (1.0 + scale) + shift
        out = _dot(z, f_out_w_ref) + f_out_b_ref[0][None]    # [R, ch]
        if bounded:
            out = 2.0 * jax.nn.sigmoid(out) - 1.0

        t = t_sm[s]
        dt = dt_sm[s]
        cfg = cfg_sm[0]
        x = x_vm[...]
        combined = jnp.concatenate([x, x], axis=0)
        v = (out - combined) / jnp.maximum(1.0 - t, 0.05)
        v_cond = v[:half]
        v_unc = v[half:]
        vc = v_unc + cfg * (v_cond - v_unc)

        @pl.when(s < num_steps)
        def _stochastic():
            # score-augmented SDE step (sampling_x.py:33-42)
            var = jnp.square(1.0 - t) + t * (1.0 - t)
            score = (t * vc - x) / var
            drift = vc + (1.0 - t) * score
            ns = jnp.sqrt(2.0 * (1.0 - t) * dt)
            xn = x + drift * dt + ns * noise_ref[0].astype(jnp.float32)
            x_vm[...] = xn
            if not final_chunk:
                # intermediate chunk of a step-chunked sample (grid stops
                # at num_steps): hand the post-EM state to the next chunk
                @pl.when(s == num_steps - 1)
                def _write_out():
                    o_ref[...] = xn.astype(o_ref.dtype)

        @pl.when(s == num_steps)
        def _final_euler():
            # deterministic last step at t = 1 - last_step_size
            xf = x + vc * last_step_size
            x_vm[...] = xf
            o_ref[...] = xf.astype(o_ref.dtype)



def _fused_em_kernel_resident(
    # inputs
    x0_ref, noise_ref, allmods_ref,
    t_sm, dt_sm, cfg_sm,
    in_w_ref, in_b_ref, f_out_w_ref, f_out_b_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, n2_ref,
    *rest,
    num_blocks: int, num_steps: int, switch_freq: int, n_head: int,
    groups: int, bounded: bool, attention: bool, last_step_size: float,
    quant: bool, final_chunk: bool = True, eps: float = 1e-6,
):
    """Weights-RESIDENT twin of _fused_em_kernel: grid = (num_steps+1,)
    with every block's weights held in VMEM for the whole sampling loop
    (whole-head footprint < VMEM, e.g. the 31MB 768-wide imagenet heads).
    The per-(step, block) variant re-streams ~3.2GB of weights per AR step
    at 100 EM steps; this one reads them once."""
    rest = list(rest)
    w1_s = w2_s = wqkv_s = wo_s = None
    if quant:
        w1_s, w2_s = rest.pop(0), rest.pop(0)
    if attention:
        n1_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref = rest[:5]
        rest = rest[5:]
        if quant:
            wqkv_s, wo_s = rest.pop(0), rest.pop(0)
    o_ref, x_vm = rest

    s = pl.program_id(0)
    half = x0_ref.shape[0]
    c_dim = n2_ref.shape[-1]
    n_mods = 6 if attention else 3

    @pl.when(s == 0)
    def _init():
        x_vm[...] = x0_ref[...].astype(jnp.float32)

    x = x_vm[...]
    combined = jnp.concatenate([x, x], axis=0)           # CFG rows
    h = _dot(combined, in_w_ref) + in_b_ref[0][None]
    for l in range(num_blocks):                          # unrolled: weights
        g = l // switch_freq                             # stay resident
        mods = allmods_ref[
            0, :, pl.dslice(g * n_mods * c_dim, n_mods * c_dim)]
        h = _block_body(
            h, mods,
            (n1_ref[l], wqkv_ref[l], bqkv_ref[l, 0], wo_ref[l],
             bo_ref[l, 0],
             wqkv_s[l] if quant else None, wo_s[l] if quant else None)
            if attention else None,
            n2_ref[l], w1_ref[l], b1_ref[l, 0], w2_ref[l], b2_ref[l, 0],
            n_head=n_head, groups=groups, eps=eps,
            w1_s=w1_s[l] if quant else None,
            w2_s=w2_s[l] if quant else None, elem=n2_ref.dtype)

    fmod = allmods_ref[0, :, -(2 * c_dim):].astype(jnp.float32)
    z = _ln(h, eps) * (1.0 + fmod[:, :c_dim]) + fmod[:, c_dim:]
    out = _dot(z, f_out_w_ref) + f_out_b_ref[0][None]    # [R, ch]
    if bounded:
        out = 2.0 * jax.nn.sigmoid(out) - 1.0

    t = t_sm[s]
    dt = dt_sm[s]
    cfgv = cfg_sm[0]
    v = (out - combined) / jnp.maximum(1.0 - t, 0.05)
    vc = v[half:] + cfgv * (v[:half] - v[half:])

    @pl.when(s < num_steps)
    def _stochastic():
        var = jnp.square(1.0 - t) + t * (1.0 - t)
        score = (t * vc - x) / var
        drift = vc + (1.0 - t) * score
        ns = jnp.sqrt(2.0 * (1.0 - t) * dt)
        xn = x + drift * dt + ns * noise_ref[0].astype(jnp.float32)
        x_vm[...] = xn
        if not final_chunk:
            @pl.when(s == num_steps - 1)
            def _write_out():
                o_ref[...] = xn.astype(o_ref.dtype)

    @pl.when(s == num_steps)
    def _final_euler():
        xf = x + vc * last_step_size
        x_vm[...] = xf
        o_ref[...] = xf.astype(o_ref.dtype)


def streamed_em_preferred(c_dim: int, rows: int, attention: bool,
                          hidden: int | None = None,
                          weight_itemsize: float = 1,
                          mods_itemsize: int = 2) -> bool:
    """ROUTING preference for the manual-DMA streamed EM kernel.

    Measured at the 14B head geometry (C=5120 H=7680 L=6 R=256, 50 steps,
    one v5e, benchmarks/bench_streamed_head.py, em_precompute included in
    both sides):
        int8 W8A8 : dma 3.353 ms/net-call vs stacked XLA 4.627  (1.38x)
        int4 W4A8 : dma 3.187 ms/net-call vs stacked XLA 6.706  (2.10x)
    against the ~2.8 ms floor (1.74 MXU + 0.48 modcat + ~0.5 serial glue,
    benchmarks/probe_head_dots.py). The r3 grid-tiled kernel generation
    (10.35 ms at the same shape — per-grid-step fixed cost, see
    _fused_em_kernel_streamed_dma's docstring — and a 17.69-vs-7.31
    s/image end-to-end regression record) was PRUNED in r5; the history
    lives in probe_head_dots.py.

    BITDANCE_STREAMED_EM accepts exactly "" / "1" (default: dma kernel
    when feasible) and "0" (force the stacked XLA sampler — the bench
    ladders' escalation rung); anything else raises so a typo or a stale
    legacy value ("force") can't silently change the serving kernel."""
    import os

    env = os.environ.get("BITDANCE_STREAMED_EM", "")
    if env not in ("", "0", "1"):
        raise ValueError(
            f"BITDANCE_STREAMED_EM={env!r}: accepted values are '' / '1' "
            "(default routing) and '0' (stacked XLA sampler)")
    if env == "0":
        return False
    return streamed_dma_available(c_dim, rows, attention, hidden,
                                  weight_itemsize, mods_itemsize)


def _fused_em_kernel_streamed_dma(
    # inputs
    x0_ref, noise_ref, m0_ref, m1_ref, m2_ref, fm_ref,
    t_sm, dt_sm, cfg_sm,
    in_w_ref, in_b_ref, f_out_w_ref, f_out_b_ref,
    n1_ref, n2_ref,
    bqkv_ref, bo_ref, b1_ref, b2_ref,
    wqkv_hbm, wo_hbm, w1_hbm, w2_hbm,
    *rest,
    num_blocks: int, num_steps: int, switch_freq: int, n_head: int,
    groups: int, bounded: bool, last_step_size: float, quant: bool,
    tn: int, hidden: int, n_buf: int = 2, final_chunk: bool = True,
    eps: float = 1e-6,
):
    """MANUAL-DMA twin of _fused_em_kernel_streamed.

    The tiled variant drives the sub-block weight tiles through the Pallas
    grid (grid dim 2 = tile index) and its revolving-buffer machinery;
    measured at the 14B head geometry that costs ~43-54 us/tile against a
    ~10-17 us DMA/MXU roofline — the per-grid-step fixed cost (27 input
    index maps + pipeline bookkeeping on the scalar core) swamps the
    actual work, and pre-tiling the weights to make the DMAs contiguous
    did not move it (r3 probe, benchmarks/probe_head_dots.py docstring).

    Here the grid is (num_steps+1, num_blocks) — identical to
    _fused_em_kernel — and the four block matrices stay in HBM
    (memory_space=ANY); the kernel walks their column tiles with a
    STATICALLY UNROLLED loop and explicit double-buffered
    `pltpu.make_async_copy`s: tile i+1's DMA is issued before tile i's
    compute, and the first tile of the NEXT block is issued at the end of
    the current grid step, so the weight stream never drains. Static
    unrolling also makes every buf_vm/h_vm slice offset a compile-time
    constant (the tiled kernel's traced lane offsets forced dynamic VMEM
    addressing).

    Stage order per block (same as the tiled kernel): qkv tiles ->
    attention -> wo tiles (gated residual) -> w1 tiles -> GLU -> w2 tiles
    (gated residual); epilogue (final layer + EM update) on the last
    block. Activations are quantized ONCE per stage into a_vm (identical
    semantics to _mmq's per-call row quantization).
    """
    rest = list(rest)
    wqkv_s = wo_s = w1_s = w2_s = None
    if quant:
        wqkv_s, wo_s, w1_s, w2_s = rest[:4]
        rest = rest[4:]
        o_ref, x_vm, h_vm, buf_vm, a_vm, sa_vm, w_sc, sem = rest
    else:
        o_ref, x_vm, h_vm, buf_vm, a_vm, w_sc, sem = rest
        sa_vm = None

    s = pl.program_id(0)
    l = pl.program_id(1)
    half = x0_ref.shape[0]
    c_dim = h_vm.shape[1]
    elem = n2_ref.dtype
    n_l = num_blocks

    # stage -> (HBM weight stack, logical K); stored K (shape[1]) may be
    # half the logical K for int4-packed stacks
    stages = {
        "A": (wqkv_hbm, c_dim),
        "B": (wo_hbm, c_dim),
        "C": (w1_hbm, c_dim),
        "D": (w2_hbm, hidden),
    }
    t_q, t_o = 3 * c_dim // tn, c_dim // tn
    t_1, t_2 = 2 * hidden // tn, c_dim // tn
    plan = ([("A", t) for t in range(t_q)] + [("B", t) for t in range(t_o)]
            + [("C", t) for t in range(t_1)] + [("D", t) for t in range(t_2)])
    n_tiles = len(plan)
    # slot of tile i is statically i % n_buf; cross-grid-step consistency
    # (the previous step's tail prefetches the next step's first tiles into
    # the slots its warmup would use) requires n_tiles % n_buf == 0
    assert n_tiles % n_buf == 0, (n_tiles, n_buf)

    def dma(slot, stage, li, t):
        w_hbm, _ = stages[stage]
        k_st = w_hbm.shape[1]
        return pltpu.make_async_copy(
            w_hbm.at[li, :, pl.ds(t * tn, tn)],
            w_sc.at[slot, 0:k_st, :],
            sem.at[slot])

    def stage_quant(act):
        """Row-quantize (or bf16-store) a stage's activations into a_vm."""
        k_dim = act.shape[1]
        if quant:
            sa = jnp.maximum(
                jnp.max(jnp.abs(act), axis=1, keepdims=True) / 127.0, 1e-12)
            q = jnp.clip(jnp.round(act / sa), -127, 127).astype(jnp.int8)
            a_vm[:, 0:k_dim] = q
            sa_vm[...] = jnp.broadcast_to(sa, sa_vm.shape)
        else:
            a_vm[:, 0:k_dim] = act.astype(elem)

    def stage_dot(slot, k_dim, k_st, w_s_tile):
        """a_vm[:, :k_dim] @ w_sc[slot] -> f32 [R, tn] (s8 path if quant;
        int4-packed tiles detected by halved stored K — W4A8)."""
        w_tile = w_sc[slot, 0:k_st, :]
        if quant and 2 * k_st == k_dim:
            lo, hi = _unpack_int4(w_tile)
            y = (jax.lax.dot_general(
                    a_vm[:, 0:k_st], lo, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                 + jax.lax.dot_general(
                    a_vm[:, k_st:k_dim], hi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32))
            return y.astype(jnp.float32) * (sa_vm[:, 0:1] * w_s_tile)
        a = a_vm[:, 0:k_dim]
        if quant:
            y = jax.lax.dot_general(a, w_tile, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return y.astype(jnp.float32) * (sa_vm[:, 0:1] * w_s_tile)
        return jax.lax.dot_general(a, w_tile, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def lnmod(nrm, scale, shift):
        ln = _ln(h_vm[...], eps) * nrm[0][None].astype(jnp.float32) \
            + nrm[1][None].astype(jnp.float32)
        return ln * (1.0 + scale.astype(jnp.float32)) \
            + shift.astype(jnp.float32)

    @pl.when((s == 0) & (l == 0))
    def _init():
        x_vm[...] = x0_ref[...].astype(jnp.float32)
        for j in range(n_buf - 1):                           # warmup fill
            dma(j, plan[j][0], 0, plan[j][1]).start()

    @pl.when(l == 0)
    def _proj_in():
        x = x_vm[...]
        combined = jnp.concatenate([x, x], axis=0)           # CFG rows
        h_vm[...] = _dot(combined, in_w_ref) + in_b_ref[0][None]

    nxt_l = jax.lax.rem(l + 1, n_l)
    ns_grid = num_steps + (1 if final_chunk else 0)
    not_last = jnp.logical_not((s == ns_grid - 1) & (l == num_blocks - 1))

    # stage A entry: adaLN(attention) modulation, quantized once
    m0 = m0_ref[0]                                           # [R, 2C]
    stage_quant(lnmod(n1_ref[0], m0[:, :c_dim], m0[:, c_dim:]))

    for i, (stage, t) in enumerate(plan):
        slot = i % n_buf
        # keep the weight stream n_buf-1 tiles ahead of the MXU
        j = i + n_buf - 1
        if j < n_tiles:
            n_stage, n_t = plan[j]
            dma(j % n_buf, n_stage, l, n_t).start()
        else:
            n_stage, n_t = plan[j - n_tiles]

            @pl.when(not_last)
            def _prefetch_next_block(n_stage=n_stage, n_t=n_t,
                                     slot_j=j % n_buf):
                dma(slot_j, n_stage, nxt_l, n_t).start()
        w_hbm, k_dim = stages[stage]
        k_st = w_hbm.shape[1]
        dma(stage=stage, slot=slot, li=l, t=t).wait()
        sl = slice(t * tn, (t + 1) * tn)

        if stage == "A":
            ws = wqkv_s[0, 0, sl][None] if quant else None
            y = stage_dot(slot, k_dim, k_st, ws) + bqkv_ref[0, 0, sl][None]
            buf_vm[:, sl] = y.astype(elem)
            if t == t_q - 1:
                stage_quant(_attn_from_qkv(
                    buf_vm[:, 0:3 * c_dim], n_head=n_head, groups=groups,
                    c_dim=c_dim))
        elif stage == "B":
            ws = wo_s[0, 0, sl][None] if quant else None
            proj = stage_dot(slot, k_dim, k_st, ws) + bo_ref[0, 0, sl][None]
            gate1 = m1_ref[0, :, sl].astype(jnp.float32)
            h_vm[:, sl] = h_vm[:, sl] + proj * gate1
            if t == t_o - 1:
                stage_quant(lnmod(n2_ref[0], m1_ref[0][:, c_dim:],
                                  m2_ref[0][:, :c_dim]))
        elif stage == "C":
            ws = w1_s[0, 0, sl][None] if quant else None
            y = stage_dot(slot, k_dim, k_st, ws) + b1_ref[0, 0, sl][None]
            buf_vm[:, sl] = y.astype(elem)
            if t == t_1 - 1:
                h1 = buf_vm[:, 0:hidden].astype(jnp.float32)
                h2 = buf_vm[:, hidden:2 * hidden].astype(jnp.float32)
                stage_quant(jax.nn.silu(h1) * h2)
        else:                                                # stage D
            ws = w2_s[0, 0, sl][None] if quant else None
            y = stage_dot(slot, k_dim, k_st, ws) + b2_ref[0, 0, sl][None]
            gate2 = m2_ref[0, :, c_dim + t * tn:
                           c_dim + (t + 1) * tn].astype(jnp.float32)
            h_vm[:, sl] = h_vm[:, sl] + y * gate2

    # ---- epilogue: final layer + EM update (last block) ---------------------
    @pl.when(l == num_blocks - 1)
    def _em_step():
        fmod = fm_ref[0].astype(jnp.float32)                 # [R, 2C]
        z = _ln(h_vm[...], eps) * (1.0 + fmod[:, :c_dim]) \
            + fmod[:, c_dim:]
        out = _dot(z, f_out_w_ref) + f_out_b_ref[0][None]    # [R, ch]
        if bounded:
            out = 2.0 * jax.nn.sigmoid(out) - 1.0

        tv = t_sm[s]
        dt = dt_sm[s]
        cfgv = cfg_sm[0]
        x = x_vm[...]
        combined = jnp.concatenate([x, x], axis=0)
        v = (out - combined) / jnp.maximum(1.0 - tv, 0.05)
        vc = v[half:] + cfgv * (v[:half] - v[half:])

        @pl.when(s < num_steps)
        def _stochastic():
            var = jnp.square(1.0 - tv) + tv * (1.0 - tv)
            score = (tv * vc - x) / var
            drift = vc + (1.0 - tv) * score
            ns = jnp.sqrt(2.0 * (1.0 - tv) * dt)
            xn = x + drift * dt + ns * noise_ref[0].astype(jnp.float32)
            x_vm[...] = xn
            if not final_chunk:
                @pl.when(s == num_steps - 1)
                def _write_out():
                    o_ref[...] = xn.astype(o_ref.dtype)

        @pl.when(s == num_steps)
        def _final_euler():
            xf = x + vc * last_step_size
            x_vm[...] = xf
            o_ref[...] = xf.astype(o_ref.dtype)


def _pick_stream_dma_tile(c_dim: int, hidden: int, rows: int,
                          stored_k_max: int, w_itemsize: int = 1,
                          int4: bool = False, n_buf: int = 2,
                          mods_itemsize: int = 2) -> int | None:
    """Largest weight-column tile for the manual-DMA streamed kernel:
    must divide every stage width (3C, C, 2H), give an EVEN total tile
    count (so the double-buffer slot of each grid step's first tile is
    statically 0), and fit the VMEM model (one shared 2-slot weight
    scratch instead of the tiled kernel's per-input revolving buffers —
    which is why this picker admits much larger tiles). int4 tiles charge
    an extra 2*K*tn for the per-dot nibble-unpack intermediates (the lo/hi
    s8 planes) — omitting that term VMEM-OOMed the int4-head R=384 config
    at tn=2560 (measured r4)."""
    scratch = (rows * c_dim * 4             # h residual (f32)
               + rows * max(3 * c_dim, 2 * hidden) * 2   # qkv/h12 (bf16)
               + rows * max(c_dim, hidden) * 2           # stage acts
               + rows * 512 * 4)            # row scales + x state slack
    # 4 aliased mods inputs, double-buffered; mods_itemsize follows the
    # head dtype (bf16 heads carry bf16 mods, f32 heads f32 — charging a
    # hardcoded 2 under-counted f32-head VMEM 2x, r4 advisor finding)
    mods = 4 * 2 * rows * 2 * c_dim * mods_itemsize
    for tn in (2560, 2048, 1280, 1024, 640, 512, 256, 128):
        if c_dim % tn or (2 * hidden) % tn:
            continue
        if ((5 * c_dim + 2 * hidden) // tn) % n_buf:
            continue
        weights = n_buf * stored_k_max * tn * w_itemsize
        if int4:
            weights += 2 * stored_k_max * tn
        if scratch + mods + weights < 112 * 1024 * 1024:
            return tn
    return None


def streamed_dma_available(c_dim: int, rows: int, attention: bool,
                           hidden: int | None = None,
                           weight_itemsize: float = 1,
                           mods_itemsize: int = 2) -> bool:
    """Feasibility of the manual-DMA streamed EM kernel (attention-family
    SwiGLU heads; weight_itemsize 0.5 = int4-packed; mods_itemsize 4 for
    f32 heads)."""
    if not attention or c_dim % 128 != 0:
        return False
    hidden = int(c_dim * 1.5) if hidden is None else hidden
    int4 = weight_itemsize == 0.5
    stored_k_max = (max(c_dim, hidden) // 2 if int4
                    else max(c_dim, hidden))
    item = 1 if weight_itemsize <= 1 else int(weight_itemsize)
    return _pick_stream_dma_tile(c_dim, hidden, rows, stored_k_max,
                                 item, int4=int4,
                                 mods_itemsize=mods_itemsize) is not None


def _fused_em_sample_streamed_dma(
    stacked, x0, noise, allmods, t_all, dt_all, cfg, *,
    num_blocks, switch_freq, n_head, groups, attention, bounded,
    last_step_size, quant, num_steps, interpret, final_chunk=True,
):
    """pallas_call wrapper for _fused_em_kernel_streamed_dma. Same
    `allmods` layout as the other EM wrappers (viewed through four aliased
    2C-column-blocked inputs); the four weight stacks are passed un-blocked
    in ANY memory space and DMA'd by the kernel."""
    assert attention, "streamed EM kernel is for the attention head family"
    half, ch = x0.shape
    rows = 2 * half
    c_dim = stacked["n2"].shape[-1]
    hidden = stacked["b1"].shape[-1] // 2
    stored_k_max = max(stacked["wqkv"].shape[1], stacked["w2"].shape[1])
    int4 = 2 * stacked["w1"].shape[1] == c_dim
    # BITDANCE_DMA_SLOTS>2 trades tile width for issue-ahead depth: extra
    # in-flight tiles cover the DMA-idle window during the serial stage-end
    # glue (attention / lnmod / GLU). A/B knob for bench_streamed_head.
    import os

    n_buf = int(os.environ.get("BITDANCE_DMA_SLOTS", "2"))
    mods_item = allmods.dtype.itemsize
    tn = _pick_stream_dma_tile(c_dim, hidden, rows, stored_k_max,
                               stacked["w1"].dtype.itemsize, int4=int4,
                               n_buf=n_buf, mods_itemsize=mods_item)
    if tn is None and n_buf != 2:
        # the requested slot depth has no dividing tile count at this
        # geometry (e.g. DMA_SLOTS=3 at 14B: every tile count is a power
        # of two times 5) — availability/routing checked n_buf=2, so
        # degrade to it rather than aborting the serving trace
        n_buf = 2
        tn = _pick_stream_dma_tile(c_dim, hidden, rows, stored_k_max,
                                   stacked["w1"].dtype.itemsize, int4=int4,
                                   mods_itemsize=mods_item)
    assert tn is not None, (c_dim, hidden, rows)
    assert allmods.shape[2] % (2 * c_dim) == 0, allmods.shape
    fm_block = allmods.shape[2] // (2 * c_dim) - 1

    const = lambda arr: pl.BlockSpec(arr.shape, lambda s, l: (0,) * arr.ndim)
    smem = lambda arr: pl.BlockSpec(
        arr.shape, lambda s, l: (0,) * arr.ndim, memory_space=pltpu.SMEM)
    per_block = lambda arr: pl.BlockSpec(
        (1,) + arr.shape[1:], lambda s, l: (l,) + (0,) * (arr.ndim - 1))
    mods_block = (1, rows, 2 * c_dim)

    def mods_map(j):
        return pl.BlockSpec(
            mods_block, lambda s, l: (s, 0, (l // switch_freq) * 3 + j))

    hbm = pl.BlockSpec(memory_space=pl.ANY)

    args = [
        x0, noise, allmods, allmods, allmods, allmods,
        t_all, dt_all, cfg.reshape(1),
        stacked["in_w"], stacked["in_b"][None],
        stacked["f_out_w"], stacked["f_out_b"][None],
        stacked["n1"], stacked["n2"],
        stacked["bqkv"], stacked["bo"], stacked["b1"], stacked["b2"],
        stacked["wqkv"], stacked["wo"], stacked["w1"], stacked["w2"],
    ]
    specs = [
        const(x0),
        pl.BlockSpec((1,) + noise.shape[1:],
                     lambda s, l: (jnp.minimum(s, num_steps - 1), 0, 0)),
        mods_map(0), mods_map(1), mods_map(2),
        pl.BlockSpec(mods_block, lambda s, l: (s, 0, fm_block)),
        smem(t_all), smem(dt_all), smem(cfg.reshape(1)),
        const(stacked["in_w"]), const(stacked["in_b"][None]),
        const(stacked["f_out_w"]), const(stacked["f_out_b"][None]),
        per_block(stacked["n1"]), per_block(stacked["n2"]),
        per_block(stacked["bqkv"]), per_block(stacked["bo"]),
        per_block(stacked["b1"]), per_block(stacked["b2"]),
        hbm, hbm, hbm, hbm,
    ]
    if quant:
        args += [stacked["wqkv_s"], stacked["wo_s"],
                 stacked["w1_s"], stacked["w2_s"]]
        specs += [per_block(stacked["wqkv_s"]), per_block(stacked["wo_s"]),
                  per_block(stacked["w1_s"]), per_block(stacked["w2_s"])]

    elem = stacked["n2"].dtype
    scratch = [
        pltpu.VMEM((half, ch), jnp.float32),                 # x
        pltpu.VMEM((rows, c_dim), jnp.float32),              # h (residual)
        pltpu.VMEM((rows, max(3 * c_dim, 2 * hidden)), elem),  # qkv / h12
        pltpu.VMEM((rows, max(c_dim, hidden)),
                   jnp.int8 if quant else elem),             # stage acts
    ]
    if quant:
        scratch.append(pltpu.VMEM((rows, 128), jnp.float32))  # row scales
    scratch += [
        pltpu.VMEM((n_buf, stored_k_max, tn), stacked["w1"].dtype),
        pltpu.SemaphoreType.DMA((n_buf,)),
    ]

    kernel = functools.partial(
        _fused_em_kernel_streamed_dma, num_blocks=num_blocks,
        num_steps=num_steps, switch_freq=switch_freq, n_head=n_head,
        groups=groups, bounded=bounded, last_step_size=last_step_size,
        quant=quant, tn=tn, hidden=hidden, n_buf=n_buf,
        final_chunk=final_chunk)

    return pl.pallas_call(
        kernel,
        grid=(num_steps + (1 if final_chunk else 0), num_blocks),
        in_specs=specs,
        out_specs=pl.BlockSpec(x0.shape, lambda s, l: (0, 0)),
        out_shape=jax.ShapeDtypeStruct(x0.shape, jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)


def fused_em_sample(
    stacked: dict,
    x0: jax.Array,         # [half, ch] initial noise (cond rows only)
    noise: jax.Array,      # [num_steps, half, ch] per-step noise
    allmods: jax.Array,    # [S, R, A*n_mods*C + 2C] precomputed mods
    t_all: jax.Array,      # [S] f32 (S = num_steps + 1)
    dt_all: jax.Array,     # [S] f32 (last entry unused)
    cfg: jax.Array,        # [] f32 guidance scale
    *,
    num_blocks: int,
    num_ada: int,
    n_head: int = 0,
    groups: int = 1,
    attention: bool = True,
    bounded: bool = True,
    last_step_size: float = 0.05,
    interpret: bool = False,
    resident: bool | None = None,
    streamed: bool | None = None,
    final_chunk: bool = True,
) -> jax.Array:
    """Entire EM sampling loop (sampling_x.py:44-97) as ONE kernel.

    grid = (num_steps+1, num_blocks): the current latent and activations
    stay VMEM-resident across every net call; block weights stream from HBM
    once per (step, block); per-step adaLN/final mods arrive precomputed
    (one concatenated matmul per AR step outside, instead of streaming the
    big ada projections 50x). CFG rows are ordered [cond; uncond].

    final_chunk=False runs a PARTIAL sample — num_steps EM updates, NO
    final euler step (grid stops at num_steps), returning the post-EM state
    for a subsequent call to continue from. This lets the caller chunk the
    sampler over steps so `allmods` only ever holds one chunk's mods (the
    full 51-step buffer is 1.87GB at 14B/2-image width — an HBM-peak
    problem, see diff_head._run_fused_sample). t_all/dt_all/allmods then
    carry num_steps entries instead of num_steps+1.
    """
    num_steps = noise.shape[0]
    switch_freq = max(1, num_blocks // num_ada)
    quant = "w1_s" in stacked
    # the Pallas kernels are single-device programs over the canonical
    # (3, nh, hd)/(2, H) column order; TP trees go through em_sample_stacked
    assert "hm_marker" not in stacked, \
        "TP head-major stacked layout is em_sample_stacked-only"

    weight_keys = ["w1", "b1", "w2", "b2", "n2"]
    if quant:
        weight_keys += ["w1_s", "w2_s"]
    if attention:
        weight_keys += ["n1", "wqkv", "bqkv", "wo", "bo"]
        if quant:
            weight_keys += ["wqkv_s", "wo_s"]
    weight_bytes = sum(stacked[k].size * stacked[k].dtype.itemsize
                       for k in weight_keys)
    # whole-head weights resident in VMEM when they fit (e.g. 31MB at the
    # 768-wide imagenet heads): eliminates the per-(step, block) weight
    # re-streaming (~3.2GB per 100-step sample) and 6x the grid steps.
    # Threshold is measurement-backed: raising it to 80MB to make the 54MB
    # int8 0.7B-class T2I head resident REGRESSED end-to-end (0.78 -> 0.85
    # s/image, r4) — at that occupancy the unrolled 6-block body loses more
    # to VMEM pressure than the 306-step grid costs.
    if resident is None:
        resident = weight_bytes <= 48 * 1024 * 1024
    if resident:
        return _fused_em_sample_resident(
            stacked, x0, noise, allmods, t_all, dt_all, cfg,
            num_blocks=num_blocks, switch_freq=switch_freq, n_head=n_head,
            groups=groups, attention=attention, bounded=bounded,
            last_step_size=last_step_size, quant=quant,
            num_steps=num_steps, interpret=interpret,
            final_chunk=final_chunk)

    # per-(step, block) streaming needs a whole block's weights double-
    # buffered in VMEM; beyond that (the 5120-wide 14B head) switch to the
    # manual-DMA sub-block streamed kernel (`streamed` accepts True/"dma").
    if streamed is None:
        streamed = 2 * weight_bytes // num_blocks > 60 * 1024 * 1024
    if streamed:
        rows = 2 * x0.shape[0]
        c_dim = stacked["n2"].shape[-1]
        hidden = stacked["b1"].shape[-1] // 2
        int4 = 2 * stacked["w1"].shape[1] == c_dim
        w_item = 0.5 if int4 else stacked["w1"].dtype.itemsize
        assert streamed_dma_available(c_dim, rows, attention, hidden, w_item,
                                      mods_itemsize=allmods.dtype.itemsize), \
            ("streamed EM requested but infeasible", c_dim, rows, hidden)
        return _fused_em_sample_streamed_dma(
            stacked, x0, noise, allmods, t_all, dt_all, cfg,
            num_blocks=num_blocks, switch_freq=switch_freq, n_head=n_head,
            groups=groups, attention=attention, bounded=bounded,
            last_step_size=last_step_size, quant=quant,
            num_steps=num_steps, interpret=interpret,
            final_chunk=final_chunk)

    const = lambda arr: pl.BlockSpec(arr.shape, lambda s, l: (0,) * arr.ndim)
    per_block = lambda arr: pl.BlockSpec(
        (1,) + arr.shape[1:], lambda s, l: (l,) + (0,) * (arr.ndim - 1))
    smem = lambda arr: pl.BlockSpec(
        arr.shape, lambda s, l: (0,) * arr.ndim, memory_space=pltpu.SMEM)

    args = [
        x0, noise, allmods,
        t_all, dt_all, cfg.reshape(1),
        stacked["in_w"], stacked["in_b"][None],
        stacked["f_out_w"], stacked["f_out_b"][None],
        stacked["w1"], stacked["b1"], stacked["w2"], stacked["b2"],
        stacked["n2"],
    ]
    specs = [
        const(x0),
        pl.BlockSpec((1,) + noise.shape[1:],
                     lambda s, l: (jnp.minimum(s, num_steps - 1), 0, 0)),
        pl.BlockSpec((1,) + allmods.shape[1:], lambda s, l: (s, 0, 0)),
        smem(t_all), smem(dt_all), smem(cfg.reshape(1)),
        const(args[6]), const(args[7]), const(args[8]), const(args[9]),
        per_block(stacked["w1"]), per_block(stacked["b1"]),
        per_block(stacked["w2"]), per_block(stacked["b2"]),
        per_block(stacked["n2"]),
    ]
    if quant:
        args += [stacked["w1_s"], stacked["w2_s"]]
        specs += [per_block(stacked["w1_s"]), per_block(stacked["w2_s"])]
    if attention:
        args += [stacked["n1"], stacked["wqkv"], stacked["bqkv"],
                 stacked["wo"], stacked["bo"]]
        specs += [per_block(stacked["n1"]), per_block(stacked["wqkv"]),
                  per_block(stacked["bqkv"]), per_block(stacked["wo"]),
                  per_block(stacked["bo"])]
        if quant:
            args += [stacked["wqkv_s"], stacked["wo_s"]]
            specs += [per_block(stacked["wqkv_s"]),
                      per_block(stacked["wo_s"])]

    half, ch = x0.shape
    rows = 2 * half
    c_dim = stacked["n2"].shape[-1]
    kernel = functools.partial(
        _fused_em_kernel, num_blocks=num_blocks, num_steps=num_steps,
        switch_freq=switch_freq, n_head=n_head, groups=groups,
        bounded=bounded, attention=attention,
        last_step_size=last_step_size, quant=quant,
        final_chunk=final_chunk)

    return pl.pallas_call(
        kernel,
        grid=(num_steps + (1 if final_chunk else 0), num_blocks),
        in_specs=specs,
        out_specs=pl.BlockSpec(x0.shape, lambda s, l: (0, 0)),
        out_shape=jax.ShapeDtypeStruct(x0.shape, jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((half, ch), jnp.float32),             # x
            pltpu.VMEM((rows, c_dim), jnp.float32),          # h
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)


def _fused_em_sample_resident(
    stacked, x0, noise, allmods, t_all, dt_all, cfg, *,
    num_blocks, switch_freq, n_head, groups, attention, bounded,
    last_step_size, quant, num_steps, interpret, final_chunk=True,
):
    """grid (num_steps+1,) variant with every weight as a VMEM-resident
    const input (see _fused_em_kernel_resident)."""
    const = lambda arr: pl.BlockSpec(arr.shape, lambda s: (0,) * arr.ndim)
    smem = lambda arr: pl.BlockSpec(
        arr.shape, lambda s: (0,) * arr.ndim, memory_space=pltpu.SMEM)

    args = [
        x0, noise, allmods,
        t_all, dt_all, cfg.reshape(1),
        stacked["in_w"], stacked["in_b"][None],
        stacked["f_out_w"], stacked["f_out_b"][None],
        stacked["w1"], stacked["b1"], stacked["w2"], stacked["b2"],
        stacked["n2"],
    ]
    specs = [
        const(x0),
        pl.BlockSpec((1,) + noise.shape[1:],
                     lambda s: (jnp.minimum(s, num_steps - 1), 0, 0)),
        pl.BlockSpec((1,) + allmods.shape[1:], lambda s: (s, 0, 0)),
        smem(t_all), smem(dt_all), smem(cfg.reshape(1)),
    ] + [const(a) for a in args[6:]]
    if quant:
        args += [stacked["w1_s"], stacked["w2_s"]]
    if attention:
        args += [stacked["n1"], stacked["wqkv"], stacked["bqkv"],
                 stacked["wo"], stacked["bo"]]
        if quant:
            args += [stacked["wqkv_s"], stacked["wo_s"]]
    specs += [const(a) for a in args[15:]]

    half, ch = x0.shape
    kernel = functools.partial(
        _fused_em_kernel_resident, num_blocks=num_blocks,
        num_steps=num_steps, switch_freq=switch_freq, n_head=n_head,
        groups=groups, bounded=bounded, attention=attention,
        last_step_size=last_step_size, quant=quant,
        final_chunk=final_chunk)
    return pl.pallas_call(
        kernel,
        grid=(num_steps + (1 if final_chunk else 0),),
        in_specs=specs,
        out_specs=pl.BlockSpec(x0.shape, lambda s: (0, 0)),
        out_shape=jax.ShapeDtypeStruct(x0.shape, jnp.float32),
        scratch_shapes=[pltpu.VMEM((half, ch), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)


def _block_body_xla(h, mods, attn_w, n2, w1, b1, w2, b2, *,
                    n_head: int, groups: int, eps: float,
                    w1_s=None, w2_s=None, elem=jnp.float32,
                    head_major: bool = False):
    """XLA twin of _block_body with BATCHED attention (einsum over heads
    instead of the kernel's per-head slicing loop — outside Pallas the
    per-head loop would emit 2*groups*n_head tiny HLO ops per block).

    `elem` is the ELEMENTWISE/activation dtype: LN statistics, softmax and
    matmul accumulation stay f32, but the residual stream and the wide
    intermediate tensors ([R, 2H] glu chain) are carried in `elem`. bf16
    halves the VPU glue traffic; on the W8A8 path every matmul input is
    quantized to 8 bits anyway, so bf16 rounding (2^-8 relative) is noise
    next to the existing activation-quantization error.

    `head_major`: the TP weight layout (parallel/tp.py
    reorder_stacked_head_major) — wqkv columns ordered (n_head, 3, hd) and
    w1 columns (n_head, 2, H/nh) instead of (3, n_head, hd) / (2, H), so a
    last-dim tp sharding lands on whole heads and GSPMD propagates through
    these reshapes without resharding. Pure permutation: outputs are
    bit-identical to the canonical layout."""
    c_dim = h.shape[-1]
    mods = mods.astype(elem)
    h = h.astype(elem)

    def moded(x, which, nrm):
        scale = mods[:, which * c_dim:(which + 1) * c_dim]
        shift = mods[:, (which + 1) * c_dim:(which + 2) * c_dim]
        ln = _ln(x, eps).astype(elem) * nrm[0][None].astype(elem) \
            + nrm[1][None].astype(elem)
        return ln * (1.0 + scale) + shift

    if attn_w is not None:
        n1, wqkv, bqkv, wo, bo, wqkv_s, wo_s = attn_w
        hd = c_dim // n_head
        ha = moded(h, 0, n1)
        qkv = _mmq(ha, wqkv, wqkv_s) + bqkv[None]            # [R, 3C] f32
        w = h.shape[0] // groups
        if head_major:
            qkv = qkv.reshape(groups, w, n_head, 3, hd)
            q = qkv[:, :, :, 0] * (hd ** -0.5)
            k = qkv[:, :, :, 1]
            v = qkv[:, :, :, 2]
        else:
            qkv = qkv.reshape(groups, w, 3, n_head, hd)
            q = qkv[:, :, 0] * (hd ** -0.5)
            k = qkv[:, :, 1]
            v = qkv[:, :, 2]
        s = jnp.einsum("gqhd,gkhd->ghqk", q, k)
        p = jax.nn.softmax(s, axis=-1)
        attn_out = jnp.einsum("ghqk,gkhd->gqhd", p, v).reshape(
            groups * w, c_dim)
        proj = (_mmq(attn_out, wo, wo_s) + bo[None]).astype(elem)
        gate1 = mods[:, 2 * c_dim:3 * c_dim]
        h = h + proj * gate1
        mlp_base = 3
    else:
        mlp_base = 0

    hm = moded(h, mlp_base, n2)
    h12 = (_mmq(hm, w1, w1_s) + b1[None]).astype(elem)
    hidden = h12.shape[-1] // 2
    if head_major:
        h3 = h12.reshape(h12.shape[0], n_head, 2, hidden // n_head)
        glu = (jax.nn.silu(h3[:, :, 0]) * h3[:, :, 1]).reshape(
            h12.shape[0], hidden)
    else:
        glu = jax.nn.silu(h12[:, :hidden]) * h12[:, hidden:]
    mlp_out = (_mmq(glu, w2, w2_s) + b2[None]).astype(elem)
    gate2 = mods[:, (mlp_base + 2) * c_dim:(mlp_base + 3) * c_dim]
    return h + mlp_out * gate2


def em_sample_stacked(
    stacked: dict,
    x0: jax.Array,
    noise: jax.Array,
    allmods: jax.Array | None,
    t_all: jax.Array,
    dt_all: jax.Array,
    cfg: jax.Array,
    *,
    num_blocks: int,
    num_ada: int,
    n_head: int = 0,
    groups: int = 1,
    attention: bool = True,
    bounded: bool = True,
    last_step_size: float = 0.05,
    c_emb: jax.Array | None = None,
    mods_chunks: int = 1,
    glue_dtype=jnp.float32,
) -> jax.Array:
    """XLA twin of fused_em_sample for widths whose per-block weights exceed
    VMEM (fused_net_available False — e.g. the 5120-wide 14B head, whose w1
    alone is 157MB bf16). Same math, layouts, and precomputed-mods design;
    block weights ride a `lax.scan` xs so each step reads one block.

    When `stacked` was built with quant=True the matmuls run W8A8 on the
    MXU's s8 path — at 5120 width the sampler is matmul-COMPUTE-bound
    (6.07 ms/net-call flax vs a 5.7 ms bf16 matmul roofline), so the int8
    rate is the remaining single-chip lever.

    mods_chunks > 1 (requires `c_emb` and mods_chunks | num_steps) computes
    the precomputed mods in chunks INSIDE the sampling scan instead of one
    [S, R, W] buffer up front: the buffer is GBs at 14B width with multi-
    image batches (1.9GB at 2 images), and chunking trades ~one extra read
    of the ada projections per chunk (~0.7ms) for 1/chunks the residency.
    """
    num_steps = noise.shape[0]
    switch_freq = max(1, num_blocks // num_ada)
    quant = "w1_s" in stacked
    # TP head-major weight layout (parallel/tp.py) — detected structurally
    # off the pytree key so the canonical single-device trace is unchanged
    head_major = "hm_marker" in stacked
    half, ch = x0.shape
    c_dim = stacked["n2"].shape[-1]
    n_mods = 6 if attention else 3

    xs = {
        "idx": jnp.arange(num_blocks, dtype=jnp.int32),
        "w1": stacked["w1"], "b1": stacked["b1"],
        "w2": stacked["w2"], "b2": stacked["b2"], "n2": stacked["n2"],
    }
    if quant:
        xs["w1_s"], xs["w2_s"] = stacked["w1_s"], stacked["w2_s"]
    if attention:
        xs.update(n1=stacked["n1"], wqkv=stacked["wqkv"],
                  bqkv=stacked["bqkv"], wo=stacked["wo"], bo=stacked["bo"])
        if quant:
            xs["wqkv_s"], xs["wo_s"] = stacked["wqkv_s"], stacked["wo_s"]

    # NOTE(measured, r3): splitting this scan into per-ada-group scans over
    # statically-sliced weights looks like it should remove the per-block
    # dynamic_slice of mods_row, but XLA does NOT hoist the loop-invariant
    # weight slices out of the step scan — it re-copies all ~1.33GB of
    # block weights every net call and the sampler DOUBLES in time
    # (3.41 -> 8.0 ms/net-call at the 14B geometry). The dynamic_slice
    # itself only reads the required [R, n_mods*C] (~0.12 ms); keep it.
    def net_forward(x, mods_row):
        combined = jnp.concatenate([x, x], axis=0)           # CFG rows
        h = _dot(combined.astype(stacked["in_w"].dtype), stacked["in_w"]) \
            + stacked["in_b"][None]

        h = h.astype(glue_dtype)

        def block(h, bw):
            g = bw["idx"] // switch_freq
            mods = jax.lax.dynamic_slice_in_dim(
                mods_row, g * n_mods * c_dim, n_mods * c_dim, axis=1)
            attn_w = None
            if attention:
                attn_w = (bw["n1"], bw["wqkv"], bw["bqkv"][0], bw["wo"],
                          bw["bo"][0],
                          bw["wqkv_s"] if quant else None,
                          bw["wo_s"] if quant else None)
            h = _block_body_xla(
                h, mods, attn_w, bw["n2"], bw["w1"], bw["b1"][0],
                bw["w2"], bw["b2"][0], n_head=n_head, groups=groups,
                eps=1e-6,
                w1_s=bw["w1_s"] if quant else None,
                w2_s=bw["w2_s"] if quant else None, elem=glue_dtype,
                head_major=head_major)
            return h, None

        h, _ = jax.lax.scan(block, h, xs)
        fmod = mods_row[:, -(2 * c_dim):].astype(jnp.float32)
        z = _ln(h) * (1.0 + fmod[:, :c_dim]) + fmod[:, c_dim:]
        out = _dot(z.astype(stacked["f_out_w"].dtype), stacked["f_out_w"]) \
            + stacked["f_out_b"][None]
        if bounded:
            out = 2.0 * jax.nn.sigmoid(out) - 1.0
        return out                                           # [R, ch]

    def vc_from(x, mods_row, t):
        out = net_forward(x, mods_row)
        combined = jnp.concatenate([x, x], axis=0)
        v = (out - combined) / jnp.maximum(1.0 - t, 0.05)
        return v[:half] * cfg + v[half:] * (1.0 - cfg)

    def em_step(x, mods_row, t, dt, nz):
        vc = vc_from(x, mods_row, t)
        var = jnp.square(1.0 - t) + t * (1.0 - t)
        score = (t * vc - x) / var
        drift = vc + (1.0 - t) * score
        ns = jnp.sqrt(2.0 * (1.0 - t) * dt)
        return x + drift * dt + ns * nz

    mods_dtype = stacked["in_w"].dtype

    if mods_chunks <= 1:
        if allmods is None:
            allmods = em_precompute(stacked, c_emb, t_all,
                                    out_dtype=mods_dtype)

        def step(x, xs_i):
            am, t, dt, nz = xs_i
            return em_step(x, am, t, dt, nz), None

        # mods/t/dt/noise ride the scan as xs (not gathered by a traced
        # step index) so XLA prefetches the next step's [R, W] mods slice
        # during the current step's matmuls
        x, _ = jax.lax.scan(
            step, x0.astype(jnp.float32),
            (allmods[:num_steps], t_all[:num_steps], dt_all[:num_steps],
             noise))
        final_mods = allmods[num_steps]
    else:
        assert c_emb is not None and num_steps % mods_chunks == 0, \
            (num_steps, mods_chunks)
        lc = num_steps // mods_chunks
        t_ch = t_all[:num_steps].reshape(mods_chunks, lc)
        dt_ch = dt_all[:num_steps].reshape(mods_chunks, lc)
        nz_ch = noise.reshape(mods_chunks, lc, half, ch)

        def chunk_body(x, xs_c):
            t_c, dt_c, nz_c = xs_c
            am_c = em_precompute(stacked, c_emb, t_c, out_dtype=mods_dtype)

            def inner(x, xs_i):
                am_i, t, dt, nz = xs_i
                return em_step(x, am_i, t, dt, nz), None

            x, _ = jax.lax.scan(inner, x, (am_c, t_c, dt_c, nz_c))
            return x, None

        x, _ = jax.lax.scan(chunk_body, x0.astype(jnp.float32),
                            (t_ch, dt_ch, nz_ch))
        final_mods = em_precompute(
            stacked, c_emb, t_all[num_steps: num_steps + 1],
            out_dtype=mods_dtype)[0]
    vc = vc_from(x, final_mods, t_all[num_steps])
    return x + vc * last_step_size


def em_precompute(stacked: dict, c_emb: jax.Array, t_all: jax.Array,
                  t_freq_size: int = 256, out_dtype=jnp.bfloat16):
    """Per-AR-step precompute for fused_em_sample: adaLN + final-layer mods
    for EVERY sampler timestep in ONE concatenated matmul (reads the big ada
    projections once per AR step instead of once per net call, and keeps the
    MXU in bf16 with a single [S*R, C] x [C, A*n_mods*C + 2C] shape).

    c_emb: [R, C] fp32 (cond_embed already applied; rows = [cond; uncond]).
    Returns allmods [S, R, A*n_mods*C + 2C].
    """
    from bitdance_tpu.models.diff_head import timestep_embedding

    tf = timestep_embedding(t_all, t_freq_size)              # [S, 256]
    te = _dot(tf, stacked["t_w0"]) + stacked["t_b0"][None]
    te = _dot(jax.nn.silu(te), stacked["t_w2"]) + stacked["t_b2"][None]
    y = jax.nn.silu(te[:, None, :] + c_emb[None])            # [S, R, C]
    s_dim, r_dim, c_dim = y.shape
    allmods = _mmq(y.reshape(s_dim * r_dim, c_dim), stacked["modcat_w"],
                   stacked.get("modcat_w_s")) + stacked["modcat_b"][None]
    return allmods.astype(out_dtype).reshape(s_dim, r_dim, -1)
