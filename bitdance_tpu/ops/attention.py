"""Attention kernels.

One kernel family covers every attention pattern in the reference:

  - causal packed varlen (flash_attn_varlen_func, qwen3_packed_wrapper.py:71-90)
  - block-causal "parallel prediction" masks (flex_attention + create_sparse_mask,
    modeling/utils.py:22-62, qwen3_navit.py:87-95)
  - plain causal / non-causal (flash_attn_func call sites)
  - KV-cached block decode with an all-ones mask over valid keys
    (t2i_pipeline.py:206-216)

The mask model: every token carries two int32 ids,
    doc_id   — packed-sample isolation (document mask)
    block_id — non-decreasing "visibility block" index
and attention is allowed iff  doc_q == doc_k  AND  block_k <= block_q.

  * pure causal        -> block_id = position
  * parallel blocks    -> tokens in the same parallel window share a block_id
  * bidirectional      -> all tokens share one block_id
This reproduces flex-attention's (causal | parallel_block) & document mask
exactly (see tests/test_attention.py::test_mask_matches_reference_semantics).

The Pallas kernel is a standard online-softmax flash attention with GQA,
tiled (B, Hq, q_blocks, kv_blocks) with the kv axis as the sequential minor
grid dimension. fp32 accumulation; bf16-friendly tiles.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


# ---------------------------------------------------------------------------
# Mask building
# ---------------------------------------------------------------------------

def causal_ids(lengths_total: int) -> tuple[jax.Array, jax.Array]:
    """(block_ids, doc_ids) for a single plain-causal sequence of given length."""
    pos = jnp.arange(lengths_total, dtype=jnp.int32)
    return pos, jnp.zeros((lengths_total,), jnp.int32)


def packed_ids_from_segments(
    sample_lens: list[int],
    split_lens: list[int],
    attn_modes: list[str],
    parallel_num: int,
    parallel_causal_num: int = 2,
) -> tuple[jax.Array, jax.Array]:
    """Build (block_ids, doc_ids) for a packed sequence.

    Mirrors create_sparse_mask (modeling/utils.py:22-62): each sample is a
    document; each (split_len, mode) segment is either 'causal' (every token
    its own block) or 'parallel' (first `parallel_causal_num` tokens causal,
    then groups of `parallel_num` tokens share a block).

    Host-side (python ints) — used by the data pipeline, not inside jit.
    """
    import numpy as np

    total = sum(split_lens)
    assert total == sum(sample_lens), "split_lens must tile sample_lens"
    block_ids = np.zeros((total,), np.int32)
    nxt = 0
    off = 0
    for length, mode in zip(split_lens, attn_modes):
        if mode == "parallel":
            ncausal = min(parallel_causal_num, length)
            for i in range(ncausal):
                block_ids[off + i] = nxt
                nxt += 1
            rem = length - ncausal
            nwin = math.ceil(rem / parallel_num) if rem > 0 else 0
            for wi in range(nwin):
                s = off + ncausal + wi * parallel_num
                e = min(off + ncausal + (wi + 1) * parallel_num, off + length)
                block_ids[s:e] = nxt
                nxt += 1
        else:  # causal
            for i in range(length):
                block_ids[off + i] = nxt
                nxt += 1
        off += length

    doc_ids = np.concatenate(
        [np.full((l,), i, np.int32) for i, l in enumerate(sample_lens)]
    )
    return jnp.asarray(block_ids), jnp.asarray(doc_ids)


def mask_from_ids(
    q_block: jax.Array, q_doc: jax.Array, kv_block: jax.Array, kv_doc: jax.Array
) -> jax.Array:
    """Dense bool mask [Lq, Lk]: allowed iff same doc and kv block <= q block."""
    return (q_doc[:, None] == kv_doc[None, :]) & (kv_block[None, :] <= q_block[:, None])


# ---------------------------------------------------------------------------
# Reference (XLA) attention — correctness baseline & small-shape path
# ---------------------------------------------------------------------------

def attention_xla(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array | None = None,
    scale: float | None = None,
) -> jax.Array:
    """Plain attention with fp32 softmax.

    q: [B, Lq, Hq, D]; k/v: [B, Lk, Hkv, D]; mask: broadcastable to
    [B, Hq, Lq, Lk] (True = attend). GQA handled by head repetition.
    """
    b, lq, hq, d = q.shape
    _, lk, hkv, _ = k.shape
    assert hq % hkv == 0
    group = hq // hkv
    scale = scale if scale is not None else 1.0 / math.sqrt(d)

    qf = q.astype(jnp.float32) * scale
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    if group > 1:
        kf = jnp.repeat(kf, group, axis=2)
        vf = jnp.repeat(vf, group, axis=2)

    s = jnp.einsum("bqhd,bkhd->bhqk", qf, kf)
    if mask is not None:
        s = jnp.where(mask, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = jnp.where(l > 0, p / jnp.maximum(l, 1e-30), 0.0)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, vf)
    return o.astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas flash attention
# ---------------------------------------------------------------------------

def _flash_kernel(
    qb_ref, qd_ref, kb_ref, kd_ref,  # id refs: [1, block_q] / [1, block_k]
    q_ref, k_ref, v_ref,             # [1, 1, block, D]
    o_ref, lse_ref,
    m_scr, l_scr, acc_scr,
    *, scale: float, num_kv_blocks: int,
):
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    qb = qb_ref[0, 0, :]
    qd = qd_ref[0, 0, :]
    kb = kb_ref[0, 0, :]
    kd = kd_ref[0, 0, :]

    # Conservative tile skip: with allowed = (doc_q == doc_k) & (kb <= qb),
    # a tile is provably all-masked when every kv block id exceeds every q
    # block id, or the doc-id ranges are disjoint. Sound for arbitrary id
    # values (ranges only get conservative when unsorted), and it prunes
    # ~half the tiles for causal masks and most cross-document tiles for
    # packed training batches.
    q_blk_max = jnp.max(qb)
    kv_blk_min = jnp.min(kb)
    doc_disjoint = (jnp.min(kd) > jnp.max(qd)) | (jnp.max(kd) < jnp.min(qd))
    live = (kv_blk_min <= q_blk_max) & jnp.logical_not(doc_disjoint)

    @pl.when(live)
    def _compute():
        q = q_ref[0, 0, :, :].astype(jnp.float32) * scale
        k = k_ref[0, 0, :, :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [block_q, block_k]

        mask = (qd[:, None] == kd[None, :]) & (kb[None, :] <= qb[:, None])
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        # mask again post-exp: a fully-masked row has s == m_new == NEG_INF
        # and would otherwise produce exp(0) == 1 for every masked entry
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        corr = jnp.exp(m_prev - m_new)
        l_scr[:] = l_scr[:] * corr + jnp.sum(p, axis=-1, keepdims=True)
        v = v_ref[0, 0, :, :].astype(jnp.float32)
        pv = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        acc_scr[:] = acc_scr[:] * corr + pv
        m_scr[:] = m_new

    @pl.when(j == num_kv_blocks - 1)
    def _finalize():
        l = l_scr[:]
        safe = jnp.where(l > 0, l, 1.0)
        o_ref[0, 0, :, :] = (acc_scr[:] / safe * (l > 0)).astype(o_ref.dtype)
        # log-sum-exp residual for the backward pass; +1e30 on fully-masked
        # rows so exp(s - lse) underflows to 0 there
        lse_ref[0, 0, :, :] = jnp.where(
            l > 0, m_scr[:] + jnp.log(safe), 1e30)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    q_block_ids: jax.Array,
    q_doc_ids: jax.Array,
    kv_block_ids: jax.Array,
    kv_doc_ids: jax.Array,
    scale: float | None = None,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Flash attention over the (block_id, doc_id) mask model.

    q: [B, Lq, Hq, D]; k/v: [B, Lk, Hkv, D]; ids: [B, Lq] / [B, Lk] int32.
    Sequences are padded internally to tile multiples; padded kv keys get
    doc_id -2 (never matches), padded q rows doc_id -3 with zero output.
    """
    b, lq, hq, d = q.shape
    _, lk, hkv, _ = k.shape
    assert hq % hkv == 0
    group = hq // hkv
    scale = scale if scale is not None else 1.0 / math.sqrt(d)

    block_q = min(block_q, max(_round_up(lq, 128), 128))
    block_k = min(block_k, max(_round_up(lk, 128), 128))
    lq_p = _round_up(lq, block_q)
    lk_p = _round_up(lk, block_k)

    qp = _pad_axis(q, 1, lq_p)
    kp = _pad_axis(k, 1, lk_p)
    vp = _pad_axis(v, 1, lk_p)
    qb = _pad_axis(q_block_ids.astype(jnp.int32), 1, lq_p, 0)
    qd = _pad_axis(q_doc_ids.astype(jnp.int32), 1, lq_p, -3)
    kb = _pad_axis(kv_block_ids.astype(jnp.int32), 1, lk_p, 0)
    kd = _pad_axis(kv_doc_ids.astype(jnp.int32), 1, lk_p, -2)

    # [B, L, H, D] -> [B, H, L, D] for head-major tiling
    qp = jnp.transpose(qp, (0, 2, 1, 3))
    kp = jnp.transpose(kp, (0, 2, 1, 3))
    vp = jnp.transpose(vp, (0, 2, 1, 3))

    out = _flash_core(scale, block_q, block_k, interpret,
                      qp, kp, vp, qb, qd, kb, kd)
    out = jnp.transpose(out, (0, 2, 1, 3))[:, :lq]
    return out


def _flash_forward_padded(qp, kp, vp, qb, qd, kb, kd,
                          scale, block_q, block_k, interpret):
    """Padded head-major forward: returns (o [B,Hq,Lqp,D], lse [B,Hq,Lqp,1])."""
    b, hq, lq_p, d = qp.shape
    _, hkv, lk_p, _ = kp.shape
    group = hq // hkv
    n_q = lq_p // block_q
    n_k = lk_p // block_k
    grid = (b, hq, n_q, n_k)

    kernel = functools.partial(
        _flash_kernel, scale=scale, num_kv_blocks=n_k
    )
    # ids ride as [B, 1, L] so the (1, 1, block) BlockSpec satisfies
    # Mosaic's tiling rule for B > 1 (block dim must divide 8/128 or equal
    # the array dim — the middle 1 equals 1)
    qb, qd = qb[:, None, :], qd[:, None, :]
    kb, kd = kb[:, None, :], kd[:, None, :]
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q), lambda bi, h, i, j: (bi, 0, i)),
            pl.BlockSpec((1, 1, block_q), lambda bi, h, i, j: (bi, 0, i)),
            pl.BlockSpec((1, 1, block_k), lambda bi, h, i, j: (bi, 0, j)),
            pl.BlockSpec((1, 1, block_k), lambda bi, h, i, j: (bi, 0, j)),
            pl.BlockSpec((1, 1, block_q, d), lambda bi, h, i, j: (bi, h, i, 0)),
            pl.BlockSpec(
                (1, 1, block_k, d),
                lambda bi, h, i, j, g=group: (bi, h // g, j, 0),
            ),
            pl.BlockSpec(
                (1, 1, block_k, d),
                lambda bi, h, i, j, g=group: (bi, h // g, j, 0),
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, h, i, j: (bi, h, i, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda bi, h, i, j: (bi, h, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, lq_p, d), qp.dtype),
            jax.ShapeDtypeStruct((b, hq, lq_p, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * lq_p * lk_p * d,
            bytes_accessed=(b * hq * lq_p * d + 2 * b * hkv * lk_p * d) * qp.dtype.itemsize,
            transcendentals=b * hq * lq_p * lk_p,
        ),
        interpret=interpret,
    )(qb, qd, kb, kd, qp, kp, vp)
    return out, lse


# ---------------------------------------------------------------------------
# Backward pass (training-grade): Pallas dq and dk/dv kernels + custom VJP
# ---------------------------------------------------------------------------

def _bwd_tile_live(qb, qd, kb, kd):
    """Same conservative tile-skip test as the forward kernel."""
    doc_disjoint = (jnp.min(kd) > jnp.max(qd)) | (jnp.max(kd) < jnp.min(qd))
    return (jnp.min(kb) <= jnp.max(qb)) & jnp.logical_not(doc_disjoint)


def _flash_bwd_dq_kernel(
    qb_ref, qd_ref, kb_ref, kd_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dq_ref,
    dq_scr,
    *, scale: float, num_kv_blocks: int,
):
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    qb = qb_ref[0, 0, :]
    qd = qd_ref[0, 0, :]
    kb = kb_ref[0, 0, :]
    kd = kd_ref[0, 0, :]

    @pl.when(_bwd_tile_live(qb, qd, kb, kd))
    def _compute():
        q = q_ref[0, 0, :, :].astype(jnp.float32)
        k = k_ref[0, 0, :, :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q * scale, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        mask = (qd[:, None] == kd[None, :]) & (kb[None, :] <= qb[:, None])
        # p recomputed from the saved log-sum-exp (no online max needed)
        p = jnp.where(mask, jnp.exp(s - lse_ref[0, 0, :, :]), 0.0)
        do = do_ref[0, 0, :, :].astype(jnp.float32)
        v = v_ref[0, 0, :, :].astype(jnp.float32)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p * (dp - delta_ref[0, 0, :, :])
        dq_scr[:] += jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(j == num_kv_blocks - 1)
    def _finalize():
        dq_ref[0, 0, :, :] = (dq_scr[:] * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    qb_ref, qd_ref, kb_ref, kd_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref,
    dk_scr, dv_scr,
    *, scale: float, num_q_blocks: int,
):
    i = pl.program_id(3)     # sequential q axis; kv tile fixed per grid row

    @pl.when(i == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    qb = qb_ref[0, 0, :]
    qd = qd_ref[0, 0, :]
    kb = kb_ref[0, 0, :]
    kd = kd_ref[0, 0, :]

    @pl.when(_bwd_tile_live(qb, qd, kb, kd))
    def _compute():
        qs = q_ref[0, 0, :, :].astype(jnp.float32) * scale
        k = k_ref[0, 0, :, :].astype(jnp.float32)
        s = jax.lax.dot_general(
            qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        mask = (qd[:, None] == kd[None, :]) & (kb[None, :] <= qb[:, None])
        p = jnp.where(mask, jnp.exp(s - lse_ref[0, 0, :, :]), 0.0)
        do = do_ref[0, 0, :, :].astype(jnp.float32)
        v = v_ref[0, 0, :, :].astype(jnp.float32)
        dv_scr[:] += jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p * (dp - delta_ref[0, 0, :, :])
        # dk = scale * ds^T @ q — the scale already rides in qs
        dk_scr[:] += jax.lax.dot_general(
            ds, qs, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(i == num_q_blocks - 1)
    def _finalize():
        dk_ref[0, 0, :, :] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0, :, :] = dv_scr[:].astype(dv_ref.dtype)


def _flash_backward_padded(qp, kp, vp, qb, qd, kb, kd, o, lse, do,
                           scale, block_q, block_k, interpret):
    """dq/dk/dv in the padded head-major layout. dk/dv are computed per
    Q-head and group-summed outside (GQA), trading a [B,Hq,Lk,D] f32
    temporary for a simple revisit-free grid."""
    b, hq, lq_p, d = qp.shape
    _, hkv, lk_p, _ = kp.shape
    group = hq // hkv
    n_q = lq_p // block_q
    n_k = lk_p // block_k

    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1, keepdims=True)          # [B, Hq, Lqp, 1]
    qb, qd = qb[:, None, :], qd[:, None, :]
    kb, kd = kb[:, None, :], kd[:, None, :]

    id_specs = lambda qi, ki: [
        pl.BlockSpec((1, 1, block_q), lambda bi, h, i, j: (bi, 0, qi(i, j))),
        pl.BlockSpec((1, 1, block_q), lambda bi, h, i, j: (bi, 0, qi(i, j))),
        pl.BlockSpec((1, 1, block_k), lambda bi, h, i, j: (bi, 0, ki(i, j))),
        pl.BlockSpec((1, 1, block_k), lambda bi, h, i, j: (bi, 0, ki(i, j))),
    ]

    def tensor_specs(qi, ki):
        qspec = lambda w: pl.BlockSpec(
            (1, 1, block_q, w), lambda bi, h, i, j: (bi, h, qi(i, j), 0))
        kvspec = pl.BlockSpec(
            (1, 1, block_k, d),
            lambda bi, h, i, j, g=group: (bi, h // g, ki(i, j), 0))
        return [qspec(d), kvspec, kvspec, qspec(d), qspec(1), qspec(1)]

    # dq: grid (b, hq, n_q, n_k), kv sequential
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale,
                          num_kv_blocks=n_k),
        grid=(b, hq, n_q, n_k),
        in_specs=id_specs(lambda i, j: i, lambda i, j: j)
        + tensor_specs(lambda i, j: i, lambda i, j: j),
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda bi, h, i, j: (bi, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hq, lq_p, d), qp.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(qb, qd, kb, kd, qp, kp, vp, do, lse, delta)

    # dk/dv: grid (b, hq, n_k, n_q), q sequential (axis named i in kernel)
    dk_h, dv_h = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale,
                          num_q_blocks=n_q),
        grid=(b, hq, n_k, n_q),
        in_specs=id_specs(lambda j, i: i, lambda j, i: j)
        + tensor_specs(lambda j, i: i, lambda j, i: j),
        out_specs=[
            pl.BlockSpec((1, 1, block_k, d), lambda bi, h, j, i: (bi, h, j, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, h, j, i: (bi, h, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, lk_p, d), jnp.float32),
            jax.ShapeDtypeStruct((b, hq, lk_p, d), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32),
                        pltpu.VMEM((block_k, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(qb, qd, kb, kd, qp, kp, vp, do, lse, delta)

    dk = dk_h.reshape(b, hkv, group, lk_p, d).sum(axis=2).astype(kp.dtype)
    dv = dv_h.reshape(b, hkv, group, lk_p, d).sum(axis=2).astype(vp.dtype)
    return dq, dk, dv


def _float0_like(x):
    import numpy as _np

    return _np.zeros(x.shape, jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _flash_core(scale, block_q, block_k, interpret,
                qp, kp, vp, qb, qd, kb, kd):
    """Differentiable padded head-major flash attention core.

    The reference trains through flash-attn's CUDA backward
    (qwen3_packed_wrapper.py:78-90, imagenet layers.py:161-167); this is
    the TPU equivalent — forward saves per-row log-sum-exp, backward
    recomputes tile probabilities and accumulates dq (kv-sequential grid)
    and dk/dv (q-sequential grid) in VMEM scratch.
    """
    o, _ = _flash_forward_padded(qp, kp, vp, qb, qd, kb, kd,
                                 scale, block_q, block_k, interpret)
    return o


def _flash_core_fwd(scale, block_q, block_k, interpret,
                    qp, kp, vp, qb, qd, kb, kd):
    o, lse = _flash_forward_padded(qp, kp, vp, qb, qd, kb, kd,
                                   scale, block_q, block_k, interpret)
    return o, (qp, kp, vp, qb, qd, kb, kd, o, lse)


def _flash_core_bwd(scale, block_q, block_k, interpret, res, do):
    qp, kp, vp, qb, qd, kb, kd, o, lse = res
    dq, dk, dv = _flash_backward_padded(
        qp, kp, vp, qb, qd, kb, kd, o, lse, do,
        scale, block_q, block_k, interpret)
    return (dq, dk, dv,
            _float0_like(qb), _float0_like(qd),
            _float0_like(kb), _float0_like(kd))


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


# ---------------------------------------------------------------------------
# Sparse-iteration (splash-style) flash attention
# ---------------------------------------------------------------------------

def _flash_kernel_sparse(
    map_ref, cnt_ref,                # scalar-prefetch: [B,n_q,S], [B,n_q]
    qb_ref, qd_ref, kb_ref, kd_ref,
    q_ref, k_ref, v_ref,
    o_ref, lse_ref,
    m_scr, l_scr, acc_scr,
    *, scale: float, max_live_kv: int,
):
    """GQA-folded: the `group` q heads sharing one kv head ride as extra
    ROWS of the q tile ([group*block_q, d]), so the grid iterates kv heads
    (hkv), not q heads — group-x fewer grid steps and kv DMAs, and a
    group-x taller M per MXU dot. Valid because the mask depends only on
    token positions, never on the head."""
    bi = pl.program_id(0)
    i = pl.program_id(2)
    j = pl.program_id(3)
    group, block_q, d = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    gbq = group * block_q

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    live = j < cnt_ref[bi, i]

    @pl.when(live)
    def _compute():
        qb = qb_ref[0, 0, :]
        qd = qd_ref[0, 0, :]
        kb = kb_ref[0, 0, :]
        kd = kd_ref[0, 0, :]
        q = q_ref[0].reshape(gbq, d).astype(jnp.float32) * scale
        k = k_ref[0, 0, :, :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

        mask = (qd[:, None] == kd[None, :]) & (kb[None, :] <= qb[:, None])
        mask = jnp.broadcast_to(mask[None], (group,) + mask.shape).reshape(
            gbq, -1)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        corr = jnp.exp(m_prev - m_new)
        l_scr[:] = l_scr[:] * corr + jnp.sum(p, axis=-1, keepdims=True)
        v = v_ref[0, 0, :, :].astype(jnp.float32)
        pv = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        acc_scr[:] = acc_scr[:] * corr + pv
        m_scr[:] = m_new

    @pl.when(j == max_live_kv - 1)
    def _finalize():
        l = l_scr[:]
        safe = jnp.where(l > 0, l, 1.0)
        o_ref[0] = (acc_scr[:] / safe * (l > 0)).astype(o_ref.dtype).reshape(
            group, block_q, d)
        lse_ref[0] = jnp.where(
            l > 0, m_scr[:] + jnp.log(safe), 1e30).reshape(group, block_q, 1)


def tile_live_matrix(
    q_block_ids: jax.Array, q_doc_ids: jax.Array,
    kv_block_ids: jax.Array, kv_doc_ids: jax.Array,
    block_q: int, block_k: int,
) -> jax.Array:
    """[B, n_q, n_k] bool: tile (i, j) is live unless provably fully masked
    (min kv block id > max q block id, or disjoint doc-id ranges)."""
    b, lq = q_block_ids.shape
    lk = kv_block_ids.shape[1]
    n_q, n_k = lq // block_q, lk // block_k
    qb = q_block_ids.reshape(b, n_q, block_q)
    qd = q_doc_ids.reshape(b, n_q, block_q)
    kb = kv_block_ids.reshape(b, n_k, block_k)
    kd = kv_doc_ids.reshape(b, n_k, block_k)

    q_blk_max = jnp.max(qb, -1)                       # [B, n_q]
    kv_blk_min = jnp.min(kb, -1)                      # [B, n_k]
    q_doc_min, q_doc_max = jnp.min(qd, -1), jnp.max(qd, -1)
    k_doc_min, k_doc_max = jnp.min(kd, -1), jnp.max(kd, -1)

    blk_live = kv_blk_min[:, None, :] <= q_blk_max[:, :, None]
    doc_live = ~((k_doc_min[:, None, :] > q_doc_max[:, :, None])
                 | (k_doc_max[:, None, :] < q_doc_min[:, :, None]))
    return blk_live & doc_live                        # [B, n_q, n_k]


def select_live_tiles(live: jax.Array, max_n: int):
    """live [B, R, C] bool -> (tile_map [B, R, max_n], counts [B, R]): per
    row, the live column indices in ascending order; trailing entries
    repeat the last live index so revolving-buffer DMAs are no-ops for
    skipped grid steps. Counts are clamped to max_n (undersizing DROPS
    tiles — size max_n from a hard data guarantee)."""
    counts = jnp.sum(live, axis=-1).astype(jnp.int32)
    # stable argsort of ~live puts live tile indices first, ascending
    order = jnp.argsort(~live, axis=-1, stable=True).astype(jnp.int32)
    sel = order[..., :max_n]
    last = jnp.take_along_axis(
        sel, jnp.maximum(counts - 1, 0)[..., None].astype(jnp.int32), axis=-1)
    pos = jnp.arange(max_n, dtype=jnp.int32)
    tile_map = jnp.where(pos[None, None] < counts[..., None], sel, last)
    return tile_map, jnp.minimum(counts, max_n)


def kv_tile_map(
    q_block_ids: jax.Array, q_doc_ids: jax.Array,
    kv_block_ids: jax.Array, kv_doc_ids: jax.Array,
    block_q: int, block_k: int, max_live_kv: int,
) -> tuple[jax.Array, jax.Array]:
    """Per-(batch, q-tile) list of LIVE kv tiles, in ascending order.

    Traced (cheap min/max reductions) — only max_live_kv must be static.
    """
    live = tile_live_matrix(q_block_ids, q_doc_ids, kv_block_ids, kv_doc_ids,
                            block_q, block_k)
    return select_live_tiles(live, max_live_kv)


def flash_attention_sparse(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    q_block_ids: jax.Array,
    q_doc_ids: jax.Array,
    kv_block_ids: jax.Array,
    kv_doc_ids: jax.Array,
    max_live_kv: int,
    scale: float | None = None,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Splash-style flash attention: dead kv tiles are skipped at the GRID
    level via a scalar-prefetched per-q-tile kv-tile list, so their k/v
    blocks are never DMA'd from HBM (the dense kernel only skips FLOPs).

    max_live_kv bounds live tiles per q tile and must be static; size it
    from the packing budget (≈ ceil(max_document_tokens / block_k) + 1).
    If a row exceeds it, EXTRA TILES WOULD BE DROPPED — kv_tile_map counts
    are clamped, so pick the bound from a hard data-side guarantee. For
    packed training with docs ≤ 4k tokens in a 33k sequence this cuts kv
    traffic ~8x (bitdance_14b_64x.yaml:45-47 budget).
    """
    b, lq, hq, d = q.shape
    _, lk, hkv, _ = k.shape
    assert hq % hkv == 0
    group = hq // hkv
    scale = scale if scale is not None else 1.0 / math.sqrt(d)

    block_q = min(block_q, max(_round_up(lq, 128), 128))
    block_k = min(block_k, max(_round_up(lk, 128), 128))
    lq_p = _round_up(lq, block_q)
    lk_p = _round_up(lk, block_k)
    n_q, n_k = lq_p // block_q, lk_p // block_k
    max_live_kv = min(max_live_kv, n_k)

    qp = jnp.transpose(_pad_axis(q, 1, lq_p), (0, 2, 1, 3))
    kp = jnp.transpose(_pad_axis(k, 1, lk_p), (0, 2, 1, 3))
    vp = jnp.transpose(_pad_axis(v, 1, lk_p), (0, 2, 1, 3))
    qb = _pad_axis(q_block_ids.astype(jnp.int32), 1, lq_p, 0)
    qd = _pad_axis(q_doc_ids.astype(jnp.int32), 1, lq_p, -3)
    kb = _pad_axis(kv_block_ids.astype(jnp.int32), 1, lk_p, 0)
    kd = _pad_axis(kv_doc_ids.astype(jnp.int32), 1, lk_p, -2)

    out = _flash_sparse_core(scale, block_q, block_k, max_live_kv, interpret,
                             qp, kp, vp, qb, qd, kb, kd)
    return jnp.transpose(out, (0, 2, 1, 3))[:, :lq]


def _flash_sparse_forward_padded(qp, kp, vp, qb, qd, kb, kd,
                                 scale, block_q, block_k, max_live_kv,
                                 interpret):
    b, hq, lq_p, d = qp.shape
    _, hkv, lk_p, _ = kp.shape
    group = hq // hkv
    n_q, n_k = lq_p // block_q, lk_p // block_k

    tile_map, counts = kv_tile_map(qb, qd, kb, kd, block_q, block_k,
                                   max_live_kv)
    qb, qd = qb[:, None, :], qd[:, None, :]
    kb, kd = kb[:, None, :], kd[:, None, :]

    kernel = functools.partial(_flash_kernel_sparse, scale=scale,
                               max_live_kv=max_live_kv)
    # GQA-folded grid: kv heads, with the group dim as q-tile block rows
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, hkv, n_q, max_live_kv),
        in_specs=[
            pl.BlockSpec((1, 1, block_q),
                         lambda bi, h, i, j, mp, ct: (bi, 0, i)),
            pl.BlockSpec((1, 1, block_q),
                         lambda bi, h, i, j, mp, ct: (bi, 0, i)),
            pl.BlockSpec((1, 1, block_k),
                         lambda bi, h, i, j, mp, ct: (bi, 0, mp[bi, i, j])),
            pl.BlockSpec((1, 1, block_k),
                         lambda bi, h, i, j, mp, ct: (bi, 0, mp[bi, i, j])),
            pl.BlockSpec((1, group, block_q, d),
                         lambda bi, h, i, j, mp, ct: (bi, h, i, 0)),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda bi, h, i, j, mp, ct: (bi, h, mp[bi, i, j], 0)),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda bi, h, i, j, mp, ct: (bi, h, mp[bi, i, j], 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, group, block_q, d),
                         lambda bi, h, i, j, mp, ct: (bi, h, i, 0)),
            pl.BlockSpec((1, group, block_q, 1),
                         lambda bi, h, i, j, mp, ct: (bi, h, i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((group * block_q, 1), jnp.float32),
            pltpu.VMEM((group * block_q, 1), jnp.float32),
            pltpu.VMEM((group * block_q, d), jnp.float32),
        ],
    )
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, lq_p, d), qp.dtype),
            jax.ShapeDtypeStruct((b, hq, lq_p, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(tile_map, counts, qb, qd, kb, kd, qp, kp, vp)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _flash_sparse_core(scale, block_q, block_k, max_live_kv, interpret,
                       qp, kp, vp, qb, qd, kb, kd):
    """Differentiable sparse-iteration core. Backward reuses the DENSE
    grid kernels (tile skip prunes dead-tile FLOPs; only their k/v DMA is
    paid) — correct because skipped tiles are provably fully masked, so
    their recomputed p is exactly 0."""
    o, _ = _flash_sparse_forward_padded(
        qp, kp, vp, qb, qd, kb, kd,
        scale, block_q, block_k, max_live_kv, interpret)
    return o


def _flash_sparse_core_fwd(scale, block_q, block_k, max_live_kv, interpret,
                           qp, kp, vp, qb, qd, kb, kd):
    o, lse = _flash_sparse_forward_padded(
        qp, kp, vp, qb, qd, kb, kd,
        scale, block_q, block_k, max_live_kv, interpret)
    return o, (qp, kp, vp, qb, qd, kb, kd, o, lse)


def _flash_bwd_dq_kernel_sparse(
    map_ref, cnt_ref,
    qb_ref, qd_ref, kb_ref, kd_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dq_ref,
    dq_scr,
    *, scale: float, max_live_kv: int,
):
    """GQA-folded like _flash_kernel_sparse: grid iterates kv heads; the
    group q heads are rows of the q/do/lse/delta tiles."""
    bi = pl.program_id(0)
    i = pl.program_id(2)
    j = pl.program_id(3)
    group, block_q, d = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    gbq = group * block_q

    @pl.when(j == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    @pl.when(j < cnt_ref[bi, i])
    def _compute():
        qb = qb_ref[0, 0, :]
        qd = qd_ref[0, 0, :]
        kb = kb_ref[0, 0, :]
        kd = kd_ref[0, 0, :]
        q = q_ref[0].reshape(gbq, d).astype(jnp.float32)
        k = k_ref[0, 0, :, :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q * scale, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        mask = (qd[:, None] == kd[None, :]) & (kb[None, :] <= qb[:, None])
        mask = jnp.broadcast_to(mask[None], (group,) + mask.shape).reshape(
            gbq, -1)
        lse = lse_ref[0].reshape(gbq, 1)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        do = do_ref[0].reshape(gbq, d).astype(jnp.float32)
        v = v_ref[0, 0, :, :].astype(jnp.float32)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p * (dp - delta_ref[0].reshape(gbq, 1))
        dq_scr[:] += jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(j == max_live_kv - 1)
    def _finalize():
        dq_ref[0] = (dq_scr[:] * scale).astype(dq_ref.dtype).reshape(
            group, block_q, d)


def _flash_bwd_dkv_kernel_sparse(
    qmap_ref, qcnt_ref,
    qb_ref, qd_ref, kb_ref, kd_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref,
    dk_scr, dv_scr,
    *, scale: float, max_live_q: int,
):
    """GQA-folded: p^T@do / ds^T@q over the folded [group*block_q] rows sum
    the group q heads' contributions in-kernel, so dk/dv come out per KV
    head directly (no [b, hq, lk, d] f32 materialize + sum pass)."""
    bi = pl.program_id(0)
    jk = pl.program_id(2)
    i = pl.program_id(3)
    group, block_q, d = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    gbq = group * block_q

    @pl.when(i == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    @pl.when(i < qcnt_ref[bi, jk])
    def _compute():
        qb = qb_ref[0, 0, :]
        qd = qd_ref[0, 0, :]
        kb = kb_ref[0, 0, :]
        kd = kd_ref[0, 0, :]
        qs = q_ref[0].reshape(gbq, d).astype(jnp.float32) * scale
        k = k_ref[0, 0, :, :].astype(jnp.float32)
        s = jax.lax.dot_general(
            qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        mask = (qd[:, None] == kd[None, :]) & (kb[None, :] <= qb[:, None])
        mask = jnp.broadcast_to(mask[None], (group,) + mask.shape).reshape(
            gbq, -1)
        p = jnp.where(mask, jnp.exp(s - lse_ref[0].reshape(gbq, 1)), 0.0)
        do = do_ref[0].reshape(gbq, d).astype(jnp.float32)
        v = v_ref[0, 0, :, :].astype(jnp.float32)
        dv_scr[:] += jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p * (dp - delta_ref[0].reshape(gbq, 1))
        dk_scr[:] += jax.lax.dot_general(
            ds, qs, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(i == max_live_q - 1)
    def _finalize():
        dk_ref[0, 0, :, :] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0, :, :] = dv_scr[:].astype(dv_ref.dtype)


def _flash_sparse_backward_padded(qp, kp, vp, qb, qd, kb, kd, o, lse, do,
                                  scale, block_q, block_k, max_live_kv,
                                  interpret):
    """Sparse-iteration backward: dq via the forward's per-q-tile kv list,
    dk/dv via the TRANSPOSED per-kv-tile q list, so cross-document dead
    tiles are never DMA'd in the backward either.

    max_live_q derives from the same data guarantee as max_live_kv: a kv
    tile's live q range spans at most its own block_k tokens plus the
    longest document, i.e. max_live_kv * block_k / block_q + 1 q tiles.
    """
    b, hq, lq_p, d = qp.shape
    _, hkv, lk_p, _ = kp.shape
    group = hq // hkv
    n_q = lq_p // block_q
    n_k = lk_p // block_k
    max_live_q = min(n_q, max_live_kv * block_k // block_q + 1)

    live = tile_live_matrix(qb, qd, kb, kd, block_q, block_k)
    tile_map, counts = select_live_tiles(live, max_live_kv)
    qtile_map, qcounts = select_live_tiles(
        jnp.swapaxes(live, 1, 2), max_live_q)

    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1, keepdims=True)
    qb, qd = qb[:, None, :], qd[:, None, :]
    kb, kd = kb[:, None, :], kd[:, None, :]

    # dq: grid (b, hkv, n_q, max_live_kv), GQA-folded; kv tile from the map
    dq_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, hkv, n_q, max_live_kv),
        in_specs=[
            pl.BlockSpec((1, 1, block_q),
                         lambda bi, h, i, j, mp, ct: (bi, 0, i)),
            pl.BlockSpec((1, 1, block_q),
                         lambda bi, h, i, j, mp, ct: (bi, 0, i)),
            pl.BlockSpec((1, 1, block_k),
                         lambda bi, h, i, j, mp, ct: (bi, 0, mp[bi, i, j])),
            pl.BlockSpec((1, 1, block_k),
                         lambda bi, h, i, j, mp, ct: (bi, 0, mp[bi, i, j])),
            pl.BlockSpec((1, group, block_q, d),
                         lambda bi, h, i, j, mp, ct: (bi, h, i, 0)),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda bi, h, i, j, mp, ct: (bi, h, mp[bi, i, j], 0)),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda bi, h, i, j, mp, ct: (bi, h, mp[bi, i, j], 0)),
            pl.BlockSpec((1, group, block_q, d),
                         lambda bi, h, i, j, mp, ct: (bi, h, i, 0)),
            pl.BlockSpec((1, group, block_q, 1),
                         lambda bi, h, i, j, mp, ct: (bi, h, i, 0)),
            pl.BlockSpec((1, group, block_q, 1),
                         lambda bi, h, i, j, mp, ct: (bi, h, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, group, block_q, d),
                               lambda bi, h, i, j, mp, ct: (bi, h, i, 0)),
        scratch_shapes=[pltpu.VMEM((group * block_q, d), jnp.float32)],
    )
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel_sparse, scale=scale,
                          max_live_kv=max_live_kv),
        grid_spec=dq_grid,
        out_shape=jax.ShapeDtypeStruct((b, hq, lq_p, d), qp.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(tile_map, counts, qb, qd, kb, kd, qp, kp, vp, do, lse, delta)

    # dk/dv: grid (b, hkv, n_k, max_live_q), GQA-folded (the group sum
    # happens inside the kernel's transposed dots); q tile from the
    # transposed map
    dkv_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, hkv, n_k, max_live_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q),
                         lambda bi, h, jk, i, mp, ct: (bi, 0, mp[bi, jk, i])),
            pl.BlockSpec((1, 1, block_q),
                         lambda bi, h, jk, i, mp, ct: (bi, 0, mp[bi, jk, i])),
            pl.BlockSpec((1, 1, block_k),
                         lambda bi, h, jk, i, mp, ct: (bi, 0, jk)),
            pl.BlockSpec((1, 1, block_k),
                         lambda bi, h, jk, i, mp, ct: (bi, 0, jk)),
            pl.BlockSpec((1, group, block_q, d),
                         lambda bi, h, jk, i, mp, ct: (bi, h, mp[bi, jk, i], 0)),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda bi, h, jk, i, mp, ct: (bi, h, jk, 0)),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda bi, h, jk, i, mp, ct: (bi, h, jk, 0)),
            pl.BlockSpec((1, group, block_q, d),
                         lambda bi, h, jk, i, mp, ct: (bi, h, mp[bi, jk, i], 0)),
            pl.BlockSpec((1, group, block_q, 1),
                         lambda bi, h, jk, i, mp, ct: (bi, h, mp[bi, jk, i], 0)),
            pl.BlockSpec((1, group, block_q, 1),
                         lambda bi, h, jk, i, mp, ct: (bi, h, mp[bi, jk, i], 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_k, d),
                         lambda bi, h, jk, i, mp, ct: (bi, h, jk, 0)),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda bi, h, jk, i, mp, ct: (bi, h, jk, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32),
                        pltpu.VMEM((block_k, d), jnp.float32)],
    )
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel_sparse, scale=scale,
                          max_live_q=max_live_q),
        grid_spec=dkv_grid,
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv, lk_p, d), kp.dtype),
            jax.ShapeDtypeStruct((b, hkv, lk_p, d), vp.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(qtile_map, qcounts, qb, qd, kb, kd, qp, kp, vp, do, lse, delta)
    return dq, dk, dv


def _flash_sparse_core_bwd(scale, block_q, block_k, max_live_kv, interpret,
                           res, do):
    qp, kp, vp, qb, qd, kb, kd, o, lse = res
    dq, dk, dv = _flash_sparse_backward_padded(
        qp, kp, vp, qb, qd, kb, kd, o, lse, do,
        scale, block_q, block_k, max_live_kv, interpret)
    return (dq, dk, dv,
            _float0_like(qb), _float0_like(qd),
            _float0_like(kb), _float0_like(kd))


_flash_sparse_core.defvjp(_flash_sparse_core_fwd, _flash_sparse_core_bwd)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_axis(x: jax.Array, axis: int, target: int, value=0) -> jax.Array:
    pad = target - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


# ---------------------------------------------------------------------------
# Dispatching front-end
# ---------------------------------------------------------------------------

def masked_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    q_block_ids: jax.Array,
    q_doc_ids: jax.Array,
    kv_block_ids: jax.Array,
    kv_doc_ids: jax.Array,
    scale: float | None = None,
    implementation: str = "auto",
    interpret: bool = False,
    max_live_kv: int | None = None,
) -> jax.Array:
    """Attention under the (block, doc) mask model; picks pallas or XLA.

    max_live_kv (static) switches the pallas path to splash-style sparse
    iteration — dead kv tiles are never DMA'd. Size it from a hard data
    guarantee (longest packed document); undersizing DROPS attention.
    The XLA path materializes the dense mask — only for small shapes/tests.
    """
    if implementation == "auto":
        on_tpu = jax.default_backend() == "tpu"
        big = q.shape[1] * k.shape[1] > 256 * 256
        implementation = "pallas" if (on_tpu and big) else "xla"
    if implementation == "pallas":
        if max_live_kv is not None:
            return flash_attention_sparse(
                q, k, v, q_block_ids, q_doc_ids, kv_block_ids, kv_doc_ids,
                max_live_kv, scale=scale, interpret=interpret,
            )
        return flash_attention(
            q, k, v, q_block_ids, q_doc_ids, kv_block_ids, kv_doc_ids,
            scale=scale, interpret=interpret,
        )
    mask = jax.vmap(mask_from_ids)(q_block_ids, q_doc_ids, kv_block_ids, kv_doc_ids)
    return attention_xla(q, k, v, mask[:, None], scale=scale)


def decode_attention_xla(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    kv_valid_len: jax.Array,
    scale: float | None = None,
) -> jax.Array:
    """KV-cached block decode: q attends to all cache positions < kv_valid_len.

    Matches the reference's all-ones decode mask (t2i_pipeline.py:206-216) —
    the freshly appended block is bidirectional, earlier context is fully
    visible. q: [B, Lq, Hq, D]; caches: [B, max_len, Hkv, D];
    kv_valid_len: [B] int32 (count of valid cache entries, incl. the block).
    """
    b, max_len = k_cache.shape[0], k_cache.shape[1]
    pos = jnp.arange(max_len, dtype=jnp.int32)
    mask = pos[None, :] < kv_valid_len[:, None]  # [B, max_len]
    return attention_xla(q, k_cache, v_cache, mask[:, None, None, :], scale=scale)
