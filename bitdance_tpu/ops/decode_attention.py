"""Pallas decode attention: a query block against a long KV cache.

The T2I decode hot loop (t2i_pipeline.py:241-268) attends a 16/64-token
query block to every valid cache position, per layer, per AR step. The XLA
path materializes [B, Hq, S, L] fp32 scores in HBM; this kernel streams the
cache through VMEM with online softmax instead — the classic flash-decode
shape (small S, long L), with GQA and per-row valid windows
([kv_start, kv_len) masks for left-padded batched CFG streams).

Grid: (B, Hq, num_kv_blocks) with the kv axis sequential; q block fits VMEM
whole. fp32 accumulation, bf16-friendly tiles.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _decode_kernel(
    kv_len_ref, kv_start_ref,           # SMEM scalars per batch row
    q_ref, k_ref, v_ref,                # VMEM tiles
    o_ref,
    m_scr, l_scr, acc_scr,
    *, scale: float, block_k: int, num_kv_blocks: int,
):
    bi = pl.program_id(0)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    kv_len = kv_len_ref[bi]
    kv_start = kv_start_ref[bi]
    k_base = j * block_k

    # skip tiles entirely outside the valid window
    live = (k_base < kv_len) & (k_base + block_k > kv_start)

    @pl.when(live)
    def _compute():
        q = q_ref[0, 0, :, :].astype(jnp.float32) * scale
        k = k_ref[0, 0, :, :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [S, block_k]
        kpos = k_base + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        mask = (kpos >= kv_start) & (kpos < kv_len)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        corr = jnp.exp(m_prev - m_new)
        l_scr[:] = l_scr[:] * corr + jnp.sum(p, axis=-1, keepdims=True)
        v = v_ref[0, 0, :, :].astype(jnp.float32)
        acc_scr[:] = acc_scr[:] * corr + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        m_scr[:] = m_new

    @pl.when(j == num_kv_blocks - 1)
    def _finalize():
        l = l_scr[:]
        safe = jnp.where(l > 0, l, 1.0)
        o_ref[0, 0, :, :] = (acc_scr[:] / safe * (l > 0)).astype(o_ref.dtype)


def decode_attention_pallas(
    q: jax.Array,            # [B, S, Hq, D]
    k_cache: jax.Array,      # [B, Hkv, L, D]  (head-major — native layout)
    v_cache: jax.Array,
    kv_len: jax.Array,       # [B] int32 — valid entries (exclusive end)
    kv_start: jax.Array | None = None,  # [B] int32 — left-pad offset
    scale: float | None = None,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Flash decode over the valid cache window per batch row.

    Caches are HEAD-MAJOR [B, Hkv, L, D] so kv tiles map onto Mosaic's
    (sublane, lane) tiling with no transposes in the hot loop.
    """
    b, s, hq, d = q.shape
    _, hkv, max_len, _ = k_cache.shape
    assert hq % hkv == 0
    group = hq // hkv
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    if kv_start is None:
        kv_start = jnp.zeros((b,), jnp.int32)

    block_k = min(block_k, max(((max_len + 127) // 128) * 128, 128))
    pad = (-max_len) % block_k
    if pad:
        k_cache = jnp.pad(k_cache, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v_cache = jnp.pad(v_cache, ((0, 0), (0, 0), (0, pad), (0, 0)))
    n_k = k_cache.shape[2] // block_k

    s_pad = max(((s + 7) // 8) * 8, 8)
    if s_pad != s:
        q = jnp.pad(q, ((0, 0), (0, s_pad - s), (0, 0), (0, 0)))
    # fold the GQA group into the q-row dim: every kv tile is loaded ONCE
    # per kv head and serves all `group` query heads in a single matmul
    qh = jnp.transpose(q, (0, 2, 1, 3))          # [B, Hq, S, D]
    qh = qh.reshape(b, hkv, group * s_pad, d)    # [B, Hkv, G*S, D]
    rows = group * s_pad
    kh, vh = k_cache, v_cache

    kernel = functools.partial(_decode_kernel, scale=scale, block_k=block_k,
                               num_kv_blocks=n_k)
    grid = (b, hkv, n_k)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # whole [B] scalar vectors in SMEM (Mosaic rejects rank-1
            # sub-blocks); rows indexed by program_id inside the kernel
            pl.BlockSpec((b,), lambda bi, h, j: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((b,), lambda bi, h, j: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, rows, d), lambda bi, h, j: (bi, h, 0, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, h, j: (bi, h, j, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, h, j: (bi, h, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, rows, d), lambda bi, h, j: (bi, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hkv, rows, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows, 1), jnp.float32),
            pltpu.VMEM((rows, 1), jnp.float32),
            pltpu.VMEM((rows, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kv_len.astype(jnp.int32), kv_start.astype(jnp.int32), qh, kh, vh)

    out = out.reshape(b, hq, s_pad, d)
    return jnp.transpose(out, (0, 2, 1, 3))[:, :s]


def windowed_decode_attention(
    q: jax.Array,
    k_cache: jax.Array,      # [B, Hkv, L, D] head-major
    v_cache: jax.Array,
    kv_len: jax.Array,
    kv_start: jax.Array | None = None,
    implementation: str = "auto",
) -> jax.Array:
    """Decode-block attention over [kv_start, kv_len); picks pallas or XLA.

    The XLA path materializes the dense score matrix — used for small caches
    and non-TPU backends.
    """
    from bitdance_tpu.ops.attention import attention_xla

    b, max_len = k_cache.shape[0], k_cache.shape[2]
    if kv_start is None:
        kv_start = jnp.zeros((b,), jnp.int32)
    if implementation == "auto":
        on_tpu = jax.default_backend() == "tpu"
        implementation = "pallas" if (on_tpu and max_len >= 1024) else "xla"
    if implementation == "pallas":
        return decode_attention_pallas(q, k_cache, v_cache, kv_len, kv_start)
    pos = jnp.arange(max_len, dtype=jnp.int32)
    mask = (pos[None, :] >= kv_start[:, None]) & (pos[None, :] < kv_len[:, None])
    k_lm = jnp.transpose(k_cache, (0, 2, 1, 3))  # back to length-major
    v_lm = jnp.transpose(v_cache, (0, 2, 1, 3))
    return attention_xla(q, k_lm, v_lm, mask[:, None, None, :])
