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

# ---------------------------------------------------------------------------
# Fused-KV decode: k and v ride ONE ring buffer, dead tiles are never DMA'd
# ---------------------------------------------------------------------------

def _decode_fusedkv_kernel(
    kv_len_ref, kv_start_ref,            # scalar-prefetch [B]
    qc_ref, kv_ref, *rest,
    scale: float, block_k: int, num_kv_blocks: int, quant: bool,
):
    if quant:
        sc_ref, o_ref, m_scr, l_scr, acc_scr = rest
    else:
        o_ref, m_scr, l_scr, acc_scr = rest

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
    live = (k_base < kv_len) & (k_base + block_k > kv_start)

    @pl.when(live)
    def _compute():
        # tile lanes = [k | v]; qc's v-half is zero, so the full-width dot
        # IS q.k — no 64-lane slicing anywhere in the kernel
        tile = kv_ref[0, 0].astype(jnp.float32)          # [block, 2D]
        qc = qc_ref[0, 0].astype(jnp.float32)            # [rows, 2D]
        s = jax.lax.dot_general(
            qc * scale, tile, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [rows, block]
        if quant:
            s = s * sc_ref[0, 0, 0:1, :]                 # k scales, per pos
        kpos = k_base + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        mask = (kpos >= kv_start) & (kpos < kv_len)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        if quant:
            p = p * sc_ref[0, 0, 1:2, :]                 # v scales, per pos
        corr = jnp.exp(m_prev - m_new)
        l_scr[:] = l_scr[:] * corr + jnp.sum(
            jnp.where(mask, jnp.exp(s - m_new), 0.0), axis=-1, keepdims=True)
        acc_scr[:] = acc_scr[:] * corr + jax.lax.dot_general(
            p, tile, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [rows, 2D]
        m_scr[:] = m_new

    @pl.when(j == num_kv_blocks - 1)
    def _finalize():
        l = l_scr[:]
        safe = jnp.where(l > 0, l, 1.0)
        o_ref[0, 0] = (acc_scr[:] / safe * (l > 0)).astype(o_ref.dtype)


def pack_kv_rows(k: jax.Array, v: jax.Array) -> jax.Array:
    """[B, S, H, D] x2 -> fused [B, H, S, 2D] (k in lanes [:D], v in [D:]).

    2D >= 128 keeps the ring buffer's minor dim at full lane width — the
    head-major [.., len, 64] layout padded 64->128 (2x HBM) under the
    default layout Pallas requires.
    """
    kv = jnp.concatenate([k, v], axis=-1)
    return jnp.transpose(kv, (0, 2, 1, 3))


def quantize_kv_rows(k: jax.Array, v: jax.Array):
    """[B, S, H, D] x2 -> (int8 fused [B, H, S, 2D], scales [B, H, 2, S]).

    Per-(head, position) symmetric f32 scales; k at scale row 0, v at row 1
    (the kernel reads them as a [2, block] strip per kv head — the trailing
    (2, block) block dims satisfy Mosaic's tiling rule because 2 equals the
    array dimension)."""
    def q(x):
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
        s = jnp.maximum(amax, 1e-8) / 127.0
        qx = jnp.clip(jnp.round(x.astype(jnp.float32) / s[..., None]),
                      -127, 127).astype(jnp.int8)
        return qx, s
    kq, ks = q(k)
    vq, vs = q(v)
    fused = jnp.transpose(jnp.concatenate([kq, vq], axis=-1), (0, 2, 1, 3))
    scales = jnp.stack([ks, vs], axis=3)                 # [B, S, H, 2]
    return fused, jnp.transpose(scales, (0, 2, 3, 1))    # [B, H, 2, S]


def decode_attention_fusedkv(
    q: jax.Array,             # [B, S, Hq, D]
    kv_cache: jax.Array,      # [B, Hkv, L, 2D] bf16 or int8 (k | v lanes)
    kv_len: jax.Array,        # [B] int32 — valid entries (exclusive end)
    kv_start: jax.Array | None = None,
    kv_scales: jax.Array | None = None,  # [B, Hkv, 2, L] f32 for int8 cache
    scale: float | None = None,
    block_k: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Flash decode over a fused int8/bf16 KV ring buffer.

    Dead cache tiles are skipped at the DMA level: the kv BlockSpec's index
    map clamps the tile index into the live window [kv_start, kv_len), so a
    grid step outside it re-addresses the previous tile (revolving-buffer
    no-op) and the ring buffer's dead majority never crosses HBM. This is
    what makes a [max_len] ring buffer cost only O(cache_len) per AR step.
    """
    b, s, hq, d = q.shape
    _, hkv, max_len, d2 = kv_cache.shape
    assert d2 == 2 * d
    assert hq % hkv == 0
    group = hq // hkv
    quant = kv_scales is not None
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    if kv_start is None:
        kv_start = jnp.zeros((b,), jnp.int32)

    block_k = min(block_k, max(((max_len + 127) // 128) * 128, 128))
    pad = (-max_len) % block_k
    if pad:
        kv_cache = jnp.pad(kv_cache, ((0, 0), (0, 0), (0, pad), (0, 0)))
        if quant:
            kv_scales = jnp.pad(kv_scales,
                                ((0, 0), (0, 0), (0, 0), (0, pad)))
    n_k = kv_cache.shape[2] // block_k

    s_pad = max(((s + 7) // 8) * 8, 8)
    if s_pad != s:
        q = jnp.pad(q, ((0, 0), (0, s_pad - s), (0, 0), (0, 0)))
    qh = jnp.transpose(q, (0, 2, 1, 3)).reshape(b, hkv, group * s_pad, d)
    rows = group * s_pad
    qc = jnp.concatenate([qh, jnp.zeros_like(qh)], axis=-1)  # [B,Hkv,R,2D]

    def kv_idx(bi, h, j, lens, starts):
        last = jnp.maximum((lens[bi] + block_k - 1) // block_k - 1, 0)
        first = jnp.minimum(starts[bi] // block_k, last)
        return (bi, h, jnp.clip(j, first, last), 0)

    in_specs = [
        pl.BlockSpec((1, 1, rows, d2), lambda bi, h, j, lens, starts:
                     (bi, h, 0, 0)),
        pl.BlockSpec((1, 1, block_k, d2), kv_idx),
    ]
    args = [qc, kv_cache]
    if quant:
        in_specs.append(pl.BlockSpec(
            (1, 1, 2, block_k),
            lambda bi, h, j, lens, starts, _f=kv_idx:
            (bi, h, 0, _f(bi, h, j, lens, starts)[2])))
        args.append(kv_scales)

    kernel = functools.partial(
        _decode_fusedkv_kernel, scale=scale, block_k=block_k,
        num_kv_blocks=n_k, quant=quant)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, hkv, n_k),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 1, rows, d2),
                                   lambda bi, h, j, lens, starts:
                                   (bi, h, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((rows, 1), jnp.float32),
                pltpu.VMEM((rows, 1), jnp.float32),
                pltpu.VMEM((rows, d2), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hkv, rows, d2), qh.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kv_len.astype(jnp.int32), kv_start.astype(jnp.int32), *args)

    out = out[..., d:].reshape(b, hq, s_pad, d)          # v-half of acc
    return jnp.transpose(out, (0, 2, 1, 3))[:, :s]


def dequantize_fused_kv(kv_cache: jax.Array, kv_scales: jax.Array | None):
    """Split a fused ring buffer back to (k, v) [B, Hkv, L, D] f32/bf16."""
    d = kv_cache.shape[-1] // 2
    k = kv_cache[..., :d]
    v = kv_cache[..., d:]
    if kv_scales is None:
        return k, v
    k = k.astype(jnp.float32) * kv_scales[:, :, 0, :, None]
    v = v.astype(jnp.float32) * kv_scales[:, :, 1, :, None]
    return k, v


def windowed_decode_attention_fusedkv(
    q: jax.Array,
    kv_cache: jax.Array,
    kv_len: jax.Array,
    kv_start: jax.Array | None = None,
    kv_scales: jax.Array | None = None,
    implementation: str = "auto",
) -> jax.Array:
    """Fused-buffer twin of windowed_decode_attention (XLA fallback path
    dequantizes + splits and reuses the dense-mask reference)."""
    from bitdance_tpu.ops.attention import attention_xla

    b, max_len = kv_cache.shape[0], kv_cache.shape[2]
    if kv_start is None:
        kv_start = jnp.zeros((b,), jnp.int32)
    if implementation == "auto":
        implementation = "pallas" if jax.default_backend() == "tpu" else "xla"
    if implementation == "pallas":
        return decode_attention_fusedkv(q, kv_cache, kv_len, kv_start,
                                        kv_scales)
    k, v = dequantize_fused_kv(kv_cache, kv_scales)
    pos = jnp.arange(max_len, dtype=jnp.int32)
    mask = (pos[None, :] >= kv_start[:, None]) & (pos[None, :] < kv_len[:, None])
    k_lm = jnp.transpose(k, (0, 2, 1, 3)).astype(q.dtype)
    v_lm = jnp.transpose(v, (0, 2, 1, 3)).astype(q.dtype)
    return attention_xla(q, k_lm, v_lm, mask[:, None, None, :])


def bucketed_window_attention(
    q: jax.Array,             # [B, S, Hq, D]
    kv_cache: jax.Array,      # [B, H, L, 2D] fused (bf16 or int8)
    cache_len,                # traced int32 scalar — tokens already cached
    buckets: tuple[int, ...],
    kv_scales: jax.Array | None = None,   # [B, H, 2, L] for int8
    causal: bool = False,
    scale: float | None = None,
) -> jax.Array:
    """Live-window attention via `lax.switch` over STATIC cache prefixes.

    For short ring buffers with many batch rows (the ImageNet decode: 256+
    rows, <=3 kv tiles) a Pallas grid pays ~1us/step over b*h*tiles tiny
    steps — slower than XLA's fused dense read. Bucketing gets the traffic
    win the honest way for that shape: each AR step dispatches to the
    smallest static prefix >= cache_len + s, XLA fuses slice + dequant into
    the attention matmuls, and dead ring-buffer tail is never read. All
    rows share one window (ImageNet CFG batches have no left-padding).

    causal=False: every q row attends [0, cache_len + S) (decode window).
    causal=True: q row i attends [0, cache_len + i] (prefill).
    """
    b, s, hq, d = q.shape
    L = kv_cache.shape[2]
    assert buckets[-1] >= L and all(
        x < y for x, y in zip(buckets, buckets[1:]))
    new_len = cache_len + s

    def make_branch(blen):
        def br(q, kv, sc):
            return window_attention_headmajor(
                q, kv, cache_len, min(blen, L), kv_scales=sc,
                causal=causal, scale=scale)
        return br

    idx = jnp.searchsorted(jnp.asarray(buckets, jnp.int32),
                           new_len, side="left")
    idx = jnp.minimum(idx, len(buckets) - 1)
    return jax.lax.switch(idx, [make_branch(bl) for bl in buckets],
                          q, kv_cache, kv_scales)


def window_attention_headmajor(
    q: jax.Array,             # [B, S, Hq, D]
    kv_cache: jax.Array,      # [B, H, L, 2D] fused (bf16 or int8)
    cache_len,                # traced int32 — tokens already cached
    window: int,              # STATIC prefix length actually read
    kv_scales: jax.Array | None = None,   # [B, H, 2, L] for int8
    causal: bool = False,
    scale: float | None = None,
) -> jax.Array:
    """Attention over the static cache prefix [:window], head-major.

    Everything stays head-major batched matmuls — a materialized
    length-major transpose of the slice costs 3x the slice's HBM traffic
    (measured). int8 scales fold into scores (k) and probabilities (v), so
    the quantized buffer is read once with no dequantized copy. The caller
    guarantees cache_len + S <= window; positions past it are never read.
    """
    b, s, hq, d = q.shape
    sc_f = 1.0 / math.sqrt(d) if scale is None else scale
    k = kv_cache[:, :, :window, :d]
    v = kv_cache[:, :, :window, d:]
    qs = (q * sc_f).astype(jnp.float32)
    s_ = jnp.einsum("bshd,bhld->bhsl", qs, k.astype(jnp.float32))
    if kv_scales is not None:
        s_ = s_ * kv_scales[:, :, 0, None, :window]
    pos = jnp.arange(window, dtype=jnp.int32)
    if causal:
        q_abs = cache_len + jnp.arange(s, dtype=jnp.int32)
        mask = (pos[None, :] <= q_abs[:, None])[None, None]
    else:
        mask = (pos < cache_len + s)[None, None, None, :]
    s_ = jnp.where(mask, s_, NEG_INF)
    p = jax.nn.softmax(s_, axis=-1)
    if kv_scales is not None:
        p = p * kv_scales[:, :, 1, None, :window]
    o = jnp.einsum("bhsl,bhld->bshd", p, v.astype(jnp.float32))
    return o.astype(q.dtype)


def default_buckets(total: int, n: int = 4) -> tuple[int, ...]:
    """Ascending 8-aligned prefix lengths ending at `total`."""
    out = []
    for i in range(1, n):
        cand = min(max(((total * i // n) + 7) // 8 * 8, 8), total)
        if cand < total and (not out or cand > out[-1]):
            out.append(cand)
    out.append(total)
    return tuple(out)
