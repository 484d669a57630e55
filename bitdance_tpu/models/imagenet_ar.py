"""ImageNet class-conditional AR models (BitDance-B/L/H, 1x and Nx-parallel).

TPU-native re-design of imagenet_gen/src/{model,model_parallel,layers}.py:
llama-style pre-RMSNorm blocks with fused QKV, 2D RoPE over patch centers,
SwiGLU FFN, class-embedding prefix tokens, learned query tokens for parallel
prediction, and a flow-matching diffusion head.

Functional style: per-layer weights stacked on a leading axis, layer loop as
`lax.scan` (one compiled body; stacked axes shard naturally over an fsdp
mesh axis). Sampling runs fully on device: `lax.scan` over AR positions with
a fixed-shape KV cache, inner `lax.scan` in the diffusion-head sampler, and
the reference's linear CFG schedule (model.py:317-335).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from bitdance_tpu.models.diff_head import DiffHead
from bitdance_tpu.models.sampling import euler_maruyama
from bitdance_tpu.ops.attention import (
    attention_xla,
    mask_from_ids,
    masked_attention,
)
from bitdance_tpu.ops.int8 import mm
from bitdance_tpu.ops.norms import rms_norm
from bitdance_tpu.ops.quantize import flip_bits_uniform_prob
from bitdance_tpu.ops.rotary import (
    apply_rope_paired,
    patch_center_coords_2d,
    rope_table_2d,
)


def find_multiple(n: int, k: int) -> int:
    return n if n % k == 0 else n + k - (n % k)


@dataclasses.dataclass(frozen=True)
class ImageNetARConfig:
    dim: int = 768
    n_layer: int = 24
    n_head: int = 12
    diff_layers: int = 6
    diff_dim: int = 768
    diff_adanln_layers: int = 2
    latent_dim: int = 16
    down_size: int = 16
    patch_size: int = 1
    resolution: int = 256
    cls_token_num: int = 64
    num_classes: int = 1000
    class_dropout_prob: float = 0.1
    diff_batch_mul: int = 4
    parallel_num: int = 1
    grad_checkpointing: bool = False
    perturb_rate: float = 0.0
    time_schedule: str = "logit_normal"
    time_shift: float = 1.0
    P_std: float = 0.8
    P_mean: float = -0.8

    @property
    def h(self) -> int:
        return self.resolution // (self.down_size * self.patch_size)

    @property
    def w(self) -> int:
        return self.h

    @property
    def num_tokens(self) -> int:
        return self.h * self.w

    @property
    def token_dim(self) -> int:
        return self.latent_dim * self.patch_size * self.patch_size

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_head

    @property
    def ffn_hidden(self) -> int:
        return find_multiple(int(2 * (4 * self.dim) / 3), 256)

    @property
    def prefix_len(self) -> int:
        """cls tokens plus query tokens (model_parallel.py:312-313)."""
        return self.cls_token_num + self.parallel_num - 1

    @property
    def total_tokens(self) -> int:
        """Input sequence length: prefix + tokens except last window."""
        return self.prefix_len + self.num_tokens - self.parallel_num


# Reference size registry (imagenet_gen/src/model.py:392-432)
def config_b(**kw) -> ImageNetARConfig:
    return ImageNetARConfig(dim=768, n_layer=24, n_head=12, diff_layers=6,
                            diff_dim=768, diff_adanln_layers=2, **kw)


def config_l(**kw) -> ImageNetARConfig:
    return ImageNetARConfig(dim=1024, n_layer=32, n_head=16, diff_layers=8,
                            diff_dim=1024, diff_adanln_layers=2, **kw)


def config_h(**kw) -> ImageNetARConfig:
    return ImageNetARConfig(dim=1280, n_layer=40, n_head=20, diff_layers=12,
                            diff_dim=1280, diff_adanln_layers=3, **kw)


def config_s(**kw) -> ImageNetARConfig:
    """Small config for smoke tests / CI — ours, not a reference size."""
    return ImageNetARConfig(dim=256, n_layer=4, n_head=4, diff_layers=2,
                            diff_dim=256, diff_adanln_layers=1, **kw)


IMAGENET_MODELS = {"BitDance-B": config_b, "BitDance-L": config_l,
                   "BitDance-H": config_h, "BitDance-S": config_s}


def make_head(cfg: ImageNetARConfig, dtype: Any = jnp.float32,
              sample_weight_quant: bool = False) -> DiffHead:
    """The diffusion head module (MlpEncoder for 1x, TransEncoder for Nx).

    sample_weight_quant: int8 weight-only quantization inside the fused
    sampler — the EM loop is HBM-bound on block weights (100 net calls per
    AR step), so this roughly halves head sampling time."""
    parallel = cfg.parallel_num > 1
    return DiffHead(
        sample_weight_quant=sample_weight_quant,
        ch_target=cfg.token_dim,
        ch_cond=cfg.dim,
        ch_latent=cfg.diff_dim,
        depth_latent=cfg.diff_layers,
        depth_adanln=cfg.diff_adanln_layers,
        time_shift=cfg.time_shift,
        time_schedule=cfg.time_schedule,
        P_mean=cfg.P_mean,
        P_std=cfg.P_std,
        parallel_num=cfg.parallel_num,
        use_swiglu=parallel,          # parallel head always SwiGLU (diff_head_parallel.py)
        attention=parallel,
        per_token_loss=False,         # scalar loss (diff_head.py:86)
        bounded_output=False,         # imagenet heads are unbounded
        attn_head_dim=64,             # diff_head_parallel.py TransBlock
        dtype=dtype,
    )


import functools as _functools


@_functools.partial(jax.jit, static_argnums=(1, 2))
def init_ar_params(key: jax.Array, cfg: ImageNetARConfig,
                   dtype: Any = jnp.float32) -> dict:
    """Init AR transformer params (head params are separate, via make_head).

    Jitted as a whole — eager initializer dispatch is tunnel-bound."""
    keys = jax.random.split(key, 10)
    L, D = cfg.n_layer, cfg.dim
    Hf = cfg.ffn_hidden
    std = 0.02

    def dense(k, shape):
        return (jax.random.normal(k, shape) * std).astype(dtype)

    params = {
        "cls_embedding": dense(keys[0], (cfg.num_classes + 1, D * cfg.cls_token_num)),
        "proj_in": {
            "w1": {"kernel": dense(keys[1], (cfg.token_dim, int(D * 1.5) * 2)),
                   "bias": jnp.zeros((int(D * 1.5) * 2,), dtype)},
            "w2": {"kernel": dense(keys[2], (int(D * 1.5), D)),
                   "bias": jnp.zeros((D,), dtype)},
        },
        "emb_norm": jnp.ones((D,), dtype),
        "layers": {
            "wqkv": dense(keys[3], (L, D, 3 * D)),
            "wo": dense(keys[4], (L, D, D)),
            "attention_norm": jnp.ones((L, D), dtype),
            "ffn_norm": jnp.ones((L, D), dtype),
            "ffn_w1": dense(keys[5], (L, D, 2 * Hf)),
            "ffn_w2": dense(keys[6], (L, Hf, D)),
        },
        "norm": jnp.ones((D,), dtype),
        "pos_for_diff": dense(keys[7], (cfg.num_tokens, D)),
    }
    if cfg.parallel_num > 1:
        params["query_token"] = dense(keys[8], (cfg.parallel_num - 1, D))
    return params


_AR_QUANT_KEYS = ("wqkv", "wo", "ffn_w1", "ffn_w2")


def quantize_ar_params(params: dict) -> dict:
    """Int8-quantize the stacked per-layer matmul weights for SAMPLING.

    W8A8 via ops/int8.py: the decode step is MXU-rate-bound at M=2*batch
    rows (the cfg-doubled batch), and the MXU's native s8 path runs at
    twice the bf16 rate — the same lever that won on the diffusion head.
    Norm gains, embeddings, proj_in and pos tables stay in bf16 (tiny).
    Quantize OUTSIDE jit and pass the result as an argument (tracing the
    quantize chain into the sampler lets XLA remat it into scan bodies).
    Training paths keep full-precision weights.
    """
    from bitdance_tpu.ops.int8 import quantize_linear

    layers = dict(params["layers"])
    for k in _AR_QUANT_KEYS:
        layers[k] = quantize_linear(layers[k])
    return dict(params, layers=layers)


def proj_in(params: dict, x: jax.Array) -> jax.Array:
    """SwiGLU connector (imagenet model.py:60-70)."""
    p = params["proj_in"]
    h12 = x @ p["w1"]["kernel"] + p["w1"]["bias"]
    h1, h2 = jnp.split(h12, 2, axis=-1)
    return (jax.nn.silu(h1) * h2) @ p["w2"]["kernel"] + p["w2"]["bias"]


def freqs_cis_table(cfg: ImageNetARConfig) -> jax.Array:
    """2D RoPE table for the input sequence (model.py:175-186 / _parallel:202-215).

    Zeros (identity rotation via t=0) for prefix tokens, patch-center coords
    for image tokens (ps-raster reordered for parallel mode), truncated by
    the last parallel_num positions (next-window prediction shift).
    """
    coords = patch_center_coords_2d(cfg.resolution, cfg.down_size * cfg.patch_size)
    table = rope_table_2d(coords, cfg.head_dim, cls_token_num=cfg.prefix_len)
    if cfg.parallel_num > 1:
        ps = int(math.isqrt(cfg.parallel_num))
        patch = table[cfg.prefix_len:]  # [h*w, hd//2, 2]
        hh, ww = cfg.h // ps, cfg.w // ps
        patch = patch.reshape(hh, ps, ww, ps, *patch.shape[1:])
        patch = jnp.transpose(patch, (0, 2, 1, 3, 4, 5)).reshape(
            cfg.num_tokens, *table.shape[1:])
        table = jnp.concatenate([table[: cfg.prefix_len], patch], axis=0)
    return table[: -cfg.parallel_num]


def train_ids(cfg: ImageNetARConfig) -> tuple[jax.Array, jax.Array]:
    """(block_ids, doc_ids) for the training mask.

    parallel=1: plain causal. parallel>1: first prefix_len-parallel_num
    tokens causal, then windows of parallel_num bidirectional
    (get_block_causal_mask, model_parallel.py:90-101).
    """
    total = cfg.total_tokens
    if cfg.parallel_num == 1:
        block = np.arange(total, dtype=np.int32)
    else:
        ncausal = cfg.cls_token_num - 1
        block = np.zeros((total,), np.int32)
        block[:ncausal] = np.arange(ncausal)
        rest = total - ncausal
        block[ncausal:] = ncausal + np.arange(rest) // cfg.parallel_num
    return jnp.asarray(block), jnp.zeros((total,), jnp.int32)


def _attn_full(cfg: ImageNetARConfig, params_l, x, freqs, block_ids, doc_ids):
    """One transformer layer (full sequence) for lax.scan."""
    b, s, _ = x.shape
    nh, hd = cfg.n_head, cfg.head_dim
    h = rms_norm(x, params_l["attention_norm"])
    qkv = h @ params_l["wqkv"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = apply_rope_paired(q.reshape(b, s, nh, hd), freqs)
    k = apply_rope_paired(k.reshape(b, s, nh, hd), freqs)
    v = v.reshape(b, s, nh, hd)
    # Pallas flash kernel for long sequences (512px training = 1024+prefix
    # tokens where the dense-mask XLA path starts to hurt), XLA below
    bids = jnp.broadcast_to(block_ids[None], (b, s))
    dids = jnp.broadcast_to(doc_ids[None], (b, s))
    attn = masked_attention(q, k, v, bids, dids, bids, dids)
    x = x + attn.reshape(b, s, -1) @ params_l["wo"]
    h = rms_norm(x, params_l["ffn_norm"])
    h12 = h @ params_l["ffn_w1"]
    h1, h2 = jnp.split(h12, 2, axis=-1)
    x = x + (jax.nn.silu(h1) * h2) @ params_l["ffn_w2"]
    return x


def ar_backbone(params: dict, cfg: ImageNetARConfig, x: jax.Array,
                freqs: jax.Array, block_ids: jax.Array,
                doc_ids: jax.Array, remat: bool = False) -> jax.Array:
    def layer(carry, lp):
        return _attn_full(cfg, lp, carry, freqs, block_ids, doc_ids), None

    body = jax.checkpoint(layer) if remat else layer
    x, _ = jax.lax.scan(body, x, params["layers"])
    return x


def forward_train(
    params: dict,
    head: DiffHead,
    head_params: dict,
    cfg: ImageNetARConfig,
    latent_tokens: jax.Array,  # [B, num_tokens, token_dim] ±1, raster-ordered
    class_id: jax.Array,       # [B] int32
    rng: jax.Array,
    train: bool = True,
) -> jax.Array:
    """Training loss (model.py:256-301 / model_parallel.py:285-336)."""
    b = latent_tokens.shape[0]
    k_drop, k_perturb, k_head = jax.random.split(rng, 3)

    x_in = latent_tokens
    if train and cfg.perturb_rate > 0:
        x_in = flip_bits_uniform_prob(k_perturb, x_in, cfg.perturb_rate)

    x = proj_in(params, x_in[:, : -cfg.parallel_num, :])

    if train and cfg.class_dropout_prob > 0:
        drop = jax.random.uniform(k_drop, (b,)) < cfg.class_dropout_prob
        class_id = jnp.where(drop, cfg.num_classes, class_id)
    c = jnp.take(params["cls_embedding"], class_id, axis=0).reshape(
        b, cfg.cls_token_num, cfg.dim)

    parts = [c]
    if cfg.parallel_num > 1:
        parts.append(jnp.broadcast_to(params["query_token"][None],
                                      (b, cfg.parallel_num - 1, cfg.dim)))
    parts.append(x)
    x = jnp.concatenate(parts, axis=1)
    x = rms_norm(x, params["emb_norm"])

    freqs = freqs_cis_table(cfg)
    block_ids, doc_ids = train_ids(cfg)
    x = ar_backbone(params, cfg, x, freqs, block_ids, doc_ids,
                    remat=(train and cfg.grad_checkpointing))

    x = x[:, -cfg.num_tokens :, :]
    x = rms_norm(x, params["norm"])
    x = x + params["pos_for_diff"][None]

    target = jax.lax.stop_gradient(latent_tokens)
    if cfg.parallel_num > 1:
        x = x.reshape(-1, cfg.parallel_num, cfg.dim)
        target = target.reshape(-1, cfg.parallel_num, cfg.token_dim)
        reps = (cfg.diff_batch_mul, 1, 1)
    else:
        x = x.reshape(-1, cfg.dim)
        target = target.reshape(-1, cfg.token_dim)
        reps = (cfg.diff_batch_mul, 1)
    x = jnp.tile(x, reps)
    target = jnp.tile(target, reps)
    return head.apply(head_params, target, x, k_head)


# ---------------------------------------------------------------------------
# KV-cached sampling
# ---------------------------------------------------------------------------

def _init_cache(cfg: ImageNetARConfig, batch: int, dtype=jnp.float32,
                int8: bool = False) -> dict:
    """Separate k/v ring buffers [L, B, len, H, D] (XLA picks the padded
    layout it likes; a fused [k|v] buffer makes XLA's two split consumers —
    scores reads k, output reads v — each stream the full double-width
    buffer, 2x traffic, measured). int8 adds per-(position, head) scales."""
    total = cfg.prefix_len + cfg.num_tokens
    # 5-D [.., len, H, D]: XLA picks a len-minor layout (1.2x padded) that
    # reads fast. A flattened [.., len, H*D] buffer avoids the padding but
    # the per-head attention reads ran 4.5x slower (measured) — do not
    # "fix" the padding that way again.
    shape = (cfg.n_layer, batch, total, cfg.n_head, cfg.head_dim)
    dt = jnp.int8 if int8 else dtype
    cache = {"k": jnp.zeros(shape, dt), "v": jnp.zeros(shape, dt)}
    if int8:
        sshape = (cfg.n_layer, batch, total, cfg.n_head)
        cache["ks"] = jnp.zeros(sshape, jnp.float32)
        cache["vs"] = jnp.zeros(sshape, jnp.float32)
    return cache


def _quant_rows(x):
    """[B, S, H, D] -> (int8 values, [B, S, H] f32 scales), symmetric."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    s = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s[..., None]),
                 -127, 127).astype(jnp.int8)
    return q, s


def _forward_cached(params, cfg: ImageNetARConfig, x, freqs_slice, cache,
                    cache_len, causal_block: bool, window: int | None = None):
    """Cached block forward (layers.py:96-134 KV cache + naive attention).

    `window` is a STATIC prefix length: attention reads only cache[:window]
    (the caller guarantees cache_len + s <= window). The sampler compiles a
    few step variants at growing windows (segmented scans) — a `lax.switch`
    over windows materializes its big operands, and a full-cache read is
    ~2x the average live traffic (both measured slower).
    """
    b, s, _ = x.shape
    nh, hd = cfg.n_head, cfg.head_dim
    int8 = cache["k"].dtype == jnp.int8
    max_len = cache["k"].shape[2]
    window = max_len if window is None else min(window, max_len)

    pos_idx = jnp.arange(window, dtype=jnp.int32)
    if causal_block:
        q_abs = cache_len + jnp.arange(s, dtype=jnp.int32)
        mask = pos_idx[None, None, :] <= q_abs[None, :, None]
        mask = jnp.broadcast_to(mask, (b, s, window))[:, None]
    else:
        mask = pos_idx[None, :] < cache_len + s
        mask = jnp.broadcast_to(mask, (b, window))[:, None, None, :]

    x = rms_norm(x, params["emb_norm"])

    def win_slice(buf, li):
        """This layer's [:window] prefix; static sizes, fuses into the
        attention reads (only [:window] ever crosses HBM)."""
        return jax.lax.dynamic_slice(
            buf, (li,) + (0,) * (buf.ndim - 1),
            (1, buf.shape[1], window) + buf.shape[3:])[0]

    # The stacked caches ride in the scan CARRY (not xs/ys): carry buffers
    # alias across iterations, so the per-layer dynamic_update_slice writes
    # in place instead of copying the full multi-GB cache every decode step
    # (xs->ys pairs cannot alias). This was 76% of the sampling step time.
    def layer(carry, scanned):
        xx, k_all, v_all, ks_all, vs_all, li = carry
        lp = scanned
        h = rms_norm(xx, lp["attention_norm"])
        qkv = mm(h, lp["wqkv"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = apply_rope_paired(q.reshape(b, s, nh, hd), freqs_slice)
        k = apply_rope_paired(k.reshape(b, s, nh, hd), freqs_slice)
        v = v.reshape(b, s, nh, hd)
        if int8:
            k, ks = _quant_rows(k)
            v, vs = _quant_rows(v)
            ks_all = jax.lax.dynamic_update_slice(
                ks_all, ks[None], (li, 0, cache_len, 0))
            vs_all = jax.lax.dynamic_update_slice(
                vs_all, vs[None], (li, 0, cache_len, 0))
        k_all = jax.lax.dynamic_update_slice(
            k_all, k.astype(k_all.dtype)[None], (li, 0, cache_len, 0, 0))
        v_all = jax.lax.dynamic_update_slice(
            v_all, v.astype(v_all.dtype)[None], (li, 0, cache_len, 0, 0))
        k_cache = win_slice(k_all, li)
        v_cache = win_slice(v_all, li)
        if int8:
            k_cache = k_cache.astype(jnp.float32) \
                * win_slice(ks_all, li)[..., None]
            v_cache = v_cache.astype(jnp.float32) \
                * win_slice(vs_all, li)[..., None]
        attn = attention_xla(q, k_cache, v_cache, mask)
        xx = xx + mm(attn.astype(xx.dtype).reshape(b, s, -1), lp["wo"])
        h = rms_norm(xx, lp["ffn_norm"])
        h1, h2 = jnp.split(mm(h, lp["ffn_w1"]), 2, axis=-1)
        xx = xx + mm(jax.nn.silu(h1) * h2, lp["ffn_w2"])
        return (xx, k_all, v_all, ks_all, vs_all, li + 1), None

    zero = jnp.zeros((), jnp.float32)
    carry0 = (x, cache["k"], cache["v"],
              cache.get("ks", zero), cache.get("vs", zero), jnp.int32(0))
    (x, nk, nv, nks, nvs, _), _ = jax.lax.scan(
        layer, carry0, params["layers"])
    x = rms_norm(x, params["norm"])
    new_cache = {"k": nk, "v": nv}
    if int8:
        new_cache["ks"] = nks
        new_cache["vs"] = nvs
    return x, new_cache


def sample(
    params: dict,
    head: DiffHead,
    head_params: dict,
    cfg: ImageNetARConfig,
    class_ids: jax.Array,   # [B] int32
    rng: jax.Array,
    num_sampling_steps: int = 100,
    cfg_scale: float = 1.0,
    cfg_schedule: str = "linear",
    kv_int8: bool = False,
    head_stacked: dict | None = None,
) -> jax.Array:
    """Generate ±1 latent tokens [B, num_tokens, token_dim] (model.py:337-376).

    kv_int8 stores the KV ring buffer as int8 with per-(head, position)
    scales — halves decode-attention HBM traffic and cache footprint
    (a serving-side choice; bf16 is bit-compatible with training)."""
    use_cfg = cfg_scale > 1.0
    cfg_mult = 2 if use_cfg else 1
    if use_cfg:
        null = jnp.full_like(class_ids, cfg.num_classes)
        cond = jnp.concatenate([class_ids, null], axis=0)
    else:
        cond = class_ids
    b2 = cond.shape[0]
    n = class_ids.shape[0]
    p = cfg.parallel_num
    num_steps = cfg.num_tokens // p
    seq_len = num_steps if p > 1 else cfg.num_tokens

    freqs = rope_table_2d(
        patch_center_coords_2d(cfg.resolution, cfg.down_size * cfg.patch_size),
        cfg.head_dim, cls_token_num=cfg.prefix_len)
    if p > 1:
        ps = int(math.isqrt(p))
        patch = freqs[cfg.prefix_len:]
        hh, ww = cfg.h // ps, cfg.w // ps
        patch = patch.reshape(hh, ps, ww, ps, *patch.shape[1:])
        patch = jnp.transpose(patch, (0, 2, 1, 3, 4, 5)).reshape(
            cfg.num_tokens, *freqs.shape[1:])
        freqs = jnp.concatenate([freqs[: cfg.prefix_len], patch], axis=0)

    c = jnp.take(params["cls_embedding"], cond, axis=0).reshape(
        b2, cfg.cls_token_num, cfg.dim)
    cache = _init_cache(cfg, b2, dtype=c.dtype, int8=kv_int8)

    # pre-stack head weights for the fused TPU sampler OUTSIDE the AR scan.
    # Callers should pass head_stacked built OUTSIDE jit (see
    # DiffHead._stack_for_sampler): when the stack/quantize chain is traced
    # into this program, XLA can rematerialize it into the scan bodies and
    # re-quantize the head weights every AR step (measured 4x slower).
    from bitdance_tpu.models.diff_head import make_fused_sampler

    head_sampler = make_fused_sampler(head, head_params,
                                      stacked=head_stacked)

    def head_sample(x, step, key):
        """x: [B2, p, dim]; step: traced position index."""
        pe = jax.lax.dynamic_slice(
            params["pos_for_diff"], (step * p, 0), (p, cfg.dim))
        x = x + pe[None]
        if cfg_schedule == "linear" and use_cfg:
            cfg_iter = 1.0 + (cfg_scale - 1.0) * step.astype(jnp.float32) / seq_len
        else:
            cfg_iter = jnp.float32(cfg_scale)
        if p == 1:
            x = x.reshape(-1, cfg.dim)
        pred = head_sampler(x, key, cfg_iter, num_sampling_steps,
                            cfg_mult=cfg_mult)
        pred = jnp.sign(pred)
        pred = jnp.where(pred == 0, 1.0, pred)
        return pred.reshape(n, p, cfg.token_dim)

    # prefill: cls tokens (+ query tokens), causal for all but the last
    # parallel window which is bidirectional (model_parallel.py:388)
    pre_w = max(((cfg.prefix_len + 7) // 8) * 8, 8)
    if p > 1:
        q = jnp.broadcast_to(params["query_token"][None], (b2, p - 1, cfg.dim))
        prefix = jnp.concatenate([c, q], axis=1)
        ncausal = cfg.cls_token_num - 1
        _, cache = _forward_cached(params, cfg, prefix[:, :ncausal],
                                   freqs[:ncausal], cache, jnp.int32(0), True,
                                   window=pre_w)
        x, cache = _forward_cached(params, cfg, prefix[:, ncausal:],
                                   freqs[ncausal: cfg.prefix_len], cache,
                                   jnp.int32(ncausal), False, window=pre_w)
    else:
        x, cache = _forward_cached(params, cfg, c, freqs[: cfg.cls_token_num],
                                   cache, jnp.int32(0), True, window=pre_w)
        x = x[:, -1:]

    key0, kscan = jax.random.split(rng)
    first = head_sample(x[:, -p:], jnp.int32(0), key0)

    def make_step_fn(window: int):
        def step_fn(carry, step):
            cache, last_pred, key = carry
            key, k1 = jax.random.split(key)
            emb = proj_in(params, last_pred)
            emb = jnp.concatenate([emb] * cfg_mult, axis=0)
            start = cfg.prefix_len + (step - 1) * p
            fslice = jax.lax.dynamic_slice(
                freqs, (start, 0, 0), (p, freqs.shape[1], freqs.shape[2]))
            # decode windows attend all cached context + themselves
            # bidirectionally
            x, cache = _forward_cached(params, cfg, emb, fslice, cache, start,
                                       causal_block=False, window=window)
            if p == 1:
                x = x[:, -1:]
            pred = head_sample(x[:, -p:], step, k1)
            return (cache, pred, key), pred

        return step_fn

    # Segmented AR scan: each segment's step compiles with a STATIC
    # attention window, so early steps never read (or pay HBM traffic for)
    # the dead tail of the ring buffer — the full-cache read was the
    # dominant backbone cost. 4 segments ~ 1.6x less cache traffic.
    n_seg = 4 if num_steps >= 8 else 1
    carry = (cache, first, kscan)
    rest_chunks = []
    prev = 1
    for i in range(1, n_seg + 1):
        end = 1 + (num_steps - 1) * i // n_seg
        if end <= prev:
            continue
        window = min((((cfg.prefix_len + (end - 1) * p) + 7) // 8) * 8,
                     cfg.prefix_len + cfg.num_tokens)
        carry, ys = jax.lax.scan(
            make_step_fn(window), carry,
            jnp.arange(prev, end, dtype=jnp.int32))
        rest_chunks.append(ys)
        prev = end
    all_preds = jnp.concatenate([first[None]] + rest_chunks, axis=0)
    # [num_steps, n, p, token_dim] -> [n, num_tokens, token_dim]
    out = jnp.transpose(all_preds, (1, 0, 2, 3)).reshape(
        n, cfg.num_tokens, cfg.token_dim)
    return out


def tokens_to_grid(cfg: ImageNetARConfig, tokens: jax.Array) -> jax.Array:
    """[B, num_tokens, token_dim] -> NHWC latents [B, h, w, latent_dim].

    Inverts patchify (model.py:235-243, row-major) or patchify_raster
    (utils.py:57-74, ps-tile order) depending on parallel mode; assumes
    patch_size == 1 for the raster mode like the reference.
    """
    b = tokens.shape[0]
    if cfg.parallel_num > 1:
        ps = int(math.isqrt(cfg.parallel_num))
        hh, ww = cfg.h // ps, cfg.w // ps
        x = tokens.reshape(b, hh, ww, ps, ps, cfg.token_dim)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
        return x.reshape(b, cfg.h, cfg.w, cfg.token_dim)
    p = cfg.patch_size
    # token dim is (c, p, q) channel-major like torch patchify (model.py:235-243)
    x = tokens.reshape(b, cfg.h, cfg.w, cfg.latent_dim, p, p)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))  # [b, h, p, w, q, c]
    return x.reshape(b, cfg.h * p, cfg.w * p, cfg.latent_dim)


def grid_to_tokens(cfg: ImageNetARConfig, latents: jax.Array) -> jax.Array:
    """NHWC latents -> [B, num_tokens, token_dim] (patchify / patchify_raster)."""
    b, h, w, c = latents.shape
    if cfg.parallel_num > 1:
        ps = int(math.isqrt(cfg.parallel_num))
        hh, ww = h // ps, w // ps
        x = latents.reshape(b, hh, ps, ww, ps, c)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
        return x.reshape(b, h * w, c)
    p = cfg.patch_size
    hh, ww = h // p, w // p
    x = latents.reshape(b, hh, p, ww, p, c)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4))  # [b, hh, ww, c, p, q] channel-major
    return x.reshape(b, hh * ww, c * p * p)
