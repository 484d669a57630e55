"""Qwen3 decoder backbone, TPU-native.

Functional re-implementation of the HF Qwen3 architecture used by the 14B
T2I model (modeling/t2i_pipeline.py:48-51, modeling/llm/*). Design choices
for TPU rather than a port:

  - parameters are a pytree with per-layer tensors STACKED on a leading axis
    and the layer loop is a single `lax.scan` — one compiled layer body,
    trivial FSDP/TP sharding of the stacked axes, fast compiles.
  - KV caches are fixed-shape ring buffers [L, B, max_len, kvh, hd] updated
    with `dynamic_update_slice`; decode masks come from per-row valid windows
    (left-padded prompts), so the cond and uncond CFG streams batch into ONE
    forward instead of the reference's two sequential calls.
  - attention runs through the (block_id, doc_id) mask model
    (bitdance_tpu/ops/attention.py): causal prefill, block-bidirectional
    64-token decode (t2i_pipeline.py:206-216), and packed training masks are
    all the same kernel.

Architecture facts (HF Qwen3ForCausalLM): GQA with per-head q/k RMSNorm,
half-rotate RoPE, SwiGLU MLP, RMSNorm(eps 1e-6), no attention bias.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from bitdance_tpu.ops.attention import attention_xla, masked_attention
from bitdance_tpu.ops.decode_attention import windowed_decode_attention
from bitdance_tpu.ops.int8 import QTensor, dequantize, mm, quantize_linear
from bitdance_tpu.ops.norms import rms_norm
from bitdance_tpu.ops.rotary import apply_rope_half


@dataclasses.dataclass(frozen=True)
class Qwen3Config:
    vocab_size: int = 151936
    hidden_size: int = 5120
    intermediate_size: int = 17408
    num_hidden_layers: int = 40
    num_attention_heads: int = 40
    num_key_value_heads: int = 8
    head_dim: int = 128
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1000000.0
    tie_word_embeddings: bool = False
    max_position_embeddings: int = 40960

    @staticmethod
    def qwen3_14b(vocab_size: int = 151936) -> "Qwen3Config":
        return Qwen3Config(vocab_size=vocab_size)

    @staticmethod
    def tiny(vocab_size: int = 512) -> "Qwen3Config":
        return Qwen3Config(
            vocab_size=vocab_size, hidden_size=128, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=32,
        )


import functools


@functools.partial(jax.jit, static_argnums=(1, 2))
def init_qwen3_params(key: jax.Array, cfg: Qwen3Config,
                      dtype: Any = jnp.float32) -> dict:
    """Random-init parameter pytree (layer tensors stacked on axis 0).

    Jitted as a whole: eager per-op dispatch over the device tunnel makes
    unfused initializers pathologically slow (see .claude/skills/verify).
    """
    L, D = cfg.num_hidden_layers, cfg.hidden_size
    hq, hkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    I = cfg.intermediate_size
    keys = jax.random.split(key, 12)

    def norm_init(shape):
        return jnp.ones(shape, dtype)

    def dense(key, shape, scale=0.02):
        return (jax.random.normal(key, shape) * scale).astype(dtype)

    params = {
        "embed_tokens": dense(keys[0], (cfg.vocab_size, D)),
        "final_norm": norm_init((D,)),
        "layers": {
            "q_proj": dense(keys[1], (L, D, hq * hd)),
            "k_proj": dense(keys[2], (L, D, hkv * hd)),
            "v_proj": dense(keys[3], (L, D, hkv * hd)),
            "o_proj": dense(keys[4], (L, hq * hd, D)),
            "q_norm": norm_init((L, hd)),
            "k_norm": norm_init((L, hd)),
            "input_layernorm": norm_init((L, D)),
            "post_attention_layernorm": norm_init((L, D)),
            "gate_proj": dense(keys[5], (L, D, I)),
            "up_proj": dense(keys[6], (L, D, I)),
            "down_proj": dense(keys[7], (L, I, D)),
        },
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = dense(keys[8], (D, cfg.vocab_size))
    return params


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def init_qwen3_params_int8(key: jax.Array, cfg: Qwen3Config,
                           dtype: Any = jnp.bfloat16,
                           with_lm_head: bool = False) -> dict:
    """Random-init directly into int8 layer weights (bench/memory path).

    Materializing a bf16 14B model and then quantizing would peak at the
    full bf16 footprint (26+GB — never fits one chip); here each layer is
    generated and quantized inside one `lax.map` step, so the bf16
    transient never exceeds a single layer's largest matrix (~356MB).
    Real released weights should instead be quantized shard-by-shard at
    load time (io/torch_import.py streams per-tensor).
    """
    D = cfg.hidden_size
    hq, hkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    I = cfg.intermediate_size
    k_embed, k_head, k_layers = jax.random.split(key, 3)

    def qdense(k, shape, scale=0.02):
        return quantize_linear((jax.random.normal(k, shape) * scale
                                ).astype(dtype))

    def one_layer(k):
        ks = jax.random.split(k, 7)
        return {
            "q_proj": qdense(ks[0], (D, hq * hd)),
            "k_proj": qdense(ks[1], (D, hkv * hd)),
            "v_proj": qdense(ks[2], (D, hkv * hd)),
            "o_proj": qdense(ks[3], (hq * hd, D)),
            "gate_proj": qdense(ks[4], (D, I)),
            "up_proj": qdense(ks[5], (D, I)),
            "down_proj": qdense(ks[6], (I, D)),
            "q_norm": jnp.ones((hd,), dtype),
            "k_norm": jnp.ones((hd,), dtype),
            "input_layernorm": jnp.ones((D,), dtype),
            "post_attention_layernorm": jnp.ones((D,), dtype),
        }

    layers = jax.lax.map(one_layer,
                         jax.random.split(k_layers, cfg.num_hidden_layers))
    params = {
        # int8 embedding table: 0.78GB instead of 1.56GB bf16 at 152k x 5120
        # (embed_tokens dequantizes the gathered rows only)
        "embed_tokens": qdense(k_embed, (cfg.vocab_size, D)),
        "final_norm": jnp.ones((D,), dtype),
        "layers": layers,
    }
    if with_lm_head and not cfg.tie_word_embeddings:
        params["lm_head"] = qdense(k_head, (D, cfg.vocab_size))
    return params


@functools.partial(jax.jit, static_argnums=(1, 2))
def init_qwen3_params_int4(key: jax.Array, cfg: Qwen3Config,
                           dtype: Any = jnp.bfloat16) -> dict:
    """Random-init directly into packed-int4 layer weights + int8 embed.

    The FULL 40-layer 14B stack is 13.2GB at int8 and does not fit a 16GB
    chip next to the embed table / head / KV cache; int4-packed it is 6.6GB
    — the single-chip full-model serving config (ops/int4.py). Same
    layer-at-a-time materialization discipline as init_qwen3_params_int8.
    """
    from bitdance_tpu.ops.int4 import quantize_linear_int4

    D = cfg.hidden_size
    hq, hkv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                   cfg.head_dim)
    I = cfg.intermediate_size
    k_embed, k_layers = jax.random.split(key, 2)

    def q4dense(k, shape, scale=0.02):
        return quantize_linear_int4(
            (jax.random.normal(k, shape) * scale).astype(dtype))

    def one_layer(k):
        ks = jax.random.split(k, 7)
        return {
            "q_proj": q4dense(ks[0], (D, hq * hd)),
            "k_proj": q4dense(ks[1], (D, hkv * hd)),
            "v_proj": q4dense(ks[2], (D, hkv * hd)),
            "o_proj": q4dense(ks[3], (hq * hd, D)),
            "gate_proj": q4dense(ks[4], (D, I)),
            "up_proj": q4dense(ks[5], (D, I)),
            "down_proj": q4dense(ks[6], (I, D)),
            "q_norm": jnp.ones((hd,), dtype),
            "k_norm": jnp.ones((hd,), dtype),
            "input_layernorm": jnp.ones((D,), dtype),
            "post_attention_layernorm": jnp.ones((D,), dtype),
        }

    layers = jax.lax.map(one_layer,
                         jax.random.split(k_layers, cfg.num_hidden_layers))
    return {
        # embedding stays int8: the gather is row-granular, and nibble
        # packing pairs rows k and k+V/2, which would split every lookup
        "embed_tokens": quantize_linear(
            (jax.random.normal(k_embed, (cfg.vocab_size, D)) * 0.02
             ).astype(dtype)),
        "final_norm": jnp.ones((D,), dtype),
        "layers": layers,
    }


def quantize_qwen3_params_int4(params: dict,
                               quantize_embed: bool = True) -> dict:
    """Packed-int4 quantization of the per-layer matmul weights (capacity
    lever for full-depth single-chip serving; see ops/int4.py). The embed
    table goes to int8 (row-granular gather), norms keep their dtype."""
    from bitdance_tpu.ops.int4 import quantize_linear_int4

    layers = dict(params["layers"])
    for k in _QUANT_LAYER_KEYS:
        w = layers[k]
        layers[k] = quantize_linear_int4(
            dequantize(w) if isinstance(w, QTensor) else w)
    out = dict(params, layers=layers)
    out.pop("lm_head", None)  # generation never touches it
    if quantize_embed and not isinstance(params["embed_tokens"], QTensor):
        out["embed_tokens"] = quantize_linear(params["embed_tokens"])
    return out


def init_kv_cache(cfg: Qwen3Config, batch: int, max_len: int,
                  dtype: Any = jnp.float32, int8: bool = False) -> dict:
    """HEAD-MAJOR ring buffers [L, B, Hkv, max_len, D] — kv tiles then map
    directly onto Mosaic's (sublane, lane) tiling in the flash-decode kernel
    with zero transposes in the hot loop.

    int8=True fuses k|v into ONE [.., max_len, 2D] int8 buffer with
    per-(head, position) scales (ops/decode_attention.py::quantize_kv_rows)
    — 4x smaller than two bf16 buffers and the decode kernel reads both
    halves of each tile in a single pass."""
    L, H = cfg.num_hidden_layers, cfg.num_key_value_heads
    if int8:
        return {
            "kv": jnp.zeros((L, batch, H, max_len, 2 * cfg.head_dim),
                            jnp.int8),
            "sc": jnp.zeros((L, batch, H, 2, max_len), jnp.float32),
        }
    shape = (L, batch, H, max_len, cfg.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def _rope_at(cfg: Qwen3Config, positions: jax.Array):
    """cos/sin at given positions. positions: [B, S] int32 -> [B, S, hd//2]."""
    hd = cfg.head_dim
    inv_freq = 1.0 / (
        cfg.rope_theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd)
    )
    ang = positions.astype(jnp.float32)[..., None] * inv_freq
    return jnp.cos(ang), jnp.sin(ang)


def _mlp(lp: dict, x: jax.Array) -> jax.Array:
    gate = mm(x, lp["gate_proj"])
    up = mm(x, lp["up_proj"])
    return mm(jax.nn.silu(gate) * up, lp["down_proj"])


# Matrices that carry ~99% of the non-embedding bytes; everything else
# (norm gains) stays in its original dtype.
_QUANT_LAYER_KEYS = ("q_proj", "k_proj", "v_proj", "o_proj",
                     "gate_proj", "up_proj", "down_proj")


def quantize_qwen3_params(params: dict, quantize_lm_head: bool = True,
                          quantize_embed: bool = False) -> dict:
    """Int8-quantize the per-layer matmul weights (and optionally lm_head).

    Inference-only: halves decode-phase weight HBM traffic and runs the
    dots on the MXU's native s8 path (see ops/int8.py). The returned pytree
    drops into every qwen3_* entry point unchanged — `mm` dispatches on
    leaf type.

    quantize_embed=True also stores the embedding table as int8 with
    per-hidden-column scales (a 152k x 5120 table is 1.56GB bf16 — the
    second-largest buffer after the layer stack at 14B width; the gather
    dequantizes the looked-up rows only). Off by default: the embedding is
    read once per token, so this is a memory lever, not a bandwidth one.
    """
    layers = dict(params["layers"])
    for k in _QUANT_LAYER_KEYS:
        layers[k] = quantize_linear(layers[k])
    out = dict(params, layers=layers)
    if quantize_lm_head and "lm_head" in params:
        out["lm_head"] = quantize_linear(params["lm_head"])
    if quantize_embed:
        out["embed_tokens"] = quantize_linear(params["embed_tokens"])
    return out


def qwen3_forward(
    params: dict,
    cfg: Qwen3Config,
    embeds: jax.Array,
    positions: jax.Array,
    block_ids: jax.Array,
    doc_ids: jax.Array,
    attn_impl: str = "auto",
    remat: bool = False,
    max_live_kv: int | None = None,
    remat_policy: str = "full",
) -> jax.Array:
    """Full (uncached) forward over packed/padded embeds.

    embeds: [B, S, D]; positions/block_ids/doc_ids: [B, S].
    Returns final-norm hidden states [B, S, D].
    remat=True rematerializes each layer in the backward pass
    (jax.checkpoint over the scan body — the TPU equivalent of the
    reference's grad_checkpointing flags), trading FLOPs for HBM.
    remat_policy selects what the checkpoint saves: "full" recomputes
    everything (max memory savings), "dots" saves matmul outputs
    (dots_with_no_batch_dims_saveable), costing ~O(S*D) HBM per layer.
    Measured on v5e-1 (0.7B-class, 16k-token packed batch) the two are
    wall-clock-equal — the backward is dominated by its own grad matmuls,
    not recompute — and "dots" OOMs 16GB HBM at the 33k yaml budget, so
    "full" is the default; "dots" is for HBM-rich parts (v5p 95GB).
    max_live_kv enables sparse kv-tile iteration for packed training
    (see ops/attention.py::flash_attention_sparse).
    """
    cos, sin = _rope_at(cfg, positions)

    def layer(x, lp):
        b, s, _ = x.shape
        hq, hkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
        h = rms_norm(x, lp["input_layernorm"], cfg.rms_norm_eps)
        q = rms_norm(mm(h, lp["q_proj"]).reshape(b, s, hq, hd), lp["q_norm"],
                     cfg.rms_norm_eps)
        k = rms_norm(mm(h, lp["k_proj"]).reshape(b, s, hkv, hd), lp["k_norm"],
                     cfg.rms_norm_eps)
        v = mm(h, lp["v_proj"]).reshape(b, s, hkv, hd)
        q = apply_rope_half(q, cos, sin)
        k = apply_rope_half(k, cos, sin)
        attn = masked_attention(q, k, v, block_ids, doc_ids, block_ids, doc_ids,
                                implementation=attn_impl,
                                max_live_kv=max_live_kv)
        x = x + mm(attn.reshape(b, s, hq * hd), lp["o_proj"])
        h = rms_norm(x, lp["post_attention_layernorm"], cfg.rms_norm_eps)
        x = x + _mlp(lp, h)
        return x, None

    if remat and remat_policy == "dots":
        body = jax.checkpoint(
            layer, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    elif remat:
        body = jax.checkpoint(layer)
    else:
        body = layer
    x, _ = jax.lax.scan(body, embeds, params["layers"])
    return rms_norm(x, params["final_norm"], cfg.rms_norm_eps)


def qwen3_forward_cached(
    params: dict,
    cfg: Qwen3Config,
    embeds: jax.Array,
    positions: jax.Array,
    cache: dict,
    cache_len: jax.Array,
    kv_start: jax.Array,
    causal_block: bool,
) -> tuple[jax.Array, dict]:
    """Forward a block of S new tokens against the KV cache.

    embeds: [B, S, D]; positions: [B, S]; cache: ring buffers; cache_len:
    scalar int32 — tokens already in the cache (same for all rows; rows are
    left-padded so shorter prompts have masked slots at the start, given by
    kv_start: [B]).

    causal_block=False -> the new block attends bidirectionally to itself and
    everything in the cache (the reference's all-ones decode mask,
    t2i_pipeline.py:206-216). causal_block=True -> standard causal prefill.

    Returns (hidden [B, S, D], updated cache).
    """
    b, s, _ = embeds.shape
    hq, hkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    int8_cache = "kv" in cache
    max_len = (cache["kv"] if int8_cache else cache["k"]).shape[3]
    cos, sin = _rope_at(cfg, positions)

    new_len = cache_len + s
    pos_idx = jnp.arange(max_len, dtype=jnp.int32)

    mask = None
    if causal_block:
        # key j visible to query i iff kv_start <= j <= cache_len + i
        q_abs = cache_len + jnp.arange(s, dtype=jnp.int32)  # [S]
        mask = (pos_idx[None, None, :] >= kv_start[:, None, None]) & (
            pos_idx[None, None, :] <= q_abs[None, :, None]
        )  # [B, S, max_len]
        mask = mask[:, None]  # [B, 1, S, max_len]
    kv_len_vec = jnp.broadcast_to(new_len, (b,)).astype(jnp.int32)

    # Caches ride in the scan CARRY: carry buffers alias across iterations
    # so per-layer dynamic_update_slice writes in place; xs->ys cache pairs
    # cannot alias and were copying the full cache each decode step (this
    # was the dominant cost of the sampling loop).
    def layer(carry, lp):
        x, buf_a, buf_b, li = carry
        h = rms_norm(x, lp["input_layernorm"], cfg.rms_norm_eps)
        q = rms_norm(mm(h, lp["q_proj"]).reshape(b, s, hq, hd), lp["q_norm"],
                     cfg.rms_norm_eps)
        k = rms_norm(mm(h, lp["k_proj"]).reshape(b, s, hkv, hd), lp["k_norm"],
                     cfg.rms_norm_eps)
        v = mm(h, lp["v_proj"]).reshape(b, s, hkv, hd)
        q = apply_rope_half(q, cos, sin)
        k = apply_rope_half(k, cos, sin)

        def layer_slice(buf):
            return jax.lax.dynamic_slice(
                buf, (li,) + (0,) * (buf.ndim - 1), (1,) + buf.shape[1:])[0]

        if int8_cache:
            from bitdance_tpu.ops.decode_attention import (
                dequantize_fused_kv,
                quantize_kv_rows,
                windowed_decode_attention_fusedkv,
            )

            kv_new, sc_new = quantize_kv_rows(k, v)      # [B,H,s,2D]/[B,H,2,s]
            buf_a = jax.lax.dynamic_update_slice(
                buf_a, kv_new[None], (li, 0, 0, cache_len, 0))
            buf_b = jax.lax.dynamic_update_slice(
                buf_b, sc_new[None], (li, 0, 0, 0, cache_len))
            kv_l = layer_slice(buf_a)
            sc_l = layer_slice(buf_b)
            if causal_block:
                kd, vd = dequantize_fused_kv(kv_l, sc_l)
                attn = attention_xla(
                    q, jnp.transpose(kd, (0, 2, 1, 3)).astype(q.dtype),
                    jnp.transpose(vd, (0, 2, 1, 3)).astype(q.dtype), mask)
            else:
                attn = windowed_decode_attention_fusedkv(
                    q, kv_l, kv_len_vec, kv_start, sc_l)
        else:
            k_hm = jnp.transpose(k, (0, 2, 1, 3)).astype(buf_a.dtype)
            v_hm = jnp.transpose(v, (0, 2, 1, 3)).astype(buf_b.dtype)
            buf_a = jax.lax.dynamic_update_slice(buf_a, k_hm[None],
                                                 (li, 0, 0, cache_len, 0))
            buf_b = jax.lax.dynamic_update_slice(buf_b, v_hm[None],
                                                 (li, 0, 0, cache_len, 0))
            k_cache = layer_slice(buf_a)
            v_cache = layer_slice(buf_b)
            if causal_block:
                attn = attention_xla(q, jnp.transpose(k_cache, (0, 2, 1, 3)),
                                     jnp.transpose(v_cache, (0, 2, 1, 3)),
                                     mask)
            else:
                # bidirectional decode window: flash-decode Pallas kernel
                attn = windowed_decode_attention(q, k_cache, v_cache,
                                                 kv_len_vec, kv_start)
        x = x + mm(attn.astype(x.dtype).reshape(b, s, hq * hd), lp["o_proj"])
        h = rms_norm(x, lp["post_attention_layernorm"], cfg.rms_norm_eps)
        x = x + _mlp(lp, h)
        return (x, buf_a, buf_b, li + 1), None

    bufs = (cache["kv"], cache["sc"]) if int8_cache \
        else (cache["k"], cache["v"])
    (x, new_a, new_b, _), _ = jax.lax.scan(
        layer, (embeds,) + bufs + (jnp.int32(0),), params["layers"])
    hidden = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    if int8_cache:
        return hidden, {"kv": new_a, "sc": new_b}
    return hidden, {"k": new_a, "v": new_b}


def embed_tokens(params: dict, token_ids: jax.Array) -> jax.Array:
    w = params["embed_tokens"]
    if isinstance(w, QTensor):
        # int8 table: gather rows, then dequantize just the looked-up rows
        rows = jnp.take(w.q, token_ids, axis=0).astype(jnp.float32)
        return (rows * w.s).astype(jnp.bfloat16)
    return jnp.take(w, token_ids, axis=0)


def lm_logits(params: dict, cfg: Qwen3Config, hidden: jax.Array) -> jax.Array:
    w = params.get("lm_head")
    if w is None:
        w = params["embed_tokens"]
        if isinstance(w, QTensor):
            from bitdance_tpu.ops.int8 import dequantize

            w = dequantize(w, hidden.dtype)
        w = w.T
    return mm(hidden, w).astype(jnp.float32)
