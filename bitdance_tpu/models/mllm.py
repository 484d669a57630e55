"""Packed multimodal training model (the 14B T2I trainer contract).

Re-design of modeling/mllm.py:163-255 (MLLModel.forward_train): packed
sequences interleaving text tokens and image latent tokens, block-causal
attention for parallel prediction, text CE + vision flow-matching losses.

TPU-first differences from the reference:
  - fixed-shape packed batches (padded to a static token budget) so one
    compiled program serves every batch; padding is masked by doc_id = -1
    and zero loss weights instead of dynamic shapes.
  - index_copy becomes scatter (`.at[idx].set`); the attention mask is the
    (block_id, doc_id) model that the data pipeline precomputes per token
    (replacing flex-attention BlockMask materialization, mllm.py:197-208).
  - the frozen tokenizer encode runs outside this step (or latents arrive
    pre-cached); this function consumes ±1 latents directly.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from bitdance_tpu.models import qwen3 as q3
from bitdance_tpu.models.connector import MLPConnector
from bitdance_tpu.models.diff_head import DiffHead
from bitdance_tpu.ops.quantize import flip_bits_uniform_prob


@dataclasses.dataclass(frozen=True)
class MLLMConfig:
    llm: q3.Qwen3Config
    z_channels: int = 32
    vit_patch_size: int = 16
    parallel_num: int = 64
    head_model_dim: int = 5120
    head_num_blocks: int = 6
    head_num_adaln: int = 2
    head_use_swiglu: bool = True
    grad_checkpointing: bool = True
    # what the layer checkpoint saves: "full" recomputes everything (the
    # default — measured wall-clock-equal to "dots" on v5e and the only
    # option that fits the 33k budget in 16GB HBM), "dots" saves matmul
    # outputs for HBM-rich parts (see qwen3_forward docstring)
    remat_policy: str = "full"
    P_mean: float = -0.8
    P_std: float = 0.8
    time_shift: float = 1.0
    diff_batch_mul: int = 1
    vision_perturb: float = 0.1
    pe_max_len: int = 2048
    # static bound on live kv tiles per 256-token q tile for sparse-iteration
    # flash attention (None = dense). Size from the packer's max document
    # length: ceil(max_doc_tokens / 512) + 1. 3.5x attention speedup on the
    # 33k-token packed batch (benchmarks/bench_attention.py --docs 8).
    attn_max_live_kv: int | None = None

    @staticmethod
    def bitdance_14b(vocab_size: int = 152064, parallel_num: int = 64) -> "MLLMConfig":
        """train/configs/bitdance_14b_64x.yaml:1-35 (16x differs only in parallel_num)."""
        return MLLMConfig(
            llm=q3.Qwen3Config.qwen3_14b(vocab_size), parallel_num=parallel_num)


class PackedBatch(NamedTuple):
    """Fixed-shape packed training batch (the unreleased loader's contract,
    SURVEY.md §2.8 D3; field parity with mllm.py:163-184)."""

    packed_text_ids: jax.Array        # [T_text] int32 (padded)
    packed_text_indexes: jax.Array    # [T_text] int32 positions into sequence
    vision_latents: jax.Array         # [T_vis, z] ±1 (padded)
    vit_token_indexes: jax.Array      # [T_vis] int32 positions into sequence
    position_ids: jax.Array           # [L] int32 rope positions
    block_ids: jax.Array              # [L] int32 visibility blocks
    doc_ids: jax.Array                # [L] int32 (-1 for padding)
    ce_text_indexes: jax.Array        # [N_txt] int32 sequence positions
    ce_text_labels: jax.Array         # [N_txt] int32
    ce_text_weights: jax.Array        # [N_txt] fp32 (0 for padding)
    vision_loss_indexes: jax.Array    # [N_vis] int32 sequence positions
    vision_label_indexes: jax.Array   # [N_vis] int32 rows into vision_latents
    vision_loss_weights: jax.Array    # [N_vis] fp32 (0 for padding)
    vision_pos_embed: jax.Array       # [N_vis, hidden] 2D pos embed for head
    vision_input_pos_embed: jax.Array  # [T_vis, hidden] 2D pos embed for inputs


def make_head(cfg: MLLMConfig, dtype: Any = jnp.float32) -> DiffHead:
    return DiffHead(
        ch_target=cfg.z_channels,
        ch_cond=cfg.llm.hidden_size,
        ch_latent=cfg.head_model_dim,
        depth_latent=cfg.head_num_blocks,
        depth_adanln=cfg.head_num_adaln,
        time_shift=cfg.time_shift,
        P_mean=cfg.P_mean,
        P_std=cfg.P_std,
        parallel_num=cfg.parallel_num,
        diff_batch_mul=cfg.diff_batch_mul,
        use_swiglu=cfg.head_use_swiglu,
        attention=True,
        per_token_loss=True,
        dtype=dtype,
    )


def init_mllm_params(key: jax.Array, cfg: MLLMConfig,
                     dtype: Any = jnp.float32) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    llm = q3.init_qwen3_params(k1, cfg.llm, dtype)
    projector = MLPConnector(out_dim=cfg.llm.hidden_size, dtype=dtype)
    proj_params = projector.init(k2, jnp.zeros((1, cfg.z_channels)))
    head = make_head(cfg, dtype)
    p = cfg.parallel_num
    head_params = jax.jit(head.init)(
        k3, jnp.zeros((2, p, cfg.z_channels)),
        jnp.zeros((2, p, cfg.llm.hidden_size)), k4)
    return {"llm": llm, "projector": proj_params, "head": head_params}


def _assemble_seq(params: dict, cfg: MLLMConfig, batch: PackedBatch,
                  k_perturb: jax.Array, train: bool) -> jax.Array:
    """Scatter text embeds + projected vision latents into one packed
    sequence [L, D] (mllm.py:163-228's index_copy assembly)."""
    D = cfg.llm.hidden_size
    L = batch.position_ids.shape[0]

    text_emb = q3.embed_tokens(params["llm"], batch.packed_text_ids)
    seq = jnp.zeros((L, D), text_emb.dtype)
    seq = seq.at[batch.packed_text_indexes].set(text_emb)

    latents = batch.vision_latents
    if train and cfg.vision_perturb > 0:
        # perturb only to-be-generated latents (mllm.py:909-916)
        flipped = flip_bits_uniform_prob(k_perturb, latents, cfg.vision_perturb)
        gen_mask = jnp.zeros((latents.shape[0],), bool).at[
            batch.vision_label_indexes].set(batch.vision_loss_weights > 0)
        latents_in = jnp.where(gen_mask[:, None], flipped, latents)
    else:
        latents_in = latents

    projector = MLPConnector(out_dim=D, dtype=text_emb.dtype)
    vis_emb = projector.apply(params["projector"], latents_in)
    # 2D pos-embed on vision input embeds (mllm.py:920-928)
    vis_emb = vis_emb + batch.vision_input_pos_embed.astype(vis_emb.dtype)
    return seq.at[batch.vit_token_indexes].set(vis_emb.astype(seq.dtype))


def _losses_from_hidden(params: dict, cfg: MLLMConfig, batch: PackedBatch,
                        hidden: jax.Array, k_head: jax.Array) -> dict:
    """Per-sequence weighted-mean losses from LLM output hidden [L, D]."""
    D = cfg.llm.hidden_size

    # --- text CE ------------------------------------------------------------
    txt_hidden = hidden[batch.ce_text_indexes]
    lm_w = params["llm"].get("lm_head")
    if lm_w is None:
        lm_w = params["llm"]["embed_tokens"].T
    if cfg.llm.vocab_size > 32768:
        # chunked CE: never materialize [N, 152k] logits (liger CE parity)
        from bitdance_tpu.ops.chunked_ce import chunked_cross_entropy

        nll = chunked_cross_entropy(txt_hidden, lm_w, batch.ce_text_labels)
    else:
        logits = (txt_hidden @ lm_w).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, batch.ce_text_labels[:, None],
                                   axis=-1)[:, 0]
    wsum = jnp.maximum(jnp.sum(batch.ce_text_weights), 1e-6)
    ce_loss_text = jnp.sum(nll * batch.ce_text_weights) / wsum

    # --- vision flow-matching loss -------------------------------------------
    p = cfg.parallel_num
    vis_hidden = hidden[batch.vision_loss_indexes] + batch.vision_pos_embed.astype(
        hidden.dtype)
    # labels are the CLEAN latents; bit-flip perturbation only touches the
    # model inputs in _assemble_seq (mllm.py:909-916)
    vis_labels = batch.vision_latents[batch.vision_label_indexes]
    cond = vis_hidden.reshape(-1, p, D)
    target = vis_labels.reshape(-1, p, cfg.z_channels)
    if cfg.diff_batch_mul > 1:
        cond = jnp.tile(cond, (cfg.diff_batch_mul, 1, 1))
        target = jnp.tile(target, (cfg.diff_batch_mul, 1, 1))
    head = make_head(cfg, dtype=hidden.dtype)
    per_token = head.apply(params["head"], target, cond, k_head)  # [N/p, p]
    vw = batch.vision_loss_weights.reshape(-1, p)
    if cfg.diff_batch_mul > 1:
        vw = jnp.tile(vw, (cfg.diff_batch_mul, 1))
    vsum = jnp.maximum(jnp.sum(vw), 1e-6)
    ce_loss_vision = jnp.sum(per_token * vw) / vsum

    return {"ce_loss_text": ce_loss_text, "ce_loss_vision": ce_loss_vision}


def mllm_forward_train(
    params: dict,
    cfg: MLLMConfig,
    batch: PackedBatch,
    rng: jax.Array,
    train: bool = True,
) -> dict:
    """Returns {'ce_loss_text', 'ce_loss_vision'} scalars (weighted means)
    for ONE packed sequence (fields unbatched).

    Mirrors mllm.py:163-255; the driver applies loss_weight_text=0.01 /
    loss_weight_vision=1.0 (bitdance_14b_64x.yaml:86-87).
    """
    k_perturb, k_head = jax.random.split(rng)
    seq = _assemble_seq(params, cfg, batch, k_perturb, train)
    hidden = q3.qwen3_forward(
        params["llm"], cfg.llm, seq[None], batch.position_ids[None],
        batch.block_ids[None], batch.doc_ids[None],
        remat=(train and cfg.grad_checkpointing),
        max_live_kv=cfg.attn_max_live_kv,
        remat_policy=cfg.remat_policy,
    )[0]  # [L, D]
    return _losses_from_hidden(params, cfg, batch, hidden, k_head)


def mllm_forward_train_batched(
    params: dict,
    cfg: MLLMConfig,
    batch: PackedBatch,
    rng: jax.Array,
    train: bool = True,
    seq_offset: jax.Array | int = 0,
) -> dict:
    """Batched packed forward: every PackedBatch field carries a leading
    batch axis [B, ...] (one packed sequence per data-parallel shard).

    The LLM runs ONCE on [B, L, D] (the MXU-friendly layout) rather than
    vmapping the whole model; sequence assembly and loss heads are vmapped.
    Loss semantics match DDP/HSDP gradient averaging: per-sequence weighted
    means, then an unweighted mean over sequences (fsdp_utils.py:80-104 —
    each rank computes its own weighted mean and gradients are averaged).

    Per-sequence rng is folded by GLOBAL sequence index (seq_offset + row),
    not split by batch size, so splitting a fixed set of sequences between
    the batch axis and grad-accum microbatches is bit-invariant (the
    accumulating caller passes seq_offset = microbatch_index * B).
    """
    B = batch.position_ids.shape[0]
    k_perturb, k_head = jax.random.split(rng)
    idx = jnp.asarray(seq_offset, jnp.int32) + jnp.arange(B, dtype=jnp.int32)
    perturb_keys = jax.vmap(jax.random.fold_in, (None, 0))(k_perturb, idx)
    head_keys = jax.vmap(jax.random.fold_in, (None, 0))(k_head, idx)

    seq = jax.vmap(
        lambda b, k: _assemble_seq(params, cfg, b, k, train),
        in_axes=(0, 0))(batch, perturb_keys)           # [B, L, D]
    hidden = q3.qwen3_forward(
        params["llm"], cfg.llm, seq, batch.position_ids,
        batch.block_ids, batch.doc_ids,
        remat=(train and cfg.grad_checkpointing),
        max_live_kv=cfg.attn_max_live_kv,
        remat_policy=cfg.remat_policy,
    )                                                   # [B, L, D]
    outs = jax.vmap(
        lambda b, h, k: _losses_from_hidden(params, cfg, b, h, k),
        in_axes=(0, 0, 0))(batch, hidden, head_keys)
    return {k: jnp.mean(v) for k, v in outs.items()}
