"""Text-to-image generation pipeline (next-patch diffusion decode).

TPU-native re-design of BitDanceT2IPipeline.gen_image (t2i_pipeline.py:157-272):

  - the ENTIRE generation — two-phase prefill, 64 AR decode steps, each with a
    50-step diffusion-head sampler — is one jitted program per
    (image-bucket, prompt-bucket) pair: outer `lax.scan` over AR steps, inner
    `lax.scan` inside the sampler. Zero host round-trips in the hot loop.
  - cond and uncond CFG streams are BATCHED into one forward (rows
    [cond*n; uncond*n], left-padded prompts with per-row kv_start masks)
    instead of the reference's two sequential LLM calls per step.
  - decode attention uses the all-ones-over-valid-keys mask
    (t2i_pipeline.py:206-216) via the cached block-decode path.

Sequence layout per row (left-padded to prompt bucket P):
  [pad .. pad, prompt, vision_start, res_h, res_w, query_1..query_{p-1},
   image tokens (h*w of them, p per step)]
The first prefill pass is causal over [.., prompt, vision_start, res_h];
the second covers [res_w, queries] bidirectionally (they form the first
parallel block, whose hidden states condition the first 64 image tokens).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from bitdance_tpu.models import qwen3 as q3
from bitdance_tpu.models.connector import MLPConnector
from bitdance_tpu.models.diff_head import DiffHead
from bitdance_tpu.models.tokenizer import VQModel, tokens_to_latents
from bitdance_tpu.ops.quantize import sign_quantize
from bitdance_tpu.ops.rotary import pos_embed_2d, sincos_1d_table


@dataclasses.dataclass
class T2IModelBundle:
    """All model defs + params for generation."""

    llm_cfg: q3.Qwen3Config
    llm_params: dict
    ae: VQModel
    ae_params: dict
    head: DiffHead
    head_params: dict
    projector: MLPConnector
    projector_params: dict
    parallel_num: int
    hidden_size: int
    vae_patch_size: int
    pe_max_len: int = 4096
    # pre-stacked (optionally int8) head weights for the TPU samplers. At
    # 14B width the flax tree (3.1GB) plus in-trace stacked copies would
    # double head residency; building the stack ONCE (in weight-load order,
    # before the LLM) and passing head_params=None keeps one copy live.
    head_stacked: dict | None = None

    @property
    def ps(self) -> int:
        return int(self.parallel_num ** 0.5)


def build_pos_table(bundle: T2IModelBundle) -> jax.Array:
    """1D sincos table [pe_max_len // vae_patch_size, hidden//2] (t2i_pipeline.py:79-83)."""
    max_len = bundle.pe_max_len // bundle.vae_patch_size
    return sincos_1d_table(bundle.hidden_size // 2, max_len)


def prefill_t2i(
    bundle: T2IModelBundle,
    prompt_ids: jax.Array,       # [2n, P] left-padded (cond rows then uncond)
    prompt_pad: jax.Array,       # [2n] number of left pads per row
    img_start_ids: jax.Array,    # [2 + parallel_num] vision_start,res_h,res_w,queries
    *,
    latent_h: int,
    latent_w: int,
    num_images: int,
    kv_int8: bool = False,
):
    """Both prefill passes; returns (cache, hidden [2n, p, D]).

    Split from the decode scan so the serving caller can jit decode with a
    DONATED cache: inside one program XLA inserts a full-cache copy at the
    while-loop carry boundary (1.8GB at 4-image 14B/1024px — the buffer
    that decides how many images fit per chip)."""
    cfg = bundle.llm_cfg
    p = bundle.parallel_num
    n2 = 2 * num_images
    P = prompt_ids.shape[1]
    max_len = latent_h * latent_w
    cache_max = P + 2 + p + max_len

    # ---- embeddings -------------------------------------------------------
    prompt_emb = q3.embed_tokens(bundle.llm_params, prompt_ids)  # [2n, P, D]
    start_emb = q3.embed_tokens(bundle.llm_params, img_start_ids)  # [2+p, D]
    start_emb = jnp.broadcast_to(start_emb[None], (n2, 2 + p, start_emb.shape[-1]))
    seq_emb = jnp.concatenate([prompt_emb, start_emb], axis=1)  # [2n, P+2+p, D]

    # positions: 0-based from true prompt start (left pads get clamped 0)
    idx = jnp.arange(P + 2 + p, dtype=jnp.int32)[None]
    positions = jnp.maximum(idx - prompt_pad[:, None], 0)

    # kv_int8: fused int8 ring buffer — 4x smaller than bf16 k+v (an HBM
    # saving for many-image batches; bf16 reads faster when it fits)
    cache = q3.init_kv_cache(cfg, n2, cache_max, dtype=prompt_emb.dtype,
                             int8=kv_int8)
    kv_start = prompt_pad

    # ---- prefill pass 1: causal over [prompt, vision_start, res_h] --------
    pre1 = P + 2
    _, cache = q3.qwen3_forward_cached(
        bundle.llm_params, cfg, seq_emb[:, :pre1], positions[:, :pre1],
        cache, jnp.int32(0), kv_start, causal_block=True,
    )
    # ---- prefill pass 2: [res_w, queries] bidirectional block --------------
    hidden, cache = q3.qwen3_forward_cached(
        bundle.llm_params, cfg, seq_emb[:, pre1:], positions[:, pre1:],
        cache, jnp.int32(pre1), kv_start, causal_block=False,
    )  # [2n, p, D]
    return cache, hidden


def decode_t2i(
    bundle: T2IModelBundle,
    cache: dict,                 # donate me
    hidden: jax.Array,           # [2n, p, D] from prefill_t2i
    prompt_pad: jax.Array,       # [2n]
    pos_embed_for_diff: jax.Array,  # [h*w, hidden] ps-raster ordered
    rng: jax.Array,
    *,
    prompt_len: int,
    latent_h: int,
    latent_w: int,
    num_images: int,
    guidance_scale: jax.Array | float,
    num_sampling_steps: int,
) -> jax.Array:
    """AR decode scan; returns ±1 tokens [n, h*w, z_channels]."""
    cfg = bundle.llm_cfg
    p = bundle.parallel_num
    max_len = latent_h * latent_w
    num_steps = max_len // p
    pre1 = prompt_len + 2
    kv_start = prompt_pad

    pos_diff = pos_embed_for_diff.astype(hidden.dtype)  # [h*w, D]

    # pre-stack head weights for the fused TPU sampler OUTSIDE the AR scan
    # (XLA does not hoist the stacking out of lax.scan reliably)
    from bitdance_tpu.models.diff_head import make_fused_sampler

    head_sampler = make_fused_sampler(bundle.head, bundle.head_params,
                                      stacked=bundle.head_stacked)

    def decode_step(carry, step):
        cache, hidden, key = carry
        key, k_samp = jax.random.split(key)
        pe = jax.lax.dynamic_slice(
            pos_diff, (step * p, 0), (p, pos_diff.shape[1])
        )  # [p, D]
        h_fused = hidden + pe[None]

        pred = head_sampler(
            h_fused, k_samp, jnp.float32(guidance_scale),
            num_sampling_steps, cfg_mult=2,
        )  # [n, p, z]
        tokens = sign_quantize(pred)

        emb = bundle.projector.apply(bundle.projector_params, tokens)
        emb = (emb + pe[None]).astype(hidden.dtype)
        model_input = jnp.concatenate([emb, emb], axis=0)  # cond/uncond share

        cache_len = pre1 + p + step * p
        pos = (cache_len + jnp.arange(p, dtype=jnp.int32))[None] - prompt_pad[:, None]
        new_hidden, cache = q3.qwen3_forward_cached(
            bundle.llm_params, cfg, model_input, pos,
            cache, cache_len, kv_start, causal_block=False,
        )
        return (cache, new_hidden, key), tokens

    (cache, _, _), all_tokens = jax.lax.scan(
        decode_step, (cache, hidden, rng), jnp.arange(num_steps, dtype=jnp.int32)
    )  # [num_steps, n, p, z]

    z = all_tokens.shape[-1]
    out = jnp.transpose(all_tokens, (1, 0, 2, 3)).reshape(num_images, max_len, z)
    # the (dead) final cache is returned ONLY as the donation target: without
    # a cache output, donate_argnums has nothing to alias the input to, the
    # input stays read-only, and XLA copies the full cache (1.8GB at 4-image
    # 14B/1024px) before the decode loop can update it in place
    return out, cache


def generate_tokens(
    bundle: T2IModelBundle,
    prompt_ids: jax.Array,
    prompt_pad: jax.Array,
    img_start_ids: jax.Array,
    pos_embed_for_diff: jax.Array,
    rng: jax.Array,
    *,
    latent_h: int,
    latent_w: int,
    num_images: int,
    guidance_scale: jax.Array | float,
    num_sampling_steps: int,
    kv_int8: bool = False,
) -> jax.Array:
    """Prefill + AR decode in one trace; returns ±1 tokens [n, h*w, z].

    One-program convenience composition (tests, CPU paths). The serving
    pipeline compiles prefill_t2i / decode_t2i separately and donates the
    cache between them (see T2IPipeline._compiled)."""
    cache, hidden = prefill_t2i(
        bundle, prompt_ids, prompt_pad, img_start_ids,
        latent_h=latent_h, latent_w=latent_w, num_images=num_images,
        kv_int8=kv_int8)
    tokens, _ = decode_t2i(
        bundle, cache, hidden, prompt_pad, pos_embed_for_diff, rng,
        prompt_len=prompt_ids.shape[1], latent_h=latent_h,
        latent_w=latent_w, num_images=num_images,
        guidance_scale=guidance_scale,
        num_sampling_steps=num_sampling_steps)
    return tokens


def decode_image(bundle: T2IModelBundle, tokens: jax.Array,
                 latent_h: int, latent_w: int) -> jax.Array:
    """±1 tokens [n, h*w, z] -> images [n, H, W, 3] in [-1, 1] (t2i_pipeline.py:274-282)."""
    latents = tokens_to_latents(tokens, latent_h, latent_w, ps=bundle.ps)
    return bundle.ae.apply(bundle.ae_params, latents, method=VQModel.decode)


class T2IPipeline:
    """User-facing pipeline: prompt string -> PIL-ready uint8 images.

    Equivalent surface to BitDanceT2IPipeline.generate (t2i_pipeline.py:109-155).
    """

    PROMPT_BUCKETS = (64, 128, 256, 512)

    def __init__(self, bundle: T2IModelBundle, tokenizer=None,
                 kv_int8: bool = False):
        self.bundle = bundle
        self.tokenizer = tokenizer
        self.kv_int8 = kv_int8
        self.pos_table = build_pos_table(bundle)
        self._jitted = {}

    def _compiled(self, P, latent_h, latent_w, n, steps):
        # cfg_scale is a TRACED argument, not part of the compile key: a
        # guidance slider must not trigger a recompile (app.py serves
        # arbitrary float scales; compiles cost minutes at 14B size).
        #
        # TWO programs — prefill and decode — with the KV cache DONATED into
        # decode: inside one program XLA copies the whole cache at the
        # decode-scan carry boundary (1.8GB at 4-image 14B/1024px), and that
        # copy is what capped the images-per-chip batch.
        #
        # The cache layouts are PINNED to the default (descending
        # major-to-minor) on both programs: left to itself, XLA picks a
        # transposed layout for decode's cache OUTPUT while its input keeps
        # the default, so the donated buffer can't alias byte-for-byte and
        # copy-insertion materializes one full entry copy + one exit
        # transpose PER BUFFER (measured: 3.62G of HLO temps at 28L/4-image
        # — the difference between fitting and OOM on a 16G chip).
        key = (P, latent_h, latent_w, n, steps)
        if key not in self._jitted:
            base = self.bundle

            # Params travel as jit ARGUMENTS — closing over them embeds the
            # full 14B weights as HLO constants, which overflows the compile
            # pipeline (multi-hundred-MB serialized programs).
            def rebind(params3):
                return dataclasses.replace(
                    base, llm_params=params3["llm"],
                    head_params=params3["head"],
                    head_stacked=params3.get("head_stacked"),
                    projector_params=params3["proj"])

            def fn_pre(params3, prompt_ids, prompt_pad, start_ids):
                return prefill_t2i(
                    rebind(params3), prompt_ids, prompt_pad, start_ids,
                    latent_h=latent_h, latent_w=latent_w, num_images=n,
                    kv_int8=self.kv_int8)

            def fn_dec(params3, cache, hidden, prompt_pad, pe, cfg_scale,
                       rng):
                return decode_t2i(
                    rebind(params3), cache, hidden, prompt_pad, pe, rng,
                    prompt_len=P, latent_h=latent_h, latent_w=latent_w,
                    num_images=n, guidance_scale=cfg_scale,
                    num_sampling_steps=steps)

            from jax.experimental.layout import Format, Layout
            from jax.sharding import SingleDeviceSharding

            fmt5 = Format(Layout((0, 1, 2, 3, 4)),
                          SingleDeviceSharding(jax.devices()[0]))
            cache_fmt = ({"kv": fmt5, "sc": fmt5} if self.kv_int8
                         else {"k": fmt5, "v": fmt5})
            self._jitted[key] = (
                jax.jit(fn_pre, out_shardings=(cache_fmt, None)),
                jax.jit(fn_dec, donate_argnums=(1,),
                        in_shardings=(None, cache_fmt, None, None, None,
                                      None, None),
                        out_shardings=(None, cache_fmt)))
        return self._jitted[key]

    def _params3(self):
        return {"llm": self.bundle.llm_params,
                "head": self.bundle.head_params,
                "head_stacked": self.bundle.head_stacked,
                "proj": self.bundle.projector_params}

    def _decode_compiled(self, latent_h, latent_w):
        key = ("decode", latent_h, latent_w)
        if key not in self._jitted:
            base = self.bundle

            def fn(ae_params, tokens):
                b = dataclasses.replace(base, ae_params=ae_params)
                return decode_image(b, tokens, latent_h, latent_w)

            self._jitted[key] = jax.jit(fn)
        return self._jitted[key]

    def generate(
        self,
        prompt: str,
        height: int = 1024,
        width: int = 1024,
        num_sampling_steps: int = 50,
        guidance_scale: float = 7.5,
        num_images: int = 1,
        seed: int = 1234,
    ) -> np.ndarray:
        """Returns uint8 images [n, H, W, 3]."""
        from bitdance_tpu.data.special_tokens import (
            chatml_prompts,
            image_start_ids,
        )

        b = self.bundle
        vp = b.vae_patch_size
        latent_h, latent_w = height // vp, width // vp
        cond_text, uncond_text = chatml_prompts(prompt)
        cond_ids = self.tokenizer.encode(cond_text)
        uncond_ids = self.tokenizer.encode(uncond_text)
        start_ids = image_start_ids(self.tokenizer, latent_h, latent_w,
                                    b.parallel_num)

        P = next(pb for pb in self.PROMPT_BUCKETS if pb >= len(cond_ids))
        rows, pads = [], []
        for ids in [cond_ids] * num_images + [uncond_ids] * num_images:
            pad = P - len(ids)
            rows.append([0] * pad + list(ids))
            pads.append(pad)

        pe = pos_embed_2d(self.pos_table, latent_h, latent_w, ps=b.ps)
        fn_pre, fn_dec = self._compiled(P, latent_h, latent_w, num_images,
                                        num_sampling_steps)
        params3 = self._params3()
        pads_arr = jnp.asarray(pads, jnp.int32)
        cache, hidden = fn_pre(
            params3,
            jnp.asarray(rows, jnp.int32),
            pads_arr,
            jnp.asarray(start_ids, jnp.int32),
        )
        tokens, dead_cache = fn_dec(
            params3, cache, hidden, pads_arr, pe,
            jnp.float32(guidance_scale),
            jax.random.PRNGKey(seed),
        )
        # the returned cache exists only as the donation target; drop the
        # reference NOW — holding it through the VAE decode keeps 3.6GB
        # (4-image 14B/1024px) alive alongside the decoder's feature maps
        del dead_cache, cache, hidden
        # decode one image at a time: at 1024px the decoder's NHWC feature
        # maps are GBs per image, and with 14B weights resident a batched
        # decode OOMs where generation itself fits
        dec = self._decode_compiled(latent_h, latent_w)
        imgs = []
        for i in range(tokens.shape[0]):
            img = dec(b.ae_params, tokens[i: i + 1])
            imgs.append(np.asarray(
                jnp.clip(127.5 * img.astype(jnp.float32) + 128.0, 0, 255)))
        return np.concatenate(imgs, axis=0).astype(np.uint8)
