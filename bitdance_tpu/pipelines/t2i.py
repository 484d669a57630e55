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
    cache between them (see T2IPipeline._pre_compiled/_dec_compiled)."""
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
                 kv_int8: bool = False, force_one_program: bool = False,
                 mesh=None):
        self.bundle = bundle
        self.tokenizer = tokenizer
        self.kv_int8 = kv_int8
        # Tensor-parallel serving: with a mesh carrying a tp axis, the LLM
        # weights are sharded over it (parallel/tp.py rules — heads/MLP
        # hidden over "tp"; GSPMD inserts the o_proj/down_proj all-reduces)
        # and everything downstream (KV cache, head, VAE) follows by
        # propagation. The reference serves strictly single-GPU
        # (t2i_pipeline.py:44-155); this is the TPU-native scale-out the
        # ICI mesh makes nearly free. force_one_program is recommended
        # under a mesh: the observed-layout handoff is a single-device
        # serving optimization.
        self.mesh = mesh
        if mesh is not None:
            from bitdance_tpu.parallel.tp import (
                shard_head_stacked,
                shard_qwen3_params,
            )

            # the diffusion head dominates serving FLOPs (1424/1580
            # TFLOP per 14B image): shard the stacked sampler weights
            # Megatron-style over tp as well (head-major reorder +
            # column/row-parallel; routes to the stacked XLA sampler,
            # whose GSPMD shardings propagate)
            head_stacked = bundle.head_stacked
            if head_stacked is not None and mesh.shape.get("tp", 1) > 1:
                head_stacked = shard_head_stacked(
                    head_stacked, mesh,
                    bundle.head.ch_latent // bundle.head.attn_head_dim)
            self.bundle = dataclasses.replace(
                bundle,
                llm_params=shard_qwen3_params(bundle.llm_params, mesh),
                head_stacked=head_stacked)
        # escape hatch (also env BITDANCE_ONE_PROGRAM=1): skip the split
        # prefill/decode handoff entirely — slower (one in-program cache
        # copy) but has no layout handoff to get wrong
        import os

        self.force_one_program = force_one_program or (
            os.environ.get("BITDANCE_ONE_PROGRAM", "0") == "1")
        # BITDANCE_PHASE_TIMING=1: populate self.last_timing with per-phase
        # wall seconds {prefill, decode, vae} on every generate() call via
        # host-readback fences (block_until_ready does not fence on the
        # axon tunnel). Costs a few small transfers; off by default.
        self.phase_timing = os.environ.get(
            "BITDANCE_PHASE_TIMING", "0") == "1"
        self.last_timing: dict = {}
        self.pos_table = build_pos_table(bundle)
        self._jitted = {}
        # per-geometry device constants (pos-embed, image-start ids): the
        # eager pos_embed_2d chain is ~6 device dispatches per generate()
        # call, and each dispatch over a remote-tunnel backend costs
        # 20-90ms — measured 1.46s in the "prefill" phase of a 14B
        # 2-image generate, most of it host-side dispatch, not prefill
        self._geom_cache = {}

    def _fns(self, P, latent_h, latent_w, n, steps):
        """Un-jitted (fn_pre, fn_dec, fn_onep) closures for one geometry."""
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

        def fn_dec(params3, cache, hidden, prompt_pad, pe, cfg_scale, rng):
            return decode_t2i(
                rebind(params3), cache, hidden, prompt_pad, pe, rng,
                prompt_len=P, latent_h=latent_h, latent_w=latent_w,
                num_images=n, guidance_scale=cfg_scale,
                num_sampling_steps=steps)

        def fn_onep(params3, prompt_ids, prompt_pad, start_ids, pe,
                    cfg_scale, rng):
            return generate_tokens(
                rebind(params3), prompt_ids, prompt_pad, start_ids, pe, rng,
                latent_h=latent_h, latent_w=latent_w, num_images=n,
                guidance_scale=cfg_scale, num_sampling_steps=steps,
                kv_int8=self.kv_int8)

        return fn_pre, fn_dec, fn_onep

    def _pre_compiled(self, key):
        # cfg_scale is a TRACED argument, not part of the compile key: a
        # guidance slider must not trigger a recompile (app.py serves
        # arbitrary float scales; compiles cost minutes at 14B size).
        #
        # TWO programs — prefill and decode — with the KV cache DONATED into
        # decode: inside one program XLA copies the whole cache at the
        # decode-scan carry boundary (1.8GB at 4-image 14B/1024px), and that
        # copy is what capped the images-per-chip batch.
        #
        # Prefill's cache output layout is left to XLA. At flagship size
        # XLA SILENTLY OVERRIDES a requested (pinned) output layout — it
        # prefers a transposed (0,1,3,2,4) layout for the GB-scale ring
        # buffers — so requesting anything here is wishful. Instead the
        # decode program adapts: _dec_compiled reads the ACTUAL Format off
        # the arrays prefill produced and pins decode's cache in/out
        # shardings to that observed layout, so the donated buffer aliases
        # byte-for-byte (zero cache copies) no matter what XLA chose.
        if ("pre", key) not in self._jitted:
            fn_pre, _, _ = self._fns(*key)
            self._jitted[("pre", key)] = jax.jit(fn_pre)
        return self._jitted[("pre", key)]

    def _dec_compiled(self, key, cache_fmts):
        fmt_key = ("dec", key, str(jax.tree.leaves(cache_fmts)))
        if fmt_key not in self._jitted:
            _, fn_dec, _ = self._fns(*key)
            self._jitted[fmt_key] = jax.jit(
                fn_dec, donate_argnums=(1,),
                in_shardings=(None, cache_fmts, None, None, None,
                              None, None),
                out_shardings=(None, cache_fmts))
        return self._jitted[fmt_key]

    def _relayout_compiled(self, key, cache_fmts):
        """Copy program pinning the cache to the DEFAULT layout.

        The real prefill program's cache output layout request is silently
        overridden by XLA at GB scale (it prefers a transposed
        (..., S, H, D) order), but the flash-decode Pallas kernels inside
        the decode scan need the default head-major layout — feeding the
        transposed buffer straight in makes XLA relayout the scan carry
        around every kernel call (measured 17.8 vs 8.3 s/image at 28L
        int8-KV). A standalone copy program DOES honor the default-layout
        pin (verified at [28,4,8,4226,128] bf16), so one ~1GB copy per
        generation buys a copy-free decode loop."""
        from jax.experimental.layout import Format, Layout

        fmt_key = ("relayout", key, str(jax.tree.leaves(cache_fmts)))
        if fmt_key not in self._jitted:
            def default_fmt(fmt):
                nd = len(fmt.layout.major_to_minor)
                return Format(Layout(tuple(range(nd))), fmt.sharding)

            self._jitted[fmt_key] = jax.jit(
                lambda c: jax.tree.map(lambda a: a + jnp.zeros((), a.dtype), c),
                donate_argnums=(0,),
                in_shardings=(cache_fmts,),
                out_shardings=jax.tree.map(default_fmt, cache_fmts))
        return self._jitted[fmt_key]

    def _onep_compiled(self, key):
        # Fallback: prefill + decode in ONE program (no handoff to get
        # wrong; costs one in-program cache copy at the scan boundary).
        if ("onep", key) not in self._jitted:
            _, _, fn_onep = self._fns(*key)
            self._jitted[("onep", key)] = jax.jit(fn_onep)
        return self._jitted[("onep", key)]

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
                img = decode_image(b, tokens, latent_h, latent_w)
                # clip + uint8 ON DEVICE: the host readback then moves 3
                # bytes/pixel instead of 12 (t2i_pipeline.py:142-155 does
                # the same on the host; on TPU the readback is the cost)
                return jnp.clip(
                    127.5 * img.astype(jnp.float32) + 128.0, 0, 255
                ).astype(jnp.uint8)

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
        return_tokens: bool = False,
    ) -> np.ndarray:
        """Returns uint8 images [n, H, W, 3]; with return_tokens, the tuple
        (images, ±1 tokens [n, h*w, z]) — tokens are exact (sign-quantized)
        and are what cross-run equivalence checks should compare."""
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
        geom = self._geom_cache.get((latent_h, latent_w))
        if geom is None:
            start_arr = jnp.asarray(
                image_start_ids(self.tokenizer, latent_h, latent_w,
                                b.parallel_num), jnp.int32)
            pe = jax.jit(pos_embed_2d, static_argnums=(1, 2, 3))(
                self.pos_table, latent_h, latent_w, b.ps)
            geom = (start_arr, pe)
            self._geom_cache[(latent_h, latent_w)] = geom
        start_arr, pe = geom

        P = next(pb for pb in self.PROMPT_BUCKETS if pb >= len(cond_ids))
        rows, pads = [], []
        for ids in [cond_ids] * num_images + [uncond_ids] * num_images:
            pad = P - len(ids)
            rows.append([0] * pad + list(ids))
            pads.append(pad)

        key = (P, latent_h, latent_w, num_images, num_sampling_steps)
        params3 = self._params3()
        pads_arr = jnp.asarray(pads, jnp.int32)
        rows_arr = jnp.asarray(rows, jnp.int32)
        cfg_arr = jnp.float32(guidance_scale)
        rng = jax.random.PRNGKey(seed)

        import time as _time

        def _fence(x):
            return float(jnp.sum(x[..., :1].astype(jnp.float32)))

        t0 = _time.perf_counter()
        if self.phase_timing:
            self.last_timing = {}
        tokens = None
        if not self.force_one_program:
            cache, hidden = self._pre_compiled(key)(
                params3, rows_arr, pads_arr, start_arr)
            if self.phase_timing:
                _fence(hidden)
                self.last_timing = {"prefill": _time.perf_counter() - t0}
                t0 = _time.perf_counter()
            cache_fmts = jax.tree.map(lambda a: a.format, cache)
            # force the cache back to the DEFAULT layout before decode
            # (see _relayout_compiled) when prefill produced a transposed one
            if any(tuple(f.layout.major_to_minor)
                   != tuple(range(len(f.layout.major_to_minor)))
                   for f in jax.tree.leaves(cache_fmts)):
                cache = self._relayout_compiled(key, cache_fmts)(cache)
                cache_fmts = jax.tree.map(lambda a: a.format, cache)
            # pin decode's cache in/out to the layout the buffer ACTUALLY
            # has so jit accepts it and donation aliases byte-for-byte
            try:
                tokens, dead_cache = self._dec_compiled(key, cache_fmts)(
                    params3, cache, hidden, pads_arr, pe, cfg_arr, rng)
                # the returned cache exists only as the donation target;
                # drop the reference NOW — holding it through the VAE decode
                # keeps 3.6GB (4-image 14B/1024px) alive alongside the
                # decoder's feature maps
                del dead_cache
            except ValueError as e:  # layout handoff rejected by jit
                import warnings

                warnings.warn(
                    "t2i prefill->decode cache handoff failed "
                    f"({e}); falling back to the one-program path")
            del cache, hidden
        if tokens is None:
            tokens = self._onep_compiled(key)(
                params3, rows_arr, pads_arr, start_arr, pe, cfg_arr, rng)
        if self.phase_timing:
            _fence(tokens)
            self.last_timing["decode"] = _time.perf_counter() - t0
            t0 = _time.perf_counter()
        # decode one image at a time: at 1024px the decoder's NHWC feature
        # maps are GBs per image, and with 14B weights resident a batched
        # decode OOMs where generation itself fits
        dec = self._decode_compiled(latent_h, latent_w)
        imgs = []
        for i in range(tokens.shape[0]):
            imgs.append(np.asarray(dec(b.ae_params, tokens[i: i + 1])))
        if self.phase_timing:
            self.last_timing["vae"] = _time.perf_counter() - t0
        out = np.concatenate(imgs, axis=0)
        if return_tokens:
            return out, np.asarray(tokens)
        return out
