"""Interleaved multimodal inference: sequence-plan driven generation.

Equivalent of MLLModel.forward_inference{_full_causal,_block_causal}
(modeling/mllm.py:503-897): a plan of text/image items, each either
prefilled from inputs ("from": "user") or generated ("from": "model").
Text spans sample token-by-token through the lm_head (temperature +
top-k/top-p, utils.py:93-124); image spans run the next-patch diffusion
decode (query tokens, block-bidirectional windows, CFG pair of caches).

Host drives the item loop; each span runs as jitted device steps. The CFG
(cond/uncond) streams are batched into one forward like pipelines/t2i.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from bitdance_tpu.models import qwen3 as q3
from bitdance_tpu.models.diff_head import DiffHead
from bitdance_tpu.models.tokenizer import tokens_to_latents
from bitdance_tpu.ops.quantize import sign_quantize
from bitdance_tpu.ops.rotary import pos_embed_2d
from bitdance_tpu.ops.token_sampling import sample_tokens
from bitdance_tpu.pipelines.t2i import T2IModelBundle, build_pos_table


@dataclasses.dataclass
class PlanItem:
    type: str              # 'text' | 'image'
    source: str            # 'user' | 'model'
    text: str | None = None           # user text
    image: np.ndarray | None = None   # user image (NHWC [-1,1])
    image_size: tuple = (256, 256)    # generated image pixel size


class InterleavedGenerator:
    """Any-to-any generation over a sequence plan."""

    def __init__(self, bundle: T2IModelBundle, tokenizer,
                 max_seq_len: int = 8192):
        self.b = bundle
        self.tokenizer = tokenizer
        self.max_seq_len = max_seq_len
        self.pos_table = build_pos_table(bundle)

    def generate(self, plan: list[PlanItem], *, cfg_scale: float = 7.5,
                 sample_steps: int = 50, max_length_text: int = 128,
                 temperature: float = 1.0, top_k: int = 1200,
                 top_p: float = 0.95, seed: int = 0) -> dict:
        """Returns {'generated_text': [...], 'generated_image': [...]}.

        Mirrors the reference's generated_sequence dict (mllm.py:544-547).
        """
        from bitdance_tpu.data.special_tokens import (
            IM_END,
            IM_START,
            VISION_END,
            VISION_START,
            image_start_ids,
        )

        b = self.b
        cfg = b.llm_cfg
        use_cfg = cfg_scale > 1.0
        rows = 2 if use_cfg else 1
        key = jax.random.PRNGKey(seed)

        cache = q3.init_kv_cache(cfg, rows, self.max_seq_len)
        cache_len = 0
        kv_start = jnp.zeros((rows,), jnp.int32)
        out = {"generated_text": [], "generated_image": []}

        def embed_ids(ids):
            e = q3.embed_tokens(b.llm_params, jnp.asarray(ids, jnp.int32))
            return jnp.broadcast_to(e[None], (rows, len(ids), e.shape[-1]))

        def prefill(embeds, causal=True):
            nonlocal cache, cache_len
            s = embeds.shape[1]
            pos = (cache_len + jnp.arange(s, dtype=jnp.int32))[None]
            pos = jnp.broadcast_to(pos, (rows, s))
            hidden, cache2 = q3.qwen3_forward_cached(
                b.llm_params, cfg, embeds, pos, cache, jnp.int32(cache_len),
                kv_start, causal_block=causal)
            cache = cache2
            cache_len += s
            return hidden

        for item in plan:
            if item.source == "user":
                if item.type == "text":
                    ids = self.tokenizer.encode(item.text)
                    prefill(embed_ids(ids))
                else:  # user image: encode + project + bracket with markers
                    img = jnp.asarray(item.image)[None]
                    quant = b.ae.apply(b.ae_params, img,
                                       method=type(b.ae).encode)
                    h, w = quant.shape[1:3]
                    from bitdance_tpu.models.tokenizer import latents_to_tokens

                    # ps-raster ordering for understanding images too
                    # (mllm.py:899-907 passes ps=self.ps to vt_forward)
                    toks = latents_to_tokens(quant, ps=b.ps)
                    emb = b.projector.apply(b.projector_params, toks)
                    pe = pos_embed_2d(self.pos_table, h, w, ps=b.ps)
                    emb = emb + pe[None]
                    start = embed_ids(
                        [self.tokenizer.convert_tokens_to_ids(VISION_START)])
                    end = embed_ids(
                        [self.tokenizer.convert_tokens_to_ids(VISION_END)])
                    emb = jnp.broadcast_to(emb, (rows, *emb.shape[1:]))
                    prefill(jnp.concatenate([start, emb, end], axis=1))
                continue

            # ---- generated spans -------------------------------------------
            if item.type == "text":
                start_id = self.tokenizer.convert_tokens_to_ids(IM_START)
                end_id = self.tokenizer.convert_tokens_to_ids(IM_END)
                hidden = prefill(embed_ids([start_id]))
                tokens = []
                for _ in range(max_length_text):
                    key, ks = jax.random.split(key)
                    logits = q3.lm_logits(b.llm_params, cfg,
                                          hidden[:1, -1])  # cond row only
                    tok = int(sample_tokens(ks, logits, temperature,
                                            top_k, top_p)[0])
                    if tok == end_id:
                        break
                    tokens.append(tok)
                    hidden = prefill(embed_ids([tok]))
                out["generated_text"].append(self.tokenizer.decode(tokens))
            else:
                p = b.parallel_num
                vp = b.vae_patch_size
                lat_h = item.image_size[0] // vp
                lat_w = item.image_size[1] // vp
                num_steps = (lat_h * lat_w) // p
                start_ids = image_start_ids(self.tokenizer, lat_h, lat_w, p)
                pe = pos_embed_2d(self.pos_table, lat_h, lat_w, ps=b.ps)

                # causal prefill of [vision_start, res_h]; bidirectional
                # window over [res_w, queries] (mllm.py:763-795)
                prefill(embed_ids(start_ids[:2]), causal=True)
                hidden = prefill(embed_ids(start_ids[2:]), causal=False)

                all_tokens = []
                for step in range(num_steps):
                    key, ks = jax.random.split(key)
                    pe_step = pe[step * p: (step + 1) * p]
                    h_fused = hidden[:, -p:] + pe_step[None]
                    pred = b.head.apply(
                        b.head_params, h_fused, ks,
                        jnp.float32(cfg_scale), sample_steps,
                        cfg_mult=rows, method=DiffHead.sample)
                    toks = sign_quantize(pred)
                    all_tokens.append(np.asarray(toks[0]))
                    emb = b.projector.apply(b.projector_params, toks)
                    emb = (emb + pe_step[None]).astype(hidden.dtype)
                    emb = jnp.concatenate([emb] * rows, axis=0)
                    hidden = prefill(emb, causal=False)

                full = jnp.asarray(np.concatenate(all_tokens, axis=0))[None]
                latents = tokens_to_latents(full, lat_h, lat_w, ps=b.ps)
                img = b.ae.apply(b.ae_params, latents,
                                 method=type(b.ae).decode)
                out["generated_image"].append(np.asarray(img[0]))

        return out
