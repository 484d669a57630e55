"""Interleaved multimodal inference: sequence-plan driven generation.

Equivalent of MLLModel.forward_inference{_full_causal,_block_causal}
(modeling/mllm.py:503-897): a plan of text/image items, each either
prefilled from inputs ("from": "user") or generated ("from": "model").
Text spans sample token-by-token through the lm_head (temperature +
top-k/top-p, utils.py:93-124); image spans run the next-patch diffusion
decode (query tokens, block-bidirectional windows, CFG pair of caches).

Reference conventions mirrored exactly (mllm.py:504-897):
  - TWO independent KV streams (cond / uncond), like the reference's
    past_key_values / past_key_values_un pair. The uncond stream drops the
    first user block from user text (utils.py:206-216
    remove_first_user_block) so image CFG contrasts with a promptless
    context; user images and image-span scaffolding go to both streams.
  - Generated TEXT spans sample from the hidden state of the LAST context
    token — no im_start is injected (the reference's start_embed append
    happens only in the image branch, mllm.py:563-569; chat scaffolding is
    expected to arrive in the user text itself).
  - Generated IMAGE spans prefill [start_of_image, res_h, res_w] plus
    query_1..query_{p-1}; everything except the last parallel_num tokens is
    causal, the final window is block-bidirectional (mllm.py:763-795).
    pos_embed is added BOTH to the head conditioning and to the next-step
    input embeds (mllm.py:628-637,805-812).

Deliberate deviations from the reference (documented, not accidental):
  - After a generated text span the reference re-feeds the stale uncond
    context every step (mllm.py:604-612: curr_embeds_un is never updated in
    the text branch), corrupting the uncond cache for any later image span.
    We advance the uncond stream with the same sampled tokens instead.
  - The reference never writes the final sampled image window into the
    cache and leaves the image span's scaffold embeds in context_embed,
    double-feeding them into the next model span (mllm.py:758-800). We keep
    the full generated image in both caches exactly once.

PARITY GUARD: because of the deviations above, interleaved outputs CANNOT
be golden-matched against the reference on any plan containing a generated
text span followed by a generated image span (stale-uncond divergence) or
consecutive generated image spans (double-fed scaffold divergence).
`plan_parity_matchable(plan)` below classifies a plan; cross-framework
parity tests must skip non-matchable plans or compare against the
corrected-semantics expectation, never the reference's buggy trace.

Host drives the item loop; each span runs as jitted device steps. The two
KV streams advance as sequential batch-1 forwards — mirroring the
reference's separate past_key_values / past_key_values_un passes — so CFG
decode pays ~2x single-stream latency; batching them into one 2-row
forward needs the unequal-context-length machinery of t2i.py's prefill
(left-padded rows + per-row kv_start) and is the known latency lever if
this path ever becomes hot.
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


def remove_first_user_block(text: str) -> str:
    """Drop the first <|im_start|>user ... <|im_end|>\\n block
    (reference utils.py:206-216) — the uncond stream's view of user text."""
    start_marker = "<|im_start|>user\n"
    end_marker = "<|im_end|>\n"
    i = text.find(start_marker)
    if i == -1:
        return text
    j = text.find(end_marker, i + len(start_marker))
    if j == -1:
        return text
    return text[:i] + text[j + len(end_marker):]


def plan_parity_matchable(plan: list["PlanItem"]) -> bool:
    """True iff a plan's outputs can be golden-matched against the
    reference implementation (see "Deliberate deviations" above).

    Non-matchable (our corrected semantics diverge from the reference's
    buggy trace):
      * a generated TEXT span followed later by any generated IMAGE span —
        the reference's uncond cache goes stale during text generation
        (mllm.py:604-612), ours advances;
      * ANY generated span after a generated IMAGE span — the reference
        double-feeds the image span's scaffold embeds into the next model
        span of either type and never caches its sampled window
        (mllm.py:758-800), ours caches it exactly once.

    Cross-framework parity tests MUST skip plans where this returns False
    (or assert against the corrected-semantics expectation, never the
    reference output).
    """
    gen_text_seen = False
    gen_image_seen = False
    for item in plan:
        if item.source != "model":
            continue
        if gen_image_seen:
            # scaffold double-feed corrupts every later model span
            return False
        if item.type == "text":
            gen_text_seen = True
        elif item.type == "image":
            if gen_text_seen:
                return False
            gen_image_seen = True
    return True


@dataclasses.dataclass
class _Stream:
    """One KV stream (the reference's past_key_values[_un])."""

    cache: dict
    length: int = 0


class InterleavedGenerator:
    """Any-to-any generation over a sequence plan."""

    def __init__(self, bundle: T2IModelBundle, tokenizer,
                 max_seq_len: int = 8192):
        self.b = bundle
        self.tokenizer = tokenizer
        self.max_seq_len = max_seq_len
        self.pos_table = build_pos_table(bundle)

    # -- span bookkeeping (exposed for tests) --------------------------------
    # last_spans: list of (stream_name, item_index, kind, start, end) cache
    # slot ranges recorded during the most recent generate() call.

    def generate(self, plan: list[PlanItem], *, cfg_scale: float = 7.5,
                 sample_steps: int = 50, max_length_text: int = 128,
                 temperature: float = 1.0, top_k: int = 1200,
                 top_p: float = 0.95, seed: int = 0) -> dict:
        """Returns {'generated_text': [...], 'generated_image': [...]}.

        Mirrors the reference's generated_sequence dict (mllm.py:544-547).
        """
        from bitdance_tpu.data.special_tokens import (
            IM_END,
            VISION_END,
            image_start_ids,
        )

        b = self.b
        cfg = b.llm_cfg
        use_cfg = cfg_scale > 1.0
        key = jax.random.PRNGKey(seed)

        cond = _Stream(q3.init_kv_cache(cfg, 1, self.max_seq_len))
        un = (_Stream(q3.init_kv_cache(cfg, 1, self.max_seq_len))
              if use_cfg else None)
        streams = [cond] + ([un] if use_cfg else [])
        out = {"generated_text": [], "generated_image": []}
        self.last_spans = []
        last_hidden = None  # [1, D] cond-stream hidden of the newest token

        def embed_ids(ids):
            e = q3.embed_tokens(b.llm_params, jnp.asarray(ids, jnp.int32))
            return e[None]  # [1, S, D]

        def prefill(st: _Stream, embeds, causal=True):
            """Advance ONE stream by embeds [1, S, D]; returns hidden."""
            s = embeds.shape[1]
            pos = (st.length + jnp.arange(s, dtype=jnp.int32))[None]
            hidden, st.cache = q3.qwen3_forward_cached(
                b.llm_params, cfg, embeds, pos, st.cache,
                jnp.int32(st.length), jnp.zeros((1,), jnp.int32),
                causal_block=causal)
            st.length += s
            return hidden

        def record(item_idx, kind, lengths_before):
            for name, st, before in zip(
                    ["cond", "uncond"], streams, lengths_before):
                self.last_spans.append(
                    (name, item_idx, kind, before, st.length))

        for item_idx, item in enumerate(plan):
            before = [st.length for st in streams]
            if item.source == "user":
                if item.type == "text":
                    texts = [item.text]
                    if use_cfg:
                        texts.append(remove_first_user_block(item.text))
                    for st, text in zip(streams, texts):
                        h = prefill(st, embed_ids(self.tokenizer.encode(text)))
                        if st is cond:
                            last_hidden = h[:, -1]
                else:  # user image: [start_of_image, res_h, res_w] + emb + end
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
                    # start ids use the image's OWN latent dims (the
                    # reference reads the global image_size arg here,
                    # mllm.py:728-732 — same value in its demos)
                    start = embed_ids(
                        image_start_ids(self.tokenizer, h, w, 1)[:3])
                    end = embed_ids(
                        [self.tokenizer.convert_tokens_to_ids(VISION_END)])
                    block = jnp.concatenate(
                        [start, emb.astype(start.dtype), end], axis=1)
                    for st in streams:
                        hh = prefill(st, block)
                        if st is cond:
                            last_hidden = hh[:, -1]
                record(item_idx, f"user_{item.type}", before)
                continue

            # ---- generated spans -------------------------------------------
            if item.type == "text":
                assert last_hidden is not None, (
                    "a generated text span needs preceding user context "
                    "(the reference crashes on an empty context too, "
                    "mllm.py:590)")
                end_id = self.tokenizer.convert_tokens_to_ids(IM_END)
                tokens = []
                hidden_tok = last_hidden
                for _ in range(max_length_text):
                    key, ks = jax.random.split(key)
                    logits = q3.lm_logits(b.llm_params, cfg, hidden_tok)
                    tok = int(sample_tokens(ks, logits, temperature,
                                            top_k, top_p)[0])
                    if tok == end_id:
                        break
                    tokens.append(tok)
                    # the sampled token advances BOTH streams (see module
                    # docstring: deliberate deviation from the reference's
                    # stale-context re-feed)
                    for st in streams:
                        hh = prefill(st, embed_ids([tok]))
                        if st is cond:
                            hidden_tok = hh[:, -1]
                last_hidden = hidden_tok
                out["generated_text"].append(self.tokenizer.decode(tokens))
                record(item_idx, "model_text", before)
            else:
                p = b.parallel_num
                vp = b.vae_patch_size
                lat_h = item.image_size[0] // vp
                lat_w = item.image_size[1] // vp
                num_steps = (lat_h * lat_w) // p
                start_ids = image_start_ids(self.tokenizer, lat_h, lat_w, p)
                pe = pos_embed_2d(self.pos_table, lat_h, lat_w, ps=b.ps)

                # causal prefill of [start_of_image, res_h]; bidirectional
                # window over [res_w, queries] (mllm.py:763-795)
                hiddens = []
                for st in streams:
                    prefill(st, embed_ids(start_ids[:2]), causal=True)
                    hiddens.append(
                        prefill(st, embed_ids(start_ids[2:]), causal=False))

                all_tokens = []
                for step in range(num_steps):
                    key, ks = jax.random.split(key)
                    pe_step = pe[step * p: (step + 1) * p]
                    # conditioning = hidden + pos embed, cond row first
                    # (t2i_pipeline.py:245; sampling row order
                    # sampling_x.py:16-20)
                    h_fused = (jnp.concatenate(hiddens, axis=0)[:, -p:]
                               + pe_step[None])
                    pred = b.head.apply(
                        b.head_params, h_fused, ks,
                        jnp.float32(cfg_scale), sample_steps,
                        cfg_mult=len(streams), method=DiffHead.sample)
                    toks = sign_quantize(pred)
                    all_tokens.append(np.asarray(toks[0]))
                    emb = b.projector.apply(b.projector_params, toks)
                    # pos embed ALSO added to the next-step input embeds
                    # (t2i_pipeline.py:253 / mllm.py:805)
                    emb = (emb + pe_step[None]).astype(hiddens[0].dtype)
                    hiddens = [prefill(st, emb, causal=False)
                               for st in streams]

                full = jnp.asarray(np.concatenate(all_tokens, axis=0))[None]
                latents = tokens_to_latents(full, lat_h, lat_w, ps=b.ps)
                img = b.ae.apply(b.ae_params, latents,
                                 method=type(b.ae).decode)
                out["generated_image"].append(np.asarray(img[0]))
                last_hidden = hiddens[0][:, -1]
                record(item_idx, "model_image", before)

        return out
