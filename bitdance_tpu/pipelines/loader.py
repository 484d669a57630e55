"""Load a released BitDance model directory into a T2IPipeline.

Directory layout (t2i_pipeline.py:48-74): HF Qwen3 shards + tokenizer files,
ae_config.json + ae.safetensors, vision_head_config.json +
vision_head.safetensors, projector.safetensors.
"""

from __future__ import annotations

import functools
import json
import os

import jax
import jax.numpy as jnp

from bitdance_tpu.config import head_config_from_json
from bitdance_tpu.io.torch_import import (
    convert_ae_state,
    convert_diffhead_state,
    convert_projector_state,
    load_hf_qwen3_dir,
    load_safetensors,
)
from bitdance_tpu.models.connector import MLPConnector
from bitdance_tpu.models.diff_head import DiffHead
from bitdance_tpu.models.qwen3 import Qwen3Config
from bitdance_tpu.models.tokenizer import VQModel
from bitdance_tpu.pipelines.t2i import T2IModelBundle, T2IPipeline


def load_t2i_pipeline(model_path: str, dtype=jnp.bfloat16,
                      quantize_llm: bool = False,
                      quantize_head: bool | str = False,
                      quantize_embed: bool = False) -> T2IPipeline:
    """quantize_llm: int8 W8A8 LLM matmuls (ops/int8.py) — halves decode
    weight traffic at a small image-quality cost. quantize_head: int8
    weight-only fused head sampler (DiffHead.sample_weight_quant), or
    "int4" for packed W4A8 (halves the sampler weight DMA again).
    quantize_embed: int8 embedding table (memory lever — frees 0.78GB at
    152k x 5120, enabling larger image batches per chip)."""
    # LLM + tokenizer (added special tokens ride in tokenizer files)
    llm_params, hf_cfg = load_hf_qwen3_dir(model_path, dtype)
    llm_cfg = Qwen3Config(
        vocab_size=llm_params["embed_tokens"].shape[0],
        hidden_size=hf_cfg["hidden_size"],
        intermediate_size=hf_cfg["intermediate_size"],
        num_hidden_layers=hf_cfg["num_hidden_layers"],
        num_attention_heads=hf_cfg["num_attention_heads"],
        num_key_value_heads=hf_cfg["num_key_value_heads"],
        head_dim=hf_cfg.get("head_dim",
                            hf_cfg["hidden_size"] // hf_cfg["num_attention_heads"]),
        rms_norm_eps=hf_cfg.get("rms_norm_eps", 1e-6),
        rope_theta=hf_cfg.get("rope_theta", 1e6),
        tie_word_embeddings=hf_cfg.get("tie_word_embeddings", False),
    )
    if quantize_llm or quantize_embed:
        from bitdance_tpu.models.qwen3 import quantize_qwen3_params

        if quantize_llm:
            llm_params = jax.jit(functools.partial(
                quantize_qwen3_params, quantize_embed=quantize_embed)
            )(llm_params)
        else:
            from bitdance_tpu.ops.int8 import quantize_linear

            llm_params = dict(
                llm_params,
                embed_tokens=jax.jit(quantize_linear)(
                    llm_params["embed_tokens"]))

    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(model_path)

    # Autoencoder
    with open(os.path.join(model_path, "ae_config.json")) as f:
        ae_config = json.load(f)
    ae = VQModel(ddconfig=ae_config["ddconfig"],
                 gan_decoder=ae_config.get("gan_decoder", False), dtype=dtype)
    ae_params = convert_ae_state(
        load_safetensors(os.path.join(model_path, "ae.safetensors")), dtype)
    vae_patch_size = 2 ** (len(ae_config["ddconfig"]["ch_mult"]) - 1)

    # Vision head
    with open(os.path.join(model_path, "vision_head_config.json")) as f:
        head_config = json.load(f)
    head = DiffHead(**head_config_from_json(head_config), dtype=dtype,
                    sample_weight_quant=quantize_head)
    head_params = convert_diffhead_state(
        load_safetensors(os.path.join(model_path, "vision_head.safetensors")),
        dtype)

    # Projector
    projector = MLPConnector(out_dim=llm_cfg.hidden_size, dtype=dtype)
    projector_params = convert_projector_state(
        load_safetensors(os.path.join(model_path, "projector.safetensors")),
        dtype)

    bundle = T2IModelBundle(
        llm_cfg=llm_cfg, llm_params=llm_params,
        ae=ae, ae_params=ae_params,
        head=head, head_params=head_params,
        projector=projector, projector_params=projector_params,
        parallel_num=head_config["parallel_num"],
        hidden_size=llm_cfg.hidden_size,
        vae_patch_size=vae_patch_size,
        pe_max_len=4096,
    )
    return T2IPipeline(bundle, tokenizer=tokenizer)
