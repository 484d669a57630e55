"""Config system: YAML/JSON schemas matching the reference's three mechanisms.

(SURVEY.md §5 config/flag system): (1) argparse for the ImageNet stack —
see scripts/train_imagenet.py; (2) OmegaConf-style YAML for 14B training
(train/configs/bitdance_14b_{16x,64x}.yaml); (3) JSON per-component model
configs shipped with checkpoints (ae_config.json, vision_head_config.json,
t2i_pipeline.py:54-67). This module provides a light attribute-access dict
(the OmegaConf subset the reference uses: attr access + .get) and builders
from those schemas into our typed configs.
"""

from __future__ import annotations

import json
from typing import Any


class ConfigDict(dict):
    """dict with attribute access and recursive wrapping (OmegaConf subset)."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    @staticmethod
    def wrap(obj):
        if isinstance(obj, dict):
            return ConfigDict({k: ConfigDict.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [ConfigDict.wrap(v) for v in obj]
        return obj


def load_yaml(path: str) -> ConfigDict:
    import yaml

    with open(path) as f:
        return ConfigDict.wrap(yaml.safe_load(f))


def load_json(path: str) -> ConfigDict:
    with open(path) as f:
        return ConfigDict.wrap(json.load(f))


def mllm_config_from_yaml(cfg: ConfigDict, vocab_size: int):
    """Build MLLMConfig from a train/configs/bitdance_14b_*.yaml model block."""
    from bitdance_tpu.models.mllm import MLLMConfig
    from bitdance_tpu.models.qwen3 import Qwen3Config

    m = cfg.model
    vp = m.head.vision_pred
    # sparse-iteration flash attention bound, derived from the packer's
    # per-sample token cap (yaml data block): a 256-token q tile can only
    # see live kv tiles of its own document, so ceil(max_doc/512)+1 tiles
    # bounds the iteration space (3.5x attention speedup on the 33k packed
    # budget, benchmarks/bench_attention.py --docs 8). An explicit
    # model.attn_max_live_kv key overrides; 0 disables (dense).
    max_doc = int(cfg.get("data", {}).get("max_num_tokens_per_sample", 0))
    live_kv = m.get("attn_max_live_kv",
                    -(-max_doc // 512) + 1 if max_doc else 0)
    live_kv = int(live_kv) or None
    # optional explicit LLM dims (debug/smoke configs); default Qwen3-14B
    if m.llm.get("hidden_size"):
        llm = Qwen3Config(
            vocab_size=vocab_size,
            hidden_size=m.llm.hidden_size,
            intermediate_size=m.llm.intermediate_size,
            num_hidden_layers=m.llm.num_hidden_layers,
            num_attention_heads=m.llm.num_attention_heads,
            num_key_value_heads=m.llm.num_key_value_heads,
            head_dim=m.llm.head_dim,
        )
    else:
        llm = Qwen3Config.qwen3_14b(vocab_size)
    return MLLMConfig(
        llm=llm,
        z_channels=m.encoder.params.ddconfig.z_channels,
        vit_patch_size=m.vit_patch_size,
        parallel_num=vp.get("parallel_num", 1),
        head_model_dim=vp.get("model_dim", 1024),
        head_num_blocks=vp.get("num_blocks", 3),
        head_num_adaln=vp.get("num_adaln", 1),
        head_use_swiglu=vp.get("use_swiglu", False),
        P_mean=vp.get("P_mean", 0.0),
        P_std=vp.get("P_std", 1.0),
        time_shift=vp.get("time_shift", 1.0),
        diff_batch_mul=vp.get("diff_batch_mul", 1),
        vision_perturb=m.head.get("vision_perturb", 0.0),
        pe_max_len=m.head.get("pe_max_len", 4096),
        attn_max_live_kv=live_kv,
    )


def mllm_train_config_from_yaml(cfg: ConfigDict):
    from bitdance_tpu.train.mllm_train import MLLMTrainConfig

    t = cfg.training
    return MLLMTrainConfig(
        lr=float(t.lr),
        min_lr=float(t.get("min_lr", 0.0)),
        betas=(float(t.get("beta1", 0.9)), float(t.get("beta2", 0.95))),
        eps=float(t.get("eps", 1e-8)),
        warmup_steps=int(t.get("warmup_steps", 0)),
        total_steps=int(t.get("total_steps", 1_000_000)),
        decay_start=(int(t.get("warmup_steps", 0))
                     if t.get("lr_scheduler", "constant") == "cosine" else -1),
        max_grad_norm=float(t.get("max_grad_norm", 1.0)),
        loss_weight_text=float(t.get("loss_weight_text", 1.0)),
        loss_weight_vision=float(t.get("loss_weight_vision", 1.0)),
        grad_accum=int(t.get("grad_accum",
                             t.get("gradient_accumulation_steps", 1))),
    )


def mesh_shape_from_yaml(cfg: ConfigDict) -> tuple[int, int]:
    """(replica, fsdp) from the FSDP block (yaml:89-94; HYBRID_SHARD)."""
    t = cfg.training
    return int(t.get("num_replicate", 1)), int(t.get("num_shard", 1))


def head_config_from_json(j: dict) -> dict:
    """vision_head_config.json -> DiffHead kwargs (t2i_pipeline.py:62-67)."""
    return dict(
        ch_target=j["ch_target"],
        ch_cond=j["ch_cond"],
        ch_latent=j["ch_latent"],
        depth_latent=j["depth_latent"],
        depth_adanln=j["depth_adanln"],
        time_shift=j.get("time_shift", 1.0),
        P_mean=j.get("P_mean", 0.0),
        P_std=j.get("P_std", 1.0),
        parallel_num=j.get("parallel_num", 4),
        diff_batch_mul=j.get("diff_batch_mul", 1),
        use_swiglu=j.get("use_swiglu", False),
    )
