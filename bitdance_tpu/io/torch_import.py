"""Import reference release checkpoints (torch safetensors) into our pytrees.

The released BitDance model directory (t2i_pipeline.py:48-74) contains:
  ae.safetensors            -> VQModel (torch NCHW convs -> our NHWC flax)
  vision_head.safetensors   -> DiffHead (TransEncoder)
  projector.safetensors     -> MLPconnector (fc1/fc2)
  HF Qwen3 shards + configs -> Qwen3 stacked-layer pytree

torch Linear weights are [out, in] -> flax kernel [in, out];
torch Conv2d weights are [out, in, kh, kw] -> flax kernel [kh, kw, in, out].
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np


def load_safetensors(path: str) -> dict[str, np.ndarray]:
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="np") as f:
        for key in f.keys():
            out[key] = f.get_tensor(key)
    return out


def _leaf(name: str, tensor: np.ndarray, dtype) -> tuple[str, np.ndarray]:
    """Map a torch parameter leaf to (flax_leaf_name, converted_tensor)."""
    t = tensor.astype(np.float32)
    if name == "weight":
        if t.ndim == 4:   # conv OIHW -> HWIO
            return "kernel", t.transpose(2, 3, 1, 0).astype(dtype)
        if t.ndim == 2:   # linear [out, in] -> [in, out]
            return "kernel", t.T.astype(dtype)
        return "weight", t.astype(dtype)  # norm weight
    if name == "bias":
        return "bias", t.astype(dtype)
    raise ValueError(f"unknown leaf {name}")


def _set(tree: dict, path: list[str], leaf: str, value) -> None:
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[leaf] = value


_JOIN_PATTERNS = [
    # encoder/decoder nested module lists -> flat linen names
    (re.compile(r"^down\.(\d+)\.block\.(\d+)$"), r"down_\1_block_\2"),
    (re.compile(r"^down\.(\d+)\.downsample$"), r"down_\1_downsample"),
    (re.compile(r"^up\.(\d+)\.block\.(\d+)$"), r"up_\1_block_\2"),
    (re.compile(r"^up\.(\d+)\.upsample$"), r"up_\1_upsample"),
    (re.compile(r"^mid_block\.(\d+)$"), r"mid_block_\1"),
    (re.compile(r"^adaptive\.(\d+)$"), r"adaptive_\1"),
]


def remap_ema_state(state: Mapping[str, np.ndarray]) -> dict:
    """Prefer EMA weights: 'model_ema.<key-sans-dots>' replaces '<key>'.

    Matches the UniWeTok checkpoint loader (autoencoder_uni.py:647-670),
    whose EMA entries flatten the dotted key. Non-EMA keys without an EMA
    twin pass through; 'model_ema.*' entries are dropped from the result.
    """
    out = {}
    for k, v in state.items():
        if k.startswith("model_ema."):
            continue
        ema_k = "model_ema." + k.replace(".", "")
        out[k] = state.get(ema_k, v)
    return out


def convert_ae_state(state: Mapping[str, np.ndarray], dtype=jnp.float32) -> dict:
    """ae.safetensors (autoencoder.py VQModel state dict) -> flax params."""
    params: dict = {}
    for key, tensor in state.items():
        parts = key.split(".")
        top, leaf = parts[0], parts[-1]
        mid = ".".join(parts[1:-1])
        sub = ".".join(parts[1:-2])
        tail = parts[-2]
        # upsample conv: "...upsample.conv1.weight" — module path is all but
        # the final "conv1"; try longest-match against join patterns
        name = None
        for pat, repl in _JOIN_PATTERNS:
            if pat.match(sub):
                name = [pat.sub(repl, sub), tail]
                break
            if pat.match(mid):
                name = [pat.sub(repl, mid)]
                break
        if name is None:
            name = [p for p in parts[1:-1]]
        lname, value = _leaf(leaf, tensor, dtype)
        _set(params, [top] + name, lname, jnp.asarray(value))
    return {"params": params}


def convert_diffhead_state(state: Mapping[str, np.ndarray], dtype=jnp.float32) -> dict:
    """vision_head.safetensors (flow_head_parallel_x.py DiffHead) -> flax params."""
    params: dict = {}
    rename = [
        (re.compile(r"^res_blocks\.(\d+)"), r"block_\1"),
        (re.compile(r"^ada_ln_blocks\.(\d+)"), r"ada_ln_\1"),
        (re.compile(r"\bmlp\.(\d+)"), r"mlp_\1"),
    ]
    for key, tensor in state.items():
        parts = key.split(".")
        leaf = parts[-1]
        mid = ".".join(parts[1:-1])  # drop "net." prefix
        assert parts[0] == "net", f"unexpected head key {key}"
        if mid == "final_layer.norm_final":
            continue  # non-affine LayerNorm has no params in our impl
        name = mid
        for pat, repl in rename:
            name = pat.sub(repl, name)
        path = name.split(".")
        lname, value = _leaf(leaf, tensor, dtype)
        _set(params, ["net"] + path, lname, jnp.asarray(value))
    return {"params": params}


def convert_projector_state(state: Mapping[str, np.ndarray], dtype=jnp.float32) -> dict:
    """projector.safetensors (modeling/utils.py MLPconnector fc1/fc2) -> flax."""
    params: dict = {}
    for key, tensor in state.items():
        parts = key.split(".")
        lname, value = _leaf(parts[-1], tensor, dtype)
        _set(params, parts[:-1], lname, jnp.asarray(value))
    return {"params": params}


# ---------------------------------------------------------------------------
# Qwen3 (HF) import
# ---------------------------------------------------------------------------

_QWEN_LAYER_KEYS = {
    "self_attn.q_proj.weight": ("q_proj", True),
    "self_attn.k_proj.weight": ("k_proj", True),
    "self_attn.v_proj.weight": ("v_proj", True),
    "self_attn.o_proj.weight": ("o_proj", True),
    "self_attn.q_norm.weight": ("q_norm", False),
    "self_attn.k_norm.weight": ("k_norm", False),
    "input_layernorm.weight": ("input_layernorm", False),
    "post_attention_layernorm.weight": ("post_attention_layernorm", False),
    "mlp.gate_proj.weight": ("gate_proj", True),
    "mlp.up_proj.weight": ("up_proj", True),
    "mlp.down_proj.weight": ("down_proj", True),
}


def convert_qwen3_state(
    state: Mapping[str, Any], num_layers: int, dtype=jnp.bfloat16
) -> dict:
    """HF Qwen3ForCausalLM state dict -> stacked-layer pytree (models/qwen3.py)."""

    def get(key):
        t = state[key]
        if hasattr(t, "detach"):
            t = t.detach().to("cpu").float().numpy()
        return np.asarray(t, np.float32)

    layers: dict[str, list] = {name: [] for name, _ in _QWEN_LAYER_KEYS.values()}
    for i in range(num_layers):
        for hf_key, (name, transpose) in _QWEN_LAYER_KEYS.items():
            t = get(f"model.layers.{i}.{hf_key}")
            layers[name].append(t.T if transpose else t)

    params = {
        "embed_tokens": jnp.asarray(get("model.embed_tokens.weight"), dtype),
        "final_norm": jnp.asarray(get("model.norm.weight"), dtype),
        "layers": {
            name: jnp.asarray(np.stack(ts), dtype) for name, ts in layers.items()
        },
    }
    if "lm_head.weight" in state:
        params["lm_head"] = jnp.asarray(get("lm_head.weight").T, dtype)
    return params


def load_hf_qwen3_dir(model_dir: str, dtype=jnp.bfloat16) -> tuple[dict, dict]:
    """Load (params, hf_config_dict) from an HF model directory with shards."""
    with open(os.path.join(model_dir, "config.json")) as f:
        cfg = json.load(f)
    index_path = os.path.join(model_dir, "model.safetensors.index.json")
    state: dict[str, np.ndarray] = {}
    if os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)
        shards = sorted(set(index["weight_map"].values()))
        for shard in shards:
            state.update(load_safetensors(os.path.join(model_dir, shard)))
    else:
        state = load_safetensors(os.path.join(model_dir, "model.safetensors"))
    params = convert_qwen3_state(state, cfg["num_hidden_layers"], dtype)
    return params, cfg


# ---------------------------------------------------------------------------
# ImageNet AR (imagenet_gen/src/model.py BitDance) import
# ---------------------------------------------------------------------------

_IMAGENET_LAYER_KEYS = {
    "attention.wqkv.weight": ("wqkv", True),
    "attention.wo.weight": ("wo", True),
    "attention_norm.weight": ("attention_norm", False),
    "ffn_norm.weight": ("ffn_norm", False),
    "feed_forward.w1.weight": ("ffn_w1", True),
    "feed_forward.w2.weight": ("ffn_w2", True),
}


def convert_imagenet_ar_state(
    state: Mapping[str, Any], n_layer: int, dtype=jnp.float32
) -> dict:
    """imagenet BitDance backbone state dict -> stacked-layer pytree
    (models/imagenet_ar.py init_ar_params layout). Head and VAE weights use
    convert_diffhead_state / convert_ae_state; this covers cls_embedding,
    proj_in, emb_norm, layers.*, norm, pos_for_diff, query_token
    (model.py:142-199 / model_parallel.py)."""

    def get(key):
        t = state[key]
        if hasattr(t, "detach"):
            t = t.detach().to("cpu").float().numpy()
        return np.asarray(t, np.float32)

    layers: dict[str, list] = {n: [] for n, _ in _IMAGENET_LAYER_KEYS.values()}
    for i in range(n_layer):
        for tk, (name, transpose) in _IMAGENET_LAYER_KEYS.items():
            t = get(f"layers.{i}.{tk}")
            layers[name].append(t.T if transpose else t)

    params = {
        "cls_embedding": jnp.asarray(get("cls_embedding.weight"), dtype),
        "proj_in": {
            "w1": {"kernel": jnp.asarray(get("proj_in.w1.weight").T, dtype),
                   "bias": jnp.asarray(get("proj_in.w1.bias"), dtype)},
            "w2": {"kernel": jnp.asarray(get("proj_in.w2.weight").T, dtype),
                   "bias": jnp.asarray(get("proj_in.w2.bias"), dtype)},
        },
        "emb_norm": jnp.asarray(get("emb_norm.weight"), dtype),
        "layers": {n: jnp.asarray(np.stack(ts), dtype)
                   for n, ts in layers.items()},
        "norm": jnp.asarray(get("norm.weight"), dtype),
        "pos_for_diff": jnp.asarray(get("pos_for_diff.weight"), dtype),
    }
    if "query_token" in state:
        params["query_token"] = jnp.asarray(get("query_token"), dtype)
    return params
