"""Checkpointing: orbax sharded save/resume + release-format export.

TPU-native equivalent of the reference's three checkpoint families
(SURVEY.md §5): plain epoch checkpoints (imagenet_gen/train.py:388-405),
FSDP sharded DCP saves with per-rank optimizer shards and keep-last-N
rotation (train/fsdp_utils.py:208-302), and the released safetensors model
directory (t2i_pipeline.py:48-74). Orbax handles sharded multi-host
coordination; `data_status` (dataloader position) rides along so training
resumes mid-epoch (fsdp_utils.py:153-159, 356-361).
"""

from __future__ import annotations

import os
import re
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from bitdance_tpu.train.optim import TrainState


class CheckpointManager:
    """Sharded step checkpoints with keep-last-N rotation and auto-resume.

    async_save=True overlaps the device->host copy + write with training
    (fsdp_utils.py's async checkpoint copies, l:255-287); hdfs_mirror, when
    set, uploads each finished checkpoint to remote storage like the
    reference's async HDFS mirroring.
    """

    def __init__(self, directory: str, keep_last_n: int = 3,
                 async_save: bool = False, hdfs_mirror: str | None = None):
        self.directory = os.path.abspath(directory)
        self.hdfs_mirror = hdfs_mirror
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep_last_n, create=True,
                enable_async_checkpointing=async_save,
            ),
        )
        self._async = async_save

    def save(self, step: int, state: TrainState,
             data_status: dict | None = None) -> None:
        items = {"state": ocp.args.StandardSave(_as_dict(state))}
        if data_status is not None:
            items["data_status"] = ocp.args.JsonSave(data_status)
        self.manager.save(step, args=ocp.args.Composite(**items))
        if not self._async:
            self.manager.wait_until_finished()
            self._mirror(step)

    def _mirror(self, step: int) -> None:
        if not self.hdfs_mirror:
            return
        import threading

        from bitdance_tpu.utils import fs

        src = os.path.join(self.directory, str(step))
        dst = f"{self.hdfs_mirror.rstrip('/')}/{step}"
        threading.Thread(target=fs.copy, args=(src, dst), daemon=True).start()

    def wait_until_finished(self) -> None:
        self.manager.wait_until_finished()

    def latest_step(self) -> int | None:
        return self.manager.latest_step()

    def restore(self, state_like: TrainState, step: int | None = None,
                with_data_status: bool = False):
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            return None, None, None
        target = _as_dict(state_like)
        items = {"state": ocp.args.StandardRestore(target)}
        if with_data_status:
            items["data_status"] = ocp.args.JsonRestore()
        restored = self.manager.restore(step, args=ocp.args.Composite(**items))
        state = _from_dict(restored["state"], state_like)
        data_status = restored.get("data_status") if with_data_status else None
        return state, step, data_status

    def close(self):
        self.manager.close()


def _as_dict(state: TrainState) -> dict:
    return {
        "params": state.params,
        "opt_state": state.opt_state,
        "ema_params": state.ema_params if state.ema_params is not None else {},
        "step": state.step,
    }


def _from_dict(d: dict, like: TrainState) -> TrainState:
    return TrainState(
        params=d["params"],
        opt_state=jax.tree.map(lambda _, v: v, like.opt_state, d["opt_state"]),
        ema_params=d["ema_params"] if like.ema_params is not None else None,
        step=d["step"],
    )


# ---------------------------------------------------------------------------
# Release-format export (safetensors model directory)
# ---------------------------------------------------------------------------

def _flatten_torch_style(tree: Any, torch_rename=None, prefix="") -> dict:
    """Flax pytree -> torch-style flat dict (kernel->weight with transposes)."""
    out = {}
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in flat:
        keys = [k.key for k in path]
        arr = np.asarray(leaf, np.float32)
        leaf_name = keys[-1]
        if leaf_name == "kernel":
            name, arr = "weight", (arr.transpose(3, 2, 0, 1) if arr.ndim == 4
                                   else arr.T)
        else:
            name = leaf_name
        key = ".".join(keys[:-1] + [name])
        if torch_rename:
            key = torch_rename(key)
        # safetensors serializes the raw buffer; transposed views must be
        # materialized or shape metadata and bytes disagree
        out[prefix + key] = np.ascontiguousarray(arr)
    return out


def export_release_dir(
    out_dir: str,
    ae_params: dict | None = None,
    head_params: dict | None = None,
    projector_params: dict | None = None,
    configs: dict[str, dict] | None = None,
) -> None:
    """Write the reference release layout: ae/vision_head/projector
    safetensors + JSON configs (inverse of bitdance_tpu/io/torch_import)."""
    import json

    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)

    def head_rename(key: str) -> str:
        key = re.sub(r"\bblock_(\d+)\b", r"res_blocks.\1", key)
        key = re.sub(r"\bada_ln_(\d+)\b", r"ada_ln_blocks.\1", key)
        key = re.sub(r"\bmlp_(\d+)\b", r"mlp.\1", key)
        return key

    def ae_rename(key: str) -> str:
        key = re.sub(r"\b(down|up)_(\d+)_block_(\d+)\b", r"\1.\2.block.\3", key)
        key = re.sub(r"\b(down|up)_(\d+)_(downsample|upsample)\b", r"\1.\2.\3", key)
        key = re.sub(r"\b(mid_block|adaptive)_(\d+)\b", r"\1.\2", key)
        return key

    if ae_params is not None:
        save_file(_flatten_torch_style(ae_params["params"], ae_rename),
                  os.path.join(out_dir, "ae.safetensors"))
    if head_params is not None:
        save_file(_flatten_torch_style(head_params["params"], head_rename),
                  os.path.join(out_dir, "vision_head.safetensors"))
    if projector_params is not None:
        save_file(_flatten_torch_style(projector_params["params"]),
                  os.path.join(out_dir, "projector.safetensors"))
    for name, cfg in (configs or {}).items():
        with open(os.path.join(out_dir, f"{name}.json"), "w") as f:
            json.dump(cfg, f, indent=2)


def export_hf_qwen3(llm_params: dict, llm_cfg, out_dir: str) -> None:
    """Write the LLM as an HF Qwen3 checkpoint (model.safetensors +
    config.json) — the inverse of io/torch_import.convert_qwen3_state, so a
    release dir round-trips through load_t2i_pipeline (t2i_pipeline.py:48-60).
    """
    import json

    from safetensors.numpy import save_file

    from bitdance_tpu.io.torch_import import _QWEN_LAYER_KEYS

    os.makedirs(out_dir, exist_ok=True)
    state: dict[str, np.ndarray] = {}

    def put(key, arr, transpose):
        a = np.asarray(arr, np.float32)
        state[key] = np.ascontiguousarray(a.T if transpose else a)

    put("model.embed_tokens.weight", llm_params["embed_tokens"], False)
    put("model.norm.weight", llm_params["final_norm"], False)
    layers = llm_params["layers"]
    n_layers = next(iter(layers.values())).shape[0]
    for hf_key, (name, transpose) in _QWEN_LAYER_KEYS.items():
        stacked = np.asarray(layers[name], np.float32)
        for i in range(n_layers):
            put(f"model.layers.{i}.{hf_key}", stacked[i], transpose)
    if "lm_head" in llm_params:
        put("lm_head.weight", llm_params["lm_head"], True)
    save_file(state, os.path.join(out_dir, "model.safetensors"))

    cfg_json = {
        "architectures": ["Qwen3ForCausalLM"],
        "model_type": "qwen3",
        "vocab_size": llm_cfg.vocab_size,
        "hidden_size": llm_cfg.hidden_size,
        "intermediate_size": llm_cfg.intermediate_size,
        "num_hidden_layers": llm_cfg.num_hidden_layers,
        "num_attention_heads": llm_cfg.num_attention_heads,
        "num_key_value_heads": llm_cfg.num_key_value_heads,
        "head_dim": llm_cfg.head_dim,
        "rms_norm_eps": llm_cfg.rms_norm_eps,
        "rope_theta": llm_cfg.rope_theta,
        "tie_word_embeddings": llm_cfg.tie_word_embeddings,
    }
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(cfg_json, f, indent=2)
