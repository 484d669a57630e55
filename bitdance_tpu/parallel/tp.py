"""Tensor-parallel sharding rules for the Qwen3 backbone.

The reference has no tensor parallelism (SURVEY.md §2.6 — TP absent); this
adds it as a mesh axis for 14B-scale inference/serving: attention heads and
MLP hidden dims shard over "tp", GSPMD inserts the all-reduces after o_proj
and down_proj. Combine freely with the fsdp axis (2D sharding).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


QWEN3_TP_RULES = {
    # stacked layer tensors [L, ...]: shard the head/hidden dim over tp,
    # optionally the other matmul dim over fsdp
    "q_proj": P(None, "fsdp", "tp"),
    "k_proj": P(None, "fsdp", "tp"),
    "v_proj": P(None, "fsdp", "tp"),
    "o_proj": P(None, "tp", "fsdp"),
    "gate_proj": P(None, "fsdp", "tp"),
    "up_proj": P(None, "fsdp", "tp"),
    "down_proj": P(None, "tp", "fsdp"),
    "q_norm": P(),
    "k_norm": P(),
    "input_layernorm": P(),
    "post_attention_layernorm": P(),
    # non-layer tensors
    "embed_tokens": P("tp", None),
    "lm_head": P(None, "tp"),
    "final_norm": P(),
}


def qwen3_tp_shardings(params: dict, mesh: Mesh) -> dict:
    """NamedShardings for a qwen3 param pytree under the TP(+FSDP) rules.

    Falls back to replication for axes the mesh doesn't have or sizes that
    don't divide.
    """

    def spec_for(name: str, shape) -> P:
        spec = QWEN3_TP_RULES.get(name, P())
        fixed = []
        for dim, axis in enumerate(spec):
            if axis is None:
                fixed.append(None)
                continue
            size = mesh.shape.get(axis, 1)
            fixed.append(axis if (size > 1 and shape[dim] % size == 0) else None)
        # pad spec to tensor rank
        fixed += [None] * (len(shape) - len(fixed))
        return P(*fixed[: len(shape)])

    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        name = path[-1]
        return NamedSharding(mesh, spec_for(name, tree.shape))

    return walk(params)


def shard_qwen3_params(params: dict, mesh: Mesh) -> dict:
    shardings = qwen3_tp_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)
