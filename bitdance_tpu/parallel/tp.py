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


# ---------------------------------------------------------------------------
# Megatron-style TP for the stacked diffusion-head sampler (VERDICT r4 #5)
#
# The 14B head is the FLOPs-dominant serving component (1424 of 1580
# TFLOP/image — benchmarks/bench_t2i.py analytic model), so full-depth
# bf16/int8 serving beyond one chip needs the HEAD sharded, not just the
# LLM. The stacked sampler's weights use a (3, n_head, hd)-major qkv column
# order and a (2, hidden)-major SwiGLU w1 order; sharding those dims over
# tp would split the "3"/"2" major factors. reorder_stacked_head_major
# permutes both to HEAD-major — (n_head, 3, hd) and (n_head, 2, h') — so a
# last-dim tp sharding lands on whole heads and GSPMD propagates it through
# the sampler's reshapes without resharding. em_sample_stacked detects the
# layout structurally (the "hm_marker" pytree key) and flips its two
# reshapes; the math is a pure column permutation, so single-device outputs
# are bit-identical to the canonical layout.
#
# Cost model (single-chip-equivalent, full-depth bf16 serving at tp=T on a
# v5e pod slice): per net call the four block matmuls' weight traffic
# (1.33GB bf16 at 14B width) and MXU FLOPs (687 GFLOP) divide by T;
# GSPMD inserts two all-reduces per block (after row-parallel wo and w2),
# i.e. 12 x [R, C] f32 per net call ~ 15MB at R=128/C=5120 — ~0.35ms on
# 45GB/s ICI vs the ~4.6ms/T MXU saving, so head TP is net-positive from
# T=2 and the bf16 full-depth model (32.6GB weights) serves at quality
# precision on T>=4 chips (8.2GB/chip + KV/activations). The reference
# serves strictly single-GPU (t2i_pipeline.py:130-140); this is the
# TPU-native scale-out path. Verified token-exact vs single-device at
# tp=2 and tp=4 by __graft_entry__.dryrun_multichip.
# ---------------------------------------------------------------------------

HEAD_COL_PARALLEL = ("wqkv", "wqkv_s", "bqkv", "w1", "w1_s", "b1")
HEAD_ROW_PARALLEL = ("wo", "w2")


def reorder_stacked_head_major(stacked: dict, n_head: int) -> dict:
    """Canonical stacked head -> head-major layout (adds "hm_marker").

    qkv columns (3, nh, hd) -> (nh, 3, hd); w1 columns (2, H) ->
    (nh, 2, H/nh). wo rows and w2 rows/glu order are already head-major /
    order-preserved, so only the column-parallel tensors move.
    """
    import jax.numpy as jnp

    out = dict(stacked)

    def reorder3(w):                       # [..., 3C] (3, nh, hd) major
        c3 = w.shape[-1]
        hd = c3 // 3 // n_head
        x = w.reshape(w.shape[:-1] + (3, n_head, hd))
        x = jnp.moveaxis(x, -3, -2)        # -> (nh, 3, hd)
        return x.reshape(w.shape)

    def reorder2(w):                       # [..., 2H] (2, H) major
        h2 = w.shape[-1]
        hp = h2 // 2 // n_head
        x = w.reshape(w.shape[:-1] + (2, n_head, hp))
        x = jnp.moveaxis(x, -3, -2)        # -> (nh, 2, H/nh)
        return x.reshape(w.shape)

    for k in ("wqkv", "wqkv_s", "bqkv"):
        if k in out:
            out[k] = reorder3(out[k])
    for k in ("w1", "w1_s", "b1"):
        if k in out:
            out[k] = reorder2(out[k])
    out["hm_marker"] = jnp.zeros((), jnp.int8)
    return out


def head_stacked_tp_shardings(stacked: dict, mesh: Mesh, n_head: int) -> dict:
    """NamedShardings for a HEAD-MAJOR stacked dict: column-parallel qkv/w1
    (whole heads per shard), row-parallel wo/w2 (GSPMD all-reduces after),
    everything else (mods projections, in/out projections, norms,
    post-reduce biases) replicated. Falls back to replication when tp
    doesn't divide n_head / the row dim."""
    tp = mesh.shape.get("tp", 1)

    def spec_for(name: str, arr) -> P:
        if tp > 1 and name in HEAD_COL_PARALLEL and n_head % tp == 0:
            return P(*([None] * (arr.ndim - 1) + ["tp"]))
        if tp > 1 and name in HEAD_ROW_PARALLEL and arr.ndim == 3 \
                and arr.shape[1] % tp == 0:
            return P(None, "tp", None)
        return P()

    return {k: NamedSharding(mesh, spec_for(k, v))
            for k, v in stacked.items()}


def shard_head_stacked(stacked: dict, mesh: Mesh, n_head: int) -> dict:
    """Reorder to head-major and device_put with Megatron TP shardings."""
    hm = reorder_stacked_head_major(stacked, n_head)
    sh = head_stacked_tp_shardings(hm, mesh, n_head)
    return {k: jax.device_put(v, sh[k]) for k, v in hm.items()}
