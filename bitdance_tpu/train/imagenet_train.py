"""ImageNet AR training: sharded train step + driver loop.

TPU-native equivalent of imagenet_gen/train.py:222-448. The reference's
DDP/torchrun loop becomes a single jitted SPMD train step over a
(replica, fsdp, tp) mesh: params FSDP-sharded, batch data-sharded, gradients
reduced by GSPMD. The frozen tokenizer encodes on the fly (or latents come
pre-cached like the reference's `cached=True` path, model.py:261-265).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from bitdance_tpu.models.diff_head import DiffHead
from bitdance_tpu.models.imagenet_ar import (
    ImageNetARConfig,
    forward_train,
    grid_to_tokens,
    init_ar_params,
    make_head,
)
from bitdance_tpu.parallel.mesh import batch_sharding, fsdp_shardings
from bitdance_tpu.train import optim as opt_lib

NON_DECAY_KEYS = ("proj_in", "cls_embedding", "query_token")  # model.py:200-201


@dataclasses.dataclass
class ImageNetTrainConfig:
    lr: float = 6e-4
    min_lr: float = 0.0
    weight_decay: float = 0.05
    betas: tuple = (0.9, 0.95)
    eps: float = 1e-8
    warmup_steps: int = 2000
    total_steps: int = 500_000
    decay_start: int = -1
    max_grad_norm: float = 1.0
    ema_decay: float = 0.9999
    global_batch_size: int = 256
    # bf16 autocast equivalent (imagenet_gen/train.py:347): params stay
    # f32 in the optimizer (master weights), the forward/backward runs in
    # bf16 — halves activation-residual HBM and doubles MXU rate
    mixed_precision: bool = True


def init_train_state(key: jax.Array, cfg: ImageNetARConfig,
                     tcfg: ImageNetTrainConfig):
    k1, k2, k3 = jax.random.split(key, 3)
    params = init_ar_params(k1, cfg)
    # head COMPUTE dtype follows mixed precision (flax modules compute in
    # their dtype attr — casting stored f32 params alone is not enough);
    # param storage stays f32 via flax's param_dtype default
    head = make_head(cfg, dtype=jnp.bfloat16 if tcfg.mixed_precision
                    else jnp.float32)
    if cfg.parallel_num > 1:
        d_t = jnp.zeros((2, cfg.parallel_num, cfg.token_dim))
        d_c = jnp.zeros((2, cfg.parallel_num, cfg.dim))
    else:
        d_t = jnp.zeros((2, cfg.token_dim))
        d_c = jnp.zeros((2, cfg.dim))
    head_params = jax.jit(head.init)(k2, d_t, d_c, k3)

    all_params = {"ar": params, "head": head_params}
    tx = make_tx(all_params, tcfg)
    state = opt_lib.TrainState.create(all_params, tx)
    return state, head, tx


def make_tx(params, tcfg: ImageNetTrainConfig):
    sched = opt_lib.make_lr_schedule(
        tcfg.lr, tcfg.warmup_steps, tcfg.total_steps,
        tcfg.decay_start, tcfg.min_lr)
    return opt_lib.make_adamw(
        params, sched, weight_decay=tcfg.weight_decay, betas=tcfg.betas,
        eps=tcfg.eps, max_grad_norm=tcfg.max_grad_norm,
        non_decay_keys=NON_DECAY_KEYS)


def train_step(state: opt_lib.TrainState, latent_tokens: jax.Array,
               class_ids: jax.Array, rng: jax.Array, *,
               cfg: ImageNetARConfig, head: DiffHead, tx,
               ema_decay: float,
               mixed_precision: bool = True) -> tuple[opt_lib.TrainState, dict]:
    """One SPMD step over pre-encoded ±1 latent tokens."""

    def loss_fn(params):
        tokens = latent_tokens
        if mixed_precision:
            params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, params)
            tokens = tokens.astype(jnp.bfloat16)
        return forward_train(params["ar"], head, params["head"], cfg,
                             tokens, class_ids, rng)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    gnorm = opt_lib.global_norm(grads)
    new_state = opt_lib.apply_gradients(state, grads, tx, ema_decay)
    return new_state, {"loss": loss, "grad_norm": gnorm}


def opt_state_shardings(opt_state, params, mesh):
    """Shard optimizer moments like their params (ZeRO); scalars replicated.

    adamw's mu/nu subtrees share the params' tree structure — any sub-pytree
    whose structure equals the params tree gets the FSDP rule; every other
    leaf (step counters, empty states) is replicated.
    """
    param_struct = jax.tree_util.tree_structure(params)

    def shard_node(node):
        if jax.tree_util.tree_structure(node) == param_struct:
            return fsdp_shardings(node, mesh)
        if hasattr(node, "_fields"):  # optax NamedTuple state
            return type(node)(*(shard_node(getattr(node, f)) for f in node._fields))
        if isinstance(node, tuple):
            return tuple(shard_node(x) for x in node)
        if isinstance(node, dict):
            return {k: shard_node(v) for k, v in node.items()}
        return NamedSharding(mesh, P())

    return shard_node(opt_state)


def make_sharded_train_step(mesh, state, cfg: ImageNetARConfig,
                            head: DiffHead, tx,
                            tcfg: ImageNetTrainConfig):
    """jit the train step with FSDP param shardings + data-sharded batch.

    Returns (step_fn, state_shardings); device_put the state with the
    shardings before the first call.
    """
    state_sh = opt_lib.TrainState(
        params=fsdp_shardings(state.params, mesh),
        opt_state=opt_state_shardings(state.opt_state, state.params, mesh),
        ema_params=fsdp_shardings(state.ema_params, mesh),
        step=NamedSharding(mesh, P()),
    )
    data_sh = batch_sharding(mesh)
    repl = NamedSharding(mesh, P())
    step_fn = functools.partial(train_step, cfg=cfg, head=head, tx=tx,
                                ema_decay=tcfg.ema_decay,
                                mixed_precision=tcfg.mixed_precision)
    jitted = jax.jit(
        step_fn,
        in_shardings=(state_sh, data_sh, data_sh, repl),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,),
    )
    return jitted, state_sh
