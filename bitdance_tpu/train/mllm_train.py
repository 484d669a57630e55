"""14B multimodal training step (FSDP/HSDP over the TPU mesh).

The reference never released its 14B loop ("training instruction coming
soon", README.md:178-179); its contract is MLLModel.forward_train +
fsdp_utils + train/configs/bitdance_14b_64x.yaml. This module implements
that loop TPU-natively: one jitted SPMD step, params ZeRO-3 sharded over
"fsdp" (ICI), replicated over "replica" (DCN) — HYBRID_SHARD's layout
(fsdp_utils.py:80-84) — optimizer per yaml:77-87 (AdamW betas .9/.95,
eps 1e-15, clip 1.0, loss weights text 0.01 / vision 1.0).

Data parallelism matches the reference semantics: every FSDP rank consumes
a DISTINCT packed sequence (HYBRID_SHARD is data-parallel across both the
replica and shard groups). Here the batch carries a leading axis sharded
over ("replica", "fsdp"); XLA inserts the gradient reductions. Gradient
accumulation folds extra microbatches through a lax.scan.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from bitdance_tpu.models.mllm import (
    MLLMConfig,
    PackedBatch,
    mllm_forward_train,
    mllm_forward_train_batched,
)
from bitdance_tpu.parallel.mesh import fsdp_shardings
from bitdance_tpu.train import optim as opt_lib
from bitdance_tpu.train.imagenet_train import opt_state_shardings


@dataclasses.dataclass
class MLLMTrainConfig:
    lr: float = 1e-5
    min_lr: float = 1e-7
    weight_decay: float = 0.0
    betas: tuple = (0.9, 0.95)
    eps: float = 1e-15
    warmup_steps: int = 2000
    total_steps: int = 1_000_000
    decay_start: int = -1            # yaml lr_scheduler: constant
    max_grad_norm: float = 1.0
    loss_weight_text: float = 0.01
    loss_weight_vision: float = 1.0
    ema_decay: float = 0.0           # 14B loop has no EMA in the yaml
    grad_accum: int = 1              # microbatches per optimizer step


def make_tx(params, tcfg: MLLMTrainConfig):
    sched = opt_lib.make_lr_schedule(tcfg.lr, tcfg.warmup_steps,
                                     tcfg.total_steps, tcfg.decay_start,
                                     tcfg.min_lr)
    return opt_lib.make_adamw(params, sched, weight_decay=tcfg.weight_decay,
                              betas=tcfg.betas, eps=tcfg.eps,
                              max_grad_norm=tcfg.max_grad_norm)


def make_state(params, tx, tcfg: MLLMTrainConfig) -> opt_lib.TrainState:
    """TrainState with EMA slots only when the config actually uses EMA —
    no dead ema bandwidth when ema_decay<=0."""
    return opt_lib.TrainState.create(params, tx,
                                     with_ema=tcfg.ema_decay > 0)


def _loss_fn(params, batch: PackedBatch, rng, cfg, tcfg, seq_offset=0):
    out = mllm_forward_train_batched(params, cfg, batch, rng,
                                     seq_offset=seq_offset)
    loss = (tcfg.loss_weight_text * out["ce_loss_text"]
            + tcfg.loss_weight_vision * out["ce_loss_vision"])
    return loss, out


def train_step(state: opt_lib.TrainState, batch: PackedBatch, rng: jax.Array,
               *, cfg: MLLMConfig, tcfg: MLLMTrainConfig, tx):
    """One optimizer step.

    Batch field shapes: [B, ...] when tcfg.grad_accum == 1, else
    [grad_accum, B, ...]; B is the global data-parallel batch (one packed
    sequence per dp shard). Gradients are averaged over microbatches AND
    per-sequence rng is folded by global sequence index, so the step is
    bit-invariant (to fp32 accumulation order) to how a fixed set of
    sequences is split between B and grad_accum.
    """
    grad_fn = jax.value_and_grad(
        functools.partial(_loss_fn, cfg=cfg, tcfg=tcfg), has_aux=True)

    if tcfg.grad_accum > 1:
        mb_size = batch.position_ids.shape[1]
        offsets = jnp.arange(tcfg.grad_accum, dtype=jnp.int32) * mb_size

        def body(carry, xs):
            g_acc, loss_acc, out_acc = carry
            mb, off = xs
            (loss, out), grads = grad_fn(state.params, mb, rng,
                                         seq_offset=off)
            g_acc = jax.tree.map(jnp.add, g_acc, grads)
            out_acc = jax.tree.map(jnp.add, out_acc, out)
            return (g_acc, loss_acc + loss, out_acc), None

        g0 = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32),
                          state.params)
        out0 = {"ce_loss_text": jnp.zeros((), jnp.float32),
                "ce_loss_vision": jnp.zeros((), jnp.float32)}
        (grads, loss, out), _ = jax.lax.scan(
            body, (g0, jnp.zeros((), jnp.float32), out0), (batch, offsets))
        inv = 1.0 / tcfg.grad_accum
        # accumulate in fp32, step in the param dtype
        grads = jax.tree.map(lambda g, p: (g * inv).astype(p.dtype),
                             grads, state.params)
        loss = loss * inv
        out = jax.tree.map(lambda x: x * inv, out)
    else:
        (loss, out), grads = grad_fn(state.params, batch, rng)

    gnorm = opt_lib.global_norm(grads)
    new_state = opt_lib.apply_gradients(
        state, grads, tx,
        ema_decay=tcfg.ema_decay if tcfg.ema_decay > 0 else 0.9999)
    metrics = {"loss": loss, "grad_norm": gnorm, **out}
    return new_state, metrics


def eval_step(params: dict, batch: PackedBatch, rng: jax.Array, *,
              cfg: MLLMConfig, tcfg: MLLMTrainConfig):
    """Validation losses on a held-out packed batch (yaml validate_every).
    Accepts batched ([B, ...]) or single-sequence fields."""
    if batch.position_ids.ndim == 2:
        out = mllm_forward_train_batched(params, cfg, batch, rng, train=False)
    else:
        out = mllm_forward_train(params, cfg, batch, rng, train=False)
    loss = (tcfg.loss_weight_text * out["ce_loss_text"]
            + tcfg.loss_weight_vision * out["ce_loss_vision"])
    return {"val_loss": loss, "val_ce_text": out["ce_loss_text"],
            "val_ce_vision": out["ce_loss_vision"]}


def make_sharded_train_step(mesh, state: opt_lib.TrainState, cfg: MLLMConfig,
                            tcfg: MLLMTrainConfig, tx,
                            data_axes: tuple = ("replica", "fsdp")):
    """FSDP-sharded jitted step with real data parallelism: the leading
    batch axis is sharded over `data_axes` (HYBRID_SHARD feeds a distinct
    sequence to every rank, fsdp_utils.py:80-104 + yaml:89-94), so adding
    replicas adds throughput. With grad_accum > 1 fields are [A, B, ...]
    and the microbatch axis stays unsharded.
    """
    repl = NamedSharding(mesh, P())
    state_sh = opt_lib.TrainState(
        params=fsdp_shardings(state.params, mesh),
        opt_state=opt_state_shardings(state.opt_state, state.params, mesh),
        ema_params=(fsdp_shardings(state.ema_params, mesh)
                    if state.ema_params is not None else None),
        step=repl,
    )
    axes = tuple(a for a in data_axes if mesh.shape.get(a, 1) > 1)
    spec = P(axes) if tcfg.grad_accum == 1 else P(None, axes)
    data_sh = NamedSharding(mesh, spec)
    batch_sh = PackedBatch(*([data_sh] * len(PackedBatch._fields)))
    step_fn = functools.partial(train_step, cfg=cfg, tcfg=tcfg, tx=tx)
    jitted = jax.jit(
        step_fn,
        in_shardings=(state_sh, batch_sh, repl),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,),
    )
    return jitted, state_sh
