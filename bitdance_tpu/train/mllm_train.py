"""14B multimodal training step (FSDP/HSDP over the TPU mesh).

The reference never released its 14B loop ("training instruction coming
soon", README.md:178-179); its contract is MLLModel.forward_train +
fsdp_utils + train/configs/bitdance_14b_64x.yaml. This module implements
that loop TPU-natively: one jitted SPMD step, params ZeRO-3 sharded over
"fsdp" (ICI), replicated over "replica" (DCN) — HYBRID_SHARD's layout
(fsdp_utils.py:80-84) — optimizer per yaml:77-87 (AdamW betas .9/.95,
eps 1e-15, clip 1.0, loss weights text 0.01 / vision 1.0).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from bitdance_tpu.models.mllm import MLLMConfig, PackedBatch, mllm_forward_train
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


def make_tx(params, tcfg: MLLMTrainConfig):
    sched = opt_lib.make_lr_schedule(tcfg.lr, tcfg.warmup_steps,
                                     tcfg.total_steps, tcfg.decay_start,
                                     tcfg.min_lr)
    return opt_lib.make_adamw(params, sched, weight_decay=tcfg.weight_decay,
                              betas=tcfg.betas, eps=tcfg.eps,
                              max_grad_norm=tcfg.max_grad_norm)


def train_step(state: opt_lib.TrainState, batch: PackedBatch, rng: jax.Array,
               *, cfg: MLLMConfig, tcfg: MLLMTrainConfig, tx):
    def loss_fn(params):
        out = mllm_forward_train(params, cfg, batch, rng)
        loss = (tcfg.loss_weight_text * out["ce_loss_text"]
                + tcfg.loss_weight_vision * out["ce_loss_vision"])
        return loss, out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    gnorm = opt_lib.global_norm(grads)
    new_state = opt_lib.apply_gradients(state, grads, tx,
                                        ema_decay=max(tcfg.ema_decay, 0.0) or 0.9999)
    if tcfg.ema_decay <= 0:
        new_state = new_state._replace(ema_params=state.ema_params)
    metrics = {"loss": loss, "grad_norm": gnorm, **out}
    return new_state, metrics


def eval_step(params: dict, batch: PackedBatch, rng: jax.Array, *,
              cfg: MLLMConfig, tcfg: MLLMTrainConfig):
    """Validation losses on a held-out packed batch (yaml validate_every)."""
    out = mllm_forward_train(params, cfg, batch, rng, train=False)
    loss = (tcfg.loss_weight_text * out["ce_loss_text"]
            + tcfg.loss_weight_vision * out["ce_loss_vision"])
    return {"val_loss": loss, "val_ce_text": out["ce_loss_text"],
            "val_ce_vision": out["ce_loss_vision"]}


def make_sharded_train_step(mesh, state: opt_lib.TrainState, cfg: MLLMConfig,
                            tcfg: MLLMTrainConfig, tx):
    """FSDP-sharded jitted step. Batch fields are replicated (single packed
    sequence per step is the yaml's contract; scale via more replicas/steps).
    """
    repl = NamedSharding(mesh, P())
    state_sh = opt_lib.TrainState(
        params=fsdp_shardings(state.params, mesh),
        opt_state=opt_state_shardings(state.opt_state, state.params, mesh),
        ema_params=(fsdp_shardings(state.ema_params, mesh)
                    if state.ema_params is not None else None),
        step=repl,
    )
    batch_sh = PackedBatch(*([repl] * len(PackedBatch._fields)))
    step_fn = functools.partial(train_step, cfg=cfg, tcfg=tcfg, tx=tx)
    jitted = jax.jit(
        step_fn,
        in_shardings=(state_sh, batch_sh, repl),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,),
    )
    return jitted, state_sh
