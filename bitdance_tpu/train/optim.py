"""Optimizers, LR schedules, and EMA.

Matches the reference's training infrastructure:
  - AdamW with a decay/no-decay split: no weight decay for params with
    ndim < 2 or whose name contains a non-decay key
    (imagenet_gen/train.py:31-70; non_decay_keys model.py:200-201).
  - warmup -> constant -> cosine-to-min_lr schedule (train.py:73-94).
  - EMA via incremental update, decay 0.9999 (imagenet_gen/src/utils.py:29-41).
The fused-AdamW CUDA kernel maps to optax.adamw, which XLA fuses.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import optax


def make_lr_schedule(lr: float, warmup_steps: int, total_steps: int,
                     decay_start: int = -1, min_lr: float = 0.0):
    """warmup -> constant -> (optional) cosine decay (train.py:73-94)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = lr * step / max(warmup_steps, 1)
        if decay_start > 0 and decay_start < total_steps:
            prog = jnp.clip((step - decay_start) / max(total_steps - decay_start, 1e-8),
                            0.0, 1.0)
            cos = min_lr + (lr - min_lr) * 0.5 * (1.0 + jnp.cos(jnp.pi * prog))
            after = jnp.where(step >= decay_start, cos, lr)
        else:
            after = jnp.asarray(lr)
        return jnp.where(step < warmup_steps, warm, after) if warmup_steps > 0 else after

    return schedule


def decay_mask(params, non_decay_keys: Sequence[str] = ()):
    """True where weight decay applies (ndim >= 2 and no non-decay key)."""

    def check(path, leaf):
        path_str = jax.tree_util.keystr(path)
        if any(k in path_str for k in non_decay_keys):
            return False
        return leaf.ndim >= 2

    return jax.tree_util.tree_map_with_path(check, params)


def make_adamw(
    params,
    lr_schedule,
    weight_decay: float = 0.0,
    betas: tuple[float, float] = (0.9, 0.95),
    eps: float = 1e-8,
    max_grad_norm: float = 1.0,
    non_decay_keys: Sequence[str] = (),
) -> optax.GradientTransformation:
    mask = decay_mask(params, non_decay_keys)
    chain = []
    if max_grad_norm and max_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(
        optax.adamw(lr_schedule, b1=betas[0], b2=betas[1], eps=eps,
                    weight_decay=weight_decay, mask=mask)
    )
    return optax.chain(*chain)


def ema_update(ema_params, params, decay: float = 0.9999):
    """ema <- ema*decay + params*(1-decay) (foreach_lerp_, utils.py:29-41)."""
    return optax.incremental_update(params, ema_params, 1.0 - decay)


class TrainState(NamedTuple):
    """Minimal functional train state (params + opt + ema + step)."""

    params: Any
    opt_state: Any
    ema_params: Any
    step: jax.Array

    @staticmethod
    def create(params, tx: optax.GradientTransformation, with_ema: bool = True):
        return TrainState(
            params=params,
            opt_state=tx.init(params),
            ema_params=jax.tree.map(jnp.copy, params) if with_ema else None,
            step=jnp.zeros((), jnp.int32),
        )


def apply_gradients(state: TrainState, grads, tx: optax.GradientTransformation,
                    ema_decay: float = 0.9999) -> TrainState:
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_ema = (ema_update(state.ema_params, new_params, ema_decay)
               if state.ema_params is not None else None)
    return TrainState(new_params, new_opt, new_ema, state.step + 1)


def global_norm(tree) -> jax.Array:
    return optax.global_norm(tree)
