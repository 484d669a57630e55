"""Binary tokenizer (LFQ) training step.

The reference ships the trainable GFQ tokenizer modules (imagenet_gen/src/
qae.py + gfq.py) but no tokenizer trainer; this provides the standard LFQ
recipe those modules imply: reconstruction (L1 + L2) + GFQ entropy aux loss
(sample-entropy minimization + batch-entropy maximization) + commitment MSE
with straight-through gradients. GAN/perceptual terms are intentionally out
of scope for round 1 (no discriminator in the reference repo either).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from bitdance_tpu.models.gfq import gfq_quantize
from bitdance_tpu.models.tokenizer import VQModel
from bitdance_tpu.train import optim as opt_lib


@dataclasses.dataclass
class TokenizerTrainConfig:
    lr: float = 1e-4
    betas: tuple = (0.9, 0.99)
    eps: float = 1e-8
    weight_decay: float = 0.0
    warmup_steps: int = 5000
    total_steps: int = 1_000_000
    max_grad_norm: float = 1.0
    ema_decay: float = 0.9999
    num_codebooks: int = 4
    entropy_weight: float = 0.1
    commit_weight: float = 0.25
    l1_weight: float = 1.0
    l2_weight: float = 1.0


def tokenizer_loss(params, model: VQModel, images: jax.Array, rng: jax.Array,
                   tcfg: TokenizerTrainConfig):
    raw = model.apply(params, images, method=VQModel.encode_raw)
    out = gfq_quantize(raw, tcfg.num_codebooks, training=True)
    recon = model.apply(params, out.quantized, method=VQModel.decode,
                        noise_rng=rng)
    diff = recon.astype(jnp.float32) - images.astype(jnp.float32)
    l1 = jnp.mean(jnp.abs(diff))
    l2 = jnp.mean(jnp.square(diff))
    loss = (tcfg.l1_weight * l1 + tcfg.l2_weight * l2
            + tcfg.entropy_weight * out.entropy_loss
            + tcfg.commit_weight * out.commit_loss)
    metrics = {"loss": loss, "l1": l1, "l2": l2,
               "entropy_loss": out.entropy_loss,
               "commit_loss": out.commit_loss,
               "codebook_entropy": out.codebook_entropy}
    return loss, metrics


def make_tokenizer_train_step(model: VQModel, tcfg: TokenizerTrainConfig, tx):
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: opt_lib.TrainState, images, rng):
        (loss, metrics), grads = jax.value_and_grad(
            tokenizer_loss, has_aux=True)(state.params, model, images, rng, tcfg)
        metrics["grad_norm"] = opt_lib.global_norm(grads)
        new_state = opt_lib.apply_gradients(state, grads, tx, tcfg.ema_decay)
        return new_state, metrics

    return step


def init_tokenizer_train(key, model: VQModel, image_size: int,
                         tcfg: TokenizerTrainConfig):
    params = jax.jit(
        lambda k, x: model.init(k, x, noise_rng=jax.random.PRNGKey(0))
    )(key, jnp.zeros((1, image_size, image_size, 3)))
    sched = opt_lib.make_lr_schedule(tcfg.lr, tcfg.warmup_steps,
                                     tcfg.total_steps)
    tx = opt_lib.make_adamw(params, sched, weight_decay=tcfg.weight_decay,
                            betas=tcfg.betas, eps=tcfg.eps,
                            max_grad_norm=tcfg.max_grad_norm)
    return opt_lib.TrainState.create(params, tx), tx
