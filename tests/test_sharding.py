"""Multi-device FSDP sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from bitdance_tpu.models.imagenet_ar import ImageNetARConfig, grid_to_tokens
from bitdance_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    fsdp_partition_spec,
    fsdp_shardings,
    shard_params,
)
from bitdance_tpu.train.imagenet_train import (
    ImageNetTrainConfig,
    init_train_state,
    make_sharded_train_step,
    opt_state_shardings,
)


def _tiny_cfg(parallel_num=1):
    return ImageNetARConfig(
        dim=64, n_layer=2, n_head=4, diff_layers=2, diff_dim=64,
        diff_adanln_layers=1, latent_dim=8, down_size=16, patch_size=1,
        resolution=64, cls_token_num=4, num_classes=10,
        diff_batch_mul=2, parallel_num=parallel_num,
    )


def test_mesh_creation():
    mesh = create_mesh(replica=2, fsdp=4)
    assert mesh.shape == {"replica": 2, "fsdp": 4, "tp": 1}
    mesh = create_mesh(fsdp=8)
    assert mesh.shape["fsdp"] == 8


def test_fsdp_partition_rules():
    # small tensors replicated
    assert fsdp_partition_spec("['norm']", (64,), 8) == P()
    # large 2D: biggest divisible axis sharded
    assert fsdp_partition_spec("['embed']", (1001, 512), 8) == P(None, "fsdp")
    assert fsdp_partition_spec("['embed']", (1024, 512), 8) == P("fsdp", None)
    # stacked layer params never shard the layer axis
    spec = fsdp_partition_spec("['layers']['wqkv']", (40, 512, 1536), 8)
    assert spec == P(None, None, "fsdp")
    # indivisible everywhere -> replicated
    assert fsdp_partition_spec("['x']", (999, 333), 8) == P()


def test_sharded_train_step_runs_and_matches_single_device():
    cfg = _tiny_cfg(parallel_num=4)
    tcfg = ImageNetTrainConfig(lr=1e-3, warmup_steps=2, total_steps=100,
                               global_batch_size=8)
    state, head, tx = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)

    tokens = jnp.sign(jax.random.normal(
        jax.random.PRNGKey(1), (8, cfg.num_tokens, cfg.token_dim)))
    cls = jnp.arange(8, dtype=jnp.int32) % 10
    rng = jax.random.PRNGKey(2)

    # single-device baseline
    from bitdance_tpu.train.imagenet_train import train_step
    base_state, base_metrics = jax.jit(
        lambda s, t, c, r: train_step(s, t, c, r, cfg=cfg, head=head, tx=tx,
                                      ema_decay=tcfg.ema_decay)
    )(state, tokens, cls, rng)

    # 8-device FSDP mesh
    mesh = create_mesh(replica=2, fsdp=4)
    step_fn, state_sh = make_sharded_train_step(mesh, state, cfg, head, tx, tcfg)
    state_dev = jax.device_put(state, state_sh)
    new_state, metrics = step_fn(state_dev, tokens, cls, rng)

    np.testing.assert_allclose(float(metrics["loss"]), float(base_metrics["loss"]),
                               rtol=1e-4)
    # params after one step match the single-device result
    flat_a = jax.tree_util.tree_leaves(new_state.params)
    flat_b = jax.tree_util.tree_leaves(base_state.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)
    # verify at least one tensor is actually sharded over fsdp
    specs = [x.sharding.spec for x in flat_a if hasattr(x, "sharding")]
    assert any("fsdp" in str(s) for s in specs)


def test_params_device_put_with_fsdp():
    cfg = _tiny_cfg()
    from bitdance_tpu.models.imagenet_ar import init_ar_params

    params = init_ar_params(jax.random.PRNGKey(0), cfg)
    mesh = create_mesh(fsdp=8)
    sharded = shard_params(params, mesh)
    wqkv = sharded["layers"]["wqkv"]
    assert "fsdp" in str(wqkv.sharding.spec)
    # layer axis untouched
    assert wqkv.sharding.spec[0] is None
