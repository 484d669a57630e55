"""Diffusion head + flow-matching sampler tests."""

import jax
import jax.numpy as jnp
import numpy as np

from bitdance_tpu.models.diff_head import DiffHead, DiffNet, timestep_embedding
from bitdance_tpu.models.sampling import euler_maruyama, time_shift


def test_timestep_embedding_cos_first():
    emb = timestep_embedding(jnp.asarray([0.0]), 8)
    # t=0 -> args=0 -> cos half = 1, sin half = 0
    np.testing.assert_allclose(np.asarray(emb[0, :4]), 1.0)
    np.testing.assert_allclose(np.asarray(emb[0, 4:]), 0.0)


def test_time_shift_identity_and_shape():
    t = jnp.linspace(0.01, 0.99, 10)
    np.testing.assert_allclose(np.asarray(time_shift(t, 1.0)), np.asarray(t))
    shifted = time_shift(t, 3.0)
    # flow_shift > 1 compresses early time: (1/s)/((1/s)+(1/t-1)) <= t
    assert np.all(np.asarray(shifted) <= np.asarray(t) + 1e-6)


def test_diff_head_loss_per_token():
    head = DiffHead(ch_target=8, ch_cond=16, ch_latent=128, depth_latent=2,
                    depth_adanln=2, parallel_num=4, use_swiglu=True,
                    P_mean=-0.8, P_std=0.8)
    x = jnp.sign(jax.random.normal(jax.random.PRNGKey(0), (6, 4, 8)))
    cond = jax.random.normal(jax.random.PRNGKey(1), (6, 4, 16))
    params = head.init(jax.random.PRNGKey(2), x, cond, jax.random.PRNGKey(3))
    loss = head.apply(params, x, cond, jax.random.PRNGKey(4))
    assert loss.shape == (6, 4)  # per-token reduction (flow_head_parallel_x.py:104)
    assert np.isfinite(np.asarray(loss)).all()


def test_diff_head_mlp_scalar_loss():
    head = DiffHead(ch_target=8, ch_cond=16, ch_latent=64, depth_latent=2,
                    depth_adanln=1, attention=False, per_token_loss=False)
    x = jnp.sign(jax.random.normal(jax.random.PRNGKey(0), (16, 8)))
    cond = jax.random.normal(jax.random.PRNGKey(1), (16, 16))
    params = head.init(jax.random.PRNGKey(2), x, cond, jax.random.PRNGKey(3))
    loss = head.apply(params, x, cond, jax.random.PRNGKey(4))
    assert loss.shape == ()


def test_transencoder_bounded_output():
    net = DiffNet(in_channels=8, model_channels=128, z_channels=16,
                  num_res_blocks=2, num_ada_ln_blocks=2, attention=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8)) * 10
    t = jnp.asarray([0.3, 0.7])
    c = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 16))
    params = net.init(jax.random.PRNGKey(2), x, t, c)
    out = net.apply(params, x, t, c)
    assert np.all(np.abs(np.asarray(out)) <= 1.0)
    # zero-init final layer -> exactly 0 at init (2*sigmoid(0)-1)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_sampler_recovers_target_with_oracle_net():
    """With a perfect x-prediction oracle, EM sampling converges to the target."""
    target = jnp.sign(jax.random.normal(jax.random.PRNGKey(0), (4, 8)))

    def oracle(x, t, c):
        return jnp.concatenate([target, target], axis=0)[: x.shape[0]]

    cond = jnp.zeros((4, 8))
    out = euler_maruyama(oracle, cond, jax.random.PRNGKey(1), 8,
                         cfg=1.0, cfg_mult=1, num_sampling_steps=50)
    # sign agreement should be perfect given the oracle
    np.testing.assert_array_equal(np.asarray(jnp.sign(out)), np.asarray(target))
    # and values should be close to ±1
    assert float(jnp.max(jnp.abs(out - target))) < 0.25


def test_sampler_cfg_rows():
    """cfg_mult=2: cond rows first, uncond second; output has half the rows."""
    target_c = jnp.ones((2, 4))
    target_u = -jnp.ones((2, 4))

    def net(x, t, c):
        n = x.shape[0] // 2
        return jnp.concatenate([target_c[:n], target_u[:n]], axis=0)

    cond = jnp.zeros((4, 4))
    out = euler_maruyama(net, cond, jax.random.PRNGKey(2), 4,
                         cfg=2.0, cfg_mult=2, num_sampling_steps=25)
    assert out.shape == (2, 4)
    # cfg=2 -> v = u + 2(c-u) pushes strongly toward cond target (+1)
    assert np.all(np.asarray(out) > 0)


def test_sampler_jits_and_scans():
    net_params_dim = 8

    def net(x, t, c):
        return jnp.tanh(x + c[..., :net_params_dim])

    cond = jax.random.normal(jax.random.PRNGKey(3), (2, net_params_dim))
    f = jax.jit(lambda k: euler_maruyama(net, cond, k, net_params_dim,
                                         cfg=1.0, cfg_mult=1, num_sampling_steps=10))
    out = f(jax.random.PRNGKey(4))
    assert out.shape == (2, net_params_dim)
    assert np.isfinite(np.asarray(out)).all()
