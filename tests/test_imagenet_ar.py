"""ImageNet AR model tests (1x and parallel variants)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitdance_tpu.models.imagenet_ar import (
    ImageNetARConfig,
    forward_train,
    freqs_cis_table,
    grid_to_tokens,
    init_ar_params,
    make_head,
    sample,
    tokens_to_grid,
    train_ids,
)


def _tiny_cfg(parallel_num=1, **kw):
    return ImageNetARConfig(
        dim=64, n_layer=2, n_head=4, diff_layers=2, diff_dim=64,
        diff_adanln_layers=1, latent_dim=8, down_size=16, patch_size=1,
        resolution=64, cls_token_num=4, num_classes=10,
        diff_batch_mul=2, parallel_num=parallel_num, perturb_rate=0.1, **kw,
    )  # 4x4 = 16 latent tokens


def _init(cfg):
    params = init_ar_params(jax.random.PRNGKey(0), cfg)
    head = make_head(cfg)
    if cfg.parallel_num > 1:
        dummy_t = jnp.zeros((2, cfg.parallel_num, cfg.token_dim))
        dummy_c = jnp.zeros((2, cfg.parallel_num, cfg.dim))
    else:
        dummy_t = jnp.zeros((2, cfg.token_dim))
        dummy_c = jnp.zeros((2, cfg.dim))
    head_params = head.init(jax.random.PRNGKey(1), dummy_t, dummy_c,
                            jax.random.PRNGKey(2))
    return params, head, head_params


@pytest.mark.parametrize("parallel_num", [1, 4])
def test_forward_train_loss(parallel_num):
    cfg = _tiny_cfg(parallel_num)
    params, head, head_params = _init(cfg)
    tokens = jnp.sign(jax.random.normal(
        jax.random.PRNGKey(3), (2, cfg.num_tokens, cfg.token_dim)))
    cls = jnp.asarray([1, 5], jnp.int32)
    loss = forward_train(params, head, head_params, cfg, tokens, cls,
                         jax.random.PRNGKey(4))
    assert loss.shape == ()
    assert np.isfinite(float(loss))

    # zero-init adaLN/final layers give exactly-zero conditioning gradients
    # at init (intended flow-matching behavior); randomize them so gradient
    # flow through the AR backbone is observable
    leaves, treedef = jax.tree_util.tree_flatten(head_params)
    keys = jax.random.split(jax.random.PRNGKey(9), len(leaves))
    head_params_rnd = jax.tree_util.tree_unflatten(
        treedef, [l + 0.02 * jax.random.normal(k, l.shape)
                  for l, k in zip(leaves, keys)])

    g = jax.grad(
        lambda p, hp: forward_train(p, head, hp, cfg, tokens, cls,
                                    jax.random.PRNGKey(4))
    )(params, head_params_rnd)
    gnorm = jax.tree_util.tree_reduce(
        lambda a, l: a + float(jnp.sum(jnp.abs(l))), g, 0.0)
    assert np.isfinite(gnorm) and gnorm > 0


def test_train_ids_block_structure():
    cfg = _tiny_cfg(parallel_num=4)
    block, doc = train_ids(cfg)
    total = cfg.total_tokens  # 4+3 + 16-4 = 19
    assert block.shape == (total,)
    b = np.asarray(block)
    # first cls_token_num-1 strictly increasing (causal)
    assert (np.diff(b[: cfg.cls_token_num - 1]) == 1).all()
    # then windows of parallel_num share ids
    rest = b[cfg.cls_token_num - 1 :]
    assert (rest.reshape(-1, 4) == rest.reshape(-1, 4)[:, :1]).all()


@pytest.mark.parametrize("parallel_num", [1, 4])
@pytest.mark.parametrize("cfg_scale", [1.0, 3.0])
def test_sample_shapes_and_signs(parallel_num, cfg_scale):
    cfg = _tiny_cfg(parallel_num)
    params, head, head_params = _init(cfg)
    out = sample(params, head, head_params, cfg,
                 jnp.asarray([0, 3], jnp.int32), jax.random.PRNGKey(5),
                 num_sampling_steps=4, cfg_scale=cfg_scale)
    assert out.shape == (2, cfg.num_tokens, cfg.token_dim)
    assert set(np.unique(np.asarray(out))) <= {-1.0, 1.0}


def test_sample_jits():
    cfg = _tiny_cfg(parallel_num=4)
    params, head, head_params = _init(cfg)
    fn = jax.jit(lambda k: sample(params, head, head_params, cfg,
                                  jnp.asarray([1], jnp.int32), k,
                                  num_sampling_steps=2, cfg_scale=2.0))
    o1 = fn(jax.random.PRNGKey(0))
    o2 = fn(jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_grid_tokens_roundtrip():
    for parallel_num in (1, 4):
        cfg = _tiny_cfg(parallel_num)
        lat = jnp.sign(jax.random.normal(
            jax.random.PRNGKey(6), (2, cfg.h, cfg.w, cfg.latent_dim)))
        toks = grid_to_tokens(cfg, lat)
        assert toks.shape == (2, cfg.num_tokens, cfg.token_dim)
        back = tokens_to_grid(cfg, toks)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(lat))


def test_grid_tokens_patchsize2_channel_major():
    cfg = ImageNetARConfig(dim=64, n_layer=1, n_head=4, diff_layers=1,
                           diff_dim=64, diff_adanln_layers=1, latent_dim=4,
                           down_size=16, patch_size=2, resolution=128,
                           cls_token_num=2, num_classes=10)
    lat = jax.random.normal(jax.random.PRNGKey(7), (1, 8, 8, 4))
    toks = grid_to_tokens(cfg, lat)
    assert toks.shape == (1, 16, 16)
    # channel-major within a token: token[0][:4] is channels of pixel (0,0)
    np.testing.assert_allclose(
        np.asarray(toks[0, 0, :4]),
        np.asarray(jnp.stack([lat[0, 0, 0, 0], lat[0, 0, 1, 0],
                              lat[0, 1, 0, 0], lat[0, 1, 1, 0]])),
    )
    back = tokens_to_grid(cfg, toks)
    np.testing.assert_allclose(np.asarray(back), np.asarray(lat), atol=1e-6)


def test_freqs_table_shape():
    cfg = _tiny_cfg(parallel_num=4)
    t = freqs_cis_table(cfg)
    assert t.shape == (cfg.total_tokens, cfg.head_dim // 2, 2)
    # prefix rows are identity rotations (t=0)
    np.testing.assert_allclose(np.asarray(t[: cfg.prefix_len, :, 0]), 1.0,
                               atol=1e-6)
