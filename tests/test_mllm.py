"""Packed multimodal training tests."""

import jax
import jax.numpy as jnp
import numpy as np

from bitdance_tpu.data.packing import T2ISample, pack_t2i_batch
from bitdance_tpu.models import qwen3 as q3
from bitdance_tpu.models.mllm import (
    MLLMConfig,
    PackedBatch,
    init_mllm_params,
    mllm_forward_train,
)
from bitdance_tpu.ops.rotary import sincos_1d_table


def _tiny_cfg(parallel_num=4):
    llm = q3.Qwen3Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16,
    )
    return MLLMConfig(llm=llm, z_channels=8, parallel_num=parallel_num,
                      head_model_dim=128, head_num_blocks=2, head_num_adaln=2,
                      vision_perturb=0.1)


def _make_batch(cfg, seq_budget=96):
    p = cfg.parallel_num
    rng = np.random.default_rng(0)
    table = np.asarray(sincos_1d_table(cfg.llm.hidden_size // 2, 16))
    samples = []
    for i, (n_text, h, w) in enumerate([(5, 4, 4), (7, 2, 4)]):
        samples.append(T2ISample(
            text_ids=rng.integers(1, 100, n_text),
            image_latents=np.sign(rng.normal(size=(h * w, cfg.z_channels))
                                  ).astype(np.float32),
            latent_h=h, latent_w=w,
            vision_start_id=300, res_h_id=301 + h, res_w_id=301 + w,
            query_ids=np.arange(400, 400 + p - 1),
            text_loss=True,
        ))
    raw = pack_t2i_batch(samples, p, seq_budget, table)
    return PackedBatch(**{k: jnp.asarray(v) for k, v in raw.items()}), samples


def test_packed_batch_construction():
    cfg = _tiny_cfg()
    batch, samples = _make_batch(cfg)
    p = cfg.parallel_num
    L = batch.position_ids.shape[0]
    assert L == 96
    # doc ids: two documents + padding -1
    docs = np.asarray(batch.doc_ids)
    assert set(docs.tolist()) == {-1, 0, 1}
    # block ids non-decreasing within each doc
    for d in (0, 1):
        b = np.asarray(batch.block_ids)[docs == d]
        assert (np.diff(b) >= 0).all()
    # every image window shares a block id
    n_text = 5
    first_win = np.asarray(batch.block_ids)[n_text + 2 : n_text + 2 + p]
    assert (first_win == first_win[0]).all()


def test_mllm_forward_train_losses():
    cfg = _tiny_cfg()
    batch, _ = _make_batch(cfg)
    params = init_mllm_params(jax.random.PRNGKey(0), cfg)
    out = mllm_forward_train(params, cfg, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(out["ce_loss_text"]))
    assert np.isfinite(float(out["ce_loss_vision"]))
    assert float(out["ce_loss_text"]) > 0
    assert float(out["ce_loss_vision"]) > 0


def test_mllm_gradients_flow():
    cfg = _tiny_cfg()
    batch, _ = _make_batch(cfg)
    params = init_mllm_params(jax.random.PRNGKey(0), cfg)
    # randomize the head's zero-init adaLN/final layers; at exact zero-init
    # the conditioning gradient is identically zero by construction
    leaves, treedef = jax.tree_util.tree_flatten(params["head"])
    keys = jax.random.split(jax.random.PRNGKey(9), len(leaves))
    params["head"] = jax.tree_util.tree_unflatten(
        treedef, [l + 0.02 * jax.random.normal(k, l.shape)
                  for l, k in zip(leaves, keys)])

    def loss_fn(p):
        out = mllm_forward_train(p, cfg, batch, jax.random.PRNGKey(1))
        return 0.01 * out["ce_loss_text"] + out["ce_loss_vision"]

    g = jax.grad(loss_fn)(params)
    for name in ("llm", "projector", "head"):
        total = jax.tree_util.tree_reduce(
            lambda a, l: a + float(jnp.sum(jnp.abs(l))), g[name], 0.0)
        assert total > 0, f"no gradient into {name}"


def test_padding_does_not_change_losses():
    """Extra sequence padding must not affect the loss (mask isolation)."""
    cfg = _tiny_cfg()
    b1, _ = _make_batch(cfg, seq_budget=80)
    b2, _ = _make_batch(cfg, seq_budget=128)
    params = init_mllm_params(jax.random.PRNGKey(0), cfg)
    o1 = mllm_forward_train(params, cfg, b1, jax.random.PRNGKey(1), train=False)
    o2 = mllm_forward_train(params, cfg, b2, jax.random.PRNGKey(1), train=False)
    np.testing.assert_allclose(float(o1["ce_loss_text"]),
                               float(o2["ce_loss_text"]), rtol=1e-4)
    np.testing.assert_allclose(float(o1["ce_loss_vision"]),
                               float(o2["ce_loss_vision"]), rtol=1e-3)
