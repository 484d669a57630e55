"""Data pipeline, config system, checkpoints, eval plumbing tests."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _fake_image_folder(tmp_path, n_classes=3, per_class=4, size=64):
    from PIL import Image

    rng = np.random.default_rng(0)
    for c in range(n_classes):
        d = tmp_path / f"class_{c:03d}"
        d.mkdir(parents=True, exist_ok=True)
        for i in range(per_class):
            arr = rng.integers(0, 255, (size + c, size + 2 * i, 3), np.uint8)
            Image.fromarray(arr).save(d / f"img_{i}.png")
    return str(tmp_path)


def test_image_folder_dataset_and_crops(tmp_path):
    from bitdance_tpu.data.imagenet import ImageFolderDataset, ImageCropDataset

    root = _fake_image_folder(tmp_path)
    raw = ImageFolderDataset(root)
    assert len(raw) == 12
    ds = ImageCropDataset(raw, resolution=32, seed=42)
    ds.set_epoch(3)
    img, label = ds[5]
    assert img.shape == (32, 32, 3)
    assert img.dtype == np.float32
    assert -1.0 <= img.min() and img.max() <= 1.0
    # determinism per (seed, epoch, idx)
    img2, _ = ds[5]
    np.testing.assert_array_equal(img, img2)
    ds.set_epoch(4)
    img3, _ = ds[5]
    assert not np.array_equal(img, img3)


def test_sharded_batch_iterator(tmp_path):
    from bitdance_tpu.data.imagenet import (
        ImageFolderDataset,
        ImageCropDataset,
        ShardedBatchIterator,
    )

    root = _fake_image_folder(tmp_path)
    ds = ImageCropDataset(ImageFolderDataset(root), 32, seed=0)
    it0 = ShardedBatchIterator(ds, global_batch_size=4, num_shards=2,
                               shard_index=0, seed=1)
    it1 = ShardedBatchIterator(ds, global_batch_size=4, num_shards=2,
                               shard_index=1, seed=1)
    i0 = it0.epoch_indices(0)
    i1 = it1.epoch_indices(0)
    assert set(i0).isdisjoint(set(i1))
    batches = list(it0.iter_epoch(0))
    assert batches[0][0].shape == (2, 32, 32, 3)
    assert batches[0][1].dtype == np.int32


def test_aug_ratio_decay():
    from bitdance_tpu.data.imagenet import linear_decay_ratio

    assert linear_decay_ratio(0, 700, 750) == 1.0
    assert linear_decay_ratio(725, 700, 750) == 0.5
    assert linear_decay_ratio(800, 700, 750) == 0.0
    assert linear_decay_ratio(10, -1, -1) == 1.0


def test_yaml_config_roundtrip():
    from bitdance_tpu.config import (
        load_yaml,
        mesh_shape_from_yaml,
        mllm_config_from_yaml,
        mllm_train_config_from_yaml,
    )

    path = os.path.join(os.path.dirname(__file__), "..",
                        "train/configs/bitdance_14b_64x.yaml")
    cfg = load_yaml(path)
    m = mllm_config_from_yaml(cfg, vocab_size=152064)
    assert m.parallel_num == 64
    assert m.head_model_dim == 5120
    assert m.head_use_swiglu is True
    assert m.P_mean == -0.8 and m.P_std == 0.8
    assert m.vision_perturb == 0.1
    assert m.z_channels == 32
    # sparse-iteration attention is ON in the production config, derived
    # from the packer cap: ceil(16384/512)+1 = 33 (VERDICT r2 ask #4)
    assert m.attn_max_live_kv == 33
    # explicit override wins; 0 disables (dense)
    cfg.model.attn_max_live_kv = 0
    assert mllm_config_from_yaml(cfg, 152064).attn_max_live_kv is None
    cfg.model.attn_max_live_kv = 17
    assert mllm_config_from_yaml(cfg, 152064).attn_max_live_kv == 17
    del cfg.model["attn_max_live_kv"]
    t = mllm_train_config_from_yaml(cfg)
    assert t.lr == 1e-5 and t.eps == 1e-15
    assert t.loss_weight_text == 0.01
    assert mesh_shape_from_yaml(cfg) == (1, 8)


def test_checkpoint_save_restore(tmp_path):
    import optax

    from bitdance_tpu.train import optim as opt_lib
    from bitdance_tpu.train.checkpoints import CheckpointManager

    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    tx = optax.adamw(1e-3)
    state = opt_lib.TrainState.create(params, tx)
    state = state._replace(params={"w": jnp.full((4, 4), 2.0),
                                   "b": jnp.ones((4,))},
                           step=jnp.int32(17))

    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep_last_n=2)
    mgr.save(17, state, data_status={"epoch": 3, "batch": 42})
    fresh = opt_lib.TrainState.create(params, tx)
    restored, step, ds = mgr.restore(fresh, with_data_status=True)
    assert step == 17
    assert ds == {"epoch": 3, "batch": 42}
    np.testing.assert_array_equal(np.asarray(restored.params["w"]), 2.0)
    assert int(restored.step) == 17
    mgr.close()


def test_checkpoint_keep_last_n(tmp_path):
    import optax

    from bitdance_tpu.train import optim as opt_lib
    from bitdance_tpu.train.checkpoints import CheckpointManager

    params = {"w": jnp.ones((2,))}
    tx = optax.sgd(1e-3)
    state = opt_lib.TrainState.create(params, tx)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep_last_n=2)
    for s in (1, 2, 3):
        mgr.save(s, state._replace(step=jnp.int32(s)))
    assert mgr.latest_step() == 3
    steps = mgr.manager.all_steps()
    assert set(steps) == {2, 3}
    mgr.close()


def test_tokenizer_train_step_improves_recon():
    from bitdance_tpu.models.tokenizer import VQModel
    from bitdance_tpu.train.tokenizer_train import (
        TokenizerTrainConfig,
        init_tokenizer_train,
        make_tokenizer_train_step,
        tokenizer_loss,
    )

    dd = dict(z_channels=8, in_channels=3, out_ch=3, ch=32, ch_mult=[1, 2],
              num_res_blocks=1)
    model = VQModel(ddconfig=dd)
    tcfg = TokenizerTrainConfig(lr=1e-3, warmup_steps=0, total_steps=100,
                                num_codebooks=2)
    state, tx = init_tokenizer_train(jax.random.PRNGKey(0), model, 16, tcfg)
    step = make_tokenizer_train_step(model, tcfg, tx)
    images = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3)) * 2 - 1

    _, m0 = tokenizer_loss(state.params, model, images, jax.random.PRNGKey(2),
                           tcfg)
    for i in range(5):
        state, metrics = step(state, images, jax.random.PRNGKey(3 + i))
    assert float(metrics["loss"]) < float(m0["loss"])
    assert np.isfinite(float(metrics["grad_norm"]))


def test_export_release_roundtrip(tmp_path):
    """export_release_dir output re-imports identically (torch key format)."""
    from bitdance_tpu.io.torch_import import (
        convert_diffhead_state,
        load_safetensors,
    )
    from bitdance_tpu.models.diff_head import DiffHead
    from bitdance_tpu.train.checkpoints import export_release_dir

    head = DiffHead(ch_target=8, ch_cond=16, ch_latent=128, depth_latent=2,
                    depth_adanln=2, parallel_num=4, use_swiglu=True)
    x = jnp.zeros((2, 4, 8))
    c = jnp.zeros((2, 4, 16))
    hp = head.init(jax.random.PRNGKey(0), x, c, jax.random.PRNGKey(1))
    # randomize so the roundtrip is meaningful
    leaves, treedef = jax.tree_util.tree_flatten(hp)
    keys = jax.random.split(jax.random.PRNGKey(2), len(leaves))
    hp = jax.tree_util.tree_unflatten(
        treedef, [jax.random.normal(k, l.shape) for l, k in zip(leaves, keys)])

    export_release_dir(str(tmp_path), head_params=hp,
                       configs={"vision_head_config": {"parallel_num": 4}})
    state = load_safetensors(str(tmp_path / "vision_head.safetensors"))
    hp2 = convert_diffhead_state(state)
    flat1 = jax.tree_util.tree_leaves_with_path(hp["params"])
    for path, leaf in flat1:
        node = hp2["params"]
        for k in path:
            node = node[k.key]
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(node),
                                   rtol=1e-6, atol=1e-6)
    assert json.load(open(tmp_path / "vision_head_config.json")) == {
        "parallel_num": 4}


def test_fs_local_ops(tmp_path):
    from bitdance_tpu.utils import fs

    d = str(tmp_path / "x")
    fs.mkdir(d)
    assert fs.exists(d)
    with open(os.path.join(d, "a.txt"), "w") as f:
        f.write("hi")
    files = fs.listdir(d)
    assert any(p.endswith("a.txt") for p in files)
    fs.copy(os.path.join(d, "a.txt"), str(tmp_path / "b.txt"))
    assert fs.exists(str(tmp_path / "b.txt"))
    fs.remove(str(tmp_path / "b.txt"))
    assert not fs.exists(str(tmp_path / "b.txt"))
    assert not fs.is_hdfs_path(d)
    assert fs.is_hdfs_path("hdfs://cluster/path")


def test_eval_shard_and_grid(tmp_path):
    from bitdance_tpu.eval.base import save_grid

    imgs = np.random.default_rng(0).integers(0, 255, (4, 8, 8, 3), np.uint8)
    out = str(tmp_path / "grid.png")
    save_grid(imgs, out, nrow=2)
    from PIL import Image

    g = np.asarray(Image.open(out))
    assert g.shape == (16, 16, 3)
    np.testing.assert_array_equal(g[:8, :8], imgs[0])
    np.testing.assert_array_equal(g[8:, 8:], imgs[3])


def test_fid_npz_pack(tmp_path):
    from bitdance_tpu.eval.fid import create_npz_from_sample_folder
    from PIL import Image

    d = tmp_path / "samples"
    d.mkdir()
    for i in range(4):
        Image.fromarray(
            np.full((8, 8, 3), i * 10, np.uint8)).save(d / f"{i:06d}.png")
    npz = create_npz_from_sample_folder(str(d), num=4)
    arr = np.load(npz)["arr_0"]
    assert arr.shape == (4, 8, 8, 3)
    assert arr[2, 0, 0, 0] == 20
