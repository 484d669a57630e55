"""Weight-import tests: layout conventions and key mapping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitdance_tpu.io.torch_import import (
    convert_ae_state,
    convert_diffhead_state,
    convert_projector_state,
)
from bitdance_tpu.models.diff_head import DiffHead
from bitdance_tpu.models.tokenizer import VQModel

TINY_DD = dict(
    z_channels=8, in_channels=3, out_ch=3, ch=32, ch_mult=[1, 2], num_res_blocks=1
)


def test_conv_weight_convention():
    """torch NCHW Conv2d == flax NHWC Conv after OIHW->HWIO transpose."""
    torch = pytest.importorskip("torch")
    import flax.linen as nn

    conv_t = torch.nn.Conv2d(3, 8, 3, padding=1, bias=True)
    x = np.random.default_rng(0).normal(size=(1, 3, 8, 8)).astype(np.float32)
    with torch.no_grad():
        want = conv_t(torch.from_numpy(x)).permute(0, 2, 3, 1).numpy()

    kernel = conv_t.weight.detach().numpy().transpose(2, 3, 1, 0)
    bias = conv_t.bias.detach().numpy()
    conv_f = nn.Conv(8, (3, 3), padding=1)
    got = conv_f.apply(
        {"params": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)}},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_strided_conv_downsample_convention():
    """stride-2 pad-1 downsample matches torch on even inputs (autoencoder.py:94)."""
    torch = pytest.importorskip("torch")
    import flax.linen as nn

    conv_t = torch.nn.Conv2d(4, 4, 3, stride=2, padding=1)
    x = np.random.default_rng(1).normal(size=(1, 4, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want = conv_t(torch.from_numpy(x)).permute(0, 2, 3, 1).numpy()
    kernel = conv_t.weight.detach().numpy().transpose(2, 3, 1, 0)
    bias = conv_t.bias.detach().numpy()
    conv_f = nn.Conv(4, (3, 3), strides=(2, 2), padding=1)
    got = conv_f.apply(
        {"params": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)}},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
    )
    assert got.shape == want.shape == (1, 8, 8, 4)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def _synth_torch_state_from_tree(tree, prefix=""):
    """Build a torch-style state dict covering a flax param tree (shape-correct)."""
    state = {}
    rng = np.random.default_rng(42)

    def visit(node, path):
        for k, v in node.items():
            p = path + [k]
            if isinstance(v, dict):
                visit(v, p)
            else:
                state[".".join(p)] = rng.normal(size=v.shape).astype(np.float32)

    visit(tree, [prefix] if prefix else [])
    return state


def test_ae_import_covers_every_param():
    model = VQModel(ddconfig=TINY_DD)
    x = jnp.zeros((1, 16, 16, 3))
    ref = model.init(jax.random.PRNGKey(0), x)

    # build a torch-style state dict with reference naming
    rng = np.random.default_rng(0)
    state = {}

    def emit(torch_key, flax_leaf):
        arr = np.asarray(flax_leaf)
        if torch_key.endswith("weight") and arr.ndim == 4:  # conv HWIO -> OIHW
            arr = arr.transpose(3, 2, 0, 1)
        elif torch_key.endswith("weight") and arr.ndim == 2:  # linear
            arr = arr.T
        state[torch_key] = rng.normal(size=arr.shape).astype(np.float32)

    flat = jax.tree_util.tree_flatten_with_path(ref["params"])[0]
    for path, leaf in flat:
        keys = [k.key for k in path]
        # invert linen names to torch names
        name = []
        for k in keys[:-2] + [keys[-2]]:
            import re
            k2 = re.sub(r"^(down|up)_(\d+)_(block)_(\d+)$", r"\1.\2.\3.\4", k)
            k2 = re.sub(r"^(down|up)_(\d+)_(downsample|upsample)$", r"\1.\2.\3", k2)
            k2 = re.sub(r"^(mid_block|adaptive)_(\d+)$", r"\1.\2", k2)
            name.append(k2)
        leaf_name = "weight" if keys[-1] in ("kernel", "weight") else "bias"
        emit(".".join(name) + "." + leaf_name, leaf)

    params = convert_ae_state(state)
    # identical tree structure
    want_paths = {jax.tree_util.keystr(p) for p, _ in flat}
    got_flat = jax.tree_util.tree_flatten_with_path(params["params"])[0]
    got_paths = {jax.tree_util.keystr(p) for p, _ in got_flat}
    assert want_paths == got_paths
    for p, v in got_flat:
        ref_leaf = ref["params"]
        for k in p:
            ref_leaf = ref_leaf[k.key]
        assert v.shape == ref_leaf.shape, f"{jax.tree_util.keystr(p)}: {v.shape} vs {ref_leaf.shape}"
    # converted model must run
    out = model.apply(params, x, method=VQModel.encode)
    assert out.shape == (1, 8, 8, 8)


def test_diffhead_import_structure():
    head = DiffHead(ch_target=8, ch_cond=16, ch_latent=128, depth_latent=2,
                    depth_adanln=2, parallel_num=4, use_swiglu=True)
    x = jnp.zeros((2, 4, 8))
    c = jnp.zeros((2, 4, 16))
    ref = head.init(jax.random.PRNGKey(0), x, c, jax.random.PRNGKey(1))

    rng = np.random.default_rng(1)
    state = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(ref["params"])[0]:
        keys = [k.key for k in path]
        name = []
        import re
        for k in keys[:-1]:
            k2 = re.sub(r"^block_(\d+)$", r"res_blocks.\1", k)
            k2 = re.sub(r"^ada_ln_(\d+)$", r"ada_ln_blocks.\1", k2)
            k2 = re.sub(r"^mlp_(\d+)$", r"mlp.\1", k2)
            name.append(k2)
        leaf_name = "weight" if keys[-1] in ("kernel", "weight") else "bias"
        arr = np.asarray(leaf)
        if keys[-1] == "kernel":
            arr = arr.T
        state[".".join(name) + "." + leaf_name] = rng.normal(size=arr.shape).astype(np.float32)

    params = convert_diffhead_state(state)
    want = {jax.tree_util.keystr(p) for p, _ in
            jax.tree_util.tree_flatten_with_path(ref["params"])[0]}
    got = {jax.tree_util.keystr(p) for p, _ in
           jax.tree_util.tree_flatten_with_path(params["params"])[0]}
    assert want == got
    loss = head.apply(params, x, c, jax.random.PRNGKey(2))
    assert loss.shape == (2, 4)


def test_projector_import_matches_torch():
    """MLPconnector fc1/gelu_tanh/fc2 (modeling/utils.py:9-20) value parity."""
    torch = pytest.importorskip("torch")
    fc1 = torch.nn.Linear(8, 16)
    fc2 = torch.nn.Linear(16, 16)
    x = np.random.default_rng(2).normal(size=(3, 8)).astype(np.float32)
    with torch.no_grad():
        want = fc2(torch.nn.functional.gelu(fc1(torch.from_numpy(x)), approximate="tanh")).numpy()

    state = {
        "fc1.weight": fc1.weight.detach().numpy(),
        "fc1.bias": fc1.bias.detach().numpy(),
        "fc2.weight": fc2.weight.detach().numpy(),
        "fc2.bias": fc2.bias.detach().numpy(),
    }
    params = convert_projector_state(state)

    from bitdance_tpu.models.connector import MLPConnector
    proj = MLPConnector(out_dim=16)
    got = proj.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
