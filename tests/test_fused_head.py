"""Whole-net fused head kernel vs the flax DiffNet reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitdance_tpu.models.diff_head import DiffNet
from bitdance_tpu.ops.fused_head import (
    fused_diffnet_forward,
    fused_net_available,
    stack_diffnet_params,
)


def _net_and_params(attention, c=256, ch=8, cond=64, blocks=4, ada=2,
                    bounded=None, seed=0):
    net = DiffNet(in_channels=ch, model_channels=c, z_channels=cond,
                  num_res_blocks=blocks, num_ada_ln_blocks=ada,
                  attention=attention, use_swiglu=True,
                  bounded_output=bounded, attn_head_dim=128)
    if attention:
        x = jnp.zeros((2, 8, ch))
        t = jnp.zeros((2,))
        cc = jnp.zeros((2, 8, cond))
    else:
        x = jnp.zeros((16, ch))
        t = jnp.zeros((16,))
        cc = jnp.zeros((16, cond))
    params = net.init(jax.random.PRNGKey(seed), x, t, cc)["params"]
    # zero-init adaLN/final make parity vacuous; randomize everything
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(seed + 1), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef, [0.05 * jax.random.normal(k, l.shape) for l, k in
                  zip(leaves, keys)])
    return net, params


@pytest.mark.parametrize("attention", [True, False])
def test_fused_net_matches_flax(attention):
    net, params = _net_and_params(attention)
    rng = np.random.default_rng(3)
    if attention:
        x = jnp.asarray(rng.normal(size=(2, 8, 8)), jnp.float32)
        t_rows = jnp.asarray(rng.uniform(0.1, 0.9, size=(2,)), jnp.float32)
        t = jnp.broadcast_to(t_rows[:, None], (2, 8))
        cc = jnp.asarray(rng.normal(size=(2, 8, 64)), jnp.float32)
        want = net.apply({"params": params}, x, t_rows, cc)
    else:
        x = jnp.asarray(rng.normal(size=(16, 8)), jnp.float32)
        t = jnp.asarray(rng.uniform(0.1, 0.9, size=(16,)), jnp.float32)
        cc = jnp.asarray(rng.normal(size=(16, 64)), jnp.float32)
        want = net.apply({"params": params}, x, t, cc)

    stacked = stack_diffnet_params(params, 4, attention, dtype=jnp.float32)
    # c_emb precomputed outside the kernel (constant across sampler steps)
    c_emb = cc @ params["cond_embed"]["kernel"] + params["cond_embed"]["bias"]
    got = fused_diffnet_forward(
        stacked, x, t, c_emb, num_blocks=4, num_ada=2,
        n_head=256 // 128, attention=attention,
        bounded=attention, interpret=True)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_net_adaln_switching():
    """4 blocks / 2 ada groups: blocks 2-3 must use ada_ln_1, not ada_ln_0."""
    net, params = _net_and_params(True)
    # make the two ada projections very different
    params["ada_ln_1"] = jax.tree.map(lambda a: a * -3.0, params["ada_ln_1"])
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 8, 8)), jnp.float32)
    t_rows = jnp.asarray([0.3, 0.7], jnp.float32)
    cc = jnp.asarray(rng.normal(size=(2, 8, 64)), jnp.float32)
    want = net.apply({"params": params}, x, t_rows, cc)

    stacked = stack_diffnet_params(params, 4, True, dtype=jnp.float32)
    c_emb = cc @ params["cond_embed"]["kernel"] + params["cond_embed"]["bias"]
    got = fused_diffnet_forward(
        stacked, x, jnp.broadcast_to(t_rows[:, None], (2, 8)), c_emb,
        num_blocks=4, num_ada=2, n_head=2, attention=True, bounded=True,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_net_available_gate():
    assert fused_net_available(1024, 128, attention=True)
    assert not fused_net_available(5120, 128, attention=True)


def _em_inputs(net, params, attention=True, steps=5, seed=9, cfg=2.0,
               flow_shift=1.0):
    from bitdance_tpu.models.sampling import time_shift

    rng = np.random.default_rng(seed)
    if attention:
        cond = jnp.asarray(rng.normal(size=(4, 8, 64)), jnp.float32)
        x0 = jnp.asarray(rng.normal(size=(2, 8, 8)), jnp.float32)
        groups = 4
    else:
        cond = jnp.asarray(rng.normal(size=(16, 64)), jnp.float32)
        x0 = jnp.asarray(rng.normal(size=(8, 8)), jnp.float32)
        groups = 1
    t_all = jnp.linspace(0.0, 0.95, steps + 1)
    t_all = time_shift(t_all, flow_shift)
    dt_all = jnp.concatenate([t_all[1:] - t_all[:-1], jnp.zeros((1,))])
    c_flat = cond.reshape(-1, cond.shape[-1])
    c_emb = (c_flat @ params["cond_embed"]["kernel"]
             + params["cond_embed"]["bias"])
    return cond, x0, t_all, dt_all, c_emb, groups


@pytest.mark.parametrize("attention", [True, False])
def test_fused_em_deterministic_matches_sampler(attention):
    """Zero noise: fused whole-sampler kernel == euler_maruyama with
    stochastic=False and the same x0."""
    from bitdance_tpu.models.sampling import euler_maruyama
    from bitdance_tpu.ops.fused_head import em_precompute, fused_em_sample

    net, params = _net_and_params(attention)
    steps = 5
    cond, x0, t_all, dt_all, c_emb, groups = _em_inputs(
        net, params, attention, steps)

    def net_fn(xx, tt, cc):
        return net.apply({"params": params}, xx, tt, cc)

    want = euler_maruyama(
        net_fn, cond, jax.random.PRNGKey(0), 8, cfg=2.0,
        num_sampling_steps=steps, x_init=x0, stochastic=False)

    stacked = stack_diffnet_params(params, 4, attention, dtype=jnp.float32)
    allmods = em_precompute(stacked, c_emb, t_all, out_dtype=jnp.float32)
    x0f = x0.reshape(-1, x0.shape[-1])
    noise = jnp.zeros((steps,) + x0f.shape, jnp.float32)
    got = fused_em_sample(
        stacked, x0f, noise, allmods, t_all, dt_all,
        jnp.float32(2.0), num_blocks=4, num_ada=2, n_head=2, groups=groups,
        attention=attention, bounded=attention, interpret=True)
    np.testing.assert_allclose(np.asarray(got).reshape(want.shape),
                               np.asarray(want), rtol=5e-4, atol=5e-4)


def test_fused_em_stochastic_matches_manual_loop():
    """Nonzero noise: fused kernel == a hand-rolled numpy EM loop driving
    the flax net with the SAME noise sequence."""
    from bitdance_tpu.ops.fused_head import em_precompute, fused_em_sample

    net, params = _net_and_params(True)
    steps = 4
    cond, x0, t_all, dt_all, c_emb, groups = _em_inputs(
        net, params, True, steps)
    rng = np.random.default_rng(17)
    noise = rng.normal(size=(steps,) + x0.shape).astype(np.float32)
    cfg = 2.0

    # manual reference loop (sampling_x.py:44-97 semantics)
    x = np.asarray(x0)
    for i in range(steps):
        t = float(t_all[i])
        dt = float(dt_all[i])
        combined = np.concatenate([x, x], axis=0)
        out = np.asarray(net.apply(
            {"params": params}, jnp.asarray(combined),
            jnp.full((cond.shape[0],), t, jnp.float32), cond))
        v = (out - combined) / max(1.0 - t, 0.05)
        vc = v[2:] + cfg * (v[:2] - v[2:])
        var = (1.0 - t) ** 2 + t * (1.0 - t)
        score = (t * vc - x) / var
        drift = vc + (1.0 - t) * score
        x = x + drift * dt + np.sqrt(2.0 * (1.0 - t) * dt) * noise[i]
    t = float(t_all[steps])
    combined = np.concatenate([x, x], axis=0)
    out = np.asarray(net.apply(
        {"params": params}, jnp.asarray(combined),
        jnp.full((cond.shape[0],), t, jnp.float32), cond))
    v = (out - combined) / max(1.0 - t, 0.05)
    vc = v[2:] + cfg * (v[:2] - v[2:])
    want = x + vc * 0.05

    stacked = stack_diffnet_params(params, 4, True, dtype=jnp.float32)
    allmods = em_precompute(stacked, c_emb, t_all, out_dtype=jnp.float32)
    x0f = x0.reshape(-1, 8)
    noise_f = jnp.asarray(noise.reshape(steps, -1, 8))
    got = fused_em_sample(
        stacked, x0f, noise_f, allmods, t_all, dt_all,
        jnp.float32(cfg), num_blocks=4, num_ada=2, n_head=2, groups=groups,
        attention=True, bounded=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got).reshape(want.shape), want,
                               rtol=5e-4, atol=5e-4)


def test_fused_em_int8_close_to_fp():
    """int8 weight-only quantization stays within a few percent of the fp
    sampler output (pre-sign latents are O(1))."""
    from bitdance_tpu.ops.fused_head import em_precompute, fused_em_sample

    net, params = _net_and_params(True)
    steps = 4
    cond, x0, t_all, dt_all, c_emb, groups = _em_inputs(
        net, params, True, steps)
    x0f = x0.reshape(-1, 8)
    noise = jnp.zeros((steps,) + x0f.shape, jnp.float32)

    outs = {}
    for quant in (False, True):
        stacked = stack_diffnet_params(params, 4, True, dtype=jnp.float32,
                                       quant=quant)
        allmods = em_precompute(stacked, c_emb, t_all, out_dtype=jnp.float32)
        outs[quant] = np.asarray(fused_em_sample(
            stacked, x0f, noise, allmods, t_all, dt_all, jnp.float32(2.0),
            num_blocks=4, num_ada=2, n_head=2, groups=groups,
            attention=True, bounded=True, interpret=True))
    err = np.max(np.abs(outs[True] - outs[False]))
    assert err < 0.08, f"int8 drift too large: {err}"
    assert err > 0, "quantization had no effect (suspicious)"

@pytest.mark.parametrize("attention", [True, False])
def test_em_stacked_xla_matches_kernel(attention):
    """em_sample_stacked (the beyond-VMEM XLA twin) == fused_em_sample
    (interpret) on identical inputs, stochastic noise included."""
    from bitdance_tpu.ops.fused_head import (
        em_precompute,
        em_sample_stacked,
        fused_em_sample,
    )

    net, params = _net_and_params(attention)
    steps = 4
    cond, x0, t_all, dt_all, c_emb, groups = _em_inputs(
        net, params, attention, steps)
    x0f = x0.reshape(-1, 8)
    rng = np.random.default_rng(3)
    noise = jnp.asarray(rng.normal(size=(steps,) + x0f.shape), jnp.float32)

    stacked = stack_diffnet_params(params, 4, attention, dtype=jnp.float32)
    allmods = em_precompute(stacked, c_emb, t_all, out_dtype=jnp.float32)
    kw = dict(num_blocks=4, num_ada=2, n_head=2, groups=groups,
              attention=attention, bounded=attention)
    want = fused_em_sample(stacked, x0f, noise, allmods, t_all, dt_all,
                           jnp.float32(2.0), interpret=True, **kw)
    got = em_sample_stacked(stacked, x0f, noise, allmods, t_all, dt_all,
                            jnp.float32(2.0), **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_em_stacked_xla_int8_close_to_fp():
    from bitdance_tpu.ops.fused_head import em_precompute, em_sample_stacked

    net, params = _net_and_params(True)
    steps = 4
    cond, x0, t_all, dt_all, c_emb, groups = _em_inputs(
        net, params, True, steps)
    x0f = x0.reshape(-1, 8)
    noise = jnp.zeros((steps,) + x0f.shape, jnp.float32)

    outs = {}
    for quant in (False, True):
        stacked = stack_diffnet_params(params, 4, True, dtype=jnp.float32,
                                       quant=quant)
        allmods = em_precompute(stacked, c_emb, t_all, out_dtype=jnp.float32)
        outs[quant] = np.asarray(em_sample_stacked(
            stacked, x0f, noise, allmods, t_all, dt_all, jnp.float32(2.0),
            num_blocks=4, num_ada=2, n_head=2, groups=groups,
            attention=True, bounded=True))
    err = np.max(np.abs(outs[True] - outs[False]))
    assert err < 0.08, f"int8 drift too large: {err}"
    assert err > 0, "quantization had no effect (suspicious)"


def test_em_stacked_bf16_glue_close_to_f32():
    """glue_dtype=bf16 (the quantized 14B serving default set in
    diff_head._run_fused_sample) stays close to the f32-glue sampler: on
    the W8A8 path every matmul input is quantized to 8 bits, so bf16
    elementwise rounding must be subdominant to the int8 drift bound
    asserted above."""
    from bitdance_tpu.ops.fused_head import em_precompute, em_sample_stacked

    net, params = _net_and_params(True)
    steps = 4
    cond, x0, t_all, dt_all, c_emb, groups = _em_inputs(
        net, params, True, steps)
    x0f = x0.reshape(-1, 8)
    noise = jnp.zeros((steps,) + x0f.shape, jnp.float32)

    stacked = stack_diffnet_params(params, 4, True, dtype=jnp.float32,
                                   quant=True)
    allmods = em_precompute(stacked, c_emb, t_all, out_dtype=jnp.float32)
    kw = dict(num_blocks=4, num_ada=2, n_head=2, groups=groups,
              attention=True, bounded=True)
    outs = {}
    for glue in (jnp.float32, jnp.bfloat16):
        outs[glue] = np.asarray(em_sample_stacked(
            stacked, x0f, noise, allmods, t_all, dt_all, jnp.float32(2.0),
            glue_dtype=glue, **kw))
    err = np.max(np.abs(outs[jnp.bfloat16] - outs[jnp.float32]))
    assert err < 0.08, f"bf16 glue drift too large: {err}"
    assert np.all(np.isfinite(outs[jnp.bfloat16]))


def test_em_stacked_chunked_mods_matches_unchunked():
    """mods_chunks > 1 (in-scan chunked precompute) == one-shot allmods."""
    from bitdance_tpu.ops.fused_head import em_precompute, em_sample_stacked

    net, params = _net_and_params(True)
    steps = 4
    cond, x0, t_all, dt_all, c_emb, groups = _em_inputs(
        net, params, True, steps)
    x0f = x0.reshape(-1, 8)
    rng = np.random.default_rng(5)
    noise = jnp.asarray(rng.normal(size=(steps,) + x0f.shape), jnp.float32)

    stacked = stack_diffnet_params(params, 4, True, dtype=jnp.float32)
    allmods = em_precompute(stacked, c_emb, t_all, out_dtype=jnp.float32)
    kw = dict(num_blocks=4, num_ada=2, n_head=2, groups=groups,
              attention=True, bounded=True)
    want = em_sample_stacked(stacked, x0f, noise, allmods, t_all, dt_all,
                             jnp.float32(2.0), **kw)
    got = em_sample_stacked(stacked, x0f, noise, None, t_all, dt_all,
                            jnp.float32(2.0), c_emb=c_emb, mods_chunks=2,
                            **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("attention", [False, True])
def test_fused_em_resident_matches_per_block(attention):
    """The weights-resident kernel variant == the per-(step, block) one."""
    from bitdance_tpu.ops.fused_head import em_precompute, fused_em_sample

    net, params = _net_and_params(attention)
    steps = 3
    cond, x0, t_all, dt_all, c_emb, groups = _em_inputs(
        net, params, attention, steps)
    x0f = x0.reshape(-1, 8)
    rng = np.random.default_rng(7)
    noise = jnp.asarray(rng.normal(size=(steps,) + x0f.shape), jnp.float32)

    stacked = stack_diffnet_params(params, 4, attention, dtype=jnp.float32)
    allmods = em_precompute(stacked, c_emb, t_all, out_dtype=jnp.float32)
    kw = dict(num_blocks=4, num_ada=2, n_head=2, groups=groups,
              attention=attention, bounded=attention, interpret=True)
    want = fused_em_sample(stacked, x0f, noise, allmods, t_all, dt_all,
                           jnp.float32(2.0), resident=False, **kw)
    got = fused_em_sample(stacked, x0f, noise, allmods, t_all, dt_all,
                          jnp.float32(2.0), resident=True, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_int4_pack_unpack_roundtrip():
    """quantize_cols_int4 packing is exactly inverted by _unpack_int4."""
    from bitdance_tpu.ops.fused_head import _unpack_int4, quantize_cols_int4

    rng = np.random.default_rng(13)
    w = jnp.asarray(rng.normal(size=(64, 32)), jnp.float32)
    packed, scale = quantize_cols_int4(w)
    assert packed.shape == (32, 32) and packed.dtype == jnp.int8
    q_want = np.clip(np.round(np.asarray(w) / np.asarray(scale)), -7, 7)
    lo, hi = _unpack_int4(packed)
    q_got = np.concatenate([np.asarray(lo), np.asarray(hi)], axis=0)
    np.testing.assert_array_equal(q_got, q_want.astype(np.int8))


def test_em_stacked_xla_int4_close_to_fp():
    """Packed W4A8 block weights stay close to the fp sampler (the stacked
    XLA twin unpacks structurally via _mmq)."""
    from bitdance_tpu.ops.fused_head import em_precompute, em_sample_stacked

    net, params = _net_and_params(True)
    steps = 4
    cond, x0, t_all, dt_all, c_emb, groups = _em_inputs(
        net, params, True, steps)
    x0f = x0.reshape(-1, 8)
    noise = jnp.zeros((steps,) + x0f.shape, jnp.float32)

    outs = {}
    for quant in (False, "int4"):
        stacked = stack_diffnet_params(params, 4, True, dtype=jnp.float32,
                                       quant=quant)
        allmods = em_precompute(stacked, c_emb, t_all, out_dtype=jnp.float32)
        outs[quant] = np.asarray(em_sample_stacked(
            stacked, x0f, noise, allmods, t_all, dt_all, jnp.float32(2.0),
            num_blocks=4, num_ada=2, n_head=2, groups=groups,
            attention=True, bounded=True))
    err = np.max(np.abs(outs["int4"] - outs[False]))
    assert err < 0.3, f"int4 drift too large: {err}"
    assert err > 0, "quantization had no effect (suspicious)"


@pytest.mark.parametrize("streamed", ["dma"])
@pytest.mark.parametrize("quant", [False, True, "int4"])
def test_fused_em_streamed_matches_per_block(quant, streamed):
    """The manual-DMA sub-block streamed kernel (the beyond-VMEM 14B T2I
    head regime) == the per-(step, block) kernel on identical inputs, int8
    W8A8 and packed int4 W4A8 included. (The r3 grid-tiled variant was
    pruned in r5 — probe_head_dots.py holds its measurement record.)"""
    from bitdance_tpu.ops.fused_head import (
        em_precompute,
        fused_em_sample,
        stack_diffnet_params,
        streamed_dma_available,
    )

    net, params = _net_and_params(True)
    steps = 3
    cond, x0, t_all, dt_all, c_emb, groups = _em_inputs(net, params, True,
                                                        steps)
    x0f = x0.reshape(-1, 8)
    rng = np.random.default_rng(11)
    noise = jnp.asarray(rng.normal(size=(steps,) + x0f.shape), jnp.float32)

    assert streamed_dma_available(256, 2 * x0f.shape[0], True, hidden=384)
    stacked = stack_diffnet_params(params, 4, True, dtype=jnp.float32,
                                   quant=quant)
    allmods = em_precompute(stacked, c_emb, t_all, out_dtype=jnp.float32)
    kw = dict(num_blocks=4, num_ada=2, n_head=2, groups=groups,
              attention=True, bounded=True, interpret=True)
    want = fused_em_sample(stacked, x0f, noise, allmods, t_all, dt_all,
                           jnp.float32(2.0), resident=False, streamed=False,
                           **kw)
    got = fused_em_sample(stacked, x0f, noise, allmods, t_all, dt_all,
                          jnp.float32(2.0), resident=False, streamed=streamed,
                          **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("variant",
                         ["per_block", "resident", "dma"])
def test_fused_em_step_chunked_matches_single_shot(variant):
    """Step-chunked sampling (final_chunk=False chaining, the 14B HBM-peak
    fix in diff_head._run_fused_sample) == one whole-loop kernel call, for
    every kernel variant."""
    from bitdance_tpu.ops.fused_head import em_precompute, fused_em_sample

    net, params = _net_and_params(True)
    steps = 5
    cond, x0, t_all, dt_all, c_emb, groups = _em_inputs(
        net, params, True, steps)
    x0f = x0.reshape(-1, 8)
    rng = np.random.default_rng(17)
    noise = jnp.asarray(rng.normal(size=(steps,) + x0f.shape), jnp.float32)

    stacked = stack_diffnet_params(params, 4, True, dtype=jnp.float32)
    allmods = em_precompute(stacked, c_emb, t_all, out_dtype=jnp.float32)
    kw = dict(num_blocks=4, num_ada=2, n_head=2, groups=groups,
              attention=True, bounded=True, interpret=True,
              resident=variant == "resident",
              streamed=(variant if variant == "dma" else False))
    want = fused_em_sample(stacked, x0f, noise, allmods, t_all, dt_all,
                           jnp.float32(2.0), **kw)

    x = x0f
    s0 = 0
    for c in (2, 2, 1):                      # uneven chunks on purpose
        last = s0 + c >= steps
        n_rows = c + 1 if last else c
        t_sl = t_all[s0:s0 + n_rows]
        mods_c = em_precompute(stacked, c_emb, t_sl, out_dtype=jnp.float32)
        x = fused_em_sample(stacked, x, noise[s0:s0 + c], mods_c, t_sl,
                            dt_all[s0:s0 + n_rows], jnp.float32(2.0),
                            final_chunk=last, **kw)
        s0 += c
    np.testing.assert_allclose(np.asarray(x), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_stream_dma_tile_picker_at_flagship_shapes():
    """Pin the dma-kernel tile choices at the MEASURED flagship configs:
    every (tile, config) pair here ran on a real v5e in r4 — int8 R=256
    tn=2560 (3.353 ms/net-call), int8 R=384 tn=1280 (5.74 s/image
    end-to-end), int4 R=256 tn=2560 (3.187), int4 R=384 tn=1280 (6.93
    end-to-end; tn=2560 VMEM-OOMed before the unpack-intermediate term
    was added to the model)."""
    from bitdance_tpu.ops.fused_head import (
        _pick_stream_dma_tile,
        streamed_dma_available,
    )

    assert _pick_stream_dma_tile(5120, 7680, 256, 7680, 1) == 2560
    assert _pick_stream_dma_tile(5120, 7680, 384, 7680, 1) == 1280
    assert _pick_stream_dma_tile(5120, 7680, 256, 3840, 1, int4=True) == 2560
    assert _pick_stream_dma_tile(5120, 7680, 384, 3840, 1, int4=True) == 1280
    # availability wrappers agree (weight_itemsize 0.5 == int4-packed)
    assert streamed_dma_available(5120, 384, True, 7680, 1)
    assert streamed_dma_available(5120, 384, True, 7680, 0.5)
    # non-attention heads never stream
    assert not streamed_dma_available(5120, 384, False, 7680, 1)


def test_em_stacked_head_major_layout_matches_canonical():
    """The TP head-major weight layout (parallel/tp.py) is a pure column
    permutation: em_sample_stacked must produce BIT-IDENTICAL output from
    the reordered tree (detected via the hm_marker pytree key)."""
    from bitdance_tpu.ops.fused_head import (
        em_precompute,
        em_sample_stacked,
        stack_diffnet_params,
    )
    from bitdance_tpu.parallel.tp import reorder_stacked_head_major

    net, params = _net_and_params(True)
    steps = 3
    cond, x0, t_all, dt_all, c_emb, groups = _em_inputs(net, params, True,
                                                        steps)
    x0f = x0.reshape(-1, 8)
    rng = np.random.default_rng(23)
    noise = jnp.asarray(rng.normal(size=(steps,) + x0f.shape), jnp.float32)
    stacked = stack_diffnet_params(params, 4, True, dtype=jnp.float32)
    allmods = em_precompute(stacked, c_emb, t_all, out_dtype=jnp.float32)
    kw = dict(num_blocks=4, num_ada=2, n_head=2, groups=groups,
              attention=True, bounded=True)
    want = em_sample_stacked(stacked, x0f, noise, allmods, t_all, dt_all,
                             jnp.float32(2.0), **kw)
    hm = reorder_stacked_head_major(stacked, 2)
    assert "hm_marker" in hm
    got = em_sample_stacked(hm, x0f, noise, allmods, t_all, dt_all,
                            jnp.float32(2.0), **kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
