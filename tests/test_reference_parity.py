"""Golden parity vs the ACTUAL reference torch modules (SURVEY §4a).

Imports the reference implementation from /root/reference (torch, CPU),
transplants weights through bitdance_tpu.io.torch_import, and asserts output
parity within fp32 tolerance. Any convention drift (conv layout, RoPE
pairing, norm eps, adaLN ordering, sampler math) fails here.

Skipped entirely when the reference checkout is not present, so the repo
stays standalone.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = os.environ.get("BITDANCE_REFERENCE", "/root/reference")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available")

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp


def _install_ref_imports():
    """Make the reference importable on CPU: namespace-package path plus a
    plain-torch flash_attn stub (the real one is CUDA-only)."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if "flash_attn" not in sys.modules:
        import torch.nn.functional as F

        mod = types.ModuleType("flash_attn")

        def flash_attn_func(q, k, v, causal=False, dropout_p=0.0, **kw):
            # [B, S, H, D] layout in/out, matching flash-attn's contract
            q, k, v = (t.transpose(1, 2) for t in (q, k, v))
            o = F.scaled_dot_product_attention(q, k, v, is_causal=causal)
            return o.transpose(1, 2)

        mod.flash_attn_func = flash_attn_func
        # a real ModuleSpec so transformers' is_flash_attn_2_available()
        # (importlib.util.find_spec) doesn't choke on the stub
        import importlib.machinery

        mod.__spec__ = importlib.machinery.ModuleSpec("flash_attn", loader=None)
        mod.__version__ = "0.0.0-stub"
        sys.modules["flash_attn"] = mod


def _np_state(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def _randomize_(module, scale=0.05, seed=0):
    """Replace every parameter with small random values (zero-inited adaLN /
    final layers would otherwise make output parity vacuous)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * scale)


TINY_DD = dict(z_channels=8, in_channels=3, out_ch=3, ch=32, ch_mult=[1, 2],
               num_res_blocks=1)


# ---------------------------------------------------------------------------
# Tokenizer (modeling/vision_encoder/autoencoder.py:354 VQModel)
# ---------------------------------------------------------------------------

def _ref_vq():
    _install_ref_imports()
    from modeling.vision_encoder import autoencoder as ref_ae

    torch.manual_seed(0)
    m = ref_ae.VQModel(TINY_DD)
    m.eval()
    return m


def test_tokenizer_encode_parity():
    ref = _ref_vq()
    from bitdance_tpu.io.torch_import import convert_ae_state
    from bitdance_tpu.models.tokenizer import VQModel

    params = convert_ae_state(_np_state(ref))
    mine = VQModel(ddconfig=TINY_DD)

    x = np.random.default_rng(0).normal(size=(2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want_h = ref.encoder(torch.from_numpy(x)).permute(0, 2, 3, 1).numpy()
    got_h = np.asarray(mine.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                                  method=VQModel.encode_raw))
    np.testing.assert_allclose(got_h, want_h, rtol=1e-4, atol=1e-4)

    # sign tokens agree wherever |h| is not borderline-zero
    with torch.no_grad():
        want_q = ref.encode(torch.from_numpy(x)).permute(0, 2, 3, 1).numpy()
    got_q = np.asarray(mine.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                                  method=VQModel.encode))
    solid = np.abs(want_h) > 1e-4
    assert (got_q == want_q)[solid].all()


def test_tokenizer_decode_parity():
    ref = _ref_vq()
    from bitdance_tpu.io.torch_import import convert_ae_state
    from bitdance_tpu.models.tokenizer import VQModel

    params = convert_ae_state(_np_state(ref))
    mine = VQModel(ddconfig=TINY_DD)

    z = np.sign(np.random.default_rng(1).normal(size=(2, 8, 4, 4))
                ).astype(np.float32)
    with torch.no_grad():
        want = ref.decoder(torch.from_numpy(z)).permute(0, 2, 3, 1).numpy()
    got = np.asarray(mine.apply(params, jnp.asarray(z.transpose(0, 2, 3, 1)),
                                method=VQModel.decode))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# DiffHead net (modeling/vision_head/flow_head_parallel_x.py:32)
# ---------------------------------------------------------------------------

def _heads(parallel_num=4, ch_cond=16):
    _install_ref_imports()
    from modeling.vision_head import flow_head_parallel_x as ref_fh

    from bitdance_tpu.io.torch_import import convert_diffhead_state
    from bitdance_tpu.models.diff_head import DiffHead

    # ch_latent=128: the reference hardcodes attention head_dim 128
    # (flow_head_parallel_x.py:227)
    kw = dict(ch_target=8, ch_cond=ch_cond, ch_latent=128, depth_latent=2,
              depth_adanln=2, parallel_num=parallel_num, use_swiglu=True)
    ref = ref_fh.DiffHead(**kw)
    _randomize_(ref, seed=3)
    ref.eval()
    mine = DiffHead(**kw)
    params = convert_diffhead_state(_np_state(ref))
    return ref, mine, params


def test_diffhead_net_forward_parity():
    """TransEncoder forward at fixed (x, t, c): covers input proj, timestep
    embed, cond embed, shared adaLN switching, window attention, SwiGLU,
    final layer, and the bounded 2*sigmoid-1 output
    (flow_head_parallel_x.py:254-340)."""
    ref, mine, params = _heads()
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 4, 8)).astype(np.float32)
    t = rng.uniform(0.05, 0.95, size=(2,)).astype(np.float32)
    c = rng.normal(size=(2, 4, 16)).astype(np.float32)
    with torch.no_grad():
        want = ref.net(torch.from_numpy(x), torch.from_numpy(t),
                       torch.from_numpy(c)).numpy()
    got = np.asarray(mine.apply(
        params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(c),
        method=lambda m, xx, tt, cc: m.net(xx, tt, cc)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_euler_maruyama_trajectory_parity(monkeypatch):
    """Full EM sampler trajectory, noise-free: identical x0, zero per-step
    noise on both sides -> identical drift integration
    (sampling_x.py:24-97)."""
    _install_ref_imports()
    from modeling.vision_head import sampling_x as ref_s

    from bitdance_tpu.models import sampling as my_s

    ref, mine, params = _heads()
    rng = np.random.default_rng(7)
    cond = rng.normal(size=(4, 4, 16)).astype(np.float32)   # [cond; uncond]
    x0 = rng.normal(size=(2, 4, 8)).astype(np.float32)

    monkeypatch.setattr(torch, "randn",
                        lambda *s, **k: torch.from_numpy(x0.copy()))
    monkeypatch.setattr(torch, "randn_like",
                        lambda t, **k: torch.zeros_like(t))
    with torch.no_grad():
        want = ref_s.euler_maruyama(
            8, lambda xx, tt, cc: ref.net(xx, tt, cc),
            torch.from_numpy(cond), cfg=2.0, num_sampling_steps=6,
            time_shift=1.0,
        ).numpy()[:2]   # reference tiles the result cfg_mult times

    def net_fn(xx, tt, cc):
        return mine.apply(params, xx, tt, cc,
                          method=lambda m, *a: m.net(*a))

    got = np.asarray(my_s.euler_maruyama(
        net_fn, jnp.asarray(cond), jax.random.PRNGKey(0), 8, cfg=2.0,
        num_sampling_steps=6, x_init=jnp.asarray(x0), stochastic=False))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_euler_trajectory_parity(monkeypatch):
    """Plain euler, including the reference's raw-velocity treatment of the
    x-prediction output (sampling_x.py:100-125, quirk preserved)."""
    _install_ref_imports()
    from modeling.vision_head import sampling_x as ref_s

    from bitdance_tpu.models import sampling as my_s

    ref, mine, params = _heads()
    rng = np.random.default_rng(11)
    cond = rng.normal(size=(4, 4, 16)).astype(np.float32)
    x0 = rng.normal(size=(2, 4, 8)).astype(np.float32)

    monkeypatch.setattr(torch, "randn",
                        lambda *s, **k: torch.from_numpy(x0.copy()))
    with torch.no_grad():
        want = ref_s.euler(
            8, lambda xx, tt, cc: ref.net(xx, tt, cc),
            torch.from_numpy(cond), cfg=2.0, num_sampling_steps=5,
        ).numpy()[:2]

    def net_fn(xx, tt, cc):
        return mine.apply(params, xx, tt, cc,
                          method=lambda m, *a: m.net(*a))

    got = np.asarray(my_s.euler(
        net_fn, jnp.asarray(cond), jax.random.PRNGKey(0), 8, cfg=2.0,
        cfg_mult=2, num_sampling_steps=5, x_init=jnp.asarray(x0)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# ImageNet AR backbone (imagenet_gen/src/model.py:256 BitDance)
# ---------------------------------------------------------------------------

def test_imagenet_backbone_parity(monkeypatch):
    """BitDance.forward_model (emb_norm -> rope'd causal layers -> norm) at
    fixed embedded inputs, weights transplanted into the stacked-scan
    layout (model.py:308-316)."""
    _install_ref_imports()
    import torch._dynamo

    monkeypatch.setattr(torch._dynamo.config, "disable", True)
    from imagenet_gen.src import model as ref_m

    # the hard-coded ch=256 VAE inside BitDance.__init__ is irrelevant to
    # the backbone; replace it to keep the test light
    monkeypatch.setattr(ref_m, "VQModel", lambda *a, **k: torch.nn.Identity())

    torch.manual_seed(0)
    ref = ref_m.BitDance(
        dim=64, n_layer=2, n_head=4, diff_layers=2, diff_dim=32,
        diff_adanln_layers=1, latent_dim=8, down_size=16, patch_size=1,
        resolution=64, diff_batch_mul=1, cls_token_num=4, num_classes=10,
    )
    ref.eval()

    from bitdance_tpu.io.torch_import import convert_imagenet_ar_state
    from bitdance_tpu.models.imagenet_ar import (
        ImageNetARConfig,
        ar_backbone,
        freqs_cis_table,
    )
    from bitdance_tpu.ops.norms import rms_norm

    cfg = ImageNetARConfig(
        dim=64, n_layer=2, n_head=4, diff_layers=2, diff_dim=32,
        diff_adanln_layers=1, latent_dim=8, resolution=64, cls_token_num=4,
        num_classes=10, parallel_num=1)
    params = convert_imagenet_ar_state(_np_state(ref), cfg.n_layer)

    L = ref.freqs_cis.shape[0]            # total_tokens - 1
    rng = np.random.default_rng(13)
    x = rng.normal(size=(2, L, 64)).astype(np.float32) * 0.1

    with torch.no_grad():
        want = ref.forward_model(torch.from_numpy(x), 0, L).numpy()

    freqs = freqs_cis_table(cfg)
    assert freqs.shape[0] == L, (freqs.shape, L)
    block = jnp.arange(L, dtype=jnp.int32)
    doc = jnp.zeros((L,), jnp.int32)

    h = rms_norm(jnp.asarray(x), params["emb_norm"])
    h = ar_backbone(params, cfg, h, freqs, block, doc)
    got = np.asarray(rms_norm(h, params["norm"]))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# Reconstruction-quality harness (scripts/eval_tokenizer_recon.py)
# ---------------------------------------------------------------------------

def test_recon_harness_jax_matches_torch():
    """The PSNR/SSIM harness reports ~zero delta when ours IS the
    transplanted torch model (BASELINE.md 0.05 dB north-star tooling)."""
    from bitdance_tpu.eval.recon import (
        compare_reconstructions,
        reconstruct_jax,
        reconstruct_torch,
    )
    from bitdance_tpu.io.torch_import import convert_ae_state

    ref = _ref_vq()
    state = _np_state(ref)
    params = convert_ae_state(state)

    rng = np.random.default_rng(4)
    images = np.clip(rng.normal(scale=0.5, size=(3, 16, 16, 3)),
                     -1, 1).astype(np.float32)
    recon_j = reconstruct_jax(TINY_DD, params, images, batch=2)
    recon_t = reconstruct_torch(state, TINY_DD, images, batch=2,
                                reference_root=REF)
    rep = compare_reconstructions(images, recon_j, recon_t)
    assert rep.psnr_delta is not None
    assert abs(rep.psnr_delta) < 0.05, rep.as_dict()
    assert abs(rep.ssim_jax - rep.ssim_torch) < 1e-3, rep.as_dict()
    assert rep.within_north_star


# ---------------------------------------------------------------------------
# WHOLE-PIPELINE T2I parity (modeling/t2i_pipeline.py:157-272 gen_image)
# ---------------------------------------------------------------------------
#
# Runs the ACTUAL reference orchestration — BitDanceT2IPipeline.gen_image with
# its two-phase prefill, per-step CFG'd EM sampling, sign/LFQ, projector
# feedback, and ps-raster image decode — against our generate_tokens +
# decode_image on shared tiny weights. This is the only test that can catch a
# convention flip that is self-consistent on both sides (pos-embed added to
# BOTH head conditioning and next-step embeds t2i_pipeline.py:245+253,
# cond-first CFG rows sampling_x.py:16-20, the pass-1/pass-2 prefill boundary
# at res_w t2i_pipeline.py:199-218, the ps-raster decode ordering).
#
# Determinism: every gaussian draw on both sides is replaced by a
# shape-keyed deterministic table (same shapes -> same values), so the whole
# generation is a pure function and token grids must match EXACTLY.

def _shaped_noise(shape):
    # base seed 5: chosen so every torch.sign() input in the tiny pipeline
    # run has |x| > 1e-3 (the margin guard below) — solid vs fp32 noise
    seed = 5
    for d in shape:
        seed = (seed * 131 + int(d) + 7) % (2**31 - 1)
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def _patch_all_noise(monkeypatch):
    import torch as _t

    def fake_randn(*args, **kw):
        if len(args) == 1 and isinstance(args[0], (list, tuple, _t.Size)):
            shape = tuple(args[0])
        else:
            shape = tuple(args)
        return _t.from_numpy(_shaped_noise(shape))

    monkeypatch.setattr(torch, "randn", fake_randn)
    monkeypatch.setattr(torch, "randn_like",
                        lambda x, **kw: fake_randn(*x.shape))
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape=(), dtype=jnp.float32:
            jnp.asarray(_shaped_noise(tuple(shape)), dtype))


class _StubTokenizer:
    """Deterministic tokenizer stub shared by both pipelines."""

    ENCODE = {
        "<|im_start|>user\nA cat<|im_end|>\n<|im_start|>assistant\n":
            [3, 4, 5, 6, 7],
        "<|im_start|>assistant\n": [3, 9],
    }
    SPECIAL = {"<|vision_start|>": 20, "<|res_4|>": 21,
               "<|query_1|>": 31, "<|query_2|>": 32, "<|query_3|>": 33}

    def encode(self, text):
        return list(self.ENCODE[text])

    def convert_tokens_to_ids(self, tok):
        return self.SPECIAL[tok]


def _tiny_llm_pair():
    """(HF Qwen3ForCausalLM, our Qwen3Config, transplanted params)."""
    from transformers import Qwen3Config as HFConfig
    from transformers import Qwen3ForCausalLM

    from bitdance_tpu.io.torch_import import convert_qwen3_state
    from bitdance_tpu.models.qwen3 import Qwen3Config

    hf_cfg = HFConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=False, attention_dropout=0.0)
    torch.manual_seed(7)
    hf = Qwen3ForCausalLM(hf_cfg).eval()
    cfg = Qwen3Config(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, rope_theta=10000.0)
    params = convert_qwen3_state(hf.state_dict(), 2, dtype=jnp.float32)
    return hf, cfg, params


def _ref_projector():
    _install_ref_imports()
    from modeling.utils import MLPconnector as RefConnector

    proj = RefConnector(8, 64, "gelu_pytorch_tanh")
    _randomize_(proj, seed=11)
    proj.eval()
    return proj


def test_whole_t2i_pipeline_parity(monkeypatch):
    _install_ref_imports()
    from modeling import t2i_pipeline as ref_pipe_mod

    from bitdance_tpu.io.torch_import import (
        convert_ae_state,
        convert_diffhead_state,
        convert_projector_state,
    )
    from bitdance_tpu.models.connector import MLPConnector
    from bitdance_tpu.models.tokenizer import VQModel
    from bitdance_tpu.pipelines import t2i as my_t2i

    # --- shared tiny weights -------------------------------------------------
    hf, llm_cfg, llm_params = _tiny_llm_pair()
    ref_ae = _ref_vq()
    ref_head, my_head, head_params = _heads(parallel_num=4, ch_cond=64)
    ref_proj = _ref_projector()

    # --- reference pipeline object (skip the ctor's checkpoint loading) -----
    pipe = ref_pipe_mod.BitDanceT2IPipeline.__new__(
        ref_pipe_mod.BitDanceT2IPipeline)
    pipe.device = "cpu"
    pipe.tokenizer = _StubTokenizer()
    pipe.llm_model = hf
    pipe.hidden_size = 64
    pipe.ae = ref_ae
    pipe.vae_patch_size = 2
    pipe.vision_head = ref_head
    pipe.parallel_num = 4
    pipe.ps = 2
    pipe.embed_vision_mlp = ref_proj
    pipe.build_pos_embed(max_len=64)

    # record |pred| at the sign() boundary so exact-match is meaningful
    sign_margins = []
    real_sign = torch.sign

    def spy_sign(x):
        sign_margins.append(float(x.abs().min()))
        return real_sign(x)

    monkeypatch.setattr(torch, "sign", spy_sign)
    _patch_all_noise(monkeypatch)

    cond_text = "<|im_start|>user\nA cat<|im_end|>\n<|im_start|>assistant\n"
    uncond_text = "<|im_start|>assistant\n"
    with torch.no_grad():
        want_img = pipe.gen_image(
            cond_prompt=cond_text, uncond_prompt=uncond_text,
            guidance_scale=2.0, num_sampling_steps=4, max_length=16,
            num_images=1, image_size=[8, 8]).numpy()
    assert min(sign_margins) > 1e-3, (
        f"borderline sign margin {min(sign_margins)}: pick another seed")

    # reference keeps no token output; recover it from the decode input by
    # re-running decode_image's inverse? no — capture via ae.decode input
    tok_holder = {}
    real_decode = ref_ae.decode

    def spy_decode(z):
        tok_holder["z"] = z.detach().clone()
        return real_decode(z)

    monkeypatch.setattr(ref_ae, "decode", spy_decode)
    with torch.no_grad():
        pipe.gen_image(
            cond_prompt=cond_text, uncond_prompt=uncond_text,
            guidance_scale=2.0, num_sampling_steps=4, max_length=16,
            num_images=1, image_size=[8, 8])
    want_lat = tok_holder["z"].numpy()  # [1, 8, 4, 4] ±1 spatial latents

    # --- our pipeline on the same weights ------------------------------------
    ae_params = convert_ae_state(_np_state(ref_ae))
    proj_params = convert_projector_state(_np_state(ref_proj))
    bundle = my_t2i.T2IModelBundle(
        llm_cfg=llm_cfg, llm_params=llm_params,
        ae=VQModel(ddconfig=TINY_DD), ae_params=ae_params,
        head=my_head, head_params=head_params,
        projector=MLPConnector(out_dim=64), projector_params=proj_params,
        parallel_num=4, hidden_size=64, vae_patch_size=2, pe_max_len=64)

    from bitdance_tpu.ops.rotary import pos_embed_2d

    pos_table = my_t2i.build_pos_table(bundle)
    pe = pos_embed_2d(pos_table, 4, 4, 2)

    tok = _StubTokenizer()
    cond_ids = tok.encode(cond_text)
    uncond_ids = tok.encode(uncond_text)
    P = len(cond_ids)
    rows = [cond_ids, [0] * (P - len(uncond_ids)) + uncond_ids]
    pads = [0, P - len(uncond_ids)]
    from bitdance_tpu.data.special_tokens import image_start_ids

    start_ids = jnp.asarray(image_start_ids(tok, 4, 4, 4), jnp.int32)

    got_tokens = np.asarray(my_t2i.generate_tokens(
        bundle, jnp.asarray(rows, jnp.int32), jnp.asarray(pads, jnp.int32),
        start_ids, pe, jax.random.PRNGKey(0),
        latent_h=4, latent_w=4, num_images=1, guidance_scale=2.0,
        num_sampling_steps=4))  # [1, 16, 8] ps-raster order

    # token-grid parity: EXACT (same weights, same injected noise)
    from bitdance_tpu.models.tokenizer import tokens_to_latents

    got_lat = np.asarray(tokens_to_latents(
        jnp.asarray(got_tokens), 4, 4, ps=2))        # [1, 4, 4, 8] NHWC
    np.testing.assert_array_equal(
        got_lat, want_lat.transpose(0, 2, 3, 1),
        err_msg="±1 token grids diverge from the reference pipeline")

    # decoded-image parity through our ae decode path
    got_img = np.asarray(my_t2i.decode_image(bundle, jnp.asarray(got_tokens),
                                             4, 4))  # [1, 8, 8, 3]
    np.testing.assert_allclose(
        got_img, want_img.transpose(0, 2, 3, 1), rtol=1e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# WHOLE-PIPELINE MLLM training parity (modeling/mllm.py:163-255 forward_train)
# ---------------------------------------------------------------------------
#
# Runs the ACTUAL reference MLLModel.forward_train — index_copy sequence
# assembly, encode_image (vt_forward + projector + per-image 2D pos-embed),
# create_sparse_mask ((causal | parallel-block) & doc) attention, text CE and
# per-token vision flow-matching losses — against our packer +
# mllm_forward_train on transplanted weights. Two packed samples exercise
# document isolation. flex-attention's create_block_mask is replaced by a
# dense float-mask materializer that still evaluates the REFERENCE's
# create_sparse_mask mask_mod (utils.py:22-62); attention math is exact.

class _AttrDict(dict):
    """dict with attribute access (stands in for OmegaConf DictConfig)."""

    __getattr__ = dict.__getitem__


def test_whole_mllm_forward_train_parity(monkeypatch):
    _install_ref_imports()
    from modeling import mllm as ref_mllm_mod

    from bitdance_tpu.data.packing import T2ISample, pack_t2i_batch
    from bitdance_tpu.io.torch_import import (
        convert_ae_state,
        convert_diffhead_state,
        convert_projector_state,
    )
    from bitdance_tpu.models import mllm as my_mllm
    from bitdance_tpu.ops.rotary import sincos_1d_table

    # --- shared tiny weights -------------------------------------------------
    hf, llm_cfg, llm_params = _tiny_llm_pair()
    ref_ae = _ref_vq()
    ref_head, _, head_params = _heads(parallel_num=4, ch_cond=64)
    ref_proj = _ref_projector()

    # --- reference MLLModel (skip the ctor's checkpoint downloads) ----------
    m = ref_mllm_mod.MLLModel.__new__(ref_mllm_mod.MLLModel)
    torch.nn.Module.__init__(m)
    m.config = types.SimpleNamespace(
        encoder=_AttrDict(vt_forward_func="group", max_bs=32),
        vit_patch_size=2)
    m.llm_config = hf.config
    m.hidden_size = 64
    m.vision_encoder = ref_ae
    m.embed_vision_mlp = ref_proj
    m.vision_diffusion_head = ref_head
    m.vision_head_type = "diffusion_parallel_x"
    m.parallel_num = 4
    m.ps = 2
    m.head_config = types.SimpleNamespace(
        vision_pred={"diff_batch_mul": 1}, get=lambda k, d=None: {
            "vision_perturb": 0.0}.get(k, d))
    m.pos_embed_1d = m._get_1d_sincos_pos_embed(32, 32)  # pe_max_len 64 / 2

    class _ModelShim:
        """Accepts the wrapper-only sample_lens kwarg and forwards to HF."""

        def __init__(self, inner):
            self._inner = inner

        def __call__(self, inputs_embeds, position_ids=None, sample_lens=None,
                     attention_mask=None, **kw):
            return self._inner(inputs_embeds=inputs_embeds,
                               position_ids=position_ids,
                               attention_mask=attention_mask)

        def __getattr__(self, k):
            return getattr(self._inner, k)

    m.llm_model = types.SimpleNamespace(model=_ModelShim(hf.model),
                                        lm_head=hf.lm_head)

    def dense_block_mask(mask_mod, B, H, Q_LEN, KV_LEN, device=None,
                         BLOCK_SIZE=128, _compile=False):
        q = torch.arange(Q_LEN)[:, None]
        kv = torch.arange(KV_LEN)[None, :]
        allow = mask_mod(torch.tensor(0), torch.tensor(0), q, kv)
        return torch.where(allow, 0.0, -torch.inf)[None, None].float()

    monkeypatch.setattr(ref_mllm_mod, "create_block_mask", dense_block_mask)
    _patch_all_noise(monkeypatch)

    # --- two T2I samples (8x8 px -> 4x4 latents, parallel_num 4) ------------
    rng = np.random.default_rng(21)
    imgs = [torch.from_numpy(
        np.clip(rng.normal(scale=0.5, size=(1, 3, 8, 8)), -1, 1)
        .astype(np.float32)) for _ in range(2)]
    with torch.no_grad():
        lat0 = ref_ae.vt_forward([imgs[0]], ps=2).numpy()   # [16, 8]
        lat1 = ref_ae.vt_forward([imgs[1]], ps=2).numpy()

    text0, text1 = [3, 4, 5, 6, 7], [3, 8, 9]
    samples = [
        T2ISample(text_ids=np.asarray(text0), image_latents=lat0,
                  latent_h=4, latent_w=4, vision_start_id=20, res_h_id=21,
                  res_w_id=21, query_ids=np.asarray([31, 32, 33]),
                  text_loss=True),
        T2ISample(text_ids=np.asarray(text1), image_latents=lat1,
                  latent_h=4, latent_w=4, vision_start_id=20, res_h_id=21,
                  res_w_id=21, query_ids=np.asarray([31, 32, 33]),
                  text_loss=True),
    ]
    total = sum(len(s.text_ids) + 6 + 16 for s in samples)   # 27 + 25 = 52
    n_text_total = sum(len(s.text_ids) + 6 for s in samples)
    n_ce = sum(len(s.text_ids) - 1 for s in samples)
    table = np.asarray(sincos_1d_table(32, 32))
    raw = pack_t2i_batch(samples, parallel_num=4, seq_budget=total + 1,
                         pos_embed_table=table, text_budget=n_text_total,
                         vis_budget=32)

    # --- reference forward_train on the translated batch ---------------------
    lt = lambda a: torch.from_numpy(np.asarray(a, np.int64))
    with torch.no_grad():
        ref_out = m.forward_train(
            vit_image_tensors=imgs,
            vit_token_indexes_for_encoder=None,
            packed_vit_rope_coords=None,
            vit_token_seqlens=None,
            vit_latent_shapes=[(4, 4), (4, 4)],
            gen_vit_latent_shapes=[(4, 4), (4, 4)],
            sequence_length=total,
            sample_lens=torch.tensor([27, 25]),
            packed_position_ids=lt(raw["position_ids"][:total]),
            packed_vit_token_indexes=lt(raw["vit_token_indexes"]),
            packed_text_ids=lt(raw["packed_text_ids"]),
            packed_text_indexes=lt(raw["packed_text_indexes"]),
            # our packer pads CE arrays to text_budget with trash-slot
            # indexes; the reference takes exact-length index lists
            ce_loss_indexes_text=lt(raw["ce_text_indexes"][:n_ce]),
            packed_label_ids=lt(raw["ce_text_labels"][:n_ce]),
            ce_loss_indexes_vision=lt(raw["vision_loss_indexes"]),
            packed_label_indexes_vision=lt(raw["vision_label_indexes"]),
            split_lens=[len(text0), 22, len(text1), 22],
            attn_modes=["causal", "parallel", "causal", "parallel"],
        )
    want_text = float(ref_out["ce_loss_text"].mean())
    want_vision = float(ref_out["ce_loss_vision"].mean())

    # --- ours on the packer's native output ----------------------------------
    cfg = my_mllm.MLLMConfig(
        llm=llm_cfg, z_channels=8, vit_patch_size=2, parallel_num=4,
        head_model_dim=128, head_num_blocks=2, head_num_adaln=2,
        head_use_swiglu=True, grad_checkpointing=False, P_mean=0.0,
        P_std=1.0, vision_perturb=0.0, pe_max_len=64)
    params = {"llm": llm_params,
              "projector": convert_projector_state(_np_state(ref_proj)),
              "head": convert_diffhead_state(_np_state(ref_head))}
    batch = my_mllm.PackedBatch(**{k: jnp.asarray(v) for k, v in raw.items()})
    got = my_mllm.mllm_forward_train(params, cfg, batch,
                                     jax.random.PRNGKey(0), train=True)

    assert float(got["ce_loss_text"]) == pytest.approx(want_text, rel=1e-4)
    assert float(got["ce_loss_vision"]) == pytest.approx(want_vision, rel=1e-4)


def test_recon_metrics_sanity():
    """PSNR/SSIM match closed-form expectations on synthetic data."""
    from bitdance_tpu.eval.recon import psnr, ssim

    rng = np.random.default_rng(0)
    a = rng.normal(size=(2, 3, 32, 32))
    assert psnr(a, a) == float("inf")
    assert ssim(a, a) == pytest.approx(1.0)
    # PSNR closed form: uniform offset eps -> 10*log10(4 / eps^2)
    b = a + 0.1
    assert psnr(a, b) == pytest.approx(10 * np.log10(4.0 / 0.01), rel=1e-6)
    # decorrelated noise degrades SSIM
    assert ssim(a, rng.normal(size=a.shape)) < 0.2
