"""Release-dir round trip: export_release_dir + export_hf_qwen3 ->
load_t2i_pipeline -> generate().

Exercises the ACTUAL loader path (t2i_pipeline.py:48-74 layout) end-to-end
on tiny random-init models — a key rename anywhere in the export/import
chain fails here, not in production.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from bitdance_tpu.data.special_tokens import add_special_tokens
from bitdance_tpu.train.checkpoints import export_hf_qwen3, export_release_dir
from tests.test_t2i_pipeline import _tiny_bundle

transformers = pytest.importorskip("transformers")


def _make_tokenizer():
    """Minimal offline HF tokenizer with the special tokens the pipeline
    needs (word-level; prompts in tests use in-vocab words)."""
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    vocab = {"<unk>": 0, "user": 1, "assistant": 2, "a": 3, "tiny": 4,
             "cat": 5, "red": 6, "square": 7}
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    hf = PreTrainedTokenizerFast(tokenizer_object=tok, unk_token="<unk>")
    hf.add_special_tokens({"additional_special_tokens": [
        "<|im_start|>", "<|im_end|>", "<|vision_start|>", "<|vision_end|>"]})
    add_special_tokens(hf, max_resolution=64, patch_size=2, parallel_num=4)
    return hf


def test_release_roundtrip_generate(tmp_path):
    b = _tiny_bundle()
    out = str(tmp_path / "release")

    export_release_dir(
        out,
        ae_params=b.ae_params,
        head_params=b.head_params,
        projector_params=b.projector_params,
        configs={
            "ae_config": {
                "ddconfig": dict(z_channels=8, in_channels=3, out_ch=3,
                                 ch=32, ch_mult=[1, 2], num_res_blocks=1),
                "gan_decoder": False,
            },
            "vision_head_config": {
                "ch_target": 8, "ch_cond": 64, "ch_latent": 128,
                "depth_latent": 2, "depth_adanln": 2, "parallel_num": 4,
                "use_swiglu": True, "P_mean": -0.8, "P_std": 0.8,
            },
        },
    )
    export_hf_qwen3(b.llm_params, b.llm_cfg, out)
    _make_tokenizer().save_pretrained(out)

    from bitdance_tpu.pipelines.loader import load_t2i_pipeline

    pipe = load_t2i_pipeline(out, dtype=jnp.float32)

    # exact LLM weight round trip (fp32 -> safetensors -> fp32)
    np.testing.assert_array_equal(
        np.asarray(pipe.bundle.llm_params["layers"]["q_proj"]),
        np.asarray(b.llm_params["layers"]["q_proj"]))
    assert pipe.bundle.parallel_num == 4
    assert pipe.bundle.vae_patch_size == 2

    imgs = pipe.generate("a tiny cat", height=8, width=8,
                         num_sampling_steps=4, guidance_scale=3.0,
                         num_images=1, seed=5)
    assert imgs.shape == (1, 8, 8, 3)
    assert imgs.dtype == np.uint8

    # deterministic under a fixed seed through the loaded pipeline
    imgs2 = pipe.generate("a tiny cat", height=8, width=8,
                          num_sampling_steps=4, guidance_scale=3.0,
                          num_images=1, seed=5)
    np.testing.assert_array_equal(imgs, imgs2)

    # a different guidance scale must NOT trigger a recompile (traced arg)
    n_compiled = len(pipe._jitted)
    pipe.generate("a tiny cat", height=8, width=8, num_sampling_steps=4,
                  guidance_scale=7.5, num_images=1, seed=5)
    assert len(pipe._jitted) == n_compiled
