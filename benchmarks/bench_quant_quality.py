"""Quantization quality: token agreement + PSNR of int8/int4 vs bf16.

VERDICT r4 ask #3: the flagship serving configs are quantized end-to-end
(W8A8 int8 or W4A8 int4 LLM, int8/int4 head sampler, int8 VAE convs, int8
KV ring), but no number tied the speed headline to its quality cost — and
the LFQ sign() snap (reference autoencoder.py:385-390) can both mask and
amplify quantization error.

This harness builds ONE bf16 model and derives every quantized variant
from the SAME weights (quantize_linear / quantize_linear_int4 on the same
arrays — a true apples-to-apples ablation, unlike the bench's
random-int8-init memory path), then runs the identical generation (same
prompt/seed/schedule) through each pipeline and reports:

  * token_agreement: fraction of +-1 latent tokens equal to the bf16
    pipeline's (the pre-VAE divergence measure; the reference pipeline's
    entire image content is these tokens),
  * psnr_db: decoded-image PSNR of the quantized pipeline's output
    against the bf16 pipeline's output (uint8, [0,255]).

Prints one `QUANTQUALITY {json}` line.

Usage: python -m benchmarks.bench_quant_quality [--height 256]
       [--hidden 512] [--layers 4] [--parallel 16] [--steps 50]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def quantize_llm_tree(params, mode: str):
    """int8/int4-quantize a bf16 qwen3 tree's matmul weights IN PLACE of
    the bf16 arrays (same values, quantized), matching the structural
    contract of init_qwen3_params_int8/_int4 (embed stays int8 in both
    modes; norms ride along unchanged)."""
    import jax.numpy as jnp

    from bitdance_tpu.ops.int4 import quantize_linear_int4
    from bitdance_tpu.ops.int8 import quantize_linear

    proj = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj",
            "down_proj")
    qfn = quantize_linear_int4 if mode == "int4" else quantize_linear
    out = {
        "embed_tokens": quantize_linear(params["embed_tokens"]),
        "final_norm": params["final_norm"],
        "layers": {k: (qfn(v) if k in proj else v)
                   for k, v in params["layers"].items()},
    }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=0)
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--parallel", type=int, default=16)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--cfg", type=float, default=7.5)
    ap.add_argument("--seeds", type=int, default=3,
                    help="average agreement/PSNR over this many seeds")
    ap.add_argument("--modes", type=str, default="int8,int4",
                    help="comma list of quant configs to compare vs bf16")
    args = ap.parse_args()
    width = args.width or args.height

    from bitdance_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmarks.bench_t2i import _StubTokenizer
    from bitdance_tpu.models import qwen3 as q3
    from bitdance_tpu.models.connector import MLPConnector
    from bitdance_tpu.models.diff_head import DiffHead
    from bitdance_tpu.models.tokenizer import VQModel
    from bitdance_tpu.pipelines.t2i import T2IModelBundle, T2IPipeline

    hidden, z, p = args.hidden, 32, args.parallel
    llm_cfg = q3.Qwen3Config(
        vocab_size=4096, hidden_size=hidden, intermediate_size=hidden * 4,
        num_hidden_layers=args.layers, num_attention_heads=hidden // 64,
        num_key_value_heads=max(hidden // 128, 1), head_dim=64)
    to_bf16 = lambda t: jax.tree.map(lambda x: x.astype(jnp.bfloat16), t)

    # ONE set of weights for everything
    llm_bf16 = q3.init_qwen3_params(jax.random.PRNGKey(0), llm_cfg,
                                    jnp.bfloat16)
    llm_bf16.pop("lm_head", None)
    dd = dict(z_channels=z, in_channels=3, out_ch=3, ch=128,
              ch_mult=[1, 1, 2, 2, 4], num_res_blocks=2)
    lat = args.height // 16
    ae_params = to_bf16(jax.jit(
        lambda k, x: VQModel(ddconfig=dd, dtype=jnp.bfloat16).init(
            k, x, method=VQModel.decode, noise_rng=jax.random.PRNGKey(9)))(
        jax.random.PRNGKey(1), jnp.zeros((1, lat, width // 16, z),
                                         jnp.bfloat16)))
    hp = None
    proj = MLPConnector(out_dim=hidden, dtype=jnp.bfloat16)
    pp = to_bf16(proj.init(jax.random.PRNGKey(4), jnp.zeros((1, z))))

    def build_pipe(mode: str):
        """mode: 'bf16' | 'int8' | 'int4' — all derived from llm_bf16/hp."""
        nonlocal hp
        quant_head = {"bf16": False, "int8": True, "int4": "int4"}[mode]
        ae = VQModel(ddconfig=dd, dtype=jnp.bfloat16,
                     conv_int8=(mode != "bf16"))
        head = DiffHead(ch_target=z, ch_cond=hidden, ch_latent=hidden,
                        depth_latent=6, depth_adanln=2, parallel_num=p,
                        use_swiglu=True, P_mean=-0.8, P_std=0.8,
                        dtype=jnp.bfloat16, sample_weight_quant=quant_head)
        if hp is None:
            hp = to_bf16(jax.jit(head.init)(
                jax.random.PRNGKey(2), jnp.zeros((2, p, z)),
                jnp.zeros((2, p, hidden)), jax.random.PRNGKey(3)))
        stacked = None
        if jax.default_backend() == "tpu":
            # _stack_for_sampler quantizes per head.sample_weight_quant —
            # from the SAME hp tree in every mode
            stacked = jax.jit(lambda v: head.apply(
                v, method=DiffHead._stack_for_sampler))(hp)
        llm = (llm_bf16 if mode == "bf16"
               else jax.jit(quantize_llm_tree, static_argnums=1)(
                   llm_bf16, mode))
        bundle = T2IModelBundle(
            llm_cfg=llm_cfg, llm_params=llm, ae=ae, ae_params=ae_params,
            head=head, head_params=hp, projector=proj, projector_params=pp,
            parallel_num=p, hidden_size=hidden, vae_patch_size=16,
            pe_max_len=4096, head_stacked=stacked)
        return T2IPipeline(bundle, tokenizer=_StubTokenizer(p),
                           kv_int8=(mode != "bf16"))

    prompt = "a photorealistic red cube on a blue sphere"
    modes = [m.strip() for m in args.modes.split(",") if m.strip()]
    result = {"config": f"{args.height}x{width} p={p} llm "
                        f"{args.layers}L/{hidden}d, {args.steps} diff "
                        f"steps, same-weights quantization, "
                        f"{args.seeds} seeds"}

    t0 = time.time()
    ref_pipe = build_pipe("bf16")
    refs = []
    for s in range(args.seeds):
        imgs, toks = ref_pipe.generate(
            prompt, args.height, width, args.steps, args.cfg, 1,
            seed=100 + s, return_tokens=True)
        refs.append((np.asarray(imgs), np.asarray(toks)))
    del ref_pipe
    print(f"# bf16 reference done in {time.time() - t0:.0f}s",
          file=sys.stderr, flush=True)

    for mode in modes:
        t0 = time.time()
        pipe = build_pipe(mode)
        agrees, psnrs = [], []
        for s in range(args.seeds):
            imgs, toks = pipe.generate(
                prompt, args.height, width, args.steps, args.cfg, 1,
                seed=100 + s, return_tokens=True)
            imgs, toks = np.asarray(imgs), np.asarray(toks)
            ref_imgs, ref_toks = refs[s]
            agrees.append(float((toks == ref_toks).mean()))
            mse = float(np.mean((imgs.astype(np.float64)
                                 - ref_imgs.astype(np.float64)) ** 2))
            psnrs.append(99.0 if mse == 0
                         else 10.0 * np.log10(255.0 ** 2 / mse))
        del pipe
        result[f"token_agreement_{mode}"] = round(float(np.mean(agrees)), 4)
        result[f"psnr_{mode}_vs_bf16_db"] = round(float(np.mean(psnrs)), 2)
        print(f"# {mode}: agreement {np.mean(agrees):.4f}, psnr "
              f"{np.mean(psnrs):.2f} dB in {time.time() - t0:.0f}s",
              file=sys.stderr, flush=True)

    print("QUANTQUALITY " + json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
