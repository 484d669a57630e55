"""T2I generation benchmark: sec/image for the flagship next-patch pipeline.

Random-init weights (throughput is architecture-bound); the full generation
— two-phase prefill, AR decode scan, 50-step diffusion sampler per window,
batched CFG — runs as one compiled program, with the flash-decode Pallas
kernel active for caches >= 1024 entries.

Measurements on one v5e (fused whole-sampler head kernel, round 2):
  1024px 0.7B-class LLM (16L/1024d) bf16: 1.32-1.39 s/image (round 1: 3.10)
  1024px 0.7B-class int8 LLM + int8 head: 1.16
  1024px REAL-14B width bf16 (--real-14b --layers 13, bf16 max): 16.05
  1024px REAL-14B width int8 28L (--quant-llm --quant-head): 11.25
    (int8 more than doubles the single-chip depth budget AND is 1.4x
     faster: at 5120 width the head is matmul-COMPUTE-bound, so the
     stacked XLA sampler with W8A8 MXU dots is the lever — the Pallas
     whole-sampler kernel applies below ~2k width where per-block weights
     fit VMEM and launches, not FLOPs, dominate.)
  ... + 2-image batch, split prefill/decode programs with the KV cache
    donated (decode pins its cache in/out shardings to the layout XLA
    actually produced for prefill — requesting a layout is ignored at
    GB-scale) + step-chunked mods (the whole-loop mods buffer is 1.87GB
    and OOMed the r2 "6.91" config, which never replayed): see
    BENCH_r03.json for the recorded number.
    4-image bf16-KV does NOT fit 28L (args alone 15.1G of 15.75G HBM);
    4-image int8-KV fits but measured slower (9.37) — the int8 KV
    attention dequant costs more than the batching saves.
  See MEMORY_PLAN for full-model deployment options.

Usage: python benchmarks/bench_t2i.py [--height 1024] [--parallel 64]
       [--hidden 1024] [--layers 16] [--steps 50] [--images 1]
"""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


class _StubTokenizer:
    def __init__(self, parallel_num):
        self.special = {}
        base = 2000
        toks = (["<|vision_start|>"]
                + [f"<|res_{j}|>" for j in range(1, 257)]
                + [f"<|query_{j}|>" for j in range(1, parallel_num)])
        for i, t in enumerate(toks):
            self.special[t] = base + i

    def encode(self, text):
        return [min(ord(c), 1999) for c in text][:48]

    def convert_tokens_to_ids(self, tok):
        return self.special[tok]


V5E_PEAK_BF16_TFLOPS = 197.0   # per-chip dense bf16; int8 MXU is ~2x


def analytic_gen_tflops_per_image(llm_cfg, hidden, z, p, prompt_bucket,
                                  lat_h, lat_w, steps, head_blocks=6,
                                  head_ada=2):
    """Model matmul TFLOPs per generated image (LLM + diffusion head; VAE
    conv decode excluded — its share is reported by phase timing). Used for
    the recorded-bench MFU line, not for correctness."""
    D = llm_cfg.hidden_size
    q_out = llm_cfg.num_attention_heads * llm_cfg.head_dim
    kv_out = llm_cfg.num_key_value_heads * llm_cfg.head_dim
    inter = llm_cfg.intermediate_size
    per_layer = D * q_out + 2 * D * kv_out + q_out * D + 3 * D * inter
    tokens = 2 * (prompt_bucket + 2 + p + lat_h * lat_w)   # cond + uncond
    llm_flops = 2.0 * tokens * llm_cfg.num_hidden_layers * per_layer

    C = hidden
    rows = 2 * p                                           # CFG rows / image
    ar_steps = lat_h * lat_w // p
    net_calls = (steps + 1) * ar_steps
    hid = int(1.5 * C)
    block = 3 * C * C + C * C + C * (2 * hid) + hid * C    # qkv+o+w1+w2
    net_params = z * C + head_blocks * block + C * z
    mod_w = head_ada * 6 * C + 2 * C
    head_flops = (2.0 * net_calls * rows * net_params
                  + 2.0 * net_calls * rows * C * mod_w    # mods precompute
                  + 2.0 * ar_steps * rows * C * C)        # cond embed
    return llm_flops / 1e12, head_flops / 1e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--width", type=int, default=0, help="0 = square")
    ap.add_argument("--parallel", type=int, default=64)
    ap.add_argument("--hidden", type=int, default=1024)
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--cfg", type=float, default=7.5)
    ap.add_argument("--images", type=int, default=1)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--real-14b", action="store_true",
                    help="true BitDance-14B geometry (Qwen3-14B dims, 152k "
                         "vocab, 5120-wide head); --layers overrides depth. "
                         "The full 40L model is ~29.5GB bf16 + 3.1GB head "
                         "and does NOT fit one 16GB v5e — see MEMORY_PLAN "
                         "in this file.")
    ap.add_argument("--quant-head", action="store_true",
                    help="int8 weight-only quantized fused head sampler")
    ap.add_argument("--head-int4", action="store_true",
                    help="packed int4 weight-only head sampler (W4A8; "
                         "halves the streamed kernel's weight DMA again)")
    ap.add_argument("--kv-int8", action="store_true",
                    help="fused int8 KV ring buffer (4x smaller than bf16 "
                         "k+v; enables multi-image 14B batches)")
    ap.add_argument("--quant-llm", action="store_true",
                    help="int8 W8A8 LLM matmuls (ops/int8.py): halves "
                         "weight HBM traffic and doubles the single-chip "
                         "depth budget at true 14B width")
    ap.add_argument("--vae-int8", action="store_true",
                    help="W8A8 int8 conv path for the VAE decoder")
    ap.add_argument("--quant-llm-int4", action="store_true",
                    help="packed int4 W4A8 LLM matmuls (ops/int4.py): the "
                         "capacity config — the FULL 40-layer 14B stack is "
                         "6.6GB packed and fits one chip (int8 needs 13.2GB "
                         "and does not)")
    args = ap.parse_args()
    width = args.width or args.height

    from bitdance_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from bitdance_tpu.models import qwen3 as q3
    from bitdance_tpu.models.connector import MLPConnector
    from bitdance_tpu.models.diff_head import DiffHead
    from bitdance_tpu.models.tokenizer import VQModel
    from bitdance_tpu.pipelines.t2i import T2IModelBundle, T2IPipeline

    if args.real_14b:
        # train/configs/bitdance_14b_64x.yaml:18-35 geometry
        base = q3.Qwen3Config.qwen3_14b()
        hidden, z, p = base.hidden_size, 32, args.parallel
        llm_cfg = q3.Qwen3Config(
            vocab_size=base.vocab_size, hidden_size=base.hidden_size,
            intermediate_size=base.intermediate_size,
            num_hidden_layers=args.layers,
            num_attention_heads=base.num_attention_heads,
            num_key_value_heads=base.num_key_value_heads,
            head_dim=base.head_dim)
    else:
        hidden, z, p = args.hidden, 32, args.parallel
        llm_cfg = q3.Qwen3Config(
            vocab_size=4096, hidden_size=hidden,
            intermediate_size=hidden * 4,
            num_hidden_layers=args.layers,
            num_attention_heads=hidden // 64,
            num_key_value_heads=max(hidden // 128, 1), head_dim=64)
    # Init order matters at 14B size: flax inits store fp32 params (6.3GB
    # for the 5120-wide head), so init + cast the head/VAE/proj to bf16
    # BEFORE the multi-GB LLM weights exist, keeping the transient fp32
    # copies out of the peak.
    to_bf16 = lambda t: jax.tree.map(lambda x: x.astype(jnp.bfloat16), t)
    dd = dict(z_channels=z, in_channels=3, out_ch=3, ch=128,
              ch_mult=[1, 1, 2, 2, 4], num_res_blocks=2)
    ae = VQModel(ddconfig=dd, dtype=jnp.bfloat16,
                 conv_int8=args.vae_int8)
    lat = args.height // 16
    ae_params = to_bf16(jax.jit(lambda k, x: ae.init(
        k, x, method=VQModel.decode, noise_rng=jax.random.PRNGKey(9)))(
        jax.random.PRNGKey(1), jnp.zeros((1, lat, width // 16, z), jnp.bfloat16)))
    head = DiffHead(ch_target=z, ch_cond=hidden, ch_latent=hidden,
                    depth_latent=6, depth_adanln=2, parallel_num=p,
                    use_swiglu=True, P_mean=-0.8, P_std=0.8,
                    dtype=jnp.bfloat16,
                    sample_weight_quant=("int4" if args.head_int4
                                         else args.quant_head))
    hp = to_bf16(jax.jit(head.init)(
        jax.random.PRNGKey(2), jnp.zeros((2, p, z)),
        jnp.zeros((2, p, hidden)), jax.random.PRNGKey(3)))
    # Stack (and optionally quantize) the head ONCE, before the multi-GB LLM
    # weights exist, then drop the flax tree — at 14B width keeping both
    # copies resident OOMs the chip (see T2IModelBundle.head_stacked).
    stacked_head = None
    if jax.default_backend() == "tpu":
        from bitdance_tpu.models.diff_head import DiffHead as _DH

        stacked_head = jax.jit(
            lambda v: head.apply(v, method=_DH._stack_for_sampler))(hp)
        jax.block_until_ready(stacked_head)
        hp = None
    proj = MLPConnector(out_dim=hidden, dtype=jnp.bfloat16)
    pp = to_bf16(proj.init(jax.random.PRNGKey(4), jnp.zeros((1, z))))

    if args.quant_llm_int4:
        # generated directly into packed int4 (full-depth capacity config)
        llm_params = q3.init_qwen3_params_int4(jax.random.PRNGKey(0), llm_cfg)
    elif args.quant_llm:
        # generated directly into int8 (no lm_head: generation never
        # touches it, and at 152k vocab it is 1.56GB)
        llm_params = q3.init_qwen3_params_int8(jax.random.PRNGKey(0), llm_cfg)
    else:
        llm_params = q3.init_qwen3_params(jax.random.PRNGKey(0), llm_cfg,
                                          jnp.bfloat16)
        llm_params.pop("lm_head", None)

    bundle = T2IModelBundle(
        llm_cfg=llm_cfg, llm_params=llm_params, ae=ae, ae_params=ae_params,
        head=head, head_params=hp, projector=proj, projector_params=pp,
        parallel_num=p, hidden_size=hidden, vae_patch_size=16,
        pe_max_len=4096, head_stacked=stacked_head)
    pipe = T2IPipeline(bundle, tokenizer=_StubTokenizer(p),
                       kv_int8=args.kv_int8)

    t0 = time.time()
    pipe.generate("warmup prompt", args.height, width, args.steps, args.cfg,
                  args.images, seed=0)
    compile_s = time.time() - t0
    times = []
    for i in range(args.iters):
        t0 = time.time()
        pipe.generate(f"benchmark prompt {i}", args.height, width, args.steps,
                      args.cfg, args.images, seed=i + 1)
        times.append(time.time() - t0)
    best = min(times) / args.images
    num_steps = (args.height // 16) * (width // 16) // p
    tag = " REAL-14B-GEOM" if args.real_14b else ""
    tag += " int8-llm" if args.quant_llm else ""
    tag += " int4-llm" if args.quant_llm_int4 else ""
    tag += " int4-head" if args.head_int4 else ""
    tag += " int8-kv" if args.kv_int8 else ""
    iters_s = " ".join(f"{t:.2f}" for t in times)
    print(f"{args.height}x{width} p={p} ({num_steps} AR steps x {args.steps} "
          f"diff steps), llm {args.layers}L/{hidden}d{tag}: "
          f"{best:.2f} s/image ({1.0/best:.3f} img/s) "
          f"[compile+first {compile_s:.0f}s; iters/call {iters_s}s]")

    # --- attribution + MFU (VERDICT r2 ask #8) ----------------------------
    import json as _json
    import os as _os

    timing = {}
    if _os.environ.get("BITDANCE_PHASE_TIMING", "1") != "0":
        pipe.phase_timing = True
        # first phase-timed call compiles the inter-phase fence programs —
        # its phase split is inflated by those compiles (measured: 1.5s
        # "prefill" on a model whose prefill compute is ~10ms). Warm once,
        # report the second call.
        pipe.generate("attribution warmup", args.height, width, args.steps,
                      args.cfg, args.images, seed=98)
        t0 = time.time()
        pipe.generate("attribution prompt", args.height, width, args.steps,
                      args.cfg, args.images, seed=99)
        pipe.phase_timing = False
        timing = {k: round(v, 3) for k, v in pipe.last_timing.items()}
        timing["total"] = round(time.time() - t0, 3)
    llm_tf, head_tf = analytic_gen_tflops_per_image(
        llm_cfg, hidden, z, p, 64, args.height // 16, width // 16,
        args.steps)
    gen_tf = llm_tf + head_tf
    # int8/int4 weights run the hot matmuls on the doubled int8 MXU rate;
    # quote MFU against the peak the config can actually reach
    quantized = (args.quant_llm or args.quant_llm_int4) and (
        args.quant_head or args.head_int4)
    peak = V5E_PEAK_BF16_TFLOPS * (2.0 if quantized else 1.0)
    attribution = {
        "phase_s": timing,
        "model_tflops_per_image": {"llm": round(llm_tf, 2),
                                   "head": round(head_tf, 2)},
        "achieved_tflops": round(gen_tf / best, 1),
        "peak_tflops_assumed": peak,
        "mfu": round(gen_tf / best / peak, 3),
    }
    print("ATTRIBUTION " + _json.dumps(attribution))


MEMORY_PLAN = """
14B single-chip memory plan (v5e, 16GB HBM)
-------------------------------------------
True BitDance-14B (bitdance_14b_64x.yaml): Qwen3-14B LLM = 14.8B params
(29.5GB bf16) + 5120-wide 6-block DiffHead = 1.57B params (3.1GB bf16).
One 16GB chip CANNOT hold the model; deployment options, in order:
  1. TP over >=4 chips via parallel/tp.py shardings (weights 8.2GB/chip at
     tp=4); the sharded forward is exercised on the virtual mesh by
     __graft_entry__.dryrun_multichip and tests/test_tp.py.
  2. int8 W8A8 LLM (ops/int8.py) + int8 head over tp=2: ~8.1GB/chip.
Largest single-chip measurable slice at TRUE width: --real-14b with
--layers N; each layer is 330M params (0.66GB bf16 / 0.33GB int8), embed
1.56GB bf16, stacked head 3.2GB bf16 / 1.7GB int8 (the flax tree is
dropped after stacking — T2IModelBundle.head_stacked), so N<=13 fits in
bf16 and N<=28 with --quant-llm --quant-head (both measured). The FULL
40L model fits with --quant-llm-int4 (layer stack 6.6GB packed int4 +
int8 embed 0.78GB + int4/int8 head + KV cache) — the complete-model
single-chip serving config; see ops/int4.py. LLM cost
scales linearly in depth, the head does not depend on depth; a 40L
estimate is t(N) + (40-N) * per_layer_decode_time — and the 28L int8
measurement (11.25 s/image vs 14L's 10.8-est) shows per-layer decode is
small next to the head.
Batch sizing: 2 images is the measured 28L int8 champion. 4 images
runtime-OOMs even with 96MB mods chunks (measured r3 — the int8 KV cache
doubles to ~1.9GB on top of ~11GB weights); it would only amortize the
head's BANDWIDTH half anyway — the head is ~equally MXU-bound (687
GFLOP/net-call ~ 1.74 ms at int8 peak vs 1.63 ms weight BW), so the
ceiling from batching is ~-25% on the dots, not ~-50%. 3 images measured
WORSE (7.94 vs 7.35, r3).
"""


if __name__ == "__main__":
    main()
