"""ImageNet-256 class-conditional sampling throughput on one chip.

Workload = BASELINE.json config 3 (imagenet_gen sample_ddp.py): BitDance-B
(242M AR + diffusion head + conv decoder), 256px, 256 AR steps with KV
cache, 100 diffusion steps/token, cfg 4.6 linear schedule — full pipeline
through VAE decode.

Extracted from bench.py (round 5) so the headline metric can run FIRST as a
child process — bench.py never claims the TPU itself, every metric family
runs under its own subprocess timeout, and a late-family stall can no longer
lose the headline number (BENCH_r04 rc=124 postmortem).

Prints one `IMAGENET {json}` line with images/sec/chip.

Usage: python -m benchmarks.bench_imagenet [--quick] [--batch N]
       [--model B|L|H] [--parallel P]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="small shapes to smoke-test the bench path")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--model", type=str, default="BitDance-B")
    ap.add_argument("--parallel", type=int, default=1)
    ap.add_argument("--sample-steps", type=int, default=100)
    ap.add_argument("--cfg-scale", type=float, default=4.6)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--decode-chunk", type=int, default=32,
                    help="VAE decode chunk (model.py:378-387 decode_in_chunks)")
    ap.add_argument("--kv-int8", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="int8 KV ring buffer (serving config; halves "
                         "decode-attention HBM traffic and cache footprint)")
    ap.add_argument("--head-int8", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="W8A8 int8 fused head sampler (serving config; the "
                         "MXU int8 rate is ~2x bf16, worth ~8%% end-to-end "
                         "now that the 1x MLP head runs the whole-sampler "
                         "resident kernel)")
    ap.add_argument("--vae-int8", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="W8A8 int8 trunk convs in the VAE decoder "
                         "(models/tokenizer.py::Conv2D). Measured on the "
                         "v5e: 70.3 Tops/s s8 vs 56.1 TFLOP/s bf16 at the "
                         "decoder's trunk conv shape; b256 decode "
                         "2.24 -> 1.84 s (benchmarks/probe_imagenet_decode)")
    ap.add_argument("--backbone-int8", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="W8A8 int8 AR backbone matmuls (serving config; "
                         "measured 32.9 -> 34.5 img/s at b256: the decode "
                         "matmuls are MXU-rate-bound at M=512 rows and the "
                         "s8 MXU path doubles the rate; "
                         "models/imagenet_ar.py::quantize_ar_params)")
    args = ap.parse_args()

    from bitdance_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from bitdance_tpu.models.imagenet_ar import (
        IMAGENET_MODELS,
        init_ar_params,
        make_head,
        sample,
        tokens_to_grid,
    )
    from bitdance_tpu.models.tokenizer import VQModel

    if args.quick:
        from bitdance_tpu.models.imagenet_ar import ImageNetARConfig
        cfg = ImageNetARConfig(
            dim=256, n_layer=4, n_head=4, diff_layers=2, diff_dim=256,
            diff_adanln_layers=1, latent_dim=16, resolution=64,
            cls_token_num=8, parallel_num=args.parallel)
        args.batch = min(args.batch, 4)
        args.sample_steps = 8
        dd_ch = 64
        res_blocks = 1
    else:
        cfg = IMAGENET_MODELS[args.model](parallel_num=args.parallel,
                                          resolution=256)
        dd_ch = 256
        res_blocks = 4

    dd = dict(z_channels=cfg.latent_dim, in_channels=3, out_ch=3, ch=dd_ch,
              ch_mult=[1, 1, 2, 2, 4], num_res_blocks=res_blocks)
    # decode in bf16: conv compute dtype (params stay f32);
    # GroupNorm statistics are fp32 inside the module
    ae = VQModel(ddconfig=dd, dtype=jnp.bfloat16, conv_int8=args.vae_int8)

    key = jax.random.PRNGKey(0)
    params = init_ar_params(key, cfg, dtype=jnp.bfloat16)
    if args.backbone_int8:
        from bitdance_tpu.models.imagenet_ar import quantize_ar_params

        # quantize OUTSIDE the sampling jit (pass as argument), else XLA
        # remats the quantize chain into the AR scan bodies
        params = jax.jit(quantize_ar_params)(params)
    head = make_head(cfg, dtype=jnp.bfloat16,
                     sample_weight_quant=args.head_int8)
    if cfg.parallel_num > 1:
        d_t = jnp.zeros((2, cfg.parallel_num, cfg.token_dim))
        d_c = jnp.zeros((2, cfg.parallel_num, cfg.dim))
    else:
        d_t = jnp.zeros((2, cfg.token_dim))
        d_c = jnp.zeros((2, cfg.dim))
    head_params = jax.jit(head.init)(jax.random.PRNGKey(1), d_t, d_c,
                                     jax.random.PRNGKey(2))
    # stack (+quantize) head weights OUTSIDE the sampling jit: traced
    # inside, XLA can rematerialize the chain into the AR scan bodies and
    # re-quantize every step (measured 4x slower)
    from bitdance_tpu.models.diff_head import DiffHead
    head_stacked = None
    if jax.default_backend() == "tpu":
        head_stacked = jax.jit(
            lambda hp: head.apply(hp, method=DiffHead._stack_for_sampler)
        )(head_params)
    lat_hw = cfg.resolution // cfg.down_size
    ae_params = jax.jit(
        lambda k, z: ae.init(k, z, method=VQModel.decode)
    )(jax.random.PRNGKey(3), jnp.zeros((1, lat_hw, lat_hw, cfg.latent_dim)))

    cls = jnp.arange(args.batch, dtype=jnp.int32) % cfg.num_classes

    # Params MUST be jit arguments, not closures: closed-over arrays embed
    # as HLO constants, and a 242M-param model makes the serialized compile
    # request hundreds of MB (the remote-compile service rejects it with
    # HTTP 413). Two separate programs also keep each graph small.
    @jax.jit
    def run_sample(params, head_params, head_stacked, cls, rng):
        toks = sample(params, head, head_params, cfg, cls, rng,
                      num_sampling_steps=args.sample_steps,
                      cfg_scale=args.cfg_scale, kv_int8=args.kv_int8,
                      head_stacked=head_stacked)
        return tokens_to_grid(cfg, toks)

    chunk = min(args.decode_chunk, args.batch)
    n_chunks = -(-args.batch // chunk)

    @jax.jit
    def run_decode(ae_params, grid):
        # all chunks inside ONE program: each host->device dispatch costs
        # 20-90ms over the tunnel, so 8 separate chunk calls were pure
        # overhead; lax.map keeps the chunks sequential (decoder activation
        # memory) without the dispatches
        pad = n_chunks * chunk - grid.shape[0]
        if pad:
            grid = jnp.pad(grid, ((0, pad), (0, 0), (0, 0), (0, 0)))
        gs = grid.reshape((n_chunks, chunk) + grid.shape[1:])
        imgs = jax.lax.map(
            lambda g: ae.apply(ae_params, g, method=VQModel.decode), gs)
        return imgs.reshape((-1,) + imgs.shape[2:])[: args.batch]

    def run(rng):
        grid = run_sample(params, head_params, head_stacked, cls, rng)
        return run_decode(ae_params, grid)

    def fence(x):
        # on the axon tunnel block_until_ready resolves before device
        # completion; a host readback is the only reliable timing fence
        return float(jnp.sum(x[:, ::64, ::64].astype(jnp.float32)))

    # compile
    t0 = time.time()
    out = run(jax.random.PRNGKey(10))
    fence(out)
    compile_and_first = time.time() - t0

    times = []
    for i in range(args.iters):
        t0 = time.time()
        out = run(jax.random.PRNGKey(11 + i))
        fence(out)
        times.append(time.time() - t0)

    best = min(times)
    rec = {
        "imgs_per_sec": round(args.batch / best, 4),
        "metric": (f"imagenet256_{args.model}_{args.parallel}x_"
                   "images_per_sec_per_chip"),
        "batch": args.batch,
        "best_s": round(best, 3),
        "compile_and_first_s": round(compile_and_first, 1),
        "backend": jax.default_backend(),
        "config": f"batch {args.batch}, bf16 model, "
                  f"{'int8' if args.kv_int8 else 'bf16'} KV cache, "
                  f"{'int8' if args.head_int8 else 'bf16'} head sampler "
                  f"weights, {'int8' if args.vae_int8 else 'bf16'} VAE "
                  f"decoder convs, windowed decode attention",
    }
    print("IMAGENET " + json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
