"""Tokenizer encode / decode / enc+dec round-trip throughput (imgs/sec).

This is the BASELINE.md north-star metric ("tokenizer enc+dec imgs/sec at
parity PSNR"); the PSNR side is covered by the golden-parity tests
(tests/test_reference_parity.py) and eval/recon.py — this file records the
throughput side on the REAL d16c32 geometry from the reference config
(/root/reference/train/configs/bitdance_14b_64x.yaml:9-16: z=32, ch=256,
ch_mult [1,1,2,2,4], num_res_blocks=4 -> 16x downsample, 2^32 vocab).

Prints one parseable line:  TOKENIZER {json}

  python -m benchmarks.bench_tokenizer [--res 256] [--batch 64] [--ch 256]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bitdance_tpu.models.tokenizer import VQModel
from bitdance_tpu.ops.quantize import sign_quantize


def _time_chain(fn, params, x, iters):
    """Best-of-3 of an `iters`-long on-device dependency chain of fn."""
    def run(params, x):
        def body(xx, _):
            out = fn(params, xx)
            mean_o = jnp.mean(out.astype(jnp.float32))
            return xx + (1e-6 * mean_o).astype(xx.dtype), None
        xx, _ = jax.lax.scan(body, x, None, length=iters)
        return xx
    jrun = jax.jit(run)
    out = jrun(params, x)
    float(jnp.sum(out.astype(jnp.float32)))  # compile + warm
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(jrun(params, x).astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--ch", type=int, default=256)
    ap.add_argument("--res-blocks", type=int, default=4)
    ap.add_argument("--z", type=int, default=32,
                    help="latent channels (reference family: 32 for "
                         "d16c32, 128/256 for the 32x-downsample "
                         "ae_d32c128/ae_d32c256 variants, README.md:67-69)")
    ap.add_argument("--ch-mult", type=str, default="1,1,2,2,4",
                    help="comma-separated; 6 entries = 32x downsample")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--vae-int8", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="W8A8 int8 DECODER trunk convs (the serving path "
                         "the imagenet/t2i benches quantize; measured 70.3 "
                         "Tops/s s8 vs 56.1 TFLOP/s bf16 at the decoder "
                         "trunk shape). The encoder always runs bf16 — "
                         "VQModel plumbs conv_int8 to the Decoder only, so "
                         "enc_imgs_per_sec is a bf16 number either way")
    args = ap.parse_args()

    ch_mult = [int(m) for m in args.ch_mult.split(",")]
    down = 2 ** (len(ch_mult) - 1)
    dd = dict(z_channels=args.z, in_channels=3, out_ch=3, ch=args.ch,
              ch_mult=ch_mult, num_res_blocks=args.res_blocks)
    model = VQModel(ddconfig=dd, dtype=jnp.bfloat16, conv_int8=args.vae_int8)
    x0 = jnp.zeros((args.batch, args.res, args.res, 3), jnp.bfloat16)
    lat = args.res // down
    z0 = jnp.zeros((args.batch, lat, lat, args.z), jnp.bfloat16)

    enc_params = jax.jit(
        lambda k, x: model.init(k, x, method=VQModel.encode_raw)
    )(jax.random.PRNGKey(0), x0)
    dec_params = jax.jit(
        lambda k, z: model.init(k, z, method=VQModel.decode)
    )(jax.random.PRNGKey(1), z0)
    # one param tree serving both directions (encoder/decoder are disjoint
    # submodules, so merging the two inits is the full autoencoder)
    params = {"params": {**enc_params["params"], **dec_params["params"]}}
    x = jax.random.normal(jax.random.PRNGKey(2), x0.shape, jnp.bfloat16)

    enc = lambda p, xx: model.apply(p, xx, method=VQModel.encode)
    dec = lambda p, zz: model.apply(p, zz, method=VQModel.decode)

    t_enc = _time_chain(enc, params, x, args.iters)
    # decode chain operates on latents (sign-quantized once outside timing)
    z = jax.jit(lambda p, xx: sign_quantize(
        model.apply(p, xx, method=VQModel.encode_raw)))(params, x)
    t_dec = _time_chain(dec, params, z, args.iters)
    t_rt = _time_chain(lambda p, xx: dec(p, enc(p, xx)).astype(xx.dtype),
                       params, x, args.iters)

    result = {
        "enc_imgs_per_sec": round(args.batch / t_enc, 1),
        "dec_imgs_per_sec": round(args.batch / t_dec, 1),
        "enc_dec_imgs_per_sec": round(args.batch / t_rt, 1),
        "enc_ms_per_batch": round(t_enc * 1e3, 2),
        "dec_ms_per_batch": round(t_dec * 1e3, 2),
        "config": f"d{down}c{args.z} ch{args.ch} rb{args.res_blocks} "
                  f"{args.res}px "
                  f"b{args.batch} bf16"
                  + (" int8-dec-conv" if args.vae_int8 else ""),
    }
    print("TOKENIZER " + json.dumps(result))
    print(f"encode {args.batch/t_enc:8.1f} imgs/s | decode "
          f"{args.batch/t_dec:8.1f} imgs/s | enc+dec "
          f"{args.batch/t_rt:8.1f} imgs/s  (res {args.res}, ch {args.ch}, "
          f"backend {jax.default_backend()})", file=sys.stderr)


if __name__ == "__main__":
    main()
