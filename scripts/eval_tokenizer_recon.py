"""Tokenizer reconstruction-quality check: ours (JAX/TPU) vs torch reference.

One command prints the BASELINE.md 0.05 dB verdict the day real
`ae_*.safetensors` weights are available:

    python scripts/eval_tokenizer_recon.py \
        --images /path/to/imagenet_val_folder \
        --ae /path/to/ae_d16c32.safetensors \
        [--ae-config ae_config.json] [--resolution 256] [--limit 64] \
        [--uni] [--no-torch]

Published reference numbers to land near (README.md:65-69):
  ae_d16c32  (2^32,  16x): IN-256 PSNR 24.90 / SSIM 0.72
  ae_d32c128 (2^128, 32x): IN-256 PSNR 23.26 / SSIM 0.67
  ae_d32c256 (2^256, 32x): IN-256 PSNR 25.29 / SSIM 0.74
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# 14B release tokenizer geometry (train/configs/bitdance_14b_64x.yaml:9-16)
DEFAULT_DDCONFIG = dict(z_channels=32, in_channels=3, out_ch=3, ch=256,
                        ch_mult=[1, 1, 2, 2, 4], num_res_blocks=4)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True,
                    help="folder of images (IN-256 val protocol)")
    ap.add_argument("--ae", required=True, help="ae_*.safetensors path")
    ap.add_argument("--ae-config", default="",
                    help="ae_config.json with a ddconfig block "
                         "(default: the 14B release geometry)")
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--limit", type=int, default=64,
                    help="max images (0 = all)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--uni", action="store_true",
                    help="UniWeTok tokenizer (autoencoder_uni.py, EMA remap)")
    ap.add_argument("--no-torch", action="store_true",
                    help="skip the torch-reference side (JAX metrics only)")
    ap.add_argument("--reference-root", default=os.environ.get(
        "BITDANCE_REFERENCE", "/root/reference"))
    args = ap.parse_args()

    from bitdance_tpu.eval.recon import (
        compare_reconstructions,
        load_image_folder,
        reconstruct_jax,
        reconstruct_torch,
    )
    from bitdance_tpu.io.torch_import import (
        convert_ae_state,
        load_safetensors,
        remap_ema_state,
    )

    if args.ae_config:
        with open(args.ae_config) as f:
            j = json.load(f)
        ddconfig = j.get("ddconfig", j)
    else:
        ddconfig = DEFAULT_DDCONFIG

    state = load_safetensors(args.ae)
    if args.uni:
        state = remap_ema_state(state)
    params = convert_ae_state(state)

    images = load_image_folder(args.images, args.resolution, args.limit)
    recon_j = reconstruct_jax(ddconfig, params, images, batch=args.batch,
                              uni=args.uni)
    recon_t = None
    if not args.no_torch:
        if os.path.isdir(args.reference_root):
            recon_t = reconstruct_torch(
                state, ddconfig, images, batch=args.batch, uni=args.uni,
                reference_root=args.reference_root)
        else:
            print(f"# reference checkout not found at {args.reference_root};"
                  " reporting JAX metrics only", file=sys.stderr)

    report = compare_reconstructions(images, recon_j, recon_t)
    out = {"n_images": int(images.shape[0]),
           "resolution": args.resolution, **report.as_dict()}
    print(json.dumps(out))
    if report.within_north_star is False:
        print(f"# FAIL: JAX PSNR {report.psnr_jax:.3f} dB is more than "
              f"0.05 dB below torch {report.psnr_torch:.3f} dB",
              file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
