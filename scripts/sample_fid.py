"""FID sampling driver (imagenet_gen/sample_ddp{,_parallel}.py equivalent).

Generates 50k class-balanced ImageNet samples with EMA weights and packs the
ADM-suite .npz. Rank-sharded over jax processes.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", type=str, default="BitDance-B")
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--latent-dim", type=int, default=16)
    p.add_argument("--parallel-num", type=int, default=1)
    p.add_argument("--ckpt", type=str, required=True,
                   help="orbax checkpoint dir from train_imagenet.py")
    p.add_argument("--trained-vae", type=str, default="")
    p.add_argument("--sample-dir", type=str, default="samples")
    p.add_argument("--per-proc-batch-size", type=int, default=32)
    p.add_argument("--num-fid-samples", type=int, default=50000)
    p.add_argument("--cfg-scale", type=float, default=4.6)
    p.add_argument("--seed", type=int, default=99)
    p.add_argument("--sample-steps", type=int, default=100)
    p.add_argument("--no-ema", action="store_true")
    args = p.parse_args()

    import os as _os
    if _os.environ.get("BITDANCE_PLATFORM"):
        import jax as _jax_early
        _jax_early.config.update("jax_platforms",
                                 _os.environ["BITDANCE_PLATFORM"])
    import jax
    import jax.numpy as jnp

    from bitdance_tpu.eval.fid import sample_fid
    from bitdance_tpu.models.imagenet_ar import IMAGENET_MODELS
    from bitdance_tpu.models.tokenizer import VQModel
    from bitdance_tpu.train.checkpoints import CheckpointManager
    from bitdance_tpu.train.imagenet_train import (
        ImageNetTrainConfig,
        init_train_state,
    )
    from bitdance_tpu.utils.fs import init_distributed

    init_distributed()
    cfg = IMAGENET_MODELS[args.model](
        resolution=args.image_size, latent_dim=args.latent_dim,
        parallel_num=args.parallel_num)

    state, head, _ = init_train_state(jax.random.PRNGKey(0), cfg,
                                      ImageNetTrainConfig())
    ckpt = CheckpointManager(args.ckpt)
    restored, step, _ = ckpt.restore(state)
    if restored is None:
        raise SystemExit(f"no checkpoint found under {args.ckpt}")
    # EMA weights by default (sample_ddp.py:90-98)
    params_all = restored.params if args.no_ema else restored.ema_params
    print(f"loaded step {step} ({'raw' if args.no_ema else 'EMA'} weights)")

    dd = dict(z_channels=args.latent_dim, in_channels=3, out_ch=3, ch=256,
              ch_mult=[1, 1, 2, 2, 4], num_res_blocks=4)
    ae = VQModel(ddconfig=dd)
    if args.trained_vae:
        from bitdance_tpu.io.torch_import import convert_ae_state, load_safetensors

        ae_params = convert_ae_state(load_safetensors(args.trained_vae))
    else:
        lat = args.image_size // 16
        ae_params = ae.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, lat, lat, args.latent_dim)),
                            method=VQModel.decode)

    folder = (f"{args.model.replace('/', '-')}-size-{args.image_size}-"
              f"steps-{args.sample_steps}-cfg-{args.cfg_scale}-seed-{args.seed}")
    out_dir = os.path.join(args.sample_dir, folder)
    npz = sample_fid(
        params_all["ar"], head, params_all["head"], cfg, ae, ae_params,
        out_dir, num_fid_samples=args.num_fid_samples,
        per_proc_batch_size=args.per_proc_batch_size,
        cfg_scale=args.cfg_scale, sample_steps=args.sample_steps,
        seed=args.seed)
    if npz:
        print(f"packed {npz} for the ADM evaluation suite")


if __name__ == "__main__":
    main()
