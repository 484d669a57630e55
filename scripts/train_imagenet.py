"""ImageNet class-conditional AR training driver.

CLI-parity re-design of imagenet_gen/train.py (+train_parallel.py — our
--parallel-num flag covers both): epoch loop over the tar-backed dataset,
frozen binary tokenizer encode on device, one jitted SPMD train step over a
(replica, fsdp) mesh, EMA, warmup->cosine LR, aug-ratio decay, orbax
checkpoints with auto-resume and mid-epoch data restore.

Run (single host, all local devices):
  python scripts/train_imagenet.py --data-path /data/ILSVRC2012_img_train.tar \
      --model BitDance-B --results-dir results/b1x --epochs 800
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_args():
    p = argparse.ArgumentParser()
    # model args (imagenet_gen/src/model.py:13-35)
    p.add_argument("--model", type=str, default="BitDance-L",
                   choices=["BitDance-B", "BitDance-L", "BitDance-H", "BitDance-S"])
    p.add_argument("--image-size", type=int, default=256, choices=[256, 512])
    p.add_argument("--down-size", type=int, default=16)
    p.add_argument("--patch-size", type=int, default=1)
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--cls-token-num", type=int, default=64)
    p.add_argument("--latent-dim", type=int, default=16)
    p.add_argument("--diff-batch-mul", type=int, default=4)
    p.add_argument("--parallel-num", type=int, default=1)
    p.add_argument("--perturb-rate", type=float, default=0.0)
    p.add_argument("--time-schedule", type=str, default="logit_normal")
    p.add_argument("--time-shift", type=float, default=1.0)
    p.add_argument("--P-std", type=float, default=0.8)
    p.add_argument("--P-mean", type=float, default=-0.8)
    # loop args (imagenet_gen/train.py:417-448)
    p.add_argument("--data-path", type=str, required=True)
    p.add_argument("--trained-vae", type=str, default="",
                   help="safetensors/orbax tokenizer checkpoint (frozen)")
    p.add_argument("--results-dir", type=str, default="results")
    p.add_argument("--epochs", type=int, default=800)
    p.add_argument("--global-batch-size", type=int, default=1024)
    p.add_argument("--global-seed", type=int, default=0)
    p.add_argument("--lr", type=float, default=6e-4)
    p.add_argument("--min-lr", type=float, default=0.0)
    p.add_argument("--weight-decay", type=float, default=0.05)
    p.add_argument("--beta1", type=float, default=0.9)
    p.add_argument("--beta2", type=float, default=0.95)
    p.add_argument("--warmup-steps", type=int, default=2000)
    p.add_argument("--decay-start", type=int, default=-1)
    p.add_argument("--max-grad-norm", type=float, default=1.0)
    p.add_argument("--ema-decay", type=float, default=0.9999)
    p.add_argument("--aug-decay-start-epoch", type=int, default=700)
    p.add_argument("--aug-decay-end-epoch", type=int, default=750)
    p.add_argument("--log-every", type=int, default=100)
    p.add_argument("--ckpt-every-epochs", type=int, default=1)
    p.add_argument("--num-replicate", type=int, default=1)
    p.add_argument("--profile-dir", type=str, default="")
    p.add_argument("--max-steps", type=int, default=-1,
                   help="stop early (smoke testing)")
    return p.parse_args()


def main():
    args = get_args()
    import os as _os
    if _os.environ.get("BITDANCE_PLATFORM"):
        import jax as _jax_early
        _jax_early.config.update("jax_platforms",
                                 _os.environ["BITDANCE_PLATFORM"])
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bitdance_tpu.data.imagenet import (
        ShardedBatchIterator,
        build_dataset,
        linear_decay_ratio,
    )
    from bitdance_tpu.models.gfq import gfq_quantize
    from bitdance_tpu.models.imagenet_ar import (
        IMAGENET_MODELS,
        grid_to_tokens,
    )
    from bitdance_tpu.models.tokenizer import VQModel
    from bitdance_tpu.parallel.mesh import create_mesh
    from bitdance_tpu.train.checkpoints import CheckpointManager
    from bitdance_tpu.train.imagenet_train import (
        ImageNetTrainConfig,
        init_train_state,
        make_sharded_train_step,
        make_tx,
    )
    from bitdance_tpu.utils.fs import init_distributed
    from bitdance_tpu.utils.logging import (
        MetricAccumulator,
        ScalarWriter,
        create_logger,
    )
    from bitdance_tpu.utils.profiler import StepProfiler

    rank, world = init_distributed()
    logger = create_logger(args.results_dir)
    writer = ScalarWriter(os.path.join(args.results_dir, "tb"))

    cfg = IMAGENET_MODELS[args.model](
        resolution=args.image_size, down_size=args.down_size,
        patch_size=args.patch_size, latent_dim=args.latent_dim,
        cls_token_num=args.cls_token_num, num_classes=args.num_classes,
        diff_batch_mul=args.diff_batch_mul, parallel_num=args.parallel_num,
        perturb_rate=args.perturb_rate, time_schedule=args.time_schedule,
        time_shift=args.time_shift, P_std=args.P_std, P_mean=args.P_mean,
    )
    steps_per_epoch = None  # set after dataset
    tcfg = ImageNetTrainConfig(
        lr=args.lr, min_lr=args.min_lr, weight_decay=args.weight_decay,
        betas=(args.beta1, args.beta2), warmup_steps=args.warmup_steps,
        total_steps=10**9, decay_start=args.decay_start,
        max_grad_norm=args.max_grad_norm, ema_decay=args.ema_decay,
        global_batch_size=args.global_batch_size,
    )

    # frozen tokenizer (GFQ training variant, imagenet_gen/src/qae.py)
    dd = dict(z_channels=args.latent_dim, in_channels=3, out_ch=3, ch=256,
              ch_mult=[1, 1, 2, 2, 4], num_res_blocks=4)
    ae = VQModel(ddconfig=dd)
    if args.trained_vae:
        from bitdance_tpu.io.torch_import import convert_ae_state, load_safetensors

        ae_params = convert_ae_state(load_safetensors(args.trained_vae))
    else:
        logger.info("WARNING: no --trained-vae given; random tokenizer")
        # flax init MUST be jitted: eager per-op dispatch over the device
        # tunnel makes un-jitted init of the full tokenizer ~20x slower
        ae_params = jax.jit(
            lambda k, x: ae.init(k, x, method=VQModel.encode_raw)
        )(jax.random.PRNGKey(0),
          jnp.zeros((1, args.image_size, args.image_size, 3)))

    logger.info("tokenizer params ready")
    mesh = create_mesh(replica=args.num_replicate)
    state, head, tx = init_train_state(jax.random.PRNGKey(args.global_seed),
                                       cfg, tcfg)
    logger.info("train state initialized")
    step_fn, state_sh = make_sharded_train_step(mesh, state, cfg, head, tx, tcfg)
    state = jax.device_put(state, state_sh)
    logger.info(f"mesh {dict(mesh.shape)}; state sharded")

    @jax.jit
    def encode_batch(ae_p, images):
        # ae params passed as an argument — closures embed them as HLO
        # constants and blow up the compile-request size
        raw = ae.apply(ae_p, images, method=VQModel.encode_raw)
        q = gfq_quantize(raw, num_codebooks=4, training=False).quantized
        return grid_to_tokens(cfg, q)

    ckpt = CheckpointManager(os.path.join(args.results_dir, "checkpoints"))
    start_epoch, start_batch = 0, 0
    restored, step, data_status = ckpt.restore(state, with_data_status=True)
    if restored is not None:
        state = jax.device_put(restored, state_sh)
        start_epoch = (data_status or {}).get("epoch", 0)
        start_batch = (data_status or {}).get("batch", 0)
        logger.info(f"auto-resumed from step {step} "
                    f"(epoch {start_epoch}, batch {start_batch})")

    logger.info("checkpoint manager ready")
    dataset = build_dataset(args.data_path, args.image_size, args.global_seed)
    loader = ShardedBatchIterator(dataset, args.global_batch_size,
                                  num_shards=world, shard_index=rank,
                                  seed=args.global_seed)
    profiler = StepProfiler(args.profile_dir or os.path.join(
        args.results_dir, "profile"), enabled=bool(args.profile_dir))

    acc = MetricAccumulator()
    global_step = int(jax.device_get(state.step))
    rng = jax.random.PRNGKey(args.global_seed + 7)

    for epoch in range(start_epoch, args.epochs):
        dataset.set_aug_ratio(linear_decay_ratio(
            epoch, args.aug_decay_start_epoch, args.aug_decay_end_epoch))
        for b, (images, labels) in enumerate(
                loader.iter_epoch(epoch, start_batch if epoch == start_epoch else 0)):
            rng, sub = jax.random.split(rng)
            tokens = encode_batch(ae_params, jnp.asarray(images))
            if global_step == 0:
                logger.info("first batch encoded; compiling train step")
            state, metrics = step_fn(state, tokens, jnp.asarray(labels), sub)
            profiler.step()
            acc.update(loss=metrics["loss"], grad_norm=metrics["grad_norm"])
            global_step += 1
            if global_step % args.log_every == 0:
                means, sps = acc.flush()
                logger.info(
                    f"(step={global_step:07d}) epoch={epoch} "
                    + ", ".join(f"{k}: {v:.4f}" for k, v in means.items())
                    + f", steps/sec: {sps:.2f}")
                for k, v in means.items():
                    writer.add_scalar(f"train/{k}", v, global_step)
                writer.add_scalar("train/steps_per_sec", sps, global_step)
            if args.max_steps > 0 and global_step >= args.max_steps:
                break
        else:
            if (epoch + 1) % args.ckpt_every_epochs == 0:
                ckpt.save(global_step, jax.device_get(state),
                          data_status={"epoch": epoch + 1, "batch": 0})
                logger.info(f"saved checkpoint at step {global_step}")
            continue
        break

    ckpt.save(global_step, jax.device_get(state),
              data_status={"epoch": args.epochs, "batch": 0})
    profiler.close()
    writer.close()
    logger.info("training done")


if __name__ == "__main__":
    main()
