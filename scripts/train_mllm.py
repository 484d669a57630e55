"""14B multimodal (T2I) training driver.

The reference never shipped this loop (scripts/train.sh is a TODO stub,
README.md:178-179); this driver realizes the contract defined by
MLLModel.forward_train + fsdp_utils + train/configs/bitdance_14b_64x.yaml:
YAML config, HYBRID_SHARD-equivalent (replica, fsdp) mesh, packed batches,
loss weights 0.01/1.0, orbax checkpoints every save_every with keep-N and
mid-stream data resume.

  python scripts/train_mllm.py --config train/configs/bitdance_14b_64x.yaml \
      --data-dir /data/packed --hf-llm /models/Qwen3-14B
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--data-dir", type=str, required=True,
                   help="directory of .npz packed batches (data/packing.py)")
    p.add_argument("--val-batch", type=str, default="",
                   help="held-out packed .npz for validate_every")
    p.add_argument("--hf-llm", type=str, default="",
                   help="HF Qwen3 dir to init the backbone (else random)")
    p.add_argument("--results-dir", type=str, default="results/mllm")
    p.add_argument("--vocab-size", type=int, default=152064)
    p.add_argument("--max-steps", type=int, default=-1)
    args = p.parse_args()

    import os as _os
    if _os.environ.get("BITDANCE_PLATFORM"):
        import jax as _jax_early
        _jax_early.config.update("jax_platforms",
                                 _os.environ["BITDANCE_PLATFORM"])
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bitdance_tpu.config import (
        load_yaml,
        mesh_shape_from_yaml,
        mllm_config_from_yaml,
        mllm_train_config_from_yaml,
    )
    from bitdance_tpu.models.mllm import PackedBatch, init_mllm_params
    from bitdance_tpu.parallel.mesh import create_mesh
    from bitdance_tpu.train import optim as opt_lib
    from bitdance_tpu.train.checkpoints import CheckpointManager
    from bitdance_tpu.data.packing import stack_packed_batches
    from bitdance_tpu.train.mllm_train import (
        eval_step,
        make_sharded_train_step,
        make_state,
        make_tx,
    )
    import functools
    from bitdance_tpu.utils.fs import init_distributed
    from bitdance_tpu.utils.logging import (
        MetricAccumulator,
        ScalarWriter,
        create_logger,
    )

    init_distributed()
    ycfg = load_yaml(args.config)
    cfg = mllm_config_from_yaml(ycfg, args.vocab_size)
    tcfg = mllm_train_config_from_yaml(ycfg)
    logger = create_logger(args.results_dir)
    writer = ScalarWriter(os.path.join(args.results_dir, "tb"))

    replica, shard = mesh_shape_from_yaml(ycfg)
    n_dev = len(jax.devices())
    if replica * shard != n_dev:
        replica, shard = 1, n_dev
        logger.info(f"overriding mesh to (1, {n_dev}) for this host set")
    mesh = create_mesh(replica=replica, fsdp=shard)

    params = init_mllm_params(
        jax.random.PRNGKey(int(ycfg.training.get("global_seed", 0))), cfg,
        dtype=jnp.bfloat16)
    if args.hf_llm:
        from bitdance_tpu.io.torch_import import load_hf_qwen3_dir

        params["llm"], _ = load_hf_qwen3_dir(args.hf_llm, jnp.bfloat16)
        logger.info(f"initialized LLM from {args.hf_llm}")

    tx = make_tx(params, tcfg)
    state = make_state(params, tx, tcfg)
    step_fn, state_sh = make_sharded_train_step(mesh, state, cfg, tcfg, tx)
    state = jax.device_put(state, state_sh)

    ckpt = CheckpointManager(os.path.join(args.results_dir, "checkpoints"))
    start_file = 0
    if ycfg.training.get("auto_resume", True):
        restored, step, ds = ckpt.restore(state, with_data_status=True)
        if restored is not None:
            state = jax.device_put(restored, state_sh)
            start_file = (ds or {}).get("file", 0)
            logger.info(f"auto-resumed from step {step}, data file {start_file}")

    files = sorted(f for f in os.listdir(args.data_dir) if f.endswith(".npz"))
    acc = MetricAccumulator()
    global_step = int(jax.device_get(state.step))
    rng = jax.random.PRNGKey(777)
    save_every = int(ycfg.training.get("save_every", 1000))
    log_every = int(ycfg.training.get("log_every", 10))
    validate_every = int(ycfg.training.get("validate_every", 0))
    val_batch = None
    val_fn = None
    if args.val_batch:
        raw = dict(np.load(args.val_batch))
        val_batch = PackedBatch(**{k: jnp.asarray(v) for k, v in raw.items()})
        val_fn = jax.jit(functools.partial(eval_step, cfg=cfg, tcfg=tcfg))
    total_steps = (args.max_steps if args.max_steps > 0
                   else int(ycfg.training.get("total_steps", 10**6)))

    # one DISTINCT packed sequence per data-parallel shard per microbatch
    # (HYBRID_SHARD data layout, fsdp_utils.py:80-104)
    dp = mesh.shape["replica"] * mesh.shape["fsdp"]
    seqs_per_step = dp * max(tcfg.grad_accum, 1)

    def load_step_batch(fi):
        raws = [dict(np.load(os.path.join(args.data_dir,
                                          files[(fi + j) % len(files)])))
                for j in range(seqs_per_step)]
        raw = stack_packed_batches(raws, grad_accum=tcfg.grad_accum)
        return PackedBatch(**{k: jnp.asarray(v) for k, v in raw.items()})

    fi = start_file
    while global_step < total_steps:
        batch = load_step_batch(fi)
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, batch, sub)
        acc.update(loss=metrics["loss"], grad_norm=metrics["grad_norm"],
                   ce_loss_text=metrics["ce_loss_text"],
                   ce_loss_vision=metrics["ce_loss_vision"])
        global_step += 1
        fi += seqs_per_step
        if global_step % log_every == 0:
            means, sps = acc.flush()
            logger.info(f"(step={global_step:07d}) "
                        + ", ".join(f"{k}: {v:.4f}" for k, v in means.items())
                        + f", steps/sec: {sps:.2f}")
            for k, v in means.items():
                writer.add_scalar(f"train/{k}", v, global_step)
        if val_fn is not None and validate_every and \
                global_step % validate_every == 0:
            vm = val_fn(state.params, val_batch, jax.random.PRNGKey(0))
            logger.info(
                f"(step={global_step:07d}) "
                + ", ".join(f"{k}: {float(v):.4f}" for k, v in vm.items()))
            for k, v in vm.items():
                writer.add_scalar(f"val/{k}", float(v), global_step)
        if global_step % save_every == 0:
            ckpt.save(global_step, jax.device_get(state),
                      data_status={"file": fi})
            logger.info(f"saved checkpoint at step {global_step}")

    ckpt.save(global_step, jax.device_get(state), data_status={"file": fi})
    writer.close()
    logger.info("training done")


if __name__ == "__main__":
    main()
