"""Merge an orbax training checkpoint into the release model-directory format.

Equivalent of the reference's sharded->full merge tool
(train/fsdp_utils.py:368-393) plus the release layout writer: restores the
(possibly sharded) checkpoint to full host arrays and writes
ae/vision_head/projector safetensors + JSON configs that
pipelines/loader.py (and the torch reference pipeline) can consume.

  python scripts/export_release.py --ckpt results/mllm/checkpoints \
      --config train/configs/bitdance_14b_64x.yaml --out models/my-release
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", type=str, required=True,
                   help="orbax checkpoint dir (from train_mllm.py)")
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--vocab-size", type=int, default=152064)
    p.add_argument("--step", type=int, default=-1)
    args = p.parse_args()

    import os as _os
    if _os.environ.get("BITDANCE_PLATFORM"):
        import jax as _jax_early
        _jax_early.config.update("jax_platforms",
                                 _os.environ["BITDANCE_PLATFORM"])
    import jax
    import jax.numpy as jnp

    from bitdance_tpu.config import load_yaml, mllm_config_from_yaml
    from bitdance_tpu.models.mllm import init_mllm_params
    from bitdance_tpu.train import optim as opt_lib
    from bitdance_tpu.train.checkpoints import (
        CheckpointManager,
        export_release_dir,
    )
    from bitdance_tpu.train.mllm_train import MLLMTrainConfig, make_tx

    ycfg = load_yaml(args.config)
    cfg = mllm_config_from_yaml(ycfg, args.vocab_size)
    params = init_mllm_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    tx = make_tx(params, MLLMTrainConfig())
    like = opt_lib.TrainState.create(params, tx, with_ema=False)

    mgr = CheckpointManager(args.ckpt)
    state, step, _ = mgr.restore(like, None if args.step < 0 else args.step)
    if state is None:
        raise SystemExit(f"no checkpoint under {args.ckpt}")
    print(f"restored step {step}")

    head_cfg = {
        "ch_target": cfg.z_channels,
        "ch_cond": cfg.llm.hidden_size,
        "ch_latent": cfg.head_model_dim,
        "depth_latent": cfg.head_num_blocks,
        "depth_adanln": cfg.head_num_adaln,
        "time_shift": cfg.time_shift,
        "P_mean": cfg.P_mean,
        "P_std": cfg.P_std,
        "parallel_num": cfg.parallel_num,
        "use_swiglu": cfg.head_use_swiglu,
    }
    ae_cfg = dict(ycfg.model.encoder.params)
    export_release_dir(
        args.out,
        head_params=state.params["head"],
        projector_params=state.params["projector"],
        configs={"vision_head_config": head_cfg, "ae_config": ae_cfg},
    )
    # LLM weights: save the stacked pytree as an orbax dir for our loader
    # (HF-shard export is a round-2 item; pipelines/loader also accepts this)
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(os.path.abspath(args.out), "llm_orbax"),
               jax.device_get(state.params["llm"]))
    ckptr.wait_until_finished()
    print(f"wrote release dir {args.out}")


if __name__ == "__main__":
    main()
