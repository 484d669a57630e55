"""Training-step throughput on one chip: ImageNet AR and packed MLLM.

The reference publishes training *hardware* (16-64xH100, global batch 1024,
imagenet_gen/README.md:95-150) but no step-time numbers; this records ours
so regressions are visible and multi-chip projections (linear in DP) have a
measured base. Sampling benches live in bench_t2i.py / bench.py.

Both steps are the production code paths (donated state, adamw + EMA,
bit-flip perturb, remat per config) — not stripped-down forward passes.

Usage: python benchmarks/bench_train.py [--imagenet-batch 256]
       [--mllm-budget 4096] [--steps 8] [--skip-imagenet] [--skip-mllm]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

V5E_PEAK_BF16_TFLOPS = 197.0   # per-chip dense bf16 (bench_t2i.py)

# sitecustomize imports jax at startup (axon plugin), so JAX_PLATFORMS in
# the env is too late — config.update is the reliable switch (conftest.py).
if os.environ.get("BITDANCE_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", os.environ["BITDANCE_PLATFORM"])


def _fence(x):
    import jax
    import jax.numpy as jnp

    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def _param_count(tree):
    import jax
    import numpy as np

    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(tree)
                   if hasattr(x, "shape")))


def _train_mfu(fwd_matmul_tflops, dt_s, peak=V5E_PEAK_BF16_TFLOPS):
    """Standard-convention training MFU: 3x the forward matmul FLOPs
    (fwd + ~2x bwd), counted against dense bf16 peak. Full-remat recompute
    is NOT credited (the hardware does ~4x; MFU quotes model math only),
    so this understates achieved utilization slightly."""
    ach = 3.0 * fwd_matmul_tflops / dt_s
    return round(ach, 1), round(ach / peak, 3)


def bench_imagenet(args):
    import functools

    import jax
    import jax.numpy as jnp

    from bitdance_tpu.models.imagenet_ar import IMAGENET_MODELS
    from bitdance_tpu.train.imagenet_train import (
        ImageNetTrainConfig,
        init_train_state,
        train_step,
    )

    # remat matches the reference's grad-checkpointing flag; without it the
    # 24-layer b256 backward residuals alone are 19GB
    cfg = IMAGENET_MODELS[args.model](resolution=256, grad_checkpointing=True)
    tcfg = ImageNetTrainConfig(global_batch_size=args.imagenet_batch)
    state, head, tx = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)

    b = args.imagenet_batch
    tokens = jnp.sign(jax.random.normal(
        jax.random.PRNGKey(1), (b, cfg.num_tokens, cfg.token_dim))) + 0.0
    cls = jnp.arange(b, dtype=jnp.int32) % cfg.num_classes

    step = jax.jit(
        functools.partial(train_step, cfg=cfg, head=head, tx=tx,
                          ema_decay=tcfg.ema_decay,
                          mixed_precision=tcfg.mixed_precision),
        donate_argnums=(0,),
    )

    t0 = time.time()
    state, metrics = step(state, tokens, cls, jax.random.PRNGKey(2))
    _fence(metrics["loss"])
    compile_s = time.time() - t0

    t0 = time.time()
    for i in range(args.steps):
        state, metrics = step(state, tokens, cls, jax.random.PRNGKey(3 + i))
    _fence(metrics["loss"])
    dt = (time.time() - t0) / args.steps
    print(f"imagenet {args.model} train b{b} 256px: {dt*1e3:.0f} ms/step "
          f"({b/dt:.1f} imgs/s/chip) [compile {compile_s:.0f}s]")

    # fwd matmul TFLOPs: 2 * tokens * params for the AR backbone (every
    # image token + class prefix) and the diffusion head (one net call per
    # image token row)
    seq = cfg.prefix_len + cfg.num_tokens - cfg.parallel_num
    fwd_tf = (2.0 * b * seq * _param_count(state.params["ar"])
              + 2.0 * b * cfg.num_tokens
              * _param_count(state.params["head"])) / 1e12
    ach, mfu = _train_mfu(fwd_tf, dt)
    print("TRAIN_IMAGENET " + json.dumps({
        "imgs_per_sec_per_chip": round(b / dt, 2),
        "ms_per_step": round(dt * 1e3, 1),
        "mfu": mfu, "achieved_tflops": ach,
        "peak_tflops_assumed": V5E_PEAK_BF16_TFLOPS,
        "compile_s": round(compile_s, 1),
        "config": f"{args.model} b{b} 256px bf16+remat, adamw+ema, "
                  f"bit-flip perturb",
    }))


def bench_mllm(args):
    import functools

    import numpy as np
    import jax
    import jax.numpy as jnp

    from bitdance_tpu.data.packing import (
        T2ISample,
        pack_t2i_batch,
        stack_packed_batches,
    )
    from bitdance_tpu.models import qwen3 as q3
    from bitdance_tpu.models.mllm import MLLMConfig, PackedBatch, init_mllm_params
    from bitdance_tpu.ops.rotary import sincos_1d_table_np
    from bitdance_tpu.train.mllm_train import (
        MLLMTrainConfig,
        make_state,
        make_tx,
        train_step,
    )

    # 0.7B-class geometry (bench_t2i.py default) with the yaml's head shape
    # scaled to match; packed budget/images mirror the 14B recipe at 1/8 the
    # token budget (bitdance_14b_64x.yaml:45-47).
    if args.mllm_real_width:
        # TRUE 14B width (bitdance_14b_64x.yaml:18-35): Qwen3-14B layer
        # geometry + the 5120-wide 6-block head, at --mllm-layers depth.
        # Vocab is shrunk (--mllm-vocab) because the 152k embed+lm_head add
        # 1.56B params and, at the bf16-adamw 8 bytes/param train footprint,
        # 12.5GB of state — the 16GB chip budget goes to the width-5120
        # matmuls this measurement is about.
        base = q3.Qwen3Config.qwen3_14b()
        hidden = base.hidden_size
        llm = q3.Qwen3Config(
            vocab_size=args.mllm_vocab, hidden_size=hidden,
            intermediate_size=base.intermediate_size,
            num_hidden_layers=args.mllm_layers,
            num_attention_heads=base.num_attention_heads,
            num_key_value_heads=base.num_key_value_heads,
            head_dim=base.head_dim)
    else:
        hidden = args.mllm_hidden
        llm = q3.Qwen3Config(
            vocab_size=args.mllm_vocab, hidden_size=hidden,
            intermediate_size=hidden * 4,
            num_hidden_layers=args.mllm_layers,
            num_attention_heads=hidden // 64,
            num_key_value_heads=max(hidden // 128, 1), head_dim=64)
    p = 64
    # live-kv bound from the hard data guarantee (longest packed document),
    # NOT the budget: a 512px doc is ~1176 tokens -> 4 live 512-token kv
    # tiles per 256-token q tile. Oversizing multiplies grid steps.
    side = 32 if args.mllm_budget >= 2048 else 8
    max_doc = 40 + side * side + p + 48
    cfg = MLLMConfig(
        llm=llm, z_channels=32, parallel_num=p, head_model_dim=hidden,
        head_num_blocks=args.head_blocks, head_num_adaln=2, pe_max_len=4096,
        attn_max_live_kv=-(-max_doc // 512) + 1)
    tcfg = MLLMTrainConfig(lr=1e-5, warmup_steps=0, total_steps=1000)

    rng = np.random.default_rng(0)
    table = sincos_1d_table_np(hidden // 2, 64)
    samples = []
    # 512px images (32x32 latents = 1024 tokens) at real budgets; tiny 8x8
    # images for smoke-scale budgets (side set above with max_live_kv)
    per_sample = side * side + p + 48
    n_img = max((args.mllm_budget - 64) // per_sample, 1)
    for i in range(n_img):
        samples.append(T2ISample(
            text_ids=rng.integers(1, 2000, 40),
            image_latents=np.sign(rng.normal(size=(side * side, 32))).astype(
                np.float32),
            latent_h=side, latent_w=side,
            vision_start_id=2001, res_h_id=2033, res_w_id=2033,
            query_ids=np.arange(2100, 2100 + p - 1),
            text_loss=True,
        ))
    raw = pack_t2i_batch(samples, p, args.mllm_budget, table)
    raw = stack_packed_batches([raw])
    batch = PackedBatch(**{k: jnp.asarray(v) for k, v in raw.items()})
    n_tokens = int(np.asarray(batch.position_ids).size)

    params = init_mllm_params(jax.random.PRNGKey(0), cfg,
                              dtype=jnp.bfloat16)
    if args.bf16_state:
        # bf16 param STORAGE (flax inits keep f32 storage for the head /
        # projector): adamw moments then follow at bf16 too, 6 bytes/param
        # total instead of 12-16 — the only way the 5120-wide head's
        # billions of params train on one 16GB chip. The production 14B
        # contract shards f32 state over 64-chip FSDP instead
        # (bitdance_14b_64x). Cast leaf-by-leaf with donation: a whole-tree
        # astype holds the f32 AND bf16 trees simultaneously (~15GB at
        # real width) and HLO-temp-OOMs before the first step.
        flat, treedef = jax.tree_util.tree_flatten(params)
        cast = jax.jit(lambda a: a.astype(jnp.bfloat16), donate_argnums=0)
        flat = [cast(x) if x.dtype == jnp.float32 else x for x in flat]
        params = jax.tree_util.tree_unflatten(treedef, flat)
    tx = make_tx(params, tcfg)
    state = make_state(params, tx, tcfg)

    step = jax.jit(
        functools.partial(train_step, cfg=cfg, tcfg=tcfg, tx=tx),
        donate_argnums=(0,),
    )
    t0 = time.time()
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    _fence(metrics["loss"])
    compile_s = time.time() - t0

    t0 = time.time()
    for i in range(args.steps):
        state, metrics = step(state, batch, jax.random.PRNGKey(3 + i))
    _fence(metrics["loss"])
    dt = (time.time() - t0) / args.steps
    print(f"mllm packed train {args.mllm_layers}L/{hidden}d budget "
          f"{args.mllm_budget} ({n_img} imgs): {dt*1e3:.0f} ms/step "
          f"({n_tokens/dt:.0f} tokens/s/chip) [compile {compile_s:.0f}s]")

    # fwd matmul TFLOPs: LLM layer stack on every packed token, chunked CE
    # lm_head on text-loss positions, diffusion head net on vision-loss
    # positions (one net call per vision token row)
    n_txt = int(np.asarray(raw["ce_text_indexes"]).size)
    n_vis = int(np.asarray(raw["vision_loss_indexes"]).size)
    fwd_tf = (2.0 * n_tokens * _param_count(params["llm"]["layers"])
              + 2.0 * n_txt * llm.vocab_size * hidden
              + 2.0 * n_vis * cfg.diff_batch_mul
              * _param_count(params["head"])) / 1e12
    ach, mfu = _train_mfu(fwd_tf, dt)
    tag = "REAL-14B-WIDTH " if args.mllm_real_width else ""
    print("TRAIN_MLLM " + json.dumps({
        "tokens_per_sec_per_chip": round(n_tokens / dt, 1),
        "ms_per_step": round(dt * 1e3, 1),
        "mfu": mfu, "achieved_tflops": ach,
        "peak_tflops_assumed": V5E_PEAK_BF16_TFLOPS,
        "compile_s": round(compile_s, 1),
        "config": f"{tag}{args.mllm_layers}L/{hidden}d vocab "
                  f"{llm.vocab_size} head{args.head_blocks}x{hidden}d, "
                  f"budget {args.mllm_budget} ({n_img} imgs), bf16+remat, "
                  + ("bf16 state, " if args.bf16_state else "")
                  + "sparse-iteration attention, donated adamw",
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="BitDance-B")
    ap.add_argument("--imagenet-batch", type=int, default=256)
    ap.add_argument("--mllm-budget", type=int, default=4096)
    ap.add_argument("--mllm-hidden", type=int, default=1024)
    ap.add_argument("--mllm-layers", type=int, default=16)
    ap.add_argument("--mllm-vocab", type=int, default=4096)
    ap.add_argument("--mllm-real-width", action="store_true",
                    help="TRUE 14B width: Qwen3-14B layer geometry (5120d, "
                         "17408 inter, 40h/8kv x128) + 5120-wide head, at "
                         "--mllm-layers depth (single-chip fit: see flag "
                         "docs in source)")
    ap.add_argument("--head-blocks", type=int, default=6)
    ap.add_argument("--bf16-state", action="store_true",
                    help="bf16 param storage + bf16 adamw moments (see "
                         "comment at the cast site)")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--skip-imagenet", action="store_true")
    ap.add_argument("--skip-mllm", action="store_true")
    args = ap.parse_args()
    if not args.skip_imagenet:
        bench_imagenet(args)
    if not args.skip_mllm:
        bench_mllm(args)


if __name__ == "__main__":
    main()
