"""On-hardware training-run proof: loss descent + kill/resume round-trip.

VERDICT r4 ask #7: the auto-resume loop (reference imagenet_gen/
train.py:222-448) was only unit-tested; this script runs a REAL multi-step
training run on the available device and proves, in one artifact:

  * loss curve descending (per-step JSONL log),
  * checkpoint save -> HARD KILL (os._exit mid-run, no clean shutdown) ->
    auto-resume -> byte-identical state (sha256 digest over every leaf of
    params/opt_state/ema/step, recorded at save time, re-computed after
    restore),
  * EMA advancing (differs from both the live params and its initial value).

Data is a fixed deterministic synthetic set of +-1 latent tokens + labels
(the AR backbone+head memorize it, so the loss has real signal); batch and
rng derive from the GLOBAL step index, so the resumed run continues the
exact stream the killed run was on.

Orchestration (parent spawns both phases so the kill is a real process
death):
  python scripts/train_proof.py --model BitDance-B --batch 128 \
      --steps 300 --kill-at 200 --ckpt-every 100 \
      --out benchmarks/records/train_proof.jsonl

Single-phase entry points (used by the parent):
  --phase run     train from scratch/resume until --kill-at, save, _exit(9)
  --phase resume  restore, assert digest, train to --steps, assert descent
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def state_digest(state) -> str:
    """sha256 over every leaf (path-ordered, raw bytes) of the train state."""
    import jax
    import numpy as np

    h = hashlib.sha256()
    leaves = jax.tree_util.tree_flatten_with_path(jax.device_get(state))[0]
    for path, leaf in sorted(leaves, key=lambda kv: str(kv[0])):
        h.update(str(path).encode())
        arr = np.asarray(leaf)
        h.update(str(arr.dtype).encode() + str(arr.shape).encode())
        h.update(np.ascontiguousarray(arr).tobytes())
    return h.hexdigest()


def make_synth_batch(step: int, batch: int, seq: int, z: int,
                     n_samples: int = 512, num_classes: int = 1000):
    """Deterministic batch for global `step` from a fixed n_samples-row
    synthetic dataset (cycled), so killed and resumed runs see the same
    stream."""
    import numpy as np

    idx = (np.arange(batch, dtype=np.int64) + step * batch) % n_samples
    out_t = np.empty((batch, seq, z), np.float32)
    out_c = np.empty((batch,), np.int32)
    for j, i in enumerate(idx):
        rng = np.random.default_rng(1234 + int(i))
        out_t[j] = np.sign(rng.standard_normal((seq, z))).astype(np.float32)
        out_c[j] = int(i) % num_classes
    return out_t, out_c


def build(args):
    import jax
    import jax.numpy as jnp

    from bitdance_tpu.models.imagenet_ar import IMAGENET_MODELS
    from bitdance_tpu.parallel.mesh import create_mesh
    from bitdance_tpu.train.checkpoints import CheckpointManager
    from bitdance_tpu.train.imagenet_train import (
        ImageNetTrainConfig,
        init_train_state,
        make_sharded_train_step,
    )
    from bitdance_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    cfg = IMAGENET_MODELS[args.model](resolution=256,
                                      parallel_num=args.parallel)
    tcfg = ImageNetTrainConfig(warmup_steps=args.warmup,
                               total_steps=10**9,
                               ema_decay=args.ema_decay,
                               global_batch_size=args.batch)
    mesh = create_mesh()
    state, head, tx = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    step_fn, state_sh = make_sharded_train_step(mesh, state, cfg, head, tx,
                                                tcfg)
    state = jax.device_put(state, state_sh)
    ckpt = CheckpointManager(os.path.join(args.workdir, "checkpoints"))
    return cfg, state, state_sh, step_fn, ckpt


def train_loop(args, start_required: int | None):
    """Run phase: train until --kill-at then die hard; resume phase: restore
    (assert digest + step), train to --steps, assert descent/EMA."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    cfg, state, state_sh, step_fn, ckpt = build(args)
    seq = (cfg.resolution // cfg.down_size) ** 2
    base_rng = jax.random.PRNGKey(7)
    log = open(args.out, "a", buffering=1)

    restored, step0, data_status = ckpt.restore(jax.device_get(state),
                                                with_data_status=True)
    ema_init = None
    if restored is not None:
        state = jax.device_put(restored, state_sh)
        dig = state_digest(state)
        want = (data_status or {}).get("digest")
        line = {"event": "resume", "step": step0, "digest": dig,
                "digest_at_save": want, "bit_identical": dig == want}
        log.write(json.dumps(line) + "\n")
        print(f"RESUME step={step0} bit_identical={dig == want}", flush=True)
        assert dig == want, (
            f"restored state digest {dig[:16]} != saved {str(want)[:16]}")
        if start_required is not None:
            assert step0 == start_required, (step0, start_required)
    else:
        assert start_required is None, "expected a checkpoint to resume from"
        step0 = 0
        log.write(json.dumps({"event": "start", "model": args.model,
                              "batch": args.batch, "steps": args.steps,
                              "backend": jax.default_backend()}) + "\n")

    losses = []
    t_prev = time.time()
    for step in range(step0, args.steps):
        toks, labels = make_synth_batch(step, args.batch, seq,
                                        cfg.latent_dim,
                                        num_classes=cfg.num_classes)
        sub = jax.random.fold_in(base_rng, step)
        state, metrics = step_fn(state, jnp.asarray(toks),
                                 jnp.asarray(labels), sub)
        loss = float(metrics["loss"])       # host readback fences the step
        gnorm = float(metrics["grad_norm"])
        losses.append(loss)
        now = time.time()
        log.write(json.dumps({"step": step + 1, "loss": round(loss, 5),
                              "grad_norm": round(gnorm, 4),
                              "step_s": round(now - t_prev, 3)}) + "\n")
        t_prev = now
        done = step + 1
        if done % args.ckpt_every == 0 or done == args.kill_at \
                or done == args.steps:
            host = jax.device_get(state)
            dig = state_digest(host)
            ckpt.save(done, host, data_status={"digest": dig, "i": done})
            log.write(json.dumps({"event": "save", "step": done,
                                  "digest": dig}) + "\n")
            if args.phase == "run" and done == args.kill_at:
                print(f"KILL at step {done} digest={dig[:16]}", flush=True)
                log.close()
                os._exit(9)   # hard death: no finalizers, no clean shutdown

    # resume phase end-of-run assertions
    ema_leaves = jax.tree_util.tree_leaves(
        jax.device_get(state.ema_params))
    p_leaves = jax.tree_util.tree_leaves(jax.device_get(state.params))
    ema_moved = any(
        not np.array_equal(np.asarray(e), np.asarray(p))
        for e, p in zip(ema_leaves, p_leaves))
    assert ema_moved, "EMA identical to live params — EMA not advancing"
    # descent is judged over the WHOLE run (both phases append to the same
    # JSONL), not just the post-resume tail
    log.flush()
    with open(args.out) as f:
        all_losses = [json.loads(ln)["loss"] for ln in f
                      if '"loss"' in ln and '"event"' not in ln]
    n = min(20, max(1, len(all_losses) // 4))
    first = float(np.mean(all_losses[:n]))
    last = float(np.mean(all_losses[-n:]))
    log.write(json.dumps({"event": "done", "steps": args.steps,
                          "loss_first20": round(float(first), 5),
                          "loss_last20": round(float(last), 5),
                          "descended": bool(last < first)}) + "\n")
    print(f"DONE loss {first:.4f} -> {last:.4f} descended={last < first}",
          flush=True)
    if args.require_descent:
        assert last < first, f"loss did not descend: {first:.4f} -> {last:.4f}"
    log.close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="BitDance-B")
    ap.add_argument("--parallel", type=int, default=1)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--kill-at", type=int, default=200)
    ap.add_argument("--ckpt-every", type=int, default=100)
    ap.add_argument("--warmup", type=int, default=100)
    ap.add_argument("--ema-decay", type=float, default=0.9999)
    ap.add_argument("--workdir", default="/tmp/train_proof")
    ap.add_argument("--out", default="benchmarks/records/train_proof.jsonl")
    ap.add_argument("--phase", choices=["parent", "run", "resume"],
                    default="parent")
    ap.add_argument("--require-descent", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="assert the loss descended (disable for short "
                         "orchestration smokes where descent is luck)")
    args = ap.parse_args()
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)

    if args.phase != "parent":
        train_loop(args, None if args.phase == "run" else args.kill_at)
        return

    # parent: orchestrate run -> hard kill -> resume as real processes
    import shutil

    shutil.rmtree(args.workdir, ignore_errors=True)
    if os.path.exists(args.out):
        os.unlink(args.out)
    child = [a for a in sys.argv[1:] if a not in ("--phase", "parent")]
    base = [sys.executable, os.path.abspath(__file__)] + child
    r1 = subprocess.run(base + ["--phase", "run"])
    assert r1.returncode == 9, (
        f"run phase should die with _exit(9), got {r1.returncode}")
    r2 = subprocess.run(base + ["--phase", "resume"])
    assert r2.returncode == 0, f"resume phase failed rc={r2.returncode}"
    print("TRAIN_PROOF OK: hard-kill resume bit-identical, loss descended; "
          f"log at {args.out}")


if __name__ == "__main__":
    main()
