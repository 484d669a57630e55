"""ImageNet FID sampling: 50k class-balanced samples -> .npz for the ADM
evaluation suite.

Equivalent of imagenet_gen/sample_ddp{,_parallel}.py:64-196: EMA weights by
default, per-rank class-strided batches (sample_ddp.py:143-151), png save,
rank0 npz packer (sample_ddp.py:30-61). Rank sharding uses
jax.process_index(); determinism from per-rank seeds.
"""

from __future__ import annotations

import math
import os

import numpy as np


def create_npz_from_sample_folder(sample_dir: str, num: int = 50_000) -> str:
    """Pack pngs into a [N,H,W,3] uint8 .npz (sample_ddp.py:30-61)."""
    from PIL import Image

    samples = []
    for i in range(num):
        samples.append(np.asarray(
            Image.open(os.path.join(sample_dir, f"{i:06d}.png"))))
    arr = np.stack(samples)
    npz_path = f"{sample_dir}.npz"
    np.savez(npz_path, arr_0=arr)
    return npz_path


def sample_fid(
    params: dict,
    head,
    head_params: dict,
    cfg,
    ae,
    ae_params: dict,
    sample_dir: str,
    num_fid_samples: int = 50_000,
    per_proc_batch_size: int = 32,
    cfg_scale: float = 4.6,
    sample_steps: int = 100,
    seed: int = 99,
    save_png: bool = True,
    pack_npz: bool = True,
) -> str | None:
    """Generate class-balanced samples sharded over hosts.

    Class schedule matches sample_ddp.py:143-151: global sample g gets class
    g % 1000 via rank-strided batches.
    """
    import jax
    import jax.numpy as jnp

    from bitdance_tpu.models.imagenet_ar import sample, tokens_to_grid
    from bitdance_tpu.models.tokenizer import VQModel

    rank = jax.process_index()
    world = jax.process_count()
    n = per_proc_batch_size
    global_batch = n * world
    num_iters = int(math.ceil(num_fid_samples / global_batch))

    os.makedirs(sample_dir, exist_ok=True)

    @jax.jit
    def run_sample(p, hp, cls, rng):
        toks = sample(p, head, hp, cfg, cls, rng,
                      num_sampling_steps=sample_steps, cfg_scale=cfg_scale)
        return tokens_to_grid(cfg, toks)

    @jax.jit
    def run_decode(aep, grid):
        img = ae.apply(aep, grid, method=VQModel.decode)
        img = jnp.clip(127.5 * img.astype(jnp.float32) + 128.0, 0, 255)
        return img.astype(jnp.uint8)

    def run(cls, rng):
        # params as jit args (closures embed them as HLO constants)
        return run_decode(ae_params, run_sample(params, head_params, cls, rng))

    total = 0
    for it in range(num_iters):
        # global indices for this rank's batch (sample_ddp.py:143-151)
        gidx = np.arange(n) + world * n * it + rank * n
        cls = jnp.asarray(gidx % cfg.num_classes, jnp.int32)
        rng = jax.random.PRNGKey(seed * world + rank + it * 131)
        images = np.asarray(run(cls, rng))
        if save_png:
            from PIL import Image

            for j, g in enumerate(gidx):
                if g < num_fid_samples:
                    Image.fromarray(images[j]).save(
                        os.path.join(sample_dir, f"{g:06d}.png"))
        total += n

    if pack_npz and rank == 0:
        return create_npz_from_sample_folder(sample_dir, num_fid_samples)
    return None
