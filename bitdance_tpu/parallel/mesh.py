"""Device mesh and sharding rules.

The reference's parallelism surface (SURVEY.md §2.6) is DDP + FSDP/HSDP over
NCCL. The TPU-native equivalent: a named mesh ("replica", "fsdp", "tp") where

  - "fsdp" shards parameters ZeRO-3 style over ICI (HYBRID_SHARD's shard
    group, train/fsdp_utils.py:80-84),
  - "replica" replicates across slices (DCN; HYBRID_SHARD's replicate group),
  - "tp" is an optional tensor-parallel axis (absent in the reference;
    available here as headroom for the 14B),

and the batch is data-sharded over all axes. GSPMD inserts the
all-gather/reduce-scatter collectives — there is no NCCL-equivalent API.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MESH_AXES = ("replica", "fsdp", "tp")


def create_mesh(replica: int = 1, fsdp: int | None = None, tp: int = 1,
                devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if fsdp is None:
        fsdp = n // (replica * tp)
    assert replica * fsdp * tp == n, (
        f"mesh {replica}x{fsdp}x{tp} != {n} devices")
    dev_array = mesh_utils.create_device_mesh((replica, fsdp, tp),
                                              devices=devices)
    return Mesh(dev_array, MESH_AXES)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over every mesh axis (pure data parallel input)."""
    return NamedSharding(mesh, P(MESH_AXES))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fsdp_partition_spec(path_str: str, shape: tuple[int, ...],
                        fsdp_size: int, min_size: int = 2 ** 14) -> P:
    """FSDP rule: shard one axis of each large tensor over "fsdp".

    For stacked per-layer tensors (path contains "layers", leading axis =
    layer index consumed by lax.scan) the layer axis is excluded — sharding
    it would serialize the scan through one device per step. Otherwise the
    largest axis divisible by the fsdp size is sharded.
    """
    size = int(np.prod(shape))
    if size < min_size or fsdp_size == 1:
        return P()
    start = 1 if ("layers" in path_str and len(shape) > 1) else 0
    dims = sorted(range(start, len(shape)), key=lambda d: -shape[d])
    for d in dims:
        if shape[d] % fsdp_size == 0:
            spec = [None] * len(shape)
            spec[d] = "fsdp"
            return P(*spec)
    return P()


def fsdp_shardings(params, mesh: Mesh, min_size: int = 2 ** 14):
    """NamedShardings for a parameter pytree under the FSDP rule."""
    fsdp_size = mesh.shape["fsdp"]

    def to_sharding(path, leaf):
        path_str = jax.tree_util.keystr(path)
        spec = fsdp_partition_spec(path_str, leaf.shape, fsdp_size, min_size)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def shard_params(params, mesh: Mesh, min_size: int = 2 ** 14):
    """Device-put a parameter pytree with FSDP shardings."""
    shardings = fsdp_shardings(params, mesh, min_size)
    return jax.tree.map(jax.device_put, params, shardings)
