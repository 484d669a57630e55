"""BitDance-TPU: a TPU-native JAX framework for binary-token autoregressive image generation.

A ground-up re-design of the capabilities of shallowdream204/BitDance
(binary visual tokenizer + next-patch-diffusion AR generation) for TPU:
jax/XLA for the compute graph, Pallas for hot kernels, pjit/shard_map over
named meshes for parallelism, orbax for checkpoints.
"""

__version__ = "0.1.0"
