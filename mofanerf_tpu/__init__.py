"""mofanerf_tpu — TPU-native MoFaNeRF (Morphable Facial Neural Radiance Field).

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of
zhuhao-nju/mofanerf (ECCV 2022, arXiv:2112.02308). The compute path is pure
functional JAX: params are pytrees, rendering is jittable end-to-end, and
scale-out uses `jax.sharding.Mesh` instead of DataParallel.

Package layout:
  ops/       math & geometry primitives (embedding, rays, sampling, compositing)
  models/    field networks (conditioned NeRF, ISM, texture encoder, refinenet)
  render/    pure functional volume renderer
  parallel/  device-mesh + sharding rules
  train/     train/fit loops, optimizers, checkpointing
  data/      dataset loaders + landmark-biased ray sampling
  utils/     metrics, logging, profiling
"""

__version__ = "0.1.0"
