"""Horizon-GS TPU: a TPU-native (JAX/XLA/Pallas) Gaussian-splatting framework.

A from-scratch reimplementation of the capabilities of Horizon-GS
(darknobre/HorizonGS): anchor-based neural Gaussians (Scaffold-GS style),
octree LOD anchors for aerial-to-ground scenes, 3DGS and 2DGS differentiable
rasterization, gradient-driven densification, coarse-to-fine staged training,
chunked large-scene partitioning, and multi-chip scale-out via jax.sharding.

Layer map (bottom → top):
  core/      pure-jnp math: cameras, rotations, spherical harmonics
  ops/       differentiable rasterization: projection, tile binning,
             compositing (dense oracle + Pallas TPU kernels)
  models/    anchor tables as capacity-padded pytrees, MLP decoders,
             scaffold + octree-LOD models, explicit (baked) gaussians
  train/     losses, LR schedules, functional Adam, densify engine, trainer
  data/      dataset readers (COLMAP/Blender/City/UCGS), Scene, partitioner
  parallel/  device mesh, sharding rules, sharded train step, chunk merge
  io/        PLY schemas, checkpoints, result JSONs
  cli/       train / render / metrics / export-mesh / partition / merge
"""

__version__ = "0.1.0"
