"""pose_estimation_tpu — TPU-native RGB-D 6-DoF object pose estimation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
yaomy533/pose_estimation reference (KRRN LineMOD pipeline + transparent-object
pipeline), designed TPU-first:

- all compute (backbone, fusion, losses, metrics, PnP-RANSAC pose recovery)
  is jit-compiled XLA with static shapes;
- O(N^2) point ops (KNN, ADD-S) have tiled Pallas kernels;
- scaling is a `jax.sharding.Mesh` + pjit/shard_map data-parallel path
  (replacing the reference's NCCL DDP, version/transparent/train.py:1216-1441);
- checkpointing is full-train-state orbax (replacing filename-parsed
  state_dict saves, tools/trainer.py:137-138,354-363).

Layout:
  core/geometry   rotations, intrinsics, backprojection, affine warps, Umeyama
  core/pointops   KNN / nearest / gather / FPS / pooling / pairwise distances
  core/solvers    batched EPnP + vectorized RANSAC + LM refine (differentiable)
  models          HRNet, KRRN heads, 3D-GCN fusion, pose heads; PSPNet/UNet gen
  losses          masked map losses, ADD(-S) pose losses, transparent losses
  metrics         ADD / ADD-S / 5deg5cm / AUC accumulators (on-device)
  data            LineMOD (preprocessed + BOP), Cleargrasp, YCB-V, synthetic
  parallel        mesh construction, sharded train/eval steps
  train           train state, optimizers (Ranger), schedulers, trainer, ckpt
"""

__version__ = "0.1.0"
