"""morig_tpu — a TPU-native motion-aware rigging framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of zhan-xu/MoRig
(MoRig: Motion-aware rigging of character meshes from point clouds, Xu et al.,
SIGGRAPH Asia 2022).  The compute path is jit/pjit-compiled XLA with Pallas
kernels for the hot ops; geometry preprocessing runs on host (optionally
through the bundled C++ native extension).

Layer map (mirrors reference layers, see SURVEY.md §1):
  core/      padded-batch data structures, config tree
  kernels/   knn / fps / radius / fused edge-conv (Pallas + XLA fallbacks)
  nn/        flax modules: GCU, PointNet++ blocks, CorrNet, DeformNet,
             JointNet, MaskNet, SkinNet, BoneNet, RootNet
  losses/    infoNCE, multi-positive infoNCE, chamfer, soft-CE
  geometry/  mean-shift, NMS, voxel tests, FK/LBS/IK, MST, geodesics, rotations
  data/      mesh/rig IO, preprocessing, padded dataset pipeline, synthetic fixtures
  train/     generic trainer + per-stage configs
  parallel/  device mesh, sharding, collectives
  pipelines/ rig prediction and tracking pipelines
  eval/      metrics and parity harness
"""

__version__ = "0.1.0"
