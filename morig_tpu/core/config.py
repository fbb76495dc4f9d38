"""Configuration tree for the framework.

All hyper-parameters of record from the reference implementation are collected
here as named, cited defaults (reference file:line cited per field).  The
reference scatters these across six argparse scripts
(training/train_corr_pose.py:252-281, training/train_rig.py:270-292,
training/train_skin.py argparse, evaluate/eval_rigging.py:48) and in-source
constants; here they form one dataclass tree.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Shared architecture hyper-parameters."""

    # CorrNet (reference models/corrnet.py:11-35)
    corr_input_feature: int = 3
    corr_output_feature: int = 64
    tau_nce: float = 0.07              # train_corr_pose.py:277
    # DeformNet (models/deformnet.py:35-39)
    num_interp: int = 5
    # Rig nets (models/rignet.py:70-205, train_rig.py:283-285)
    num_keyframes: int = 5
    motion_dim: int = 32
    aggr_method: str = "attn"          # {attn, mean, max}
    # SkinNet (train_skin.py, joint2rig.py:473)
    nearest_bone: int = 5
    use_Dg: bool = False
    use_Lf: bool = False
    # Numerics
    use_batchnorm: bool = True         # reference MLP uses BatchNorm1d (basic_modules.py:33)
    bn_momentum: float = 0.1           # torch BatchNorm1d default momentum
    bn_eps: float = 1e-5
    compute_dtype: str = "float32"     # bfloat16 for MXU-heavy inference


@dataclasses.dataclass(frozen=True)
class PointBranchConfig:
    """PointNet++ encoder/decoder shape constants (models/corrnet.py:24-33)."""

    num_points: int = 1024
    sa_ratios: Sequence[float] = (0.5, 0.25, 0.25)
    sa_radii: Sequence[float] = (0.12, 0.25, 0.5)
    sa_max_neighbors: int = 64
    fp_ks: Sequence[int] = (1, 3, 3, 3)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimizer / schedule defaults (train_corr_pose.py:255-263)."""

    lr: float = 1e-3
    weight_decay: float = 1e-4
    epochs: int = 300
    schedule: Sequence[int] = (200,)   # MultiStepLR milestones
    gamma: float = 0.1
    batch_size: int = 2
    vis_branch_start_epoch: int = 100  # train_corr_pose.py:279
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class JointExtractConfig:
    """Joint-extraction constants (evaluate/eval_rigging.py:48, cluster_utils.py:39)."""

    bandwidth_quantile: float = 0.04
    attn_threshold: float = 0.1        # threshold1
    density_threshold: float = 0.02    # thrd_density
    attn_nms_threshold: float = 0.7    # thrd_attn
    meanshift_max_iter: int = 30
    meanshift_step: float = 0.3        # cluster_utils.py:32
    symmetry_tol: float = 2e-2         # mst_utils.py:121-123,300
    # Cap on cluster-table rows fetched from device per mesh (0 = exact, all
    # 2V rows).  A cap compacts the tunnel fetch to the top rows by density,
    # but densest-first truncation drops entire LOW-density modes (extremity
    # joints on multi-limb bodies lose wholesale to torso clusters: measured
    # recall 0.37 at cap=1024 vs 0.9+ exact on 19-22-joint creatures) — only
    # set it for throughput experiments on low-joint-count shapes.
    cluster_fetch_cap: int = 0
    # Bandwidth-estimate row subsample (0 = every point, sklearn-exact).  The
    # statistic is a mean over points of the kth-NN distance; a strided row
    # subset estimates the same mean with full-candidate-set order statistics
    # per row, cutting the (N,N) top-k (~78 ms/iter at B=32) ~3x.
    bandwidth_sample_rows: int = 1024


@dataclasses.dataclass(frozen=True)
class TrackingConfig:
    """Tracking / IK constants (evaluate/eval_tracking.py:62-125, utils/deform_ik.py:8)."""

    ik_iters_stage1: int = 200
    ik_iters_stage2: int = 400
    ik_lr_stage1: float = 5e-2
    ik_lr_stage2: float = 1e-3
    ik_weight_decay: float = 1e-4
    vismask_threshold: float = 0.3     # eval_tracking.py:62
    corr_sim_threshold: float = 0.5    # eval_tracking.py:93-94
    corr_l2_threshold: float = 1e-2    # eval_tracking.py:107


@dataclasses.dataclass(frozen=True)
class SkinPostConfig:
    """Skinning post-processing (joint2rig.py:460-462, train_skin.py:244)."""

    prune_ratio_rig: float = 0.35
    prune_ratio_eval: float = 0.5
    post_filter_rings: int = 1
    # volumetric skin-descriptor path (joint2rig.py:307-360 on device):
    # fallback min-plus anchor count (None = all vertices, exact host parity;
    # ~1/3 of the padded vertex count keeps occluded-pair distances within a
    # few percent — the same spirit as the reference's ~1500-vertex geodesic
    # subsampling, joint2rig.py:319) and LOS samples per (vertex, bone) ray
    geo_anchors: int | None = 512
    geo_los_samples: int = 16
    # per-vertex LOS rays only on the K' euclidean-nearest bones (the
    # geodesic reordering only drops occluded bones OUT of the final
    # nearest_bone=K set, so K' ≳ 2K keeps the selected set); None = rays
    # to every bone
    geo_candidates: int | None = 10


@dataclasses.dataclass(frozen=True)
class MeshBucketConfig:
    """Static-shape padding buckets for meshes."""

    vertex_buckets: Sequence[int] = (1024, 2048, 4096, 8192)
    tpl_max_degree: int = 16           # one-ring degree bound (+1 self loop)
    geo_max_degree: int = 16           # geodesic ball capped at 15 (common_ops.py:221) + self
    max_joints: int = 48               # dataset_rig.py:81
    max_corr: int = 1024               # per-frame correspondence pairs cap


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    points: PointBranchConfig = dataclasses.field(default_factory=PointBranchConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    joints: JointExtractConfig = dataclasses.field(default_factory=JointExtractConfig)
    tracking: TrackingConfig = dataclasses.field(default_factory=TrackingConfig)
    skin_post: SkinPostConfig = dataclasses.field(default_factory=SkinPostConfig)
    buckets: MeshBucketConfig = dataclasses.field(default_factory=MeshBucketConfig)


DEFAULT_CONFIG = Config()
