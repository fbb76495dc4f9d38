"""BoneNet (pairwise connectivity) and RootNet (root classification).

Re-design of models/bonenet.py:17-125 and models/rootnet.py:16-93 (RigNet
heritage) for padded batches.  BoneNet scores every candidate joint pair with
a mix of a GCU shape code, a PointNet++ joint-set code, and a per-pair MLP
over [joint_a, joint_b, dist, inside_proportion]; RootNet scores every joint
as root from the shape code + a per-joint PointNet++ encoder/decoder over the
joint set (with |x| as the input feature — distance to the symmetry plane).

The reference ships no training script for these (SURVEY.md §2.5); training
stages live in train/stages.py (BoneStage/RootStage) following the RigNet
recipe.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from morig_tpu.core.batch import MeshBatch
from morig_tpu.kernels import neighbors as nbk
from morig_tpu.nn.gcu import GCU
from morig_tpu.nn.mlp import MLP, MLPHead
from morig_tpu.nn.pointnet import FPModule, GlobalSAModule, SAModule


class ShapeEncoder(nn.Module):
    """3×GCU + global-max shape code (bonenet.py:58-72 / rootnet.py:16-31)."""

    out_channels: int = 64          # 64 for BoneNet, 128 for RootNet
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, mesh: MeshBatch, train: bool = False) -> jax.Array:
        an = self.axis_name
        x1 = GCU(64, axis_name=an, name="gcu_1")(mesh.verts, mesh, train)
        x2 = GCU(128, axis_name=an, name="gcu_2")(x1, mesh, train)
        x3 = GCU(256, axis_name=an, name="gcu_3")(x2, mesh, train)
        skips = jnp.concatenate([x1, x2, x3], axis=-1)
        if self.out_channels == 64:
            x4 = MLP([256, 64], axis_name=an, name="mlp_glb")(skips, mesh.vert_mask, train)
        else:
            x4 = MLP([self.out_channels], axis_name=an, name="mlp_glb")(skips, mesh.vert_mask, train)
        return nbk.masked_max(x4, mesh.vert_mask, axis=1)


class JointSetEncoder(nn.Module):
    """Global joint-set code: SA stack over the joint cloud
    (bonenet.py:75-96)."""

    max_joints: int = 48
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, joints, joints_mask, train: bool = False) -> jax.Array:
        an = self.axis_name
        J = joints.shape[1]
        sa1 = SAModule(J, 0.4, [64, 64, 128], 64, axis_name=an, name="sa1")
        x1, p1, m1 = sa1(None, joints, joints_mask, train)
        sa2 = SAModule(max(J // 3, 1), 0.6, [128, 128, 256], 64, axis_name=an, name="sa2")
        x2, p2, m2 = sa2(x1, p1, m1, train)
        return GlobalSAModule([256, 256, 512, 256, 128], axis_name=an, name="sa3")(x2, p2, m2, train)


class BoneNet(nn.Module):
    """Pairwise connectivity classifier (PairCls, bonenet.py:99-125).

    Inputs: mesh, joints (B,J,3)+mask, pairs (B,P,2) int + mask,
    pair_attr (B,P,2) = [dist, inside_proportion].  Returns logits (B,P,1).
    `permute` randomly swaps pair order during training (bonenet.py:114-118).
    """

    dropout: float = 0.7
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, mesh: MeshBatch, joints, joints_mask, pairs, pair_attr,
                 train: bool = False, permute: bool = False,
                 rng: Optional[jax.Array] = None):
        an = self.axis_name
        B, P, _ = pairs.shape
        shape_code = ShapeEncoder(64, axis_name=an, name="shape_encoder")(mesh, train)
        joint_code = JointSetEncoder(axis_name=an, name="joint_encoder")(joints, joints_mask, train)

        ja = jax.vmap(lambda j, p: j[p])(joints, pairs[..., 0])  # (B,P,3)
        jb = jax.vmap(lambda j, p: j[p])(joints, pairs[..., 1])
        if permute and rng is not None:
            swap = jax.random.bernoulli(rng, 0.5, (B, P, 1))
            ja, jb = jnp.where(swap, jb, ja), jnp.where(swap, ja, jb)
        pair_in = jnp.concatenate([ja, jb, pair_attr], axis=-1)   # (B,P,8)
        pair_feat = MLP([32, 64, 128, 256], axis_name=an, name="expand_joint_feature")(
            pair_in, None, train
        )
        mixed = jnp.concatenate([
            jnp.broadcast_to(shape_code[:, None, :], (B, P, shape_code.shape[-1])),
            jnp.broadcast_to(joint_code[:, None, :], (B, P, joint_code.shape[-1])),
            pair_feat,
        ], axis=-1)
        h = MLP([128, 64], axis_name=an, name="mix_transform")(mixed, None, train)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.Dense(1, kernel_init=nn.initializers.zeros, name="out")(h)


class RootNet(nn.Module):
    """Per-joint root classifier (ROOTNET, rootnet.py:64-93)."""

    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, mesh: MeshBatch, joints, joints_mask, train: bool = False):
        an = self.axis_name
        B, J, _ = joints.shape
        shape_code = ShapeEncoder(128, axis_name=an, name="shape_encoder")(mesh, train)

        x0 = jnp.abs(joints[..., 0:1])       # |x|: distance to symmetry plane
        sa1 = SAModule(J, 0.4, [64, 64, 128], 64, axis_name=an, name="sa1")
        x1, p1, m1 = sa1(x0, joints, joints_mask, train)
        sa2 = SAModule(max(J // 3, 1), 0.6, [128, 128, 256], 64, axis_name=an, name="sa2")
        x2, p2, m2 = sa2(x1, p1, m1, train)
        xg = GlobalSAModule([256, 256, 512], axis_name=an, name="sa3")(x2, p2, m2, train)
        f3, _, _ = FPModule(1, [256, 256], axis_name=an, name="fp3")(xg, None, None, x2, p2, m2, train)
        f2, _, _ = FPModule(3, [128, 128], axis_name=an, name="fp2")(f3, p2, m2, x1, p1, m1, train)
        f1, _, _ = FPModule(3, [128, 128], axis_name=an, name="fp1")(f2, p1, m1, x0, joints, joints_mask, train)

        per_joint = jnp.concatenate([
            jnp.broadcast_to(shape_code[:, None, :], (B, J, shape_code.shape[-1])), f1
        ], axis=-1)
        return MLPHead([200, 64], 1, zero_init=True, axis_name=an,
                       name="back_layers")(per_joint, joints_mask, train)
