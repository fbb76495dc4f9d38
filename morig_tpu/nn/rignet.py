"""Rigging nets: temporal attention, motion trunks, joint/mask/skin heads.

Re-design of models/rignet.py:10-220 for padded batches.  Per-keyframe motion
features come from a shared GCNRig trunk applied to each 3-channel flow slice,
are L2-normalized, aggregated across time by a CLS-token attention block
(TemporalAttn) or mean/max, then fed to task heads:

  JointNetMotion — per-vertex 3-d displacement toward the nearest joint
  MaskNetMotion  — per-vertex attention logit
  SkinMotion     — per-vertex logits over the K nearest bones

The temporal loop is a Python loop over T=5 keyframes sharing one trunk —
matching the reference's per-frame BatchNorm statistics (rignet.py:85-88)
rather than folding time into the batch axis.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from morig_tpu.core.batch import MeshBatch
from morig_tpu.kernels import neighbors as nbk
from morig_tpu.nn.corrnet import l2_normalize
from morig_tpu.nn.gcu import GCUMotion
from morig_tpu.nn.mlp import MLP, MLPHead


class TemporalAttn(nn.Module):
    """Single-block multi-head attention over T keyframe tokens + a learnable
    CLS token; the CLS position's output is the temporal aggregate
    (models/rignet.py:10-46)."""

    num_heads: int = 2
    hidden_size: int = 64
    dim_feedforward: int = 512
    output_size: int = 64
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, vert_mask: jax.Array, train: bool = False) -> jax.Array:
        # x: (B, V, T, C)
        B, V, T, C = x.shape
        H, D = self.num_heads, self.hidden_size
        cls = self.param("cls_token", nn.initializers.normal(1.0), (C,))
        cls_tok = jnp.broadcast_to(cls, (B, V, 1, C))
        seq = jnp.concatenate([cls_tok, x], axis=2)                  # (B,V,T+1,C)
        q = nn.Dense(H * D, use_bias=False, name="w_qs")(seq)
        k = nn.Dense(H * D, use_bias=False, name="w_ks")(seq)
        v = nn.Dense(H * D, use_bias=False, name="w_vs")(seq)
        split = lambda a: a.reshape(B, V, T + 1, H, D)
        q, k, v = split(q), split(k), split(v)
        attn = jnp.einsum("bvthd,bvshd->bvhts", q, k) / jnp.sqrt(float(D))
        attn = jax.nn.softmax(attn, axis=-1)
        res = jnp.einsum("bvhts,bvshd->bvthd", attn, v).reshape(B, V, T + 1, H * D)
        res = nn.Dense(D, use_bias=False, name="w_o")(res)
        out = MLP([self.dim_feedforward, self.output_size], axis_name=self.axis_name,
                  name="feedforward")(res[:, :, 0, :], vert_mask, train)
        return out


class GCNRig(nn.Module):
    """3×GCUMotion + global max + transform head — the shared motion/task
    trunk (models/rignet.py:49-67).  `width_scale` shrinks every hidden width
    proportionally (reference widths at 1.0) — used by the CPU-feasible
    trained-torch head-to-head harness (tools/torch_headtohead.py)."""

    chn_output: int
    width_scale: float = 1.0
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, pos, feature, mesh: MeshBatch, train: bool = False):
        an = self.axis_name
        s = self.width_scale
        w = lambda c: max(8, int(c * s))
        x1 = GCUMotion(w(64), dim_pos_feat=16, axis_name=an, name="gcu_1")(pos, feature, mesh, train)
        x2 = GCUMotion(w(256), dim_pos_feat=16, axis_name=an, name="gcu_2")(pos, x1, mesh, train)
        x3 = GCUMotion(w(512), dim_pos_feat=16, axis_name=an, name="gcu_3")(pos, x2, mesh, train)
        skips = jnp.concatenate([x1, x2, x3], axis=-1)
        x4 = MLP([w(1024)], axis_name=an, name="mlp_glb")(skips, mesh.vert_mask, train)
        glb = nbk.masked_max(x4, mesh.vert_mask, axis=1)
        glb = jnp.broadcast_to(glb[:, None, :], x4.shape[:2] + (glb.shape[-1],))
        x5 = jnp.concatenate([glb, mesh.verts, feature, skips], axis=-1)
        return MLPHead([w(1024), w(256)], self.chn_output, zero_init=True, axis_name=an,
                       name="mlp_transform")(x5, mesh.vert_mask, train)


class MotionAggregator(nn.Module):
    """Shared per-keyframe motion trunk + temporal aggregation
    (rignet.py:84-98).  Returns (motion_all (B,V,T,M), motion_aggr (B,V,M))."""

    num_keyframes: int = 5
    motion_dim: int = 32
    aggr_method: str = "attn"
    attn_output: int = 64
    width_scale: float = 1.0
    fold_time: Optional[bool] = None    # None -> fold iff norm is "layer"
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, input_flow: jax.Array, mesh: MeshBatch, train: bool = False):
        from morig_tpu.nn.mlp import get_default_norm

        motion_net = GCNRig(self.motion_dim, width_scale=self.width_scale,
                            axis_name=self.axis_name, name="motionNet")
        T = self.num_keyframes
        # Folding is only legal under per-row (layer) norm statistics, and is
        # measurably SLOWER on the v5e bench (18.1 vs 19.6 meshes/s at B=32):
        # the duplicated (B*T) mesh tables cost more than the 5 launches they
        # save, so the loop stays the default.  fold_time=True remains for
        # the equivalence test and future re-evaluation.
        fold = (self.fold_time is True) and get_default_norm() == "layer"
        if fold:
            # Fold the keyframe axis into the batch: ONE trunk launch at
            # (B*T) instead of T sequential launches.  LayerNorm statistics
            # are per-row, so this is exactly the per-frame loop; the loop
            # below is kept for the "batch"-norm reference-parity mode,
            # whose BN batch statistics are per-frame (rignet.py:85-88).
            B, V = input_flow.shape[0], input_flow.shape[1]
            flow_bt = jnp.reshape(input_flow, (B, V, T, 3))
            flow_bt = jnp.transpose(flow_bt, (0, 2, 1, 3)).reshape(B * T, V, 3)
            tile = lambda a: jnp.repeat(a, T, axis=0)
            mesh_bt = jax.tree.map(tile, mesh)
            m = motion_net(mesh_bt.verts, flow_bt, mesh_bt, train)  # (B*T,V,M)
            motion_all = jnp.transpose(
                l2_normalize(m).reshape(B, T, V, self.motion_dim), (0, 2, 1, 3))
        else:
            feats = []
            for t in range(T):
                flow_t = jax.lax.dynamic_slice_in_dim(input_flow, 3 * t, 3, axis=-1)
                m = motion_net(mesh.verts, flow_t, mesh, train)
                feats.append(l2_normalize(m))
            motion_all = jnp.stack(feats, axis=2)                   # (B,V,T,M)
        if self.aggr_method == "attn":
            s = self.width_scale
            aggr = TemporalAttn(
                num_heads=2, hidden_size=max(8, int(64 * s)),
                dim_feedforward=max(8, int(512 * s)),
                output_size=self.attn_output, axis_name=self.axis_name, name="aggregator",
            )(motion_all, mesh.vert_mask, train)
        elif self.aggr_method == "mean":
            aggr = jnp.mean(motion_all, axis=2)
        elif self.aggr_method == "max":
            aggr = jnp.max(motion_all, axis=2)
        else:
            raise NotImplementedError(self.aggr_method)
        return motion_all, l2_normalize(aggr)


class JointNetMotion(nn.Module):
    """Per-vertex displacement toward the nearest joint (rignet.py:70-100)."""

    num_keyframes: int = 5
    chn_output: int = 3
    aggr_method: str = "attn"
    motion_dim: int = 32
    width_scale: float = 1.0
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, input_flow, mesh: MeshBatch, train: bool = False):
        motion_all, motion_aggr = MotionAggregator(
            self.num_keyframes, self.motion_dim, self.aggr_method,
            width_scale=self.width_scale, axis_name=self.axis_name, name="motion",
        )(input_flow, mesh, train)
        shift = GCNRig(self.chn_output, width_scale=self.width_scale,
                       axis_name=self.axis_name, name="jointnet")(
            mesh.verts, motion_aggr, mesh, train
        )
        return motion_all, motion_aggr, shift


class MaskNetMotion(nn.Module):
    """Per-vertex joint-attention logit (rignet.py:103-133)."""

    num_keyframes: int = 5
    chn_output: int = 1
    aggr_method: str = "attn"
    motion_dim: int = 32
    width_scale: float = 1.0
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, input_flow, mesh: MeshBatch, train: bool = False):
        motion_all, motion_aggr = MotionAggregator(
            self.num_keyframes, self.motion_dim, self.aggr_method,
            width_scale=self.width_scale, axis_name=self.axis_name, name="motion",
        )(input_flow, mesh, train)
        logits = GCNRig(self.chn_output, width_scale=self.width_scale,
                        axis_name=self.axis_name, name="masknet")(
            mesh.verts, motion_aggr, mesh, train
        )
        return motion_all, motion_aggr, logits


def slice_skin_descriptor(samples: jax.Array, nearest_bone: int,
                          use_Dg: bool, use_Lf: bool) -> jax.Array:
    """Select per-bone descriptor columns from the packed (V, K*8) layout
    (6 endpoints + 1/geodesic + isleaf per bone; rignet.py:158-171)."""
    K = nearest_bone
    x = samples[..., : K * 8].reshape(samples.shape[:-1] + (K, 8))
    cols = [0, 1, 2, 3, 4, 5]
    if use_Dg:
        cols.append(6)
    if use_Lf:
        cols.append(7)
    return x[..., cols].reshape(samples.shape[:-1] + (K * len(cols),))


class SkinNetInner(nn.Module):
    """Skinning classifier over K nearest bones; the bone descriptor rides the
    GCUMotion position channel (rignet.py:136-182)."""

    nearest_bone: int = 5
    use_Dg: bool = False
    use_Lf: bool = False
    width_scale: float = 1.0
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, skin_input, motion, mesh: MeshBatch, train: bool = False):
        an = self.axis_name
        w = lambda c: max(8, int(c * self.width_scale))
        samples = slice_skin_descriptor(skin_input, self.nearest_bone, self.use_Dg, self.use_Lf)
        raw = jnp.concatenate([mesh.verts, samples], axis=-1)
        x1 = GCUMotion(w(256), dim_pos_feat=64, axis_name=an, name="gcu1")(raw, motion, mesh, train)
        xg = MLP([w(512), w(1024)], axis_name=an, name="multi_layer_transform2")(x1, mesh.vert_mask, train)
        xg = nbk.masked_max(xg, mesh.vert_mask, axis=1)
        x2 = GCUMotion(w(256), dim_pos_feat=64, axis_name=an, name="gcu2")(raw, x1, mesh, train)
        x3 = GCUMotion(w(256), dim_pos_feat=64, axis_name=an, name="gcu3")(raw, x2, mesh, train)
        xg = jnp.broadcast_to(xg[:, None, :], x3.shape[:2] + (xg.shape[-1],))
        x4 = jnp.concatenate([x3, xg], axis=-1)
        return MLPHead([w(1024), w(512)], self.nearest_bone, zero_init=True, axis_name=an,
                       name="cls_branch")(x4, mesh.vert_mask, train)


class SkinMotion(nn.Module):
    """Motion features + temporal attention + skinning classifier
    (rignet.py:185-205)."""

    nearest_bone: int = 5
    use_Dg: bool = False
    use_Lf: bool = False
    num_keyframes: int = 5
    motion_dim: int = 32
    width_scale: float = 1.0
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, skin_input, input_flow, mesh: MeshBatch, train: bool = False):
        motion_all, motion_aggr = MotionAggregator(
            self.num_keyframes, self.motion_dim, "attn",
            attn_output=self.motion_dim, width_scale=self.width_scale,
            axis_name=self.axis_name, name="motion",
        )(input_flow, mesh, train)
        logits = SkinNetInner(
            self.nearest_bone, self.use_Dg, self.use_Lf,
            width_scale=self.width_scale,
            axis_name=self.axis_name, name="skinNet",
        )(skin_input, motion_aggr, mesh, train)
        return motion_all, motion_aggr, logits
