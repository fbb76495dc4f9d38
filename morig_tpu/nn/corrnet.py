"""CorrNet — mesh/point-cloud correspondence embeddings + visibility head.

Re-design of the reference CorrNet (models/corrnet.py:10-82) for padded
batches: a 4-stage GCU mesh encoder with multi-scale skip concat and masked
global max pool; a PointNet++ encoder/decoder point branch; both projected to
L2-normalized 64-d embeddings; plus a visibility head fed by each vertex's
cosine-nearest point feature.  The learnable infoNCE temperature lives here
(reference corrnet.py:15).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from morig_tpu.core.batch import MeshBatch, PointBatch
from morig_tpu.kernels import neighbors as nbk
from morig_tpu.kernels.knn_fused import knn_batched
from morig_tpu.nn.gcu import GCU
from morig_tpu.nn.mlp import MLP, MLPHead
from morig_tpu.nn.pointnet import FPModule, GlobalSAModule, SAModule


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    return x / jnp.sqrt(jnp.maximum(jnp.sum(x * x, axis=axis, keepdims=True), eps))


def random_starts(key: Optional[jax.Array], mask: jax.Array) -> jax.Array:
    """Pick a valid random FPS start per sample; deterministic 0 when key=None.

    Mirrors the reference's random_start flag threaded through SAModule
    (basic_modules.py:74-75): random in training, fixed for eval.
    """
    B = mask.shape[0]
    if key is None:
        return jnp.zeros((B,), jnp.int32)
    logits = jnp.where(mask, 0.0, -1e30)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


class MeshEncoder(nn.Module):
    """4×GCU + skip concat + global max (corrnet.py:17-22,39-48)."""

    out_features: int = 64
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, mesh: MeshBatch, train: bool = False) -> jax.Array:
        an = self.axis_name
        x1 = GCU(32, axis_name=an, name="vtx_gcu_1")(mesh.verts, mesh, train)
        x2 = GCU(64, axis_name=an, name="vtx_gcu_2")(x1, mesh, train)
        x3 = GCU(256, axis_name=an, name="vtx_gcu_3")(x2, mesh, train)
        x4 = GCU(512, axis_name=an, name="vtx_gcu_4")(x3, mesh, train)
        skips = jnp.concatenate([x1, x2, x3, x4], axis=-1)           # (B,V,864)
        x5 = MLP([1024], axis_name=an, name="vtx_mlp_glb")(skips, mesh.vert_mask, train)
        glb = nbk.masked_max(x5, mesh.vert_mask, axis=1)             # (B,1024)
        glb = jnp.broadcast_to(glb[:, None, :], (x5.shape[0], x5.shape[1], glb.shape[-1]))
        x6 = jnp.concatenate([glb, mesh.verts, skips], axis=-1)
        out = MLPHead([1024, 256], self.out_features, axis_name=an, name="vtx_mlp")(
            x6, mesh.vert_mask, train
        )
        return l2_normalize(out)


class PointEncoder(nn.Module):
    """PointNet++ SA×3 + GlobalSA + FP×4 (corrnet.py:24-33,50-60).

    Static downsample sizes derive from the fixed P=1024 cloud and the
    reference ratios (0.5, 0.25, 0.25) -> 512/128/32.
    """

    out_features: int = 64
    num_points: int = 1024
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, points: PointBatch, train: bool = False,
                 rng: Optional[jax.Array] = None) -> jax.Array:
        an = self.axis_name
        P = points.pts.shape[1]
        k1, k2, k3 = (jax.random.split(rng, 3) if rng is not None else (None, None, None))
        pos0, m0 = points.pts, points.pts_mask

        sa1 = SAModule(P // 2, 0.12, [32, 32, 64], 64, axis_name=an, name="sa1")
        x1, pos1, m1 = sa1(None, pos0, m0, train, random_starts(k1, m0))
        sa2 = SAModule(P // 8, 0.25, [64, 64, 128], 64, axis_name=an, name="sa2")
        x2, pos2, m2 = sa2(x1, pos1, m1, train, random_starts(k2, m1))
        sa3 = SAModule(P // 32, 0.5, [256, 256, 256], 64, axis_name=an, name="sa3")
        x3, pos3, m3 = sa3(x2, pos2, m2, train, random_starts(k3, m2))
        xg = GlobalSAModule([256, 256, 512], axis_name=an, name="sa4")(x3, pos3, m3, train)

        f4, _, _ = FPModule(1, [256, 256], axis_name=an, name="fp4")(xg, None, None, x3, pos3, m3, train)
        f3, _, _ = FPModule(3, [256, 128], axis_name=an, name="fp3")(f4, pos3, m3, x2, pos2, m2, train)
        f2, _, _ = FPModule(3, [128, 64], axis_name=an, name="fp2")(f3, pos2, m2, x1, pos1, m1, train)
        f1, _, _ = FPModule(3, [64, 64], axis_name=an, name="fp1")(f2, pos1, m1, None, pos0, m0, train)
        out = MLPHead([64], self.out_features, axis_name=an, name="pts_mlp")(f1, m0, train)
        return l2_normalize(out)


class CorrNet(nn.Module):
    """Joint mesh/point embedding net with visibility head.

    Returns (vtx_feature (B,V,C), pts_feature (B,P,C), vismask_logits
    (B,V,1) | None, temperature scalar).
    """

    output_feature: int = 64
    tau_init: float = 0.07
    num_points: int = 1024
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        mesh: MeshBatch,
        points: PointBatch,
        train: bool = False,
        train_vismask: bool = True,
        rng: Optional[jax.Array] = None,
        vtx_f: Optional[jax.Array] = None,
        mesh_only: bool = False,
    ):
        """`mesh_only=True` returns just the mesh embedding; `vtx_f` skips the
        mesh branch and reuses a precomputed embedding.  The mesh embedding
        depends only on the mesh, so a (B*T)-frame batch over B distinct
        meshes can compute it B times instead of B*T (the flow program's
        keyframe axis repeats each mesh T times unchanged)."""
        if mesh_only:
            return MeshEncoder(self.output_feature, axis_name=self.axis_name,
                               name="mesh_enc")(mesh, train)
        tau = self.param("temperature", lambda k: jnp.asarray(self.tau_init, jnp.float32))
        if vtx_f is None:
            vtx_f = MeshEncoder(self.output_feature, axis_name=self.axis_name,
                                name="mesh_enc")(mesh, train)
        pts_f = PointEncoder(self.output_feature, self.num_points, axis_name=self.axis_name, name="pts_enc")(
            points, train, rng
        )
        vis_logits = None
        if train_vismask:
            # cosine 1-NN point per vertex; the selection is non-
            # differentiable (argmax), the gathered feature and similarity
            # stay differentiable (corrnet.py:62-74).  knn_batched(k=1)
            # avoids materializing the (B,V,P) similarity in HBM on the
            # fused path, and the feature gather rides the kernel's
            # selection mask (gather_values) instead of an XLA row gather.
            _, _, nn_feat = knn_batched(vtx_f, pts_f, 1, points.pts_mask,
                                        gather_values=pts_f)
            nn_feat = nn_feat[:, :, 0, :]                             # (B,V,C)
            nn_sim = jnp.sum(vtx_f * nn_feat, axis=-1, keepdims=True)
            combined = jnp.concatenate([vtx_f, nn_feat, nn_sim], axis=-1)
            vis_logits = MLPHead([256, 128, 64], 1, zero_init=True,
                                 axis_name=self.axis_name, name="lin_vismask")(
                combined, mesh.vert_mask, train
            )
        return vtx_f, pts_f, vis_logits, tau
