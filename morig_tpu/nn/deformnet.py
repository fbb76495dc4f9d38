"""DeformNet — per-vertex deformation flow from mesh + target point cloud.

Re-design of the reference DeformNet (models/deformnet.py:13-104).  The
pipeline: correspondence embeddings from an internal CorrNet; visibility-
weighted "visible voting" of flow from the k most feature-similar points;
"invisible completion" interpolating flow for low-visibility vertices from
their feature-nearest *visible* vertices; a GCN refinement net producing the
final flow.

TPU re-design notes (SURVEY.md §7 hard part #3): the reference partitions
vertices into visible/invisible with boolean indexing (deformnet.py:57-95) —
a dynamic shape.  Here the partition is a *mask*: the second knn runs over all
vertices with invalid/invisible candidates masked out, and the two flow
estimates are blended with `where`.  Identical semantics, fully static.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from morig_tpu.core.batch import MeshBatch, PointBatch
from morig_tpu.kernels import neighbors as nbk
from morig_tpu.kernels.knn_fused import knn_batched
from morig_tpu.nn.corrnet import CorrNet
from morig_tpu.nn.gcu import GCUMotion
from morig_tpu.nn.mlp import MLP, MLPHead


class GCNDeform(nn.Module):
    """3×GCUMotion + global max + transform head (deformnet.py:13-31)."""

    chn_output: int = 3
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, pos, feature, mesh: MeshBatch, train: bool = False):
        an = self.axis_name
        x1 = GCUMotion(128, axis_name=an, name="gcu_1")(pos, feature, mesh, train)
        x2 = GCUMotion(256, axis_name=an, name="gcu_2")(pos, x1, mesh, train)
        x3 = GCUMotion(512, axis_name=an, name="gcu_3")(pos, x2, mesh, train)
        skips = jnp.concatenate([x1, x2, x3], axis=-1)
        x4 = MLP([1024], axis_name=an, name="mlp_glb")(skips, mesh.vert_mask, train)
        glb = nbk.masked_max(x4, mesh.vert_mask, axis=1)
        glb = jnp.broadcast_to(glb[:, None, :], x4.shape[:2] + (glb.shape[-1],))
        x5 = jnp.concatenate([glb, pos, feature, skips], axis=-1)
        return MLPHead([1024, 256], self.chn_output, zero_init=True, axis_name=an,
                       name="mlp_transform")(x5, mesh.vert_mask, train)


def minmax_normalize(x: jax.Array, mask: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Per-sample min-max normalization over valid entries (deformnet.py:43-46)."""
    mx = nbk.masked_max(x, mask, axis=1)[:, None]
    mn = -nbk.masked_max(-x, mask, axis=1)[:, None]
    return (x - mn) / jnp.maximum(mx - mn, eps)


class DeformNet(nn.Module):
    """Correspondence-driven flow prediction (deformnet.py:34-99).

    Returns (pred_flow (B,V,3), vtx_feature, pts_feature, pred_vismask
    (B,V) in [0,1], tau).
    """

    num_interp: int = 5
    tau_init: float = 0.07
    output_feature: int = 64
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        mesh: MeshBatch,
        points: PointBatch,
        train: bool = False,
        rng: Optional[jax.Array] = None,
        vtx_f: Optional[jax.Array] = None,
        mesh_only: bool = False,
    ):
        extractor = CorrNet(
            output_feature=self.output_feature, tau_init=self.tau_init,
            axis_name=self.axis_name, name="corr_extractor",
        )
        if mesh_only:
            # per-mesh embedding alone (reused across the keyframe axis)
            return extractor(mesh, points, train, True, rng, mesh_only=True)
        vtx_f, pts_f, vis_logits, tau = extractor(
            mesh, points, train, True, rng, vtx_f=vtx_f)
        vis = jax.nn.sigmoid(vis_logits[..., 0])                     # (B,V)
        vis = minmax_normalize(vis, mesh.vert_mask)

        # --- visible voting (deformnet.py:49-54) -------------------------
        # the point gather rides the kNN kernel (selection mask = one-hot);
        # the XLA fallback path gathers with a vmapped take
        k = self.num_interp
        idx, sim, nn_pts = knn_batched(
            vtx_f, pts_f, k, points.pts_mask,
            gather_values=points.pts)                # (B,V,k), (B,V,k,3)
        sim = jnp.where(sim > nbk.NEG / 2, sim, 0.0)  # drop padded candidates
        offsets = nn_pts - mesh.verts[:, :, None, :]
        w = sim * vis[:, :, None]                                    # (B,V,k)
        denom = jnp.sum(w, axis=-1, keepdims=True)
        flow_init = jnp.sum(offsets * w[..., None], axis=2) / jnp.where(
            jnp.abs(denom) > 1e-8, denom, 1e-8
        )

        # --- invisible completion (deformnet.py:56-95) -------------------
        visible = (vis >= 0.5) & mesh.vert_mask
        idx2, sim2, vis_flow = knn_batched(
            vtx_f, vtx_f, k, visible, gather_values=flow_init)   # (B,V,k,3)
        sim2 = jnp.where(sim2 > nbk.NEG / 2, sim2, 0.0)
        denom2 = jnp.sum(sim2, axis=-1, keepdims=True)
        invis_flow = jnp.sum(vis_flow * sim2[..., None], axis=2) / jnp.where(
            jnp.abs(denom2) > 1e-8, denom2, 1e-8
        )
        any_visible = jnp.any(visible, axis=1)[:, None, None]
        flow_init = jnp.where(
            visible[..., None] | ~any_visible, flow_init, invis_flow
        )

        # --- refinement (deformnet.py:97-98) -----------------------------
        l1_points = jnp.concatenate([flow_init, vis[..., None]], axis=-1)
        pred_flow = GCNDeform(3, axis_name=self.axis_name, name="completing")(
            mesh.verts, l1_points, mesh, train
        )
        return pred_flow, vtx_f, pts_f, vis, tau
