"""Graph convolution units over fixed-width neighbor tables.

Re-design of the reference's PyG message-passing convs (EdgeConv / GCU /
EdgeConvMotion / GCUMotion, models/basic_modules.py:142-219) for TPU: instead
of edge lists + scatter_max, each vertex row carries a (D,) neighbor index
table with a validity mask (slot 0 = self loop, matching the reference's
remove+add_self_loops on every call, basic_modules.py:149-150).  The message
MLP runs as one dense (B, V, D, C) batched matmul — MXU-shaped — followed by a
masked max over the degree axis.  This is the single hottest op of the whole
framework (every model stacks 3-4 of these over two edge sets).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from morig_tpu.kernels.neighbors import masked_max
from morig_tpu.nn.mlp import MLP


def gather_nbrs(x: jax.Array, nbr: jax.Array) -> jax.Array:
    """(B, V, C), (B, V, D) -> (B, V, D, C)."""
    return jax.vmap(lambda xb, nb: xb[nb])(x, nbr)


class EdgeConv(nn.Module):
    """DGCNN-style conv: max_j MLP([x_i, x_j - x_i]) over table neighbors.

    Reference: models/basic_modules.py:142-162 (message at :154).
    """

    mlp_channels: Sequence[int]
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, nbr, nbr_mask, train: bool = False):
        x_j = gather_nbrs(x, nbr)                       # (B,V,D,C)
        x_i = jnp.broadcast_to(x[:, :, None, :], x_j.shape)
        msg_in = jnp.concatenate([x_i, x_j - x_i], axis=-1)
        msg = MLP(self.mlp_channels, axis_name=self.axis_name, name="nn_pos")(
            msg_in, nbr_mask, train
        )
        return masked_max(msg, nbr_mask, axis=2)        # (B,V,C')


class GCU(nn.Module):
    """Two parallel EdgeConvs — topology + geodesic edges — concat + fuse MLP.

    Reference: models/basic_modules.py:165-177.
    """

    out_channels: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, mesh, train: bool = False):
        half = self.out_channels // 2
        x_tpl = EdgeConv([half, half], axis_name=self.axis_name, name="edge_conv_tpl")(
            x, mesh.tpl_nbr, mesh.tpl_mask, train
        )
        x_geo = EdgeConv([half, half], axis_name=self.axis_name, name="edge_conv_geo")(
            x, mesh.geo_nbr, mesh.geo_mask, train
        )
        x_out = jnp.concatenate([x_tpl, x_geo], axis=-1)
        return MLP([self.out_channels], axis_name=self.axis_name, name="mlp")(
            x_out, mesh.vert_mask, train
        )


class EdgeConvMotion(nn.Module):
    """EdgeConv with separate feature and position message MLPs.

    message = [nn_x([x_i, x_j - x_i]), nn_pos([pos_i, pos_j - pos_i])],
    max-aggregated jointly.  Reference: models/basic_modules.py:179-202.
    """

    x_channels: Sequence[int]
    pos_channels: Sequence[int]
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, pos, x, nbr, nbr_mask, train: bool = False):
        x_j = gather_nbrs(x, nbr)
        x_i = jnp.broadcast_to(x[:, :, None, :], x_j.shape)
        p_j = gather_nbrs(pos, nbr)
        p_i = jnp.broadcast_to(pos[:, :, None, :], p_j.shape)
        x_feat = MLP(self.x_channels, axis_name=self.axis_name, name="nn_x")(
            jnp.concatenate([x_i, x_j - x_i], axis=-1), nbr_mask, train
        )
        p_feat = MLP(self.pos_channels, axis_name=self.axis_name, name="nn_pos")(
            jnp.concatenate([p_i, p_j - p_i], axis=-1), nbr_mask, train
        )
        msg = jnp.concatenate([x_feat, p_feat], axis=-1)
        return masked_max(msg, nbr_mask, axis=2)


class GCUMotion(nn.Module):
    """Motion-conditioned GCU: tpl+geo EdgeConvMotion pair + fuse MLP.

    Reference: models/basic_modules.py:205-219.  `pos` may be raw 3-d
    positions or a larger per-vertex descriptor (SkinNet passes a
    3+K*6..8-dim descriptor as `pos`; models/rignet.py:152-154).
    """

    out_channels: int
    dim_pos_feat: int = 16
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, pos, x, mesh, train: bool = False):
        half = self.out_channels // 2
        pc = [self.dim_pos_feat, self.dim_pos_feat]
        x_tpl = EdgeConvMotion([half, half], pc, axis_name=self.axis_name, name="edge_conv_tpl")(
            pos, x, mesh.tpl_nbr, mesh.tpl_mask, train
        )
        x_geo = EdgeConvMotion([half, half], pc, axis_name=self.axis_name, name="edge_conv_geo")(
            pos, x, mesh.geo_nbr, mesh.geo_mask, train
        )
        x_out = jnp.concatenate([x_tpl, x_geo], axis=-1)
        return MLP([self.out_channels], axis_name=self.axis_name, name="mlp")(
            x_out, mesh.vert_mask, train
        )
