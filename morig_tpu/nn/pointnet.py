"""PointNet++ set-abstraction / feature-propagation modules, padded-batch form.

Re-design of the reference's SAModule / GlobalSAModule / FPModule
(models/basic_modules.py:66-138) which rely on torch-cluster fps/radius CUDA
kernels and PyG PointConv.  Here: fps is a fixed-K scan, radius grouping is a
tiled distance matmul + top-k, and PointConv is a dense (B, K, M, C) MLP +
masked max — all static shapes, vmapped over the batch.

Each SA stage takes a *static* output size `num_out` (the reference uses
ratios over a fixed P=1024 cloud, so K is static anyway: 512/128/32).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from morig_tpu.kernels import neighbors as nbk
from morig_tpu.kernels.gather_fused import gather_rows
from morig_tpu.nn.mlp import MLP


class SAModule(nn.Module):
    """Set abstraction: FPS downsample + radius neighborhood + PointConv.

    Reference: models/basic_modules.py:66-86.  PointConv message is
    MLP([x_j, pos_j - pos_i]) (or just relative pos when x is None), with max
    aggregation — PyG PointNetConv semantics used by the reference.
    """

    num_out: int
    radius: float
    mlp_channels: Sequence[int]
    max_neighbors: int = 64
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, pos, mask, train: bool = False, start=None):
        B = pos.shape[0]
        if start is None:
            start = jnp.zeros((B,), jnp.int32)
        idx = jax.vmap(lambda p, m, s: nbk.fps(p, self.num_out, m, s))(pos, mask, start)
        new_pos = jnp.take_along_axis(pos, idx[..., None], axis=1)          # (B,K,3)
        new_mask = jnp.take_along_axis(mask, idx, axis=1)

        grp_idx, grp_valid = jax.vmap(
            lambda c, p, m: nbk.radius_group(c, p, self.radius, self.max_neighbors, m)
        )(new_pos, pos, mask)                                               # (B,K,M)

        # one fused gather for [x_j | p_j] (gather_fused kernel at inference;
        # XLA per-row gather in training)
        if x is None:
            p_j = gather_rows(pos, grp_idx, train)                          # (B,K,M,3)
            feat_in = p_j - new_pos[:, :, None, :]
        else:
            g = gather_rows(jnp.concatenate([x, pos], axis=-1), grp_idx, train)
            C = x.shape[-1]
            rel = g[..., C:] - new_pos[:, :, None, :]
            feat_in = jnp.concatenate([g[..., :C], rel], axis=-1)
        grp_valid = grp_valid & new_mask[:, :, None]
        msg = MLP(self.mlp_channels, axis_name=self.axis_name, name="conv")(
            feat_in, grp_valid, train
        )
        new_x = nbk.masked_max(msg, grp_valid, axis=2)                      # (B,K,C')
        return new_x, new_pos, new_mask


class GlobalSAModule(nn.Module):
    """Global max-pool abstraction (models/basic_modules.py:115-125)."""

    mlp_channels: Sequence[int]
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, pos, mask, train: bool = False):
        feat = MLP(self.mlp_channels, axis_name=self.axis_name, name="nn")(
            jnp.concatenate([x, pos], axis=-1), mask, train
        )
        return nbk.masked_max(feat, mask, axis=1)                           # (B,C)


class FPModule(nn.Module):
    """Feature propagation: kNN-interpolate up + skip concat + MLP.

    Reference: models/basic_modules.py:127-138.
    """

    k: int
    mlp_channels: Sequence[int]
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, pos, mask, x_skip, pos_skip, mask_skip, train: bool = False):
        if x.ndim == 2:  # global feature (B, C): broadcast to every target
            up = jnp.broadcast_to(x[:, None, :], (x.shape[0], pos_skip.shape[1], x.shape[-1]))
        else:
            # knn_interpolate semantics, with the feature gather routed
            # through the fused one-hot-matmul kernel at inference
            idx, negd2 = jax.vmap(
                lambda ps, pt, m: nbk.knn(pt, ps, self.k, cand_mask=m,
                                          cosine=False)
            )(pos, pos_skip, mask)                            # (B, Ntar, k)
            w = 1.0 / (jnp.maximum(-negd2, 0.0) + 1e-8)
            w = w / jnp.sum(w, axis=-1, keepdims=True)
            gathered = gather_rows(x, idx, train)             # (B, Ntar, k, C)
            up = jnp.sum(gathered * w[..., None], axis=2)
        if x_skip is not None:
            up = jnp.concatenate([up, x_skip], axis=-1)
        out = MLP(self.mlp_channels, axis_name=self.axis_name, name="nn")(
            up, mask_skip, train
        )
        return out, pos_skip, mask_skip


class SAModuleMSG(nn.Module):
    """Multi-scale-grouping set abstraction (models/basic_modules.py:88-113,
    unused by the shipped reference models but part of the surface): one FPS
    downsample shared across several (radius, mlp) scales, features
    concatenated."""

    num_out: int
    radii: Sequence[float]
    mlp_channels_list: Sequence[Sequence[int]]
    max_neighbors_list: Sequence[int]
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, pos, mask, train: bool = False, start=None):
        B = pos.shape[0]
        if start is None:
            start = jnp.zeros((B,), jnp.int32)
        idx = jax.vmap(lambda p, m, s: nbk.fps(p, self.num_out, m, s))(pos, mask, start)
        new_pos = jnp.take_along_axis(pos, idx[..., None], axis=1)
        new_mask = jnp.take_along_axis(mask, idx, axis=1)
        feats = []
        for s, (r, chans, max_nn) in enumerate(
            zip(self.radii, self.mlp_channels_list, self.max_neighbors_list)
        ):
            grp_idx, grp_valid = jax.vmap(
                lambda c, p, m, r=r, max_nn=max_nn: nbk.radius_group(c, p, r, max_nn, m)
            )(new_pos, pos, mask)
            if x is None:
                p_j = gather_rows(pos, grp_idx, train)
                feat_in = p_j - new_pos[:, :, None, :]
            else:
                g = gather_rows(jnp.concatenate([x, pos], axis=-1),
                                grp_idx, train)
                C = x.shape[-1]
                rel = g[..., C:] - new_pos[:, :, None, :]
                feat_in = jnp.concatenate([g[..., :C], rel], axis=-1)
            grp_valid = grp_valid & new_mask[:, :, None]
            msg = MLP(list(chans), axis_name=self.axis_name, name=f"conv_{s}")(
                feat_in, grp_valid, train
            )
            feats.append(nbk.masked_max(msg, grp_valid, axis=2))
        return jnp.concatenate(feats, axis=-1), new_pos, new_mask
