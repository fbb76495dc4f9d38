"""Vertex↔bone distances, visibility, and skin descriptor packing.

Replaces the reference's pts2line (joint2rig.py:41-68), the trimesh ray-cast
visibility (joint2rig.py:71-94), and the 5-nearest-bone descriptor assembly
(joint2rig.py:413-440).  Distances and line-of-sight run on device as one
dense (V, B) program; only the geodesic fallback for occluded pairs touches
the host (geometry/geodesic.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def point_to_segment_dist(pts: jax.Array, bones: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Distances from points to bone segments.

    pts (N, 3), bones (B, 6) [start | end] -> (dist (N, B), foot (N, B, 3))
    where foot is the closest point on each segment (the ray origin for
    visibility checks).
    """
    a, b = bones[:, :3], bones[:, 3:]
    ab = b - a                                             # (B,3)
    l2 = jnp.sum(ab * ab, axis=-1)                         # (B,)
    ap = pts[:, None, :] - a[None, :, :]                   # (N,B,3)
    t = jnp.sum(ap * ab[None], axis=-1) / jnp.maximum(l2[None], 1e-8)
    t = jnp.where(l2[None] < 1e-8, 0.0, jnp.clip(t, 0.0, 1.0))
    foot = a[None] + t[..., None] * ab[None]               # (N,B,3)
    dist = jnp.linalg.norm(pts[:, None, :] - foot, axis=-1)
    return dist, foot


def vertex_bone_visibility(
    verts: jax.Array, bones: jax.Array,
    grid: jax.Array, translate: jax.Array, scale: jax.Array,
    num_samples: int = 32, inside_threshold: float = 0.95,
) -> tuple[jax.Array, jax.Array]:
    """Voxel line-of-sight visibility between each vertex and each bone.

    The reference casts rays against the triangle mesh (joint2rig.py:71-94);
    here a (vertex, bone-foot) segment is visible when ≥`inside_threshold` of
    its uniform samples lie inside the 88³ occupancy grid — the same voxel
    criterion the reference itself uses for bones (mst_utils.py:269-291),
    extended to visibility (SURVEY.md §7 design move 5).  Returns
    (visible (V,B) bool, dist (V,B)).
    """
    from morig_tpu.geometry.voxel import segment_inside_fraction

    dist, foot = point_to_segment_dist(verts, bones)
    V, B = dist.shape
    starts = jnp.broadcast_to(verts[:, None, :], (V, B, 3)).reshape(-1, 3)
    ends = foot.reshape(-1, 3)
    frac = segment_inside_fraction(starts, ends, grid, translate, scale, num_samples)
    visible = (frac.reshape(V, B) >= inside_threshold)
    return visible, dist


def prune_far_visible(visible: np.ndarray, dist: np.ndarray,
                      percentile: float = 15.0, factor: float = 1.3) -> np.ndarray:
    """Drop 'visible' pairs much farther than the bone's typical visible
    distance (joint2rig.py:333-338)."""
    out = visible.copy()
    for b in range(visible.shape[1]):
        vis_d = dist[visible[:, b], b]
        if len(vis_d) == 0:
            continue
        thr = np.percentile(vis_d, percentile)
        out[dist[:, b] > factor * thr, b] = False
    return out


def pack_skin_descriptors(
    geo_dist: np.ndarray,       # (V, B) volumetric-geodesic vertex→bone distance
    bones: np.ndarray,          # (B, 6)
    bone_isleaf: np.ndarray,    # (B,)
    num_nearest: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-vertex K-nearest-bone descriptors in the packed (V, K*8) layout
    consumed by SkinNet: [6 endpoint coords, 1/(dist+1e-10), isleaf] per bone
    (joint2rig.py:413-440).  Returns (skin_input (V,K*8), skin_nn (V,K) bone
    ids, loss_mask (V,K) — 0 where fewer than K bones exist)."""
    V, B = geo_dist.shape
    K = num_nearest
    order = np.argsort(geo_dist, axis=1)
    k_eff = min(K, B)
    nn = order[:, :k_eff]
    if k_eff < K:
        nn = np.concatenate([nn, np.repeat(order[:, :1], K - k_eff, axis=1)], axis=1)
    mask = np.zeros((V, K), np.int32)
    mask[:, :k_eff] = 1
    d = np.take_along_axis(geo_dist, nn, axis=1)
    desc = np.concatenate(
        [
            bones[nn].reshape(V, K, 6),
            (1.0 / (d + 1e-10))[..., None],
            bone_isleaf[nn].astype(np.float32)[..., None],
        ],
        axis=-1,
    ).reshape(V, K * 8)
    return desc.astype(np.float32), nn.astype(np.int32), mask


def scatter_skin_full(skin_probs: np.ndarray, skin_nn: np.ndarray,
                      loss_mask: np.ndarray, num_bones: int) -> np.ndarray:
    """Expand per-vertex K-bone probabilities to the full bone set
    (joint2rig.py:453-457)."""
    V, K = skin_probs.shape
    full = np.zeros((V, num_bones), np.float64)
    rows = np.repeat(np.arange(V), K)
    np.add.at(full, (rows, skin_nn.reshape(-1)), (skin_probs * loss_mask).reshape(-1))
    return full
