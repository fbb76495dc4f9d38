"""Padded-batch data structures.

The reference batches variable-size graphs by concatenation plus a batch
vector and scatter ops (PyG collation, datasets/dataset_pose.py:8-25).  On TPU
we use dense padded tensors with validity masks instead: every array in a
batch has a static shape, edges are stored as fixed-width neighbor tables, and
all reductions are masked.  This is the single most important layout decision
for XLA: it makes every op a dense, tileable tensor op.

Neighbor tables: the reference stores edge lists `tpl_edge_index` /
`geo_edge_index` with self-loops (dataset_pose.py:90-91).  One-ring degree is
bounded in practice and geodesic neighborhoods are capped at 15 neighbors
(data_proc/common_ops.py:221), so a (V, D) index table with a mask is lossless
for geo edges and near-lossless for tpl edges (overflow neighbors are dropped,
rarest-first).  Slot 0 always holds the self-loop.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _field(**kw):
    return dataclasses.field(**kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MeshBatch:
    """A batch of padded meshes with two neighbor tables.

    Shapes (B = batch, V = padded vertex count, D* = max degree):
      verts:     (B, V, 3) float   vertex positions (source frame)
      vert_mask: (B, V)    bool    validity
      tpl_nbr:   (B, V, Dt) int32  one-ring neighbor indices (slot 0 = self)
      tpl_mask:  (B, V, Dt) bool
      geo_nbr:   (B, V, Dg) int32  geodesic-ball neighbor indices (slot 0 = self)
      geo_mask:  (B, V, Dg) bool
    """

    verts: jax.Array
    vert_mask: jax.Array
    tpl_nbr: jax.Array
    tpl_mask: jax.Array
    geo_nbr: jax.Array
    geo_mask: jax.Array

    @property
    def batch_size(self) -> int:
        return self.verts.shape[0]

    @property
    def num_verts(self) -> int:
        return self.verts.shape[1]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PointBatch:
    """A batch of (possibly partial) point clouds.

    pts:      (B, P, 3) float
    pts_mask: (B, P)    bool
    """

    pts: jax.Array
    pts_mask: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CorrBatch:
    """Padded correspondence index pairs for one (src,tar) frame pair.

    v2p / p2v: (B, N, 2) int32 — (anchor index, positive index)
    *_mask:    (B, N) bool
    """

    v2p: jax.Array
    v2p_mask: jax.Array
    p2v: jax.Array
    p2v_mask: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PoseSample:
    """One training sample of the pose datasets: mesh + point cloud + supervision.

    Mirrors the per-batch fields sliced in the reference training loop
    (train_corr_pose.py:47-57) but in dense padded form.
    """

    mesh: MeshBatch
    points: PointBatch
    corr: CorrBatch
    vismask: jax.Array          # (B, V) float — GT visibility of each vertex
    gt_flow: jax.Array          # (B, V, 3) float — vtx_tar - vtx_src


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RigSample:
    """One sample of the rig/skin datasets (datasets/dataset_rig.py:78-138)."""

    mesh: MeshBatch
    joints: jax.Array           # (B, J, 3)
    joints_mask: jax.Array      # (B, J)
    offsets: jax.Array          # (B, V, 3) vertex → nearest-joint offset
    attn_mask: jax.Array        # (B, V) GT attention mask
    gt_skin: jax.Array          # (B, V, Jmax) padded skin matrix
    gt_flow: jax.Array          # (B, V, 3*T) keyframe flows
    pred_flow: jax.Array        # (B, V, 3*T) deform-stage flows
    skin_input: jax.Array       # (B, V, K*8) nearest-bone descriptors
    skin_label: jax.Array       # (B, V, K) soft skin labels over K nearest bones
    skin_nn: jax.Array          # (B, V, K) nearest-bone ids
    loss_mask: jax.Array        # (B, V, K) bone-slot validity


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SkelSample:
    """One sample for skeleton-connectivity training (BoneNet/RootNet).

    Mirrors the ad-hoc Data assembled in evaluate/joint2rig.py:232-264, padded:
      joints:     (B, J, 3), joints_mask (B, J)
      pairs:      (B, P, 2) int candidate joint pairs, pair_mask (B, P)
      pair_attr:  (B, P, 2)  [distance, inside-volume proportion]
      pair_label: (B, P)     GT adjacency
      root_idx:   (B,)       GT root joint index
    """

    mesh: MeshBatch
    joints: jax.Array
    joints_mask: jax.Array
    pairs: jax.Array
    pair_mask: jax.Array
    pair_attr: jax.Array
    pair_label: jax.Array
    root_idx: jax.Array


# ---------------------------------------------------------------------------
# Host-side builders (numpy)
# ---------------------------------------------------------------------------

def bucket_size(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= n (last bucket if none fits)."""
    for b in buckets:
        if n <= b:
            return b
    return int(buckets[-1])


def edges_to_neighbor_table(
    edges: np.ndarray, num_verts: int, max_degree: int, pad_to: int
) -> tuple[np.ndarray, np.ndarray]:
    """Convert an (E, 2) undirected edge list into a (pad_to, max_degree) table.

    Slot 0 of every row is the self-loop (matching the reference's
    add_self_loops, dataset_pose.py:90-91).  Invalid slots point at the row's
    own vertex so gathers stay in-bounds; the mask excludes them from
    aggregation.  Directed interpretation: row v aggregates from its listed
    neighbors (x_j), like PyG's flow='source_to_target' with edge (j, i).
    """
    nbr = np.tile(np.arange(pad_to, dtype=np.int32)[:, None], (1, max_degree))
    mask = np.zeros((pad_to, max_degree), dtype=bool)
    mask[:num_verts, 0] = True  # self loop
    fill = np.ones(pad_to, dtype=np.int32)  # next free slot per row
    if edges.size:
        edges = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
        # make undirected: both directions (reference edge files store pairs
        # once per direction already in most cases; dedupe below)
        both = np.concatenate([edges, edges[:, ::-1]], axis=0)
        both = both[both[:, 0] != both[:, 1]]  # self loops handled separately
        both = np.unique(both, axis=0)
        for a, b in both:
            if a < num_verts and b < num_verts and fill[a] < max_degree:
                nbr[a, fill[a]] = b
                mask[a, fill[a]] = True
                fill[a] += 1
    return nbr, mask


def pad_to(arr: np.ndarray, n: int, axis: int = 0, value=0.0) -> np.ndarray:
    """Pad `arr` with `value` along `axis` up to length n."""
    cur = arr.shape[axis]
    if cur >= n:
        sl = [slice(None)] * arr.ndim
        sl[axis] = slice(0, n)
        return arr[tuple(sl)]
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, n - cur)
    return np.pad(arr, widths, constant_values=value)


def build_mesh(
    verts: np.ndarray,
    tpl_edges: np.ndarray,
    geo_edges: np.ndarray,
    pad_verts: int,
    tpl_max_degree: int = 16,
    geo_max_degree: int = 16,
) -> dict[str, np.ndarray]:
    """Build the arrays of a single (unbatched) MeshBatch entry."""
    v = np.asarray(verts, dtype=np.float32)
    nv = len(v)
    tpl_nbr, tpl_mask = edges_to_neighbor_table(tpl_edges, nv, tpl_max_degree, pad_verts)
    geo_nbr, geo_mask = edges_to_neighbor_table(geo_edges, nv, geo_max_degree, pad_verts)
    vert_mask = np.zeros(pad_verts, dtype=bool)
    vert_mask[:nv] = True
    return dict(
        verts=pad_to(v, pad_verts),
        vert_mask=vert_mask,
        tpl_nbr=tpl_nbr,
        tpl_mask=tpl_mask,
        geo_nbr=geo_nbr,
        geo_mask=geo_mask,
    )


def stack_meshes(entries: Sequence[dict[str, np.ndarray]]) -> MeshBatch:
    """Stack per-mesh dicts (all padded to the same V) into a MeshBatch."""
    stacked = {k: jnp.asarray(np.stack([e[k] for e in entries])) for k in entries[0]}
    return MeshBatch(**stacked)


def single(tree: Any) -> Any:
    """Add a leading batch dim of 1 to every leaf of a pytree of arrays."""
    return jax.tree_util.tree_map(lambda x: jnp.asarray(x)[None], tree)
