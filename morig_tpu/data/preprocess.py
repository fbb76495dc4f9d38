"""Preprocessing pipeline: raw mesh + rig -> training-ready artifacts.

Covers the reference's data_proc layer (common_ops.py get_tpl_edges /
get_geo_edges / normalize, gen_skin_data.py descriptor generation): one-ring
and geodesic-ball edge tables, mesh normalization, voxelization, GT attention
masks, and the K-nearest-bone skinning descriptors from volumetric geodesics.
Every step is cached per model (idempotent, skip-if-exists — the reference's
only fault-tolerance mechanism, SURVEY.md §5.3, kept deliberately).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from morig_tpu.geometry import skeleton as sk


def get_tpl_edges(faces: np.ndarray) -> np.ndarray:
    """Unique one-ring edges from triangles (common_ops.py:15-32); uses the
    C++ extractor when built."""
    from morig_tpu import native

    out = native.one_ring_edges(np.asarray(faces, np.int32))
    if out is not None:
        return out.astype(np.int64)
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [0, 2]]], 0)
    e = np.sort(e, axis=1)
    e = e[e[:, 0] != e[:, 1]]
    return np.unique(e, axis=0).astype(np.int64)


def get_geo_edges(surface_geo: np.ndarray, radius: float = 0.06,
                  max_nn: int = 15, seed: int = 0) -> np.ndarray:
    """Geodesic-ball edges: per vertex up to max_nn others within geodesic
    radius (common_ops.py:214-226; overflow subsampled at random)."""
    rng = np.random.default_rng(seed)
    n = len(surface_geo)
    g = surface_geo + 10.0 * np.eye(n)
    rows = []
    for i in range(n):
        ball = np.argwhere(g[i] <= radius).reshape(-1)
        if len(ball) > max_nn:
            ball = rng.choice(ball, max_nn, replace=False)
        if len(ball):
            rows.append(np.stack([np.full(len(ball), i), ball], axis=1))
    if not rows:
        return np.zeros((0, 2), np.int64)
    return np.concatenate(rows, axis=0).astype(np.int64)


def normalize_mesh(verts: np.ndarray):
    """Center on the footprint and scale the largest extent to 1
    (common_ops.py:123-138).  Returns (verts, pivot, scale)."""
    lo, hi = verts.min(0), verts.max(0)
    scale = 1.0 / max(hi - lo)
    pivot = np.array([(lo[0] + hi[0]) / 2, lo[1], (lo[2] + hi[2]) / 2])
    return (verts - pivot) * scale, pivot, scale


def gt_attention_mask(verts: np.ndarray, rig: sk.Rig, radius: float = 0.08) -> np.ndarray:
    """GT joint-attention mask: vertices within `radius` of any joint
    (stand-in for the precomputed *_attn.txt)."""
    d = np.linalg.norm(verts[:, None] - rig.pos[None], axis=-1).min(1)
    return (d < radius).astype(np.float32)


def volumetric_geodesic_bfs(verts: np.ndarray, vox, bones: np.ndarray) -> np.ndarray:
    """Voxel-BFS vertex→bone distance (common_ops.py:275-328 semantics,
    C++ BFS instead of the multiprocessing scipy dilation loop).  Returns
    (V, B) dilation-step distances (-1 where unreachable)."""
    from morig_tpu import native

    d = vox.dims
    vtx_vox = np.clip(np.round((verts - vox.translate) / vox.scale * d).astype(int), 0, d - 1)
    out = np.zeros((len(verts), len(bones)), np.float64)
    for b, bone in enumerate(bones):
        n = max(int(np.linalg.norm(bone[3:] - bone[:3]) / 0.01), 1)
        t = np.linspace(0, 1, n + 1)[:, None]
        samples = bone[None, :3] + t * (bone[3:] - bone[:3])[None]
        seeds = np.clip(np.round((samples - vox.translate) / vox.scale * d).astype(np.int32), 0, d - 1)
        dist = native.voxel_bfs(vox.data, seeds)
        if dist is None:
            raise RuntimeError("native voxel_bfs unavailable; build native/ first")
        out[:, b] = dist[vtx_vox[:, 0], vtx_vox[:, 1], vtx_vox[:, 2]]
    return out


def preprocess_model(
    verts: np.ndarray,
    faces: np.ndarray,
    rig: Optional[sk.Rig] = None,
    cache_dir: Optional[str] = None,
    name: str = "model",
    vox_dims: int = 88,
    geo_radius: float = 0.06,
    geo_max_nn: int = 15,
) -> dict:
    """Full preprocessing of one mesh: edges, geodesics, voxel grid, and (when
    a GT rig is present) attention + bone descriptors.  Cached as .npz/.binvox
    files under cache_dir."""
    from morig_tpu.geometry.geodesic import surface_geodesic
    from morig_tpu.geometry.voxel import Voxels, read_binvox, voxelize_mesh, write_binvox

    def cache(path, fn):
        if cache_dir is None:
            return fn()
        full = os.path.join(cache_dir, path)
        if os.path.exists(full):
            return np.load(full)["arr_0"] if full.endswith(".npz") else full
        os.makedirs(cache_dir, exist_ok=True)
        out = fn()
        if full.endswith(".npz"):
            np.savez_compressed(full, out)
        return out

    tpl = cache(f"{name}_tpl.npz", lambda: get_tpl_edges(faces))
    sgeo = cache(f"{name}_sgeo.npz", lambda: surface_geodesic(verts, faces))
    geo = cache(f"{name}_geo.npz", lambda: get_geo_edges(sgeo, geo_radius, geo_max_nn))

    vox_path = os.path.join(cache_dir, f"{name}.binvox") if cache_dir else None
    if vox_path and os.path.exists(vox_path):
        vox = read_binvox(vox_path)
    else:
        vox = voxelize_mesh(verts, faces, dims=vox_dims)
        if vox_path:
            write_binvox(vox, vox_path)

    out = dict(tpl_edges=tpl, geo_edges=geo, surface_geodesic=sgeo, vox=vox)
    if rig is not None:
        bones, bone_names, isleaf = sk.get_bones(rig)
        out["attn"] = gt_attention_mask(verts, rig)
        from morig_tpu.geometry.geodesic import vertex_bone_geodesic

        out["vertex_bone_geodesic"] = cache(
            f"{name}_vbgeo.npz",
            lambda: vertex_bone_geodesic(verts, bones, vox, surface_geo=sgeo),
        )
        out["bones"], out["bone_names"], out["bone_isleaf"] = bones, bone_names, isleaf
    return out


def rcm_vertex_order(num_verts: int, tpl_edges: np.ndarray,
                     geo_edges: np.ndarray) -> np.ndarray:
    """Bandwidth-reducing vertex order (reverse Cuthill-McKee) over the union
    of both edge sets.  Meshes reordered this way satisfy the windowed fused
    edge kernel's locality precondition (kernels/edge_fused.py) — neighbor
    index distance is bounded by the graph bandwidth instead of V.

    Returns `order` such that new_verts = verts[order]."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    e = np.concatenate([tpl_edges, geo_edges], axis=0).astype(np.int64)
    e = e[(e[:, 0] < num_verts) & (e[:, 1] < num_verts)]
    data = np.ones(len(e) * 2)
    rows = np.concatenate([e[:, 0], e[:, 1]])
    cols = np.concatenate([e[:, 1], e[:, 0]])
    A = coo_matrix((data, (rows, cols)), shape=(num_verts, num_verts)).tocsr()
    return np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True))


def apply_vertex_order(order: np.ndarray, verts: np.ndarray,
                       tpl_edges: np.ndarray, geo_edges: np.ndarray,
                       *per_vertex_arrays: np.ndarray):
    """Permute a mesh (and any per-vertex arrays) into `order`; edge indices
    are remapped.  Returns (verts, tpl_edges, geo_edges, *arrays)."""
    inv = np.empty_like(order)
    inv[order] = np.arange(len(order))
    out_tpl = inv[tpl_edges.astype(np.int64)]
    out_geo = inv[geo_edges.astype(np.int64)]
    outs = tuple(a[order] for a in per_vertex_arrays)
    return (verts[order], out_tpl, out_geo) + outs
