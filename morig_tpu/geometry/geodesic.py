"""Geodesic distances: surface geodesics and vertex→bone volumetric geodesics.

Replaces data_proc/common_ops.py:175-226 (surface geodesic via open3d Poisson
sampling + scipy dijkstra) and evaluate/joint2rig.py:307-360 (volumetric
vertex→bone geodesic via trimesh ray casting).  open3d/trimesh are not
dependencies here: blue-noise-ish samples come from farthest-point sampling,
normals from area-weighted face normals, visibility from the voxel
line-of-sight test (geometry/bones.py).  Dijkstra stays on host (scipy); the
dense distance/visibility arithmetic runs on device.
"""
from __future__ import annotations

import numpy as np
from scipy.sparse import lil_matrix
from scipy.sparse.csgraph import dijkstra


def vertex_normals(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    fn = np.cross(verts[faces[:, 1]] - verts[faces[:, 0]],
                  verts[faces[:, 2]] - verts[faces[:, 0]])
    vn = np.zeros_like(verts)
    for k in range(3):
        np.add.at(vn, faces[:, k], fn)
    n = np.linalg.norm(vn, axis=1, keepdims=True)
    return vn / np.maximum(n, 1e-12)


def fps_numpy(pts: np.ndarray, k: int, start: int = 0) -> np.ndarray:
    idx = np.zeros(k, int)
    idx[0] = start
    d = ((pts - pts[start]) ** 2).sum(1)
    for i in range(1, k):
        idx[i] = int(np.argmax(d))
        d = np.minimum(d, ((pts - pts[idx[i]]) ** 2).sum(1))
    return idx


def surface_geodesic(
    verts: np.ndarray,
    faces: np.ndarray,
    num_samples: int = 4000,
    knn: int = 5,
    normal_cos_min: float = -0.5,
    inf_offset: float = 8.0,
) -> np.ndarray:
    """Vertex-level surface geodesic matrix (common_ops.py:175-211 recipe):
    sample the surface, connect each sample to its k nearest neighbors whose
    normals are not opposing, run Dijkstra, replace disconnected pairs with
    euclidean + offset, then pull back to vertices via nearest sample."""
    rng = np.random.default_rng(0)
    from morig_tpu.data.synthetic import sample_surface

    n_dense = max(num_samples * 4, 2000)
    dense, fid, _ = sample_surface(verts, faces, n_dense, rng)
    num_samples = min(num_samples, len(dense))
    sel = fps_numpy(dense, num_samples)
    pts = dense[sel]
    fn = np.cross(verts[faces[:, 1]] - verts[faces[:, 0]],
                  verts[faces[:, 2]] - verts[faces[:, 0]])
    fn = fn / np.maximum(np.linalg.norm(fn, axis=1, keepdims=True), 1e-12)
    normals = fn[fid[sel]]

    from morig_tpu import native

    dist = native.geodesic_all_pairs(pts, normals, knn, normal_cos_min, inf_offset)
    if dist is None:  # scipy fallback
        N = len(pts)
        d = np.sqrt(np.maximum(((pts[None] - pts[:, None]) ** 2).sum(-1), 0.0))
        nn = np.argsort(d, axis=1)
        conn = lil_matrix((N, N), dtype=np.float32)
        for p in range(N):
            nbrs = nn[p, 1 : knn + 1]
            cos = normals[nbrs] @ normals[p]
            good = nbrs[cos > normal_cos_min]
            conn[p, good] = d[p, good]
        dist = dijkstra(conn.tocsr(), directed=False)
        bad = ~np.isfinite(dist)
        if bad.any():
            dist[bad] = inf_offset + d[bad]

    v2s = np.argmin(
        np.sqrt(((verts[:, None] - pts[None]) ** 2).sum(-1)), axis=1
    )
    return dist[v2s][:, v2s].astype(np.float32)


def vertex_bone_geodesic(
    verts: np.ndarray,
    bones: np.ndarray,
    vox,
    surface_geo: np.ndarray | None = None,
    faces: np.ndarray | None = None,
    inside_threshold: float = 0.90,
    inf_offset: float = 8.0,
) -> np.ndarray:
    """Approximate volumetric geodesic distance from every vertex to every
    bone (joint2rig.py:307-360 semantics, voxel LOS instead of ray casting):

      visible pairs   -> straight point-to-segment distance
      occluded pairs  -> surface geodesic to the nearest visible vertex plus
                         that vertex's bone distance
    """
    import jax.numpy as jnp

    from morig_tpu.geometry.bones import prune_far_visible, vertex_bone_visibility
    from morig_tpu.geometry.voxel import vox_to_device

    grid, tr, sc = vox_to_device(vox)
    visible, dist = vertex_bone_visibility(
        jnp.asarray(verts, jnp.float32), jnp.asarray(bones, jnp.float32),
        grid, tr, sc, inside_threshold=inside_threshold,
    )
    visible = np.asarray(visible)
    dist = np.asarray(dist).astype(np.float64)
    visible = prune_far_visible(visible, dist)

    if surface_geo is None:
        assert faces is not None, "need faces to compute surface geodesics"
        surface_geo = surface_geodesic(verts, faces)

    out = np.where(visible, dist, 0.0)
    for b in range(bones.shape[0]):
        vis = np.argwhere(visible[:, b]).reshape(-1)
        occ = np.argwhere(~visible[:, b]).reshape(-1)
        if len(vis) == 0:
            out[:, b] = dist[:, b]
            continue
        if len(occ) == 0:
            continue
        sg = surface_geo[np.ix_(occ, vis)]
        nn = np.argmin(sg, axis=1)
        d1 = sg[np.arange(len(occ)), nn]
        fallback = np.where(
            np.isfinite(d1), d1 + out[vis[nn], b], inf_offset + dist[occ, b]
        )
        out[occ, b] = fallback
    return out
