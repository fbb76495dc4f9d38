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


def vertex_bone_geodesic_device(
    verts,                      # (V, 3)
    bones_p,                    # (Bmax, 6) padded bones
    bone_mask,                  # (Bmax,) bool
    surf_geo,                   # (V, V) surface geodesic matrix (bf16 ok)
    grid, translate, scale,     # voxel grid triple (vox_to_device)
    inside_threshold: float = 0.90,
    inf_offset: float = 8.0,
    percentile: float = 0.15,
    far_factor: float = 1.3,
    bone_chunk: int = 8,
):
    """Jittable volumetric vertex→bone geodesic over PADDED bones — the
    device end of `vertex_bone_geodesic` for the batched skin path
    (joint2rig.py:307-360 semantics):

      * voxel-LOS visibility (ray casting replacement, SURVEY §7 move 5)
      * far-visible pruning at the per-bone `percentile` of visible
        distances × `far_factor` (joint2rig.py:333-338)
      * occluded pairs: min over visible vertices u of
        surf_geo[v,u] + dist[u,b], chunked over bones to bound the (V,V,c)
        broadcast; bones with no visible vertex fall back to the straight
        distance (geometry/geodesic.py host path parity).

    Returns geo (V, Bmax) with padded bones at +inf.
    """
    import jax
    import jax.numpy as jnp

    from morig_tpu.geometry.bones import vertex_bone_visibility

    POS = 1e30
    visible, dist = vertex_bone_visibility(
        verts, bones_p, grid, translate, scale,
        inside_threshold=inside_threshold)
    visible = visible & bone_mask[None, :]
    V, Bm = dist.shape

    # per-bone percentile of visible distances (order statistic over the
    # sorted column with invisible entries pushed to +inf)
    d_sorted = jnp.sort(jnp.where(visible, dist, POS), axis=0)      # (V, Bm)
    n_vis = jnp.sum(visible, axis=0)                                 # (Bm,)
    k_idx = jnp.clip((percentile * (n_vis - 1)).astype(jnp.int32), 0, V - 1)
    thr = jnp.take_along_axis(d_sorted, k_idx[None, :], axis=0)[0]   # (Bm,)
    keep = dist <= far_factor * jnp.where(n_vis > 0, thr, POS)[None, :]
    visible = visible & keep

    dvis = jnp.where(visible, dist, POS).astype(surf_geo.dtype)

    pad = (-Bm) % bone_chunk
    dvis_p = jnp.pad(dvis, ((0, 0), (0, pad)), constant_values=POS)
    chunks = dvis_p.reshape(V, -1, bone_chunk).transpose(1, 0, 2)    # (C,V,bc)

    def min_plus(dv):                                                # (V, bc)
        return jnp.min(surf_geo[:, :, None] + dv[None, :, :], axis=1)

    fb = jax.lax.map(min_plus, chunks)                               # (C,V,bc)
    fb = fb.transpose(1, 0, 2).reshape(V, -1)[:, :Bm].astype(jnp.float32)

    any_vis = jnp.any(visible, axis=0)                               # (Bm,)
    geo = jnp.where(visible, dist,
                    jnp.minimum(fb, inf_offset + dist))
    geo = jnp.where(any_vis[None, :], geo, dist)
    return jnp.where(bone_mask[None, :], geo, POS)


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
