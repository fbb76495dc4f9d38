"""Registration (Kabsch/RANSAC), kernel k-means, IO, visualization exports."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from morig_tpu.data.synthetic import rotz
from morig_tpu.geometry.kmeans import kernel_kmeans
from morig_tpu.geometry.registration import PiecewiseRansac, icp_numpy, kabsch


def test_kabsch_recovers_rigid(rng):
    src = rng.normal(size=(2, 30, 3)).astype(np.float32)
    R_true = np.stack([rotz(0.6), rotz(-1.1)])
    t_true = rng.normal(size=(2, 1, 3)).astype(np.float32)
    tar = np.einsum("bac,bnc->bna", R_true, src) + t_true

    R, t = icp_numpy(src, tar)
    np.testing.assert_allclose(R, R_true, atol=1e-4)
    np.testing.assert_allclose(t, t_true, atol=1e-4)
    # rotations proper
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_ransac_robust_to_outliers(rng):
    src = rng.normal(size=(60, 3)).astype(np.float32)
    R_true = rotz(0.4)
    tar = src @ R_true.T + np.array([0.1, -0.2, 0.05], np.float32)
    tar_noisy = tar.copy()
    tar_noisy[:15] += rng.normal(size=(15, 3)) * 2.0  # 25% outliers
    pr = PiecewiseRansac(num_hypotheses=128, inlier_threshold=0.02)
    R, t = pr.fit_segment(src, tar_noisy)
    np.testing.assert_allclose(R, R_true, atol=1e-2)


def test_piecewise_ransac_segments(rng):
    # two segments with different rigid motions
    v1 = rng.normal(size=(40, 3)).astype(np.float32)
    v2 = rng.normal(size=(40, 3)).astype(np.float32) + 3.0
    verts = np.concatenate([v1, v2])
    seg = np.array([0] * 40 + [1] * 40)
    tar = verts.copy()
    tar[:40] = v1 @ rotz(0.3).T
    tar[40:] = v2 + np.array([0.5, 0, 0])
    pr = PiecewiseRansac()
    out = pr.run(verts, seg, verts, tar, seg)
    np.testing.assert_allclose(out, tar, atol=1e-3)


def test_kernel_kmeans_two_blobs(rng):
    pos = np.concatenate([
        rng.normal(size=(50, 3)) * 0.05,
        rng.normal(size=(50, 3)) * 0.05 + 1.0,
    ]).astype(np.float32)
    feat = np.concatenate([
        np.tile([1.0, 0, 0, 0], (50, 1)), np.tile([0, 1.0, 0, 0], (50, 1))
    ]).astype(np.float32)
    assign = np.asarray(kernel_kmeans(
        jnp.asarray(feat), jnp.asarray(pos), 2, jax.random.key(0)))
    assert len(np.unique(assign[:50])) == 1
    assert len(np.unique(assign[50:])) == 1
    assert assign[0] != assign[-1]


def test_mesh_io_roundtrips(tmp_path, rng):
    from morig_tpu.data.mesh_io import (
        read_obj, read_ply_points, write_obj, write_ply_points,
    )

    verts = rng.normal(size=(20, 3)).astype(np.float32)
    faces = rng.integers(0, 20, size=(10, 3)).astype(np.int32)
    p = str(tmp_path / "m.obj")
    write_obj(p, verts, faces)
    v2, f2 = read_obj(p)
    np.testing.assert_allclose(v2, verts, atol=1e-6)
    np.testing.assert_array_equal(f2, faces)

    for binary in (True, False):
        q = str(tmp_path / f"pc_{binary}.ply")
        write_ply_points(q, verts, binary=binary)
        back = read_ply_points(q)
        np.testing.assert_allclose(back, verts, atol=1e-5)


def test_visualize_exports(tmp_path, rng):
    from morig_tpu.eval.visualize import (
        export_attention, export_correspondence, export_flow, export_skeleton_obj,
    )
    from morig_tpu.data.mesh_io import read_ply_points
    from morig_tpu.geometry.skeleton import Rig

    verts = rng.normal(size=(30, 3)).astype(np.float32)
    export_attention(str(tmp_path / "a.ply"), verts, rng.random(30))
    assert len(read_ply_points(str(tmp_path / "a.ply"))) == 30

    feats = rng.normal(size=(30, 16)).astype(np.float32)
    pts = rng.normal(size=(20, 3)).astype(np.float32)
    pfeat = rng.normal(size=(20, 16)).astype(np.float32)
    export_correspondence(str(tmp_path / "v.ply"), str(tmp_path / "p.ply"),
                          verts, feats, pts, pfeat)
    export_flow(str(tmp_path / "f.ply"), verts, rng.normal(size=(30, 3)).astype(np.float32))
    rig = Rig(names=["a", "b"], pos=np.array([[0., 0, 0], [0, 1, 0]]),
              parents=np.array([-1, 0]))
    export_skeleton_obj(str(tmp_path / "s.obj"), rig)
    assert os.path.getsize(str(tmp_path / "s.obj")) > 0


def test_native_matches_python_geodesic(rng):
    """C++ dijkstra vs scipy over the same graph."""
    from morig_tpu import native

    if not native.available():
        import pytest

        pytest.skip("native lib unavailable")
    pts = rng.normal(size=(60, 3)).astype(np.float32)
    normals = np.tile([[0, 0, 1.0]], (60, 1)).astype(np.float32)
    got = native.geodesic_all_pairs(pts, normals, knn=5)

    from scipy.sparse import lil_matrix
    from scipy.sparse.csgraph import dijkstra

    d = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
    nn = np.argsort(d, axis=1)
    conn = lil_matrix((60, 60), dtype=np.float32)
    for p in range(60):
        nbrs = nn[p, 1:6]
        conn[p, nbrs] = d[p, nbrs]
    want = dijkstra(conn.tocsr(), directed=False)
    bad = ~np.isfinite(want)
    want[bad] = 8.0 + d[bad]
    np.testing.assert_allclose(got, want, atol=1e-3)
