"""Preprocessing pipeline tests: edges, geodesics, caching, bone descriptors."""
import os

import numpy as np

from morig_tpu.data.preprocess import (
    get_geo_edges, get_tpl_edges, normalize_mesh, preprocess_model,
    volumetric_geodesic_bfs,
)
from morig_tpu.data.synthetic import make_capsule_rig
from morig_tpu.geometry import skeleton as sk


def test_tpl_edges_match_numpy():
    cap = make_capsule_rig(9, 8)
    e = get_tpl_edges(cap.faces)
    # oracle
    f = cap.faces
    want = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [0, 2]]], 0)
    want = np.sort(want, 1)
    want = np.unique(want[want[:, 0] != want[:, 1]], axis=0)
    np.testing.assert_array_equal(np.sort(e, 1)[np.lexsort(e.T[::-1])], want)


def test_normalize_mesh():
    v = np.array([[0, 0, 0], [2, 4, 2], [1, 2, 1]], float)
    out, pivot, scale = normalize_mesh(v)
    assert abs((out.max(0) - out.min(0)).max() - 1.0) < 1e-9
    assert out[:, 1].min() == 0.0  # footprint at y=0


def test_preprocess_model_cached(tmp_path):
    cap = make_capsule_rig(9, 8)
    rig = sk.Rig(names=list(cap.names), pos=cap.joints.astype(float),
                 parents=cap.parents, skins=cap.skins)
    out = preprocess_model(cap.verts, cap.faces, rig, cache_dir=str(tmp_path),
                           name="cap", vox_dims=32)
    assert out["tpl_edges"].shape[1] == 2
    assert out["geo_edges"].shape[1] == 2
    V = len(cap.verts)
    assert out["surface_geodesic"].shape == (V, V)
    assert out["vertex_bone_geodesic"].shape[0] == V
    assert out["attn"].shape == (V,)
    # second call hits the cache (files exist)
    assert os.path.exists(tmp_path / "cap_sgeo.npz")
    out2 = preprocess_model(cap.verts, cap.faces, rig, cache_dir=str(tmp_path),
                            name="cap", vox_dims=32)
    np.testing.assert_allclose(out["surface_geodesic"], out2["surface_geodesic"])


def test_volumetric_geodesic_bfs_orders_bones():
    from morig_tpu import native
    import pytest

    if not native.available():
        pytest.skip("native lib unavailable")
    from morig_tpu.geometry.voxel import voxelize_mesh

    cap = make_capsule_rig(13, 12)
    rig = sk.Rig(names=list(cap.names), pos=cap.joints.astype(float),
                 parents=cap.parents, skins=cap.skins)
    bones, _, _ = sk.get_bones(rig)
    vox = voxelize_mesh(cap.verts, cap.faces, dims=48)
    d = volumetric_geodesic_bfs(cap.verts, vox, bones)
    assert d.shape == (len(cap.verts), len(bones))
    # the bottom-most vertex is nearer (in steps) to the lower bone than the top one
    bot = int(np.argmin(cap.verts[:, 1]))
    top = int(np.argmax(cap.verts[:, 1]))
    assert d[bot, 0] < d[bot, 1]
    assert d[top, 1] < d[top, 0]


def test_rcm_restores_windowed_kernel_locality():
    """Scrambled meshes fail the windowed-kernel precondition; RCM reorder
    restores it (kernels/edge_fused.py)."""
    from morig_tpu.core.batch import build_mesh
    from morig_tpu.data.preprocess import apply_vertex_order, rcm_vertex_order
    from morig_tpu.kernels.edge_fused import check_neighbor_locality

    rng = np.random.default_rng(0)
    cap = make_capsule_rig(37, 36)
    perm = rng.permutation(len(cap.verts))
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    v2, tpl2, geo2 = cap.verts[perm], inv[cap.tpl_edges], inv[cap.geo_edges]
    e = build_mesh(v2, tpl2, geo2, 2048)
    assert not check_neighbor_locality(e["tpl_nbr"][None])

    order = rcm_vertex_order(len(v2), tpl2, geo2)
    v3, tpl3, geo3, v2back = apply_vertex_order(order, v2, tpl2, geo2, v2)
    np.testing.assert_allclose(v3, v2back)
    e3 = build_mesh(v3, tpl3, geo3, 2048)
    assert check_neighbor_locality(e3["tpl_nbr"][None])
    assert check_neighbor_locality(e3["geo_nbr"][None])
