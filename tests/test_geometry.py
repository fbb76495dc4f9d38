"""Geometry tests: clustering, voxels, skeleton algorithms, metrics."""
import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from morig_tpu.data.synthetic import make_capsule_rig, rotz
from morig_tpu.eval.metrics import chamfer_dist, joint_match_metrics, mean_flow_l2
from morig_tpu.geometry import clustering as cl
from morig_tpu.geometry import skeleton as sk
from morig_tpu.geometry import voxel as vx


# -- clustering --------------------------------------------------------------

def two_blob_pts(rng, n=100):
    c1, c2 = np.array([0.5, 0, 0]), np.array([-0.5, 0.2, 0])
    pts = np.concatenate([
        c1 + 0.03 * rng.normal(size=(n, 3)),
        c2 + 0.03 * rng.normal(size=(n, 3)),
    ]).astype(np.float32)
    return pts, c1, c2


def test_meanshift_converges_to_blob_centers(rng):
    pts, c1, c2 = two_blob_pts(rng)
    out = np.asarray(cl.meanshift_cluster(jnp.asarray(pts), jnp.asarray(0.25), num_iter=40))
    d1 = np.linalg.norm(out[:100] - c1, axis=1)
    d2 = np.linalg.norm(out[100:] - c2, axis=1)
    assert d1.mean() < 0.02 and d2.mean() < 0.02


def test_nms_extracts_two_modes(rng):
    pts, c1, c2 = two_blob_pts(rng)
    moved = np.asarray(cl.meanshift_cluster(jnp.asarray(pts), jnp.asarray(0.25), num_iter=40))
    modes = cl.nms_modes(moved, np.ones(len(moved)), bandwidth=0.25, density_threshold=0.02)
    assert len(modes) == 2
    got = sorted(np.round(m[0], 1) for m in modes)
    assert got == [-0.5, 0.5]


def test_estimate_bandwidth_matches_sklearn(rng):
    from sklearn.cluster import estimate_bandwidth as skl_bw

    pts = rng.normal(size=(200, 3)).astype(np.float32)
    got = float(cl.estimate_bandwidth(jnp.asarray(pts), quantile=0.04))
    want = float(skl_bw(pts, quantile=0.04))
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_flip_joints():
    j = np.array([[-0.3, 0, 0], [0.001, 1, 0], [0.5, 2, 0]], np.float32)
    out, side = cl.flip_joints(j)
    # left joint mirrored to the right, middle snapped, original right dropped
    assert len(out) == 3
    assert (out[:, 0] == np.array([-0.3, 0.0, 0.3], np.float32)).all()
    assert side.tolist() == [-1, 0, 1]


def test_extract_joints_on_shifted_blobs(rng):
    pts, c1, c2 = two_blob_pts(rng)
    attn = np.ones(len(pts))
    joints = cl.extract_joints(pts, attn, symmetrize=False, bandwidth_quantile=0.3)
    assert 1 <= len(joints) <= 6
    # every found joint is near one of the true centers
    d = np.minimum(
        np.linalg.norm(joints - c1, axis=1), np.linalg.norm(joints - c2, axis=1)
    )
    assert (d < 0.15).all()


# -- voxels ------------------------------------------------------------------

def test_voxelize_and_inside_check():
    rig = make_capsule_rig(13, 12)
    vox = vx.voxelize_mesh(rig.verts, rig.faces, dims=48)
    inside = vx.inside_check_np(np.array([[0.0, 0.3, 0.0], [0.5, 0.5, 0.5]]), vox)
    assert inside.tolist() == [True, False]
    # every joint is inside the capsule
    assert vx.inside_check_np(rig.joints, vox).all()


def test_binvox_roundtrip(tmp_path):
    rig = make_capsule_rig(9, 8)
    vox = vx.voxelize_mesh(rig.verts, rig.faces, dims=32)
    p = str(tmp_path / "cap.binvox")
    vx.write_binvox(vox, p)
    back = vx.read_binvox(p)
    assert back.dims == 32
    np.testing.assert_array_equal(back.data, vox.data)
    np.testing.assert_allclose(back.translate, vox.translate, rtol=1e-5)
    np.testing.assert_allclose(back.scale, vox.scale, rtol=1e-5)


def test_segment_inside_fraction():
    rig = make_capsule_rig(13, 12)
    vox = vx.voxelize_mesh(rig.verts, rig.faces, dims=48)
    grid, tr, sc = vx.vox_to_device(vox)
    starts = jnp.asarray([[0.0, 0.1, 0.0], [1.0, 1.0, 1.0]], jnp.float32)
    ends = jnp.asarray([[0.0, 0.5, 0.0], [2.0, 1.0, 1.0]], jnp.float32)
    frac = np.asarray(vx.segment_inside_fraction(starts, ends, grid, tr, sc))
    assert frac[0] > 0.95  # along the capsule axis
    assert frac[1] < 0.05  # fully outside


# -- skeleton ----------------------------------------------------------------

def make_rig():
    #       0
    #      / \
    #     1   2
    #     |
    #     3
    return sk.Rig(
        names=["a", "b", "c", "d"],
        pos=np.array([[0, 0, 0], [0, 1, 0], [1, 0, 0], [0, 2, 0]], float),
        parents=np.array([-1, 0, 0, 1]),
        skins=np.eye(4)[np.array([0, 1, 2, 3, 0])],
    )


def test_rig_roundtrip(tmp_path):
    rig = make_rig()
    p = str(tmp_path / "rig.txt")
    rig.save(p)
    back = sk.Rig.load(p)
    assert back.names == rig.names
    np.testing.assert_allclose(back.pos, rig.pos)
    np.testing.assert_array_equal(back.parents, rig.parents)
    np.testing.assert_allclose(back.skins, rig.skins, atol=1e-4)


def test_fk_matches_fixture_oracle():
    from morig_tpu.data.synthetic import fk_numpy, make_capsule_rig

    cap = make_capsule_rig(9, 8)
    rig = sk.Rig(names=cap.names, pos=cap.joints.astype(float), parents=cap.parents)
    locals_ = np.stack([np.eye(3), rotz(0.7), rotz(-0.3)]).astype(np.float32)
    G1, q1 = rig.fk(locals_)
    G2, q2 = fk_numpy(cap.joints, cap.parents, locals_)
    np.testing.assert_allclose(G1, G2, atol=1e-6)
    np.testing.assert_allclose(q1, q2, atol=1e-6)


def test_prim_mst_vs_bruteforce(rng):
    n = 6
    w = rng.random((n, n)) + 0.1
    w = (w + w.T) / 2
    np.fill_diagonal(w, 0.0)
    parent = sk.prim_mst(w, 0)
    got = sum(w[i, parent[i]] for i in range(n) if parent[i] >= 0)
    # brute force over all spanning trees via Prim from scipy
    from scipy.sparse.csgraph import minimum_spanning_tree

    want = minimum_spanning_tree(w).sum()
    np.testing.assert_allclose(got, want, rtol=1e-9)
    assert parent[0] == -1


def test_prim_mst_symmetry_mirrors():
    # symmetric 5 joints: middle chain + left/right pair
    joints = np.array([[0, 0, 0], [0, 1, 0], [-0.5, 1, 0], [0.5, 1, 0], [0, 2, 0]], float)
    d = np.linalg.norm(joints[:, None] - joints[None], axis=-1)
    cost = d + 0.01
    parent, root = sk.prim_mst_symmetry(cost, 0, joints)
    assert root == 0
    # left and right attach to mirrored parents
    assert parent[2] == parent[3] == 1


def test_get_bones_and_dup_roundtrip():
    rig = make_rig()
    bones, names, isleaf = sk.get_bones(rig)
    # 3 real bones + 2 leaf bones (c and d are childless)
    assert len(bones) == 5
    assert isleaf.sum() == 2
    attachment = np.zeros((5, 5))
    attachment[:, 0] = 1.0  # all weight on first bone (a->b)
    rig2 = sk.assemble_skel_skin(rig, attachment)
    assert rig2.skins.shape == (5, rig2.num_joints)
    np.testing.assert_allclose(rig2.skins.sum(1), 1.0)
    rig3 = sk.remove_duplicate_joints(rig2)
    assert all("_dup" not in n for n in rig3.names)
    assert rig3.num_joints == 4
    np.testing.assert_allclose(rig3.skins.sum(1), 1.0)


def test_outside_bone_cost():
    joints = np.array([[0, 0.1, 0], [0, 0.4, 0], [0.5, 0.5, 0.5]], float)
    base = np.ones((3, 3))

    def frac_fn(starts, ends):
        # segment 0-1 inside, others outside
        return np.array([1.0 if np.allclose(s[1], 0.1) and np.allclose(e[1], 0.4) else 0.0
                         for s, e in zip(starts, ends)])

    out = sk.increase_cost_for_outside_bone(base, joints, frac_fn)
    assert out[0, 1] == 0.5 * 1.0      # middle-plane pair halved
    assert out[0, 2] > 2.0             # outside bone penalized
    assert out[1, 2] > 2.0


# -- metrics -----------------------------------------------------------------

def test_joint_match_metrics_perfect_and_miss():
    gt = np.array([[0, 0, 0], [1, 0, 0]], float)
    m = joint_match_metrics(gt.copy(), gt, feature_sizes=0.1)
    assert m["joint_IoU"] == 1.0 and m["joint_precision"] == 1.0 and m["joint_recall"] == 1.0
    pred = gt + 0.5
    m2 = joint_match_metrics(pred, gt, feature_sizes=0.1)
    assert m2["joint_IoU"] == 0.0
    assert m2["chamfer_j2j"] > 0


def test_chamfer_and_flow_metrics(rng):
    a = rng.normal(size=(10, 3))
    assert chamfer_dist(a, a) == pytest.approx(0.0, abs=1e-7)
    f1 = rng.normal(size=(5, 3))
    assert mean_flow_l2(f1, f1) == pytest.approx(0.0, abs=1e-7)
