"""Round-trip tests for the reference on-disk dataset layout loaders.

Synthesizes reference-layout folders (npy/txt exactly as dataset_pose.py:48-98,
dataset_rig.py:78-138, and gen_skin_data.py:119-136 write/consume them) and
asserts the keyframe / divisor / corr / skin-bind semantics against
hand-computed values."""
import os

import numpy as np
import pytest

from morig_tpu.data.loaders import (
    load_pose_model,
    load_rig_model,
    parse_skin_file,
)
from morig_tpu.geometry import skeleton as sk


def _write_pose_folder(tmp_path, name, num_frames, corr_frames):
    rng = np.random.default_rng(3)
    V, P = 20, 16
    vtx = rng.normal(size=(V, num_frames, 3)).astype(np.float32)
    pts = rng.normal(size=(P, num_frames, 3)).astype(np.float32)
    vis = rng.uniform(size=(V, num_frames)).astype(np.float32)
    corr_v2p = np.stack([
        rng.integers(0, V, len(corr_frames)),
        rng.integers(0, P, len(corr_frames)),
        np.asarray(corr_frames),
    ], axis=1).astype(np.int64)
    corr_p2v = np.stack([
        rng.integers(0, P, len(corr_frames)),
        rng.integers(0, V, len(corr_frames)),
        np.asarray(corr_frames),
    ], axis=1).astype(np.int64)
    tpl = np.array([[0, 1], [1, 2], [2, 3]])
    geo = np.array([[0, 2], [1, 3]])
    pre = os.path.join(tmp_path, name)
    np.save(pre + "_vtx_traj.npy", vtx.reshape(V, -1))      # flat (V, 3T) layout
    np.save(pre + "_pts_traj.npy", pts.reshape(P, -1))
    np.save(pre + "_vismask.npy", vis)
    np.save(pre + "_corr_v2p.npy", corr_v2p)
    np.save(pre + "_corr_p2v.npy", corr_p2v)
    np.savetxt(pre + "_tpl_e.txt", tpl, fmt="%d")
    np.savetxt(pre + "_geo_e.txt", geo, fmt="%d")
    return pre, vtx, pts, vis, corr_v2p, corr_p2v, tpl, geo


def test_modelsresource_keyframes(tmp_path):
    """ModelsResources: keyframes 0,20..100, corr frame ids //20
    (dataset_pose.py:67-79)."""
    corr_frames = [0, 5, 20, 37, 40, 60, 80, 99, 100]
    pre, vtx, pts, vis, v2p, p2v, tpl, geo = _write_pose_folder(
        str(tmp_path), "m1", 101, corr_frames)
    m = load_pose_model(pre, kind="modelsresource")
    kf = np.arange(0, 110, 20)[np.arange(0, 110, 20) < 101]   # [0,20,...,100]
    np.testing.assert_array_equal(kf, [0, 20, 40, 60, 80, 100])
    np.testing.assert_allclose(m.vtx_traj, vtx[:, kf, :])
    np.testing.assert_allclose(m.pts_traj, pts[:, kf, :])
    np.testing.assert_allclose(m.vismask, vis[:, kf])
    keep = np.isin(v2p[:, -1], kf)
    exp = v2p[keep].copy()
    exp[:, -1] //= 20
    np.testing.assert_array_equal(m.corr_v2p, exp)
    assert set(m.corr_v2p[:, -1].tolist()) <= set(range(6))
    keep = np.isin(p2v[:, -1], kf)
    exp = p2v[keep].copy()
    exp[:, -1] //= 20
    np.testing.assert_array_equal(m.corr_p2v, exp)
    np.testing.assert_array_equal(np.sort(m.tpl_edges.reshape(-1, 2), 0),
                                  np.sort(tpl, 0))


def test_deformingthings_keyframes(tmp_path):
    """DeformingThings: 100 frames, keyframes 0,19..95, ids //19
    (dataset_pose.py:200-214)."""
    corr_frames = [0, 19, 20, 38, 57, 76, 95, 99]
    pre, vtx, pts, vis, v2p, p2v, *_ = _write_pose_folder(
        str(tmp_path), "d1", 100, corr_frames)
    m = load_pose_model(pre, kind="deformingthings")
    kf = np.array([0, 19, 38, 57, 76, 95])
    np.testing.assert_allclose(m.vtx_traj, vtx[:, kf, :])
    keep = np.isin(v2p[:, -1], kf)
    exp = v2p[keep].copy()
    exp[:, -1] //= 19
    np.testing.assert_array_equal(m.corr_v2p, exp)
    np.testing.assert_array_equal(np.unique(m.corr_v2p[:, -1]),
                                  np.unique(exp[:, -1]))


def test_sequential_keyframes(tmp_path):
    """Sequential datasets keep frames 0..20 with untouched ids
    (dataset_pose.py:140,288)."""
    corr_frames = [0, 1, 7, 20, 21, 50]
    pre, vtx, *_ , v2p, p2v, tpl, geo = _write_pose_folder(
        str(tmp_path), "s1", 101, corr_frames)
    m = load_pose_model(pre, kind="modelsresource", sequential=True)
    assert m.vtx_traj.shape[1] == 21
    np.testing.assert_allclose(m.vtx_traj, vtx[:, :21, :])
    keep = v2p[:, -1] <= 20
    np.testing.assert_array_equal(m.corr_v2p, v2p[keep])   # divisor 1


def _tiny_rig():
    names = ["root", "mid", "tip"]
    pos = np.array([[0.0, 0.0, 0.0], [0.0, 0.3, 0.0], [0.0, 0.6, 0.0]])
    parents = np.array([-1, 0, 1])
    V = 12
    skins = np.zeros((V, 3))
    skins[:4, 0] = 1.0
    skins[4:8, 1] = 1.0
    skins[8:, 2] = 1.0
    return sk.Rig(names=names, pos=pos, parents=parents, skins=skins)


def _write_skin_file(path, rig, num_nearest_bone=20):
    """Reference gen_skin_data.py:119-136 writer format."""
    bones, bone_names, isleaf = sk.get_bones(rig)
    V = rig.skins.shape[0]
    rng = np.random.default_rng(5)
    rows, labels = [], []
    with open(path, "w") as f:
        for i, (pn, cn) in enumerate(bone_names):
            f.write(f"bones {pn} {cn} " + " ".join(f"{x:.6f}" for x in bones[i]) + "\n")
        for vid in range(V):
            order = rng.permutation(len(bones))
            row = []
            lab = []
            for i in range(num_nearest_bone):
                if i >= len(order):
                    row += [-1, 0.0, 0]
                    lab.append(0.0)
                else:
                    b = int(order[i])
                    row += [b, float(1.0 / (0.1 + i)), int(isleaf[b])]
                    lab.append(float(rig.skins[vid, :].max()) if i == 0 else 0.0)
            rows.append(row)
            labels.append(lab)
            f.write(f"bind {vid} " + " ".join(
                f"{int(row[3*i])} {row[3*i+1]:.6f} {int(row[3*i+2])}"
                for i in range(num_nearest_bone)) + "\n")
        for lab in labels:
            f.write("influence " + " ".join(f"{x:.3f}" for x in lab) + "\n")
    return bones, bone_names, isleaf, rows, labels


def test_parse_skin_file_semantics(tmp_path):
    """Slot i reads (bid, 1/dist, isleaf) at words[3i+1..3i+3]; -1 repeats
    slot 0 with loss_mask 0 (dataset_rig.py:43-66)."""
    rig = _tiny_rig()
    path = os.path.join(str(tmp_path), "1_skin.txt")
    K = 20
    bones, bone_names, isleaf, rows, labels = _write_skin_file(path, rig, K)
    s_in, s_nn, s_lab, s_mask, names_out = parse_skin_file(path, K)
    V = rig.skins.shape[0]
    assert s_in.shape == (V, K * 8)
    assert names_out == [tuple(n) for n in map(tuple, bone_names)]
    for vid in range(V):
        row = rows[vid]
        for i in range(K):
            bid = int(row[3 * i])
            if bid == -1:
                bid_eff = int(row[0])
                invd, leaf = row[1], row[2]
                assert s_mask[vid, i] == 0
            else:
                bid_eff, invd, leaf = bid, row[3 * i + 1], row[3 * i + 2]
                assert s_mask[vid, i] == 1
            assert s_nn[vid, i] == bid_eff
            np.testing.assert_allclose(
                s_in[vid, 8 * i: 8 * i + 6], bones[bid_eff], atol=1e-5)
            np.testing.assert_allclose(s_in[vid, 8 * i + 6], invd, atol=1e-5)
            np.testing.assert_allclose(s_in[vid, 8 * i + 7], leaf, atol=1e-5)
    np.testing.assert_allclose(s_lab, np.asarray(labels), atol=1e-3)


def test_load_rig_model_roundtrip(tmp_path):
    """Full rig-stage folder: _rig.txt + _attn.txt + _skin.txt + pred_flow/
    (dataset_rig.py:78-138): gt flow at keyframes 20..100 step 20, pred flow
    from the dumped npys, skin fields from the skin file."""
    rig = _tiny_rig()
    V = rig.skins.shape[0]
    T = 101
    rng = np.random.default_rng(11)
    vtx = rng.normal(size=(V, T, 3)).astype(np.float32)
    folder = str(tmp_path)
    pre = os.path.join(folder, "7")
    np.save(pre + "_vtx_traj.npy", vtx)
    np.savetxt(pre + "_tpl_e.txt", np.array([[0, 1], [1, 2]]), fmt="%d")
    np.savetxt(pre + "_geo_e.txt", np.array([[0, 2]]), fmt="%d")
    rig.save(pre + "_rig.txt")
    attn = (rng.uniform(size=V) > 0.5).astype(np.float32)
    np.savetxt(pre + "_attn.txt", attn)
    _write_skin_file(pre + "_skin.txt", rig, 20)
    os.makedirs(os.path.join(folder, "pred_flow"))
    pf = []
    for t in range(1, 6):
        a = rng.normal(size=(V, 3)).astype(np.float32)
        np.save(os.path.join(folder, "pred_flow", f"7_{t}_pred_flow.npy"), a)
        pf.append(a)

    m = load_rig_model(pre)
    # gt flow: v[:, 20k] - v[:, 0] for k = 1..5 (dataset_rig.py:105-108)
    exp_flow = np.concatenate(
        [vtx[:, 20 * k, :] - vtx[:, 0, :] for k in range(1, 6)], axis=1)
    np.testing.assert_allclose(m.gt_flow, exp_flow, atol=1e-6)
    np.testing.assert_allclose(m.pred_flow, np.concatenate(pf, axis=1), atol=1e-6)
    np.testing.assert_allclose(m.attn, attn)
    np.testing.assert_allclose(m.verts, vtx[:, 0, :])
    # skin fields must come from the file, not the euclidean fallback
    s_in, s_nn, s_lab, s_mask, _ = parse_skin_file(pre + "_skin.txt", 20)
    np.testing.assert_allclose(m.skin_input, s_in)
    np.testing.assert_array_equal(m.skin_nn, s_nn)
    np.testing.assert_allclose(m.skin_label, s_lab)
    np.testing.assert_array_equal(m.loss_mask, s_mask)
    # rig round-trip through the parser
    assert m.rig.names == rig.names
    np.testing.assert_allclose(m.rig.pos, rig.pos, atol=1e-6)
    np.testing.assert_array_equal(m.rig.parents, rig.parents)
