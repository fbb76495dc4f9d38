"""Byte-literal reference-format fixtures (VERDICT r3 missing #4 / next #9).

Every file here is HAND-AUTHORED text/bytes following the reference's exact
on-disk conventions — NOT produced by our own writers — so day one on a real
ModelsResources download is not the first time the parsers see the real
formats:

  * `*_rig.txt`  — joints/root/skin/hier lines as rig_parser.py:91-116 writes
  * `*_skin.txt` — bones/bind/influence lines as gen_skin_data.py writes and
    dataset_rig.py:31-76 parses (incl. the -1 missing-slot walk-round)
  * binvox       — binary per the binvox spec (dim/translate/scale header +
    RLE payload, x-major [x][z][y] order) as binvox_rw.py:74-107 reads
  * `*.obj`      — v/f lines incl. v/vt/vn face syntax and quads
  * `*_tpl_e.txt`/`*_geo_e.txt` — whitespace int pairs (dataset_pose.py:90)
"""
import os

import numpy as np
import pytest

from morig_tpu.data.mesh_io import load_edge_file, read_obj
from morig_tpu.geometry import skeleton as sk
from morig_tpu.geometry.voxel import read_binvox, write_binvox

RIG_TXT = """joints root 0.00000000 0.10000000 0.00000000
joints spine 0.00000000 0.40000000 0.00000000
joints arm_l -0.30000000 0.40000000 0.00000000
joints arm_r 0.30000000 0.40000000 0.00000000
root root
skin 0 root 1.0000
skin 1 root 0.5000 spine 0.5000
skin 2 arm_l 0.9000 spine 0.1000
skin 3 arm_r 0.9000 spine 0.1000
skin 4 spine 1.0000
hier root spine
hier spine arm_l
hier spine arm_r
"""

SKIN_TXT = """bones root spine 0.000000 0.100000 0.000000 0.000000 0.400000 0.000000
bones spine arm_l 0.000000 0.400000 0.000000 -0.300000 0.400000 0.000000
bones spine arm_r 0.000000 0.400000 0.000000 0.300000 0.400000 0.000000
bind 0 0 3.125000 0 1 1.250000 1 -1 0.000000 0
bind 1 2 2.000000 1 0 1.500000 0 1 1.000000 1
influence 0.800 0.200 0.000
influence 0.500 0.300 0.200
"""

OBJ_TXT = """# hand-written wavefront file
v 0.0 0.0 0.0
v 1.0 0.0 0.0
v 1.0 1.0 0.0
v 0.0 1.0 0.0
vn 0.0 0.0 1.0
vt 0.0 0.0
f 1/1/1 2/1/1 3/1/1
f 1 3 4
"""

EDGE_TXT = "0 1\n1 2\n2 3\n3 0\n"


def test_rig_txt_literal(tmp_path):
    p = str(tmp_path / "m_rig.txt")
    with open(p, "w") as f:
        f.write(RIG_TXT)
    rig = sk.Rig.load(p)
    assert rig.names == ["root", "spine", "arm_l", "arm_r"]
    np.testing.assert_allclose(rig.pos[2], [-0.3, 0.4, 0.0])
    np.testing.assert_array_equal(rig.parents, [-1, 0, 1, 1])
    assert rig.root_id == 0
    assert rig.skins.shape == (5, 4)
    np.testing.assert_allclose(rig.skins[1], [0.5, 0.5, 0.0, 0.0])
    np.testing.assert_allclose(rig.skins[3], [0.0, 0.1, 0.0, 0.9])
    # round-trip through our writer parses back identically
    q = str(tmp_path / "rt_rig.txt")
    rig.save(q)
    back = sk.Rig.load(q)
    assert back.names == rig.names
    np.testing.assert_allclose(back.pos, rig.pos)
    np.testing.assert_array_equal(back.parents, rig.parents)
    np.testing.assert_allclose(back.skins, rig.skins, atol=1e-4)


def test_skin_txt_literal(tmp_path):
    from morig_tpu.data.loaders import parse_skin_file

    p = str(tmp_path / "m_skin.txt")
    with open(p, "w") as f:
        f.write(SKIN_TXT)
    K = 3
    s_in, s_nn, s_lab, s_mask, names = parse_skin_file(p, K)
    assert names == [("root", "spine"), ("spine", "arm_l"), ("spine", "arm_r")]
    assert s_in.shape == (2, K * 8)
    # vertex 0: slots (bone0, 3.125, leaf0), (bone1, 1.25, leaf1), missing
    np.testing.assert_allclose(s_in[0, 0:6], [0, 0.1, 0, 0, 0.4, 0], atol=1e-6)
    np.testing.assert_allclose(s_in[0, 6:8], [3.125, 0.0])
    np.testing.assert_allclose(s_in[0, 14:16], [1.25, 1.0])
    # missing slot (-1) repeats slot 0's bone with loss_mask 0
    # (dataset_rig.py:50-57 walk-round)
    np.testing.assert_array_equal(s_nn[0], [0, 1, 0])
    np.testing.assert_array_equal(s_mask[0], [1, 1, 0])
    np.testing.assert_allclose(s_in[0, 16:22], s_in[0, 0:6])
    # vertex 1: all three slots valid, order 2,0,1
    np.testing.assert_array_equal(s_nn[1], [2, 0, 1])
    np.testing.assert_array_equal(s_mask[1], [1, 1, 1])
    np.testing.assert_allclose(s_lab, [[0.8, 0.2, 0.0], [0.5, 0.3, 0.2]],
                               atol=1e-6)


def test_binvox_literal_bytes(tmp_path):
    # 2x2x2 grid, x-major [x][z][y]: flat order
    # (x0z0y0, x0z0y1, x0z1y0, x0z1y1, x1z0y0, ...)
    # payload: first 3 filled, next 5 empty -> RLE pairs (1,3)(0,5)
    blob = (b"#binvox 1\n"
            b"dim 2 2 2\n"
            b"translate -0.5 0.25 1.5\n"
            b"scale 2.5\n"
            b"data\n" + bytes([1, 3, 0, 5]))
    p = str(tmp_path / "m.binvox")
    with open(p, "wb") as f:
        f.write(blob)
    vox = read_binvox(p)
    assert vox.dims == 2
    np.testing.assert_allclose(vox.translate, [-0.5, 0.25, 1.5])
    assert vox.scale == 2.5
    # [x][z][y] flat -> our [x][y][z] array
    expect = np.zeros((2, 2, 2), bool)
    expect[0, 0, 0] = True   # x0 z0 y0
    expect[0, 1, 0] = True   # x0 z0 y1
    expect[0, 0, 1] = True   # x0 z1 y0
    np.testing.assert_array_equal(vox.data, expect)
    # write-read round trip preserves everything
    q = str(tmp_path / "rt.binvox")
    write_binvox(vox, q)
    back = read_binvox(q)
    np.testing.assert_array_equal(back.data, vox.data)
    np.testing.assert_allclose(back.translate, vox.translate)
    assert back.scale == vox.scale


def test_obj_literal(tmp_path):
    p = str(tmp_path / "m_0.obj")
    with open(p, "w") as f:
        f.write(OBJ_TXT)
    verts, faces = read_obj(p)
    assert verts.shape == (4, 3)
    np.testing.assert_allclose(verts[2], [1.0, 1.0, 0.0])
    # v/vt/vn face syntax and the plain triangle both parse, 0-indexed
    np.testing.assert_array_equal(faces, [[0, 1, 2], [0, 2, 3]])


def test_edge_file_literal(tmp_path):
    p = str(tmp_path / "m_tpl_e.txt")
    with open(p, "w") as f:
        f.write(EDGE_TXT)
    e = load_edge_file(p)
    assert e.reshape(-1, 2).shape == (4, 2)
    np.testing.assert_array_equal(e.reshape(-1, 2)[2], [2, 3])


def test_full_rig_folder_literal(tmp_path):
    """A complete literal rig-stage folder drives load_rig_model end-to-end:
    rig/attn/skin/edges text files + numpy trajectory, following
    dataset_rig.py:78-138's expectations."""
    from morig_tpu.data.loaders import load_rig_model

    pre = str(tmp_path / "3")
    with open(pre + "_rig.txt", "w") as f:
        f.write(RIG_TXT)
    V, T = 5, 101
    rng = np.random.default_rng(0)
    vtx = rng.normal(size=(V, T, 3)).astype(np.float32)
    np.save(pre + "_vtx_traj.npy", vtx)
    with open(pre + "_tpl_e.txt", "w") as f:
        f.write("0 1\n1 2\n2 3\n3 4\n")
    with open(pre + "_geo_e.txt", "w") as f:
        f.write("0 2\n1 3\n")
    with open(pre + "_attn.txt", "w") as f:
        f.write("1.0\n0.0\n1.0\n0.0\n1.0\n")
    m = load_rig_model(pre)
    assert m.rig.names == ["root", "spine", "arm_l", "arm_r"]
    np.testing.assert_array_equal(m.attn, [1, 0, 1, 0, 1])
    exp_flow = np.concatenate(
        [vtx[:, 20 * k, :] - vtx[:, 0, :] for k in range(1, 6)], axis=1)
    np.testing.assert_allclose(m.gt_flow, exp_flow, atol=1e-6)
