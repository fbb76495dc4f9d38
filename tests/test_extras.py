"""Extra losses, skel-format IO, middle-first MST, segmentation helpers,
profiling utilities, shape loader."""
import jax
import jax.numpy as jnp
import numpy as np

from morig_tpu.data.synthetic import make_capsule_rig
from morig_tpu.geometry import skeleton as sk
from morig_tpu.geometry.segmentation import (
    boundary_pivot, mirror_segmentation, move_joints_to_boundary,
)
from morig_tpu.losses import extras as ex


def _clustered(rng, B=2, V=300, J=4, C=8):
    skin = np.zeros((B, V, J), np.float32)
    feat_good = np.zeros((B, V, C), np.float32)
    for k in range(J):
        sl = slice(k * V // J, (k + 1) * V // J)
        skin[:, sl, k] = 1.0
        feat_good[:, sl, k] = 3.0
    feat_bad = rng.normal(size=(B, V, C)).astype(np.float32)
    mask = np.ones((B, V), bool)
    return skin, feat_good, feat_bad, mask


def test_log_ratio_and_hinge_discriminate(rng):
    skin, good, bad, mask = _clustered(rng)
    key = jax.random.key(0)
    lr_g = float(ex.log_ratio_loss(key, jnp.asarray(good), jnp.asarray(skin), jnp.asarray(mask)))
    lr_b = float(ex.log_ratio_loss(key, jnp.asarray(bad), jnp.asarray(skin), jnp.asarray(mask)))
    assert np.isfinite(lr_g) and np.isfinite(lr_b) and lr_g < lr_b

    good_n = good / np.linalg.norm(good, axis=-1, keepdims=True).clip(1e-6)
    bad_n = bad / np.linalg.norm(bad, axis=-1, keepdims=True).clip(1e-6)
    h_g = float(ex.hinge_embedding_loss(key, jnp.asarray(good_n), jnp.asarray(skin), jnp.asarray(mask)))
    h_b = float(ex.hinge_embedding_loss(key, jnp.asarray(bad_n), jnp.asarray(skin), jnp.asarray(mask)))
    assert h_g < h_b


def test_multi_label_bce_and_grouping(rng):
    skin, good, bad, mask = _clustered(rng)
    gn = good / np.linalg.norm(good, axis=-1, keepdims=True).clip(1e-6)
    bl_g = float(ex.multi_label_bce(jnp.asarray(gn), jnp.asarray(skin), jnp.asarray(mask)))
    assert np.isfinite(bl_g)
    support = jnp.asarray(rng.normal(size=(2, 50, 50)).astype(np.float32))
    seg = jnp.asarray(skin[:, :50, :])
    assert np.isfinite(float(ex.grouping_loss(support, seg)))


def test_hungarian_and_iou():
    pred = np.eye(4)[np.array([0, 0, 1, 1, 2, 3])]
    gt = np.eye(4)[np.array([1, 1, 0, 0, 3, 2])]  # permuted labels
    m = ex.hungarian_matching(pred, gt)
    assert sorted(m[0].tolist()) == [0, 1, 2, 3]
    loss = float(ex.iou_loss(jnp.asarray(pred, jnp.float32), jnp.asarray(gt, jnp.float32)))
    assert loss < 1e-6  # perfect after matching


def test_skin_difference_loss(rng):
    skin, good, bad, mask = _clustered(rng)
    key = jax.random.key(1)
    same = float(ex.skin_difference_loss(key, jnp.asarray(skin), jnp.asarray(skin), jnp.asarray(mask)))
    assert same < 1e-6


def test_skel_format_roundtrip(tmp_path):
    rig = sk.Rig(names=["r", "a", "b"], pos=np.array([[0., 0, 0], [0, 1, 0], [1, 1, 0]]),
                 parents=np.array([-1, 0, 1]))
    p = str(tmp_path / "skel.txt")
    sk.save_skel_format(rig, p)
    back = sk.load_skel_format(p)
    assert back.names == rig.names
    np.testing.assert_allclose(back.pos, rig.pos, atol=1e-5)
    np.testing.assert_array_equal(back.parents, rig.parents)


def test_prim_mst_middle_first():
    joints = np.array([[0, 0, 0], [0, 1, 0], [0.5, 0.5, 0], [0, 2, 0]], float)
    d = np.linalg.norm(joints[:, None] - joints[None], axis=-1) + 0.01
    parents, root = sk.prim_mst_middle_first(d, 2, joints)
    assert root in (0, 1, 3)  # snapped to a middle joint
    assert (parents < 0).sum() == 1


def test_segmentation_helpers():
    cap = make_capsule_rig(13, 12)
    rig = sk.Rig(names=list(cap.names), pos=cap.joints.astype(float),
                 parents=cap.parents, skins=cap.skins)
    labels = np.argmax(cap.skins, axis=1)
    piv = boundary_pivot(cap.verts[labels == 0], cap.verts[labels == 1])
    assert 0.05 < piv[1] < 0.45  # between root and mid segments
    moved = move_joints_to_boundary(rig, cap.verts, labels)
    assert moved.pos.shape == rig.pos.shape
    out = mirror_segmentation(labels, cap.verts, cap.faces)
    assert out.shape == labels.shape


def test_profiling_and_shape_loader(tmp_path, rng):
    from morig_tpu.utils.profiling import StageTimer

    t = StageTimer()
    with t.section("x"):
        pass
    assert "x" in t.summary() and t.summary()["x"]["count"] == 1
    assert "x" in t.report()

    # shape loader roundtrip via synthetic files
    from morig_tpu.data.loaders import load_shape_models
    from morig_tpu.data.mesh_io import write_obj

    cap = make_capsule_rig(9, 8)
    pre = str(tmp_path / "77")
    write_obj(pre + "_0.obj", cap.verts, cap.faces)
    P = 64
    np.save(pre + "_pts.npy", rng.normal(size=(P, 3)).astype(np.float32))
    np.save(pre + "_flow.npy", rng.normal(size=(len(cap.verts), 3)).astype(np.float32) * 0.01)
    np.save(pre + "_corr_v2p.npy", np.stack([np.arange(10), np.arange(10)], 1))
    np.save(pre + "_corr_p2v.npy", np.stack([np.arange(10), np.arange(10)], 1))
    np.save(pre + "_vismask.npy", np.ones(len(cap.verts), np.float32))
    np.savetxt(pre + "_tpl_e.txt", cap.tpl_edges, fmt="%d")
    np.savetxt(pre + "_geo_e.txt", cap.geo_edges, fmt="%d")
    models = load_shape_models(str(tmp_path))
    assert len(models) == 1
    m = models[0]
    assert m.vtx_traj.shape == (len(cap.verts), 2, 3)
    assert (m.corr_v2p[:, -1] == 1).all()
