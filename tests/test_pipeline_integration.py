"""Full rig-prediction pipeline integration + multi-chip parallel tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morig_tpu.data.pose import capsule_pose_dataset
from morig_tpu.data.rig import capsule_rig_dataset
from morig_tpu.data.skeleton_data import capsule_skel_dataset
from morig_tpu.train.stages import (
    BoneStage, DeformPoseStage, RigStage, RootStage, SkinStage,
)

pytestmark = pytest.mark.slow


def make_predictor(train_steps: int = 12):
    from morig_tpu.pipelines.rig_predict import capsule_predictor

    return capsule_predictor(train_steps=train_steps)


def test_rig_predict_pipeline_structural():
    """predict_rig returns a structurally valid skinned rig."""
    predictor, pose_ds, rig_ds = make_predictor(train_steps=8)
    m = pose_ds.models[0]
    entry = rig_ds._mesh_cache[0]
    pts_frames = np.stack([m.pts_traj[:, t, :] for t in range(1, 6)])

    rig = predictor.predict_rig(entry, pts_frames)
    J = rig.num_joints
    assert J >= 1
    # valid tree: exactly one root, parents in range, acyclic by level walk
    assert (rig.parents < 0).sum() == 1
    assert all(-1 <= p < J for p in rig.parents)
    levels = rig.levels()
    assert sum(len(l) for l in levels) == J
    # skins: one row per valid vertex, normalized
    nv = int(np.asarray(entry["vert_mask"]).sum())
    assert rig.skins.shape[0] == nv
    np.testing.assert_allclose(rig.skins.sum(1), 1.0, atol=1e-4)
    # joints within the tanh displacement bound of the mesh bbox (+-1 is the
    # maximum shift the jointnet head can produce; train_rig.py:224)
    v = entry["verts"][np.asarray(entry["vert_mask"])]
    lo, hi = v.min(0) - 1.1, v.max(0) + 1.1
    assert ((rig.pos >= lo) & (rig.pos <= hi)).all()


def test_rig_file_roundtrip_through_pipeline(tmp_path):
    predictor, pose_ds, rig_ds = make_predictor(train_steps=4)
    m = pose_ds.models[0]
    entry = rig_ds._mesh_cache[0]
    pts_frames = np.stack([m.pts_traj[:, t, :] for t in range(1, 6)])
    rig = predictor.predict_rig(entry, pts_frames)
    from morig_tpu.geometry.skeleton import Rig

    p = str(tmp_path / "pred_rig.txt")
    rig.save(p)
    back = Rig.load(p)
    assert back.names == rig.names
    np.testing.assert_allclose(back.pos, rig.pos, atol=1e-6)
