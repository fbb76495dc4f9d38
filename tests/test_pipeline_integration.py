"""Full rig-prediction pipeline integration + multi-chip parallel tests."""
import jax
import jax.numpy as jnp
import numpy as np

from morig_tpu.data.pose import capsule_pose_dataset
from morig_tpu.data.rig import capsule_rig_dataset
from morig_tpu.data.skeleton_data import capsule_skel_dataset
from morig_tpu.train.stages import (
    BoneStage, DeformPoseStage, RigStage, RootStage, SkinStage,
)


def make_predictor(train_steps: int = 12):
    """Assemble a RigPredictor with briefly trained joint/mask/skeleton
    stages (enough to be non-degenerate on the capsule)."""
    from morig_tpu.pipelines.rig_predict import RigPredictor

    kw = dict(num_points=64, n_lat=9, n_lon=8)
    pose_ds = capsule_pose_dataset(num_models=2, num_frames=6, **kw)
    rig_ds = capsule_rig_dataset(num_models=2, **kw)
    skel_s = capsule_skel_dataset(num_models=2, max_joints=8, **kw)
    pose_b = pose_ds.batch([0, 1], 0, 2)
    rig_b = rig_ds.batch([0, 1])

    rng = jax.random.key(0)
    deform = DeformPoseStage()
    deform_state = deform.init_state(rng, pose_b)
    joint = RigStage(arch="jointnet", num_embed_sample=64)
    joint_state = joint.init_state(rng, rig_b)
    mask = RigStage(arch="masknet", num_embed_sample=64)
    mask_state = mask.init_state(rng, rig_b)
    skin = SkinStage(num_embed_sample=64)
    skin_state = skin.init_state(rng, rig_b)
    bone = BoneStage()
    bone_state = bone.init_state(rng, skel_s)
    root = RootStage()
    root_state = root.init_state(rng, skel_s)

    r = jax.random.key(1)
    for _ in range(train_steps):
        r, s = jax.random.split(r)
        joint_state, _ = joint.train_step(joint_state, rig_b, s)
        mask_state, _ = mask.train_step(mask_state, rig_b, s)
        bone_state, _ = bone.train_step(bone_state, skel_s, s)
        root_state, _ = root.train_step(root_state, skel_s, s)

    predictor = RigPredictor(
        deform, deform_state, joint, joint_state, mask, mask_state,
        root, root_state, bone, bone_state, skin, skin_state,
    )
    return predictor, pose_ds, rig_ds


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
