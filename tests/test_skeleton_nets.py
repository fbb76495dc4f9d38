"""BoneNet/RootNet training + skeleton prediction pipeline on the capsule."""
import jax
import numpy as np
import pytest

from morig_tpu.data.skeleton_data import capsule_skel_dataset
from morig_tpu.train.stages import BoneStage, RootStage

pytestmark = pytest.mark.slow


def small_sample():
    return capsule_skel_dataset(num_models=2, max_joints=8,
                                num_points=64, n_lat=9, n_lon=8)


def test_skel_sample_labels():
    s = small_sample()
    # 3 joints -> 3 valid pairs, 2 adjacent (chain)
    assert int(s.pair_mask[0].sum()) == 3
    assert float(s.pair_label[0].sum()) == 2.0
    assert int(s.root_idx[0]) == 0


def test_bonenet_trains_and_separates():
    s = small_sample()
    stage = BoneStage()
    state = stage.init_state(jax.random.key(0), s)
    rng = jax.random.key(1)
    losses = []
    for _ in range(25):
        rng, sub = jax.random.split(rng)
        state, m = stage.train_step(state, s, sub)
        losses.append(float(m["total_loss"]))
    assert np.isfinite(losses[-1])
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
    # adjacent pairs should now score higher than the non-adjacent pair
    logits = np.asarray(stage.infer(state, s))[0, :, 0]
    lab = np.asarray(s.pair_label[0])[:3]
    assert logits[:3][lab > 0.5].min() > logits[:3][lab < 0.5].max()


def test_rootnet_trains():
    s = small_sample()
    stage = RootStage()
    state = stage.init_state(jax.random.key(0), s)
    rng = jax.random.key(2)
    for _ in range(20):
        rng, sub = jax.random.split(rng)
        state, m = stage.train_step(state, s, sub)
    assert np.isfinite(float(m["total_loss"]))
    assert float(m["root_acc"]) == 1.0


def test_skeleton_pipeline_end_to_end():
    """Train briefly, then predict a skeleton for one capsule; the chain
    topology must be recovered (cost dominated by learned connectivity)."""
    from morig_tpu.data.rig import capsule_rig_dataset
    from morig_tpu.data.synthetic import make_capsule_rig
    from morig_tpu.geometry.voxel import voxelize_mesh
    from morig_tpu.pipelines.skeleton import predict_skeleton

    s = small_sample()
    bone_stage, root_stage = BoneStage(), RootStage()
    bone_state = bone_stage.init_state(jax.random.key(0), s)
    root_state = root_stage.init_state(jax.random.key(1), s)
    rng = jax.random.key(3)
    for _ in range(25):
        rng, sub = jax.random.split(rng)
        bone_state, _ = bone_stage.train_step(bone_state, s, sub)
        root_state, _ = root_stage.train_step(root_state, s, sub)

    ds = capsule_rig_dataset(num_models=1, num_points=64, n_lat=9, n_lon=8)
    cap = make_capsule_rig(9, 8)
    vox = voxelize_mesh(cap.verts, cap.faces, dims=48)
    rig = predict_skeleton(
        ds._mesh_cache[0], ds.models[0].rig.pos.astype(np.float32),
        root_state, root_stage, bone_state, bone_stage, vox=vox,
    )
    assert rig.num_joints == 3
    # chain recovered: root -> mid -> tip
    assert rig.parents.tolist() == ds.models[0].rig.parents.tolist()
