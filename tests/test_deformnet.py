"""M2 tests: DeformNet forward, frozen extractor, flow learning, init transfer."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morig_tpu.data.pose import capsule_pose_dataset
from morig_tpu.train.stages import CorrPoseStage, DeformPoseStage

pytestmark = pytest.mark.slow


def small_dataset():
    return capsule_pose_dataset(num_models=2, num_frames=6, num_points=128, n_lat=9, n_lon=8)


def test_deformnet_forward_and_finite():
    ds = small_dataset()
    batch = ds.batch([0, 1], 0, 3)
    stage = DeformPoseStage()
    state = stage.init_state(jax.random.key(0), batch)
    pred_flow, vtx_f, pts_f, vis, tau = stage.infer(state, batch)
    B, V = batch.mesh.vert_mask.shape
    assert pred_flow.shape == (B, V, 3)
    assert vis.shape == (B, V)
    assert np.isfinite(np.asarray(pred_flow)).all()
    v = np.asarray(vis)
    assert (v >= 0).all() and (v <= 1 + 1e-6).all()


def test_deformnet_frozen_extractor_and_learning():
    ds = small_dataset()
    batch = ds.batch([0, 1], 0, 2)
    stage = DeformPoseStage()
    state = stage.init_state(jax.random.key(0), batch)
    corr_before = jax.tree_util.tree_map(np.asarray, state.params["corr_extractor"])
    rng = jax.random.key(7)
    losses = []
    for _ in range(16):
        rng, sub = jax.random.split(rng)
        state, metrics = stage.train_step(state, batch, sub)
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses[-1])
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
    # extractor params untouched (train_deform_pose.py freezes them)
    corr_after = state.params["corr_extractor"]
    flat_b = jax.tree_util.tree_leaves(corr_before)
    flat_a = jax.tree_util.tree_leaves(jax.tree_util.tree_map(np.asarray, corr_after))
    for b, a in zip(flat_b, flat_a):
        np.testing.assert_array_equal(b, a)
    # completing params did change
    comp = state.params["completing"]
    leaf = np.asarray(jax.tree_util.tree_leaves(comp)[0])
    assert np.isfinite(leaf).all()


def test_init_extractor_transfer():
    ds = small_dataset()
    batch = ds.batch([0, 1], 0, 3)
    corr_stage = CorrPoseStage()
    corr_state = corr_stage.init_state(jax.random.key(3), batch)
    deform_stage = DeformPoseStage()
    d_state = deform_stage.init_state(jax.random.key(4), batch)
    d_state2 = deform_stage.init_extractor_from(d_state, corr_state.params, corr_state.batch_stats)
    # extractor now equals the corr-stage params
    a = jax.tree_util.tree_leaves(d_state2.params["corr_extractor"])
    b = jax.tree_util.tree_leaves(corr_state.params)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_mesh_embed_dedup_matches_full_forward():
    """The flow program computes the CorrNet mesh embedding once per DISTINCT
    mesh and broadcasts it over the keyframe axis (rig_predict.py
    _flow_joints_program); the result must equal the plain per-frame forward."""
    ds = small_dataset()
    T = 2
    b0 = ds.batch([0, 1], 0, 1)
    stage = DeformPoseStage()
    state = stage.init_state(jax.random.key(0), b0)
    vars_ = {"params": state.params, "batch_stats": state.batch_stats}
    from morig_tpu.core import batch as B

    entries = [ds._mesh_cache[i] for i in (0, 1)]
    mesh_b = B.stack_meshes(entries)
    mesh_bt = B.stack_meshes([e for e in entries for _ in range(T)])
    pts = np.concatenate(
        [np.transpose(m.pts_traj[:, 1:T + 1, :], (1, 0, 2)) for m in ds.models], 0)
    points = B.PointBatch(jnp.asarray(pts, jnp.float32),
                          jnp.ones(pts.shape[:2], bool))

    @jax.jit
    def both(mesh_b, mesh_bt, points):
        ref = stage.model.apply(vars_, mesh_bt, points, False, None)[0]
        vtx_f_b = stage.model.apply(vars_, mesh_b, None, False, None,
                                    mesh_only=True)
        new = stage.model.apply(vars_, mesh_bt, points, False, None,
                                vtx_f=jnp.repeat(vtx_f_b, T, axis=0))[0]
        return ref, new

    ref, new = both(mesh_b, mesh_bt, points)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(new),
                               rtol=1e-5, atol=1e-5)
