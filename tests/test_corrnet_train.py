"""M1 integration: CorrNet forward + infoNCE training on the capsule fixture."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morig_tpu.data.pose import capsule_pose_dataset, sample_frame_pair, eval_frame_pair
from morig_tpu.data.synthetic import make_capsule_sequence, fk_numpy, lbs_numpy, make_capsule_rig, rotz
from morig_tpu.train.stages import CorrPoseStage
from morig_tpu.core.config import Config, TrainConfig, DEFAULT_CONFIG
import dataclasses

pytestmark = pytest.mark.slow


def small_dataset():
    return capsule_pose_dataset(num_models=2, num_frames=6, num_points=128, n_lat=9, n_lon=8)


def test_capsule_fixture_consistency():
    seq = make_capsule_sequence(num_frames=4, num_points=64, n_lat=9, n_lon=8, partial=False)
    V, T, _ = seq["vtx_traj"].shape
    assert T == 4
    # frame 0 is the rest pose
    np.testing.assert_allclose(seq["vtx_traj"][:, 0, :], seq["rig"].verts, atol=1e-5)
    # correspondences index valid ranges
    assert seq["corr_v2p"][:, 0].max() < V
    assert seq["corr_v2p"][:, 1].max() < 64
    # skins sum to one
    np.testing.assert_allclose(seq["rig"].skins.sum(1), 1.0, atol=1e-5)


def test_fk_oracle_identity():
    rig = make_capsule_rig(9, 8)
    eye = np.repeat(np.eye(3, dtype=np.float32)[None], 3, axis=0)
    G, q = fk_numpy(rig.joints, rig.parents, eye)
    np.testing.assert_allclose(q, rig.joints, atol=1e-6)
    v = lbs_numpy(rig.verts, rig.joints, rig.parents, rig.skins, eye)
    np.testing.assert_allclose(v, rig.verts, atol=1e-5)


def test_frame_sampling():
    rng = np.random.default_rng(0)
    for _ in range(20):
        s, t = sample_frame_pair(rng, "modelsresource", False, 6)
        assert s == 0 and 1 <= t <= 5
        s, t = sample_frame_pair(rng, "modelsresource", True, 21)
        assert s != t and abs(s - t) <= 2
    assert eval_frame_pair(False) == (0, 3)


def test_corrnet_forward_shapes():
    ds = small_dataset()
    batch = ds.batch([0, 1], 0, 3)
    stage = CorrPoseStage()
    state = stage.init_state(jax.random.key(0), batch)
    vtx_f, pts_f, vis, tau = stage.infer(state, batch)
    B, V = batch.mesh.vert_mask.shape
    P = batch.points.pts.shape[1]
    assert vtx_f.shape == (B, V, 64)
    assert pts_f.shape == (B, P, 64)
    assert vis.shape == (B, V, 1)
    # embeddings L2-normalized
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(vtx_f), axis=-1), 1.0, atol=1e-4
    )
    assert float(tau) == pytest.approx(0.07)


def test_corrnet_training_decreases_loss():
    ds = small_dataset()
    batch = ds.batch([0, 1], 0, 3)
    cfg = dataclasses.replace(
        DEFAULT_CONFIG, train=dataclasses.replace(DEFAULT_CONFIG.train, lr=1e-3)
    )
    stage = CorrPoseStage(cfg)
    stage.train_vismask = True
    state = stage.init_state(jax.random.key(0), batch)
    rng = jax.random.key(1)
    first = None
    for i in range(8):
        rng, sub = jax.random.split(rng)
        state, metrics = stage.train_step(state, batch, sub)
        if first is None:
            first = float(metrics["total_loss"])
    last = float(metrics["total_loss"])
    assert np.isfinite(last)
    assert last < first  # overfitting one batch must reduce loss
