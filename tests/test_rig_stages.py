"""M3 integration: rig dataset assembly + joint/mask/skin stage training."""
import jax
import numpy as np
import pytest

from morig_tpu.data.rig import capsule_rig_dataset
from morig_tpu.train.stages import RigStage, SkinStage

pytestmark = pytest.mark.slow


def small_rig_dataset():
    return capsule_rig_dataset(num_models=2, num_points=64, n_lat=9, n_lon=8)


def test_rig_dataset_fields():
    ds = small_rig_dataset()
    b = ds.batch([0, 1])
    B, V = b.mesh.vert_mask.shape
    assert b.joints.shape == (B, 48, 3)
    assert int(b.joints_mask.sum()) == 2 * 3
    assert b.gt_flow.shape == (B, V, 15)
    assert b.skin_input.shape == (B, V, 40)
    assert b.skin_label.shape == (B, V, 5)
    # skin labels: valid slots of valid verts sum close to 1 (full coverage
    # on the capsule: 3 bones + leaves >= all weight within 5 nearest)
    lab = np.asarray(b.skin_label) * np.asarray(b.loss_mask)
    vm = np.asarray(b.mesh.vert_mask)
    sums = lab.sum(-1)[vm]
    assert (sums > 0.99).mean() > 0.95
    # offsets point from vertices to their nearest joint
    off = np.asarray(b.offsets)[vm]
    assert np.abs(off).max() < 0.5


def test_jointnet_stage_trains():
    ds = small_rig_dataset()
    b = ds.batch([0, 1])
    stage = RigStage(arch="jointnet", num_embed_sample=128)
    state = stage.init_state(jax.random.key(0), b)
    rng = jax.random.key(1)
    det = []  # chamfer+l1: deterministic part (embedding term resamples pairs)
    for _ in range(20):
        rng, sub = jax.random.split(rng)
        state, m = stage.train_step(state, b, sub)
        det.append(float(m["loss_chamfer"]) + float(m["loss_l1"]))
    assert np.isfinite(det[-1])
    assert np.mean(det[-4:]) < np.mean(det[:4])


def test_masknet_stage_trains():
    ds = small_rig_dataset()
    b = ds.batch([0, 1])
    stage = RigStage(arch="masknet", num_embed_sample=128)
    state = stage.init_state(jax.random.key(0), b)
    rng = jax.random.key(2)
    first = None
    for _ in range(5):
        rng, sub = jax.random.split(rng)
        state, m = stage.train_step(state, b, sub)
        if first is None:
            first = float(m["total_loss"])
    assert np.isfinite(float(m["total_loss"])) and float(m["total_loss"]) < first


def test_skin_stage_trains():
    ds = small_rig_dataset()
    b = ds.batch([0, 1])
    stage = SkinStage(num_embed_sample=128)
    state = stage.init_state(jax.random.key(0), b)
    rng = jax.random.key(3)
    first = None
    for _ in range(6):
        rng, sub = jax.random.split(rng)
        state, m = stage.train_step(state, b, sub)
        if first is None:
            first = float(m["total_loss"])
    assert np.isfinite(float(m["total_loss"])) and float(m["total_loss"]) < first
    # skin logits softmax over 5 nearest bones is a valid distribution
    _, _, logits = stage.infer(state, b.skin_input, b.pred_flow, b.mesh)
    p = jax.nn.softmax(logits, axis=-1)
    np.testing.assert_allclose(np.asarray(p).sum(-1), 1.0, atol=1e-5)
