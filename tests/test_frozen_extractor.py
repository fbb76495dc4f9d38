"""Frozen-extractor semantics: with train_extractor=False, a DeformPoseStage
train step must leave the CorrNet extractor's params AND batch-norm running
statistics bit-identical — matching the reference's frozen-checkpoint
semantics (train_deform_pose.py:150-153), where the loaded CorrNet buffers
never change."""
import jax
import numpy as np
import pytest

from morig_tpu.data.pose import capsule_pose_dataset
from morig_tpu.nn import mlp as mlpmod
from morig_tpu.train.stages import DeformPoseStage

pytestmark = pytest.mark.slow


@pytest.fixture
def batch_norm_mode():
    prev = mlpmod.get_default_norm()
    mlpmod.set_default_norm("batch")
    yield
    mlpmod.set_default_norm(prev)


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb) and len(la) > 0
    return all(np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(la, lb))


def test_frozen_extractor_params_and_stats_fixed(batch_norm_mode):
    ds = capsule_pose_dataset(num_models=1, num_frames=4, num_points=64,
                              n_lat=7, n_lon=6)
    batch = ds.batch([0], 0, 2)
    stage = DeformPoseStage(train_extractor=False)
    state = stage.init_state(jax.random.key(0), batch)
    p0 = jax.tree_util.tree_map(np.asarray, state.params["corr_extractor"])
    s0 = jax.tree_util.tree_map(np.asarray, state.batch_stats["corr_extractor"])
    other_stats0 = jax.tree_util.tree_map(
        np.asarray, {k: v for k, v in state.batch_stats.items() if k != "corr_extractor"})

    state, metrics = stage.train_step(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["total_loss"]))

    assert _tree_equal(p0, state.params["corr_extractor"]), \
        "frozen extractor params drifted"
    assert _tree_equal(s0, state.batch_stats["corr_extractor"]), \
        "frozen extractor batch_stats drifted"
    # the trainable refiner's BN stats MUST move (otherwise the merge is too broad)
    if jax.tree_util.tree_leaves(other_stats0):
        assert not _tree_equal(
            other_stats0,
            {k: v for k, v in state.batch_stats.items() if k != "corr_extractor"},
        ), "trainable-branch batch_stats unexpectedly frozen"
