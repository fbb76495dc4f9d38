"""Checkpoint save/load: atomic writes and torn-file behavior.

The convergence campaign resumes from `checkpoint.msgpack` after crashes
(TPU-worker restarts, kills); a torn write must never strand a stage — saves
are tmp+rename atomic, and a corrupt file raises cleanly so callers can fall
back to `model_best.msgpack` (tools/campaign.py train_stage).
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from morig_tpu.data.pose import capsule_pose_dataset
from morig_tpu.train import checkpoint as ckpt
from morig_tpu.train.stages import CorrPoseStage


@pytest.fixture(scope="module")
def state():
    ds = capsule_pose_dataset(num_models=1, num_frames=2, num_points=32,
                              n_lat=5, n_lon=4)
    stage = CorrPoseStage()
    return stage.init_state(jax.random.key(0), ds.batch([0], 0, 1))


def test_roundtrip_and_best_copy(tmp_path, state):
    d = str(tmp_path)
    ckpt.save_checkpoint(state, d, is_best=True,
                         extra={"epoch": 7, "lowest_loss": 0.5})
    restored, meta = ckpt.load_checkpoint(
        state, os.path.join(d, "checkpoint.msgpack"))
    assert meta["epoch"] == 7 and meta["lowest_loss"] == 0.5
    want = jax.tree_util.tree_leaves(state.params)
    got = jax.tree_util.tree_leaves(restored.params)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))
    assert os.path.exists(os.path.join(d, "model_best.msgpack"))
    assert os.path.exists(os.path.join(d, "model_best.msgpack.json"))
    # atomic write: no tmp litter
    assert not any(f.endswith(".tmp") for f in os.listdir(d))


def test_torn_checkpoint_raises(tmp_path, state):
    d = str(tmp_path)
    path = ckpt.save_checkpoint(state, d, extra={"epoch": 3})
    with open(path, "rb") as f:
        blob = f.read()
    with open(path, "wb") as f:          # simulate a mid-write crash
        f.write(blob[: len(blob) // 2])
    with pytest.raises(Exception):
        ckpt.load_checkpoint(state, path)
